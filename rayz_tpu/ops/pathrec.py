"""Persistent-path record/replay: the fast differentiable renderer.

Second-generation record/replay estimator (:mod:`rayz_tpu.ops.diffkernel` is
the first). The round-2 profile showed the bounce-indexed record kernel
spending ~5x the forward megakernel's time per sample: with the bounce as a
grid dimension and no respawn, a tile keeps sweeping the whole primitive
table until its LAST ray dies (~12 sweeps/sample on the flagship scene vs the
megakernel's ~2.15), and the replay scans spp x depth bounce steps even
though most are idle.

This module restores the megakernel's occupancy economics (persistent-ray
respawn, megakernel.py design notes) while keeping the record/replay split
that makes the backward O(rays) instead of O(rays x primitives):

* **Record** (Pallas, non-differentiable): a persistent-ray kernel over a
  grid of (tiles, K iterations). Every lane owns one pixel; when its path
  dies it immediately respawns the next camera sample — so the primitive
  sweep runs at near-full occupancy and the executed iteration count is
  ~spp x mean-path-length, not spp x depth. All randomness comes from the
  in-kernel TPU PRNG (no host raygen, no HBM random block round-trip). Per
  iteration it writes the winning primitive index and an aux plane: the
  scatter randoms actually consumed, the spawned camera ray, and explicit
  spawn/continue FLAGS — the replay reads control decisions instead of
  re-deriving them, so a float-level record/replay disagreement cannot
  desynchronize the sample schedule (the round-2 caveat in diffkernel.py).
* **Replay** (XLA, differentiable): one scan over K iterations (vs
  spp x depth). Each step gathers the winner's raw-parameter row (one-hot
  matmul on the MXU, diffkernel.py one-hot note), re-derives hit distance /
  normal / scatter / attenuation with the recorded randoms, and accumulates
  radiance per slot. Control (spawn/continue/hit) comes from the recording;
  values are recomputed smoothly, so gradients flow to sphere centers/
  radii/velocities, triangle vertices, texture colors, fuzz, and IOR —
  the same surface as diffkernel.replay_paths.

Iteration budget and straggler compaction
-----------------------------------------
K is static. A slot that has not finished its spp samples within K
iterations truncates its remaining work: an in-flight path contributes the
radiance accumulated so far (as if absorbed — the reference's own
depth-exhausted semantics, renderer.zig:104-105, at an earlier effective
depth) and unspawned samples contribute black. The kernel reports the number
of unfinished samples per slot (``leftover``).

The DEFAULT path (``iters=None``) eliminates the truncation in two passes:
record at a lean K1 (``default_k1``, ~99.5% of samples finish), then gather
the unfinished slots into a compact array (1/8 the slots) and RESUME their
recording — the kernel restarts from the saved per-slot ray state and
counters — with the exhaustive ``spp*max_depth`` budget; the compact
radiance scatter-adds back. Leftover is zero for ANY scene unless more
slots straggle than the compact capacity (an enclosure at high spp) —
never silently: the training API surfaces the deficit and ``fit`` raises.
Passing ``iters`` explicitly keeps the single-pass estimator, and
``iters = spp * max_depth`` remains the budget-free hard guarantee. The
bounce-indexed estimator (diffkernel.py) also remains available and
budget-free.

Matches /root/reference/src/renderer.zig:72-126 (the loop being
differentiated) like the rest of the renderer stack.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.camera import Camera
from ..models.scene import (
    DIFFUSE_UNIT_SPHERE,
    DIFFUSE_UNIT_SPHERE_SURFACE,
    MAT_DIELECTRIC,
    MAT_METALLIC,
    Scene,
)
from .integrator import RenderConfig, _pixel_grid
from .diffkernel import _diff_tables, fits_smem_record, supports_diff
from .megakernel import (
    _BIG,
    _CCMR2,
    _CV2,
    _CX,
    _CY,
    _CZ,
    _IOS,
    _PKF,
    _TG1V,
    _TG1X,
    _TG1Y,
    _TG1Z,
    _TG2V,
    _TG2X,
    _TG2Y,
    _TG2Z,
    _TIOS,
    _TNV0,
    _TNX,
    _TNY,
    _TNZ,
    _TPKF,
    _TWO_PI,
    _VV,
    _VX,
    _VY,
    _VZ,
    _camera_vector,
    is_prng_key,
    scene_tables,
    tri_tables,
)

__all__ = ["render_diff_pp", "render_diff_pp_flat", "record_pp", "replay_pp",
           "replay_pp_fused", "gather_rows", "gather_rows_T", "default_iters",
           "default_k1", "supports_pp"]

# aux plane rows (per iteration, per slot)
_AUX_UX, _AUX_UY, _AUX_UZ, _AUX_CB, _AUX_US = 0, 1, 2, 3, 4  # scatter randoms
_AUX_OX, _AUX_OY, _AUX_OZ = 5, 6, 7                          # spawn origin
_AUX_DX, _AUX_DY, _AUX_DZ = 8, 9, 10                         # spawn direction
_AUX_TAU = 11                                                # spawn time
_AUX_FLG = 12                                                # spawn + 2*cont
_AUX_ROWS = 13


def supports_pp(scene: Scene) -> bool:
    """Same scene coverage as the bounce-indexed recorder, gated on the same
    SMEM budget (the kernel keeps the full-table scene SoA in SMEM)."""
    return supports_diff(scene) and fits_smem_record(scene)


def default_iters(spp: int, max_depth: int = 32) -> int:
    """SINGLE-PASS iteration budget: 4x the sample count plus 4 full-depth
    paths of headroom for the straggler tail, capped at the exhaustive
    spp*max_depth bound (which makes spp=1 always exact). Measured on the
    flagship scene (spp 8, depth 32 -> 160): leftover == 0; the tail curve
    is 64 -> 10369, 96 -> 412, 128 -> 17, 160 -> 0 truncated samples of
    2.1M (glass-interior pixels run ~19 bounces/sample). The default path
    (``iters=None``) no longer pays this tail: it records at
    :func:`default_k1` and finishes the stragglers in a compacted second
    pass (see :func:`render_diff_pp_flat`)."""
    return min(spp * max_depth, 4 * spp + 4 * max_depth)


def default_k1(spp: int, max_depth: int = 32) -> int:
    """First-pass budget for straggler compaction: 3.5x the sample count —
    just above the mean iterations per slot on sky-heavy scenes (measured
    3.2x on the flagship; the half-capacity second pass absorbs the up-to-
    50% of slots left unfinished) — floored at 16 and capped at the
    exhaustive bound. Swept on-chip at spp 32: k1 = 4.0/3.5/3.0x spp ->
    17.2/18.1/overflow Mrays/s fwd+bwd."""
    return min(spp * max_depth, max(16, (7 * spp) // 2))


def default_schedule(spp: int, max_depth: int, r_pad: int,
                     block: int) -> list:
    """Compaction pass schedule [(iters, capacity), ...]. A slot is never
    idle while it has work (respawn is immediate), so a slot entering pass
    j has already consumed sum(k_1..k_{j-1}) iterations and the budgets
    only need to SUM to spp*max_depth for the per-slot hard guarantee.

    Default: a lean full-width pass (default_k1 = 3.5*spp — most slots finish), a
    depth-length pass at half capacity (the broad tail), and the remainder
    at 1/16 capacity (the deep tail: flagship measures 1.9% of slots
    unfinished after the first two passes, so 1/16 is 3x headroom).
    Measured straggler curve (flagship, spp 8 depth 32, 262144 slots):
    K=16 -> 188580 straggler slots, 24 -> 122457, 32 -> 68146,
    48 -> 23201, 64 -> 5066, 160 -> 0."""
    def cblk(x):
        return max(block, min(-(-x // block) * block, r_pad))

    k_exh = spp * max_depth
    k1 = default_k1(spp, max_depth)
    sch = [(k1, r_pad)]
    used = k1
    if used < k_exh:
        k2 = min(k_exh - used, max(k1, max_depth))
        sch.append((k2, cblk(r_pad // 2)))
        used += k2
    if used < k_exh:
        sch.append((k_exh - used, cblk(r_pad // 16)))
    return sch


def _record_pp_kernel(*args, n_pad: int, m_pad: int, n_local: int,
                      spp: int, max_depth: int, t_min: float, jitter: bool,
                      has_motion: bool, rs: int, unroll: int, iters: int,
                      ig: int, resume: bool, want_state: bool):
    """One grid step = one iteration of one tile of rs*128 persistent slots.

    Grid = (tiles, iters), iteration innermost so the VMEM scratch carries
    ray state across iterations of a tile. Positional refs: cam [18] SMEM,
    seed [2] SMEM (seed, slot offset), the sphere table iff n_pad, the
    triangle table iff m_pad, px/py [nsub,128] VMEM pixel coordinates, then
    (``resume`` only) st_in [7, rs, 128] f32 / cnt_in [3, rs, 128] i32
    initial per-slot state, then outputs idx [1, rs, 128] i32, aux
    [1, _AUX_ROWS, rs, 128] f32, leftover [rs, 128] i32 (written on the
    last iteration), (``want_state`` only) st_out/cnt_out final state, and
    scratch st [7, rs, 128] f32 (o,d,tau), cnt [3, rs, 128] i32 (depth,
    samples, active).
    """
    refs = list(args)
    cam_ref = refs.pop(0)
    seed_ref = refs.pop(0)
    tab_ref = refs.pop(0) if n_pad else None
    tri_ref = refs.pop(0) if m_pad else None
    px_ref = refs.pop(0)
    py_ref = refs.pop(0)
    st_in_ref = refs.pop(0) if resume else None
    cnt_in_ref = refs.pop(0) if resume else None
    idx_ref = refs.pop(0)
    aux_ref = refs.pop(0)
    left_ref = refs.pop(0)
    st_out_ref = refs.pop(0) if want_state else None
    cnt_out_ref = refs.pop(0) if want_state else None
    st_ref, cnt_ref = refs
    f32 = jnp.float32
    i32 = jnp.int32
    shape = (rs, 128)
    tile = pl.program_id(0)
    grp = pl.program_id(1)
    # One grid step covers ``ig`` iterations (the iteration-group): at the
    # exact budgets (K ~ 160) per-grid-step overhead dominates the idle
    # tail, and grouping cuts it ig-fold while keeping the same skip
    # granularity per sub-iteration.
    # Re-seeded every grid step (unlike the megakernel, whose while_loop
    # keeps one stream per tile): the group index MUST be part of the seed
    # or every group would replay the identical random sequence. Mosaic
    # caps prng_seed at 2 values, so fold (tile, grp) into one.
    pltpu.prng_seed(seed_ref[0], tile * (iters // ig) + grp)

    def uniform():
        bits = pltpu.prng_random_bits(shape)
        return (bits & 0x7FFFFF).astype(f32) * (2.0 ** -23)

    def unit3():
        # cylinder-map uniform direction (megakernel.py unit3)
        z = 2.0 * uniform() - 1.0
        phi = _TWO_PI * uniform()
        r = jnp.sqrt(jnp.maximum(1.0 - z * z, 1e-24))
        return r * jnp.cos(phi), r * jnp.sin(phi), z

    sub = jax.lax.broadcasted_iota(i32, shape, 0)
    lane = jax.lax.broadcasted_iota(i32, shape, 1)
    slot = seed_ref[1] + (tile * rs + sub) * 128 + lane
    valid = slot < n_local

    @pl.when(grp == 0)
    def _init():
        if resume:
            # continue exactly where a prior recording stopped: the in-
            # flight ray (st) and the (depth-left, samples, active) counters
            # of each slot come from the caller (straggler compaction).
            st_ref[...] = st_in_ref[...]
            cnt_ref[...] = cnt_in_ref[...]
        else:
            cnt_ref[0] = jnp.zeros(shape, i32)                   # depth left
            cnt_ref[1] = jnp.where(valid, spp, 0).astype(i32)    # samples
            cnt_ref[2] = jnp.zeros(shape, i32)                   # active
            st_ref[...] = jnp.zeros((7, rs, 128), f32)

    for g in range(ig):
        _record_one_iteration(
            g, cam_ref, tab_ref, tri_ref, px_ref, py_ref, idx_ref, aux_ref,
            st_ref, cnt_ref, uniform, unit3, valid, shape,
            n_pad=n_pad, m_pad=m_pad, spp=spp, max_depth=max_depth,
            t_min=t_min, jitter=jitter, has_motion=has_motion, rs=rs,
            unroll=unroll)

    @pl.when(grp == (iters // ig) - 1)
    def _leftover():
        # unfinished work: samples never spawned + the in-flight path (if any)
        left_ref[...] = cnt_ref[1] + cnt_ref[2]
        if want_state:
            st_out_ref[...] = st_ref[...]
            cnt_out_ref[...] = cnt_ref[...]


def _record_one_iteration(g, cam_ref, tab_ref, tri_ref, px_ref, py_ref,
                          idx_ref, aux_ref, st_ref, cnt_ref, uniform, unit3,
                          valid, shape, *, n_pad, m_pad, spp, max_depth,
                          t_min, jitter, has_motion, rs, unroll):
    f32 = jnp.float32
    i32 = jnp.int32
    depth = cnt_ref[0]
    samples = cnt_ref[1]
    active = cnt_ref[2] > 0
    any_work = jnp.any(active | (samples > 0))

    @pl.when(jnp.logical_not(any_work))
    def _idle():
        idx_ref[g] = jnp.full(shape, -2, i32)
        aux_ref[g] = jnp.zeros((_AUX_ROWS, rs, 128), f32)

    @pl.when(any_work)
    def _work():
        nonlocal depth, samples, active
        ox, oy, oz = st_ref[0], st_ref[1], st_ref[2]
        dx, dy, dz = st_ref[3], st_ref[4], st_ref[5]
        tau = st_ref[6]
        zf = jnp.zeros(shape, f32)

        cam = [cam_ref[i] for i in range(18)]
        (lfx, lfy, lfz, dux, duy, duz, dvx, dvy, dvz,
         pox, poy, poz, deux, deuy, deuz, devx, devy, devz) = cam

        # ---- respawn dead slots (Camera.getRay, camera.zig:59-77) ----
        spawn = (~active) & (samples > 0)
        pxf = px_ref[...]
        pyf = py_ref[...]
        if jitter:
            x = pxf + uniform() - 0.5
            y = pyf + uniform() - 0.5
            rr = jnp.sqrt(uniform())
            th = _TWO_PI * uniform()
            ca, sa = jnp.cos(th), jnp.sin(th)
            nox = lfx + rr * (ca * deux + sa * devx)
            noy = lfy + rr * (ca * deuy + sa * devy)
            noz = lfz + rr * (ca * deuz + sa * devz)
            ntau = uniform()
        else:
            x, y = pxf, pyf
            nox = jnp.broadcast_to(lfx, shape)
            noy = jnp.broadcast_to(lfy, shape)
            noz = jnp.broadcast_to(lfz, shape)
            ntau = zf
        ndx = x * dux + y * dvx + pox - nox
        ndy = x * duy + y * dvy + poy - noy
        ndz = x * duz + y * dvz + poz - noz

        ox = jnp.where(spawn, nox, ox)
        oy = jnp.where(spawn, noy, oy)
        oz = jnp.where(spawn, noz, oz)
        dx = jnp.where(spawn, ndx, dx)
        dy = jnp.where(spawn, ndy, dy)
        dz = jnp.where(spawn, ndz, dz)
        tau = jnp.where(spawn, ntau, tau)
        depth = jnp.where(spawn, max_depth, depth)
        samples = samples - spawn.astype(i32)
        active = active | spawn
        spf = spawn.astype(f32)

        aux_ref[g, _AUX_OX] = jnp.where(spawn, ox, 0.0)
        aux_ref[g, _AUX_OY] = jnp.where(spawn, oy, 0.0)
        aux_ref[g, _AUX_OZ] = jnp.where(spawn, oz, 0.0)
        aux_ref[g, _AUX_DX] = jnp.where(spawn, dx, 0.0)
        aux_ref[g, _AUX_DY] = jnp.where(spawn, dy, 0.0)
        aux_ref[g, _AUX_DZ] = jnp.where(spawn, dz, 0.0)
        aux_ref[g, _AUX_TAU] = jnp.where(spawn, tau, 0.0)

        # ---- nearest-hit sweep (megakernel one_sphere/one_triangle in
        # record form: carry q_best, winner center-or-normal, packed
        # material, ior, index) ----
        a = dx * dx + dy * dy + dz * dz
        inv_a = 1.0 / a
        d_dot_o = dx * ox + dy * oy + dz * oz
        o2 = ox * ox + oy * oy + oz * oz
        tmin_a = t_min * a
        if has_motion:
            tau2 = tau * tau

        def sphere_candidate(j):
            cx = tab_ref[_CX, j]
            cy = tab_ref[_CY, j]
            cz = tab_ref[_CZ, j]
            ccmr2 = tab_ref[_CCMR2, j]
            if has_motion:
                cxe = cx + tau * tab_ref[_VX, j]
                cye = cy + tau * tab_ref[_VY, j]
                cze = cz + tau * tab_ref[_VZ, j]
                ccmr2 = ccmr2 + tab_ref[_CV2, j] * tau + tab_ref[_VV, j] * tau2
            else:
                cxe, cye, cze = cx, cy, cz
            half_b = dx * cxe + dy * cye + dz * cze - d_dot_o
            o_dot_c = ox * cxe + oy * cye + oz * cze
            c_term = ccmr2 - 2.0 * o_dot_c + o2
            disc = half_b * half_b - a * c_term
            rt = jnp.sqrt(disc)  # NaN on miss -> compares false
            q1 = half_b - rt
            q2 = half_b + rt
            qv = jnp.where(q1 >= tmin_a, q1, q2)
            qv = jnp.where(qv >= tmin_a, qv, _BIG)
            return (qv, cxe, cye, cze, tab_ref[_PKF, j], tab_ref[_IOS, j], j)

        def tri_candidate(j):
            tnx = tri_ref[_TNX, j]
            tny = tri_ref[_TNY, j]
            tnz = tri_ref[_TNZ, j]
            ndd = dx * tnx + dy * tny + dz * tnz
            ndo = ox * tnx + oy * tny + oz * tnz
            r0 = pl.reciprocal(ndd, approx=True)
            rcp = r0 * (2.0 - ndd * r0)  # one Newton step: ~full f32
            tt = (tri_ref[_TNV0, j] - ndo) * rcp
            qv = tt * a
            g1x, g1y, g1z = (tri_ref[_TG1X, j], tri_ref[_TG1Y, j],
                             tri_ref[_TG1Z, j])
            g2x, g2y, g2z = (tri_ref[_TG2X, j], tri_ref[_TG2Y, j],
                             tri_ref[_TG2Z, j])
            hx = ox + tt * dx
            hy = oy + tt * dy
            hz = oz + tt * dz
            u = g1x * hx + g1y * hy + g1z * hz - tri_ref[_TG1V, j]
            v = g2x * hx + g2y * hy + g2z * hz - tri_ref[_TG2V, j]
            ok = ((qv >= tmin_a) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0))
            qv = jnp.where(ok, qv, _BIG)
            return (qv, tnx, tny, tnz, tri_ref[_TPKF, j], tri_ref[_TIOS, j],
                    n_pad + j)

        def merge(c1, c2):
            b = c2[0] < c1[0]
            return tuple(jnp.where(b, f2, f1) for f1, f2 in zip(c1, c2))

        def tree_group(cand_fn):
            def group(g, h):
                cands = [cand_fn(unroll * g + k) for k in range(unroll)]
                while len(cands) > 1:
                    nxt = [merge(cands[2 * k], cands[2 * k + 1])
                           for k in range(len(cands) // 2)]
                    if len(cands) % 2:
                        nxt.append(cands[-1])
                    cands = nxt
                return merge(h, cands[0])
            return group

        hit0 = (jnp.full(shape, _BIG, f32), zf, zf, zf, zf, zf,
                jnp.full(shape, -1, i32))
        h = hit0
        if n_pad:
            h = jax.lax.fori_loop(0, (n_pad + unroll - 1) // unroll,
                                  tree_group(sphere_candidate), h)
        if m_pad:
            h = jax.lax.fori_loop(0, (m_pad + unroll - 1) // unroll,
                                  tree_group(tri_candidate), h)
        qb, bcx, bcy, bcz, bpk, bios, bj = h

        hit = qb < _BIG
        ts = jnp.where(hit, qb * inv_a, 1.0)
        bkm = jnp.floor(bpk * 0.25)
        bfz = (bpk - 4.0 * bkm) * 0.5
        px_ = ox + ts * dx
        py_ = oy + ts * dy
        pz_ = oz + ts * dz

        if m_pad and n_pad:
            is_tri = bj >= n_pad
            nx = jnp.where(is_tri, bcx, px_ - bcx)
            ny = jnp.where(is_tri, bcy, py_ - bcy)
            nz = jnp.where(is_tri, bcz, pz_ - bcz)
        elif m_pad:
            nx, ny, nz = bcx, bcy, bcz
        else:
            nx = px_ - bcx
            ny = py_ - bcy
            nz = pz_ - bcz
        ninv = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-24))
        nx, ny, nz = nx * ninv, ny * ninv, nz * ninv
        ndd = nx * dx + ny * dy + nz * dz
        front = ndd < 0.0
        sgn = jnp.where(front, 1.0, -1.0)
        nx, ny, nz = nx * sgn, ny * sgn, nz * sgn

        kind = jnp.floor(bkm * 0.25)
        method = bkm - 4.0 * kind

        # ---- scatter randoms (recorded for the replay) ----
        ux, uy, uz = unit3()
        cb = jnp.exp(jnp.log(jnp.maximum(uniform(), 1e-24)) * (1.0 / 3.0))
        us = uniform()
        aux_ref[g, _AUX_UX] = ux
        aux_ref[g, _AUX_UY] = uy
        aux_ref[g, _AUX_UZ] = uz
        aux_ref[g, _AUX_CB] = cb
        aux_ref[g, _AUX_US] = us

        # ---- diffuse ----
        sx, sy, sz = ux * cb, uy * cb, uz * cb
        flip = jnp.where(sx * nx + sy * ny + sz * nz > 0.0, 1.0, -1.0)
        m0 = method == 0.0
        m1 = method == 1.0
        offx = jnp.where(m0, nx + sx, jnp.where(m1, nx + ux, sx * flip))
        offy = jnp.where(m0, ny + sy, jnp.where(m1, ny + uy, sy * flip))
        offz = jnp.where(m0, nz + sz, jnp.where(m1, nz + uz, sz * flip))
        tgx, tgy, tgz = px_ + offx, py_ + offy, pz_ + offz
        nz_tgt = ((jnp.abs(tgx) <= 1e-8) & (jnp.abs(tgy) <= 1e-8)
                  & (jnp.abs(tgz) <= 1e-8))
        tgx = jnp.where(nz_tgt, nx, tgx)
        tgy = jnp.where(nz_tgt, ny, tgy)
        tgz = jnp.where(nz_tgt, nz, tgz)
        difx, dify, difz = tgx - px_, tgy - py_, tgz - pz_

        # ---- metallic ----
        two_ndd = 2.0 * (dx * nx + dy * ny + dz * nz)
        rfx = dx - two_ndd * nx
        rfy = dy - two_ndd * ny
        rfz = dz - two_ndd * nz
        rinv = jax.lax.rsqrt(jnp.maximum(rfx * rfx + rfy * rfy + rfz * rfz,
                                         1e-24))
        fz = jnp.minimum(bfz, 1.0)
        mex = rfx * rinv + fz * ux
        mey = rfy * rinv + fz * uy
        mez = rfz * rinv + fz * uz
        metal_ok = mex * nx + mey * ny + mez * nz > 0.0

        # ---- dielectric ----
        eta = jnp.where(front, 1.0 / bios, bios)
        dinv = jax.lax.rsqrt(jnp.maximum(a, 1e-24))
        udx, udy, udz = dx * dinv, dy * dinv, dz * dinv
        cos_t = -(udx * nx + udy * ny + udz * nz)
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
        cannot = eta * sin_t > 1.0
        r0 = (1.0 - eta) / (1.0 + eta)
        r0 = r0 * r0
        om = 1.0 - cos_t
        om2 = om * om
        refl_p = r0 + (1.0 - r0) * om2 * om2 * om
        do_refl = cannot | (refl_p > us)
        ppx = (udx + cos_t * nx) * eta
        ppy = (udy + cos_t * ny) * eta
        ppz = (udz + cos_t * nz) * eta
        parm = -jnp.sqrt(jnp.maximum(
            1.0 - (ppx * ppx + ppy * ppy + ppz * ppz), 0.0))
        dlx = jnp.where(do_refl, rfx, ppx + parm * nx)
        dly = jnp.where(do_refl, rfy, ppy + parm * ny)
        dlz = jnp.where(do_refl, rfz, ppz + parm * nz)

        is_m = kind == float(MAT_METALLIC)
        is_d = kind == float(MAT_DIELECTRIC)
        ndirx = jnp.where(is_d, dlx, jnp.where(is_m, mex, difx))
        ndiry = jnp.where(is_d, dly, jnp.where(is_m, mey, dify))
        ndirz = jnp.where(is_d, dlz, jnp.where(is_m, mez, difz))
        nd2 = ndirx * ndirx + ndiry * ndiry + ndirz * ndirz
        scattered = ((~is_m) | metal_ok) & (nd2 > 1e-20)

        # ---- outputs: winner index (-1 active miss, -2 idle) + flags ----
        idx_ref[g] = jnp.where(active, jnp.where(hit, bj, -1), -2)
        cont = active & hit & scattered & (depth > 1)
        aux_ref[g, _AUX_FLG] = spf + 2.0 * cont.astype(f32)

        st_ref[0] = jnp.where(cont, px_, ox)
        st_ref[1] = jnp.where(cont, py_, oy)
        st_ref[2] = jnp.where(cont, pz_, oz)
        st_ref[3] = jnp.where(cont, ndirx, dx)
        st_ref[4] = jnp.where(cont, ndiry, dy)
        st_ref[5] = jnp.where(cont, ndirz, dz)
        st_ref[6] = tau
        cnt_ref[0] = depth - cont.astype(i32)
        cnt_ref[1] = samples
        cnt_ref[2] = cont.astype(i32)


def record_pp(scene: Scene, camera: Camera, seed, px, py, n_local: int, *,
              spp: int, max_depth: int, t_min: float, jitter: bool,
              iters: int, tile_sublanes: int = 16, unroll: int = 8,
              interpret=False, init_state=None, want_state: bool = False):
    """Run the persistent-path record kernel over ``n_local`` slots whose
    pixel coordinates are ``px``/``py`` (flat [R_pad] f32, padded to
    tile_sublanes*128). Returns (idx [iters, R_pad] i32, aux
    [iters, _AUX_ROWS, R_pad] f32, leftover [R_pad] i32); with
    ``want_state=True`` additionally returns the final per-slot state
    ``(st [7, R_pad] f32, cnt [3, R_pad] i32)``. Passing that state back as
    ``init_state`` RESUMES the recording exactly where it stopped (new
    randoms, same estimator) — the straggler-compaction second pass.
    Non-differentiable by construction (tables pass through
    stop_gradient)."""
    rs = tile_sublanes
    r_pad = px.shape[0]
    nsub = r_pad // 128
    assert nsub * 128 == r_pad and nsub % rs == 0, "caller must pad R"
    n_tiles = nsub // rs
    ig = 8 if iters >= 8 else 1  # iterations per grid step (see kernel)
    iters = -(-iters // ig) * ig  # round UP: extra budget, never less
    if not fits_smem_record(scene):
        raise ValueError(
            "persistent-path record kernel: scene tables exceed the SMEM "
            "budget; use the dense differentiable path for scenes this "
            "large (see diffkernel.fits_smem_record)")

    sg = lambda x: jax.lax.stop_gradient(x).astype(jnp.float32)
    n_pad = int(scene.sphere_radius.shape[0]) if scene.n_spheres > 0 else 0
    m_pad = int(scene.tri_material.shape[0]) if scene.n_triangles > 0 else 0
    # The unroll groups read one full group past a partial tail, and the
    # recorded indices must line up with _diff_tables' raw padded counts —
    # so instead of padding the tables (which would shift the triangle index
    # offset), shrink unroll until it divides both class counts (builder
    # scenes are padded to multiples of 8, the default).
    while unroll > 1 and ((n_pad % unroll) or (m_pad % unroll)):
        unroll //= 2
    inputs = [sg(_camera_vector(camera)),
              jnp.stack([jnp.asarray(seed, jnp.int32).reshape(()),
                         jnp.asarray(0, jnp.int32).reshape(())])]
    if n_pad:
        inputs.append(sg(scene_tables(scene)))
    if m_pad:
        inputs.append(sg(tri_tables(scene)))
    inputs.append(sg(px).reshape(nsub, 128))
    inputs.append(sg(py).reshape(nsub, 128))
    resume = init_state is not None
    if resume:
        st0, cnt0 = init_state
        inputs.append(jax.lax.stop_gradient(st0).astype(jnp.float32)
                      .reshape(7, nsub, 128))
        inputs.append(cnt0.astype(jnp.int32).reshape(3, nsub, 128))

    kern = functools.partial(
        _record_pp_kernel, n_pad=n_pad, m_pad=m_pad, n_local=n_local,
        spp=spp, max_depth=max_depth, t_min=t_min, jitter=jitter,
        has_motion=scene.has_motion, rs=rs, unroll=unroll, iters=iters,
        ig=ig, resume=resume, want_state=want_state)

    n_tabs = (1 if n_pad else 0) + (1 if m_pad else 0)
    pix_spec = pl.BlockSpec((rs, 128), lambda i, t: (i, 0),
                            memory_space=pltpu.VMEM)
    st_spec = pl.BlockSpec((7, rs, 128), lambda i, t: (0, i, 0),
                           memory_space=pltpu.VMEM)
    cnt_spec = pl.BlockSpec((3, rs, 128), lambda i, t: (0, i, 0),
                            memory_space=pltpu.VMEM)
    in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)] * (2 + n_tabs)
                + [pix_spec, pix_spec])
    if resume:
        in_specs += [st_spec, cnt_spec]
    out_shape = [
        jax.ShapeDtypeStruct((iters, nsub, 128), jnp.int32),
        jax.ShapeDtypeStruct((iters, _AUX_ROWS, nsub, 128), jnp.float32),
        jax.ShapeDtypeStruct((nsub, 128), jnp.int32),
    ]
    out_specs = [
        pl.BlockSpec((ig, rs, 128), lambda i, t: (t, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ig, _AUX_ROWS, rs, 128), lambda i, t: (t, 0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rs, 128), lambda i, t: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    if want_state:
        out_shape += [jax.ShapeDtypeStruct((7, nsub, 128), jnp.float32),
                      jax.ShapeDtypeStruct((3, nsub, 128), jnp.int32)]
        out_specs += [st_spec, cnt_spec]
    outs = pl.pallas_call(
        kern,
        grid=(n_tiles, iters // ig),
        in_specs=in_specs,
        out_shape=tuple(out_shape),
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((7, rs, 128), jnp.float32),
            pltpu.VMEM((3, rs, 128), jnp.int32),
        ],
        interpret=interpret,
    )(*inputs)
    idx, aux, left = outs[:3]
    ret = (idx.reshape(iters, r_pad),
           aux.reshape(iters, _AUX_ROWS, r_pad),
           left.reshape(r_pad))
    if want_state:
        ret = ret + ((outs[3].reshape(7, r_pad), outs[4].reshape(3, r_pad)),)
    return ret


def replay_pp(scene: Scene, idx, aux, *, t_min: float,
              remat: bool = True, interpret=False, init_carry=None,
              return_final: bool = False):
    """Differentiably re-trace a persistent-path recording; returns the
    per-slot radiance SUM over all samples [R, 3] (caller divides by spp).
    ``init_carry``/``return_final`` as in :func:`replay_pp_fused`
    ([_ST_ROWS, R] layout: o, d, tau, thr), for straggler-compaction
    resume.

    Per-step ``jax.checkpoint`` (``remat=True``) keeps the backward's live
    set to the scan carry: without it XLA saves each step's [R, P] one-hot
    for the gather transpose (~34 GB at the flagship config — an OOM).

    Control flow (spawn / hit / continue) is read from the recording — the
    scan cannot desynchronize from the kernel — while every VALUE (hit
    distance, normal, scatter direction, attenuation, sky) is re-derived
    smoothly from the raw scene parameters, so ``jax.grad`` reaches the
    full trainable surface with O(R) work per iteration. Formula-for-formula
    this matches diffkernel.replay_paths (itself matching the megakernel and
    material.zig / geom.zig / renderer.zig); the differences are the
    respawn handling and the recorded flags.
    """
    dt = scene.sphere_center.dtype
    tab = _diff_tables(scene)
    n_sph_pad = int(scene.sphere_radius.shape[0]) if scene.n_spheres > 0 else 0
    with_sph = scene.n_spheres > 0
    with_tri = scene.n_triangles > 0
    r = idx.shape[1]
    aux = jax.lax.stop_gradient(aux).astype(dt)

    def step(carry, xs):
        o, d, tau, thr, out = carry
        idx_t, aux_t = xs
        flg = aux_t[_AUX_FLG]
        spawn = (flg == 1.0) | (flg == 3.0)
        cont = flg >= 2.0
        sp3 = spawn[:, None]

        o = jnp.where(sp3, aux_t[_AUX_OX:_AUX_OZ + 1].T, o)
        d = jnp.where(sp3, aux_t[_AUX_DX:_AUX_DZ + 1].T, d)
        tau = jnp.where(spawn, aux_t[_AUX_TAU], tau)
        thr = jnp.where(sp3, jnp.ones_like(thr), thr)

        active = idx_t >= -1
        hit = idx_t >= 0
        i = jnp.maximum(idx_t, 0)

        # winner row via the Pallas MXU gather (one-hot built in VMEM —
        # an XLA one-hot would write [R, P] to HBM three times per trained
        # step; see gather_rows below)
        from jax.ad_checkpoint import checkpoint_name
        row = checkpoint_name(gather_rows(tab, i, bool(interpret)),
                              "pp_rows")
        a = jnp.sum(d * d, axis=-1)

        if with_sph:
            c = row[:, 0:3]
            if scene.has_motion:
                c = c + tau[:, None] * row[:, 3:6]
            rad = row[:, 6]
            co = c - o
            half_b = jnp.sum(d * co, axis=-1)
            c_term = jnp.sum(co * co, axis=-1) - rad * rad
            disc = half_b * half_b - a * c_term
            pos = disc > 0.0
            rt = jnp.where(pos, jnp.sqrt(jnp.where(pos, disc, 1.0)), 0.0)
            q1 = half_b - rt
            q2 = half_b + rt
            q = jnp.where(q1 >= t_min * a, q1, q2)
            t_sph = q / a
        if with_tri:
            v0 = row[:, 0:3]
            e1 = row[:, 3:6] - v0
            e2 = row[:, 6:9] - v0
            pn = jnp.cross(e1, e2)
            ndd = jnp.sum(pn * d, axis=-1)
            ndd_safe = jnp.where(jnp.abs(ndd) > 0.0, ndd, 1.0)
            t_tri = jnp.sum(pn * (v0 - o), axis=-1) / ndd_safe

        if with_sph and with_tri:
            is_tri = i >= n_sph_pad
            t_hit = jnp.where(is_tri, t_tri, t_sph)
        elif with_tri:
            t_hit = t_tri
        else:
            t_hit = t_sph
        ts = jnp.where(hit, t_hit, 1.0)
        p = o + ts[:, None] * d

        if with_sph and with_tri:
            nrm = jnp.where(is_tri[:, None], pn, p - c)
        elif with_tri:
            nrm = pn
        else:
            nrm = p - c
        ninv = jax.lax.rsqrt(jnp.maximum(jnp.sum(nrm * nrm, axis=-1), 1e-24))
        nrm = nrm * ninv[:, None]
        front = jnp.sum(nrm * d, axis=-1) < 0.0
        nrm = jnp.where(front[:, None], nrm, -nrm)

        kind = row[:, 9]
        method = row[:, 10]
        fuzz = row[:, 11]
        ior = row[:, 12]
        isc = 1.0 / row[:, 13]
        par = jnp.sum(jnp.floor(p * isc[:, None]), axis=-1)
        even_par = par - 2.0 * jnp.floor(par * 0.5) < 0.5
        albedo = jnp.where(even_par[:, None], row[:, 14:17], row[:, 17:20])

        u3 = aux_t[_AUX_UX:_AUX_UZ + 1].T
        cb = aux_t[_AUX_CB]
        us = aux_t[_AUX_US]

        # ---- diffuse ----
        s = u3 * cb[:, None]
        flip = jnp.where(jnp.sum(s * nrm, axis=-1) > 0.0, 1.0, -1.0)
        off = jnp.where(
            (method == DIFFUSE_UNIT_SPHERE)[:, None], nrm + s,
            jnp.where((method == DIFFUSE_UNIT_SPHERE_SURFACE)[:, None],
                      nrm + u3, s * flip[:, None]))
        tg = p + off
        nz_tgt = jnp.all(jnp.abs(tg) <= 1e-8, axis=-1)
        tg = jnp.where(nz_tgt[:, None], nrm, tg)
        dif = tg - p

        # ---- metallic ----
        ddn = jnp.sum(d * nrm, axis=-1)
        rf = d - 2.0 * ddn[:, None] * nrm
        rinv = jax.lax.rsqrt(jnp.maximum(jnp.sum(rf * rf, axis=-1), 1e-24))
        met = rf * rinv[:, None] + jnp.minimum(fuzz, 1.0)[:, None] * u3

        # ---- dielectric ----
        def safe_sqrt(x):
            pos = x > 0.0
            return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)

        eta = jnp.where(front, 1.0 / ior, ior)
        dinv = jax.lax.rsqrt(jnp.maximum(a, 1e-24))
        ud = d * dinv[:, None]
        cos_t = -jnp.sum(ud * nrm, axis=-1)
        sin_t = safe_sqrt(1.0 - cos_t * cos_t)
        cannot = eta * sin_t > 1.0
        r0 = (1.0 - eta) / (1.0 + eta)
        r0 = r0 * r0
        om = 1.0 - cos_t
        om2 = om * om
        refl_p = r0 + (1.0 - r0) * om2 * om2 * om
        do_refl = cannot | (refl_p > us)
        pp = (ud + cos_t[:, None] * nrm) * eta[:, None]
        parm = -safe_sqrt(1.0 - jnp.sum(pp * pp, axis=-1))
        diel = jnp.where(do_refl[:, None], rf, pp + parm[:, None] * nrm)

        is_m = kind == MAT_METALLIC
        is_d = kind == MAT_DIELECTRIC
        ndir = jnp.where(is_d[:, None], diel,
                         jnp.where(is_m[:, None], met, dif))
        att = jnp.where(is_d[:, None], jnp.ones_like(albedo), albedo)

        # ---- miss -> sky (reference's exact formula) ----
        sky_t = 0.5 * (d[:, 1] * dinv + 1.0)
        blue = jnp.asarray([0.5, 0.7, 1.0], dtype=dt)
        sky = (1.0 - sky_t[:, None] + blue) * sky_t[:, None]
        miss = active & ~hit
        out = out + jnp.where(miss[:, None], thr * sky, 0.0)

        # state updates gated by the RECORDED continue flag
        c3 = cont[:, None]
        thr = jnp.where(c3, thr * att, thr)
        o = jnp.where(c3, p, o)
        d = jnp.where(c3, ndir, d)
        return (o, d, tau, thr, out), None

    zero3 = jnp.zeros((r, 3), dtype=dt)
    if init_carry is None:
        init = (zero3, zero3 + jnp.asarray([0.0, 0.0, 1.0], dt),
                jnp.zeros((r,), dt), zero3 + 1.0, zero3)
    else:
        ic = init_carry.astype(dt)
        init = (ic[0:3].T, ic[3:6].T, ic[6], ic[7:10].T, zero3)
    if remat:
        # Save the gathered winner rows ([R, 20]/step) so the backward's
        # per-step recompute skips the gather kernel; everything else
        # rematerializes from the carry.
        policy = jax.checkpoint_policies.save_only_these_names("pp_rows")
        body = jax.checkpoint(step, policy=policy)
    else:
        body = step
    (o_f, d_f, tau_f, thr_f, out), _ = jax.lax.scan(body, init, (idx, aux))
    if return_final:
        fin = jnp.concatenate([o_f.T, d_f.T, tau_f[None, :], thr_f.T],
                              axis=0)
        return out, fin
    return out


def render_diff_pp_flat(scene: Scene, camera: Camera, key, px, py, *,
                        spp: int, max_depth: int, t_min: float, jitter: bool,
                        iters: int | None = None, tile_sublanes: int = 16,
                        interpret=False, return_leftover: bool = False,
                        fused: bool | None = None,
                        compact: bool | None = None,
                        compact_capacity: int | None = None):
    """Persistent-path record+replay radiance of a flat pixel list [n] ->
    [n, 3] (spp-averaged). Drop-in for diffkernel.render_diff_flat — this is
    the per-device body of the sharded recorded train step.

    Straggler compaction (the default, ``iters=None``): run the
    :func:`default_schedule` of recording passes — a lean full-width pass,
    then passes that gather the unfinished slots into compact arrays and
    RESUME their recording (ray state, counters, and the replay carry all
    hand off) with budgets summing to the exhaustive ``spp*max_depth``
    bound; each pass's replay radiance scatter-adds into its original
    slots. Exactness is preserved (leftover == 0) unless more slots
    straggle than a pass's capacity — then the deficit is reported via
    ``return_leftover`` and the caller should raise ``iters`` or
    ``compact_capacity``. An explicit ``iters`` keeps the single-pass
    behavior; ``iters`` + ``compact=True`` runs one resume pass of
    ``compact_capacity`` slots (default R/8) with the remaining exhaustive
    budget.

    With ``return_leftover=True`` also returns the total number of samples
    the iteration budget truncated (0 in practice; see module docstring).
    """
    k_exh = spp * max_depth
    n_px = px.shape[0]
    rs = min(tile_sublanes, max(1, -(-n_px // 128)))
    block = rs * 128
    r_pad = -(-n_px // block) * block
    if iters is None:
        if compact is None:
            compact = True
        schedule = (default_schedule(spp, max_depth, r_pad, block)
                    if compact else [(default_iters(spp, max_depth), r_pad)])
    else:
        if compact is None:
            compact = False
        schedule = [(iters, r_pad)]
        if compact and iters < k_exh:
            cap = (compact_capacity if compact_capacity is not None
                   else max(block, r_pad // 8))
            cap = max(block, min(-(-cap // block) * block, r_pad))
            schedule.append((k_exh - iters, cap))
    if len(schedule) == 1:
        compact = False
    if r_pad != n_px:
        pad = r_pad - n_px
        px = jnp.concatenate([px, jnp.zeros((pad,), px.dtype)])
        py = jnp.concatenate([py, jnp.zeros((pad,), py.dtype)])

    if is_prng_key(key):
        seed = jax.random.randint(key, (), 0, jnp.iinfo(jnp.int32).max)
    else:
        seed = jnp.asarray(key, jnp.int32)

    px = px.astype(camera.dtype)
    py = py.astype(camera.dtype)
    # The fused Pallas replay (default for f32 scenes) skips idle
    # iterations and keeps step intermediates on-chip; the XLA scan replay
    # remains the oracle and the f64 path. The replay-side kernels use no
    # pltpu-specific ops, so plain interpret=True suffices off-TPU.
    if fused is None:
        fused = scene.dtype == jnp.float32

    def _replay(idx_, aux_, **kw):
        if fused:
            return replay_pp_fused(scene, idx_, aux_, t_min=t_min,
                                   tile_sublanes=rs,
                                   interpret=bool(interpret), **kw)
        return replay_pp(scene, idx_, aux_, t_min=t_min,
                         interpret=bool(interpret), **kw)

    n_pass = len(schedule)
    rec = record_pp(
        scene, camera, seed, px, py,
        n_px, spp=spp, max_depth=max_depth, t_min=t_min, jitter=jitter,
        iters=schedule[0][0], tile_sublanes=rs, interpret=interpret,
        want_state=n_pass > 1)
    idx, aux, left = rec[:3]
    if n_pass == 1:
        rad = _replay(idx, aux)
        leftover = jnp.sum(left[:n_px])
    else:
        # multi-pass compaction: each resume pass gathers the previous
        # pass's unfinished slots (kernel state + the replay's final carry,
        # so a mid-path slot hands off its ray AND throughput
        # differentiably) into a compact array and scatter-adds its replay
        # radiance back into the original slots.
        i32 = jnp.int32
        rad, fin_cur = _replay(idx, aux, return_final=True)
        st_cur, cnt_cur = rec[3]
        left_cur = left
        px_cur, py_cur = px, py
        map_cur = None  # compact-slot -> original-slot (None = identity)
        overflow = jnp.zeros((), i32)
        for j, (kj, capj) in enumerate(schedule[1:]):
            last = j == n_pass - 2
            strag = left_cur > 0
            pos = jnp.cumsum(strag.astype(i32)) - 1
            # compact slot c holds source slot scat[c]; overflow stragglers
            # (pos >= cap) and non-stragglers land out of bounds and drop.
            dest = jnp.where(strag, pos, capj)
            scat = jnp.full((capj,), -1, i32).at[dest].set(
                jnp.arange(left_cur.shape[0], dtype=i32), mode="drop")
            valid_c = scat >= 0
            safe = jnp.maximum(scat, 0)
            orig = safe if map_cur is None else map_cur[safe]
            cpx = jnp.where(valid_c, px_cur[safe], 0.0)
            cpy = jnp.where(valid_c, py_cur[safe], 0.0)
            cst = jnp.where(valid_c[None, :], st_cur[:, safe], 0.0)
            # invalid compact slots: zero counters -> idle from iteration 0
            ccnt = jnp.where(valid_c[None, :], cnt_cur[:, safe], 0)
            dflt = _default_carry(capj // 128).reshape(_ST_ROWS, capj)
            st0 = jnp.where(valid_c[None, :], fin_cur[:, safe], dflt)
            seedj = jnp.bitwise_xor(
                seed, jnp.asarray(0x5BD1E995 ^ (j * 0x9E37), jnp.int32))
            recj = record_pp(
                scene, camera, seedj, cpx, cpy, capj, spp=spp,
                max_depth=max_depth, t_min=t_min, jitter=jitter, iters=kj,
                tile_sublanes=rs, interpret=interpret,
                init_state=(cst, ccnt), want_state=not last)
            idxj, auxj, leftj = recj[:3]
            if last:
                radj = _replay(idxj, auxj, init_carry=st0)
            else:
                radj, fin_cur = _replay(idxj, auxj, init_carry=st0,
                                        return_final=True)
                st_cur, cnt_cur = recj[3]
            rad = rad.at[orig].add(jnp.where(valid_c[:, None], radj, 0.0))
            overflow = overflow + jnp.sum(
                jnp.where(strag & (pos >= capj), left_cur, 0))
            left_cur = leftj
            px_cur, py_cur, map_cur = cpx, cpy, orig
        leftover = jnp.sum(left_cur) + overflow
    img = rad[:n_px].astype(camera.dtype) / float(spp)
    if return_leftover:
        return img, leftover
    return img


@functools.partial(
    jax.jit,
    static_argnames=("spp", "max_depth", "t_min", "jitter", "iters",
                     "tile_sublanes", "interp", "want_left", "compact"),
)
def _render_diff_pp_jit(scene, camera, seed, *, spp, max_depth, t_min,
                        jitter, iters, tile_sublanes, interp, want_left,
                        compact):
    h, w = camera.height, camera.width
    px, py = _pixel_grid(camera)
    res = render_diff_pp_flat(
        scene, camera, seed, px, py, spp=spp, max_depth=max_depth,
        t_min=t_min, jitter=jitter, iters=iters,
        tile_sublanes=tile_sublanes, interpret=interp,
        return_leftover=want_left, compact=compact)
    if want_left:
        flat, left = res
        return flat.reshape(h, w, 3), left
    return res.reshape(h, w, 3)


def render_diff_pp(scene: Scene, camera: Camera, key,
                   config: RenderConfig = RenderConfig(), *,
                   iters: int | None = None, tile_sublanes: int = 16,
                   interpret=None, return_leftover: bool = False,
                   compact: bool | None = None):
    """Differentiable render via persistent-path record/replay — same
    estimator distribution as the forward megakernel (both respawn camera
    samples per slot with in-kernel PRNG streams), composing with
    ``jax.grad`` in the scene's float leaves at a fraction of the
    bounce-indexed recorder's cost.

    Off-TPU the kernel runs under the TPU-semantics interpreter, whose PRNG
    stub returns zeros — like the forward megakernel, off-TPU use is for
    deterministic (jitter=False) configs and tests.
    """
    if not supports_diff(scene):
        if scene.deep_checker:
            raise ValueError(
                "record/replay resolves only ONE level of checker nesting; "
                "use the dense engine (rayz_tpu.render / "
                "pixel_loss(engine='dense')) for nested-checker scenes")
        raise ValueError("record/replay needs a non-empty scene (spheres "
                         "and/or triangles)")
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if interpret is True:
        interpret = pltpu.InterpretParams()
    if is_prng_key(key):
        seed = jax.random.randint(key, (), 0, jnp.iinfo(jnp.int32).max)
    else:
        seed = jnp.asarray(key, jnp.int32)
    return _render_diff_pp_jit(
        scene, camera, seed, spp=config.spp, max_depth=config.max_depth,
        t_min=config.t_min, jitter=config.jitter, iters=iters,
        tile_sublanes=tile_sublanes, interp=interpret,
        want_left=return_leftover, compact=compact)


# --------------------------------------------------------------------------
# Pallas row-gather: tab[idx] without materializing the one-hot in HBM
# --------------------------------------------------------------------------
#
# The replay's per-iteration winner gather as an XLA one-hot matmul writes
# the [R, P] one-hot to HBM (~0.5 GB per step at the flagship config) three
# times per trained step (forward, remat recompute, backward transpose) —
# the dominant replay cost. These kernels build the one-hot per 2048-ray
# block IN VMEM and contract it on the MXU immediately; HBM traffic drops
# to the indices and the gathered rows. The backward is the transposed
# contraction accumulated across blocks in a VMEM scratch.

_GATHER_LANES = 8192   # lanes per grid step (4 sub-blocks)
_GATHER_SUB = 2048     # one-hot sub-block (bounds VMEM and skip granularity)


def _bf16_split3(x):
    """x == t1 + t2 + t3 with each term bf16-representable (stored f32):
    contracting the terms against an EXACT bf16 one-hot at DEFAULT (single
    bf16-pass) MXU precision reproduces the f32 gather to f32 rounding —
    the residual after three bf16 splits is <= 2^-24 relative — at half
    the cost of a HIGHEST (six-pass) f32 matmul."""
    f32 = x.dtype
    t1 = x.astype(jnp.bfloat16)
    r1 = x - t1.astype(f32)
    t2 = r1.astype(jnp.bfloat16)
    t3 = (r1 - t2.astype(f32)).astype(jnp.bfloat16)
    return t1, t2, t3


def _split_dot(terms, oh_b, f32):
    acc = jnp.dot(terms[0], oh_b, preferred_element_type=f32)
    for t in terms[1:]:
        acc += jnp.dot(t, oh_b, preferred_element_type=f32)
    return acc


def _gather_fwd_kernel(tabT_ref, idx_ref, out_ref):
    # idx < 0 (miss/idle lanes) matches no one-hot row -> zero output; a
    # 2048-lane sub-block with NO valid index (an idle tile-iteration of
    # the fused replay) skips its matmul and writes zeros. Four sub-blocks
    # per grid step amortize the per-step overhead that dominated at the
    # exact replay budgets.
    f32 = tabT_ref.dtype
    p_pad = tabT_ref.shape[1]
    terms = _bf16_split3(tabT_ref[...])
    for s in range(_GATHER_LANES // _GATHER_SUB):
        sl = pl.ds(s * _GATHER_SUB, _GATHER_SUB)
        idx = idx_ref[0, 0, sl]

        @pl.when(jnp.any(idx >= 0))
        def _live(idx=idx, sl=sl):
            iot = jax.lax.broadcasted_iota(
                jnp.int32, (p_pad, _GATHER_SUB), 0)
            oh_b = (iot == idx[None, :]).astype(jnp.bfloat16)
            out_ref[:, sl] = _split_dot(terms, oh_b, f32)

        @pl.when(jnp.logical_not(jnp.any(idx >= 0)))
        def _idle(sl=sl):
            out_ref[:, sl] = jnp.zeros((out_ref.shape[0], _GATHER_SUB), f32)


def _gather_bwd_kernel(gT_ref, idx_ref, out_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros(acc_ref.shape, gT_ref.dtype)

    # a sub-block with no valid index (idle tile-iteration -> all-zero
    # cotangents) contributes exactly nothing — skip its transposed matmul
    for s in range(_GATHER_LANES // _GATHER_SUB):
        sl = pl.ds(s * _GATHER_SUB, _GATHER_SUB)
        idx = idx_ref[0, 0, sl]

        @pl.when(jnp.any(idx >= 0))
        def _(idx=idx, sl=sl):
            f32 = gT_ref.dtype
            iot = jax.lax.broadcasted_iota(
                jnp.int32, (out_ref.shape[1], _GATHER_SUB), 0)
            oh_b = (iot == idx[None, :]).astype(jnp.bfloat16)
            # d_tabT[c, p] = sum_r gT[c, r] * oh[p, r] (ray-lane contract);
            # same bf16-split-vs-exact-one-hot identity as the forward
            dn = (((1,), (1,)), ((), ()))
            for t in _bf16_split3(gT_ref[:, sl]):
                acc_ref[...] += jax.lax.dot_general(
                    t, oh_b, dimension_numbers=dn,
                    preferred_element_type=f32)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[...] = acc_ref[...]


def _gather_pad(r: int) -> int:
    return -(-r // _GATHER_LANES) * _GATHER_LANES


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_rows_T(tab, idx, interpret=False):
    """``tab[idx].T`` ([P, C], [R] -> [C, R_pad]) — the gather kernels'
    NATIVE layout (rays on lanes). Prefer this when the consumer wants
    column-major rows (the fused replay): it skips the strided minor-dim
    transpose that ``gather_rows`` pays on both passes. R is padded up to
    the lane-block multiple; cotangents for the pad lanes are ignored."""
    return _gather_fwd_T(tab, idx, interpret)


def _gather_fwd_T(tab, idx, interpret):
    p, c = tab.shape
    r = idx.shape[0]
    r_pad = _gather_pad(r)
    p_pad = max(128, -(-p // 128) * 128)
    tabT = jnp.pad(tab.T, ((0, 0), (0, p_pad - p)))
    idx2 = jnp.pad(idx, (0, r_pad - r)).reshape(-1, 1, _GATHER_LANES)
    nb = idx2.shape[0]
    return pl.pallas_call(
        _gather_fwd_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((c, p_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _GATHER_LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((c, r_pad), tab.dtype),
        out_specs=pl.BlockSpec((c, _GATHER_LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(tabT, idx2)


def _gather_rows_T_fwd(tab, idx, interpret):
    return _gather_fwd_T(tab, idx, interpret), (tab, idx)


def _gather_rows_T_bwd(interpret, res, gT):
    tab, idx = res
    (p, c), dt = tab.shape, tab.dtype
    r = idx.shape[0]
    r_pad = _gather_pad(r)
    p_pad = max(128, -(-p // 128) * 128)
    gTp = gT.astype(dt)  # already [C, R_pad]
    idx2 = jnp.pad(idx, (0, r_pad - r)).reshape(-1, 1, _GATHER_LANES)
    nb = idx2.shape[0]
    d_tabT = pl.pallas_call(
        _gather_bwd_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((c, _GATHER_LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _GATHER_LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((c, p_pad), dt),
        out_specs=pl.BlockSpec((c, p_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((c, p_pad), dt)],
        interpret=interpret,
    )(gTp, idx2)
    import numpy as _np
    return d_tabT.T[:p], _np.zeros(idx.shape, jax.dtypes.float0)


gather_rows_T.defvjp(_gather_rows_T_fwd, _gather_rows_T_bwd)


def gather_rows(tab, idx, interpret=False):
    """``tab[idx]`` ([P, C], [R] int32 -> [R, C]) with a Pallas forward and a
    transposed-contraction Pallas backward (cotangents scatter-add into
    ``tab``). Out-of-range idx (e.g. the replay's clamped miss slots) must be
    pre-clamped to [0, P). f64 tables bypass the MXU kernel (whose bf16
    splits carry only f32-level precision) for an exact XLA gather — the
    f64 path is the small oracle path, where the one-hot HBM traffic the
    kernel avoids does not matter."""
    if tab.dtype == jnp.float64:
        return jnp.take(tab, idx, axis=0)
    return _gather_rows_mxu(tab, idx, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _gather_rows_mxu(tab, idx, interpret=False):
    return _gather_fwd(tab, idx, interpret)


def _gather_fwd(tab, idx, interpret):
    p, c = tab.shape
    r = idx.shape[0]
    r_pad = _gather_pad(r)
    p_pad = max(128, -(-p // 128) * 128)
    tabT = jnp.pad(tab.T, ((0, 0), (0, p_pad - p)))
    idx2 = jnp.pad(idx, (0, r_pad - r)).reshape(-1, 1, _GATHER_LANES)
    nb = idx2.shape[0]
    outT = pl.pallas_call(
        _gather_fwd_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((c, p_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _GATHER_LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((c, r_pad), tab.dtype),
        out_specs=pl.BlockSpec((c, _GATHER_LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(tabT, idx2)
    return outT.T[:r]


def _gather_rows_fwd(tab, idx, interpret):
    return _gather_fwd(tab, idx, interpret), (tab, idx)


def _gather_rows_bwd(interpret, res, g):
    tab, idx = res
    (p, c), dt = tab.shape, tab.dtype
    r = idx.shape[0]
    r_pad = _gather_pad(r)
    p_pad = max(128, -(-p // 128) * 128)
    gT = jnp.pad(g.astype(dt).T, ((0, 0), (0, r_pad - r)))
    # padding lanes carry idx 0 but zero cotangent, so they contribute nothing
    idx2 = jnp.pad(idx, (0, r_pad - r)).reshape(-1, 1, _GATHER_LANES)
    nb = idx2.shape[0]
    d_tabT = pl.pallas_call(
        _gather_bwd_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((c, _GATHER_LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _GATHER_LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((c, p_pad), dt),
        out_specs=pl.BlockSpec((c, p_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((c, p_pad), dt)],
        interpret=interpret,
    )(gT, idx2)
    import numpy as _np
    return d_tabT.T[:p], _np.zeros(idx.shape, jax.dtypes.float0)


_gather_rows_mxu.defvjp(_gather_rows_fwd, _gather_rows_bwd)


# --------------------------------------------------------------------------
# Fused Pallas replay: fwd + hand-paired bwd kernels (custom_vjp)
# --------------------------------------------------------------------------
#
# The XLA scan replay pays ~1 ms/iteration in unfused intermediates and
# cannot skip the iterations a tile spends idle (after its samples finish,
# ~60% of the budget at the default K). These kernels run the same step as
# one Pallas grid (tiles x iterations): the forward stores each iteration's
# entry state to HBM and accumulates radiance in VMEM; the backward walks
# the grid in reverse, recomputes the step from the stored state, and
# applies its vector-Jacobian product via jax.vjp INSIDE the kernel (the
# step is pure elementwise math, so its transpose lowers to the same
# select/multiply ops). Idle iterations skip compute in both directions.
#
# Differentiability composes at the XLA level: the winner rows enter as a
# precomputed input from gather_rows (custom_vjp over the table), and the
# fused replay's backward emits per-iteration row cotangents.

_ST_ROWS = 10  # ox oy oz dx dy dz tau thx thy thz


def _pp_step_c(st, row, aux, hit, miss, is_tri, *, has_motion, with_sph,
               with_tri, t_min):
    """One replay iteration on [rs, 128] components. ``st`` is the raw
    carry BEFORE respawn; ``row`` the 20 winner-row components
    (differentiable); ``aux`` the 13 recorded aux rows (non-diff);
    ``hit``/``is_tri`` masks derived from the winner index. Returns
    (new_state, radiance_add). Mirrors replay_pp's scan body term for
    term (which mirrors the megakernel and material.zig/geom.zig)."""
    (ox, oy, oz, dx, dy, dz, tau, thx, thy, thz) = st
    (ux, uy, uz, cb, us, sox, soy, soz, sdx, sdy, sdz, stau, flg) = aux
    spawn = flg - 2.0 * jnp.floor(flg * 0.5) >= 0.5
    cont = flg >= 2.0

    ox = jnp.where(spawn, sox, ox)
    oy = jnp.where(spawn, soy, oy)
    oz = jnp.where(spawn, soz, oz)
    dx = jnp.where(spawn, sdx, dx)
    dy = jnp.where(spawn, sdy, dy)
    dz = jnp.where(spawn, sdz, dz)
    tau = jnp.where(spawn, stau, tau)
    thx = jnp.where(spawn, 1.0, thx)
    thy = jnp.where(spawn, 1.0, thy)
    thz = jnp.where(spawn, 1.0, thz)

    a = dx * dx + dy * dy + dz * dz

    def safe_sqrt(x):
        pos = x > 0.0
        return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)

    if with_sph:
        cx, cy, cz = row[0], row[1], row[2]
        if has_motion:
            cx = cx + tau * row[3]
            cy = cy + tau * row[4]
            cz = cz + tau * row[5]
        rad = row[6]
        cox, coy, coz = cx - ox, cy - oy, cz - oz
        half_b = dx * cox + dy * coy + dz * coz
        c_term = cox * cox + coy * coy + coz * coz - rad * rad
        disc = half_b * half_b - a * c_term
        rt = safe_sqrt(disc)
        q1 = half_b - rt
        q2 = half_b + rt
        q = jnp.where(q1 >= t_min * a, q1, q2)
        t_sph = q / a
    if with_tri:
        v0x, v0y, v0z = row[0], row[1], row[2]
        e1x, e1y, e1z = row[3] - v0x, row[4] - v0y, row[5] - v0z
        e2x, e2y, e2z = row[6] - v0x, row[7] - v0y, row[8] - v0z
        pnx = e1y * e2z - e1z * e2y
        pny = e1z * e2x - e1x * e2z
        pnz = e1x * e2y - e1y * e2x
        ndd = pnx * dx + pny * dy + pnz * dz
        ndd_safe = jnp.where(jnp.abs(ndd) > 0.0, ndd, 1.0)
        t_tri = (pnx * (v0x - ox) + pny * (v0y - oy)
                 + pnz * (v0z - oz)) / ndd_safe

    if with_sph and with_tri:
        t_hit = jnp.where(is_tri, t_tri, t_sph)
    elif with_tri:
        t_hit = t_tri
    else:
        t_hit = t_sph
    ts = jnp.where(hit, t_hit, 1.0)
    px_ = ox + ts * dx
    py_ = oy + ts * dy
    pz_ = oz + ts * dz

    if with_sph and with_tri:
        nx = jnp.where(is_tri, pnx, px_ - cx)
        ny = jnp.where(is_tri, pny, py_ - cy)
        nz = jnp.where(is_tri, pnz, pz_ - cz)
    elif with_tri:
        nx, ny, nz = pnx, pny, pnz
    else:
        nx = px_ - cx
        ny = py_ - cy
        nz = pz_ - cz
    ninv = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-24))
    nx, ny, nz = nx * ninv, ny * ninv, nz * ninv
    front = nx * dx + ny * dy + nz * dz < 0.0
    sgn = jnp.where(front, 1.0, -1.0)
    nx, ny, nz = nx * sgn, ny * sgn, nz * sgn

    kind = row[9]
    method = row[10]
    fuzz = row[11]
    # Sanitize the two division sources against the all-zero rows that
    # miss/idle lanes receive under the raw-index gather: a 0 scale or 0
    # IOR never occurs on a REAL winner row (solid textures store scale 1,
    # dielectrics a physical IOR), but 1/0 = inf here would poison the
    # in-kernel VJP through Inf*0 even under the recorded-control masks.
    # The floor must keep 1/x^2 (the division's VJP factor) finite in f32,
    # hence 1e-6, orders of magnitude below any physical scale or IOR.
    ior = jnp.maximum(row[12], 1e-6)
    isc = 1.0 / jnp.maximum(row[13], 1e-6)
    par = (jnp.floor(px_ * isc) + jnp.floor(py_ * isc)
           + jnp.floor(pz_ * isc))
    even_par = par - 2.0 * jnp.floor(par * 0.5) < 0.5
    alr = jnp.where(even_par, row[14], row[17])
    alg = jnp.where(even_par, row[15], row[18])
    alb = jnp.where(even_par, row[16], row[19])

    # ---- diffuse ----
    sx, sy, sz = ux * cb, uy * cb, uz * cb
    flip = jnp.where(sx * nx + sy * ny + sz * nz > 0.0, 1.0, -1.0)
    m0 = method == DIFFUSE_UNIT_SPHERE
    m1 = method == DIFFUSE_UNIT_SPHERE_SURFACE
    offx = jnp.where(m0, nx + sx, jnp.where(m1, nx + ux, sx * flip))
    offy = jnp.where(m0, ny + sy, jnp.where(m1, ny + uy, sy * flip))
    offz = jnp.where(m0, nz + sz, jnp.where(m1, nz + uz, sz * flip))
    tgx, tgy, tgz = px_ + offx, py_ + offy, pz_ + offz
    nz_tgt = ((jnp.abs(tgx) <= 1e-8) & (jnp.abs(tgy) <= 1e-8)
              & (jnp.abs(tgz) <= 1e-8))
    tgx = jnp.where(nz_tgt, nx, tgx)
    tgy = jnp.where(nz_tgt, ny, tgy)
    tgz = jnp.where(nz_tgt, nz, tgz)
    difx, dify, difz = tgx - px_, tgy - py_, tgz - pz_

    # ---- metallic ----
    ddn = dx * nx + dy * ny + dz * nz
    rfx = dx - 2.0 * ddn * nx
    rfy = dy - 2.0 * ddn * ny
    rfz = dz - 2.0 * ddn * nz
    rinv = jax.lax.rsqrt(jnp.maximum(rfx * rfx + rfy * rfy + rfz * rfz,
                                     1e-24))
    fz = jnp.minimum(fuzz, 1.0)
    mex = rfx * rinv + fz * ux
    mey = rfy * rinv + fz * uy
    mez = rfz * rinv + fz * uz

    # ---- dielectric ----
    eta = jnp.where(front, 1.0 / ior, ior)
    dinv = jax.lax.rsqrt(jnp.maximum(a, 1e-24))
    udx, udy, udz = dx * dinv, dy * dinv, dz * dinv
    cos_t = -(udx * nx + udy * ny + udz * nz)
    sin_t = safe_sqrt(1.0 - cos_t * cos_t)
    cannot = eta * sin_t > 1.0
    r0 = (1.0 - eta) / (1.0 + eta)
    r0 = r0 * r0
    om = 1.0 - cos_t
    om2 = om * om
    refl_p = r0 + (1.0 - r0) * om2 * om2 * om
    do_refl = cannot | (refl_p > us)
    ppx = (udx + cos_t * nx) * eta
    ppy = (udy + cos_t * ny) * eta
    ppz = (udz + cos_t * nz) * eta
    parm = -safe_sqrt(1.0 - (ppx * ppx + ppy * ppy + ppz * ppz))
    dlx = jnp.where(do_refl, rfx, ppx + parm * nx)
    dly = jnp.where(do_refl, rfy, ppy + parm * ny)
    dlz = jnp.where(do_refl, rfz, ppz + parm * nz)

    is_m = kind == float(MAT_METALLIC)
    is_d = kind == float(MAT_DIELECTRIC)
    ndirx = jnp.where(is_d, dlx, jnp.where(is_m, mex, difx))
    ndiry = jnp.where(is_d, dly, jnp.where(is_m, mey, dify))
    ndirz = jnp.where(is_d, dlz, jnp.where(is_m, mez, difz))
    atr = jnp.where(is_d, 1.0, alr)
    atg = jnp.where(is_d, 1.0, alg)
    atb = jnp.where(is_d, 1.0, alb)

    # ---- miss -> sky (reference's exact formula); miss is passed in from
    # the idx plane (idx == -1 means recorded-active-but-missed) ----
    sky_t = 0.5 * (dy * dinv + 1.0)
    skyr = (1.0 - sky_t + 0.5) * sky_t
    skyg = (1.0 - sky_t + 0.7) * sky_t
    skyb = (1.0 - sky_t + 1.0) * sky_t
    zf = jnp.zeros_like(thx)
    out_add = (jnp.where(miss, thx * skyr, zf),
               jnp.where(miss, thy * skyg, zf),
               jnp.where(miss, thz * skyb, zf))

    # state update gated by the RECORDED continue flag
    new_st = (jnp.where(cont, px_, ox), jnp.where(cont, py_, oy),
              jnp.where(cont, pz_, oz),
              jnp.where(cont, ndirx, dx), jnp.where(cont, ndiry, dy),
              jnp.where(cont, ndirz, dz), tau,
              jnp.where(cont, thx * atr, thx),
              jnp.where(cont, thy * atg, thy),
              jnp.where(cont, thz * atb, thz))
    return new_st, out_add


_FUSED_IG = 8  # replay iterations per grid step (amortizes step overhead; 16 exceeds the fused backward VMEM stack)


def _fused_fwd_kernel(rows_ref, aux_ref, idx_ref, st0_ref, out_ref,
                      st_out_ref, fin_ref, st_ref, acc_ref, *, kcfg):
    """Grid = (tiles, K/_FUSED_IG); each step runs _FUSED_IG replay
    iterations. Per iteration: write the entry state to HBM (for the
    backward), run one replay step, accumulate radiance in VMEM; write the
    radiance and the FINAL carry (for straggler-compaction resume) at the
    last group. Idle iterations (no recorded-active slot in the tile) skip
    everything but the state write. ``st0`` is the initial carry — default
    (o=0, d=z_hat, thr=1) for a fresh recording, or the previous pass's
    final carry when replaying a RESUMED recording."""
    grp = pl.program_id(1)
    f32 = jnp.float32
    rs = st_ref.shape[1]
    shape = (rs, 128)
    ig = idx_ref.shape[0]

    @pl.when(grp == 0)
    def _init():
        st_ref[...] = jnp.zeros(st_ref.shape, f32)
        for k in range(_ST_ROWS):
            st_ref[k] = st0_ref[k]
        acc_ref[...] = jnp.zeros((3, rs, 128), f32)

    for g in range(ig):
        idx = idx_ref[g]
        any_live = jnp.any(idx >= -1)

        @pl.when(any_live)
        def _work(g=g, idx=idx):
            st_out_ref[:, g] = st_ref[...]
            st = tuple(st_ref[k] for k in range(_ST_ROWS))
            row = tuple(rows_ref[k, g] for k in range(20))
            aux = tuple(aux_ref[g, k] for k in range(_AUX_ROWS))
            hit = idx >= 0
            miss = idx == -1
            is_tri = idx >= kcfg["n_sph_pad"]
            new_st, out_add = _pp_step_c(
                st, row, aux, hit, miss, is_tri,
                has_motion=kcfg["has_motion"], with_sph=kcfg["with_sph"],
                with_tri=kcfg["with_tri"], t_min=kcfg["t_min"])
            for k in range(_ST_ROWS):
                st_ref[k] = new_st[k]
            acc_ref[0] += out_add[0]
            acc_ref[1] += out_add[1]
            acc_ref[2] += out_add[2]

    @pl.when(grp == pl.num_programs(1) - 1)
    def _final():
        out_ref[...] = acc_ref[...]
        for k in range(_ST_ROWS):
            fin_ref[k] = st_ref[k]


def _fused_bwd_kernel(rows_ref, aux_ref, idx_ref, st_in_ref, g_ref,
                      gfin_ref, drows_ref, dst0_ref, dst_ref, *, kcfg):
    """Reverse walk of the fused replay (grid iteration t maps to replay
    iteration K-1-t via the index maps). Recomputes the step from the stored
    entry state and applies its VJP with jax.vjp — the step is elementwise,
    so the transpose lowers to plain VPU ops. Cotangents: the radiance
    cotangent g enters every iteration's out_add; the state cotangent is
    carried in VMEM scratch; the winner-row cotangent is written per
    iteration (the table cotangent is assembled outside by the gather's
    transposed matmul). The carry cotangent starts from the FINAL-carry
    cotangent ``gfin`` (nonzero when a compacted resume pass consumed this
    replay's final carry) and, after walking back through iteration 0,
    lands in ``dst0`` — the initial-carry cotangent."""
    t = pl.program_id(1)
    f32 = jnp.float32
    rs = dst_ref.shape[1]
    ig = idx_ref.shape[0]

    @pl.when(t == 0)
    def _init():
        dst_ref[...] = jnp.zeros(dst_ref.shape, f32)
        for k in range(_ST_ROWS):
            dst_ref[k] = gfin_ref[k]

    for g in range(ig - 1, -1, -1):  # reverse within the (reversed) group
        idx = idx_ref[g]
        any_live = jnp.any(idx >= -1)

        @pl.when(jnp.logical_not(any_live))
        def _idle(g=g):
            drows_ref[:, g] = jnp.zeros((drows_ref.shape[0], rs, 128), f32)

        @pl.when(any_live)
        def _work(g=g, idx=idx):
            st = tuple(st_in_ref[k, g] for k in range(_ST_ROWS))
            row = tuple(rows_ref[k, g] for k in range(20))
            aux = tuple(aux_ref[g, k] for k in range(_AUX_ROWS))
            hit = idx >= 0
            miss = idx == -1
            is_tri = idx >= kcfg["n_sph_pad"]

            def f(st, row):
                return _pp_step_c(
                    st, row, aux, hit, miss, is_tri,
                    has_motion=kcfg["has_motion"], with_sph=kcfg["with_sph"],
                    with_tri=kcfg["with_tri"], t_min=kcfg["t_min"])

            _, vjp = jax.vjp(f, st, row)
            d_new_st = tuple(dst_ref[k] for k in range(_ST_ROWS))
            d_out = (g_ref[0], g_ref[1], g_ref[2])
            d_st, d_row = vjp((d_new_st, d_out))
            for k in range(_ST_ROWS):
                dst_ref[k] = d_st[k]
            for k in range(20):
                drows_ref[k, g] = d_row[k]

    @pl.when(t == pl.num_programs(1) - 1)
    def _emit_dst0():
        for k in range(_ST_ROWS):
            dst0_ref[k] = dst_ref[k]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused_replay(rows4, aux4, idx3, st0, kcfg, interpret):
    """rows4 [K, 24(padded 20), nsub, 128] f32 (differentiable), aux4
    [K, _AUX_ROWS+3 pad, nsub, 128], idx3 [K, nsub, 128] i32, st0
    [_ST_ROWS, nsub, 128] f32 initial carry (differentiable — the previous
    pass's final carry under straggler compaction) -> (radiance
    [3, nsub, 128] slot sums, final carry [_ST_ROWS, nsub, 128]). ``kcfg``
    is a hashable tuple-of-pairs."""
    out, fin, _ = _fused_replay_fwd_impl(rows4, aux4, idx3, st0, kcfg,
                                         interpret)
    return out, fin


def _fused_replay_fwd_impl(rows4, aux4, idx3, st0, kcfg, interpret):
    kc = dict(kcfg)
    n_cols, k_it, nsub, _ = rows4.shape
    rs = kc["rs"]
    n_tiles = nsub // rs
    ig = _FUSED_IG if k_it % _FUSED_IG == 0 else 1
    kern = functools.partial(_fused_fwd_kernel, kcfg=kc)
    st_spec = pl.BlockSpec((_ST_ROWS, rs, 128), lambda i, t: (0, i, 0),
                           memory_space=pltpu.VMEM)
    out, st_out, fin = pl.pallas_call(
        kern,
        grid=(n_tiles, k_it // ig),
        in_specs=[
            pl.BlockSpec((n_cols, ig, rs, 128), lambda i, t: (0, t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ig, aux4.shape[1], rs, 128),
                         lambda i, t: (t, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ig, rs, 128), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM),
            st_spec,
        ],
        out_shape=(
            jax.ShapeDtypeStruct((3, nsub, 128), jnp.float32),
            jax.ShapeDtypeStruct((_ST_ROWS + 6, k_it, nsub, 128),
                                 jnp.float32),
            jax.ShapeDtypeStruct((_ST_ROWS, nsub, 128), jnp.float32),
        ),
        out_specs=(
            pl.BlockSpec((3, rs, 128), lambda i, t: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ST_ROWS + 6, ig, rs, 128),
                         lambda i, t: (0, t, i, 0),
                         memory_space=pltpu.VMEM),
            st_spec,
        ),
        scratch_shapes=[
            pltpu.VMEM((_ST_ROWS + 6, rs, 128), jnp.float32),
            pltpu.VMEM((3, rs, 128), jnp.float32),
        ],
        interpret=interpret,
    )(rows4, aux4, idx3, st0)
    return out, fin, st_out


def _fused_replay_vjp_fwd(rows4, aux4, idx3, st0, kcfg, interpret):
    out, fin, st_out = _fused_replay_fwd_impl(rows4, aux4, idx3, st0, kcfg,
                                              interpret)
    return (out, fin), (rows4, aux4, idx3, st_out)


def _fused_replay_vjp_bwd(kcfg, interpret, res, g):
    import numpy as _np

    rows4, aux4, idx3, st_out = res
    g_out, g_fin = g
    kc = dict(kcfg)
    n_cols, k_it, nsub, _ = rows4.shape
    rs = kc["rs"]
    n_tiles = nsub // rs
    ig = _FUSED_IG if k_it % _FUSED_IG == 0 else 1
    rev = k_it // ig - 1
    kern = functools.partial(_fused_bwd_kernel, kcfg=kc)
    st_spec = pl.BlockSpec((_ST_ROWS, rs, 128), lambda i, t: (0, i, 0),
                           memory_space=pltpu.VMEM)
    drows, dst0 = pl.pallas_call(
        kern,
        grid=(n_tiles, k_it // ig),
        in_specs=[
            pl.BlockSpec((n_cols, ig, rs, 128),
                         lambda i, t: (0, rev - t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ig, aux4.shape[1], rs, 128),
                         lambda i, t: (rev - t, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ig, rs, 128), lambda i, t: (rev - t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ST_ROWS + 6, ig, rs, 128),
                         lambda i, t: (0, rev - t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, rs, 128), lambda i, t: (0, i, 0),
                         memory_space=pltpu.VMEM),
            st_spec,
        ],
        out_shape=(
            jax.ShapeDtypeStruct((n_cols, k_it, nsub, 128), jnp.float32),
            jax.ShapeDtypeStruct((_ST_ROWS, nsub, 128), jnp.float32),
        ),
        out_specs=(
            pl.BlockSpec((n_cols, ig, rs, 128),
                         lambda i, t: (0, rev - t, i, 0),
                         memory_space=pltpu.VMEM),
            st_spec,
        ),
        scratch_shapes=[
            pltpu.VMEM((_ST_ROWS + 6, rs, 128), jnp.float32),
        ],
        interpret=interpret,
    )(rows4, aux4, idx3, st_out, g_out, g_fin)
    # aux4 is float but flows from stop_gradient upstream: a real zero
    # cotangent (DCE'd by XLA); idx3 is integer -> float0.
    return (drows, jnp.zeros(aux4.shape, aux4.dtype),
            _np.zeros(idx3.shape, jax.dtypes.float0), dst0)


_fused_replay.defvjp(_fused_replay_vjp_fwd, _fused_replay_vjp_bwd)


def _default_carry(nsub: int):
    """Fresh-recording initial carry: o=0, d=z_hat (non-degenerate), tau=0,
    thr=1 — matches replay_pp's scan init. Every live slot's first recorded
    iteration is a spawn, so this only matters for RESUMED recordings."""
    st0 = jnp.zeros((_ST_ROWS, nsub, 128), jnp.float32)
    return st0.at[5].set(1.0).at[7:10].set(1.0)


def replay_pp_fused(scene: Scene, idx, aux, *, t_min: float,
                    tile_sublanes: int = 16, interpret=False,
                    init_carry=None, return_final: bool = False):
    """Fused-kernel equivalent of :func:`replay_pp` (same estimator, same
    gradients): gathers all winner rows once with :func:`gather_rows`
    (differentiable in the table), then runs the Pallas forward/backward
    iteration kernels. f32 only; off-TPU it runs under plain interpret.

    ``init_carry`` ([_ST_ROWS, R] f32: o, d, tau, thr) replays a RESUMED
    recording from the given per-slot carry; ``return_final=True`` also
    returns the final carry in the same layout. Both are differentiable —
    under straggler compaction the phase-2 radiance backpropagates through
    the phase-1 replay's final throughput/ray state."""
    k_it, r = idx.shape
    rs = tile_sublanes
    nsub = r // 128
    assert nsub % rs == 0, "caller must pad R to the tile size"
    tab = _diff_tables(scene).astype(jnp.float32)
    aux = jax.lax.stop_gradient(aux).astype(jnp.float32)

    # RAW indices: negatives (miss -1 / idle -2) match no one-hot row ->
    # zero rows, and all-idle 2048-lane blocks (which align 1:1 with the
    # fused kernels' idle tile-iterations at rs=16) skip their matmul. The
    # fused forward never READS an idle iteration's rows; live iterations
    # consume miss lanes only under recorded-control selects whose
    # not-taken branches stay finite for zero rows (floor and where have
    # zero-gradient transposes, so no Inf*0 reaches the backward either).
    i_flat = idx.reshape(-1)
    # [20, K*R] (gather pads the lane dim up to its block size; slice
    # back). The fused kernels consume this NATIVE layout viewed as
    # [20, K, nsub, 128] — block alignment only constrains the trailing
    # two dims, so no transpose and no pad is ever paid on the 670 MB of
    # row data (the XLA transpose measured 44 ms per pass).
    rowsT = gather_rows_T(tab, i_flat, bool(interpret))[:, :k_it * r]
    rows4 = rowsT.reshape(20, k_it, nsub, 128)
    aux4 = aux.reshape(k_it, _AUX_ROWS, nsub, 128)
    idx3 = idx.reshape(k_it, nsub, 128)

    if init_carry is None:
        st0 = _default_carry(nsub)
    else:
        st0 = init_carry.astype(jnp.float32).reshape(_ST_ROWS, nsub, 128)

    kcfg = tuple(sorted({
        "rs": rs,
        "n_sph_pad": (int(scene.sphere_radius.shape[0])
                      if scene.n_spheres > 0 else 0),
        "with_sph": scene.n_spheres > 0,
        "with_tri": scene.n_triangles > 0,
        "has_motion": scene.has_motion,
        "t_min": float(t_min),
    }.items()))
    out, fin = _fused_replay(rows4, aux4, idx3, st0, kcfg, bool(interpret))
    rad = jnp.transpose(out, (1, 2, 0)).reshape(r, 3)
    if return_final:
        return rad, fin.reshape(_ST_ROWS, r)
    return rad
