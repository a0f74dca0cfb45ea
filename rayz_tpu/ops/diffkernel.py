"""Fast differentiable rendering: Pallas path recording + XLA replay.

Reverse-mode AD through the dense integrator (:mod:`rayz_tpu.ops.integrator`)
must either store or rematerialize every bounce's [rays, spheres] intersection
intermediates — O(R*N) HBM traffic per bounce in the backward sweep, ~100x
slower than the forward megakernel and OOM-prone at benchmark sizes. This
module removes the O(N) factor from the differentiable graph entirely by
splitting the estimator the TPU-native way (SURVEY.md §7 "backward memory"):

1. **Record** (Pallas, non-differentiable): a megakernel variant traces every
   pixel sample at full VPU speed and writes only the per-bounce winning
   primitive index [depth, R] (i32; -1 = miss/dead). All randomness is
   generated host-side by ``jax.random`` and fed to the kernel, so the replay
   consumes bit-identical samples.
2. **Replay** (XLA, differentiable): with the discrete winner fixed, each
   bounce is an O(R) computation — gather the winning sphere's parameters,
   re-derive the hit distance from the quadratic (smooth in center/radius),
   re-run scatter with the same random numbers, accumulate radiance.
   Reverse-mode AD of the replay touches only [R]-sized tensors; gradients
   flow to sphere centers/radii/velocities, texture colors, fuzz, and IOR —
   identical surfaces to the dense path. Discrete events (winner identity,
   hit/miss, Schlick coin, checker parity) are frozen: their derivative is
   zero almost everywhere anyway (SURVEY.md §7 "hard parts").

The replay mirrors the megakernel's formulas term for term (which themselves
mirror material.zig / geom.zig / renderer.zig — see
:mod:`rayz_tpu.ops.megakernel`), so record and replay traverse the same path;
a float-level disagreement can only flip a measure-zero boundary case.

Scope: any sphere/triangle scene. Winner indices are recorded across both
primitive classes (spheres first, triangles offset by the padded sphere
count); the replay re-derives a sphere winner's distance from the quadratic
(smooth in center/radius/velocity) and a triangle winner's from the plane
equation of its raw vertices (smooth in v0/v1/v2), so gradients reach the
full BASELINE parameter surface including triangle vertices.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.camera import Camera, generate_rays
from ..models.scene import (
    DIFFUSE_UNIT_SPHERE,
    DIFFUSE_UNIT_SPHERE_SURFACE,
    MAT_DIELECTRIC,
    MAT_METALLIC,
    Scene,
    _round_up,
)
from .integrator import RenderConfig, _pixel_grid
from .megakernel import (
    _CCMR2,
    _CV2,
    _CX,
    _CY,
    _CZ,
    _IOS,
    _PKF,
    _VV,
    _VX,
    _VY,
    _VZ,
    _BIG,
    _TNX,
    _TNY,
    _TNZ,
    _TNV0,
    _TG1X,
    _TG1Y,
    _TG1Z,
    _TG1V,
    _TG2X,
    _TG2Y,
    _TG2Z,
    _TG2V,
    _TPKF,
    _TIOS,
    _NROWS,
    _TNROWS,
    _block_rows,
    _pad_poison,
    _sphere_aabbs,
    _tri_aabbs,
    is_prng_key,
    scene_tables,
    tri_tables,
)
__all__ = ["render_diff", "render_diff_flat", "supports_diff",
           "fits_smem_record", "record_paths", "replay_paths",
           "default_interpret"]


def supports_diff(scene: Scene) -> bool:
    """Record/replay covers any non-empty sphere/triangle scene — the full
    differentiable-parameter surface of BASELINE config 5 plus triangle
    vertices (the winner index is recorded across both primitive classes; the
    replay's plane-distance/normal are smooth in v0/v1/v2). Nested-checker
    scenes are excluded: the replay resolves one checker level (like the
    megakernel) and would silently shade differently than the dense path."""
    return ((scene.n_spheres > 0 or scene.n_triangles > 0)
            and not scene.deep_checker)


def fits_smem_record(scene: Scene) -> bool:
    """Whether the record kernel's SMEM tables (full-table sphere + triangle
    rows, no gm/culling variants) fit the shared ``SMEM_BUDGET``. Mirrors
    :func:`rayz_tpu.ops.megakernel.fits_smem`'s dispatch discipline for the
    recorded engine (engine.py:25-34): callers check this BEFORE launching so
    an oversized scene degrades to the dense differentiable path instead of
    dying in Mosaic."""
    from .megakernel import SMEM_BUDGET

    n_pad = int(scene.sphere_radius.shape[0]) if scene.n_spheres > 0 else 0
    m_pad = int(scene.tri_material.shape[0]) if scene.n_triangles > 0 else 0
    return 4 * (_NROWS * n_pad + _TNROWS * m_pad) <= SMEM_BUDGET


# --------------------------------------------------------------------------
# 1. Record kernel
# --------------------------------------------------------------------------


def _record_kernel(*args, n_pad: int, m_pad: int, t_min: float,
                   has_motion: bool, rs: int, unroll: int, stream: int = 0,
                   tri_base: int = 0):
    """Grid = (ray tiles, bounces); one step = one bounce of rs*128 rays.

    Making the bounce a grid dimension (instead of an in-kernel loop with
    dynamically indexed VMEM) lets the Pallas pipeline double-buffer each
    bounce's random block with static indexing, and lets a tile whose rays
    are ALL dead skip the primitive loops entirely (``pl.when`` below) — the
    straggler tail costs one DMA per bounce instead of a full O(N) sweep.

    Positional refs: the sphere table iff ``n_pad > 0``, the triangle table
    iff ``m_pad > 0``, then:
    ``ray_ref`` [7, rs, 128]: origin xyz, direction xyz, time (per tile).
    ``rand_ref`` [1, 5, rs, 128]: THIS bounce's unit vector (3), cube-root
    radius factor, Schlick uniform — generated by jax.random host-side.
    ``idx_ref`` [1, rs, 128] i32 out: winning primitive, -1 on miss/dead
    (spheres are [0, n_pad), triangles are tri_base + j).
    ``st_ref`` [6, rs, 128] f32 scratch: current origin/direction, persistent
    across the bounce grid dimension; ``act_ref`` [rs, 128] i32 scratch.

    ``stream > 0`` (round-5 prototype — the beyond-SMEM differentiable
    path): the per-class tables live in HBM padded to a ``stream``-chunk
    multiple, IN ORIGINAL ORDER (recorded indices must line up with
    ``_diff_tables``' raw layout, so no Morton sort), with per-chunk
    bounding-sphere rows resident in SMEM; each chunk's slice is DMA'd into
    SMEM scratch only when the bound test passes (prune before DMA).
    Per-bounce DMA traffic is tiles x chunks-touched x chunk bytes — the
    bounce-synchronous grid keeps this affordable where streaming the
    PERSISTENT recorder is not (PERF.md "bandwidth wall"): the recording
    wavefront architecture, in its simplest form. ``tri_base`` is the RAW
    padded sphere count (the triangle index offset in _diff_tables).
    """
    refs = list(args)
    if stream:
        s_hbm = refs.pop(0) if n_pad else None
        t_hbm = refs.pop(0) if m_pad else None
        s_cbnd = refs.pop(0) if n_pad else None
        t_cbnd = refs.pop(0) if m_pad else None
        ray_ref, rand_ref, idx_ref = refs[:3]
        scr = refs[3:]
        tab_ref = scr.pop(0) if n_pad else None
        tri_ref = scr.pop(0) if m_pad else None
        sem_ref = scr.pop(0)
        st_ref, act_ref = scr
    else:
        tab_ref = refs.pop(0) if n_pad else None
        tri_ref = refs.pop(0) if m_pad else None
        ray_ref, rand_ref, idx_ref, st_ref, act_ref = refs
    f32 = jnp.float32
    i32 = jnp.int32
    shape = (rs, 128)
    bounce_id = pl.program_id(1)

    @pl.when(bounce_id == 0)
    def _init():
        for k in range(6):
            st_ref[k] = ray_ref[k]
        act_ref[...] = jnp.ones(shape, i32)

    tau = ray_ref[6]
    zf = jnp.zeros(shape, f32)
    tmin_c = t_min

    if has_motion:
        tau2 = tau * tau

    active = act_ref[...] > 0

    @pl.when(jnp.logical_not(jnp.any(active)))
    def _skip():
        idx_ref[0] = jnp.full(shape, -1, i32)

    @pl.when(jnp.any(active))
    def _bounce():
        ox, oy, oz = st_ref[0], st_ref[1], st_ref[2]
        dx, dy, dz = st_ref[3], st_ref[4], st_ref[5]

        a = dx * dx + dy * dy + dz * dz
        inv_a = 1.0 / a
        d_dot_o = dx * ox + dy * oy + dz * oz
        o2 = ox * ox + oy * oy + oz * oz
        tmin_a = tmin_c * a

        hit0 = (jnp.full(shape, _BIG, f32),  # q_best = t_best * a
                zf, zf, zf,                  # winner center (at ray time)
                zf, zf,                      # packed kind/method/fuzz; ior
                jnp.full(shape, -1, i32))    # winner index

        def one_sphere(j, h, base=0):
            qb, bcx, bcy, bcz, bpk, bios, bj = h
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
            rt = jnp.sqrt(disc)  # NaN on miss -> all compares false
            q1 = half_b - rt
            q2 = half_b + rt
            qv = jnp.where(q1 >= tmin_a, q1, q2)
            better = (qv >= tmin_a) & (qv < qb)
            qb = jnp.where(better, qv, qb)
            bcx = jnp.where(better, cxe, bcx)
            bcy = jnp.where(better, cye, bcy)
            bcz = jnp.where(better, cze, bcz)
            bpk = jnp.where(better, tab_ref[_PKF, j], bpk)
            bios = jnp.where(better, tab_ref[_IOS, j], bios)
            bj = jnp.where(better, base + j, bj)
            return qb, bcx, bcy, bcz, bpk, bios, bj

        def one_triangle(j, h, base=0):
            """Plane-then-barycentric test (megakernel one_triangle in record
            form): the carry's center slots hold the PLANE NORMAL for a
            triangle winner, and the index is offset by tri_base (the raw
            padded sphere count — _diff_tables' triangle row origin)."""
            qb, bcx, bcy, bcz, bpk, bios, bj = h
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
            better = ((qv >= tmin_a) & (qv < qb)
                      & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0))
            qb = jnp.where(better, qv, qb)
            bcx = jnp.where(better, tnx, bcx)
            bcy = jnp.where(better, tny, bcy)
            bcz = jnp.where(better, tnz, bcz)
            bpk = jnp.where(better, tri_ref[_TPKF, j], bpk)
            bios = jnp.where(better, tri_ref[_TIOS, j], bios)
            bj = jnp.where(better, tri_base + base + j, bj)
            return qb, bcx, bcy, bcz, bpk, bios, bj

        def _streamed_class(h, n_items, hbm_ref, cbnd_ref, scr_ref,
                            sem_slot, one_fn):
            """Chunked sweep over an HBM table in ORIGINAL order: per chunk,
            a tile-wide bounding-sphere test (rows resident in SMEM) gates
            the DMA + sweep; recorded indices are chunk-global."""
            n_chunks = n_items // stream

            def chunk_body(c, h):
                qb = h[0]
                bx = cbnd_ref[0, c]
                by = cbnd_ref[1, c]
                bz = cbnd_ref[2, c]
                ccb = cbnd_ref[3, c]
                hb = dx * bx + dy * by + dz * bz - d_dot_o
                ob = ox * bx + oy * by + oz * bz
                disc = hb * hb - a * (ccb - 2.0 * ob + o2)
                rtb = jnp.sqrt(disc)  # NaN on miss -> compares false
                possible = active & (hb - rtb < qb) & (hb + rtb >= tmin_a)

                def run(h):
                    cp = pltpu.make_async_copy(
                        hbm_ref.at[:, pl.ds(c * stream, stream)], scr_ref,
                        sem_ref.at[sem_slot])
                    cp.start()
                    cp.wait()

                    def group(i, h):
                        for k in range(unroll):
                            h = one_fn(unroll * i + k, h, base=c * stream)
                        return h

                    return jax.lax.fori_loop(0, stream // unroll, group, h)

                return jax.lax.cond(jnp.any(possible), run, lambda h: h, h)

            return jax.lax.fori_loop(0, n_chunks, chunk_body, h)

        h = hit0
        if n_pad:
            if stream:
                h = _streamed_class(h, n_pad, s_hbm, s_cbnd, tab_ref, 0,
                                    one_sphere)
            else:
                def sphere_body(i, h):
                    for k in range(unroll):
                        h = one_sphere(unroll * i + k, h)
                    return h
                h = jax.lax.fori_loop(
                    0, (n_pad + unroll - 1) // unroll, sphere_body, h)
        if m_pad:
            if stream:
                h = _streamed_class(h, m_pad, t_hbm, t_cbnd, tri_ref, 1,
                                    one_triangle)
            else:
                def tri_body(i, h):
                    for k in range(unroll):
                        h = one_triangle(unroll * i + k, h)
                    return h
                h = jax.lax.fori_loop(
                    0, (m_pad + unroll - 1) // unroll, tri_body, h)
        qb, bcx, bcy, bcz, bpk, bios, bj = h

        hit = qb < _BIG
        ts = jnp.where(hit, qb * inv_a, 1.0)
        bkm = jnp.floor(bpk * 0.25)
        bfz = (bpk - 4.0 * bkm) * 0.5
        px_ = ox + ts * dx
        py_ = oy + ts * dy
        pz_ = oz + ts * dz

        # outward normal: sphere = p - c; triangle = the plane normal carried
        # in the center slots (winner class from the index offset; tri_base
        # is the RAW sphere count — with streaming the sphere table pads
        # further, but poisoned columns never win, so raw-vs-padded is safe).
        if m_pad and n_pad:
            is_tri = bj >= tri_base
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

        ux = rand_ref[0, 0]
        uy = rand_ref[0, 1]
        uz = rand_ref[0, 2]
        cb = rand_ref[0, 3]
        us = rand_ref[0, 4]

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
        bio = bios
        eta = jnp.where(front, 1.0 / bio, bio)
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
        parm = -jnp.sqrt(jnp.maximum(1.0 - (ppx * ppx + ppy * ppy + ppz * ppz),
                                     0.0))
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

        idx_ref[0] = jnp.where(active & hit, bj, -1)

        cont = active & hit & scattered
        st_ref[0] = jnp.where(cont, px_, ox)
        st_ref[1] = jnp.where(cont, py_, oy)
        st_ref[2] = jnp.where(cont, pz_, oz)
        st_ref[3] = jnp.where(cont, ndirx, dx)
        st_ref[4] = jnp.where(cont, ndiry, dy)
        st_ref[5] = jnp.where(cont, ndirz, dz)
        act_ref[...] = cont.astype(i32)


#: Streamed-record chunk size (primitives per HBM->SMEM DMA when the scene
#: exceeds the record kernel's SMEM budget). 2048 keeps the two padded
#: chunk scratch buffers (24 rows x chunk x 4 B each) well under SMEM.
RECORD_STREAM_CHUNK = 2048


def record_paths(scene: Scene, origin, direction, time, rand, *,
                 max_depth: int, t_min: float, tile_sublanes: int = 16,
                 unroll: int = 8, interpret=False,
                 stream=None) -> jnp.ndarray:
    """Trace rays through the scene, returning per-bounce winner indices
    [max_depth, R] (i32; -1 = miss/dead, spheres in [0, N_pad), triangles at
    N_pad + j). Non-differentiable by construction: all inputs pass through
    stop_gradient.

    ``rand`` is [max_depth, 5, R]: rows 0-2 a unit vector, row 3 the
    cube-root radius factor u^(1/3), row 4 the Schlick uniform. R must be a
    multiple of tile_sublanes*128 (the caller pads).

    ``stream`` (default None = auto): scenes beyond the SMEM budget record
    with HBM-streamed table chunks behind resident chunk bounds — the
    beyond-13k differentiable path (round-5 prototype; see the kernel
    docstring and PERF.md's "bandwidth wall" section for why this
    bounce-synchronous recorder can stream where the persistent one
    cannot). Pass an int to force a chunk size, 0 to force in-SMEM.
    """
    rs = tile_sublanes
    r_total = origin.shape[0]
    nsub = r_total // 128
    assert nsub * 128 == r_total and nsub % rs == 0, "caller must pad R"
    if stream is None:
        stream = 0 if fits_smem_record(scene) else RECORD_STREAM_CHUNK
    if stream:
        assert stream % unroll == 0 and stream % 128 == 0
        if interpret is True:
            # the streamed path uses pltpu DMAs, which plain interpret mode
            # cannot emulate — upgrade to the TPU-semantics interpreter
            interpret = pltpu.InterpretParams()
    n_tiles = nsub // rs
    # The kernel always runs f32 (the discrete winner indices it produces are
    # dtype-insensitive); f64 scenes cast at this non-differentiable boundary.
    # Note for f64 scenes: borderline nearest-hit winners and Schlick
    # reflect/refract coin flips can disagree between the f32 record and the
    # f64 replay (~1e-7 of rays). The replay's disc>0 / safe-sqrt guards keep
    # those rays finite, so the effect is a tiny extra estimator variance, not
    # a correctness issue; record in the scene dtype if bit-consistent f64
    # gradients are ever needed.
    sg = lambda x: jax.lax.stop_gradient(x).astype(jnp.float32)

    n_pad = int(scene.sphere_radius.shape[0]) if scene.n_spheres > 0 else 0
    m_pad = int(scene.tri_material.shape[0]) if scene.n_triangles > 0 else 0
    tri_base = n_pad  # _diff_tables' triangle row origin (RAW padded count)
    if not stream:
        # The unroll groups read one full group past a partial tail, and
        # the recorded indices must line up with _diff_tables' raw padded
        # counts — so instead of padding the tables (which would shift the
        # triangle index offset), shrink unroll until it divides both class
        # counts (builder scenes are padded to multiples of 8, the default).
        while unroll > 1 and ((n_pad % unroll) or (m_pad % unroll)):
            unroll //= 2
    tabs = []
    in_specs = []
    scratch = [
        pltpu.VMEM((6, rs, 128), jnp.float32),  # origin/direction
        pltpu.VMEM((rs, 128), jnp.int32),       # active mask
    ]
    if stream:
        # HBM tables in ORIGINAL order, padded to a chunk multiple with
        # poisoned columns; resident per-chunk bounding-sphere rows; SMEM
        # chunk scratch + DMA semaphores. Streamed indices are chunk-global
        # against the RAW table layout, so the replay needs no remap.
        cbnds = []
        if n_pad:
            stab = sg(scene_tables(scene))
            n_pad = _round_up(n_pad, stream)
            stab = _pad_poison(stab, n_pad, _CCMR2)
            lo, hi = _sphere_aabbs(scene)
            pad3 = ((0, n_pad - lo.shape[0]), (0, 0))
            valid = jnp.pad(scene.sphere_valid, (0, n_pad - lo.shape[0]))
            cbnds.append(_block_rows(jnp.pad(lo, pad3), jnp.pad(hi, pad3),
                                     valid, stream))
            rows_pad = _round_up(stab.shape[0], 8)
            tabs.append(jnp.pad(stab, ((0, rows_pad - stab.shape[0]),
                                       (0, 0))))
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
            scratch.insert(0, pltpu.SMEM((rows_pad, stream), jnp.float32))
        if m_pad:
            ttab = sg(tri_tables(scene))
            m_pad = _round_up(m_pad, stream)
            ttab = _pad_poison(ttab, m_pad, _TG1V)
            lo, hi = _tri_aabbs(scene)
            pad3 = ((0, m_pad - lo.shape[0]), (0, 0))
            valid = jnp.pad(scene.tri_valid, (0, m_pad - lo.shape[0]))
            cbnds.append(_block_rows(jnp.pad(lo, pad3), jnp.pad(hi, pad3),
                                     valid, stream))
            rows_pad = _round_up(ttab.shape[0], 8)
            tabs.append(jnp.pad(ttab, ((0, rows_pad - ttab.shape[0]),
                                       (0, 0))))
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
            scratch.insert(1 if n_pad else 0,
                           pltpu.SMEM((rows_pad, stream), jnp.float32))
        tabs.extend(cbnds)
        in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)] * len(cbnds)
        scratch.insert(len(scratch) - 2, pltpu.SemaphoreType.DMA((2,)))
    else:
        if n_pad:
            tabs.append(sg(scene_tables(scene)))
        if m_pad:
            tabs.append(sg(tri_tables(scene)))
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * len(tabs)
    rays = jnp.stack([
        sg(origin[:, 0]).reshape(nsub, 128),
        sg(origin[:, 1]).reshape(nsub, 128),
        sg(origin[:, 2]).reshape(nsub, 128),
        sg(direction[:, 0]).reshape(nsub, 128),
        sg(direction[:, 1]).reshape(nsub, 128),
        sg(direction[:, 2]).reshape(nsub, 128),
        sg(time).reshape(nsub, 128),
    ])
    randk = sg(rand).reshape(max_depth, 5, nsub, 128)

    kern = functools.partial(
        _record_kernel, n_pad=n_pad, m_pad=m_pad,
        t_min=t_min, has_motion=scene.has_motion,
        rs=rs, unroll=unroll, stream=stream, tri_base=tri_base)

    idx = pl.pallas_call(
        kern,
        grid=(n_tiles, max_depth),  # bounce innermost: scratch carries state
        in_specs=in_specs + [
            pl.BlockSpec((7, rs, 128), lambda i, b: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 5, rs, 128), lambda i, b: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((max_depth, nsub, 128), jnp.int32),
        out_specs=pl.BlockSpec((1, rs, 128), lambda i, b: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*tabs, rays, randk)
    return idx.reshape(max_depth, r_total)


# --------------------------------------------------------------------------
# 2. Differentiable replay
# --------------------------------------------------------------------------


def _diff_material_cols(scene: Scene, mat: jnp.ndarray):
    """Differentiable per-primitive material columns [P, 11]: kind, method,
    fuzz, ior, checker scale, even rgb, odd rgb (checker children resolved one
    level, like the megakernel; solid textures get even == odd == base
    color)."""
    f32 = scene.sphere_center.dtype
    kind = scene.mat_kind[mat].astype(f32)
    method = scene.mat_method[mat].astype(f32)
    fuzz = scene.mat_fuzz[mat]
    ior = scene.mat_ior[mat]

    tex = scene.mat_texture[mat]
    solid = scene.tex_kind[tex] == 0  # TEX_SOLID
    base = scene.tex_color[tex]
    even = scene.tex_color[scene.tex_even[tex]]
    odd = scene.tex_color[scene.tex_odd[tex]]
    ev = jnp.where(solid[:, None], base, even)
    od = jnp.where(solid[:, None], base, odd)
    scale = jnp.where(solid, jnp.ones_like(scene.tex_scale[tex]),
                      scene.tex_scale[tex])
    return jnp.concatenate([
        kind[:, None], method[:, None], fuzz[:, None], ior[:, None],
        scale[:, None], ev, od,
    ], axis=1)


def _diff_tables(scene: Scene):
    """Per-primitive [N_pad + M_pad, 20] parameter table, built
    DIFFERENTIABLY (the gradient-flowing twin of
    :func:`megakernel.scene_tables` / :func:`megakernel.tri_tables`).

    Geometry block (cols 0:9): spheres are [center(3), velocity(3), radius,
    0, 0]; triangles (rows N_pad..) are [v0(3), v1(3), v2(3)] — the replay
    re-derives the plane normal/distance from raw vertices so gradients flow
    to them. Material block (cols 9:20): see :func:`_diff_material_cols`.

    Consolidating every per-winner attribute into one table means the replay
    does a SINGLE [R]-indexed gather per bounce instead of ~15 — and its
    backward a single scatter-add — which is what makes the O(R) replay
    actually cheap on TPU.
    """
    parts = []
    if scene.n_spheres > 0:
        zeros2 = jnp.zeros_like(scene.sphere_radius[:, None])
        parts.append(jnp.concatenate([
            scene.sphere_center,
            scene.sphere_velocity,
            scene.sphere_radius[:, None],
            zeros2, zeros2,
            _diff_material_cols(scene, scene.sphere_material),
        ], axis=1))
    if scene.n_triangles > 0:
        parts.append(jnp.concatenate([
            scene.tri_v0, scene.tri_v1, scene.tri_v2,
            _diff_material_cols(scene, scene.tri_material),
        ], axis=1))
    return jnp.concatenate(parts, axis=0)


def replay_paths(scene: Scene, origin, direction, time, rand, idx, *,
                 t_min: float, remat: bool = True) -> jnp.ndarray:
    """Re-trace recorded paths differentiably; returns radiance [R, 3].

    Each bounce gathers ONLY the winning sphere's parameter row (O(R) work)
    and re-derives distance/normal/scatter with the exact formulas — and the
    exact random numbers — the record kernel used. ``jax.grad`` of a loss of
    the result yields scene-parameter gradients with O(R*depth) compute and
    O(R) residual memory per bounce.
    """
    dt = origin.dtype
    tau = time
    tab = _diff_tables(scene)
    n_sph_pad = int(scene.sphere_radius.shape[0]) if scene.n_spheres > 0 else 0
    with_sph = scene.n_spheres > 0
    with_tri = scene.n_triangles > 0

    def step(carry, xs):
        o, d, thr, out, act = carry
        idx_d, rand_d = xs
        hit = idx_d >= 0
        i = jnp.maximum(idx_d, 0)

        # The one "gather" per bounce, done as a one-hot matmul: TPU has no
        # fast vector gather (row-gather lowering dominated the whole replay,
        # ~460ms of a 530ms pass at 512x512 d32), but an [R, P] one-hot times
        # the [P, 20] table rides the MXU and its backward (scatter-add of
        # row cotangents into the table) is the transposed matmul — also MXU.
        oh = jax.nn.one_hot(i, tab.shape[0], dtype=tab.dtype)
        # HIGHEST precision: the TPU MXU's default rounds the table to bf16
        # inside the matmul, silently degrading every replayed hit distance
        # and gradient (found via pathrec parity, round 3).
        row = jnp.matmul(oh, tab,
                         precision=jax.lax.Precision.HIGHEST)  # [R, 20]
        a = jnp.sum(d * d, axis=-1)

        # ---- sphere interpretation of the row (cols 0:7) ----
        if with_sph:
            c = row[:, 0:3]
            if scene.has_motion:
                c = c + tau[:, None] * row[:, 3:6]
            r = row[:, 6]
            co = c - o
            half_b = jnp.sum(d * co, axis=-1)
            c_term = jnp.sum(co * co, axis=-1) - r * r
            disc = half_b * half_b - a * c_term
            # Safe sqrt for AD (sqrt'(0) = inf); recorded hits have disc > 0.
            pos = disc > 0.0
            rt = jnp.where(pos, jnp.sqrt(jnp.where(pos, disc, 1.0)), 0.0)
            q1 = half_b - rt
            q2 = half_b + rt
            q = jnp.where(q1 >= t_min * a, q1, q2)
            t_sph = q / a

        # ---- triangle interpretation of the row (cols 0:9 = v0, v1, v2):
        # plane distance and normal are smooth in the raw vertices ----
        if with_tri:
            v0 = row[:, 0:3]
            e1 = row[:, 3:6] - v0
            e2 = row[:, 6:9] - v0
            pn = jnp.cross(e1, e2)
            ndd = jnp.sum(pn * d, axis=-1)
            # recorded triangle hits have ndd != 0; the guard only protects
            # the OTHER class's rows (masked out below) from 0/0 NaNs that
            # would poison the backward pass.
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
        # one-level checker (megakernel semantics): floor-parity of p/scale
        # picks even/odd; solid textures have even == odd.
        isc = 1.0 / row[:, 13]
        par = jnp.sum(jnp.floor(p * isc[:, None]), axis=-1)
        even_par = par - 2.0 * jnp.floor(par * 0.5) < 0.5
        albedo = jnp.where(even_par[:, None], row[:, 14:17], row[:, 17:20])

        u3 = rand_d[0:3].T  # [R, 3] unit vector
        cb = rand_d[3]
        us = rand_d[4]

        # ---- diffuse (megakernel order of operations) ----
        s = u3 * cb[:, None]
        flip = jnp.where(jnp.sum(s * nrm, axis=-1) > 0.0, 1.0, -1.0)
        off = jnp.where((method == DIFFUSE_UNIT_SPHERE)[:, None], nrm + s,
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
        metal_ok = jnp.sum(met * nrm, axis=-1) > 0.0

        # ---- dielectric ----
        def safe_sqrt(x):
            # value-equal to sqrt(max(x, 0)) but with zero (not inf/NaN)
            # gradient at and below x = 0 — TIR and grazing boundaries
            # otherwise poison the whole backward pass through 0 * inf.
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
        nd2 = jnp.sum(ndir * ndir, axis=-1)
        scattered = ((~is_m) | metal_ok) & (nd2 > 1e-20)

        # ---- miss -> sky (reference's exact formula) ----
        sky_t = 0.5 * (d[:, 1] * dinv + 1.0)
        blue = jnp.asarray([0.5, 0.7, 1.0], dtype=dt)
        sky = (1.0 - sky_t[:, None] + blue) * sky_t[:, None]
        miss = act & ~hit
        out = out + jnp.where(miss[:, None], thr * sky, 0.0)

        cont = act & hit & scattered
        thr = jnp.where(cont[:, None], thr * att, thr)
        o = jnp.where(cont[:, None], p, o)
        d = jnp.where(cont[:, None], ndir, d)
        return (o, d, thr, out, cont), None

    shape = time.shape
    zero3 = origin - origin
    thr0 = zero3 + jnp.ones((*shape, 3), dtype=dt)
    act0 = (time - time) == 0.0
    body = jax.checkpoint(step) if remat else step
    (_, _, _, out, _), _ = jax.lax.scan(
        body, (origin, direction, thr0, zero3, act0), (idx, rand))
    return out


# --------------------------------------------------------------------------
# 3. Full differentiable render
# --------------------------------------------------------------------------


def _make_rand(key, depth: int, r: int, dtype):
    """[depth, 5, R] random block: uniform unit vector (cylinder map — same
    distribution as a normalized Gaussian triple at a fraction of the
    transcendental cost, matching the megakernel's in-kernel sampler),
    u^(1/3) ball radius factor, Schlick uniform."""
    uu = jax.random.uniform(key, (depth, 4, r), dtype=dtype)
    z = 2.0 * uu[:, 0] - 1.0
    phi = (2.0 * math.pi) * uu[:, 1]
    rad = jnp.sqrt(jnp.maximum(1.0 - z * z, 1e-24))
    unit = jnp.stack([rad * jnp.cos(phi), rad * jnp.sin(phi), z], axis=1)
    cb = jnp.exp(jnp.log(jnp.maximum(uu[:, 2], 1e-24)) * (1.0 / 3.0))
    return jnp.concatenate([unit, cb[:, None], uu[:, 3][:, None]], axis=1)


def default_interpret() -> bool:
    """Record kernel runs natively on TPU, interpreted elsewhere (it uses no
    pltpu-specific ops, so plain interpret mode is exact)."""
    return jax.default_backend() not in ("tpu", "axon")


def render_diff_flat(scene: Scene, camera: Camera, key, px, py, *, spp: int,
                     max_depth: int, t_min: float, jitter: bool,
                     tile_sublanes: int = 16, interpret=False) -> jnp.ndarray:
    """Record+replay estimate of the radiance of an arbitrary flat pixel list
    [n] -> [n, 3] (spp-averaged). This is the per-device body of the sharded
    recorded train step (rayz_tpu.diff.inverse): pixels can be any shard of
    the image, and no collectives are used."""
    n_px = px.shape[0]
    # Small shards don't need the full 16-sublane tile; shrink so tiny test
    # images / per-device shards don't trace a 2048-slot kernel for 144 rays.
    rs = min(tile_sublanes, max(1, -(-n_px // 128)))
    block = rs * 128
    r_pad = -(-n_px // block) * block
    if r_pad != n_px:
        pad = r_pad - n_px
        px = jnp.concatenate([px, jnp.zeros((pad,), px.dtype)])
        py = jnp.concatenate([py, jnp.zeros((pad,), py.dtype)])

    from jax.ad_checkpoint import checkpoint_name

    def sample_pass(acc, pass_key):
        k_cam, k_mat = jax.random.split(pass_key)
        o, d, tm = generate_rays(camera, px, py, k_cam if jitter else None)
        rand = _make_rand(k_mat, max_depth, r_pad, camera.dtype)
        idx = checkpoint_name(
            record_paths(scene, o, d, tm, rand, max_depth=max_depth,
                         t_min=t_min, tile_sublanes=rs,
                         interpret=interpret),
            "record_idx")
        rad = replay_paths(scene, o, d, tm, rand, idx, t_min=t_min)
        return acc + rad, None

    acc0 = jnp.zeros((r_pad, 3), dtype=camera.dtype)
    # Checkpoint each sample pass, SAVING the recorded winner indices (depth x
    # R i32, ~4*depth bytes/ray/pass) so the backward sweep re-derives rays
    # and randoms from the pass key but never re-runs the record kernel —
    # the most expensive piece of a pass. The TPU-semantics interpreter
    # (used off-TPU for the STREAMED record kernel's DMAs) injects ordered
    # IO effects that jax.checkpoint cannot partial-eval, so interpreted
    # runs skip the remat wrapper (test-scale workloads don't need it).
    interp_stream = bool(interpret) and not fits_smem_record(scene)
    if interp_stream or isinstance(interpret, pltpu.InterpretParams):
        body = sample_pass
    else:
        policy = jax.checkpoint_policies.save_only_these_names("record_idx")
        body = jax.checkpoint(sample_pass, policy=policy)
    acc, _ = jax.lax.scan(body, acc0, jax.random.split(key, spp))
    return acc[:n_px] / float(spp)


def _render_diff(scene: Scene, camera: Camera, key, *, spp: int,
                 max_depth: int, t_min: float, jitter: bool,
                 tile_sublanes: int, interpret) -> jnp.ndarray:
    h, w = camera.height, camera.width
    px, py = _pixel_grid(camera)
    flat = render_diff_flat(scene, camera, key, px, py, spp=spp,
                            max_depth=max_depth, t_min=t_min, jitter=jitter,
                            tile_sublanes=tile_sublanes, interpret=interpret)
    return flat.reshape(h, w, 3)


@functools.partial(
    jax.jit,
    static_argnames=("spp", "max_depth", "t_min", "jitter", "tile_sublanes",
                     "interp"),
)
def _render_diff_jit(scene, camera, key, *, spp, max_depth, t_min, jitter,
                     tile_sublanes, interp):
    # Plain interpret=True suffices off-TPU: unlike the forward megakernel,
    # this kernel uses no pltpu-specific ops (randomness comes in as an
    # input), and the TPU-semantics interpreter's compile is pathologically
    # slow for it.
    return _render_diff(scene, camera, key, spp=spp, max_depth=max_depth,
                        t_min=t_min, jitter=jitter,
                        tile_sublanes=tile_sublanes, interpret=bool(interp))


def render_diff(scene: Scene, camera: Camera, key,
                config: RenderConfig = RenderConfig(), *,
                tile_sublanes: int = 16, interpret=None) -> jnp.ndarray:
    """Differentiable render via record+replay; same estimator distribution
    as :func:`rayz_tpu.render` and ~the megakernel's forward speed, with
    gradients that never materialize [rays, spheres] tensors.

    Unlike the megakernel this function composes with ``jax.grad`` /
    ``jax.value_and_grad`` directly (differentiable in the scene's float
    leaves). Off-TPU it runs the record kernel in interpret mode — no
    in-kernel PRNG is used, so stochastic paths work everywhere.
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
    if is_prng_key(key) is False:
        key = jax.random.PRNGKey(key)
    return _render_diff_jit(
        scene, camera, key, spp=config.spp, max_depth=config.max_depth,
        t_min=config.t_min, jitter=config.jitter,
        tile_sublanes=tile_sublanes, interp=bool(interpret))
