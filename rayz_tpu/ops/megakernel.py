"""Pallas TPU megakernel: the whole path trace in one fused kernel.

TPU-native replacement for the reference's hot loop — ``Tracer.render``'s
row/col/sample triple loop plus the recursive ``bounceRay``
(/root/reference/src/renderer.zig:72-126) — as a single Pallas kernel per ray
tile (SURVEY.md §7 build stage 5). The pure-XLA integrator
(:mod:`rayz_tpu.ops.integrator`) materializes [rays, spheres] intermediates in
HBM every bounce and is bandwidth-bound; this kernel keeps all ray state and
the whole scene SoA on-chip (VMEM/SMEM/vector registers), so it is
compute-bound on the VPU.

Design
------
* **Ray layout [RS, 128]**: rays fill both sublanes and lanes, so *every*
  per-ray op runs at full VPU width (1024 f32 lanes/cycle). The intersection
  is a ``fori_loop`` over spheres — per iteration, one sphere (scalars from
  SMEM) is tested against all RS*128 rays — rather than a [rays, spheres]
  matrix, which would force per-ray scalars onto 1/128th of the VPU.
* **Persistent-ray respawn**: the reference traces each pixel sample to
  completion before starting the next; a masked SIMT port of that wastes
  lanes on dead rays (most paths die in 2-4 bounces while ``max_depth`` is
  32-50). Here every lane owns one pixel and immediately respawns the next
  camera sample (fresh jitter/defocus/time) when its path dies, so lane
  utilization stays near 100% until the tail of the sample budget.
* **Winner tracking by select**: Mosaic has no vector gather, so the sphere
  loop carries the running-best hit's attributes (effective center, material
  kind/fuzz/ior, checker colors) via ``where(better, ...)`` selects on SMEM
  scalars — the TPU analogue of the BVH's shrinking-tmax nearest-hit update
  (hit.zig:197-214). By default each unroll group's candidates merge through
  a tournament tree (log2 depth) instead of a serial select chain: the
  nearest-hit carry is the kernel's longest dependency chain, and the tree
  is worth ~15% end-to-end (``tree=False`` restores the chain; bit-exact).
* **In-kernel PRNG**: ``pltpu.prng_random_bits`` per tile stream (seeded by
  ``seed + tile``), replacing the reference's xoshiro (renderer.zig:55-59).
  Distribution-parity, not bit-parity (SURVEY.md §7 "RNG parity").

Scope: sphere and/or triangle scenes with solid / one-level checker textures
(everything the reference can express — its checker children are always
solid, rayz.zig:57-66 — plus the triangle capability of BASELINE config 4).
Triangles run as a second SMEM-scalar loop after the spheres, tracking the
same winner carry; a per-slot flag records whether the winner is a triangle
(normal = stored plane normal) or a sphere (normal = hit point − stored
center). Deeper texture nests degrade to the child's base color. This kernel
is forward-only: gradients run through the record/replay estimator
(:mod:`rayz_tpu.ops.diffkernel`) or the dense XLA integrator.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.camera import Camera
from ..models.scene import (
    MAT_DIELECTRIC,
    MAT_METALLIC,
    TEX_SOLID,
    Scene,
    _round_up,
)

__all__ = ["render_pallas", "render_pallas_sharded", "supports_scene",
           "fits_smem", "fits_stream", "scene_tables", "tri_tables",
           "scene_tables_gm", "tri_tables_gm", "use_global_materials",
           "is_prng_key"]


def is_prng_key(key) -> bool:
    """True for new-style typed keys AND legacy uint32[..., 2] raw keys."""
    if not hasattr(key, "dtype"):
        return False
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        return True
    return (jnp.issubdtype(key.dtype, jnp.unsignedinteger)
            and getattr(key, "ndim", 0) >= 1 and key.shape[-1] == 2)

# SMEM scene-table row indices (one f32 row per attribute, columns = spheres).
_CX, _CY, _CZ, _CCMR2 = 0, 1, 2, 3
_VX, _VY, _VZ, _CV2, _VV = 4, 5, 6, 7, 8
_PKF, _IOS = 9, 10  # packed (kind*4+method)*4 + 2*fuzz; ior-or-scale
_EVR, _EVG, _EVB, _ODR, _ODG, _ODB = 11, 12, 13, 14, 15, 16
_NROWS = 17

# SMEM triangle-table rows (columns = triangles): plane normal n = e1 x e2 and
# n.v0; dual-basis rows g1/g2 with their v0 inner products (barycentrics are
# affine in the hit point: u = g1.p - g1.v0, v = g2.p - g2.v0); then the same
# material/texture block as spheres.
_TNX, _TNY, _TNZ, _TNV0 = 0, 1, 2, 3
_TG1X, _TG1Y, _TG1Z, _TG1V = 4, 5, 6, 7
_TG2X, _TG2Y, _TG2Z, _TG2V = 8, 9, 10, 11
_TPKF, _TIOS = 12, 13
_TEVR, _TEVG, _TEVB, _TODR, _TODG, _TODB = 14, 15, 16, 17, 18, 19
_TNROWS = 20

# Global-material ("gm") table rows: same geometry block, then ONE packed
# flags/kind/method/fuzz float and the solid albedo. Enabled when the scene
# has at most one distinct checker texture and one distinct dielectric
# material (statically known via Scene.uniq_* — true of every reference scene,
# rayz.zig:45-168): the checker's scale/colors and the dielectric's IOR then
# live in 8 per-scene SMEM globals resolved once per bounce, shrinking the
# nearest-hit winner carry from 13 selects per primitive to 8.
_GPKF, _GALR, _GALG, _GALB = 9, 10, 11, 12
_GNROWS = 13
_TGPKF, _TGALR, _TGALG, _TGALB = 12, 13, 14, 15
_TGNROWS = 16

_BIG = 3.0e38  # stand-in for +inf (t on miss)
_TWO_PI = 2.0 * math.pi

#: Single SMEM budget shared by the dispatch check (:func:`fits_smem`) and the
#: launch-time guard in ``_trace_shard`` — v5e SMEM is 1 MiB; leave headroom.
SMEM_BUDGET = 900_000

#: Auto-enable block culling at or above this many primitives (per class
#: total): below it the bound tests cost more than the skipped work saves.
CULLING_AUTO_THRESHOLD = 2048
DEFAULT_BLOCK = 64

#: Streaming chunk size (primitives per HBM->SMEM DMA when the scene exceeds
#: the SMEM budget). Must be a multiple of DEFAULT_BLOCK and the unroll.
DEFAULT_STREAM_CHUNK = 4096


def supports_scene(scene: Scene) -> bool:
    """Static eligibility: any non-empty sphere/triangle scene WITHOUT
    nested checker textures. The kernel resolves exactly one level of
    checker (:func:`_material_rows`) while the reference recurses through
    the texture pool (material.zig:37-38) and the XLA integrator chases four
    levels (shade.py) — a deeper nest would render DIFFERENTLY here, so such
    scenes are routed to the XLA engine instead of silently degrading
    (Scene.deep_checker, set by SceneBuilder)."""
    return ((scene.n_spheres > 0 or scene.n_triangles > 0)
            and not scene.deep_checker)


def _smem_words(scene: Scene, blk: int) -> int:
    """EXACT f32-word count of the SMEM inputs ``_trace_shard`` builds for
    this scene with culling block size ``blk`` (0 = culling off): camera
    vector (18, +8 gm globals), seed pair, the per-class tables (padded to a
    block multiple when culling), and the per-block bound rows. Keeping this
    in lockstep with ``_trace_shard``'s input list is what makes
    ``fits_smem``'s promise exact — a scene that passes can never hit the
    launch-time guard."""
    gm = use_global_materials(scene)
    _, unroll = _resolve_tiling(scene, None, None)
    n_pad = int(scene.sphere_radius.shape[0]) if scene.n_spheres > 0 else 0
    m_pad = int(scene.tri_material.shape[0]) if scene.n_triangles > 0 else 0
    if blk:
        n_pad = _round_up(n_pad, blk) if n_pad else 0
        m_pad = _round_up(m_pad, blk) if m_pad else 0
    words = 18 + (8 if gm else 0) + 2
    if blk:
        words += 4 * (n_pad // blk) + 4 * (m_pad // blk)
    n_pad = _round_up(n_pad, unroll) if n_pad else 0
    m_pad = _round_up(m_pad, unroll) if m_pad else 0
    rows_s = _GNROWS if gm else _NROWS
    rows_t = _TGNROWS if gm else _TNROWS
    words += rows_s * n_pad + rows_t * m_pad
    return words


def _stream_smem_words(scene: Scene, stream_chunk: int, blk: int) -> int:
    """SMEM words the streamed kernel actually allocates — the SAME shapes
    ``_trace_shard_streamed`` builds (chunk scratch rows rounded up to the
    8-sublane DMA alignment, an (8, chunk/blk) block-row scratch per class,
    resident per-chunk bounds, camera/globals/seed) so a scene that passes
    ``fits_stream`` can never hit the launch-time guard."""
    gm = use_global_materials(scene)
    n_pad = int(scene.sphere_radius.shape[0]) if scene.n_spheres > 0 else 0
    m_pad = int(scene.tri_material.shape[0]) if scene.n_triangles > 0 else 0
    rows_s = _round_up(_GNROWS if gm else _NROWS, 8)
    rows_t = _round_up(_TGNROWS if gm else _TNROWS, 8)
    words = 18 + (8 if gm else 0) + 2
    n_r = _round_up(n_pad, stream_chunk) if n_pad else 0
    m_r = _round_up(m_pad, stream_chunk) if m_pad else 0
    sc_group = _pick_sc_group(max(n_r, m_r) // stream_chunk)
    for n, rows in ((n_r, rows_s), (m_r, rows_t)):
        if n:
            words += rows * stream_chunk      # chunk scratch (8-row padded)
            if blk:
                words += 8 * (stream_chunk // blk)  # block-row scratch
            words += 4 * (n // stream_chunk)  # resident chunk bounds
            if _sc_enabled(n, stream_chunk, sc_group):
                words += 4 * (n // (stream_chunk * sc_group))
    return words


def fits_stream(scene: Scene,
                stream_chunk: int = DEFAULT_STREAM_CHUNK) -> bool:
    """Whether the STREAMED megakernel can run this scene: only the chunk
    scratch, per-chunk bound rows, and camera/seed must fit SMEM (the tables
    themselves live in HBM) — ~50M primitives at the default chunk size
    before the bound rows outgrow the budget. Counts the block size the
    streamed launches actually use (stream_chunk // 128 — the 128-aligned
    block-row DMA constraint), so a scene that passes here can never hit
    the launch-time guard."""
    return 4 * _stream_smem_words(scene, stream_chunk,
                                  stream_chunk // 128) <= SMEM_BUDGET


def fits_smem(scene: Scene, culling: Optional[bool] = None,
              block_size: int = DEFAULT_BLOCK) -> bool:
    """Whether the scene's flattened tables fit the kernel's SMEM budget
    (v5e SMEM is 1 MiB; the whole scene rides there). ~16k primitives in gm
    mode, ~13k in full-table mode; beyond that ``pick_engine('auto')`` falls
    back to the XLA integrator. Uses the same byte accounting and the same
    ``SMEM_BUDGET`` as the launch-time guard in ``_trace_shard``, evaluated
    at the culling configuration the default render path would pick."""
    blk = _resolve_blk(scene, culling, block_size)
    return 4 * _smem_words(scene, blk) <= SMEM_BUDGET


def _material_rows(scene: Scene, mat: jnp.ndarray):
    """Per-primitive material/texture rows shared by the sphere and triangle
    tables: packed (kind, method, fuzz), ior-or-checker-scale, and the
    one-level-resolved even/odd checker colors (material.zig:41-51: checker
    children are looked up through the pool; solid is its own color).

    Pack (kind, method, fuzz) into one float: 6 integer bits + the fuzz
    fraction. Fuzz loses ~5 mantissa bits (<4e-6 absolute) — far below visual
    or test tolerance; kind/method decode exactly. ior and checker scale are
    mutually exclusive by material kind (dielectrics have no texture,
    material.zig:155; others ignore ior), so they share one row."""
    f32 = jnp.float32
    kind = scene.mat_kind[mat].astype(f32)
    method = scene.mat_method[mat].astype(f32)
    fuzz = scene.mat_fuzz[mat].astype(f32)
    ior = scene.mat_ior[mat].astype(f32)

    tex = scene.mat_texture[mat]
    solid = scene.tex_kind[tex] == TEX_SOLID
    base = scene.tex_color[tex].astype(f32)
    even = scene.tex_color[scene.tex_even[tex]].astype(f32)
    odd = scene.tex_color[scene.tex_odd[tex]].astype(f32)
    ev = jnp.where(solid[:, None], base, even)
    od = jnp.where(solid[:, None], base, odd)
    scale = jnp.where(solid, 1.0, scene.tex_scale[tex].astype(f32))

    pkf = (kind * 4.0 + method) * 4.0 + 2.0 * jnp.minimum(fuzz, 1.0)
    ios = jnp.where(kind == float(MAT_DIELECTRIC), ior, scale)
    return [pkf, ios, ev[:, 0], ev[:, 1], ev[:, 2],
            od[:, 0], od[:, 1], od[:, 2]]


def scene_tables(scene: Scene) -> jnp.ndarray:
    """Flatten the sphere SoA into the [_NROWS, N] f32 SMEM table the kernel
    consumes: per-sphere geometry (center/velocity/|c|^2 - r^2 with padding
    lanes pushed to +inf-ish so they never win) joined with the sphere's
    material/texture rows."""
    f32 = jnp.float32
    c = scene.sphere_center.astype(f32)
    v = scene.sphere_velocity.astype(f32)
    r = scene.sphere_radius.astype(f32)

    ccmr2 = jnp.sum(c * c, axis=1) - r * r
    ccmr2 = jnp.where(scene.sphere_valid, ccmr2, _BIG)  # padding never hits
    cv2 = 2.0 * jnp.sum(c * v, axis=1)
    vv = jnp.sum(v * v, axis=1)

    return jnp.stack([
        c[:, 0], c[:, 1], c[:, 2], ccmr2,
        v[:, 0], v[:, 1], v[:, 2], cv2, vv,
        *_material_rows(scene, scene.sphere_material),
    ])


def tri_tables(scene: Scene) -> jnp.ndarray:
    """Flatten the triangle SoA into the [_TNROWS, M] f32 SMEM table: plane
    normal n = e1 x e2 with n.v0, the dual basis (g1, g2) of the edge frame so
    barycentrics are affine in the hit point (intersect.py _triangle_frame in
    scalar-row form), and the material/texture rows. Padding columns get
    g1.v0 = +BIG so their barycentric u is hugely negative and they can never
    win."""
    f32 = jnp.float32
    v0 = scene.tri_v0.astype(f32)
    e1 = scene.tri_v1.astype(f32) - v0
    e2 = scene.tri_v2.astype(f32) - v0
    n = jnp.cross(e1, e2)
    d11 = jnp.sum(e1 * e1, axis=1)
    d12 = jnp.sum(e1 * e2, axis=1)
    d22 = jnp.sum(e2 * e2, axis=1)
    den = d11 * d22 - d12 * d12
    inv_den = jnp.where(den != 0.0, 1.0 / jnp.where(den != 0.0, den, 1.0), 0.0)
    g1 = (e1 * d22[:, None] - e2 * d12[:, None]) * inv_den[:, None]
    g2 = (e2 * d11[:, None] - e1 * d12[:, None]) * inv_den[:, None]

    nv0 = jnp.sum(n * v0, axis=1)
    g1v = jnp.sum(g1 * v0, axis=1)
    g2v = jnp.sum(g2 * v0, axis=1)
    g1v = jnp.where(scene.tri_valid, g1v, _BIG)  # padding: u = -BIG, never ok

    return jnp.stack([
        n[:, 0], n[:, 1], n[:, 2], nv0,
        g1[:, 0], g1[:, 1], g1[:, 2], g1v,
        g2[:, 0], g2[:, 1], g2[:, 2], g2v,
        *_material_rows(scene, scene.tri_material),
    ])


def use_global_materials(scene: Scene) -> bool:
    """Static eligibility for the gm fast path (see row-constant comment)."""
    return scene.uniq_checker_tex != -2 and scene.uniq_dielectric_mat != -2


def _material_rows_gm(scene: Scene, mat: jnp.ndarray, istri: float):
    """gm-mode per-primitive rows: packed (istri, ischecker, kind, method,
    fuzz) and the solid base color (zeroed for checker primitives — their
    albedo is recomputed from the scene globals at decode time)."""
    f32 = jnp.float32
    kind = scene.mat_kind[mat].astype(f32)
    method = scene.mat_method[mat].astype(f32)
    fuzz = scene.mat_fuzz[mat].astype(f32)
    tex = scene.mat_texture[mat]
    ischk = (scene.tex_kind[tex] != TEX_SOLID).astype(f32)
    base = scene.tex_color[tex].astype(f32)
    base = jnp.where(ischk[:, None] > 0.0, 0.0, base)
    pkf = ((istri * 2.0 + ischk) * 16.0 + kind * 4.0 + method) * 4.0 \
        + 2.0 * jnp.minimum(fuzz, 1.0)
    return [pkf, base[:, 0], base[:, 1], base[:, 2]]


def scene_tables_gm(scene: Scene) -> jnp.ndarray:
    """gm-mode sphere table [_GNROWS, N]: geometry rows as in
    :func:`scene_tables`, then the compact material block."""
    f32 = jnp.float32
    c = scene.sphere_center.astype(f32)
    v = scene.sphere_velocity.astype(f32)
    r = scene.sphere_radius.astype(f32)
    ccmr2 = jnp.sum(c * c, axis=1) - r * r
    ccmr2 = jnp.where(scene.sphere_valid, ccmr2, _BIG)
    cv2 = 2.0 * jnp.sum(c * v, axis=1)
    vv = jnp.sum(v * v, axis=1)
    return jnp.stack([
        c[:, 0], c[:, 1], c[:, 2], ccmr2,
        v[:, 0], v[:, 1], v[:, 2], cv2, vv,
        *_material_rows_gm(scene, scene.sphere_material, 0.0),
    ])


def tri_tables_gm(scene: Scene) -> jnp.ndarray:
    """gm-mode triangle table [_TGNROWS, M]: geometry rows as in
    :func:`tri_tables`, then the compact material block (istri flag baked into
    the packed float — no separate winner-is-triangle carry)."""
    full = tri_tables(scene)  # reuse the geometry rows 0..11
    return jnp.concatenate([
        full[:12],
        jnp.stack(_material_rows_gm(scene, scene.tri_material, 1.0)),
    ])


def _scene_globals(scene: Scene) -> jnp.ndarray:
    """[8] f32 gm globals: checker 1/scale, even rgb, odd rgb, dielectric IOR.
    Indices are the static Scene.uniq_* fields, so the VALUES stay traced
    (training/replacing tex_color or mat_ior keeps working)."""
    f32 = jnp.float32
    t = scene.uniq_checker_tex
    if t >= 0:
        inv_scale = 1.0 / scene.tex_scale[t].astype(f32)
        ev = scene.tex_color[scene.tex_even[t]].astype(f32)
        od = scene.tex_color[scene.tex_odd[t]].astype(f32)
    else:
        inv_scale = jnp.asarray(1.0, f32)
        ev = jnp.zeros((3,), f32)
        od = jnp.zeros((3,), f32)
    m = scene.uniq_dielectric_mat
    ior = scene.mat_ior[m].astype(f32) if m >= 0 else jnp.asarray(1.0, f32)
    return jnp.concatenate([inv_scale[None], ev, od, ior[None]])


def _part1by2(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of ``x`` so they occupy every 3rd bit (the
    standard Morton-code bit-interleave kernel)."""
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def _morton_perm(lo: jnp.ndarray, hi: jnp.ndarray, valid) -> jnp.ndarray:
    """Permutation sorting primitives by the 30-bit Morton code of their AABB
    center (invalid/padding columns last). Spatially adjacent primitives land
    in the same culling block — the TPU-native analogue of the reference
    BVH's sort-by-axis median split (/root/reference/src/hit.zig:145-159),
    done once per render as an O(N log N) XLA sort instead of per-ray
    divergent traversal."""
    c = 0.5 * (lo + hi)
    cmin = jnp.min(jnp.where(valid[:, None], c, jnp.inf), axis=0)
    cmax = jnp.max(jnp.where(valid[:, None], c, -jnp.inf), axis=0)
    span = jnp.maximum(cmax - cmin, 1e-12)
    q = jnp.clip(((c - cmin) / span * 1023.0), 0.0, 1023.0).astype(jnp.uint32)
    code = (_part1by2(q[:, 0]) | (_part1by2(q[:, 1]) << 1)
            | (_part1by2(q[:, 2]) << 2))
    code = jnp.where(valid, code, jnp.uint32(0xFFFFFFFF))
    return jnp.argsort(code)


def _block_rows(lo: jnp.ndarray, hi: jnp.ndarray, valid, block: int):
    """[4, N/block] bounding-sphere rows for culling blocks of ``block``
    consecutive (Morton-sorted) primitives: center xyz and |bc|^2 - br^2 —
    the same (cx, cy, cz, ccmr2) form the sphere hit test consumes, so the
    kernel's block test IS a sphere test. Blocks with no valid member get
    ccmr2 = +BIG (discriminant -> -inf -> never 'possible')."""
    nb = lo.shape[0] // block
    lo = jnp.where(valid[:, None], lo, jnp.inf).reshape(nb, block, 3)
    hi = jnp.where(valid[:, None], hi, -jnp.inf).reshape(nb, block, 3)
    blo = jnp.min(lo, axis=1)
    bhi = jnp.max(hi, axis=1)
    bc = 0.5 * (blo + bhi)
    br2 = jnp.sum((0.5 * (bhi - blo)) ** 2, axis=1)
    any_valid = valid.reshape(nb, block).any(axis=1)
    bc = jnp.where(any_valid[:, None], bc, 0.0)
    ccmr2 = jnp.where(any_valid, jnp.sum(bc * bc, axis=1) - br2, _BIG)
    return jnp.stack([bc[:, 0], bc[:, 1], bc[:, 2], ccmr2])


def _sphere_aabbs(scene: Scene):
    """Per-sphere AABB over t in [0, 1] (motion enclosed, geom.zig:24-31)."""
    c0 = scene.sphere_center.astype(jnp.float32)
    c1 = c0 + scene.sphere_velocity.astype(jnp.float32)
    r = scene.sphere_radius.astype(jnp.float32)[:, None]
    return jnp.minimum(c0, c1) - r, jnp.maximum(c0, c1) + r


def _tri_aabbs(scene: Scene):
    v0 = scene.tri_v0.astype(jnp.float32)
    v1 = scene.tri_v1.astype(jnp.float32)
    v2 = scene.tri_v2.astype(jnp.float32)
    return (jnp.minimum(jnp.minimum(v0, v1), v2),
            jnp.maximum(jnp.maximum(v0, v1), v2))


def _pad_poison(tab: jnp.ndarray, n: int, poison_row: int) -> jnp.ndarray:
    """Pad a [rows, N] table to N=n columns whose ``poison_row`` is +BIG so
    they can never win the nearest-hit carry."""
    pad = n - tab.shape[1]
    if pad <= 0:
        return tab
    tab = jnp.pad(tab, ((0, 0), (0, pad)))
    return tab.at[poison_row, -pad:].set(_BIG)


def _camera_vector(camera: Camera) -> jnp.ndarray:
    """[18] f32: look_from, px_du, px_dv, px_origin, defocus_u, defocus_v."""
    f32 = jnp.float32
    return jnp.concatenate([
        camera.look_from.astype(f32), camera.px_du.astype(f32),
        camera.px_dv.astype(f32), camera.px_origin.astype(f32),
        camera.defocus_u.astype(f32), camera.defocus_v.astype(f32),
    ])


def _kernel(cam_ref, *args,
            width: int, height: int, n_pad: int, m_pad: int, spp: int,
            max_depth: int, t_min: float, jitter: bool, has_motion: bool,
            rs: int, unroll: int, gm: bool, blk: int = 0,
            tree: bool = True, stream: int = 0, stream_cull: bool = True,
            debug_iters: bool = False, budget: int = 0,
            resume: bool = False, save_state: bool = False,
            pix_table: bool = False):
    """One grid step = one tile of rs*128 persistent ray slots.

    ``args`` carries the sphere table iff ``n_pad > 0`` and the triangle
    table iff ``m_pad > 0`` (an absent primitive class costs nothing), the
    per-class culling block tables iff ``blk > 0`` (see ``_block_rows``),
    then the seed and the three output refs.

    ``blk > 0`` enables block culling — the TPU-native BVH capability
    (/root/reference/src/hit.zig:101-217): primitives arrive Morton-sorted in
    blocks of ``blk``; each block's bounding sphere is tested against ALL
    rays in the tile at once (a handful of VPU ops), and the block's inner
    loop runs only if ANY active ray could hit it closer than its current
    best — ``lax.cond`` on a scalar any-reduce, the tile-level analogue of
    BVH pruning with shrinking tmax.

    ``budget``/``resume``/``save_state``/``pix_table`` implement the
    straggler-compacted respawn (``_trace_shard_compact``): cap the tile's
    while-loop trips at ``budget`` (0 = run to completion), read the initial
    slot state from an input plane stack instead of spawning fresh, write
    the final slot state out, and read each slot's pixel id from an input
    table (compaction permutes slots, so slot != flat pixel index; -1 marks
    a retired slot). Non-stream path only."""
    refs = list(args)
    if stream:
        # Streaming mode (the unbounded-N acceleration path): tables live in
        # HBM, Morton-sorted into chunks of ``stream`` primitives; per bounce
        # each chunk is bound-tested (bounds resident in SMEM) and DMA'd
        # into SMEM scratch for the sweep. The candidate/group code below is
        # UNCHANGED — tab_ref/tri_ref simply point at the chunk scratch.
        s_hbm = refs.pop(0) if n_pad else None
        t_hbm = refs.pop(0) if m_pad else None
        s_cbnd = refs.pop(0) if n_pad else None
        t_cbnd = refs.pop(0) if m_pad else None
        s_blkh = refs.pop(0) if (blk and n_pad) else None
        t_blkh = refs.pop(0) if (blk and m_pad) else None
        seed_ref, r_ref, g_ref, b_ref = refs[:4]
        scr = refs[4:]
        tab_ref = scr.pop(0) if n_pad else None
        sblk_ref = scr.pop(0) if (blk and n_pad) else None
        tri_ref = scr.pop(0) if m_pad else None
        tblk_ref = scr.pop(0) if (blk and m_pad) else None
        sem_ref = scr.pop(0)
    else:
        tab_ref = refs.pop(0) if n_pad else None
        tri_ref = refs.pop(0) if m_pad else None
        sblk_ref = refs.pop(0) if (blk and n_pad) else None
        tblk_ref = refs.pop(0) if (blk and m_pad) else None
        seed_ref = refs.pop(0)
        pix_ref = refs.pop(0) if pix_table else None
        st_in = refs.pop(0) if resume else None
        r_ref, g_ref, b_ref = refs[:3]
        st_out = refs[3] if save_state else None
    f32 = jnp.float32
    i32 = jnp.int32
    shape = (rs, 128)
    tile = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0], tile)
    pix_off = seed_ref[1]  # first global pixel of this device's shard

    def uniform():
        # 23 uniform bits -> [0, 1). Mask in int32 (prng bits are signed);
        # exactly representable in f32.
        bits = pltpu.prng_random_bits(shape)
        return (bits & 0x7FFFFF).astype(f32) * (2.0 ** -23)

    def unit3():
        # Uniform direction via the cylinder map (Archimedes): z ~ U[-1,1],
        # phi ~ U[0,2pi). Same distribution as a normalized Gaussian triple
        # but 1 sqrt + 1 cos + 1 sin instead of Box-Muller's 2 log + 2 sqrt
        # + 3 trig + rsqrt — the sampling block is a large fixed cost per
        # bounce (PERF.md), so transcendental count matters.
        z = 2.0 * uniform() - 1.0
        phi = _TWO_PI * uniform()
        r = jnp.sqrt(jnp.maximum(1.0 - z * z, 1e-24))
        return r * jnp.cos(phi), r * jnp.sin(phi), z

    # Slot -> pixel (row-major, renderer.zig:80-96 layout). NOTE: 64x32
    # pixel-PATCH slot order was tried here (round 4) and reverted for the
    # persistent kernel: patches concentrate long paths into the same tile
    # (an all-geometry tile runs many more respawn iterations while its
    # all-sky neighbors finish early), costing ~5-10% at mid N with no
    # culling gain — staggered respawn defeats the tighter frustum anyway.
    # The wavefront engine (wavefront.py), whose bounce-0 tiles are pure
    # frusta, DOES use patch ordering (driver-side, via _patch_inverse).
    if pix_table:
        pix = pix_ref[...]
        in_image = pix >= 0  # -1 marks retired slots (compaction padding)
        pp = jnp.maximum(pix, 0)
        pxf = (pp % width).astype(f32)
        pyf = (pp // width).astype(f32)
    else:
        sub = jax.lax.broadcasted_iota(i32, shape, 0)
        lane = jax.lax.broadcasted_iota(i32, shape, 1)
        pix = pix_off + (tile * rs + sub) * 128 + lane
        in_image = pix < (width * height)
        pxf = (pix % width).astype(f32)
        pyf = (pix // width).astype(f32)

    cam = [cam_ref[i] for i in range(18)]
    (lfx, lfy, lfz, dux, duy, duz, dvx, dvy, dvz,
     pox, poy, poz, deux, deuy, deuz, devx, devy, devz) = cam
    if gm:
        (g_isc, g_evr, g_evg, g_evb, g_odr, g_odg, g_odb,
         g_ior) = [cam_ref[18 + i] for i in range(8)]

    zf = jnp.zeros(shape, f32)
    zi = jnp.zeros(shape, i32)

    if resume:
        # continue mid-path from the previous pass's saved slot state
        # (ray + throughput + radiance + integer counters as f32 planes)
        state = tuple(st_in[i] for i in range(13)) + (
            st_in[13].astype(i32), st_in[14].astype(i32),
            st_in[15].astype(i32))
    else:
        state = (
            zf, zf, zf,            # origin
            zf, zf, zf + 1.0,      # direction (placeholder non-zero)
            zf,                    # time
            zf, zf, zf,            # throughput
            zf, zf, zf,            # radiance accumulator
            zi,                    # scatters remaining
            jnp.where(in_image, spp, 0).astype(i32),  # samples remaining
            zi,                    # active (i32: Mosaic can't carry i1 vectors)
        )
    if debug_iters:
        # instrumentation-only extension: per-tile while-loop trip count and
        # PER-LANE executed iterations (the lane's total demand = sum of its
        # samples' path lengths) — quantifies the sample-budget straggler
        # tail (PERF.md) and feeds the cost-sorted respawn pilot
        state = state + (jnp.zeros((), jnp.float32), zf)
    elif budget:
        state = state + (jnp.zeros((), jnp.int32),)  # trip counter

    def alive(st):
        act, samp = st[15], st[14]
        more = jnp.any((act > 0) | (samp > 0))
        if budget:
            more &= st[16] < budget
        return more

    def body(st):
        (ox, oy, oz, dx, dy, dz, tau, thx, thy, thz,
         ar, ag, ab, depth, samples, active_i) = st[:16]
        active = active_i > 0

        # ---- respawn dead slots with the next camera sample ----
        # (Camera.getRay, camera.zig:59-77: +-0.5 pixel jitter, defocus-disk
        # origin, time in [0,1); polar disk sample replaces rejection.)
        # (Wave respawn — whole-tile-at-once, for bounce-coherent culled
        # sweeps — was measured SLOWER at 16k-100k: the occupancy loss of
        # running each wave to its last straggler exceeds the pruning gain,
        # because one divergent secondary ray already keeps most clusters
        # 'possible'. Secondary-ray coherence needs inter-bounce compaction
        # and sorting instead: see ops/wavefront.py.)
        spawn = (~active) & (samples > 0)
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
            nox, noy, noz = (jnp.broadcast_to(v, shape) for v in (lfx, lfy, lfz))
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
        thx = jnp.where(spawn, 1.0, thx)
        thy = jnp.where(spawn, 1.0, thy)
        thz = jnp.where(spawn, 1.0, thz)
        depth = jnp.where(spawn, max_depth, depth)
        samples = samples - spawn.astype(i32)
        active = active | spawn
        if debug_iters:
            was_active = active.astype(f32)

        # ---- nearest-hit sphere loop (Sphere.hitInner, geom.zig:38-66) ----
        a = dx * dx + dy * dy + dz * dz
        inv_a = 1.0 / a
        d_dot_o = dx * ox + dy * oy + dz * oz
        o2 = ox * ox + oy * oy + oz * oz
        tmin_a = t_min * a  # root tests run in q = t*a space: saves two
        #                     inv_a multiplies per sphere (a > 0 always)
        if has_motion:
            tau2 = tau * tau

        # Winner carry: q_best, winner center (sphere) / plane normal (tri),
        # then the mode's attribute rows. gm: packed flags/kind/method/fuzz +
        # solid albedo (4). Full: packed kind/method/fuzz, ior-or-scale,
        # even rgb, odd rgb, is-triangle flag (9).
        n_attrs = 4 if gm else 9
        hit0 = (jnp.full(shape, _BIG, f32), zf, zf, zf) + (zf,) * n_attrs

        def sphere_attr_rows(j):
            if gm:
                return [tab_ref[_GPKF, j], tab_ref[_GALR, j],
                        tab_ref[_GALG, j], tab_ref[_GALB, j]]
            return [tab_ref[_PKF, j], tab_ref[_IOS, j],
                    tab_ref[_EVR, j], tab_ref[_EVG, j], tab_ref[_EVB, j],
                    tab_ref[_ODR, j], tab_ref[_ODG, j], tab_ref[_ODB, j],
                    0.0]

        def tri_attr_rows(j):
            if gm:
                return [tri_ref[_TGPKF, j], tri_ref[_TGALR, j],
                        tri_ref[_TGALG, j], tri_ref[_TGALB, j]]
            return [tri_ref[_TPKF, j], tri_ref[_TIOS, j],
                    tri_ref[_TEVR, j], tri_ref[_TEVG, j], tri_ref[_TEVB, j],
                    tri_ref[_TODR, j], tri_ref[_TODG, j], tri_ref[_TODB, j],
                    1.0]

        def one_sphere(j, h):
            qb, bcx, bcy, bcz = h[:4]
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
            # No disc >= 0 mask: sqrt(negative) = NaN and every NaN compare
            # below is false, so misses reject themselves. Padding lanes have
            # ccmr2 = 3e38 -> disc = -inf -> NaN -> never win.
            rt = jnp.sqrt(disc)
            q1 = half_b - rt
            q2 = half_b + rt
            # nearest root in [t_min, t_best); second root only if the first
            # is out of range (geom.zig:52-60 with the BVH's shrinking tmax).
            # q2 >= q1, so if q1 is in range it is the answer; if q1 >= qb the
            # sphere cannot win either way.
            qv = jnp.where(q1 >= tmin_a, q1, q2)
            better = (qv >= tmin_a) & (qv < qb)
            return (jnp.where(better, qv, qb),
                    jnp.where(better, cxe, bcx),
                    jnp.where(better, cye, bcy),
                    jnp.where(better, cze, bcz),
                    *(jnp.where(better, new, old)
                      for new, old in zip(sphere_attr_rows(j), h[4:])))

        def one_triangle(j, h):
            """Plane-then-barycentric triangle test (intersect.py
            intersect_triangles in per-column scalar form), sharing the
            sphere loop's q = t*a winner space. Double-sided; parallel rays
            (n.d == 0) and padding columns self-reject via inf/NaN compares
            and the g1.v0 = +BIG poison respectively."""
            qb, bcx, bcy, bcz = h[:4]
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
            # barycentrics on the hit point (6 fewer ops than dotting o and
            # d separately; same math to f32 rounding)
            hx = ox + tt * dx
            hy = oy + tt * dy
            hz = oz + tt * dz
            u = g1x * hx + g1y * hy + g1z * hz - tri_ref[_TG1V, j]
            v = g2x * hx + g2y * hy + g2z * hz - tri_ref[_TG2V, j]
            better = ((qv >= tmin_a) & (qv < qb)
                      & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0))
            return (jnp.where(better, qv, qb),
                    jnp.where(better, tnx, bcx),
                    jnp.where(better, tny, bcy),
                    jnp.where(better, tnz, bcz),
                    *(jnp.where(better, new, old)
                      for new, old in zip(tri_attr_rows(j), h[4:])))

        # unrolled over the PADDED primitive counts: independent dependency
        # chains per iteration for VPU ILP; padding lanes are self-rejecting
        # (see NaN note above).
        def _culled_loop(h, n_items, blk_ref, group_fn):
            """Blocks of ``blk`` Morton-adjacent primitives, each guarded by
            a tile-wide bounding-sphere test (the same quadratic the sphere
            hit uses, against the block bound) — skip the whole block when no
            active ray can beat its current best inside the bound.
            ``group_fn(g, h)`` sweeps primitives [g*unroll, (g+1)*unroll)."""
            gpb = blk // unroll  # groups per block

            def block_body(i, h):
                qb = h[0]
                bx = blk_ref[0, i]
                by = blk_ref[1, i]
                bz = blk_ref[2, i]
                ccb = blk_ref[3, i]
                hb = dx * bx + dy * by + dz * bz - d_dot_o
                ob = ox * bx + oy * by + oz * bz
                disc = hb * hb - a * (ccb - 2.0 * ob + o2)
                rtb = jnp.sqrt(disc)  # NaN on miss -> compares false
                possible = active & (hb - rtb < qb) & (hb + rtb >= tmin_a)

                def run(h):
                    return jax.lax.fori_loop(
                        0, gpb, lambda k, h: group_fn(i * gpb + k, h), h)

                return jax.lax.cond(jnp.any(possible), run, lambda h: h, h)

            return jax.lax.fori_loop(0, n_items // blk, block_body, h)

        def sphere_candidate(j):
            """Independent nearest-hit candidate for sphere j: (qv, center,
            attrs) with invalid roots already poisoned to +BIG — lets a
            tournament tree merge 'unroll' candidates in log2 depth instead
            of the data-dependent select chain (one_sphere's qb carry
            serializes 'unroll' deep per group)."""
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
            rt = jnp.sqrt(disc)  # NaN -> both roots compare false -> BIG
            q1 = half_b - rt
            q2 = half_b + rt
            qv = jnp.where(q1 >= tmin_a, q1, q2)
            qv = jnp.where(qv >= tmin_a, qv, _BIG)
            # attrs stay SMEM scalars until a vector-masked merge touches
            # them — jnp.where broadcasts lazily, no upfront materialization
            return (qv, cxe, cye, cze, *sphere_attr_rows(j))

        def tri_candidate(j):
            """Independent candidate for triangle j (see one_triangle for the
            geometry); barycentric-invalid and padding columns poison qv to
            +BIG so the merge tree needs no extra masks."""
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
            # barycentrics on the hit point (6 fewer ops than dotting o and
            # d separately; same math to f32 rounding)
            hx = ox + tt * dx
            hy = oy + tt * dy
            hz = oz + tt * dz
            u = g1x * hx + g1y * hy + g1z * hz - tri_ref[_TG1V, j]
            v = g2x * hx + g2y * hy + g2z * hz - tri_ref[_TG2V, j]
            ok = ((qv >= tmin_a) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0))
            qv = jnp.where(ok, qv, _BIG)
            return (qv, tnx, tny, tnz, *tri_attr_rows(j))

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

        def chain_group(one_fn):
            def group(g, h):
                for k in range(unroll):
                    h = one_fn(unroll * g + k, h)
                return h
            return group

        sph_group = (tree_group(sphere_candidate) if tree
                     else chain_group(one_sphere))
        # Triangles always use the serial chain: the candidate's Newton
        # reciprocal dominates its latency and the tournament merge measured
        # ~10-20% SLOWER on the Cornell box (tree still wins for spheres).
        tri_group = chain_group(one_triangle)

        def _stream_loop(h, n_items, hbm_ref, cbnd_ref, blkh_ref, sc_ref,
                         blk_sc, sem_slot, group_fn):
            """Chunked HBM->SMEM streaming sweep: per chunk, a bounding-
            sphere test (same math as _culled_loop's, bound rows resident in
            SMEM) decides whether the chunk is touched AT ALL — the table
            slice is DMA'd into SMEM scratch only inside the taken branch
            (round-5: prune before DMA — at ~50 slot-iterations per tile the
            re-streamed table makes this kernel BANDWIDTH-bound at 64k+, so
            a skipped chunk must skip its HBM traffic, not just its sweep;
            the serialized DMA latency inside the branch is ~1us vs the
            ~100us sweep it feeds). Inside a fetched chunk the existing
            block-culled loop runs against the streamed block rows — a
            two-level hierarchy: chunk bound, then block bound, then
            candidates."""
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
                        hbm_ref.at[:, pl.ds(c * stream, stream)], sc_ref,
                        sem_ref.at[sem_slot])
                    cp.start()
                    if blk:
                        nb = stream // blk
                        cp2 = pltpu.make_async_copy(
                            blkh_ref.at[:, pl.ds(c * nb, nb)], blk_sc,
                            sem_ref.at[sem_slot + 1])
                        cp2.start()
                        cp2.wait()
                    cp.wait()
                    if blk:
                        return _culled_loop(h, stream, blk_sc, group_fn)
                    return jax.lax.fori_loop(
                        0, stream // unroll, group_fn, h)

                if not stream_cull:  # forced brute force (benchmarks)
                    return run(h)
                return jax.lax.cond(jnp.any(possible), run, lambda h: h, h)

            return jax.lax.fori_loop(0, n_chunks, chunk_body, h)

        h = hit0
        if n_pad:
            if stream:
                h = _stream_loop(h, n_pad, s_hbm, s_cbnd, s_blkh, tab_ref,
                                 sblk_ref, 0, sph_group)
            elif blk:
                h = _culled_loop(h, n_pad, sblk_ref, sph_group)
            else:
                ngr = (n_pad + unroll - 1) // unroll
                if tree and ngr % 2 == 0:
                    # two independent winner carries across alternating
                    # groups: halves the cross-group select-chain latency
                    def dual(k, hh):
                        return (sph_group(2 * k, hh[0]),
                                sph_group(2 * k + 1, hh[1]))
                    h0, h1 = jax.lax.fori_loop(0, ngr // 2, dual, (h, hit0))
                    h = merge(h0, h1)
                else:
                    h = jax.lax.fori_loop(0, ngr, sph_group, h)
        if m_pad:
            if stream:
                h = _stream_loop(h, m_pad, t_hbm, t_cbnd, t_blkh, tri_ref,
                                 tblk_ref, 2, tri_group)
            elif blk:
                h = _culled_loop(h, m_pad, tblk_ref, tri_group)
            else:
                h = jax.lax.fori_loop(
                    0, (m_pad + unroll - 1) // unroll, tri_group, h)
        qb, bcx, bcy, bcz = h[:4]
        bpk = h[4]

        # decode winner attributes
        hit = qb < _BIG
        tb = qb * inv_a
        ts = jnp.where(hit, tb, 1.0)
        bkm = jnp.floor(bpk * 0.25)
        bfz = (bpk - 4.0 * bkm) * 0.5
        if gm:
            # bkm = flags*16 + kind*4 + method; flags = istri*2 + ischecker
            flags = jnp.floor(bkm * (1.0 / 16.0))
            bkm = bkm - 16.0 * flags
            btri = jnp.floor(flags * 0.5)
            ischk = flags - 2.0 * btri
        else:
            btri = h[12]
        px_ = ox + ts * dx
        py_ = oy + ts * dy
        pz_ = oz + ts * dz

        # outward normal: sphere = unit(p - c) (geom.zig:64); triangle = unit
        # plane normal stored in the same carry slots. Flipped to oppose the
        # ray below (Hit.init, hit.zig:31-34).
        if m_pad and n_pad:
            is_tri = btri > 0.5
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
        is_d_kind = kind == float(MAT_DIELECTRIC)
        if gm:
            bio = g_ior  # scalar; the scene's sole dielectric IOR
            # checker albedo from the scene globals (only where the winner's
            # material is the sole checker texture); solid winners carry
            # their color through the loop.
            par = (jnp.floor(px_ * g_isc) + jnp.floor(py_ * g_isc)
                   + jnp.floor(pz_ * g_isc))
            even_par = par - 2.0 * jnp.floor(par * 0.5) < 0.5
            chk = ischk > 0.5
            alr = jnp.where(chk, jnp.where(even_par, g_evr, g_odr), h[5])
            alg = jnp.where(chk, jnp.where(even_par, g_evg, g_odg), h[6])
            alb = jnp.where(chk, jnp.where(even_par, g_evb, g_odb), h[7])
        else:
            bios = h[5]
            ber, beg, beb, bor_, bog, bob = h[6:12]
            bio = bios                               # ior (dielectric only)
            bsc = jnp.where(is_d_kind, 1.0, bios)    # checker scale otherwise

            # checker albedo (CheckerTexture, material.zig:27-39): floor-
            # parity of p/scale selects even/odd; solid textures have
            # even == odd.
            isc = 1.0 / bsc
            par = (jnp.floor(px_ * isc) + jnp.floor(py_ * isc)
                   + jnp.floor(pz_ * isc))
            even_par = par - 2.0 * jnp.floor(par * 0.5) < 0.5
            alr = jnp.where(even_par, ber, bor_)
            alg = jnp.where(even_par, beg, bog)
            alb = jnp.where(even_par, beb, bob)

        # ---- diffuse (material.zig:75-101) ----
        ux, uy, uz = unit3()
        # u^(1/3) via exp/log (no cbrt lowering in Mosaic); u > 0 enforced.
        cb = jnp.exp(jnp.log(jnp.maximum(uniform(), 1e-24)) * (1.0 / 3.0))
        sx, sy, sz = ux * cb, uy * cb, uz * cb  # in unit ball
        flip = jnp.where(sx * nx + sy * ny + sz * nz > 0.0, 1.0, -1.0)
        m0 = method == 0.0  # UNIT_SPHERE
        m1 = method == 1.0  # UNIT_SPHERE_SURFACE
        offx = jnp.where(m0, nx + sx, jnp.where(m1, nx + ux, sx * flip))
        offy = jnp.where(m0, ny + sy, jnp.where(m1, ny + uy, sy * flip))
        offz = jnp.where(m0, nz + sz, jnp.where(m1, nz + uz, sz * flip))
        # reference quirk (material.zig:85-86): near-zero check on the target
        # POINT; a near-origin target snaps to the bare normal.
        tgx, tgy, tgz = px_ + offx, py_ + offy, pz_ + offz
        nz_tgt = ((jnp.abs(tgx) <= 1e-8) & (jnp.abs(tgy) <= 1e-8)
                  & (jnp.abs(tgz) <= 1e-8))
        tgx = jnp.where(nz_tgt, nx, tgx)
        tgy = jnp.where(nz_tgt, ny, tgy)
        tgz = jnp.where(nz_tgt, nz, tgz)
        difx, dify, difz = tgx - px_, tgy - py_, tgz - pz_

        # ---- metallic (material.zig:107-131) ----
        two_ndd = 2.0 * (dx * nx + dy * ny + dz * nz)
        rfx = dx - two_ndd * nx
        rfy = dy - two_ndd * ny
        rfz = dz - two_ndd * nz
        rinv = jax.lax.rsqrt(jnp.maximum(rfx * rfx + rfy * rfy + rfz * rfz,
                                         1e-24))
        fz = jnp.minimum(bfz, 1.0)
        # fuzz perturbation reuses the diffuse unit sample: a ray evaluates
        # exactly one material, so the streams never mix.
        mex = rfx * rinv + fz * ux
        mey = rfy * rinv + fz * uy
        mez = rfz * rinv + fz * uz
        metal_ok = mex * nx + mey * ny + mez * nz > 0.0

        # ---- dielectric (material.zig:136-159) ----
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
        do_refl = cannot | (refl_p > uniform())
        ppx = (udx + cos_t * nx) * eta
        ppy = (udy + cos_t * ny) * eta
        ppz = (udz + cos_t * nz) * eta
        parm = -jnp.sqrt(jnp.maximum(1.0 - (ppx * ppx + ppy * ppy + ppz * ppz),
                                     0.0))
        # reflect uses the NON-unit incoming dir, refract the unit dir
        # (material.zig:146,152) — reproduced as-is.
        dlx = jnp.where(do_refl, rfx, ppx + parm * nx)
        dly = jnp.where(do_refl, rfy, ppy + parm * ny)
        dlz = jnp.where(do_refl, rfz, ppz + parm * nz)

        # ---- select by material kind (material.zig:167-176) ----
        is_m = kind == float(MAT_METALLIC)
        is_d = is_d_kind
        ndirx = jnp.where(is_d, dlx, jnp.where(is_m, mex, difx))
        ndiry = jnp.where(is_d, dly, jnp.where(is_m, mey, dify))
        ndirz = jnp.where(is_d, dlz, jnp.where(is_m, mez, difz))
        atr = jnp.where(is_d, 1.0, alr)
        atg = jnp.where(is_d, 1.0, alg)
        atb = jnp.where(is_d, 1.0, alb)
        # Degenerate scatter guard: a near-cancelling direction (e.g. diffuse
        # normal + unit sample ~ 0) underflows |d|^2, which would alias a
        # spurious hit at t ~ 1/|d|^2 into an inf point and NaN normal on the
        # next bounce. Probability ~0 per ray; treat as absorbed.
        nd2 = ndirx * ndirx + ndiry * ndiry + ndirz * ndirz
        scattered = ((~is_m) | metal_ok) & (nd2 > 1e-20)

        # ---- miss -> sky, weighted by throughput (renderer.zig:124-125);
        # note the reference's exact formula: (white*(1-t) + blue) * t ----
        sky_t = 0.5 * (dy * dinv + 1.0)
        skyr = (1.0 - sky_t + 0.5) * sky_t
        skyg = (1.0 - sky_t + 0.7) * sky_t
        skyb = (1.0 - sky_t + 1.0) * sky_t
        miss = active & ~hit
        ar = ar + jnp.where(miss, thx * skyr, 0.0)
        ag = ag + jnp.where(miss, thy * skyg, 0.0)
        ab = ab + jnp.where(miss, thz * skyb, 0.0)

        # ---- continue or die (bounceRay, renderer.zig:103-126) ----
        cont = active & hit & scattered
        thx = jnp.where(cont, thx * atr, thx)
        thy = jnp.where(cont, thy * atg, thy)
        thz = jnp.where(cont, thz * atb, thz)
        ox = jnp.where(cont, px_, ox)
        oy = jnp.where(cont, py_, oy)
        oz = jnp.where(cont, pz_, oz)
        dx = jnp.where(cont, ndirx, dx)
        dy = jnp.where(cont, ndiry, dy)
        dz = jnp.where(cont, ndirz, dz)
        depth = depth - cont.astype(i32)
        # depth exhausted -> black (bounceRay depth==0, renderer.zig:104-105)
        active = cont & (depth > 0)

        out = (ox, oy, oz, dx, dy, dz, tau, thx, thy, thz,
               ar, ag, ab, depth, samples, active.astype(i32))
        if debug_iters:
            out = out + (st[16] + 1.0, st[17] + was_active)
        elif budget:
            out = out + (st[16] + 1,)
        return out

    final = jax.lax.while_loop(alive, body, state)
    r_ref[:] = final[10]
    if debug_iters:
        g_ref[:] = jnp.full(shape, final[16])
        b_ref[:] = final[17]
    else:
        g_ref[:] = final[11]
        b_ref[:] = final[12]
    if save_state:
        for i in range(13):
            st_out[i] = final[i]
        st_out[13] = final[13].astype(jnp.float32)
        st_out[14] = final[14].astype(jnp.float32)
        st_out[15] = final[15].astype(jnp.float32)


def _trace_shard(scene: Scene, camera: Camera, seed, pix_offset, n_local: int,
                 *, spp: int, max_depth: int, t_min: float, jitter: bool,
                 tile_sublanes: int, unroll: int, interpret, blk: int = 0,
                 tree: bool = True, stream: int = 0, stream_cull: bool = True,
                 debug_iters: bool = False):
    """Trace ``n_local`` consecutive pixels starting at global index
    ``pix_offset``; returns flat [n_local, 3] radiance sums (divide by spp for
    the image). This is the unit a device shard executes under shard_map.

    ``blk > 0`` enables block culling: primitives are Morton-sorted, their
    tables padded to a block multiple (poisoned so padding never hits), and
    per-block bounding-sphere rows ride along in SMEM."""
    rs = tile_sublanes
    h, w = camera.height, camera.width
    n_tiles = -(-n_local // (rs * 128))
    nsub = n_tiles * rs

    n_pad = int(scene.sphere_radius.shape[0]) if scene.n_spheres > 0 else 0
    m_pad = int(scene.tri_material.shape[0]) if scene.n_triangles > 0 else 0
    gm = use_global_materials(scene)
    cam = _camera_vector(camera)
    if gm:
        cam = jnp.concatenate([cam, _scene_globals(scene)])
    seed_arr = jnp.stack([
        jnp.asarray(seed, jnp.int32).reshape(()),
        jnp.asarray(pix_offset, jnp.int32).reshape(()),
    ])
    if stream:
        return _trace_shard_streamed(
            scene, camera, seed_arr, cam, n_local, nsub, n_tiles,
            spp=spp, max_depth=max_depth, t_min=t_min, jitter=jitter,
            rs=rs, unroll=unroll, interpret=interpret, blk=blk, tree=tree,
            stream=stream, gm=gm, w=w, h=h, n_pad=n_pad, m_pad=m_pad,
            stream_cull=stream_cull)

    tabs, blk_inputs, n_pad, m_pad = _smem_scene_inputs(
        scene, gm, blk, unroll, n_pad, m_pad)
    inputs = [cam] + tabs + blk_inputs
    inputs.append(seed_arr)

    smem_bytes = sum(4 * int(jnp.size(x)) for x in inputs)
    if smem_bytes > SMEM_BUDGET:
        raise ValueError(
            f"scene tables need {smem_bytes} bytes of SMEM (> ~900KB budget: "
            f"{n_pad} padded spheres + {m_pad} padded triangles). The "
            "megakernel holds the whole scene in SMEM; above ~16k primitives "
            "use engine='xla' (rayz_tpu.render) or split the scene.")

    kern = functools.partial(
        _kernel, width=w, height=h, n_pad=n_pad, m_pad=m_pad,
        spp=spp,
        max_depth=max_depth, t_min=t_min, jitter=jitter,
        has_motion=scene.has_motion, rs=rs, unroll=unroll, gm=gm, blk=blk,
        tree=tree, debug_iters=debug_iters)

    out_shape = jax.ShapeDtypeStruct((nsub, 128), jnp.float32)
    out_spec = pl.BlockSpec((rs, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    r, g, b = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * len(inputs),
        out_shape=(out_shape, out_shape, out_shape),
        out_specs=(out_spec, out_spec, out_spec),
        interpret=interpret,
    )(*inputs)

    flat = jnp.stack([r.reshape(-1), g.reshape(-1), b.reshape(-1)], axis=-1)
    return flat[:n_local]


def _trace_shard_compact(scene: Scene, camera: Camera, seed, pix_offset,
                         n_local: int, *, spp: int, max_depth: int,
                         t_min: float, jitter: bool, tile_sublanes: int,
                         unroll: int, interpret, blk: int = 0,
                         tree: bool = True, budget: int = 32,
                         passes: int = 26):
    """Straggler-compacted respawn: the budgeted multi-pass variant of
    :func:`_trace_shard` (round-5 forward speed-of-light work).

    The single-launch kernel runs each tile until its LAST lane exhausts its
    sample budget; measured on the flagship (scripts/exp_fwd.py --tail),
    that wastes 2.1x the executed work, because a lane owns ALL spp samples
    of one pixel and per-pixel path cost varies wildly (glass-interior
    pixels sweep ~19 bounces/sample vs ~1 for sky). Static cures fail:
    sorting pixels by a pilot cost estimate recovers only ~1.25x (per-sample
    path-length variance dominates the between-pixel means), and splitting
    a pixel's budget over G slots without rebalancing recovers nothing. The
    fix must react to the REALIZED demand — the same conclusion pathrec's
    recording reached (pathrec.py default_schedule):

    * every pass caps the while-loop at ``budget`` trips and saves per-slot
      state (ray, throughput, radiance, counters, 16 f32 planes);
    * between passes, slots are stable-partitioned so unfinished ones pack
      densely into the front tiles (XLA cumsum+scatter, no sort);
    * finished slots ride along in the back tiles, which fail the kernel's
      alive() check on entry and cost ~one DMA each;
    * the last pass runs unbounded, so the estimator completes EXACTLY —
      every sample traced to termination, radiance bit-carried across pass
      boundaries (no truncation, nothing to assert).

    Simulated on measured demand: budget=32 x 26 passes executes 1.98x
    fewer tile-trips than the single launch; measured end-to-end gain is
    below that only by the per-pass launch+partition overhead.
    """
    rs = tile_sublanes
    h, w = camera.height, camera.width
    lanes = rs * 128
    n_tiles = -(-n_local // lanes)
    nsub = n_tiles * rs
    cap = nsub * 128

    n_pad = int(scene.sphere_radius.shape[0]) if scene.n_spheres > 0 else 0
    m_pad = int(scene.tri_material.shape[0]) if scene.n_triangles > 0 else 0
    gm = use_global_materials(scene)
    cam = _camera_vector(camera)
    if gm:
        cam = jnp.concatenate([cam, _scene_globals(scene)])
    tabs, blk_inputs, n_pad, m_pad = _smem_scene_inputs(
        scene, gm, blk, unroll, n_pad, m_pad)
    base_inputs = [cam] + tabs + blk_inputs

    smem_bytes = sum(4 * int(jnp.size(x)) for x in base_inputs) + 8
    if smem_bytes > SMEM_BUDGET:
        raise ValueError(
            f"scene tables need {smem_bytes} bytes of SMEM (> ~900KB "
            "budget); use engine='xla' or the streamed path")

    out_shape = jax.ShapeDtypeStruct((nsub, 128), jnp.float32)
    out_spec = pl.BlockSpec((rs, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    st_shape = jax.ShapeDtypeStruct((16, nsub, 128), jnp.float32)
    st_spec = pl.BlockSpec((16, rs, 128), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def launch(pass_idx, pix_ids, st):
        first = pass_idx == 0
        last = pass_idx == passes - 1
        kern = functools.partial(
            _kernel, width=w, height=h, n_pad=n_pad, m_pad=m_pad, spp=spp,
            max_depth=max_depth, t_min=t_min, jitter=jitter,
            has_motion=scene.has_motion, rs=rs, unroll=unroll, gm=gm,
            blk=blk, tree=tree, budget=0 if last else budget,
            resume=not first, save_state=not last, pix_table=True)
        # per-pass PRNG decorrelation (Weyl step, wraps mod 2^32)
        seed_arr = jnp.stack([
            (jnp.asarray(seed, jnp.int32)
             + jnp.int32(pass_idx) * jnp.int32(-1640531527)).reshape(()),
            jnp.asarray(pix_offset, jnp.int32).reshape(()),
        ])
        inputs = base_inputs + [seed_arr,
                                pix_ids.reshape(nsub, 128)]
        in_specs = [smem] * (len(base_inputs) + 1) + [out_spec]
        if not first:
            inputs.append(st.reshape(16, nsub, 128))
            in_specs.append(st_spec)
        out_shapes = (out_shape, out_shape, out_shape)
        out_specs = (out_spec, out_spec, out_spec)
        if not last:
            out_shapes = out_shapes + (st_shape,)
            out_specs = out_specs + (st_spec,)
        return pl.pallas_call(
            kern, grid=(n_tiles,), in_specs=in_specs,
            out_shape=out_shapes, out_specs=out_specs,
            interpret=interpret,
        )(*inputs)

    # pass 0 slot order = flat pixel order; -1 pads slots beyond the shard
    pix = pix_offset + jnp.arange(cap, dtype=jnp.int32)
    pix = jnp.where(jnp.arange(cap) < n_local, pix, -1)
    st = None
    for p in range(passes):
        out = launch(p, pix, st)
        if p == passes - 1:
            r, g, b = out
            break
        st = out[3].reshape(16, cap)
        # stable partition: unfinished slots (mid-path or samples left) to
        # the front so later tiles go fully dead and exit on entry
        unfinished = (st[15] > 0.0) | (st[14] > 0.0)
        pos_a = jnp.cumsum(unfinished.astype(jnp.int32)) - 1
        n_unf = pos_a[-1] + 1
        pos = jnp.where(
            unfinished, pos_a,
            n_unf + jnp.cumsum((~unfinished).astype(jnp.int32)) - 1)
        order = jnp.zeros((cap,), jnp.int32).at[pos].set(
            jnp.arange(cap, dtype=jnp.int32))
        st = st[:, order]
        pix = pix[order]

    flat = jnp.stack([r.reshape(-1), g.reshape(-1), b.reshape(-1)], axis=-1)
    # slots are a permutation of the shard's pixels: scatter back to flat
    # pixel order. Retired (-1) slots must map to an OUT-OF-RANGE
    # non-negative index: mode="drop" only drops indices past the end —
    # negative ones WRAP, and -1 would overwrite the shard's last pixel.
    tgt = jnp.where(pix >= 0, pix - pix_offset, n_local)
    return jnp.zeros((n_local, 3), jnp.float32).at[tgt].set(
        flat, mode="drop")


def _trace_shard_streamed(scene, camera, seed_arr, cam, n_local, nsub,
                          n_tiles, *, spp, max_depth, t_min, jitter, rs,
                          unroll, interpret, blk, tree, stream, gm, w, h,
                          n_pad, m_pad, stream_cull=True):
    """Streamed-table variant of :func:`_trace_shard` (see _stream_loop in
    the kernel): per-class tables and 64-block bound rows live in HBM,
    Morton-sorted and padded to a chunk multiple with poisoned columns;
    per-chunk bounding spheres ride in SMEM. Removes the whole-scene-in-SMEM
    ceiling — the analogue of the reference BVH's unbounded N
    (/root/reference/src/hit.zig:101-217) at streaming cost."""
    assert stream % 128 == 0 and stream % unroll == 0
    smem_bytes = 4 * _stream_smem_words(scene, stream, blk)
    if smem_bytes > SMEM_BUDGET:
        raise ValueError(
            f"streamed megakernel scratch needs {smem_bytes} bytes of SMEM "
            f"(> ~{SMEM_BUDGET // 1000}KB budget): shrink the stream chunk "
            "or the scene (fits_stream gates auto-dispatch on the same "
            "accounting)")
    assert blk == 0 or (stream // blk) % 128 == 0, \
        "block-row DMA slices must be 128-aligned"
    (tabs, hbm_specs, cbnds, _scb, blk_hbm, n_pad,
     m_pad) = _stream_scene_inputs(
        scene, gm, stream, blk, _cam_origin(camera), n_pad, m_pad)
    inputs = [cam] + tabs + cbnds
    smem_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * len(cbnds)
    inputs.extend(blk_hbm)
    hbm_specs2 = [pl.BlockSpec(memory_space=pl.ANY)] * len(blk_hbm)
    inputs.append(seed_arr)

    # DMA slabs must be 8-sublane aligned: pad the HBM tables (and the
    # matching SMEM scratch) to a row multiple of 8 (13-row gm tables fault
    # the chip otherwise; extra rows are never read).
    rows_s = _round_up(_GNROWS if gm else _NROWS, 8)
    rows_t = _round_up(_TGNROWS if gm else _TNROWS, 8)
    scratch = []
    if n_pad:
        scratch.append(pltpu.SMEM((rows_s, stream), jnp.float32))
        if blk:
            scratch.append(pltpu.SMEM((8, stream // blk), jnp.float32))
    if m_pad:
        scratch.append(pltpu.SMEM((rows_t, stream), jnp.float32))
        if blk:
            scratch.append(pltpu.SMEM((8, stream // blk), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((4,)))

    kern = functools.partial(
        _kernel, width=w, height=h, n_pad=n_pad, m_pad=m_pad, spp=spp,
        max_depth=max_depth, t_min=t_min, jitter=jitter,
        has_motion=scene.has_motion, rs=rs, unroll=unroll, gm=gm, blk=blk,
        tree=tree, stream=stream, stream_cull=stream_cull)

    out_shape = jax.ShapeDtypeStruct((nsub, 128), jnp.float32)
    out_spec = pl.BlockSpec((rs, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    r, g, b = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + hbm_specs + smem_specs + hbm_specs2
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=(out_shape, out_shape, out_shape),
        out_specs=(out_spec, out_spec, out_spec),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(*inputs)
    flat = jnp.stack([r.reshape(-1), g.reshape(-1), b.reshape(-1)], axis=-1)
    return flat[:n_local]


def _resolve_tiling(scene: Scene, tile_sublanes: Optional[int],
                    unroll: Optional[int]):
    """Per-scene tiling defaults (measured on v5e): sphere scenes run best
    at tile_sublanes=16 / unroll=8; triangle-dominant scenes at 32 / 16
    (+13% on the Cornell box — bigger tiles amortize the per-tile fixed
    cost over the longer enclosed-scene bounce chains)."""
    tri_dom = scene.n_triangles > scene.n_spheres
    if tile_sublanes is None:
        tile_sublanes = 32 if tri_dom else 16
    if unroll is None:
        unroll = 16 if tri_dom else 8
    return tile_sublanes, unroll


def _cam_origin(camera) -> jnp.ndarray:
    return camera.look_from.astype(jnp.float32)


def _near_to_far(tab, lo, hi, valid, group: int, origin, within: int = 0):
    """Permute ``group``-sized column groups so the sweep visits them in
    order of increasing distance from ``origin`` (the camera): the winner
    distance ``qb`` then collapses within the first few groups and every
    occluded cluster fails the ``hb - rtb < qb`` bound test — the TPU
    analogue of BVH near-child-first traversal with shrinking tmax
    (/root/reference/src/hit.zig:197-204). Sort key = nearest valid
    member's distance (robust for large clusters). With ``within`` > 0,
    groups are reordered only inside each ``within``-sized segment (blocks
    within a streamed chunk), preserving the outer segment order."""
    n = valid.shape[0]
    ng = n // group
    ctr = 0.5 * (lo + hi)
    d2 = jnp.sum((ctr - origin[None, :]) ** 2, axis=-1)
    d2 = jnp.where(valid, d2, jnp.inf)
    gd = jnp.min(d2.reshape(ng, group), axis=1)
    if within:
        gpw = within // group  # groups per segment
        inner = jnp.argsort(gd.reshape(-1, gpw), axis=1)
        order = (jnp.arange(ng // gpw)[:, None] * gpw + inner).reshape(-1)
    else:
        order = jnp.argsort(gd)
    col = (order[:, None] * group
           + jnp.arange(group)[None, :]).reshape(-1)
    return tab[:, col], lo[col], hi[col], valid[col]


def use_patch_order(width: int, height: int) -> bool:
    """Whether a 64x32-pixel patch slot layout is available for this image
    size (tiles evenly). Used by the WAVEFRONT driver to order its camera
    rays (wavefront.py); the persistent megakernel itself stays row-major
    (see the slot->pixel note in ``_kernel`` — patch order was measured
    slower there)."""
    return width % 64 == 0 and height % 32 == 0


@functools.lru_cache(maxsize=64)
def _patch_inverse(width: int, height: int):
    """Row-major pixel index -> slot index under the patch layout (numpy,
    static per image size): flat[_patch_inverse(w, h)] is the row-major
    image."""
    import numpy as _np
    p = _np.arange(width * height)
    x = p % width
    y = p // width
    ppr = width // 64
    pid = (y // 32) * ppr + (x // 64)
    q = (y % 32) * 64 + (x % 64)
    return _np.asarray(pid * 2048 + q, _np.int32)


def _smem_scene_inputs(scene: Scene, gm: bool, blk: int, unroll: int,
                       n_pad: int, m_pad: int):
    """Whole-scene-in-SMEM table prep shared by the megakernel and the
    wavefront kernel: Morton sort + block padding/poisoning + near-to-far
    block ordering + per-block bound rows. Returns (table inputs,
    block-row inputs, padded sphere count, padded triangle count)."""
    tabs = []
    blk_inputs = []
    if n_pad:
        stab = scene_tables_gm(scene) if gm else scene_tables(scene)
        if blk:
            lo, hi = _sphere_aabbs(scene)
            perm = _morton_perm(lo, hi, scene.sphere_valid)
            stab = stab[:, perm]
            n_pad = _round_up(n_pad, blk)
            stab = _pad_poison(stab, n_pad, _CCMR2)
            valid = jnp.pad(scene.sphere_valid[perm],
                            (0, n_pad - perm.shape[0]))
            pad3 = ((0, n_pad - perm.shape[0]), (0, 0))
            # near-to-far block ordering measured ~neutral-to-negative here
            # (staggered respawn keeps blocks 'possible' regardless); only
            # the streamed prep (wavefront regime) orders by distance
            blk_inputs.append(_block_rows(jnp.pad(lo[perm], pad3),
                                          jnp.pad(hi[perm], pad3),
                                          valid, blk))
        # The unroll groups read a full group past the last partial one:
        # pad to an unroll multiple with poisoned columns (an OOB SMEM read
        # on hardware silently returns garbage that could fabricate hits).
        n_pad = _round_up(n_pad, unroll)
        stab = _pad_poison(stab, n_pad, _CCMR2)
        tabs.append(stab)
    if m_pad:
        ttab = tri_tables_gm(scene) if gm else tri_tables(scene)
        if blk:
            lo, hi = _tri_aabbs(scene)
            perm = _morton_perm(lo, hi, scene.tri_valid)
            ttab = ttab[:, perm]
            m_pad = _round_up(m_pad, blk)
            ttab = _pad_poison(ttab, m_pad, _TG1V)
            valid = jnp.pad(scene.tri_valid[perm], (0, m_pad - perm.shape[0]))
            pad3 = ((0, m_pad - perm.shape[0]), (0, 0))
            blk_inputs.append(_block_rows(jnp.pad(lo[perm], pad3),
                                          jnp.pad(hi[perm], pad3),
                                          valid, blk))
        m_pad = _round_up(m_pad, unroll)
        ttab = _pad_poison(ttab, m_pad, _TG1V)
        tabs.append(ttab)
    return tabs, blk_inputs, n_pad, m_pad


def _sc_enabled(n_items: int, stream: int, sc_group: int) -> bool:
    """Whether the supercluster bound level applies to a streamed class:
    the chunk count must split evenly into >= 2 groups of ``sc_group``."""
    if not (sc_group and n_items and stream):
        return False
    n_chunks = n_items // stream
    return n_chunks % sc_group == 0 and n_chunks // sc_group >= 2


def _pick_sc_group(n_chunks: int) -> int:
    """Supercluster size (chunks per group) for a streamed class: the first
    small divisor that yields >= 2 groups, 0 if none."""
    for g in (5, 4, 6, 7, 8, 3, 2):
        if n_chunks % g == 0 and n_chunks // g >= 2:
            return g
    return 0


def _stream_scene_inputs(scene: Scene, gm: bool, stream: int, blk: int,
                         origin, n_pad: int, m_pad: int, sc_group: int = 0):
    """Streamed (HBM-resident) table prep shared by the megakernel and the
    wavefront kernel: Morton sort + chunk padding + near-to-far chunk and
    within-chunk block ordering + resident chunk bounds + block-row HBM
    slabs. With ``sc_group``, also SMEM-resident SUPERCLUSTER bound rows
    (one bounding sphere per ``sc_group`` consecutive chunks) for classes
    where :func:`_sc_enabled` holds — the level above chunks that prunes
    whole chunk groups before any of their DMAs issue. Returns (HBM tables,
    their specs, SMEM chunk-bound rows, SMEM supercluster-bound rows, block
    HBM slabs, padded counts)."""
    tabs = []
    hbm_specs = []
    cbnds = []
    scbnds = []
    blk_hbm = []
    if n_pad:
        stab = scene_tables_gm(scene) if gm else scene_tables(scene)
        lo, hi = _sphere_aabbs(scene)
        perm = _morton_perm(lo, hi, scene.sphere_valid)
        stab = stab[:, perm]
        n_pad = _round_up(n_pad, stream)
        stab = _pad_poison(stab, n_pad, _CCMR2)
        valid = jnp.pad(scene.sphere_valid[perm], (0, n_pad - perm.shape[0]))
        pad3 = ((0, n_pad - perm.shape[0]), (0, 0))
        lo = jnp.pad(lo[perm], pad3)
        hi = jnp.pad(hi[perm], pad3)
        # chunks near-to-far globally; blocks near-to-far within each chunk
        stab, lo, hi, valid = _near_to_far(stab, lo, hi, valid, stream,
                                           origin)
        if blk:
            stab, lo, hi, valid = _near_to_far(
                stab, lo, hi, valid, blk, origin, within=stream)
        rows_pad = _round_up(stab.shape[0], 8)
        stab = jnp.pad(stab, ((0, rows_pad - stab.shape[0]), (0, 0)))
        tabs.append(stab)
        hbm_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        cbnds.append(_block_rows(lo, hi, valid, stream))
        if _sc_enabled(n_pad, stream, sc_group):
            scbnds.append(_block_rows(lo, hi, valid, stream * sc_group))
        if blk:
            br = _block_rows(lo, hi, valid, blk)
            blk_hbm.append(jnp.pad(br, ((0, 4), (0, 0))))
    if m_pad:
        ttab = tri_tables_gm(scene) if gm else tri_tables(scene)
        lo, hi = _tri_aabbs(scene)
        perm = _morton_perm(lo, hi, scene.tri_valid)
        ttab = ttab[:, perm]
        m_pad = _round_up(m_pad, stream)
        ttab = _pad_poison(ttab, m_pad, _TG1V)
        valid = jnp.pad(scene.tri_valid[perm], (0, m_pad - perm.shape[0]))
        pad3 = ((0, m_pad - perm.shape[0]), (0, 0))
        lo = jnp.pad(lo[perm], pad3)
        hi = jnp.pad(hi[perm], pad3)
        ttab, lo, hi, valid = _near_to_far(ttab, lo, hi, valid, stream,
                                           origin)
        if blk:
            ttab, lo, hi, valid = _near_to_far(
                ttab, lo, hi, valid, blk, origin, within=stream)
        rows_pad = _round_up(ttab.shape[0], 8)
        ttab = jnp.pad(ttab, ((0, rows_pad - ttab.shape[0]), (0, 0)))
        tabs.append(ttab)
        hbm_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        cbnds.append(_block_rows(lo, hi, valid, stream))
        if _sc_enabled(m_pad, stream, sc_group):
            scbnds.append(_block_rows(lo, hi, valid, stream * sc_group))
        if blk:
            br = _block_rows(lo, hi, valid, blk)
            blk_hbm.append(jnp.pad(br, ((0, 4), (0, 0))))
    return tabs, hbm_specs, cbnds, scbnds, blk_hbm, n_pad, m_pad


def _resolve_blk(scene: Scene, culling: Optional[bool],
                 block_size: int) -> int:
    if culling is None:
        n = (scene.sphere_radius.shape[0] if scene.n_spheres else 0) + \
            (scene.tri_material.shape[0] if scene.n_triangles else 0)
        culling = n >= CULLING_AUTO_THRESHOLD
    return block_size if culling else 0


@functools.partial(
    jax.jit,
    static_argnames=("spp", "max_depth", "t_min", "jitter", "tile_sublanes",
                     "unroll", "interpret", "blk", "tree", "stream",
                     "stream_cull", "budget", "passes"),
)
def _render_pallas_impl(scene: Scene, camera: Camera, seed, *, spp: int,
                        max_depth: int, t_min: float, jitter: bool,
                        tile_sublanes: int, unroll: int, interpret: bool,
                        blk: int = 0, tree: bool = True, stream: int = 0,
                        stream_cull: bool = True, budget: int = 0,
                        passes: int = 0):
    h, w = camera.height, camera.width
    if passes > 1 and not stream:
        flat = _trace_shard_compact(
            scene, camera, seed, 0, h * w, spp=spp, max_depth=max_depth,
            t_min=t_min, jitter=jitter, tile_sublanes=tile_sublanes,
            unroll=unroll, interpret=interpret, blk=blk, tree=tree,
            budget=budget, passes=passes)
    else:
        flat = _trace_shard(
            scene, camera, seed, 0, h * w, spp=spp, max_depth=max_depth,
            t_min=t_min, jitter=jitter, tile_sublanes=tile_sublanes,
            unroll=unroll, interpret=interpret, blk=blk, tree=tree,
            stream=stream, stream_cull=stream_cull)
    return (flat.reshape(h, w, 3) / float(spp)).astype(camera.dtype)


def render_pallas(scene: Scene, camera: Camera, key, config, *,
                  tile_sublanes: Optional[int] = None,
                  unroll: Optional[int] = None,
                  interpret: Optional[bool] = None,
                  culling: Optional[bool] = None,
                  block_size: int = DEFAULT_BLOCK,
                  tree: bool = True,
                  stream: Optional[int] = None,
                  budget: Optional[int] = None,
                  passes: Optional[int] = None) -> jnp.ndarray:
    """Render via the fused Pallas megakernel; drop-in for
    :func:`rayz_tpu.ops.integrator.render` on supported scenes.

    ``key`` may be a PRNG key (folded to a seed) or an integer seed.
    ``interpret`` defaults to True off-TPU so tests can run the kernel on the
    CPU backend. ``tile_sublanes``/``unroll`` default per scene class
    (``_resolve_tiling``): 16/8 is the measured v5e optimum for the
    ~500-sphere flagship, 32/16 for the triangle-dominant Cornell box.

    ``culling``: bound-test culling (the BVH capability, hit.zig:101-217,
    redone TPU-style — Morton-sorted primitive blocks/chunks/superclusters
    behind tile-wide bounding-sphere tests). Default None enables the
    hierarchy for STREAMED scenes only: for SMEM-resident scenes the
    round-5 re-measure (CULLING_BENCH.json) put the in-SMEM block tests at
    0.93-1.04x once the compacted respawn removed the straggler tail they
    were partially masking. Pass True to force the in-SMEM block tests,
    False to disable all bound tests.

    ``budget``/``passes``: the straggler-compacted respawn schedule
    (:func:`_trace_shard_compact` — the round-5 +55% forward lever).
    Defaults: budget=spp trips per launch, 10 passes, enabled for
    SMEM-resident scenes at spp >= 16; ``passes=0`` forces the single
    launch. Deterministic configs render bit-identically either way.
    """
    if not supports_scene(scene):
        if scene.deep_checker:
            raise ValueError(
                "megakernel resolves only ONE level of checker nesting; "
                "this scene nests checkers inside checkers — render it with "
                "engine='xla' (rayz_tpu.render), which chases four levels")
        raise ValueError("megakernel needs a non-empty scene (spheres and/or "
                         "triangles)")
    tile_sublanes, unroll = _resolve_tiling(scene, tile_sublanes, unroll)
    blk = _resolve_blk(scene, culling, block_size)
    if stream is None:
        stream = 0 if fits_smem(scene, culling, block_size) \
            else DEFAULT_STREAM_CHUNK
    if culling is None and not stream:
        # Round-5 re-measure (CULLING_BENCH.json, 5 seeds/row): with the
        # straggler-compacted respawn the in-SMEM block bound tests read
        # 0.93-1.04x across 512..16k — the compaction captured the tail
        # the bound tests were partially hiding, and what remains is pure
        # overhead at mid N. Auto-culling now applies only to the streamed
        # hierarchy (chunk/supercluster bounds, where it measures 1.9-2.2x);
        # pass culling=True to force the in-SMEM block tests.
        blk = 0
    stream_cull = culling is not False
    if stream and tile_sublanes == 16:
        tile_sublanes = 32  # measured +14% at 64k (amortizes chunk DMAs)
    if stream:
        if stream % 128:
            raise ValueError("stream chunk must be a multiple of 128 (HBM "
                             "DMA slices are lane-tile aligned)")
        # inner block culling: the block-row DMA slice must also be
        # 128-aligned, so blocks are stream/128 primitives; disable below
        # the unroll granularity (tiny forced-stream test chunks).
        blk = stream // 128
        if blk < unroll or blk % unroll or not stream_cull:
            blk = 0
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if interpret is True:
        # TPU-semantics interpreter (plain interpret=True cannot emulate the
        # pltpu PRNG). NOTE: the interpreter stubs prng_random_bits to zeros,
        # so off-TPU use is for deterministic (jitter=False) configs/tests.
        interpret = pltpu.InterpretParams()
    seed = key if not is_prng_key(key) else jax.random.randint(
        key, (), 0, jnp.iinfo(jnp.int32).max)
    # Straggler-compacted respawn (see _trace_shard_compact): default ON for
    # SMEM-resident scenes with a meaningful sample budget — there the
    # per-tile last-lane tail costs ~2x (measured: flagship 20.4 -> ~30
    # Mrays/s). Below spp 16 the tail is small and the per-pass overhead
    # wins. budget/passes=0|1 forces the single launch.
    if passes is None:
        passes = 10 if (not stream and config.spp >= 16) else 0
    if budget is None:
        budget = config.spp
    return _render_pallas_impl(
        scene, camera, seed, spp=config.spp, max_depth=config.max_depth,
        t_min=config.t_min, jitter=config.jitter,
        tile_sublanes=tile_sublanes, unroll=unroll, interpret=interpret,
        blk=blk, tree=tree, stream=stream, stream_cull=stream_cull,
        budget=budget, passes=passes)


@functools.partial(
    jax.jit,
    static_argnames=("config", "mesh", "tile_sublanes", "unroll", "interp",
                     "blk", "budget", "passes"),
)
def _render_sharded_impl(scene: Scene, camera: Camera, seed, *, config, mesh,
                         tile_sublanes: int, unroll: int, interp: bool,
                         blk: int = 0, budget: int = 0, passes: int = 0):
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map as _shard_map
    except ImportError:  # pragma: no cover - older JAX
        from jax.experimental.shard_map import shard_map as _shard_map

    interpret = pltpu.InterpretParams() if interp else False
    axis = mesh.axis_names[0]
    n_dev = mesh.size
    h, w = camera.height, camera.width
    n_px = h * w
    shard_px = -(-n_px // n_dev)

    def body(scene, camera, seed):
        idx = jax.lax.axis_index(axis)
        # decorrelate device streams (Weyl step, wraps mod 2^32)
        dseed = seed + idx * jnp.int32(-1640531527)
        kw = dict(
            spp=config.spp, max_depth=config.max_depth, t_min=config.t_min,
            jitter=config.jitter, tile_sublanes=tile_sublanes, unroll=unroll,
            interpret=interpret, blk=blk)
        if passes > 1:
            # per-shard straggler-compacted respawn (the partition/gather
            # glue is shard-local, collective-free)
            return _trace_shard_compact(
                scene, camera, dseed, idx * shard_px, shard_px,
                budget=budget, passes=passes, **kw)
        return _trace_shard(
            scene, camera, dseed, idx * shard_px, shard_px, **kw)

    # check_vma=False: pallas_call out_shapes carry no vma info, and the
    # body is collective-free (pure per-shard compute), so there is nothing
    # for the varying-manual-axes checker to verify.
    fn = _shard_map(body, mesh=mesh, in_specs=(P(), P(), P()),
                    out_specs=P(axis), check_vma=False)
    flat = fn(scene, camera, seed)  # [shard_px * n_dev, 3]
    img = flat[:n_px].reshape(h, w, 3) / float(config.spp)
    return img.astype(camera.dtype)


def render_pallas_sharded(scene: Scene, camera: Camera, key, config, mesh, *,
                          tile_sublanes: Optional[int] = None,
                          unroll: Optional[int] = None,
                          interpret: Optional[bool] = None,
                          culling: Optional[bool] = None,
                          block_size: int = DEFAULT_BLOCK,
                          budget: Optional[int] = None,
                          passes: Optional[int] = None) -> jnp.ndarray:
    """Megakernel render with pixels sharded over a 1-D device mesh.

    Forward rendering is embarrassingly parallel over pixels (SURVEY.md §2
    parallelism plan): each device traces a contiguous block of the flat
    pixel array with its own kernel launch and PRNG stream (seed folded with
    the device index), and the image assembly is XLA's sharded output layout
    — zero collectives. The multi-host path composes with
    ``rayz_tpu.parallel.multihost`` exactly like the XLA renderer.
    """
    if not supports_scene(scene):
        raise ValueError("megakernel needs a non-empty scene (spheres and/or "
                         "triangles)")
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if is_prng_key(key):
        seed = jax.random.randint(key, (), 0, jnp.iinfo(jnp.int32).max)
    else:
        seed = jnp.asarray(key, jnp.int32)
    tile_sublanes, unroll = _resolve_tiling(scene, tile_sublanes, unroll)
    # same compact-respawn defaults as render_pallas (SMEM scenes, spp>=16)
    if passes is None:
        passes = 10 if config.spp >= 16 else 0
    if budget is None:
        budget = config.spp
    blk = _resolve_blk(scene, culling, block_size)
    if culling is None:
        blk = 0  # round-5: in-SMEM auto-culling off (see render_pallas)
    return _render_sharded_impl(
        scene, camera, seed, config=config, mesh=mesh,
        tile_sublanes=tile_sublanes, unroll=unroll, interp=bool(interpret),
        blk=blk, budget=budget, passes=passes)
