"""Batched ray/primitive intersection.

TPU-native replacement for the reference's per-ray recursive BVH traversal with
vtable dispatch (/root/reference/src/hit.zig:181-216, geom.zig:38-66). Instead
of a divergent tree walk, every ray tests every primitive as one dense [R, N]
computation whose inner products are expressed as ``[R,3] @ [3,N]`` matmuls —
the MXU-friendly form — followed by elementwise root-finding on the VPU and a
min-reduction for the nearest hit (SURVEY.md §7 design delta #5). Hit
attributes (point/normal/material) are computed only for the winning primitive
via cheap [R]-sized gathers.

The nearest-hit semantics match the reference exactly: the BVH's
shrinking-tmax traversal (hit.zig:197-214) computes the same argmin over
primitives that the dense reduction computes here.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..models.scene import Scene
from ..utils import vec

__all__ = ["HitRecord", "intersect", "intersect_spheres",
           "intersect_triangles", "aabb_hit", "aabb_enclose",
           "aabb_longest_axis", "sphere_aabb"]

# Primitive kind codes in HitRecord.kind
PRIM_SPHERE = 0
PRIM_TRIANGLE = 1


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HitRecord:
    """SoA equivalent of the reference Hit (hit.zig:16-42), batched over rays.

    ``normal`` is already flipped to oppose the ray (front-face convention of
    Hit.init, hit.zig:31-34); ``front_face`` records which side was hit.
    """

    t: jnp.ndarray  # [R]
    point: jnp.ndarray  # [R, 3]
    normal: jnp.ndarray  # [R, 3] unit, opposing the ray
    front_face: jnp.ndarray  # [R] bool
    material: jnp.ndarray  # [R] int32
    hit: jnp.ndarray  # [R] bool


def _matmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[R,3] x [N,3] -> [R,N] inner products on the MXU.

    Precision MUST be HIGHEST: the default matmul precision feeds the MXU
    bfloat16 operands, and the ~1e-2 absolute error that introduces into the
    quadratic's b/c terms produces severe self-intersection ring artifacts.
    True f32 contraction (6-pass bf16 on the MXU) costs little here — K=3, and
    the elementwise root-finding dominates.
    """
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=a.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )


def intersect_spheres(scene: Scene, origin, direction, time, t_min, t_max):
    """Nearest sphere hit per ray.

    Quadratic with the half-b optimization, matching Sphere.hitInner
    (geom.zig:38-66): ``offset = center(time) - origin``, ``half_b = d.offset``
    (note reference's sign convention: roots are (half_b -+ sqrt(disc)) / a),
    nearest root in [t_min, t_max], second root only if the first is out of
    range. Moving centers: center(t) = center0 + t * velocity (geom.zig:40 via
    Ray-stored centers).

    Returns (t [R], idx [R] int32) with t = +inf on miss.
    """
    dt = origin.dtype
    inf = jnp.asarray(jnp.inf, dt)
    c0 = scene.sphere_center  # [N,3]
    vel = scene.sphere_velocity
    r = scene.sphere_radius  # [N]

    d_dot_o = vec.dot(direction, origin)[:, None]  # [R,1]
    a = vec.norm2(direction)[:, None]  # [R,1]
    o2 = vec.norm2(origin)[:, None]  # [R,1]

    d_dot_c = _matmul(direction, c0)  # [R,N]
    o_dot_c = _matmul(origin, c0)  # [R,N]
    c0_sq = vec.norm2(c0)[None, :]  # [1,N]
    if scene.has_motion:
        tau = time[:, None]  # [R,1]
        d_dot_c = d_dot_c + tau * _matmul(direction, vel)
        o_dot_c = o_dot_c + tau * _matmul(origin, vel)
        c0_sq = c0_sq + 2.0 * tau * vec.dot(c0, vel)[None, :] + (tau * tau) * vec.norm2(vel)[None, :]

    half_b = d_dot_c - d_dot_o  # d . (c - o)
    c_term = c0_sq - 2.0 * o_dot_c + o2 - (r * r)[None, :]  # |c-o|^2 - r^2
    disc = half_b * half_b - a * c_term

    hit_disc = disc >= 0.0  # geom.zig:49-50: only disc < 0 misses
    # NaN-safe sqrt for reverse-mode AD: sqrt'(0+) is inf, so route the
    # non-hit lanes through a dummy positive value.
    rt = jnp.sqrt(jnp.where(disc > 0.0, disc, 1.0))
    rt = jnp.where(disc > 0.0, rt, 0.0)
    inv_a = 1.0 / a
    t1 = (half_b - rt) * inv_a
    t2 = (half_b + rt) * inv_a
    t1_ok = (t1 >= t_min) & (t1 <= t_max)
    t2_ok = (t2 >= t_min) & (t2 <= t_max)
    t = jnp.where(t1_ok, t1, jnp.where(t2_ok, t2, inf))
    t = jnp.where(hit_disc & scene.sphere_valid[None, :], t, inf)

    idx = jnp.argmin(t, axis=1).astype(jnp.int32)  # [R]
    t_best = jnp.take_along_axis(t, idx[:, None].astype(jnp.int32), axis=1)[:, 0]
    return t_best, idx


def _triangle_frame(scene: Scene):
    """Per-triangle plane + dual-basis precompute for the matmul-form
    Moller-Trumbore equivalent. All [M]-sized; cheap and kept in-graph so
    gradients flow to the vertices."""
    e1 = scene.tri_v1 - scene.tri_v0  # [M,3]
    e2 = scene.tri_v2 - scene.tri_v0
    n = vec.cross(e1, e2)  # [M,3] unnormalized plane normal
    d11 = vec.dot(e1, e1)
    d12 = vec.dot(e1, e2)
    d22 = vec.dot(e2, e2)
    den = d11 * d22 - d12 * d12
    inv_den = jnp.where(den != 0.0, 1.0 / jnp.where(den != 0.0, den, 1.0), 0.0)
    g1 = (e1 * d22[:, None] - e2 * d12[:, None]) * inv_den[:, None]  # [M,3]
    g2 = (e2 * d11[:, None] - e1 * d12[:, None]) * inv_den[:, None]
    return n, g1, g2


def intersect_triangles(scene: Scene, origin, direction, time, t_min, t_max):
    """Nearest (double-sided) triangle hit per ray.

    Plane-then-barycentric formulation: t from the plane equation, then
    barycentric (u, v) as affine functions of the hit point so that the whole
    [R, M] computation is six ``[R,3] @ [3,M]`` matmuls plus elementwise work —
    no [R, M, 3] intermediates. Equivalent to Moller-Trumbore for non-degenerate
    triangles. Capability beyond the spheres-only reference (BASELINE config 4).

    Returns (t [R], idx [R] int32) with t = +inf on miss.
    """
    del time  # triangles are static
    dt = origin.dtype
    inf = jnp.asarray(jnp.inf, dt)
    n, g1, g2 = _triangle_frame(scene)

    n_dot_v0 = vec.dot(n, scene.tri_v0)[None, :]  # [1,M]
    n_dot_o = _matmul(origin, n)  # [R,M]
    n_dot_d = _matmul(direction, n)  # [R,M]
    parallel = n_dot_d == 0.0
    t = (n_dot_v0 - n_dot_o) / jnp.where(parallel, 1.0, n_dot_d)

    # barycentrics: u = g1 . (p - v0), v = g2 . (p - v0), p = o + t d
    g1_o = _matmul(origin, g1) - vec.dot(g1, scene.tri_v0)[None, :]
    g1_d = _matmul(direction, g1)
    g2_o = _matmul(origin, g2) - vec.dot(g2, scene.tri_v0)[None, :]
    g2_d = _matmul(direction, g2)
    u = g1_o + t * g1_d
    v = g2_o + t * g2_d

    ok = (
        (~parallel)
        & (t >= t_min)
        & (t <= t_max)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & scene.tri_valid[None, :]
    )
    t = jnp.where(ok, t, inf)
    idx = jnp.argmin(t, axis=1).astype(jnp.int32)
    t_best = jnp.take_along_axis(t, idx[:, None].astype(jnp.int32), axis=1)[:, 0]
    return t_best, idx


def intersect(scene: Scene, origin, direction, time, t_min, t_max=jnp.inf) -> HitRecord:
    """Nearest hit over all primitives; batched bvh.findHit + Hit.init
    (renderer.zig:107, hit.zig:16-42)."""
    dt = origin.dtype
    t_s, i_s = intersect_spheres(scene, origin, direction, time, t_min, t_max)
    if scene.n_triangles > 0:
        t_t, i_t = intersect_triangles(scene, origin, direction, time, t_min, t_max)
        sphere_wins = t_s <= t_t
        t = jnp.where(sphere_wins, t_s, t_t)
    else:
        sphere_wins = jnp.ones(t_s.shape, dtype=bool)
        t = t_s

    hit = jnp.isfinite(t)
    t_safe = jnp.where(hit, t, 0.0)
    point = vec.ray_at(origin, direction, t_safe)

    # Sphere outward normal: unit(point - center(time)) (geom.zig:64 — unit of
    # the offset, not offset/radius, so inverted "bubble" spheres with negative
    # radius still get outward normals).
    cen = scene.sphere_center[i_s] + (
        time[:, None] * scene.sphere_velocity[i_s] if scene.has_motion else 0.0
    )
    n_sphere = vec.normalize(point - cen, eps=1e-20)
    mat_sphere = scene.sphere_material[i_s]

    if scene.n_triangles > 0:
        n_raw, _, _ = _triangle_frame(scene)
        n_tri = vec.normalize(n_raw[i_t], eps=1e-20)
        mat_tri = scene.tri_material[i_t]
        normal = jnp.where(sphere_wins[:, None], n_sphere, n_tri)
        material = jnp.where(sphere_wins, mat_sphere, mat_tri)
    else:
        normal = n_sphere
        material = mat_sphere

    # Front-face flip (Hit.init, hit.zig:31-34): normal opposes the ray.
    front_face = vec.dot(normal, direction) < 0.0
    normal = jnp.where(front_face[:, None], normal, -normal)

    return HitRecord(
        t=t,
        point=point,
        normal=normal,
        front_face=front_face,
        material=material.astype(jnp.int32),
        hit=hit,
    )


def aabb_hit(low, high, origin, direction, t_min, t_max):
    """Batched slab test, matching AABB.hit (hit.zig:70-98): per-axis interval
    intersection seeded with [t_min, t_max]; hit iff t1 > t0 (strict). Division
    by zero direction components follows IEEE (vdiv semantics, vec.zig:126-132).

    Shapes broadcast: low/high [..., 3] against origin/direction [..., 3].
    Kept for parity tests and for future tile-level culling.
    """
    t0s = (low - origin) / direction
    t1s = (high - origin) / direction
    lo = jnp.minimum(t0s, t1s)
    hi = jnp.maximum(t0s, t1s)
    t0 = jnp.maximum(jnp.max(lo, axis=-1), t_min)
    t1 = jnp.minimum(jnp.min(hi, axis=-1), t_max)
    return t1 > t0


def aabb_enclose(low_a, high_a, low_b, high_b):
    """Union of two AABBs — AABB.enclose (hit.zig:55-60) in batched array
    form; the megakernel's culling blocks use the same min/max reduction over
    whole Morton groups (megakernel._block_rows)."""
    return jnp.minimum(low_a, low_b), jnp.maximum(high_a, high_b)


def aabb_longest_axis(low, high):
    """Index of the widest axis — AABB.longestAxis via V3.amax
    (hit.zig:62-64, vec.zig:150-157). The reference BVH median-splits on it;
    the TPU-native analogue orders primitives by 3-D Morton code instead
    (megakernel._morton_perm), which needs no per-node axis choice."""
    return jnp.argmax(high - low, axis=-1).astype(jnp.int32)


def sphere_aabb(center0, velocity, radius):
    """AABB of a (possibly moving) sphere over t in [0, 1] — the box of the
    t=0 and t=1 boxes, Sphere.boundingBox (geom.zig:24-31)."""
    r = radius[..., None]
    lo0, hi0 = center0 - r, center0 + r
    c1 = center0 + velocity
    return aabb_enclose(lo0, hi0, c1 - r, c1 + r)
