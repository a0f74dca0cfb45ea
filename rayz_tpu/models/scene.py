"""Scene representation: flat SoA arrays + an imperative builder.

TPU-native replacement for the reference's ECS (handle-indexed typed arenas,
/root/reference/src/ecs.zig:6-70) and type-erased ``Hittable`` vtable
(/root/reference/src/hit.zig:8-14). Instead of pointers and dynamic dispatch,
the scene is a pytree of flat jnp arrays (SURVEY.md §7 design delta #1):
vectorized intersection tests every primitive against every ray, and material/
texture "dispatch" is a masked select on integer kind codes. Handles survive as
plain integer indices into the SoA arrays — the builder API mirrors the
reference's ``MemPool.addAndReturnHandle`` (ecs.zig:53-69).

Primitive counts are padded (``valid`` masks) so jit caches are reused across
scenes of similar size and Pallas tiles stay aligned.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "MAT_DIFFUSE",
    "MAT_METALLIC",
    "MAT_DIELECTRIC",
    "TEX_SOLID",
    "TEX_CHECKER",
    "DIFFUSE_UNIT_SPHERE",
    "DIFFUSE_UNIT_SPHERE_SURFACE",
    "DIFFUSE_HEMISPHERE",
    "Scene",
    "SceneBuilder",
]

# Material kinds — the reference's tagged union Material{diffuse, metallic,
# dielectric} (material.zig:162-166) as integer codes.
MAT_DIFFUSE = 0
MAT_METALLIC = 1
MAT_DIELECTRIC = 2

# Texture kinds — Texture{checker, solid} (material.zig:41-44).
TEX_SOLID = 0
TEX_CHECKER = 1

# Diffuse scatter methods (material.zig:67-71). HEMISPHERE is the reference
# default (material.zig:74).
DIFFUSE_UNIT_SPHERE = 0
DIFFUSE_UNIT_SPHERE_SURFACE = 1
DIFFUSE_HEMISPHERE = 2


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m if m > 0 else n


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Scene:
    """Flat SoA scene. All array fields are pytree leaves (differentiable where
    float); ``n_*`` counts and ``has_motion`` are static metadata.

    Sphere centers are stored as start + velocity, the array form of the
    reference storing a sphere's center *as a Ray* for motion blur
    (geom.zig:12, center at time t = center0 + t*velocity, geom.zig:40).
    """

    # Spheres
    sphere_center: jnp.ndarray  # [N, 3] center at t=0
    sphere_velocity: jnp.ndarray  # [N, 3] center motion over t in [0,1]
    sphere_radius: jnp.ndarray  # [N]
    sphere_material: jnp.ndarray  # [N] int32 index into material arrays
    sphere_valid: jnp.ndarray  # [N] bool (False = padding)

    # Triangles (capability beyond the reference; BASELINE.json config 4)
    tri_v0: jnp.ndarray  # [M, 3]
    tri_v1: jnp.ndarray  # [M, 3]
    tri_v2: jnp.ndarray  # [M, 3]
    tri_material: jnp.ndarray  # [M] int32
    tri_valid: jnp.ndarray  # [M] bool

    # Materials (SoA of the Material tagged union, material.zig:55-177)
    mat_kind: jnp.ndarray  # [K] int32: MAT_*
    mat_texture: jnp.ndarray  # [K] int32 texture index (diffuse/metal albedo)
    mat_fuzz: jnp.ndarray  # [K] metallic fuzz (material.zig:105)
    mat_ior: jnp.ndarray  # [K] dielectric refractive index (material.zig:135)
    mat_method: jnp.ndarray  # [K] int32 DIFFUSE_* scatter method

    # Textures (SoA of Texture{solid, checker}, material.zig:12-51)
    tex_kind: jnp.ndarray  # [T] int32: TEX_*
    tex_color: jnp.ndarray  # [T, 3] solid color
    tex_scale: jnp.ndarray  # [T] checker scale
    tex_even: jnp.ndarray  # [T] int32 child handle (checker)
    tex_odd: jnp.ndarray  # [T] int32 child handle (checker)

    # Static metadata
    n_spheres: int = dataclasses.field(metadata=dict(static=True), default=0)
    n_triangles: int = dataclasses.field(metadata=dict(static=True), default=0)
    has_motion: bool = dataclasses.field(metadata=dict(static=True), default=False)
    # True when some checker texture's child is itself a checker. The Pallas
    # engines resolve exactly ONE level of checker nesting (megakernel
    # _material_rows); the XLA integrator chases four (shade.py). Scenes with
    # deeper nests are REJECTED by the Pallas engines (clear error /
    # auto-dispatch to XLA) instead of silently degrading. Set by
    # SceneBuilder; defaults False for directly constructed scenes.
    deep_checker: bool = dataclasses.field(metadata=dict(static=True), default=False)
    # Maximum texture-indirection depth (a solid texture is depth 1; a
    # checker is 1 + the deeper of its children). The XLA integrator unrolls
    # exactly this many chase levels, matching the reference's unbounded
    # recursion (material.zig:37-51) for ANY nest the builder can express
    # (the builder's handle discipline makes texture graphs acyclic). 0 =
    # unknown (directly constructed Scene) -> a 4-level default.
    tex_depth: int = dataclasses.field(metadata=dict(static=True), default=0)
    # Structural uniqueness hints for the megakernel's global-material fast
    # path (values stay traced; only the STRUCTURE is static): the texture
    # index of the scene's sole checker texture, and the material index of its
    # sole dielectric. -1 = none exist, -2 = more than one exists (fast path
    # disabled). Scenes built by SceneBuilder get real values; a Scene
    # constructed directly defaults to the safe "unknown" -2.
    uniq_checker_tex: int = dataclasses.field(metadata=dict(static=True), default=-2)
    uniq_dielectric_mat: int = dataclasses.field(metadata=dict(static=True), default=-2)

    @property
    def dtype(self):
        return self.sphere_center.dtype

    def replace(self, **kw) -> "Scene":
        return dataclasses.replace(self, **kw)


class SceneBuilder:
    """Imperative scene construction mirroring the reference API surface
    (SURVEY.md §3.5): add textures/materials and get integer handles back, then
    add primitives referencing those handles. ``build()`` freezes everything
    into a ``Scene`` of jnp arrays.
    """

    def __init__(self):
        self._sph_center: list = []
        self._sph_vel: list = []
        self._sph_radius: list = []
        self._sph_mat: list = []
        self._tri_v: list = []  # (v0, v1, v2)
        self._tri_mat: list = []
        self._mat: list = []  # (kind, tex, fuzz, ior, method)
        self._tex: list = []  # (kind, color3, scale, even, odd)

    # -- textures (MemPool.addAndReturnHandle(Texture), ecs.zig:57) --

    def add_solid_texture(self, color) -> int:
        """SolidTexture (material.zig:19-25)."""
        self._tex.append((TEX_SOLID, tuple(color), 1.0, 0, 0))
        return len(self._tex) - 1

    def add_checker_texture(self, scale: float, even: int, odd: int) -> int:
        """CheckerTexture: 3-D spatial checker selecting child handles by
        floor-parity (material.zig:27-39)."""
        self._tex.append((TEX_CHECKER, (0.0, 0.0, 0.0), float(scale), even, odd))
        return len(self._tex) - 1

    # -- materials (MemPool.addAndReturnHandle(Material), ecs.zig:57) --

    def _coerce_texture(self, texture, color) -> int:
        if texture is None:
            if color is None:
                raise ValueError("provide texture handle or color")
            return self.add_solid_texture(color)
        return int(texture)

    def add_diffuse(self, texture: Optional[int] = None, color=None,
                    method: int = DIFFUSE_HEMISPHERE) -> int:
        """DiffuseMaterial (material.zig:73-102); default method HEMISPHERE."""
        tex = self._coerce_texture(texture, color)
        self._mat.append((MAT_DIFFUSE, tex, 0.0, 1.0, method))
        return len(self._mat) - 1

    def add_metallic(self, texture: Optional[int] = None, color=None,
                     fuzz: float = 0.0) -> int:
        """MetallicMaterial (material.zig:104-132)."""
        tex = self._coerce_texture(texture, color)
        self._mat.append((MAT_METALLIC, tex, float(fuzz), 1.0, 0))
        return len(self._mat) - 1

    def add_dielectric(self, refractive_index: float = 1.0,
                       share: bool = True) -> int:
        """DielectricMaterial (material.zig:134-160).

        With ``share=True`` (default), dielectrics with equal IOR are
        deduplicated to one shared material (the reference allocates one per
        call, rayz.zig:164, but the material is fully determined by its IOR so
        forward renders are identical; sharing keeps the scene's dielectric
        count structurally small, which enables the megakernel's global-IOR
        fast path). CAVEAT for inverse rendering: shared dielectrics are ONE
        parameter — ``fit(fields=('mat_ior',))`` cannot recover independent
        IORs for them. Pass ``share=False`` to force a fresh material entry
        per call (matching the reference's allocation behavior)."""
        entry = (MAT_DIELECTRIC, 0, 0.0, float(refractive_index), 0)
        if share:
            for i, m in enumerate(self._mat):
                if m == entry:
                    return i
        self._mat.append(entry)
        return len(self._mat) - 1

    # -- primitives --

    def add_sphere(self, center, radius: float, material: int,
                   velocity=None) -> int:
        """Sphere, stationary or moving (geom.zig:11-31)."""
        self._sph_center.append(tuple(center))
        self._sph_vel.append((0.0, 0.0, 0.0) if velocity is None else tuple(velocity))
        self._sph_radius.append(float(radius))
        self._sph_mat.append(int(material))
        return len(self._sph_radius) - 1

    def add_triangle(self, v0, v1, v2, material: int) -> int:
        self._tri_v.append((tuple(v0), tuple(v1), tuple(v2)))
        self._tri_mat.append(int(material))
        return len(self._tri_mat) - 1

    def add_quad(self, corner, edge_u, edge_v, material: int) -> None:
        """Parallelogram as two triangles (corner, corner+u, corner+v,
        corner+u+v)."""
        c = np.asarray(corner, dtype=np.float64)
        u = np.asarray(edge_u, dtype=np.float64)
        v = np.asarray(edge_v, dtype=np.float64)
        self.add_triangle(c, c + u, c + v, material)
        self.add_triangle(c + u, c + u + v, c + v, material)

    def add_mesh(self, vertices, faces, material: int) -> None:
        """Triangle soup from [V,3] vertices and [F,3] integer faces."""
        vertices = np.asarray(vertices, dtype=np.float64)
        for f in np.asarray(faces, dtype=np.int64):
            self.add_triangle(vertices[f[0]], vertices[f[1]], vertices[f[2]], material)

    # -- freeze --

    def build(self, dtype=jnp.float32, pad_multiple: int = 8) -> Scene:
        ns = len(self._sph_radius)
        nt = len(self._tri_mat)
        npad = max(_round_up(max(ns, 1), pad_multiple), pad_multiple)
        mpad = max(_round_up(nt, pad_multiple), pad_multiple) if nt else 0

        def farr(data, shape, fill=0.0):
            a = np.full(shape, fill, dtype=np.float64)
            if len(data):
                a[: len(data)] = np.asarray(data, dtype=np.float64)
            return jnp.asarray(a, dtype=dtype)

        def iarr(data, n, fill=0):
            a = np.full((n,), fill, dtype=np.int32)
            if len(data):
                a[: len(data)] = np.asarray(data, dtype=np.int32)
            return jnp.asarray(a)

        def mask(n_real, n_total):
            m = np.zeros((n_total,), dtype=bool)
            m[:n_real] = True
            return jnp.asarray(m)

        if not self._mat:
            self._mat.append((MAT_DIFFUSE, 0, 0.0, 1.0, DIFFUSE_HEMISPHERE))
        if not self._tex:
            self._tex.append((TEX_SOLID, (0.5, 0.5, 0.5), 1.0, 0, 0))

        mk, mt, mf, mi, mm = zip(*self._mat)
        tk, tc, tsc, te, to = zip(*self._tex)

        vel = np.asarray(self._sph_vel, dtype=np.float64) if ns else np.zeros((0, 3))
        has_motion = bool(ns and np.any(vel != 0.0))

        tri_v = np.asarray(self._tri_v, dtype=np.float64) if nt else np.zeros((0, 3, 3))

        def uniq(indices):
            indices = list(indices)
            if not indices:
                return -1
            return indices[0] if len(indices) == 1 else -2

        uniq_checker = uniq(i for i, t in enumerate(tk) if t == TEX_CHECKER)
        uniq_diel = uniq(i for i, k in enumerate(mk) if k == MAT_DIELECTRIC)
        deep_checker = any(
            t == TEX_CHECKER and (tk[te[i]] == TEX_CHECKER
                                  or tk[to[i]] == TEX_CHECKER)
            for i, t in enumerate(tk))

        depth_memo = {}

        def _tex_depth(i):
            if i not in depth_memo:
                depth_memo[i] = 1 if tk[i] != TEX_CHECKER else 1 + max(
                    _tex_depth(te[i]), _tex_depth(to[i]))
            return depth_memo[i]

        tex_depth = max((_tex_depth(i) for i in range(len(tk))), default=1)

        return Scene(
            sphere_center=farr(self._sph_center, (npad, 3)),
            sphere_velocity=farr(self._sph_vel, (npad, 3)),
            sphere_radius=farr(self._sph_radius, (npad,)),
            sphere_material=iarr(self._sph_mat, npad),
            sphere_valid=mask(ns, npad),
            tri_v0=farr(tri_v[:, 0] if nt else [], (mpad, 3)),
            tri_v1=farr(tri_v[:, 1] if nt else [], (mpad, 3)),
            tri_v2=farr(tri_v[:, 2] if nt else [], (mpad, 3)),
            tri_material=iarr(self._tri_mat, mpad),
            tri_valid=mask(nt, mpad),
            mat_kind=jnp.asarray(np.asarray(mk, dtype=np.int32)),
            mat_texture=jnp.asarray(np.asarray(mt, dtype=np.int32)),
            mat_fuzz=jnp.asarray(np.asarray(mf, dtype=np.float64), dtype=dtype),
            mat_ior=jnp.asarray(np.asarray(mi, dtype=np.float64), dtype=dtype),
            mat_method=jnp.asarray(np.asarray(mm, dtype=np.int32)),
            tex_kind=jnp.asarray(np.asarray(tk, dtype=np.int32)),
            tex_color=jnp.asarray(np.asarray(tc, dtype=np.float64), dtype=dtype),
            tex_scale=jnp.asarray(np.asarray(tsc, dtype=np.float64), dtype=dtype),
            tex_even=jnp.asarray(np.asarray(te, dtype=np.int32)),
            tex_odd=jnp.asarray(np.asarray(to, dtype=np.int32)),
            n_spheres=ns,
            n_triangles=nt,
            has_motion=has_motion,
            uniq_checker_tex=uniq_checker,
            uniq_dielectric_mat=uniq_diel,
            deep_checker=deep_checker,
            tex_depth=tex_depth,
        )
