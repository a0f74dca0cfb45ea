"""Thin-lens camera with batched ray generation.

TPU-native replacement for the reference camera
(/root/reference/src/camera.zig:9-91). The basis/viewport precompute follows
camera.zig:18-57 term for term (computed in float64 on host, cast to the scene
dtype); ``generate_rays`` is the batched ``getRay`` (camera.zig:59-77):
per-pixel +-0.5 jitter, defocus-disk origin perturbation, and a per-ray time in
[0,1) for motion blur. Rejection sampling of the defocus disk
(camera.zig:79-90) is replaced by a closed-form polar sample.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import sampling

__all__ = ["Camera", "make_camera", "generate_rays"]

_DEG_TO_RAD = math.pi / 180.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """Precomputed camera frame (camera.zig:10-16). All leaves are [3] arrays
    of the render dtype, so the camera itself is differentiable."""

    look_from: jnp.ndarray
    px_du: jnp.ndarray
    px_dv: jnp.ndarray
    px_origin: jnp.ndarray
    defocus_u: jnp.ndarray
    defocus_v: jnp.ndarray
    # Static image geometry rides along so render() needs no extra args.
    height: int = dataclasses.field(metadata=dict(static=True), default=0)
    width: int = dataclasses.field(metadata=dict(static=True), default=0)

    @property
    def dtype(self):
        return self.look_from.dtype


def make_camera(
    *,
    width: int,
    height: int | None = None,
    vfov: float = 20.0,
    focus_dist: float = 10.0,
    defocus_angle: float = 0.0,
    look_from=(13.0, 2.0, 3.0),
    look_at=(0.0, 0.0, 0.0),
    vup=(0.0, 1.0, 0.0),
    dtype=jnp.float32,
) -> Camera:
    """Build the camera frame; mirrors Camera.init (camera.zig:18-57).

    ``height=None`` derives height from the reference's fixed 16:9 aspect
    (renderer.zig:16,39-40: height = floor(width / (16/9))).
    """
    if height is None:
        height = int(width / (16.0 / 9.0))

    look_from = np.asarray(look_from, dtype=np.float64)
    look_at = np.asarray(look_at, dtype=np.float64)
    vup = np.asarray(vup, dtype=np.float64)

    vp_height = 2.0 * math.tan(vfov * _DEG_TO_RAD / 2.0) * focus_dist
    vp_width = vp_height * float(width) / float(height)

    w = look_from - look_at
    w = w / np.linalg.norm(w)
    u = np.cross(vup, w)
    u = u / np.linalg.norm(u)
    v = np.cross(w, u)

    vp_u = u * vp_width
    vp_v = v * (-vp_height)
    px_du = vp_u / float(width)
    px_dv = vp_v / float(height)
    # defocus radius: tan(angle/2) * focus_dist (camera.zig:41); angle <= 0
    # disables defocus (camera.zig:55, 80-82) — we encode that as zero vectors.
    defocus_radius = math.tan(defocus_angle * _DEG_TO_RAD / 2.0) * focus_dist
    if defocus_angle <= 0.0:
        defocus_radius = 0.0

    px_origin = (
        look_from - w * focus_dist - vp_u / 2.0 - vp_v / 2.0
        + (px_du + px_dv) * 0.5
    )

    as_dt = lambda a: jnp.asarray(a, dtype=dtype)
    return Camera(
        look_from=as_dt(look_from),
        px_du=as_dt(px_du),
        px_dv=as_dt(px_dv),
        px_origin=as_dt(px_origin),
        defocus_u=as_dt(u * defocus_radius),
        defocus_v=as_dt(v * defocus_radius),
        height=int(height),
        width=int(width),
    )


def generate_rays(camera: Camera, px_x: jnp.ndarray, px_y: jnp.ndarray, key=None):
    """Batched Camera.getRay (camera.zig:59-77).

    ``px_x``/``px_y`` are integer (or float) pixel coordinates of any shape
    [...]; returns (origins [...,3], dirs [...,3], times [...]).

    With ``key=None`` this is the deterministic path of the reference (no
    jitter, origin at look_from, time 0 — camera.zig:60-67,75).
    """
    dtype = camera.dtype
    x = jnp.asarray(px_x, dtype=dtype)
    y = jnp.asarray(px_y, dtype=dtype)
    shape = x.shape

    if key is None:
        origin = jnp.broadcast_to(camera.look_from, (*shape, 3))
        time = jnp.zeros(shape, dtype=dtype)
    else:
        kx, ky, kd, kt = jax.random.split(key, 4)
        x = x + sampling.uniform(kx, shape, dtype) - 0.5
        y = y + sampling.uniform(ky, shape, dtype) - 0.5
        disk = sampling.random_in_unit_disk(kd, shape, dtype)
        origin = (
            camera.look_from
            + disk[..., 0:1] * camera.defocus_u
            + disk[..., 1:2] * camera.defocus_v
        )
        time = sampling.uniform(kt, shape, dtype)

    direction = (
        x[..., None] * camera.px_du
        + y[..., None] * camera.px_dv
        + camera.px_origin
        - origin
    )
    return origin, direction, time
