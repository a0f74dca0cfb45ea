"""Camera tests: deterministic ray generation vs an independent float64 NumPy
mirror of Camera.init/getRay (/root/reference/src/camera.zig:18-77). The
reference's own inline camera test (renderer.zig:129-149) is stale (written
against a removed 6-arg API), so goldens are recomputed here per SURVEY.md §7
stage 1."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from rayz_tpu import make_camera, generate_rays


def numpy_camera_ray(vfov, focus_dist, defocus_angle, look_from, look_at, vup,
                     height, width, px, py):
    """Scalar float64 mirror of camera.zig:18-77 (deterministic path)."""
    look_from = np.asarray(look_from, dtype=np.float64)
    look_at = np.asarray(look_at, dtype=np.float64)
    vup = np.asarray(vup, dtype=np.float64)
    deg = math.pi / 180.0
    vp_h = 2.0 * math.tan(vfov * deg / 2.0) * focus_dist
    vp_w = vp_h * width / height
    w = look_from - look_at
    w /= np.linalg.norm(w)
    u = np.cross(vup, w)
    u /= np.linalg.norm(u)
    v = np.cross(w, u)
    vp_u = u * vp_w
    vp_v = v * -vp_h
    px_du = vp_u / width
    px_dv = vp_v / height
    px_origin = look_from - w * focus_dist - vp_u / 2 - vp_v / 2 + 0.5 * (px_du + px_dv)
    direction = px_du * px + px_dv * py + px_origin - look_from
    return look_from, direction


def test_deterministic_rays_match_numpy_mirror():
    cam = make_camera(
        width=400, height=225, vfov=90.0, focus_dist=1.0, defocus_angle=0.0,
        look_from=(-2, 2, 1), look_at=(0, 0, -1), vup=(0, 1, 0),
        dtype=jnp.float64,
    )
    for (px, py) in [(0, 0), (112, 199), (399, 224)]:
        o, d, t = generate_rays(cam, jnp.asarray(px), jnp.asarray(py), key=None)
        eo, ed = numpy_camera_ray(
            90.0, 1.0, 0.0, (-2, 2, 1), (0, 0, -1), (0, 1, 0), 225, 400, px, py
        )
        np.testing.assert_allclose(np.asarray(o), eo, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(d), ed, rtol=1e-12)
        assert float(t) == 0.0


def test_aspect_ratio_default_height():
    # renderer.zig:16,39-40: height = floor(width / (16/9))
    cam = make_camera(width=400)
    assert cam.height == 225
    cam = make_camera(width=512)
    assert cam.height == 288


def test_jittered_rays_statistics():
    """Jitter is +-0.5 px uniform; defocus origin lies in the defocus disk;
    time in [0,1) (camera.zig:59-77)."""
    cam = make_camera(
        width=64, height=36, vfov=20.0, focus_dist=10.0, defocus_angle=0.6,
        look_from=(13, 2, 3), look_at=(0, 0, 0), dtype=jnp.float64,
    )
    key = jax.random.PRNGKey(0)
    n = 20000
    px = jnp.full((n,), 10)
    py = jnp.full((n,), 20)
    o, d, t = generate_rays(cam, px, py, key=key)
    assert float(t.min()) >= 0.0 and float(t.max()) < 1.0
    assert abs(float(t.mean()) - 0.5) < 0.01
    # origins lie within the defocus disk radius of look_from
    r = np.linalg.norm(np.asarray(o) - np.asarray(cam.look_from), axis=-1)
    radius = math.tan(0.6 * math.pi / 180.0 / 2.0) * 10.0
    assert r.max() <= radius + 1e-9
    # disk should be (nearly) fully explored
    assert r.max() > 0.95 * radius
    # jittered directions straddle the deterministic direction
    od, dd, _ = generate_rays(cam, px[:1], py[:1], key=None)
    spread = np.asarray(d) - np.asarray(dd)
    assert np.abs(spread).max() > 0


def test_defocus_disabled_when_angle_zero():
    cam = make_camera(width=64, height=36, defocus_angle=0.0, dtype=jnp.float64)
    key = jax.random.PRNGKey(1)
    o, _, _ = generate_rays(cam, jnp.zeros(100), jnp.zeros(100), key=key)
    np.testing.assert_allclose(
        np.asarray(o), np.broadcast_to(np.asarray(cam.look_from), (100, 3))
    )
