"""Record/replay differentiable renderer tests (CPU, interpret mode).

Unlike the forward megakernel, the record kernel consumes externally supplied
randomness (no pltpu PRNG), so its stochastic paths run everywhere — plain
``interpret=True`` suffices off-TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np

import rayz_tpu as rt
from rayz_tpu.diff import extract_params, pixel_loss
from rayz_tpu.ops.diffkernel import render_diff, supports_diff


def _metal_scene(dtype=jnp.float32):
    """Fuzz-0 metal + sky only: zero-randomness paths, so render_diff and the
    dense integrator agree deterministically (jitter off)."""
    b = rt.SceneBuilder()
    m = b.add_metallic(color=(0.8, 0.7, 0.6), fuzz=0.0)
    b.add_sphere((0, -100.5, -2), 100.0, m)
    b.add_sphere((0, 0, -2), 0.5, m)
    scene = b.build(dtype=dtype)
    cam = rt.make_camera(width=16, height=16, vfov=55.0, focus_dist=1.0,
                         look_from=(0, 0, 0), look_at=(0, 0, -1), dtype=dtype)
    return scene, cam


def test_supports_diff():
    scene, _ = _metal_scene()
    assert supports_diff(scene)
    b = rt.SceneBuilder()
    b.add_triangle((0, 0, -1), (1, 0, -1), (0, 1, -1), b.add_diffuse(color=(1, 0, 0)))
    tri = b.build()
    assert not supports_diff(tri)


def test_forward_matches_dense_deterministic():
    scene, cam = _metal_scene()
    cfg = rt.RenderConfig(spp=1, max_depth=6, jitter=False)
    img_d = np.asarray(render_diff(scene, cam, 0, cfg, interpret=True))
    img_x = np.asarray(rt.render(scene, cam, jax.random.PRNGKey(0), cfg))
    np.testing.assert_allclose(img_d, img_x, atol=1e-4)


def test_forward_statistical_parity_diffuse():
    """Same estimator distribution as the dense integrator: mean image error
    shrinks with spp even though the RNG streams differ."""
    b = rt.SceneBuilder()
    b.add_sphere((0, -100.5, -2), 100.0, b.add_diffuse(color=(0.5, 0.5, 0.5)))
    b.add_sphere((0, 0, -2), 0.5, b.add_diffuse(color=(0.7, 0.3, 0.2)))
    scene = b.build()
    cam = rt.make_camera(width=16, height=16, vfov=55.0, focus_dist=1.0,
                         look_from=(0, 0, 0), look_at=(0, 0, -1))
    cfg = rt.RenderConfig(spp=48, max_depth=6)
    img_d = np.asarray(render_diff(scene, cam, 7, cfg, interpret=True))
    img_x = np.asarray(rt.render(scene, cam, jax.random.PRNGKey(7), cfg))
    assert np.mean(np.abs(img_d - img_x)) < 0.02
    np.testing.assert_allclose(img_d, img_x, atol=0.25)


def test_grad_matches_fd_albedo():
    """d(loss)/d(albedo) through the frozen-path replay vs central finite
    differences (f64; fixed key makes the loss deterministic in params)."""
    b = rt.SceneBuilder()
    b.add_sphere((0, -100.5, -2), 100.0, b.add_diffuse(color=(0.5, 0.5, 0.5)))
    b.add_sphere((0, 0, -2), 0.5, b.add_diffuse(color=(0.7, 0.3, 0.2)))
    scene = b.build(dtype=jnp.float64)
    cam = rt.make_camera(width=12, height=12, vfov=55.0, focus_dist=1.0,
                         look_from=(0, 0, 0), look_at=(0, 0, -1),
                         dtype=jnp.float64)
    cfg = rt.RenderConfig(spp=2, max_depth=4)
    key = jax.random.PRNGKey(3)
    target = rt.render(scene, cam, jax.random.PRNGKey(99), cfg)

    params = extract_params(scene, ("tex_color",))
    f = lambda p: pixel_loss(p, scene, cam, key, target, cfg, engine="recorded")
    g = np.asarray(jax.grad(f)(params)["tex_color"]).reshape(-1)
    for idx in range(6):
        flat = params["tex_color"].reshape(-1)
        eps = 1e-5
        d = jnp.zeros_like(flat).at[idx].set(eps).reshape(params["tex_color"].shape)
        fd = (f({"tex_color": params["tex_color"] + d})
              - f({"tex_color": params["tex_color"] - d})) / (2 * eps)
        fd = float(fd)
        assert abs(g[idx] - fd) <= 1e-6 + 1e-4 * abs(fd), (idx, g[idx], fd)


def test_grad_geometry_finite_and_nonzero():
    b = rt.SceneBuilder()
    b.add_sphere((0, -100.5, -2), 100.0, b.add_diffuse(color=(0.5, 0.5, 0.5)))
    b.add_sphere((0, 0, -2), 0.5, b.add_metallic(color=(0.8, 0.8, 0.9), fuzz=0.2))
    b.add_sphere((1, 0, -2), 0.4, b.add_dielectric(1.5))
    scene = b.build(dtype=jnp.float64)
    cam = rt.make_camera(width=12, height=12, vfov=55.0, focus_dist=1.0,
                         look_from=(0, 0, 0), look_at=(0, 0, -1),
                         dtype=jnp.float64)
    cfg = rt.RenderConfig(spp=2, max_depth=4)
    target = jnp.zeros((12, 12, 3), dtype=jnp.float64)
    params = extract_params(scene, ("sphere_center", "sphere_radius",
                                    "mat_fuzz", "mat_ior"))
    f = lambda p: pixel_loss(p, scene, cam, jax.random.PRNGKey(1), target, cfg,
                             engine="recorded")
    grads = jax.grad(f)(params)
    flat, _ = jax.flatten_util.ravel_pytree(grads)
    assert np.all(np.isfinite(np.asarray(flat)))
    assert float(jnp.sum(jnp.abs(grads["sphere_center"]))) > 0.0


def test_render_diff_rejects_triangles():
    b = rt.SceneBuilder()
    b.add_triangle((0, 0, -1), (1, 0, -1), (0, 1, -1), b.add_diffuse(color=(1, 0, 0)))
    scene = b.build()
    cam = rt.make_camera(width=8, height=8, vfov=55.0, focus_dist=1.0,
                         look_from=(0, 0, 0), look_at=(0, 0, -1))
    try:
        render_diff(scene, cam, 0, rt.RenderConfig(spp=1, max_depth=2))
    except ValueError:
        return
    raise AssertionError("expected ValueError for triangle scene")
