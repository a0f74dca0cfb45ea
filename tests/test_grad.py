"""Differentiability tests: reverse-mode gradients of the pixel loss vs
central finite differences (BASELINE north star: "grad-checked backward").

Common-random-numbers: with a fixed PRNG key the rendered image is a
deterministic function of scene parameters, so finite differences are
well-defined. Albedo gradients are exactly smooth (attenuation products);
geometry gradients (center/radius) are smooth a.e. — FD probes avoid
silhouette crossings by using small steps in float64."""

import jax
import jax.numpy as jnp
import numpy as np

import rayz_tpu as rt
from rayz_tpu.diff import extract_params, fit, inject_params, pixel_loss


def _setup(dtype=jnp.float64, method=None):
    """``method=None`` uses the reference-default HEMISPHERE diffuse. NOTE:
    hemisphere scatter is ``s * sign(s . n)`` — piecewise constant in the
    normal — so under sky-only lighting GEOMETRY gradients are zero a.e.;
    geometry grad tests pass ``method=DIFFUSE_UNIT_SPHERE`` (``n + s``,
    smooth in the normal) to have a nonzero gradient to check."""
    from rayz_tpu.models.scene import DIFFUSE_HEMISPHERE

    if method is None:
        method = DIFFUSE_HEMISPHERE
    b = rt.SceneBuilder()
    ground = b.add_diffuse(color=(0.5, 0.5, 0.5), method=method)
    ball = b.add_diffuse(color=(0.7, 0.3, 0.2), method=method)
    b.add_sphere((0, -100.5, -1), 100.0, ground)
    b.add_sphere((0, 0, -1.2), 0.5, ball)
    scene = b.build(dtype=dtype)
    cam = rt.make_camera(width=24, height=24, vfov=60.0, focus_dist=1.0,
                         look_from=(0, 0, 0), look_at=(0, 0, -1), dtype=dtype)
    cfg = rt.RenderConfig(spp=2, max_depth=4)
    key = jax.random.PRNGKey(5)
    target = rt.render(scene, cam, jax.random.PRNGKey(99), cfg)
    return scene, cam, cfg, key, target


def _fd_grad(f, params, field, index, eps):
    p_plus = dict(params)
    p_minus = dict(params)
    flat = params[field].reshape(-1)
    delta = jnp.zeros_like(flat).at[index].set(eps).reshape(params[field].shape)
    p_plus[field] = params[field] + delta
    p_minus[field] = params[field] - delta
    return (f(p_plus) - f(p_minus)) / (2 * eps)


def test_albedo_grad_matches_fd():
    scene, cam, cfg, key, target = _setup()
    params = extract_params(scene, ("tex_color",))
    f = lambda p: pixel_loss(p, scene, cam, key, target, cfg)
    g = jax.grad(f)(params)["tex_color"].reshape(-1)
    for idx in [0, 1, 2, 3, 4, 5]:  # both textures, all channels
        fd = float(_fd_grad(f, params, "tex_color", idx, 1e-5))
        ad = float(g[idx])
        assert abs(ad - fd) <= 1e-6 + 1e-4 * abs(fd), (idx, ad, fd)


def test_center_and_radius_grad_match_fd():
    from rayz_tpu.models.scene import DIFFUSE_UNIT_SPHERE

    scene, cam, cfg, key, target = _setup(method=DIFFUSE_UNIT_SPHERE)
    params = extract_params(scene, ("sphere_center", "sphere_radius"))
    f = lambda p: pixel_loss(p, scene, cam, key, target, cfg)
    grads = jax.grad(f)(params)
    # geometry gradients must be NONZERO (with UNIT_SPHERE scatter the
    # estimator depends smoothly on the normal; a zero here would make the
    # FD comparison vacuous)
    assert float(jnp.abs(grads["sphere_center"]).sum()) > 0
    assert float(jnp.abs(grads["sphere_radius"]).sum()) > 0
    # ball center z component (index: sphere 1, axis 2 -> flat 5)
    fd = float(_fd_grad(f, params, "sphere_center", 5, 1e-6))
    ad = float(grads["sphere_center"].reshape(-1)[5])
    assert abs(ad - fd) <= 1e-5 + 5e-3 * abs(fd), (ad, fd)
    # ball radius (index 1)
    fd = float(_fd_grad(f, params, "sphere_radius", 1, 1e-6))
    ad = float(grads["sphere_radius"].reshape(-1)[1])
    assert abs(ad - fd) <= 1e-5 + 5e-3 * abs(fd), (ad, fd)


def test_hemisphere_diffuse_geometry_grad_is_zero_ae():
    """Documents an estimator property: with the reference-default HEMISPHERE
    scatter (direction s * sign(s.n), material.zig:81-84) the radiance is
    piecewise constant in sphere geometry under sky-only lighting, so AD
    geometry gradients are exactly zero a.e. (inverse rendering of geometry
    needs UNIT_SPHERE diffuse, metal, or dielectric paths)."""
    scene, cam, cfg, key, target = _setup()
    params = extract_params(scene, ("sphere_center", "sphere_radius"))
    g = jax.grad(pixel_loss)(params, scene, cam, key, target, cfg)
    assert float(jnp.abs(g["sphere_center"]).sum()) == 0.0
    assert float(jnp.abs(g["sphere_radius"]).sum()) == 0.0


def test_gradients_finite_on_full_material_mix():
    """No NaN/Inf gradients through metal/dielectric/checker/motion paths."""
    b = rt.SceneBuilder()
    even = b.add_solid_texture((0.2, 0.3, 0.1))
    odd = b.add_solid_texture((0.9, 0.9, 0.9))
    checker = b.add_checker_texture(0.5, even, odd)
    b.add_sphere((0, -100.5, -1), 100.0, b.add_diffuse(texture=checker))
    b.add_sphere((-1, 0, -1.2), 0.5, b.add_metallic(color=(0.8, 0.8, 0.9), fuzz=0.3))
    b.add_sphere((0, 0, -1.2), 0.5, b.add_dielectric(1.5))
    b.add_sphere((1, 0, -1.2), 0.5, b.add_diffuse(color=(0.7, 0.3, 0.3)),
                 velocity=(0, 0.3, 0))
    scene = b.build(dtype=jnp.float64)
    cam = rt.make_camera(width=16, height=16, vfov=60.0, focus_dist=1.0,
                         look_from=(0, 0.3, 1), look_at=(0, 0, -1.2),
                         dtype=jnp.float64)
    cfg = rt.RenderConfig(spp=2, max_depth=5)
    target = jnp.zeros((16, 16, 3), dtype=jnp.float64)
    params = extract_params(scene)
    g = jax.grad(pixel_loss)(params, scene, cam, jax.random.PRNGKey(0), target, cfg)
    for name, leaf in g.items():
        assert bool(jnp.isfinite(leaf).all()), name
    # attenuation gradients must actually be nonzero
    assert float(jnp.abs(g["tex_color"]).sum()) > 0


def test_fit_recovers_albedo():
    """Adam on pixel L2 recovers a perturbed albedo (config 5 in miniature)."""
    scene, cam, cfg, key, _ = _setup()
    target = rt.render(scene, cam, jax.random.PRNGKey(42), cfg)
    # perturb the ball albedo and fit only tex_color
    wrong = scene.replace(tex_color=scene.tex_color.at[1].set(
        jnp.asarray([0.2, 0.8, 0.9], dtype=jnp.float64)))
    fitted, history = fit(
        wrong, cam, target, config=cfg, steps=60, learning_rate=5e-2,
        fields=("tex_color",), key=jax.random.PRNGKey(1),
    )
    assert history[-1] < history[0] * 0.2
    err = np.abs(np.asarray(fitted.tex_color[1]) - np.array([0.7, 0.3, 0.2]))
    assert err.max() < 0.1, (np.asarray(fitted.tex_color[1]), history[-5:])
