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
    assert supports_diff(tri)  # triangles record/replay too (round 2)
    assert not supports_diff(rt.SceneBuilder().build())  # empty scene


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


def test_render_diff_rejects_empty_scene():
    scene = rt.SceneBuilder().build()
    cam = rt.make_camera(width=8, height=8, vfov=55.0, focus_dist=1.0,
                         look_from=(0, 0, 0), look_at=(0, 0, -1))
    try:
        render_diff(scene, cam, 0, rt.RenderConfig(spp=1, max_depth=2))
    except ValueError:
        return
    raise AssertionError("expected ValueError for empty scene")


def _mixed_scene(dtype=jnp.float32, metal_tri: bool = False):
    """Ground sphere + two triangles in front of it + a hero sphere: exercises
    the mixed winner-index space (spheres [0, N_pad), triangles N_pad + j).
    Diffuse surfaces use UNIT_SPHERE scatter (n + s) so GEOMETRY carries
    gradient — the reference-default HEMISPHERE's direction is piecewise
    constant in the normal (see test_grad.py)."""
    from rayz_tpu.models.scene import DIFFUSE_UNIT_SPHERE

    b = rt.SceneBuilder()
    ground = b.add_diffuse(color=(0.5, 0.5, 0.5),
                           method=DIFFUSE_UNIT_SPHERE)
    tm = (b.add_metallic(color=(0.85, 0.8, 0.75), fuzz=0.0) if metal_tri
          else b.add_diffuse(color=(0.6, 0.4, 0.3),
                             method=DIFFUSE_UNIT_SPHERE))
    b.add_sphere((0, -100.5, -2), 100.0, ground)
    b.add_sphere((0.9, 0.0, -2.2), 0.4, b.add_metallic(color=(0.8, 0.8, 0.9),
                                                       fuzz=0.0))
    b.add_triangle((-1.4, -0.5, -2.0), (0.2, -0.5, -2.0), (-0.6, 0.9, -2.0), tm)
    b.add_triangle((-1.4, -0.5, -2.4), (-0.6, 0.9, -2.4), (0.2, -0.5, -2.4), tm)
    scene = b.build(dtype=dtype)
    cam = rt.make_camera(width=16, height=16, vfov=55.0, focus_dist=1.0,
                         look_from=(0, 0, 0), look_at=(0, 0, -1), dtype=dtype)
    return scene, cam


def test_forward_matches_dense_deterministic_triangles():
    """Zero-randomness (fuzz-0 metal everywhere, jitter off) mixed
    sphere+triangle scene: record/replay must agree with the dense integrator
    ray for ray — pins the triangle winner-index offset encoding."""
    b = rt.SceneBuilder()
    m = b.add_metallic(color=(0.8, 0.7, 0.6), fuzz=0.0)
    b.add_sphere((0, -100.5, -2), 100.0, m)
    b.add_triangle((-1.2, -0.4, -2.0), (0.4, -0.4, -2.0), (-0.4, 1.0, -2.1), m)
    scene = b.build()
    cam = rt.make_camera(width=16, height=16, vfov=55.0, focus_dist=1.0,
                         look_from=(0, 0, 0), look_at=(0, 0, -1))
    cfg = rt.RenderConfig(spp=1, max_depth=6, jitter=False)
    img_d = np.asarray(render_diff(scene, cam, 0, cfg, interpret=True))
    img_x = np.asarray(rt.render(scene, cam, jax.random.PRNGKey(0), cfg))
    np.testing.assert_allclose(img_d, img_x, atol=1e-4)


def test_forward_statistical_parity_mixed():
    scene, cam = _mixed_scene()
    cfg = rt.RenderConfig(spp=48, max_depth=5)
    img_d = np.asarray(render_diff(scene, cam, 11, cfg, interpret=True))
    img_x = np.asarray(rt.render(scene, cam, jax.random.PRNGKey(11), cfg))
    assert np.mean(np.abs(img_d - img_x)) < 0.02
    np.testing.assert_allclose(img_d, img_x, atol=0.25)


def test_forward_statistical_parity_checker_two_iors():
    """Checker texture + TWO distinct dielectric IORs in one scene: the
    record kernel's shared ior-or-scale row and the replay's material columns
    must decode per winner (the gm fast path cannot hide it here — the scene
    is not gm-eligible). Randomness is host-supplied, so the true Schlick
    refract/reflect mix runs on CPU; parity vs the dense integrator is
    statistical (independent streams)."""
    b = rt.SceneBuilder()
    even = b.add_solid_texture((0.2, 0.3, 0.1))
    odd = b.add_solid_texture((0.9, 0.9, 0.9))
    checker = b.add_checker_texture(0.45, even, odd)
    b.add_sphere((0, -100.5, -2), 100.0, b.add_diffuse(texture=checker))
    b.add_sphere((-0.55, 0, -2), 0.5, b.add_dielectric(1.5))
    b.add_sphere((0.55, 0, -2), 0.5, b.add_dielectric(1.0 / 1.5))
    scene = b.build()
    from rayz_tpu.ops.megakernel import use_global_materials
    assert not use_global_materials(scene)
    cam = rt.make_camera(width=16, height=16, vfov=55.0, focus_dist=1.0,
                         look_from=(0, 0, 0), look_at=(0, 0, -1))
    cfg = rt.RenderConfig(spp=48, max_depth=6)
    img_d = np.asarray(render_diff(scene, cam, 13, cfg, interpret=True))
    img_x = np.asarray(rt.render(scene, cam, jax.random.PRNGKey(13), cfg))
    assert np.mean(np.abs(img_d - img_x)) < 0.025
    np.testing.assert_allclose(img_d, img_x, atol=0.3)


def test_grad_matches_fd_triangle_vertices():
    """d(loss)/d(tri vertices) of the REPLAY (frozen recorded paths + frozen
    randoms) vs central finite differences in f64 — the plane-distance/normal
    reparameterization must be smooth in v0/v1/v2."""
    from rayz_tpu.models.camera import generate_rays
    from rayz_tpu.ops.diffkernel import _make_rand, record_paths, replay_paths
    from rayz_tpu.ops.integrator import _pixel_grid

    scene, cam = _mixed_scene(dtype=jnp.float64)
    depth, t_min = 4, 1e-3
    px, py = _pixel_grid(cam)  # 16*16 = 256 = 2 sublane tiles of 128
    o, d, tm = generate_rays(cam, px, py, None)
    rand = _make_rand(jax.random.PRNGKey(5), depth, 256, jnp.float64)
    idx = record_paths(scene, o, d, tm, rand, max_depth=depth, t_min=t_min,
                       tile_sublanes=2, interpret=True)
    n_sph_pad = scene.sphere_radius.shape[0]
    assert (np.asarray(idx) >= n_sph_pad).any(), "no triangle hits recorded"

    def f(v):
        s = scene.replace(tri_v0=v[0], tri_v1=v[1], tri_v2=v[2])
        rad = replay_paths(s, o, d, tm, rand, idx, t_min=t_min)
        return jnp.mean(rad ** 2)

    v = jnp.stack([scene.tri_v0, scene.tri_v1, scene.tri_v2])
    g = np.asarray(jax.grad(f)(v))
    assert np.all(np.isfinite(g))
    # FD-check every coordinate of the two REAL triangles' vertices.
    eps = 1e-6
    checked = 0
    for vi in range(3):
        for ti in range(2):
            for ci in range(3):
                dv = jnp.zeros_like(v).at[vi, ti, ci].set(eps)
                fd = float((f(v + dv) - f(v - dv)) / (2 * eps))
                assert abs(g[vi, ti, ci] - fd) <= 1e-7 + 1e-4 * abs(fd), (
                    vi, ti, ci, g[vi, ti, ci], fd)
                checked += 1
    assert checked == 18
    assert np.abs(g[:, :2]).sum() > 0.0  # real vertices got gradient
    assert np.abs(g[:, 2:]).sum() == 0.0  # padding triangles never win


def test_pixel_loss_recorded_triangle_scene_grads():
    scene, cam = _mixed_scene(dtype=jnp.float64)
    cfg = rt.RenderConfig(spp=2, max_depth=4)
    target = jnp.zeros((16, 16, 3), dtype=jnp.float64)
    params = extract_params(scene, ("tri_v0", "tri_v1", "tri_v2",
                                    "sphere_center", "tex_color"))
    f = lambda p: pixel_loss(p, scene, cam, jax.random.PRNGKey(2), target, cfg,
                             engine="recorded")
    grads = jax.grad(f)(params)
    flat, _ = jax.flatten_util.ravel_pytree(grads)
    assert np.all(np.isfinite(np.asarray(flat)))
    assert float(jnp.sum(jnp.abs(grads["tri_v0"]))) > 0.0
    assert float(jnp.sum(jnp.abs(grads["sphere_center"]))) > 0.0


def test_record_smem_guard_and_dense_fallback():
    """The recorded training engines must never degrade to dense SILENTLY
    (round-4 verdict #3): engine='recorded-pp' on a beyond-SMEM scene
    refuses by default (its persistent recorder cannot stream — PERF.md
    bandwidth wall), allow_dense=True warns and matches engine='dense'
    exactly; engine='recorded' refuses only when the streamed-record
    replay's [R, P] one-hot would blow its budget (big scene AND big
    image) — with a small inverse-rendering target it records via the
    streamed kernel and trains (round 5)."""
    import pytest
    from rayz_tpu.ops.diffkernel import fits_smem_record

    scene, cam = _metal_scene()
    assert fits_smem_record(scene)

    n = 16000  # full-table rows: 17 * 16000 * 4B > 900 KB budget
    f32 = jnp.float32
    big = scene.replace(
        sphere_center=jnp.zeros((n, 3), f32),
        sphere_velocity=jnp.zeros((n, 3), f32),
        sphere_radius=jnp.ones((n,), f32),
        sphere_material=jnp.zeros((n,), jnp.int32),
        sphere_valid=jnp.ones((n,), bool), n_spheres=n)
    assert not fits_smem_record(big)

    cfg = rt.RenderConfig(spp=1, max_depth=2, jitter=False)

    small = rt.make_camera(width=8, height=8, vfov=55.0, focus_dist=1.0,
                           look_from=(0, 0, 0), look_at=(0, 0, -1))
    params = extract_params(big, ("tex_color",))
    key = jax.random.PRNGKey(3)
    target = jnp.zeros((8, 8, 3))

    # engine='recorded' + small target: the streamed record kernel runs and
    # gradients are finite — no raise, no dense fallback
    l_str, g_str = jax.value_and_grad(pixel_loss)(
        params, big, small, key, target, cfg, "recorded")
    assert np.isfinite(float(l_str))
    assert np.isfinite(np.asarray(g_str["tex_color"])).all()

    # recorded-pp: refuse by default, naming the opt-out
    with pytest.raises(ValueError, match="allow_dense"):
        pixel_loss(params, big, small, key, target, cfg, "recorded-pp")
    with pytest.raises(ValueError, match="13k primitives"):
        jax.value_and_grad(pixel_loss)(
            params, big, small, key, target, cfg, "recorded-pp")
    # recorded with an image too big for the one-hot budget: also refuses
    from rayz_tpu.diff.inverse import _check_recordable
    with pytest.raises(ValueError, match="one-hot"):
        _check_recordable(big, "recorded", False, n_px=512 * 512)

    # allow_dense=True: warn loudly, then value and gradient must match
    # engine='dense' EXACTLY (same key, same graph).
    with pytest.warns(RuntimeWarning, match="dense"):
        l_rec, g_rec = jax.value_and_grad(pixel_loss)(
            params, big, small, key, target, cfg, "recorded-pp",
            None, False, True)
    l_den, g_den = jax.value_and_grad(pixel_loss)(
        params, big, small, key, target, cfg, "dense")
    assert float(l_rec) == float(l_den)
    np.testing.assert_array_equal(np.asarray(g_rec["tex_color"]),
                                  np.asarray(g_den["tex_color"]))

    # the mesh train-step path applies the same gate at trace time
    import optax

    from rayz_tpu.diff import make_train_step
    from rayz_tpu.parallel import make_mesh

    step = make_train_step(optax.adam(1e-2), cfg, make_mesh(),
                           engine="recorded-pp")
    opt_state = optax.adam(1e-2).init(params)
    with pytest.raises(ValueError, match="allow_dense"):
        step(params, opt_state, big, small, key, target)


def test_streamed_record_beyond_smem():
    """Round-5 prototype: the bounce-indexed record kernel STREAMS its
    tables from HBM for scenes beyond the SMEM budget (chunked, original
    order, prune-before-DMA) — the beyond-13k differentiable path. The
    recorded indices and the gradients through the replay must be
    bit-identical to the in-SMEM recording (which the CPU interpreter can
    still run at any size), on a mixed sphere+triangle scene, both at a
    forced small chunk and at the auto chunk on a 14k-sphere scene."""
    from rayz_tpu.diff import extract_params, inject_params
    from rayz_tpu.models.camera import generate_rays
    from rayz_tpu.ops.diffkernel import (_make_rand, fits_smem_record,
                                         record_paths, replay_paths)
    from rayz_tpu.ops.integrator import _pixel_grid

    b = rt.SceneBuilder()
    m = b.add_metallic(color=(0.8, 0.7, 0.6), fuzz=0.0)
    b.add_sphere((0, -100.5, -2), 100.0, m)
    b.add_sphere((0, 0, -2), 0.5, b.add_dielectric(1.5))
    b.add_triangle((-1.4, 0.0, -2.5), (-0.6, 0.0, -2.5), (-1.0, 0.9, -2.5),
                   b.add_diffuse(color=(0.7, 0.2, 0.2)))
    scene = b.build(dtype=jnp.float32)
    cam = rt.make_camera(width=16, height=16, vfov=55.0, focus_dist=1.0,
                         look_from=(0, 0, 0), look_at=(0, 0, -1),
                         dtype=jnp.float32)
    px, py = _pixel_grid(cam)
    pad = 2048 - px.shape[0]
    px = jnp.concatenate([px, jnp.zeros((pad,), px.dtype)])
    py = jnp.concatenate([py, jnp.zeros((pad,), py.dtype)])
    o, d, tm = generate_rays(cam, px, py, jax.random.PRNGKey(0))
    rand = _make_rand(jax.random.PRNGKey(1), 3, 2048, jnp.float32)

    kw = dict(max_depth=3, t_min=1e-3, interpret=True)
    idx0 = np.asarray(record_paths(scene, o, d, tm, rand, stream=0, **kw))
    idx1 = np.asarray(record_paths(scene, o, d, tm, rand, stream=128, **kw))
    np.testing.assert_array_equal(idx1, idx0)
    n_sph = scene.sphere_radius.shape[0]
    assert (idx0 >= n_sph).any(), "no triangle winner recorded"

    # beyond the budget: 14k spheres, auto chunk
    n = 14000
    f32 = jnp.float32
    rng = np.random.default_rng(0)
    big = scene.replace(
        sphere_center=jnp.asarray(rng.uniform(-8, 8, (n, 3)), f32),
        sphere_velocity=jnp.zeros((n, 3), f32),
        sphere_radius=jnp.full((n,), 0.15, f32),
        sphere_material=jnp.zeros((n,), jnp.int32),
        sphere_valid=jnp.ones((n,), bool), n_spheres=n)
    assert not fits_smem_record(big)
    idx_s = record_paths(big, o, d, tm, rand, stream=None, **kw)  # auto
    idx_r = record_paths(big, o, d, tm, rand, stream=0, **kw)
    np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_r))
    assert (np.asarray(idx_s) >= 0).any()

    def loss_with(idx, p):
        rad = replay_paths(inject_params(big, p), o, d, tm, rand, idx,
                           t_min=1e-3)
        return jnp.mean((rad - 0.25) ** 2)

    params = extract_params(big, ("tex_color", "sphere_center"))
    g_s = jax.grad(lambda p: loss_with(idx_s, p))(params)
    g_r = jax.grad(lambda p: loss_with(idx_r, p))(params)
    for k in params:
        np.testing.assert_array_equal(np.asarray(g_s[k]), np.asarray(g_r[k]))
    assert float(jnp.abs(g_s["tex_color"]).sum()) > 0
