"""Persistent-path record/replay tests (CPU, TPU-semantics interpret mode).

The record kernel's PRNG is stubbed to zeros off-TPU (like the forward
megakernel), so CPU tests use deterministic configs: jitter off, and —
because zero random bits still produce VALID deterministic scatter samples
(unit vector (0,0,-1), ball radius 1e-8, Schlick uniform 0) — diffuse
materials trace deterministic paths too. Stochastic distribution parity runs
on real TPU in scripts/tpu_check.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rayz_tpu as rt
from rayz_tpu.diff import extract_params, inject_params, pixel_loss
from rayz_tpu.ops.pathrec import (default_iters, default_k1, gather_rows,
                                  record_pp, render_diff_pp,
                                  render_diff_pp_flat, replay_pp, supports_pp)


def _metal_scene(dtype=jnp.float32):
    b = rt.SceneBuilder()
    m = b.add_metallic(color=(0.8, 0.7, 0.6), fuzz=0.0)
    b.add_sphere((0, -100.5, -2), 100.0, m)
    b.add_sphere((0, 0, -2), 0.5, m)
    scene = b.build(dtype=dtype)
    cam = rt.make_camera(width=16, height=16, vfov=55.0, focus_dist=1.0,
                         look_from=(0, 0, 0), look_at=(0, 0, -1), dtype=dtype)
    return scene, cam


def _mixed_scene(dtype=jnp.float32):
    """All three materials + a triangle: exercises every replay branch."""
    b = rt.SceneBuilder()
    b.add_sphere((0, -100.5, -2), 100.0,
                 b.add_diffuse(color=(0.5, 0.5, 0.5),
                               method=rt.models.scene.DIFFUSE_UNIT_SPHERE))
    b.add_sphere((-0.7, 0, -2), 0.45, b.add_metallic(color=(0.9, 0.8, 0.7)))
    b.add_sphere((0.7, 0, -2), 0.45, b.add_dielectric(1.5))
    b.add_triangle((-0.4, 0.8, -2.5), (0.4, 0.8, -2.5), (0, 1.5, -2.5),
                   b.add_diffuse(color=(0.8, 0.2, 0.2)))
    scene = b.build(dtype=dtype)
    cam = rt.make_camera(width=12, height=12, vfov=60.0, focus_dist=1.0,
                         look_from=(0, 0, 0), look_at=(0, 0, -1), dtype=dtype)
    return scene, cam


def test_default_iters_policy():
    assert default_iters(1, 32) == 32  # spp=1 always exact (hard cap)
    assert default_iters(8, 32) == 160  # measured leftover-0 flagship budget
    assert default_iters(64, 8) == 288
    # compaction first-pass budget: ~mean iterations per slot (3.5*spp)
    assert default_k1(1, 32) == 16
    assert default_k1(8, 32) == 28
    assert default_k1(64, 8) == 224
    # schedule budgets sum to the exhaustive bound (per-slot guarantee)
    from rayz_tpu.ops.pathrec import default_schedule
    sch = default_schedule(8, 32, 262144, 2048)
    assert sch == [(28, 262144), (32, 131072), (196, 16384)]
    assert sum(k for k, _ in sch) == 8 * 32
    assert default_schedule(1, 32, 2048, 2048) == [(16, 2048), (16, 2048)]


def test_straggler_compaction_completes_starved_budget():
    """iters=2 truncates (see test_iteration_budget_truncation_reported);
    with compact=True the resumed second pass must finish every sample and
    reproduce the exhaustive single-pass image exactly (the stubbed PRNG is
    deterministic, so resume == continuation bit for bit)."""
    scene, cam = _metal_scene()
    cfg = rt.RenderConfig(spp=4, max_depth=6, jitter=False)
    img_c, left_c = render_diff_pp(scene, cam, 0, cfg, iters=2, compact=True,
                                   return_leftover=True)
    assert int(left_c) == 0
    img_x, left_x = render_diff_pp(scene, cam, 0, cfg, iters=4 * 6,
                                   return_leftover=True)
    assert int(left_x) == 0
    np.testing.assert_allclose(np.asarray(img_c), np.asarray(img_x),
                               atol=1e-6)


def test_compaction_default_on_and_exact():
    """The default budget (iters=None) now records at default_k1 + compacts;
    it must agree with the old exhaustive budget and report leftover 0."""
    scene, cam = _mixed_scene()
    cfg = rt.RenderConfig(spp=3, max_depth=5, jitter=False)
    img_d, left_d = render_diff_pp(scene, cam, 0, cfg, return_leftover=True)
    assert int(left_d) == 0
    img_x = render_diff_pp(scene, cam, 0, cfg, iters=3 * 5)
    np.testing.assert_allclose(np.asarray(img_d), np.asarray(img_x),
                               atol=1e-6)


def test_compaction_grads_match_exhaustive():
    """jax.grad through the two-pass compacted estimator (record + resumed
    record + two replays + scatter-add) must equal the single-pass
    exhaustive gradients — same paths, same recorded controls."""
    from jax.experimental.pallas import tpu as pltpu
    from rayz_tpu.ops.integrator import _pixel_grid

    scene, cam = _metal_scene()
    px, py = _pixel_grid(cam)
    n = px.shape[0]
    params = extract_params(scene, ("tex_color", "sphere_center"))

    def loss(p, iters, compact):
        img = render_diff_pp_flat(
            inject_params(scene, p), cam, 0, px, py, spp=2, max_depth=6,
            t_min=1e-3, jitter=False, iters=iters, compact=compact,
            interpret=pltpu.InterpretParams())
        return jnp.sum(img[:n] ** 2)

    g_c = jax.grad(lambda p: loss(p, 3, True))(params)
    g_x = jax.grad(lambda p: loss(p, 12, False))(params)
    for f in params:
        a, b = np.asarray(g_x[f]), np.asarray(g_c[f])
        assert np.isfinite(b).all(), f
        np.testing.assert_allclose(b, a, atol=1e-5, err_msg=f)


def test_compaction_f64_scan_replay_carry():
    """The f64 path replays with the XLA scan (fused is f32-only): the
    resumed pass's initial carry must flow through replay_pp's
    init_carry/return_final handoff too — starved budget + compaction
    equals the exhaustive single pass."""
    scene, cam = _metal_scene(dtype=jnp.float64)
    cfg = rt.RenderConfig(spp=3, max_depth=5, jitter=False)
    img_c, left_c = render_diff_pp(scene, cam, 0, cfg, iters=2, compact=True,
                                   return_leftover=True)
    assert int(left_c) == 0
    img_x = render_diff_pp(scene, cam, 0, cfg, iters=15)
    np.testing.assert_allclose(np.asarray(img_c), np.asarray(img_x),
                               atol=1e-12)


def test_compaction_capacity_overflow_reports_leftover():
    """When more slots straggle than the compact capacity, the deficit must
    be REPORTED (not silently dropped): tile_sublanes=1 makes the block 128
    slots, so a 256-slot render with capacity 128 and iters=1 (every slot
    truncates) overflows — leftover > 0, and the in-capacity half still
    completes (leftover < the no-compaction deficit)."""
    scene, cam = _metal_scene()
    from jax.experimental.pallas import tpu as pltpu
    from rayz_tpu.ops.integrator import _pixel_grid
    px, py = _pixel_grid(cam)  # 256 pixels
    kw = dict(spp=4, max_depth=6, t_min=1e-3, jitter=False,
              tile_sublanes=1, interpret=pltpu.InterpretParams(),
              return_leftover=True)
    _, left_nc = render_diff_pp_flat(scene, cam, 0, px, py, iters=1,
                                     compact=False, **kw)
    img, left = render_diff_pp_flat(scene, cam, 0, px, py, iters=1,
                                    compact=True, compact_capacity=128, **kw)
    assert int(left_nc) > 0
    assert 0 < int(left) < int(left_nc)
    assert np.isfinite(np.asarray(img)).all()
    # full capacity -> exact
    _, left_full = render_diff_pp_flat(scene, cam, 0, px, py, iters=1,
                                       compact=True, compact_capacity=256,
                                       **kw)
    assert int(left_full) == 0


def test_deterministic_parity_vs_dense():
    """jitter off + fuzz-0 metal: zero-randomness paths, so record/replay and
    the dense integrator agree to float tolerance."""
    scene, cam = _metal_scene()
    cfg = rt.RenderConfig(spp=1, max_depth=6, jitter=False)
    img_pp, left = render_diff_pp(scene, cam, 0, cfg, return_leftover=True)
    img_x = np.asarray(rt.render(scene, cam, jax.random.PRNGKey(0), cfg))
    assert int(left) == 0
    np.testing.assert_allclose(np.asarray(img_pp), img_x, atol=1e-4)


def test_spp_averaging_deterministic():
    """With the stubbed (zero) PRNG every respawned sample traces the same
    path, so the spp-4 average must equal the spp-1 image exactly — the
    respawn/accumulate/normalize plumbing in one invariant."""
    scene, cam = _metal_scene()
    img1 = np.asarray(render_diff_pp(
        scene, cam, 0, rt.RenderConfig(spp=1, max_depth=6, jitter=False)))
    img4 = np.asarray(render_diff_pp(
        scene, cam, 0, rt.RenderConfig(spp=4, max_depth=6, jitter=False)))
    np.testing.assert_allclose(img4, img1, atol=1e-6)


def test_all_material_branches_parity_vs_bounce_recorder():
    """Cross-implementation check covering every material branch: feed the
    BOUNCE-INDEXED recorder (diffkernel) the exact constants the stubbed
    kernel PRNG produces (zero bits -> unit (1e-12, 0, -1), ball radius
    1e-8, Schlick uniform 0) so both estimators trace bit-identical paths,
    then compare radiance. The dense integrator is NOT comparable here: it
    draws real scatter randoms even with jitter off."""
    from rayz_tpu.models.camera import generate_rays
    from rayz_tpu.ops.diffkernel import record_paths, replay_paths
    from rayz_tpu.ops.integrator import _pixel_grid

    scene, cam = _mixed_scene()
    depth = 5
    cfg = rt.RenderConfig(spp=1, max_depth=depth, jitter=False)
    img_pp = np.asarray(render_diff_pp(scene, cam, 0, cfg))

    px, py = _pixel_grid(cam)
    n = px.shape[0]
    rs = max(1, -(-n // 128))
    pad = rs * 128 - n
    pxp = jnp.concatenate([px, jnp.zeros((pad,), px.dtype)])
    pyp = jnp.concatenate([py, jnp.zeros((pad,), py.dtype)])
    o, d, tm = generate_rays(cam, pxp, pyp, None)
    # the zero-bit constants of megakernel/pathrec unit3()/uniform()
    zero_rand = jnp.broadcast_to(
        jnp.asarray([1e-12, 0.0, -1.0, 1e-8, 0.0], jnp.float32)[None, :, None],
        (depth, 5, rs * 128))
    idx = record_paths(scene, o, d, tm, zero_rand, max_depth=depth,
                       t_min=cfg.t_min, tile_sublanes=rs, interpret=True)
    rad = replay_paths(scene, o, d, tm, zero_rand, idx, t_min=cfg.t_min)
    img_old = np.asarray(rad[:n]).reshape(12, 12, 3)
    np.testing.assert_allclose(img_pp, img_old, atol=1e-4)


def test_iteration_budget_truncation_reported():
    """A starved budget must report leftover > 0 and still produce finite
    (partially accumulated) images — the documented truncation semantics."""
    scene, cam = _metal_scene()
    cfg = rt.RenderConfig(spp=4, max_depth=6, jitter=False)
    img, left = render_diff_pp(scene, cam, 0, cfg, iters=2,
                               return_leftover=True)
    assert int(left) > 0
    assert np.isfinite(np.asarray(img)).all()
    # and the default budget completes
    img2, left2 = render_diff_pp(scene, cam, 0, cfg, return_leftover=True)
    assert int(left2) == 0


def test_fit_raises_on_truncation():
    """The training API must never silently train on a truncated (biased)
    recording: fit(engine='recorded-pp') with a starved explicit budget
    raises with the measured deficit; strict=True (exhaustive single-pass
    budget) always proceeds."""
    from rayz_tpu.diff import fit

    scene, cam = _metal_scene()
    cfg = rt.RenderConfig(spp=4, max_depth=6, jitter=False)
    target = jnp.zeros((16, 16, 3))
    with pytest.raises(RuntimeError, match="truncated"):
        fit(scene, cam, target, config=cfg, steps=1, engine="recorded-pp",
            iters=1)
    _, hist = fit(scene, cam, target, config=cfg, steps=1,
                  engine="recorded-pp", strict=True)
    assert len(hist) == 1 and np.isfinite(hist[0])


def test_grad_matches_fd_albedo_and_center():
    """AD through replay_pp vs central finite differences of the SAME
    recording (f64): the recording is frozen, so this is exact estimator
    differentiation, not stochastic comparison."""
    scene, cam = _mixed_scene(dtype=jnp.float64)
    cfg = rt.RenderConfig(spp=1, max_depth=4, jitter=False)
    from rayz_tpu.ops.integrator import _pixel_grid
    from jax.experimental.pallas import tpu as pltpu

    px, py = _pixel_grid(cam)
    n = px.shape[0]
    rs = max(1, -(-n // 128))
    pad = rs * 128 - n
    pxp = jnp.concatenate([px, jnp.zeros((pad,), px.dtype)])
    pyp = jnp.concatenate([py, jnp.zeros((pad,), py.dtype)])
    idx, aux, left = record_pp(
        scene, cam, 0, pxp.astype(jnp.float32), pyp.astype(jnp.float32), n,
        spp=1, max_depth=4, t_min=1e-3, jitter=False, iters=8,
        tile_sublanes=rs, interpret=pltpu.InterpretParams())
    assert int(jnp.sum(left[:n])) == 0

    fields = ("tex_color", "sphere_center", "sphere_radius", "tri_v0")
    params = extract_params(scene, fields)

    def loss(p):
        rad = replay_pp(inject_params(scene, p), idx, aux, t_min=1e-3,
                        interpret=True)
        return jnp.sum(rad[:n] ** 2)

    grads = jax.grad(loss)(params)
    eps = 1e-5
    rng = np.random.RandomState(0)
    for field in fields:
        g = np.asarray(grads[field])
        assert np.isfinite(g).all(), field
        # spot-check 3 coordinates per field by central difference
        flat = np.asarray(params[field], dtype=np.float64).ravel()
        picks = rng.choice(flat.size, size=min(3, flat.size), replace=False)
        for k in picks:
            fp = flat.copy()
            fp[k] += eps
            lp = float(loss({**params, field: jnp.asarray(
                fp.reshape(params[field].shape))}))
            fm = flat.copy()
            fm[k] -= eps
            lm = float(loss({**params, field: jnp.asarray(
                fm.reshape(params[field].shape))}))
            fd = (lp - lm) / (2 * eps)
            ad = g.ravel()[k]
            assert abs(fd - ad) <= 1e-4 * max(1.0, abs(fd), abs(ad)), (
                field, k, fd, ad)


def test_velocity_grad_matches_fd_f64():
    """Motion-blur (sphere_velocity) gradients: AD through replay_pp vs
    central finite differences of the SAME recording at f64 / eps 1e-6,
    where the estimator is locally smooth. The stubbed CPU PRNG records
    tau = 0 (velocity would be invisible), so the recorded spawn-time plane
    is bumped to 0.37 post-hoc — the replay differentiates whatever
    recording it is given, and FD/AD must agree on it regardless."""
    from jax.experimental.pallas import tpu as pltpu
    from rayz_tpu.ops.integrator import _pixel_grid
    from rayz_tpu.ops.pathrec import _AUX_TAU

    b = rt.SceneBuilder()
    m = b.add_metallic(color=(0.8, 0.7, 0.6), fuzz=0.0)
    b.add_sphere((0, -100.5, -2), 100.0, m)
    b.add_sphere((0, 0, -2), 0.5, m, velocity=(0.15, 0.1, -0.05))
    scene = b.build(dtype=jnp.float64)
    cam = rt.make_camera(width=16, height=16, vfov=55.0, focus_dist=1.0,
                         look_from=(0, 0, 0), look_at=(0, 0, -1),
                         dtype=jnp.float64)
    px, py = _pixel_grid(cam)
    n = px.shape[0]
    rs = max(1, -(-n // 128))
    pad = rs * 128 - n
    pxp = jnp.concatenate([px, jnp.zeros((pad,), px.dtype)])
    pyp = jnp.concatenate([py, jnp.zeros((pad,), py.dtype)])
    idx, aux, left = record_pp(
        scene, cam, 0, pxp.astype(jnp.float32), pyp.astype(jnp.float32), n,
        spp=1, max_depth=4, t_min=1e-3, jitter=False, iters=8,
        tile_sublanes=rs, interpret=pltpu.InterpretParams())
    assert int(jnp.sum(left[:n])) == 0
    aux = aux.at[:, _AUX_TAU].set(
        jnp.where(aux[:, _AUX_TAU] == 0.0, 0.37, aux[:, _AUX_TAU]))

    fields = ("sphere_velocity", "sphere_center")
    params = extract_params(scene, fields)

    def loss(p):
        rad = replay_pp(inject_params(scene, p), idx, aux, t_min=1e-3,
                        interpret=True)
        return jnp.sum(rad[:n] ** 2)

    grads = jax.grad(loss)(params)
    assert float(jnp.abs(grads["sphere_velocity"]).sum()) > 0
    eps = 1e-6
    for field in fields:
        g = np.asarray(grads[field])
        assert np.isfinite(g).all(), field
        flat = np.asarray(params[field], dtype=np.float64).ravel()
        for k in np.argsort(-np.abs(g.ravel()))[:3]:
            fp = flat.copy()
            fp[k] += eps
            lp = float(loss({**params, field: jnp.asarray(
                fp.reshape(g.shape))}))
            fm = flat.copy()
            fm[k] -= eps
            lm = float(loss({**params, field: jnp.asarray(
                fm.reshape(g.shape))}))
            fd = (lp - lm) / (2 * eps)
            ad = g.ravel()[k]
            assert abs(fd - ad) <= 1e-4 * max(1.0, abs(fd), abs(ad)), (
                field, k, fd, ad)


def test_pixel_loss_recorded_pp_engine():
    scene, cam = _metal_scene()
    cfg = rt.RenderConfig(spp=1, max_depth=4, jitter=False)
    params = extract_params(scene, ("tex_color",))
    target = jnp.zeros((16, 16, 3))
    l, g = jax.value_and_grad(pixel_loss)(
        params, scene, cam, jax.random.PRNGKey(0), target, cfg, "recorded-pp")
    assert np.isfinite(float(l))
    assert np.isfinite(np.asarray(g["tex_color"])).all()
    assert np.abs(np.asarray(g["tex_color"])).sum() > 0


def test_gather_rows_matches_take():
    key = jax.random.PRNGKey(0)
    tab = jax.random.normal(key, (37, 20), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (300,), 0, 37)
    rows = gather_rows(tab, idx, True)
    np.testing.assert_array_equal(np.asarray(rows), np.asarray(tab)[np.asarray(idx)])

    g = jax.random.normal(jax.random.PRNGKey(2), (300, 20), jnp.float32)
    d = jax.grad(lambda t: jnp.sum(gather_rows(t, idx, True) * g))(tab)
    d_ref = jax.grad(lambda t: jnp.sum(t[idx] * g))(tab)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), atol=1e-5)


def test_supports_pp_and_smem_gate():
    scene, _ = _metal_scene()
    assert supports_pp(scene)
    n = 16000
    f32 = jnp.float32
    big = scene.replace(
        sphere_center=jnp.zeros((n, 3), f32),
        sphere_velocity=jnp.zeros((n, 3), f32),
        sphere_radius=jnp.ones((n,), f32),
        sphere_material=jnp.zeros((n,), jnp.int32),
        sphere_valid=jnp.ones((n,), bool), n_spheres=n)
    assert not supports_pp(big)
    with pytest.raises(ValueError, match="SMEM"):
        render_diff_pp(big, _metal_scene()[1], 0,
                       rt.RenderConfig(spp=1, max_depth=2, jitter=False))


def test_fused_replay_matches_scan():
    """The fused Pallas replay (fwd + jax.vjp-inside-kernel bwd,
    custom_vjp) must match the XLA scan replay to float tolerance on BOTH
    the radiance and every gradient field, on a scene exercising all three
    materials plus a triangle."""
    from jax.experimental.pallas import tpu as pltpu
    from rayz_tpu.ops.integrator import _pixel_grid
    from rayz_tpu.ops.pathrec import replay_pp_fused

    scene, cam = _mixed_scene(dtype=jnp.float32)
    px, py = _pixel_grid(cam)
    n = px.shape[0]
    rs = max(1, min(16, -(-n // 128)))
    pad = -(-n // (rs * 128)) * rs * 128 - n
    pxp = jnp.concatenate([px, jnp.zeros((pad,), px.dtype)])
    pyp = jnp.concatenate([py, jnp.zeros((pad,), py.dtype)])
    idx, aux, _ = record_pp(scene, cam, 3, pxp, pyp, n, spp=4, max_depth=6,
                            t_min=1e-3, jitter=True, iters=24,
                            tile_sublanes=rs,
                            interpret=pltpu.InterpretParams())
    r1 = replay_pp(scene, idx, aux, t_min=1e-3, interpret=True)
    r2 = replay_pp_fused(scene, idx, aux, t_min=1e-3, tile_sublanes=rs,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)

    from rayz_tpu.diff import inject_params
    params = extract_params(scene)

    def loss(p, fused):
        rep = replay_pp_fused if fused else replay_pp
        kw = dict(tile_sublanes=rs) if fused else {}
        return jnp.sum(rep(inject_params(scene, p), idx, aux, t_min=1e-3,
                           interpret=True, **kw)[:n] ** 2)

    g1 = jax.grad(lambda p: loss(p, False))(params)
    g2 = jax.grad(lambda p: loss(p, True))(params)
    for f in params:
        a, b = np.asarray(g1[f]), np.asarray(g2[f])
        assert np.isfinite(b).all(), f
        np.testing.assert_allclose(b, a, atol=5e-4 * max(1.0, np.abs(a).max()),
                                   err_msg=f)
