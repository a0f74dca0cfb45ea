"""Wavefront (bounce-synchronous sorted-ray) engine tests — CPU,
TPU-semantics interpret mode, deterministic configs (the in-kernel PRNG is
stubbed to zeros off-TPU, like the megakernel's tests). On-chip statistical
parity runs in scripts/tpu_check.py."""

import jax
import jax.numpy as jnp
import numpy as np

import rayz_tpu as rt
from rayz_tpu.ops.megakernel import render_pallas
from rayz_tpu.ops.wavefront import render_wavefront, supports_wavefront


def _metal_scene(width=64):
    b = rt.SceneBuilder()
    m = b.add_metallic(color=(0.8, 0.7, 0.6), fuzz=0.0)
    b.add_sphere((0, -100.5, -2), 100.0, m)
    b.add_sphere((0, 0, -2), 0.5, m)
    scene = b.build(dtype=jnp.float32)
    cam = rt.make_camera(width=width, height=width, vfov=55.0,
                         focus_dist=1.0, look_from=(0, 0, 0),
                         look_at=(0, 0, -1), dtype=jnp.float32)
    return scene, cam


def test_wavefront_matches_megakernel_deterministic():
    """fuzz-0 metal + jitter off: zero-randomness paths, so the wavefront
    engine (sorted, patch-ordered, per-bounce launches) must produce the
    SAME image as the persistent megakernel, with and without sorting."""
    scene, cam = _metal_scene()
    cfg = rt.RenderConfig(spp=1, max_depth=6, jitter=False)
    ref = np.asarray(render_pallas(scene, cam, 0, cfg))
    for sort in (True, False):
        img = np.asarray(render_wavefront(scene, cam, 0, cfg, sort=sort))
        np.testing.assert_allclose(img, ref, atol=1e-6, err_msg=f"sort={sort}")


def test_wavefront_streamed_matches_smem():
    """Forcing the streamed (HBM chunk) table path must be bit-identical to
    the in-SMEM path on a shared scene — same discipline as the
    megakernel's streamed test."""
    scene, cam = _metal_scene(width=32)
    cfg = rt.RenderConfig(spp=1, max_depth=4, jitter=False)
    img_smem = np.asarray(render_wavefront(scene, cam, 0, cfg))
    img_str = np.asarray(render_wavefront(scene, cam, 0, cfg, stream=128,
                                          culling=False))
    np.testing.assert_allclose(img_str, img_smem, atol=0)


def test_wavefront_spp_and_odd_size():
    """spp accumulation and non-patch image sizes (row-major fallback):
    deterministic spp-4 equals spp-1 exactly (stubbed PRNG repeats paths)."""
    b = rt.SceneBuilder()
    m = b.add_metallic(color=(0.9, 0.6, 0.3), fuzz=0.0)
    b.add_sphere((0, -100.5, -2), 100.0, m)
    b.add_sphere((0, 0, -2), 0.5, m)
    scene = b.build(dtype=jnp.float32)
    cam = rt.make_camera(width=20, height=12, vfov=55.0, focus_dist=1.0,
                         look_from=(0, 0, 0), look_at=(0, 0, -1),
                         dtype=jnp.float32)
    img1 = np.asarray(render_wavefront(
        scene, cam, 0, rt.RenderConfig(spp=1, max_depth=5, jitter=False)))
    img4 = np.asarray(render_wavefront(
        scene, cam, 0, rt.RenderConfig(spp=4, max_depth=5, jitter=False)))
    np.testing.assert_allclose(img4, img1, atol=1e-6)


def test_wavefront_triangles_and_materials():
    """Triangle + all-material coverage vs the megakernel, deterministic."""
    b = rt.SceneBuilder()
    b.add_sphere((0, -100.5, -2), 100.0,
                 b.add_diffuse(color=(0.5, 0.5, 0.5),
                               method=rt.models.scene.DIFFUSE_UNIT_SPHERE))
    b.add_sphere((-0.7, 0, -2), 0.45, b.add_metallic(color=(0.9, 0.8, 0.7),
                                                     fuzz=0.0))
    b.add_sphere((0.7, 0, -2), 0.45, b.add_dielectric(1.5))
    b.add_triangle((-0.4, 0.8, -2.5), (0.4, 0.8, -2.5), (0, 1.5, -2.5),
                   b.add_diffuse(color=(0.8, 0.2, 0.2)))
    scene = b.build(dtype=jnp.float32)
    cam = rt.make_camera(width=64, height=32, vfov=60.0, focus_dist=1.0,
                         look_from=(0, 0, 0), look_at=(0, 0, -1),
                         dtype=jnp.float32)
    cfg = rt.RenderConfig(spp=1, max_depth=5, jitter=False)
    img = np.asarray(render_wavefront(scene, cam, 0, cfg))
    ref = np.asarray(render_pallas(scene, cam, 0, cfg))
    np.testing.assert_allclose(img, ref, atol=1e-5)


def test_dispatch_and_direct_call_run_the_same_kernel(monkeypatch):
    """render_fast and a direct render_wavefront call must produce identical
    images AND resolve the same tiling on a streamed scene — the
    tile_sublanes default lives in render_wavefront (None -> per-regime
    optimum), so dispatch cannot silently benchmark a different kernel
    (round-4 verdict weak #6)."""
    from rayz_tpu.ops import wavefront as wf
    from rayz_tpu.ops.engine import render_fast

    scene, cam = _metal_scene(width=32)
    cfg = rt.RenderConfig(spp=1, max_depth=4, jitter=False)

    seen = []
    real_impl = wf._render_wavefront_impl

    def spy(*args, **kw):
        seen.append(kw["tile_sublanes"])
        return real_impl(*args, **kw)

    monkeypatch.setattr(wf, "_render_wavefront_impl", spy)
    img_direct = np.asarray(wf.render_wavefront(scene, cam, 0, cfg,
                                                stream=128))
    img_fast = np.asarray(render_fast(scene, cam, 0, cfg, engine="wavefront",
                                      stream=128))
    assert seen[0] == seen[1] == 32  # streamed-regime default, one source
    np.testing.assert_allclose(img_fast, img_direct, atol=0)


def test_streamed_culling_off_is_honored(monkeypatch):
    """culling=False must reach the streamed kernel (stream_cull=False and
    no within-chunk block tables), not be silently ignored (round-4 advisor
    finding)."""
    from rayz_tpu.ops import wavefront as wf

    scene, cam = _metal_scene(width=32)
    cfg = rt.RenderConfig(spp=1, max_depth=4, jitter=False)
    seen = {}
    real_impl = wf._render_wavefront_impl

    def spy(*args, **kw):
        seen.update(stream_cull=kw["stream_cull"], blk=kw["blk"])
        return real_impl(*args, **kw)

    monkeypatch.setattr(wf, "_render_wavefront_impl", spy)
    wf.render_wavefront(scene, cam, 0, cfg, stream=128, culling=False)
    assert seen == {"stream_cull": False, "blk": 0}
    wf.render_wavefront(scene, cam, 0, cfg, stream=128)
    assert seen["stream_cull"] is True


def test_engine_dispatch_wavefront_for_streamed():
    from rayz_tpu.ops.engine import pick_engine

    scene, _ = _metal_scene()
    n = 64000
    f32 = jnp.float32
    big = scene.replace(
        sphere_center=jnp.zeros((n, 3), f32),
        sphere_velocity=jnp.zeros((n, 3), f32),
        sphere_radius=jnp.ones((n,), f32),
        sphere_material=jnp.zeros((n,), jnp.int32),
        sphere_valid=jnp.ones((n,), bool), n_spheres=n)
    assert supports_wavefront(big)
    # dispatch depends on backend; simulate the TPU decision path directly
    from rayz_tpu.ops.megakernel import fits_smem, fits_stream
    assert not fits_smem(big) and fits_stream(big)
