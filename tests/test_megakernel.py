"""Megakernel tests (CPU, TPU-interpret mode).

The Mosaic interpreter stubs the in-kernel PRNG to zeros, so off-TPU the
kernel is only exercised in deterministic configurations (``jitter=False``
plus material paths that consume no randomness): depth-1 renders (hit->black /
miss->sky) and fuzz-0 metal scenes, compared EXACTLY against the XLA
integrator oracle. Statistical parity of the stochastic paths is validated on
real TPU hardware (scripts/tpu_check.py) and by the shared formula structure
tested in test_shade.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rayz_tpu as rt
from rayz_tpu.models.scene import (
    DIFFUSE_HEMISPHERE,
    MAT_DIELECTRIC,
    MAT_DIFFUSE,
    MAT_METALLIC,
    SceneBuilder,
)
from rayz_tpu.ops.megakernel import render_pallas, scene_tables, supports_scene


def f32(scene_cam):
    return scene_cam


def _render_both(scene, camera, config):
    img_p = np.asarray(render_pallas(scene, camera, 0, config,
                                     tile_sublanes=8, interpret=True))
    img_x = np.asarray(rt.render(scene.replace(), camera,
                                 jax.random.PRNGKey(0), config))
    return img_p, img_x


def test_scene_tables_layout():
    b = SceneBuilder()
    even = b.add_solid_texture((0.2, 0.3, 0.1))
    odd = b.add_solid_texture((0.9, 0.9, 0.9))
    checker = b.add_checker_texture(0.32, even, odd)
    ground = b.add_diffuse(texture=checker)
    glass = b.add_dielectric(1.5)
    metal = b.add_metallic(color=(0.7, 0.6, 0.5), fuzz=0.25)
    b.add_sphere((0, -1000, 0), 1000.0, ground)
    b.add_sphere((0, 1, 0), 1.0, glass, velocity=(0.0, 0.25, 0.0))
    b.add_sphere((4, 1, 0), 1.0, metal)
    scene = b.build(dtype=jnp.float32)
    tab = np.asarray(scene_tables(scene))

    assert tab.shape[0] == 17
    # sphere 0: diffuse + checker
    assert np.isclose(tab[3, 0], 1000.0**2 - 1000.0**2)  # |c|^2 - r^2
    pk = tab[9, 0]
    kindm = np.floor(pk / 4.0)
    assert kindm == MAT_DIFFUSE * 4 + DIFFUSE_HEMISPHERE
    assert np.isclose(tab[10, 0], 0.32)  # checker scale in ior-or-scale row
    assert np.allclose(tab[11:14, 0], (0.2, 0.3, 0.1))  # even rgb
    assert np.allclose(tab[14:17, 0], (0.9, 0.9, 0.9))  # odd rgb
    # sphere 1: dielectric, moving
    assert np.floor(tab[9, 1] / 16.0) == MAT_DIELECTRIC
    assert np.isclose(tab[10, 1], 1.5)  # ior in ior-or-scale row
    assert np.isclose(tab[5, 1], 0.25)  # velocity y
    assert np.isclose(tab[7, 1], 2 * (1.0 * 0.25))  # 2 c.v
    # sphere 2: metal fuzz decode
    pk2 = tab[9, 2]
    assert np.floor(pk2 / 4.0) == MAT_METALLIC * 4
    assert abs((pk2 - 4.0 * np.floor(pk2 / 4.0)) / 2.0 - 0.25) < 1e-5
    # padding never hits
    assert tab[3, scene.n_spheres] > 1e30


def test_supports_scene():
    scene, _ = rt.scenes.two_sphere(width=8, height=8)
    assert supports_scene(scene)
    scene_t, _ = rt.scenes.cornell_box(width=8, height=8, tessellation=1)
    assert supports_scene(scene_t)  # triangles run in-kernel too
    empty = SceneBuilder().build()
    assert not supports_scene(empty.replace(n_spheres=0))


def test_depth1_hit_black_miss_sky():
    """Deterministic single-bounce render: hit pixels are black (depth
    exhausted -> black, renderer.zig:104-105), miss pixels are the sky
    gradient — exact match against the XLA integrator."""
    scene, camera = rt.scenes.two_sphere(width=32, height=24)
    config = rt.RenderConfig(spp=1, max_depth=1, t_min=1e-3, jitter=False)
    img_p, img_x = _render_both(scene, camera, config)
    assert np.isfinite(img_p).all()
    np.testing.assert_allclose(img_p, img_x, atol=2e-5)
    assert img_p.max() > 0.5  # sky visible
    assert (img_p.reshape(-1, 3).min(axis=1) == 0).any()  # hit pixels black


def test_metal_mirror_exact_parity():
    """Fuzz-0 metal consumes no randomness: multi-bounce paths are fully
    deterministic with jitter off, so pallas and XLA must agree exactly."""
    b = SceneBuilder()
    ground = b.add_metallic(color=(0.8, 0.8, 0.9), fuzz=0.0)
    ball = b.add_metallic(color=(0.9, 0.6, 0.3), fuzz=0.0)
    b.add_sphere((0.0, -100.5, -1.0), 100.0, ground)
    b.add_sphere((0.0, 0.0, -1.2), 0.5, ball)
    scene = b.build(dtype=jnp.float32)
    camera = rt.make_camera(width=32, height=24, vfov=60.0, focus_dist=1.0,
                            defocus_angle=0.0, look_from=(0, 0.4, 1),
                            look_at=(0, 0, -1))
    config = rt.RenderConfig(spp=1, max_depth=4, t_min=1e-3, jitter=False)
    img_p, img_x = _render_both(scene, camera, config)
    assert np.isfinite(img_p).all()
    np.testing.assert_allclose(img_p, img_x, atol=1e-4)


def test_checker_parity_deterministic():
    """Checker albedo feeds the throughput of the bounce *before* the miss;
    with a metal ground the full checker pipeline is deterministic."""
    b = SceneBuilder()
    dark = b.add_solid_texture((0.1, 0.1, 0.1))
    lite = b.add_solid_texture((0.9, 0.9, 0.9))
    check = b.add_checker_texture(0.7, dark, lite)
    ground = b.add_metallic(texture=check, fuzz=0.0)
    b.add_sphere((0.0, -100.5, -1.0), 100.0, ground)
    scene = b.build(dtype=jnp.float32)
    camera = rt.make_camera(width=32, height=24, vfov=70.0, focus_dist=1.0,
                            defocus_angle=0.0, look_from=(0, 0.5, 1),
                            look_at=(0, -0.5, -1))
    config = rt.RenderConfig(spp=1, max_depth=3, t_min=1e-3, jitter=False)
    img_p, img_x = _render_both(scene, camera, config)
    np.testing.assert_allclose(img_p, img_x, atol=1e-4)


def test_motion_blur_time_zero_parity():
    """With jitter off, ray time is 0 (camera.zig:75 deterministic path), so a
    moving-sphere scene must render at its t=0 configuration — exercises the
    motion branch of the kernel deterministically."""
    b = SceneBuilder()
    ground = b.add_metallic(color=(0.5, 0.5, 0.5), fuzz=0.0)
    ball = b.add_metallic(color=(0.9, 0.2, 0.2), fuzz=0.0)
    b.add_sphere((0.0, -100.5, -1.0), 100.0, ground)
    b.add_sphere((0.0, 0.0, -1.2), 0.5, ball, velocity=(0.0, 0.4, 0.0))
    scene = b.build(dtype=jnp.float32)
    assert scene.has_motion
    camera = rt.make_camera(width=24, height=16, vfov=60.0, focus_dist=1.0,
                            defocus_angle=0.0, look_from=(0, 0.2, 1),
                            look_at=(0, 0, -1))
    config = rt.RenderConfig(spp=1, max_depth=2, t_min=1e-3, jitter=False)
    img_p, img_x = _render_both(scene, camera, config)
    np.testing.assert_allclose(img_p, img_x, atol=1e-4)


def test_tri_tables_layout():
    from rayz_tpu.ops.megakernel import tri_tables

    b = SceneBuilder()
    metal = b.add_metallic(color=(0.8, 0.85, 0.88), fuzz=0.05)
    b.add_triangle((0, 0, 0), (1, 0, 0), (0, 1, 0), metal)
    scene = b.build(dtype=jnp.float32)
    tab = np.asarray(tri_tables(scene))
    assert tab.shape == (20, scene.tri_material.shape[0])
    # plane normal of the xy unit triangle is +z with |n| = |e1 x e2| = 1
    assert np.allclose(tab[0:3, 0], (0.0, 0.0, 1.0))
    assert np.isclose(tab[3, 0], 0.0)  # n.v0
    # dual basis: g1.e1 = 1, g1.e2 = 0 -> g1 = (1,0,0); g2 = (0,1,0)
    assert np.allclose(tab[4:7, 0], (1.0, 0.0, 0.0))
    assert np.allclose(tab[8:11, 0], (0.0, 1.0, 0.0))
    # padding column: g1.v0 poisoned so u can never be >= 0
    assert tab[7, scene.n_triangles] > 1e30
    # material decode
    assert np.floor(tab[12, 0] / 4.0) == MAT_METALLIC * 4
    assert abs((tab[12, 0] - 4.0 * np.floor(tab[12, 0] / 4.0)) / 2.0 - 0.05) < 1e-5


def test_triangle_mirror_exact_parity():
    """Triangle-only scene, fuzz-0 metal floor mirrors a diffuse-free path:
    fully deterministic with jitter off, so the in-kernel triangle loop must
    match the XLA intersect_triangles oracle exactly (depth-2: mirror bounce
    then sky)."""
    b = SceneBuilder()
    mirror = b.add_metallic(color=(0.9, 0.8, 0.7), fuzz=0.0)
    b.add_quad((-2.0, -0.5, -3.0), (4.0, 0.0, 0.0), (0.0, 0.0, 4.0), mirror)
    scene = b.build(dtype=jnp.float32)
    assert scene.n_spheres == 0 and scene.n_triangles == 2
    camera = rt.make_camera(width=32, height=24, vfov=60.0, focus_dist=1.0,
                            defocus_angle=0.0, look_from=(0, 0.4, 1),
                            look_at=(0, -0.5, -1))
    config = rt.RenderConfig(spp=1, max_depth=3, t_min=1e-3, jitter=False)
    img_p, img_x = _render_both(scene, camera, config)
    assert np.isfinite(img_p).all()
    np.testing.assert_allclose(img_p, img_x, atol=1e-4)


def test_mixed_sphere_triangle_parity():
    """Spheres and triangles in one scene: the kernel's two winner loops must
    agree with the XLA path's cross-primitive nearest-hit merge, including a
    sphere occluding a triangle and vice versa."""
    b = SceneBuilder()
    mirror = b.add_metallic(color=(0.8, 0.8, 0.9), fuzz=0.0)
    ball = b.add_metallic(color=(0.9, 0.6, 0.3), fuzz=0.0)
    b.add_quad((-3.0, -0.5, -4.0), (6.0, 0.0, 0.0), (0.0, 0.0, 6.0), mirror)
    b.add_sphere((0.0, 0.0, -1.2), 0.5, ball)
    b.add_sphere((0.9, 0.1, -1.8), 0.4, mirror)
    scene = b.build(dtype=jnp.float32)
    assert scene.n_spheres == 2 and scene.n_triangles == 2
    camera = rt.make_camera(width=32, height=24, vfov=70.0, focus_dist=1.0,
                            defocus_angle=0.0, look_from=(0, 0.5, 1),
                            look_at=(0, 0, -1))
    config = rt.RenderConfig(spp=1, max_depth=4, t_min=1e-3, jitter=False)
    img_p, img_x = _render_both(scene, camera, config)
    assert np.isfinite(img_p).all()
    np.testing.assert_allclose(img_p, img_x, atol=1e-4)


def test_fits_smem_budget():
    """Auto engine must fall back to XLA when the scene tables exceed the
    1 MiB SMEM (the megakernel keeps the whole scene there)."""
    from rayz_tpu.ops.megakernel import fits_smem

    small, _ = rt.scenes.two_sphere(width=8, height=8)
    assert fits_smem(small)
    n = 20096  # gm tables alone = 13 * 20096 * 4B > 1 MiB
    big = small.replace(
        sphere_center=jnp.zeros((n, 3)), sphere_velocity=jnp.zeros((n, 3)),
        sphere_radius=jnp.ones((n,)), sphere_material=jnp.zeros((n,), jnp.int32),
        sphere_valid=jnp.ones((n,), bool), n_spheres=n)
    assert not fits_smem(big)


def test_full_table_decode_deep_parity():
    """Deep (depth 4) deterministic scene that DISABLES the gm fast path —
    two distinct checker textures — so every bounce decodes the full
    per-primitive table (packed kind/method/fuzz + the shared ior-or-scale
    row + per-winner even/odd colors, megakernel.py _material_rows). Checked
    against the XLA oracle AND against the gm-eligible variant's math by
    construction (fuzz-0 metal between two checkered diffuse surfaces:
    multi-bounce, multi-checker, winner carry swaps tables every bounce)."""
    b = SceneBuilder()
    e1 = b.add_solid_texture((0.2, 0.3, 0.1))
    o1 = b.add_solid_texture((0.9, 0.9, 0.9))
    c1 = b.add_checker_texture(0.4, e1, o1)
    e2 = b.add_solid_texture((0.7, 0.2, 0.2))
    o2 = b.add_solid_texture((0.1, 0.1, 0.6))
    c2 = b.add_checker_texture(0.9, e2, o2)
    # fuzz-0 METAL with checker textures: deterministic bounce directions
    # (diffuse would consume randomness and diverge from the oracle's RNG)
    # while still decoding checker scale + even/odd per winner every bounce.
    ground = b.add_metallic(texture=c1, fuzz=0.0)
    wall = b.add_metallic(texture=c2, fuzz=0.0)
    mirror = b.add_metallic(color=(0.85, 0.85, 0.95), fuzz=0.0)
    b.add_sphere((0, -100.5, -2), 100.0, ground)
    b.add_sphere((0, 100.8, -2), 100.0, wall)
    b.add_sphere((0, 0.1, -2.2), 0.6, mirror)
    b.add_sphere((-1.1, 0.0, -2.0), 0.45, mirror)
    scene = b.build(dtype=jnp.float32)
    from rayz_tpu.ops.megakernel import use_global_materials
    assert not use_global_materials(scene)  # two checkers: full tables
    camera = rt.make_camera(width=24, height=24, vfov=60.0, focus_dist=1.0,
                            defocus_angle=0.0, look_from=(0, 0.2, 0.6),
                            look_at=(0, 0, -2))
    config = rt.RenderConfig(spp=1, max_depth=4, t_min=1e-3, jitter=False)
    img_p, img_x = _render_both(scene, camera, config)
    assert np.isfinite(img_p).all()
    np.testing.assert_allclose(img_p, img_x, atol=1e-4)
    # the render must actually see both checker patterns (odd+even of both)
    assert img_x.std() > 0.05


def test_tree_merge_parity():
    """Tournament-tree nearest-hit merge must be bit-identical to the select
    chain (strict-less merge preserves first-wins tie semantics on distinct
    q values; NaN roots are poisoned to +BIG before any compare)."""
    scene, camera = rt.scenes.random_bouncing(width=48)
    config = rt.RenderConfig(spp=1, max_depth=4, t_min=1e-3, jitter=False)
    img_chain = np.asarray(render_pallas(scene, camera, 0, config,
                                         tile_sublanes=8, interpret=True,
                                         tree=False))
    img_tree = np.asarray(render_pallas(scene, camera, 0, config,
                                        tile_sublanes=8, interpret=True,
                                        tree=True))
    np.testing.assert_array_equal(img_tree, img_chain)


def test_culling_parity_spheres():
    """Block culling (Morton sort + per-block bounding-sphere skip) must be
    invisible in the output: forced-on vs forced-off renders of the ~500
    sphere scene agree exactly in a deterministic config."""
    scene, camera = rt.scenes.random_bouncing(width=48)
    config = rt.RenderConfig(spp=1, max_depth=4, t_min=1e-3, jitter=False)
    img_off = np.asarray(render_pallas(scene, camera, 0, config,
                                       tile_sublanes=8, interpret=True,
                                       culling=False))
    img_on = np.asarray(render_pallas(scene, camera, 0, config,
                                      tile_sublanes=8, interpret=True,
                                      culling=True))
    assert np.isfinite(img_on).all()
    np.testing.assert_allclose(img_on, img_off, atol=1e-6)


def test_culling_parity_mixed_triangles():
    """Culling on a mixed sphere+triangle scene (both block tables active,
    poisoned padding columns in both classes)."""
    b = SceneBuilder()
    mirror = b.add_metallic(color=(0.8, 0.8, 0.9), fuzz=0.0)
    ball = b.add_metallic(color=(0.9, 0.6, 0.3), fuzz=0.0)
    b.add_quad((-3.0, -0.5, -4.0), (6.0, 0.0, 0.0), (0.0, 0.0, 6.0), mirror)
    b.add_sphere((0.0, 0.0, -1.2), 0.5, ball)
    b.add_sphere((0.9, 0.1, -1.8), 0.4, mirror)
    scene = b.build(dtype=jnp.float32)
    camera = rt.make_camera(width=32, height=24, vfov=70.0, focus_dist=1.0,
                            defocus_angle=0.0, look_from=(0, 0.5, 1),
                            look_at=(0, 0, -1))
    config = rt.RenderConfig(spp=1, max_depth=4, t_min=1e-3, jitter=False)
    img_off = np.asarray(render_pallas(scene, camera, 0, config,
                                       tile_sublanes=8, interpret=True,
                                       culling=False))
    img_on = np.asarray(render_pallas(scene, camera, 0, config,
                                      tile_sublanes=8, interpret=True,
                                      culling=True, block_size=8))
    np.testing.assert_allclose(img_on, img_off, atol=1e-6)


def test_engine_dispatch():
    from rayz_tpu.ops.engine import pick_engine
    sph, _ = rt.scenes.two_sphere(width=8, height=8)
    tri, _ = rt.scenes.cornell_box(width=8, height=8, tessellation=1)
    # off-TPU auto resolves to xla; explicit names pass through
    assert pick_engine(sph, "auto") in ("pallas", "xla")
    assert pick_engine(tri, "auto") in ("pallas", "xla")
    assert pick_engine(sph, "xla") == "xla"
    with pytest.raises(ValueError):
        pick_engine(sph, "cuda")


def test_render_fast_xla_fallback_matches_render():
    scene, camera = rt.scenes.two_sphere(width=16, height=16)
    config = rt.RenderConfig(spp=2, max_depth=3, t_min=1e-3)
    a = np.asarray(rt.render_fast(scene, camera, 7, config, engine="xla"))
    b = np.asarray(rt.render(scene, camera, jax.random.PRNGKey(7), config))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_sharded_matches_single_device():
    """8-virtual-device shard_map of the kernel is bit-exact vs one device in
    a deterministic (RNG-free) config: per-pixel work is identical; only the
    pixel->device assignment changes."""
    from rayz_tpu.ops.megakernel import render_pallas_sharded
    from rayz_tpu.parallel import make_mesh

    b = SceneBuilder()
    ground = b.add_metallic(color=(0.8, 0.8, 0.9), fuzz=0.0)
    ball = b.add_metallic(color=(0.9, 0.6, 0.3), fuzz=0.0)
    b.add_sphere((0.0, -100.5, -1.0), 100.0, ground)
    b.add_sphere((0.0, 0.0, -1.2), 0.5, ball)
    scene = b.build(dtype=jnp.float32)
    camera = rt.make_camera(width=48, height=32, vfov=60.0, focus_dist=1.0,
                            defocus_angle=0.0, look_from=(0, 0.4, 1),
                            look_at=(0, 0, -1))
    config = rt.RenderConfig(spp=1, max_depth=4, t_min=1e-3, jitter=False)
    mesh = make_mesh(jax.devices())
    assert mesh.size == 8
    img_s = np.asarray(render_pallas_sharded(scene, camera, 0, config, mesh))
    img_1 = np.asarray(render_pallas(scene, camera, 0, config,
                                     tile_sublanes=8, interpret=True))
    np.testing.assert_array_equal(img_s, img_1)


def test_global_material_mode_flags():
    """Scenes with one checker + one dielectric use the gm fast path; a
    second distinct-IOR dielectric or checker texture disables it."""
    from rayz_tpu.ops.megakernel import use_global_materials

    b = rt.SceneBuilder()
    even = b.add_solid_texture((0.2, 0.3, 0.1))
    odd = b.add_solid_texture((0.9, 0.9, 0.9))
    b.add_sphere((0, -1000, 0), 1000.0,
                 b.add_diffuse(texture=b.add_checker_texture(0.32, even, odd)))
    g1 = b.add_dielectric(1.5)
    g2 = b.add_dielectric(1.5)  # deduped: same material
    assert g1 == g2
    b.add_sphere((0, 1, 0), 1.0, g1)
    assert use_global_materials(b.build())

    b.add_sphere((2, 1, 0), 1.0, b.add_dielectric(1.33))  # second IOR
    assert not use_global_materials(b.build())


def test_fallback_mode_matches_xla_multi_ior():
    """Two distinct IORs force the full per-primitive table path; the kernel
    must still match the XLA oracle (deterministic: straight-through rays at
    normal incidence never flip the Schlick coin... avoided entirely by
    depth-1 hit->black)."""
    b = rt.SceneBuilder()
    b.add_sphere((0, 0, -2), 0.5, b.add_dielectric(1.5))
    b.add_sphere((1.2, 0, -2), 0.5, b.add_dielectric(2.4))
    b.add_sphere((-1.2, 0, -2), 0.5, b.add_metallic(color=(0.8, 0.7, 0.6)))
    scene = b.build()
    from rayz_tpu.ops.megakernel import use_global_materials
    assert not use_global_materials(scene)
    cam = rt.make_camera(width=24, height=24, vfov=60.0, focus_dist=1.0,
                         look_from=(0, 0, 0), look_at=(0, 0, -1))
    config = rt.RenderConfig(spp=1, max_depth=1, jitter=False)
    img_p, img_x = _render_both(scene, cam, config)
    np.testing.assert_allclose(img_p, img_x, atol=1e-4)


def test_streamed_tables_bit_exact():
    """Forced table streaming (HBM chunks + per-chunk bound culling, the
    unbounded-N acceleration path, round 3) must be BIT-exact vs the
    in-SMEM kernel: same sweep code, same candidate order, only the table
    transport differs."""
    b = SceneBuilder()
    mirror = b.add_metallic(color=(0.95, 0.95, 0.95), fuzz=0.0)
    ball = b.add_metallic(color=(0.9, 0.6, 0.3), fuzz=0.0)
    b.add_quad((-3.0, -0.5, -4.0), (6.0, 0.0, 0.0), (0.0, 0.0, 6.0), mirror)
    b.add_sphere((0.0, 0.0, -1.2), 0.5, ball)
    b.add_sphere((0.9, 0.1, -1.8), 0.4, mirror)
    scene = b.build(dtype=jnp.float32)
    camera = rt.make_camera(width=32, height=24, vfov=70.0, focus_dist=1.0,
                            defocus_angle=0.0, look_from=(0, 0.5, 1),
                            look_at=(0, 0, -1))
    config = rt.RenderConfig(spp=1, max_depth=4, t_min=1e-3, jitter=False)
    plain = np.asarray(render_pallas(scene, camera, 0, config))
    streamed = np.asarray(render_pallas(scene, camera, 0, config, stream=128))
    np.testing.assert_array_equal(streamed, plain)
    # brute-force streaming (bound tests disabled) must also agree
    brute = np.asarray(render_pallas(scene, camera, 0, config, stream=128,
                                     culling=False))
    np.testing.assert_array_equal(brute, plain)


def test_fits_stream_and_auto_dispatch():
    from rayz_tpu.ops.megakernel import fits_smem, fits_stream

    small, _ = rt.scenes.two_sphere(width=8, height=8)
    assert fits_stream(small)
    n = 64000
    f32 = jnp.float32
    big = small.replace(
        sphere_center=jnp.zeros((n, 3), f32),
        sphere_velocity=jnp.zeros((n, 3), f32),
        sphere_radius=jnp.ones((n,), f32),
        sphere_material=jnp.zeros((n,), jnp.int32),
        sphere_valid=jnp.ones((n,), bool), n_spheres=n)
    assert not fits_smem(big)
    assert fits_stream(big)  # the ceiling is gone


def test_nested_checker_rejected_not_degraded():
    """A checker nested inside a checker renders correctly only on the XLA
    engine (4-level chase, shade.py); the Pallas engines resolve one level
    and must REJECT such scenes — clear error on explicit request, XLA on
    auto — instead of silently shading differently (round-2 verdict
    missing #6)."""
    from rayz_tpu.ops.engine import pick_engine

    b = SceneBuilder()
    e = b.add_solid_texture((0.1, 0.1, 0.1))
    o = b.add_solid_texture((0.9, 0.9, 0.9))
    inner = b.add_checker_texture(0.3, e, o)
    outer = b.add_checker_texture(1.1, inner, o)  # checker inside checker
    b.add_sphere((0, -100.5, -1), 100.0, b.add_diffuse(texture=outer))
    nested = b.build()
    assert nested.deep_checker
    assert not supports_scene(nested)
    assert pick_engine(nested, "auto") == "xla"
    cam = rt.make_camera(width=8, height=8, vfov=60.0, focus_dist=1.0,
                         look_from=(0, 0.5, 1), look_at=(0, 0, -1))
    cfg = rt.RenderConfig(spp=1, max_depth=2, jitter=False)
    with pytest.raises(ValueError, match="checker"):
        render_pallas(nested, cam, 0, cfg, interpret=True)
    # the XLA path renders it fine
    img = np.asarray(rt.render(nested, cam, jax.random.PRNGKey(0), cfg))
    assert np.isfinite(img).all()

    # one-level checker scenes stay on the fast path
    b2 = SceneBuilder()
    e2 = b2.add_solid_texture((0.1, 0.1, 0.1))
    o2 = b2.add_solid_texture((0.9, 0.9, 0.9))
    flat = b2.add_checker_texture(0.5, e2, o2)
    b2.add_sphere((0, -100.5, -1), 100.0, b2.add_diffuse(texture=flat))
    assert not b2.build().deep_checker


def test_compact_respawn_matches_single_launch():
    """Straggler-compacted respawn (_trace_shard_compact): budgeted passes +
    between-pass slot compaction must reproduce the single-launch render
    EXACTLY on a deterministic config — interrupting a path mid-flight and
    resuming it from saved state (in a different slot position) may not
    change a single bit of radiance. Covers glass (deep interior paths get
    interrupted by the tiny budgets), metal, diffuse, and triangles."""
    b = SceneBuilder()
    m = b.add_metallic(color=(0.8, 0.7, 0.6), fuzz=0.0)
    b.add_sphere((0, -100.5, -2), 100.0, m)
    b.add_sphere((0, 0, -2), 0.5, m)
    b.add_sphere((1.1, 0, -2.5), 0.5, b.add_dielectric(1.5))
    b.add_triangle((-1.6, 0.0, -2.5), (-0.8, 0.0, -2.5), (-1.2, 0.9, -2.5),
                   b.add_diffuse(color=(0.7, 0.2, 0.2)))
    scene = b.build(dtype=jnp.float32)
    cam = rt.make_camera(width=64, height=32, vfov=55.0, focus_dist=1.0,
                         look_from=(0, 0, 0), look_at=(0, 0, -1),
                         dtype=jnp.float32)
    cfg = rt.RenderConfig(spp=2, max_depth=6, jitter=False)
    ref = np.asarray(render_pallas(scene, cam, 0, cfg, passes=0))
    for budget, passes in ((1, 20), (3, 4), (2, 3)):
        img = np.asarray(render_pallas(scene, cam, 0, cfg, budget=budget,
                                       passes=passes))
        np.testing.assert_allclose(img, ref, atol=0,
                                   err_msg=f"budget={budget} passes={passes}")


def test_sharded_compact_matches_single_device():
    """The sharded path's straggler-compacted respawn (per-shard budgeted
    passes + partition) must be bit-exact vs the single-device compact
    render in a deterministic config — the compaction glue is shard-local."""
    from rayz_tpu.ops.megakernel import render_pallas_sharded
    from rayz_tpu.parallel import make_mesh

    b = SceneBuilder()
    ground = b.add_metallic(color=(0.8, 0.8, 0.9), fuzz=0.0)
    ball = b.add_metallic(color=(0.9, 0.6, 0.3), fuzz=0.0)
    b.add_sphere((0.0, -100.5, -1.0), 100.0, ground)
    b.add_sphere((0.0, 0.0, -1.2), 0.5, ball)
    scene = b.build(dtype=jnp.float32)
    camera = rt.make_camera(width=16, height=16, vfov=60.0, focus_dist=1.0,
                            defocus_angle=0.0, look_from=(0, 0.4, 1),
                            look_at=(0, 0, -1))
    config = rt.RenderConfig(spp=2, max_depth=3, t_min=1e-3, jitter=False)
    mesh = make_mesh(jax.devices())
    img_s = np.asarray(render_pallas_sharded(scene, camera, 0, config, mesh,
                                             budget=2, passes=2,
                                             tile_sublanes=8))
    img_p = np.asarray(render_pallas(scene, camera, 0, config,
                                     tile_sublanes=8, interpret=True,
                                     passes=0))
    np.testing.assert_array_equal(img_s, img_p)


def test_compact_respawn_padding_and_forced_culling():
    """Compact-respawn edge cases: (a) an image smaller than the slot
    capacity (padding slots must not overwrite real pixels through the
    final scatter — negative indices WRAP in JAX, mode='drop' alone does
    not save you); (b) forced in-SMEM block culling under budget/resume."""
    b = SceneBuilder()
    m = b.add_metallic(color=(0.8, 0.7, 0.6), fuzz=0.0)
    b.add_sphere((0, -100.5, -2), 100.0, m)
    b.add_sphere((0, 0, -2), 0.5, m)
    scene = b.build(dtype=jnp.float32)
    cam = rt.make_camera(width=20, height=12, vfov=55.0, focus_dist=1.0,
                         look_from=(0, 0, 0), look_at=(0, 0, -1),
                         dtype=jnp.float32)
    cfg = rt.RenderConfig(spp=2, max_depth=4, jitter=False)
    ref = np.asarray(render_pallas(scene, cam, 0, cfg, passes=0))
    img = np.asarray(render_pallas(scene, cam, 0, cfg, budget=1, passes=4))
    np.testing.assert_array_equal(img, ref)
    img_c = np.asarray(render_pallas(scene, cam, 0, cfg, budget=1, passes=4,
                                     culling=True))
    np.testing.assert_allclose(img_c, ref, atol=1e-6)
