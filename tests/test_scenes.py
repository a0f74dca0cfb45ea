"""Scene-builder tests: the RTIOW-final generator's statistics must match the
reference construction (/root/reference/src/rayz.zig:45-168), and the other
benchmark scenes must have the right shape."""

import jax.numpy as jnp
import numpy as np

import rayz_tpu as rt
from rayz_tpu.models.scene import MAT_DIELECTRIC, MAT_DIFFUSE, MAT_METALLIC, TEX_CHECKER


def test_random_bouncing_statistics():
    scene, cam = rt.scenes.random_bouncing(width=64, seed=0)
    n = scene.n_spheres
    # 4 fixed + up to 484 grid spheres minus exclusion-zone skips
    assert 400 <= n <= 488
    # ground sphere: r=1000 at (0,-1000,0) with a checker texture
    assert float(scene.sphere_radius[0]) == 1000.0
    mat0 = int(scene.sphere_material[0])
    assert int(scene.mat_kind[mat0]) == MAT_DIFFUSE
    tex0 = int(scene.mat_texture[mat0])
    assert int(scene.tex_kind[tex0]) == TEX_CHECKER
    assert float(scene.tex_scale[tex0]) == jnp.float32(0.32)
    # hero spheres (rayz.zig:76-105)
    kinds = np.asarray(scene.mat_kind)[np.asarray(scene.sphere_material[1:4])]
    assert kinds.tolist() == [MAT_DIELECTRIC, MAT_DIFFUSE, MAT_METALLIC]
    # material mix of the random grid ~ 80/15/5
    grid_mats = np.asarray(scene.sphere_material[4:n])
    grid_kinds = np.asarray(scene.mat_kind)[grid_mats]
    frac_diffuse = (grid_kinds == MAT_DIFFUSE).mean()
    frac_metal = (grid_kinds == MAT_METALLIC).mean()
    assert 0.72 < frac_diffuse < 0.88
    assert 0.09 < frac_metal < 0.22
    # diffuse grid spheres move vertically (motion blur), others do not
    vel = np.asarray(scene.sphere_velocity[4:n])
    moving = vel[:, 1] > 0
    assert scene.has_motion
    assert abs(moving.mean() - frac_diffuse) < 0.05
    assert (vel[:, 0] == 0).all() and (vel[:, 2] == 0).all()
    assert vel[:, 1].max() <= 0.5
    # small spheres avoid the exclusion zone around (4, 0.2, 0)
    centers = np.asarray(scene.sphere_center[4:n])
    d = np.linalg.norm(centers - np.array([4.0, 0.2, 0.0]), axis=1)
    assert (d > 0.9).all()
    # camera matches rayz.zig:48-54
    assert cam.width == 64 and cam.height == 36


def test_random_bouncing_seed_reproducible():
    s1, _ = rt.scenes.random_bouncing(width=64, seed=7)
    s2, _ = rt.scenes.random_bouncing(width=64, seed=7)
    np.testing.assert_array_equal(np.asarray(s1.sphere_center), np.asarray(s2.sphere_center))
    s3, _ = rt.scenes.random_bouncing(width=64, seed=8)
    assert not np.array_equal(np.asarray(s1.sphere_center), np.asarray(s3.sphere_center))


def test_cornell_box_scale():
    scene, cam = rt.scenes.cornell_box(width=64, height=64)
    assert scene.n_triangles >= 1000
    assert scene.n_spheres == 0
    v = np.concatenate([
        np.asarray(scene.tri_v0[: scene.n_triangles]),
        np.asarray(scene.tri_v1[: scene.n_triangles]),
        np.asarray(scene.tri_v2[: scene.n_triangles]),
    ])
    assert v.min() >= -1e-6 and v.max() <= 555 + 1e-3


def test_three_sphere_has_bubble():
    scene, _ = rt.scenes.three_sphere(width=64)
    # inner bubble: dielectric with ior 1/1.5
    iors = np.asarray(scene.mat_ior)[np.asarray(scene.mat_kind) == MAT_DIELECTRIC]
    assert np.isclose(iors, 1.0 / 1.5).any() and np.isclose(iors, 1.5).any()
