"""Vector-math golden tests ported from the reference's inline Zig tests
(/root/reference/src/vec.zig:169-215, material.zig:213-223)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rayz_tpu.utils import vec


def v(*xs):
    return jnp.asarray(xs, dtype=jnp.float64)


def test_add_mag():
    # vec.zig:169-181 "v3 add"
    a = v(0, 0, 1)
    b = v(-1, 1, 0)
    c = a + b
    assert float(vec.norm(a)) == 1.0
    np.testing.assert_array_equal(np.asarray(c), [-1.0, 1.0, 1.0])


def test_dot_mag_unit():
    # vec.zig:190-204 "v3 dot+mag+unit"
    a = v(0, 1, 0)
    b = v(1, 0, 0)
    assert float(vec.dot(a, b)) == 0.0
    assert float(vec.dot(a, a)) == 1.0
    assert float(vec.dot(2.0 * a, a)) == 2.0
    assert float(vec.dot(a, v(0.5, 0.5, 1))) == 0.5

    c = v(4.5, -1.2, 3.3)
    assert float(vec.dot(c, c)) == pytest.approx(32.58)
    assert float(vec.norm(c)) == pytest.approx(5.7078, rel=1e-4)
    assert float(vec.norm(vec.normalize(c))) == pytest.approx(1.0, rel=1e-4)
    assert float(vec.norm(vec.normalize(a + b))) == pytest.approx(1.0, rel=1e-4)


def test_cross():
    a = v(1, 0, 0)
    b = v(0, 1, 0)
    np.testing.assert_allclose(np.asarray(vec.cross(a, b)), [0, 0, 1])
    np.testing.assert_allclose(np.asarray(vec.cross(b, a)), [0, 0, -1])
    # batched
    A = jnp.stack([a, b])
    B = jnp.stack([b, a])
    out = vec.cross(A, B)
    np.testing.assert_allclose(np.asarray(out), [[0, 0, 1], [0, 0, -1]])


def test_refract_golden():
    # material.zig:213-223 "refract": hand-computed golden values
    unit_dir = vec.normalize(v(-0.3125, -0.3125, -1.0))
    n = v(-0.558127, -0.558127, 0.613994)
    out = vec.refract(unit_dir, n, jnp.float64(1.0 / 1.5))
    np.testing.assert_allclose(
        np.asarray(out), [0.144881, 0.144881, -0.978784], rtol=1e-4
    )


def test_reflect():
    # reflect about +y: (1,-1,0) -> (1,1,0) (material.zig:185-187)
    d = v(1, -1, 0)
    n = v(0, 1, 0)
    np.testing.assert_allclose(np.asarray(vec.reflect(d, n)), [1, 1, 0])
    # non-unit incoming dir is preserved in scale
    np.testing.assert_allclose(np.asarray(vec.reflect(2 * d, n)), [2, 2, 0])


def test_ray_at():
    o = v(1, 2, 3)
    d = v(0, 1, 0)
    np.testing.assert_allclose(
        np.asarray(vec.ray_at(o, d, jnp.float64(2.0))), [1, 4, 3]
    )


def test_near_zero():
    assert bool(vec.near_zero(v(1e-9, -1e-9, 0)))
    assert not bool(vec.near_zero(v(1e-7, 0, 0)))
