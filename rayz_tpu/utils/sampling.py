"""Reparameterized random sampling.

The reference draws all of its randomness by rejection loops
(/root/reference/src/material.zig:196-211 unit sphere/hemisphere,
/root/reference/src/camera.zig:79-90 defocus disk). Rejection sampling is
data-dependent control flow — hostile to XLA and non-differentiable — so every
sampler here is a closed-form transform of uniform/normal draws producing the
*same distribution* (this is the SURVEY.md §7 design delta #3). Bit-exact
sample parity with the reference is impossible by construction (it seeds from
OS entropy, renderer.zig:55-59); distribution parity is what the statistical
tests check.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import vec

__all__ = [
    "uniform",
    "random_unit_vector",
    "random_in_unit_sphere",
    "random_in_hemisphere",
    "random_in_unit_disk",
]


def uniform(key, shape, dtype, low=0.0, high=1.0):
    """U[low, high) of given shape/dtype (V3.random semantics, vec.zig:9-16)."""
    return jax.random.uniform(key, shape, dtype=dtype, minval=low, maxval=high)


def random_unit_vector(key, shape, dtype):
    """Uniform direction on the unit sphere; shape [..., 3].

    Distribution-equivalent to randomUnit (material.zig:203-205): normalized
    Gaussian is exactly uniform on S^2. The epsilon guard keeps the measure-zero
    all-zeros draw finite (and keeps gradients finite).
    """
    g = jax.random.normal(key, (*shape, 3), dtype=dtype)
    return vec.normalize(g, eps=1e-12)


def random_in_unit_sphere(key, shape, dtype):
    """Uniform point in the unit ball; shape [..., 3].

    Distribution-equivalent to randomInUnitSphere (material.zig:196-201):
    uniform direction scaled by U^(1/3) gives uniform density in the ball.
    """
    kd, kr = jax.random.split(key)
    d = random_unit_vector(kd, shape, dtype)
    u = jax.random.uniform(kr, shape, dtype=dtype)
    return d * jnp.cbrt(u)[..., None]


def random_in_hemisphere(key, shape, dtype, normal):
    """Uniform point in the unit half-ball about ``normal``; shape [..., 3].

    Matches randomInHemisphere (material.zig:207-211): a ball sample flipped to
    the normal's side — NOT normalized (the reference keeps the interior
    point). Reference keeps the sample when dot > 0 and flips otherwise.
    """
    s = random_in_unit_sphere(key, shape, dtype)
    keep = (vec.dot(s, normal) > 0.0)[..., None]
    return jnp.where(keep, s, -s)


def random_in_unit_disk(key, shape, dtype):
    """Uniform point in the unit disk (z=0 plane); shape [..., 2].

    Distribution-equivalent to Camera.randomInDefocus's rejection loop
    (camera.zig:79-90): polar transform r=sqrt(u), theta=2*pi*v.
    """
    ku, kv = jax.random.split(key)
    r = jnp.sqrt(jax.random.uniform(ku, shape, dtype=dtype))
    theta = jax.random.uniform(
        kv, shape, dtype=dtype, minval=0.0, maxval=2.0 * jnp.pi
    )
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)
