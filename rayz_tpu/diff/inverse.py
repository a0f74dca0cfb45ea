"""Inverse rendering: recover scene parameters by gradient descent on pixels.

The reference is forward-only; differentiability is this framework's headline
extension (BASELINE.json north star + config 5: recover albedo and sphere
positions of a 100-sphere scene via Adam on pixel L2). The renderer's scan
integrator is reverse-mode differentiable end to end: gradients flow through
hit distances (the quadratic roots are smooth in center/radius), hit points,
scatter attenuation (textures/albedo), and the sky; discrete events (hit/miss
boundaries, checker parity, Schlick coin flips, metal absorption) contribute
zero gradient almost everywhere — correct a.e., noisy exactly at silhouettes
(SURVEY.md §7 "hard parts", documented acceptance).

Data-parallel training: pixels sharded over the mesh, scene/params replicated,
per-device partial losses/grads ``psum``-reduced — the psum is XLA-scheduled to
overlap with the backward sweep.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from ..models.camera import Camera
from ..models.scene import Scene
from ..ops.diffkernel import render_diff
from ..ops.integrator import RenderConfig, render, _pixel_grid
from ..parallel.mesh import _render_shard

__all__ = [
    "DEFAULT_TRAINABLE",
    "extract_params",
    "inject_params",
    "pixel_loss",
    "make_train_step",
    "fit",
]

# Differentiable scene leaves (SURVEY.md §7 delta #1): geometry, albedo,
# roughness, IOR.
DEFAULT_TRAINABLE = (
    "sphere_center",
    "sphere_radius",
    "tex_color",
    "mat_fuzz",
    "mat_ior",
)


def extract_params(scene: Scene, fields: Sequence[str] = DEFAULT_TRAINABLE) -> Dict[str, jnp.ndarray]:
    return {f: getattr(scene, f) for f in fields}


def inject_params(scene: Scene, params: Dict[str, jnp.ndarray]) -> Scene:
    return scene.replace(**params)


def pixel_loss(params, scene: Scene, camera: Camera, key, target,
               config: RenderConfig, engine: str = "dense"):
    """Mean squared pixel error of a fresh stochastic render vs target.

    ``engine``: "dense" differentiates through the full scan integrator
    (any scene; O(R*N) backward); "recorded" uses the Pallas record +
    O(R) XLA replay estimator (:func:`rayz_tpu.ops.render_diff`) — the
    fast path for sphere scenes at benchmark sizes.
    """
    fitted = inject_params(scene, params)
    if engine == "recorded":
        img = render_diff(fitted, camera, key, config)
    else:
        img = render(fitted, camera, key, config)
    return jnp.mean((img - target.reshape(img.shape)) ** 2)


def make_train_step(optimizer: optax.GradientTransformation, config: RenderConfig,
                    mesh: Optional[Mesh] = None, engine: str = "dense"):
    """Build a jitted Adam/SGD step: (params, opt_state, scene, camera, key,
    target) -> (params, opt_state, loss).

    With a mesh, pixels+target are sharded across devices, each device
    renders + backprops its shard, and the parameter gradient is psum-reduced
    (replicated params, data-parallel pixels).
    """
    if mesh is None:

        @jax.jit
        def step(params, opt_state, scene, camera, key, target):
            loss, grads = jax.value_and_grad(pixel_loss)(
                params, scene, camera, key, target, config, engine
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step

    axis = mesh.axis_names[0]

    def _loss_grad_shard(params, scene, camera, key, px, py, tgt, weight):
        def local_loss(p):
            img = _render_shard(
                inject_params(scene, p), camera, key, px, py, config, axis
            )
            return jnp.sum(weight[:, None] * (img - tgt) ** 2)

        l, g = jax.value_and_grad(local_loss)(params)
        return jax.lax.psum(l, axis), jax.lax.psum(g, axis)

    sharded_lg = _shard_map(
        _loss_grad_shard,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
    )

    @jax.jit
    def step(params, opt_state, scene, camera, key, target):
        h, w = camera.height, camera.width
        px, py = _pixel_grid(camera)
        tgt = target.reshape(h * w, 3)
        n_px = h * w
        n_dev = mesh.size
        shard = -(-n_px // n_dev)
        pad = shard * n_dev - n_px
        weight = jnp.ones((n_px,), dtype=tgt.dtype)
        if pad:
            px = jnp.concatenate([px, jnp.zeros((pad,), px.dtype)])
            py = jnp.concatenate([py, jnp.zeros((pad,), py.dtype)])
            tgt = jnp.concatenate([tgt, jnp.zeros((pad, 3), tgt.dtype)])
            # padding pixels render real values but must not contribute loss
            # or gradient — weight them to zero.
            weight = jnp.concatenate([weight, jnp.zeros((pad,), weight.dtype)])
        loss_sum, grads = sharded_lg(params, scene, camera, key, px, py, tgt, weight)
        loss = loss_sum / (n_px * 3)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def fit(scene: Scene, camera: Camera, target, *, config: RenderConfig,
        steps: int = 200, learning_rate: float = 1e-2,
        fields: Sequence[str] = DEFAULT_TRAINABLE,
        mesh: Optional[Mesh] = None, key=None,
        callback=None, engine: str = "dense") -> Tuple[Scene, list]:
    """Run Adam on pixel L2 against ``target``; returns (fitted scene,
    loss history). ``engine`` as in :func:`pixel_loss` (single-device path;
    the mesh path always differentiates the dense per-shard renderer)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    params = extract_params(scene, fields)
    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)
    step_fn = make_train_step(optimizer, config, mesh, engine=engine)
    history = []
    for i in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step_fn(params, opt_state, scene, camera, sub, target)
        history.append(float(loss))
        if callback is not None:
            callback(i, float(loss), params)
    return inject_params(scene, params), history
