"""Decompose the fwd+bwd pass cost on the real TPU (round-3 item 1 prework).

Measures, per spp-1 pass at 512x512 d32 on the flagship scene:
  raygen+rand | record kernel | replay fwd | replay fwd+bwd | one-hot matmul
Prints a JSON dict. Sync point = jax.device_get of a scalar reduction (the
tunneled platform's block_until_ready returns early, and fetching large
tensors over the tunnel would swamp the timing).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

import rayz_tpu as rt
from rayz_tpu.diff import extract_params, inject_params
from rayz_tpu.models.camera import generate_rays
from rayz_tpu.ops.integrator import _pixel_grid
from rayz_tpu.ops.diffkernel import (
    _make_rand, record_paths, replay_paths, _diff_tables)

W = H = 512
DEPTH = 32
T_MIN = 1e-3


import sys


def timeit(fn, *args, n=3, tag=""):
    print(f"[compile {tag}]", file=sys.stderr, flush=True)
    jax.device_get(fn(*args))  # compile
    print(f"[run {tag}]", file=sys.stderr, flush=True)
    best = float("inf")
    for _ in range(n):
        st = time.perf_counter()
        jax.device_get(fn(*args))
        best = min(best, time.perf_counter() - st)
    return best


def main():
    scene, camera = rt.scenes.random_bouncing(width=W, height=H)
    px, py = _pixel_grid(camera)
    r = W * H
    key = jax.random.PRNGKey(0)

    @jax.jit
    def raygen(key):
        k_cam, k_mat = jax.random.split(key)
        o, d, tm = generate_rays(camera, px, py, k_cam)
        rand = _make_rand(k_mat, DEPTH, r, camera.dtype)
        return jnp.sum(o) + jnp.sum(d) + jnp.sum(tm) + jnp.sum(rand)

    t_raygen = timeit(raygen, key, tag="raygen")

    @jax.jit
    def make_inputs(key):
        k_cam, k_mat = jax.random.split(key)
        o, d, tm = generate_rays(camera, px, py, k_cam)
        rand = _make_rand(k_mat, DEPTH, r, camera.dtype)
        return o, d, tm, rand

    o, d, tm, rand = jax.block_until_ready(make_inputs(key))

    rec = jax.jit(lambda o, d, tm, rand: jnp.sum(record_paths(
        scene, o, d, tm, rand, max_depth=DEPTH, t_min=T_MIN)))
    t_record = timeit(rec, o, d, tm, rand, tag="record")

    reci = jax.jit(lambda o, d, tm, rand: record_paths(
        scene, o, d, tm, rand, max_depth=DEPTH, t_min=T_MIN))
    idx = jax.block_until_ready(reci(o, d, tm, rand))

    rep = jax.jit(lambda o, d, tm, rand, idx: jnp.sum(replay_paths(
        scene, o, d, tm, rand, idx, t_min=T_MIN)))
    t_replay_f = timeit(rep, o, d, tm, rand, idx, tag="replay_f")

    params = extract_params(scene)

    def loss(params, o, d, tm, rand, idx):
        fitted = inject_params(scene, params)
        return jnp.sum(replay_paths(fitted, o, d, tm, rand, idx, t_min=T_MIN))

    gfn = jax.jit(lambda *a: jax.tree_util.tree_reduce(
        lambda c, g: c + jnp.sum(g), jax.grad(loss)(*a), 0.0))
    t_replay_fb = timeit(gfn, params, o, d, tm, rand, idx, tag="replay_fb")

    # one-hot matmul in isolation (the replay's per-bounce gather), depth x
    tab = _diff_tables(scene)

    @jax.jit
    def oh_gather(idx, tab):
        def step(c, i):
            oh = jax.nn.one_hot(jnp.maximum(i, 0), tab.shape[0],
                                dtype=tab.dtype)
            return c + jnp.sum(oh @ tab), None
        c, _ = jax.lax.scan(step, 0.0, idx)
        return c

    t_onehot = timeit(oh_gather, idx, tab, tag="onehot")

    # one-hot fwd+transpose (the bwd's scatter-add as transposed matmul)
    @jax.jit
    def oh_pair(idx, tab):
        def step(c, i):
            oh = jax.nn.one_hot(jnp.maximum(i, 0), tab.shape[0],
                                dtype=tab.dtype)
            rows = oh @ tab
            dtab = oh.T @ rows
            return c + jnp.sum(dtab), None
        c, _ = jax.lax.scan(step, 0.0, idx)
        return c

    t_ohpair = timeit(oh_pair, idx, tab, tag="ohpair")

    print(json.dumps({
        "raygen_rand_ms": round(t_raygen * 1e3, 2),
        "record_ms": round(t_record * 1e3, 2),
        "replay_fwd_ms": round(t_replay_f * 1e3, 2),
        "replay_fwdbwd_ms": round(t_replay_fb * 1e3, 2),
        "onehot_fwd_ms": round(t_onehot * 1e3, 2),
        "onehot_pair_ms": round(t_ohpair * 1e3, 2),
        "tab_shape": list(tab.shape),
    }))


if __name__ == "__main__":
    main()
