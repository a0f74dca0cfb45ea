"""Headline benchmark: forward AND forward+backward Mrays/s on the RTIOW
final scene at the real BASELINE config.

Config 3 of BASELINE.json: ~500 random spheres (80% moving), 512x512, 64 spp,
depth 32 — the reference's own live scene (/root/reference/src/rayz.zig:45-168).

* ``fwd``: the fused Pallas megakernel (rayz_tpu/ops/megakernel.py).
* ``fwdbwd``: ``jax.value_and_grad`` of the pixel-L2 loss through the
  record/replay differentiable renderer (rayz_tpu/ops/diffkernel.py) — one
  full forward render plus scene-parameter gradients (sphere centers/radii,
  albedos, fuzz, IOR).

The ray metric matches the reference's self-reported counter (rayz.zig:26-34):
one ray per pixel-sample (camera rays) divided by wall-clock.

Timing note: on the tunneled TPU platform ``block_until_ready`` returns before
execution finishes, so the sync point is ``jax.device_get`` of the result
(which a real renderer/trainer needs on the host anyway). Best of three runs,
compile excluded.

Prints ONE JSON line:
  {"metric": "fwd_mrays_per_s", "value": N, "unit": "Mrays/s",
   "vs_baseline": N, "fwd_mrays_per_s": N, "fwdbwd_mrays_per_s": N, ...}

vs_baseline: the reference publishes no numbers (BASELINE.md) and no Zig
toolchain exists in this image, so the baseline is an ESTIMATE (flagged in the
JSON) of the reference's single-threaded CPU throughput at this config:
~1.0 Mrays/s (camera rays; ~1 us/ray for a ~500-sphere BVH path trace —
consistent with the us/ray line the reference prints on a modern core).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

import rayz_tpu as rt
from rayz_tpu.diff import extract_params, pixel_loss

REFERENCE_BASELINE_MRAYS = 1.0  # documented ESTIMATE, see module docstring

WIDTH = 512
HEIGHT = 512
SPP = 64
DEPTH = 32


def _best_of(fn, seeds=(1, 2, 3)) -> float:
    best = float("inf")
    for seed in seeds:
        st = time.perf_counter()
        fn(seed)
        best = min(best, time.perf_counter() - st)
    return best


def main() -> None:
    scene, camera = rt.scenes.random_bouncing(width=WIDTH, height=HEIGHT)
    config = rt.RenderConfig(spp=SPP, max_depth=DEPTH, t_min=1e-3)
    rays = HEIGHT * WIDTH * SPP

    # ---- forward: fused Pallas megakernel ----
    def run_fwd(seed: int):
        return jax.device_get(
            rt.render_fast(scene, camera, seed, config, engine="auto"))

    run_fwd(0)  # compile once outside the timed region
    fwd_mrays = rays / _best_of(run_fwd) / 1e6

    # ---- forward+backward: grad of pixel L2 through record/replay ----
    # Microbatched gradient accumulation: one spp=MICRO graph reused
    # SPP/MICRO times per measurement (standard large-batch training shape;
    # also keeps each device call short for the tunneled platform, whose RPC
    # dies on multi-ten-second executions).
    MICRO = 8
    micro_cfg = rt.RenderConfig(spp=MICRO, max_depth=DEPTH, t_min=1e-3)
    target = jax.device_put(run_fwd(0))
    params = extract_params(scene)
    grad_fn = jax.jit(
        jax.value_and_grad(pixel_loss),
        static_argnames=("config", "engine"))

    def run_fwdbwd(seed: int):
        key = jax.random.PRNGKey(seed)
        total = None
        for i in range(SPP // MICRO):
            loss, g = grad_fn(params, scene, camera,
                              jax.random.fold_in(key, i), target,
                              micro_cfg, "recorded")
            total = g if total is None else jax.tree_util.tree_map(
                jnp.add, total, g)
        return jax.device_get((loss, total))

    run_fwdbwd(0)  # compile
    fwdbwd_mrays = rays / _best_of(run_fwdbwd) / 1e6

    print(json.dumps({
        "metric": "fwd_mrays_per_s",
        "value": round(fwd_mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(fwd_mrays / REFERENCE_BASELINE_MRAYS, 3),
        "fwd_mrays_per_s": round(fwd_mrays, 3),
        "fwdbwd_mrays_per_s": round(fwdbwd_mrays, 3),
        "config": f"random_bouncing {WIDTH}x{HEIGHT} {SPP}spp d{DEPTH}",
        "baseline_note": ("vs_baseline divides by an ESTIMATED ~1.0 Mrays/s "
                          "single-thread CPU reference (no published numbers, "
                          "no Zig toolchain in image)"),
    }))


if __name__ == "__main__":
    main()
