"""Headline benchmark: forward AND forward+backward Mrays/s on the RTIOW
final scene at the real BASELINE config.

Config 3 of BASELINE.json: ~500 random spheres (80% moving), 512x512, 64 spp,
depth 32 — the reference's own live scene (/root/reference/src/rayz.zig:45-168).

* ``fwd``: the fused Pallas megakernel (rayz_tpu/ops/megakernel.py).
* ``fwdbwd``: ``jax.value_and_grad`` of the pixel-L2 loss through the
  persistent-path record/replay renderer (rayz_tpu/ops/pathrec.py) — one
  full forward render plus scene-parameter gradients (sphere centers/radii,
  albedos, fuzz, IOR). The recording's iteration budget is exact at this
  config (leftover == 0, asserted below before timing).

The ray metric matches the reference's self-reported counter (rayz.zig:26-34):
one ray per pixel-sample (camera rays) divided by wall-clock.

Timing note: on the tunneled TPU platform ``block_until_ready`` returns before
execution finishes, so the sync point is ``jax.device_get`` of the result
(which a real renderer/trainer needs on the host anyway). Each metric reports
best / median / stdev over RUNS runs (compile excluded) plus the exact engine
knobs used, so the number is auditable against PERF.md and across rounds
(round-2 verdict: the platform is noisy; the spread is now part of the
artifact).

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
import statistics
import time

import jax
import jax.numpy as jnp

import rayz_tpu as rt
from rayz_tpu.diff import extract_params, pixel_loss
from rayz_tpu.ops.megakernel import _resolve_blk, use_global_materials

REFERENCE_BASELINE_MRAYS = 1.0  # documented ESTIMATE, see module docstring

WIDTH = 512
HEIGHT = 512
SPP = 64
DEPTH = 32
RUNS = 5
TILE_SUBLANES = 16
UNROLL = 8
TREE = True


def _measure(fn, runs=RUNS):
    """Per-run wall-clock seconds (different seeds; compile done by caller)."""
    times = []
    for seed in range(1, runs + 1):
        st = time.perf_counter()
        fn(seed)
        times.append(time.perf_counter() - st)
    return times


def _stats(times, rays):
    mrays = sorted(rays / t / 1e6 for t in times)
    return {
        "best": round(mrays[-1], 3),
        "median": round(statistics.median(mrays), 3),
        "stdev": round(statistics.pstdev(mrays), 3),
        "runs": len(mrays),
    }


def main() -> None:
    scene, camera = rt.scenes.random_bouncing(width=WIDTH, height=HEIGHT)
    config = rt.RenderConfig(spp=SPP, max_depth=DEPTH, t_min=1e-3)
    rays = HEIGHT * WIDTH * SPP
    knobs = {
        "tile_sublanes": TILE_SUBLANES,
        "unroll": UNROLL,
        "tree": TREE,
        "culling_blk": _resolve_blk(scene, None, 64),
        "gm": use_global_materials(scene),
        # straggler-compacted respawn (round 5): render_pallas defaults
        "compact_budget": SPP,
        "compact_passes": 10,
    }

    # ---- forward: fused Pallas megakernel ----
    def run_fwd(seed: int):
        return jax.device_get(rt.render_fast(
            scene, camera, seed, config, engine="auto",
            tile_sublanes=TILE_SUBLANES, unroll=UNROLL, tree=TREE))

    run_fwd(0)  # compile once outside the timed region
    fwd_stats = _stats(_measure(run_fwd), rays)
    fwd_mrays = fwd_stats["best"]

    # The persistent-path recording must COMPLETE every sample within its
    # iteration budget at this config, or the fwdbwd number would measure a
    # cheaper (truncated) estimator. Asserted, not assumed.
    from rayz_tpu.ops.pathrec import render_diff_pp

    # ---- forward+backward: grad of pixel L2 through record/replay ----
    # Microbatched gradient accumulation: one spp=MICRO graph reused
    # SPP/MICRO times per measurement (standard large-batch training shape;
    # also keeps each device call short for the tunneled platform, whose RPC
    # dies on multi-ten-second executions). MICRO=32 amortizes the
    # compaction passes best (measured 13.4 @ spp8 vs 18.1 @ spp32).
    MICRO = 32
    micro_cfg = rt.RenderConfig(spp=MICRO, max_depth=DEPTH, t_min=1e-3)
    target = jax.device_put(run_fwd(0))
    params = extract_params(scene)
    grad_fn = jax.jit(
        jax.value_and_grad(pixel_loss),
        static_argnames=("config", "engine"))

    _, leftover = render_diff_pp(scene, camera, 0, micro_cfg,
                                 return_leftover=True)
    leftover = int(jax.device_get(leftover))
    assert leftover == 0, (
        "straggler-compaction schedule truncated "
        f"{leftover} samples; raise iters")

    def run_fwdbwd(seed: int):
        key = jax.random.PRNGKey(seed)
        total = None
        for i in range(SPP // MICRO):
            loss, g = grad_fn(params, scene, camera,
                              jax.random.fold_in(key, i), target,
                              micro_cfg, "recorded-pp")
            total = g if total is None else jax.tree_util.tree_map(
                jnp.add, total, g)
        return jax.device_get((loss, total))

    run_fwdbwd(0)  # compile
    fwdbwd_stats = _stats(_measure(run_fwdbwd), rays)
    fwdbwd_mrays = fwdbwd_stats["best"]

    print(json.dumps({
        "metric": "fwd_mrays_per_s",
        "value": fwd_mrays,
        "unit": "Mrays/s",
        "vs_baseline": round(fwd_mrays / REFERENCE_BASELINE_MRAYS, 3),
        "fwd_mrays_per_s": fwd_mrays,
        "fwdbwd_mrays_per_s": fwdbwd_mrays,
        "fwd_stats": fwd_stats,
        "fwdbwd_stats": fwdbwd_stats,
        "engine_knobs": knobs,
        "fwdbwd_engine": "recorded-pp",
        "fwdbwd_leftover": leftover,
        "config": f"random_bouncing {WIDTH}x{HEIGHT} {SPP}spp d{DEPTH}",
        "baseline_note": ("vs_baseline divides by an ESTIMATED ~1.0 Mrays/s "
                          "single-thread CPU reference (no published numbers, "
                          "no Zig toolchain in image)"),
    }))


if __name__ == "__main__":
    main()
