"""Headline benchmark: forward Mrays/s on the RTIOW-final scene.

Config 3 of BASELINE.json: ~500 random spheres (80% moving), 512x512, 64 spp,
depth 32 — the reference's own live scene (/root/reference/src/rayz.zig:45-168)
rendered by the fused Pallas megakernel (rayz_tpu/ops/megakernel.py). The
metric matches the reference's self-reported counter (rayz.zig:26-34): one ray
per pixel-sample (camera rays) divided by render wall-clock.

Timing note: on the tunneled TPU platform ``block_until_ready`` returns before
execution finishes, so the sync point is ``jax.device_get`` of the full image
(which a real renderer needs on the host anyway). Best of three runs,
compile excluded.

Prints ONE JSON line:
  {"metric": "fwd_mrays_per_s", "value": N, "unit": "Mrays/s", "vs_baseline": N}

vs_baseline: the reference publishes no numbers (BASELINE.md) and no Zig
toolchain exists in this image, so the baseline is a documented estimate of
the reference's single-threaded CPU throughput at this config: ~1.0 Mrays/s
(camera rays; ~1 us/ray for a ~500-sphere BVH path trace — consistent with
the us/ray line the reference prints on a modern core).
"""

from __future__ import annotations

import json
import time

import jax

import rayz_tpu as rt

REFERENCE_BASELINE_MRAYS = 1.0  # documented estimate, see module docstring

WIDTH = 512
SPP = 64
DEPTH = 32


def main() -> None:
    scene, camera = rt.scenes.random_bouncing(width=WIDTH)
    config = rt.RenderConfig(spp=SPP, max_depth=DEPTH, t_min=1e-3)

    def run(seed: int):
        return jax.device_get(
            rt.render_fast(scene, camera, seed, config, engine="auto"))

    run(0)  # compile once outside the timed region

    best = float("inf")
    for seed in (1, 2, 3):
        st = time.perf_counter()
        run(seed)
        best = min(best, time.perf_counter() - st)

    rays = camera.height * camera.width * SPP
    mrays = rays / best / 1e6
    print(json.dumps({
        "metric": "fwd_mrays_per_s",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / REFERENCE_BASELINE_MRAYS, 3),
    }))


if __name__ == "__main__":
    main()
