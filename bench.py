"""Headline benchmark: forward Mrays/s on the RTIOW-final scene.

Config 3 of BASELINE.json: ~500 random spheres, 512x512, 64 spp, depth 32 —
the reference's own live scene (/root/reference/src/rayz.zig:45-168). The
metric matches the reference's self-reported counter (rayz.zig:26-34): one ray
per pixel-sample (camera rays), divided by render wall-clock.

Prints ONE JSON line:
  {"metric": "fwd_mrays_per_s", "value": N, "unit": "Mrays/s", "vs_baseline": N}

vs_baseline: the reference publishes no numbers (BASELINE.md) and no Zig
toolchain exists in this image, so the baseline is a documented estimate of
the reference's single-threaded CPU throughput at this config: ~1.0 Mrays/s
(camera rays; ~1 us per ray for a ~500-sphere BVH path trace at 64 spp /
depth 32 on a modern core — consistent with the us/ray the reference prints).
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
CHUNK = 128 * 512  # rays per chunk: bounds [chunk, n_spheres] live buffers


def main() -> None:
    scene, camera = rt.scenes.random_bouncing(width=WIDTH)
    config = rt.RenderConfig(spp=SPP, max_depth=DEPTH, t_min=1e-3, chunk_size=CHUNK)
    key = jax.random.PRNGKey(0)

    # compile once outside the timed region
    img = rt.render_jit(scene, camera, key, config)
    img.block_until_ready()

    st = time.perf_counter()
    img = rt.render_jit(scene, camera, jax.random.PRNGKey(1), config)
    img.block_until_ready()
    dur = time.perf_counter() - st

    rays = camera.height * camera.width * SPP
    mrays = rays / dur / 1e6
    print(json.dumps({
        "metric": "fwd_mrays_per_s",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / REFERENCE_BASELINE_MRAYS, 3),
    }))


if __name__ == "__main__":
    main()
