"""Forward Mrays/s for every BASELINE.json render config (run on real TPU).

Configs (BASELINE.md): (1) two_sphere 256x256 4spp d8, (2) three_sphere
512x512 16spp d16, (3) random_bouncing 512x512 64spp d32, (4) cornell_box
512x512 64spp d32. Writes one JSON line per config and (with --out) a file.
"""

from __future__ import annotations

import argparse
import json
import time

import sys

sys.path.insert(0, ".")

import jax

import rayz_tpu as rt

CONFIGS = [
    ("two_sphere", dict(width=256, height=256), 4, 8),
    ("three_sphere", dict(width=512, height=512), 16, 16),
    ("random_bouncing", dict(width=512, height=512), 64, 32),
    ("cornell_box", dict(width=512, height=512), 64, 32),
]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()

    rows = []
    for name, kw, spp, depth in CONFIGS:
        scene, camera = rt.scenes.SCENES[name](**kw)
        config = rt.RenderConfig(spp=spp, max_depth=depth, t_min=1e-3)

        def run(seed):
            return jax.device_get(
                rt.render_fast(scene, camera, seed, config, engine="auto"))

        run(0)  # compile
        best = float("inf")
        for s in (1, 2, 3):
            t0 = time.perf_counter()
            run(s)
            best = min(best, time.perf_counter() - t0)
        rays = camera.width * camera.height * spp
        row = {"config": name, "width": camera.width,
               "height": camera.height, "spp": spp, "depth": depth,
               "fwd_mrays_per_s": round(rays / best / 1e6, 3)}
        print(json.dumps(row), flush=True)
        rows.append(row)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"unit": "Mrays/s", "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
