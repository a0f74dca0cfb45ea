"""Block-culling / streaming scaling benchmark (run on the real TPU).

Renders the ``sphere_field`` stress scene at several primitive counts with
culling forced OFF (brute-force O(N) sphere loop) and ON (Morton-sorted
blocks behind tile-wide bound tests), recording forward Mrays/s for each.
Above the SMEM budget (~16k primitives in gm mode) the megakernel streams
Morton-sorted table chunks from HBM with resident per-chunk bounds (round
3) — unbounded N; each row records whether it streamed. This is the scaling
capability the reference gets from its BVH
(/root/reference/src/hit.zig:101-217); note the prior alternative for >16k
scenes, the chunked XLA integrator, OOMs outright at 64k/512px (a
[262144, 64128] f32 intermediate).

Writes one JSON object per line to stdout and (with --out) a JSON file.
"""

from __future__ import annotations

import argparse
import json
import time

import sys

sys.path.insert(0, ".")

import jax

import rayz_tpu as rt
from rayz_tpu.ops.megakernel import render_pallas


SEEDS = (1, 2, 3, 4, 5)  # round-4 verdict #4: 5 runs per row


def _time_fn(run, seeds=SEEDS):
    """(best, median) seconds over seeds; compile excluded."""
    run(0)
    times = []
    for s in seeds:
        t0 = time.perf_counter()
        run(s)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[0], times[len(times) // 2]


def time_render(scene, camera, config, culling: bool, seeds=SEEDS):
    def run(seed):
        return jax.device_get(render_pallas(scene, camera, seed, config,
                                            culling=culling))

    return _time_fn(run, seeds)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--spp", type=int, default=16)
    p.add_argument("--depth", type=int, default=8)
    p.add_argument("--counts", type=int, nargs="+",
                   default=[512, 2048, 10000, 16000, 64000, 100000])
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()

    results = []
    for n in args.counts:
        scene, camera = rt.scenes.sphere_field(n, width=args.width)
        config = rt.RenderConfig(spp=args.spp, max_depth=args.depth,
                                 t_min=1e-3)
        rays = camera.width * camera.height * args.spp
        from rayz_tpu.ops.megakernel import fits_smem
        row = {"n_spheres": n, "width": args.width, "spp": args.spp,
               "depth": args.depth, "streamed": not fits_smem(scene),
               "seeds": len(SEEDS)}
        for mode in (False, True):
            best, med = time_render(scene, camera, config, culling=mode)
            key = "culling_on" if mode else "brute_force"
            row[key] = round(rays / best / 1e6, 3)
            row[key + "_median"] = round(rays / med / 1e6, 3)
        row["speedup"] = round(row["culling_on"] / row["brute_force"], 2)
        # wavefront engine (sorted per-bounce coherence; the auto choice
        # for streamed scenes — see ops/engine.pick_engine)
        from rayz_tpu.ops.wavefront import render_wavefront

        def run_wf(seed):
            return jax.device_get(render_wavefront(scene, camera, seed,
                                                   config))

        best, med = _time_fn(run_wf)
        row["wavefront"] = round(rays / best / 1e6, 3)
        row["wavefront_median"] = round(rays / med / 1e6, 3)
        row["best_speedup"] = round(
            max(row["culling_on"], row["wavefront"]) / row["brute_force"], 2)
        print(json.dumps(row), flush=True)
        results.append(row)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"unit": "Mrays/s", "rows": results,
                       "knobs": "render_pallas/render_wavefront defaults "
                                "(compact respawn ON at spp>=16; wavefront "
                                "tile_sublanes per-regime; supercluster "
                                "hierarchy in streamed mode)"}, f, indent=1)


if __name__ == "__main__":
    main()
