"""Forward speed-of-light experiments (round 5): quantify the sample-budget
straggler tail and A/B candidate kernel changes on the flagship config.

Usage: python scripts/exp_fwd.py [--tail] [--bench] [--spp N]

--tail: run the megakernel with debug_iters instrumentation and report, per
tile, the while-loop trip count (the per-tile occupancy bound: a tile sweeps
until its LAST lane exhausts its samples) vs the executed lane-iterations
(the actual work). ideal trips = events / (rs*128); the tail ratio
trips/ideal is the upper bound a work-conserving respawn could recover.
"""
from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import rayz_tpu as rt
from rayz_tpu.ops import megakernel as mk

WIDTH = HEIGHT = 512
DEPTH = 32


def tail(spp: int) -> None:
    scene, cam = rt.scenes.random_bouncing(width=WIDTH, height=HEIGHT)
    rs = 16
    out = jax.jit(lambda s: mk._trace_shard(
        scene, cam, s, 0, WIDTH * HEIGHT, spp=spp, max_depth=DEPTH,
        t_min=1e-3, jitter=True, tile_sublanes=rs, unroll=8,
        interpret=False, debug_iters=True))(jnp.int32(1))
    out = np.asarray(jax.device_get(out))  # [n_px, 3]; g=trips, b=lane events
    lanes = rs * 128
    n_tiles = WIDTH * HEIGHT // lanes
    per_tile = out[:, 1].reshape(n_tiles, lanes)[:, 0]
    events = out[:, 2].reshape(n_tiles, lanes).sum(axis=1)
    ideal = events / lanes
    ratio = per_tile / ideal
    print(f"spp={spp} tiles={n_tiles}")
    print(f"trips  : mean={per_tile.mean():.1f} min={per_tile.min():.0f} "
          f"max={per_tile.max():.0f}")
    print(f"ideal  : mean={ideal.mean():.1f}")
    print(f"tail ratio trips/ideal: mean={ratio.mean():.3f} "
          f"median={np.median(ratio):.3f} max={ratio.max():.3f}")
    print(f"whole-render trips sum={per_tile.sum():.0f} "
          f"ideal sum={ideal.sum():.1f} -> upper-bound speedup "
          f"{per_tile.sum() / ideal.sum():.3f}x")
    # predicted schedule if slots were sorted by their true demand (oracle
    # sort): per-tile trips = max over the tile's sorted lanes
    lane_ev = out[:, 2]
    cur = per_tile.sum()
    oracle = np.sort(lane_ev)[::-1].reshape(n_tiles, lanes).max(axis=1)
    print(f"oracle-sorted trips sum={oracle.sum():.0f} "
          f"({cur / oracle.sum():.3f}x over current)")

    # independent realization (different seed) = the best mean-estimate a
    # pilot could converge to (sorting key noise ~ sigma/sqrt(spp))
    out2 = np.asarray(jax.device_get(jax.jit(lambda s: mk._trace_shard(
        scene, cam, s, 0, WIDTH * HEIGHT, spp=spp, max_depth=DEPTH,
        t_min=1e-3, jitter=True, tile_sublanes=rs, unroll=8,
        interpret=False, debug_iters=True))(jnp.int32(2))))
    est_full = out2[:, 2]

    rng = np.random.default_rng(0)

    def schedule(slot_demand, order=None):
        """Total trips of a tiling over slots (optionally permuted)."""
        if order is not None:
            slot_demand = slot_demand[order]
        nt = slot_demand.shape[0] // lanes
        return slot_demand.reshape(nt, lanes).max(axis=1).sum()

    for which, est in (("mean-sort(full indep seed)", est_full),
                       ("pilot2", rng.binomial(lane_ev.astype(np.int64),
                                               2 / spp))):
        order = np.argsort(est)[::-1]
        print(f"{which}: trips={schedule(lane_ev, order):.0f} "
              f"({cur / schedule(lane_ev, order):.3f}x)")

    # G-way split: each pixel's spp spread over G adjacent slots
    # (multinomial split approximates random sample->slot assignment)
    for G in (4, 8, 16):
        split = rng.multinomial(
            lane_ev.astype(np.int64),
            np.full(G, 1.0 / G))  # [n_px, G]
        slots = split.reshape(-1).astype(np.float64)  # pixel-major adjacency
        base = schedule(slots)
        print(f"G={G} row-major: trips={base:.0f} ({cur / base:.3f}x)")
        est_slots = np.repeat(est_full, G) / G
        order = np.argsort(est_slots)[::-1]
        s = schedule(slots, order)
        print(f"G={G} + mean-sort: trips={s:.0f} ({cur / s:.3f}x)")
        est_p2 = np.repeat(rng.binomial(lane_ev.astype(np.int64), 2 / spp),
                           G)
        order = np.argsort(est_p2)[::-1]
        s = schedule(slots, order)
        print(f"G={G} + pilot2-sort: trips={s:.0f} ({cur / s:.3f}x)")

    # multi-pass compaction: cap each pass's trips, gather unfinished slots
    # densely, resume. Acts on REALIZED demand (no estimator noise).
    def compacted(slot_demand, budgets):
        d = slot_demand.copy().astype(np.float64)
        total = 0.0
        for b in budgets:
            nt = max(1, -(-d.shape[0] // lanes))
            pad = nt * lanes - d.shape[0]
            if pad > 0:
                d = np.concatenate([d, np.zeros(pad)])
            tile_max = d.reshape(nt, lanes).max(axis=1)
            total += np.minimum(tile_max, b).sum() if b else tile_max.sum()
            if not b:
                return total, 0
            d = np.maximum(d - b, 0.0)
            d = d[d > 0]
            if d.size == 0:
                return total, 0
        return total, d.size

    for G in (1, 2, 4, 8):
        if G == 1:
            slots = lane_ev.astype(np.float64)
        else:
            slots = rng.multinomial(lane_ev.astype(np.int64),
                                    np.full(G, 1.0 / G)).reshape(-1) * 1.0
        mean_slot = slots.mean()  # per-slot mean demand
        best = None
        for alphas in ((1.2,), (1.0,), (1.2, 2.0), (1.0, 1.5),
                       (0.8, 1.2), (1.0, 1.0, 1.0), (0.8, 1.0, 1.5),
                       (1.2, 1.5, 2.0), (0.8, 0.8, 0.8),
                       (1.0, 1.5, 2.0, 3.0), (0.8, 1.0, 1.2, 1.5),
                       (0.6,) * 6, (0.5,) * 8, (0.4,) * 10, (0.3,) * 14,
                       (0.2,) * 20, (0.6, 0.6, 0.8, 1.0, 1.5),
                       (0.4, 0.4, 0.6, 0.8, 1.2, 2.0)):
            budgets = tuple(int(np.ceil(mean_slot * a)) for a in alphas) + (0,)
            t, left = compacted(slots, budgets)
            if best is None or t < best[0]:
                best = (t, budgets)
        t, budgets = best
        print(f"G={G} best compaction budgets={budgets}: trips={t:.0f} "
              f"({cur / t:.3f}x)")

    # trajectory for candidate fixed schedules (G=1): per-pass active counts
    slots = lane_ev.astype(np.float64)
    for B, P in ((43, 20), (64, 12), (85, 8), (107, 6), (32, 26)):
        d = slots.copy()
        traj = []
        total = 0.0
        for p in range(P):
            nt = -(-d.shape[0] // lanes)
            dd = np.concatenate([d, np.zeros(nt * lanes - d.shape[0])])
            tile_max = dd.reshape(nt, lanes).max(axis=1)
            total += np.minimum(tile_max, B).sum()
            d = np.maximum(d - B, 0.0)
            d = d[d > 0]
            traj.append(d.size)
            if d.size == 0:
                break
        if d.size:
            nt = -(-d.shape[0] // lanes)
            dd = np.concatenate([d, np.zeros(nt * lanes - d.shape[0])])
            total += dd.reshape(nt, lanes).max(axis=1).sum()
        print(f"B={B} P={P}: trips={total:.0f} ({cur / total:.3f}x) "
              f"active traj={traj}")


def bench(spp: int, runs: int = 5, **kw) -> float:
    scene, cam = rt.scenes.random_bouncing(width=WIDTH, height=HEIGHT)
    cfg = rt.RenderConfig(spp=spp, max_depth=DEPTH, t_min=1e-3)
    rays = WIDTH * HEIGHT * spp

    def run(seed):
        kw.setdefault("tile_sublanes", 16)
        kw.setdefault("unroll", 8)
        return jax.device_get(mk.render_pallas(scene, cam, seed, cfg, **kw))

    run(0)
    vals = []
    for seed in range(1, runs + 1):
        st = time.perf_counter()
        run(seed)
        vals.append(rays / (time.perf_counter() - st) / 1e6)
    print(f"kw={kw} spp={spp}: best={max(vals):.2f} "
          f"median={statistics.median(vals):.2f} Mrays/s")
    return statistics.median(vals)


if __name__ == "__main__":
    spp = 64
    if "--spp" in sys.argv:
        spp = int(sys.argv[sys.argv.index("--spp") + 1])
    if "--tail" in sys.argv:
        tail(spp)
    if "--bench" in sys.argv:
        bench(spp)
