"""Empirical inputs for PERF.md's roofline accounting (run on real TPU).

Measures the forward megakernel's wall time on the flagship scene while
sweeping (a) max_depth (marginal cost per bounce + straggler tail) and
(b) padded sphere count (marginal cost per sphere-iteration), from which the
achieved VPU element-op rate is derived.
"""

from __future__ import annotations

import json
import time

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import rayz_tpu as rt
from rayz_tpu.ops.megakernel import render_pallas

W, SPP = 512, 16


def timed(scene, camera, config, **kw) -> float:
    def run(seed):
        return jax.device_get(render_pallas(scene, camera, seed, config, **kw))
    run(0)
    best = float("inf")
    for s in (1, 2):
        t0 = time.perf_counter()
        run(s)
        best = min(best, time.perf_counter() - t0)
    return best


def pad_spheres(scene, n_pad: int):
    """Grow the padded sphere arrays (padding lanes never hit) to isolate the
    per-sphere-iteration cost."""
    cur = scene.sphere_radius.shape[0]
    extra = n_pad - cur
    assert extra >= 0
    pad1 = lambda a: jnp.concatenate([a, jnp.zeros((extra,) + a.shape[1:],
                                                   a.dtype)])
    return scene.replace(
        sphere_center=pad1(scene.sphere_center),
        sphere_velocity=pad1(scene.sphere_velocity),
        sphere_radius=pad1(scene.sphere_radius),
        sphere_material=pad1(scene.sphere_material),
        sphere_valid=jnp.concatenate(
            [scene.sphere_valid, jnp.zeros((extra,), bool)]),
    )


def bounce_counts() -> None:
    """Exact executed-bounce statistics (PERF.md cornell per-bounce-parity
    section): the wavefront engine's alive counters count one entry per
    (ray, bounce) executed — mean path length = sum / camera rays."""
    import numpy as np
    from rayz_tpu.ops import wavefront as wf

    for name in ("cornell_box", "random_bouncing"):
        scene, cam = rt.scenes.SCENES[name](width=512)
        _, counts = wf._render_wavefront_impl(
            scene, cam, jnp.asarray(1), spp=8, max_depth=32, t_min=1e-3,
            jitter=True, tile_sublanes=32, unroll=8, interpret=False,
            blk=64, stream=0, stream_cull=True, sort=True, debug_counts=True)
        c = np.asarray(jax.device_get(counts)).astype(float)
        print(f"{name}: camera rays={int(c[0])} "
              f"executed bounce-events={int(c.sum())} "
              f"mean path={c.sum() / c[0]:.2f}")


def main() -> None:
    if "--bounces" in sys.argv:
        bounce_counts()
        return
    scene, camera = rt.scenes.random_bouncing(width=W, height=W)
    rays = W * W * SPP
    out = {"width": W, "spp": SPP, "depth_sweep": [], "n_sweep": []}

    for depth in (1, 2, 4, 8, 16, 32):
        cfg = rt.RenderConfig(spp=SPP, max_depth=depth, t_min=1e-3)
        dt = timed(scene, camera, cfg)
        out["depth_sweep"].append({"depth": depth, "s": round(dt, 4),
                                   "mrays": round(rays / dt / 1e6, 2)})
        print(out["depth_sweep"][-1])

    cfg = rt.RenderConfig(spp=SPP, max_depth=8, t_min=1e-3)
    for n in (512, 1024, 2048):
        s = pad_spheres(scene, n)
        dt = timed(s, camera, cfg, culling=False)
        out["n_sweep"].append({"n_pad": n, "s": round(dt, 4),
                               "mrays": round(rays / dt / 1e6, 2)})
        print(out["n_sweep"][-1])

    with open("PERF_PROBE.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
