"""Per-ray BVH traversal experiment (round-3 verdict next-step #9).

PERF.md claims per-ray divergent BVH traversal is the wrong shape for a
SIMD machine — this measures it once so the claim is data. Setup: a real
median-split BVH (the reference's build, hit.zig:130-159, done host-side
in numpy) flattened to arrays; traversal = the reference's findHit
(hit.zig:181-216) as an explicit-stack `lax.while_loop` per ray, vmapped
over the ray batch. Under vmap, the while_loop runs in lockstep: every
iteration processes ALL rays at full vector width until the LAST ray's
stack empties — the SIMD divergence cost in its purest form. Compare with
the tile-coherent sweep engines on the same scene/camera (primary rays,
depth 1, the traversal-friendliest case).

Run on the real TPU:  python scripts/per_ray_traversal.py [--n 64000]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import rayz_tpu as rt
from rayz_tpu.ops.megakernel import render_pallas
from rayz_tpu.ops.wavefront import render_wavefront
from rayz_tpu.ops.integrator import _pixel_grid
from rayz_tpu.models.camera import generate_rays


def build_bvh(lo, hi):
    """Median-split BVH over leaf AABBs (hit.zig:130-159 semantics: sort
    the slice by bbox.low on the longest axis, split at the median, leaves
    hold <= 2 primitives). Flattened to arrays: node bbox lo/hi, children
    (negative = leaf range into the sorted primitive order)."""
    n = lo.shape[0]
    order = np.arange(n)
    nodes_lo, nodes_hi, left, right = [], [], [], []

    def rec(s, e):
        idx = len(nodes_lo)
        nodes_lo.append(None)
        nodes_hi.append(None)
        left.append(0)
        right.append(0)
        blo = lo[order[s:e]].min(axis=0)
        bhi = hi[order[s:e]].max(axis=0)
        nodes_lo[idx] = blo
        nodes_hi[idx] = bhi
        if e - s <= 2:
            left[idx] = -(s + 1)   # leaf: primitive range [s, e)
            right[idx] = -(e + 1)
            return idx
        axis = int(np.argmax(bhi - blo))
        seg = order[s:e]
        seg = seg[np.argsort(lo[seg, axis], kind="stable")]
        order[s:e] = seg
        m = (s + e) // 2
        left[idx] = rec(s, m)
        right[idx] = rec(m, e)
        return idx

    sys.setrecursionlimit(100000)
    rec(0, n)
    return (np.asarray(nodes_lo, np.float32), np.asarray(nodes_hi, np.float32),
            np.asarray(left, np.int32), np.asarray(right, np.int32), order)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=64000)
    p.add_argument("--width", type=int, default=512)
    args = p.parse_args()

    scene, cam = rt.scenes.sphere_field(args.n, width=args.width)
    c = np.asarray(scene.sphere_center, np.float32)
    r = np.asarray(scene.sphere_radius, np.float32)
    valid = np.asarray(scene.sphere_valid)
    c, r = c[valid], r[valid]
    lo = c - r[:, None]
    hi = c + r[:, None]
    t0 = time.perf_counter()
    nlo, nhi, lft, rgt, order = build_bvh(lo, hi)
    print(f"# BVH: {len(nlo)} nodes over {len(order)} spheres "
          f"(host build {time.perf_counter()-t0:.2f}s)")
    cs = jnp.asarray(c[order])
    rs = jnp.asarray(r[order])
    nlo_j, nhi_j = jnp.asarray(nlo), jnp.asarray(nhi)
    lft_j, rgt_j = jnp.asarray(lft), jnp.asarray(rgt)
    max_stack = 64

    def traverse_batch(o, d):
        """findHit (hit.zig:181-216) in explicit SIMD-lockstep form: every
        ray keeps its own stack; each loop iteration pops/processes one
        node PER RAY at full batch width, masked for finished rays, until
        the LAST ray's stack empties — exactly the machine cost a vmapped
        per-ray while_loop implies."""
        n_rays = o.shape[0]
        rows = jnp.arange(n_rays)
        inv = 1.0 / d
        dd = jnp.sum(d * d, axis=-1)

        def sphere_t(j, t_best, active):
            co = cs[j] - o
            half_b = jnp.sum(d * co, axis=-1)
            disc = half_b * half_b - dd * (jnp.sum(co * co, axis=-1)
                                           - rs[j] * rs[j])
            rt_ = jnp.sqrt(jnp.maximum(disc, 0.0))
            q1 = (half_b - rt_) / dd
            q2 = (half_b + rt_) / dd
            t = jnp.where(q1 >= 1e-3, q1, q2)
            ok = active & (disc > 0) & (t >= 1e-3) & (t < t_best)
            return jnp.where(ok, t, t_best)

        def body(state):
            stack, sp, t_best = state
            active = sp > 0
            spm = jnp.maximum(sp - 1, 0)
            node = stack[rows, spm]
            t1 = (nlo_j[node] - o) * inv
            t2 = (nhi_j[node] - o) * inv
            tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
            tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
            hit = active & (tmax > jnp.maximum(tmin, 1e-3)) & (tmin < t_best)
            lchild = lft_j[node]
            rchild = rgt_j[node]
            is_leaf = lchild < 0
            # leaves: test their <= 2 primitives
            s = jnp.clip(-lchild - 1, 0, len(order) - 1)
            leaf_hit = hit & is_leaf
            t_best = sphere_t(s, t_best, leaf_hit)
            t_best = sphere_t(jnp.minimum(s + 1, len(order) - 1), t_best,
                              leaf_hit & ((-rchild - 1) - s > 1))
            # inner hits: push both children (right replaces the popped
            # slot, left goes on top)
            push = hit & ~is_leaf
            stack = stack.at[rows, spm].set(
                jnp.where(push, rchild, stack[rows, spm]))
            top = jnp.minimum(spm + 1, max_stack - 1)
            stack = stack.at[rows, top].set(
                jnp.where(push, lchild, stack[rows, top]))
            sp = jnp.where(active, jnp.where(push, sp + 1, sp - 1), sp)
            return stack, sp, t_best

        stack0 = jnp.zeros((n_rays, max_stack), jnp.int32)
        sp0 = jnp.ones((n_rays,), jnp.int32)
        t0_ = jnp.full((n_rays,), 3e38, jnp.float32)
        _, _, t_best = jax.lax.while_loop(
            lambda st: jnp.any(st[1] > 0), body, (stack0, sp0, t0_))
        return t_best

    px, py = _pixel_grid(cam)
    o, d, _ = generate_rays(cam, px, py, jax.random.PRNGKey(0))
    o = o.astype(jnp.float32)
    d = d.astype(jnp.float32)
    f = jax.jit(traverse_batch)

    def run():
        return jax.device_get(f(o, d))

    run()
    best = min((lambda: (lambda t0: (run(), time.perf_counter() - t0)[1])(
        time.perf_counter()))() for _ in range(3))
    rays = o.shape[0]
    print(f"per-ray BVH (lockstep while_loop): {1000*best:.0f} ms -> "
          f"{rays/best/1e6:.3f} Mrays/s (primary rays only)")

    cfg = rt.RenderConfig(spp=1, max_depth=1, t_min=1e-3)

    def run_eng(fn):
        fn()
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    t_mk = run_eng(lambda: jax.device_get(
        render_pallas(scene, cam, 1, cfg)))
    print(f"persistent megakernel (depth 1, spp 1): {1000*t_mk:.0f} ms -> "
          f"{rays/t_mk/1e6:.3f} Mrays/s (full shading incl.)")
    t_wf = run_eng(lambda: jax.device_get(
        render_wavefront(scene, cam, 1, cfg, tile_sublanes=32)))
    print(f"wavefront (depth 1, spp 1): {1000*t_wf:.0f} ms -> "
          f"{rays/t_wf/1e6:.3f} Mrays/s (full shading incl.)")


if __name__ == "__main__":
    main()
