"""Render-engine dispatch: fused Pallas megakernel / wavefront / XLA.

Three implementations of the same renderer (SURVEY.md §7 stage 5 keeps the
XLA path as the reference oracle):

* ``"pallas"`` — :func:`rayz_tpu.ops.megakernel.render_pallas`: the fused
  persistent megakernel (spheres and triangles), fastest on TPU for scenes
  whose tables fit SMEM; not differentiable.
* ``"wavefront"`` — :func:`rayz_tpu.ops.wavefront.render_wavefront`:
  bounce-synchronous sorted-ray engine; fastest for LARGE streamed scenes
  (beyond the SMEM budget), where per-bounce ray coherence lets the
  supercluster/chunk/block bound tests prune (measured +73% at 64k and
  +92% at 100k primitives over the persistent streamed kernel, round-5
  CULLING_BENCH.json); not differentiable.
* ``"xla"`` — :func:`rayz_tpu.ops.integrator.render`: the reference oracle
  (also handles arbitrarily nested textures) and the reverse-mode
  differentiable path; inverse rendering always uses this.
* ``"auto"`` — on TPU: pallas for SMEM-resident scenes, wavefront for
  streamed ones, xla otherwise.
"""

from __future__ import annotations

import jax

from .integrator import RenderConfig, render_jit
from .megakernel import (fits_smem, fits_stream, is_prng_key, render_pallas,
                         supports_scene)

__all__ = ["render_fast", "pick_engine"]


def pick_engine(scene, engine: str = "auto") -> str:
    """Resolve an engine name ("auto" -> "pallas"|"wavefront"|"xla").
    Scenes whose tables exceed the SMEM budget (~16k primitives) run the
    wavefront engine (tables streamed from HBM, sorted-ray coherence —
    unbounded N); only scenes too large even for streaming (~50M
    primitives) fall back to xla."""
    if engine == "auto":
        on_tpu = jax.default_backend() in ("tpu", "axon")
        if not (on_tpu and supports_scene(scene)):
            return "xla"
        if fits_smem(scene):
            return "pallas"
        if fits_stream(scene):
            return "wavefront"
        return "xla"
    if engine not in ("pallas", "wavefront", "xla"):
        raise ValueError(f"unknown engine {engine!r}")
    return engine


def render_fast(scene, camera, key, config: RenderConfig = RenderConfig(),
                engine: str = "auto", **pallas_kw):
    """Render with the fastest applicable engine (forward only).

    Equivalent in distribution to :func:`rayz_tpu.render`; use that (the XLA
    path) when gradients are needed.
    """
    eng = pick_engine(scene, engine)
    if eng == "pallas":
        return render_pallas(scene, camera, key, config, **pallas_kw)
    if eng == "wavefront":
        from .wavefront import render_wavefront
        kw = {k: v for k, v in pallas_kw.items()
              if k in ("tile_sublanes", "unroll", "interpret", "culling",
                       "block_size", "stream", "sort") and v is not None}
        # tile_sublanes default (per-regime optimum) lives in
        # render_wavefront itself, so direct calls and dispatch run the
        # same kernel
        return render_wavefront(scene, camera, key, config, **kw)
    if not is_prng_key(key):
        key = jax.random.PRNGKey(key)  # accept plain integer seeds too
    return render_jit(scene, camera, key, config)
