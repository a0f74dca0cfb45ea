"""Render-engine dispatch: fused Pallas megakernel vs pure-XLA integrator.

Two implementations of the same renderer (SURVEY.md §7 stage 5 keeps the XLA
path as the reference oracle):

* ``"pallas"`` — :func:`rayz_tpu.ops.megakernel.render_pallas`: the fused
  forward path (spheres and triangles), fastest on TPU; not differentiable.
* ``"xla"`` — :func:`rayz_tpu.ops.integrator.render`: the reference oracle
  (also handles arbitrarily nested textures) and the reverse-mode
  differentiable path; inverse rendering always uses this.
* ``"auto"`` — pallas when the backend is a TPU and the scene qualifies,
  otherwise xla.
"""

from __future__ import annotations

import jax

from .integrator import RenderConfig, render_jit
from .megakernel import (fits_smem, fits_stream, is_prng_key, render_pallas,
                         supports_scene)

__all__ = ["render_fast", "pick_engine"]


def pick_engine(scene, engine: str = "auto") -> str:
    """Resolve an engine name ("auto" -> "pallas"|"xla"). Scenes whose
    tables exceed the SMEM budget (~16k primitives) run the megakernel's
    STREAMED mode (tables in HBM, chunked DMA — unbounded N); only scenes
    too large even for streaming (~50M primitives) fall back to xla."""
    if engine == "auto":
        on_tpu = jax.default_backend() in ("tpu", "axon")
        return "pallas" if (on_tpu and supports_scene(scene)
                            and (fits_smem(scene) or fits_stream(scene))) \
            else "xla"
    if engine not in ("pallas", "xla"):
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
    if not is_prng_key(key):
        key = jax.random.PRNGKey(key)  # accept plain integer seeds too
    return render_jit(scene, camera, key, config)
