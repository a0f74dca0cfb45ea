"""Multi-host setup and per-host image assembly.

The reference is a single process (SURVEY.md §2: no threads, no processes, no
networking). The TPU-native multi-host story: ``jax.distributed.initialize``
joins the processes, the global 1-D mesh spans every chip in the slice, the
same ``render_sharded``/``make_train_step`` code runs SPMD on each host, and
``assemble_global_image`` materializes the full image on host 0 for writing.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from .mesh import make_mesh

__all__ = ["initialize", "is_primary_host", "global_mesh", "assemble_global_image"]


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the multi-host job (no-op for single-process runs).

    Arguments default to JAX's environment auto-detection (TPU pods populate
    them from the metadata server / launcher env).
    """
    if jax.process_count() > 1:
        return  # already initialized by the launcher
    kw = {}
    if coordinator_address is not None:
        kw.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        jax.distributed.initialize(**kw)


def is_primary_host() -> bool:
    return jax.process_index() == 0


def global_mesh():
    """1-D mesh over every addressable chip in the slice (all hosts)."""
    return make_mesh(jax.devices())


def assemble_global_image(img) -> Optional[np.ndarray]:
    """Gather a (possibly sharded) device image to host 0 as numpy;
    returns None on other hosts."""
    from jax.experimental import multihost_utils

    if jax.process_count() > 1:
        img = multihost_utils.process_allgather(img, tiled=False)
        # process_allgather returns the full array on every host; only host 0
        # should write it.
        if not is_primary_host():
            return None
        return np.asarray(img)
    return np.asarray(img)
