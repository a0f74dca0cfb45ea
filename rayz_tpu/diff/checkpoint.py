"""Optimizer/parameter checkpointing for inverse rendering (orbax-backed).

The reference has no checkpoint/resume (SURVEY.md §5); the analogue here is
saving the Adam state + trainable scene parameters so a fit can resume."""

from __future__ import annotations

import os
from typing import Any, Optional

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(directory: str, step: int, state: Any) -> str:
    """Save a pytree (params + opt_state + metadata) under
    ``directory/step_{step}``; returns the path."""
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    _checkpointer().save(path, state, force=True)
    return path


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_"):
            try:
                steps.append(int(name[5:]))
            except ValueError:
                pass
    return max(steps) if steps else None


def restore_checkpoint(directory: str, step: Optional[int] = None,
                       template: Any = None) -> Any:
    """Restore the pytree saved at ``step`` (default: latest)."""
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    if template is not None:
        import orbax.checkpoint as ocp

        return _checkpointer().restore(path, item=template)
    return _checkpointer().restore(path)
