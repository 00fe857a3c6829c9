"""Checkpoint / resume via Orbax.

Capability parity: the reference's Chainer ``serializers.save_npz /
load_npz`` of model params in examples (SURVEY.md §5.4). TPU-native build:
Orbax checkpointing of the learnable params + optimizer state; solver state
is stateless per step (warm starts travel as explicit ``u_init`` carries,
like the reference's ``prev_ctrl``).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save_checkpoint(path: str, state: Any, step: int, keep: int = 3) -> str:
    """Save a pytree ``state`` under ``path/step_<N>``; prunes old steps."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    ckpt_dir = os.path.join(path, f"step_{step}")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(ckpt_dir, state, force=True)

    steps = sorted(
        int(d.split("_", 1)[1])
        for d in os.listdir(path)
        if d.startswith("step_") and d.split("_", 1)[1].isdigit()
    )
    for old in steps[:-keep]:
        import shutil

        shutil.rmtree(os.path.join(path, f"step_{old}"), ignore_errors=True)
    return ckpt_dir


def latest_step(path: str) -> Optional[int]:
    if not os.path.isdir(path):
        return None
    steps = [
        int(d.split("_", 1)[1])
        for d in os.listdir(path)
        if d.startswith("step_") and d.split("_", 1)[1].isdigit()
    ]
    return max(steps) if steps else None


def restore_checkpoint(path: str, like: Any, step: Optional[int] = None) -> Any:
    """Restore the pytree saved at ``path/step_<N>`` (latest by default),
    with ``like`` providing the target structure/shapes."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if step is None:
        step = latest_step(path)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
    with ocp.StandardCheckpointer() as ckptr:
        target = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(jax.numpy.shape(x), x.dtype)
            if hasattr(x, "dtype")
            else x,
            like,
        )
        return ckptr.restore(os.path.join(path, f"step_{step}"), target)
