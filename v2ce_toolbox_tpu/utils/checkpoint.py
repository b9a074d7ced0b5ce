"""Orbax-based checkpointing for model/train state.

Replaces the reference's Lightning ModelCheckpoint + bare state_dict .pt
files (reference: train/main.py:22-29, v2ce.py:40) with orbax, the
TPU-native checkpoint library (async, sharding-aware).
"""

from __future__ import annotations

import os.path as op
from typing import Any, Optional

import jax


def save_checkpoint(path: str, tree: Any):
    """Save a pytree (e.g. flax variables or a TrainState) to `path`."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(op.abspath(path), tree)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Load a pytree saved by save_checkpoint. If `target` is given, the
    result matches its structure/shardings."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if target is None:
        return ckptr.restore(op.abspath(path))
    return ckptr.restore(op.abspath(path), target=target)


def best_or_last(ckpt_dir: str, prefer_best: bool = True) -> Optional[str]:
    """Resolve a checkpoint directory containing `best-*`/`last` entries to
    a concrete path (reference: train/scripts/utils/utils.py:73-111)."""
    import os
    import re

    if not op.isdir(ckpt_dir):
        return None
    entries = os.listdir(ckpt_dir)
    if prefer_best:
        best = [e for e in entries if e.startswith("best-")]
        if best:
            def epoch_of(e):
                m = re.search(r"epoch=(\d+)", e)
                return int(m.group(1)) if m else -1

            return op.join(ckpt_dir, max(best, key=epoch_of))
    if "last" in entries:
        return op.join(ckpt_dir, "last")
    return None
