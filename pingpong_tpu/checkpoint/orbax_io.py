"""Orbax-backed full-train-state checkpointing.

The light npz store (:mod:`pingpong_tpu.checkpoint.store`) covers model /
metadata checkpoints that tournaments and pools consume. This module
covers the heavyweight case the SURVEY §5 plan assigns to Orbax: the
ENTIRE jitted train state — replay buffer included (up to GBs) — saved
sharding-aware and restored onto the same mesh layout, for mid-generation
crash recovery at scale (the reference's ``latest_rnn_training_state.pth``
autosave, ``/root/reference/scripts/train_rnn_iterative.py:630-667``,
without the host-RAM round trip).

The train-state pytrees are NamedTuples; Orbax serializes them by leaf
order via ``jax.tree_util``, and restore rebuilds against a template state
produced by the learner's ``init_state`` — so layout/mesh placement comes
from the template, not the checkpoint.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_train_state(path, state: Any, metadata: Optional[dict] = None) -> str:
    """Save a full train-state pytree (+ JSON-able metadata) via Orbax."""
    import json

    path = Path(path).resolve()
    if path.exists():
        import shutil

        shutil.rmtree(path)
    leaves = jax.tree_util.tree_leaves(state)
    _checkpointer().save(path, leaves)
    if metadata is not None:
        with open(path / "framework_meta.json", "w") as f:
            json.dump(metadata, f)
    return str(path)


def restore_train_state(path, template: Any) -> Any:
    """Restore into the structure (and shardings) of ``template``."""
    path = Path(path).resolve()
    template_leaves = jax.tree_util.tree_leaves(template)
    restored = _checkpointer().restore(path, item=template_leaves)
    treedef = jax.tree_util.tree_structure(template)
    leaves = [
        jax.device_put(np.asarray(r), t.sharding)
        if hasattr(t, "sharding") else jax.numpy.asarray(r)
        for r, t in zip(restored, template_leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_metadata(path) -> Optional[dict]:
    import json

    meta = Path(path) / "framework_meta.json"
    if meta.is_file():
        with open(meta) as f:
            return json.load(f)
    return None


def is_train_state_checkpoint(path) -> bool:
    return (Path(path) / "framework_meta.json").is_file() or (
        Path(path).is_dir() and any(Path(path).iterdir())
    )
