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
    """Save a full train-state pytree (+ JSON-able metadata) via Orbax.

    Atomic in the same keep-one-valid-copy sense as
    :func:`pingpong_tpu.checkpoint.store.save_checkpoint`: the tree is
    written to ``<name>.tmp-<pid>``, the previous checkpoint is parked at
    ``<name>.old`` while the new one swaps in, then dropped."""
    import json
    import os
    import shutil

    path = Path(path).resolve()
    tmp = path.with_name(path.name + f".tmp-{os.getpid()}")
    if tmp.exists():
        shutil.rmtree(tmp)
    leaves = jax.tree_util.tree_leaves(state)
    _checkpointer().save(tmp, leaves)
    if metadata is not None:
        with open(tmp / "framework_meta.json", "w") as f:
            json.dump(metadata, f)
    old = path.with_name(path.name + ".old")
    if old.exists():
        shutil.rmtree(old)
    if path.exists():
        os.replace(path, old)
    os.replace(tmp, path)
    if old.exists():
        shutil.rmtree(old)
    return str(path)


def restore_train_state(path, template: Any) -> Any:
    """Restore into the structure (and shardings) of ``template``.

    Shardings are passed to Orbax as restore args, so leaves land
    directly on the template's mesh placement (no host round trip and no
    "sharding info not provided" warning); a fallback path re-places via
    ``device_put`` if the installed Orbax rejects the restore args."""
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    template_leaves = jax.tree_util.tree_leaves(template)
    treedef = jax.tree_util.tree_structure(template)
    try:
        restore_args = [
            ocp.ArrayRestoreArgs(
                sharding=t.sharding, dtype=t.dtype, global_shape=t.shape
            )
            if hasattr(t, "sharding") else ocp.RestoreArgs()
            for t in template_leaves
        ]
        restored = _checkpointer().restore(
            path, item=template_leaves, restore_args=restore_args
        )
        return jax.tree_util.tree_unflatten(treedef, restored)
    except (TypeError, ValueError):
        restored = _checkpointer().restore(path, item=template_leaves)
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


def autosave_full_state(path, state: Any, params_a: Any, host_key,
                        metadata: dict) -> str:
    """One-call full autosave for the self-play loops: the ENTIRE train
    state (replay buffer included), the frozen opponent A, and the host
    PRNG key — everything needed for bit-compatible continuation after a
    crash (vs the reference's weights-only autosave,
    /root/reference/scripts/train_rnn_iterative.py:630-667)."""
    return save_train_state(path, (state, params_a, host_key), metadata)


def restore_full_state(path, template_state: Any, template_params: Any,
                       template_key):
    """Restore an :func:`autosave_full_state` checkpoint. Returns
    ``(state, params_a, host_key, metadata)``; raises on shape/tree
    mismatch (callers fall through to the next restore tier)."""
    state, params_a, host_key = restore_train_state(
        path, (template_state, template_params, template_key)
    )
    return state, params_a, host_key, (load_metadata(path) or {})
