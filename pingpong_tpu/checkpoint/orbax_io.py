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


class AsyncAutosaver:
    """Background full-state autosave (SURVEY §5: *async* Orbax as the TPU
    equivalent of the reference's autosave,
    /root/reference/scripts/train_rnn_iterative.py:630-667).

    ``save()`` takes a device-side snapshot of the whole tree as ONE jitted
    copy program — a single async dispatch, sub-ms on the train loop's
    critical path — and hands the snapshot to a worker thread that fetches
    it to host and runs the atomic Orbax write. The snapshot copy is what
    makes this safe against the train loops' ``donate_argnums``: the next
    ``train_iteration`` invalidates the live state's buffers while the
    worker is still reading, so the worker must own independent buffers.

    At most one write is in flight; a new ``save()`` first joins the
    previous one (a no-op stall unless autosaves outpace disk). Crash
    semantics: a hard kill loses at most the one in-flight save — the
    previous checkpoint stays valid through the tmp/old swap in
    :func:`save_train_state` — exactly the reference's exposure window.
    Worker errors surface on the next ``save()``/``wait()``."""

    # transfer granularity of the background host fetch: one monolithic
    # device_get of a ~100MB state holds the device link (and, on the
    # axon tunnel, the dispatch path) for the whole transfer — measured
    # ~2s of train-loop stall per autosave. Fetching in slices bounded by
    # this many bytes lets the train loop's dispatches slip between
    # slices, cutting the induced stall to sub-ms.
    FETCH_SLICE_BYTES = 4 * 1024 * 1024

    def __init__(self):
        self._queue = None
        self._thread = None
        self._pending = 0
        self._lock = None
        self._done = None
        self._snap_fn = None
        self._error: Optional[BaseException] = None

    def _ensure_worker(self):
        import queue
        import threading

        if self._thread is not None:
            return
        self._queue = queue.Queue()
        self._lock = threading.Lock()
        self._done = threading.Condition(self._lock)

        def loop():
            while True:
                job = self._queue.get()
                if job is None:
                    return
                path, snapshot, metadata = job
                try:
                    host = self._fetch_sliced(snapshot)
                    save_train_state(path, host, metadata)
                except BaseException as e:  # pragma: no cover - surfaced later
                    self._error = e
                finally:
                    with self._done:
                        self._pending -= 1
                        self._done.notify_all()

        self._thread = threading.Thread(
            target=loop, name="pingpong-autosave", daemon=True
        )
        self._thread.start()

    @classmethod
    def _fetch_sliced(cls, snapshot: Any) -> Any:
        """Device->host fetch of the snapshot tree, one bounded slice at a
        time, yielding between slices so concurrent train-loop dispatches
        are not starved of the device link."""
        import time

        import numpy as np

        def fetch_leaf(x):
            nbytes = getattr(x, "nbytes", 0)
            if nbytes <= cls.FETCH_SLICE_BYTES or x.ndim == 0 or not x.shape[0]:
                out = np.asarray(jax.device_get(x))
                time.sleep(0)
                return out
            rows = max(
                1, int(x.shape[0] * cls.FETCH_SLICE_BYTES / nbytes)
            )
            parts = []
            for i in range(0, x.shape[0], rows):
                parts.append(np.asarray(jax.device_get(x[i: i + rows])))
                time.sleep(0)   # release the GIL between slices
            return np.concatenate(parts, axis=0)

        return jax.tree_util.tree_map(fetch_leaf, snapshot)

    def wait(self) -> None:
        """Block until all in-flight writes complete; re-raise any worker
        error."""
        if self._thread is not None:
            with self._done:
                while self._pending:
                    self._done.wait()
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def save(self, path, tree: Any, metadata: dict) -> str:
        import jax.numpy as jnp

        self.wait()   # at most one write in flight; surfaces prior errors
        self._ensure_worker()
        if self._snap_fn is None:
            # one program for the whole tree: one dispatch, not one per leaf
            self._snap_fn = jax.jit(
                lambda t: jax.tree_util.tree_map(jnp.copy, t)
            )
        snapshot = self._snap_fn(tree)
        with self._done:
            self._pending += 1
        self._queue.put((path, snapshot, metadata))
        return str(Path(path).resolve())


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
