"""Opponent-pool management.

Reference behavior being reproduced:

* QNet trainer loads every checkpoint in the ckpt dir into the pool at
  startup — including ``_fault`` ones — and never updates it at runtime
  (``/root/reference/scripts/train_iterative.py:199-207``);
* RNN trainer skips filenames containing ``"fault"`` and appends each
  successfully promoted generation to the runtime pool
  (``train_rnn_iterative.py:589-623, 855-859``).
"""

from __future__ import annotations

from typing import List, Optional

from pingpong_tpu.checkpoint.store import list_checkpoints, load_checkpoint
from pingpong_tpu.checkpoint.serialize import params_from_dict


def load_params_any(ckpt_path, prefer=("params_b", "params_a", "params")):
    """Key-chain fallback loader (the reference's ``modelB -> model`` chain,
    train_iterative.py:87; test_round_robin.py:136-150)."""
    payload = load_checkpoint(ckpt_path)
    for key in prefer:
        if key in payload and payload[key] is not None:
            return params_from_dict(payload[key])
    raise KeyError(f"no params under any of {prefer} in {ckpt_path}")


def load_pool(
    ckpt_dir,
    kind: str = "qnet",
    skip_fault: bool = False,
    limit: Optional[int] = None,
    exclude_names: tuple = ("latest",),
) -> List:
    """Load all compatible checkpoints in a directory as pool members.

    ``exclude_names``: substrings of checkpoint names to skip — by default
    the ``latest*`` full-state autosaves, which hold the in-training
    learner, not a frozen opponent. (The reference's RNN pool loader would
    sweep ``latest_rnn_training_state.pth`` into the pool,
    train_rnn_iterative.py:609-623 — a quirk we deliberately fix.)
    """
    members = []
    for path in list_checkpoints(ckpt_dir):
        if skip_fault and "fault" in path.name:
            continue
        if any(x in path.name for x in exclude_names):
            continue
        try:
            params = load_params_any(path)
        except (KeyError, ValueError):
            continue
        actual = "qnet_rnn" if type(params).__name__ == "QNetRNNParams" else "qnet"
        if actual != kind:
            continue
        members.append(params)
        if limit is not None and len(members) >= limit:
            break
    return members
