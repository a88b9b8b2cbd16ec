"""Checkpoint store + serialization round-trip tests."""

import numpy as np
import jax
import jax.numpy as jnp

from pingpong_tpu.checkpoint.serialize import (
    params_from_dict,
    qnet_rnn_to_dict,
    qnet_to_dict,
)
from pingpong_tpu.checkpoint.store import (
    is_checkpoint,
    list_checkpoints,
    load_checkpoint,
    save_checkpoint,
)
from pingpong_tpu.models import qnet_init, qnet_rnn_init
from pingpong_tpu.selfplay.pool import load_params_any, load_pool


def tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_roundtrip_qnet(tmp_path):
    params = qnet_init(jax.random.PRNGKey(0))
    payload = {
        "params_b": qnet_to_dict(params),
        "epsilon": 0.25,
        "episode": 1234,
        "generation": 3,
        "model_kind": "qnet",
    }
    p = save_checkpoint(tmp_path / "model5-3", payload)
    assert is_checkpoint(p)
    loaded = load_checkpoint(p)
    assert loaded["epsilon"] == 0.25
    assert loaded["episode"] == 1234
    tree_equal(params, params_from_dict(loaded["params_b"]))


def test_roundtrip_qnet_rnn(tmp_path):
    params = qnet_rnn_init(jax.random.PRNGKey(0), lstm_layers=2)
    payload = {"params_b": qnet_rnn_to_dict(params), "model_kind": "qnet_rnn"}
    save_checkpoint(tmp_path / "rnn_1", payload)
    loaded = load_checkpoint(tmp_path / "rnn_1")
    restored = params_from_dict(loaded["params_b"])
    tree_equal(params, restored)
    assert len(restored.lstm) == 2


def test_rnn_no_shared_head_roundtrip(tmp_path):
    params = qnet_rnn_init(jax.random.PRNGKey(1), head_hidden_dim=0)
    save_checkpoint(tmp_path / "r", {"params_b": qnet_rnn_to_dict(params)})
    restored = params_from_dict(load_checkpoint(tmp_path / "r")["params_b"])
    assert restored.shared is None
    tree_equal(params, restored)


def test_atomic_overwrite(tmp_path):
    params = qnet_init(jax.random.PRNGKey(0))
    save_checkpoint(tmp_path / "m", {"params_b": qnet_to_dict(params), "v": 1})
    save_checkpoint(tmp_path / "m", {"params_b": qnet_to_dict(params), "v": 2})
    assert load_checkpoint(tmp_path / "m")["v"] == 2


def test_overwrite_cleans_old_and_survives_stale_old(tmp_path):
    """save keeps one valid checkpoint at all times: a leftover .old from a
    crashed previous save must not break the next save, and no .old remains
    after a successful one."""
    params = qnet_init(jax.random.PRNGKey(0))
    save_checkpoint(tmp_path / "m", {"params_b": qnet_to_dict(params), "v": 1})
    # simulate a crash that left the previous checkpoint parked aside
    import shutil

    shutil.copytree(tmp_path / "m", tmp_path / "m.old")
    save_checkpoint(tmp_path / "m", {"params_b": qnet_to_dict(params), "v": 2})
    assert load_checkpoint(tmp_path / "m")["v"] == 2
    assert not (tmp_path / "m.old").exists()


def test_pool_loading_and_fault_skip(tmp_path):
    q1 = qnet_init(jax.random.PRNGKey(0))
    q2 = qnet_init(jax.random.PRNGKey(1))
    r1 = qnet_rnn_init(jax.random.PRNGKey(2))
    save_checkpoint(tmp_path / "model5-1", {"params_b": qnet_to_dict(q1)})
    save_checkpoint(tmp_path / "model5-2_fault", {"params_b": qnet_to_dict(q2)})
    save_checkpoint(tmp_path / "rnn_pong_soul_1", {"params_b": qnet_rnn_to_dict(r1)})
    (tmp_path / "junk").mkdir()

    # QNet pool: faults included (ref train_iterative.py:199-207)
    pool_q = load_pool(tmp_path, kind="qnet")
    assert len(pool_q) == 2
    # RNN pool: faults skipped (ref train_rnn_iterative.py:610)
    pool_r = load_pool(tmp_path, kind="qnet_rnn", skip_fault=True)
    assert len(pool_r) == 1

    # key chain: params_b missing -> params_a fallback
    save_checkpoint(tmp_path / "legacy", {"params_a": qnet_to_dict(q1)})
    p = load_params_any(tmp_path / "legacy")
    tree_equal(p, q1)


def test_list_checkpoints_ignores_noncheckpoints(tmp_path):
    assert list_checkpoints(tmp_path / "missing") == []
    save_checkpoint(tmp_path / "a", {"x": 1})
    (tmp_path / "not_ckpt").mkdir()
    assert [p.name for p in list_checkpoints(tmp_path)] == ["a"]
