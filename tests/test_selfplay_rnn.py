"""DRQN self-play loop tests: promotion, fault, pool append, 3-tier restore."""

import dataclasses

import jax
import numpy as np

from pingpong_tpu.config import DRQNConfig, EnvConfig
from pingpong_tpu.config.schema import SelfPlayConfig
from pingpong_tpu.checkpoint.store import is_checkpoint, list_checkpoints
from pingpong_tpu.selfplay.loop_rnn import DRQNSelfPlay
from pingpong_tpu.utils.metrics import MetricsLogger

ENV = EnvConfig(max_episode_steps=100)


def tiny_cfg(**sp_kw):
    sp = dict(
        max_generations=2,
        episodes_per_generation=6,
        eval_episodes=8,
        max_retries_for_generation=2,
        win_rate_interval=8,
        opponent_pool_ratio=0.4,
    )
    sp.update(sp_kw)
    return DRQNConfig(
        selfplay=SelfPlayConfig(**sp),
        feature_dim=32,
        lstm_hidden_dim=16,
        head_hidden_dim=16,
        trace_length=4,
        num_envs=8,
        rollout_length=16,
        updates_per_iteration=2,
        batch_size=8,
        min_episodes_for_training_start=1,
        ring_len=256,
        pool_max=4,
        target_update_interval=16,
        max_episode_steps=100,
        save_latest_checkpoint_interval_steps=4,
    )


def test_promotion_appends_pool_and_autosaves(tmp_path):
    cfg = tiny_cfg(curr_win_threshold=0.0, pool_win_threshold=0.0)
    d = DRQNSelfPlay(ENV, cfg, workdir=str(tmp_path), seed=0,
                     logger=MetricsLogger(echo=False))
    records = d.run()
    assert len(records) == 2 and all(r.promoted for r in records)
    # runtime pool got both generations (ref appends on success)
    assert len(d.pool) == 2
    names = {p.name for p in list_checkpoints(tmp_path / "checkpoints_rnn")}
    assert {"rnn_pong_soul_1", "rnn_pong_soul_2"} <= names
    # the full-state autosave is Orbax-format (buffer included), so it is
    # invisible to the npz pool loader by construction
    from pingpong_tpu.checkpoint.orbax_io import is_train_state_checkpoint

    assert is_train_state_checkpoint(
        tmp_path / "checkpoints_rnn" / "latest_rnn_training_state"
    )
    assert "latest_rnn_training_state" not in names


def test_fault_keeps_buffer_and_resets_b(tmp_path):
    cfg = tiny_cfg(max_generations=1, curr_win_threshold=1.1,
                   pool_win_threshold=1.1, max_retries_for_generation=2)
    d = DRQNSelfPlay(ENV, cfg, workdir=str(tmp_path), seed=0,
                     logger=MetricsLogger(echo=False))
    records = d.run()
    assert not records[0].promoted
    names = {p.name for p in list_checkpoints(tmp_path / "checkpoints_rnn")}
    assert "rnn_pong_soul_1_fault" in names
    # buffer kept after reset (ref keeps memory across attempts)
    assert int(d.state.buffer.ep_count) > 0
    assert float(d.state.epsilon) == 1.0
    # B was reset to A
    for a, b in zip(
        jax.tree_util.tree_leaves(d.state.params_b),
        jax.tree_util.tree_leaves(d.params_a),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tier1_restore_resumes_counters(tmp_path):
    cfg = tiny_cfg(curr_win_threshold=0.0, pool_win_threshold=0.0,
                   max_generations=1)
    d1 = DRQNSelfPlay(ENV, cfg, workdir=str(tmp_path), seed=0,
                      logger=MetricsLogger(echo=False))
    d1.run()
    eps = int(d1.state.episodes)
    steps = int(d1.state.train_steps)
    from pingpong_tpu.checkpoint.orbax_io import is_train_state_checkpoint

    assert is_train_state_checkpoint(
        tmp_path / "checkpoints_rnn" / "latest_rnn_training_state"
    )

    d2 = DRQNSelfPlay(ENV, cfg, workdir=str(tmp_path), seed=1,
                      logger=MetricsLogger(echo=False))
    assert int(d2.state.episodes) == eps
    assert int(d2.state.train_steps) == steps
    assert d2.done_generations == 1
    # fault ckpts excluded but promoted gen loaded into pool
    assert len(d2.pool) == 1


def test_tier1_mid_generation_resume_keeps_b(tmp_path):
    """A mid-generation autosave must resume the in-flight generation with
    the restored B — not reset B<-A via new_generation (advisor finding)."""
    cfg = tiny_cfg(curr_win_threshold=0.0, pool_win_threshold=0.0,
                   max_generations=2)
    d1 = DRQNSelfPlay(ENV, cfg, workdir=str(tmp_path), seed=0,
                      logger=MetricsLogger(echo=False))
    # simulate an interrupted generation 2: train a bit, autosave mid-gen
    d1.current_generation = 2
    d1.done_generations = 1
    d1._train_block(4)
    d1.autosave(wait=True)
    b_saved = jax.device_get(d1.state.params_b)
    steps_saved = int(d1.state.train_steps)

    d2 = DRQNSelfPlay(ENV, cfg, workdir=str(tmp_path), seed=1,
                      logger=MetricsLogger(echo=False))
    assert d2._resumed_mid_generation
    assert d2.current_generation == 2 and d2.done_generations == 1
    # restored B is bit-identical to the autosaved in-flight B
    for a, b in zip(
        jax.tree_util.tree_leaves(b_saved),
        jax.tree_util.tree_leaves(jax.device_get(d2.state.params_b)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    records = d2.run()
    # generation label 2 continued (not skipped to 3)
    assert records[0].generation == 2
    # run() must not have clobbered the restored progress at entry: the
    # restored train-step counter keeps advancing from where it was
    assert int(d2.state.train_steps) > steps_saved


def test_tier2_restore_from_init_path(tmp_path):
    cfg = tiny_cfg(curr_win_threshold=0.0, pool_win_threshold=0.0,
                   max_generations=1)
    d1 = DRQNSelfPlay(ENV, cfg, workdir=str(tmp_path), seed=0,
                      logger=MetricsLogger(echo=False))
    d1.run()
    # remove the latest-state ckpt so tier 1 misses, point tier 2 at gen 1
    import shutil

    shutil.rmtree(tmp_path / "checkpoints_rnn" / "latest_rnn_training_state")
    cfg2 = dataclasses.replace(
        cfg, init_model_path_rnn="checkpoints_rnn/rnn_pong_soul_1"
    )
    d2 = DRQNSelfPlay(ENV, cfg2, workdir=str(tmp_path), seed=2,
                      logger=MetricsLogger(echo=False))
    assert d2.done_generations == 0
    # params came from the checkpoint (A == stored params_a)
    for a, b in zip(
        jax.tree_util.tree_leaves(d2.params_a),
        jax.tree_util.tree_leaves(d1.params_a),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
