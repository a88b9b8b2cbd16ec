"""Checkpoint retention/GC (checkpoint/retention.py) and soft-target
updates (DQNConfig.target_tau / DRQNConfig.target_tau).

The reference never deletes checkpoints and only hard-syncs targets
(/root/reference/scripts/train_iterative.py:167-168); both features are
framework additions defaulting to reference-parity OFF.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pingpong_tpu.checkpoint.retention import apply_retention
from pingpong_tpu.checkpoint.store import save_checkpoint
from pingpong_tpu.config.schema import DQNConfig, DRQNConfig, EnvConfig


def _mk(ckpt_dir, name):
    save_checkpoint(ckpt_dir / name, {"x": np.zeros(3), "generation": 0})


def test_retention_keeps_newest_promoted(tmp_path):
    for g in range(6):
        _mk(tmp_path, f"model5-{g}")
    deleted = apply_retention(tmp_path, keep_promoted=2)
    assert sorted(deleted) == [f"model5-{g}" for g in range(4)]
    left = sorted(p.name for p in tmp_path.iterdir())
    assert left == ["model5-4", "model5-5"]


def test_retention_fault_class_and_protect(tmp_path):
    for g in range(3):
        _mk(tmp_path, f"rnn_pong_soul_{g}")
        _mk(tmp_path, f"rnn_pong_soul_{g}_fault")
    _mk(tmp_path, "latest_rnn_training_state")
    _mk(tmp_path, "warm_start")
    deleted = apply_retention(
        tmp_path, keep_promoted=1, keep_faults=1, protect=["warm_start"]
    )
    left = sorted(p.name for p in tmp_path.iterdir())
    # newest of each class, the autosave, and the protected name survive
    assert left == [
        "latest_rnn_training_state",
        "rnn_pong_soul_2",
        "rnn_pong_soul_2_fault",
        "warm_start",
    ]
    assert len(deleted) == 4


def test_retention_zero_keeps_all(tmp_path):
    for g in range(4):
        _mk(tmp_path, f"model5-{g}")
    assert apply_retention(tmp_path, keep_promoted=0, keep_faults=0) == []
    assert len(list(tmp_path.iterdir())) == 4


def _env_cfg():
    return EnvConfig(max_episode_steps=128)


def test_dqn_soft_target_updates_every_step():
    from pingpong_tpu.train.dqn import DQNLearner, stack_opponents
    from pingpong_tpu.models import qnet_init

    def run(tau):
        cfg = DQNConfig(num_envs=32, rollout_length=32,
                        updates_per_iteration=4, batch_size=16,
                        memory_size=4096, target_update_interval=10_000,
                        target_tau=tau, use_pallas_rollout=False,
                        use_pallas_eval=False)
        learner = DQNLearner(_env_cfg(), cfg)
        state = learner.init_state(jax.random.PRNGKey(0))
        opp, n = stack_opponents(qnet_init(jax.random.PRNGKey(1)), [], 0)
        for _ in range(4):
            state, m = learner.train_iteration(state, opp, jnp.int32(n))
        return state

    hard = run(0.0)
    soft = run(0.01)
    assert int(hard.train_steps) > 0
    # hard: interval never hit -> target still equals the initial copy of B
    h0 = jax.flatten_util.ravel_pytree(hard.target_b)[0]
    s0 = jax.flatten_util.ravel_pytree(soft.target_b)[0]
    hb = jax.flatten_util.ravel_pytree(hard.params_b)[0]
    assert not np.allclose(np.asarray(h0), np.asarray(hb))
    # soft target must have moved toward the online net
    assert not np.allclose(np.asarray(s0), np.asarray(h0))


def test_drqn_soft_target_matches_manual_polyak():
    from pingpong_tpu.train.drqn import DRQNLearner, stack_rnn_opponents

    tau = 0.05
    cfg = DRQNConfig(num_envs=16, rollout_length=64,
                     updates_per_iteration=2, batch_size=8,
                     ring_len=256, trace_length=4,
                     min_episodes_for_training_start=1,
                     feature_dim=16, lstm_hidden_dim=16, head_hidden_dim=16,
                     target_update_interval=10_000, target_tau=tau,
                     use_pallas_rollout=False)
    learner = DRQNLearner(_env_cfg(), cfg)
    params = learner.init_params(jax.random.PRNGKey(0))
    state = learner.init_state(jax.random.PRNGKey(1), params)
    opp, n = stack_rnn_opponents(params, [])
    for _ in range(6):
        state, m = learner.train_iteration(state, opp, jnp.int32(n))
    assert int(state.train_steps) > 0
    t = jax.flatten_util.ravel_pytree(state.target_b)[0]
    b = jax.flatten_util.ravel_pytree(state.params_b)[0]
    p0 = jax.flatten_util.ravel_pytree(params)[0]
    # target strictly between the initial weights and the online net
    assert not np.allclose(np.asarray(t), np.asarray(p0))
    assert not np.allclose(np.asarray(t), np.asarray(b))
    # and closer to init than B is (tau small, few updates)
    assert float(jnp.linalg.norm(t - p0)) < float(jnp.linalg.norm(b - p0))


def test_selfplay_retention_wired(tmp_path):
    """End-to-end: QNet loop with keep_checkpoints=1 leaves only the
    newest promoted generation on disk."""
    from pingpong_tpu.selfplay.loop import QNetSelfPlay
    from pingpong_tpu.config.schema import SelfPlayConfig
    from pingpong_tpu.utils.metrics import MetricsLogger

    cfg = DQNConfig(
        num_envs=16, rollout_length=32, updates_per_iteration=2,
        batch_size=16, memory_size=2048, pool_max=4,
        keep_checkpoints=1, save_latest_checkpoint_interval_steps=0,
        use_pallas_rollout=False, use_pallas_eval=False,
        selfplay=SelfPlayConfig(
            max_generations=3, episodes_per_generation=4,
            eval_episodes=8, curr_win_threshold=0.0,
            pool_win_threshold=0.0, win_rate_interval=4,
            max_retries_for_generation=1,
        ),
    )
    loop = QNetSelfPlay(_env_cfg(), cfg, workdir=str(tmp_path),
                        logger=MetricsLogger())
    records = loop.run()
    assert len(records) == 3 and all(r.promoted for r in records)
    names = sorted(p.name for p in (tmp_path / "checkpoints").iterdir())
    assert names == ["model5-3"]
