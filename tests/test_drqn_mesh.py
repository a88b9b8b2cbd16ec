"""DRQN learner SPMD over the 8-virtual-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from pingpong_tpu.config import DRQNConfig, EnvConfig
from pingpong_tpu.config.schema import MeshConfig
from pingpong_tpu.parallel.mesh import create_mesh
from pingpong_tpu.train.drqn import DRQNLearner, stack_rnn_opponents

ENV = EnvConfig(max_episode_steps=100)


def test_sharded_drqn_iteration():
    mesh = create_mesh(MeshConfig())
    cfg = DRQNConfig(
        feature_dim=32, lstm_hidden_dim=16, head_hidden_dim=16,
        trace_length=4, num_envs=16, rollout_length=16,
        updates_per_iteration=2, batch_size=8,
        min_episodes_for_training_start=1, ring_len=256, pool_max=2,
        target_update_interval=8, max_episode_steps=100,
    )
    learner = DRQNLearner(ENV, cfg, mesh=mesh)
    state = learner.shard_state(learner.init_state(jax.random.PRNGKey(0)))
    assert state.env_state.ball_x.sharding.spec == P("data")
    assert state.buffer.data.sharding.spec == P("data")
    assert state.hid_b.h.sharding.spec == P(None, "data")
    params_a = learner.init_params(jax.random.PRNGKey(1))
    opp, n = stack_rnn_opponents(params_a, [])
    for _ in range(3):
        state, m = learner.train_iteration(state, opp, jnp.int32(n))
    assert int(m.env_steps) == 16 * 16
    assert np.isfinite(float(m.mean_loss))
    assert int(state.buffer.ep_count) >= 0


def test_sharded_drqn_matches_unsharded_numerics():
    cfg = DRQNConfig(
        feature_dim=32, lstm_hidden_dim=16, head_hidden_dim=16,
        trace_length=4, num_envs=16, rollout_length=16,
        updates_per_iteration=2, batch_size=8,
        min_episodes_for_training_start=1, ring_len=256, pool_max=2,
        target_update_interval=8, max_episode_steps=100,
        # shard_mapped Pallas rollout: PRNG keyed by GLOBAL tile id —
        # numerics match single-device exactly when the tiling matches
        pallas_tile_rows=2,
    )
    params0 = None

    def run(mesh):
        learner = DRQNLearner(ENV, cfg, mesh=mesh)
        nonlocal params0
        if params0 is None:
            params0 = learner.init_params(jax.random.PRNGKey(7))
        state = learner.init_state(jax.random.PRNGKey(0), params0)
        if mesh is not None:
            state = learner.shard_state(state)
        opp, n = stack_rnn_opponents(params0, [])
        for _ in range(2):
            state, m = learner.train_iteration(state, opp, jnp.int32(n))
        return jax.device_get(state.params_b), jax.device_get(m)

    p_single, m_single = run(None)
    p_shard, m_shard = run(create_mesh(MeshConfig()))
    assert int(m_single.episodes) == int(m_shard.episodes)
    for a, b in zip(
        jax.tree_util.tree_leaves(p_single), jax.tree_util.tree_leaves(p_shard)
    ):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


def test_multichip_fused_drqn_update_matches_single_chip():
    """Fused DRQN update block on a >1-device mesh (replicated-learner
    SPMD, train/drqn.py design note): sequence ring replicates, the
    global window sample and kernel run identically on every chip
    (VERDICT r3 item 1)."""
    from pingpong_tpu.ops.drqn_update import supports_pallas_update

    cfg = DRQNConfig(
        feature_dim=32, lstm_hidden_dim=16, head_hidden_dim=16,
        trace_length=4, num_envs=16, rollout_length=16,
        updates_per_iteration=2, batch_size=64,
        min_episodes_for_training_start=0, ring_len=256, pool_max=2,
        target_update_interval=8, max_episode_steps=100,
        pallas_tile_rows=2,
    )
    assert supports_pallas_update(cfg)
    params0 = None

    def run(mesh):
        learner = DRQNLearner(ENV, cfg, mesh=mesh)
        learner._pallas_update_ok = True
        learner._pallas_interpret = True
        nonlocal params0
        if params0 is None:
            params0 = learner.init_params(jax.random.PRNGKey(1))
        state = learner.init_state(jax.random.PRNGKey(0), params0)
        if mesh is not None:
            state = learner.shard_state(state)
            assert state.buffer.data.sharding.spec == P()  # replicated ring
            assert state.env_state.ball_x.sharding.spec == P("data")
        opp, n = stack_rnn_opponents(params0, [])
        for _ in range(3):
            state, m = learner.train_iteration(state, opp, jnp.int32(n))
        return jax.device_get(state), jax.device_get(m)

    s_single, m_single = run(None)
    s_shard, m_shard = run(create_mesh(MeshConfig()))
    assert int(s_shard.train_steps) == int(s_single.train_steps) > 0
    assert int(m_single.episodes) == int(m_shard.episodes)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(s_single.params_b)),
        jax.tree_util.tree_leaves(jax.device_get(s_shard.params_b)),
    ):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)
