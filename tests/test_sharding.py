"""Multi-chip sharding tests on the 8-virtual-device CPU mesh.

Validates the SPMD layout the driver's ``dryrun_multichip`` exercises:
env batch + replay sharded on ``data``, params replicated, one full train
iteration compiled and executed over the mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pingpong_tpu.config import DQNConfig, EnvConfig
from pingpong_tpu.config.schema import MeshConfig
from pingpong_tpu.models import qnet_init
from pingpong_tpu.parallel.mesh import create_mesh, data_sharding, shard_batch
from pingpong_tpu.train.dqn import DQNLearner, stack_opponents

ENV = EnvConfig(max_episode_steps=200)


def test_mesh_creation():
    mesh = create_mesh(MeshConfig())
    assert mesh.shape["data"] == 8
    assert mesh.shape["model"] == 1


def test_mesh_2x4():
    mesh = create_mesh(MeshConfig(num_data=4, num_model=2))
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2


def test_sharded_train_iteration_matches_semantics():
    mesh = create_mesh(MeshConfig())
    cfg = DQNConfig(
        num_envs=16,  # 2 envs per device
        rollout_length=8,
        updates_per_iteration=2,
        batch_size=16,
        memory_size=1024,
        pool_max=2,
        target_update_interval=8,
    )
    learner = DQNLearner(ENV, cfg, mesh=mesh)
    state = learner.init_state(jax.random.PRNGKey(0))
    state = learner.shard_state(state)
    # env batch really is split over the data axis
    shard0 = state.env_state.ball_x.sharding
    assert shard0.is_equivalent_to(data_sharding(mesh), ndim=1)
    assert state.buffer.data.sharding.spec == P("data")

    params_a = qnet_init(jax.random.PRNGKey(1))
    opp, n = stack_opponents(params_a, [], cfg.pool_max)
    state, m = learner.train_iteration(state, opp, jnp.int32(n))
    assert int(m.env_steps) == 16 * 8
    assert int(m.buffer_size) == 16 * 8
    assert np.isfinite(float(m.mean_loss))
    # run a few more to make sure the sharded program is stable
    for _ in range(2):
        state, m = learner.train_iteration(state, opp, jnp.int32(n))
    assert int(state.train_steps) == 6


def test_sharded_matches_unsharded_numerics():
    cfg = DQNConfig(
        num_envs=16,
        rollout_length=8,
        updates_per_iteration=2,
        batch_size=16,
        memory_size=1024,
        pool_max=2,
        target_update_interval=8,
        # the Pallas rollout is shard_mapped under a >1-device mesh with
        # per-tile PRNG keyed by GLOBAL tile id; numerics match the
        # single-device program exactly when the tiling matches, so pin
        # the tile to the per-device env count (16 envs / 8 devices)
        pallas_tile_rows=2,
    )
    params_a = qnet_init(jax.random.PRNGKey(1))
    opp, n = stack_opponents(params_a, [], cfg.pool_max)

    def run(mesh):
        learner = DQNLearner(ENV, cfg, mesh=mesh)
        state = learner.init_state(jax.random.PRNGKey(0))
        if mesh is not None:
            state = learner.shard_state(state)
        for _ in range(2):
            state, m = learner.train_iteration(state, opp, jnp.int32(n))
        return jax.device_get(state.params_b), jax.device_get(m)

    p_single, m_single = run(None)
    p_shard, m_shard = run(create_mesh(MeshConfig()))
    # same program, same seed: sharding must not change semantics
    assert int(m_single.episodes) == int(m_shard.episodes)
    for a, b in zip(
        jax.tree_util.tree_leaves(p_single), jax.tree_util.tree_leaves(p_shard)
    ):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


def test_multichip_fused_update_matches_single_chip():
    """Fused Pallas PER+SGD block on a >1-device mesh (replicated-learner
    SPMD, train/dqn.py design note): the 8-device program must match the
    single-device fused program — the replay buffer replicates, the
    rollout chunk all-gathers into it, and every chip runs the identical
    update kernel (VERDICT r3 item 1)."""
    from pingpong_tpu.ops.dqn_update import supports_pallas_dqn_update

    cfg = DQNConfig(
        num_envs=16,
        rollout_length=8,            # m = 128 pushed rows per iteration
        updates_per_iteration=2,
        batch_size=128,
        memory_size=16384,           # smallest block-mode capacity (128^2)
        pool_max=2,
        target_update_interval=4,
        pallas_tile_rows=2,          # match tiling across mesh sizes
    )
    assert supports_pallas_dqn_update(cfg)
    params_a = qnet_init(jax.random.PRNGKey(1))
    opp, n = stack_opponents(params_a, [], cfg.pool_max)

    def run(mesh):
        learner = DQNLearner(ENV, cfg, mesh=mesh)
        # force the TPU-only fused path through the Pallas interpreter
        learner._pallas_update_ok = True
        learner._pallas_interpret = True
        state = learner.init_state(jax.random.PRNGKey(0))
        if mesh is not None:
            state = learner.shard_state(state)
            # the learner replicates on the fused path
            assert state.buffer.data.sharding.spec == P()
            assert state.buffer.p_alpha.sharding.spec == P()
            # the actors stay sharded
            assert state.env_state.ball_x.sharding.spec == P("data")
        assert state.buffer.is_block
        for _ in range(3):
            state, m = learner.train_iteration(state, opp, jnp.int32(n))
        return jax.device_get(state), jax.device_get(m)

    s_single, m_single = run(None)
    s_shard, m_shard = run(create_mesh(MeshConfig()))
    assert int(s_shard.train_steps) == int(s_single.train_steps) > 0
    assert int(m_shard.updates_run) > 0
    assert int(m_single.episodes) == int(m_shard.episodes)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(s_single.params_b)),
        jax.tree_util.tree_leaves(jax.device_get(s_shard.params_b)),
    ):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(s_single.buffer.p_alpha),
        np.asarray(s_shard.buffer.p_alpha), rtol=2e-5, atol=2e-6,
    )
