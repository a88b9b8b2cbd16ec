"""Orbax full-state checkpoint round-trip + debug utilities."""

import numpy as np
import jax
import jax.numpy as jnp

from pingpong_tpu.config import DQNConfig, EnvConfig
from pingpong_tpu.checkpoint.orbax_io import (
    load_metadata,
    restore_train_state,
    save_train_state,
)
from pingpong_tpu.models import qnet_init
from pingpong_tpu.train.dqn import DQNLearner, stack_opponents
from pingpong_tpu.utils.debug import assert_finite_tree, checked_env_step

ENV = EnvConfig(max_episode_steps=100)


def test_full_train_state_roundtrip(tmp_path):
    cfg = DQNConfig(num_envs=8, rollout_length=16, updates_per_iteration=2,
                    batch_size=16, memory_size=1024, pool_max=2,
                    target_update_interval=8)
    learner = DQNLearner(ENV, cfg)
    state = learner.init_state(jax.random.PRNGKey(0))
    opp, n = stack_opponents(qnet_init(jax.random.PRNGKey(1)), [], cfg.pool_max)
    state, _ = learner.train_iteration(state, opp, jnp.int32(n))

    path = save_train_state(tmp_path / "latest", state,
                            metadata={"generation": 3, "kind": "dqn"})
    assert load_metadata(path) == {"generation": 3, "kind": "dqn"}

    template = learner.init_state(jax.random.PRNGKey(99))
    restored = restore_train_state(path, template)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored state is usable: run another iteration
    restored, m = learner.train_iteration(restored, opp, jnp.int32(n))
    assert np.isfinite(float(m.mean_loss))


def test_sharded_mesh_roundtrip(tmp_path):
    """Save a MESH-PLACED train state (replay sharded on the data axis,
    params replicated) and restore into a mesh-placed template: values
    exact, shardings preserved — the fidelity the single-device test
    cannot see."""
    from jax.sharding import PartitionSpec as P

    from pingpong_tpu.config.schema import MeshConfig
    from pingpong_tpu.parallel.mesh import create_mesh

    cfg = DQNConfig(num_envs=16, rollout_length=8, updates_per_iteration=2,
                    batch_size=16, memory_size=1024, pool_max=0,
                    target_update_interval=8, use_pallas_rollout=False,
                    use_pallas_eval=False)
    mesh = create_mesh(MeshConfig())
    learner = DQNLearner(ENV, cfg, mesh=mesh)
    state = learner.shard_state(learner.init_state(jax.random.PRNGKey(0)))
    opp, n = stack_opponents(qnet_init(jax.random.PRNGKey(1)), [], 0)
    state, _ = learner.train_iteration(state, opp, jnp.int32(n))
    assert state.buffer.data.sharding.spec == P("data")

    path = save_train_state(tmp_path / "latest", state, metadata={"g": 1})

    learner2 = DQNLearner(ENV, cfg, mesh=mesh)
    template = learner2.shard_state(learner2.init_state(jax.random.PRNGKey(7)))
    restored = restore_train_state(path, template)
    # shardings come from the template (mesh-placed)
    assert restored.buffer.data.sharding.spec == P("data")
    assert restored.params_b.feat1.w.sharding.spec == P()
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state)),
        jax.tree_util.tree_leaves(jax.device_get(restored)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the restored state steps without recompilation errors
    restored, m = learner2.train_iteration(restored, opp, jnp.int32(n))
    assert np.isfinite(float(m.mean_loss))


def test_checked_env_step_flags_nonfinite():
    from pingpong_tpu.env.pong import EnvState, env_params_from_config

    params = env_params_from_config(ENV)
    good = EnvState(
        ball_x=jnp.float32(0.5), ball_y=jnp.float32(0.5),
        ball_vx=jnp.float32(0.02), ball_vy=jnp.float32(0.03),
        spin=jnp.float32(1.0), top_paddle_x=jnp.float32(0.5),
        bottom_paddle_x=jnp.float32(0.5), score_a=jnp.int32(0),
        score_b=jnp.int32(0), bounce_count=jnp.int32(0), t=jnp.int32(0),
        done=jnp.asarray(False),
    )
    err, _ = checked_env_step(params, good, jnp.int32(1), jnp.int32(1))
    err.throw()  # no error

    bad = good._replace(ball_vx=jnp.float32(float("nan")))
    err, _ = checked_env_step(params, bad, jnp.int32(1), jnp.int32(1))
    import pytest

    with pytest.raises(Exception):
        err.throw()


def test_assert_finite_tree():
    import pytest

    assert_finite_tree({"a": jnp.ones(3)}, "ok")
    with pytest.raises(FloatingPointError):
        assert_finite_tree({"a": jnp.asarray([1.0, float("inf")])}, "bad")
