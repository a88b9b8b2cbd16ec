"""Weak-scaling harness mechanism check on the 8-virtual-device mesh.

Not a performance statement (CPU devices share host cores) — it pins
that the ladder runs 1->2->4->8 with sharded state, reports sane rates,
and that the global batch really spreads across devices.
"""

import jax
import numpy as np
import pytest

from pingpong_tpu.tools.scaling_bench import measure_rate, run_ladder


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_ladder_runs_and_reports():
    rows = run_ladder([1, 2, 4, 8], per_device_envs=64,
                      rollout_length=8, updates=2, n1=1, n2=3,
                      use_pallas=False)
    assert [r["devices"] for r in rows] == [1, 2, 4, 8]
    assert all(r["env_steps_per_s"] > 0 for r in rows)
    assert rows[0]["scaling_efficiency"] == 1.0
    assert all(0 < r["scaling_efficiency"] for r in rows)
    assert rows[-1]["global_envs"] == 64 * 8


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 devices")
def test_state_is_sharded_over_mesh():
    from jax.sharding import Mesh

    from pingpong_tpu.config.schema import DQNConfig
    from pingpong_tpu.tools.scaling_bench import _env_cfg
    from pingpong_tpu.train.dqn import DQNLearner

    n = 2
    devices = np.array(jax.devices()[:n]).reshape(n, 1)
    mesh = Mesh(devices, ("data", "model"))
    cfg = DQNConfig(num_envs=128, rollout_length=8, updates_per_iteration=2,
                    batch_size=32, memory_size=4096,
                    use_pallas_rollout=False, use_pallas_eval=False)
    learner = DQNLearner(_env_cfg(), cfg, mesh=mesh)
    state = learner.shard_state(learner.init_state(jax.random.PRNGKey(0)))
    shards = state.env_state.ball_x.addressable_shards
    assert len(shards) == n
    assert shards[0].data.shape == (64,)
