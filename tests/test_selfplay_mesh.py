"""Self-play driver over the 8-virtual-device mesh (end-to-end SPMD)."""

import jax

from pingpong_tpu.config import DQNConfig, EnvConfig
from pingpong_tpu.config.schema import MeshConfig, SelfPlayConfig
from pingpong_tpu.checkpoint.store import list_checkpoints
from pingpong_tpu.selfplay.loop import QNetSelfPlay
from pingpong_tpu.utils.metrics import MetricsLogger


def test_selfplay_runs_sharded_over_mesh(tmp_path):
    cfg = DQNConfig(
        selfplay=SelfPlayConfig(
            max_generations=1,
            episodes_per_generation=8,
            eval_episodes=16,
            max_retries_for_generation=1,
            curr_win_threshold=0.0,
            pool_win_threshold=0.0,
            win_rate_interval=8,
        ),
        num_envs=16,  # 2 per device
        rollout_length=16,
        updates_per_iteration=2,
        batch_size=16,
        memory_size=2048,
        pool_max=2,
        target_update_interval=8,
    )
    driver = QNetSelfPlay(
        EnvConfig(max_episode_steps=200), cfg, workdir=str(tmp_path),
        seed=0, logger=MetricsLogger(echo=False),
        mesh_cfg=MeshConfig(),
    )
    assert driver.learner.mesh is not None
    assert driver.learner.mesh.shape["data"] == 8
    # env batch actually sharded over the data axis
    from jax.sharding import PartitionSpec as P

    assert driver.state.env_state.ball_x.sharding.spec == P("data")
    records = driver.run()
    assert len(records) == 1 and records[0].promoted
    assert [p.name for p in list_checkpoints(tmp_path / "checkpoints")] == [
        "model5-1"
    ]


def test_selfplay_sharded_learner_end_to_end(tmp_path):
    """The SHARDED-PER learner mode (round-5) through the full self-play
    driver: generation runs, promotes, and the replay ring stays 1/n per
    shard end to end."""
    cfg = DQNConfig(
        selfplay=SelfPlayConfig(
            max_generations=1,
            episodes_per_generation=8,
            eval_episodes=16,
            max_retries_for_generation=1,
            curr_win_threshold=0.0,
            pool_win_threshold=0.0,
            win_rate_interval=8,
        ),
        num_envs=16,
        rollout_length=16,
        updates_per_iteration=2,
        batch_size=16,
        memory_size=8192,
        pool_max=2,
        target_update_interval=8,
        learner_sharding="sharded",
    )
    driver = QNetSelfPlay(
        EnvConfig(max_episode_steps=200), cfg, workdir=str(tmp_path),
        seed=0, logger=MetricsLogger(echo=False),
        mesh_cfg=MeshConfig(),
    )
    assert driver.learner._learner_sharded
    assert (driver.state.buffer.data.addressable_shards[0].data.shape[0]
            == cfg.memory_size // 8)
    records = driver.run()
    assert len(records) == 1 and records[0].promoted


def test_sharded_learner_full_state_resume(tmp_path):
    """Kill-and-resume in sharded mode: the Orbax full-state autosave
    round-trips the SHARDED replay ring bit-exactly (save gathers, the
    restore template re-shards)."""
    import jax
    import numpy as np

    cfg = DQNConfig(
        selfplay=SelfPlayConfig(
            max_generations=2,
            episodes_per_generation=8,
            eval_episodes=8,
            max_retries_for_generation=1,
            curr_win_threshold=0.0,
            pool_win_threshold=0.0,
            win_rate_interval=8,
        ),
        num_envs=16,
        rollout_length=16,
        updates_per_iteration=2,
        batch_size=16,
        memory_size=8192,
        pool_max=2,
        target_update_interval=8,
        learner_sharding="sharded",
    )
    env = EnvConfig(max_episode_steps=200)
    d1 = QNetSelfPlay(env, cfg, workdir=str(tmp_path), seed=0,
                      logger=MetricsLogger(echo=False),
                      mesh_cfg=MeshConfig())
    d1.current_generation = 2
    d1.done_generations = 1
    d1._train_block(4)
    d1.autosave(wait=True)
    saved = jax.tree_util.tree_leaves(jax.device_get(d1.state))

    d2 = QNetSelfPlay(env, cfg, workdir=str(tmp_path), seed=7,
                      logger=MetricsLogger(echo=False),
                      mesh_cfg=MeshConfig())
    assert d2._resumed_mid_generation
    assert d2.learner._learner_sharded
    # restored ring re-sharded 1/n AND bit-identical to the saved state
    assert (d2.state.buffer.data.addressable_shards[0].data.shape[0]
            == cfg.memory_size // 8)
    restored = jax.tree_util.tree_leaves(jax.device_get(d2.state))
    assert len(saved) == len(restored)
    for a, b in zip(saved, restored):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
