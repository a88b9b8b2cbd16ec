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
