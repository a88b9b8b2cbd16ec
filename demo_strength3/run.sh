#!/bin/bash
# QNet champion-extension attempt v2 (round-2 continuation): warm-start
# from model9-1 with the fused-update pipeline, side-balanced gates at
# 0.52 (vs the failed 0.55 attempt in demo_strength2), 4x the episode
# budget per try. Pool = model9-1 + 9 imported reference checkpoints.
set -u
cd /root/repo
timeout 9000 python -m pingpong_tpu.cli train --workdir demo_strength3 --config configs/qnet.yaml \
  dqn.init_model_path=checkpoints/model9-1 dqn.train_heads_only=false \
  dqn.num_envs=512 dqn.rollout_length=64 dqn.updates_per_iteration=256 \
  dqn.memory_size=1048576 \
  dqn.selfplay.swap_sides_eval=true \
  dqn.selfplay.curr_win_threshold=0.52 dqn.selfplay.pool_win_threshold=0.52 \
  dqn.selfplay.max_generations=2 dqn.selfplay.episodes_per_generation=12000 \
  dqn.selfplay.eval_episodes=600 dqn.selfplay.max_retries_for_generation=8 \
  dqn.selfplay.win_rate_interval=3000 dqn.pool_max=12 \
  dqn.save_latest_checkpoint_interval_steps=0 \
  2>&1 | grep -E "event=(try|eval|eval_seats|promoted|fault|restore)|done:|error"
echo TRAIN_DONE
