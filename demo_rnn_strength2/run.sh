#!/bin/bash
# DRQN-family strength extension (round-2 continuation): re-run the
# lineage from the imported reference seed with the fused-kernel
# pipeline, side-balanced gates at 0.52, and a 3-generation ladder —
# gen 1 reproduces the demo_rnn_strength champion, gens 2-3 extend it.
set -u
cd /root/repo
timeout 10000 python -m pingpong_tpu.cli train-rnn --workdir demo_rnn_strength2 --config configs/rnn.yaml \
  drqn.init_model_path_rnn=checkpoints_rnn/ref_rnn_agent_4 \
  drqn.num_envs=1024 drqn.rollout_length=128 drqn.updates_per_iteration=256 \
  drqn.selfplay.swap_sides_eval=true \
  drqn.selfplay.curr_win_threshold=0.52 drqn.selfplay.pool_win_threshold=0.52 \
  drqn.selfplay.max_generations=3 drqn.selfplay.episodes_per_generation=6000 \
  drqn.selfplay.eval_episodes=600 drqn.selfplay.max_retries_for_generation=8 \
  drqn.selfplay.win_rate_interval=2000 \
  drqn.save_latest_checkpoint_interval_steps=0 \
  2>&1 | grep -E "event=(try|eval|eval_seats|promoted|fault|restore)|done:"
echo TRAIN_DONE
