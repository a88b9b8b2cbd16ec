#!/bin/bash
# DRQN-family strength run v3: warm-start from the reference's strongest
# RNN agent, side-balanced gates at 0.52 (aggregate > 0.5 across both
# seats == neutrally stronger than A). Tournament runs under the
# reference's tuned env (configs/qnet.yaml — the reference's own arena
# loads config.yaml's env block, arena.py:392-399).
set -u
cd /root/repo
timeout 9000 python -m pingpong_tpu.cli train-rnn --workdir demo_rnn_strength --config configs/rnn.yaml \
  drqn.init_model_path_rnn=checkpoints_rnn/ref_rnn_agent_4 \
  drqn.num_envs=1024 drqn.rollout_length=128 drqn.updates_per_iteration=256 \
  drqn.selfplay.swap_sides_eval=true \
  drqn.selfplay.curr_win_threshold=0.52 drqn.selfplay.pool_win_threshold=0.52 \
  drqn.selfplay.max_generations=1 drqn.selfplay.episodes_per_generation=6000 \
  drqn.selfplay.eval_episodes=600 drqn.selfplay.max_retries_for_generation=8 \
  drqn.selfplay.win_rate_interval=2000 \
  drqn.save_latest_checkpoint_interval_steps=0 \
  2>&1 | grep -E "event=(try|eval|eval_seats|promoted|fault|restore)"
echo TRAIN_DONE
mkdir -p demo_rnn_strength/arena_pool
for d in demo_rnn_strength/checkpoints_rnn/rnn_pong_soul_1 demo_rnn_strength/checkpoints_rnn/ref_rnn_agent_4; do
  [ -d "$d" ] && cp -r "$d" demo_rnn_strength/arena_pool/
done
cp -r demo_rnn_strength/ref_model4-12 demo_rnn_strength/arena_pool/ref_model4-12
cp -r demo/strength/model9-1 demo_rnn_strength/arena_pool/model9-1
timeout 3600 python -m pingpong_tpu.cli round-robin --workdir demo_rnn_strength \
  --config configs/qnet.yaml \
  --ckpt-dir demo_rnn_strength/arena_pool --episodes 200 --swap-sides \
  --out demo_rnn_strength/results 2>&1 | tail -25
echo RNN_STRENGTH_DONE
