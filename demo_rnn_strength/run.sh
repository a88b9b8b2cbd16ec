#!/bin/bash
# DRQN-family strength run: warm-start from the reference's strongest RNN
# agent, side-balanced gates, then a side-balanced tournament.
set -u
cd /root/repo
timeout 7200 python -m pingpong_tpu.cli train-rnn --workdir demo_rnn_strength --config configs/rnn.yaml \
  drqn.init_model_path_rnn=checkpoints_rnn/ref_rnn_agent_4 \
  drqn.num_envs=1024 drqn.rollout_length=128 drqn.updates_per_iteration=256 \
  drqn.selfplay.swap_sides_eval=true \
  drqn.selfplay.curr_win_threshold=0.55 drqn.selfplay.pool_win_threshold=0.55 \
  drqn.selfplay.max_generations=2 drqn.selfplay.episodes_per_generation=3000 \
  drqn.selfplay.eval_episodes=400 drqn.selfplay.max_retries_for_generation=6 \
  drqn.selfplay.win_rate_interval=1000 \
  drqn.save_latest_checkpoint_interval_steps=0 \
  2>&1 | grep -E "event=(try|eval|eval_seats|promoted|fault|restore)" 
echo TRAIN_DONE
# side-balanced tournament: promoted gens + imported reference agents + bot
mkdir -p demo_rnn_strength/arena_pool
cp -r demo_rnn_strength/checkpoints_rnn/* demo_rnn_strength/arena_pool/ 2>/dev/null
rm -rf demo_rnn_strength/arena_pool/latest_rnn_training_state* 
cp -r demo_rnn_strength/ref_model4-12 demo_rnn_strength/arena_pool/ref_model4-12
cp -r demo/strength/model9-1 demo_rnn_strength/arena_pool/model9-1
timeout 3600 python -m pingpong_tpu.cli round-robin --workdir demo_rnn_strength \
  --ckpt-dir demo_rnn_strength/arena_pool --episodes 200 --swap-sides \
  --out demo_rnn_strength/results 2>&1 | tail -25
echo RNN_STRENGTH_DONE
