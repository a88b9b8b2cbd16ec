#!/bin/bash
# Learning-dynamics study: from-scratch promotion reliability,
# hard target sync (tau=0, reference semantics) vs soft Polyak targets
# (tau=0.005). 2 seeds each, 3 generations, identical budgets.
set -u
cd /root/repo
for tau in 0 0.005; do
  for seed in 0 1; do
    W=demo_dynamics/tau${tau}_seed${seed}
    mkdir -p $W
    echo "=== tau=$tau seed=$seed ==="
    timeout 5400 python -m pingpong_tpu.cli train --workdir $W --config configs/qnet.yaml \
      dqn.target_tau=$tau seed=$seed \
      dqn.num_envs=512 dqn.rollout_length=64 dqn.updates_per_iteration=512 \
      dqn.train_heads_only=false \
      dqn.selfplay.max_generations=3 dqn.selfplay.episodes_per_generation=2400 \
      dqn.selfplay.eval_episodes=500 dqn.selfplay.max_retries_for_generation=6 \
      dqn.selfplay.win_rate_interval=800 \
      dqn.save_latest_checkpoint_interval_steps=0 \
      2>&1 | grep -E "event=(try|eval|promoted|fault)" | tail -40
  done
done
echo STUDY_DONE
