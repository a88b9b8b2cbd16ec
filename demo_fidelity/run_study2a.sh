#!/bin/bash
# Round-5 re-powering, stream A: A/B 2 (frozen-A noise) seeds 2,3 —
# brings both arms to n=4 seeds (round-4 VERDICT item 4). Protocol
# identical to run_study.sh.
set -eu
cd /root/repo
D=demo_fidelity

COMMON="--config configs/qnet.yaml
  dqn.num_envs=512 dqn.rollout_length=64 dqn.updates_per_iteration=256
  dqn.memory_size=1048576 dqn.pool_max=2
  dqn.selfplay.swap_sides_eval=true
  dqn.selfplay.eval_episodes=600
  dqn.selfplay.win_rate_interval=250
  dqn.save_latest_checkpoint_interval_steps=0"

for seed in 2 3; do
  for arm in mu stale; do
    dir="$D/a_${arm}_s${seed}"
    [ -f "$dir/train_qnet_metrics.jsonl" ] && { echo "skip $dir"; continue; }
    mkdir -p "$dir"
    flag=$([ "$arm" = stale ] && echo true || echo false)
    timeout 9000 python -m pingpong_tpu.cli train --workdir "$dir" $COMMON \
      seed=$seed \
      dqn.selfplay.frozen_a_stale_noise=$flag \
      dqn.selfplay.opponent_pool_ratio=0.33 \
      dqn.selfplay.curr_win_threshold=0.55 dqn.selfplay.pool_win_threshold=0.55 \
      dqn.selfplay.max_generations=3 dqn.selfplay.max_retries_for_generation=4 \
      dqn.selfplay.episodes_per_generation=1500 \
      2>&1 | grep -E "event=(try|eval|promoted|fault)|done:|error" | tail -30
    echo "RUN_DONE a_${arm}_s${seed}"
  done
done
echo STREAM_A_DONE
