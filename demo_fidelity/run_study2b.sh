#!/bin/bash
# Round-5 re-powering, stream B (round-4 VERDICT item 4):
#  - A/B 1 (epsilon decay granularity) seeds 2,3 -> n=4 per arm;
#  - A/B 3 (NEW): opponent_binding="bucketed" vs "sorted" (iid), the
#    round-4 default deviation that never got a dynamics A/B.
#
# A/B 3 protocol: FIXED 3-member pool of very different strengths —
# ball-follower bot (weak), scratch5-8 (mid), league1_champ (strong) —
# so per-member episode LENGTH correlates with strength, which is
# exactly the joint-distribution difference between the bucketed
# (fixed lanes) and iid bindings (see config.schema.DQNConfig
# .opponent_binding). Training binds half the envs to the pool
# (ratio 0.5); thresholds unreachable so the pool stays fixed; outcome
# = win_vs_pool per 1500-episode block (a fixed-field yardstick) and
# win_vs_A, 4 seeds per arm, same seeds across arms.
set -eu
cd /root/repo
D=demo_fidelity

seed_bot () {
  mkdir -p "$1"
  python - "$1" <<'EOF'
import sys
from pingpong_tpu.checkpoint.serialize import qnet_to_dict
from pingpong_tpu.checkpoint.store import save_checkpoint
from pingpong_tpu.models.qnet import bot_qnet_params

save_checkpoint(sys.argv[1] + "/checkpoints/bot_follower",
                {"params_b": qnet_to_dict(bot_qnet_params(0.02)),
                 "model_kind": "qnet"})
EOF
}

COMMON="--config configs/qnet.yaml
  dqn.num_envs=512 dqn.rollout_length=64 dqn.updates_per_iteration=256
  dqn.memory_size=1048576
  dqn.selfplay.swap_sides_eval=true
  dqn.selfplay.eval_episodes=600
  dqn.selfplay.win_rate_interval=250
  dqn.save_latest_checkpoint_interval_steps=0"

# ---- A/B 1: epsilon decay granularity, seeds 2-3 ---------------------------
for seed in 2 3; do
  for arm in exact chunk; do
    dir="$D/eps_${arm}_s${seed}"
    [ -f "$dir/train_qnet_metrics.jsonl" ] && { echo "skip $dir"; continue; }
    seed_bot "$dir"
    pallas=$([ "$arm" = chunk ] && echo true || echo false)
    timeout 9000 python -m pingpong_tpu.cli train --workdir "$dir" $COMMON \
      seed=$seed dqn.pool_max=2 \
      dqn.use_pallas_rollout=$pallas \
      dqn.selfplay.opponent_pool_ratio=0.0 \
      dqn.selfplay.curr_win_threshold=1.1 dqn.selfplay.pool_win_threshold=1.1 \
      dqn.selfplay.max_generations=1 dqn.selfplay.max_retries_for_generation=4 \
      dqn.selfplay.episodes_per_generation=1500 \
      2>&1 | grep -E "event=(try|eval|promoted|fault)|done:|error" | tail -20
    echo "RUN_DONE eps_${arm}_s${seed}"
  done
done

# ---- A/B 3: opponent binding (bucketed vs iid), seeds 0-3 ------------------
for seed in 0 1 2 3; do
  for arm in bucketed sorted; do
    dir="$D/bind_${arm}_s${seed}"
    [ -f "$dir/train_qnet_metrics.jsonl" ] && { echo "skip $dir"; continue; }
    seed_bot "$dir"
    cp -r demo_league/tourney3_ckpts/scratch5-8    "$dir/checkpoints/"
    cp -r demo_league/tourney3_ckpts/league1_champ "$dir/checkpoints/"
    timeout 9000 python -m pingpong_tpu.cli train --workdir "$dir" $COMMON \
      seed=$seed dqn.pool_max=4 \
      dqn.opponent_binding=$arm \
      dqn.selfplay.opponent_pool_ratio=0.5 \
      dqn.selfplay.curr_win_threshold=1.1 dqn.selfplay.pool_win_threshold=1.1 \
      dqn.selfplay.max_generations=1 dqn.selfplay.max_retries_for_generation=4 \
      dqn.selfplay.episodes_per_generation=1500 \
      2>&1 | grep -E "event=(try|eval|promoted|fault)|done:|error" | tail -20
    echo "RUN_DONE bind_${arm}_s${seed}"
  done
done
echo STREAM_B_DONE
