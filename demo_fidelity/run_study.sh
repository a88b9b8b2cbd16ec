#!/bin/bash
# Fidelity A/Bs (round-3 VERDICT item 6): quantify the two documented
# deviations of the fast path from reference semantics.
#
# A/B 1 — epsilon decay granularity. The reference decays epsilon once
# per EPISODE (train_iterative.py:261); the fused Pallas rollout decays
# once per CHUNK by decay^(episodes ended in the chunk). The XLA scan
# rollout implements the exact per-episode semantics, so the A/B is
# use_pallas_rollout=false (exact) vs =true (per-chunk), identical
# budgets, 2 seeds each. Outcome measures: the epsilon-vs-episode
# trajectory (logged per interval) and the learning curve vs a FIXED
# external yardstick — the ball-follower bot (as QNet weights) sits in
# the pool with opponent_pool_ratio=0, so `win_vs_pool` at each eval is
# "win rate vs bot" while training stays pure self-play. Thresholds are
# unreachable (1.1): every try is a fixed 1500-episode block with an
# eval, giving 4 learning-curve points per run.
#
# A/B 2 — frozen-A noise. The reference leaves modelA in train mode, so
# A plays each generation with one stale noise draw
# (train_iterative.py:86-104); the framework default is mu-greedy.
# Arms: selfplay.frozen_a_stale_noise=false vs =true, 2 seeds each,
# normal thresholds over 3 generations — outcome = promotion cadence +
# gate win rates.
#
# Summarize: python demo_fidelity/summarize.py  (table + curves.png)
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
  dqn.memory_size=1048576 dqn.pool_max=2
  dqn.selfplay.swap_sides_eval=true
  dqn.selfplay.eval_episodes=600
  dqn.selfplay.win_rate_interval=250
  dqn.save_latest_checkpoint_interval_steps=0"

# ---- A/B 1: epsilon decay granularity --------------------------------------
for seed in 0 1; do
  for arm in exact chunk; do
    dir="$D/eps_${arm}_s${seed}"
    [ -f "$dir/train_qnet_metrics.jsonl" ] && { echo "skip $dir"; continue; }
    seed_bot "$dir"
    pallas=$([ "$arm" = chunk ] && echo true || echo false)
    timeout 9000 python -m pingpong_tpu.cli train --workdir "$dir" $COMMON \
      seed=$seed \
      dqn.use_pallas_rollout=$pallas \
      dqn.selfplay.opponent_pool_ratio=0.0 \
      dqn.selfplay.curr_win_threshold=1.1 dqn.selfplay.pool_win_threshold=1.1 \
      dqn.selfplay.max_generations=1 dqn.selfplay.max_retries_for_generation=4 \
      dqn.selfplay.episodes_per_generation=1500 \
      2>&1 | grep -E "event=(try|eval|promoted|fault)|done:|error" | tail -20
    echo "RUN_DONE eps_${arm}_s${seed}"
  done
done

# ---- A/B 2: frozen-A stale noise -------------------------------------------
for seed in 0 1; do
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
echo STUDY_DONE
