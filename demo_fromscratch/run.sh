#!/usr/bin/env bash
# Reference-budget from-scratch QNet ladder (VERDICT round-2 item 6):
# 8 generations x 2400 episodes/try x <=12 retries, gates 0.61/0.61,
# eval 1000 games — the EXACT budget of /root/reference/config.yaml:20-37
# — from RANDOM init (no warm start; note the reference itself always
# warm-starts, train_iterative.py:86-104).
set -euo pipefail
cd "$(dirname "$0")/.."
python -m pingpong_tpu.cli train --config configs/qnet.yaml \
  --workdir demo_fromscratch --seed 0 \
  dqn.num_envs=512 dqn.rollout_length=64 dqn.updates_per_iteration=512 \
  dqn.train_heads_only=false \
  dqn.ckpt_dir=checkpoints \
  dqn.selfplay.max_generations=8 \
  dqn.selfplay.episodes_per_generation=2400 \
  dqn.selfplay.eval_episodes=1000 \
  dqn.selfplay.max_retries_for_generation=12
