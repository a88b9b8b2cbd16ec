#!/usr/bin/env bash
# Reference-budget from-scratch DRQN ladder: 5 generations x 3000
# episodes/try x <=10 retries, gates 0.60/0.60, eval 500 — the exact
# budget of /root/reference/config_rnn.yaml:50-65 — from RANDOM init.
# (The reference RNN trainer always trains the full network, so this
# family was never affected by the heads-only override bug.)
set -euo pipefail
cd "$(dirname "$0")/.."
python -m pingpong_tpu.cli train-rnn --config configs/rnn.yaml \
  --workdir demo_fromscratch_rnn --seed 0 \
  drqn.num_envs=512 drqn.rollout_length=64 drqn.updates_per_iteration=128 \
  drqn.ckpt_dir=checkpoints_rnn \
  drqn.selfplay.max_generations=5 \
  drqn.selfplay.episodes_per_generation=3000 \
  drqn.selfplay.eval_episodes=500 \
  drqn.selfplay.max_retries_for_generation=10
