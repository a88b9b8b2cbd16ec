#!/bin/bash
# Champion-saturation study (round-2 VERDICT item 5): why does the
# self-play ladder stop one notch above the reference?
#
# Prior evidence: demo_strength2 (8 tries x 3000 eps, gates 0.55) and
# demo_strength3 (16 tries x 12000 eps, gates 0.52) both fault against
# the QNet champion model9-1. This study varies the two axes the verdict
# asked for — POOL COMPOSITION and BUDGET — at fixed balanced gates
# 0.52, warm-starting from the champion, and logs per-seat gate rates
# (event=eval_seats) for every try:
#
#   A. pool = champion only,      6 tries x 3000 episodes
#   B. pool = full lineage (champion + 9 imported reference ckpts),
#                                 6 tries x 3000 episodes
#   C. pool = champion only,      2 tries x 24000 episodes (8x budget)
#
# summarize.py turns the metrics into the gate-pass probability table.
set -u
cd /root/repo

run () {
  local name="$1" dir="demo_saturation/$1"; shift
  mkdir -p "$dir/checkpoints"
  cp -r demo/strength/model9-1 "$dir/checkpoints/model9-1"
  if [ "$name" = "poolB" ]; then
    python -m pingpong_tpu.cli import-torch /root/reference/checkpoints \
      "$dir/checkpoints" >/dev/null 2>&1 || true
  fi
  timeout 10000 python -m pingpong_tpu.cli train --workdir "$dir" \
    --config configs/qnet.yaml \
    dqn.init_model_path=checkpoints/model9-1 \
    dqn.ckpt_dir=checkpoints \
    dqn.train_heads_only=false \
    dqn.num_envs=512 dqn.rollout_length=64 dqn.updates_per_iteration=256 \
    dqn.memory_size=1048576 dqn.pool_max=12 \
    dqn.selfplay.swap_sides_eval=true \
    dqn.selfplay.curr_win_threshold=0.52 dqn.selfplay.pool_win_threshold=0.52 \
    dqn.selfplay.max_generations=1 dqn.selfplay.eval_episodes=600 \
    dqn.selfplay.win_rate_interval=3000 \
    dqn.save_latest_checkpoint_interval_steps=0 \
    "$@" \
    2>&1 | grep -E "event=(try|eval|eval_seats|promoted|fault)|done:|error"
  echo "RUN_DONE $name"
}

run poolA dqn.selfplay.episodes_per_generation=3000 \
  dqn.selfplay.max_retries_for_generation=6
run poolB dqn.selfplay.episodes_per_generation=3000 \
  dqn.selfplay.max_retries_for_generation=6
run budget24k dqn.selfplay.episodes_per_generation=24000 \
  dqn.selfplay.max_retries_for_generation=2
echo STUDY_DONE
