#!/bin/bash
# League stage 2: continue the ladder from the stage-1 champion
# (model11-3, field rank #2) with the league field as the gate pool —
# now INCLUDING model9-1 (the remaining #1) and the stage-1 champion
# itself. Promotion = balanced >=0.55 vs the evolving A AND >=0.55 vs
# the whole field.
set -eu
cd /root/repo
D=demo_league
S=$D/stage2
mkdir -p "$S/checkpoints"
for m in bot_follower model9-1 ref_model4-12 ext_poolA_champ scratch5-8 model11-3; do
  cp -r "$D/checkpoints/$m" "$S/checkpoints/" 2>/dev/null || true
done

timeout 18000 python -m pingpong_tpu.cli train --workdir "$S" \
  --config configs/qnet.yaml \
  dqn.init_model_path=checkpoints/model11-3 \
  dqn.ckpt_dir=checkpoints \
  dqn.model_id=12 \
  dqn.train_heads_only=false \
  dqn.num_envs=512 dqn.rollout_length=64 dqn.updates_per_iteration=256 \
  dqn.memory_size=1048576 dqn.pool_max=8 \
  dqn.selfplay.opponent_pool_ratio=0.6 \
  dqn.selfplay.swap_sides_eval=true \
  dqn.selfplay.curr_win_threshold=0.55 dqn.selfplay.pool_win_threshold=0.55 \
  dqn.selfplay.max_generations=4 dqn.selfplay.max_retries_for_generation=5 \
  dqn.selfplay.episodes_per_generation=6000 \
  dqn.selfplay.eval_episodes=600 \
  dqn.selfplay.win_rate_interval=3000 \
  dqn.save_latest_checkpoint_interval_steps=0 \
  2>&1 | grep -E "event=(try|eval|eval_seats|promoted|fault)|done:|error"
echo LEAGUE2_TRAIN_DONE
