#!/bin/bash
# League stage 3: gate on the FIELD, not on self-beating.
# Stage 2 showed the reference's own-lineage rule (beat A by a margin)
# saturates once A is itself field-robust — B warm-started from
# model11-3 never exceeded 0.49 balanced vs it. But the OBJECTIVE that
# matters (demo_saturation finding 4) is field strength, which the pool
# gate measures directly: the gate pool IS the 6-entrant league. So:
# promote when balanced-vs-field >= 0.66 (above the stage-1 champion's
# 0.648 field rate) while not regressing vs A (>= 0.45).
set -eu
cd /root/repo
D=demo_league
S=$D/stage3
mkdir -p "$S/checkpoints"
for m in bot_follower model9-1 ref_model4-12 ext_poolA_champ scratch5-8 model11-3; do
  cp -r "$D/checkpoints/$m" "$S/checkpoints/" 2>/dev/null || true
done

timeout 18000 python -m pingpong_tpu.cli train --workdir "$S" \
  --config configs/qnet.yaml \
  dqn.init_model_path=checkpoints/model11-3 \
  dqn.ckpt_dir=checkpoints \
  dqn.model_id=13 \
  dqn.train_heads_only=false \
  dqn.num_envs=512 dqn.rollout_length=64 dqn.updates_per_iteration=256 \
  dqn.memory_size=1048576 dqn.pool_max=8 \
  dqn.selfplay.opponent_pool_ratio=0.7 \
  dqn.selfplay.swap_sides_eval=true \
  dqn.selfplay.curr_win_threshold=0.45 dqn.selfplay.pool_win_threshold=0.66 \
  dqn.selfplay.max_generations=3 dqn.selfplay.max_retries_for_generation=6 \
  dqn.selfplay.episodes_per_generation=6000 \
  dqn.selfplay.eval_episodes=900 \
  dqn.selfplay.win_rate_interval=3000 \
  dqn.save_latest_checkpoint_interval_steps=0 \
  2>&1 | grep -E "event=(try|eval|eval_seats|promoted|fault)|done:|error"
echo LEAGUE3_TRAIN_DONE
