#!/bin/bash
# League training (round-3 VERDICT item 4): field-robust promotion.
#
# demo_saturation showed single-lineage self-play is not field-robust:
# extensions beat their target champion head-to-head but lose to the
# ball-follower bot and to the imported reference champion in a mixed
# field. This run changes the OBJECTIVE: the promotion gate pool is a
# DIVERSE seeded field —
#
#   * bot_follower      — HardcodedBallFollower as exact QNet weights
#                         (models/qnet.py::bot_qnet_params), the entrant
#                         that exposed the round-3 failure mode
#   * ref_model4-12     — the reference's own best QNet (imported)
#   * model9-1          — this framework's prior champion
#   * ext_poolA_champ   — round-3 lineage extension
#   * scratch5-8        — from-scratch ladder champion
#
# — and training opponents draw from that same field 60% of the time.
# Promotion requires a side-balanced >=55% vs the whole field (and
# >=50% vs the evolving own line A). Confirmation is a 6-entrant
# side-balanced round-robin INCLUDING the real HardcodedBot policy.
set -eu
cd /root/repo
D=demo_league

mkdir -p "$D/checkpoints"
cp -r demo_saturation/tourney/ckpts/model9-1        "$D/checkpoints/" 2>/dev/null || true
cp -r demo_saturation/tourney/ckpts/ref_model4-12   "$D/checkpoints/" 2>/dev/null || true
cp -r demo_saturation/tourney/ckpts/ext_poolA_champ "$D/checkpoints/" 2>/dev/null || true
cp -r demo_saturation/tourney/ckpts/scratch5-8      "$D/checkpoints/" 2>/dev/null || true
python - <<'EOF'
from pingpong_tpu.checkpoint.serialize import qnet_to_dict
from pingpong_tpu.checkpoint.store import save_checkpoint
from pingpong_tpu.models.qnet import bot_qnet_params

save_checkpoint("demo_league/checkpoints/bot_follower",
                {"params_b": qnet_to_dict(bot_qnet_params(0.02)),
                 "model_kind": "qnet"})
print("seeded bot_follower")
EOF

timeout 18000 python -m pingpong_tpu.cli train --workdir "$D" \
  --config configs/qnet.yaml \
  dqn.init_model_path=checkpoints/model9-1 \
  dqn.ckpt_dir=checkpoints \
  dqn.model_id=11 \
  dqn.train_heads_only=false \
  dqn.num_envs=512 dqn.rollout_length=64 dqn.updates_per_iteration=256 \
  dqn.memory_size=1048576 dqn.pool_max=8 \
  dqn.selfplay.opponent_pool_ratio=0.6 \
  dqn.selfplay.swap_sides_eval=true \
  dqn.selfplay.curr_win_threshold=0.50 dqn.selfplay.pool_win_threshold=0.55 \
  dqn.selfplay.max_generations=4 dqn.selfplay.max_retries_for_generation=5 \
  dqn.selfplay.episodes_per_generation=6000 \
  dqn.selfplay.eval_episodes=600 \
  dqn.selfplay.win_rate_interval=3000 \
  dqn.save_latest_checkpoint_interval_steps=0 \
  2>&1 | grep -E "event=(try|eval|eval_seats|promoted|fault)|done:|error"
echo LEAGUE_TRAIN_DONE
