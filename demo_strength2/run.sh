#!/bin/bash
# Champion extension: warm-start from model9-1 (current side-balanced
# champion), pool = the reference's strongest QNet lineage (model4-*,
# model3-4) + model9-1 itself, side-balanced gates at 0.55. Tournament
# confirms under the reference-tuned env.
set -u
cd /root/repo
timeout 9000 python -m pingpong_tpu.cli train --workdir demo_strength2 --config configs/qnet.yaml \
  dqn.init_model_path=checkpoints/model9-1 dqn.model_id=10 \
  dqn.train_heads_only=false \
  dqn.num_envs=512 dqn.rollout_length=64 dqn.updates_per_iteration=256 \
  dqn.pool_max=11 \
  dqn.selfplay.swap_sides_eval=true \
  dqn.selfplay.curr_win_threshold=0.55 dqn.selfplay.pool_win_threshold=0.55 \
  dqn.selfplay.max_generations=2 dqn.selfplay.episodes_per_generation=3000 \
  dqn.selfplay.eval_episodes=600 dqn.selfplay.max_retries_for_generation=8 \
  dqn.selfplay.win_rate_interval=1000 \
  dqn.save_latest_checkpoint_interval_steps=0 \
  2>&1 | grep -E "event=(try|eval|eval_seats|promoted|fault|restore)"
echo TRAIN_DONE
mkdir -p demo_strength2/arena_pool
for d in demo_strength2/checkpoints/model10-1 demo_strength2/checkpoints/model10-2; do
  [ -d "$d" ] && cp -r "$d" demo_strength2/arena_pool/
done
cp -r demo_strength2/checkpoints/model9-1 demo_strength2/arena_pool/model9-1
cp -r demo_strength2/ref_imports/model4-12 demo_strength2/arena_pool/ref_model4-12
cp -r demo_strength2/ref_imports/model4-11 demo_strength2/arena_pool/ref_model4-11
timeout 3600 python -m pingpong_tpu.cli round-robin --workdir demo_strength2 \
  --config configs/qnet.yaml \
  --ckpt-dir demo_strength2/arena_pool --episodes 300 --swap-sides \
  --out demo_strength2/results 2>&1 | tail -20
echo STRENGTH2_DONE
