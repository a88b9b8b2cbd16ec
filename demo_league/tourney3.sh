#!/bin/bash
# Final league confirmation: stage-3 champion vs the whole field
# (7 entrants incl. the real HardcodedBot), side-balanced, 300/pair.
set -eu
cd /root/repo
D=demo_league
T=$D/tourney3_ckpts
rm -rf "$T"; mkdir -p "$T"
cp -r $D/stage3/checkpoints/model13-2 "$T/league3_champ"
cp -r $D/checkpoints/model11-3        "$T/league1_champ"
cp -r $D/checkpoints/model9-1         "$T/"
cp -r $D/checkpoints/ref_model4-12    "$T/"
cp -r $D/checkpoints/ext_poolA_champ  "$T/"
cp -r $D/checkpoints/scratch5-8       "$T/"
timeout 10000 python -m pingpong_tpu.cli round-robin --workdir $D \
  --config configs/qnet.yaml \
  --ckpt-dir demo_league/tourney3_ckpts --out demo_league/results3 \
  --episodes 300 --swap-sides
echo LEAGUE3_TOURNEY_DONE
