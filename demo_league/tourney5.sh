#!/bin/bash
# Round-5 statistical closure: 3000 games/pair 7-entrant tournament +
# 12,000-game decisive head-to-head (league1_champ vs model9-1).
set -eu
cd /root/repo
D=demo_league
timeout 20000 python -m pingpong_tpu.cli round-robin --workdir $D \
  --config configs/qnet.yaml \
  --ckpt-dir $D/tourney3_ckpts --out $D/results5 \
  --episodes 3000 --swap-sides
mkdir -p $D/h2h_ckpts
rm -rf $D/h2h_ckpts/*
cp -r $D/tourney3_ckpts/league1_champ $D/tourney3_ckpts/model9-1 $D/h2h_ckpts/
timeout 10000 python -m pingpong_tpu.cli round-robin --workdir $D \
  --config configs/qnet.yaml \
  --ckpt-dir $D/h2h_ckpts --out $D/results_h2h \
  --episodes 12000 --swap-sides --no-bot
python $D/bt_fit.py
echo TOURNEY5_DONE
