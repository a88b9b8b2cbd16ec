#!/bin/bash
# League confirmation tournament (run AFTER demo_league/run.sh):
# 6-entrant side-balanced round-robin INCLUDING the real HardcodedBot
# policy — the field-robustness check demo_saturation's finding 4
# defined. The league champion must rank #1 with the bot in-field.
set -eu
cd /root/repo
D=demo_league
CHAMP=$(ls -d $D/checkpoints/model11-* 2>/dev/null | grep -v fault | sort -V | tail -1)
[ -z "$CHAMP" ] && { echo "no promoted league champion found"; exit 1; }
echo "champion: $CHAMP"

T=$D/tourney_ckpts
rm -rf "$T"; mkdir -p "$T"
cp -r "$CHAMP" "$T/league_champ"
cp -r $D/checkpoints/model9-1        "$T/"
cp -r $D/checkpoints/ref_model4-12   "$T/"
cp -r $D/checkpoints/ext_poolA_champ "$T/"
cp -r $D/checkpoints/scratch5-8      "$T/"
# (bot enters as the real BOT policy via the round-robin runner, not the
# bot_follower QNet used for training)

timeout 10000 python -m pingpong_tpu.cli round-robin --workdir $D \
  --config configs/qnet.yaml \
  --ckpt-dir demo_league/tourney_ckpts --out demo_league/results --episodes 300 --swap-sides
echo LEAGUE_TOURNEY_DONE
