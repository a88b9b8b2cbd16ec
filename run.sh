#!/usr/bin/env bash
# Interactive launcher — the analog of the reference's run.sh menu
# (/root/reference/run.sh:25-109). Every entry is also a plain CLI command;
# this menu just saves typing.
set -euo pipefail
cd "$(dirname "$0")"

PY="${PYTHON:-python}"

cat <<'MENU'
pingpong_tpu launcher
  1) train        — QNet iterative self-play        (configs/qnet.yaml)
  2) train-rnn    — DRQN (LSTM) iterative self-play (configs/rnn.yaml)
  3) round-robin  — all-pairs tournament over checkpoints/
  4) arena        — persistent resumable tournament
  5) view         — render an episode to view.gif
  6) view-replay  — interactive pygame playback of recorded episodes
  7) view-live    — REAL-TIME match on the native C++ engine
  8) bench        — headline benchmark (prints one JSON line)
  9) scaling      — weak-scaling ladder over all visible devices
 10) tests        — python -m pytest tests/ -x -q
MENU
read -rp "choice [1-10]: " choice

case "$choice" in
  1) exec "$PY" -m pingpong_tpu.cli train --config configs/qnet.yaml ;;
  2) exec "$PY" -m pingpong_tpu.cli train-rnn --config configs/rnn.yaml ;;
  3) exec "$PY" -m pingpong_tpu.cli round-robin --ckpt-dir checkpoints ;;
  4) exec "$PY" -m pingpong_tpu.cli arena --ckpt-dir checkpoints ;;
  5) exec "$PY" -m pingpong_tpu.cli view --out view.gif ;;
  6) exec "$PY" -m pingpong_tpu.cli view --interactive ;;
  7) exec "$PY" -m pingpong_tpu.cli view --live ;;
  8) exec "$PY" bench.py ;;
  9) exec "$PY" -m pingpong_tpu.tools.scaling_bench ;;
 10) exec "$PY" -m pytest tests/ -x -q ;;
  *) echo "unknown choice: $choice" >&2; exit 1 ;;
esac
