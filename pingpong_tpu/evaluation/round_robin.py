"""Round-robin tournament: all pairs, batched on device.

Re-design of ``/root/reference/tests/test_round_robin.py:238-539``: every
C(n,2) pair plays ``episodes_per_match`` greedy games — but here each
pairing's games run as ONE jitted batch instead of a per-step host loop.
Outputs match the reference's artifacts: ``match_records_{ts}.csv`` (one
row per episode with scores and winner), ``summary_ranking_{ts}.csv``
(win/lose/draw/win-rate ranking), a win-rate bar chart, a head-to-head
heatmap, and a formatted console ranking table. Draws are possible exactly
as in the reference (winner decided by final score comparison).
"""

from __future__ import annotations

import itertools
import time
from datetime import datetime, timezone
from pathlib import Path
from typing import List, Optional

import jax
import numpy as np

from pingpong_tpu.env.pong import env_params_from_config
from pingpong_tpu.evaluation.registry import MatchRunner, discover_models
from pingpong_tpu.utils.plotting import plot_h2h_heatmap, plot_win_rate_bars


def run_round_robin(
    cfg,
    ckpt_dir,
    out_dir,
    episodes_per_match: int = 100,
    include_bot: bool = True,
    seed: int = 0,
    entries: Optional[List] = None,
    bot_tolerance: float = 0.01,   # ref test_round_robin.py:224
    swap_sides: bool = False,      # N/2 games per seating (no ref equiv —
                                   # the ref always seats p2 on the favored
                                   # bottom side, tests/test_side_asymmetry)
    batched: bool = True,          # ALL pairings in a handful of device
                                   # programs (bit-identical results to the
                                   # sequential per-pair path)
) -> int:
    import pandas as pd

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    env_params = env_params_from_config(cfg.env)
    runner = MatchRunner(env_params, bot_tolerance=bot_tolerance)
    if entries is None:
        dirs = ckpt_dir if isinstance(ckpt_dir, (list, tuple)) else [ckpt_dir]
        entries = discover_models(dirs, include_bot=include_bot)
    if len(entries) < 2:
        print(f"[round-robin] need >=2 models, found {len(entries)}")
        return 1

    key = jax.random.PRNGKey(seed)
    records = []
    t_start = time.perf_counter()
    pairs = list(itertools.combinations(range(len(entries)), 2))
    # seatings to play: (top, bottom, n_games); records keep the TRUE
    # seating so per-seat rates stay auditable in the CSV
    jobs = []
    for i, j in pairs:
        a, b = entries[i], entries[j]
        if swap_sides:
            half = episodes_per_match // 2
            jobs += [(a, b, half), (b, a, episodes_per_match - half)]
        else:
            jobs.append((a, b, episodes_per_match))

    if batched:
        played = runner.play_pairs_batched(jobs, key)
    else:
        played = []
        for top, bottom, n in jobs:
            key, k_match = jax.random.split(key)
            played.append((top, bottom, runner.play(top, bottom, n, k_match)))

    per_pair = {}
    for top, bottom, res in played:
        sa = np.asarray(res.score_a)
        sb = np.asarray(res.score_b)
        now = datetime.now(timezone.utc).isoformat()
        for g in range(len(sa)):
            winner = (top.id if sa[g] > sb[g]
                      else (bottom.id if sb[g] > sa[g] else "draw"))
            records.append({
                "p1": top.id, "p2": bottom.id,
                "p1_score": int(sa[g]), "p2_score": int(sb[g]),
                "winner": winner, "timestamp": now,
            })
        pair_key = tuple(sorted((top.id, bottom.id)))
        w, d = per_pair.setdefault(pair_key, ({top.id: 0, bottom.id: 0}, [0]))
        w[top.id] += int(np.sum(sa > sb))
        w[bottom.id] += int(np.sum(sb > sa))
        d[0] += int(np.sum(sa == sb))
    for i, j in pairs:
        a, b = entries[i], entries[j]
        w, d = per_pair[tuple(sorted((a.id, b.id)))]
        print(f"[round-robin] {a.id} vs {b.id}: {w[a.id]}-{w[b.id]} "
              f"(draws {d[0]})"
              + (" [side-balanced]" if swap_sides else ""))

    dt = time.perf_counter() - t_start
    games = len(records)
    print(f"[round-robin] {games} games in {dt:.1f}s "
          f"({games / max(dt, 1e-9):.0f} games/s)")

    ts = datetime.now().strftime("%Y%m%d_%H%M%S")
    df = pd.DataFrame(records)
    df.to_csv(out / f"match_records_{ts}.csv", index=False)

    # ranking
    ids = [e.id for e in entries]
    stats = {m: {"win": 0, "lose": 0, "draw": 0} for m in ids}
    for r in records:
        if r["winner"] == "draw":
            stats[r["p1"]]["draw"] += 1
            stats[r["p2"]]["draw"] += 1
        else:
            loser = r["p2"] if r["winner"] == r["p1"] else r["p1"]
            stats[r["winner"]]["win"] += 1
            stats[loser]["lose"] += 1
    rows = []
    for m in ids:
        s = stats[m]
        total = s["win"] + s["lose"] + s["draw"]
        rows.append({
            "model": m, "wins": s["win"], "losses": s["lose"],
            "draws": s["draw"], "games": total,
            "win_rate": s["win"] / total if total else 0.0,
        })
    summary = pd.DataFrame(rows).sort_values("win_rate", ascending=False)
    summary.to_csv(out / f"summary_ranking_{ts}.csv", index=False)

    # H2H matrix (row win rate vs column)
    n = len(ids)
    pos = {m: k for k, m in enumerate(ids)}
    wins = np.zeros((n, n))
    games_m = np.zeros((n, n))
    for r in records:
        i, j = pos[r["p1"]], pos[r["p2"]]
        games_m[i, j] += 1
        games_m[j, i] += 1
        if r["winner"] == r["p1"]:
            wins[i, j] += 1
        elif r["winner"] == r["p2"]:
            wins[j, i] += 1
    with np.errstate(invalid="ignore", divide="ignore"):
        h2h = np.where(games_m > 0, wins / np.maximum(games_m, 1), np.nan)
    np.fill_diagonal(h2h, np.nan)

    plot_win_rate_bars(ids, [r["win_rate"] for r in rows],
                       str(out / f"win_rates_{ts}.png"))
    plot_h2h_heatmap(ids, h2h, str(out / f"h2h_heatmap_{ts}.png"))

    # console ranking table (ref :496-535)
    print(f"\n{'rank':<5}{'model':<28}{'W':>6}{'L':>6}{'D':>6}{'win rate':>10}")
    for rank, row in enumerate(summary.itertuples(index=False), 1):
        print(f"{rank:<5}{row.model:<28}{row.wins:>6}{row.losses:>6}"
              f"{row.draws:>6}{row.win_rate:>10.4f}")
    return 0
