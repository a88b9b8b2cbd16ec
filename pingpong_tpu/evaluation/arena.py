"""Persistent, resumable arena tournament with a JSON match database.

Re-design of ``/root/reference/tests/arena.py`` (v3.0 feature list at
:2-16). Preserved semantics:

* JSON DB ``{"models": [...], "match_history": [...]}`` with model entries
  ``{id, type, path, description}`` and match records
  ``{p1, p2, winner, p1_score, p2_score, timestamp}`` (ref :128-157,
  :311-318) — winner by final score comparison, draws possible;
* ``register_models`` appends only unseen ids (ref :147-157);
* incremental match plan: per sorted pair, schedule
  ``episodes_per_match - already_played`` remaining games, so reruns
  resume where they left off (ref :222-244);
* summary report recomputed from the full history; timestamped CSVs and
  an H2H heatmap under the results dir (ref :323-378).

TPU-native difference: each pair's remaining games run as one batched
device program; the DB is saved after every pair rather than after every
single episode (the reference's per-episode rewrite of the whole DB,
:310-319, is pure overhead once games finish in microseconds — the atomic
whole-file write is kept).
"""

from __future__ import annotations

import itertools
import json
from collections import Counter
from datetime import datetime, timezone
from pathlib import Path
from typing import Dict, List, Optional

import jax
import numpy as np

from pingpong_tpu.env.pong import env_params_from_config
from pingpong_tpu.evaluation.registry import (
    MatchRunner,
    ModelEntry,
    discover_models,
)
from pingpong_tpu.evaluation.match import BOT, QNET, RNN
from pingpong_tpu.utils.plotting import plot_h2h_heatmap, plot_win_rate_bars

_KIND_BY_NAME = {"QNet": QNET, "QNetRNN": RNN, "HardcodedBallFollower": BOT}


def load_database(db_path: Path) -> Dict:
    db_path = Path(db_path)
    if db_path.exists() and db_path.stat().st_size > 0:
        try:
            with open(db_path, "r", encoding="utf-8") as f:
                data = json.load(f)
            data.setdefault("models", [])
            data.setdefault("match_history", [])
            return data
        except json.JSONDecodeError:
            print(f"[arena] corrupt database {db_path}; starting fresh")
    return {"models": [], "match_history": []}


def save_database(db_path: Path, data: Dict) -> None:
    db_path = Path(db_path)
    tmp = db_path.with_suffix(db_path.suffix + ".tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(data, f, indent=2, ensure_ascii=False)
    tmp.replace(db_path)


def register_models(database: Dict, candidates: List[Dict]) -> bool:
    known = {m["id"] for m in database["models"]}
    added = False
    for cand in candidates:
        if cand["id"] not in known:
            database["models"].append(cand)
            known.add(cand["id"])
            added = True
    return added


def create_match_plan(database: Dict, episodes_per_match: int) -> List[Dict]:
    ids = [m["id"] for m in database["models"]]
    played = Counter()
    for rec in database["match_history"]:
        played[tuple(sorted((rec["p1"], rec["p2"])))] += 1
    plan = []
    for p1, p2 in itertools.combinations(ids, 2):
        remaining = episodes_per_match - played[tuple(sorted((p1, p2)))]
        if remaining > 0:
            plan.append({"p1_id": p1, "p2_id": p2, "episodes_to_run": remaining})
    return plan


def _entries_from_db(database: Dict) -> Dict[str, ModelEntry]:
    out = {}
    for m in database["models"]:
        kind = _KIND_BY_NAME.get(m.get("type", "QNet"), QNET)
        out[m["id"]] = ModelEntry(m["id"], kind, m.get("path"))
    return out


def run_tournament(
    runner: MatchRunner,
    database: Dict,
    db_path: Path,
    match_plan: List[Dict],
    key,
    swap_sides: bool = False,
    batched: bool = True,
    save_every: int = 0,
) -> None:
    """``batched=True`` launches every remaining pairing as a handful of
    stacked device programs (one per policy-family pair) instead of one
    dispatch per pairing — results are bit-identical; the crash-safe DB
    save granularity becomes one save per batch instead of per pair
    (the reference saved per EPISODE, arena.py:310-319; per-pair was
    already this framework's documented deviation).

    ``save_every=N`` restores finer crash granularity on either path:
    the plan is split into slices of at most N episodes, each slice
    runs as its own device program (batched: one program per slice;
    sequential: one program per split job, saved after each), and the
    DB is saved after every slice — at most N games are lost to a
    crash, and a rerun's
    incremental match plan (create_match_plan) resumes from the last
    save. ``save_every=1`` is the reference's per-episode granularity
    (arena.py:310-319) at one device program per game."""
    entries = _entries_from_db(database)
    jobs = []
    job_pair = []
    for item in match_plan:
        a = entries[item["p1_id"]]
        b = entries[item["p2_id"]]
        n = item["episodes_to_run"]
        if swap_sides:
            seatings = [(a, b, n // 2), (b, a, n - n // 2)]
        else:
            seatings = [(a, b, n)]
        for top, bottom, m in seatings:
            if m == 0:
                continue
            if save_every > 0:
                # split so no slice element exceeds the save budget (on the
                # sequential path each split job is played and saved on its
                # own, so save_every bounds crash loss there too)
                while m > save_every:
                    jobs.append((top, bottom, save_every))
                    job_pair.append((a.id, b.id, n))
                    m -= save_every
            jobs.append((top, bottom, m))
            job_pair.append((a.id, b.id, n))

    wins: Dict = {}

    def record(played_slice, pair_slice):
        for (top, bottom, res), (aid, bid, _n) in zip(
            played_slice, pair_slice
        ):
            sa = np.asarray(res.score_a)
            sb = np.asarray(res.score_b)
            now = datetime.now(timezone.utc).isoformat()
            for g in range(len(sa)):
                winner = (top.id if sa[g] > sb[g]
                          else (bottom.id if sb[g] > sa[g] else "draw"))
                database["match_history"].append({
                    "p1": top.id, "p2": bottom.id, "winner": winner,
                    "p1_score": int(sa[g]), "p2_score": int(sb[g]),
                    "timestamp": now,
                })
            w = wins.setdefault((aid, bid), {aid: 0, bid: 0})
            w[top.id] += int(np.sum(sa > sb))
            w[bottom.id] += int(np.sum(sb > sa))

    if batched and jobs:
        if save_every > 0:
            # bounded-loss slices: <= save_every episodes per program+save
            i = 0
            while i < len(jobs):
                j, budget = i, save_every
                while j < len(jobs) and jobs[j][2] <= budget:
                    budget -= jobs[j][2]
                    j += 1
                j = max(j, i + 1)
                key, k_slice = jax.random.split(key)
                record(runner.play_pairs_batched(jobs[i:j], k_slice),
                       job_pair[i:j])
                save_database(db_path, database)  # resume point per slice
                i = j
        else:
            record(runner.play_pairs_batched(jobs, key), job_pair)
            save_database(db_path, database)      # resume point per batch
    else:
        for (top, bottom, m), pair in zip(jobs, job_pair):
            key, k_match = jax.random.split(key)
            record([(top, bottom, runner.play(top, bottom, m, k_match))],
                   [pair])
            save_database(db_path, database)      # resume point per pair
    for (aid, bid, n) in dict.fromkeys(job_pair):
        w = wins[(aid, bid)]
        print(f"[arena] {aid} vs {bid}: +{n} games ({w[aid]}-{w[bid]})"
              + (" [side-balanced]" if swap_sides else ""))


def generate_summary_report(database: Dict):
    import pandas as pd

    ids = [m["id"] for m in database["models"]]
    stats = {m: {"win": 0, "lose": 0, "draw": 0} for m in ids}
    for rec in database["match_history"]:
        p1, p2, w = rec["p1"], rec["p2"], rec["winner"]
        if p1 not in stats or p2 not in stats:
            continue
        if w == "draw":
            stats[p1]["draw"] += 1
            stats[p2]["draw"] += 1
        else:
            loser = p2 if w == p1 else p1
            stats[w]["win"] += 1
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
    return pd.DataFrame(rows).sort_values(
        "win_rate", ascending=False
    ).reset_index(drop=True)


def h2h_matrix(database: Dict):
    ids = [m["id"] for m in database["models"]]
    pos = {m: i for i, m in enumerate(ids)}
    n = len(ids)
    wins = np.zeros((n, n))
    games = np.zeros((n, n))
    for rec in database["match_history"]:
        if rec["p1"] not in pos or rec["p2"] not in pos:
            continue
        i, j = pos[rec["p1"]], pos[rec["p2"]]
        games[i, j] += 1
        games[j, i] += 1
        if rec["winner"] == rec["p1"]:
            wins[i, j] += 1
        elif rec["winner"] == rec["p2"]:
            wins[j, i] += 1
    h2h = np.where(games > 0, wins / np.maximum(games, 1), np.nan)
    np.fill_diagonal(h2h, np.nan)
    return ids, h2h


def run_arena(
    cfg,
    ckpt_dir,
    db_path,
    out_dir,
    episodes_per_match: int = 100,
    include_bot: bool = True,
    seed: int = 0,
    candidates: Optional[List[Dict]] = None,
    bot_tolerance: float = 0.02,   # ref arena.py:213
    swap_sides: bool = False,
    save_every: int = 0,
) -> int:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    db_path = Path(db_path)

    database = load_database(db_path)
    if candidates is None:
        dirs = ckpt_dir if isinstance(ckpt_dir, (list, tuple)) else [ckpt_dir]
        found = discover_models(dirs, include_bot=include_bot)
        candidates = [
            {"id": e.id, "type": e.type_name, "path": e.path,
             "description": f"auto-discovered from {e.path}" if e.path else "baseline bot"}
            for e in found
        ]
    register_models(database, candidates)
    save_database(db_path, database)

    plan = create_match_plan(database, episodes_per_match)
    total = sum(p["episodes_to_run"] for p in plan)
    print(f"[arena] {len(database['models'])} models, "
          f"{len(plan)} pairings with {total} games remaining")

    env_params = env_params_from_config(cfg.env)
    runner = MatchRunner(env_params, bot_tolerance=bot_tolerance)
    run_tournament(runner, database, db_path, plan, jax.random.PRNGKey(seed),
                   swap_sides=swap_sides, save_every=save_every)

    summary = generate_summary_report(database)
    ts = datetime.now().strftime("%Y%m%d_%H%M%S")
    summary.to_csv(out / f"summary_ranking_{ts}.csv", index=False)
    ids, h2h = h2h_matrix(database)
    if len(ids) >= 2:
        plot_win_rate_bars(list(summary["model"]), list(summary["win_rate"]),
                           str(out / f"win_rates_{ts}.png"))
        plot_h2h_heatmap(ids, h2h, str(out / f"h2h_heatmap_{ts}.png"))
    print(summary.to_string(index=False))
    return 0
