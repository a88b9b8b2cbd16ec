"""Round-robin + arena tournament tests (tiny scales)."""

import json

import jax
import numpy as np

from pingpong_tpu.checkpoint.serialize import qnet_rnn_to_dict, qnet_to_dict
from pingpong_tpu.checkpoint.store import save_checkpoint
from pingpong_tpu.config import ExperimentConfig, EnvConfig
from pingpong_tpu.evaluation.arena import (
    create_match_plan,
    load_database,
    run_arena,
)
from pingpong_tpu.evaluation.round_robin import run_round_robin
from pingpong_tpu.models import qnet_init, qnet_rnn_init

import dataclasses


def make_ckpts(tmp_path):
    d = tmp_path / "ckpts"
    save_checkpoint(d / "model5-1", {"params_b": qnet_to_dict(
        qnet_init(jax.random.PRNGKey(0)))})
    save_checkpoint(d / "model5-2", {"params_b": qnet_to_dict(
        qnet_init(jax.random.PRNGKey(1)))})
    save_checkpoint(d / "rnn_1", {"params_b": qnet_rnn_to_dict(
        qnet_rnn_init(jax.random.PRNGKey(2), feature_dim=32,
                      lstm_hidden_dim=16, head_hidden_dim=0))})
    return d


def small_cfg():
    return dataclasses.replace(
        ExperimentConfig(), env=EnvConfig(max_episode_steps=200)
    )


def test_round_robin_outputs(tmp_path):
    d = make_ckpts(tmp_path)
    out = tmp_path / "results"
    rc = run_round_robin(small_cfg(), d, out, episodes_per_match=4,
                         include_bot=True, seed=0)
    assert rc == 0
    files = sorted(p.name for p in out.iterdir())
    assert any(f.startswith("match_records_") for f in files)
    assert any(f.startswith("summary_ranking_") for f in files)
    assert any(f.startswith("win_rates_") for f in files)
    assert any(f.startswith("h2h_heatmap_") for f in files)
    import pandas as pd

    rec = pd.read_csv(next(out.glob("match_records_*.csv")))
    # 4 models (3 ckpts + bot) -> C(4,2)=6 pairs x 4 eps
    assert len(rec) == 24
    summary = pd.read_csv(next(out.glob("summary_ranking_*.csv")))
    assert len(summary) == 4
    assert (summary["games"] == 12).all()


def test_batched_pairs_bit_identical_to_sequential(tmp_path):
    """play_pairs_batched must reproduce the sequential per-pair results
    exactly (same per-job key derivation, independent lockstep games)."""
    from pingpong_tpu.env.pong import env_params_from_config
    from pingpong_tpu.evaluation.registry import MatchRunner, discover_models

    d = make_ckpts(tmp_path)
    entries = discover_models([d], include_bot=True)
    assert len(entries) == 4  # 2 QNet + 1 RNN + bot
    env_params = env_params_from_config(EnvConfig(max_episode_steps=200))
    jobs = []
    for i in range(len(entries)):
        for j in range(i + 1, len(entries)):
            jobs.append((entries[i], entries[j], 4))

    key = jax.random.PRNGKey(42)
    batched = MatchRunner(env_params).play_pairs_batched(jobs, key)

    runner2 = MatchRunner(env_params)
    k = key
    for (a, b, res_b) in batched:
        k, k_match = jax.random.split(k)
        res_s = runner2.play(a, b, 4, k_match)
        for x, y in zip(res_b, res_s):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_round_robin_swap_sides_batched(tmp_path):
    d = make_ckpts(tmp_path)
    out = tmp_path / "rr_swap"
    rc = run_round_robin(small_cfg(), d, out, episodes_per_match=4,
                         include_bot=False, swap_sides=True, batched=True)
    assert rc == 0
    recs = list(out.glob("match_records_*.csv"))
    assert recs
    import pandas as pd

    df = pd.read_csv(recs[0])
    # both seatings present per pair: each unordered pair appears with
    # both orientations
    pairs = {tuple(r) for r in df[["p1", "p2"]].itertuples(index=False)}
    assert len(pairs) == 2 * 3  # C(3,2) pairs x 2 orientations


def test_arena_resumable(tmp_path):
    d = make_ckpts(tmp_path)
    db = tmp_path / "arena_database.json"
    out = tmp_path / "results_arena"
    cfg = small_cfg()
    rc = run_arena(cfg, d, db, out, episodes_per_match=3,
                   include_bot=False, seed=0)
    assert rc == 0
    data = load_database(db)
    assert len(data["models"]) == 3
    assert len(data["match_history"]) == 3 * 3  # C(3,2)=3 pairs x 3 eps
    # resuming schedules nothing new
    plan = create_match_plan(data, 3)
    assert plan == []
    # raising the target schedules only the remainder
    plan = create_match_plan(data, 5)
    assert all(p["episodes_to_run"] == 2 for p in plan)
    # second run with higher target appends exactly the remainder
    rc = run_arena(cfg, d, db, out, episodes_per_match=5,
                   include_bot=False, seed=1)
    assert rc == 0
    data = load_database(db)
    assert len(data["match_history"]) == 3 * 5
    # records carry required keys (ref arena.py:311-318 schema)
    rec = data["match_history"][0]
    assert set(rec) == {"p1", "p2", "winner", "p1_score", "p2_score", "timestamp"}


def test_arena_save_every_kill_and_resume(tmp_path):
    """``save_every`` bounds crash loss: kill the runner mid-tournament,
    check the finished slices survived on disk, rerun to completion
    (crash granularity of ref arena.py:310-319 at save_every=1)."""
    from pingpong_tpu.env.pong import env_params_from_config
    from pingpong_tpu.evaluation.arena import (
        register_models,
        run_tournament,
        save_database,
    )
    from pingpong_tpu.evaluation.registry import MatchRunner, discover_models

    d = make_ckpts(tmp_path)
    db = tmp_path / "arena_database.json"
    cfg = small_cfg()
    database = load_database(db)
    found = discover_models([d], include_bot=False)
    register_models(database, [
        {"id": e.id, "type": e.type_name, "path": e.path} for e in found
    ])
    save_database(db, database)
    plan = create_match_plan(database, 4)       # 3 pairs x 4 eps = 12 games

    runner = MatchRunner(env_params_from_config(cfg.env))
    real_play = runner.play_pairs_batched
    calls = {"n": 0}

    def dying_play(jobs, key):
        if calls["n"] >= 2:                      # die on the third slice
            raise KeyboardInterrupt("simulated crash")
        calls["n"] += 1
        return real_play(jobs, key)

    runner.play_pairs_batched = dying_play
    try:
        run_tournament(runner, database, db, plan, jax.random.PRNGKey(0),
                       save_every=2)
    except KeyboardInterrupt:
        pass
    on_disk = load_database(db)
    # two slices of <= 2 episodes each survived the crash
    assert len(on_disk["match_history"]) == 4

    # resume: a fresh plan schedules exactly the remainder, run completes
    runner.play_pairs_batched = real_play
    plan = create_match_plan(on_disk, 4)
    assert sum(p["episodes_to_run"] for p in plan) == 8
    run_tournament(runner, on_disk, db, plan, jax.random.PRNGKey(1),
                   save_every=2)
    final = load_database(db)
    assert len(final["match_history"]) == 12
    assert create_match_plan(final, 4) == []

    # save_every=1 == the reference's per-episode granularity: every
    # program plays exactly one game
    ones = tmp_path / "db_ones.json"
    db1 = load_database(ones)
    register_models(db1, [
        {"id": e.id, "type": e.type_name, "path": e.path} for e in found
    ])
    save_database(ones, db1)
    seen = []
    runner.play_pairs_batched = lambda jobs, key: (
        seen.extend(m for _, _, m in jobs) or real_play(jobs, key)
    )
    run_tournament(runner, db1, ones, create_match_plan(db1, 2),
                   jax.random.PRNGKey(2), save_every=1)
    assert seen == [1] * 6
    assert len(load_database(ones)["match_history"]) == 6


def test_arena_registers_new_models_incrementally(tmp_path):
    d = make_ckpts(tmp_path)
    db = tmp_path / "db.json"
    out = tmp_path / "res"
    cfg = small_cfg()
    run_arena(cfg, d, db, out, episodes_per_match=2, include_bot=False, seed=0)
    n_before = len(load_database(db)["match_history"])
    # add a new model; only its pairings are scheduled
    save_checkpoint(d / "model5-3", {"params_b": qnet_to_dict(
        qnet_init(jax.random.PRNGKey(9)))})
    run_arena(cfg, d, db, out, episodes_per_match=2, include_bot=False, seed=1)
    data = load_database(db)
    assert len(data["models"]) == 4
    assert len(data["match_history"]) == n_before + 3 * 2  # 3 new pairings
