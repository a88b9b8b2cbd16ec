"""Config loader/overrides + metrics/plotting utility tests."""

import json

import numpy as np
import pytest

from pingpong_tpu.config import apply_overrides, load_config
from pingpong_tpu.config.loader import to_dict
from pingpong_tpu.config.schema import experiment_from_dict
from pingpong_tpu.utils.metrics import MetricsLogger, WinRateWindow
from pingpong_tpu.utils.plotting import plot_reward_history, plot_win_rate_bars


def test_load_defaults_and_yaml(tmp_path):
    cfg = load_config(None)
    assert cfg.env.max_score == 3
    y = tmp_path / "c.yaml"
    y.write_text(
        "seed: 7\nenv:\n  max_score: 5\n  ball_speed_range: [0.02, 0.04]\n"
        "dqn:\n  num_envs: 128\n  selfplay:\n    max_generations: 2\n"
    )
    cfg = load_config(y)
    assert cfg.seed == 7
    assert cfg.env.max_score == 5
    assert cfg.env.ball_speed_range == (0.02, 0.04)
    assert cfg.dqn.num_envs == 128
    assert cfg.dqn.selfplay.max_generations == 2
    # untouched defaults survive partial yaml
    assert cfg.dqn.gamma == 0.99


def test_unknown_yaml_key_rejected():
    with pytest.raises(KeyError):
        experiment_from_dict({"env": {"no_such_key": 1}})


def test_overrides_types_and_nesting():
    cfg = load_config(None)
    cfg = apply_overrides(cfg, [
        "dqn.num_envs=64",
        "dqn.lr=0.001",
        "env.enable_spin=False",
        "dqn.selfplay.curr_win_threshold=0.5",
        "dqn.ckpt_dir=elsewhere",
    ])
    assert cfg.dqn.num_envs == 64 and isinstance(cfg.dqn.num_envs, int)
    assert cfg.dqn.lr == 0.001
    assert cfg.env.enable_spin is False
    assert cfg.dqn.selfplay.curr_win_threshold == 0.5
    assert cfg.dqn.ckpt_dir == "elsewhere"


def test_override_errors():
    cfg = load_config(None)
    with pytest.raises(KeyError):
        apply_overrides(cfg, ["dqn.not_a_field=1"])
    with pytest.raises(ValueError):
        apply_overrides(cfg, ["missing_equals"])


def test_yaml_style_boolean_overrides():
    """Lowercase true/false must parse as real booleans. The regression
    this pins: '=false' used to fall through ast.literal_eval to the
    TRUTHY string "false" — every committed study that passed
    train_heads_only=false silently trained heads-only."""
    cfg = load_config(None)
    cfg = apply_overrides(cfg, [
        "dqn.train_heads_only=false",
        "dqn.use_pallas_update=true",
        "drqn.episode_uniform_sampling=TRUE",
    ])
    assert cfg.dqn.train_heads_only is False
    assert cfg.dqn.use_pallas_update is True
    assert cfg.drqn.episode_uniform_sampling is True
    # and a non-boolean into a boolean field is a clean error (exit-2 path)
    with pytest.raises(ValueError):
        apply_overrides(cfg, ["dqn.use_pallas_update=nope"])


def test_to_dict_roundtrip():
    cfg = load_config(None)
    d = to_dict(cfg)
    cfg2 = experiment_from_dict(json.loads(json.dumps(d)))
    assert cfg2.dqn.memory_size == cfg.dqn.memory_size


def test_win_rate_window_trims():
    # soft cap: chunks are dropped only while >= maxlen games remain
    w = WinRateWindow(maxlen=10)
    w.add(6, 3)
    w.add(6, 6)       # 12 games: dropping the first would leave 6 < 10
    assert w.games == 12
    w.add(8, 0)       # 20 games: first chunk (6) drops -> 14
    assert w.games == 14
    assert abs(w.rate() - 6 / 14) < 1e-9
    w.add(0, 0)       # no-op
    assert w.games == 14


def test_metrics_logger_jsonl(tmp_path):
    path = tmp_path / "m.jsonl"
    log = MetricsLogger(log_path=str(path), echo=False)
    log.log({"event": "x", "v": 1.5})
    log.log({"event": "y"})
    log.close()
    lines = [json.loads(l) for l in path.read_text().splitlines()]
    assert lines[0]["v"] == 1.5 and lines[1]["event"] == "y"


def test_plotting_outputs(tmp_path):
    p1 = plot_reward_history(
        list(np.sin(np.linspace(0, 6, 120))), str(tmp_path / "r.png")
    )
    assert p1 and (tmp_path / "r.png").exists()
    assert plot_reward_history([], str(tmp_path / "none.png")) is None
    p2 = plot_win_rate_bars(["a", "b"], [0.7, 0.3], str(tmp_path / "w.png"))
    assert (tmp_path / "w.png").exists()
