"""Command-line interface.

The reference's launcher is an interactive shell menu
(``/root/reference/run.sh:25-109``: train / train-rnn / round-robin /
arena / viewer) and its "flag system" is editing YAML and in-file dicts.
Here every workload is a subcommand with ``--config`` YAML plus dotted
``key=value`` overrides:

    python -m pingpong_tpu.cli train        --config configs/qnet.yaml
    python -m pingpong_tpu.cli train-rnn    --config configs/rnn.yaml
    python -m pingpong_tpu.cli round-robin  --ckpt-dir checkpoints --out results_round_robin
    python -m pingpong_tpu.cli arena        --ckpt-dir checkpoints --db arena_database.json
    python -m pingpong_tpu.cli view         --ckpt-dir checkpoints --out view.gif
    python -m pingpong_tpu.cli bench
"""

from __future__ import annotations

import argparse
import sys

from pingpong_tpu.config import apply_overrides, load_config


def _add_common(p: argparse.ArgumentParser):
    p.add_argument("--config", default=None, help="YAML config path")
    p.add_argument("--workdir", default=".", help="working directory for outputs")
    p.add_argument("--seed", type=int, default=None, help="override config seed")
    p.add_argument(
        "--distributed", action="store_true",
        help="multi-host: jax.distributed.initialize() before backend init; "
        "checkpoints/plots/logs are written by host 0 only",
    )
    p.add_argument(
        "overrides", nargs="*", default=[],
        help="dotted config overrides, e.g. dqn.num_envs=8192",
    )


def _load(args):
    cfg = load_config(args.config)
    cfg = apply_overrides(cfg, args.overrides)
    if args.seed is not None:
        import dataclasses

        cfg = dataclasses.replace(cfg, seed=args.seed)
    return cfg


def _distributed_setup(args) -> bool:
    """--distributed: wire DCN BEFORE any jax use (multi-host SPMD).
    Returns True when this process is the writer (host 0)."""
    if getattr(args, "distributed", False):
        from pingpong_tpu.parallel.mesh import initialize_distributed

        initialize_distributed()
    from pingpong_tpu.parallel.mesh import is_coordinator

    return is_coordinator()


def cmd_train(args) -> int:
    cfg = _load(args)
    coordinator = _distributed_setup(args)
    from pingpong_tpu.selfplay.loop import QNetSelfPlay
    from pingpong_tpu.utils.metrics import MetricsLogger

    logger = MetricsLogger(
        log_path=f"{args.workdir}/train_qnet_metrics.jsonl"
        if coordinator else None,
        echo=coordinator,
    )
    driver = QNetSelfPlay(
        cfg.env, cfg.dqn, workdir=args.workdir, seed=cfg.seed, logger=logger,
        mesh_cfg=cfg.mesh,
    )
    records = driver.run()
    promoted = sum(1 for r in records if r.promoted)
    if coordinator:
        print(f"done: {promoted}/{len(records)} generations promoted")
    try:
        if not coordinator:
            raise RuntimeError("plots are host-0 only")
        from pingpong_tpu.utils.plotting import (
            plot_reward_history,
            plot_selfplay_records,
        )

        plot_dir = f"{args.workdir}/{cfg.dqn.plot_dir}"
        plot_selfplay_records(records, f"{plot_dir}/generation_gates.png")
        plot_reward_history(
            driver.reward_history,
            f"{plot_dir}/training_iterative_rewards.png",
            title="QNet self-play: mean episode reward (B)",
        )
    except Exception as e:  # plotting must never fail the run
        if coordinator:
            print(f"[warn] plot failed: {e}", file=sys.stderr)
    return 0


def cmd_train_rnn(args) -> int:
    cfg = _load(args)
    coordinator = _distributed_setup(args)
    from pingpong_tpu.selfplay.loop_rnn import DRQNSelfPlay
    from pingpong_tpu.utils.metrics import MetricsLogger

    logger = MetricsLogger(
        log_path=f"{args.workdir}/train_rnn_metrics.jsonl"
        if coordinator else None,
        echo=coordinator,
    )
    driver = DRQNSelfPlay(
        cfg.env, cfg.drqn, workdir=args.workdir, seed=cfg.seed, logger=logger,
        mesh_cfg=cfg.mesh,
    )
    records = driver.run()
    promoted = sum(1 for r in records if r.promoted)
    if coordinator:
        print(f"done: {promoted}/{len(records)} generations promoted")
    try:
        if not coordinator:
            raise RuntimeError("plots are host-0 only")
        from pingpong_tpu.utils.plotting import plot_reward_history

        plot_reward_history(
            driver.reward_history,
            f"{args.workdir}/{cfg.drqn.plot_dir_rnn}/training_rnn_rewards.png",
            title="DRQN self-play: mean episode reward (B)",
        )
    except Exception as e:
        if coordinator:
            print(f"[warn] plot failed: {e}", file=sys.stderr)
    return 0


def cmd_round_robin(args) -> int:
    cfg = _load(args)
    from pingpong_tpu.evaluation.round_robin import run_round_robin

    return run_round_robin(
        cfg,
        ckpt_dir=args.ckpt_dir,
        out_dir=args.out,
        episodes_per_match=args.episodes,
        include_bot=not args.no_bot,
        seed=cfg.seed,
        swap_sides=args.swap_sides,
    )


def cmd_arena(args) -> int:
    cfg = _load(args)
    from pingpong_tpu.evaluation.arena import run_arena

    return run_arena(
        cfg,
        ckpt_dir=args.ckpt_dir,
        db_path=args.db,
        out_dir=args.out,
        episodes_per_match=args.episodes,
        include_bot=not args.no_bot,
        seed=cfg.seed,
        swap_sides=args.swap_sides,
        save_every=args.save_every,
    )


def cmd_view(args) -> int:
    cfg = _load(args)
    if args.live:
        # real-time match on the native C++ engine + host numpy policies
        # (no accelerator on the frame loop)
        from pingpong_tpu.selfplay.pool import load_params_any
        from pingpong_tpu.viewer.live import play_live

        params_a = load_params_any(args.model_a) if args.model_a else None
        params_b = load_params_any(args.model_b) if args.model_b else None
        play_live(cfg.env, params_a, params_b, episodes=args.episodes,
                  seed=cfg.seed, size=cfg.env.render_size)
        return 0
    from pingpong_tpu.viewer.replay import run_viewer

    return run_viewer(
        cfg,
        model_a=args.model_a,
        model_b=args.model_b,
        out=args.out,
        episodes=args.episodes,
        interactive=args.interactive,
        seed=cfg.seed,
    )


def cmd_import_torch(args) -> int:
    import os

    from pingpong_tpu.tools.import_torch import (
        import_torch_checkpoint,
        import_torch_dir,
    )

    if os.path.isdir(args.src):
        results = import_torch_dir(args.src, args.dst)
        ok = sum(1 for v in results.values() if v)
        print(f"imported {ok}/{len(results)} checkpoints into {args.dst}")
        return 0 if ok else 1
    out = import_torch_checkpoint(args.src, args.dst)
    print(f"imported {args.src} -> {out}")
    return 0


def cmd_bench(args) -> int:
    import subprocess

    return subprocess.call([sys.executable, "bench.py"])


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="pingpong_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train", help="QNet iterative self-play")
    _add_common(p)
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("train-rnn", help="DRQN (LSTM) iterative self-play")
    _add_common(p)
    p.set_defaults(fn=cmd_train_rnn)

    p = sub.add_parser("round-robin", help="all-pairs tournament over checkpoints")
    _add_common(p)
    p.add_argument("--ckpt-dir", default="checkpoints",
                   help="checkpoint dir (relative to CWD, not --workdir)")
    p.add_argument("--out", default="results_round_robin")
    p.add_argument("--episodes", type=int, default=100)
    p.add_argument("--no-bot", action="store_true")
    p.add_argument("--swap-sides", action="store_true",
                   help="side-balanced: half the games per seating")
    p.set_defaults(fn=cmd_round_robin)

    p = sub.add_parser("arena", help="persistent resumable tournament")
    _add_common(p)
    p.add_argument("--ckpt-dir", default="checkpoints",
                   help="checkpoint dir (relative to CWD, not --workdir)")
    p.add_argument("--db", default="arena_database.json")
    p.add_argument("--out", default="results_arena")
    p.add_argument("--episodes", type=int, default=100)
    p.add_argument("--no-bot", action="store_true")
    p.add_argument("--swap-sides", action="store_true",
                   help="side-balanced: half the games per seating")
    p.add_argument("--save-every", type=int, default=0,
                   help="save the DB every N episodes (crash granularity; "
                        "1 = reference per-episode saves, 0 = per batch)")
    p.set_defaults(fn=cmd_arena)

    p = sub.add_parser("view", help="render an episode between two checkpoints")
    _add_common(p)
    p.add_argument("--model-a", default=None, help="checkpoint path (default: bot)")
    p.add_argument("--model-b", default=None, help="checkpoint path (default: bot)")
    p.add_argument("--out", default="view.gif")
    p.add_argument("--episodes", type=int, default=1)
    p.add_argument("--interactive", action="store_true", help="pygame window")
    p.add_argument(
        "--live", action="store_true",
        help="real-time pygame match on the native C++ engine "
             "(host inference, no accelerator)",
    )
    p.set_defaults(fn=cmd_view)

    p = sub.add_parser(
        "import-torch",
        help="convert reference .pth checkpoints to the native format",
    )
    p.add_argument("src", help=".pth file or a directory of .pth files")
    p.add_argument("dst", help="output checkpoint dir (or parent dir for batches)")
    p.set_defaults(fn=cmd_import_torch)

    p = sub.add_parser("bench", help="run the headline benchmark")
    p.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    try:
        return args.fn(args)
    except FileNotFoundError as e:
        print(f"error: file not found: {e.filename or e}", file=sys.stderr)
        return 2
    except KeyError as e:
        # config override / schema errors carry their message in args[0]
        print(f"error: {e.args[0] if e.args else e}", file=sys.stderr)
        return 2
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2


if __name__ == "__main__":
    raise SystemExit(main())
