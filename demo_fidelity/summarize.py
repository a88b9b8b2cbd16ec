"""Summarize the fidelity A/Bs (see run_study.sh) into a table + plot."""

import glob
import json
import os
import re

HERE = os.path.dirname(os.path.abspath(__file__))


def read_metrics(run_dir):
    path = os.path.join(run_dir, "train_qnet_metrics.jsonl")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def eps_curve(rows):
    """(episode, epsilon) from interval events."""
    return [(r["episode"], r["epsilon"]) for r in rows
            if r.get("event") == "interval"]


def evals(rows):
    return [r for r in rows if r.get("event") == "eval"]


def main():
    runs = sorted(
        d for d in glob.glob(os.path.join(HERE, "*_s[0-9]"))
        if os.path.isdir(d)
    )
    by_name = {os.path.basename(d): read_metrics(d) for d in runs}

    print("## A/B 1 — epsilon decay granularity (exact per-episode vs "
          "per-chunk)\n")
    print("| run | eval win-vs-bot per 1500-ep block | final epsilon |")
    print("|---|---|---|")
    for name, rows in by_name.items():
        if not name.startswith("eps_") or not rows:
            continue
        ev = [f"{e['win_vs_pool']:.3f}" for e in evals(rows)]
        curve = eps_curve(rows)
        fin = f"{curve[-1][1]:.4f}" if curve else "-"
        print(f"| {name} | {' '.join(ev)} | {fin} |")

    print("\n## A/B 2 — frozen-A noise (mu-greedy vs reference stale-noise)\n")
    print("| run | per-try (gen:win_vs_A) | promoted gens |")
    print("|---|---|---|")
    for name, rows in by_name.items():
        if not name.startswith("a_") or not rows:
            continue
        ev = [f"g{e['generation']}:{e['win_vs_A']:.3f}" for e in evals(rows)]
        promos = sum(1 for r in rows if r.get("event") == "promoted")
        print(f"| {name} | {' '.join(ev)} | {promos} |")

    # ---- plot ----
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(11, 4))
        for name, rows in by_name.items():
            if not name.startswith("eps_") or not rows:
                continue
            curve = eps_curve(rows)
            if curve:
                style = "-" if "exact" in name else "--"
                axes[0].plot(*zip(*curve), style, label=name, alpha=0.8)
            ev = evals(rows)
            if ev:
                style = "-o" if "exact" in name else "--s"
                axes[1].plot(
                    range(1, len(ev) + 1),
                    [e["win_vs_pool"] for e in ev], style, label=name,
                    alpha=0.8,
                )
        axes[0].set_xlabel("episode")
        axes[0].set_ylabel("epsilon")
        axes[0].set_title("epsilon trajectory: per-episode vs per-chunk")
        axes[0].legend(fontsize=7)
        axes[1].set_xlabel("1500-episode block")
        axes[1].set_ylabel("balanced win rate vs bot")
        axes[1].set_title("learning curve vs fixed bot yardstick")
        axes[1].legend(fontsize=7)
        fig.tight_layout()
        out = os.path.join(HERE, "curves.png")
        fig.savefig(out, dpi=120)
        print(f"\nplot: {out}")
    except Exception as e:  # matplotlib optional
        print(f"\n(plot skipped: {e})")


if __name__ == "__main__":
    main()
