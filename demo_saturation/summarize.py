"""Aggregate champion-extension tries into the gate-pass study table.

Reads every train_qnet_metrics.jsonl under the given runs (the new
poolA/poolB/budget24k runs plus demo_strength3's 16 prior tries) and
prints, per configuration: tries, balanced-eval-vs-A distribution
(min/mean/max), per-seat means, and the implied pass probability at the
0.52 gate. Writes gate_curve.png (balanced win vs A per try, grouped by
episode budget)."""

import json
import pathlib
import sys

import numpy as np

RUNS = {
    "strength2 (8 tries x 3k, gate .55)": None,  # no jsonl committed; README
    "strength3 16x12k pool=lineage": "demo_strength3/train_qnet_metrics.jsonl",
    "poolA 6x3k pool=champion": "demo_saturation/poolA/train_qnet_metrics.jsonl",
    "poolB 6x3k pool=lineage": "demo_saturation/poolB/train_qnet_metrics.jsonl",
    "budget24k 2x24k pool=champion":
        "demo_saturation/budget24k/train_qnet_metrics.jsonl",
}


def tries_of(path):
    """Yield (win_vs_A_balanced, win_as_b, win_as_a) per completed try."""
    evs = [json.loads(l) for l in open(path)]
    out = []
    seats = None
    for e in evs:
        if e["event"] == "eval_seats" and seats is None:
            seats = (e["win_as_b"], e["win_as_a"])
        elif e["event"] == "eval":
            out.append((e["win_vs_A"],) + (seats or (np.nan, np.nan)))
            seats = None
    return out


def main():
    rows = []
    for name, path in RUNS.items():
        if path is None or not pathlib.Path(path).exists():
            continue
        t = tries_of(path)
        if not t:
            continue
        a = np.array(t)
        rows.append((name, a))
        print(f"{name}: {len(a)} tries")
        print(f"  balanced win vs A: min {a[:,0].min():.3f} "
              f"mean {a[:,0].mean():.3f} max {a[:,0].max():.3f}")
        print(f"  as-B seat mean {np.nanmean(a[:,1]):.3f}  "
              f"as-A seat mean {np.nanmean(a[:,2]):.3f}")
        print(f"  tries clearing 0.52: {(a[:,0] >= 0.52).sum()}/{len(a)}   "
              f"clearing 0.50: {(a[:,0] >= 0.50).sum()}/{len(a)}")
    if not rows:
        sys.exit("no metrics found — run run_study.sh first")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4))
    for i, (name, a) in enumerate(rows):
        x = np.full(len(a), i) + np.linspace(-0.15, 0.15, len(a))
        ax.scatter(x, a[:, 0], s=18, label=name)
    ax.axhline(0.52, color="crimson", ls="--", lw=1, label="gate 0.52")
    ax.axhline(0.50, color="gray", ls=":", lw=1)
    ax.set_xticks(range(len(rows)))
    ax.set_xticklabels([n.split()[0] for n, _ in rows], fontsize=8)
    ax.set_ylabel("balanced eval win rate vs champion (A)")
    ax.set_title("Champion-extension tries vs the 0.52 balanced gate")
    ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig("demo_saturation/gate_curve.png", dpi=120)
    print("wrote demo_saturation/gate_curve.png")


if __name__ == "__main__":
    main()
