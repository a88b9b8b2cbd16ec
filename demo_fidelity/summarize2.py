"""Re-powered fidelity A/B analysis (round-4 VERDICT item 4).

Merges the round-4 runs (seeds 0-1, parsed from the committed study.log
— the workdirs were cleaned after round 4) with the round-5 runs (seeds
2-3 for A/B 1-2; seeds 0-3 for the new A/B 3 binding study, whose
workdir metrics are read directly), then applies one decision rule to
every A/B:

    flag a deviation iff |arm-mean gap| > 2 * sigma_pool / sqrt(n),

with sigma_pool the pooled between-seed standard deviation of the
per-run outcome and n = seeds per arm. Writes summary2.md.
"""

import glob
import json
import math
import os
import re
import statistics

HERE = os.path.dirname(os.path.abspath(__file__))


def parse_study_log():
    """Recover per-run eval series for the cleaned round-4 runs."""
    runs = {}
    cur = []
    for line in open(os.path.join(HERE, "study.log")):
        m = re.search(
            r"event=eval generation=(\d+) win_vs_A=([\d.]+) "
            r"win_vs_pool=([\d.]+)", line)
        if m:
            cur.append(dict(generation=int(m.group(1)),
                            win_vs_A=float(m.group(2)),
                            win_vs_pool=float(m.group(3))))
        m = re.search(r"event=promoted generation=(\d+)", line)
        if m:
            cur.append(dict(promoted=True))
        m = re.match(r"RUN_DONE (\S+)", line)
        if m:
            runs[m.group(1)] = cur
            cur = []
    return runs


def read_run(name):
    p = os.path.join(HERE, name, "train_qnet_metrics.jsonl")
    if not os.path.exists(p):
        return None
    rows = [json.loads(l) for l in open(p) if l.strip()]
    out = []
    for r in rows:
        if r.get("event") == "eval":
            out.append(dict(generation=r.get("generation", 0),
                            win_vs_A=r["win_vs_A"],
                            win_vs_pool=r["win_vs_pool"]))
        elif r.get("event") == "promoted":
            out.append(dict(promoted=True))
    return out


def get_runs(prefix, seeds):
    logged = parse_study_log()
    out = {}
    for s in seeds:
        for arm in prefix[1]:
            name = f"{prefix[0]}_{arm}_s{s}"
            ev = read_run(name)
            if ev is None:
                ev = logged.get(name)
            if ev:
                out[(arm, s)] = ev
    return out


def arm_stats(runs, arms, outcome):
    per_arm = {}
    for arm in arms:
        vals = [outcome(ev) for (a, s), ev in sorted(runs.items())
                if a == arm]
        per_arm[arm] = vals
    means = {a: statistics.mean(v) for a, v in per_arm.items()}
    sds = {a: (statistics.stdev(v) if len(v) > 1 else float("nan"))
           for a, v in per_arm.items()}
    a0, a1 = arms
    gap = means[a0] - means[a1]
    pooled = math.sqrt((sds[a0] ** 2 + sds[a1] ** 2) / 2)
    n = min(len(per_arm[a0]), len(per_arm[a1]))
    thresh = 2 * pooled / math.sqrt(n)
    return per_arm, means, sds, gap, pooled, n, thresh


def fmt_rule(gap, pooled, n, thresh):
    verdict = "FLAG" if abs(gap) > thresh else "no effect"
    return (f"gap {gap:+.4f} vs decision threshold 2*sigma/sqrt(n) = "
            f"{thresh:.4f} (pooled seed sigma {pooled:.4f}, n={n}) -> "
            f"**{verdict}**")


def mean_win_pool(ev):
    return statistics.mean(e["win_vs_pool"] for e in ev if "win_vs_pool" in e)


def mean_win_a(ev):
    return statistics.mean(e["win_vs_A"] for e in ev if "win_vs_A" in e)


def sd_win_a(ev):
    vals = [e["win_vs_A"] for e in ev if "win_vs_A" in e]
    return statistics.stdev(vals) if len(vals) > 1 else float("nan")


def promos(ev):
    return sum(1 for e in ev if e.get("promoted"))


def main():
    lines = []
    p = lines.append
    p("# Re-powered fidelity A/Bs (round 5) — n=4 seeds per arm\n")
    p("Decision rule (uniform across studies): flag a deviation iff the")
    p("arm-mean gap exceeds 2*sigma_pool/sqrt(n) (pooled between-seed")
    p("sigma of the per-run outcome). Seeds 0-1 of A/B 1-2 are the")
    p("committed round-4 runs (parsed from study.log); seeds 2-3 and the")
    p("whole A/B 3 are fresh round-5 runs (run_study2a.sh/run_study2b.sh).\n")

    # ---- A/B 1 ------------------------------------------------------------
    runs_eps = runs = get_runs(("eps", ("exact", "chunk")), range(4))
    p("## A/B 1 — epsilon decay granularity (exact per-episode vs "
      "per-chunk)\n")
    p("| run | win-vs-bot per block | run mean |")
    p("|---|---|---|")
    for (arm, s), ev in sorted(runs.items()):
        blocks = " ".join(f"{e['win_vs_pool']:.3f}" for e in ev
                          if "win_vs_pool" in e)
        p(f"| eps_{arm}_s{s} | {blocks} | {mean_win_pool(ev):.4f} |")
    _, means, sds, gap, pooled, n, thresh = arm_stats(
        runs, ("exact", "chunk"), mean_win_pool)
    p(f"\narm means: exact {means['exact']:.4f} (sd {sds['exact']:.4f}), "
      f"chunk {means['chunk']:.4f} (sd {sds['chunk']:.4f});")
    p(fmt_rule(gap, pooled, n, thresh) + "\n")

    # ---- A/B 2 ------------------------------------------------------------
    runs = get_runs(("a", ("mu", "stale")), range(4))
    p("## A/B 2 — frozen-A noise (mu-greedy vs reference stale-noise)\n")
    p("| run | tries | mean win_vs_A | per-try sd | promoted |")
    p("|---|---|---|---|---|")
    for (arm, s), ev in sorted(runs.items()):
        n_tries = sum(1 for e in ev if "win_vs_A" in e)
        p(f"| a_{arm}_s{s} | {n_tries} | {mean_win_a(ev):.4f} | "
          f"{sd_win_a(ev):.4f} | {promos(ev)} |")
    for label, outcome in (("mean win_vs_A", mean_win_a),
                           ("promotions", promos),
                           ("per-try sd of win_vs_A (variance claim)",
                            sd_win_a)):
        _, means, sds, gap, pooled, n, thresh = arm_stats(
            runs, ("mu", "stale"), outcome)
        p(f"\noutcome `{label}`: mu {means['mu']:.4f} "
          f"(sd {sds['mu']:.4f}), stale {means['stale']:.4f} "
          f"(sd {sds['stale']:.4f}); " + fmt_rule(gap, pooled, n, thresh))
    p("")

    # ---- A/B 3 ------------------------------------------------------------
    runs_bind = runs = get_runs(("bind", ("bucketed", "sorted")), range(4))
    p("## A/B 3 — opponent binding (bucketed vs iid 'sorted'), fixed "
      "3-member pool\n")
    p("Pool = {bot, scratch5-8, league1_champ} (weak/mid/strong — "
      "maximal episode-length/strength correlation, the exact joint-"
      "distribution deviation under test), ratio 0.5, thresholds "
      "unreachable, same seeds across arms.\n")
    p("| run | win_vs_pool per block | mean | mean win_vs_A |")
    p("|---|---|---|---|")
    for (arm, s), ev in sorted(runs.items()):
        blocks = " ".join(f"{e['win_vs_pool']:.3f}" for e in ev
                          if "win_vs_pool" in e)
        p(f"| bind_{arm}_s{s} | {blocks} | {mean_win_pool(ev):.4f} | "
          f"{mean_win_a(ev):.4f} |")
    for label, outcome in (("mean win_vs_pool (fixed-field yardstick)",
                            mean_win_pool),
                           ("mean win_vs_A", mean_win_a)):
        _, means, sds, gap, pooled, n, thresh = arm_stats(
            runs, ("bucketed", "sorted"), outcome)
        p(f"\noutcome `{label}`: bucketed {means['bucketed']:.4f} "
          f"(sd {sds['bucketed']:.4f}), sorted {means['sorted']:.4f} "
          f"(sd {sds['sorted']:.4f}); " + fmt_rule(gap, pooled, n, thresh))
    # paired analysis (same seeds across arms) for the yardstick
    diffs = []
    for s in range(4):
        b = runs.get(("bucketed", s))
        so = runs.get(("sorted", s))
        if b and so:
            diffs.append(mean_win_pool(b) - mean_win_pool(so))
    if len(diffs) > 1:
        md = statistics.mean(diffs)
        sd = statistics.stdev(diffs)
        p(f"\npaired per-seed differences (bucketed - sorted, yardstick): "
          f"{' '.join(f'{d:+.4f}' for d in diffs)}; mean {md:+.4f} +/- "
          f"{2 * sd / math.sqrt(len(diffs)):.4f} (2 SE)")
    p("")

    out = os.path.join(HERE, "summary2.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"\nwrote {out}")

    # scope the try to the imports only: a data bug in the plot path
    # should fail loudly, not masquerade as "matplotlib missing"
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError as e:
        print(f"(plot skipped: {e})")
        return
    if True:
        fig, axes = plt.subplots(1, 2, figsize=(11, 4))
        for (arm, s), ev in sorted(runs_eps.items()):
            ys = [e["win_vs_pool"] for e in ev if "win_vs_pool" in e]
            style = "-o" if arm == "exact" else "--s"
            axes[0].plot(range(1, len(ys) + 1), ys, style,
                         label=f"eps_{arm}_s{s}", alpha=0.75)
        axes[0].set_xlabel("1500-episode block")
        axes[0].set_ylabel("balanced win rate vs bot")
        axes[0].set_title("A/B 1 (n=4/arm): per-episode vs per-chunk "
                          "epsilon decay")
        axes[0].legend(fontsize=6, ncol=2)
        for (arm, s), ev in sorted(runs_bind.items()):
            ys = [e["win_vs_pool"] for e in ev if "win_vs_pool" in e]
            style = "-o" if arm == "bucketed" else "--s"
            axes[1].plot(range(1, len(ys) + 1), ys, style,
                         label=f"bind_{arm}_s{s}", alpha=0.75)
        axes[1].set_xlabel("1500-episode block")
        axes[1].set_ylabel("win rate vs fixed 3-member pool")
        axes[1].set_title("A/B 3 (n=4/arm): bucketed vs iid binding")
        axes[1].legend(fontsize=6, ncol=2)
        fig.tight_layout()
        png = os.path.join(HERE, "curves2.png")
        fig.savefig(png, dpi=120)
        print(f"plot: {png}")


if __name__ == "__main__":
    main()
