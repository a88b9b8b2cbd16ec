"""Bradley-Terry fit over a round-robin match_records CSV.

Round-5 league closure (round-4 VERDICT item 6): ratings + standard
errors from the H2H matrix, so headline claims carry their own CIs.

Usage: python demo_league/bt_fit.py demo_league/results5/match_records_*.csv
"""

import csv
import glob
import math
import sys

import numpy as np


def load_wins(path):
    rows = list(csv.DictReader(open(path)))
    names = sorted({r["p1"] for r in rows} | {r["p2"] for r in rows})
    idx = {n: i for i, n in enumerate(names)}
    W = np.zeros((len(names), len(names)))
    draws = 0
    for r in rows:
        i, j = idx[r["p1"]], idx[r["p2"]]
        if r["winner"] == r["p1"]:
            W[i, j] += 1
        elif r["winner"] == r["p2"]:
            W[j, i] += 1
        elif r["winner"] == "draw":
            # arena/round_robin write winner="draw" on equal scores; the
            # standard BT tie handling is half a win each (fractional
            # counts are fine for the MM update and the Fisher info)
            W[i, j] += 0.5
            W[j, i] += 0.5
            draws += 1
        else:
            raise ValueError(
                f"malformed match row: winner={r['winner']!r} is neither "
                f"{r['p1']!r}, {r['p2']!r}, nor 'draw'"
            )
    if draws:
        print(f"# note: {draws} drawn games counted as half-wins")
    return names, W


def bt_fit(W, iters=5000, tol=1e-12):
    """MM algorithm for Bradley-Terry MLE; returns log-strengths
    (geometric-mean-centered) and their standard errors from the observed
    Fisher information (last entrant anchored for identifiability, then
    re-centered)."""
    n = W.shape[0]
    p = np.ones(n)
    for _ in range(iters):
        newp = np.zeros(n)
        for i in range(n):
            den = sum(
                (W[i, j] + W[j, i]) / (p[i] + p[j]) for j in range(n) if j != i
            )
            newp[i] = W[i].sum() / den
        newp /= np.exp(np.mean(np.log(newp)))
        if np.max(np.abs(np.log(newp) - np.log(p))) < tol:
            p = newp
            break
        p = newp
    L = np.log(p)
    info = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            g = W[i, j] + W[j, i]
            pij = p[i] / (p[i] + p[j])
            info[i, i] += g * pij * (1 - pij)
            info[i, j] -= g * pij * (1 - pij)
    cov = np.zeros((n, n))
    cov[:-1, :-1] = np.linalg.inv(info[:-1, :-1])
    se = np.sqrt(np.diag(cov))
    return L, se, cov


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else None
    if path is None or not glob.glob(path):
        paths = sorted(glob.glob("demo_league/results5/match_records_*.csv"))
        path = paths[-1]
    else:
        path = sorted(glob.glob(path))[-1]
    names, W = load_wins(path)
    L, se, cov = bt_fit(W)
    elo = 400.0 / math.log(10)
    order = np.argsort(-L)
    print(f"# Bradley-Terry fit: {path}")
    print(f"{'model':20s} {'logL':>8s} {'se':>6s} {'Elo':>6s}")
    for k in order:
        print(f"{names[k]:20s} {L[k]:+8.3f} {se[k]:6.3f} {elo*L[k]:+6.0f}")
    a, b = order[0], order[1]
    d = L[a] - L[b]
    sed = math.sqrt(cov[a, a] + cov[b, b] - 2 * cov[a, b])
    print(
        f"\ntop-2 gap {names[a]} - {names[b]}: "
        f"dL={d:+.4f} +/- {1.96*sed:.4f} (95%), Elo {elo*d:+.1f} +/- "
        f"{elo*1.96*sed:.1f}"
    )
    g = W[a, b] + W[b, a]
    if g:
        r = W[a, b] / g
        print(
            f"head-to-head {names[a]} vs {names[b]}: {W[a,b]:.0f}/{g:.0f} ="
            f" {r:.4f} +/- {1.96*math.sqrt(r*(1-r)/g):.4f} (95%)"
        )


if __name__ == "__main__":
    main()
