"""Summarize the learning-dynamics study runs into a markdown table."""

import json
import sys
from pathlib import Path

HERE = Path(__file__).parent


def summarize(run_dir: Path):
    metrics = run_dir / "train_qnet_metrics.jsonl"
    if not metrics.is_file():
        return None
    rows = [json.loads(l) for l in open(metrics)]
    gens = {}
    for r in rows:
        ev = r.get("event")
        if ev == "try":
            g = r["generation"]
            gens.setdefault(g, {"tries": 0, "outcome": "?"})
            gens[g]["tries"] = max(gens[g]["tries"], r["try"])
        elif ev in ("promoted", "fault"):
            g = r["generation"]
            gens.setdefault(g, {"tries": 0, "outcome": "?"})
            gens[g]["outcome"] = ev
    promoted = sum(1 for g in gens.values() if g["outcome"] == "promoted")
    tries = sum(g["tries"] for g in gens.values())
    return {
        "generations": len(gens),
        "promoted": promoted,
        "total_tries": tries,
        "per_gen": {g: v for g, v in sorted(gens.items())},
    }


def main():
    print("| run | promoted | total tries | tries per generation |")
    print("|---|---|---|---|")
    for d in sorted(HERE.iterdir()):
        if not d.is_dir():
            continue
        s = summarize(d)
        if s is None:
            continue
        per = ", ".join(
            f"g{g}:{v['tries']}{'F' if v['outcome'] == 'fault' else ''}"
            for g, v in s["per_gen"].items()
        )
        print(f"| {d.name} | {s['promoted']}/{s['generations']} "
              f"| {s['total_tries']} | {per} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
