"""Summarize the BaseModel/AdaIN head-to-head runs (VERDICT r3 Next #1).

Reads benchmarks/headtohead_r4.json (written by
``reference_headtohead.py --side report``) and prints, per model family and
side: the final-iteration pixel-FID of every run, the per-run BEST
checkpoint pixel-FID, and mean/std per side — the statistical comparison the
round-3 "basin variance" claim needed (the reference baseline was n=1).

Usage: python scripts/headtohead_stats.py [--json benchmarks/headtohead_r4.json]
"""
from __future__ import annotations

import argparse
import json
from collections import defaultdict

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="benchmarks/headtohead_r4.json")
    ap.add_argument("--out", default="benchmarks/headtohead_stats_r4.json")
    cli = ap.parse_args()
    with open(cli.json) as f:
        sides = json.load(f)["headtohead"]

    groups = defaultdict(list)  # (model, side-kind, dtype) -> rows
    for key, run in sides.items():
        cfg = run.get("config", {})
        model = cfg.get("model", "AdaINModel")
        kind = "ref" if key.startswith("ref") else "tpu"
        dtype = cfg.get("compute_dtype", "torch-f32" if kind == "ref" else "?")
        trend = run.get("trend", [])
        if not trend:
            continue
        final = trend[-1]["fid_mean"]
        best = min(r["fid_mean"] for r in trend)
        best_it = min(trend, key=lambda r: r["fid_mean"])["iter"]
        groups[(model, kind, dtype)].append(
            {"run": key, "final": final, "best": best, "best_iter": best_it}
        )

    report = {}
    for (model, kind, dtype), rows in sorted(groups.items()):
        finals = np.array([r["final"] for r in rows])
        bests = np.array([r["best"] for r in rows])
        label = f"{model}/{kind}/{dtype}"
        report[label] = {
            "n": len(rows),
            "runs": rows,
            "final_mean": round(float(finals.mean()), 3),
            "final_std": round(float(finals.std(ddof=1)), 3) if len(rows) > 1 else None,
            "best_mean": round(float(bests.mean()), 3),
            "best_std": round(float(bests.std(ddof=1)), 3) if len(rows) > 1 else None,
        }
        print(f"{label}: n={len(rows)}")
        for r in rows:
            print(f"  {r['run']:32s} final={r['final']:6.3f}  best={r['best']:6.3f} @it{r['best_iter']}")
        print(f"  final: mean={report[label]['final_mean']} std={report[label]['final_std']}")
        print(f"  best : mean={report[label]['best_mean']} std={report[label]['best_std']}")

    with open(cli.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"\nwritten -> {cli.out}")


if __name__ == "__main__":
    main()
