"""Summarize the BaseModel/AdaIN head-to-head runs (VERDICT r3 Next #1).

Reads benchmarks/headtohead_r4.json (written by
``reference_headtohead.py --side report``) and prints, per model family and
side: the final-iteration pixel-FID of every run, the per-run BEST
checkpoint pixel-FID, and mean/std per side — the statistical comparison the
round-3 "basin variance" claim needed (the reference baseline was n=1).

Round-5 hygiene (VERDICT r4 Weak #5): deliberately-perturbed diagnostic runs
(biasfix / lrfix / constlr — single-lever ablations, not seeds of the shipped
config) are segregated into their own `probes` groups and EXCLUDED from the
side mean/std, so every printed aggregate is over like-for-like runs; and
run provenance that previously lived only in shell comments (ref_basemodel_s1
resuming the round-3 iter-250 checkpoint) is recorded in the JSON itself.

Usage: python scripts/headtohead_stats.py [--json benchmarks/headtohead_r4.json]
"""
from __future__ import annotations

import argparse
import json
from collections import defaultdict

import numpy as np

# single-lever diagnostic ablations: legitimate experiments, but averaging
# them into the seed aggregate misstates the shipped config's spread
PROBE_MARKERS = ("biasfix", "lrfix", "constlr")

# provenance that round 4 recorded only in scripts/h2h_r4/*.sh comments
PROVENANCE = {
    "ref_basemodel_s1": (
        "resumed from the round-3 BaseModel iter-250 checkpoint "
        "(scripts/h2h_r4/ref_basemodel_seeds.sh) — not an independent "
        "from-scratch seed before iter 250"
    ),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="benchmarks/headtohead_r4.json")
    ap.add_argument("--out", default="benchmarks/headtohead_stats_r5.json")
    cli = ap.parse_args()
    with open(cli.json) as f:
        sides = json.load(f)["headtohead"]

    groups = defaultdict(list)  # (model, side-kind, dtype[, scale]) -> rows
    for key, run in sides.items():
        cfg = run.get("config", {})
        model = cfg.get("model", "AdaINModel")
        kind = "ref" if key.startswith("ref") else "tpu"
        if any(m in key for m in PROBE_MARKERS):
            kind += "-probes"
        dtype = cfg.get("compute_dtype", "torch-f32" if kind.startswith("ref") else "?")
        # like-for-like: runs at a different scale (the round-5 flagship-scale
        # 128px/dim-64 evidence) must not enter the 96px/dim-32 aggregates
        scale = (cfg.get("crop_size", 96), cfg.get("dim", 32))
        if scale != (96, 32):
            dtype += f"/{scale[0]}px-dim{scale[1]}"
        trend = run.get("trend", [])
        if not trend:
            continue
        final = trend[-1]["fid_mean"]
        best = min(r["fid_mean"] for r in trend)
        best_it = min(trend, key=lambda r: r["fid_mean"])["iter"]
        row = {"run": key, "final": final, "best": best, "best_iter": best_it}
        if run.get("partial"):
            # incremental-eval run still in progress at snapshot time: its
            # "final" is just the last checkpoint scored so far
            row["partial_through_iter"] = trend[-1]["iter"]
        if key in PROVENANCE:
            row["provenance"] = PROVENANCE[key]
        groups[(model, kind, dtype)].append(row)

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
