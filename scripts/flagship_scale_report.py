"""Assemble benchmarks/quality_trend_r5.json — flagship-scale BaseModel
evidence, both sides at one scale (VERDICT r4 Missing #4 / Next #4).

Reads the flagship-scale head-to-head results written by
scripts/h2h_r5/flagship_scale.sh (128px / dim 64 — the scale of the r3
quality-trend collapse) from /tmp/headtohead, computes per-run best
checkpoints (init included: iter 0 is scored on both sides), and states the
verdict the round-4 judge asked for:

- if the reference also peaks early / never beats init at this scale, the
  "config past its stability horizon" claim is proven at the scale it was
  made about;
- if the reference improves while the tpu best stays iteration 0, that is a
  framework defect by definition.

Run: python scripts/flagship_scale_report.py [--dir /tmp/headtohead]
"""
from __future__ import annotations

import argparse
import glob
import json
import os


def load_runs(run_dir: str):
    runs = {}
    for path in sorted(glob.glob(os.path.join(run_dir, "*_results_basemodel_scale*.json"))):
        name = os.path.basename(path)[: -len(".json")].replace("_results", "")
        with open(path) as f:
            runs[name] = json.load(f)
    return runs


def summarize(run: dict):
    trend = run.get("trend", [])
    if not trend:
        return None
    by_iter = {row["iter"]: row["fid_mean"] for row in trend}
    best_iter = min(by_iter, key=by_iter.get)
    trained = {it: v for it, v in by_iter.items() if it > 0}
    out = {
        "trend": by_iter,
        "init_fid": by_iter.get(0),
        "best_iter": best_iter,
        "best_fid": by_iter[best_iter],
        "final_iter": max(by_iter),
        "final_fid": by_iter[max(by_iter)],
        "improves_on_init": bool(trained) and by_iter.get(0) is not None
        and min(trained.values()) < by_iter[0],
    }
    if run.get("partial"):
        out["partial"] = True
    if "sec_per_iter" in run and run["sec_per_iter"]:
        out["sec_per_iter"] = run["sec_per_iter"]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/headtohead")
    ap.add_argument("--out", default="benchmarks/quality_trend_r5.json")
    cli = ap.parse_args()

    runs = {k: summarize(v) for k, v in load_runs(cli.dir).items()}
    runs = {k: v for k, v in runs.items() if v}
    ref = {k: v for k, v in runs.items() if k.startswith("ref")}
    tpu = {k: v for k, v in runs.items() if k.startswith("tpu")}

    verdict = "insufficient data"
    # a side with no TRAINED checkpoint scored yet (partial run that has only
    # evaluated init) cannot support any improves-on-init conclusion
    ref = {k: v for k, v in ref.items() if v["final_iter"] > 0}
    if ref and tpu:
        ref_improves = any(v["improves_on_init"] for v in ref.values())
        tpu_improves = any(v["improves_on_init"] for v in tpu.values())
        ref_peak_early = all(
            v["best_iter"] < v["final_iter"] for v in ref.values())
        tpu_peak_early = all(
            v["best_iter"] < v["final_iter"] for v in tpu.values())
        if tpu_improves and ref_improves:
            verdict = (
                "both sides improve on init at 128px/dim-64; "
                + ("both also peak before the final iterate — the r3 "
                   "'stability horizon' reading holds at the scale it was "
                   "made about" if ref_peak_early and tpu_peak_early else
                   "trend shapes recorded per run")
            )
        elif ref_improves and not tpu_improves:
            verdict = ("reference improves while tpu never beats init at "
                       "this scale — framework defect by the r4 judge's "
                       "definition; investigate")
        elif not ref_improves:
            verdict = ("the reference itself never beats init at this "
                       "scale/iteration budget — the r3 collapse is a "
                       "config property, not a framework defect")

    report = {
        "config": {"model": "BaseModel", "concat": True, "dim": 64,
                   "crop_size": 128, "iters": 500, "ckpt_every": 125,
                   "note": "both sides: same synthetic 4-domain set, same "
                           "pixel-FID evaluator, identical scoring draws"},
        "runs": runs,
        "verdict": verdict,
    }
    os.makedirs(os.path.dirname(cli.out), exist_ok=True)
    with open(cli.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
