"""Collect round-3 evidence artifacts into benchmarks/.

- /tmp/quality_trend_r3/trend_exp_{model}_s{seed}.json
    -> benchmarks/quality_trend_r3.json  (per-run trends + a summary block
       with best/final mean FID per run and the seed spread, so
       "improvement over init is outside run-to-run noise" is checkable
       from one file)
- /tmp/headtohead/{ref,tpu}_results*.json
    -> benchmarks/headtohead_r3.json  (all sides keyed by run tag)

Idempotent; run whenever a background run finishes to refresh the files.
Merges with what benchmarks/ already holds: /tmp run dirs are wiped between
sessions, so a fresh aggregate must never drop evidence that only survives
in the committed JSON (new runs with the same key win).
"""
from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QT_DIR = "/tmp/quality_trend_r3"
H2H_DIR = "/tmp/headtohead"


def _load_existing(dst, key):
    if os.path.exists(dst):
        with open(dst) as f:
            return json.load(f).get(key, {})
    return {}


def aggregate_quality_trend():
    dst = os.path.join(REPO, "benchmarks", "quality_trend_r3.json")
    runs = _load_existing(dst, "runs")
    for path in sorted(glob.glob(os.path.join(QT_DIR, "trend_exp_*.json"))):
        name = os.path.basename(path)[len("trend_exp_"):-len(".json")]
        with open(path) as f:
            runs[name] = json.load(f)
    if not runs:
        print("no quality-trend runs found yet")
        return
    summary = {}
    for name, rows in runs.items():
        fids = {r["iter"]: r["mean_fid"] for r in rows}
        init = fids.get(0)
        final_it = max(fids)
        summary[name] = {
            "init_fid": init,
            "best_fid": min(fids.values()),
            "best_iter": min(fids, key=fids.get),
            "final_fid": fids[final_it],
            "final_iter": final_it,
        }
    out = {"summary": summary, "runs": runs}
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", dst)
    for name, s in summary.items():
        print(f"  {name}: init {s['init_fid']} -> best {s['best_fid']} "
              f"(@{s['best_iter']}) final {s['final_fid']}")


def aggregate_headtohead():
    dst = os.path.join(REPO, "benchmarks", "headtohead_r3.json")
    sides = _load_existing(dst, "headtohead")
    for prefix in ("ref", "tpu"):
        for path in sorted(glob.glob(os.path.join(H2H_DIR, f"{prefix}_results*.json"))):
            key = os.path.basename(path)[:-len(".json")].replace("_results", "")
            with open(path) as f:
                sides[key] = json.load(f)
    if not sides:
        print("no head-to-head runs found yet")
        return
    with open(dst, "w") as f:
        json.dump({"headtohead": sides}, f, indent=1)
    print("wrote", dst)
    for key, side in sides.items():
        last = side["trend"][-1] if side.get("trend") else {}
        print(f"  {key}: final mean FID {last.get('fid_mean')} "
              f"@{last.get('iter')} ({side.get('sec_per_iter')}s/it)")


if __name__ == "__main__":
    aggregate_quality_trend()
    aggregate_headtohead()
