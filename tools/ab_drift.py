"""A/B-confirm the r15 suite-wide bench drift story (VERDICT r15 task 5).

EVIDENCE_r15 attributed the +22% clean-artifact inflation (r14 106.5 s →
r15 133.4 s, dominated by queries whose code did NOT change) to ambient
host drift — three same-tree runs spread 132–151 s. This tool settles it:
ONE session of interleaved A/B subprocess runs of the 5 slowest queries
on the r14-artifact tree vs the r15-artifact tree. Interleaving controls
for host state (whatever ambient load exists hits both trees equally);
if the same-session deltas sit within the rep noise, the story is drift,
not regression.

Method: for each rep, for each tree (alternating order per rep to kill
order bias), spawn one subprocess that builds a session, runs the 5
queries once each (noop sink), prints JSON. Trees are git worktrees of
the two artifact-of-record commits. Sequential subprocesses — never two
JVMs at once (the sf10 probe OOM lesson).

Usage: python tools/ab_drift.py [--reps 5] [--sf /root/testdata/sf0.1]
           [--a rX=SHA --b rY=SHA] [--queries n1,n2] [--out FILE]
Defaults reproduce the original r14-vs-r15 study; --a/--b/--queries/
--out (r17) let later rounds A/B any two artifact trees. Writes the
--out artifact (default AB_DRIFT_r16.json) at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERIES = [
    "pagerank_supplier_graph",
    "corpus_to_training_set",
    "dedup_survivors_by_quality",
    "ivfpq_topk",
    "bpe_apply_merges",
]
# artifact-of-record commits: r14 = 158dbf6 (BENCH 106.5 s / 109 q),
# r15 = 13fc83c (BENCH 133.4 s / 112 q) — the two clean trees whose
# delta EVIDENCE_r15 attributes to host drift
TREES = {"r14": "158dbf6", "r15": "13fc83c"}

RUNNER = r"""
import json, os, sys, time, gc
sys.path.insert(0, os.getcwd())
from log_analysis_bigdata_spark.session import get_spark
from log_analysis_bigdata_spark.queries import all_queries
spark = get_spark(app_name="ab-drift")
reg = all_queries()
sf = sys.argv[1]
names = json.loads(sys.argv[2])
out = {}
for name in names:
    t0 = time.perf_counter()
    reg[name].spark(spark, sf).write.format("noop").mode("overwrite").save()
    out[name] = round(time.perf_counter() - t0, 3)
    gc.collect()
print("ABRESULT " + json.dumps(out))
"""


def ensure_worktree(tag: str, sha: str) -> str:
    path = f"/tmp/ab_{tag}"
    if not os.path.isdir(path):
        subprocess.run(
            ["git", "worktree", "add", "--detach", path, sha],
            cwd=REPO, check=True, capture_output=True,
        )
    return path


def run_tree(path: str, sf: str, queries: list[str]) -> dict[str, float]:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    p = subprocess.run(
        [sys.executable, "-c", RUNNER, sf, json.dumps(queries)],
        cwd=path, env=env, capture_output=True, text=True, timeout=1200,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(
        f"runner in {path} produced no result:\n{p.stdout[-2000:]}\n"
        f"{p.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    # r17: parameterized so later rounds can A/B any two artifact
    # trees without editing the tool (was hardcoded r14/r15)
    ap.add_argument("--a", default=None, help="TAG=SHA for tree A")
    ap.add_argument("--b", default=None, help="TAG=SHA for tree B")
    ap.add_argument("--queries", default=None,
                    help="comma-separated registry names")
    ap.add_argument("--out", default="AB_DRIFT_r16.json",
                    help="artifact filename at the repo root")
    args = ap.parse_args()

    trees = dict(TREES)
    if args.a and args.b:
        trees = dict(
            kv.split("=", 1) for kv in (args.a, args.b)
        )
    queries = (
        [q for q in args.queries.split(",") if q]
        if args.queries
        else list(QUERIES)
    )

    paths = {t: ensure_worktree(t, sha) for t, sha in trees.items()}
    runs: dict[str, list[dict[str, float]]] = {t: [] for t in trees}
    order = list(trees)
    for rep in range(args.reps):
        seq = order if rep % 2 == 0 else order[::-1]  # alternate order
        for tag in seq:
            res = run_tree(paths[tag], args.sf, queries)
            runs[tag].append(res)
            print(f"rep {rep} {tag}: {res}", flush=True)

    ta, tb = order
    summary = {}
    for q in queries:
        a = [r[q] for r in runs[ta] if q in r]
        b = [r[q] for r in runs[tb] if q in r]
        med_a, med_b = statistics.median(a), statistics.median(b)
        spread = max(
            (max(x) - min(x)) / min(x) for x in (a, b) if min(x) > 0
        )
        summary[q] = {
            f"{ta}_times": a,
            f"{tb}_times": b,
            f"{ta}_median": med_a,
            f"{tb}_median": med_b,
            f"ratio_{tb}_over_{ta}": round(med_b / med_a, 3)
            if med_a else None,
            "max_same_tree_spread": round(spread, 3),
            # regression = the tree delta exceeds what same-tree rep
            # noise can explain
            "within_noise": bool(
                med_a and abs(med_b / med_a - 1.0) <= spread
            ),
        }
    out = {"reps": args.reps, "sf": args.sf, "trees": trees,
           "queries": summary}
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
