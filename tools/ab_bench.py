"""Interleaved A/B of two commits on the headline bench (index build
throughput + serving), the adjudication harness for cross-round
perf comparisons on a host with drifting throughput windows.

Usage:
    python tools/ab_bench.py <refA> <refB> [--rounds 3] [--cpus 32]

Method: each (refA, refB) round runs ADJACENT IN TIME, each level a
fresh subprocess (its own Ray session) executing that commit's own
bench.py with SOTOHP_BENCH_MODE=headline inside a git worktree. The
bench corpus is shared (generator output is version-stable); the
serve-index cache is wiped on every ref switch so no run reads an
index built by the other commit's code. The reported statistic is the
MEDIAN adjacent-pair ratio — the estimator that cancels this box's
multi-minute drift windows (BASELINE.md's standing methodology).

A host probe runs before every round; rounds taken while the box is
degraded (effective cores < half, or the numpy probe > 5x nominal)
are marked and the final verdict excludes them unless none are clean.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe_host() -> dict:
    """Cheap health probe: visible cores + a 100M-element numpy sum
    (~0.2 s nominal on this box when healthy)."""
    import numpy as np

    ncpu = os.cpu_count() or 0
    t0 = time.perf_counter()
    np.arange(100_000_000, dtype=np.float64).sum()
    t = time.perf_counter() - t0
    return {"cores": ncpu, "numpy_100m_sec": round(t, 3),
            "healthy": ncpu >= 16 and t < 1.0}


def ensure_worktree(ref: str) -> str:
    safe = ref.replace("/", "_")
    path = f"/tmp/ab_wt_{safe}"
    want = subprocess.run(
        ["git", "-C", REPO, "rev-parse", f"{ref}^{{commit}}"],
        check=True, capture_output=True, text=True,
    ).stdout.strip()
    if not os.path.isdir(path):
        subprocess.run(
            ["git", "-C", REPO, "worktree", "add", "--detach", path, want],
            check=True, capture_output=True,
        )
    else:
        # a stale checkout (e.g. 'HEAD' or a branch that moved since
        # the last sweep) would silently benchmark old code
        have = subprocess.run(
            ["git", "-C", path, "rev-parse", "HEAD"],
            check=True, capture_output=True, text=True,
        ).stdout.strip()
        if have != want:
            subprocess.run(
                ["git", "-C", path, "checkout", "--detach", want],
                check=True, capture_output=True,
            )
    return path


def run_ref(ref: str, cpus: int) -> dict:
    wt = ensure_worktree(ref)
    # never let one commit's searcher read the other commit's index
    shutil.rmtree("/tmp/sotohp_serve_index", ignore_errors=True)
    shutil.rmtree("/tmp/sotohp_bench_index", ignore_errors=True)
    env = dict(
        os.environ,
        RAY_GRAFT_CPUS=str(cpus),
        SOTOHP_BENCH_MODE="headline",
        PYTHONPATH=wt,
    )
    out = subprocess.run(
        [sys.executable, os.path.join(wt, "bench.py")],
        env=env, capture_output=True, text=True, check=True, cwd=wt,
    ).stdout
    q = json.loads(out.strip().splitlines()[-1])["queries"]
    keep = {
        k: q.get(k)
        for k in (
            "index_build_sec", "index_build_docs_per_sec",
            "t_merge_sec", "serve_qps", "serve_fanout_qps",
            "query_wand_p50_ms", "query_wand_p99_ms",
            "query_exact_p99_ms", "fanout_wand_p50_ms",
            "fanout_wand_p99_ms", "n_docs",
        )
    }
    return keep


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ref_a")
    ap.add_argument("ref_b")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    rounds = []
    for i in range(args.rounds):
        p = probe_host()
        a = run_ref(args.ref_a, args.cpus)
        b = run_ref(args.ref_b, args.cpus)
        rec = {"round": i, "probe": p, args.ref_a: a, args.ref_b: b,
               "build_ratio_b_over_a": round(
                   b["index_build_sec"] / a["index_build_sec"], 3)}
        rounds.append(rec)
        print(json.dumps(rec), flush=True)
    usable = [r for r in rounds if r["probe"]["healthy"]] or rounds
    med = statistics.median(
        r["build_ratio_b_over_a"] for r in usable
    )
    print(json.dumps({
        "metric": "ab_build_ratio_median",
        "refs": [args.ref_a, args.ref_b],
        "value": med,
        "clean_rounds": sum(r["probe"]["healthy"] for r in rounds),
        "rounds": len(rounds),
    }), flush=True)


if __name__ == "__main__":
    main()
