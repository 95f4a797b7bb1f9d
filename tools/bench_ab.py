"""Paired A/B benchmark between two git revisions of this repo.

Round-2's headline bench ran 1.3x slower than round-1's across queries
whose code had not changed, which BASELINE.md attributes to host-tier
drift on this shared VM.  This tool makes that claim mechanical instead
of narrative: it checks the old revision out into a worktree and runs
the SAME bench.py workload alternately from both checkouts within one
session — A/B/B/A/A/B... (order flipped every pair to cancel drift
trends) — then reports per-query paired deltas.  Each run is a fresh
identical JVM lifecycle, so the only variable inside a pair is the code.

Usage:
    python tools/bench_ab.py [--ref <commit>] [--pairs 3]
        [--sf-dir /root/testdata/sf0.1]

Prints one JSON document with per-query medians of old/new seconds and
the paired new/old ratio; exits nonzero if either side fails.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(checkout: str, sf_dir: str, cpus: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    prev = env.get("PYTHONPATH")
    env["PYTHONPATH"] = (
        checkout + os.pathsep + prev if prev else checkout
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(checkout, "bench.py")],
        cwd=checkout, env=env, capture_output=True, text=True,
        timeout=1800,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"bench failed in {checkout}:\n{proc.stderr[-2000:]}"
        )
    # the JSON line is the last stdout line
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ref", default="HEAD~1",
                   help="old revision (commit/tag) to compare against")
    p.add_argument("--pairs", type=int, default=3)
    p.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    p.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = p.parse_args()

    # pid-unique path: a concurrent bench_ab must not remove the worktree
    # another invocation is actively benchmarking.  First, sweep
    # leftovers from crashed runs (SIGKILL/OOM skips the finally block):
    # any bench_ab_old_<pid> whose pid is no longer alive is garbage.
    cache = os.path.join(REPO, ".cache")
    for entry in os.listdir(cache) if os.path.isdir(cache) else []:
        if not entry.startswith("bench_ab_old_"):
            continue
        try:
            pid = int(entry.rsplit("_", 1)[-1])
            os.kill(pid, 0)
        except ProcessLookupError:
            stale = os.path.join(cache, entry)
            rm = subprocess.run(
                ["git", "worktree", "remove", "--force", stale],
                cwd=REPO, capture_output=True,
            )
            if rm.returncode != 0:
                # half-populated dir from a crash mid-add: not a valid
                # worktree, so remove it directly and drop the metadata
                import shutil

                shutil.rmtree(stale, ignore_errors=True)
                subprocess.run(["git", "worktree", "prune"],
                               cwd=REPO, capture_output=True)
        except (ValueError, PermissionError):
            continue
    wt = os.path.join(REPO, ".cache", f"bench_ab_old_{os.getpid()}")
    subprocess.run(
        ["git", "worktree", "add", "--force", "--detach", wt, args.ref],
        cwd=REPO, check=True, capture_output=True,
    )
    try:
        old_runs: list[dict] = []
        new_runs: list[dict] = []
        for i in range(args.pairs):
            # flip order each pair so a monotone host-drift trend cancels
            order = [("old", wt), ("new", REPO)]
            if i % 2:
                order.reverse()
            for tag, checkout in order:
                doc = run_bench(checkout, args.sf_dir, args.cpus)
                (old_runs if tag == "old" else new_runs).append(
                    doc["queries"]
                )
                print(f"# pair {i} {tag}: total "
                      f"{round(sum(doc['queries'].values()), 2)}s",
                      file=sys.stderr)
        common = sorted(
            set(old_runs[0]) & set(new_runs[0])
        )
        per_query = {}
        for q in common:
            old_med = statistics.median(r[q] for r in old_runs)
            new_med = statistics.median(r[q] for r in new_runs)
            per_query[q] = {
                "old_median_sec": round(old_med, 3),
                "new_median_sec": round(new_med, 3),
                "ratio": round(new_med / old_med, 3) if old_med else None,
            }
        old_total = statistics.median(
            sum(r[q] for q in common) for r in old_runs
        )
        new_total = statistics.median(
            sum(r[q] for q in common) for r in new_runs
        )
        print(json.dumps({
            "ref_old": args.ref,
            "pairs": args.pairs,
            "sf_dir": args.sf_dir,
            "cpus": args.cpus,
            "old_total_median_sec": round(old_total, 3),
            "new_total_median_sec": round(new_total, 3),
            "total_ratio_new_over_old": round(new_total / old_total, 3),
            "queries": per_query,
        }, indent=2))
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=REPO, capture_output=True)


if __name__ == "__main__":
    main()
