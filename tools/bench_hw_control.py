"""Hardware-ceiling control for the scaling bench: the same scrub work with
plain multiprocessing — no Spark, no JVM, no Arrow — pinned to N CPUs.

What this isolates: how much of the local[8] -> local[32] scaling gap is the
*engine's* overhead vs this single VM's shared memory subsystem / host
contention.  A real N -> 4N executor scale-up multiplies memory buses and
sockets; a 4x thread scale-up inside one VM does not, so the control's ratio
is the attainable ceiling here, and the engine should be judged against it.

Usage: python tools/bench_hw_control.py [rows_per_level]
Prints one JSON line with rows/sec at 8 and 32 processes + the ratio.
"""

from __future__ import annotations

import glob
import json
import subprocess
import sys
import time

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 480_000
FIXTURE_GLOB = "/root/repo/.cache/bench_fx_*/images/phash_prefix=*/*.parquet"

_WORKER = r'''
import sys, time
sys.path.insert(0, "/root/repo")
from multiprocessing import Pool
import pyarrow.parquet as pq, glob

N = int(sys.argv[1]); ROWS = int(sys.argv[2])
files = sorted(glob.glob("%s"))
caps = []
for f in files:
    caps += pq.read_table(f, columns=["caption"])["caption"].to_pylist()
    if len(caps) >= ROWS:
        break
caps = caps[:ROWS]
CHUNK = max(len(caps) // (N * 4), 1)
chunks = [caps[i:i + CHUNK] for i in range(0, len(caps), CHUNK)]

def work(chunk):
    from pii_redactor_spark.operators.scrub import scrub_batch
    scrub_batch(chunk)
    return len(chunk)

if __name__ == "__main__":
    with Pool(N) as p:
        p.map(work, chunks[:N])  # warm imports in every worker
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            total = sum(p.map(work, chunks))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
    print(f"{total} {best:.3f}")
''' % FIXTURE_GLOB


def run_level(n: int) -> dict:
    with open("/tmp/_hw_control_worker.py", "w") as fh:
        fh.write(_WORKER)
    proc = subprocess.run(
        ["taskset", "-c", f"0-{n - 1}", sys.executable,
         "/tmp/_hw_control_worker.py", str(n), str(ROWS)],
        capture_output=True, text=True, timeout=900,
    )
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-2000:])
    total, sec = proc.stdout.split()
    return {"procs": n, "rows": int(total), "sec": float(sec),
            "rows_per_sec": round(int(total) / float(sec), 1)}


def main() -> None:
    if not glob.glob(FIXTURE_GLOB):
        sys.exit("no bench fixture found — run tools/bench_scaling.py first")
    lo = run_level(8)
    hi = run_level(32)
    ratio = hi["rows_per_sec"] / lo["rows_per_sec"]
    print(json.dumps({
        "metric": "hw_control_scaling",
        "value": round(ratio / 4, 3),
        "unit": "ratio",
        "levels": {"8": lo, "32": hi},
        "speedup_8_to_32": round(ratio, 2),
    }))


if __name__ == "__main__":
    main()
