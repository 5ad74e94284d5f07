"""Host-capacity probe: embarrassingly-parallel scaling ceiling.

Measures a job with NO shuffle, NO sink, NO Python — `spark.range` →
per-row string synthesis + xxhash64 + conditional — reduced to one scalar.
Stage barrier aside, nothing in this job can serialize: if local[8] →
local[32] does not scale on THIS, the shortfall is machine capacity
(hypervisor neighbors / steal), not engine design. Run next to
bench_scaling.py's routing-job pairs to separate engine effects from host
effects.

Usage: python scripts/capacity_probe.py [--rows 120000000] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, time
sys.path.insert(0, {repo!r})
from logzoom_spark.session import get_spark
from pyspark.sql import functions as F

cpus, rows, reps = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
spark = get_spark(f"capacity{{cpus}}", cpus=cpus)

def job():
    df = spark.range(rows, numPartitions=cpus * 4)
    expr = F.xxhash64(F.concat(F.lit("turn-"), F.col("id").cast("string")))
    out = df.select(
        F.sum(F.when(F.pmod(expr, F.lit(97)) < 13, 1).otherwise(0)).alias("n")
    ).collect()[0]["n"]
    return out

job()  # warmup (codegen/JIT)
times = []
for _ in range(reps):
    t0 = time.time(); job(); times.append(round(time.time() - t0, 2))
print("RESULT", cpus, times, flush=True)
spark.stop()
"""


def run_level(cpus: int, rows: int, reps: int) -> list[float]:
    code = CHILD.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), str(rows), str(reps)],
        capture_output=True, text=True, timeout=900,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            return json.loads(line.split(" ", 2)[2].replace("'", '"'))
    raise RuntimeError(f"no RESULT: {out.stdout[-500:]} {out.stderr[-500:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=480_000_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--n", type=int, default=8, help="lower parallelism level")
    ap.add_argument("--n4", type=int, default=32, help="upper level (4N)")
    args = ap.parse_args()
    load0 = os.getloadavg()[0]
    r_hi = run_level(args.n4, args.rows, args.reps)  # fragile level first
    r_lo = run_level(args.n, args.rows, args.reps)
    eff = (min(r_lo) / min(r_hi)) / (args.n4 / args.n)
    print(json.dumps({
        "probe": "shuffle-free map+reduce (spark.range -> xxhash64 -> sum)",
        "rows": args.rows,
        f"local{args.n}_reps": r_lo,
        f"local{args.n4}_reps": r_hi,
        "efficiency": round(eff, 3),
        "load_at_start": round(load0, 1),
        "load_at_end": round(os.getloadavg()[0], 1),
    }))


if __name__ == "__main__":
    main()
