"""Pure-JVM shuffle-scaling ceiling probe for this box.

Measures the best case any shuffle-heavy JVM operator can achieve when
scaling local[N] -> local[4N]: a longs-only groupBy + sort-merge join +
count pipeline with zero Python, zero I/O, and nothing but Tungsten
codegen and Exchange traffic.  If an operator's N -> 4N efficiency
matches this probe's, the residual is the box's shared memory
subsystem (all task threads in one JVM contend for the same DRAM
bandwidth), not the operator's plan — a real cluster adds memory
channels with executors, this box does not.

Usage: python tools/jvm_shuffle_ceiling.py [levels...]   (default 8 32)
"""

from __future__ import annotations

import json
import subprocess
import sys

RUNNER = r"""
import json, sys, time
cpus = int(sys.argv[1])
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", str(cpus * 4))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "16g")
         .appName(f"ceil{cpus}").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
N = 150_000_000
best = None
for _ in range(3):
    t0 = time.time()
    df = spark.range(N).selectExpr("id", "id % 5000000 as k", "id % 97 as v")
    agg = df.groupBy("k").sum("v")
    (df.join(agg, "k").selectExpr("k", "id", "`sum(v)` as s")
     .groupBy("s").count().count())
    d = time.time() - t0
    best = d if best is None or d < best else best
print(json.dumps({"cpus": cpus, "secs": round(best, 2),
                  "rows_per_sec": round(N / best, 0)}))
spark.stop()
"""


def main() -> None:
    levels = [int(a) for a in sys.argv[1:]] or [8, 32]
    results = []
    for lv in levels:
        out = subprocess.run([sys.executable, "-c", RUNNER, str(lv)],
                             capture_output=True, text=True, check=True)
        r = json.loads(out.stdout.strip().splitlines()[-1])
        results.append(r)
        print(json.dumps(r))
    by = {r["cpus"]: r for r in results}
    for r in results:
        n4 = r["cpus"] * 4
        if n4 in by:
            eff = by[n4]["rows_per_sec"] / (4 * r["rows_per_sec"])
            print(f"ceiling eff {r['cpus']} -> {n4}: {eff:.3f}")


if __name__ == "__main__":
    main()
