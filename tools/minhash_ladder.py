"""Operator-level scaling ladder for the shuffle-heavy MinHash path.

Same two-parallelism protocol as tools/scaling_bench.py, on the
duplicate-heavy sf1-style corpus (documents x10 replicas with text
tails + the CORPUS_SQL dup fan-out).  Tunables via env so plan
variants can be A/B'd on the same input:

  MH_SHUFFLE_MULT   shuffle partitions = cpus * mult   (default 4)
  MH_SKEW           1 = aggressive AQE skew-join split  (default 1)
  MH_TRIALS         best-of-N in the warm JVM           (default 3)
  MH_REPLICAS       corpus scale: replicas per base doc (default 10;
                    40 puts local[32] in its throughput regime — at 10
                    the round-5 operator finishes in ~6 s and fixed
                    per-stage overhead dominates the 32-thread level)

Usage: python tools/minhash_ladder.py [levels...]   (default 2 8 32)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CORPUS_BUILD = r"""
import duckdb, os, sys
out = sys.argv[1]
reps = int(os.environ.get("MH_REPLICAS", "10"))
con = duckdb.connect()
con.execute(
    "create view documents as "
    "select doc_id + 1000000*r as doc_id, "
    " case when r = 0 then text else text || ' r' || cast(r as varchar) end as text "
    "from read_parquet('/root/testdata/sf0.1/documents.parquet'), "
    f" (select unnest(generate_series(0, {reps - 1})) as r)")
con.execute(
    "copy (select doc_id, text from documents "
    " union all select doc_id + 100000000, text from documents where doc_id % 5 = 0 "
    " union all select doc_id + 200000000, text || ' zz yy xx' from documents "
    " where doc_id % 3 = 0) to '" + out + "' (format parquet)")
print(con.execute("select count(*) from read_parquet('" + out + "')").fetchone()[0])
"""

RUNNER = r"""
import json, sys, time
cpus = int(sys.argv[1]); corpus_path = sys.argv[2]
mult = int(os.environ.get("MH_SHUFFLE_MULT", "4")) if (os := __import__("os")) else 4
skew = os.environ.get("MH_SKEW", "1") == "1"
trials = int(os.environ.get("MH_TRIALS", "3"))
from pyspark.sql import SparkSession
b = (SparkSession.builder.master(f"local[{cpus}]")
     .config("spark.sql.shuffle.partitions", str(max(cpus * mult, 8)))
     .config("spark.sql.adaptive.enabled", "true")
     .config("spark.driver.memory", "16g"))
if skew:
    # the LSH band self-join and the shingle verify join concentrate
    # hot keys; defaults (256 MB threshold) never fire at this scale,
    # so mark partitions skewed at 8 MB and split to 4 MB targets
    b = (b.config("spark.sql.adaptive.skewJoin.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
         .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
         .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m"))
spark = b.appName(f"mh{cpus}").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
sys.path.insert(0, ".")
from perl_html5_dom_spark.operators.dedup import minhash_near_dups
corpus = spark.read.parquet(corpus_path).repartition(cpus * 4, "doc_id")
n = corpus.count()
dt, pairs = None, None
for _ in range(trials):
    spark.catalog.clearCache()
    t0 = time.time()
    pairs = minhash_near_dups(corpus, 0.5).count()
    d = time.time() - t0
    dt = d if dt is None or d < dt else dt
print(json.dumps({"cpus": cpus, "docs": n, "pairs": pairs,
                  "secs": round(dt, 2), "docs_per_sec": round(n / dt, 1)}))
spark.stop()
"""


def main() -> None:
    levels = [int(a) for a in sys.argv[1:]] or [2, 8, 32]
    reps = os.environ.get("MH_REPLICAS", "10")
    corpus = (f"/tmp/mh_ladder_corpus_x{reps}.parquet" if reps != "10"
              else "/tmp/mh_ladder_corpus.parquet")
    if not os.path.exists(corpus):
        out = subprocess.run([sys.executable, "-c", CORPUS_BUILD, corpus],
                             capture_output=True, text=True, check=True)
        print("corpus docs:", out.stdout.strip())
    results = []
    for lv in levels:
        out = subprocess.run([sys.executable, "-c", RUNNER, str(lv), corpus],
                             capture_output=True, text=True, check=True)
        r = json.loads(out.stdout.strip().splitlines()[-1])
        results.append(r)
        print(json.dumps(r))
    by = {r["cpus"]: r for r in results}
    for r in results:
        n4 = r["cpus"] * 4
        if n4 in by:
            eff = by[n4]["docs_per_sec"] / (4 * r["docs_per_sec"])
            print(f"eff {r['cpus']} -> {n4}: {eff:.3f}")


if __name__ == "__main__":
    main()
