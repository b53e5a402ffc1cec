"""Giant-document skew rehearsal (north_rule; VERDICT r4 next-#7).

Crawl corpora arrive host-clustered (WARC files are written in crawl
order), and giant pages cluster too — a template-heavy host emits
500 KB+ pages while the median page is a few KB.  Read naively, one
input split inherits a run of giants and its task straggles the whole
extraction stage; at 10^12 documents that straggler IS the job's wall
clock.  plans.pipeline.salted_repartition exists to break exactly this
(url-hash x salt stripes, giants additionally striped by size bucket);
this tool measures what it buys.

Protocol: build a corpus of PAR x DOCS_PER_PART small pages plus
GIANTS pages ~1000x the median size, ALL on one host so the crawl
order co-locates them; write it host-sorted (the on-disk clustering a
real crawl drop has).  Run the extraction kernel over every page

  A. as-read: spark.read.parquet's input splits (giants co-located),
  B. salted:  plans.pipeline.salted_repartition first,

both on local[N], same kernel, same partition count.  Per-PARTITION
wall times are measured inside mapInPandas (TaskContext.partitionId),
so the report is exactly the straggler profile: p50 / p99 / max
partition seconds and stage wall.  Success = salted max-partition time
collapses toward the mean (the giants spread across the salt space)
with total wall at least no worse.

Usage: python tools/skew_rehearsal.py [cpus]   (default 8)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

BUILD = r"""
import duckdb, sys
out = sys.argv[1]
con = duckdb.connect()
# 6,000 small pages over 120 hosts + 24 giant pages (~1000x body) on
# ONE host, written host-sorted => giants co-located on disk.
con.execute(
    "copy ("
    " select 'https://h' || cast(h as varchar) || '.example/p' || cast(i as varchar) as url,"
    "  '<html><head><title>p' || i || '</title></head><body>'"
    "   || repeat('<div class=c><p>lorem ipsum dolor sit amet '"
    "             || cast(i as varchar) || '</p></div>', 10)"
    "   || '</body></html>' as html"
    " from (select unnest(generate_series(0, 5999)) as i),"
    "      lateral (select i % 120 as h)"
    " union all"
    " select 'https://h0.example/giant' || cast(g as varchar) as url,"
    "  '<html><head><title>g' || g || '</title></head><body>'"
    "   || repeat('<div class=c><table><tr><td>row data cell ' || cast(g as varchar)"
    "             || '</td><td><span>x</span></td></tr></table></div>', 10000)"
    "   || '</body></html>' as html"
    " from (select unnest(generate_series(0, 23)) as g)"
    " order by url"
    ") to '" + out + ".tmp' (format parquet)")
# rewrite via pyarrow: duckdb floors row groups at 2048 rows, which
# would glue the whole corpus into ~3 splits; 200-row groups give the
# reader real split boundaries that preserve the on-disk clustering
import pyarrow.parquet as pq
t = pq.read_table(out + ".tmp")
pq.write_table(t, out, row_group_size=200)
import os
os.remove(out + ".tmp")
n, tot, mx = con.execute(
    "select count(*), sum(length(html)), max(length(html)) "
    "from read_parquet('" + out + "')").fetchone()
print(n, tot, mx)
"""

RUNNER = r"""
import json, sys, time
sys.path.insert(0, ".")
corpus, cpus, mode = sys.argv[1], int(sys.argv[2]), sys.argv[3]
from pyspark.sql import SparkSession, functions as F
from perl_html5_dom_spark.plans.pipeline import salted_repartition

spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", str(cpus * 4))
         # one split per ~small row-group so as-read inherits the
         # on-disk host clustering instead of coalescing it away
         .config("spark.sql.files.maxPartitionBytes", "1m")
         .config("spark.sql.files.openCostInBytes", "0")
         .appName(f"skew-{mode}{cpus}").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

df = spark.read.parquet(corpus)
nparts = cpus * 4
if mode == "salted":
    df = salted_repartition(df, nparts)

def timed_kernel(it):
    import pandas as pd, time as _t
    from pyspark import TaskContext
    from perl_html5_dom_spark.operators.extract import extract_one
    t0 = _t.time(); n = 0; nb = 0
    for pdf in it:
        for html in pdf["html"]:
            extract_one(html, fields=("title", "main_text"))
            n += 1; nb += len(html)
    yield pd.DataFrame({"pid": [TaskContext.get().partitionId()],
                        "wall_s": [_t.time() - t0],
                        "docs": [n], "bytes": [nb]})

t0 = time.time()
rows = df.mapInPandas(
    timed_kernel, "pid int, wall_s double, docs long, bytes long"
).collect()
stage = time.time() - t0
walls = sorted(r["wall_s"] for r in rows if r["docs"] > 0)
import math
def pct(p):
    return walls[min(len(walls) - 1, int(math.ceil(p * len(walls))) - 1)]
print(json.dumps({
    "mode": mode, "cpus": cpus, "stage_wall_s": round(stage, 2),
    "tasks": len(walls), "docs": sum(r["docs"] for r in rows),
    "p50_s": round(pct(0.50), 2), "p99_s": round(pct(0.99), 2),
    "max_s": round(max(walls), 2),
    "mean_s": round(sum(walls) / len(walls), 2),
    "max_task_docs": max(r["docs"] for r in rows),
    "max_task_mb": round(max(r["bytes"] for r in rows) / 1e6, 1)}))
spark.stop()
"""


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    corpus = os.path.join(tempfile.gettempdir(), "skew_corpus.parquet")
    if not os.path.exists(corpus):
        out = subprocess.run([sys.executable, "-c", BUILD, corpus],
                             capture_output=True, text=True, check=True)
        print("corpus docs/bytes/max:", out.stdout.strip())
    for mode in ("asread", "salted"):
        out = subprocess.run(
            [sys.executable, "-c", RUNNER, corpus, str(cpus), mode],
            capture_output=True, text=True, check=True)
        print(out.stdout.strip().splitlines()[-1])


if __name__ == "__main__":
    main()
