"""Web link-graph analytics: degrees and PageRank.

A crawl's link structure drives both curation (rank-weighted sampling,
spam demotion) and scheduling (frontier prioritization).  This module
gives the two standard primitives over an edge list (src, dst):

* :func:`degrees` — in/out degree + dangling flag per node (two
  partial-agg groupBys and one outer join, all on the node key);
* :func:`pagerank` — the power iteration, unrolled into ONE declarative
  plan (no driver-side loop state, no collect of ranks).

Determinism note: floating-point PageRank is NOT reproducible across
engines — parallel summation order changes the low bits.  So ranks are
fixed-point integers (RANK_SCALE micro-units) and every step uses
integer floor division: integer addition commutes, so Spark and the
DuckDB oracle agree BIT-FOR-BIT, any partitioning, any engine.  The
fixed-point error per step is < out_degree ulps — immaterial at
RANK_SCALE = 1e12.

Iteration step (all bigint):

    contrib(n)  = sum over in-edges (m, n) of  rank(m) div odeg(m)
    dang_share  = (sum of ranks of dangling nodes) div N
    rank'(n)    = ((DEN - NUM) * (SCALE div N)
                   + NUM * (contrib(n) + dang_share)) div DEN

with NUM/DEN = 85/100 the damping factor.

Scale (100 TB of edges): the joins/groupBys all key on src/dst — edges
are repartitioned ONCE on src and the partitioning is reused every
iteration; ranks are one narrow row per node.  Each iteration is one
shuffle of (dst, contrib) pairs.  Ranks are materialized (checkpoint)
every ``materialize_every`` iterations — every iteration by default,
and NOT optional in spirit: each step references the previous ranks
three times (dangling mass, contributions, node frame), so an
unmaterialized unroll grows the logical plan 3^iters and dies in the
analyzer long before executors see data.  Checkpointing is also what
bounds re-execution cost under task retry on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: fixed-point scale: 1.0 of rank mass == RANK_SCALE units
RANK_SCALE = 10**12
D_NUM, D_DEN = 85, 100


def degrees(edges: DataFrame) -> DataFrame:
    """(node, out_deg, in_deg, dangling) from an edge list (src, dst);
    duplicate edges count once."""
    e = edges.select("src", "dst").distinct()
    out_d = e.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("out_deg"))
    in_d = e.groupBy(F.col("dst").alias("node")).agg(
        F.count("*").alias("in_deg"))
    return (
        out_d.join(in_d, "node", "full_outer")
        .selectExpr(
            "node",
            "cast(coalesce(out_deg, 0) as bigint) as out_deg",
            "cast(coalesce(in_deg, 0) as bigint) as in_deg",
            "coalesce(out_deg, 0) = 0 as dangling",
        )
    )


def pagerank(edges: DataFrame, iters: int = 5,
             materialize_every: int = 1) -> DataFrame:
    """(node, rank) after ``iters`` damped power iterations; ``rank``
    is in RANK_SCALE fixed-point units (sum ~= RANK_SCALE)."""
    spark = edges.sparkSession
    # scale-adaptive src partitioning (guide §2): the explicit
    # repartition exists so every iteration's contribution join reuses
    # one partitioning — but a FIXED core-count width is pure task
    # latency on a small graph (32 near-empty partitions x 5
    # iterations).  Derive the width from the input's own parallelism,
    # capped at the session's: a toy graph iterates on few partitions,
    # a real-scale edge scan (input splits >= cores) keeps full width.
    n_part = max(1, min(spark.sparkContext.defaultParallelism,
                        edges.rdd.getNumPartitions()))
    e = (edges.select("src", "dst").distinct()
         .repartition(n_part, "src"))
    e = e.persist()
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select("dst")).distinct())
    outdeg = e.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("odeg"))
    # N rides the init frame as a 1-row broadcast column instead of a
    # separate driver count job (round 6): `div n` over the constant
    # column is the same integer arithmetic as the old `// n` literal,
    # so ranks are bit-identical.  The init is checkpointed BEFORE the
    # loop — iteration 0 references it three times (dangling mass,
    # contributions, node frame), and unmaterialized each reference
    # re-derived the distinct/union/outdeg subtree inside iteration
    # 0's plan (measured cold: setup+iter0 3.0 -> 0.8 s at sf1).
    ncol = nodes.agg(F.count("*").alias("n"))
    ranks = (nodes.crossJoin(F.broadcast(ncol))
             .selectExpr("node",
                         f"cast({RANK_SCALE} div n as long) as rank",
                         "n"))
    ranks = (ranks.join(outdeg, "node", "left")
             .select("node", "rank", "n", "odeg")
             .localCheckpoint(eager=True))

    for i in range(iters):
        # dangling mass as a 1-row broadcast, kept in-plan
        dang = ranks.where("odeg is null").agg(
            F.coalesce(F.sum("rank"), F.lit(0)).alias("dmass"))
        contribs = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .selectExpr("dst as node", "rank div odeg as c")
            .groupBy("node").agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            ranks.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dang))
            .selectExpr(
                "node", "odeg", "n",
                f"cast((({D_DEN} - {D_NUM}) * ({RANK_SCALE} div n) "
                f"+ {D_NUM} * (coalesce(contrib, 0) "
                f"+ dmass div n)) div {D_DEN} as long) as rank")
            .select("node", "rank", "n", "odeg")
        )
        if materialize_every and (i + 1) % materialize_every == 0:
            ranks = ranks.localCheckpoint()
    return ranks.select("node", F.col("rank").cast("long").alias("rank"))


def pagerank_oracle_sql(edges_sql: str, iters: int = 5) -> str:
    """DuckDB twin: the same integer recurrence unrolled as CTEs —
    generated by the same constants so the two engines cannot drift."""
    sql = [f"with e as (select distinct src, dst from ({edges_sql})), "
           "nodes as (select src as node from e union select dst from e), "
           "od as (select src as node, count(*) as odeg from e group by 1), "
           "n1 as (select count(*) as n from nodes), "
           "r0 as (select node, "
           f"(select {RANK_SCALE} // n from n1) as rank from nodes)"]
    base = f"({D_DEN} - {D_NUM}) * ({RANK_SCALE} // (select n from n1))"
    for i in range(iters):
        prev, cur = f"r{i}", f"r{i + 1}"
        sql.append(
            f", d{i} as (select coalesce(sum(rank), 0) as dmass from {prev} "
            f" left join od using (node) where odeg is null)"
            f", c{i} as (select dst as node, sum(rank // odeg) as contrib "
            f" from e join {prev} on e.src = {prev}.node "
            f" join od on od.node = e.src group by 1)"
            f", {cur} as (select nodes.node, "
            f" ({base} + {D_NUM} * (coalesce(contrib, 0) "
            f" + (select dmass from d{i}) // (select n from n1))) "
            f" // {D_DEN} as rank "
            f" from nodes left join c{i} using (node))")
    sql.append(f" select node, cast(rank as bigint) as rank from r{iters}")
    return "".join(sql)


def demo_edges_sql(source: str = "documents") -> str:
    """Deterministic synthetic link graph over the documents table —
    same text in both SQL dialects.  src lives in 0..22 but dst in
    0..96, so nodes 23..96 are dangling (received mass redistributes)."""
    return (
        f"select doc_id % 23 as src, (doc_id * 31 + 7) % 97 as dst "
        f"from {source} "
        f"union all "
        f"select doc_id % 23 as src, (doc_id * 13 + 3) % 97 as dst "
        f"from {source}"
    )
