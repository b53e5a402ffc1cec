"""Link-graph operators (operators/linkgraph.py): degrees, integer
fixed-point PageRank, dangling redistribution, mass conservation."""

from perl_html5_dom_spark.operators import linkgraph as lg
from perl_html5_dom_spark.operators.linkgraph import RANK_SCALE


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def test_degrees(spark):
    e = _edges(spark, [(1, 2), (1, 3), (2, 3), (1, 2)])   # dup edge
    out = {r.node: r for r in lg.degrees(e).collect()}
    assert (out[1].out_deg, out[1].in_deg, out[1].dangling) == (2, 0, False)
    assert (out[2].out_deg, out[2].in_deg) == (1, 1)
    assert (out[3].out_deg, out[3].in_deg, out[3].dangling) == (0, 2, True)


def test_pagerank_star(spark):
    # hub 0 -> {1,2,3}: leaves are dangling, all leaves tie, hub gets
    # the dangling mass back and stays competitive
    e = _edges(spark, [(0, 1), (0, 2), (0, 3)])
    r = {x.node: x.rank for x in lg.pagerank(e, iters=10).collect()}
    assert r[1] == r[2] == r[3]
    assert all(v > 0 for v in r.values())
    # total mass stays ~RANK_SCALE (floor-division loss only)
    assert abs(sum(r.values()) - RANK_SCALE) < RANK_SCALE // 10**4


def test_pagerank_cycle_uniform(spark):
    # a 4-cycle is perfectly symmetric: every node converges to 1/4
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    r = {x.node: x.rank for x in lg.pagerank(e, iters=7).collect()}
    assert len(set(r.values())) == 1
    assert abs(r[0] - RANK_SCALE // 4) <= 4


def test_pagerank_authority_ordering(spark):
    # 1..5 all link to 6; 6 links to 7.  6 must outrank 7, 7 must
    # outrank the leaf sources.
    e = _edges(spark, [(i, 6) for i in range(1, 6)] + [(6, 7)])
    r = {x.node: x.rank for x in lg.pagerank(e, iters=10).collect()}
    assert r[6] > r[7] > r[1]
    assert r[1] == r[2] == r[5]


def test_pagerank_matches_numpy_float_reference(spark):
    # the fixed-point result must track a float power iteration to
    # ~1e-9 relative (fixed-point error is < out_deg ulps per step)
    import numpy as np

    pairs = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 4)]
    n, iters, d = 5, 8, 0.85
    A = {}
    for s, t in pairs:
        A.setdefault(s, []).append(t)
    rank = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1 - d) / n)
        dang = sum(rank[u] for u in range(n) if u not in A)
        nxt += d * dang / n
        for s, ts in A.items():
            for t in ts:
                nxt[t] += d * rank[s] / len(ts)
        rank = nxt
    got = {x.node: x.rank / RANK_SCALE for x in
           lg.pagerank(_edges(spark, pairs), iters=iters).collect()}
    for i in range(n):
        assert abs(got[i] - rank[i]) < 1e-9


def test_pagerank_materialize_cadence_same_result(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 0), (2, 3)])
    a = {x.node: x.rank for x in lg.pagerank(e, iters=6).collect()}
    b = {x.node: x.rank for x in
         lg.pagerank(e, iters=6, materialize_every=2).collect()}
    assert a == b


def test_pagerank_oracle_sql_duckdb_parity(spark):
    import duckdb

    pairs = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)]
    got = {x.node: x.rank for x in
           lg.pagerank(_edges(spark, pairs), iters=5).collect()}
    con = duckdb.connect()
    vals = ", ".join(f"({s}, {t})" for s, t in pairs)
    sql = lg.pagerank_oracle_sql(
        f"select * from (values {vals}) v(src, dst)", iters=5)
    want = dict(con.execute(sql).fetchall())
    assert got == want
