"""Shared-SparkSession hygiene: operators that lower dialect SQL via
temp views must not collide when two jobs' plans are BUILT interleaved
on one session (VERDICT r3 #5).  util.sql_over gives each call a unique
view name and drops it after eager analysis, so nothing leaks into the
session catalog either."""


def _plans_interleaved(build_a, build_b):
    a = build_a()
    b = build_b()          # built after a, before a is evaluated
    return a.collect(), b.collect()


def test_pii_redact_interleaved(spark):
    from perl_html5_dom_spark.operators import pii

    d1 = spark.createDataFrame([(1, "mail a@b.com end")],
                               "doc_id long, text string")
    d2 = spark.createDataFrame([(2, "plain text")],
                               "doc_id long, text string")
    ra, rb = _plans_interleaved(lambda: pii.pii_redact(d1),
                                lambda: pii.pii_redact(d2))
    assert [r.doc_id for r in ra] == [1]
    assert [r.doc_id for r in rb] == [2]
    assert ra[0].n_redactions == 1 and rb[0].n_redactions == 0


def test_pack_offsets_interleaved(spark):
    from perl_html5_dom_spark.operators.packing import pack_offsets

    d1 = spark.createDataFrame([(i, "w " * (i + 1)) for i in range(4)],
                               "doc_id long, text string")
    d2 = spark.createDataFrame([(9, "one two three")],
                               "doc_id long, text string")
    ra, rb = _plans_interleaved(
        lambda: pack_offsets(d1, max_tokens=4, buckets=2),
        lambda: pack_offsets(d2, max_tokens=4, buckets=2))
    assert {r.doc_id for r in ra} == {0, 1, 2, 3}
    assert [r.doc_id for r in rb] == [9]


def test_robots_interleaved(spark):
    from perl_html5_dom_spark.operators import robots as rb

    r1 = spark.createDataFrame(
        [("h1", "User-agent: *\nDisallow: /x")], "host string, robots_txt string")
    r2 = spark.createDataFrame(
        [("h2", "User-agent: *\nDisallow: /y")], "host string, robots_txt string")
    ra, rb_ = _plans_interleaved(lambda: rb.parse_robots(r1),
                                 lambda: rb.parse_robots(r2))
    assert {r.host for r in ra} == {"h1"}
    assert {r.host for r in rb_} == {"h2"}


def test_no_view_leaks(spark):
    from perl_html5_dom_spark.operators import pii

    d = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    pii.pii_scan(d).collect()
    leaked = [t.name for t in spark.catalog.listTables()
              if t.name.startswith("__")]
    assert leaked == []


def test_catalog_queries_interleaved(spark):
    """Two whole CATALOG queries (VERDICT r4 #8: the query-builder layer
    formerly registered fixed `documents`/`embeddings` views) built
    interleaved against DIFFERENT sf dirs on one session: each must see
    its own corpus, and nothing may remain registered afterwards."""
    from perl_html5_dom_spark.queries import QUERIES

    sf_small = "/root/testdata/sf0.001"
    sf_big = "/root/testdata/sf0.1"
    a = QUERIES["token_counts"](spark, sf_small)
    b = QUERIES["token_counts"](spark, sf_big)      # before a runs
    c = QUERIES["lang_id"](spark, sf_small)
    na, nb, nc = a.count(), b.count(), c.count()
    assert na == nc == 500        # sf0.001 corpus size
    assert nb > na                # sf0.01 is strictly larger
    assert [t.name for t in spark.catalog.listTables()] == []
