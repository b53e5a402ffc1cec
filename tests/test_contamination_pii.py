"""Contamination detection (operators/contamination.py) and PII
scan/redact (operators/pii.py) — unit semantics + plan shape."""

import pytest

from perl_html5_dom_spark.operators import contamination as cn
from perl_html5_dom_spark.operators import pii


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# ---------------------------------------------------------------------------
# contamination
# ---------------------------------------------------------------------------


def test_ngram_overlap_basic(spark):
    docs = _docs(spark, [
        (1, "a b c d e f g h"),          # contains the bench item fully
        (2, "x y z a b c d e q r"),      # shares the first 5-gram only
        (3, "p q r s t u v w"),          # clean
    ])
    bench = spark.createDataFrame(
        [(10, "a b c d e f")], "bench_id bigint, bench_text string")
    out = {(r.doc_id, r.bench_id): r for r in
           cn.ngram_overlap(docs, bench, n=5, threshold=0.5).collect()}
    # bench item has two 5-grams: "a b c d e", "b c d e f"
    assert out[(1, 10)].overlap == 2
    assert out[(1, 10)].bench_ngrams == 2
    assert out[(1, 10)].contaminated is True
    assert out[(2, 10)].overlap == 1
    assert out[(2, 10)].contaminated is True   # 1/2 >= 0.5
    assert (3, 10) not in out                  # clean docs emit nothing


def test_ngram_overlap_short_doc_fallback(spark):
    # <n tokens: the whole text is the single shingle on both sides
    docs = _docs(spark, [(1, "tiny doc"), (2, "other text")])
    bench = spark.createDataFrame(
        [(7, "tiny doc")], "bench_id bigint, bench_text string")
    out = {(r.doc_id, r.bench_id): r for r in
           cn.ngram_overlap(docs, bench, n=5).collect()}
    assert out == {(1, 7): out[(1, 7)]}
    assert out[(1, 7)].overlap == 1 and out[(1, 7)].bench_ngrams == 1


def test_ngram_overlap_broadcasts_bench(spark):
    docs = _docs(spark, [(1, "a b c d e f g h")])
    bench = spark.createDataFrame(
        [(10, "a b c d e f")], "bench_id bigint, bench_text string")
    plan = cn.ngram_overlap(docs, bench, n=5)._jdf.queryExecution() \
        .executedPlan().toString()
    # the hit join against the document scan must be broadcast, never a
    # shuffle of the big side
    assert "BroadcastHashJoin" in plan


def test_bench_items_sql_dialect_parity(spark):
    import duckdb

    docs = _docs(spark, [
        (3, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12 t13 t14 t15"),
        (20, "u1 u2 u3 u4 u5"),
    ])
    docs.createOrReplaceTempView("d")
    got_spark = {(r.bench_id, r.bench_text) for r in
                 spark.sql(cn.bench_items_sql(cn.SPARK, "d")).collect()}
    con = duckdb.connect()
    con.execute("create table d as select * from (values "
                "(3, 't1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12 t13 t14 t15'), "
                "(20, 'u1 u2 u3 u4 u5')) v(doc_id, text)")
    got_duck = set(map(tuple, con.execute(
        cn.bench_items_sql(cn.DUCK, "d")).fetchall()))
    assert got_spark == got_duck
    # both docs match (3 % 17 == 20 % 17 == 3); slice = tokens 2..13,
    # clamped to what the short doc has
    assert got_spark == {
        (3, "t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12 t13"),
        (20, "u2 u3 u4 u5"),
    }


def test_top_ngrams_df_semantics(spark):
    docs = _docs(spark, [
        (1, "a b a b"),     # bigrams {a b, b a} -> df counts once per doc
        (2, "a b c"),
        (3, "c a b"),
    ])
    rows = cn.top_ngrams(docs, n=2, k=2).collect()
    assert [(r.ngram, r.df) for r in rows] == [("a b", 3), ("b a", 1)]


# ---------------------------------------------------------------------------
# pii
# ---------------------------------------------------------------------------


@pytest.fixture()
def pii_docs(spark):
    return _docs(spark, [
        (1, "mail me at jo.doe+x@sub.example.co.uk or admin@ex.org thanks"),
        (2, "server 192.168.1.250 and 10.0.0.1 up"),
        (3, "call +44-123-456-7890 now"),
        (4, "nothing sensitive here at all"),
        (5, "mixed a@b.io 8.8.8.8 +1-800-555-0199"),
    ])


def test_pii_scan_counts(spark, pii_docs):
    out = {r.doc_id: r for r in pii.pii_scan(pii_docs).collect()}
    assert (out[1].n_email, out[1].n_ipv4, out[1].n_phone) == (2, 0, 0)
    assert (out[2].n_email, out[2].n_ipv4, out[2].n_phone) == (0, 2, 0)
    assert (out[3].n_email, out[3].n_ipv4, out[3].n_phone) == (0, 0, 1)
    assert out[4].has_pii is False
    assert (out[5].n_email, out[5].n_ipv4, out[5].n_phone) == (1, 1, 1)
    assert out[5].has_pii is True


def test_pii_redact_all_occurrences(spark, pii_docs):
    pii_docs.createOrReplaceTempView("__pii_t")
    red = {r.doc_id: r.red for r in spark.sql(
        "select doc_id, " + pii.redact_expr(pii.SPARK) + " as red "
        "from __pii_t").collect()}
    assert red[1] == "mail me at <EMAIL> or <EMAIL> thanks"
    assert red[2] == "server <IP> and <IP> up"
    assert red[3] == "call <PHONE> now"
    assert red[4] == "nothing sensitive here at all"
    assert red[5] == "mixed <EMAIL> <IP> <PHONE>"


def test_pii_redact_digest_counts(spark, pii_docs):
    out = {r.doc_id: r for r in pii.pii_redact(pii_docs).collect()}
    assert out[5].n_redactions == 3 and out[4].n_redactions == 0


def test_pii_scan_no_shuffle(spark, pii_docs):
    plan = pii.pii_scan(pii_docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan   # per-row projection, zero shuffle
