"""Pages-table source boundary: schema contract + parquet fallback
(the Iceberg runtime is absent in this sandbox; the fallback exercises
the identical calling contract)."""

import pytest


@pytest.fixture()
def pages_path(spark, tmp_path):
    from perl_html5_dom_spark.sources.iceberg import write_pages
    from perl_html5_dom_spark.sources.pages import pages_df

    df = pages_df(spark, "/root/testdata/sf0.001").select(
        "url", "warc_ts", "html", "text", "lang")
    path = str(tmp_path / "pages_tbl")
    write_pages(df, path, mode="overwrite")
    return path


def test_roundtrip_and_projection(spark, pages_path):
    from perl_html5_dom_spark.sources.iceberg import pages_table

    df = pages_table(spark, pages_path)
    assert df.count() == 500
    pruned = pages_table(spark, pages_path, columns=["url", "html"])
    assert pruned.columns == ["url", "html"]
    # the extraction kernel runs unchanged on the table source
    from perl_html5_dom_spark.operators.extract import extract_pages
    out = extract_pages(pruned, span_selector=None, fields=["url", "title"])
    assert out.count() == 500


def test_append_mode(spark, pages_path):
    from perl_html5_dom_spark.sources.iceberg import pages_table, write_pages

    df = pages_table(spark, pages_path)
    write_pages(df, pages_path, mode="append")
    assert pages_table(spark, pages_path).count() == 1000


def test_schema_contract_enforced(spark, tmp_path):
    from perl_html5_dom_spark.sources.iceberg import pages_table

    bad = str(tmp_path / "bad")
    spark.createDataFrame([("u", "not-binary")],
                          "url string, html string").write.parquet(bad)
    with pytest.raises(ValueError, match="html.*string.*binary"):
        pages_table(spark, bad, columns=["url", "html"])
    with pytest.raises(ValueError, match="missing column"):
        pages_table(spark, bad, columns=["url", "warc_ts"])


def test_time_travel_rejected_on_fallback(spark, pages_path):
    from perl_html5_dom_spark.sources.iceberg import pages_table

    with pytest.raises(ValueError, match="time travel"):
        pages_table(spark, pages_path, snapshot_id=7)


def test_real_iceberg_write_errors_propagate(spark, pages_path,
                                             monkeypatch, tmp_path):
    """ADVICE r4 (medium): a genuine Iceberg failure (commit conflict,
    permissions, schema evolution) must fail the job — NOT silently
    divert the crawl drop to a stray parquet directory."""
    import os

    from perl_html5_dom_spark.sources import iceberg as ice

    df = ice.pages_table(spark, pages_path)

    class CommitBoom(Exception):
        pass

    def fake_write_to(self, table):
        raise CommitBoom(
            "CommitFailedException: branch main moved during commit")

    # patch the CONCRETE class (pyspark 4's classic DataFrame overrides
    # the pyspark.sql.DataFrame base methods)
    monkeypatch.setattr(type(df), "writeTo", fake_write_to)
    target = str(tmp_path / "diverted")
    with pytest.raises(CommitBoom):
        ice.write_pages(df, target, mode="append")
    assert not os.path.exists(target)  # nothing written on the sly


def test_not_iceberg_classifier():
    """Only no-runtime / not-a-table messages select the fallback."""
    from perl_html5_dom_spark.sources.iceberg import _not_iceberg

    absorbed = [
        "[DATA_SOURCE_NOT_FOUND] Failed to find the data source: iceberg",
        "java.lang.ClassNotFoundException: iceberg.DefaultSource",
        "[TABLE_OR_VIEW_NOT_FOUND] The table or view `x` cannot be found",
        "[PARSE_SYNTAX_ERROR] Syntax error at or near '/'",
        "[REQUIRES_SINGLE_PART_NAMESPACE] spark_catalog requires ...",
    ]
    propagated = [
        "CommitFailedException: branch main moved",
        "Cannot find snapshot with ID 7",
        "AccessDeniedException: s3://bucket/metadata",
        "ValidationException: schema evolution not allowed",
    ]
    for msg in absorbed:
        assert _not_iceberg(Exception(msg)), msg
    for msg in propagated:
        assert not _not_iceberg(Exception(msg)), msg
