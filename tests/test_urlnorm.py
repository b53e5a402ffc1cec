"""URL canonicalization unit tests (operators/urlnorm.py)."""

from perl_html5_dom_spark.operators import urlnorm as un


def canon(spark, url):
    df = spark.createDataFrame([(url,)], "url string")
    return un.normalize_urls(df).collect()[0].canonical_url


def test_url_canonicalization(spark):
    cases = {
        "https://example.org/doc/1": "https://example.org/doc/1",
        "HTTPS://EXAMPLE.ORG/Path/Q#frag": "https://example.org/Path/Q",
        "https://example.org:443/a": "https://example.org/a",
        "http://example.org:80/a?x=1": "http://example.org/a?x=1",
        "http://example.org:8080/a": "http://example.org:8080/a",
        "https://e.org/p?utm_source=a&id=2&utm_medium=b":
            "https://e.org/p?id=2",
        "https://e.org/p?fbclid=xyz": "https://e.org/p",
        "https://e.org/p?gclid=1&msclkid=2&keep=3": "https://e.org/p?keep=3",
        "https://e.org/p?utm_x=1#f": "https://e.org/p",
        "ftp://Example.Org/File": "ftp://example.org/File",
    }
    for url, want in cases.items():
        assert canon(spark, url) == want, url


def test_host_stats(spark):
    from perl_html5_dom_spark.operators.urlnorm import host_stats

    df = spark.createDataFrame(
        [("https://a.org/x",), ("https://a.org/x",), ("https://a.org/y",),
         ("https://b.org/z",)], "url string")
    rows = {r.host: r for r in host_stats(df).collect()}
    assert rows["a.org"].n_urls == 3 and rows["a.org"].n_unique_paths == 2
    assert rows["b.org"].n_urls == 1 and rows["b.org"].n_unique_paths == 1


def test_latest_snapshot_keeps_newest_and_breaks_ties(spark):
    import datetime

    from perl_html5_dom_spark.operators.urlnorm import latest_snapshot

    t = datetime.datetime(2025, 1, 1)
    d = datetime.timedelta
    df = spark.createDataFrame(
        [("u1", t, 1), ("u1", t + d(hours=2), 2), ("u1", t + d(hours=1), 3),
         ("u2", t, 4), ("u2", t, 5)],      # tie on ts -> larger version
        "url string, warc_ts timestamp, version bigint")
    out = {r.url: r for r in latest_snapshot(df).collect()}
    assert out["u1"].version == 2
    assert out["u2"].version == 5          # deterministic tie-break


def test_url_pattern_traps_digit_generalization(spark):
    from perl_html5_dom_spark.operators.urlnorm import url_pattern_traps

    rows = ([(f"https://a.org/cal/2024/{i}",) for i in range(5)]
            + [(f"https://a.org/list?page={i}",) for i in range(3)]
            + [("https://a.org/about",)]          # unique, below threshold
            + [(f"https://b.org/cal/2024/{i}",) for i in range(2)])
    df = spark.createDataFrame(rows, "url string")
    out = {(r.host, r.pattern): r
           for r in url_pattern_traps(df, min_urls=3).collect()}
    assert set(out) == {("a.org", "/cal/N/N"), ("a.org", "/list?page=N")}
    cal = out[("a.org", "/cal/N/N")]
    assert cal.n_urls == 5 and cal.example_url == "https://a.org/cal/2024/0"
    # host b's identical pattern stayed under min_urls -> not a trap there
