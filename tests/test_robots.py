"""robots.txt operators (operators/robots.py): rule parsing, agent
binding, longest-prefix admission, tie-breaks, plan shape."""

from perl_html5_dom_spark.operators import robots as rb

ROBOTS = """\
User-agent: *
Disallow: /private
Allow: /private/ok

# comment line, and a blank above
User-agent: badbot
Disallow: /
Allow: /welcome

User-agent: greedybot
Disallow:
"""


def _robots_df(spark, host="h.example", txt=ROBOTS):
    return spark.createDataFrame(
        [(host, txt)], "host string, robots_txt string")


def _urls_df(spark, paths, host="h.example"):
    return spark.createDataFrame(
        [(f"https://{host}{p}", host, p) for p in paths],
        "url string, host string, path string")


def test_parse_rules_and_agent_binding(spark):
    rules = {(r.agent, r.directive, r.path_prefix)
             for r in rb.parse_robots(_robots_df(spark)).collect()}
    assert rules == {
        ("*", "disallow", "/private"),
        ("*", "allow", "/private/ok"),
        ("badbot", "disallow", "/"),
        ("badbot", "allow", "/welcome"),
        # greedybot's empty Disallow (allow-all) is dropped at parse
    }


def test_admission_longest_prefix_and_ties(spark):
    rules = rb.parse_robots(_robots_df(spark))
    urls = _urls_df(spark, [
        "/private/x",       # disallow /private
        "/private/ok/y",    # allow /private/ok beats shorter disallow
        "/public",          # no match -> allowed
        "/",                # no '*' rule matches '/'
    ])
    out = {r.url.rsplit("h.example", 1)[1]: r for r in
           rb.robots_filter(urls, rules).collect()}
    assert out["/private/x"].allowed is False
    assert out["/private/x"].matched_rule == "/private"
    assert out["/private/ok/y"].allowed is True
    assert out["/public"].allowed is True and out["/public"].matched_rule is None
    assert out["/"].allowed is True


def test_agent_specific_group(spark):
    rules = rb.parse_robots(_robots_df(spark))
    urls = _urls_df(spark, ["/anything", "/welcome/home"])
    out = {r.url.rsplit("h.example", 1)[1]: r for r in
           rb.robots_filter(urls, rules, agent="badbot").collect()}
    # badbot: Disallow / plus the '*' group; /welcome allow (len 8)
    # beats / (len 1)
    assert out["/anything"].allowed is False
    assert out["/welcome/home"].allowed is True
    # '*' matching must NOT see badbot's rules
    star = {r.url.rsplit("h.example", 1)[1]: r for r in
            rb.robots_filter(urls, rules).collect()}
    assert star["/anything"].allowed is True


def test_allow_wins_exact_length_tie(spark):
    txt = "User-agent: *\nDisallow: /a/b\nAllow: /a/c\n"
    rules = rb.parse_robots(_robots_df(spark, txt=txt))
    # craft a same-length pair on one path: /a/b disallow vs /a/b allow
    txt2 = "User-agent: *\nDisallow: /a/b\nAllow: /a/b\n"
    rules2 = rb.parse_robots(_robots_df(spark, txt=txt2))
    out = rb.robots_filter(
        _urls_df(spark, ["/a/b/x"]), rules2).collect()[0]
    assert out.allowed is True          # RFC 9309: least-restrictive wins


def test_rules_side_broadcast(spark):
    rules = rb.parse_robots(_robots_df(spark))
    plan = rb.robots_filter(_urls_df(spark, ["/p"]), rules)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_dialect_parity_duckdb(spark):
    import duckdb

    con = duckdb.connect()
    esc = ROBOTS.replace("\n", "\\n").replace("'", "''")
    con.execute("create table robots as select 'h.example' as host, "
                f"replace('{esc}', '\\n', chr(10)) as robots_txt")
    want = set(map(tuple, con.execute(
        rb.parse_robots_sql(rb.DUCK, "robots")).fetchall()))
    got = {tuple(r) for r in rb.parse_robots(_robots_df(spark)).collect()}
    assert got == want
