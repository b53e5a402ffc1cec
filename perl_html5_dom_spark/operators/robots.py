"""robots.txt parsing + URL admission — the crawl-compliance operator.

A fetch pipeline must honor robots.txt (RFC 9309).  This module parses
robots bodies into a rules relation and admits/denies URLs by the
longest-prefix-match rule (ties break toward Allow, per RFC 9309 §2.2.2)
— entirely in SQL window/join expressions, emitted for both engines:

* :func:`parse_robots_sql` — (host, robots_txt) → one row per
  Allow/Disallow rule with its governing user-agent group.  The only
  stateful part — "which User-agent line governs this rule" — is a
  running ``last(non-null) over (order by line_no)`` window, not a UDF.
* :func:`robots_filter` — urls × rules: broadcast the rules relation
  (robots corpora are ~1 row per (host, path-prefix) — millions of
  rows max, megabytes), prefix-match with ``startswith`` map-side,
  pick the winner with one window over the matched pairs only.

Scale: the URL side never shuffles for matching (broadcast join); the
winner window partitions by url over a handful of matched rules each.
At 100 TB of URLs this is a map-side join plus a narrow per-url top-1.

Group semantics implemented: the most recent ``User-agent`` line
governs the rules that follow it (single-agent binding — the
common-case subset of the RFC's group concept; multi-agent shared
blocks would add one more window); empty Disallow values
(``Disallow:``) mean allow-all and are dropped at parse time;
unmatched URLs are allowed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from ..util import sql_over

SPARK = "spark"
DUCK = "duck"


def parse_robots_sql(dialect: str, source: str = "robots") -> str:
    """SQL: ``source(host, robots_txt)`` → (host, agent, directive,
    path_prefix, line_no).  Same semantics both dialects; only the
    line-explode and ignore-nulls window syntax differ."""
    if dialect == SPARK:
        lines = (
            f"select host, pos as line_no, trim(line) as line from {source} "
            "lateral view posexplode(split(robots_txt, '\\n')) t as pos, line")
        last_agent = ("last(agent_decl, true) over "
                      "(partition by host order by line_no "
                      "rows between unbounded preceding and current row)")
    else:
        lines = (
            "select host, i - 1 as line_no, trim(l[i]) as line "
            f"from (select host, string_split(robots_txt, chr(10)) as l "
            f"from {source}), unnest(generate_series(1, len(l))) t(i)")
        last_agent = ("last_value(agent_decl ignore nulls) over "
                      "(partition by host order by line_no "
                      "rows between unbounded preceding and current row)")
    # a rule ends the agent declaration run: a User-agent line AFTER a
    # rule starts a NEW group.  Standard trick: group id = running count
    # of rule lines; an agent line binds to the rules of its own group.
    return (
        f"with _lines as ({lines}), "
        "_parsed as (select host, line_no, "
        " lower(trim(split_part(line, ':', 1))) as directive, "
        " trim(substr(line, length(split_part(line, ':', 1)) + 2)) as value "
        " from _lines where contains(line, ':')), "
        "_tagged as (select host, line_no, directive, value, "
        " case when directive = 'user-agent' then lower(value) end as agent_decl "
        " from _parsed where directive in ('user-agent', 'allow', 'disallow')), "
        "_bound as (select host, line_no, directive, value, "
        f" {last_agent} as agent from _tagged) "
        "select host, agent, directive, value as path_prefix, "
        "cast(line_no as bigint) as line_no from _bound "
        "where directive in ('allow', 'disallow') "
        "and value <> '' and agent is not null"
    )


def match_sql(dialect: str, urls: str = "urls", rules: str = "rules",
              agent: str = "*") -> str:
    """SQL: admit each url of ``urls(url, host, path)`` against
    ``rules`` for ``agent`` (plus ``*``), longest prefix wins, Allow
    wins length ties (RFC 9309 least-restrictive), earliest line as the
    final tie-break, no match => allowed.

    The Spark formulation is ONE broadcast left join + a partial-agg
    ``max(struct)`` winner pick, so the URL side is never joined twice
    and the only exchange carries one pre-combined row per url (the
    line_dedup precedent: aggregate in Spark, window in the oracle —
    same result, skew-safe)."""
    if dialect == SPARK:
        return (
            f"with _r as (select * from {rules} "
            f" where agent in ('{agent}', '*')) "
            "select url, coalesce(w.d = 'allow', true) as allowed, "
            "w.p as matched_rule from ("
            "select /*+ BROADCAST(r) */ u.url, "
            "max(named_struct("
            " 'l', length(r.path_prefix), 'a', r.directive = 'allow', "
            " 'nl', -r.line_no, 'd', r.directive, 'p', r.path_prefix)) as w "
            f"from {urls} u left join _r r on u.host = r.host "
            "and startswith(u.path, r.path_prefix) group by u.url)"
        )
    return (
        f"with _r as (select * from {rules} "
        f" where agent in ('{agent}', '*')), "
        "_m as (select u.url, r.directive, r.path_prefix, "
        " row_number() over (partition by u.url "
        "  order by length(r.path_prefix) desc nulls last, "
        "  r.directive asc nulls last, r.line_no asc nulls last) as rk "
        f" from {urls} u left join _r r on u.host = r.host "
        " and starts_with(u.path, r.path_prefix)) "
        "select url, coalesce(directive = 'allow', true) as allowed, "
        "path_prefix as matched_rule from _m where rk = 1"
    )


def parse_robots(robots: DataFrame) -> DataFrame:
    """(host, robots_txt) → rules relation (see parse_robots_sql)."""
    return sql_over(lambda v: parse_robots_sql(SPARK, v), robots)


def robots_filter(urls: DataFrame, rules: DataFrame,
                  agent: str = "*") -> DataFrame:
    """urls(url, host, path) × rules → (url, allowed, matched_rule).
    The rules side is broadcast (SQL hint); matching is map-side."""
    return sql_over(
        lambda vu, vr: match_sql(SPARK, vu, vr, agent=agent), urls, rules)
