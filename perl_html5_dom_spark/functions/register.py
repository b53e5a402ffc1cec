"""Spark SQL function registration — the css_* family.

Registers the engine's scalar surface as SQL-callable functions so the
query face is usable from plain ``spark.sql``.  All are Arrow-batched
pandas UDFs (never per-row Python); each compiles its selector once per
executor via an LRU cache — the executor-side analog of the reference's
precompiled selectors (DOM.pod:2544-2551).

    SELECT css_text(html, 'article h1')       -- first match's text
    SELECT css_count(html, 'a[href]')         -- number of matches
    SELECT css_inner_text(html)               -- body innerText
    SELECT css_main_text(html)                -- boilerplate-stripped text
    SELECT css_html(html, 'p')                -- first match outerHTML

The raw callables stay plain functions; ``pandas_udf`` wrapping happens
inside ``register_all`` on the driver — a module-level decorator would
re-evaluate on executor import, where no SparkSession exists.
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd


@lru_cache(maxsize=256)
def _compiled(selector: str):
    from ..selector import matcher

    return matcher.compile_selector(selector)


def _parse(html):
    from ..operators.extract import parse_document

    return parse_document(html)


def css_text_fn(html: pd.Series, selector: pd.Series) -> pd.Series:
    from ..dom import serializer
    from ..selector import matcher

    out = []
    for h, sel in zip(html, selector):
        doc = _parse(h)
        nid = matcher.at(doc, _compiled(sel))
        out.append(serializer.text_content(doc, nid) if nid != -1 else None)
    return pd.Series(out, dtype=object)


def css_count_fn(html: pd.Series, selector: pd.Series) -> pd.Series:
    from ..selector import matcher

    return pd.Series(
        [len(matcher.find(_parse(h), _compiled(s)))
         for h, s in zip(html, selector)])


def css_html_fn(html: pd.Series, selector: pd.Series) -> pd.Series:
    from ..dom import serializer
    from ..selector import matcher

    out = []
    for h, sel in zip(html, selector):
        doc = _parse(h)
        nid = matcher.at(doc, _compiled(sel))
        out.append(serializer.serialize(doc, nid) if nid != -1 else None)
    return pd.Series(out, dtype=object)


def css_inner_text_fn(html: pd.Series) -> pd.Series:
    from ..dom import innertext

    out = []
    for h in html:
        doc = _parse(h)
        body = doc.body_node if doc.body_node != -1 else doc.root
        out.append(innertext.inner_text(doc, body))
    return pd.Series(out, dtype=object)


def css_main_text_fn(html: pd.Series) -> pd.Series:
    from ..operators.extract import main_text

    return pd.Series([main_text(_parse(h)) for h in html], dtype=object)


def css_attr_fn(html: pd.Series, selector: pd.Series,
                name: pd.Series) -> pd.Series:
    from ..selector import matcher

    out = []
    for h, sel, attr in zip(html, selector, name):
        doc = _parse(h)
        nid = matcher.at(doc, _compiled(sel))
        a = doc.attrs[nid] if nid != -1 else None
        out.append(a.get(attr) if a else None)
    return pd.Series(out, dtype=object)


def register_all(spark) -> None:
    from pyspark.sql.functions import pandas_udf

    spark.udf.register("css_text", pandas_udf(css_text_fn, "string"))
    spark.udf.register("css_count", pandas_udf(css_count_fn, "long"))
    spark.udf.register("css_html", pandas_udf(css_html_fn, "string"))
    spark.udf.register("css_inner_text", pandas_udf(css_inner_text_fn, "string"))
    spark.udf.register("css_main_text", pandas_udf(css_main_text_fn, "string"))
    spark.udf.register("css_attr", pandas_udf(css_attr_fn, "string"))
