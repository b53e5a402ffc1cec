"""CSS selector queries as Spark operators.

Two physical strategies, picked automatically (our analog of the
reference's fast paths ``findTag/findClass/findId/findAttr`` that bypass
the CSS engine, /root/reference/DOM.xs:286-359):

1. **Lowered** — a selector that is a single compound of simple
   predicates (tag / #id / .class / [attr op value]) compiles to plain
   Spark Column predicates over the node table.  Catalyst then gets the
   whole plan: predicate pushdown, whole-stage codegen, no Python in the
   match loop.
2. **Kernel** — anything structural (combinators, :nth-*, :not/:has,
   comma lists) is evaluated by the full matcher inside a mapInPandas
   pass over ``(url, html)``, compiled once on the driver and shipped in
   the closure (reference precompiled selectors, DOM.pod:2544-2551).

Both return the same shape: ``(url, node_id, ord, tag, begin, length)``
— matched node handles + open-tag source spans, document order via
``ord`` (the pre-order index, reference collection order utils.c:297-300).
"""

from __future__ import annotations

from typing import Iterable, Iterator

from pyspark.sql import functions as F

from ..selector import matcher
from ..selector.parser import parse_selector

MATCHES_SCHEMA = (
    "url string, node_id bigint, ord bigint, tag string, "
    "begin bigint, length bigint"
)


# ---------------------------------------------------------------------------
# Strategy 1: lowering simple selectors to Column predicates
# ---------------------------------------------------------------------------

def lower_simple(simple, nodes_df):
    """One simple selector → Column predicate over NODES_SCHEMA, or None
    if it needs the kernel."""
    kind = simple[0]
    c = nodes_df
    if kind == "star":
        return F.lit(True)
    if kind == "tag":
        return c["tag"] == simple[1].lower()
    if kind == "id":
        return c["attrs"]["id"] == simple[1]
    if kind == "class":
        # [class~=v] semantics (reference findClass, DOM.xs:302-305)
        return F.array_contains(
            F.split(F.coalesce(c["attrs"]["class"], F.lit("")), r"\s+"),
            simple[1],
        )
    if kind == "attr":
        _, name, match, value, icase = simple
        v = c["attrs"][name]
        if match is None or value is None:
            return v.isNotNull()
        val = F.lit(value)
        if icase:
            v, val = F.lower(v), F.lower(val)
        if match == "equal":
            return v == val
        if match == "include":
            return F.array_contains(F.split(v, r"\s+"), value if not icase else value.lower())
        if match == "dash":
            return (v == val) | v.startswith(value + "-" if not icase else value.lower() + "-")
        if match == "prefix":
            return v.startswith(value if not icase else value.lower())
        if match == "suffix":
            return v.endswith(value if not icase else value.lower())
        if match == "substring":
            return v.contains(value if not icase else value.lower())
    return None


def try_lower(selector: str, nodes_df):
    """Whole-selector lowering: single entry, single step, all simples
    lowerable → Column predicate; else None."""
    sel = parse_selector(selector)
    if not sel.valid or len(sel.entries) != 1:
        return None
    steps = sel.entries[0].steps
    if len(steps) != 1:
        return None
    pred = nodes_df["node_type"] == 1
    for s in steps[0][1]:
        p = lower_simple(s, nodes_df)
        if p is None:
            return None
        pred = pred & p
    return pred


def css_find_nodes(nodes_df, selector: str):
    """Lowered strategy over an existing node table; raises if the
    selector needs the kernel (caller falls back to css_find)."""
    pred = try_lower(selector, nodes_df)
    if pred is None:
        raise ValueError(f"selector {selector!r} is not lowerable; use css_find")
    return (
        nodes_df.filter(pred)
        .select(
            "url", "node_id", "ord", "tag",
            F.col("elem_begin").alias("begin"),
            F.col("elem_length").alias("length"),
        )
    )


# ---------------------------------------------------------------------------
# Strategy 2: full matcher kernel
# ---------------------------------------------------------------------------

def css_find(df, selector: str, first: bool = False):
    """DataFrame(url, html) → matches via the full CSS L4 matcher.

    ``first=True`` is ``at()`` — early exit per document inside the
    kernel (reference utils.c:248-254)."""
    compiled = matcher.compile_selector(selector)

    def run(batches: Iterable) -> Iterator:
        import pandas as pd

        from .extract import parse_document

        cols = ["url", "node_id", "ord", "tag", "begin", "length"]
        for pdf in batches:
            rows = []
            # batch-local exact-duplicate collapse (see extract_pages):
            # matches are a pure function of the html bytes, so each
            # distinct document is parsed+matched once per batch
            memo: dict = {}
            for url, html in zip(pdf["url"], pdf["html"]):
                hit = memo.get(html)
                if hit is None:
                    doc = parse_document(html)
                    pos = doc.order_pos
                    hit = [
                        (nid, pos[nid], doc.tag[nid],
                         doc.elem_begin[nid], doc.elem_length[nid])
                        for nid in matcher.find(doc, compiled, first=first)]
                    memo[html] = hit
                rows.extend((url,) + t for t in hit)
            yield pd.DataFrame(rows, columns=cols)

    return df.select("url", "html").mapInPandas(run, schema=MATCHES_SCHEMA)


def css_at(df, selector: str):
    return css_find(df, selector, first=True)


def css_extract(df, selector: str, what: str = "text"):
    """Per-match scalar extraction: text | html | inner_html | inner_text
    | attr:<name> (None when the attribute is absent).

    The Collection sinks of the reference (Collection.pm:117-131) —
    returns (url, node_id, ord, value)."""
    compiled = matcher.compile_selector(selector)
    attr_name = what[5:] if what.startswith("attr:") else None
    if attr_name is None and what not in (
            "text", "html", "inner_html", "inner_text"):
        raise ValueError(what)

    def run(batches: Iterable) -> Iterator:
        import pandas as pd

        from ..dom import innertext, serializer
        from .extract import parse_document

        cols = ["url", "node_id", "ord", "value"]
        for pdf in batches:
            rows = []
            memo: dict = {}   # batch-local exact-dup collapse (see css_find)
            for url, html in zip(pdf["url"], pdf["html"]):
                hit = memo.get(html)
                if hit is None:
                    doc = parse_document(html)
                    pos = doc.order_pos
                    hit = []
                    for nid in matcher.find(doc, compiled):
                        if attr_name is not None:
                            a = doc.attrs[nid]
                            v = a.get(attr_name) if a else None
                        elif what == "text":
                            v = serializer.text_content(doc, nid)
                        elif what == "html":
                            v = serializer.serialize(doc, nid)
                        elif what == "inner_html":
                            v = serializer.serialize(doc, nid, inner=True)
                        else:
                            v = innertext.inner_text(doc, nid)
                        hit.append((nid, pos[nid], v))
                    memo[html] = hit
                rows.extend((url,) + t for t in hit)
            yield pd.DataFrame(rows, columns=cols)

    return df.select("url", "html").mapInPandas(
        run, schema="url string, node_id bigint, ord bigint, value string")


def css_extract_multi(df, selector: str, whats: tuple = ("text",)):
    """Like :func:`css_extract` but pulls SEVERAL sinks per match in
    ONE parse — at crawl scale the parse dominates, so chaining
    css_extract calls (one parse per sink) doubles/triples the kernel
    cost that this fuses away.  Returns (url, node_id, ord, <one
    column per sink>); ``attr:name`` sinks become ``attr_name``
    columns (None when absent)."""
    compiled = matcher.compile_selector(selector)
    for w in whats:
        if not w.startswith("attr:") and w not in (
                "text", "html", "inner_html", "inner_text"):
            raise ValueError(w)
    colnames = [w.replace("attr:", "attr_").replace(":", "_")
                for w in whats]

    def run(batches: Iterable) -> Iterator:
        import pandas as pd

        from ..dom import innertext, serializer
        from .extract import parse_document

        cols = ["url", "node_id", "ord"] + colnames
        for pdf in batches:
            rows = []
            memo: dict = {}   # batch-local exact-dup collapse (see css_find)
            for url, html in zip(pdf["url"], pdf["html"]):
                hit = memo.get(html)
                if hit is None:
                    doc = parse_document(html)
                    pos = doc.order_pos
                    hit = []
                    for nid in matcher.find(doc, compiled):
                        vals = []
                        for what in whats:
                            if what.startswith("attr:"):
                                a = doc.attrs[nid]
                                vals.append(a.get(what[5:]) if a else None)
                            elif what == "text":
                                vals.append(serializer.text_content(doc, nid))
                            elif what == "html":
                                vals.append(serializer.serialize(doc, nid))
                            elif what == "inner_html":
                                vals.append(serializer.serialize(
                                    doc, nid, inner=True))
                            else:
                                vals.append(innertext.inner_text(doc, nid))
                        hit.append((nid, pos[nid], *vals))
                    memo[html] = hit
                rows.extend((url,) + t for t in hit)
            yield pd.DataFrame(rows, columns=cols)

    schema = ("url string, node_id bigint, ord bigint, "
              + ", ".join(f"{c} string" for c in colnames))
    return df.select("url", "html").mapInPandas(run, schema=schema)
