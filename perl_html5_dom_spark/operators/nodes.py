"""Exploded DOM node table — the relational face of the engine.

One row per DOM node (the reference's "row type", SURVEY.md §1.2 /
DOM.xs:105-126): structure links become id columns, the pointer tree
becomes pre-order interval columns so structural queries are relational:

  * child axis        — self-join ``child.parent_id == parent.node_id``
    (partition-local: a document never spans partitions)
  * descendant axis   — pre-order interval containment
    ``anc.ord < d.ord AND d.ord <= anc.subtree_end`` (range join; the
    analog of the reference's subtree walk utils.c:256-304)
  * sibling position  — ``row_number() OVER (PARTITION BY url, parent_id
    ORDER BY node_id)`` (the :nth-child window, SURVEY.md §2.5)

At 100 TB you materialize this only for the selector-debug path — the
extraction kernel keeps node arrays inside the UDF; but every reference
navigation/join operator (SURVEY.md §2.3) is expressible on this table
with plain Catalyst-optimizable DataFrame ops.
"""

from __future__ import annotations

from typing import Iterable, Iterator

from ..dom.constants import ELEMENT_NODE
from .extract import parse_document

NODES_SCHEMA = (
    "url string, node_id bigint, parent_id bigint, ord bigint, "
    "subtree_end bigint, depth int, tag string, ns int, node_type int, "
    "path string, "
    "text string, attrs map<string,string>, self_closed boolean, "
    "raw_begin bigint, raw_length bigint, elem_begin bigint, elem_length bigint"
)

_COLS = [c.split(" ")[0] for c in NODES_SCHEMA.split(", ")]


def doc_node_rows(url: str, html) -> list[tuple]:
    """Row-tuple form of one document's node table (tests/debug)."""
    doc = parse_document(html)
    order = doc.order
    pos = doc.order_pos
    end = doc.subtree_end
    depth = {doc.root: 0}
    paths = [""] * len(doc.parent)
    rows = []
    for nid in order:
        p = doc.parent[nid]
        d = depth.get(p, -1) + 1
        depth[nid] = d
        if doc.node_type[nid] == ELEMENT_NODE:
            paths[nid] = (paths[p] + ">" + doc.tag[nid]
                          if p != -1 and paths[p] else doc.tag[nid])
        rows.append((
            url, nid, p if p != -1 else None, pos[nid], end[nid], d,
            doc.tag[nid], doc.ns[nid], doc.node_type[nid],
            paths[nid] if doc.node_type[nid] == ELEMENT_NODE else None,
            doc.text[nid],
            dict(doc.attrs[nid]) if doc.attrs[nid] is not None else None,
            bool(doc.self_closed[nid]),
            doc.raw_begin[nid], doc.raw_length[nid],
            doc.elem_begin[nid], doc.elem_length[nid],
        ))
    return rows


def nodes_df(df, elements_only: bool = False, columns: list[str] | None = None):
    """DataFrame(url, html) → node table.

    ``columns`` prunes the output inside the kernel (the analog of the
    reference's lazy node materialization, DOM.xs:159-180): structural
    queries that never read ``attrs``/``text`` skip building the
    expensive map/string Arrow columns entirely.

    Construction is COLUMNAR: the kernel appends straight into per-column
    lists (the Document already stores struct-of-arrays), so unrequested
    columns cost nothing and pandas never pivots a row list."""
    keep = (_COLS if columns is None
            else [c for c in _COLS if c in set(columns) | {"url"}])
    schema = (NODES_SCHEMA if columns is None else ", ".join(
        p for p in NODES_SCHEMA.split(", ") if p.split(" ")[0] in set(keep)))
    want = set(keep)

    doc_cols = [c for c in keep if c != "url"]

    def one_doc(html) -> tuple[int, dict[str, list]]:
        """Per-document column lists (everything except url)."""
        doc = parse_document(html)
        order = doc.order
        if elements_only:
            nt = doc.node_type
            nids = [n for n in order if nt[n] == ELEMENT_NODE]
        else:
            nids = order
        d: dict[str, list] = {}
        if "node_id" in want:
            d["node_id"] = nids
        if "parent_id" in want:
            par = doc.parent
            d["parent_id"] = [par[n] if par[n] != -1 else None for n in nids]
        if "ord" in want:
            pos = doc.order_pos
            d["ord"] = [pos[n] for n in nids]
        if "subtree_end" in want:
            end = doc.subtree_end
            d["subtree_end"] = [end[n] for n in nids]
        if "depth" in want:
            # depth needs every ancestor; pre-order guarantees a
            # parent is filled before its children, so a flat
            # list (no dict hashing) suffices
            par = doc.parent
            depth = [0] * len(par)
            for n in order:
                p = par[n]
                depth[n] = depth[p] + 1 if p != -1 else 0
            d["depth"] = [depth[n] for n in nids]
        if "tag" in want:
            tag = doc.tag
            d["tag"] = [tag[n] for n in nids]
        if "ns" in want:
            ns = doc.ns
            d["ns"] = [ns[n] for n in nids]
        if "node_type" in want:
            nt = doc.node_type
            d["node_type"] = [nt[n] for n in nids]
        if "path" in want:
            # root-to-node tag chain ('html>body>div'); like
            # depth, pre-order fills parents first.  The
            # site-template detector groups on this column.
            par = doc.parent
            tag = doc.tag
            nt2 = doc.node_type
            paths = [""] * len(par)
            for n in order:
                if nt2[n] != ELEMENT_NODE:
                    continue
                p = par[n]
                paths[n] = (paths[p] + ">" + tag[n]
                            if p != -1 and paths[p] else tag[n])
            d["path"] = [paths[n] if nt2[n] == ELEMENT_NODE else None
                         for n in nids]
        if "text" in want:
            text = doc.text
            d["text"] = [text[n] for n in nids]
        if "attrs" in want:
            attrs = doc.attrs
            d["attrs"] = [attrs[n] for n in nids]
        if "self_closed" in want:
            sc = doc.self_closed
            d["self_closed"] = [bool(sc[n]) for n in nids]
        if "raw_begin" in want:
            rb = doc.raw_begin
            d["raw_begin"] = [rb[n] for n in nids]
        if "raw_length" in want:
            rl = doc.raw_length
            d["raw_length"] = [rl[n] for n in nids]
        if "elem_begin" in want:
            eb = doc.elem_begin
            d["elem_begin"] = [eb[n] for n in nids]
        if "elem_length" in want:
            el = doc.elem_length
            d["elem_length"] = [el[n] for n in nids]
        return len(nids), d

    def run(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            data: dict[str, list] = {c: [] for c in keep}
            # batch-local exact-duplicate collapse (see extract_pages):
            # the node table of a document is a pure function of its
            # html bytes, so each distinct document is parsed and
            # column-built once per batch; replicas pay one C-level
            # list extend per column
            memo: dict = {}
            for url, html in zip(pdf["url"], pdf["html"]):
                hit = memo.get(html)
                if hit is None:
                    hit = one_doc(html)
                    memo[html] = hit
                n, d = hit
                if "url" in want:
                    data["url"].extend([url] * n)
                for c in doc_cols:
                    data[c].extend(d[c])
            yield pd.DataFrame(data, columns=keep)

    return df.select("url", "html").mapInPandas(run, schema=schema)


def frequent_paths(pages, min_frac: float = 0.9):
    """Site-template (boilerplate) detection by DOM-path frequency:
    (path, n_pages, frac, boilerplate) — a root-to-node tag chain that
    appears on ≥ ``min_frac`` of a site's pages is chrome
    (header/nav/footer skeletons repeat; article content paths vary).
    The complement of text-density scoring: structural evidence for
    the boilerplate strip, computed site-wide instead of per-page.

    Plan: per-page DISTINCT paths (map-side combine inside the
    aggregate), one partial-agg groupBy(path), and the page total rides
    in as a broadcast 1-row relation — two narrow shuffles, no driver
    collect."""
    from pyspark.sql import functions as F

    nd = nodes_df(pages, elements_only=True, columns=["url", "path"])
    per_page = nd.distinct()
    total = pages.agg(F.count("*").alias("n_total"))
    return (
        per_page.groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n_pages"))
        .crossJoin(F.broadcast(total))
        .selectExpr(
            "path", "n_pages",
            "round(n_pages / n_total, 6) as frac",
            f"n_pages / n_total >= {min_frac} as boilerplate")
    )
