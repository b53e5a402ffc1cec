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
    "text string, attrs map<string,string>, self_closed boolean, "
    "raw_begin bigint, raw_length bigint, elem_begin bigint, elem_length bigint"
)

_COLS = [c.split(" ")[0] for c in NODES_SCHEMA.split(", ")]


def doc_node_rows(url: str, html) -> list[tuple]:
    doc = parse_document(html)
    order = doc.order
    pos = doc.order_pos
    end = doc.subtree_end
    depth = {doc.root: 0}
    rows = []
    for nid in order:
        p = doc.parent[nid]
        d = depth.get(p, -1) + 1
        depth[nid] = d
        rows.append((
            url, nid, p if p != -1 else None, pos[nid], end[nid], d,
            doc.tag[nid], doc.ns[nid], doc.node_type[nid],
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
    expensive map/string Arrow columns entirely."""
    if columns is None:
        cols, schema = _COLS, NODES_SCHEMA
    else:
        keep = [c for c in _COLS if c in set(columns) | {"url"}]
        idx = [_COLS.index(c) for c in keep]
        cols = keep
        schema = ", ".join(
            p for p in NODES_SCHEMA.split(", ") if p.split(" ")[0] in keep)

    def run(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows: list[tuple] = []
            for url, html in zip(pdf["url"], pdf["html"]):
                r = doc_node_rows(url, html)
                if elements_only:
                    r = [t for t in r if t[8] == ELEMENT_NODE]
                if columns is not None:
                    r = [tuple(t[i] for i in idx) for t in r]
                rows.extend(r)
            yield pd.DataFrame(rows, columns=cols)

    return df.select("url", "html").mapInPandas(run, schema=schema)
