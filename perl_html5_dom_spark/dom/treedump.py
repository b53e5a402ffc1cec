"""html5lib-tests tree-construction dump format.

Mirrors the reference's conformance-runner serializer
(/root/reference/examples/html5lib_tests.pl:197-275) so the published
html5lib-tests ``.dat`` corpus can be dropped in as goldens: every node
on its own ``| ``-prefixed line, two-space indent per depth,
``"text"`` for text nodes, ``<!-- c -->`` comments,
``<!DOCTYPE name "pub" "sys">``, ``<svg tag>`` / ``<math tag>`` for
foreign elements, attributes sorted by name on a child line, and a
``content`` line under ``<template>``.
"""

from __future__ import annotations

from .constants import (
    COMMENT_NODE,
    DOCTYPE_NODE,
    ELEMENT_NODE,
    FOREIGN_ATTR_ADJUSTMENTS,
    NS_HTML,
    NS_MATHML,
    NS_SVG,
    TEXT_NODE,
)

_NS_PREFIX = {NS_SVG: "svg ", NS_MATHML: "math "}


def _attr_line(name: str, ns: int) -> str:
    # Only FOREIGN elements run "adjust foreign attributes" (WHATWG
    # 13.2.6.2), so only their xlink:/xml:/xmlns attributes are
    # namespaced; on an HTML element the same spelling is a literal
    # attribute name and the corpus dumps it verbatim (xml:lang="en").
    # And the adjustment is a FIXED table of qualified names, not a
    # prefix rule: xlink:href is namespaced but xlink:foo stays a
    # literal attribute name even on a foreign element.
    if ns == NS_HTML or (name not in FOREIGN_ATTR_ADJUSTMENTS):
        return name
    if name == "xmlns":
        return "xmlns xmlns"
    prefix, _, local = name.partition(":")
    return f"{prefix} {local}"


def tree_format(doc, root: int | None = None) -> str:
    """Dump the (sub)tree in html5lib tree-construction format."""
    out: list[str] = []
    start = doc.root if root is None else root

    def emit(nid: int, level: int) -> None:
        pad = "| " + "  " * level
        nt = doc.node_type[nid]
        child_level = level + 1
        if nt == DOCTYPE_NODE:
            name = doc.text[nid] or ""
            attrs = doc.attrs[nid] or {}
            public = attrs.get("public", "")
            system = attrs.get("system", "")
            dt = "<!DOCTYPE "
            if name:
                dt += name
                if public or system:
                    dt += f' "{public}" "{system}"'
            out.append(pad + dt + ">")
        elif nt == COMMENT_NODE:
            out.append(pad + f"<!-- {doc.text[nid]} -->")
        elif nt == TEXT_NODE:
            out.append(pad + f'"{doc.text[nid]}"')
        elif nt == ELEMENT_NODE:
            ns = doc.ns[nid]
            out.append(pad + "<" + _NS_PREFIX.get(ns, "") + doc.tag[nid] + ">")
            apad = "| " + "  " * (level + 1)
            for name, value in sorted((doc.attrs[nid] or {}).items()):
                out.append(apad + _attr_line(name, ns) + f'="{value}"')
            if ns == NS_HTML and doc.tag[nid] == "template":
                out.append(apad + "content")
                child_level += 1
        c = doc.first_child[nid]
        while c != -1:
            emit(c, child_level)
            c = doc.next_sib[c]

    c = doc.first_child[start]
    while c != -1:
        emit(c, 0)
        c = doc.next_sib[c]
    return "\n".join(out)
