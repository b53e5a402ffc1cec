"""HTML serialization + textContent (WHATWG §13.3 serialization).

Matches the reference's observable serialization behavior
(`html`/`innerHTML`/`nodeHtml` getters, /root/reference/DOM.xs:1499-1633;
golden strings /root/reference/t/0-api.t:554-576): text escapes
``& < > \xa0``; attribute values escape ``& " \xa0``; attributes always
double-quoted; void elements never get a closing tag; raw-text element
children serialize unescaped.
"""

from __future__ import annotations

from .constants import (
    COMMENT_NODE,
    DOCTYPE_NODE,
    DOCUMENT_NODE,
    ELEMENT_NODE,
    FRAGMENT_NODE,
    LITERAL_TEXT_TAGS,
    NS_HTML,
    TEXT_NODE,
    VOID_TAGS,
)
from .document import NULL, Document


def escape_text(s: str) -> str:
    if not s:
        return s
    return (
        s.replace("&", "&amp;")
        .replace("\xa0", "&nbsp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
    )


def escape_attr(s: str) -> str:
    if not s:
        return s
    return s.replace("&", "&amp;").replace("\xa0", "&nbsp;").replace('"', "&quot;")


def node_open_tag(doc: Document, nid: int) -> str:
    """Serialize only the open tag (reference nodeHtml, DOM.xs:1499-1505)."""
    tag = doc.tag[nid]
    parts = ["<", tag]
    attrs = doc.attrs[nid]
    if attrs:
        for k, v in attrs.items():
            parts.append(" ")
            parts.append(k)
            parts.append('="')
            parts.append(escape_attr(v))
            parts.append('"')
    if doc.self_closed[nid] and doc.ns[nid] != NS_HTML:
        parts.append(" /")
    parts.append(">")
    return "".join(parts)


def serialize_doctype(doc: Document, nid: int) -> str:
    name = doc.text[nid] or ""
    attrs = doc.attrs[nid] or {}
    public = attrs.get("public")
    system = attrs.get("system")
    out = "<!DOCTYPE " + name if name else "<!DOCTYPE"
    if public is not None and public != "":
        out += ' PUBLIC "%s"' % public
        if system:
            out += ' "%s"' % system
    elif system:
        out += ' SYSTEM "%s"' % system
    return out + ">"


def serialize(doc: Document, nid: int, inner: bool = False) -> str:
    """outerHTML of nid (inner=False) or innerHTML (inner=True).

    Iterative DFS; matches myhtml_serialization_tree_callback output
    (invoked at /root/reference/DOM.xs:1622-1633).
    """
    out: list[str] = []
    # stack holds (node, is_close) entries
    if inner:
        stack = [(c, False) for c in reversed(doc.children(nid))]
    else:
        stack = [(nid, False)]
    tag_arr = doc.tag
    nt_arr = doc.node_type
    while stack:
        node, closing = stack.pop()
        if closing:
            out.append("</" + tag_arr[node] + ">")
            continue
        nt = nt_arr[node]
        if nt == TEXT_NODE:
            text = doc.text[node] or ""
            p = doc.parent[node]
            if p != NULL and nt_arr[p] == ELEMENT_NODE and \
                    doc.ns[p] == NS_HTML and (
                        tag_arr[p] in LITERAL_TEXT_TAGS
                        # spec: noscript serializes literally ONLY
                        # when the doc was parsed with scripting on
                        # (its content IS raw text then)
                        or (tag_arr[p] == "noscript"
                            and getattr(doc, "scripting", True))):
                out.append(text)
            else:
                out.append(escape_text(text))
        elif nt == COMMENT_NODE:
            out.append("<!--" + (doc.text[node] or "") + "-->")
        elif nt == DOCTYPE_NODE:
            out.append(serialize_doctype(doc, node))
        elif nt in (DOCUMENT_NODE, FRAGMENT_NODE):
            for c in reversed(doc.children(node)):
                stack.append((c, False))
        else:  # element
            out.append(node_open_tag(doc, node))
            if doc.ns[node] == NS_HTML and tag_arr[node] in VOID_TAGS:
                continue
            # spec 13.3 "serializing HTML fragments": pre/textarea/listing
            # re-emit the newline the parser will strip, else round-trip
            # loses it (round-4 fuzz find)
            if doc.ns[node] == NS_HTML and \
                    tag_arr[node] in ("pre", "textarea", "listing"):
                fc = doc.first_child[node]
                if fc != NULL and nt_arr[fc] == TEXT_NODE and \
                        (doc.text[fc] or "").startswith("\n"):
                    out.append("\n")
            if doc.self_closed[node] and doc.ns[node] != NS_HTML:
                continue
            stack.append((node, True))
            for c in reversed(doc.children(node)):
                stack.append((c, False))
    return "".join(out)


def text_content(doc: Document, nid: int) -> str:
    """Concatenation of descendant text nodes in document order
    (reference html5_dom_recursive_node_text, DOM.xs:64-77 — skips
    comments, recurses only into elements)."""
    out: list[str] = []
    nt_arr = doc.node_type
    stack = [(c, ) for c in ()]  # placeholder for type checkers
    stack = list(reversed(doc.children(nid)))
    while stack:
        node = stack.pop()
        nt = nt_arr[node]
        if nt == TEXT_NODE:
            t = doc.text[node]
            if t:
                out.append(t)
        elif nt == ELEMENT_NODE:
            for c in reversed(doc.children(node)):
                stack.append(c)
    return "".join(out)
