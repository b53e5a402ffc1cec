"""Optimistic fast-lane tree builder.

The full insertion-mode state machine (treebuilder.py) spends most of
its time dispatching per-token through mode handlers that exist for
cases the common crawl page never hits (tables, templates, framesets,
foreign content, adoption agency).  This module parses the common shape
directly with a plain element stack and **bails out** — raising
``_Bail`` — the moment anything appears whose semantics could diverge
from the spec machine:

  * any tag outside the simple vocabulary (forms, template, select,
    pre, textarea, frames, SVG/MathML, caption/col/colgroup, ...),
  * END-tag-driven adoption agency (a mismatched formatting end tag,
    repeated <a>/<nobr>, Noah's-ark duplicates),
  * foster-parenting territory (non-whitespace text in table context),
  * anything unusual around the document frame (quirky doctype,
    text between </head> and <body>, text after </body>).

  Implicit closes crossing open formatting elements are handled
  spec-faithfully: the active-formatting list keeps the entry and the
  element is RECONSTRUCTED at the next text/phrasing insertion (WHATWG
  "reconstruct the active formatting elements"), with markers at table
  cells; well-formed tables parse via a dedicated sub-parser.

``parse`` falls back to the full TreeBuilder on bail, so the result is
ALWAYS spec-identical; the differential test (tests/test_fastparse.py)
asserts tree equality between the two lanes on every input it can
generate.  Tokenization is shared — positions, entities and raw-text
handling are byte-identical by construction.
"""

from __future__ import annotations

from .constants import (
    FORMATTING_TAGS,
    HEADING_TAGS,
    NS_HTML,
    VOID_TAGS,
)
from .document import NULL, Document
from .tokenizer import Tokenizer
from .treebuilder import _BLOCK_START, TreeBuilder

_WS = "\t\n\x0c\r "


class _Bail(Exception):
    pass


#: head-only elements handled in the fast lane
_HEAD_VOID = frozenset(("base", "basefont", "bgsound", "link", "meta"))
_RAWTEXT_MODES = {
    "title": "rcdata",
    "style": "rawtext",
    "noframes": "rawtext",
    "noscript": "rawtext",
    "script": "script",
}

#: body start tags the fast lane accepts, by treatment
_PHRASING = frozenset(
    """span abbr cite dfn kbd mark q sub sup time var bdi bdo data del
    ins samp output label wbr""".split()
)
_BODY_VOID = frozenset(("br", "img", "wbr", "area", "embed", "keygen", "hr"))
_LIST_ITEM = frozenset(("li",))
_DD_DT = frozenset(("dd", "dt"))
_IMPLIED = frozenset(("dd", "dt", "li", "p"))

_OK_BODY_START = (
    _BLOCK_START | HEADING_TAGS | FORMATTING_TAGS | _PHRASING | _BODY_VOID
    | _LIST_ITEM | _DD_DT | _HEAD_VOID | frozenset(_RAWTEXT_MODES)
)

# elements that terminate the li / dd-dt backward search ("special" but
# not address/div/p, restricted to the fast vocabulary + table scope)
_LI_STOP = frozenset(
    (_BLOCK_START | HEADING_TAGS | _LIST_ITEM | _DD_DT | _BODY_VOID
     | frozenset(_RAWTEXT_MODES) | _HEAD_VOID
     | frozenset(("table", "td", "th")))
    - {"address", "div", "p"}
)

#: "has an element in scope" boundaries present in the fast vocabulary
#: (WHATWG scope list: html, table, td, th, + others we bail on) — walks
#: for p/heading/block end tags must not cross these
_SCOPE_STOP = frozenset(("html", "table", "td", "th"))
_TABLE_SECTIONS = frozenset(("thead", "tbody", "tfoot"))
#: start tags that close an open cell ("in cell" spec list; table is NOT
#: among them — a nested <table> stays inside the cell)
_CELL_CLOSERS = frozenset(
    ("td", "th", "tr", "caption", "col", "colgroup")) | _TABLE_SECTIONS

#: "special" elements of the fast vocabulary (any-other-end-tag rule)
_SPECIAL = (
    _BLOCK_START | HEADING_TAGS | _LIST_ITEM | _DD_DT | _BODY_VOID
    | _HEAD_VOID | frozenset(_RAWTEXT_MODES)
    | frozenset(("html", "head", "body"))
)


#: active-formatting-list marker (cell boundaries), like the full machine
_MARKER = ("MARKER",)


class _Fast:
    __slots__ = ("doc", "tok", "stack", "tags", "open_fmt", "phase", "_L")

    def __init__(self, src: str) -> None:
        self.doc = Document()
        self.tok = Tokenizer(src)
        self.stack: list[int] = []     # node ids
        self.tags: list[str] = []      # parallel tag names
        #: active formatting list: [tag, token_attrs, on_stack] entries
        #: (insertion order) plus _MARKER sentinels at cell boundaries —
        #: the fast-lane twin of the full machine's afe
        self.open_fmt: list = []
        d = self.doc
        # cached struct-of-array refs: node allocation is the fast lane's
        # hottest call — append inline, no Document method hops
        self._L = (
            d.parent, d.first_child, d.last_child, d.next_sib, d.prev_sib,
            d.tag, d.ns, d.node_type, d.text, d.attrs, d.self_closed,
            d.raw_begin, d.raw_length, d.elem_begin, d.elem_length,
        )

    # -- tree helpers ---------------------------------------------------

    def _el(self, token, tag=None) -> int:
        (parent, first, last, nxt, prv, tags, nss, types, texts, attrss,
         sc, rb, rl, eb, el) = self._L
        nid = len(tags)
        parent.append(NULL)
        first.append(NULL)
        last.append(NULL)
        nxt.append(NULL)
        prv.append(NULL)
        nss.append(NS_HTML)
        types.append(1)                # ELEMENT_NODE
        texts.append(None)
        if token is not None:
            tags.append(tag or token[1])
            attrss.append(dict(token[2]) if token[2] else None)
            sc.append(bool(token[3]))
            if len(token) >= 8:
                rb.append(token[4])
                rl.append(token[5])
                eb.append(token[6])
                el.append(token[7])
            else:
                rb.append(0)
                rl.append(0)
                eb.append(0)
                el.append(0)
        else:
            tags.append(tag)
            attrss.append(None)
            sc.append(False)
            rb.append(0)
            rl.append(0)
            eb.append(0)
            el.append(0)
        self.doc._dirty = True
        return nid

    def _append(self, nid: int) -> None:
        self.doc.append_child(self.stack[-1], nid)

    def _push(self, token, tag=None) -> int:
        nid = self._el(token, tag)
        self._append(nid)
        self.stack.append(nid)
        self.tags.append(tag or token[1])
        return nid

    def _text(self, text: str, parent: int | None = None) -> None:
        if not text:
            return
        doc = self.doc
        p = self.stack[-1] if parent is None else parent
        prev = doc.last_child[p]
        if prev != NULL and doc.node_type[prev] == 3:
            doc.text[prev] = (doc.text[prev] or "") + text
            return
        (par, first, last, nxt, prv, tags, nss, types, texts, attrss,
         sc, rb, rl, eb, el) = self._L
        nid = len(tags)
        par.append(NULL)
        first.append(NULL)
        last.append(NULL)
        nxt.append(NULL)
        prv.append(NULL)
        tags.append("-text")
        nss.append(NS_HTML)
        types.append(3)                # TEXT_NODE
        texts.append(text)
        attrss.append(None)
        sc.append(False)
        rb.append(0)
        rl.append(0)
        eb.append(0)
        el.append(0)
        doc._dirty = True
        doc.append_child(p, nid)

    def _comment(self, token, parent: int | None = None) -> None:
        doc = self.doc
        nid = doc.new_comment(token[1])
        if len(token) >= 6:
            doc.raw_begin[nid] = token[2]
            doc.raw_length[nid] = token[3]
            doc.elem_begin[nid] = token[4]
            doc.elem_length[nid] = token[5]
        doc.append_child(self.stack[-1] if parent is None else parent, nid)

    def _pop(self) -> str:
        """Pop + REMOVE a formatting element from the AFE (the spec's
        matched-close / clear-to-marker removal)."""
        self.stack.pop()
        t = self.tags.pop()
        if t in FORMATTING_TAGS:
            for i in range(len(self.open_fmt) - 1, -1, -1):
                e = self.open_fmt[i]
                if e is not _MARKER and e[0] == t and e[2]:
                    del self.open_fmt[i]
                    return t
            raise _Bail            # AFE out of sync: slow lane
        return t

    def _pop_implicit(self) -> str:
        """Pop during implied-end handling.  A formatting element popped
        this way STAYS in the active formatting list (the spec machine
        reconstructs it at the next text/phrasing insertion) — mark its
        entry off-stack instead of removing it."""
        t = self.tags[-1]
        if t in FORMATTING_TAGS:
            for i in range(len(self.open_fmt) - 1, -1, -1):
                e = self.open_fmt[i]
                if e is not _MARKER and e[0] == t and e[2]:
                    e[2] = False
                    self.stack.pop()
                    self.tags.pop()
                    return t
            raise _Bail            # AFE out of sync: slow lane
        return self._pop()

    def _afe_tail(self):
        """AFE entries after the last marker (spec scope of the Noah's
        ark / <a>-duplicate checks and of reconstruction)."""
        out = []
        for e in reversed(self.open_fmt):
            if e is _MARKER:
                break
            out.append(e)
        return out

    def _reconstruct(self) -> None:
        """Re-open off-stack AFE entries in order (WHATWG 'reconstruct
        the active formatting elements'; full machine treebuilder.py
        _reconstruct_afe) — new position-less elements with the original
        token's attributes, exactly like the spec machine."""
        fmt = self.open_fmt
        if not fmt:
            return
        last = fmt[-1]
        if last is _MARKER or last[2]:
            return
        i = len(fmt) - 1
        while i > 0:
            i -= 1
            e = fmt[i]
            if e is _MARKER or e[2]:
                i += 1
                break
        doc = self.doc
        while i < len(fmt):
            e = fmt[i]
            nid = doc.new_element(e[0], NS_HTML,
                                  dict(e[1]) if e[1] else None)
            self._append(nid)
            self.stack.append(nid)
            self.tags.append(e[0])
            e[2] = True
            i += 1

    def _pop_until(self, tag: str) -> None:
        while True:
            if self.tags[-1] == tag:
                self._pop()
                return
            self._pop_implicit()

    def _close_p(self) -> None:
        # "close a p element in BUTTON scope": the walk stops at scope
        # boundaries (a p outside an enclosing table cell stays open)
        for t in reversed(self.tags):
            if t == "p":
                self._pop_until("p")
                return
            if t in _SCOPE_STOP:
                return

    def _rawtext(self, token) -> None:
        tag = token[1]
        self._push(token)
        self.tok.set_rawtext(tag, _RAWTEXT_MODES[tag])
        t = self.tok.next_token()
        if t[0] == "char":
            self._text(t[1])
            t = self.tok.next_token()
        # eof or the matching end tag both just close the element
        if t[0] not in ("end", "eof"):
            raise _Bail
        self.stack.pop()
        self.tags.pop()

    # -- main -----------------------------------------------------------

    def run(self) -> Document:
        doc = self.doc
        tok = self.tok
        next_token = tok.next_token

        # ---- initial / before html ----
        token = next_token()
        while token[0] == "comment":
            self._comment(token, parent=doc.root)
            token = next_token()
        if token[0] == "doctype":
            name, public, system, fq = token[1], token[2], token[3], token[4]
            if fq or name != "html" or public is not None or system is not None:
                raise _Bail
            nid = doc.new_doctype(name, public, system)
            doc.append_child(doc.root, nid)
            doc.doctype_node = nid
            token = next_token()
        else:
            doc.quirks = True
        while token[0] == "comment":
            self._comment(token, parent=doc.root)
            token = next_token()
        if token[0] == "char":
            if token[1].lstrip(_WS):
                raise _Bail          # implied <html> from text
            token = next_token()
        if token[0] != "start" or token[1] != "html":
            raise _Bail
        html = self._el(token)
        doc.append_child(doc.root, html)
        doc.html_node = html
        self.stack.append(html)
        self.tags.append("html")

        # ---- before head ----
        token = next_token()
        while True:
            if token[0] == "comment":
                self._comment(token)
            elif token[0] == "char":
                if token[1].lstrip(_WS):
                    raise _Bail
            else:
                break
            token = next_token()
        if token[0] == "start" and token[1] == "head":
            head = self._push(token)
        else:
            head = self._push(None, "head")
            # token reprocessed below in head
        doc.head_node = head

        # ---- in head ----
        if not (token[0] == "start" and token[1] == "head"):
            pending: tuple | None = token
        else:
            pending = None
        while True:
            token = pending if pending is not None else next_token()
            pending = None
            tt = token[0]
            if tt == "char":
                ws = token[1]
                stripped = ws.lstrip(_WS)
                if stripped:
                    lead = ws[: len(ws) - len(stripped)]
                    if lead:
                        self._text(lead)
                    # implied </head>; only <body> handled after text
                    raise _Bail
                self._text(ws)
                continue
            if tt == "comment":
                self._comment(token)
                continue
            if tt == "start":
                tag = token[1]
                if tag in _HEAD_VOID:
                    nid = self._el(token)
                    self._append(nid)
                    continue
                if tag in _RAWTEXT_MODES:
                    self._rawtext(token)
                    continue
                # implied </head>
                self._pop()           # head
                pending = token
                break
            if tt == "end":
                if token[1] == "head":
                    self._pop()
                    break
                if token[1] in ("body", "html", "br"):
                    self._pop()
                    pending = token
                    break
                continue              # ignored end tag
            if tt == "eof":
                raise _Bail           # head-only document: rare, slow lane
            raise _Bail

        # ---- after head ----
        while True:
            token = pending if pending is not None else next_token()
            pending = None
            tt = token[0]
            if tt == "comment":
                self._comment(token)
                continue
            if tt == "char":
                raise _Bail           # ws lands in <html>: rare shape
            if tt == "start" and token[1] == "body":
                body = self._push(token)
                break
            if tt == "start" and token[1] in _HEAD_VOID | set(_RAWTEXT_MODES):
                raise _Bail           # re-enter head: rare
            # implied <body>
            body = self._push(None, "body")
            pending = token
            break
        doc.body_node = body

        # ---- in body ----
        while True:
            token = pending if pending is not None else next_token()
            pending = None
            tt = token[0]
            if tt == "char":
                if self.open_fmt:     # in-body char tokens reconstruct
                    self._reconstruct()
                self._text(token[1])
                continue
            if tt == "comment":
                self._comment(token)
                continue
            if tt == "start":
                self._body_start(token)
                continue
            if tt == "end":
                tag = token[1]
                if tag == "body" or tag == "html":
                    # spec </body> leaves the tree untouched (unclosed
                    # elements stay open); _after_body bails on ANY char
                    # token, so open/pending formatting can never
                    # reconstruct after this point
                    self._after_body(next_token, saw_html_end=(tag == "html"))
                    return doc
                self._body_end(tag)
                continue
            if tt == "eof":
                return doc
            raise _Bail

    # -- body handlers ----------------------------------------------------

    def _body_start(self, token) -> None:
        tag = token[1]
        if tag == "table":
            self._table(token)
            return
        if tag not in _OK_BODY_START:
            raise _Bail
        if tag in _BLOCK_START:
            self._close_p()
            self._push(token)
            return
        if tag in HEADING_TAGS:
            self._close_p()
            if self.tags[-1] in HEADING_TAGS:
                self._pop()
            self._push(token)
            return
        if tag == "li" or tag in _DD_DT:
            group = ("li",) if tag == "li" else ("dd", "dt")
            for t in reversed(self.tags):
                if t in group:
                    self._pop_until(t)
                    break
                if t in _LI_STOP:
                    break
            self._close_p()
            self._push(token)
            return
        if tag in FORMATTING_TAGS:
            tail = self._afe_tail()
            if tag == "a" and any(e[0] == "a" for e in tail):
                # spec: run the adoption agency for "a" BEFORE inserting.
                # AAA fast case: the old <a> is in the AFE but no longer
                # on the stack -> just remove its entry; anything else
                # (old <a> still open) is real adoption agency
                for e in reversed(tail):
                    if e[0] == "a":
                        if e[2]:
                            raise _Bail   # adoption agency
                        self.open_fmt.remove(e)
                        break
            elif tag == "nobr" and any(e[0] == "nobr" for e in tail):
                # spec reconstructs FIRST (re-opening a pending nobr),
                # then runs AAA when nobr is in scope — either way the
                # full machine must handle it
                raise _Bail           # adoption agency
            if sum(1 for e in tail if e[0] == tag) >= 3:
                raise _Bail           # Noah's ark
            self._reconstruct()
            self._push(token)
            self.open_fmt.append([tag, token[2], True])
            return
        if tag == "hr":
            self._close_p()
            nid = self._el(token)
            self._append(nid)
            return
        if tag in _BODY_VOID:
            # br/img/wbr/area/embed/keygen reconstruct (WHATWG in body)
            if self.open_fmt:
                self._reconstruct()
            nid = self._el(token)
            self._append(nid)
            return
        if tag in _HEAD_VOID:
            nid = self._el(token)   # in-head rules: no reconstruction
            self._append(nid)
            return
        if tag in _RAWTEXT_MODES:
            self._rawtext(token)    # in-head rules: no reconstruction
            return
        # phrasing ("any other start tag": reconstruct, insert)
        if self.open_fmt:
            self._reconstruct()
        self._push(token)

    # -- tables (the well-formed subset; anything else bails) -----------
    #
    # Handled: implied <tbody> before <tr>, implied <tbody><tr> before a
    # cell, unclosed cells/rows/sections, whitespace text between table
    # parts, comments, nested tables inside cells, quirks-mode <p> kept
    # open around the table.  Bails on: non-whitespace table text
    # (foster parenting), caption/col/colgroup/form/script/style inside
    # table context, mismatched cell end tags, EOF inside the table.
    # Cell content runs the normal body handlers — their p/heading/
    # block/li walks stop at the td/th/table scope boundaries above, and
    # closing a cell plain-pops its leftovers (the spec clears the
    # active-formatting list to the cell's marker, which a plain stack
    # pop reproduces).

    def _table(self, token) -> None:
        if not self.doc.quirks:
            self._close_p()           # spec skips the close in quirks mode
        self._push(token)             # table
        next_token = self.tok.next_token
        pending: tuple | None = None
        while True:
            token = pending if pending is not None else next_token()
            pending = None
            tt = token[0]
            cur = self.tags[-1]
            if tt == "char":
                if token[1].lstrip(_WS):
                    raise _Bail       # foster parenting: slow lane
                self._text(token[1])
                continue
            if tt == "comment":
                self._comment(token)
                continue
            if tt == "start":
                tag = token[1]
                if tag in _TABLE_SECTIONS:
                    if cur != "table":
                        while self.tags[-1] != "table":
                            self._pop()   # implied close of tr/section
                    self._push(token)
                    continue
                if tag == "tr":
                    if cur == "table":
                        self._push(None, "tbody")
                    elif cur == "tr":
                        self._pop()
                    elif cur not in _TABLE_SECTIONS:
                        raise _Bail
                    self._push(token)
                    continue
                if tag in ("td", "th"):
                    if cur == "table":
                        self._push(None, "tbody")
                        self._push(None, "tr")
                    elif cur in _TABLE_SECTIONS:
                        self._push(None, "tr")
                    elif cur != "tr":
                        raise _Bail
                    self._push(token)
                    pending = self._cell(next_token)
                    continue
                raise _Bail           # caption/col/colgroup/style/...
            if tt == "end":
                tag = token[1]
                if tag == "table":
                    while self.tags[-1] != "table":
                        self._pop()   # implied close of tr/section
                    self._pop()       # table
                    return
                if tag in _TABLE_SECTIONS:
                    if cur == "tr":
                        self._pop()
                        cur = self.tags[-1]
                    if cur == tag:
                        self._pop()
                        continue
                    raise _Bail       # stray section end
                if tag == "tr":
                    if cur == "tr":
                        self._pop()
                        continue
                    if cur == "table" or cur in _TABLE_SECTIONS:
                        continue      # no tr in scope: ignore
                    raise _Bail
                raise _Bail           # any other end tag in table context
            raise _Bail               # eof inside the table

    def _cell(self, next_token):
        """Consume the content of the just-pushed td/th; returns a token
        to reprocess at table level, or None."""
        cell_idx = len(self.stack) - 1
        cell_tag = self.tags[-1]
        # the cell pushes an AFE marker (spec "in row" td/th handling):
        # formatting opened outside the table must not reconstruct inside
        self.open_fmt.append(_MARKER)
        while True:
            token = next_token()
            tt = token[0]
            if tt == "char":
                if self.open_fmt:     # in-body rules inside the cell
                    self._reconstruct()
                self._text(token[1])
                continue
            if tt == "comment":
                self._comment(token)
                continue
            if tt == "start":
                tag = token[1]
                if tag in _CELL_CLOSERS:
                    self._close_cell(cell_idx)
                    return token      # reprocess at table level
                self._body_start(token)   # includes nested <table>
                continue
            if tt == "end":
                tag = token[1]
                if tag in ("td", "th"):
                    if tag != cell_tag:
                        raise _Bail   # mismatched cell end: slow lane
                    self._close_cell(cell_idx)
                    return None
                if tag == "table" or tag == "tr" or tag in _TABLE_SECTIONS:
                    self._close_cell(cell_idx)
                    return token
                if tag in ("body", "html"):
                    raise _Bail
                self._body_end(tag)
                continue
            raise _Bail               # eof inside a cell

    def _close_cell(self, cell_idx: int) -> None:
        # spec "close the cell": implied end tags, pop until the cell,
        # clear the AFE to the cell's marker.  Stack pops remove on-stack
        # formatting entries; the truncation below drops any still-pending
        # entries opened inside the cell, plus the marker itself.
        while len(self.stack) - 1 > cell_idx:
            self._pop()
        self._pop()
        for i in range(len(self.open_fmt) - 1, -1, -1):
            if self.open_fmt[i] is _MARKER:
                del self.open_fmt[i:]
                break

    def _body_end(self, tag: str) -> None:
        tags = self.tags
        if tag == "br":
            # spec: </br> acts as a <br> START tag (position-less
            # synthetic token), which reconstructs active formatting
            # first — mirror the _BODY_VOID start-tag path
            if self.open_fmt:
                self._reconstruct()
            nid = self.doc.new_element("br", NS_HTML, None)
            self._append(nid)
            return
        if tag == "p":
            for t in tags[::-1]:
                if t == "p":
                    self._pop_until("p")
                    return
                if t in _SCOPE_STOP:
                    break             # p not in button scope
            raise _Bail               # spec synthesizes an empty <p>
        if tag == "li" or tag in _DD_DT:
            for t in reversed(tags):
                if t == tag:
                    self._pop_until(tag)
                    return
                if (tag == "li" and t in ("ul", "ol")) or t in _SCOPE_STOP:
                    return            # not in (list-item) scope: ignore
            return
        if tag in HEADING_TAGS:
            for t in reversed(tags):
                if t in HEADING_TAGS:
                    while self.tags[-1] not in HEADING_TAGS:
                        self._pop_implicit()
                    self._pop()
                    return
                if t in _SCOPE_STOP:
                    return            # no heading in scope: ignore
            return
        if tag in FORMATTING_TAGS:
            # adoption agency outer-loop fast cases (treebuilder.py
            # _adoption_agency steps 3-5).  The spec acts on the LAST
            # AFE-tail entry with this tag name — iterate newest-first
            # (_afe_tail is already newest-first); the fast pop is only
            # valid when that entry is the on-stack current node.
            for e in self._afe_tail():
                if e[0] != tag:
                    continue
                if not e[2]:
                    # in the AFE but not on the stack: parse error,
                    # remove the entry, no tree change
                    self.open_fmt.remove(e)
                    return
                if tags[-1] == tag:
                    # the entry IS the current node: plain close
                    # (_pop removes the newest on-stack entry == e)
                    self._pop()
                    return
                raise _Bail       # on stack, not top: real AAA
            # not in the AFE tail at all: "any other end tag" rules —
            # fall through to the generic walk below
        # blocks and any-other end tags share the walk-down rule
        for t in reversed(tags):
            if t == tag:
                # generate implied end tags, then pop until target
                while self.tags[-1] in _IMPLIED and self.tags[-1] != tag:
                    self._pop_implicit()
                self._pop_until(tag)
                return
            if t in ("table", "td", "th"):
                return                # scope boundary (also special)
            if tag not in _BLOCK_START and t in _SPECIAL:
                return                # ignore token
        return                        # not found: ignore

    def _after_body(self, next_token, saw_html_end: bool) -> None:
        doc = self.doc
        phase_after_after = saw_html_end
        while True:
            token = next_token()
            tt = token[0]
            if tt == "eof":
                return
            if tt == "comment":
                self._comment(
                    token,
                    parent=doc.root if phase_after_after else doc.html_node)
                continue
            if tt == "char" and not token[1].lstrip(_WS):
                raise _Bail           # ws after body re-enters body mode
            if tt == "end" and token[1] == "html" and not phase_after_after:
                phase_after_after = True
                continue
            raise _Bail


def try_parse(src: str) -> Document | None:
    """Fast-lane parse; None if the document needs the full machine."""
    try:
        return _Fast(src).run()
    except _Bail:
        return None
    except IndexError:
        return None


def parse(src: str) -> Document:
    doc = try_parse(src)
    if doc is not None:
        return doc
    return TreeBuilder().parse(src)
