"""Serialization goldens re-expressing /root/reference/t/0-api.t:554-628."""

from perl_html5_dom_spark import HTML5DOM

SRC = ('<body aaa="bb"><b>      <!-- super cool new comment --> ololo ??? '
       '<div class="red">&nbsp;&gt;&lt;&quot;</div></b></body>')

GOLDENS = {
    "html": '<body aaa="bb"><b>      <!-- super cool new comment --> ololo '
            '??? <div class="red">&nbsp;&gt;&lt;"</div></b></body>',
    "innerHTML": '<b>      <!-- super cool new comment --> ololo ??? '
                 '<div class="red">&nbsp;&gt;&lt;"</div></b>',
    "outerHTML": '<body aaa="bb"><b>      <!-- super cool new comment --> '
                 'ololo ??? <div class="red">&nbsp;&gt;&lt;"</div></b></body>',
    "nodeHtml": '<body aaa="bb">',
    "text": '       ololo ??? \xa0><"',
    "innerText": 'ololo ???\n\xa0><"\n',
    "outerText": 'ololo ???\n\xa0><"\n',
    "textContent": '       ololo ??? \xa0><"',
    "nodeValue": None,
    "data": None,
}


def test_serialization_goldens():
    tree = HTML5DOM().parse(SRC)
    body = tree.body()
    for method, expected in GOLDENS.items():
        got = getattr(body, method)()
        assert got == expected, (method, got, expected)


def test_setter_fragments():
    """t/0-api.t:581-628 — html/text setters on #test."""
    frag_html = ('<b>      <!-- super cool new comment --> ololo ??? '
                 '<div class="red">&nbsp;&gt;&lt;&quot;</div></b>')
    cases = [
        ("html", frag_html,
         '<body><div id="test"><b>      <!-- super cool new comment --> '
         'ololo ??? <div class="red">&nbsp;&gt;&lt;"</div></b></div></body>'),
        ("innerHTML", frag_html,
         '<body><div id="test"><b>      <!-- super cool new comment --> '
         'ololo ??? <div class="red">&nbsp;&gt;&lt;"</div></b></div></body>'),
        ("outerHTML", frag_html,
         '<body><b>      <!-- super cool new comment --> ololo ??? '
         '<div class="red">&nbsp;&gt;&lt;"</div></b></body>'),
        ("text", "\nololo   >^_^<   trololo\n",
         '<body><div id="test">\nololo   &gt;^_^&lt;   trololo\n</div></body>'),
        ("textContent", "\nololo   >^_^<   trololo\n",
         '<body><div id="test">\nololo   &gt;^_^&lt;   trololo\n</div></body>'),
        ("innerText", "\nololo   >^_^<   trololo\n",
         '<body><div id="test"><br>ololo   &gt;^_^&lt;   trololo<br></div></body>'),
        ("outerText", "\nololo   >^_^<   trololo\n",
         '<body><br>ololo   &gt;^_^&lt;   trololo<br></body>'),
    ]
    for method, value, expected_body in cases:
        tree = HTML5DOM().parse(
            '<div id="test"><b><!-- super cool new comment --> ololo ??? '
            '<div class="red">&nbsp;&gt;&lt;&quot;</div></b></div>')
        el = tree.at("#test")
        getattr(el, method)(value)
        assert tree.body().html() == expected_body, (method, tree.body().html())


def test_doctype_serialization():
    tree = HTML5DOM().parse("<!DOCTYPE html><p>x</p>")
    assert tree.html().startswith("<!DOCTYPE html>")
    tree2 = HTML5DOM().parse(
        '<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01//EN" '
        '"http://www.w3.org/TR/html4/strict.dtd"><p>x</p>')
    assert tree2.html().startswith(
        '<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01//EN" '
        '"http://www.w3.org/TR/html4/strict.dtd">')


def test_position():
    """t/0-api.t:709-713 — raw/element spans point into the input."""
    buf = '<div><div id="position"></div></div>'
    tree = HTML5DOM().parse(buf)
    pos = tree.at("#position").position()
    assert buf[pos["raw_begin"]: pos["raw_begin"] + pos["raw_length"]] == "div"
    assert buf[pos["element_begin"]:
               pos["element_begin"] + pos["element_length"]] == \
        '<div id="position">'


def test_void_selfclosed():
    tree = HTML5DOM().parse("<div></div>")
    frag = tree.parseFragment("<meta />")
    assert frag.first().selfClosed() is True
    frag2 = tree.parseFragment("<meta></meta>")
    assert frag2.first().selfClosed() is False
    assert frag.first().void() is True


def test_serialize_reparse_fixpoint_on_flow_content():
    """serialize -> reparse is a fixpoint for flow-content trees (no
    tables, no foreign content).  20k random-soup cases; HTML
    serialization is NOT a round-trip in exactly two spec-level lossy
    corners, pinned separately below."""
    import random

    from perl_html5_dom_spark.dom.serializer import serialize
    from perl_html5_dom_spark.dom.treebuilder import TreeBuilder
    from perl_html5_dom_spark.dom.treedump import tree_format

    random.seed(20260817)
    alpha = []
    for t in ("div", "p", "b", "i", "a", "span", "ul", "li", "template",
              "select", "option", "h1", "marquee", "dd", "dt",
              "button", "ruby", "rt", "pre", "blockquote"):
        alpha.append(f"<{t}>")
        alpha.append(f"</{t}>")
    alpha += ["x", "&amp;", "&lt;tag&gt;", '<a href="q&amp;r">', "<!--c-->",
              '<b class="a b">', "y z", "&#x80;", " "]
    for _ in range(20000):
        src = "<!DOCTYPE html><body>" + "".join(
            random.choice(alpha) for _ in range(random.randint(1, 12)))
        t1 = TreeBuilder().parse(src)
        t2 = TreeBuilder().parse(serialize(t1, t1.root))
        assert tree_format(t1) == tree_format(t2), src


def test_serialize_known_lossy_corners():
    """The two corners where HTML serialization is inherently lossy
    (browsers' innerHTML behaves identically — this is a property of
    the format, not of this serializer):

    1. foster-parented content: text/elements hoisted before a <table>
       serialize ahead of it, so the reparse never enters table mode
       at that point and sibling/nesting rules differ;
    2. nested forms: </form> removes the form from the stack but not
       the tree, so a later <form> can nest inside it — on reparse the
       form-pointer ignore rule fires instead.
    """
    from perl_html5_dom_spark.dom.serializer import serialize
    from perl_html5_dom_spark.dom.treebuilder import TreeBuilder
    from perl_html5_dom_spark.dom.treedump import tree_format

    def roundtrips(src):
        t1 = TreeBuilder().parse(src)
        t2 = TreeBuilder().parse(serialize(t1, t1.root))
        return tree_format(t1) == tree_format(t2)

    # the lossy corners — locked as NOT round-tripping, so a future
    # serializer change that silently alters them is caught
    # (</p> in foreign BREAKS OUT since the round-4 fix, so that shape
    # round-trips now — locked on the round-trip side below)
    assert roundtrips("<!DOCTYPE html><body><a><svg></p><math>")
    assert not roundtrips(
        "<!DOCTYPE html><body><li><table><li><span>x")
    assert not roundtrips(
        "<!DOCTYPE html><body><form><marquee></form><form>x")
    # the nearby safe shapes DO round-trip
    assert roundtrips("<!DOCTYPE html><body><svg><circle></svg>")
    assert roundtrips("<!DOCTYPE html><body><table><td>x</table><li>y")


def test_round4_fuzz_fixes_roundtrip():
    """Regression lock for the round-4 fuzz campaign finds: each shape
    must serialize -> reparse -> serialize to a fixpoint."""
    from perl_html5_dom_spark.dom.serializer import serialize
    from perl_html5_dom_spark.dom.treebuilder import TreeBuilder

    def fix(src):
        t1 = TreeBuilder().parse(src)
        s1 = serialize(t1, t1.root)
        t2 = TreeBuilder().parse(s1)
        return s1 == serialize(t2, t2.root)

    # 1. noscript rawtext emits literally under scripting-on
    assert fix("<head><noscript><b>&AMP</noscript>")
    # 2. pre/textarea/listing re-emit the newline parsing strips
    assert fix("<pre>\n\nx</pre>")
    assert fix("<textarea>\n\ny</textarea>")
    assert fix("<listing>\n\nz</listing>")
    # 3. </br> and </p> in foreign content break out to HTML
    assert fix("<svg><g></br>x")
    assert fix("<body><a><svg></p><math>")
    # 4. '=' attribute names: a second '=' terminates the name
    assert fix("<i = >x")
    assert fix("<i ==x>y")
    assert fix('<i ="q">y')
    # 5. '<' and '"' kept inside attribute names (13.2.5.33 parse
    # errors that preserve the char) must survive the round trip,
    # as must quote-then-name with missing whitespace
    assert fix("<p <p>y")
    assert fix('<p a"b=c>y')
    assert fix("<p a='b'c=d>y")
    assert fix("<p a=b=c>y")
    assert fix("<p/ a=b>y")


def test_attr_name_equals_forms():
    """13.2.5.32: only the FIRST char of an attribute name may be '=';
    a later '=' starts the value."""
    from perl_html5_dom_spark.dom.treebuilder import TreeBuilder

    def attrs(src):
        d = TreeBuilder().parse(src)
        for i, t in enumerate(d.tag):
            if t == "i":
                return d.attrs[i]

    assert attrs("<i = >") == {"=": ""}
    assert attrs("<i ==x>") == {"=": "x"}
    assert attrs('<i =="">') == {"=": ""}
    assert attrs("<i =id=x>") == {"=id": "x"}
