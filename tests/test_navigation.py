"""Navigation chains re-expressing /root/reference/t/0-api.t:399-552."""

import re

from perl_html5_dom_spark import HTML5DOM
from perl_html5_dom_spark.dom.node import Comment, Element, Text

SRC = """
   <ul>
       <li>Linux</li>
       <!-- comment -->
       <li>OSX</li>
       <li>Windows</li>
   </ul>
"""


def _tree():
    return HTML5DOM().parse(SRC)


def test_element_sibling_walk():
    ul = _tree().at("ul")
    kids = ul.children()
    node = kids.item(1)  # OSX
    assert node.text() == "OSX"
    # forward: next / nextElementSibling
    for method in ("next", "nextElementSibling"):
        n = kids.item(0)
        texts = []
        while n is not None:
            texts.append(n.text())
            n = getattr(n, method)()
        assert texts == ["Linux", "OSX", "Windows"]
    # backward
    for method in ("prev", "previousElementSibling"):
        n = kids.item(-1)
        texts = []
        while n is not None:
            texts.append(n.text())
            n = getattr(n, method)()
        assert texts == ["Windows", "OSX", "Linux"]


def test_raw_sibling_walk():
    ul = _tree().at("ul")
    n = ul.firstNode()
    kinds = []
    while n is not None:
        kinds.append(type(n).__name__)
        n = n.nextNode()
    # text, li, text, comment, text, li, text, li, text
    assert kinds == ["Text", "Element", "Text", "Comment", "Text",
                     "Element", "Text", "Element", "Text"]
    comment = ul.childNodes().item(3)
    assert isinstance(comment, Comment)
    assert comment.text() == " comment "


def test_first_last():
    ul = _tree().at("ul")
    assert ul.first().text() == "Linux"
    assert ul.last().text() == "Windows"
    assert isinstance(ul.firstNode(), Text)
    assert isinstance(ul.lastNode(), Text)
    assert re.fullmatch(r"\s+", ul.firstNode().text())


def test_parents():
    t = _tree()
    li = t.at("li")
    assert li.parent().tag() == "ul"
    assert li.parentElement().tag() == "ul"
    body = t.body()
    assert body.parent().tag() == "html"
    assert t.root().parent().nodeType == 9  # document
    assert li.isConnected()
    assert not t.createElement("div").isConnected()


def test_children_collections():
    ul = _tree().at("ul")
    assert ul.children().length() == 3
    assert ul.childNodes().length() == 9
    assert [n.text() for n in ul.children()] == ["Linux", "OSX", "Windows"]


def test_identity():
    t = _tree()
    assert t.body().isSameNode(t.body())
    assert not t.body().isSameNode(t.head())
    assert t.body() == t.body()
    assert t.body() != t.head()


def test_owner():
    t = _tree()
    li = t.at("li")
    assert li.document().nodeType == 9
