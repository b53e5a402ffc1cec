"""Collection algebra re-expressing /root/reference/t/0-api.t:1583-1663."""

import pytest

from perl_html5_dom_spark import HTML5DOM

SRC = """
\t<ul>
\t   <li>UNIX</li>
\t   <li>Linux</li>
\t   <!-- comment -->
\t   <li>OSX</li>
\t   <li>Windows</li>
\t   <li>FreeBSD</li>
   </ul>
"""


@pytest.fixture()
def coll():
    return HTML5DOM().parse(SRC).find("li")


def test_basics(coll):
    assert coll.length() == 5
    assert len(coll.array()) == 5
    assert coll.item(1) == coll[1]
    assert coll.html() == ("<li>UNIX</li><li>Linux</li><li>OSX</li>"
                           "<li>Windows</li><li>FreeBSD</li>")
    assert coll.text() == "UNIXLinuxOSXWindowsFreeBSD"
    assert coll.reverse().text() == "FreeBSDWindowsOSXLinuxUNIX"
    assert len(coll.shuffle(seed=42).text()) == 26


def test_grep(coll):
    assert "".join(coll.grep(r"(?i)X").map("text")) == "UNIXLinuxOSX"
    assert "".join(
        coll.grep(lambda n, i: "X" in n.text().upper()).map("text")
    ) == "UNIXLinuxOSX"


def test_head(coll):
    assert coll.head(2).text() == "UNIXLinux"
    assert coll.head(-2).text() == "UNIXLinuxOSX"
    assert coll.head(343344334).text() == "UNIXLinuxOSXWindowsFreeBSD"
    assert coll.head(-343344334).text() == ""


def test_tail(coll):
    assert coll.tail(2).text() == "WindowsFreeBSD"
    assert coll.tail(-2).text() == "OSXWindowsFreeBSD"
    assert coll.tail(343344334).text() == ""
    assert coll.tail(-343344334).text() == ""


def test_slice(coll):
    assert coll.slice(1).text() == "LinuxOSXWindowsFreeBSD"
    assert coll.slice(1, 2).text() == "LinuxOSX"
    assert coll.slice(-2).text() == "WindowsFreeBSD"
    assert coll.slice(-2, 1).text() == "Windows"
    assert coll.slice(-3, -1).text() == "OSXWindows"
    assert coll.slice(-33232, -134343443).text() == ""
    assert coll.slice(555534, 34433443).text() == ""
    assert coll.slice(-33232, 134343443).text() == ""
    assert coll.slice(555534, -34433443).text() == ""


def test_uniq(coll):
    uniq_map = {"UNIX": 1, "OSX": 1, "FreeBSD": 1, "Windows": 2}
    assert coll.uniq().text() == "UNIXLinuxOSXWindowsFreeBSD"
    assert coll.uniq(lambda n: uniq_map.get(n.text())).text() == "UNIXLinuxWindows"


def test_first_last(coll):
    assert coll.first() == coll[0]
    assert coll.last() == coll[-1]
    assert coll.first(r"(?i)W").text() == "Windows"
    assert coll.first(lambda n, i: "W" in n.text()).text() == "Windows"


def test_each_map(coll):
    seen = []
    coll.each(lambda n, i, extra: seen.append((i, extra)), 42)
    assert seen == [(i, 42) for i in range(5)]
    result = coll.map(lambda n, i, extra: n.text(), 42)
    assert "".join(result) == "UNIXLinuxOSXWindowsFreeBSD"
    assert "".join(coll.map("text")) == "UNIXLinuxOSXWindowsFreeBSD"
    coll.map("text", "1")  # bulk setter call
    assert "".join(coll.map("text")) == "11111"


def test_add(coll):
    tree = HTML5DOM().parse("<b>extra</b>")
    n0 = coll.length()
    coll.add(tree.at("b"))
    assert coll.length() == n0 + 1


def test_tokenlist():
    """classList (t/0-api.t:1227-1255, TokenList.pm)."""
    tree = HTML5DOM().parse('<div class="red blue green"></div>')
    cl = tree.at("div").classList()
    assert cl.length() == 3
    assert cl.has("blue") and cl.contains("red")
    assert not cl.has("yellow")
    cl.add("yellow")
    assert cl.has("yellow") and cl.length() == 4
    cl.add("yellow")
    assert cl.length() == 4
    cl.remove("red")
    assert not cl.has("red") and cl.length() == 3
    assert cl.toggle("red") is True and cl.has("red")
    assert cl.toggle("red") is False and not cl.has("red")
    cl.replace("blue", "cyan")
    assert cl.has("cyan") and not cl.has("blue")
    assert cl.item(0) == "cyan"
