"""Encoding detector family re-expressing /root/reference/t/0-api.t:1729-1777
and the parse round-trips of t/2-encodings.t."""

from perl_html5_dom_spark import HTML5DOM
from perl_html5_dom_spark.dom import encoding as enc

UTF16_SAMPLE = bytes.fromhex(
    "21044a0435044804 4c04200035044904 510420004d044204 380445042000"
    "3c044f0433043a04 380445042000".replace(" ", "")
)
CP1251_SAMPLE = (
    b"\xe5\xed\xe8\x20\xee\xe3\xee\x20\xf1\xf2\xe2\x20\xed\xe8\xff\x20"
    b"\xee\xe2\xe0\x20\xf2\xe5\xeb\x20\xf0\xe5\xe4\x20\xee\xf1\xf2"
) * 100


def test_name2id_roundtrip():
    i = enc.name2id("UTF-8")
    assert i is not None
    assert enc.id2name(i) == "UTF-8"
    assert enc.name2id("wefewf") is None
    assert enc.id2name(332322242424) is None


def test_detect_bom_and_cut():
    name, cut = enc.detect_bom_and_cut(b"\xef\xbb\xbftest214")
    assert name == "UTF-8"
    assert cut == b"test214"
    name, cut = enc.detect_bom_and_cut(b"\xff\xfea\x00")
    assert name == "UTF-16LE"


def test_detect_by_charset():
    assert enc.detect_by_charset("text/html; charset=windows-1251") == \
        "WINDOWS-1251"
    assert enc.detect_by_charset("text/html") is None


def test_detect_by_prescan_stream():
    assert enc.detect_by_prescan_stream(
        b'<meta http-equiv="content-type" '
        b'content="text/html; charset=windows-1251">') == "WINDOWS-1251"
    assert enc.detect_by_prescan_stream(b"<meta charset=koi8-r>") == "KOI8-R"
    assert enc.detect_by_prescan_stream(b"<p>no meta</p>") is None
    # prescan cap (reference default 1024, DOM.xs:434)
    far = b" " * 2000 + b"<meta charset=koi8-r>"
    assert enc.detect_by_prescan_stream(far) is None


def test_detect_unicode():
    assert enc.detect_unicode(UTF16_SAMPLE) == "UTF-16LE"
    assert enc.detect(UTF16_SAMPLE) == "UTF-16LE"


def test_detect_cyrillic():
    assert enc.detect_cyrillic(CP1251_SAMPLE) == "WINDOWS-1251"
    assert enc.detect_russian(CP1251_SAMPLE) == "WINDOWS-1251"
    assert enc.detect_ukrainian(CP1251_SAMPLE) == "WINDOWS-1251"
    assert enc.detect(CP1251_SAMPLE) == "WINDOWS-1251"


def test_parse_roundtrips():
    """t/2-encodings.t:11-35 — same text through different encodings."""
    text = "Привет мир"
    for name, codec in [("WINDOWS-1251", "cp1251"), ("KOI8-R", "koi8-r"),
                        ("KOI8-U", "koi8-u"), ("UTF-8", "utf-8")]:
        raw = ("<html><head><meta charset=%s></head><body>%s</body></html>"
               % (name, text)).encode(codec)
        tree = HTML5DOM().parse(raw)
        assert tree.encoding() == name
        assert tree.body().text() == text
    # explicit encoding option wins over content
    raw = ("<body>%s</body>" % text).encode("cp1251")
    tree = HTML5DOM(encoding="windows-1251").parse(raw)
    assert tree.body().text() == text
    # BOM
    raw = b"\xff\xfe" + ("<body>%s</body>" % text).encode("utf-16-le")
    tree = HTML5DOM().parse(raw)
    assert tree.encoding() == "UTF-16LE"
    assert tree.body().text() == text
    # heuristic (no meta, no BOM)
    raw = ("<body>%s</body>" % (text * 50)).encode("cp1251")
    tree = HTML5DOM().parse(raw)
    assert tree.encoding() == "WINDOWS-1251"
    assert text in tree.body().text()
