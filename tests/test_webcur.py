"""Unit tests for the crawl-side curation round: HTML5 encoding sniffing
(charsniff), the strict mini-XML parser (xmlmini), and the synthesized-page
boilerplate oracle query's scalar path. The distributed value checks run
through the oracle gate (q:boilerplate_main / charset_prescan / sitemap_urls
/ crawl_frontier); these pin the per-document kernels and the fail-loud
contracts."""

from __future__ import annotations

import pytest

from goose_parser_ray.functions.charsniff import resolve_label, sniff_encoding
from goose_parser_ray.functions.xmlmini import (
    XmlError,
    parse_sitemap,
    parse_xml,
)


# ---------------------------------------------------------------------------
# charsniff
# ---------------------------------------------------------------------------


def test_bom_wins_over_meta():
    payload = b'\xef\xbb\xbf<meta charset="koi8-r">'
    assert sniff_encoding(payload) == ("utf-8", "bom")
    assert sniff_encoding(b"\xff\xfexx") == ("utf-16le", "bom")
    assert sniff_encoding(b"\xfe\xffxx") == ("utf-16be", "bom")


def test_meta_charset_attribute_quoted_and_unquoted():
    assert sniff_encoding(b'<meta charset="KOI8-R">') == ("koi8-r", "meta")
    assert sniff_encoding(b"<meta charset=shift_jis>") == ("shift_jis", "meta")
    # whitespace inside the quoted label is trimmed per the label algorithm
    assert sniff_encoding(b'<meta charset=" utf-8 ">') == ("utf-8", "meta")


def test_meta_pragma_content_type():
    p = b'<meta http-equiv="Content-Type" content="text/html; charset=windows-1251">'
    assert sniff_encoding(p) == ("windows-1251", "meta")
    # content without the pragma is NOT honored
    p2 = b'<meta content="text/html; charset=windows-1251">'
    assert sniff_encoding(p2) == ("windows-1252", "default")
    # attribute order doesn't matter (pragma seen after content)
    p3 = b'<meta content="text/html; charset=gbk" http-equiv="content-type">'
    assert sniff_encoding(p3) == ("gbk", "meta")


def test_comment_decoy_skipped():
    p = b'<!-- <meta charset="utf-7"> --><meta charset="iso-8859-1">'
    # and iso-8859-1 resolves to windows-1252 per the WHATWG label table
    assert sniff_encoding(p) == ("windows-1252", "meta")


def test_charset_inside_unrelated_attribute_ignored():
    p = b'<a href="/x?charset=utf-8">link</a><p>charset=euc-jp</p>'
    assert sniff_encoding(p) == ("windows-1252", "default")


def test_declared_utf16_rewritten_and_x_user_defined():
    p = b'<meta charset="utf-16le">'
    assert sniff_encoding(p) == ("utf-8", "meta")
    assert sniff_encoding(b"<meta charset=x-user-defined>") == (
        "windows-1252",
        "meta",
    )


def test_window_limit_enforced():
    pad = b"<p>" + b"x" * 1100 + b"</p>"
    p = pad + b'<meta charset="utf-8">'
    assert sniff_encoding(p) == ("windows-1252", "default")
    # the same meta inside the window is honored
    assert sniff_encoding(p[-40:]) == ("utf-8", "meta")


def test_first_valid_meta_wins():
    p = b'<meta charset="bogus-enc"><meta charset="euc-kr">'
    # an unknown label is skipped; the next meta is consulted
    assert sniff_encoding(p) == ("euc-kr", "meta")


def test_resolve_label_table():
    assert resolve_label("  UTF-8\t") == "utf-8"
    assert resolve_label("latin1") == "windows-1252"
    assert resolve_label("no-such-encoding") is None


def test_sniff_never_raises_on_garbage():
    import zlib

    for seed in range(40):
        junk = zlib.compress(bytes([(seed * 37 + i) % 256 for i in range(400)]))
        enc, src = sniff_encoding(junk)
        assert isinstance(enc, str) and src in ("bom", "meta", "default")


# ---------------------------------------------------------------------------
# xmlmini
# ---------------------------------------------------------------------------


def test_parse_xml_basic_tree_and_entities():
    root = parse_xml(
        '<?xml version="1.0"?><r a="1&amp;2"><x>he&#108;&#x6C;o</x><y/></r>'
    )
    assert root.tag == "r"
    assert root.attrs["a"] == "1&2"
    assert root.first("x").text == "hello"
    assert root.first("y").children == []


def test_parse_xml_strict_rejections():
    for bad in (
        "<a><b></a></b>",  # mismatched nesting
        "<a>",  # unclosed
        "<a></a><b></b>",  # two roots
        "<a x=unquoted></a>",  # unquoted attribute
        "<a>&nope;</a>",  # unknown entity
        "text<a></a>",  # data before root
        "<a></a>trailing",  # data after root
        "<a><![CDATA[x]]></a>",  # unsupported construct
        "",  # empty
    ):
        with pytest.raises(XmlError):
            parse_xml(bad)


def test_parse_sitemap_order_and_lastmod_default():
    doc = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        "<urlset><!-- generated -->"
        "<url><loc>https://e.com/a</loc><lastmod>2026-01-02</lastmod></url>"
        "<url><loc> https://e.com/b </loc></url>"
        "</urlset>"
    )
    assert parse_sitemap(doc) == [
        {"loc": "https://e.com/a", "lastmod": "2026-01-02"},
        {"loc": "https://e.com/b", "lastmod": ""},
    ]
    with pytest.raises(XmlError):
        parse_sitemap("<notsitemap></notsitemap>")


def test_xmlmini_mutation_fuzz_raise_or_correct():
    """pngmini-style adversarial pass: single-byte mutations of a valid
    sitemap must either raise XmlError / produce a parse (never hang or
    crash with another exception type)."""
    from goose_parser_ray.queries.webcur import _sitemap_xml

    base = _sitemap_xml(123)
    for pos in range(0, len(base), 7):
        for repl in ("<", ">", "&", '"', "\x00"):
            mutated = base[:pos] + repl + base[pos + 1 :]
            try:
                parse_sitemap(mutated)
            except (XmlError, ValueError):
                pass


def test_charset_payload_shapes_cover_all_sources():
    from goose_parser_ray.queries.webcur import _charset_payload

    seen = set()
    for i in range(8):
        seen.add(sniff_encoding(_charset_payload(i)))
    assert ("utf-8", "bom") in seen
    assert ("utf-16le", "bom") in seen
    assert ("windows-1250", "meta") in seen
    assert ("windows-1252", "default") in seen
    # 8 variants yield 7 distinct (encoding, source) pairs: v3 and v6 both
    # land on (windows-1252, meta) — the iso-8859-1 alias and the
    # x-user-defined rewrite converge by design.
    assert len(seen) == 7


def test_boilerplate_page_scalar_path():
    """The synthesized page classifies exactly as the oracle states: three
    content blocks (title, body, second), furniture dropped."""
    from goose_parser_ray.boilerplate import extract_main_text
    from goose_parser_ray.html.treebuilder import parse_html

    text = "some   body text <with & brackets> that is plenty long"
    esc = text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    page = (
        "<html><body>"
        '<nav class="menu"><a href="/">Home</a><a href="/a">About</a></nav>'
        '<div class="ads"><a href="/buy">Buy now!!!</a></div>'
        f"<article><h1>Title 7</h1><p>{esc}</p></article>"
        '<div class="content"><p>Second block 7</p></div>'
        "<footer>&#169; site</footer>"
        "</body></html>"
    )
    blocks = extract_main_text(parse_html(page))
    assert blocks == [
        "Title 7",
        "some body text <with & brackets> that is plenty long",
        "Second block 7",
    ]


def test_parse_rss_structure_and_defaults():
    from goose_parser_ray.functions.xmlmini import parse_rss

    doc = (
        '<rss version="2.0"><channel><title>c</title>'
        "<item><title>A &amp; B</title><link>http://x/1</link>"
        "<pubDate>2026-07-03</pubDate></item>"
        "<item><title>t2</title></item>"
        "</channel></rss>"
    )
    assert parse_rss(doc) == [
        {"title": "A & B", "link": "http://x/1", "pubdate": "2026-07-03"},
        {"title": "t2", "link": "", "pubdate": ""},
    ]
    with pytest.raises(XmlError):
        parse_rss("<feed></feed>")  # Atom root rejected (strict RSS 2.0)
    with pytest.raises(XmlError):
        parse_rss("<rss></rss>")  # channel required


def test_decide_encoding_precedence():
    from goose_parser_ray.functions.charsniff import (
        charset_from_content_type,
        decide_encoding,
    )

    # BOM > header > meta > default
    assert decide_encoding("text/html; charset=koi8-r", b"\xef\xbb\xbfx") == (
        "utf-8",
        "bom",
    )
    assert decide_encoding(
        "text/html; charset=ISO-8859-2", b'<meta charset="utf-8">'
    ) == ("iso-8859-2", "header")
    assert decide_encoding("text/html", b'<meta charset="utf-8">') == (
        "utf-8",
        "meta",
    )
    assert decide_encoding(None, b"x") == ("windows-1252", "default")
    # unknown header label falls through to the prescan
    assert decide_encoding("text/html; charset=bogus", b"<meta charset=gbk>") == (
        "gbk",
        "meta",
    )
    # RFC 9110 parameter parsing: quoted values, case-insensitive names
    assert charset_from_content_type('text/html; CHARSET="EUC-KR"') == "euc-kr"
    assert charset_from_content_type("text/html; boundary=x; charset=utf8") == "utf-8"
    assert charset_from_content_type("text/html") is None


def test_parse_atom_rel_selection_and_self_closing():
    from goose_parser_ray.functions.xmlmini import parse_atom

    doc = (
        '<feed><title>f</title>'
        "<entry><title>a</title>"
        '<link rel="self" href="http://x/feed"/>'
        '<link rel="alternate" href="http://x/1"/>'
        "<updated>2026-06-02T00:00:00Z</updated></entry>"
        "<entry><title>b</title>"
        '<link href="http://x/2"/></entry>'  # no rel → alternate by default
        '<entry><title>c</title><link rel="self" href="http://x/feed"/></entry>'
        "</feed>"
    )
    items = parse_atom(doc)
    assert items[0]["href"] == "http://x/1"  # alternate beats the self decoy
    assert items[1] == {"title": "b", "href": "http://x/2", "updated": ""}
    assert items[2]["href"] == "http://x/feed"  # only link wins as fallback
    with pytest.raises(XmlError):
        parse_atom("<rss></rss>")
