"""Boilerplate classifier unit tests (SURVEY.md §7.4 heuristics)."""

from goose_parser_ray.boilerplate import extract_main_text, is_boilerplate
from goose_parser_ray.html import parse_html


def first(doc, tag, cls=None):
    for e in doc.iter_elements():
        if e.tag == tag and (cls is None or cls in e.classes):
            return e
    raise AssertionError(f"no <{tag}> found")


def test_tag_based_drop():
    doc = parse_html("<body><nav><a href='/'>x</a></nav><p>keep</p></body>")
    assert is_boilerplate(first(doc, "nav"))
    assert not is_boilerplate(first(doc, "p"))


def test_hint_class_drop():
    doc = parse_html("<div class='sidebar'>links</div><div class='content'>text</div>")
    assert is_boilerplate(first(doc, "div", "sidebar"))
    assert not is_boilerplate(first(doc, "div", "content"))


def test_link_density_drop():
    dense = parse_html(
        "<div class='x'><a href='/1'>one</a> <a href='/2'>two</a> <a href='/3'>three</a></div>"
    )
    assert is_boilerplate(first(dense, "div"))
    sparse = parse_html(
        "<div class='x'>A long paragraph of prose with just one "
        "<a href='/r'>link</a> inside a lot of surrounding text content.</div>"
    )
    assert not is_boilerplate(first(sparse, "div"))


def test_long_link_rich_content_survives():
    # link-density gate only applies under LINK_DENSITY_MIN_TEXT chars
    words = "word " * 60
    doc = parse_html(f"<div class='x'>{words}<a href='/a'>a</a><a href='/b'>b</a></div>")
    assert not is_boilerplate(first(doc, "div"))


def test_page_header_dropped_article_header_kept():
    doc = parse_html(
        "<body><header>site chrome</header>"
        "<article><header><h1>Title</h1></header><p>body</p></article></body>"
    )
    blocks = extract_main_text(doc)
    assert "site chrome" not in " ".join(blocks)
    assert "Title" in blocks


def test_block_emission_order_and_normalization():
    doc = parse_html(
        "<article><h1> A  Title </h1><p>one\n two</p><ul><li>i1</li><li>i2</li></ul></article>"
    )
    assert extract_main_text(doc) == ["A Title", "one two", "i1", "i2"]


def test_div_with_only_text_is_a_block():
    doc = parse_html("<div class='c'>standalone text</div>")
    assert extract_main_text(doc) == ["standalone text"]


def test_empty_document():
    assert extract_main_text(parse_html("")) == []
    assert extract_main_text(parse_html("<nav><a href='/'>x</a></nav>")) == []
