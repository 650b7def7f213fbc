"""Selector-engine unit tests (SURVEY.md §7.2 Sizzle subset)."""

import pytest

from goose_parser_ray.css import SelectorError, compile_selector, select
from goose_parser_ray.html import parse_html

DOC = parse_html(
    """
<div class="main" id="m">
  <p class="a x">one</p><p class="b">two</p><p class="a">three</p>
  <ul><li>a</li><li class="hot">b</li><li>c</li></ul>
  <table><tr><td>1</td><td>2</td></tr><tr><td>3</td></tr></table>
  <a href="/x" data-k="v1">link1</a><a href="http://e.com/y">link2</a>
  <span></span>
</div>
<div class="other"><p>four</p><span>s1</span><em>e1</em><span>s2</span></div>
"""
)


def q(sel, scope=None):
    return [e.text() for e in select(sel, scope or DOC)]


@pytest.mark.parametrize(
    "sel,expected",
    [
        ("p", ["one", "two", "three", "four"]),
        (".main p", ["one", "two", "three"]),
        ("div.main > p.a", ["one", "three"]),
        ("#m .hot", ["b"]),
        ("*", None),  # just must not raise
        ("p:first", ["one"]),
        ("p:eq(1)", ["two"]),
        ("p:eq(-1)", ["four"]),
        ("p:last", ["four"]),
        ("p:lt(2)", ["one", "two"]),
        ("p:gt(1)", ["three", "four"]),
        ("p:even", ["one", "three"]),
        ("p:odd", ["two", "four"]),
        ("div:eq(0) p:lt(2)", ["one", "two"]),
        ("li:contains(b)", ["b"]),
        ("p:contains('three')", ["three"]),
        ("[href^='http']", ["link2"]),
        ("[data-k=v1]", ["link1"]),
        ("a[href$='.com/y']", ["link2"]),
        ("a[href*='e.com']", ["link2"]),
        ("li:nth-child(2)", ["b"]),
        ("li:nth-child(2n+1)", ["a", "c"]),
        ("li:nth-child(odd)", ["a", "c"]),
        ("li:nth-last-child(1)", ["c"]),
        (".other span:first-of-type", ["s1"]),
        (".other span:last-of-type", ["s2"]),
        ("em:only-of-type", ["e1"]),
        ("span:nth-of-type(2)", ["s2"]),
        (".other span:nth-last-of-type(1)", ["s2"]),
        ("p.a + p", ["two"]),
        ("p.a ~ p", ["two", "three"]),
        ("p:not(.a)", ["two", "four"]),
        ("ul:has(.hot) li:first-child", ["a"]),
        ("span:empty", [""]),
        ("table td", ["1", "2", "3"]),
        ("tr:eq(1) td", ["3"]),
        ("p.a, li.hot", ["one", "three", "b"]),
    ],
)
def test_selectors(sel, expected):
    got = q(sel)
    if expected is not None:
        assert got == expected


def test_scoped_matching_excludes_scope_element():
    main = select(".main", DOC)[0]
    assert q("p", main) == ["one", "two", "three"]
    # the scope element itself never matches (descendant semantics)
    assert select("div.main", main) == []


def test_positional_applies_at_chain_point():
    # li:eq(0) under each context = first li overall (set-based, doc order)
    assert q("ul li:eq(0)") == ["a"]


def test_comma_group_dedup_doc_order():
    got = q("p.a, .main p")
    assert got == ["one", "two", "three"]


@pytest.mark.parametrize(
    "bad", ["p::before", "p:hover", "", "p[", ":nth-child(x)", "p:unknown(3)"]
)
def test_unsupported_rejected_loudly(bad):
    with pytest.raises(SelectorError):
        compile_selector(bad)


def test_compiled_selector_picklable():
    import pickle

    c = compile_selector("div.main > p:not(.a):contains('x')")
    c2 = pickle.loads(pickle.dumps(c))
    assert c2.source == c.source
