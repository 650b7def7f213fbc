"""Tree-builder unit tests (SURVEY.md §5.2-2: HTML5 edge cases)."""

from goose_parser_ray.html import parse_html


def tags(el):
    return [e.tag for e in el.iter_elements()]


def find(doc, tag):
    return [e for e in doc.iter_elements() if e.tag == tag]


def test_basic_structure():
    doc = parse_html("<html><head><title>T</title></head><body><p>x</p></body></html>")
    assert tags(doc)[:3] == ["html", "head", "title"]
    assert find(doc, "p")[0].text() == "x"


def test_implied_html_body():
    doc = parse_html("<p>bare</p>")
    assert tags(doc) == ["html", "body", "p"]


def test_implied_p_close():
    doc = parse_html("<div><p>one<p>two<div>three</div></div>")
    ps = find(doc, "p")
    assert [p.text() for p in ps] == ["one", "two"]
    # the inner div is a sibling of the ps, not nested in p #2
    inner = find(doc, "div")[1]
    assert inner.parent.tag == "div"


def test_implied_li_close():
    doc = parse_html("<ul><li>a<li>b<li>c</ul>")
    assert [li.text() for li in find(doc, "li")] == ["a", "b", "c"]
    for li in find(doc, "li"):
        assert li.parent.tag == "ul"


def test_implied_dd_dt():
    doc = parse_html("<dl><dt>t1<dd>d1<dt>t2<dd>d2</dl>")
    assert [e.text() for e in find(doc, "dt")] == ["t1", "t2"]
    assert [e.text() for e in find(doc, "dd")] == ["d1", "d2"]


def test_implied_tbody_tr_td():
    doc = parse_html("<table><tr><td>1<td>2<tr><td>3</table>")
    assert len(find(doc, "tbody")) == 1
    assert len(find(doc, "tr")) == 2
    assert [td.text() for td in find(doc, "td")] == ["1", "2", "3"]


def test_void_elements():
    doc = parse_html("<div><img src='x'><br><hr><input name='n'><span>after</span></div>")
    img = find(doc, "img")[0]
    assert img.attrs["src"] == "x"
    assert not img.children
    assert find(doc, "span")[0].text() == "after"
    assert find(doc, "span")[0].parent.tag == "div"


def test_entity_decoding():
    doc = parse_html("<p>a &amp; b &lt;x&gt; &#233;</p>")
    assert find(doc, "p")[0].text() == "a & b <x> é"


def test_unclosed_tags_recovered():
    doc = parse_html("<div><b>bold<i>both</div><p>next")
    assert find(doc, "p")[0].parent.tag == "body"


def test_stray_end_tag_ignored():
    doc = parse_html("<div>a</span>b</div>")
    assert find(doc, "div")[0].text() == "ab"


def test_misnested_formatting_recovery():
    # simplified adoption agency: </b> pops the mis-nested <i>, which is
    # reconstructed for the following text (browser behavior)
    doc = parse_html("<b>one<i>two</b>three</i>")
    assert find(doc, "b")[0].text() == "onetwo"
    i_els = find(doc, "i")
    assert [e.text() for e in i_els] == ["two", "three"]
    body = find(doc, "body")[0]
    assert "three" in body.text()


def test_adoption_agency_reconstruction_cases():
    # formatting leaks out of a closed block and re-opens (browser parity)
    doc = parse_html("<div><b>x</div>y")
    bs = find(doc, "b")
    assert [e.text() for e in bs] == ["x", "y"]
    assert bs[1].parent.tag == "body"
    # block starts do not reconstruct; the next phrasing insertion does
    doc = parse_html("<p><b>a<p>b")
    ps = find(doc, "p")
    assert ps[1].children[0].tag == "b" and ps[1].text() == "b"
    # a-in-a implicitly closes the first anchor (no nesting, no leak)
    doc = parse_html("<a href='1'>x<a href='2'>y</a>z")
    aas = find(doc, "a")
    assert [e.attrs.get("href") for e in aas] == ["1", "2"]
    assert aas[0].parent.tag == "body" and aas[1].parent.tag == "body"
    # noah's ark: a 5th identical <b> caps reconstruction depth at 3+1
    doc = parse_html("<b><b><b><b><b>w")
    # markers: formatting never leaks across table cells
    doc = parse_html("<table><tr><td><b>c</td><td>d</td></tr></table>e")
    bs = find(doc, "b")
    assert len(bs) == 1 and bs[0].text() == "c"


def test_script_style_raw_text():
    doc = parse_html("<body><script>if (a < b) { x(); }</script><p>t</p></body>")
    assert "x();" in find(doc, "script")[0].text()
    assert find(doc, "p")[0].text() == "t"


def test_attrs_and_classes():
    doc = parse_html("<div class='a b' id='main' data-x='1' hidden></div>")
    d = find(doc, "div")[0]
    assert d.classes == {"a", "b"}
    assert d.id == "main"
    assert d.attrs["data-x"] == "1"
    assert d.attrs["hidden"] == ""


def test_document_order_is_depth_first():
    doc = parse_html("<div><p><b>x</b></p><span>y</span></div>")
    order = [(e.tag, e.order) for e in doc.iter_elements()]
    seq = [o for _, o in order]
    assert seq == sorted(seq)
    flat = [t for t, _ in order]
    assert flat.index("b") < flat.index("span")


def test_comment_and_doctype_dropped():
    doc = parse_html("<!DOCTYPE html><!-- c --><p>x</p>")
    assert find(doc, "p")[0].text() == "x"


def test_head_only_tags_into_head():
    doc = parse_html("<title>T</title><meta charset='u'><p>body text</p>")
    head = find(doc, "head")[0]
    assert [e.tag for e in head.child_elements()] == ["title", "meta"]
    assert find(doc, "p")[0].parent.tag == "body"
