"""Link-graph extraction: the DOM engine must recover the closed-form edge
set through arbitrary (escaped) document text."""

import pyarrow as pa

from goose_parser_ray.functions.linkgraph import (
    LINK_MOD,
    LinkExtractActor,
    synthesize_page,
)


def _expected_edges(ids):
    out = []
    for i in ids:
        for k in range(1, i % 3 + 2):
            out.append((i, (i * 7 + k) % LINK_MOD))
    return out


NASTY = [
    "plain text",
    "a < b && c > d",
    'has a fake link <a href="/doc/999">nope</a> in raw text',
    "premature close </body></html> then more",
    "entities &amp; &lt;already&gt; encoded",
    "",
    "unicode — привет <мир> & done",
]


def test_edges_match_closed_form_through_nasty_text():
    ids = [0, 1, 2, 3, 17, 999, 123456]
    texts = (NASTY * 2)[: len(ids)]
    batch = pa.Table.from_pydict(
        {"doc_id": pa.array(ids, pa.int64()), "text": texts}
    )
    got = LinkExtractActor()(batch)
    pairs = list(zip(got["src"].to_pylist(), got["dst"].to_pylist()))
    assert pairs == _expected_edges(ids)


def test_escaping_roundtrip_in_page_text():
    # the <p> content must parse back to the ORIGINAL text — the fake-link
    # text above must not materialize as an extra anchor (checked by the
    # edge-count equality) and the text node must survive byte-identically.
    from goose_parser_ray.css.selector import select
    from goose_parser_ray.html.treebuilder import parse_html

    raw = 'fake <a href="/doc/7">x</a> & "</ul>" tail'
    doc = parse_html(synthesize_page(5, raw))
    (p,) = select("p", doc)
    assert p.text() == raw
    anchors = select("a[href]", doc)
    assert len(anchors) == 5 % 3 + 1  # only the synthesized links


def test_empty_batch():
    batch = pa.Table.from_pydict(
        {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
    )
    got = LinkExtractActor()(batch)
    assert got.num_rows == 0
    assert got.column_names == ["src", "dst"]
