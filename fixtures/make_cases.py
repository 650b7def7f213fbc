"""Write the conformance case pool (FIXTURES.md F3) to fixtures/cases/.

Each case re-encodes one reference test behavior (SURVEY.md §5.1) as data:
``rules.json`` (null for rule-less pipeline cases), ``doc.html``, and a
HAND-AUTHORED ``expected.json`` holding the goose-style JSON result and the
flattened F2 span sequence. Expectations are written here by hand, not
produced by the oracle — the oracle is what they test.

Run: ``python fixtures/make_cases.py`` (idempotent, deterministic).
"""

from __future__ import annotations

import json
from pathlib import Path

HERE = Path(__file__).parent


def text_spans(*texts: str) -> list[dict]:
    return [
        {"kind": "text", "text": t, "media_ref": "", "offset": i}
        for i, t in enumerate(texts)
    ]


CASES: dict[str, dict] = {}

# --- G1 simple rules -------------------------------------------------------
CASES["simple_text"] = {
    "rules": {"scope": "h1.title"},
    "html": "<div><h1 class='title'>Hello World</h1><p>body</p></div>",
    "goose": "Hello World",
    "spans": text_spans("Hello World"),
}
CASES["simple_attr"] = {
    "rules": {"scope": "a.buy", "attr": "href"},
    "html": "<a class='buy' href='/buy/123'>Buy</a>",
    "goose": "/buy/123",
    "spans": text_spans("/buy/123"),
}
CASES["simple_separator"] = {
    "rules": {"scope": "span.tag", "separator": ", "},
    "html": "<span class='tag'>a</span><span class='tag'>b</span><span class='tag'>c</span>",
    "goose": "a, b, c",
    "spans": text_spans("a, b, c"),
}
CASES["simple_default_separator"] = {
    "rules": {"scope": "li"},
    "html": "<ul><li>x</li><li>y</li></ul>",
    "goose": "x y",
    "spans": text_spans("x y"),
}
CASES["simple_array"] = {
    "rules": {"scope": "li", "type": "array", "transform": [{"type": "trim"}]},
    "html": "<ul><li> a </li><li> b </li></ul>",
    "goose": ["a", "b"],
    "spans": text_spans("a", "b"),
}
CASES["simple_empty"] = {
    "rules": {"scope": ".does-not-exist"},
    "html": "<div><p>content</p></div>",
    "goose": "",
    "spans": text_spans(""),
}

# --- G2/G3/G4/G6 -----------------------------------------------------------
CASES["collection_object"] = {
    "rules": {
        "scope": ".card",
        "collection": [
            {"name": "title", "scope": ".t"},
            {"name": "sub", "scope": ".meta .s"},
        ],
    },
    "html": (
        "<div class='card'><span class='t'>T1</span>"
        "<div class='meta'><span class='s'>S1</span></div></div>"
    ),
    "goose": {"title": "T1", "sub": "S1"},
    "spans": text_spans("T1", "S1"),
}
CASES["grid_rows"] = {
    "rules": {
        "scope": "table tr",
        "collection": [
            [
                {"name": "sku", "scope": "td:eq(0)"},
                {"name": "price", "scope": "td:eq(1)"},
            ]
        ],
    },
    "html": (
        "<table><tr><td>s1</td><td>10</td></tr>"
        "<tr><td>s2</td><td>20</td></tr></table>"
    ),
    "goose": [{"sku": "s1", "price": "10"}, {"sku": "s2", "price": "20"}],
    "spans": text_spans("s1", "10", "s2", "20"),
}
CASES["grid_nested"] = {
    "rules": {
        "scope": ".report",
        "collection": [
            {"name": "heading", "parentScope": "body", "scope": "h1"},
            {
                "name": "rows",
                "scope": "li",
                "collection": [[{"name": "v", "scope": "b"}]],
            },
        ],
    },
    "html": (
        "<h1>Top</h1><div class='report'><ul>"
        "<li><b>1</b></li><li><b>2</b></li></ul></div>"
    ),
    "goose": {"heading": "Top", "rows": [{"v": "1"}, {"v": "2"}]},
    "spans": text_spans("Top", "1", "2"),
}
CASES["grid_dedup_id"] = {
    "rules": {
        "scope": "li",
        "collection": [
            [
                {"name": "sku", "scope": ".sku", "id": True},
                {"name": "price", "scope": ".price"},
            ]
        ],
    },
    "html": (
        "<ul><li><span class='sku'>A</span><span class='price'>1</span></li>"
        "<li><span class='sku'>B</span><span class='price'>2</span></li>"
        "<li><span class='sku'>A</span><span class='price'>9</span></li></ul>"
    ),
    "goose": [{"sku": "A", "price": "1"}, {"sku": "B", "price": "2"}],
    "spans": text_spans("A", "1", "B", "2"),
}
CASES["sel_sizzle"] = {
    "rules": {
        "collection": [
            {"name": "first", "scope": "li:first"},
            {"name": "second", "scope": "li:eq(1)"},
            {"name": "last", "scope": "li:last"},
            {"name": "hit", "scope": "li:contains('needle')"},
        ]
    },
    "html": "<ul><li>one</li><li>two needle</li><li>three</li></ul>",
    "goose": {
        "first": "one",
        "second": "two needle",
        "last": "three",
        "hit": "two needle",
    },
    "spans": text_spans("one", "two needle", "three", "two needle"),
}

# --- transforms ------------------------------------------------------------
CASES["transform_trim"] = {
    "rules": {"scope": ".v", "transform": [{"type": "trim"}]},
    "html": "<span class='v'>   padded value \n </span>",
    "goose": "padded value",
    "spans": text_spans("padded value"),
}
CASES["transform_replace"] = {
    "rules": {
        "scope": ".v",
        "transform": [
            {"type": "replace", "re": ["\\s+", "g"], "to": " "},
            {"type": "trim"},
            {"type": "replace", "re": ["(\\w+), (\\w+)"], "to": "$2 $1"},
        ],
    },
    "html": "<span class='v'>  Doe,   John </span>",
    "goose": "John Doe",
    "spans": text_spans("John Doe"),
}
CASES["transform_date"] = {
    "rules": {
        "collection": [
            {
                "name": "en",
                "scope": ".d-en",
                "transform": [
                    {"type": "date", "from": "HH:mm D MMMM YYYY", "to": "YYYY-MM-DD HH:mm"}
                ],
            },
            {
                "name": "ru",
                "scope": ".d-ru",
                "transform": [
                    {"type": "date", "locale": "ru", "from": "D MMMM YYYY", "to": "YYYY-MM-DD"}
                ],
            },
        ]
    },
    "html": (
        "<span class='d-en'>21:00 30 August 2016</span>"
        "<span class='d-ru'>8 сентября 2016</span>"
    ),
    "goose": {"en": "2016-08-30 21:00", "ru": "2016-09-08"},
    "spans": text_spans("2016-08-30 21:00", "2016-09-08"),
}
CASES["transform_split"] = {
    "rules": {
        "scope": ".csv",
        "transform": [{"type": "split", "separator": ",", "index": 1}, {"type": "trim"}],
    },
    "html": "<span class='csv'>alpha, beta, gamma</span>",
    "goose": "beta",
    "spans": text_spans("beta"),
}
CASES["transform_join"] = {
    "rules": {
        "scope": ".csv",
        "transform": [
            {"type": "split", "separator": ","},
            {"type": "trim"},
            {"type": "join", "glue": "|"},
        ],
    },
    "html": "<span class='csv'>a, b ,c</span>",
    "goose": "a|b|c",
    "spans": text_spans("a|b|c"),
}
CASES["transform_match"] = {
    "rules": {
        "scope": ".v",
        "transform": [{"type": "match", "re": ["(\\d+)-(\\d+)"], "index": 2}],
    },
    "html": "<span class='v'>range 10-25 total</span>",
    "goose": "25",
    "spans": text_spans("25"),
}
CASES["transform_get"] = {
    "rules": {
        "scope": ".csv",
        "transform": [{"type": "split", "separator": ","}, {"type": "get", "path": "0"}],
    },
    "html": "<span class='csv'>first,second</span>",
    "goose": "first",
    "spans": text_spans("first"),
}
CASES["transform_decode"] = {
    "rules": {"scope": ".v", "attr": "data-x", "transform": [{"type": "decodeHTML"}]},
    "html": "<span class='v' data-x='a &amp; b'>t</span>",
    "goose": "a & b",
    "spans": text_spans("a & b"),
}
CASES["transform_chain_order"] = {
    # order matters: replace-then-trim != trim-then-replace
    "rules": {
        "scope": ".v",
        "transform": [
            {"type": "replace", "re": ["^x+"], "to": "  "},
            {"type": "trim"},
        ],
    },
    "html": "<span class='v'>xxxvalue</span>",
    "goose": "value",
    "spans": text_spans("value"),
}

# --- cases / exist ---------------------------------------------------------
CASES["cases_exist"] = {
    "rules": {
        "collection": [
            {
                "name": "price",
                "cases": [
                    {"scope": ".sale-price"},
                    {"scope": ".regular-price"},
                ],
            },
            {
                "name": "missing",
                "cases": [{"scope": ".a"}, {"scope": ".b"}],
            },
        ]
    },
    "html": "<div><span class='regular-price'>42</span></div>",
    "goose": {"price": "42", "missing": ""},
    "spans": text_spans("42", ""),
}

# --- batch 2: selector combinators, more transforms, edge recovery --------
CASES["sel_combinators"] = {
    "rules": {
        "collection": [
            {"name": "adjacent", "scope": "p.lead + p"},
            {"name": "siblings", "scope": "p.lead ~ p", "separator": "|"},
            {"name": "child", "scope": "div > span"},
            {"name": "nth", "scope": "li:nth-child(2)"},
        ]
    },
    "html": (
        "<div><p class='lead'>L</p><p>A</p><p>B</p><span>S</span>"
        "<ul><li>1</li><li>2</li><li>3</li></ul></div>"
    ),
    "goose": {"adjacent": "A", "siblings": "A|B", "child": "S", "nth": "2"},
    "spans": text_spans("A", "A|B", "S", "2"),
}
CASES["sel_attr_ops"] = {
    "rules": {
        "collection": [
            {"name": "starts", "scope": "a[href^='/docs']", "attr": "href"},
            {"name": "ends", "scope": "a[href$='.pdf']", "attr": "href"},
            {"name": "contains", "scope": "a[href*='mid']", "attr": "href"},
            {"name": "word", "scope": "[data-tags~='beta']", "attr": "data-tags"},
        ]
    },
    "html": (
        "<a href='/docs/a'>1</a><a href='/x/file.pdf'>2</a>"
        "<a href='/a/mid/b'>3</a><span data-tags='alpha beta'>4</span>"
    ),
    "goose": {
        "starts": "/docs/a",
        "ends": "/x/file.pdf",
        "contains": "/a/mid/b",
        "word": "alpha beta",
    },
    "spans": text_spans("/docs/a", "/x/file.pdf", "/a/mid/b", "alpha beta"),
}
CASES["transform_replace_flags"] = {
    "rules": {
        "scope": ".v",
        "transform": [{"type": "replace", "re": ["ab", "gi"], "to": "-"}],
    },
    "html": "<span class='v'>AbxaB</span>",
    "goose": "-x-",
    "spans": text_spans("-x-"),
}
CASES["transform_date_ordinal"] = {
    "rules": {
        "scope": ".d",
        "transform": [
            {"type": "date", "from": "Do MMM YYYY", "to": "YYYY-MM-DD"}
        ],
    },
    "html": "<span class='d'>21st Aug 2016</span>",
    "goose": "2016-08-21",
    "spans": text_spans("2016-08-21"),
}
CASES["transform_compare"] = {
    "rules": {
        "scope": ".stock",
        "transform": [{"type": "trim"}, {"type": "compare", "value": "in stock"}],
    },
    "html": "<span class='stock'> in stock </span>",
    "goose": True,
    "spans": text_spans("true"),
}
CASES["transform_combine"] = {
    "rules": {
        "scope": ".w",
        "type": "array",
        "transform": [{"type": "trim"}],
    },
    "html": "<b class='w'> x </b><b class='w'> y </b>",
    "goose": ["x", "y"],
    "spans": text_spans("x", "y"),
}
CASES["grid_attr_cells"] = {
    "rules": {
        "scope": "li",
        "collection": [
            [
                {"name": "href", "scope": "a", "attr": "href"},
                {"name": "label", "scope": "a"},
            ]
        ],
    },
    "html": (
        "<ul><li><a href='/1'>one</a></li><li><a href='/2'>two</a></li></ul>"
    ),
    "goose": [
        {"href": "/1", "label": "one"},
        {"href": "/2", "label": "two"},
    ],
    "spans": text_spans("/1", "one", "/2", "two"),
}
CASES["cases_nested_collection"] = {
    "rules": {
        "name": "product",
        "cases": [
            {
                "scope": ".missing-root",
                "collection": [{"name": "x", "scope": ".x"}],
            },
            {
                "scope": ".present",
                "collection": [
                    {"name": "a", "scope": ".a"},
                    {"name": "b", "scope": ".b"},
                ],
            },
        ],
    },
    "html": "<div class='present'><i class='a'>A</i><i class='b'>B</i></div>",
    "goose": {"a": "A", "b": "B"},
    "spans": text_spans("A", "B"),
}
CASES["entities_in_attrs"] = {
    "rules": {
        "collection": [
            {"name": "attr", "scope": ".e", "attr": "title"},
            {"name": "text", "scope": ".e"},
        ]
    },
    "html": "<span class='e' title='a &amp; b &quot;q&quot;'>x &lt; y</span>",
    "goose": {"attr": 'a & b "q"', "text": "x < y"},
    "spans": text_spans('a & b "q"', "x < y"),
}
CASES["deep_misnesting"] = {
    # adoption-agency reconstruction (round 2): the browser DOM for this
    # markup contains SIX em elements (reconstructed clones nest) — jQuery
    # $('em').text() per element gives a,b,b,c,c,c; verified against the
    # WHATWG algorithm by hand. Round 1's a,b,c encoded the pre-AA
    # pop-until-match deviation.
    "rules": {"scope": "em", "type": "array"},
    "html": "<div><p><em>a<p><em>b</div><em>c",
    "goose": ["a", "b", "b", "c", "c", "c"],
    "spans": text_spans("a", "b", "b", "c", "c", "c"),
}

# --- pipeline-level (no rules: boilerplate/media/malformed) ----------------
CASES["transform_join_chain"] = {
    # T4+T5 through the pipeline: split then join with new glue
    "rules": {
        "scope": "p.csv",
        "transform": [
            {"type": "split", "separator": ","},
            {"type": "join", "glue": " | "},
        ],
    },
    "html": "<p class='csv'>a,b,c</p>",
    "goose": "a | b | c",
    "spans": text_spans("a | b | c"),
}
CASES["collection_pick_get"] = {
    # round-2 parity fix: transforms apply to COLLECTION results too
    # (upstream _parseScope -> _applyTransformations on any rule value);
    # pick narrows the object, nested get drills into a sibling collection
    "rules": {
        "collection": [
            {
                "name": "picked",
                "collection": [
                    {"name": "x", "scope": "span.x"},
                    {"name": "y", "scope": "span.y"},
                ],
                "transform": [{"type": "pick", "prop": ["x"]}],
            },
            {
                "name": "got",
                "collection": [
                    {"name": "x", "scope": "span.x"},
                    {"name": "y", "scope": "span.y"},
                ],
                "transform": [{"type": "get", "path": "y"}],
            },
        ]
    },
    "html": "<div><span class='x'>X</span><span class='y'>Y</span></div>",
    "goose": {"picked": {"x": "X"}, "got": "Y"},
    "spans": text_spans("X", "Y"),
}
CASES["adoption_agency_reconstruct"] = {
    # round-2: formatting leaks out of a closed block and reconstructs —
    # <div><b>x</div>y gives TWO b elements in the browser DOM (the second
    # wraps y under body); a-in-a closes the first anchor implicitly.
    "rules": {
        "collection": [
            {"name": "bolds", "scope": "b", "type": "array"},
            {"name": "anchors", "scope": "a", "attr": "href", "type": "array"},
        ]
    },
    "html": "<div><b>x</div>y<a href='/1'>p<a href='/2'>q</a>",
    "goose": {"bolds": ["x", "ypq"], "anchors": ["/1", "/2"]},
    "spans": text_spans("x", "ypq", "/1", "/2"),
}
CASES["of_type_selectors"] = {
    # round-2: of-type pseudo family
    "rules": {
        "collection": [
            {"name": "first_span", "scope": "div span:first-of-type"},
            {"name": "last_span", "scope": "div span:last-of-type"},
            {"name": "second_p", "scope": "div p:nth-of-type(2)"},
        ]
    },
    "html": (
        "<div><p>p1</p><span>s1</span><p>p2</p><span>s2</span>"
        "<span>s3</span></div>"
    ),
    "goose": {"first_span": "s1", "last_span": "s3", "second_p": "p2"},
    "spans": text_spans("s1", "s3", "p2"),
}
CASES["boilerplate_strip"] = {
    "rules": None,
    "html": (
        "<body><nav><a href='/a'>A</a> <a href='/b'>B</a></nav>"
        "<div class='sidebar'><a href='/x'>x</a></div>"
        "<article><h1>Title</h1><p>Real content paragraph one.</p>"
        "<p>Real content paragraph two.</p>"
        "<div class='share'><a href='/t'>tweet</a></div></article>"
        "<footer>© 2016 <a href='/l'>legal</a></footer></body>"
    ),
    "goose": None,
    "spans": text_spans(
        "Title", "Real content paragraph one.", "Real content paragraph two."
    ),
}
CASES["malformed_html"] = {
    "rules": {
        "collection": [
            {"name": "items", "scope": "li", "type": "array"},
            {"name": "cell", "scope": "table td:eq(1)"},
            {"name": "para", "scope": "p", "separator": "/"},
        ]
    },
    "html": (
        "<div><p>open para<p>second para"
        "<ul><li>a<li>b</ul>"
        "<table><tr><td>1<td>2</table>"
        "<b>bold &amp; <i>mixed</b> tail</i></div>"
    ),
    "goose": {"items": ["a", "b"], "cell": "2", "para": "open para/second para"},
    "spans": text_spans("a", "b", "2", "open para/second para"),
}

# media_passthrough is span-level, not html-level: synthesized in tests from
# multi-span docs; recorded here for the doc-level harness with empty rules.
CASES["media_passthrough"] = {
    "rules": None,
    "html": "<p>before media</p>",
    "goose": None,
    "spans": text_spans("before media"),
    "extra_spans": [
        {"kind": "image", "text": "cap1", "media_ref": "blob://X/1", "offset": 1},
        {"kind": "pdf", "text": "", "media_ref": "blob://X/2", "offset": 2},
    ],
    "expected_extra": [
        {"kind": "image", "text": "cap1", "media_ref": "blob://X/1", "offset": 1},
        {"kind": "pdf", "text": "", "media_ref": "blob://X/2", "offset": 2},
    ],
}


def main() -> None:
    base = HERE / "cases"
    base.mkdir(parents=True, exist_ok=True)
    for case_id, spec in CASES.items():
        d = base / case_id
        d.mkdir(exist_ok=True)
        (d / "rules.json").write_text(
            json.dumps(spec["rules"], indent=2, ensure_ascii=False) + "\n"
        )
        (d / "doc.html").write_text(spec["html"] + "\n")
        expected = {
            "goose": spec["goose"],
            "spans": spec["spans"],
        }
        if "extra_spans" in spec:
            expected["extra_spans"] = spec["extra_spans"]
            expected["expected_extra"] = spec["expected_extra"]
        (d / "expected.json").write_text(
            json.dumps(expected, indent=2, ensure_ascii=False) + "\n"
        )
    print(f"wrote {len(CASES)} cases to {base}")


if __name__ == "__main__":
    main()
