"""Rule-plan compiler/evaluator unit tests (SURVEY.md §2.1 G1–G8)."""

import pickle

import pytest

from goose_parser_ray.html import parse_html
from goose_parser_ray.rules import RuleError, compile_rules, evaluate

DOC = parse_html(
    """
<div class="content">
  <h1 class="title"> Product Page </h1>
  <a class="buy" href="/buy/123">Buy now</a>
  <span class="tag">a</span><span class="tag">b</span><span class="tag">c</span>
  <div class="meta"><span class="author">Jane</span><span class="date">30 August 2016</span></div>
  <ul class="items">
    <li><span class="sku">s1</span><span class="price"> 10 </span></li>
    <li><span class="sku">s2</span><span class="price"> 20 </span></li>
    <li><span class="sku">s1</span><span class="price"> 99 </span></li>
  </ul>
  <div class="maybe-old"><em>old-price</em></div>
</div>
"""
)


def ev(rule):
    return evaluate(compile_rules(rule), DOC)


def test_simple_text_and_transform():
    assert ev({"scope": ".title", "transform": [{"type": "trim"}]}) == "Product Page"


def test_simple_attr():
    assert ev({"scope": "a.buy", "attr": "href"}) == "/buy/123"


def test_simple_separator_default_space():
    assert ev({"scope": "span.tag"}) == "a b c"


def test_simple_separator_custom():
    assert ev({"scope": "span.tag", "separator": ", "}) == "a, b, c"


def test_simple_array_elementwise_transform():
    got = ev({"scope": ".price", "type": "array", "transform": [{"type": "trim"}]})
    assert got == ["10", "20", "99"]


def test_simple_no_match_empty_string():
    assert ev({"scope": ".missing"}) == ""


def test_empty_match_still_transformed():
    got = ev({"scope": ".missing", "transform": [{"type": "compare", "value": ""}]})
    assert got is True


def test_collection_object():
    got = ev(
        {
            "scope": ".meta",
            "collection": [
                {"name": "author", "scope": ".author"},
                {"name": "when", "scope": ".date"},
            ],
        }
    )
    assert got == {"author": "Jane", "when": "30 August 2016"}


def test_collection_missing_scope_gives_empty_fields():
    got = ev(
        {
            "scope": ".nope",
            "collection": [{"name": "a", "scope": ".author"}],
        }
    )
    assert got == {"a": ""}


def test_grid_rows_and_dedup():
    rule = {
        "scope": ".items li",
        "collection": [
            [
                {"name": "sku", "scope": ".sku", "id": True},
                {"name": "price", "scope": ".price", "transform": [{"type": "trim"}]},
            ]
        ],
    }
    assert ev(rule) == [
        {"sku": "s1", "price": "10"},
        {"sku": "s2", "price": "20"},
    ]


def test_grid_without_id_keeps_duplicates():
    rule = {"scope": ".items li", "collection": [[{"name": "sku", "scope": ".sku"}]]}
    assert [r["sku"] for r in ev(rule)] == ["s1", "s2", "s1"]


def test_grid_dedup_id_fn():
    # G6 callable-id variant (SURVEY §2.1 G6 [M]): the dedup key is the
    # REGISTERED function's return value, so s1/s2 collapse to one row.
    from goose_parser_ray.rules.plan import ID_FN_REGISTRY, register_id_fn

    register_id_fn("first_char", lambda v: v[:1] if v else v)
    try:
        rule = {
            "scope": ".items li",
            "collection": [
                [
                    {"name": "sku", "scope": ".sku", "id": "first_char"},
                    {
                        "name": "price",
                        "scope": ".price",
                        "transform": [{"type": "trim"}],
                    },
                ]
            ],
        }
        # all skus start with "s" → only the first row survives
        assert ev(rule) == [{"sku": "s1", "price": "10"}]
    finally:
        ID_FN_REGISTRY.pop("first_char", None)


def test_grid_id_fn_unregistered_rejected_at_compile():
    rule = {
        "scope": ".items li",
        "collection": [[{"name": "sku", "scope": ".sku", "id": "no_such_fn"}]],
    }
    with pytest.raises(RuleError, match="not registered"):
        compile_rules(rule)


def test_grid_id_unsupported_form_rejected():
    rule = {
        "scope": ".items li",
        "collection": [[{"name": "sku", "scope": ".sku", "id": 123}]],
    }
    with pytest.raises(RuleError, match="unsupported id form"):
        compile_rules(rule)


def test_register_id_fn_requires_callable():
    from goose_parser_ray.rules.plan import register_id_fn

    with pytest.raises(RuleError, match="must be callable"):
        register_id_fn("bad", 42)


def test_parent_scope_reroot():
    rule = {
        "scope": ".meta",
        "collection": [
            {"name": "author", "scope": ".author"},
            {
                "name": "title",
                "parentScope": ".content",
                "scope": ".title",
                "transform": [{"type": "trim"}],
            },
        ],
    }
    assert ev(rule) == {"author": "Jane", "title": "Product Page"}


def test_cases_first_existing_wins():
    rule = {"cases": [{"scope": ".sale"}, {"scope": ".maybe-old em"}]}
    assert ev(rule) == "old-price"


def test_cases_none_match():
    assert ev({"cases": [{"scope": ".n1"}, {"scope": ".n2"}]}) == ""


def test_nested_grid_in_collection():
    rule = {
        "collection": [
            {"name": "title", "scope": ".title", "transform": [{"type": "trim"}]},
            {
                "name": "rows",
                "scope": ".items li",
                "collection": [[{"name": "sku", "scope": ".sku"}]],
            },
        ]
    }
    got = ev(rule)
    assert got["title"] == "Product Page"
    assert len(got["rows"]) == 3


@pytest.mark.parametrize(
    "bad",
    [
        {"collection": []},
        {"collection": [[{"name": "a", "scope": "p"}], [{"name": "b", "scope": "p"}]]},
        {"scope": "li", "collection": [{"scope": "p"}]},  # unnamed member
        {"transform": [{"type": "trim"}]},  # simple without scope
        "not-a-dict",
    ],
)
def test_malformed_rules_rejected(bad):
    with pytest.raises(RuleError):
        compile_rules(bad)


def test_plan_pickles_and_hash_stable():
    rule = {
        "scope": "li",
        "collection": [[{"name": "v", "scope": "b", "transform": [{"type": "trim"}]}]],
    }
    p1, p2 = compile_rules(rule), compile_rules(dict(rule))
    assert p1.plan_hash == p2.plan_hash
    assert pickle.loads(pickle.dumps(p1)).plan_hash == p1.plan_hash
