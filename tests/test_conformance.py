"""Conformance gate (FIXTURES.md F2/F3, BASELINE.md correctness gate):
span-sequence equality on (kind, text, media_ref, order) for every case in
the pool, single-process oracle path. The Ray pipeline is held to the same
goldens in test_pipeline_ray.py."""

import json
from pathlib import Path

import pytest

from goose_parser_ray.html import parse_html
from goose_parser_ray.rules import compile_rules, evaluate
from goose_parser_ray.spans import extract_document

CASES_DIR = Path(__file__).resolve().parents[1] / "fixtures" / "cases"
CASE_IDS = sorted(d.name for d in CASES_DIR.iterdir() if d.is_dir())


def load(case_id):
    d = CASES_DIR / case_id
    rules = json.loads((d / "rules.json").read_text())
    html = (d / "doc.html").read_text().rstrip("\n")
    expected = json.loads((d / "expected.json").read_text())
    return rules, html, expected


def seq(spans):
    """The conformance key: (kind, text, media_ref) in order; offset is
    carried but order — not its value — is compared (BASELINE.json:15)."""
    return [(s["kind"], s["text"], s["media_ref"]) for s in spans]


@pytest.mark.parametrize("case_id", CASE_IDS)
def test_goose_json_result(case_id):
    rules, html, expected = load(case_id)
    if rules is None:
        pytest.skip("pipeline-level case (no rule tree)")
    got = evaluate(compile_rules(rules), parse_html(html))
    assert got == expected["goose"]


@pytest.mark.parametrize("case_id", CASE_IDS)
def test_span_sequence_equality(case_id):
    rules, html, expected = load(case_id)
    spans = [{"kind": "html", "text": html, "media_ref": "", "offset": 0}]
    spans += expected.get("extra_spans", [])
    plan = compile_rules(rules) if rules is not None else None
    got = extract_document(case_id, spans, plan=plan)
    want = expected["spans"] + expected.get("expected_extra", [])
    assert seq(got) == seq(want)
    # offsets are the emission sequence 0..n-1
    assert [s["offset"] for s in got] == list(range(len(got)))


def test_case_pool_covers_required_behaviors():
    """FIXTURES.md F3 minimum pool is present."""
    required = {
        "simple_text", "simple_attr", "simple_separator", "simple_array",
        "simple_empty", "collection_object", "grid_rows", "grid_nested",
        "grid_dedup_id", "sel_sizzle", "transform_trim", "transform_replace",
        "transform_date", "transform_split", "transform_match",
        "transform_join", "transform_get", "cases_exist",
        "boilerplate_strip", "media_passthrough", "malformed_html",
    }
    assert required <= set(CASE_IDS)
