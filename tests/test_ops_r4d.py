"""Unit tests for the round-4d extraction ops: the microdata walker
(nested-item boundaries, tag-dependent values, document order), the
Aho–Corasick automaton (overlapping counts, suffix-pattern fail-link
outputs), and the SQL-twin precondition for dictionary matching
(border-free terms). Distributed value parity runs through the oracle gate
(q:microdata_extract / canonical_dedup / multi_pattern_match)."""

from __future__ import annotations

import numpy as np
import pytest

from goose_parser_ray.functions.ahocorasick import AhoCorasick
from goose_parser_ray.functions.microdata import extract_microdata
from goose_parser_ray.html.treebuilder import parse_html
from goose_parser_ray.queries.extraction2 import MATCH_TERMS


# ---------------------------------------------------------------------------
# microdata walker
# ---------------------------------------------------------------------------


def test_microdata_nested_item_boundary():
    """Props inside a nested itemscope belong to the NESTED item, and the
    itemprop-carried nested item contributes (owner, prop, nested_type)."""
    doc = parse_html(
        '<html><body><div itemscope itemtype="T1">'
        '<span itemprop="a">x</span>'
        '<div itemprop="child" itemscope itemtype="T2">'
        '<span itemprop="b">y</span></div>'
        "</div></body></html>"
    )
    rows = extract_microdata(doc)
    assert rows == [
        ("T1", "a", "x"),
        ("T1", "child", "T2"),
        ("T2", "b", "y"),
    ]


def test_microdata_value_tag_dispatch():
    doc = parse_html(
        '<html><body><div itemscope itemtype="T">'
        '<meta itemprop="m" content="c1">'
        '<a itemprop="l" href="h1">anchor text ignored</a>'
        '<img itemprop="i" src="s1">'
        '<time itemprop="t" datetime="2026-01-01">Jan 1</time>'
        '<data itemprop="d" value="42">forty-two</data>'
        '<span itemprop="s">  padded   text </span>'
        "</div></body></html>"
    )
    vals = {p: v for _, p, v in extract_microdata(doc)}
    assert vals == {
        "m": "c1",
        "l": "h1",
        "i": "s1",
        "t": "2026-01-01",
        "d": "42",
        "s": "padded text",
    }


def test_microdata_orphan_itemprop_ignored():
    """itemprop outside any itemscope contributes nothing (W3C: no item)."""
    doc = parse_html(
        '<html><body><span itemprop="loose">x</span>'
        '<div itemscope itemtype="T"><span itemprop="a">y</span></div>'
        "</body></html>"
    )
    assert extract_microdata(doc) == [("T", "a", "y")]


def test_microdata_sibling_top_level_items_in_order():
    doc = parse_html(
        '<html><body><div itemscope itemtype="A">'
        '<span itemprop="p">1</span></div>'
        '<div itemscope itemtype="B"><span itemprop="q">2</span></div>'
        "</body></html>"
    )
    assert extract_microdata(doc) == [("A", "p", "1"), ("B", "q", "2")]


# ---------------------------------------------------------------------------
# Aho–Corasick automaton
# ---------------------------------------------------------------------------


def test_ac_counts_all_overlapping_occurrences():
    ac = AhoCorasick(["aba"])
    # "ababa": matches at 0 and 2 (overlapping) — automaton reports both
    assert ac.count_all("ababa").tolist() == [2]


def test_ac_suffix_pattern_reported_via_fail_links():
    """'he' is a suffix of 'she' — a match of 'she' must also count 'he'
    (output-set merge along failure links)."""
    ac = AhoCorasick(["she", "he", "hers"])
    counts = dict(zip(ac.patterns, ac.count_all("ushers").tolist()))
    assert counts == {"she": 1, "he": 1, "hers": 1}


def test_ac_matches_bruteforce_on_random_text():
    rng = np.random.default_rng(7)
    pats = ["ab", "bc", "abc", "ca", "aa"]
    ac = AhoCorasick(pats)
    for _ in range(20):
        s = "".join(rng.choice(list("abc"), size=60))
        expect = [
            sum(s.startswith(p, i) for i in range(len(s)))
            for p in pats
        ]
        assert ac.count_all(s).tolist() == expect


def test_ac_empty_pattern_rejected():
    with pytest.raises(ValueError):
        AhoCorasick(["ok", ""])


# ---------------------------------------------------------------------------
# SQL-twin precondition
# ---------------------------------------------------------------------------


def test_dictionary_terms_border_free():
    """The replace()-arithmetic oracle counts NON-overlapping occurrences;
    it equals the automaton's overlapping count iff no term has a proper
    border (prefix == suffix). Guard the dictionary against edits that
    would silently break the twin equivalence."""
    for t in MATCH_TERMS:
        for k in range(1, len(t)):
            assert t[:k] != t[-k:], f"term {t!r} has border {t[:k]!r}"


# ---------------------------------------------------------------------------
# containment join: brute-force parity (zero-miss prefix blocking)
# ---------------------------------------------------------------------------


def _grams3(text: str) -> set:
    w = [t for t in text.lower().split() if t]
    return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}


def _brute_containment(rows, num, den):
    out = []
    for a in rows:
        ga = _grams3(a["text"])
        if not ga:
            continue
        for b in rows:
            if a["doc_id"] == b["doc_id"]:
                continue
            i = len(ga & _grams3(b["text"]))
            if den * i >= num * len(ga):
                out.append(
                    (a["doc_id"], b["doc_id"], 10000 * i // len(ga))
                )
    return sorted(out)


def test_containment_join_matches_bruteforce(ray_session):
    import ray.data

    from goose_parser_ray.functions.dedup import containment_join

    rng = np.random.default_rng(11)
    vocab = list("abcdefgh")
    rows = []
    for i in range(30):
        words = rng.choice(vocab, size=rng.integers(3, 20)).tolist()
        rows.append({"doc_id": i, "text": " ".join(words)})
    # guaranteed containment: doc 100 is a fragment of doc 0
    rows.append({"doc_id": 100, "text": " ".join(rows[0]["text"].split()[:6])})
    # doc with < 3 words: no grams, must never pair
    rows.append({"doc_id": 101, "text": "xy zz"})
    ds = ray.data.from_items(rows)
    got = containment_join(
        ds, id_col="doc_id", col="text", n=3,
        threshold_num=7, threshold_den=10,
    ).to_pandas()
    got_t = sorted(
        (int(r.id_a), int(r.id_b), int(r.cont_e4))
        for r in got.itertuples()
    )
    assert got_t == _brute_containment(rows, 7, 10)
    assert any(a == 100 and b == 0 for a, b, _ in got_t)
    assert all(101 not in (a, b) for a, b, _ in got_t)
