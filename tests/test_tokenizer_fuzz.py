"""Seeded fuzz parity for the from-scratch HTML tokenizer (r2 VERDICT #9):
`_is_self_closing` and the shared `_ATTR_CACHE` paths are exercised against
stdlib ``html.parser`` on generated unquoted-value / trailing-slash / entity
combinations. The fuzz stays inside the semantics both tokenizers share
(no comments/doctype/rawtext — those are intentionally different); within
that envelope the event streams must be identical.
"""

from __future__ import annotations

import random
from html.parser import HTMLParser

from goose_parser_ray.html.tokenizer import _is_self_closing, tokenize


class _Collector:
    def __init__(self) -> None:
        self.events: list = []

    def handle_starttag(self, tag, attrs):
        self.events.append(("start", tag, tuple(attrs)))

    def handle_startendtag(self, tag, attrs):
        self.events.append(("startend", tag, tuple(attrs)))

    def handle_endtag(self, tag):
        self.events.append(("end", tag))

    def handle_data(self, data):
        self.events.append(("data", data))


class _StdCollector(_Collector, HTMLParser):  # _Collector first in MRO so
    # its handlers override HTMLParser's no-op defaults
    def __init__(self) -> None:
        HTMLParser.__init__(self, convert_charrefs=True)
        _Collector.__init__(self)


def _merge_data(events):
    """Both tokenizers may split text differently around entities — compare
    on merged adjacent data events."""
    out = []
    for e in events:
        if e[0] == "data" and out and out[-1][0] == "data":
            out[-1] = ("data", out[-1][1] + e[1])
        else:
            out.append(list(e) if e[0] == "data" else e)
    return [tuple(e) if isinstance(e, list) else e for e in out]


_WORDS = ["hello", "x1", "it", "path", "data", "Y"]
_ENTITIES = ["&amp;", "&lt;", "&gt;", "&#65;", "&quot;"]
_NAMES = ["href", "class", "data-x", "id", "rel", "SRC"]
_TAGS = ["a", "div", "span", "p", "img", "section"]


def _rand_attr(rng: random.Random) -> str:
    name = rng.choice(_NAMES)
    form = rng.randrange(6)
    if form == 0:
        return name  # bare
    if form == 1:
        return f'{name}="{rng.choice(_WORDS)} {rng.choice(_ENTITIES)}"'
    if form == 2:
        return f"{name}='{rng.choice(_WORDS)}'"
    if form == 3:
        # unquoted with slashes — the value must swallow a trailing '/'
        return f"{name}=http://x.com/{rng.choice(_WORDS)}/"
    if form == 4:
        return f"{name}={rng.choice(_WORDS)}"
    return f"{name}={rng.choice(_ENTITIES)}"


def _rand_doc(rng: random.Random) -> str:
    parts = []
    for _ in range(rng.randrange(10, 40)):
        kind = rng.randrange(5)
        if kind == 0:
            parts.append(rng.choice(_WORDS) + " " + rng.choice(_ENTITIES))
        elif kind in (1, 2):
            tag = rng.choice(_TAGS)
            attrs = " ".join(_rand_attr(rng) for _ in range(rng.randrange(3)))
            close = rng.choice(["", "/", " /"]) if rng.randrange(2) else ""
            sep = " " if attrs else ""
            parts.append(f"<{tag}{sep}{attrs}{close}>")
        elif kind == 3:
            parts.append(f"</{rng.choice(_TAGS)}>")
        else:
            parts.append(rng.choice(_WORDS))
    return "".join(parts)


def test_tokenizer_fuzz_matches_stdlib():
    rng = random.Random(1234)
    for trial in range(300):
        doc = _rand_doc(rng)
        ours = _Collector()
        tokenize(doc, ours)
        std = _StdCollector()
        std.feed(doc)
        std.close()
        assert _merge_data(ours.events) == _merge_data(std.events), (
            trial,
            doc,
        )


def test_attr_cache_entries_not_mutated_across_tags():
    """_ATTR_CACHE shares attr lists across tags — two tags with the same
    attr string must observe identical, independent-looking attr tuples."""
    doc = '<a href="/x" class="nav"><b href="/x" class="nav">t</b></a>'
    c = _Collector()
    tokenize(doc, c)
    starts = [e for e in c.events if e[0] == "start"]
    assert starts[0][2] == starts[1][2] == (("href", "/x"), ("class", "nav"))


def test_self_closing_heuristic_direct():
    # '/' after bare name, after quoted value, after whitespace → marker
    assert _is_self_closing("img src='x' /"[:-1] + "/") is True
    assert _is_self_closing('a href="y"/') is True
    assert _is_self_closing("br/") is True
    assert _is_self_closing("input disabled /") is True
    # '/' inside an unquoted value → part of the value
    assert _is_self_closing("a href=http://x.com/a/") is False
    assert _is_self_closing("a href=/") is False
