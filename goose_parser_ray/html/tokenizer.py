"""Fast from-scratch HTML tokenizer — the extract hot loop's inner engine.

Replaces stdlib ``html.parser`` in the tree builder: profiling showed the
stdlib tokenizer (generic regex machinery + position tracking) at ~75% of
per-document extract cost (0.3 ms/doc). This scanner does one ``str.find``
per tag and one compiled-regex pass per attribute string, emitting the same
event stream (starttag / startendtag / endtag / data) with entities decoded.

Semantics (HTML5-lite, matching what the tree builder consumes):
- comments ``<!-- -->``, doctype/``<!`` declarations, and processing
  instructions are skipped;
- raw-text elements (script/style) deliver their content as a single
  undecoded data event up to the matching close tag; title/textarea get
  entity decoding (RCDATA);
- character references are decoded in data and attribute values
  (``html.unescape`` — the stdlib *table*, not the stdlib tokenizer);
- a ``<`` that does not open a tag is literal text (spec's sane recovery).
"""

from __future__ import annotations

import re
from html import unescape

_ATTR_RE = re.compile(
    r"""([^\s/>=]+)(?:\s*=\s*("[^"]*"|'[^']*'|[^\s>]*))?""",
)
_TAGNAME_RE = re.compile(r"[a-zA-Z][a-zA-Z0-9:-]*")

RAWTEXT = frozenset(("script", "style"))
RCDATA = frozenset(("title", "textarea"))

# Attribute-string parse memo: crawl corpora repeat identical attr strings
# (class='nav', rel='stylesheet', …) across millions of tags; one dict hit
# replaces the regex scan + entity decode. Entries are read-only lists of
# tuples shared across tags (consumers copy into their own attr dicts).
# Bounded so adversarial unique-attr documents can't grow it unboundedly.
_ATTR_CACHE: dict[str, list] = {}
_ATTR_CACHE_MAX = 16384

# Case-insensitive close-tag scanners for raw-text elements, compiled once.
# Searching the ORIGINAL string keeps offsets valid — str.lower() can change
# length (e.g. 'İ' lowercases to 2 chars) and misalign every index after it,
# and re-lowering the whole document per <script> was O(n²).
_RAW_CLOSE = {t: re.compile(rf"</{t}", re.IGNORECASE) for t in RAWTEXT | RCDATA}


def _is_self_closing(inner: str) -> bool:
    """HTML5 trailing-slash semantics: '/' after whitespace, a quoted value,
    or a bare attribute name marks the tag self-closing, but a '/' inside an
    UNQUOTED attribute value is part of that value — <a href=http://x.com/a/>
    keeps the trailing slash (browser + stdlib html.parser behavior)."""
    if not inner.endswith("/"):
        return False
    body = inner[:-1]
    if not body or body[-1].isspace():
        # whitespace terminated any unquoted value before the '/' — it
        # stands alone as the self-closing marker (<img class=x /> — found
        # by the seeded tokenizer fuzz, r3)
        return True
    last = body.rsplit(None, 1)[-1]
    eq = last.find("=")
    if eq < 0:  # bare attr name (or nothing) before '/': self-closing
        return True
    after = last[eq + 1 : eq + 2]
    # quoted value already closed -> the '/' is a marker; unquoted value
    # (or dangling '=') swallows the '/' into the value
    return after in ('"', "'")


def tokenize(markup: str, handler) -> None:
    """Drive ``handler`` (``handle_starttag(tag, attrs_list)``,
    ``handle_startendtag``, ``handle_endtag``, ``handle_data``) over
    ``markup``. attrs_list is ``[(name, value_or_None), ...]`` like
    html.parser's."""
    n = len(markup)
    i = 0
    find = markup.find
    while i < n:
        lt = find("<", i)
        if lt < 0:
            text = markup[i:]
            if text:
                handler.handle_data(unescape(text) if "&" in text else text)
            break
        if lt > i:
            text = markup[i:lt]
            handler.handle_data(unescape(text) if "&" in text else text)
        # at '<'
        j = lt + 1
        if j >= n:
            handler.handle_data("<")
            break
        c = markup[j]
        if c == "!":
            if markup.startswith("!--", j):
                end = find("-->", j + 3)
                i = n if end < 0 else end + 3
            else:
                end = find(">", j)
                i = n if end < 0 else end + 1
            continue
        if c == "?":
            end = find(">", j)
            i = n if end < 0 else end + 1
            continue
        if c == "/":
            m = _TAGNAME_RE.match(markup, j + 1)
            if m is None:
                # bogus end tag: skip to '>'
                end = find(">", j)
                i = n if end < 0 else end + 1
                continue
            tag = m.group(0).lower()
            end = find(">", m.end())
            i = n if end < 0 else end + 1
            handler.handle_endtag(tag)
            continue
        m = _TAGNAME_RE.match(markup, j)
        if m is None:
            handler.handle_data("<")
            i = lt + 1
            continue
        tag = m.group(0).lower()
        end = find(">", m.end())
        if end < 0:
            i = n  # truncated tag at EOF: drop
            break
        inner = markup[m.end() : end]
        self_closing = _is_self_closing(inner)
        if self_closing:
            inner = inner[:-1]
        attrs: list[tuple[str, str | None]] = []
        if inner and not inner.isspace():
            attrs = _ATTR_CACHE.get(inner)
            if attrs is None:
                attrs = []
                for am in _ATTR_RE.finditer(inner):
                    name = am.group(1).lower()
                    val = am.group(2)
                    if val is not None:
                        if val[:1] in "\"'":
                            val = val[1:-1]
                        if "&" in val:
                            val = unescape(val)
                    attrs.append((name, val))
                if len(_ATTR_CACHE) < _ATTR_CACHE_MAX:
                    _ATTR_CACHE[inner] = attrs
        i = end + 1
        if self_closing:
            handler.handle_startendtag(tag, attrs)
            continue
        handler.handle_starttag(tag, attrs)
        if tag in RAWTEXT or tag in RCDATA:
            cm = _RAW_CLOSE[tag].search(markup, i)
            close = cm.start() if cm else -1
            raw = markup[i:] if close < 0 else markup[i:close]
            if raw:
                if tag in RCDATA and "&" in raw:
                    raw = unescape(raw)
                handler.handle_data(raw)
            if close < 0:
                break
            gt = find(">", close)
            i = n if gt < 0 else gt + 1
            handler.handle_endtag(tag)
