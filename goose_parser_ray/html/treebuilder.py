"""HTML5 tree builder (from scratch) — the subset static rule evaluation needs.

Implements the tree-construction behaviors the conformance fixtures exercise
(SURVEY.md §7.2, §7.6-1): html/body scaffolding, void elements, implied end
tags (p, li, dd/dt, td/th/tr, thead/tbody/tfoot, option), implied ``tbody``
insertion in tables, unclosed-tag recovery (pop-until-match), entity decoding
(via the tokenizer), raw-text elements (script/style).

Formatting elements follow a simplified adoption agency: an active-
formatting-elements list with reconstruction (``<b><i></b>x</i>`` puts
``x`` in a reconstructed ``<i>``, matching browsers), markers at td/th/
caption boundaries, and the Noah's-ark cap (≤3 identical entries). The
simplification vs full WHATWG AAA: no furthest-block re-parenting — the
mis-nested CLOSE is a pop, reconstruction happens on the next insertion.

Deliberate deviations from the full WHATWG algorithm (documented per
SURVEY.md §7.6-1 — fixtures must not rely on these):

- No quirks-mode distinctions; no foster-parenting of table-adjacent text.
- ``<head>`` content is kept only when an explicit ``<head>`` tag is present;
  otherwise head-only tags (title/meta/...) land in an implied ``head``.

Tokenization is the from-scratch scanner in
:mod:`goose_parser_ray.html.tokenizer` (it replaced stdlib html.parser for
speed — see ``goose_parser_ray/html/__init__.py`` for the provenance note).
"""

from __future__ import annotations

from goose_parser_ray.html.dom import Document, Element, Text
from goose_parser_ray.html.tokenizer import tokenize

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

HEAD_ONLY = frozenset("title meta link style base".split())

# Start tags that implicitly close an open <p> (WHATWG "in body" subset).
P_CLOSERS = frozenset(
    (
        "address article aside blockquote center details dialog dir div dl "
        "fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 header hr "
        "listing main menu nav ol p pre section summary table ul li dd dt "
        "plaintext xmp"
    ).split()
)

# tag -> set of open tags that a new instance implicitly closes (nearest first)
SIBLING_CLOSERS: dict[str, frozenset[str]] = {
    "li": frozenset(["li"]),
    "dd": frozenset(["dd", "dt"]),
    "dt": frozenset(["dd", "dt"]),
    "option": frozenset(["option"]),
    "optgroup": frozenset(["option", "optgroup"]),
    "tr": frozenset(["tr", "td", "th"]),
    "td": frozenset(["td", "th"]),
    "th": frozenset(["td", "th"]),
    "thead": frozenset(["thead", "tbody", "tfoot", "tr", "td", "th"]),
    "tbody": frozenset(["thead", "tbody", "tfoot", "tr", "td", "th"]),
    "tfoot": frozenset(["thead", "tbody", "tfoot", "tr", "td", "th"]),
    "colgroup": frozenset(["colgroup"]),
}

# Implied-end-tag scope limits: never auto-close past these containers.
SCOPE_BOUNDARIES = frozenset(
    "html body table tbody thead tfoot tr td th ul ol dl select".split()
)

TABLE_SECTIONS = frozenset(["thead", "tbody", "tfoot"])

# WHATWG formatting elements (subject to the adoption agency).
FORMATTING = frozenset(
    "a b big code em font i nobr s small strike strong tt u".split()
)

# Start tags that do NOT reconstruct active formatting before insertion
# (table structure + document scaffolding; spec "in table" modes).
_NO_RECONSTRUCT = frozenset(
    "table thead tbody tfoot tr td th caption colgroup col option optgroup "
    "html head body".split()
)

# Elements that push a marker onto the active-formatting list (spec subset).
_FMT_MARKERS = frozenset(["td", "th", "caption"])

_MARKER = object()


class _Builder:
    """Tree-construction event handler driven by
    :func:`goose_parser_ray.html.tokenizer.tokenize`."""

    def __init__(self) -> None:
        self.document = Document()
        self._order = 1
        self.html = self._new("html")
        self.document.append(self.html)
        self.head: Element | None = None
        self.body: Element | None = None
        # open-element stack; document + html always at the bottom
        self.stack: list[Element] = [self.document, self.html]
        # active formatting elements: dicts {tag, attrs, el} and _MARKER
        self.active_fmt: list = []

    # -- helpers -----------------------------------------------------------
    def _new(self, tag: str, attrs: dict[str, str] | None = None) -> Element:
        el = Element(tag, attrs)
        el.order = self._order
        self._order += 1
        return el

    @property
    def top(self) -> Element:
        return self.stack[-1]

    def _pop(self) -> Element:
        el = self.stack.pop()
        el._open = False
        return el

    def _push(self, el: Element) -> None:
        el._open = True
        self.stack.append(el)

    def _ensure_body(self) -> Element:
        if self.body is None:
            self.body = self._new("body")
            self.html.append(self.body)
        if len(self.stack) == 2:  # only document+html open
            self._push(self.body)
        return self.body

    def _ensure_head(self) -> Element:
        if self.head is None:
            self.head = self._new("head")
            # head precedes body inside html
            self.html.children.insert(0, self.head)
            self.head.parent = self.html
        return self.head

    def _open_tags(self) -> list[str]:
        return [e.tag for e in self.stack]

    def _close_implied(self, closers: frozenset[str]) -> None:
        """Pop open elements whose tag is in ``closers``, stopping at the
        nearest scope boundary."""
        while len(self.stack) > 2:
            tag = self.top.tag
            if tag in closers:
                self._pop()
            elif tag in SCOPE_BOUNDARIES:
                break
            else:
                break

    def _close_p(self) -> None:
        # close an open <p> if one is open within the current scope
        for el in reversed(self.stack):
            if el.tag == "p":
                while self._pop() is not el:
                    pass
                return
            if el.tag in SCOPE_BOUNDARIES:
                return

    def _nearest_open(self, tags: frozenset[str]) -> Element | None:
        for el in reversed(self.stack):
            if el.tag in tags:
                return el
        return None

    # -- active formatting elements (simplified adoption agency) -----------
    def _push_formatting(self, tag: str, attrs: dict, el: Element) -> None:
        # Noah's-ark clause: at most 3 identical (tag, attrs) entries since
        # the last marker — bounds reconstruction depth on <b><b><b>… spam
        same = [
            e
            for e in self._entries_after_marker()
            if e["tag"] == tag and e["attrs"] == attrs
        ]
        if len(same) >= 3:
            self.active_fmt.remove(same[0])
        self.active_fmt.append({"tag": tag, "attrs": attrs, "el": el})

    def _entries_after_marker(self) -> list:
        out: list = []
        for e in self.active_fmt:
            if e is _MARKER:
                out = []
            else:
                out.append(e)
        return out

    def _remove_formatting_entry(self, tag: str) -> bool:
        """Drop the most recent active entry for ``tag`` (not past a
        marker). Returns True when one existed."""
        for i in range(len(self.active_fmt) - 1, -1, -1):
            e = self.active_fmt[i]
            if e is _MARKER:
                return False
            if e["tag"] == tag:
                del self.active_fmt[i]
                return True
        return False

    def _clear_formatting_to_marker(self) -> None:
        while self.active_fmt:
            if self.active_fmt.pop() is _MARKER:
                return

    def _reconstruct_formatting(self) -> None:
        """Re-open active formatting elements that were implicitly closed
        (spec 'reconstruct the active formatting elements', minus the
        furthest-block machinery)."""
        af = self.active_fmt
        if not af:
            return
        last = af[-1]
        # stack discipline: later entries nest deeper, so if the LAST entry
        # is still open nothing needs reconstruction — O(1) common case
        if last is _MARKER or last["el"]._open:
            return
        if self.top.tag in ("table", "thead", "tbody", "tfoot", "tr"):
            return  # no foster parenting: don't re-open formatting in tables
        # walk back to the last marker or last still-open entry
        start = 0
        for i in range(len(af) - 1, -1, -1):
            e = af[i]
            if e is _MARKER or e["el"]._open:
                start = i + 1
                break
            start = i
        for i in range(start, len(self.active_fmt)):
            e = self.active_fmt[i]
            el = self._new(e["tag"], dict(e["attrs"]))
            self.top.append(el)
            self._push(el)
            e["el"] = el

    # -- tokenizer callbacks ----------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        attr_map = {k: (v if v is not None else "") for k, v in attrs}

        if tag == "html":
            self.html.attrs.update(attr_map)
            return
        if tag == "head":
            head = self._ensure_head()
            head.attrs.update(attr_map)
            self._push(head)
            return
        if tag == "body":
            body = self._ensure_body()
            body.attrs.update(attr_map)
            if self.top is not body:
                # re-point stack at body (drop any stray head context)
                while len(self.stack) > 2:
                    self._pop()
                self._push(body)
            return

        # head-only tags before any body content go into an implied head
        in_head = self.head is not None and self.head in self.stack
        if tag in HEAD_ONLY and self.body is None and not in_head:
            parent: Element = self._ensure_head()
            el = self._new(tag, attr_map)
            parent.append(el)
            if tag not in VOID_ELEMENTS and tag != "style":
                pass  # title/style content handled as data with head on stack
            if tag in ("title", "style"):
                self._push(el)
            return

        if not in_head and self.body is None:
            self._ensure_body()
        elif in_head and tag not in HEAD_ONLY and tag not in ("script",):
            # body content while head open: close head, open body
            while len(self.stack) > 2:
                self._pop()
            self._ensure_body()
        if len(self.stack) == 2:
            self._ensure_body()

        # --- implied end tags -------------------------------------------
        if tag == "a" and self.active_fmt and any(
            e is not _MARKER and e["tag"] == "a"
            for e in self._entries_after_marker()
        ):
            # spec: a start tag 'a' with an active 'a' runs the adoption
            # agency for it first (implicit </a>)
            self.handle_endtag("a")
        if tag in P_CLOSERS:
            self._close_p()
        closers = SIBLING_CLOSERS.get(tag)
        if closers:
            self._close_implied(closers)

        # --- implied table structure -------------------------------------
        if tag == "tr":
            table = self._nearest_open(frozenset(["table"]))
            if table is not None and self.top.tag == "table":
                tbody = self._new("tbody")
                self.top.append(tbody)
                self._push(tbody)
        elif tag in ("td", "th"):
            if self.top.tag in ("table",) or self.top.tag in TABLE_SECTIONS:
                if self.top.tag == "table":
                    tbody = self._new("tbody")
                    self.top.append(tbody)
                    self._push(tbody)
                tr = self._new("tr")
                self.top.append(tr)
                self._push(tr)

        # spec: block-level starts (the p-closing set) insert WITHOUT
        # reconstructing; formatting re-opens inside them at the next
        # phrasing insertion instead
        if tag not in _NO_RECONSTRUCT and tag not in P_CLOSERS:
            self._reconstruct_formatting()
        el = self._new(tag, attr_map)
        self.top.append(el)
        if tag not in VOID_ELEMENTS:
            self._push(el)
        if tag in FORMATTING:
            self._push_formatting(tag, attr_map, el)
        elif tag in _FMT_MARKERS:
            self.active_fmt.append(_MARKER)

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in VOID_ELEMENTS:
            self.handle_starttag(tag, attrs)
        else:
            # <div/> is parsed as a start tag by browsers; mirror that
            self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag: str) -> None:
        if tag in VOID_ELEMENTS:
            return
        if tag == "html":
            return
        if tag in ("head", "body"):
            while len(self.stack) > 2:
                self._pop()
            return
        if tag in FORMATTING:
            # adoption agency (simplified): the entry leaves the active
            # list; formatting elements popped past below STAY in the list
            # and reconstruct at the next insertion point
            self._remove_formatting_entry(tag)
        # pop-until-match recovery: find nearest open element with this tag
        target = None
        for el in reversed(self.stack[2:]):
            if el.tag == tag:
                target = el
                break
        if target is None:
            return  # stray end tag: ignore
        while self.stack and self.stack[-1] is not target:
            self._pop()
        if self.stack:
            self._pop()
        if tag in _FMT_MARKERS:
            self._clear_formatting_to_marker()

    def handle_data(self, data: str) -> None:
        if not data:
            return
        if len(self.stack) == 2 or (self.body is None and self.head is None):
            if data.strip() == "":
                return  # inter-tag whitespace before any content
            self._ensure_body()
        elif len(self.stack) == 2:
            self._ensure_body()
        in_head = self.head is not None and self.head in self.stack
        if not in_head and data.strip():
            self._reconstruct_formatting()
        self.top.append(Text(data))

def parse_html(markup: str) -> Document:
    """Parse an HTML fragment or document into a :class:`Document`.

    One call per document row — invoked inside the extract actor
    (SURVEY.md §3.4 stage 4), never on the driver for bulk data.
    """
    builder = _Builder()
    tokenize(markup, builder)
    return builder.document
