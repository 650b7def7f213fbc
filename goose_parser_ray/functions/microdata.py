"""Schema.org microdata extraction over the in-repo DOM stack.

Upstream context: goose-parser's rule engine reads text/attributes out of a
parsed DOM (SURVEY.md §2.1); structured-data scrape (microdata / RDFa-lite)
is the same stack pointed at the ``itemscope`` / ``itemtype`` / ``itemprop``
attribute vocabulary — the extraction op a web-scale corpus pipeline runs to
harvest product/article/recipe records alongside main text.

Semantics implemented (flattened W3C HTML-microdata subset, documented so
the SQL twin can state it in closed form):

- an element with ``itemscope`` and NO ``itemprop`` is a TOP-LEVEL item;
- an element with both ``itemscope`` and ``itemprop`` is a NESTED item: it
  contributes a row ``(owner_itemtype, itemprop, nested_itemtype)`` to the
  owning item, and its own subtree is walked as a new item;
- any other element with ``itemprop`` inside an item's subtree contributes
  ``(owner_itemtype, itemprop, value)`` where the value is tag-dependent:
  ``meta`` → ``content``, ``a``/``link``/``area`` → ``href``, ``img`` and
  media tags → ``src``, ``time`` → ``datetime`` (text fallback), ``data`` →
  ``value``, anything else → whitespace-normalized text content;
- property elements' descendants keep being scanned (itemprops may nest).

Rows are emitted in document order.
"""

from __future__ import annotations

from goose_parser_ray.html.dom import Element

_HREF_TAGS = ("a", "link", "area")
_SRC_TAGS = ("img", "audio", "video", "source", "iframe", "embed", "track")


def _prop_value(el: Element) -> str:
    t = el.tag
    if t == "meta":
        return el.attrs.get("content", "")
    if t in _HREF_TAGS:
        return el.attrs.get("href", "")
    if t in _SRC_TAGS:
        return el.attrs.get("src", "")
    if t == "time":
        return el.attrs.get("datetime") or " ".join(el.text().split())
    if t == "data":
        return el.attrs.get("value", "")
    return " ".join(el.text().split())


def extract_microdata(root: Element) -> list[tuple[str, str, str]]:
    """Walk the tree once; return ``(item_type, prop, value)`` rows in
    document order (see module docstring for the exact contract)."""
    rows: list[tuple[str, str, str]] = []

    def walk(el: Element, owner_type: str | None) -> None:
        prop = el.attrs.get("itemprop")
        if "itemscope" in el.attrs:
            itype = el.attrs.get("itemtype", "")
            if prop is not None and owner_type is not None:
                rows.append((owner_type, prop, itype))
            for c in el.child_elements():
                walk(c, itype)
            return
        if prop is not None and owner_type is not None:
            rows.append((owner_type, prop, _prop_value(el)))
        for c in el.child_elements():
            walk(c, owner_type)

    walk(root, None)
    return rows
