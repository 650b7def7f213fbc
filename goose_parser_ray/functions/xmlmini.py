"""Minimal strict XML parser — the sitemap / feed ingestion surface.

Sitemaps (sitemaps.org protocol) are the other half of the crawl-discovery
loop next to robots.txt (RFC 9309, ``queries/text_media.py:q_robots_rules``):
a curation pipeline reads them to seed and refresh the frontier. They are
XML, not HTML — drove a dedicated parser rather than abusing the HTML5 tree
builder, whose error-recovery rules (implied tags, foster parenting) are
WRONG for XML, where malformed input must be rejected, not repaired.

Supported: prolog (``<?xml ...?>``), comments, elements with attributes
(double- or single-quoted), self-closing tags, character data, and the five
predefined entities plus decimal/hex character references. NOT supported
(raises ``XmlError``): mismatched/unclosed tags, CDATA, DOCTYPE, processing
instructions outside the prolog — fail-loud is the correct posture for a
machine-generated format, and the poison-document quarantine in the
extraction pipeline (SURVEY §7.5) catches raisers without killing the run.

Scale shape: pure per-document scan, map-only; the sitemap query runs it in
a plain ``map_batches`` stage (parser state is per-call, no actor needed).
"""

from __future__ import annotations


class XmlError(ValueError):
    """Malformed XML (strict parse — no HTML-style recovery)."""


class XmlElement:
    __slots__ = ("tag", "attrs", "children", "_text")

    def __init__(self, tag: str, attrs: dict[str, str]) -> None:
        self.tag = tag
        self.attrs = attrs
        self.children: list[XmlElement] = []
        self._text: list[str] = []

    @property
    def text(self) -> str:
        """Concatenated direct character data (sitemap leaves hold one run)."""
        return "".join(self._text)

    def find_all(self, tag: str) -> list["XmlElement"]:
        return [c for c in self.children if c.tag == tag]

    def first(self, tag: str) -> "XmlElement | None":
        for c in self.children:
            if c.tag == tag:
                return c
        return None


_ENTITIES = {"lt": "<", "gt": ">", "amp": "&", "apos": "'", "quot": '"'}
_NAME_END = set(" \t\r\n/>=")


def _decode_refs(s: str) -> str:
    if "&" not in s:
        return s
    out: list[str] = []
    pos = 0
    while True:
        amp = s.find("&", pos)
        if amp < 0:
            out.append(s[pos:])
            return "".join(out)
        out.append(s[pos:amp])
        semi = s.find(";", amp + 1)
        if semi < 0 or semi - amp > 12:
            raise XmlError(f"bare '&' at offset {amp}")
        ref = s[amp + 1 : semi]
        if ref.startswith("#x") or ref.startswith("#X"):
            out.append(chr(int(ref[2:], 16)))
        elif ref.startswith("#"):
            out.append(chr(int(ref[1:])))
        elif ref in _ENTITIES:
            out.append(_ENTITIES[ref])
        else:
            raise XmlError(f"unknown entity &{ref};")
        pos = semi + 1


def parse_xml(doc: str) -> XmlElement:
    """Parse a strict-subset XML document, returning the root element."""
    n = len(doc)
    pos = 0
    root: XmlElement | None = None
    stack: list[XmlElement] = []

    def skip_misc(pos: int) -> int:
        while pos < n:
            while pos < n and doc[pos] in " \t\r\n":
                pos += 1
            if doc.startswith("<?", pos):
                end = doc.find("?>", pos + 2)
                if end < 0:
                    raise XmlError("unterminated processing instruction")
                pos = end + 2
            elif doc.startswith("<!--", pos):
                end = doc.find("-->", pos + 4)
                if end < 0:
                    raise XmlError("unterminated comment")
                pos = end + 3
            else:
                return pos
        return pos

    pos = skip_misc(pos)
    while pos < n:
        if doc[pos] == "<":
            if doc.startswith("<!--", pos):
                end = doc.find("-->", pos + 4)
                if end < 0:
                    raise XmlError("unterminated comment")
                pos = end + 3
                continue
            if doc.startswith("</", pos):
                end = doc.find(">", pos + 2)
                if end < 0:
                    raise XmlError("unterminated end tag")
                tag = doc[pos + 2 : end].strip()
                if not stack:
                    raise XmlError(f"stray end tag </{tag}>")
                if stack[-1].tag != tag:
                    raise XmlError(
                        f"mismatched end tag </{tag}> (open: <{stack[-1].tag}>)"
                    )
                stack.pop()
                pos = end + 1
                if not stack:
                    pos = skip_misc(pos)
                    if pos < n:
                        raise XmlError("content after document element")
                    return root  # type: ignore[return-value]
                continue
            if doc.startswith("<!", pos) or doc.startswith("<?", pos):
                raise XmlError(f"unsupported construct at offset {pos}")
            # start tag
            tpos = pos + 1
            npos = tpos
            while npos < n and doc[npos] not in _NAME_END:
                npos += 1
            tag = doc[tpos:npos]
            if not tag:
                raise XmlError(f"empty tag name at offset {pos}")
            attrs: dict[str, str] = {}
            apos = npos
            self_close = False
            while True:
                while apos < n and doc[apos] in " \t\r\n":
                    apos += 1
                if apos >= n:
                    raise XmlError(f"unterminated start tag <{tag}>")
                if doc[apos] == ">":
                    apos += 1
                    break
                if doc.startswith("/>", apos):
                    self_close = True
                    apos += 2
                    break
                anend = apos
                while anend < n and doc[anend] not in _NAME_END:
                    anend += 1
                aname = doc[apos:anend]
                if not aname or anend >= n or doc[anend] != "=":
                    raise XmlError(f"malformed attribute in <{tag}>")
                if anend + 1 >= n or doc[anend + 1] not in "\"'":
                    raise XmlError(f"unquoted attribute value in <{tag}>")
                quote = doc[anend + 1]
                vend = doc.find(quote, anend + 2)
                if vend < 0:
                    raise XmlError(f"unterminated attribute value in <{tag}>")
                attrs[aname] = _decode_refs(doc[anend + 2 : vend])
                apos = vend + 1
            el = XmlElement(tag, attrs)
            if stack:
                stack[-1].children.append(el)
            elif root is None:
                root = el
            else:
                raise XmlError("multiple document elements")
            if not self_close:
                stack.append(el)
            elif not stack:
                pos = skip_misc(apos)
                if pos < n:
                    raise XmlError("content after document element")
                return root
            pos = apos
            continue
        # character data
        end = doc.find("<", pos)
        if end < 0:
            end = n
        chunk = doc[pos:end]
        if stack:
            stack[-1]._text.append(_decode_refs(chunk))
        elif chunk.strip():
            raise XmlError("character data outside document element")
        pos = end
    if stack:
        raise XmlError(f"unclosed element <{stack[-1].tag}>")
    if root is None:
        raise XmlError("no document element")
    return root


def parse_sitemap(doc: str) -> list[dict[str, str]]:
    """Parse a sitemaps.org ``<urlset>`` document → [{"loc", "lastmod"}, ...]
    in document order (lastmod "" when absent). Raises ``XmlError`` on
    malformed XML or a non-urlset root."""
    root = parse_xml(doc)
    if root.tag != "urlset":
        raise XmlError(f"expected <urlset> root, got <{root.tag}>")
    out: list[dict[str, str]] = []
    for url in root.find_all("url"):
        loc = url.first("loc")
        if loc is None:
            raise XmlError("<url> without <loc>")
        lastmod = url.first("lastmod")
        out.append(
            {
                "loc": loc.text.strip(),
                "lastmod": lastmod.text.strip() if lastmod is not None else "",
            }
        )
    return out


def parse_rss(doc: str) -> list[dict[str, str]]:
    """Parse an RSS 2.0 feed → [{"title", "link", "pubdate"}, ...] in
    document order (missing leaves → ""). Raises ``XmlError`` on malformed
    XML, a non-rss root, or a missing <channel> — feeds are the other
    machine-generated crawl-discovery format next to sitemaps, same
    fail-loud posture."""
    root = parse_xml(doc)
    if root.tag != "rss":
        raise XmlError(f"expected <rss> root, got <{root.tag}>")
    channel = root.first("channel")
    if channel is None:
        raise XmlError("<rss> without <channel>")
    out: list[dict[str, str]] = []
    for item in channel.find_all("item"):
        def leaf(tag: str) -> str:
            el = item.first(tag)
            return el.text.strip() if el is not None else ""
        out.append(
            {"title": leaf("title"), "link": leaf("link"), "pubdate": leaf("pubDate")}
        )
    return out


def parse_atom(doc: str) -> list[dict[str, str]]:
    """Parse an Atom 1.0 feed → [{"title", "href", "updated"}, ...] in
    document order. Unlike RSS the entry link lives in an ATTRIBUTE
    (``<link href="..."/>``, usually self-closing) — the alternate-rel
    link wins, else the first link. Raises ``XmlError`` on malformed XML
    or a non-feed root."""
    root = parse_xml(doc)
    if root.tag != "feed":
        raise XmlError(f"expected <feed> root, got <{root.tag}>")
    out: list[dict[str, str]] = []
    for entry in root.find_all("entry"):
        title = entry.first("title")
        updated = entry.first("updated")
        href = ""
        links = entry.find_all("link")
        for ln in links:
            if ln.attrs.get("rel", "alternate") == "alternate":
                href = ln.attrs.get("href", "")
                break
        else:
            if links:
                href = links[0].attrs.get("href", "")
        out.append(
            {
                "title": title.text.strip() if title is not None else "",
                "href": href,
                "updated": updated.text.strip() if updated is not None else "",
            }
        )
    return out
