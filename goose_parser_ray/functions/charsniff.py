"""HTML5 encoding sniffing — BOM check + the `prescan a byte stream` algorithm.

The step every real web-curation pipeline runs BEFORE it can decode a fetched
page: WHATWG HTML §13.2.3.2 (upstream context: goose-parser receives pages
already decoded by the browser environment — SURVEY.md §2.5 notes the engine
must own fetch-adjacent concerns itself; this is the decode-side gate for the
WARC/byte-payload ingestion path in ``sources/warc.py``).

Implemented faithfully for the subset that matters on real crawls:

- byte-order marks win outright (``EF BB BF`` → utf-8, ``FF FE`` → utf-16le,
  ``FE FF`` → utf-16be);
- else the first 1024 bytes are prescanned: comments are skipped to ``-->``,
  ``<!``/``</``/``<?`` constructs are skipped to ``>``, ordinary tags have
  their attributes consumed with the spec's `get an attribute` routine (so a
  ``charset=`` inside an unrelated attribute VALUE never matches), and a
  ``<meta>`` yields a candidate from its ``charset`` attribute or, with an
  ``http-equiv=content-type`` pragma, from ``content="...; charset=..."``;
- the candidate label resolves through a WHATWG-label subset (``iso-8859-1``
  / ``latin1`` / ``ascii`` are windows-1252 aliases), a declared ``utf-16``
  is rewritten to utf-8 and ``x-user-defined`` to windows-1252 per the spec's
  meta post-processing;
- no BOM and no declaration inside the window → windows-1252 (the spec's
  conservative default for content-sniffing pipelines).

Scale shape: pure per-document byte scan over ≤1024 bytes, map-only (no
shuffle); the query wrapper runs it as a plain ``map_batches`` stage.
"""

from __future__ import annotations

_WS = b"\t\n\x0c\r "

# WHATWG Encoding-standard label table (the subset seen on real crawls).
_LABELS = {
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "unicode-1-1-utf-8": "utf-8",
    "utf-16": "utf-16le",
    "utf-16le": "utf-16le",
    "utf-16be": "utf-16be",
    "iso-8859-1": "windows-1252",
    "iso8859-1": "windows-1252",
    "latin1": "windows-1252",
    "l1": "windows-1252",
    "ascii": "windows-1252",
    "us-ascii": "windows-1252",
    "windows-1252": "windows-1252",
    "cp1252": "windows-1252",
    "windows-1250": "windows-1250",
    "windows-1251": "windows-1251",
    "cp1251": "windows-1251",
    "windows-1254": "windows-1254",
    "iso-8859-2": "iso-8859-2",
    "iso-8859-15": "iso-8859-15",
    "koi8-r": "koi8-r",
    "shift_jis": "shift_jis",
    "shift-jis": "shift_jis",
    "sjis": "shift_jis",
    "euc-jp": "euc-jp",
    "gbk": "gbk",
    "gb2312": "gbk",
    "big5": "big5",
    "euc-kr": "euc-kr",
    "x-user-defined": "x-user-defined",
}


def resolve_label(label: str) -> str | None:
    """WHATWG `get an encoding from a label` (subset): trim ASCII
    whitespace, lowercase, table lookup; None for unknown labels."""
    return _LABELS.get(label.strip("\t\n\x0c\r ").lower())


def _skip_ws(data: bytes, pos: int) -> int:
    n = len(data)
    while pos < n and data[pos] in _WS:
        pos += 1
    return pos


def _get_attribute(data: bytes, pos: int) -> tuple[str, str, int] | None:
    """Spec `get an attribute`: returns (name, value, new_pos) or None when
    positioned at the end of the tag. Names/values are ASCII-lowercased."""
    n = len(data)
    while pos < n and (data[pos] in _WS or data[pos] == 0x2F):  # ws or "/"
        pos += 1
    if pos >= n or data[pos] == 0x3E:  # ">"
        return None
    name = bytearray()
    value = bytearray()
    # attribute name
    while pos < n:
        b = data[pos]
        if b == 0x3D and name:  # "="
            pos += 1
            break
        if b in _WS:
            pos = _skip_ws(data, pos)
            if pos < n and data[pos] == 0x3D:
                pos += 1
                break
            return (name.decode("ascii", "replace"), "", pos)
        if b in (0x2F, 0x3E):  # "/" ">"
            return (name.decode("ascii", "replace"), "", pos)
        name.append(b + 0x20 if 0x41 <= b <= 0x5A else b)
        pos += 1
    else:
        return (name.decode("ascii", "replace"), "", pos)
    # attribute value
    pos = _skip_ws(data, pos)
    if pos < n and data[pos] in (0x22, 0x27):  # quoted
        quote = data[pos]
        pos += 1
        while pos < n and data[pos] != quote:
            b = data[pos]
            value.append(b + 0x20 if 0x41 <= b <= 0x5A else b)
            pos += 1
        pos += 1  # past the closing quote (or EOF)
    else:
        while pos < n and data[pos] not in _WS and data[pos] != 0x3E:
            b = data[pos]
            value.append(b + 0x20 if 0x41 <= b <= 0x5A else b)
            pos += 1
    return (name.decode("ascii", "replace"), value.decode("ascii", "replace"), pos)


def _charset_from_content(content: str) -> str | None:
    """Spec `extract a character encoding from a meta element` over the
    ``content="text/html; charset=..."`` pragma form."""
    low = content.lower()
    idx = low.find("charset")
    if idx < 0:
        return None
    pos = idx + len("charset")
    while pos < len(content) and content[pos] in "\t\n\x0c\r ":
        pos += 1
    if pos >= len(content) or content[pos] != "=":
        return None
    pos += 1
    while pos < len(content) and content[pos] in "\t\n\x0c\r ":
        pos += 1
    if pos >= len(content):
        return None
    if content[pos] in "\"'":
        quote = content[pos]
        end = content.find(quote, pos + 1)
        if end < 0:
            return None
        return content[pos + 1 : end]
    end = pos
    while end < len(content) and content[end] not in "\t\n\x0c\r ;":
        end += 1
    return content[pos:end]


def sniff_encoding(payload: bytes, scan_limit: int = 1024) -> tuple[str, str]:
    """(encoding, source) for an HTML byte payload.

    source ∈ {"bom", "meta", "default"} — the provenance a curation
    pipeline records alongside the decode decision.
    """
    if payload.startswith(b"\xef\xbb\xbf"):
        return "utf-8", "bom"
    if payload.startswith(b"\xfe\xff"):
        return "utf-16be", "bom"
    if payload.startswith(b"\xff\xfe"):
        return "utf-16le", "bom"

    data = payload[:scan_limit]
    n = len(data)
    pos = 0
    while pos < n:
        if data.startswith(b"<!--", pos):
            end = data.find(b"-->", pos + 2)
            if end < 0:
                break
            pos = end + 3
            continue
        if data[pos] != 0x3C:  # "<"
            pos += 1
            continue
        # "<meta" followed by whitespace or "/"
        if data[pos + 1 : pos + 5].lower() == b"meta" and pos + 5 < n and (
            data[pos + 5] in _WS or data[pos + 5] == 0x2F
        ):
            apos = pos + 5
            seen: set[str] = set()
            got_pragma = False
            need_pragma: bool | None = None
            charset: str | None = None
            while True:
                attr = _get_attribute(data, apos)
                if attr is None:
                    break
                name, value, apos = attr
                if name in seen:
                    continue
                seen.add(name)
                if name == "http-equiv":
                    if value == "content-type":
                        got_pragma = True
                elif name == "charset":
                    cand = resolve_label(value)
                    if cand is not None and charset is None:
                        charset = cand
                        need_pragma = False
                elif name == "content":
                    label = _charset_from_content(value)
                    if label is not None and charset is None:
                        cand = resolve_label(label)
                        if cand is not None:
                            charset = cand
                            need_pragma = True
            if charset is not None and (need_pragma is False or got_pragma):
                # meta post-processing: a declared utf-16 cannot be right
                # for a byte stream we just ASCII-scanned; x-user-defined
                # is the legacy single-byte family.
                if charset in ("utf-16le", "utf-16be"):
                    charset = "utf-8"
                if charset == "x-user-defined":
                    charset = "windows-1252"
                return charset, "meta"
            pos = apos
            continue
        nxt = data[pos + 1] if pos + 1 < n else 0
        if nxt in (0x21, 0x2F, 0x3F):  # "<!" "</" "<?"
            end = data.find(b">", pos + 2)
            if end < 0:
                break
            pos = end + 1
            continue
        if 0x41 <= nxt <= 0x5A or 0x61 <= nxt <= 0x7A:  # ordinary tag
            apos = pos + 1
            while apos < n and data[apos] not in _WS and data[apos] != 0x3E:
                apos += 1
            while True:
                attr = _get_attribute(data, apos)
                if attr is None:
                    break
                _, _, apos = attr
            pos = apos + 1
            continue
        pos += 1
    return "windows-1252", "default"


def charset_from_content_type(value: str) -> str | None:
    """Extract the charset parameter from a Content-Type header value
    (RFC 9110 parameter syntax: ``;``-separated, names case-insensitive,
    quoted-string values supported). Returns the RESOLVED encoding label
    or None when absent/unknown."""
    parts = value.split(";")
    for p in parts[1:]:
        if "=" not in p:
            continue
        name, _, val = p.partition("=")
        if name.strip().lower() != "charset":
            continue
        val = val.strip()
        if len(val) >= 2 and val[0] == '"' and val[-1] == '"':
            val = val[1:-1]
        return resolve_label(val)
    return None


def decide_encoding(
    content_type: str | None, payload: bytes, scan_limit: int = 1024
) -> tuple[str, str]:
    """The COMPLETE encoding decision a fetch pipeline makes (WHATWG
    encoding sniffing precedence): a byte-order mark wins outright; else
    the transport-layer charset (Content-Type header) is certain; else
    the meta prescan; else windows-1252. ``source`` ∈ {"bom", "header",
    "meta", "default"}."""
    if payload.startswith((b"\xef\xbb\xbf", b"\xfe\xff", b"\xff\xfe")):
        return sniff_encoding(payload, scan_limit)  # returns ("…", "bom")
    if content_type:
        enc = charset_from_content_type(content_type)
        if enc is not None:
            return enc, "header"
    return sniff_encoding(payload, scan_limit)
