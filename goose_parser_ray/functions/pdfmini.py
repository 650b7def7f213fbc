"""Minimal PDF writer + text extractor — REAL PDF bytes, no external library.

Fills the north rule's "PDF/layout parse" media branch with an actual codec
(the sandbox has no pdfminer/pypdf; zlib is stdlib): the writer emits a
well-formed single-page PDF (catalog → pages → page → FlateDecode'd content
stream + Type1 font, correct xref offsets), and the extractor parses the
object graph back — walks ``N 0 obj … endobj``, inflates ``/FlateDecode``
streams, and tokenizes the content stream's ``(…) Tj`` show-text operators
in order, unescaping string escapes (``\\( \\) \\\\ \\n \\r \\t`` + octal).

Scope is the text-extraction subset (one page, Tj strings) — enough for a
layout-text media branch over SYNTHESIZED corpus PDFs; a full-featured
parser (TJ arrays, encodings, multi-page kids trees) slots in behind the
same two functions. Round-trip + escape fuzz locked in tests/test_pdf.py;
output of the extractor over encoder bytes is verified against a DuckDB
closed-form twin end to end (queries.py:q_media_pdf).
"""

from __future__ import annotations

import re
import zlib


def _escape(s: str) -> bytes:
    out = s.encode("latin-1", errors="replace")
    out = out.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
    return out


def encode_pdf(lines: list[str], *, compress: bool = True) -> bytes:
    """Text lines → a valid single-page PDF (Helvetica 12pt, one Tj per
    line, top-down layout from y=720 in 14pt steps)."""
    parts = [b"BT /F1 12 Tf"]
    y = 720
    for ln in lines:
        parts.append(b"1 0 0 1 72 %d Tm (%s) Tj" % (y, _escape(ln)))
        y -= 14
    parts.append(b"ET")
    content = b"\n".join(parts)
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b" /Filter /FlateDecode"

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d%s >>\nstream\n%s\nendstream"
        % (len(content), filt, content),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    buf = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(buf))
        buf += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_at = len(buf)
    buf += b"xref\n0 %d\n" % (len(objs) + 1)
    buf += b"0000000000 65535 f \n"
    for off in offsets:
        buf += b"%010d 00000 n \n" % off
    buf += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(buf)


_STREAM_KW_RE = re.compile(rb">>\s*stream\r?\n")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)")
# show-text operators: `(s) Tj` and the kerned-array form
# `[(a) -120 (b)] TJ` (each array's strings concatenate into one line —
# the kern numbers are layout, not text)
_TJ_RE = re.compile(
    rb"\(((?:\\.|[^\\()])*)\)\s*Tj"
    rb"|\[((?:\((?:\\.|[^\\()])*\)|[-\d.\s])*)\]\s*TJ"
)
_STR_RE = re.compile(rb"\(((?:\\.|[^\\()])*)\)")
_OCTAL_RE = re.compile(rb"\\([0-7]{1,3})")

_SIMPLE_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape(raw: bytes) -> str:
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i : i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        m = _OCTAL_RE.match(raw, i)
        if m:
            out.append(int(m.group(1), 8) & 0xFF)
            i = m.end()
            continue
        nxt = raw[i + 1 : i + 2]
        out += _SIMPLE_ESCAPES.get(nxt, nxt)
        i += 2
    return out.decode("latin-1")


def _dict_start(payload: bytes, end: int) -> int:
    """Balanced backward scan: index of the ``<<`` opening the dict whose
    closing ``>>`` sits at ``end``."""
    # ``end`` is exclusive of the closing ``>>`` pair's last byte; start
    # scanning just BEFORE that pair (it is already counted via depth=1)
    depth, i = 1, end - 4
    while i >= 0:
        pair = payload[i : i + 2]
        if pair == b">>":
            depth += 1
            i -= 2
        elif pair == b"<<":
            depth -= 1
            if depth == 0:
                return i
            i -= 2
        else:
            i -= 1
    raise ValueError("unbalanced dict in PDF payload")


def extract_pdf_text(payload: bytes) -> list[str]:
    """PDF bytes → show-text strings in content-stream order. Streams are
    sliced by their declared ``/Length`` (NEVER delimiter-scanned —
    compressed bytes may contain ``endstream``/``endobj`` sequences, the
    classic naive-parser corruption); FlateDecode streams inflate via zlib.
    Rejects non-PDF payloads explicitly."""
    if not payload.startswith(b"%PDF-"):
        raise ValueError("not a PDF payload")
    lines: list[str] = []
    pos = 0
    while True:
        m = _STREAM_KW_RE.search(payload, pos)
        if not m:
            break
        head = payload[_dict_start(payload, m.start() + 2) : m.start() + 2]
        lm = _LENGTH_RE.search(head)
        if lm is None:
            raise ValueError("stream without /Length")
        n = int(lm.group(1))
        data = payload[m.end() : m.end() + n]
        if b"/FlateDecode" in head:
            try:
                data = zlib.decompress(data)
            except zlib.error as e:  # corrupt/truncated stream bytes
                raise ValueError(f"bad FlateDecode stream: {e}") from e
        for tj, tj_arr in _TJ_RE.findall(data):
            if tj or not tj_arr:
                lines.append(_unescape(tj))
            else:
                lines.append(
                    "".join(_unescape(s) for s in _STR_RE.findall(tj_arr))
                )
        pos = m.end() + n
    return lines


_OBJ_HEAD_RE = re.compile(rb"(\d+) 0 obj\b")
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:\s*\d+\s+0\s+R)*)\s*\]")
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+0\s+R")
_REF_RE = re.compile(rb"(\d+)\s+0\s+R")


def encode_pdf_pages(pages: "list[list[str]]", *, compress: bool = True) -> bytes:
    """Text lines per page → a valid MULTI-page PDF: one /Page object and
    one content stream per page, a /Pages node whose /Kids array fixes
    the page ORDER, correct xref offsets. Object layout: 1 catalog,
    2 pages, then (page, content) pairs at (3+2p, 4+2p), font last."""
    if not pages:
        raise ValueError("pdf: need at least one page")
    n_pages = len(pages)
    font_id = 3 + 2 * n_pages
    kids = b" ".join(b"%d 0 R" % (3 + 2 * p) for p in range(n_pages))
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, n_pages),
    ]
    for p, lines in enumerate(pages):
        page_id = 3 + 2 * p
        content_id = 4 + 2 * p
        objs.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents %d 0 R /Resources << /Font << /F1 %d 0 R >> >> >>"
            % (content_id, font_id)
        )
        parts = [b"BT /F1 12 Tf"]
        y = 720
        for ln in lines:
            parts.append(b"1 0 0 1 72 %d Tm (%s) Tj" % (y, _escape(ln)))
            y -= 14
        parts.append(b"ET")
        content = b"\n".join(parts)
        filt = b""
        if compress:
            content = zlib.compress(content)
            filt = b" /Filter /FlateDecode"
        objs.append(
            b"<< /Length %d%s >>\nstream\n%s\nendstream"
            % (len(content), filt, content)
        )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    buf = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(buf))
        buf += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_at = len(buf)
    buf += b"xref\n0 %d\n" % (len(objs) + 1)
    buf += b"0000000000 65535 f \n"
    for off in offsets:
        buf += b"%010d 00000 n \n" % off
    buf += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(buf)


def extract_pdf_pages(payload: bytes) -> "list[list[str]]":
    """Multi-page PDF bytes → show-text strings PER PAGE, in /Kids order.
    The object walk is sequential with stream SKIPPING by declared
    /Length (a "N 0 obj" byte sequence inside compressed stream data can
    never start a phantom object), so object headers are only honored
    between real objects. Raises ValueError on structural damage."""
    if not payload.startswith(b"%PDF-"):
        raise ValueError("not a PDF payload")
    # sequential object walk: id -> (dict head, stream bytes or None)
    objects: "dict[int, tuple[bytes, bytes | None]]" = {}
    pos = 0
    while True:
        m = _OBJ_HEAD_RE.search(payload, pos)
        if not m:
            break
        oid = int(m.group(1))
        sm = _STREAM_KW_RE.search(payload, m.end())
        em = payload.find(b"endobj", m.end())
        if em == -1:
            raise ValueError("pdf: object without endobj")
        if sm is not None and sm.start() < em:
            head = payload[_dict_start(payload, sm.start() + 2) : sm.start() + 2]
            lm = _LENGTH_RE.search(head)
            if lm is None:
                raise ValueError("stream without /Length")
            n = int(lm.group(1))
            data = payload[sm.end() : sm.end() + n]
            if len(data) < n:
                raise ValueError("pdf: truncated stream")
            objects[oid] = (head, data)
            em = payload.find(b"endobj", sm.end() + n)
            if em == -1:
                raise ValueError("pdf: object without endobj")
        else:
            objects[oid] = (payload[m.end() : em], None)
        pos = em + 6
    pages_nodes = [
        (oid, head)
        for oid, (head, st) in objects.items()
        if st is None and b"/Type /Pages" in head
    ]
    if len(pages_nodes) != 1:
        raise ValueError("pdf: expected exactly one /Pages node")
    km = _KIDS_RE.search(pages_nodes[0][1])
    if km is None:
        raise ValueError("pdf: /Pages without /Kids")
    kid_ids = [int(x) for x in _REF_RE.findall(km.group(1))]
    if not kid_ids:
        raise ValueError("pdf: empty /Kids")
    out: "list[list[str]]" = []
    for kid in kid_ids:
        if kid not in objects or objects[kid][1] is not None:
            raise ValueError("pdf: missing page object")
        cm = _CONTENTS_RE.search(objects[kid][0])
        if cm is None:
            raise ValueError("pdf: page without /Contents")
        cid = int(cm.group(1))
        if cid not in objects or objects[cid][1] is None:
            raise ValueError("pdf: missing content stream")
        head, data = objects[cid]
        if b"/FlateDecode" in head:
            try:
                data = zlib.decompress(data)
            except zlib.error as e:
                raise ValueError(f"bad FlateDecode stream: {e}") from e
        lines = []
        for tj, tj_arr in _TJ_RE.findall(data):
            if tj or not tj_arr:
                lines.append(_unescape(tj))
            else:
                lines.append(
                    "".join(_unescape(s) for s in _STR_RE.findall(tj_arr))
                )
        out.append(lines)
    return out
