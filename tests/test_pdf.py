"""Minimal PDF codec: round-trip, escape fuzz, compression variants, and
the actor's exact outputs."""

import numpy as np
import pyarrow as pa

from goose_parser_ray.functions.pdfmini import encode_pdf, extract_pdf_text


def test_roundtrip_compressed_and_raw():
    lines = ["hello world", "second line", ""]
    for compress in (True, False):
        payload = encode_pdf(lines, compress=compress)
        assert payload.startswith(b"%PDF-1.4")
        assert extract_pdf_text(payload) == lines


def test_escape_fuzz_roundtrip():
    rng = np.random.RandomState(3)
    alphabet = list("ab (xyz) \\ ()\\(")
    for _ in range(50):
        n = rng.randint(1, 5)
        lines = [
            "".join(rng.choice(alphabet, rng.randint(0, 30)))
            for _ in range(n)
        ]
        assert extract_pdf_text(encode_pdf(lines)) == lines


def test_rejects_non_pdf():
    try:
        extract_pdf_text(b"RIFF not a pdf")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_xref_offsets_are_correct():
    payload = encode_pdf(["x"])
    # the startxref pointer must land exactly on the xref keyword
    start = int(payload.rsplit(b"startxref\n", 1)[1].split(b"\n", 1)[0])
    assert payload[start : start + 4] == b"xref"
    # each xref entry must point at its "N 0 obj" header
    table = payload[start:].split(b"\n")
    entries = [ln for ln in table if ln.endswith(b" n ")]
    for i, ln in enumerate(entries, start=1):
        off = int(ln.split(b" ")[0])
        assert payload[off:].startswith(b"%d 0 obj" % i)


def test_pdf_text_actor_exact(ray_session):
    from goose_parser_ray.functions.multimodal import PdfTextActor

    t = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "payload": pa.array(
                [encode_pdf(["a b c d", "e f"])], pa.binary()
            ),
        }
    )
    out = PdfTextActor()(t)
    assert out["n_lines"][0].as_py() == 2
    assert out["extracted_text"][0].as_py() == "a b c d e f"
    assert out["n_chars"][0].as_py() == len("a b c d e f")


def test_stream_containing_delimiter_keywords():
    """Length-based stream slicing must survive payload text containing the
    'endstream'/'endobj' keywords (delimiter-scanning parsers corrupt
    here — the compressed-bytes variant of this broke the first cut)."""
    lines = ["fake endstream marker", "and endobj too", "xref startxref"]
    for compress in (True, False):
        assert extract_pdf_text(encode_pdf(lines, compress=compress)) == lines


def test_tj_array_operator():
    """Kerned-array show text `[(a) -120 (b)] TJ` — each array concatenates
    into one line, kern numbers dropped; mixes with plain Tj in order."""
    import zlib as _z

    content = (
        b"BT /F1 12 Tf\n"
        b"1 0 0 1 72 720 Tm [(Hel) -120 (lo \\(kerned\\))] TJ\n"
        b"1 0 0 1 72 706 Tm (plain line) Tj\n"
        b"ET"
    )
    payload = b"%PDF-1.4\n1 0 obj\n" + (
        b"<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (len(content), content)
    )
    assert extract_pdf_text(payload) == ["Hello (kerned)", "plain line"]


def test_mutation_fuzz_never_crashes_uncontrolled():
    """Any single-byte mutation of a valid PDF either still extracts (the
    mutation hit slack space or string content) or raises ValueError —
    never another exception type, never a hang (r3 VERDICT item 7,
    mirroring test_pngmini's mutation fuzz). Targets include the xref
    table, /Length digits, and compressed stream bytes."""
    rng = np.random.default_rng(7)
    good = bytearray(
        encode_pdf(["mutation fuzz target", "with (escapes) \\ too", "x" * 80])
    )
    for _ in range(400):
        b = bytearray(good)
        pos = int(rng.integers(0, len(b)))
        b[pos] ^= int(rng.integers(1, 256))
        try:
            out = extract_pdf_text(bytes(b))
            assert isinstance(out, list)
            assert all(isinstance(s, str) for s in out)
        except ValueError:
            pass
    # truncations at every prefix length are equally controlled
    for cut in range(0, len(good), 11):
        try:
            out = extract_pdf_text(bytes(good[:cut]))
            assert isinstance(out, list)
        except ValueError:
            pass


def test_length_digit_mutations_controlled():
    """Directed fuzz on the declared /Length digits (the slice oracle):
    every single-digit rewrite 0-9 must yield raise-or-correct, since a
    short slice corrupts the Flate stream and a long slice swallows the
    next keyword."""
    import re

    good = encode_pdf(["length digit fuzz", "second"])
    for m in re.finditer(rb"/Length (\d+)", good):
        for d in b"0123456789":
            for off in range(m.start(1), m.end(1)):
                b = bytearray(good)
                if b[off] == d:
                    continue
                b[off] = d
                try:
                    out = extract_pdf_text(bytes(b))
                    assert isinstance(out, list)
                except ValueError:
                    pass


def test_multipage_roundtrip_and_order():
    """encode_pdf_pages/extract_pdf_pages: pages come back in /Kids order
    with per-page isolation (a line never leaks across pages), including
    escapes, empty pages and single-page documents."""
    import pytest

    from goose_parser_ray.functions.pdfmini import (
        encode_pdf_pages,
        extract_pdf_pages,
    )

    cases = [
        [["one a", "one b"], ["two (x)"], ["three \\ y", "tail"]],
        [["solo"]],
        [[], ["after empty"]],
        [["esc \n tab \t"], ["oct \x07"]],
    ]
    for pages in cases:
        assert extract_pdf_pages(encode_pdf_pages(pages)) == pages
    with pytest.raises(ValueError):
        encode_pdf_pages([])
    with pytest.raises(ValueError):
        extract_pdf_pages(b"not a pdf")


def test_multipage_object_walk_skips_stream_bytes():
    """A compressed stream whose bytes happen to contain the ASCII
    sequence '7 0 obj' must not fake a phantom object: the walk skips
    streams by declared /Length. zlib output is adversarially chosen by
    compressing text that contains the sequence uncompressed-ish."""
    from goose_parser_ray.functions.pdfmini import (
        encode_pdf_pages,
        extract_pdf_pages,
    )

    # line content that, raw, contains object-header-looking bytes; with
    # compress=False the stream bytes literally contain "7 0 obj"
    pages = [["decoy 7 0 obj endobj stream"], ["clean"]]
    payload = encode_pdf_pages(pages, compress=False)
    assert b"7 0 obj" in payload
    assert extract_pdf_pages(payload) == pages


def test_multipage_mutation_fuzz_controlled():
    """Single-byte mutations and truncations of a multi-page PDF either
    raise ValueError or extract SOME well-formed page list."""
    import numpy as np

    from goose_parser_ray.functions.pdfmini import (
        encode_pdf_pages,
        extract_pdf_pages,
    )

    rng = np.random.default_rng(11)
    good = bytearray(
        encode_pdf_pages([["alpha beta", "gamma"], ["delta"], ["eps z"]])
    )
    for trial in range(400):
        b = bytearray(good)
        pos = int(rng.integers(0, len(b)))
        b[pos] ^= int(rng.integers(1, 256))
        try:
            out = extract_pdf_pages(bytes(b))
            assert isinstance(out, list)
            for page in out:
                assert all(isinstance(x, str) for x in page)
        except ValueError:
            pass
    for cut in range(0, len(good), 7):
        try:
            extract_pdf_pages(bytes(good[:cut]))
        except ValueError:
            pass
