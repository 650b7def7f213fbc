"""Variable-byte (VByte) integer codec for compressed posting lists.

The classic IR index compression (Scholer et al., SIGIR 2002; used by
Lucene and friends for doc-gap lists): each unsigned integer is split
into 7-bit groups, low-to-high, and every byte carries a continuation
bit in the high position — 1 on the LAST byte of a value (the
"terminator" convention), 0 on earlier bytes. Values < 128 take one
byte, < 16384 two, and so on. The encoded LENGTH of a value list is a
closed-form function of the values, which is what lets a DuckDB twin
state the compressed size of every posting block exactly.

Upstream context: goose-parser has no index layer; this is part of the
IR/index surface the data-engine mandate adds (SURVEY.md §2.6 S27
postings). Pure-Python byte loops are acceptable here because posting
blocks are bounded (≤ 128 gaps) and encode/decode runs inside
map_batches tasks.
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_varbyte", "decode_varbyte", "varbyte_len"]


def encode_varbyte(values) -> bytes:
    """Encode a sequence of non-negative ints. Raises on negatives."""
    out = bytearray()
    for v in values:
        v = int(v)
        if v < 0:
            raise ValueError("varbyte: negative value")
        while v >= 128:
            out.append(v & 0x7F)
            v >>= 7
        out.append(0x80 | v)
    return bytes(out)


def decode_varbyte(data: bytes) -> np.ndarray:
    """Decode to an int64 array. Raises ValueError on a dangling value
    (stream ends without a terminator byte) — the mutation-fuzz
    contract: raise-or-correct, never garbage beyond what the encoding
    can represent."""
    vals = []
    cur = 0
    shift = 0
    for b in data:
        if b & 0x80:
            v = cur | ((b & 0x7F) << shift)
            # shift==63 on the terminator passes the continuation guard
            # below but the payload bits can still push v past int64 —
            # reject here so the contract stays raise-ValueError, not a
            # numpy OverflowError at asarray time.
            if v > 0x7FFFFFFFFFFFFFFF:
                raise ValueError("varbyte: value overflows 64 bits")
            vals.append(v)
            cur = 0
            shift = 0
        else:
            cur |= b << shift
            shift += 7
            if shift > 63:
                raise ValueError("varbyte: value overflows 64 bits")
    if shift != 0:
        raise ValueError("varbyte: truncated stream")
    return np.asarray(vals, np.int64)


def varbyte_len(values) -> int:
    """Exact encoded byte length without encoding (1 byte per 7 bits)."""
    n = 0
    for v in values:
        v = int(v)
        n += 1
        while v >= 128:
            n += 1
            v >>= 7
    return n
