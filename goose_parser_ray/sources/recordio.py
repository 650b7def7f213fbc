"""TFRecord-style length-prefixed record container with masked CRC32C.

The de-facto training-data shard format (TensorFlow's TFRecord wire
layout, public spec): each record is

    length      uint64 little-endian
    crc(length) uint32 LE — masked CRC32C of the 8 length bytes
    payload     length bytes
    crc(payload) uint32 LE — masked CRC32C of the payload

with mask(c) = ((c >> 15 | c << 17) + 0xa282ead8) mod 2^32. CRC32C
(Castagnoli, reflected poly 0x82F63B78) is table-driven pure Python —
the sandbox has no crc32c wheel; zlib.crc32 is the WRONG polynomial, so
this table is the real thing, locked by the RFC 3720 check vector in
tests. Both CRCs are verified on read and any mismatch or truncation
raises ValueError (bit-rot in a shard must fail loudly, never yield a
silently corrupt training example).

Upstream context: goose-parser has no container layer; this is part of
the ingest/interchange surface the data-engine mandate adds (SURVEY.md
§2.6 IO1, sibling of the Avro object container in avromini.py).
"""

from __future__ import annotations

import struct

__all__ = ["crc32c", "encode_records", "decode_records"]

_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _TABLE.append(_c)


def crc32c(data: bytes, crc: int = 0) -> int:
    c = crc ^ 0xFFFFFFFF
    for b in data:
        c = _TABLE[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def _masked(c: int) -> int:
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def encode_records(payloads: "list[bytes]") -> bytes:
    out = bytearray()
    for p in payloads:
        ln = struct.pack("<Q", len(p))
        out += ln
        out += struct.pack("<I", _masked(crc32c(ln)))
        out += p
        out += struct.pack("<I", _masked(crc32c(p)))
    return bytes(out)


def decode_records(data: bytes) -> "list[bytes]":
    out: "list[bytes]" = []
    pos, n = 0, len(data)
    while pos < n:
        if pos + 12 > n:
            raise ValueError("recordio: truncated header")
        ln_bytes = data[pos : pos + 8]
        (ln,) = struct.unpack("<Q", ln_bytes)
        (lcrc,) = struct.unpack("<I", data[pos + 8 : pos + 12])
        if _masked(crc32c(ln_bytes)) != lcrc:
            raise ValueError("recordio: length crc mismatch")
        pos += 12
        if pos + ln + 4 > n:
            raise ValueError("recordio: truncated payload")
        payload = data[pos : pos + ln]
        (pcrc,) = struct.unpack("<I", data[pos + ln : pos + ln + 4])
        if _masked(crc32c(payload)) != pcrc:
            raise ValueError("recordio: payload crc mismatch")
        out.append(payload)
        pos += ln + 4
    return out
