"""Minimal REAL Avro object-container codec — the row-oriented interchange
format next to JSONL/CSV/Arrow-IPC in ``sources/io.py``.

Implements the Avro 1.11 container spec for the primitive-record subset a
log-ingest path actually meets: magic ``Obj\\x01``, file-metadata map with
``avro.schema`` (JSON) and ``avro.codec`` (``null`` | ``deflate``), 16-byte
sync marker, blocks of (record-count, byte-size, payload, sync). Values are
the real wire encodings — zigzag-varint longs, length-prefixed UTF-8,
little-endian IEEE doubles, single-byte booleans, ``["null", T]`` unions
with a varint branch index. Anything outside the subset (other codecs,
nested records, arrays/maps/enums/fixed) raises ``AvroError`` — fail-loud,
quarantine-friendly, same posture as ``xmlmini``.

Scale shape: the FILE is the parallelism unit (like JSONL/Arrow-IPC: no
row-group pruning exists), so the reader is ``read_binary_files`` → a
per-file parse kernel inside ``map_batches``; write shards from the
distributed pipeline, never one giant container.
"""

from __future__ import annotations

import json
import struct
import zlib


class AvroError(ValueError):
    """Malformed or unsupported Avro payload."""


_MAGIC = b"Obj\x01"
_PRIMS = {"long", "int", "string", "double", "boolean"}


# -- wire primitives ---------------------------------------------------------


def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    u &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    u = 0
    while True:
        if pos >= len(data):
            raise AvroError("truncated varint")
        b = data[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise AvroError("varint too long")
    return (u >> 1) ^ -(u & 1), pos


def _enc_bytes(b: bytes) -> bytes:
    return _zigzag_encode(len(b)) + b


def _dec_bytes(data: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = _zigzag_decode(data, pos)
    if n < 0 or pos + n > len(data):
        raise AvroError("bad bytes length")
    return data[pos : pos + n], pos + n


# -- schema handling ---------------------------------------------------------


def _field_types(schema: dict) -> list[tuple[str, str, int]]:
    """→ [(name, primitive_type, null_branch)] where null_branch is the
    union index of "null" (-1 for non-nullable fields) — branch indices
    follow SCHEMA ORDER per the spec, so ["null","T"] and ["T","null"]
    wire-encode differently."""
    if schema.get("type") != "record":
        raise AvroError("only record schemas supported")
    out = []
    for f in schema["fields"]:
        t = f["type"]
        null_branch = -1
        if isinstance(t, list):
            if len(t) != 2 or "null" not in t:
                raise AvroError(f"unsupported union {t}")
            null_branch = t.index("null")
            t = t[1 - null_branch]
        if t not in _PRIMS:
            raise AvroError(f"unsupported field type {t!r}")
        out.append((f["name"], t, null_branch))
    return out


# -- encode ------------------------------------------------------------------


def encode_avro(
    columns: dict[str, list],
    schema: dict,
    codec: str = "deflate",
    records_per_block: int = 1000,
    sync: bytes = b"goose-avro-sync!",
) -> bytes:
    """Encode equal-length columns as one Avro object container."""
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported codec {codec!r}")
    if len(sync) != 16:
        raise AvroError("sync marker must be 16 bytes")
    fields = _field_types(schema)
    names = [n for n, _, _ in fields]
    n_rows = len(columns[names[0]]) if names else 0

    out = bytearray(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": codec.encode(),
    }
    out += _zigzag_encode(len(meta))
    for k, v in meta.items():
        out += _enc_bytes(k.encode()) + _enc_bytes(v)
    out += _zigzag_encode(0)
    out += sync

    for r0 in range(0, n_rows, records_per_block):
        r1 = min(n_rows, r0 + records_per_block)
        body = bytearray()
        for r in range(r0, r1):
            for name, typ, null_branch in fields:
                v = columns[name][r]
                if null_branch >= 0:
                    if v is None:
                        body += _zigzag_encode(null_branch)
                        continue
                    body += _zigzag_encode(1 - null_branch)
                elif v is None:
                    raise AvroError(f"null in non-nullable field {name}")
                if typ in ("long", "int"):
                    body += _zigzag_encode(int(v))
                elif typ == "string":
                    body += _enc_bytes(str(v).encode())
                elif typ == "double":
                    body += struct.pack("<d", float(v))
                else:  # boolean
                    body += b"\x01" if v else b"\x00"
        payload = zlib.compress(bytes(body), 6)[2:-4] if codec == "deflate" else bytes(body)
        out += _zigzag_encode(r1 - r0)
        out += _zigzag_encode(len(payload))
        out += payload
        out += sync
    return bytes(out)


# -- decode ------------------------------------------------------------------


def decode_avro(data: bytes) -> tuple[list[str], dict[str, list]]:
    """Decode an Avro object container → (field names, column lists)."""
    if data[:4] != _MAGIC:
        raise AvroError(f"bad magic {data[:4]!r}")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        count, pos = _zigzag_decode(data, pos)
        if count == 0:
            break
        if count < 0:
            raise AvroError("negative map block counts unsupported")
        for _ in range(count):
            k, pos = _dec_bytes(data, pos)
            v, pos = _dec_bytes(data, pos)
            meta[k.decode()] = v
    if "avro.schema" not in meta:
        raise AvroError("missing avro.schema")
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported codec {codec!r}")
    try:
        schema = json.loads(meta["avro.schema"])
    except (json.JSONDecodeError, UnicodeDecodeError) as e:
        raise AvroError(f"bad schema JSON: {e}") from None
    try:
        fields = _field_types(schema)
    except (KeyError, TypeError, AttributeError) as e:
        raise AvroError(f"malformed schema: {e}") from None
    sync = data[pos : pos + 16]
    if len(sync) != 16:
        raise AvroError("truncated header sync")
    pos += 16

    cols: dict[str, list] = {n: [] for n, _, _ in fields}
    while pos < len(data):
        n_rec, pos = _zigzag_decode(data, pos)
        size, pos = _zigzag_decode(data, pos)
        if n_rec < 0 or size < 0 or pos + size + 16 > len(data):
            raise AvroError("bad block header")
        payload = data[pos : pos + size]
        pos += size
        if data[pos : pos + 16] != sync:
            raise AvroError("sync marker mismatch")
        pos += 16
        if codec == "deflate":
            try:
                body = zlib.decompress(payload, -15)
            except zlib.error as e:
                raise AvroError(f"deflate error: {e}") from None
        else:
            body = payload
        bpos = 0
        for _ in range(n_rec):
            for name, typ, null_branch in fields:
                if null_branch >= 0:
                    branch, bpos = _zigzag_decode(body, bpos)
                    if branch == null_branch:
                        cols[name].append(None)
                        continue
                    if branch != 1 - null_branch:
                        raise AvroError(f"bad union branch {branch}")
                if typ in ("long", "int"):
                    v, bpos = _zigzag_decode(body, bpos)
                elif typ == "string":
                    raw, bpos = _dec_bytes(body, bpos)
                    v = raw.decode("utf-8")
                elif typ == "double":
                    if bpos + 8 > len(body):
                        raise AvroError("truncated double")
                    (v,) = struct.unpack_from("<d", body, bpos)
                    bpos += 8
                else:  # boolean
                    if bpos >= len(body):
                        raise AvroError("truncated boolean")
                    v = body[bpos] != 0
                    bpos += 1
                cols[name].append(v)
        if bpos != len(body):
            raise AvroError("trailing bytes in block body")
    return [n for n, _, _ in fields], cols
