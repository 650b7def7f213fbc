"""WARC-style web-archive ingest/export (sources breadth, SURVEY §2.5).

The upstream engine scrapes live pages; the archival interchange format for
captured web content is WARC (ISO 28500). This module implements a
self-contained SUBSET of the record grammar — `WARC/1.0` header block,
`Content-Length`-framed payload, CRLF framing — sufficient for lossless
corpus roundtrips without external libraries:

    WARC/1.0\r\n
    WARC-Type: response\r\n
    WARC-Record-ID: <doc_id>\r\n
    WARC-Target-URI: <source>\r\n
    Content-Length: <payload bytes>\r\n
    \r\n
    <payload>\r\n\r\n

Scale shape: export is a pure ``map_batches`` sink (one shard file per
block, name derived from block content so re-runs overwrite rather than
duplicate); ingest is ``read_binary_files`` (streams shards in parallel)
followed by a per-shard framed parse. The parse walks records with
``Content-Length`` offsets — byte-exact on arbitrary payloads, no regex
over binary. Record iteration is a Python loop per shard, which is fine
for an ingest boundary (the same shape as JSONL parsing in ``io.py``);
everything downstream is columnar.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path

import pyarrow as pa
import ray.data

_SEP = b"\r\n\r\n"


def _encode_records(
    doc_ids: list, sources: list, texts: list
) -> bytes:
    parts: list[bytes] = []
    for did, src, txt in zip(doc_ids, sources, texts):
        payload = ("" if txt is None else str(txt)).encode("utf-8")
        header = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Record-ID: {did}\r\n"
            f"WARC-Target-URI: {'' if src is None else src}\r\n"
            f"Content-Length: {len(payload)}\r\n"
            "\r\n"
        ).encode("utf-8")
        parts.append(header + payload + _SEP)
    return b"".join(parts)


def parse_warc_bytes(blob: bytes) -> "dict[str, list]":
    """Parse one shard's bytes into columns (doc_id, source, text)."""
    ids: list[str] = []
    srcs: list[str] = []
    txts: list[str] = []
    pos, n = 0, len(blob)
    while pos < n:
        hdr_end = blob.index(_SEP, pos)
        header = blob[pos:hdr_end].decode("utf-8")
        lines = header.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC magic at offset {pos}: {lines[0]!r}")
        fields = dict(
            ln.split(": ", 1) for ln in lines[1:] if ": " in ln
        )
        clen = int(fields["Content-Length"])
        body_start = hdr_end + len(_SEP)
        payload = blob[body_start : body_start + clen]
        ids.append(fields.get("WARC-Record-ID", ""))
        srcs.append(fields.get("WARC-Target-URI", ""))
        txts.append(payload.decode("utf-8"))
        pos = body_start + clen + len(_SEP)
    return {"doc_id": ids, "source": srcs, "text": txts}


def write_warc_shards(
    ds: ray.data.Dataset,
    out_dir: str,
    *,
    doc_id: str = "doc_id",
    source: str = "source",
    text: str = "text",
) -> int:
    """Export a documents Dataset to WARC shard files under ``out_dir``
    (one shard per block, executed as a streaming map; returns the record
    count). Shard names derive from the block's id content, so re-running
    the same export overwrites the same files instead of duplicating.
    On a multi-node cluster ``out_dir`` must be cluster-visible storage
    (object store / NFS mount) — write tasks run on arbitrary nodes."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        ids = t[doc_id].to_pylist()
        blob = _encode_records(
            ids, t[source].to_pylist(), t[text].to_pylist()
        )
        # 128-bit content key: a 32-bit name would birthday-collide (and
        # silently merge shards) at the millions-of-blocks scale
        key = hashlib.md5(",".join(str(i) for i in ids).encode()).hexdigest()
        path = Path(out_dir) / f"shard-{key}-{t.num_rows}.warc"
        tmp = path.with_suffix(".warc.tmp")
        tmp.write_bytes(blob)
        os.replace(tmp, path)
        return pa.Table.from_pydict({"n": [t.num_rows]})

    counts = ds.map_batches(write_block, batch_format="pyarrow")
    return int(
        sum(r["n"] for r in counts.take_all())
    )


def read_warc(path: str) -> ray.data.Dataset:
    """Read WARC shards under ``path`` into Dataset(doc_id: string,
    source: string, text: string). Shards stream in parallel via
    ``read_binary_files``; each is parsed with byte-exact framing."""

    def parse(t: pa.Table) -> pa.Table:
        cols: dict[str, list] = {"doc_id": [], "source": [], "text": []}
        for blob in t["bytes"].to_pylist():
            rec = parse_warc_bytes(blob)
            for k in cols:
                cols[k].extend(rec[k])
        return pa.Table.from_pydict(
            {k: pa.array(v, pa.string()) for k, v in cols.items()}
        )

    return ray.data.read_binary_files(path, file_extensions=["warc"]).map_batches(
        parse, batch_format="pyarrow"
    )
