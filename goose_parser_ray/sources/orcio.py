"""ORC shard export / ingest (columnar interchange beside parquet/IPC/WARC).

Ray Data has no native ORC reader, so ingest composes the public primitives:
``read_binary_files`` streams shards in parallel and each block is decoded
with ``pyarrow.orc`` from an in-memory buffer — no driver-side file loop, no
temp copies. Export mirrors ``sources/warc.py``: one shard per block as a
streaming map sink with content-keyed names (idempotent re-runs) and
tmp+rename commits (a killed task never leaves a half-written shard).

Upstream parity note: the reference engine (redco/goose-parser, SURVEY.md
§2.5) has no columnar IO at all — this module is part of the §2.6
beyond-reference surface for corpus interchange at scale.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path

import pyarrow as pa
import pyarrow.orc as paorc
import ray.data


def write_orc_shards(ds: ray.data.Dataset, out_dir: str, *, key_col: str) -> int:
    """Export ``ds`` to ORC shards under ``out_dir`` (one per block,
    streaming map sink; returns the row count). Shard names derive from a
    128-bit digest of the block's ``key_col`` content — re-running the same
    export overwrites the same files instead of duplicating (32-bit names
    would birthday-collide at millions of blocks). On a multi-node cluster
    ``out_dir`` must be cluster-visible storage."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        keys = ",".join(str(i) for i in t[key_col].to_pylist())
        key = hashlib.md5(keys.encode()).hexdigest()
        path = Path(out_dir) / f"shard-{key}-{t.num_rows}.orc"
        tmp = path.with_suffix(".orc.tmp")
        paorc.write_table(t, str(tmp))
        os.replace(tmp, path)
        return pa.Table.from_pydict({"n": [t.num_rows]})

    counts = ds.map_batches(write_block, batch_format="pyarrow")
    return sum(r["n"] for r in counts.take_all())


def read_orc(path: str) -> ray.data.Dataset:
    """Read ORC shards under ``path`` into a Dataset, preserving the
    written schema. Shards stream in parallel via ``read_binary_files``;
    each decodes zero-temp from an in-memory Arrow buffer."""

    def parse(t: pa.Table) -> pa.Table:
        tables = [
            paorc.ORCFile(pa.BufferReader(blob)).read()
            for blob in t["bytes"].to_pylist()
        ]
        return pa.concat_tables(tables)

    return ray.data.read_binary_files(path, file_extensions=["orc"]).map_batches(
        parse, batch_format="pyarrow"
    )
