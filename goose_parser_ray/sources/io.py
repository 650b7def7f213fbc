"""IO shim: Lance-shaped tables, Parquet transport (SURVEY.md §7.0).

``read_documents``/``write_spans`` are the ONLY points where storage format
appears; when ``pylance`` exists, ``ray.data.read_lance``/``write_lance``
slot in here without touching pipeline code.
"""

from __future__ import annotations

import ray.data


def _lance_available() -> bool:
    try:  # pragma: no cover - sandbox has no pylance
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def read_documents(
    path: str,
    columns: list[str] | None = None,
    num_blocks: int | None = None,
) -> ray.data.Dataset:
    """Read an interleaved-span documents table (FIXTURES.md F1 schema).

    Column pruning is passed down to the reader so only requested columns
    leave storage (read-level pruning — a 100 TB corpus must never ship
    unused columns through the object store). ``num_blocks`` controls block
    granularity: finer blocks balance the extract pool's drain tail
    (measured: coarse ~9k-row blocks cost ~1.8s of tail imbalance per
    actor; ~16 blocks/CPU erases it)."""
    if _lance_available():  # pragma: no cover
        return ray.data.read_lance(path, columns=columns)
    kw = {"override_num_blocks": num_blocks} if num_blocks else {}
    return ray.data.read_parquet(path, columns=columns, **kw)


def read_extracted(path: str) -> ray.data.Dataset:
    """Read back an extraction output directory. Hive partitioning restores
    ``partition_id`` as a STRING column (pyarrow partition inference); this
    normalizes it to int32 so round-trips keep the pipeline schema."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(path)

    def fix(t: "pa.Table") -> "pa.Table":
        if "partition_id" in t.column_names and t.schema.field(
            "partition_id"
        ).type == pa.string():
            idx = t.column_names.index("partition_id")
            t = t.set_column(
                idx, "partition_id", pc.cast(t["partition_id"], pa.int32())
            )
        return t

    return ds.map_batches(fix, batch_format="pyarrow")


def write_spans(ds: ray.data.Dataset, path: str, **kwargs) -> None:
    """Write span rows as partitioned Parquet (a directory of part files —
    resumable layout, never one giant file)."""
    if _lance_available():  # pragma: no cover
        ds.write_lance(path, **kwargs)
        return
    ds.write_parquet(path, **kwargs)
