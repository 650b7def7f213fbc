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


def read_documents(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Read an interleaved-span documents table (FIXTURES.md F1 schema).

    Column pruning is passed down to the reader so only requested columns
    leave storage (read-level pruning — a 100 TB corpus must never ship
    unused columns through the object store)."""
    if _lance_available():  # pragma: no cover
        return ray.data.read_lance(path, columns=columns)
    return ray.data.read_parquet(path, columns=columns)


def write_spans(ds: ray.data.Dataset, path: str, **kwargs) -> None:
    """Write span rows as partitioned Parquet (a directory of part files —
    resumable layout, never one giant file)."""
    if _lance_available():  # pragma: no cover
        ds.write_lance(path, **kwargs)
        return
    ds.write_parquet(path, **kwargs)
