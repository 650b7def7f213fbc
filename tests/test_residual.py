"""Residual-collector regroup fast path (stages/residual.py): chunks of one
doc split across two blocks must be withheld from the main stream and come
back merged, in salt order, offsets renumbered."""

import pyarrow as pa

from goose_parser_ray.stages.extract import EXTRACT_OUT_SCHEMA
from goose_parser_ray.stages.residual import (
    ResidualCollector,
    drain_to_table,
    make_partial_merge_with_collector,
)


def chunk_row(doc_id, salt, n_salts, texts, pid=0):
    return {
        "doc_id": doc_id,
        "salt": salt,
        "salt_count": 1,
        "n_salts": n_salts,
        "partition_id": pid,
        "spans": [
            {"kind": "text", "text": t, "media_ref": "", "offset": i}
            for i, t in enumerate(texts)
        ],
        "n_spans": len(texts),
        "error": "",
    }


def test_cross_block_residual_merge(ray_session):
    collector = ResidualCollector.remote()
    fn = make_partial_merge_with_collector(collector)

    # block 1: unsalted doc + first two chunks of mega-doc M (out of 3)
    b1 = pa.Table.from_pylist(
        [
            chunk_row("plain", 0, 1, ["p0"]),
            chunk_row("M", 0, 3, ["a", "b"]),
            chunk_row("M", 1, 3, ["c"]),
        ],
        schema=EXTRACT_OUT_SCHEMA,
    )
    out1 = fn(b1)
    # plain passes through; M's partial merge is withheld
    assert out1["doc_id"].to_pylist() == ["plain"]

    # block 2: the last chunk of M
    b2 = pa.Table.from_pylist(
        [chunk_row("M", 2, 3, ["d", "e"])], schema=EXTRACT_OUT_SCHEMA
    )
    out2 = fn(b2)
    assert out2.num_rows == 0

    merged = drain_to_table(collector)
    assert merged is not None and merged.num_rows == 1
    row = merged.to_pylist()[0]
    assert row["doc_id"] == "M"
    assert [s["text"] for s in row["spans"]] == ["a", "b", "c", "d", "e"]
    assert [s["offset"] for s in row["spans"]] == [0, 1, 2, 3, 4]
    assert row["n_salts"] == 1 and row["salt"] == 0

    # drained means drained
    assert drain_to_table(collector) is None


def test_out_of_order_chunks_merge_in_salt_order(ray_session):
    collector = ResidualCollector.remote()
    fn = make_partial_merge_with_collector(collector)
    # chunks arrive in reverse salt order, in separate blocks
    for salt, texts in [(1, ["later"]), (0, ["first"])]:
        fn(
            pa.Table.from_pylist(
                [chunk_row("Z", salt, 2, texts)], schema=EXTRACT_OUT_SCHEMA
            )
        )
    merged = drain_to_table(collector)
    assert [s["text"] for s in merged.to_pylist()[0]["spans"]] == ["first", "later"]
