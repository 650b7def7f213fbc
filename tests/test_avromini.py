"""avromini codec tests: wire round trips (codecs, union orders, negative/
large longs, unicode), fail-loud rejections, and single-byte mutation fuzz
(raise-or-correct — the pngmini/tiffmini discipline)."""

from __future__ import annotations

import pytest

from goose_parser_ray.sources.avromini import AvroError, decode_avro, encode_avro

SCHEMA = {
    "type": "record",
    "name": "doc",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "text", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "ok", "type": "boolean"},
        {"name": "lang", "type": ["null", "string"]},
        {"name": "alt", "type": ["string", "null"]},
    ],
}

COLS = {
    "doc_id": [0, 1, -5, 2**40, -(2**40)],
    "text": ["a", "héllo", "", "x" * 300, "línea"],
    "score": [1.5, -0.25, 3e9, 0.0, float("inf")],
    "ok": [True, False, True, False, True],
    "lang": [None, "en", "fr", None, "de"],
    "alt": ["x", None, "z", "w", None],
}


@pytest.mark.parametrize("codec", ["deflate", "null"])
@pytest.mark.parametrize("rpb", [2, 1000])
def test_roundtrip(codec, rpb):
    data = encode_avro(COLS, SCHEMA, codec=codec, records_per_block=rpb)
    assert data[:4] == b"Obj\x01"
    names, out = decode_avro(data)
    assert names == list(COLS)
    assert out == COLS


def test_union_branch_follows_schema_order():
    """["null","T"] and ["T","null"] must wire-encode different branch
    indices (spec: branch = index into the union)."""
    a = {"type": "record", "name": "r",
         "fields": [{"name": "v", "type": ["null", "long"]}]}
    b = {"type": "record", "name": "r",
         "fields": [{"name": "v", "type": ["long", "null"]}]}
    ca = encode_avro({"v": [7]}, a, codec="null")
    cb = encode_avro({"v": [7]}, b, codec="null")
    assert ca != cb  # branch index differs
    assert decode_avro(ca)[1] == decode_avro(cb)[1] == {"v": [7]}
    # nulls too
    assert decode_avro(encode_avro({"v": [None]}, a, codec="null"))[1] == {"v": [None]}


def test_rejections():
    good = encode_avro(COLS, SCHEMA)
    with pytest.raises(AvroError):
        decode_avro(b"NotAvro" + good[7:])
    with pytest.raises(AvroError):
        encode_avro({"v": [1]}, {"type": "record", "name": "r",
                                 "fields": [{"name": "v", "type": "bytes"}]})
    with pytest.raises(AvroError):
        encode_avro({"v": [None]}, {"type": "record", "name": "r",
                                    "fields": [{"name": "v", "type": "long"}]})
    with pytest.raises(AvroError):
        encode_avro(COLS, SCHEMA, codec="snappy")
    with pytest.raises(AvroError):
        decode_avro(good[: len(good) - 10])  # truncated final block


def test_mutation_fuzz_raise_or_correct():
    small = {k: v[:3] for k, v in COLS.items()}
    good = encode_avro(small, SCHEMA, records_per_block=2)
    for pos in range(len(good)):
        bad = bytearray(good)
        bad[pos] ^= 0x41
        try:
            names, cols = decode_avro(bytes(bad))
            assert len(names) == len(cols)
        except (AvroError, UnicodeDecodeError):
            pass  # fail-loud is correct; any other exception type fails


def test_reader_path_parses_shards(tmp_path):
    import pyarrow as pa

    from goose_parser_ray.sources.io import read_documents

    schema = {"type": "record", "name": "d",
              "fields": [{"name": "doc_id", "type": "long"},
                         {"name": "text", "type": "string"}]}
    for i in range(3):
        (tmp_path / f"part-{i}.avro").write_bytes(
            encode_avro({"doc_id": [10 * i, 10 * i + 1],
                         "text": [f"a{i}", f"b{i}"]}, schema)
        )
    ds = read_documents(str(tmp_path), fmt="avro", columns=["doc_id"])
    got = sorted(r["doc_id"] for r in ds.take_all())
    assert got == [0, 1, 10, 11, 20, 21]
