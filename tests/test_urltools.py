"""URL curation: registrable-domain extraction + per-domain cap."""

import pyarrow as pa
import ray.data

from goose_parser_ray.functions.urltools import (
    add_registrable_domain,
    cap_per_domain,
)


def _domains(urls):
    t = pa.Table.from_pydict({"url": pa.array(urls, pa.string())})
    return add_registrable_domain(t)["domain"].to_pylist()


def test_registrable_domain_cases():
    assert _domains(
        [
            "https://www.example.com/p/1",
            "http://cdn.shop.co.uk/x",
            "https://no-sub.org/",
            "https://a.b.c.example.co.uk/deep/path",
            "https://host.net:8080/port",
            "not a url",
        ]
    ) == [
        "example.com",
        "shop.co.uk",
        "no-sub.org",
        "example.co.uk",
        "host.net",
        None,
    ]


def test_cap_deterministic_across_block_layouts(ray_session):
    rows = {
        "doc_id": pa.array(range(100), pa.int64()),
        "domain": pa.array(
            ["d%d.com" % (i % 3) for i in range(100)], pa.string()
        ),
    }
    t = pa.Table.from_pydict(rows)

    def run(n_blocks):
        ds = ray.data.from_arrow(t).repartition(n_blocks)
        out = cap_per_domain(ds, cap=5).to_pandas()
        return sorted(map(tuple, out[["doc_id", "domain"]].values.tolist()))

    a, b = run(1), run(7)
    assert a == b
    assert len(a) == 15  # 3 domains x cap 5
    # membership is by knuth-hash order, not first-5-by-id
    assert a != sorted(
        (i, "d%d.com" % (i % 3)) for i in range(15)
    )
