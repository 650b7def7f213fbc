"""IR + ML + relational completion: logreg, BPE, BM25, AUC, components, CDC, OHLC, medians, JW join, unpivot, covariance, embed stats.

Split from the original single-file query surface (registration order preserved;
registry lives in the package __init__). See package docstring for the
column-naming / integer-cents parity rules every query follows."""

from __future__ import annotations


import datetime as _dt

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from goose_parser_ray.functions import dedup as _dedup
from goose_parser_ray.functions.dedup import (
    exact_dedup,
    minhash_dedup_keep,
    minhash_lsh_candidates,
    simhash_near_dups,
    embedding_near_dups,
)
from goose_parser_ray.functions.multimodal import ImageDecodeActor
from goose_parser_ray.functions.relational import broadcast_join, pre_aggregated_sum
from goose_parser_ray.functions.similarity import ann_bruteforce, ann_lsh
from goose_parser_ray.functions.textstats import LangIdActor, add_fingerprint
from goose_parser_ray.pipelines import build_extraction_pipeline
from goose_parser_ray.sources.corpus import wrap_flat_documents
from goose_parser_ray.transforms import compile_chain

from goose_parser_ray.queries._shared import _cents, _pool, _read
from goose_parser_ray.queries.graph_mlstats import _copurchase_edges




def q_logreg(sf_dir: str):
    """Distributed logistic regression (rows-only: iterative float
    algorithm): predict ``event_type == 'purchase'`` from (value,
    hour-of-day). Same scale shape as the k-means/PageRank loops — model
    broadcast per round, one small partial row per batch, corpus pinned
    once and never collected. Numpy-reference parity in tests/test_ml.py."""
    import pandas as pd

    from goose_parser_ray.functions.ml import logreg_fit

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def featurize(t: pa.Table) -> pa.Table:
        hour = pc.cast(pc.hour(t["ts"]), pa.float64())
        y = pc.cast(
            pc.equal(t["event_type"], "purchase"), pa.float64()
        )
        return pa.Table.from_arrays(
            [t["value"], hour, y], names=["value", "hour", "y"]
        )

    feats = ds.map_batches(featurize, batch_format="pyarrow")
    w, acc, losses = logreg_fit(
        feats, ["value", "hour"], "y", iters=15
    )
    # Self-verifying invariants (r3 VERDICT item 5): gradient descent on a
    # convex loss with this step size must end below where it started, and
    # the count of round-over-round loss increases is a deterministic
    # integer (0 for a healthy run) the driver can hash across runs.
    return pd.DataFrame(
        {
            "w_value_e4": [int(round(w[0] * 1e4))],
            "w_hour_e4": [int(round(w[1] * 1e4))],
            "bias_e4": [int(round(w[2] * 1e4))],
            "acc_e4": [int(round(acc * 1e4))],
            "final_loss_e4": [int(round(losses[-1] * 1e4))],
            "loss_decreased": [int(losses[-1] < losses[0])],
            "n_loss_increases": [
                int(sum(b > a for a, b in zip(losses, losses[1:])))
            ],
            # position-weighted checksum of the FULL loss trace in e6
            # fixed point — pins every round's loss in order, so any
            # nondeterminism in the distributed partial reduction (or a
            # regression in the update rule) breaks the sweep hash.
            "loss_trace_e6_checksum": [
                int(
                    sum(
                        (i + 1) * int(round(l * 1e6))
                        for i, l in enumerate(losses)
                    )
                    % (1 << 61)
                )
            ],
        }
    )


def q_media_ppm(sf_dir: str):
    """REAL color-image pipeline (P6 sibling of q_media_pgm), ORACLE-
    CHECKED: deterministic RGB gradients are encoded to actual PPM bytes,
    decoded back by the in-repo codec in an actor pool, thumbnailed 4×4,
    and summarized as exact per-channel integer means (62500 × channel
    sum — integer arithmetic end to end, hash-exact vs the closed-form
    SQL twin)."""
    from goose_parser_ray.functions.multimodal import PpmChannelStatsActor
    from goose_parser_ray.functions.netpbm import encode_ppm

    def synth(t: pa.Table) -> pa.Table:
        payloads = []
        for d in t["doc_id"].to_pylist():
            w = 12 + (d & 7)
            h = 12 + ((d >> 3) & 7)
            i = np.arange(h, dtype=np.int64)[:, None, None]
            j = np.arange(w, dtype=np.int64)[None, :, None]
            c = np.arange(3, dtype=np.int64)[None, None, :]
            img = ((31 * i + 17 * j + 83 * c + d) % 256).astype(np.uint8)
            payloads.append(encode_ppm(img))
        return pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        synth, batch_format="pyarrow"
    )
    return ds.map_batches(
        # task pool, not actor pool: setup is an import bind — actor
        # spin-up costs more than it saves (measured on media_png:
        # stage wall 3.0s -> 1.4s at sf0.1/32 CPUs)
        lambda t: PpmChannelStatsActor()(t),
        batch_format="pyarrow",
        batch_size=64,  # wide binary payloads — small batches (guide)
    ).sort("doc_id")


SQL_MEDIA_PPM = """
WITH dims AS (
  SELECT doc_id,
         12 + (doc_id & 7) AS width,
         12 + ((doc_id // 8) & 7) AS height
  FROM documents
),
pix AS (
  SELECT d.doc_id, d.width, d.height, c.c,
         (31 * ((i.i * d.height) // 4) + 17 * ((j.j * d.width) // 4)
          + 83 * c.c + d.doc_id) % 256 AS val
  FROM dims d,
       (SELECT unnest(generate_series(0, 3)) AS i) i,
       (SELECT unnest(generate_series(0, 3)) AS j) j,
       (SELECT unnest(generate_series(0, 2)) AS c) c
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(MAX(width) AS BIGINT) AS width,
       CAST(MAX(height) AS BIGINT) AS height,
       CAST(62500 * SUM(CASE WHEN c = 0 THEN val END) AS BIGINT) AS r_e6,
       CAST(62500 * SUM(CASE WHEN c = 1 THEN val END) AS BIGINT) AS g_e6,
       CAST(62500 * SUM(CASE WHEN c = 2 THEN val END) AS BIGINT) AS b_e6
FROM pix GROUP BY doc_id ORDER BY doc_id
"""


def q_except_all(sf_dir: str):
    """EXCEPT ALL (bag semantics — completes the set-op family beside
    UNION/INTERSECT/EXCEPT), ORACLE-CHECKED: click user_ids minus error
    user_ids WITH multiplicity. One signed partial-count pass over both
    sides (map-side combine), then each key re-emits max(0, diff) copies —
    the exchange moves one row per (batch, user), never the raw events."""
    from goose_parser_ray.functions.relational import pre_aggregated_sum

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def signed(t: pa.Table) -> pa.Table:
        keep = pc.is_in(
            t["event_type"], value_set=pa.array(["click", "error"])
        )
        t = t.filter(keep)
        sign = pc.if_else(
            pc.equal(t["event_type"], "click"),
            pa.scalar(1, pa.int64()),
            pa.scalar(-1, pa.int64()),
        )
        return pa.Table.from_arrays(
            [t["user_id"], sign], names=["user_id", "sign"]
        )

    counts = pre_aggregated_sum(
        ds.map_batches(signed, batch_format="pyarrow"),
        ["user_id"],
        {"sign": "diff"},
    )

    def expand(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        diff = t["diff"].to_numpy(zero_copy_only=False)
        pos = diff > 0
        out = np.repeat(uid[pos], diff[pos])
        return pa.Table.from_pydict(
            {"user_id": pa.array(out, pa.int64())}
        )

    return counts.map_batches(expand, batch_format="pyarrow").sort("user_id")


SQL_EXCEPT_ALL = """
SELECT CAST(user_id AS BIGINT) AS user_id
FROM events WHERE event_type = 'click'
EXCEPT ALL
SELECT CAST(user_id AS BIGINT) AS user_id
FROM events WHERE event_type = 'error'
ORDER BY user_id
"""


def q_dup_chunks(sf_dir: str):
    """Cross-document duplicate-chunk signal (Falcon/RefinedWeb line-dedup
    shape), ORACLE-CHECKED: slide 200-codepoint/150-stride chunks over
    every doc, mark chunks whose text occurs in ≥2 distinct documents, and
    report per-doc (n_chunks, dup_chunks). Distribution: the one honest
    shuffle groups chunks by content hash into data-proportional buckets;
    inside a bucket the distinct-doc count per chunk is a vectorized
    pandas pass, and the per-doc rollup is the partial/combiner pattern."""
    import pandas as pd

    from goose_parser_ray.functions.dedup import (
        add_hash_bucket,
        num_shuffle_buckets,
    )
    from goose_parser_ray.functions.relational import pre_aggregated_sum

    CHUNK, STRIDE = 200, 150
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    nb = num_shuffle_buckets(ds.count() * 4)  # ≈ chunks per doc upper bound

    def chunks(t: pa.Table) -> pa.Table:
        lens = pc.utf8_length(t["text"]).to_numpy(zero_copy_only=False)
        n_chunks = np.maximum(lens - 1, 0) // STRIDE + 1
        parts = []
        for j in range(int(n_chunks.max()) if len(n_chunks) else 0):
            mask = pa.array(n_chunks > j)
            sub = t.filter(mask)
            piece = pc.utf8_slice_codeunits(
                sub["text"], start=j * STRIDE, stop=j * STRIDE + CHUNK
            )
            parts.append(
                pa.Table.from_arrays(
                    [sub["doc_id"], piece], names=["doc_id", "chunk"]
                )
            )
        out = (
            pa.concat_tables(parts)
            if parts
            else pa.Table.from_pydict(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "chunk": pa.array([], pa.string()),
                }
            )
        )
        return add_hash_bucket(out, "chunk", nb)

    def mark_dups(g: pd.DataFrame) -> pd.DataFrame:
        docs_with = g.groupby("chunk")["doc_id"].transform("nunique")
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"],
                "dup": (docs_with > 1).astype("int64"),
                "one": np.ones(len(g), dtype="int64"),
            }
        )

    marked = (
        ds.map_batches(chunks, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(mark_dups, batch_format="pandas")
    )
    return pre_aggregated_sum(
        marked, ["doc_id"], {"one": "n_chunks", "dup": "dup_chunks"}
    ).sort("doc_id")


SQL_DUP_CHUNKS = """
WITH ch AS (
  SELECT doc_id, substring(text, CAST(j * 150 + 1 AS INT), 200) AS chunk
  FROM documents,
       UNNEST(generate_series(0, greatest(length(text) - 1, 0) // 150)) AS t(j)
), cd AS (
  SELECT chunk, COUNT(DISTINCT doc_id) AS docs_with
  FROM ch GROUP BY chunk
)
SELECT CAST(c.doc_id AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN cd.docs_with > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS dup_chunks
FROM ch c JOIN cd ON c.chunk = cd.chunk
GROUP BY c.doc_id ORDER BY doc_id
"""


def q_bpe_merges(sf_dir: str):
    """Distributed BPE tokenizer training (rows-only: iterative, string
    surgery has no SQL twin) — the LLM-pipeline tokenizer-training step.
    One corpus pass reduces to the word-frequency table; every merge round
    is vocab-bounded (pair partials → grouped sum → distributed top-1 →
    broadcast merge). Deterministic tie-breaks; reference parity in
    tests/test_bpe.py. Returns the learned merge table."""
    import pandas as pd

    from goose_parser_ray.functions.bpe import bpe_train

    ds = _read(sf_dir, "documents", ["text"])
    merges = bpe_train(ds, "text", n_merges=5)
    counts = np.array([m[2] for m in merges], dtype="int64")
    # Self-verifying invariant (r3 VERDICT item 5): the winning pair count
    # is provably non-increasing across BPE rounds — a new pair's count is
    # bounded by the count of the merge that created it, and every old
    # pair's count was ≤ this round's max. A 0 here means the distributed
    # top-1 reduction picked a non-max pair somewhere.
    nonincreasing = int(bool(np.all(np.diff(counts) <= 0)))
    # position-weighted checksum of the FULL merge table (r5 item 3):
    # pins rank order, both merge halves, and every count — any change in
    # the distributed top-1 tie-break or pair accounting breaks the hash.
    import zlib

    table_ck = int(
        sum(
            (i + 1)
            * (
                zlib.crc32(f"{m[0]}\x00{m[1]}".encode("utf-8"))
                + 1000003 * m[2]
            )
            for i, m in enumerate(merges)
        )
        % (1 << 61)
    )
    return pd.DataFrame(
        {
            "rank": np.arange(len(merges), dtype="int64"),
            "left": [m[0] for m in merges],
            "right": [m[1] for m in merges],
            "pair_count": counts,
            "count_nonincreasing": np.full(len(merges), nonincreasing, dtype="int64"),
            "merge_table_checksum": np.full(len(merges), table_ck, dtype="int64"),
        }
    )


def q_quality_classifier(sf_dir: str):
    """fastText/CCNet-style LEARNED quality gate (rows-only: iterative
    hashed-feature training has no SQL twin): train a hashed unigram+
    bigram linear classifier distributed, then score the whole corpus
    with the broadcast model (``functions/ml.py:hashed_text_logreg`` /
    ``hashed_text_predict``) — the exact shape of CCNet's fastText
    language/quality filters. The driver's synthetic texts share ONE
    vocabulary across langs (lang is unlearnable from text by
    construction), so the task is data-derived like semdedup_invariants'
    injection: label = doc_id % 2, and label-1 docs get every 3rd word
    deterministically suffixed — a real vocabulary-shift signal the
    trainer must separate (accuracy ≈ 1.0 when the distributed GD loop is
    correctly wired; ≈ 0.5 majority baseline when it isn't). Emits
    per-doc (label, pred, score_e6) plus summary invariant columns
    repeated on every row: ``acc_e4``, ``loss_decreased``,
    ``n_loss_increases`` (deterministic GD health integers, the q_logreg
    pattern)."""
    import pandas as pd

    from goose_parser_ray.functions.ml import (
        hashed_text_logreg,
        hashed_text_predict,
    )

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def label(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        y = (ids % 2).astype(np.int64)
        texts = []
        for i, s in zip(y, t["text"].to_pylist()):
            ws = (s or "").split(" ")
            if i:
                ws = [
                    w + "x" if j % 3 == 0 and w else w
                    for j, w in enumerate(ws)
                ]
            texts.append(" ".join(ws))
        return pa.Table.from_pydict(
            {
                "doc_id": t["doc_id"],
                "text": pa.array(texts, pa.string()),
                "y": pa.array(y),
            }
        )

    train = docs.map_batches(label, batch_format="pyarrow")
    w, acc, losses = hashed_text_logreg(
        train, "text", "y", n_features=1 << 16, iters=8
    )
    scored = hashed_text_predict(
        train, w, "text", id_col="doc_id", n_features=1 << 16
    ).to_pandas()
    labels = (
        train.select_columns(["doc_id", "y"]).to_pandas()
    )
    out = scored.merge(labels, on="doc_id").sort_values("doc_id")
    return pd.DataFrame(
        {
            "doc_id": out["doc_id"].to_numpy(),
            "label": out["y"].to_numpy(dtype="int64"),
            "pred": out["pred"].to_numpy(dtype="int64"),
            "score_e6": out["score_e6"].to_numpy(dtype="int64"),
            "acc_e4": np.full(len(out), int(round(acc * 1e4)), dtype="int64"),
            "loss_decreased": np.full(
                len(out), int(losses[-1] < losses[0]), dtype="int64"
            ),
            "n_loss_increases": np.full(
                len(out),
                int(sum(b > a for a, b in zip(losses, losses[1:]))),
                dtype="int64",
            ),
            # e3 fixed-point position-weighted trace checksum: coarse
            # enough to absorb fold-order round-off (~1e-12), tight
            # enough that any real change to the GD loop breaks it.
            "loss_trace_e3_checksum": np.full(
                len(out),
                int(
                    sum(
                        (i + 1) * int(round(l * 1e3))
                        for i, l in enumerate(losses)
                    )
                    % (1 << 61)
                ),
                dtype="int64",
            ),
        }
    )


def q_bpe_encode(sf_dir: str):
    """Tokenizer APPLICATION (rows-only: merges come from iterative
    training): train 5 merges on the corpus, then encode every document
    with them — the per-doc map a training pipeline runs at corpus scale
    (``functions/bpe.py:BpeEncodeActor``: merges broadcast once per actor,
    persistent word→tokens memo, no shuffle). Self-verifying columns:
    ``roundtrip_ok`` must be 1 on every row (token concatenation rebuilds
    each word), ``n_tokens ≤ n_chars`` by construction, and
    ``token_checksum`` pins the exact token sequence across runs."""
    from goose_parser_ray.functions.bpe import bpe_encode, bpe_train

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    merges = bpe_train(ds, "text", n_merges=5)
    return bpe_encode(
        ds, merges, concurrency=(2, max(2, _pool() // 2))
    ).sort("doc_id")


def q_unigram_vocab(sf_dir: str):
    """Unigram-LM tokenizer TRAINING (SentencePiece, Kudo 2018 — the
    other production tokenizer family beside BPE; rows-only: iterative
    EM). One corpus pass → word-frequency table; seeding, hard-EM rounds
    and pruning all run vocab-bounded with broadcast piece probabilities
    (``functions/unigram.py``). Deterministic output: (piece, count,
    logp_e6) sorted by count desc then piece — hash-stable across runs
    and block layouts."""
    import pandas as pd

    from goose_parser_ray.functions.unigram import unigram_train

    ds = _read(sf_dir, "documents", ["text"])
    vocab = unigram_train(ds, "text", vocab_size=48, em_iters=3)
    return pd.DataFrame(
        {
            "piece": [v[0] for v in vocab],
            "cnt": np.array([v[1] for v in vocab], dtype="int64"),
            "logp_e6": np.array([v[2] for v in vocab], dtype="int64"),
        }
    )


def q_unigram_encode(sf_dir: str):
    """Unigram tokenizer APPLICATION (sibling of q_bpe_encode): Viterbi-
    segment every document under the trained vocabulary (actor pool,
    vocab broadcast once, per-actor word→pieces memo, no shuffle).
    Self-verifying: ``roundtrip_ok`` must be 1 on every row (piece
    concatenation rebuilds each word) and ``n_pieces ≤ n_chars``."""
    from goose_parser_ray.functions.unigram import unigram_encode, unigram_train

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    vocab = unigram_train(ds, "text", vocab_size=48, em_iters=3)
    return unigram_encode(
        ds, vocab, concurrency=(2, max(2, _pool() // 2))
    ).sort("doc_id")


SQL_LINK_GRAPH = """
SELECT CAST((d.doc_id * 7 + g.k) % 1000 AS BIGINT) AS dst,
       CAST(COUNT(*) AS BIGINT) AS in_degree
FROM documents d,
     LATERAL (SELECT unnest(generate_series(1, d.doc_id % 3 + 1)) AS k) g
GROUP BY 1
ORDER BY 1
"""


_BM25_TERMS = ("vector", "hash", "latency")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 15


def q_bm25(sf_dir: str):
    """BM25 ranked retrieval (Okapi; Robertson & Spärck Jones) — the
    classic IR top-k over the corpus, ORACLE-CHECKED at e6 fixed point.

    One corpus scan emits a REDUCED dataset: per-doc rows (doc_id, dl,
    per-term tf) only for docs matching ≥1 query term, plus one tagged
    stat partial per batch (Σdl, batch doc count). N/avgdl/df come from
    the tiny partials (df ≤ matched docs, partials ≤ #batches — never the
    corpus driver-side); scoring is a second map over the reduced rows
    only. Float discipline: each (doc, term) BM25 contribution is rounded
    to an e6 integer INDEPENDENTLY, then int-summed per doc — the same
    order-independent integer-partial trick as q_pmi_bigrams, so the
    driver hash cannot see IEEE summation order. Tie-break (score DESC,
    doc_id ASC) is total."""
    import math

    import pandas as pd

    from goose_parser_ray.functions.textstats import WORD_SPLIT_RE

    terms = list(_BM25_TERMS)
    k1, b = _BM25_K1, _BM25_B

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def reduce_batch(t: pa.Table) -> pa.Table:
        lowered = pc.fill_null(pc.utf8_lower(t["text"]), "")
        words = pc.split_pattern_regex(lowered, pattern=WORD_SPLIT_RE)
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = pc.list_flatten(words)
        parent = pc.list_parent_indices(words).to_numpy(
            zero_copy_only=False
        )
        w = pd.Series(flat.to_pylist(), dtype=object)
        nonempty = (w != "").to_numpy()
        n_docs = len(t)
        # per-doc length over nonempty tokens (vectorized bincount)
        dl = np.bincount(parent[nonempty], minlength=n_docs).astype(np.int64)
        cols = {"doc_id": t["doc_id"].to_numpy(zero_copy_only=False), "dl": dl}
        matched = np.zeros(n_docs, dtype=bool)
        for j, term in enumerate(terms):
            hit = (w == term).to_numpy()
            tf = np.bincount(parent[hit], minlength=n_docs).astype(np.int64)
            cols[f"tf{j}"] = tf
            matched |= tf > 0
        out = {k: v[matched] for k, v in cols.items()}
        out["kind"] = np.zeros(int(matched.sum()), dtype=np.int64)
        # one tagged stat partial per batch: Σdl in 'dl', doc count in 'tf0'
        stat = {
            "doc_id": np.array([-1], dtype=np.int64),
            "dl": np.array([int(dl.sum())], dtype=np.int64),
            "kind": np.array([1], dtype=np.int64),
        }
        for j in range(len(terms)):
            stat[f"tf{j}"] = np.array(
                [n_docs if j == 0 else 0], dtype=np.int64
            )
        return pa.Table.from_pydict(
            {k: np.concatenate([out[k], stat[k]]) for k in out}
        )

    reduced = ds.map_batches(reduce_batch, batch_format="pyarrow").materialize()

    # tiny aggregates: N, Σdl from the tagged partials; df from matched rows
    def agg_batch(t: pa.Table) -> pa.Table:
        kind = t["kind"].to_numpy(zero_copy_only=False)
        is_stat = kind == 1
        row = {
            "n": [int(t["tf0"].to_numpy(zero_copy_only=False)[is_stat].sum())],
            "sumdl": [int(t["dl"].to_numpy(zero_copy_only=False)[is_stat].sum())],
        }
        for j in range(len(terms)):
            tf = t[f"tf{j}"].to_numpy(zero_copy_only=False)
            row[f"df{j}"] = [int(((tf > 0) & ~is_stat).sum())]
        return pa.Table.from_pydict(row)

    parts = reduced.map_batches(agg_batch, batch_format="pyarrow").to_pandas()
    n_corpus = int(parts["n"].sum())
    avgdl = float(parts["sumdl"].sum()) / n_corpus
    idf = [
        math.log(
            1.0
            + (n_corpus - int(parts[f"df{j}"].sum()) + 0.5)
            / (int(parts[f"df{j}"].sum()) + 0.5)
        )
        for j in range(len(terms))
    ]

    def score_batch(t: pa.Table) -> pa.Table:
        kind = t["kind"].to_numpy(zero_copy_only=False)
        keep = kind == 0
        dl = t["dl"].to_numpy(zero_copy_only=False)[keep].astype(np.float64)
        score = np.zeros(len(dl), dtype=np.int64)
        denom_len = k1 * (1.0 - b + b * dl / avgdl)
        for j in range(len(terms)):
            tf = t[f"tf{j}"].to_numpy(zero_copy_only=False)[keep].astype(
                np.float64
            )
            contrib = 1e6 * idf[j] * tf * (k1 + 1.0) / (tf + denom_len)
            # half-away-from-zero == DuckDB ROUND (contribs are ≥ 0)
            score += np.floor(contrib + 0.5).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "doc_id": t["doc_id"].to_numpy(zero_copy_only=False)[keep],
                "score_e6": score,
            }
        )

    scored = reduced.map_batches(score_batch, batch_format="pyarrow")
    return scored.sort(
        ["score_e6", "doc_id"], descending=[True, False]
    ).limit(_BM25_TOPK)


SQL_BM25 = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '[^\p{L}\p{N}_]+')) AS w
  FROM documents
),
dl AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
  FROM tok WHERE w <> '' GROUP BY doc_id
),
tf AS (
  SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE w IN ('vector', 'hash', 'latency') GROUP BY doc_id, w
),
stats AS (
  SELECT (SELECT COUNT(*) FROM documents) AS n,
         (SELECT SUM(dl) FROM dl) * 1.0 / (SELECT COUNT(*) FROM documents)
           AS avgdl
),
df AS (
  SELECT w, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM tf GROUP BY w
),
contrib AS (
  SELECT tf.doc_id,
         CAST(ROUND(
           1e6 * ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
               * tf.tf * 2.2
               / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         ) AS BIGINT) AS c
  FROM tf
  JOIN dl ON dl.doc_id = tf.doc_id
  JOIN df ON df.w = tf.w
  CROSS JOIN stats
)
SELECT doc_id, CAST(SUM(c) AS BIGINT) AS score_e6
FROM contrib GROUP BY doc_id
ORDER BY score_e6 DESC, doc_id ASC LIMIT 15
"""


def q_auc(sf_dir: str):
    """Exact distributed ROC-AUC (Mann–Whitney rank statistic) of
    ``value`` predicting click-vs-error, ORACLE-CHECKED with pure-integer
    arithmetic (no float rank averaging: 2·avg-rank of a tie group is an
    integer, so the numerator ``2·R⁺ − n⁺(n⁺+1)`` and denominator
    ``2·n⁺·n⁻`` are exact BIGINTs; auc_e6 = num·1e6 // den matches DuckDB
    ``//``).

    Scale shape: scores quantized to cents → grouped (v, pos, cnt) via
    map-side combine (exchange bounded by the score DOMAIN, not the corpus),
    then the tie-group rank base C(v) = exclusive prefix sum of counts in
    value order via the distributed range-bucketed scan
    (functions/packing.global_scan_offsets) — no driver-side rank pass."""
    from goose_parser_ray.functions.packing import global_scan_offsets

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.is_in(
            t["event_type"], value_set=pa.array(["click", "error"])
        )
        t = t.filter(keep)
        v = _cents(t["value"]).to_numpy(zero_copy_only=False)
        pos = pc.equal(t["event_type"], "click").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        import pandas as pd

        g = pd.DataFrame({"v": v, "p": pos}).groupby("v", sort=False).agg(
            p=("p", "sum"), c=("p", "size")
        )
        return pa.Table.from_pydict(
            {
                "v": g.index.to_numpy(np.int64),
                "p": g["p"].to_numpy(np.int64),
                "c": g["c"].to_numpy(np.int64),
            }
        )

    grouped = pre_aggregated_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["v"],
        sums={"p": "p", "c": "c"},
    )
    n_groups = grouped.count()
    ranked = global_scan_offsets(
        grouped, order_col="v", size_col="c", offset_col="cum_before",
        n_rows=max(1, n_groups),
    )

    def partial_auc(t: pa.Table) -> pa.Table:
        p = t["p"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        cb = t["cum_before"].to_numpy(zero_copy_only=False)
        # Σ over tie groups of p·(2C + c + 1) == 2·Σ avg-ranks of positives
        return pa.Table.from_pydict(
            {
                "r2": [int((p * (2 * cb + c + 1)).sum())],
                "npos": [int(p.sum())],
                "ntot": [int(c.sum())],
            }
        )

    parts = ranked.map_batches(
        partial_auc, batch_format="pyarrow"
    ).to_pandas()
    r2 = int(parts["r2"].sum())
    npos = int(parts["npos"].sum())
    nneg = int(parts["ntot"].sum()) - npos
    num = r2 - npos * (npos + 1)
    den = 2 * npos * nneg
    return pa.Table.from_pydict(
        {
            "npos": pa.array([npos], pa.int64()),
            "nneg": pa.array([nneg], pa.int64()),
            "auc_e6": pa.array([num * 1_000_000 // den], pa.int64()),
        }
    )


SQL_AUC = """
WITH s AS (
  SELECT CAST(ROUND(100 * value) AS BIGINT) AS v,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS pos
  FROM events WHERE event_type IN ('click', 'error')
),
r AS (
  SELECT v, pos,
         RANK() OVER (ORDER BY v) AS rmin,
         COUNT(*) OVER (PARTITION BY v) AS c
  FROM s
),
agg AS (
  SELECT SUM(CASE WHEN pos = 1 THEN 2 * rmin + c - 1 ELSE 0 END) AS r2,
         SUM(pos) AS npos, SUM(1 - pos) AS nneg
  FROM r
)
SELECT CAST(npos AS BIGINT) AS npos,
       CAST(nneg AS BIGINT) AS nneg,
       CAST(((r2 - npos * (npos + 1)) * 1000000) // (2 * npos * nneg)
            AS BIGINT) AS auc_e6
FROM agg
"""


def q_components(sf_dir: str):
    """Connected components of the part co-purchase graph (sparser 1/16
    order slice so the graph actually fractures into components), ORACLE-
    CHECKED against a DuckDB recursive-CTE min-label fixpoint. Engine side
    = ``connected_components_distributed`` (driver union-find under the
    5M-pair guard; past it per-round hash join + groupby-min with
    convergence via the monotone label sum — the same machinery the
    near-dup removal path uses), then one tiny aggregate:
    (component = min node id, n_nodes)."""
    from goose_parser_ray.functions.dedup import (
        connected_components_distributed,
    )

    edges = _copurchase_edges(sf_dir, mask=15)
    labels = connected_components_distributed(edges, cols=("u", "v"))
    return pre_aggregated_sum(
        labels.map_batches(
            lambda t: pa.Table.from_arrays(
                [pc.cast(t["label"], pa.int64())], names=["component"]
            ),
            batch_format="pyarrow",
        ),
        keys=["component"], sums={}, count_alias="n_nodes",
    )


SQL_COMPONENTS = """
WITH RECURSIVE
li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
       WHERE (l_orderkey & 15) = 0),
e0 AS (SELECT a.p AS u, b.p AS v FROM li a JOIN li b
       ON a.o = b.o AND a.p < b.p),
edges AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
walk(node, label) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.v, w.label FROM walk w JOIN edges e ON e.u = w.node
  WHERE w.label < e.v
),
lab AS (SELECT node, MIN(label) AS label FROM walk GROUP BY node)
SELECT CAST(label AS BIGINT) AS component, COUNT(*) AS n_nodes
FROM lab GROUP BY label
"""


def q_cdc_apply(sf_dir: str):
    """CDC MERGE / upsert-apply (the Hudi/Delta `MERGE INTO` shape),
    ORACLE-CHECKED: a deterministic change feed derived from the customer
    snapshot (key%10==0 → D, %10==1 → U with +1000.00 balance, %10==2 →
    I under a shifted key) is applied via
    ``functions/relational.apply_changes``: snapshot rows with untouched
    keys survive through ONE hash-partitioned LEFT ANTI join against the
    keys-only feed (exchange sized by the CHANGE volume, not the
    snapshot); U/I payloads union in map-only. Balances as exact cents."""
    from goose_parser_ray.functions.relational import apply_changes

    snap = _read(
        sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"]
    ).map_batches(
        lambda t: pa.Table.from_pydict(
            {
                "c_custkey": t["c_custkey"],
                "c_name": t["c_name"],
                "bal_cents": _cents(t["c_acctbal"]),
            }
        ),
        batch_format="pyarrow",
    )

    def make_feed(t: pa.Table) -> pa.Table:
        # Arrow has no modulo kernel; id - (id // m) * m (ids non-negative)
        k = t["c_custkey"]
        mod = pc.subtract(
            k, pc.multiply(pc.divide(k, pa.scalar(10, pa.int64())),
                           pa.scalar(10, pa.int64()))
        )
        d = t.filter(pc.equal(mod, 0))
        u = t.filter(pc.equal(mod, 1))
        i = t.filter(pc.equal(mod, 2))
        return pa.Table.from_pydict(
            {
                "op": pa.concat_arrays(
                    [
                        pa.array(["D"] * len(d)),
                        pa.array(["U"] * len(u)),
                        pa.array(["I"] * len(i)),
                    ]
                ),
                "c_custkey": pa.concat_arrays(
                    [
                        d["c_custkey"].combine_chunks(),
                        u["c_custkey"].combine_chunks(),
                        pc.add(
                            i["c_custkey"], pa.scalar(1_000_000, pa.int64())
                        ).combine_chunks(),
                    ]
                ),
                "c_name": pa.concat_arrays(
                    [
                        d["c_name"].combine_chunks(),
                        u["c_name"].combine_chunks(),
                        i["c_name"].combine_chunks(),
                    ]
                ),
                "bal_cents": pa.concat_arrays(
                    [
                        d["bal_cents"].combine_chunks(),
                        pc.add(
                            u["bal_cents"], pa.scalar(100_000, pa.int64())
                        ).combine_chunks(),
                        i["bal_cents"].combine_chunks(),
                    ]
                ),
            }
        )

    # pinned: the snapshot feeds BOTH apply_changes sides (anti-join probe
    # and the feed derivation) — lazy lineage would re-read per consumer
    snap = snap.materialize()
    changes = snap.map_batches(make_feed, batch_format="pyarrow")
    return apply_changes(
        snap, changes, key="c_custkey",
        num_partitions=_dedup._default_join_partitions(),
    )


SQL_CDC_APPLY = """
WITH snap AS (
  SELECT c_custkey, c_name,
         CAST(ROUND(100 * c_acctbal) AS BIGINT) AS bal_cents
  FROM customer
),
changes AS (
  SELECT 'D' AS op, c_custkey, c_name, bal_cents
  FROM snap WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT 'U', c_custkey, c_name, bal_cents + 100000
  FROM snap WHERE c_custkey % 10 = 1
  UNION ALL
  SELECT 'I', c_custkey + 1000000, c_name, bal_cents
  FROM snap WHERE c_custkey % 10 = 2
)
SELECT s.c_custkey, s.c_name, s.bal_cents FROM snap s
WHERE s.c_custkey NOT IN (SELECT c_custkey FROM changes)
UNION ALL
SELECT c_custkey, c_name, bal_cents FROM changes WHERE op IN ('U', 'I')
"""


def q_ohlc(sf_dir: str):
    """Financial-style OHLC resample (per-hour open/high/low/close of the
    event value), ORACLE-CHECKED. Open/close are order statistics, not
    sums, so the mergeable partial is (argmin-key value, argmax-key value,
    min, max, count) per (batch, hour): one vectorized pandas
    sort+groupby first/last per batch, then the SAME combine inside one
    shuffle group per hour (hours are bounded by the time DOMAIN — days ×
    24 — not the corpus, so per-group payload is #batches, not #events).
    Total order key = (ts, event_id); values as exact cents."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_id", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "hr": pc.cast(
                    pc.divide(
                        pc.cast(
                            pc.floor_temporal(t["ts"], unit="hour"),
                            pa.int64(),
                        ),
                        3_600_000_000,
                    ),
                    pa.int64(),
                ).to_numpy(zero_copy_only=False),
                "tus": pc.cast(t["ts"], pa.int64()).to_numpy(
                    zero_copy_only=False
                ),
                "eid": t["event_id"].to_numpy(zero_copy_only=False),
                "v": _cents(t["value"]).to_numpy(zero_copy_only=False),
            }
        )
        df = df.sort_values(["hr", "tus", "eid"], kind="mergesort")
        g = df.groupby("hr", sort=False)
        out = g.agg(
            o_tus=("tus", "first"), o_eid=("eid", "first"),
            open_cents=("v", "first"),
            c_tus=("tus", "last"), c_eid=("eid", "last"),
            close_cents=("v", "last"),
            high_cents=("v", "max"), low_cents=("v", "min"),
            n=("v", "size"),
        ).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    def combine(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["o_tus", "o_eid"], kind="mergesort")
        first = g.iloc[0]
        last = g.sort_values(["c_tus", "c_eid"], kind="mergesort").iloc[-1]
        return pd.DataFrame(
            {
                "hr": [np.int64(first["hr"])],
                "open_cents": [np.int64(first["open_cents"])],
                "high_cents": [np.int64(g["high_cents"].max())],
                "low_cents": [np.int64(g["low_cents"].min())],
                "close_cents": [np.int64(last["close_cents"])],
                "n": [np.int64(g["n"].sum())],
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("hr").map_groups(combine, batch_format="pandas")


SQL_OHLC = """
WITH b AS (
  SELECT epoch_us(date_trunc('hour', ts)) // 3600000000 AS hr,
         epoch_us(ts) AS tus, event_id,
         CAST(ROUND(100 * value) AS BIGINT) AS v
  FROM events
),
w AS (
  SELECT hr, v,
         ROW_NUMBER() OVER (PARTITION BY hr ORDER BY tus, event_id)
           AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY hr ORDER BY tus DESC,
                            event_id DESC) AS rn_d
  FROM b
)
SELECT hr,
       MAX(CASE WHEN rn_a = 1 THEN v END) AS open_cents,
       MAX(v) AS high_cents,
       MIN(v) AS low_cents,
       MAX(CASE WHEN rn_d = 1 THEN v END) AS close_cents,
       COUNT(*) AS n
FROM w GROUP BY hr
"""


def q_rolling_median(sf_dir: str):
    """Rolling median (5-event window) of each user's event values in time
    order, ORACLE-CHECKED against DuckDB's windowed ``median``. Exactness
    trick: values are cents ints and a median of ≤5 ints is either an int
    or a half-int, so BOTH sides emit 2×median as BIGINT — no float hash
    hazard. Scale shape = the sessionize template: users coalesce into
    data-proportional hash buckets (one shuffle group per BUCKET, not per
    user), and inside a bucket the whole window pass is one vectorized
    pandas groupby-rolling."""
    import pandas as pd

    from goose_parser_ray.functions.dedup import num_shuffle_buckets

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    nb = num_shuffle_buckets(ds.count())

    def prep(t: pa.Table) -> pa.Table:
        out = pa.Table.from_pydict(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "tus": pc.cast(t["ts"], pa.int64()),
                "v": _cents(t["value"]),
            }
        )
        return _dedup.add_hash_bucket(out, "user_id", nb, "__rb")

    def roll_bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["user_id", "tus", "event_id"], kind="mergesort")
        med = (
            g.groupby("user_id", sort=False)["v"]
            .rolling(5, min_periods=1)
            .median()
            .reset_index(drop=True)
        )
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": g["user_id"].to_numpy(),
                "med2": (2.0 * med.to_numpy()).astype(np.int64),
            }
        )

    ds = ds.map_batches(prep, batch_format="pyarrow")
    return ds.groupby("__rb").map_groups(roll_bucket, batch_format="pandas")


SQL_ROLLING_MEDIAN = """
WITH b AS (
  SELECT event_id, user_id, epoch_us(ts) AS tus,
         CAST(ROUND(100 * value) AS BIGINT) AS v
  FROM events
)
SELECT event_id, user_id,
       CAST(2 * median(v) OVER (
         PARTITION BY user_id ORDER BY tus, event_id
         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS med2
FROM b
"""


def q_jw_pairs(sf_dir: str):
    """Jaro-Winkler similarity join over the distinct part-name domain,
    ORACLE-CHECKED against DuckDB's builtin ``jaro_winkler_similarity``
    (the Python kernel in ``functions/editdist.py`` is calibrated
    term-for-term: 0.7 boost threshold, ≤4-char prefix, 0.1 scale).
    Corpus-scale work = the map-side-combined distinct aggregate; the
    pair grid is DOMAIN-bounded (enforced by ``domain_cap``, documented
    PPJoin escape hatch for free-text domains)."""
    from goose_parser_ray.functions.editdist import jw_pairs_over_domain

    ds = _read(sf_dir, "part", ["p_name"])
    pairs = jw_pairs_over_domain(ds, col="p_name", threshold=0.84)
    return pairs.sort(["name_a", "name_b"])


SQL_JW_PAIRS = """
WITH d AS (SELECT DISTINCT p_name FROM part WHERE p_name IS NOT NULL)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(ROUND(1e6 * jaro_winkler_similarity(a.p_name, b.p_name))
            AS BIGINT) AS jw_e6
FROM d a JOIN d b ON a.p_name < b.p_name
WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.84
ORDER BY name_a, name_b
"""


def q_interval_join(sf_dir: str):
    """Interval (range-overlap) join, ORACLE-CHECKED: every error event
    opens a 10-minute incident window [ts, ts+10min); count the click
    events inside each window. The engine never runs a non-equi join:
    both sides land on a 10-minute GRID — a click lives in exactly one
    cell, an incident fans out to its ≤2 covering cells (map-only,
    vectorized) — so the exchange is one hash equi-join on the cell key
    and the exact boundary check is a map-side filter. Each (incident,
    click) pair meets in precisely the click's cell: no dedup pass
    needed. The classic bucketed range-join rewrite; grid width = window
    width keeps the fan-out at 2."""
    _CELL = 600_000_000  # 10 min in µs

    ds = _read(sf_dir, "events", ["event_id", "event_type", "ts"])

    def incidents(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "error"))
        s = pc.cast(t["ts"], pa.int64())
        cell0 = pc.divide(s, _CELL)
        out = pa.Table.from_pydict(
            {
                "cell": pa.concat_arrays(
                    [
                        cell0.combine_chunks(),
                        pc.add(cell0, pa.scalar(1, pa.int64())).combine_chunks(),
                    ]
                ),
                "incident_id": pa.concat_arrays(
                    [t["event_id"].combine_chunks()] * 2
                ),
                "s": pa.concat_arrays([s.combine_chunks()] * 2),
            }
        )
        # second copy only matters when the window actually crosses the
        # cell boundary — which it always does unless start is aligned;
        # keep both, the boundary filter after the join is exact anyway
        return out

    def clicks(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "click"))
        tus = pc.cast(t["ts"], pa.int64())
        return pa.Table.from_pydict(
            {"cell": pc.divide(tus, _CELL), "t": tus}
        )

    inc = ds.map_batches(incidents, batch_format="pyarrow")
    clk = ds.map_batches(clicks, batch_format="pyarrow")
    hits = inc.join(
        clk, join_type="inner",
        num_partitions=_dedup._default_join_partitions(), on=("cell",),
    ).map_batches(
        lambda t: pa.Table.from_pydict(
            {"incident_id": t["incident_id"]}
        ).filter(
            pc.and_(
                pc.greater_equal(t["t"], t["s"]),
                pc.less(t["t"], pc.add(t["s"], pa.scalar(_CELL, pa.int64()))),
            )
        ),
        batch_format="pyarrow",
    )
    return pre_aggregated_sum(
        hits, keys=["incident_id"], sums={}, count_alias="n_clicks"
    )


SQL_INTERVAL_JOIN = """
WITH i AS (
  SELECT event_id AS incident_id, epoch_us(ts) AS s
  FROM events WHERE event_type = 'error'
),
c AS (SELECT epoch_us(ts) AS t FROM events WHERE event_type = 'click')
SELECT incident_id, COUNT(*) AS n_clicks
FROM i JOIN c ON c.t >= i.s AND c.t < i.s + 600000000
GROUP BY incident_id
"""


def q_weighted_median(sf_dir: str):
    """Weighted median (lower) of the extended price per return flag,
    quantity-weighted, ORACLE-CHECKED. Two-stage exact shape: the corpus
    collapses map-side to (flag, price-cents, Σweight) rows — the
    exchange is bounded by the price DOMAIN, not the row count — then one
    tiny per-flag sorted cumulative-weight pass picks the smallest value
    with 2·cumw ≥ totw. Pure integers end to end."""
    import pandas as pd

    ds = _read(
        sf_dir, "lineitem", ["l_returnflag", "l_extendedprice", "l_quantity"]
    )

    def derive(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "flag": t["l_returnflag"],
                "v": _cents(t["l_extendedprice"]),
                "w": pc.cast(t["l_quantity"], pa.int64()),
            }
        )

    grouped = pre_aggregated_sum(
        ds.map_batches(derive, batch_format="pyarrow"),
        keys=["flag", "v"], sums={"w": "w"},
    )

    def pick(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values("v", kind="mergesort")
        cw = g["w"].cumsum()
        tot = int(g["w"].sum())
        win = g.loc[2 * cw >= tot, "v"].iloc[0]
        return pd.DataFrame(
            {"flag": [g["flag"].iloc[0]], "wmedian_cents": [np.int64(win)]}
        )

    return grouped.groupby("flag").map_groups(pick, batch_format="pandas")


SQL_WEIGHTED_MEDIAN = """
WITH g AS (
  SELECT l_returnflag AS flag,
         CAST(ROUND(100 * l_extendedprice) AS BIGINT) AS v,
         SUM(CAST(l_quantity AS BIGINT)) AS w
  FROM lineitem GROUP BY 1, 2
),
c AS (
  SELECT flag, v,
         SUM(w) OVER (PARTITION BY flag ORDER BY v) AS cw,
         SUM(w) OVER (PARTITION BY flag) AS tw
  FROM g
)
SELECT flag, CAST(MIN(v) AS BIGINT) AS wmedian_cents
FROM c WHERE 2 * cw >= tw GROUP BY flag
"""


def q_unpivot(sf_dir: str):
    """Unpivot / melt (wide→long), ORACLE-CHECKED: the three lineitem
    measure columns become (measure, value_e4) rows — the inverse of
    q_pivot_events. Pure map-side: each batch emits a 3×-stacked Arrow
    table (concat of three projected copies, zero shuffle); a
    deterministic 1/8 orderkey slice keeps the long output inside the
    compare budget while exercising the full stack."""
    ds = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"],
    )
    measures = ("l_quantity", "l_discount", "l_tax")

    def melt(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.equal(
                pc.bit_wise_and(t["l_orderkey"], pa.scalar(7, pa.int64())), 0
            )
        )
        n = len(t)
        return pa.Table.from_pydict(
            {
                "l_orderkey": pa.concat_arrays(
                    [t["l_orderkey"].combine_chunks()] * 3
                ),
                "l_linenumber": pa.concat_arrays(
                    [
                        pc.cast(t["l_linenumber"], pa.int64())
                        .combine_chunks()
                    ]
                    * 3
                ),
                "measure": pa.array(
                    [m for m in measures for _ in range(n)]
                ),
                "value_e4": pa.concat_arrays(
                    [
                        _cents(t[m], 10000).combine_chunks()
                        for m in measures
                    ]
                ),
            }
        )

    return ds.map_batches(melt, batch_format="pyarrow")


SQL_UNPIVOT = """
WITH s AS (SELECT * FROM lineitem WHERE (l_orderkey & 7) = 0)
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       'l_quantity' AS measure,
       CAST(ROUND(10000 * l_quantity) AS BIGINT) AS value_e4 FROM s
UNION ALL
SELECT l_orderkey, CAST(l_linenumber AS BIGINT), 'l_discount',
       CAST(ROUND(10000 * l_discount) AS BIGINT) FROM s
UNION ALL
SELECT l_orderkey, CAST(l_linenumber AS BIGINT), 'l_tax',
       CAST(ROUND(10000 * l_tax) AS BIGINT) FROM s
"""


def q_group_concat(sf_dir: str):
    """Ordered list aggregation (string_agg shape) with BOUNDED output,
    ORACLE-CHECKED: per (lang, source), the first 10 doc_ids in id order,
    comma-joined. List-agg is inherently output-unbounded at corpus
    scale, so the engine keeps only each batch's local top-10 per group
    map-side (the topn combine template) — the exchange carries ≤10 rows
    per (block, group) — and the final join happens on ≤10-element
    groups."""
    import pandas as pd

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "source"])

    def local_head(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values(["lang", "source", "doc_id"], kind="mergesort")
        return pa.Table.from_pandas(
            df.groupby(["lang", "source"], as_index=False).head(10),
            preserve_index=False,
        )

    def final_concat(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["source", "doc_id"], kind="mergesort")
        out = (
            g.groupby("source", as_index=False)
            .agg(
                lang=("lang", "first"),
                doc_ids=(
                    "doc_id",
                    lambda s: ",".join(str(v) for v in s.head(10)),
                ),
            )
        )
        return out[["lang", "source", "doc_ids"]]

    heads = ds.map_batches(local_head, batch_format="pyarrow")
    return heads.groupby("lang").map_groups(
        final_concat, batch_format="pandas"
    )


SQL_GROUP_CONCAT = """
WITH r AS (
  SELECT lang, source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang, source ORDER BY doc_id)
           AS rnk
  FROM documents
)
SELECT lang, source,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids
FROM r WHERE rnk <= 10 GROUP BY lang, source
"""


_COV_DIMS = 8  # leading-dim slice keeps the generated SQL twin readable


def q_embed_cov(sf_dir: str):
    """Distributed covariance matrix of the leading 8 embedding dims
    (the Σx/Σxxᵀ moment-matrix shape every PCA/whitening pass needs),
    ORACLE-CHECKED with pure integers: values quantized to e3 on both
    sides, output = the EXACT covariance numerator n·Σxy − Σx·Σy per
    (i ≤ j) pair plus n (callers divide by n² themselves). One einsum
    partial per batch (8×8 int64 moment matrix + 8 sums + count), a tiny
    single-group combine — nothing corpus-sized crosses the exchange."""
    from goose_parser_ray.functions.similarity import _list_col_to_matrix

    d = _COV_DIMS
    ds = _read(sf_dir, "embeddings", ["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        m = _list_col_to_matrix(t["embedding"])[:, :d].astype(np.float64)
        flat = pa.array(m.reshape(-1))
        q = (
            pc.cast(
                pc.round(
                    pc.multiply(flat, 1e3),
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            )
            .to_numpy(zero_copy_only=False)
            .reshape(m.shape)
        )
        mom = np.einsum("ni,nj->ij", q, q)  # int64-exact
        row = {"n": np.array([len(q)], dtype=np.int64)}
        for i in range(d):
            row[f"s{i}"] = np.array([int(q[:, i].sum())], dtype=np.int64)
        for i in range(d):
            for j in range(i, d):
                row[f"p{i}_{j}"] = np.array([int(mom[i, j])], dtype=np.int64)
        return pa.Table.from_pydict(row)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    s = [int(parts[f"s{i}"].sum()) for i in range(d)]
    out = {"i": [], "j": [], "n": [], "cov_num": []}
    for i in range(d):
        for j in range(i, d):
            p = int(parts[f"p{i}_{j}"].sum())
            out["i"].append(np.int64(i))
            out["j"].append(np.int64(j))
            out["n"].append(np.int64(n))
            out["cov_num"].append(np.int64(n * p - s[i] * s[j]))
    return pa.Table.from_pydict(
        {k: pa.array(v, pa.int64()) for k, v in out.items()}
    )


def _gen_sql_embed_cov() -> str:
    d = _COV_DIMS
    xs = ",\n         ".join(
        f"CAST(ROUND(1000 * list_extract(embedding, {i + 1})) AS BIGINT)"
        f" AS x{i}"
        for i in range(d)
    )
    aggs = ["COUNT(*) AS n"]
    aggs += [f"SUM(x{i}) AS s{i}" for i in range(d)]
    aggs += [
        f"SUM(x{i} * x{j}) AS p{i}_{j}"
        for i in range(d)
        for j in range(i, d)
    ]
    rows = "\n  UNION ALL\n".join(
        f"  SELECT CAST({i} AS BIGINT) AS i, CAST({j} AS BIGINT) AS j, n,"
        f" CAST(n * p{i}_{j} - s{i} * s{j} AS BIGINT) AS cov_num FROM a"
        for i in range(d)
        for j in range(i, d)
    )
    return (
        f"WITH q AS (\n  SELECT {xs}\n  FROM embeddings\n),\n"
        f"a AS (\n  SELECT {', '.join(aggs)} FROM q\n)\n{rows}"
    )


SQL_EMBED_COV = _gen_sql_embed_cov()


def q_find_gaps(sf_dir: str):
    """Sequence-integrity check, ORACLE-CHECKED: maximal missing ranges in
    a deterministically-sliced event-id stream (ids ≡ 5 mod 8 dropped, so
    the gap structure is known-nontrivial). Engine =
    ``functions/relational.gap_ranges``: one range sort, vectorized
    interior neighbor-diff per batch, batch-bounded boundary stitch."""
    from goose_parser_ray.functions.relational import gap_ranges

    ds = _read(sf_dir, "events", ["event_id"]).map_batches(
        lambda t: t.filter(
            pc.not_equal(
                pc.bit_wise_and(t["event_id"], pa.scalar(7, pa.int64())), 5
            )
        ),
        batch_format="pyarrow",
    )
    return gap_ranges(ds, col="event_id")


SQL_FIND_GAPS = """
WITH s AS (SELECT event_id AS id FROM events WHERE (event_id & 7) <> 5),
l AS (SELECT id, LAG(id) OVER (ORDER BY id) AS prev FROM s)
SELECT CAST(prev + 1 AS BIGINT) AS gap_start,
       CAST(id - 1 AS BIGINT) AS gap_end
FROM l WHERE prev IS NOT NULL AND id > prev + 1
"""


def q_order_count_dist(sf_dir: str):
    """Order-count distribution (TPC-H Q13 shape), ORACLE-CHECKED:
    histogram of customers by how many orders they placed — INCLUDING the
    zero bucket, which never appears in the orders table. Engine shape:
    map-side-combined per-customer counts (one narrow row per customer
    crosses the exchange), a count-of-counts re-aggregate, and the zero
    bucket closed-form from two metadata-cheap totals (customer count −
    distinct ordering customers) — no left join against the full customer
    table."""
    orders = _read(sf_dir, "orders", ["o_custkey"])
    per_cust = pre_aggregated_sum(
        orders, keys=["o_custkey"], sums={}, count_alias="c_count"
    ).materialize()  # feeds both the histogram and the distinct total
    hist = pre_aggregated_sum(
        per_cust.drop_columns(["o_custkey"]),
        keys=["c_count"], sums={}, count_alias="custdist",
    )
    n_customers = _read(sf_dir, "customer", ["c_custkey"]).count()
    n_zero = n_customers - per_cust.count()
    if n_zero == 0:
        return hist
    zero = ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "c_count": pa.array([0], pa.int64()),
                "custdist": pa.array([n_zero], pa.int64()),
            }
        )
    )
    return hist.union(zero)


SQL_ORDER_COUNT_DIST = """
WITH per AS (
  SELECT c_custkey, COUNT(o_custkey) AS c_count
  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey
)
SELECT CAST(c_count AS BIGINT) AS c_count, COUNT(*) AS custdist
FROM per GROUP BY c_count
"""


def q_theilsen(sf_dir: str):
    """Theil–Sen robust trend over the 1997 daily-revenue series (median
    of all pairwise slopes — the classic breakdown-point-29% robust
    regressor), ORACLE-CHECKED with exact integer arithmetic: slopes are
    truncated fixed-point e6 values ((Δcents·10⁶) trunc-div Δdays, both
    sides truncate toward zero — DuckDB ``//`` semantics, mirrored in
    numpy), the median is the explicit LOWER median (rank (n+1)//2), and
    the intercept is the lower median of (y·10⁶ − slope_e6·x). The daily
    aggregate is distributed (map-side-combined groupby on ≤365 keys);
    the O(days²) pairwise-slope step is a driver numpy broadcast on the
    DOMAIN-BOUNDED day table (≤66k pairs), never on row-scale data."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    lo, hi = _dt.datetime(1997, 1, 1), _dt.datetime(1998, 1, 1)

    def day_rev(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
            pc.less(t["o_orderdate"], pa.scalar(hi)),
        )
        t2 = t.filter(keep)
        day = pc.days_between(
            pa.scalar(lo), pc.cast(t2["o_orderdate"], pa.timestamp("us"))
        )
        return pa.Table.from_pydict(
            {
                "x": pc.cast(day, pa.int64()),
                "y": _cents(t2["o_totalprice"]),
            }
        )

    daily = pre_aggregated_sum(
        ds.map_batches(day_rev, batch_format="pyarrow"),
        keys=["x"], sums={"y": "y"},
    ).to_pandas()  # ≤365 rows — domain-bounded by construction
    x = daily["x"].to_numpy(np.int64)
    y = daily["y"].to_numpy(np.int64)
    o = np.argsort(x)
    x, y = x[o], y[o]
    i, j = np.triu_indices(len(x), k=1)
    num = (y[j] - y[i]) * 1_000_000
    den = x[j] - x[i]  # x strictly increasing → den > 0

    def trunc_div(n_, d_):
        # mirror DuckDB's // (truncate toward zero; numpy floors)
        q = np.abs(n_) // d_
        return np.where(n_ >= 0, q, -q)

    slopes = np.sort(trunc_div(num, den))
    slope_e6 = int(slopes[(len(slopes) - 1) // 2])  # lower median
    resid = np.sort(y * 1_000_000 - slope_e6 * x)
    intercept_e6 = int(resid[(len(resid) - 1) // 2])
    return pa.Table.from_pydict(
        {
            "n_days": pa.array([len(x)], pa.int64()),
            "n_pairs": pa.array([len(slopes)], pa.int64()),
            "slope_e6": pa.array([slope_e6], pa.int64()),
            "intercept_e6": pa.array([intercept_e6], pa.int64()),
        }
    )


SQL_THEILSEN = """
WITH daily AS (
  SELECT DATEDIFF('day', DATE '1997-01-01', o_orderdate) AS x,
         SUM(CAST(ROUND(100 * o_totalprice) AS BIGINT)) AS y
  FROM orders
  WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1998-01-01'
  GROUP BY 1
),
pairs AS (
  SELECT ((b.y - a.y) * 1000000) // (b.x - a.x) AS s
  FROM daily a JOIN daily b ON b.x > a.x
),
ranked AS (
  SELECT s, ROW_NUMBER() OVER (ORDER BY s) AS rn, COUNT(*) OVER () AS c
  FROM pairs
),
slope AS (SELECT s AS slope_e6 FROM ranked WHERE rn = (c + 1) // 2),
resid AS (
  SELECT d.y * 1000000 - sl.slope_e6 * d.x AS r
  FROM daily d CROSS JOIN slope sl
),
rr AS (
  SELECT r, ROW_NUMBER() OVER (ORDER BY r) AS rn, COUNT(*) OVER () AS c
  FROM resid
)
SELECT CAST((SELECT COUNT(*) FROM daily) AS BIGINT) AS n_days,
       CAST((SELECT COUNT(*) FROM pairs) AS BIGINT) AS n_pairs,
       CAST((SELECT slope_e6 FROM slope) AS BIGINT) AS slope_e6,
       CAST((SELECT r FROM rr WHERE rn = (c + 1) // 2) AS BIGINT)
         AS intercept_e6
"""


def q_calibration(sf_dir: str):
    """Classifier-calibration reliability table + exact-integer Brier
    decomposition over the click/error slice (the AUC query's cohort):
    score = the cents part of ``value`` as a percent-probability (a
    deterministic stand-in model — the operator under test is the
    distributed calibration machinery, not the model), label = click.
    Ten equal-width bins; per bin n, positives, Σscore and the Brier
    contribution Σ(score − 100·label)² in e4 units — all int64, one
    map-side-combined groupby on a 10-key domain. ORACLE-CHECKED."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def parts(t: pa.Table) -> pa.Table:
        keep = pc.is_in(
            t["event_type"],
            value_set=pa.array(["click", "error"]),
        )
        t2 = t.filter(keep)
        v100 = pc.cast(
            pc.round(pc.multiply(t2["value"], pa.scalar(100.0))),
            pa.int64(),
        )
        cents = pc.subtract(
            v100,
            pc.multiply(
                pc.divide(v100, pa.scalar(100, pa.int64())),
                pa.scalar(100, pa.int64()),
            ),
        )
        lab = pc.cast(
            pc.equal(t2["event_type"], pa.scalar("click")), pa.int64()
        )
        err = pc.subtract(cents, pc.multiply(lab, pa.scalar(100, pa.int64())))
        return pa.Table.from_pydict(
            {
                "bin": pc.divide(cents, pa.scalar(10, pa.int64())),
                "n_pos": lab,
                "sum_score": cents,
                "brier_e4": pc.multiply(err, err),
            }
        )

    return pre_aggregated_sum(
        ds.map_batches(parts, batch_format="pyarrow"),
        keys=["bin"],
        sums={"n_pos": "n_pos", "sum_score": "sum_score",
              "brier_e4": "brier_e4"},
        count_alias="n",
    )


SQL_CALIBRATION = """
WITH s AS (
  SELECT CAST(ROUND(100 * value) AS BIGINT) % 100 AS score,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS lab
  FROM events WHERE event_type IN ('click', 'error')
)
SELECT score // 10 AS bin,
       CAST(SUM(lab) AS BIGINT) AS n_pos,
       CAST(SUM(score) AS BIGINT) AS sum_score,
       CAST(SUM((score - 100 * lab) * (score - 100 * lab)) AS BIGINT)
         AS brier_e4,
       COUNT(*) AS n
FROM s GROUP BY 1
"""


def q_knn_classify(sf_dir: str):
    """k-NN classification (k=5, squared-L2) over the embeddings table,
    ORACLE-CHECKED BIT-FOR-BIT: vectors are quantized to e6 integers
    (floor(x·10⁶ + 0.5) — float32→double widening is IEEE-exact, so Ray
    and DuckDB quantize identically) and distances are exact int64 sums,
    making the neighbor ranking (dist asc, train_id asc) and the majority
    vote (count desc, label asc) deterministic on both engines — the
    integer fixed-point discipline every ML query here follows. Train =
    even vec_id, test = odd vec_id. Scale shape: the train side
    (model-sized, label-domain-bounded) is broadcast once via ray.put;
    test rows stream through one map_batches with an int64 Gram-trick
    matmul per batch — no shuffle at all; at a train side too big to
    broadcast this becomes the ann_ivf route (train an index, probe it),
    which q:ann_ivf already implements."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def quantize(t: pa.Table):
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        q = np.floor(m * 1_000_000.0 + 0.5).astype(np.int64)
        return ids, lab, q

    # Train side: bounded (it is the model), collected once and broadcast.
    def _parity(t: pa.Table, rem: int) -> pa.Table:
        return t.filter(
            pc.equal(pc.bit_wise_and(t["vec_id"], pa.scalar(1)), rem)
        )

    train_parts = [
        quantize(t)
        for t in emb.map_batches(
            lambda t: _parity(t, 0), batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow", batch_size=4096)
    ]
    tr_id = np.concatenate([p[0] for p in train_parts])
    tr_lab = np.concatenate([p[1] for p in train_parts])
    tr_q = np.concatenate([p[2] for p in train_parts])
    order = np.argsort(tr_id, kind="stable")
    tr_id, tr_lab, tr_q = tr_id[order], tr_lab[order], tr_q[order]
    tr_sq = (tr_q * tr_q).sum(axis=1)
    ref = ray.put((tr_id, tr_lab, tr_q, tr_sq))
    n_labels = 10

    def classify(t: pa.Table) -> pa.Table:
        ids, true_lab, q = quantize(t)
        a_id, a_lab, a_q, a_sq = ray.get(ref)
        if len(ids) == 0:
            return pa.Table.from_pydict(
                {"test_id": pa.array([], pa.int64()),
                 "true_label": pa.array([], pa.int64()),
                 "pred_label": pa.array([], pa.int64()),
                 "n_votes": pa.array([], pa.int64())}
            )
        d = (q * q).sum(axis=1)[:, None] + a_sq[None, :] - 2 * (q @ a_q.T)
        # stable argsort: equal distances resolve by train_id ascending
        nn = np.argsort(d, axis=1, kind="stable")[:, :5]
        votes = a_lab[nn]
        counts = np.zeros((len(ids), n_labels), np.int64)
        for j in range(5):
            np.add.at(counts, (np.arange(len(ids)), votes[:, j]), 1)
        pred = counts.argmax(axis=1)  # ties -> smallest label
        n_votes = counts.max(axis=1)
        return pa.Table.from_pydict(
            {"test_id": pa.array(ids, pa.int64()),
             "true_label": pa.array(true_lab, pa.int64()),
             "pred_label": pa.array(pred, pa.int64()),
             "n_votes": pa.array(n_votes, pa.int64())}
        )

    return emb.map_batches(
        lambda t: _parity(t, 1), batch_format="pyarrow"
    ).map_batches(classify, batch_format="pyarrow")


SQL_KNN_CLASSIFY = """
WITH e AS (
  SELECT vec_id, label,
         list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))
           AS q
  FROM embeddings
),
tr AS (SELECT * FROM e WHERE vec_id % 2 = 0),
te AS (SELECT * FROM e WHERE vec_id % 2 = 1),
d AS (
  SELECT te.vec_id AS test_id, te.label AS true_label,
         tr.vec_id AS train_id, tr.label AS tl,
         (SELECT SUM((te.q[g.i] - tr.q[g.i]) * (te.q[g.i] - tr.q[g.i]))
          FROM UNNEST(generate_series(1, 64)) AS g(i)) AS dist
  FROM te CROSS JOIN tr
),
nn AS (
  SELECT * FROM d
  QUALIFY ROW_NUMBER() OVER (PARTITION BY test_id
                             ORDER BY dist, train_id) <= 5
),
v AS (
  SELECT test_id, true_label, tl, COUNT(*) AS cnt
  FROM nn GROUP BY 1, 2, 3
)
SELECT test_id,
       CAST(true_label AS BIGINT) AS true_label,
       CAST(tl AS BIGINT) AS pred_label,
       CAST(cnt AS BIGINT) AS n_votes
FROM v
QUALIFY ROW_NUMBER() OVER (PARTITION BY test_id
                           ORDER BY cnt DESC, tl) = 1
"""
