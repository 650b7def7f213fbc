"""Text analysis + multimodal: lang-id, quality, fingerprints, media decode pipelines, top words, extraction surface, link graph, KWIC, postings, z-order, edit-distance, profiler.

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




# ---------------------------------------------------------------------------
# text analysis (heuristics → rows-only)
# ---------------------------------------------------------------------------


def q_lang_id(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = ds.map_batches(
        # task pool: init is 2.6 ms of stopword Arrow sets — actor spin-up
        # costs more than it saves (media_png measurement)
        lambda t: LangIdActor()(t), batch_format="pyarrow"
    )
    return ds.select_columns(["doc_id", "lang_pred"])


def _langid_sql() -> str:
    """Oracle generated from the SAME stopword sets + word-split pattern the
    engine uses (both sides are RE2 splits + set membership — Unicode-safe,
    unlike the old ``\\b`` patterns whose ASCII-only boundary silently never
    matched Cyrillic stopwords, r2 ADVICE)."""
    from goose_parser_ray.functions.textstats import STOPWORDS, WORD_SPLIT_RE

    order = LangIdActor.LANG_ORDER
    counts = ",\n         ".join(
        "CAST(len(list_filter(regexp_split_to_array(lower(text), '"
        + WORD_SPLIT_RE
        + "'), w -> w IN ("
        + ", ".join(f"'{w}'" for w in sorted(STOPWORDS[lang]))
        + "))) AS BIGINT) AS c_" + lang
        for lang in order
    )
    mx = "GREATEST(" + ", ".join(f"c_{lang}" for lang in order) + ")"
    cases = "\n       ".join(
        f"WHEN c_{lang} = {mx} THEN '{lang}'" for lang in order
    )
    return f"""
WITH c AS (
  SELECT doc_id,
         {counts}
  FROM documents
)
SELECT doc_id,
       CASE WHEN {mx} = 0 THEN 'und'
       {cases}
       END AS lang_pred
FROM c
"""


def q_langid_confusion(sf_dir: str):
    """Language-ID CONFUSION MATRIX against the labeled lang column — the
    quality audit you run before trusting a classifier at corpus scale:
    actor-pool prediction (same LangIdActor as q_lang_id, patterns
    compiled once per actor) → map-side combined (label, prediction)
    counts; the exchange is |langs|²-bounded. The SQL twin nests the SAME
    generated stopword classifier, so the whole matrix hash-compares."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])
    pred = ds.map_batches(
        lambda t: LangIdActor()(t), batch_format="pyarrow"
    )
    return pre_aggregated_sum(
        pred.map_batches(
            lambda t: pa.Table.from_arrays(
                [t["lang"], t["lang_pred"]], names=["lang", "lang_pred"]
            ),
            batch_format="pyarrow",
        ),
        keys=["lang", "lang_pred"],
        sums={},
        count_alias="n_docs",
    )


def _langid_confusion_sql() -> str:
    inner = _langid_sql().strip()
    return f"""
WITH pred AS ({inner})
SELECT d.lang, pred.lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents d JOIN pred ON d.doc_id = pred.doc_id
GROUP BY d.lang, pred.lang_pred
"""


def q_quality(sf_dir: str):
    """Quality score emitted as integer basis points (deterministic
    element-wise rounding on both sides — the float-sum parity rule from
    the module docstring applied to a scalar formula)."""
    from goose_parser_ray.functions.textstats import add_quality_score

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = ds.map_batches(
        lambda t: add_quality_score(t, round_digits=None),
        batch_format="pyarrow",
    )
    ds = ds.map_batches(
        lambda t: pa.Table.from_arrays(
            [t["doc_id"], _cents(t["quality"], 10000)],
            names=["doc_id", "quality_bp"],
        ),
        batch_format="pyarrow",
    )
    return ds


def _quality_sql() -> str:
    """Oracle mirrors add_quality_score term by term, association order
    included ((a+b)+(c+d)), from the same English stopword pattern."""
    from goose_parser_ray.functions.textstats import STOPWORDS

    pat = r"(?i)\b(?:" + "|".join(sorted(STOPWORDS["en"])) + r")\b"
    return f"""
WITH f AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(length(regexp_extract_all(text, '\\S+')) AS DOUBLE) AS n_tokens,
         CAST(length(regexp_extract_all(text, '[.!?]')) AS DOUBLE) AS n_punct,
         CAST(length(regexp_extract_all(text, '{pat}')) AS DOUBLE) AS n_stop
  FROM documents
), s AS (
  SELECT doc_id,
         LEAST(n_chars / 500.0, 1.0) AS len_score,
         LEAST(n_punct, 1.0) AS punct_score,
         CASE WHEN n_chars / GREATEST(n_tokens, 1.0) >= 3.0
                   AND n_chars / GREATEST(n_tokens, 1.0) <= 12.0
              THEN 1.0 ELSE 0.0 END AS word_score,
         LEAST((n_stop / GREATEST(n_tokens, 1.0)) * 4.0, 1.0) AS stop_score
  FROM f
)
SELECT doc_id,
       CAST(ROUND(10000 * ((len_score * 0.4 + punct_score * 0.1)
                           + (word_score * 0.3 + stop_score * 0.2))) AS BIGINT)
           AS quality_bp
FROM s
"""


def q_fingerprint(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = ds.map_batches(add_fingerprint, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "fingerprint"])


# ---------------------------------------------------------------------------
# multimodal (stubbed decode, real plumbing)
# ---------------------------------------------------------------------------


def q_media_decode(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def to_payload(t: pa.Table) -> pa.Table:
        # vectorized utf8 -> binary cast (same bytes as str.encode())
        return pa.Table.from_arrays(
            [t["doc_id"], pc.cast(t["text"], pa.binary())],
            names=["doc_id", "payload"],
        )

    ds = ds.map_batches(to_payload, batch_format="pyarrow")
    ds = ds.map_batches(
        ImageDecodeActor,
        batch_format="pyarrow",
        batch_size=16,  # binary payloads: small batches (memory-aware)
        concurrency=(_pool(), _pool()),
    )

    def flatten(t: pa.Table) -> pa.Table:
        meta = t["meta"]
        return pa.Table.from_arrays(
            [
                t["doc_id"],
                pc.struct_field(meta, "width"),
                pc.struct_field(meta, "height"),
                pc.struct_field(meta, "format"),
            ],
            names=["doc_id", "width", "height", "format"],
        )

    return ds.map_batches(flatten, batch_format="pyarrow")


def q_media_pipeline(sf_dir: str):
    """Full multimodal actor chain: payload → decode → resize → frame-sample
    → audio features (all stubs deterministic; the Ray plumbing — chained
    actor pools, small batches, list/struct schemas — is the real artifact).
    Rows-only by nature."""
    from goose_parser_ray.functions.multimodal import (
        AudioFeatureActor,
        FrameSampleActor,
        ImageResizeActor,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def to_payload(t: pa.Table) -> pa.Table:
        # vectorized utf8 -> binary cast (same bytes as str.encode())
        return pa.Table.from_arrays(
            [t["doc_id"], pc.cast(t["text"], pa.binary())],
            names=["doc_id", "payload"],
        )

    pool = max(1, _pool() // 4)  # four chained fixed pools must coexist
    ds = ds.map_batches(to_payload, batch_format="pyarrow")
    ds = ds.map_batches(
        ImageDecodeActor, batch_format="pyarrow", batch_size=16,
        concurrency=(pool, pool),
    )
    ds = ds.map_batches(
        ImageResizeActor, batch_format="pyarrow", batch_size=16,
        concurrency=(pool, pool),
    )
    ds = ds.map_batches(
        FrameSampleActor, batch_format="pyarrow", batch_size=16,
        concurrency=(pool, pool),
    )
    ds = ds.map_batches(
        AudioFeatureActor, batch_format="pyarrow", batch_size=16,
        concurrency=(pool, pool),
    )

    def project(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                t["doc_id"],
                pc.struct_field(t["meta"], "width"),
                pc.list_value_length(t["frame_indices"]),
                pc.list_value_length(t["audio_features"]),
            ],
            names=["doc_id", "width", "n_frames", "n_mels"],
        )

    return ds.map_batches(project, batch_format="pyarrow")


def q_media_pgm(sf_dir: str):
    """REAL image pipeline, oracle-checked end to end: deterministic PGM
    payloads are synthesized per doc (gradient image, size keyed off
    doc_id), round-tripped through actual bytes (encode → binary column →
    actor-pool Netpbm decode → nearest-neighbor 8×8 thumbnail → exact
    integer mean). The DuckDB twin recomputes the sampled pixels in closed
    form — every value is integer arithmetic, so the hash compare is exact.
    This is the non-stub counterpart of the q_media_decode codec stubs."""
    from goose_parser_ray.functions.multimodal import PgmThumbnailActor
    from goose_parser_ray.functions.netpbm import encode_pgm

    def synth(t: pa.Table) -> pa.Table:
        payloads = []
        for d in t["doc_id"].to_pylist():
            w = 16 + (d & 15)
            h = 16 + ((d >> 4) & 15)
            i = np.arange(h, dtype=np.int64)[:, None]
            j = np.arange(w, dtype=np.int64)[None, :]
            img = ((31 * i + 17 * j + d) % 256).astype(np.uint8)
            payloads.append(encode_pgm(img))
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
        lambda t: PgmThumbnailActor()(t),
        batch_format="pyarrow",
        batch_size=64,  # wide binary payloads — small batches (guide)
    )


SQL_MEDIA_PGM = """
WITH dims AS (
  SELECT doc_id,
         16 + (doc_id & 15) AS width,
         16 + ((doc_id // 16) & 15) AS height
  FROM documents
),
pix AS (
  SELECT d.doc_id, d.width, d.height,
         (31 * ((a.i * d.height) // 8) + 17 * ((b.j * d.width) // 8)
          + d.doc_id) % 256 AS val
  FROM dims d,
       UNNEST(generate_series(0, 7)) AS a(i),
       UNNEST(generate_series(0, 7)) AS b(j)
)
SELECT doc_id, width, height,
       CAST(SUM(val) * 15625 AS BIGINT) AS mean_e6
FROM pix GROUP BY doc_id, width, height
"""


def q_data_pipeline(sf_dir: str, checkpoint_dir: "str | None" = None):
    """Composite LLM-training-data pipeline — the ops composed the way a
    real corpus run chains them: quality gate → exact dedup → MinHash
    near-dup removal (distributed verify) → per-doc token stats. Each stage
    is the scale-shaped implementation benchmarked elsewhere; this query
    proves they compose. The deduped stage output is consumed three times
    downstream (candidates, verify join, final filter), so it is
    CHECKPOINTED to partitioned parquet and read back — shards on disk
    instead of a corpus-proportional object-store pin, and a crashed run
    re-enters at the checkpoint: an existing ``_SUCCESS``-marked
    ``checkpoint_dir`` skips the gate+dedup recompute entirely (the
    ``pipelines/extraction.py`` manifest discipline applied to a query
    stage boundary)."""
    import os
    import shutil
    import tempfile

    from goose_parser_ray.functions.textstats import add_quality_score

    if checkpoint_dir is None:
        # per-run unique (no cross-run /tmp race); pass an explicit dir to
        # get cross-run resume semantics.
        checkpoint_dir = tempfile.mkdtemp(prefix="data_pipeline_ckpt_")
        os.rmdir(checkpoint_dir)  # write_parquet recreates it
    ok = os.path.join(checkpoint_dir, "_SUCCESS")
    if not os.path.exists(ok):
        shutil.rmtree(checkpoint_dir, ignore_errors=True)
        ds = _read(sf_dir, "documents", ["doc_id", "text"])
        ds = ds.map_batches(add_quality_score, batch_format="pyarrow")
        ds = ds.map_batches(
            lambda t: t.filter(
                pc.greater_equal(t["quality"], 0.5)
            ).drop_columns(["quality"]),
            batch_format="pyarrow",
        )
        ds = exact_dedup(ds, col="text", id_col="doc_id")
        ds.write_parquet(checkpoint_dir)
        with open(ok, "w"):
            pass  # atomic-enough commit marker: written only after the data
    ds = ray.data.read_parquet(checkpoint_dir, file_extensions=["parquet"])
    kept = minhash_dedup_keep(
        ds,
        jaccard_threshold=0.8,
        docs=ds,
        concurrency=_pool(),
    )

    def stats(t: pa.Table) -> pa.Table:
        n_tok = pc.cast(
            pc.count_substring_regex(t["text"], pattern=r"\S+"), pa.int64()
        )
        return pa.Table.from_arrays(
            [t["doc_id"], n_tok], names=["doc_id", "n_tokens"]
        )

    return kept.map_batches(stats, batch_format="pyarrow")




def q_web_pipeline(sf_dir: str):
    """Flagship web-corpus curation composite, ORACLE-CHECKED end to end:
    WARC archive roundtrip (real shard files on disk) → actor-pool lang-ID
    → quality gate (basis-point threshold — integer-exact on both engines)
    → exact dedup (min-id winner) → per-language doc/token rollup. Every
    stage is the scale-shaped implementation verified individually; the
    composed DuckDB twin nests the SAME generated lang-ID/quality SQL, so
    the whole chain is hash-compared, not just row counts."""
    import hashlib
    import shutil

    from goose_parser_ray.functions.dedup import num_shuffle_buckets
    from goose_parser_ray.functions.textstats import (
        LangIdActor,
        add_quality_score,
    )
    from goose_parser_ray.sources.warc import read_warc, write_warc_shards

    out = "/tmp/web_pipeline_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    shutil.rmtree(out, ignore_errors=True)
    src = _read(sf_dir, "documents", ["doc_id", "source", "text"])
    n_rows = src.count()  # metadata-only (fresh parquet read)
    write_warc_shards(src, out)

    docs = read_warc(out).map_batches(
        lambda t: pa.Table.from_pydict(
            {"doc_id": pc.cast(t["doc_id"], pa.int64()), "text": t["text"]}
        ),
        batch_format="pyarrow",
    )
    docs = docs.map_batches(
        lambda t: LangIdActor()(t), batch_format="pyarrow"
    )

    def gate(t: pa.Table) -> pa.Table:
        t = add_quality_score(t, round_digits=None)
        keep = pc.greater_equal(_cents(t["quality"], 10000), 5000)
        return t.filter(keep).drop_columns(["quality"])

    gated = docs.map_batches(gate, batch_format="pyarrow")
    kept = exact_dedup(
        gated, col="text", id_col="doc_id",
        num_buckets=num_shuffle_buckets(n_rows),
    )

    def stats(t: pa.Table) -> pa.Table:
        n_tok = pc.cast(
            pc.count_substring_regex(t["text"], pattern=r"\S+"), pa.int64()
        )
        return pa.Table.from_pydict(
            {"lang_pred": t["lang_pred"], "n_tok": n_tok}
        )

    return pre_aggregated_sum(
        kept.map_batches(stats, batch_format="pyarrow"),
        keys=["lang_pred"], sums={"n_tok": "sum_tokens"},
        count_alias="n_docs",
    )


def _web_pipeline_sql() -> str:
    """Composed oracle: nests the generated lang-ID and quality twins as
    CTE subqueries (the WARC roundtrip is the identity over documents, so
    the SQL side starts from the table directly)."""
    return f"""
WITH lang AS ({_langid_sql()}),
qual AS ({_quality_sql()}),
gated AS (
  SELECT d.doc_id, d.text, l.lang_pred
  FROM documents d
  JOIN lang l USING (doc_id)
  JOIN qual q USING (doc_id)
  WHERE q.quality_bp >= 5000
),
dedup AS (
  SELECT MIN(doc_id) AS doc_id FROM gated GROUP BY text
)
SELECT g.lang_pred,
       CAST(SUM(length(regexp_extract_all(g.text, '\\S+'))) AS BIGINT)
           AS sum_tokens,
       COUNT(*) AS n_docs
FROM dedup JOIN gated g ON dedup.doc_id = g.doc_id
GROUP BY g.lang_pred
"""


def q_vocab_growth(sf_dir: str):
    """Heaps-law vocabulary growth curve, ORACLE-CHECKED: for every
    distinct token (same tokenizer as lang-ID / top_words) find the FIRST
    doc that introduces it (min doc_id), bucket first-occurrences into 32
    FIXED domain-relative checkpoints (first_doc*32 // (max_doc+1) — the
    checkpoint count never grows with the corpus, unlike a fixed
    docs-per-bucket width), and emit per checkpoint the count of NEW
    terms plus the cumulative vocabulary size — the curve dataset
    curators read to see whether a corpus still contributes novel
    vocabulary or has saturated (dedup/quality regressions show up as a
    flattening). Scale shape: one cheap max aggregate, map-side
    (token → min doc) partials per batch, ONE vocabulary-keyed Min
    aggregate (wordcount shape), then bucket partials; the cumulative
    sum runs on the driver over <= 32 rows."""
    import pandas as pd
    from ray.data.aggregate import Min, Sum

    from goose_parser_ray.functions.textstats import WORD_SPLIT_RE

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial_first(t: pa.Table) -> pa.Table:
        lowered = pc.fill_null(pc.utf8_lower(t["text"]), "")
        words = pc.split_pattern_regex(lowered, pattern=WORD_SPLIT_RE)
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        lens = pc.list_value_length(words).to_numpy()
        flat = pd.Series(pc.list_flatten(words).to_pylist(), dtype=object)
        docs = np.repeat(t["doc_id"].to_numpy(zero_copy_only=False), lens)
        df = pd.DataFrame({"word": flat, "first_doc": docs})
        df = df[df["word"] != ""]
        out = df.groupby("word", as_index=False)["first_doc"].min()
        return pa.Table.from_pandas(out, preserve_index=False)

    firsts = (
        ds.map_batches(partial_first, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Min("first_doc", alias_name="first_doc"))
    )

    max_doc = int(ds.max("doc_id"))

    def floor_bucket(t: pa.Table) -> pa.Table:
        fd = t["first_doc"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = pd.Series(fd * 32 // (max_doc + 1))
        vc = s.value_counts()
        return pa.Table.from_pydict(
            {
                "checkpoint": pa.array(vc.index.to_numpy(np.int64)),
                "new_terms": pa.array(vc.to_numpy(np.int64)),
            }
        )

    buckets = (
        firsts.map_batches(floor_bucket, batch_format="pyarrow")
        .groupby("checkpoint")
        .aggregate(Sum("new_terms", alias_name="new_terms"))
        .sort("checkpoint")
        .to_pandas()  # checkpoint-bounded: rows = docs/100
    )
    buckets["cum_vocab"] = buckets["new_terms"].cumsum().astype(np.int64)
    buckets["new_terms"] = buckets["new_terms"].astype(np.int64)
    return pa.Table.from_pandas(buckets, preserve_index=False)


SQL_VOCAB_GROWTH = """
WITH w AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '[^\\p{L}\\p{N}_]+')) AS word
  FROM documents
),
firsts AS (
  SELECT word, MIN(doc_id) AS first_doc
  FROM w WHERE word != '' GROUP BY word
),
buckets AS (
  SELECT first_doc * 32 // ((SELECT MAX(doc_id) FROM documents) + 1)
           AS checkpoint,
         CAST(COUNT(*) AS BIGINT) AS new_terms
  FROM firsts GROUP BY 1
)
SELECT checkpoint, new_terms,
       CAST(SUM(new_terms) OVER (ORDER BY checkpoint) AS BIGINT) AS cum_vocab
FROM buckets
"""


def q_top_words(sf_dir: str):
    """Exact corpus vocabulary top-k (distributed wordcount): same tokenizer
    as lang-ID (split on non-letter/digit runs, lower-cased), map-side
    partial counts per batch, one vocabulary-keyed aggregate, global sort +
    limit with deterministic tie-break."""
    import pandas as pd

    from goose_parser_ray.functions.textstats import WORD_SPLIT_RE

    ds = _read(sf_dir, "documents", ["text"])

    def partial_counts(t: pa.Table) -> pa.Table:
        lowered = pc.fill_null(pc.utf8_lower(t["text"]), "")
        words = pc.split_pattern_regex(lowered, pattern=WORD_SPLIT_RE)
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        s = pd.Series(pc.list_flatten(words).to_pylist(), dtype=object)
        vc = s[s != ""].value_counts()
        return pa.Table.from_pydict(
            {"word": vc.index.tolist(), "n": vc.to_numpy()}
        )

    ds = ds.map_batches(partial_counts, batch_format="pyarrow")
    ds = pre_aggregated_sum(ds, keys=["word"], sums={"n": "n"})
    return ds.sort(["n", "word"], descending=[True, False]).limit(20)


SQL_TOP_WORDS = """
WITH w AS (
  SELECT unnest(regexp_split_to_array(lower(text), '[^\\p{L}\\p{N}_]+')) AS word
  FROM documents
)
SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM w
WHERE word <> ''
GROUP BY word ORDER BY n DESC, word ASC LIMIT 20
"""


def q_heavy_hitters(sf_dir: str):
    """Scale path for q_top_words: mergeable truncated-counts summaries
    (map-only, one tiny row per batch, no vocabulary shuffle) — rows-only;
    pytest asserts it reproduces the exact top-20 at sf0.01."""
    from goose_parser_ray.functions.sketches import heavy_hitters

    ds = _read(sf_dir, "documents", ["text"])
    return heavy_hitters(ds, "text", k=20)


def q_cms_words(sf_dir: str):
    """Count-min sketch point frequencies (Cormode & Muthukrishnan 2005 —
    the classic mergeable counter sketch; completes the sketch family
    beside HLL, the log-histogram quantile sketch, truncated-counts heavy
    hitters and bloom). Rows-only (hash positions aren't SQL-expressible)
    with deterministic self-verifying integers: the sketch is built
    distributed (one (depth×width) int64 partial per batch, map-side
    sum-coalesce — merge ≡ whole, bit-identical), the exact top-10 words
    come from the oracle-checked wordcount path, and per word we emit
    ``over_ok`` (CMS min-estimate can NEVER undercount — hard invariant,
    1 on every row) and ``bound_ok`` (est − exact ≤ ⌈(e/width)·N⌉, the
    paper's w.p. 1−(1/e)^depth guarantee; deterministic under the fixed
    hash seeds)."""
    import math

    import pandas as pd

    from goose_parser_ray.functions.sketches import cms_build, cms_query
    from goose_parser_ray.functions.textstats import WORD_SPLIT_RE

    width, depth = 2048, 4
    ds = _read(sf_dir, "documents", ["text"])

    def to_words(t: pa.Table) -> pa.Table:
        lowered = pc.fill_null(pc.utf8_lower(t["text"]), "")
        words = pc.split_pattern_regex(lowered, pattern=WORD_SPLIT_RE)
        flat = pc.list_flatten(
            words.combine_chunks()
            if isinstance(words, pa.ChunkedArray)
            else words
        )
        flat = flat.filter(pc.not_equal(flat, ""))
        return pa.Table.from_arrays([flat], names=["word"])

    words_ds = ds.map_batches(to_words, batch_format="pyarrow")
    sketch = cms_build(words_ds, "word", width=width, depth=depth)
    n_total = int(sketch[0].sum())  # each row counts every insert once

    def partial_counts(t: pa.Table) -> pa.Table:
        s = pd.Series(t["word"].to_pylist(), dtype=object)
        vc = s.value_counts()
        return pa.Table.from_pydict(
            {"word": vc.index.tolist(), "n": vc.to_numpy()}
        )

    exact = (
        pre_aggregated_sum(
            words_ds.map_batches(partial_counts, batch_format="pyarrow"),
            keys=["word"],
            sums={"n": "n"},
        )
        .sort(["n", "word"], descending=[True, False])
        .limit(10)
        .to_pandas()
    )
    est = cms_query(sketch, exact["word"].tolist(), width, depth)
    eps_n = math.ceil(math.e / width * n_total)
    exact_n = exact["n"].to_numpy(dtype=np.int64)
    # position-weighted checksum over ALL depth×width int64 registers
    # (r5 item 3): the sketch build is pure integer addition (merge ≡
    # whole), so this pins the exact register state — any change to the
    # hash seeds, the partial layout, or the merge breaks the sweep hash.
    flat = sketch.ravel().astype(object)  # object -> Python ints, no wrap
    reg_ck = int(
        (flat * (np.arange(flat.size, dtype=object) + 1)).sum() % (1 << 61)
    )
    return pd.DataFrame(
        {
            "word": exact["word"],
            "exact_n": exact_n,
            "cms_est": est,
            "over_ok": (est >= exact_n).astype("int64"),
            "bound_ok": (est - exact_n <= eps_n).astype("int64"),
            "register_checksum": np.full(len(exact_n), reg_ck, dtype="int64"),
        }
    )


def q_image_ahash_dedup(sf_dir: str):
    """Perceptual-hash IMAGE dedup, ORACLE-CHECKED end to end — the
    multimodal near-dup path (aHash: the classic pre-embedding image
    fingerprint): deterministic 16×16 gradient PGMs are synthesized per
    doc with every 5k+1 doc REUSING doc 5k's image (injected duplicate
    pairs, the semdedup_invariants pattern), round-tripped through real
    bytes (encode → binary column → actor-pool Netpbm decode → integer
    aHash), then hash-grouped to find the duplicate groups. Every bit is
    exact integer arithmetic (block_sum×64 > total_sum), so the DuckDB
    twin recomputes the hashes in closed form and the value hash matches
    exactly. Output: (doc_id, hash_lo, hash_hi, group_size)."""
    from goose_parser_ray.functions.multimodal import ImageAHashActor
    from goose_parser_ray.functions.netpbm import encode_pgm

    def synth(t: pa.Table) -> pa.Table:
        payloads = []
        for d in t["doc_id"].to_pylist():
            eff = d - 1 if d % 5 == 1 else d
            i = np.arange(16, dtype=np.int64)[:, None]
            j = np.arange(16, dtype=np.int64)[None, :]
            img = ((31 * i + 17 * j + eff) % 256).astype(np.uint8)
            payloads.append(encode_pgm(img))
        return pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    hashes = (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(synth, batch_format="pyarrow")
        .map_batches(
            # task pool, not actor pool: setup is an import bind — actor
            # spin-up costs more than it saves (measured on media_png:
            # stage wall 3.0s -> 1.4s at sf0.1/32 CPUs)
            lambda t: ImageAHashActor()(t),
            batch_format="pyarrow",
            batch_size=64,  # wide binary payloads — small batches (guide)
        )
    )
    counts = pre_aggregated_sum(
        hashes.select_columns(["hash_lo", "hash_hi"]),
        keys=["hash_lo", "hash_hi"],
        sums={},
        count_alias="group_size",
    )
    from goose_parser_ray.functions.dedup import _default_join_partitions

    out = hashes.join(
        counts,
        join_type="inner",
        num_partitions=_default_join_partitions(),
        on=("hash_lo", "hash_hi"),
    )
    return out.sort("doc_id")


SQL_IMAGE_AHASH_DEDUP = """
WITH px AS (
  SELECT d.doc_id,
         i.i, j.j,
         (31*i.i + 17*j.j
          + CASE WHEN d.doc_id % 5 = 1 THEN d.doc_id - 1 ELSE d.doc_id END
         ) % 256 AS v
  FROM documents d,
       UNNEST(generate_series(0, 15)) AS i(i),
       UNNEST(generate_series(0, 15)) AS j(j)
), tot AS (
  SELECT doc_id, SUM(v) AS s FROM px GROUP BY doc_id
), blk AS (
  SELECT doc_id, (i // 2) * 8 + (j // 2) AS idx, SUM(v) AS bs
  FROM px GROUP BY doc_id, (i // 2) * 8 + (j // 2)
), bits AS (
  SELECT b.doc_id, b.idx,
         CASE WHEN b.bs * 64 > t.s THEN 1 ELSE 0 END AS bit
  FROM blk b JOIN tot t USING (doc_id)
), h AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN idx < 32
                       THEN bit * (CAST(1 AS BIGINT) << idx)
                       ELSE 0 END) AS BIGINT) AS hash_lo,
         CAST(SUM(CASE WHEN idx >= 32
                       THEN bit * (CAST(1 AS BIGINT) << (idx - 32))
                       ELSE 0 END) AS BIGINT) AS hash_hi
  FROM bits GROUP BY doc_id
)
SELECT doc_id, hash_lo, hash_hi,
       CAST(COUNT(*) OVER (PARTITION BY hash_hi, hash_lo) AS BIGINT)
         AS group_size
FROM h ORDER BY doc_id
"""


def q_lang_centroids(sf_dir: str):
    """Grouped VECTOR aggregate (the distributed k-means update step —
    what IVF training needs at corpus scale): per-language embedding sums
    as (lang, dim, sum_e6, n) with exact integer parity (element-wise
    1e6-scaling; float32→double widening is lossless on both engines)."""
    import pyarrow.parquet as pq

    from goose_parser_ray.functions.similarity import _list_col_to_matrix

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    joined = broadcast_join(emb, docs, key="vec_id", concurrency=_pool())

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        m = _list_col_to_matrix(t["embedding"])
        # element-wise half-away rounding via the same Arrow kernel as
        # _cents — np.round is half-to-even and would diverge from DuckDB
        flat = pa.array(m.reshape(-1).astype(np.float64))
        ints = pc.cast(
            pc.round(
                pc.multiply(flat, 1e6), round_mode="half_towards_infinity"
            ),
            pa.int64(),
        ).to_numpy()
        df = pd.DataFrame(ints.reshape(m.shape))
        df["lang"] = t["lang"].to_pylist()
        g = df.groupby("lang")
        sums = g.sum()
        ns = g.size()
        dims = np.arange(m.shape[1], dtype=np.int64)
        out = {
            "lang": np.repeat(sums.index.to_numpy(), m.shape[1]),
            "dim": np.tile(dims + 1, len(sums)),
            "sum_e6": sums.to_numpy().reshape(-1),
            "n": np.repeat(ns.to_numpy(), m.shape[1]),
        }
        return pa.Table.from_pydict(out)

    parts = joined.map_batches(partial, batch_format="pyarrow")
    return pre_aggregated_sum(
        parts, keys=["lang", "dim"], sums={"sum_e6": "sum_e6", "n": "n"}
    )


SQL_LANG_CENTROIDS = """
WITH j AS (
  SELECT d.lang, e.embedding
  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
), u AS (
  SELECT lang, i.i AS dim, CAST(j.embedding[i.i] AS DOUBLE) AS x
  FROM j CROSS JOIN (SELECT unnest(range(1, 65)) AS i) i
)
SELECT lang, dim,
       CAST(SUM(CAST(ROUND(1000000 * x) AS BIGINT)) AS BIGINT) AS sum_e6,
       CAST(COUNT(*) AS BIGINT) AS n
FROM u GROUP BY lang, dim
"""


# ---------------------------------------------------------------------------
# flagship extraction (rows-only: DOM semantics are not SQL-expressible)
# ---------------------------------------------------------------------------


def q_extract_spans(sf_dir: str):
    """documents → interleaved span wrap → extraction pipeline → flattened
    span rows (doc_id, seq, kind, text, media_ref)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    ds = ds.map_batches(wrap_flat_documents, batch_format="pyarrow")
    ds = build_extraction_pipeline(
        ds, num_partitions=_dedup._default_join_partitions(), salt_threshold=None,
        concurrency=_pool(), batch_size=32,
    )

    def flatten(t: pa.Table) -> pa.Table:
        # Arrow-native explode: list_parent_indices + list_flatten +
        # struct_field — no Python row loop in the headline output stage
        spans = t["spans"].combine_chunks()
        parent = pc.list_parent_indices(spans)
        flat = pc.list_flatten(spans)
        return pa.Table.from_arrays(
            [
                pc.take(t["doc_id"].combine_chunks(), parent),
                pc.struct_field(flat, "offset"),
                pc.struct_field(flat, "kind"),
                pc.struct_field(flat, "text"),
                pc.struct_field(flat, "media_ref"),
            ],
            names=["doc_id", "seq", "kind", "text", "media_ref"],
        )

    return ds.map_batches(flatten, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def q_extract_rules(sf_dir: str):
    """Rules-mode flagship: a goose rule tree (grid over article paragraphs
    + attr extraction) evaluated through the full distributed pipeline —
    wrap → normalize → actor-pool DOM extract → flatten (rows-only)."""
    rules = {
        "collection": [
            {"name": "title", "scope": "article h1", "transform": [{"type": "trim"}]},
            {"name": "paras", "scope": "article p", "type": "array"},
            {
                "name": "sections",
                "scope": "article",
                "collection": [
                    [
                        {"name": "head", "scope": "h1", "id": True},
                        {"name": "first_para", "scope": "p:first"},
                    ]
                ],
            },
            {"name": "nav_links", "scope": "nav a", "attr": "href", "type": "array"},
        ]
    }
    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    ds = ds.map_batches(wrap_flat_documents, batch_format="pyarrow")
    ds = build_extraction_pipeline(
        ds, rules, num_partitions=_dedup._default_join_partitions(), salt_threshold=None,
        concurrency=_pool(), batch_size=32,
    )

    def flatten(t: pa.Table) -> pa.Table:
        spans = t["spans"].combine_chunks()
        parent = pc.list_parent_indices(spans)
        flat = pc.list_flatten(spans)
        return pa.Table.from_arrays(
            [
                pc.take(t["doc_id"].combine_chunks(), parent),
                pc.struct_field(flat, "offset"),
                pc.struct_field(flat, "text"),
            ],
            names=["doc_id", "seq", "text"],
        )

    return ds.map_batches(flatten, batch_format="pyarrow")


def q_link_graph(sf_dir: str):
    """Hyperlink in-degree over a DOM-extracted link graph, ORACLE-CHECKED.

    Pages are synthesized deterministically from (doc_id, text) — doc ``i``
    links to ``(i*7+k) % 1000`` for ``k = 1..(i%3)+1`` — so SQL states the
    expected edge set in closed form (LATERAL generate_series) while the
    engine must recover it through the REAL extraction stack: tokenizer →
    HTML5 tree builder → compiled ``a[href]`` CSS selector → attribute read,
    with arbitrary entity-escaped document text in the way. Any parser bug
    that drops, duplicates, or reorders anchors breaks the hash match. The
    in-degree rollup is the partial/combiner pattern (one row per
    (batch, dst) crosses the exchange)."""
    from goose_parser_ray.functions.linkgraph import extract_links
    from goose_parser_ray.functions.relational import pre_aggregated_sum

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    edges = extract_links(ds, concurrency=_pool())
    deg = pre_aggregated_sum(edges, ["dst"], {}, count_alias="in_degree")
    return deg.sort("dst")


def q_domain_cap(sf_dir: str):
    """URL curation (C4/RefinedWeb shape), ORACLE-CHECKED: synthesize a
    deterministic URL per document, extract the registrable domain through
    the vectorized RE2 public-suffix path (multi-label ``co.uk`` kept as
    three labels, everything else two — including stripping ``www.``/
    ``cdn.`` subdomains), then cap each domain at 8 documents in
    cross-engine-exact Knuth-hash order. The kept membership itself is
    compared, so the oracle guards both the parser and the cap's
    determinism. Map-side prune bounds the exchange at cap rows per
    (block, domain)."""
    from goose_parser_ray.functions.urltools import (
        add_registrable_domain,
        cap_per_domain,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def add_url(t: pa.Table) -> pa.Table:
        ids = t["doc_id"]
        # Arrow has no modulo kernel; id - (id // m) * m (ids non-negative)
        mod3 = pc.subtract(ids, pc.multiply(pc.divide(ids, 3), pa.scalar(3, pa.int64())))
        sub = pc.if_else(
            pc.equal(mod3, 0),
            pa.scalar("www."),
            pc.if_else(pc.equal(mod3, 1), pa.scalar("cdn."), pa.scalar("")),
        )
        mod2 = pc.subtract(ids, pc.multiply(pc.divide(ids, 2), pa.scalar(2, pa.int64())))
        tld = pc.if_else(pc.equal(mod2, 0), pa.scalar(".com"), pa.scalar(".co.uk"))
        url = pc.binary_join_element_wise(
            pa.scalar("https://"),
            sub,
            t["source"],
            tld,
            pa.scalar("/p/"),
            pc.cast(ids, pa.string()),
            "",
        )
        return pa.Table.from_arrays(
            [ids, url], names=["doc_id", "url"]
        )

    ds = ds.map_batches(add_url, batch_format="pyarrow")
    ds = ds.map_batches(add_registrable_domain, batch_format="pyarrow")
    ds = ds.select_columns(["doc_id", "domain"])
    kept = cap_per_domain(ds, cap=8)
    return kept.sort(["domain", "doc_id"])


SQL_DOMAIN_CAP = """
WITH u AS (
  SELECT doc_id,
         'https://'
         || CASE doc_id % 3 WHEN 0 THEN 'www.' WHEN 1 THEN 'cdn.' ELSE '' END
         || source
         || CASE doc_id % 2 WHEN 0 THEN '.com' ELSE '.co.uk' END
         || '/p/' || doc_id AS url
  FROM documents
), d AS (
  SELECT doc_id,
         regexp_extract(regexp_extract(url, '^https?://([^/:]+)', 1),
                        '([^.]+\\.co\\.uk|[^.]+\\.[^.]+)$', 1) AS domain,
         (doc_id * 2654435761) % 4294967296 AS hv
  FROM u
), r AS (
  SELECT doc_id, domain,
         ROW_NUMBER() OVER (PARTITION BY domain ORDER BY hv, doc_id) AS rn
  FROM d
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, domain
FROM r WHERE rn <= 8
ORDER BY domain, doc_id
"""


def q_sorted_neighborhood(sf_dir: str):
    """Sorted-neighborhood blocking (merge/purge), ORACLE-CHECKED: every
    document pair within rank distance 2 in global (substr(text,1,12),
    doc_id) order. The order-based candidate generator alongside the
    hash-based ones (MinHash/SimHash/Hamming-1/AllPairs). Distributed as
    range-bucketed global dense rank + overlap pair windows — see
    ``functions/blocking.py``; no all-pairs, no driver materialization."""
    from goose_parser_ray.functions.blocking import sorted_neighborhood_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n = ds.count()

    def add_key(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t["doc_id"], pc.utf8_slice_codeunits(t["text"], 0, 12)],
            names=["doc_id", "k"],
        )

    keyed = ds.map_batches(add_key, batch_format="pyarrow")
    pairs = sorted_neighborhood_pairs(
        keyed, key_col="k", id_col="doc_id", window=2, n_rows=n
    )
    return pairs.sort(["id_a", "id_b"])


SQL_SORTED_NEIGHBORHOOD = """
WITH r AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY substr(text, 1, 12), doc_id) AS rn
  FROM documents
)
SELECT CAST(a.doc_id AS BIGINT) AS id_a, CAST(b.doc_id AS BIGINT) AS id_b
FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND 2
ORDER BY id_a, id_b
"""


def q_token_budget(sf_dir: str):
    """Per-language budget fill (training-mixture shape), ORACLE-CHECKED:
    each language contributes documents in cross-engine-exact Knuth-hash
    order until its running character total would exceed 12 000. This is
    the budgeted variant of mixture resampling — deterministic membership
    (stable under re-runs/repartition), exact cumulative gate. Five langs →
    exact per-group scan; at high key cardinality the same plan runs as the
    two-pass bucketed prefix-sum scan (``functions/packing.py``)."""
    import pandas as pd

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def add_h(t: pa.Table) -> pa.Table:
        h = pc.bit_wise_and(
            pc.multiply(t["doc_id"], pa.scalar(2654435761, pa.int64())),
            pa.scalar(4294967295, pa.int64()),
        )
        return t.append_column("hv", pc.cast(h, pa.int64()))

    def fill(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["hv", "doc_id"], kind="mergesort")
        g["cum_chars"] = g["n_chars"].cumsum().astype("int64")
        g = g[g["cum_chars"] <= 12_000]
        return g[["doc_id", "lang", "n_chars", "cum_chars"]]

    ds = ds.map_batches(add_h, batch_format="pyarrow")
    return (
        ds.groupby("lang")
        .map_groups(fill, batch_format="pandas")
        .sort(["lang", "cum_chars"])
    )


SQL_TOKEN_BUDGET = """
WITH h AS (
  SELECT doc_id, lang, n_chars,
         (doc_id * 2654435761) % 4294967296 AS hv
  FROM documents
), c AS (
  SELECT doc_id, lang, n_chars,
         SUM(n_chars) OVER (PARTITION BY lang ORDER BY hv, doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
  FROM h
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
       CAST(n_chars AS BIGINT) AS n_chars, CAST(cum AS BIGINT) AS cum_chars
FROM c WHERE cum <= 12000
ORDER BY lang, cum_chars
"""


def q_kwic(sf_dir: str):
    """Keyword-in-context concordance (the corpus-search surface),
    ORACLE-CHECKED: first occurrence of ``data`` per document with ≤16
    chars of context each side, plus its position. One vectorized RE2
    pass — leftmost-match semantics are identical in Arrow and DuckDB, so
    the context windows hash-match exactly. Map-only at any scale."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def kwic(t: pa.Table) -> pa.Table:
        pos = pc.find_substring(t["text"], "data")
        m = pc.extract_regex(
            t["text"], r"(?P<l>.{0,16})data(?P<r>.{0,16})"
        )
        out = pa.Table.from_arrays(
            [
                t["doc_id"],
                pc.cast(pc.add(pos, 1), pa.int64()),  # 1-based like strpos
                pc.struct_field(m, "l"),
                pc.struct_field(m, "r"),
            ],
            names=["doc_id", "pos", "left_ctx", "right_ctx"],
        )
        return out.filter(pc.greater(out["pos"], 0))

    return ds.map_batches(kwic, batch_format="pyarrow").sort("doc_id")


SQL_KWIC = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(strpos(text, 'data') AS BIGINT) AS pos,
       regexp_extract(text, '(.{0,16})data(.{0,16})', 1) AS left_ctx,
       regexp_extract(text, '(.{0,16})data(.{0,16})', 2) AS right_ctx
FROM documents
WHERE strpos(text, 'data') > 0
ORDER BY doc_id
"""


def q_snippets(sf_dir: str):
    """Search-result snippet generation (best-passage selection),
    ORACLE-CHECKED: for the query {hash, join, merge} each document's
    token stream is scanned with a width-8 sliding window, the window
    with the most query-term hits wins (earliest start on ties — the
    deterministic tie-break every snippet UI needs), and the snippet
    text is rebuilt by re-joining exactly that token slice. Vectorized:
    one membership mask per batch, rolling sums via cumsum difference —
    no per-token Python. The DuckDB twin recomputes every window with a
    window-function rolling sum and rebuilds the identical slice with
    list_slice/array_to_string, so the hash compare certifies window
    placement AND text reconstruction. Scale shape: map-only, the query
    set is a plan constant (broadcast-by-closure), no shuffle."""
    QUERY = {"hash", "join", "merge"}
    W = 8

    def best_window(t: pa.Table) -> pa.Table:
        doc_ids, starts, hits, snips = [], [], [], []
        words = pc.split_pattern(t["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        for d, toks in zip(t["doc_id"].to_pylist(), words.to_pylist()):
            toks = toks or []
            m = np.fromiter((w in QUERY for w in toks), np.int64,
                            count=len(toks))
            if len(toks) <= W:
                s, h = 0, int(m.sum())
                win = toks
            else:
                c = np.concatenate(([0], np.cumsum(m)))
                roll = c[W:] - c[:-W]  # hits in window [s, s+W)
                s = int(np.argmax(roll))  # first max = earliest start
                h = int(roll[s])
                win = toks[s : s + W]
            doc_ids.append(d)
            starts.append(s)
            hits.append(h)
            snips.append(" ".join(win))
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "start_tok": pa.array(starts, pa.int64()),
                "n_hits": pa.array(hits, pa.int64()),
                "snippet": pa.array(snips, pa.string()),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        best_window, batch_format="pyarrow"
    )


SQL_SNIPPETS = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
),
pos AS (
  SELECT doc_id, ts, u.i,
         CASE WHEN ts[u.i] IN ('hash', 'join', 'merge')
              THEN 1 ELSE 0 END AS m
  FROM toks, UNNEST(generate_series(1, LEN(ts))) AS u(i)
),
wins AS (
  SELECT doc_id, ts, i,
         SUM(m) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS h,
         LEN(ts) AS n
  FROM pos
),
ranked AS (
  SELECT doc_id, ts, i, h, n,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY h DESC, i ASC) AS rn
  FROM wins WHERE i <= n - 7 OR n <= 8
)
SELECT doc_id,
       CASE WHEN n <= 8 THEN 0 ELSE i - 1 END AS start_tok,
       CAST(h AS BIGINT) AS n_hits,
       CASE WHEN n <= 8 THEN array_to_string(ts, ' ')
            ELSE array_to_string(list_slice(ts, i, i + 7), ' ') END
         AS snippet
FROM ranked WHERE rn = 1
"""


def q_varbyte_postings(sf_dir: str):
    """Compressed inverted-index blocks (VByte doc-gap coding — the
    classic Lucene-style index layout), ORACLE-CHECKED end to end: the
    (term, doc) pairs are blocked by ``doc_id // 128`` (fixed block
    width, so every group is bounded at ANY corpus size — the full
    per-term posting list is never assembled anywhere), each block's
    sorted docs are delta-coded (absolute first doc, then gaps) and
    encoded through the real ``varbyte`` codec, then DECODED BACK and
    prefix-summed so the emitted checksum (sum of reconstructed doc_ids)
    certifies the byte stream round-trips exactly. n_bytes is the true
    encoded length, which the DuckDB twin states closed-form from the
    VByte 7-bits-per-byte rule. Scale shape: one-doc-one-row makes
    per-batch (term, doc) dedup globally exact; data-proportional term
    buckets; per-group work bounded by the block width."""
    import pandas as pd

    from goose_parser_ray.functions.dedup import (
        add_hash_bucket,
        num_shuffle_buckets,
    )
    from goose_parser_ray.functions.varbyte import (
        decode_varbyte,
        encode_varbyte,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    nb = num_shuffle_buckets(ds.count())

    def pairs(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(t["text"], " ")
        parent = pc.list_parent_indices(words)
        flat = pc.list_flatten(words)
        docs = pc.take(t["doc_id"].combine_chunks(), parent)
        keep = pc.not_equal(flat, "")
        out = pa.Table.from_arrays(
            [flat.filter(keep), docs.filter(keep)], names=["term", "doc_id"]
        )
        df = out.to_pandas().drop_duplicates()
        return add_hash_bucket(
            pa.Table.from_pandas(df, preserve_index=False), "term", nb
        )

    def encode_blocks(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["blk"] = g["doc_id"] // 128
        terms, blks, nds, nbys, cks = [], [], [], [], []
        for (term, blk), grp in g.groupby(["term", "blk"], sort=False):
            docs = np.sort(grp["doc_id"].to_numpy(np.int64))
            deltas = np.concatenate(([docs[0]], np.diff(docs)))
            payload = encode_varbyte(deltas)
            rebuilt = np.cumsum(decode_varbyte(payload))
            terms.append(term)
            blks.append(int(blk))
            nds.append(len(docs))
            nbys.append(len(payload))
            cks.append(int(rebuilt.sum()))
        return pd.DataFrame(
            {
                "term": terms,
                "blk": np.asarray(blks, np.int64),
                "n_docs": np.asarray(nds, np.int64),
                "n_bytes": np.asarray(nbys, np.int64),
                "checksum": np.asarray(cks, np.int64),
            }
        )

    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(encode_blocks, batch_format="pandas")
    )


SQL_VARBYTE_POSTINGS = """
WITH w AS (
  SELECT DISTINCT t.term, d.doc_id
  FROM documents d,
       LATERAL (SELECT unnest(string_split(d.text, ' ')) AS term) t
  WHERE t.term <> ''
),
b AS (
  SELECT term, doc_id, doc_id // 128 AS blk,
         MIN(doc_id) OVER (PARTITION BY term, doc_id // 128) AS first_doc
  FROM w
)
SELECT term, blk,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(CASE WHEN first_doc < 128 THEN 1
                 WHEN first_doc < 16384 THEN 2
                 WHEN first_doc < 2097152 THEN 3
                 WHEN first_doc < 268435456 THEN 4
                 ELSE 5 END
            + COUNT(*) - 1 AS BIGINT) AS n_bytes,
       CAST(SUM(doc_id) AS BIGINT) AS checksum
FROM b GROUP BY term, blk, first_doc
"""


def q_postings(sf_dir: str):
    """Capped inverted-index build (IR surface), ORACLE-CHECKED: for every
    term, its document frequency and the 5 smallest doc_ids that contain it
    (comma-joined). The cap is the scale contract — per-term payload is
    bounded at any corpus size, and the partials are mergeable (local df
    count + local 5-smallest per batch → bucketed merge keeps the 5
    smallest of the union). One doc is one row, so per-batch (term, doc)
    dedup is globally exact. Term buckets are data-proportional."""
    import pandas as pd

    from goose_parser_ray.functions.dedup import (
        add_hash_bucket,
        num_shuffle_buckets,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    nb = num_shuffle_buckets(ds.count())

    def partial(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(t["text"], " ")
        parent = pc.list_parent_indices(words)
        flat = pc.list_flatten(words)
        docs = pc.take(t["doc_id"].combine_chunks(), parent)
        keep = pc.not_equal(flat, "")
        df = pa.Table.from_arrays(
            [flat.filter(keep), docs.filter(keep)], names=["term", "doc_id"]
        ).to_pandas()
        df = df.drop_duplicates()
        df = df.sort_values(["term", "doc_id"], kind="mergesort")
        g = df.groupby("term", sort=False)
        out = g.agg(
            df_p=("doc_id", "size"),
            post_p=(
                "doc_id",
                lambda s: ",".join(map(str, s.head(5))),
            ),
        ).reset_index()
        return add_hash_bucket(
            pa.Table.from_pandas(out, preserve_index=False), "term", nb
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        dfsum = g.groupby("term", sort=False)["df_p"].sum()
        ex = g[["term", "post_p"]].copy()
        ex["post_p"] = ex["post_p"].str.split(",")
        ex = ex.explode("post_p")
        ex["post_p"] = ex["post_p"].astype("int64")
        ex = ex.sort_values(["term", "post_p"], kind="mergesort")
        top = ex.groupby("term", sort=False).head(5)
        posts = top.groupby("term", sort=False)["post_p"].agg(
            lambda s: ",".join(map(str, s))
        )
        out = pd.DataFrame(
            {
                "term": dfsum.index,
                "df": dfsum.to_numpy().astype("int64"),
                "top_postings": posts.reindex(dfsum.index).to_numpy(),
            }
        )
        return out

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return (
        parts.groupby("__b")
        .map_groups(merge, batch_format="pandas")
        .sort("term")
    )


SQL_POSTINGS = """
WITH w AS (
  SELECT DISTINCT t.term, d.doc_id
  FROM documents d,
       LATERAL (SELECT unnest(string_split(d.text, ' ')) AS term) t
  WHERE t.term <> ''
), r AS (
  SELECT term, doc_id,
         ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY term) AS df
  FROM w
)
SELECT term, CAST(MAX(df) AS BIGINT) AS df,
       string_agg(CASE WHEN rn <= 5 THEN CAST(doc_id AS VARCHAR) END,
                  ',' ORDER BY doc_id) AS top_postings
FROM r GROUP BY term ORDER BY term
"""


def q_event_throttle(sf_dir: str):
    """Streaming throttle/debounce dedup, ORACLE-CHECKED: an event survives
    iff the previous event of the same (user, type) — by raw arrival, kept
    or not — is more than 600 s older. LAG semantics (not chained-session
    semantics), so the filter is one vectorized shift per bucketed group;
    buckets are data-proportional on user_id."""
    import pandas as pd

    from goose_parser_ray.functions.dedup import num_shuffle_buckets

    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])
    nb = num_shuffle_buckets(ds.count())

    def add_bucket(t: pa.Table) -> pa.Table:
        return _dedup.add_hash_bucket(t, "user_id", nb, "__db")

    def throttle(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["user_id", "event_type", "ts", "event_id"], kind="mergesort"
        )
        prev = g.groupby(["user_id", "event_type"])["ts"].shift()
        keep = prev.isna() | ((g["ts"] - prev).dt.total_seconds() > 600)
        out = g[keep]
        return pd.DataFrame(
            {
                "event_id": out["event_id"],
                "user_id": out["user_id"],
                "event_type": out["event_type"],
                "ts_s": out["ts"].dt.strftime("%Y-%m-%d %H:%M:%S"),
            }
        )

    ds = ds.map_batches(add_bucket, batch_format="pyarrow")
    return (
        ds.groupby("__db")
        .map_groups(throttle, batch_format="pandas")
        .sort("event_id")
    )


SQL_EVENT_THROTTLE = """
WITH o AS (
  SELECT event_id, user_id, event_type, ts,
         LAG(ts) OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS prev_ts
  FROM events
)
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id,
       event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
FROM o
WHERE prev_ts IS NULL OR ts - prev_ts > INTERVAL 600 SECOND
ORDER BY event_id
"""


def q_zorder(sf_dir: str):
    """Z-order (Morton) clustering key + multi-dimensional range query,
    ORACLE-CHECKED: interleave the low 16 bits of (l_partkey, l_suppkey)
    into a 32-bit z-value — the layout key that makes BOTH dimensions
    range-prunable from one sorted/clustered write (sort by z → parquet
    row-group min/max stats serve part-key and supp-key predicates at
    once). The query returns one z-range slice; the engine side is a pure
    vectorized map (numpy bit-spreading), the oracle states the interleave
    as 32 shift-mask terms. The production layout path is
    ``ds.sort("z").write_parquet(...)`` on the same key."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_suppkey"])

    def add_z(t: pa.Table) -> pa.Table:
        def spread(col):  # 16-bit → even-bit positions of 32
            n = col.to_numpy(zero_copy_only=False).astype(np.uint32)
            n &= np.uint32(0xFFFF)
            n = (n | n << np.uint32(8)) & np.uint32(0x00FF00FF)
            n = (n | n << np.uint32(4)) & np.uint32(0x0F0F0F0F)
            n = (n | n << np.uint32(2)) & np.uint32(0x33333333)
            n = (n | n << np.uint32(1)) & np.uint32(0x55555555)
            return n

        z = spread(t["l_partkey"]) | (spread(t["l_suppkey"]) << np.uint32(1))
        t = t.append_column("z", pa.array(z.astype(np.int64)))
        mask = pc.and_(
            pc.greater_equal(t["z"], 1_000_000), pc.less(t["z"], 1_050_000)
        )
        return t.filter(mask)

    return (
        ds.map_batches(add_z, batch_format="pyarrow")
        .select_columns(["z", "l_orderkey", "l_partkey", "l_suppkey"])
        .sort(["z", "l_orderkey"])
    )


def _sql_zorder() -> str:
    xs = " + ".join(f"(((l_partkey >> {i}) & 1) << {2 * i})" for i in range(16))
    ys = " + ".join(
        f"(((l_suppkey >> {i}) & 1) << {2 * i + 1})" for i in range(16)
    )
    return f"""
WITH m AS (
  SELECT CAST(({xs}) + ({ys}) AS BIGINT) AS z,
         CAST(l_orderkey AS BIGINT) AS l_orderkey,
         CAST(l_partkey AS BIGINT) AS l_partkey,
         CAST(l_suppkey AS BIGINT) AS l_suppkey
  FROM lineitem
)
SELECT z, l_orderkey, l_partkey, l_suppkey
FROM m WHERE z >= 1000000 AND z < 1050000
ORDER BY z, l_orderkey
"""


SQL_ZORDER = _sql_zorder()


def q_editdist_pairs(sf_dir: str):
    """Edit-distance-1 similarity join (FastSS deletion-neighborhood
    blocking — see ``functions/editdist.py``), ORACLE-CHECKED against
    DuckDB's built-in ``levenshtein``: every customer-name pair at exactly
    distance 1. Zero-miss blocking + exact verification, so this is the
    one approximate-family member whose full output hash-matches a brute
    SQL self-join."""
    from goose_parser_ray.functions.editdist import edit1_pairs

    ds = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    pairs = edit1_pairs(ds, col="c_name", id_col="c_custkey")
    return pairs.sort(["id_a", "id_b"])


SQL_EDITDIST_PAIRS = """
SELECT CAST(a.c_custkey AS BIGINT) AS id_a,
       CAST(b.c_custkey AS BIGINT) AS id_b
FROM customer a
JOIN customer b
  ON a.c_custkey < b.c_custkey
 AND levenshtein(a.c_name, b.c_name) = 1
ORDER BY id_a, id_b
"""


_PROFILE_COLS = ["user_id", "event_type", "props"]


def q_profile(sf_dir: str):
    """One-shot data-profiling operator (Deequ shape), ORACLE-CHECKED: per
    column — row count, null count, EXACT distinct count, lexicographic
    min/max (all values profiled through their string form, so one output
    schema covers every input type; integer→string casts format identically
    in both engines). Stats come from mergeable per-batch partials (3 rows
    per batch); the distinct count is one bounded shuffle over per-batch-
    unique (col, v) pairs. Two column-pruned reads of the source — no
    derived-table re-execution, no driver materialization of values."""
    import pandas as pd

    from ray.data.aggregate import Max, Min, Sum

    from goose_parser_ray.functions.relational import (
        distinct_rows,
        pre_aggregated_sum,
    )

    ds = _read(sf_dir, "events", _PROFILE_COLS)

    def long_form(t: pa.Table) -> pa.Table:
        cols, vals = [], []
        for c in _PROFILE_COLS:
            v = pc.cast(t[c], pa.string())
            cols.append(pa.array([c] * t.num_rows, pa.string()))
            vals.append(v.combine_chunks() if hasattr(v, "chunks") else v)
        return pa.Table.from_arrays(
            [pa.concat_arrays(cols), pa.concat_arrays(vals)],
            names=["col", "v"],
        )

    def stats_partial(t: pa.Table) -> pa.Table:
        lf = long_form(t)
        df = lf.to_pandas()
        g = df.groupby("col", dropna=False)
        out = pd.DataFrame(
            {
                "col": list(g.groups),
                "n_p": g.size().to_numpy().astype("int64"),
                "nulls_p": g["v"].apply(lambda s: int(s.isna().sum())).to_numpy(),
                "min_p": g["v"].min().to_numpy(),
                "max_p": g["v"].max().to_numpy(),
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    stats = (
        ds.map_batches(stats_partial, batch_format="pyarrow")
        .groupby("col")
        .aggregate(
            Sum("n_p", alias_name="n"),
            Sum("nulls_p", alias_name="nulls"),
            Min("min_p", alias_name="min_v"),
            Max("max_p", alias_name="max_v"),
        )
        .to_pandas()
    )

    def long_nonnull(t: pa.Table) -> pa.Table:
        lf = long_form(t)
        return lf.filter(pc.is_valid(lf["v"]))

    long = ds.map_batches(long_nonnull, batch_format="pyarrow")
    dis = distinct_rows(long, ["col", "v"])
    nd = (
        pre_aggregated_sum(dis, ["col"], {}, count_alias="n_distinct")
        .to_pandas()
    )

    out = stats.merge(nd, on="col", how="left")
    out["n"] = out["n"].astype("int64")
    out["nulls"] = out["nulls"].astype("int64")
    out["n_distinct"] = out["n_distinct"].fillna(0).astype("int64")
    return out.sort_values("col").reset_index(drop=True)[
        ["col", "n", "nulls", "n_distinct", "min_v", "max_v"]
    ]


SQL_PROFILE = """
WITH p AS (
  SELECT 'user_id' AS col, CAST(user_id AS VARCHAR) AS v FROM events
  UNION ALL SELECT 'event_type', event_type FROM events
  UNION ALL SELECT 'props', props FROM events
)
SELECT col, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls,
       CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct,
       MIN(v) AS min_v, MAX(v) AS max_v
FROM p GROUP BY col ORDER BY col
"""


def q_tree_rollup(sf_dir: str):
    """Hierarchy rollup (recursive-closure class), ORACLE-CHECKED against a
    genuine ``WITH RECURSIVE`` CTE: docs form a decimal tree (parent =
    id // 10) and every node's subtree size is counted. The distributed
    plan exploits the bounded depth (≤ ⌈log10(max_id)⌉): each row fans out
    its ancestor chain ARITHMETICALLY map-side (≤ 8 rows, no joins, no
    iteration) and one partial-combined count per ancestor finishes it —
    the recursion is in the oracle, not the engine."""
    from goose_parser_ray.functions.relational import pre_aggregated_sum

    ds = _read(sf_dir, "documents", ["doc_id"])

    def ancestors(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        chains = [ids]
        cur = ids
        while (cur > 0).any():
            nxt = cur // 10
            # a node's chain continues only while the PREVIOUS link was >0;
            # mark finished chains with -1 and drop them after concat
            nxt = np.where(cur > 0, nxt, -1)
            chains.append(nxt)
            cur = np.where(cur > 0, nxt, np.int64(0))
        flat = np.concatenate(chains)
        flat = flat[flat >= 0]
        return pa.Table.from_pydict({"node": pa.array(flat, pa.int64())})

    fanned = ds.map_batches(ancestors, batch_format="pyarrow")
    return pre_aggregated_sum(
        fanned, ["node"], {}, count_alias="subtree"
    ).sort("node")


SQL_TREE_ROLLUP = """
WITH RECURSIVE a AS (
  SELECT doc_id AS node, doc_id AS anc FROM documents
  UNION ALL
  SELECT node, anc // 10 FROM a WHERE anc > 0
)
SELECT CAST(anc AS BIGINT) AS node, CAST(COUNT(*) AS BIGINT) AS subtree
FROM a GROUP BY anc ORDER BY node
"""


def q_winnow(sf_dir: str):
    """Winnowing document fingerprints (the MOSS plagiarism-detection
    selection scheme) over every document, ORACLE-CHECKED: k-gram (k=8)
    codepoint-polynomial hashes, centered width-7 window minima (w=4 —
    the winnowing density guarantee), per-doc count + sum of distinct
    selected hashes. Map-only: one sliding-window matmul + window-min per
    doc inside ``map_batches`` (textstats.winnow_fingerprints_batch), no
    shuffle at all — the selection is embarrassingly parallel and the
    output is one narrow row per doc. Docs shorter than k emit nothing
    (the SQL position table has no rows for them)."""
    from goose_parser_ray.functions.textstats import (
        winnow_fingerprints_batch,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        n, s = winnow_fingerprints_batch(t["text"].to_pylist())
        keep = n > 0
        return pa.Table.from_pydict(
            {
                "doc_id": t["doc_id"].to_numpy(zero_copy_only=False)[keep],
                "n_fp": pa.array(n[keep], pa.int64()),
                "fp_sum": pa.array(s[keep], pa.int64()),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow")


SQL_WINNOW = """
WITH pos AS (
  SELECT doc_id, g.i AS i,
         CAST(ascii(substr(text, g.i    , 1)) AS BIGINT) * 1
       + CAST(ascii(substr(text, g.i + 1, 1)) AS BIGINT) * 31
       + CAST(ascii(substr(text, g.i + 2, 1)) AS BIGINT) * 961
       + CAST(ascii(substr(text, g.i + 3, 1)) AS BIGINT) * 29791
       + CAST(ascii(substr(text, g.i + 4, 1)) AS BIGINT) * 923521
       + CAST(ascii(substr(text, g.i + 5, 1)) AS BIGINT) * 28629151
       + CAST(ascii(substr(text, g.i + 6, 1)) AS BIGINT) * 887503681
       + CAST(ascii(substr(text, g.i + 7, 1)) AS BIGINT) * 27512614111 AS h
  FROM documents,
       UNNEST(generate_series(1, length(text) - 7)) AS g(i)
  WHERE length(text) >= 8
),
wm AS (
  SELECT doc_id, h,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS mn
  FROM pos
)
SELECT doc_id,
       CAST(COUNT(DISTINCT h) AS BIGINT) AS n_fp,
       CAST(SUM(DISTINCT h) AS BIGINT) AS fp_sum
FROM wm WHERE h = mn GROUP BY doc_id
"""


def q_winnow_dedup_join(sf_dir: str):
    """MOSS-style near-dup join over winnowed fingerprints (the dedup
    companion of q_winnow's per-doc selection), ORACLE-CHECKED: docs are
    fingerprinted with the winnowing scheme the SQL twin states
    position-for-position, over-common fingerprints are dropped with an
    IDF cut (doc-frequency > 32 — MOSS's boilerplate guard, which is also
    the scale story: per-fingerprint pair fan-out is bounded by C(32,2),
    never corpus-proportional), and pairs whose shared rare fingerprints
    cover ≥ half of the smaller doc's fingerprint set are emitted with
    exact integer evidence columns (n_shared, nfp_a, nfp_b). One
    data-proportional shuffle; per-doc count table broadcast under the
    5M-doc guard, hash-partitioned joins past it (tier-parity tested)."""
    from goose_parser_ray.functions.dedup import winnow_dedup_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return winnow_dedup_pairs(ds)


SQL_WINNOW_DEDUP_JOIN = """
WITH pos AS (
  SELECT doc_id, g.i AS i,
         CAST(ascii(substr(text, g.i    , 1)) AS BIGINT) * 1
       + CAST(ascii(substr(text, g.i + 1, 1)) AS BIGINT) * 31
       + CAST(ascii(substr(text, g.i + 2, 1)) AS BIGINT) * 961
       + CAST(ascii(substr(text, g.i + 3, 1)) AS BIGINT) * 29791
       + CAST(ascii(substr(text, g.i + 4, 1)) AS BIGINT) * 923521
       + CAST(ascii(substr(text, g.i + 5, 1)) AS BIGINT) * 28629151
       + CAST(ascii(substr(text, g.i + 6, 1)) AS BIGINT) * 887503681
       + CAST(ascii(substr(text, g.i + 7, 1)) AS BIGINT) * 27512614111 AS h
  FROM documents,
       UNNEST(generate_series(1, length(text) - 7)) AS g(i)
  WHERE length(text) >= 8
),
wm AS (
  SELECT doc_id, h,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS mn
  FROM pos
),
fp AS (SELECT DISTINCT doc_id, h FROM wm WHERE h = mn),
hc AS (SELECT h, COUNT(*) AS cnt FROM fp GROUP BY h),
rare AS (
  SELECT f.doc_id, f.h FROM fp f JOIN hc USING (h) WHERE hc.cnt <= 32
),
nf AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nfp FROM rare GROUP BY doc_id
),
pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b, CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM rare a JOIN rare b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT p.a, p.b, p.n_shared, na.nfp AS nfp_a, nb.nfp AS nfp_b
FROM pairs p
JOIN nf na ON na.doc_id = p.a
JOIN nf nb ON nb.doc_id = p.b
WHERE 2 * p.n_shared >= least(na.nfp, nb.nfp)
"""


def q_robots_rules(sf_dir: str):
    """robots.txt allow/deny evaluation (RFC 9309 / REP longest-match
    semantics: the longest matching rule wins, Allow beats Disallow on a
    length tie, no match means allowed), ORACLE-CHECKED. URLs and the
    per-domain rule set are synthesized deterministically from doc_id —
    domain ``site{id%10}.com`` with Disallow /private/, Allow
    /private/ok/ everywhere plus Disallow /tmp/ on odd domains — so the
    SQL twin states the same rule table inline and must agree on the
    winning rule AND the verdict for every URL. Engine shape: the rule
    set is a compiled constant (broadcast with the plan, bytes not rows);
    per batch, one vectorized starts_with per rule and a numpy
    longest-match/allow-break argmax — rule-count-proportional work per
    row, no shuffle at all."""
    ds = _read(sf_dir, "documents", ["doc_id"])

    # (prefix, allow, parity) — parity None applies to every domain,
    # 1 only to odd domain ids. Longest match wins; allow wins length ties.
    RULES = [
        ("/private/", 0, None),
        ("/private/ok/", 1, None),
        ("/tmp/", 0, 1),
    ]

    def evaluate(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        dom = ids % 10
        mod4 = ids % 4
        seg = np.choose(
            mod4, ["/public/page", "/private/page", "/private/ok/page",
                   "/tmp/cache/page"]
        )
        path = np.char.add(seg.astype("U32"), ids.astype("U20"))
        pa_path = pa.array(path)
        best_score = np.full(len(ids), -1, np.int64)
        best_rule = np.full(len(ids), "", dtype="U16")
        best_allow = np.ones(len(ids), np.int64)  # no match -> allowed
        for prefix, allow, parity in RULES:
            m = pc.starts_with(pa_path, pattern=prefix).to_numpy(
                zero_copy_only=False
            )
            if parity is not None:
                m = m & (dom % 2 == parity)
            score = 2 * len(prefix) + allow
            upd = m & (score > best_score)
            best_score[upd] = score
            best_rule[upd] = prefix
            best_allow[upd] = allow
        url = np.char.add(
            np.char.add("https://site", dom.astype("U4")),
            np.char.add(".com", path),
        )
        return pa.Table.from_pydict(
            {
                "doc_id": t["doc_id"],
                "url": pa.array(url.tolist(), pa.string()),
                "matched_rule": pa.array(best_rule.tolist(), pa.string()),
                "allowed": pa.array(best_allow, pa.int64()),
            }
        )

    return ds.map_batches(evaluate, batch_format="pyarrow")


SQL_ROBOTS_RULES = """
WITH u AS (
  SELECT doc_id, doc_id % 10 AS dom,
         CASE doc_id % 4
           WHEN 0 THEN '/public/page'  || doc_id
           WHEN 1 THEN '/private/page' || doc_id
           WHEN 2 THEN '/private/ok/page' || doc_id
           ELSE '/tmp/cache/page' || doc_id END AS path
  FROM documents
),
r(prefix, allow, parity) AS (
  VALUES ('/private/', 0, NULL), ('/private/ok/', 1, NULL),
         ('/tmp/', 0, 1)
),
m AS (
  SELECT u.doc_id, u.dom, u.path, r.prefix, r.allow
  FROM u JOIN r
    ON starts_with(u.path, r.prefix)
   AND (r.parity IS NULL OR u.dom % 2 = r.parity)
  QUALIFY ROW_NUMBER() OVER (PARTITION BY u.doc_id
                             ORDER BY len(r.prefix) DESC, r.allow DESC) = 1
)
SELECT u.doc_id,
       'https://site' || u.dom || '.com' || u.path AS url,
       coalesce(m.prefix, '') AS matched_rule,
       CAST(coalesce(m.allow, 1) AS BIGINT) AS allowed
FROM u LEFT JOIN m USING (doc_id)
"""


def q_cidr_lookup(sf_dir: str):
    """Geo-IP-style CIDR enrichment with RFC-longest-prefix-match
    semantics, ORACLE-CHECKED: each event gets a deterministic IPv4
    (Knuth multiplicative hash of user_id, exact integer arithmetic on
    both engines), looked up against an inline table of OVERLAPPING
    prefixes (/0 default through /3) where the longest matching prefix
    wins. Engine shape: the CIDR table is a compiled constant; per batch
    one vectorized shift-compare per rule and an argmax over prefix
    lengths — rule-proportional work per row, no shuffle. The same
    broadcast-rules idiom as robots_rules, on the network layer."""
    ds = _read(sf_dir, "events", ["event_id", "user_id"])

    RULES = [  # (prefix_int, bits, tag) — overlapping by construction
        (0x00000000, 0, "default"),
        (0x00000000, 1, "low-half"),
        (0x80000000, 1, "high-half"),
        (0x40000000, 2, "mid-block"),
        (0xC0000000, 3, "c-block"),
    ]

    def lookup(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ip = (uid * 2654435761) % (1 << 32)
        best_len = np.full(len(ip), -1, np.int64)
        best_tag = np.full(len(ip), "", dtype="U12")
        best_pfx = np.full(len(ip), 0, np.int64)
        for pfx, bits, tag in RULES:
            m = (ip >> (32 - bits)) == (pfx >> (32 - bits)) if bits else \
                np.ones(len(ip), bool)
            upd = m & (bits > best_len)
            best_len[upd] = bits
            best_tag[upd] = tag
            best_pfx[upd] = pfx
        dotted = [
            f"{v >> 24}.{(v >> 16) & 255}.{(v >> 8) & 255}.{v & 255}"
            for v in ip.tolist()
        ]  # bounded string format; not a compute hot path
        return pa.Table.from_pydict(
            {
                "event_id": t["event_id"],
                "ip": pa.array(dotted, pa.string()),
                "matched_bits": pa.array(best_len, pa.int64()),
                "tag": pa.array(best_tag.tolist(), pa.string()),
            }
        )

    return ds.map_batches(lookup, batch_format="pyarrow")


SQL_CIDR_LOOKUP = """
WITH ev AS (
  SELECT event_id, (user_id * 2654435761) % 4294967296 AS ip
  FROM events
),
r(pfx, bits, div, tag) AS (
  -- div = 2^(32-bits) as BIGINT: DuckDB's // floors only for integer
  -- divisors (a DOUBLE divisor makes it plain division)
  VALUES (0, 0, 4294967296, 'default'), (0, 1, 2147483648, 'low-half'),
         (2147483648, 1, 2147483648, 'high-half'),
         (1073741824, 2, 1073741824, 'mid-block'),
         (3221225472, 3, 536870912, 'c-block')
),
m AS (
  SELECT ev.event_id, ev.ip, r.bits, r.tag
  FROM ev JOIN r
    ON (ev.ip // r.div) = (r.pfx // r.div)
  QUALIFY ROW_NUMBER() OVER (PARTITION BY ev.event_id
                             ORDER BY r.bits DESC) = 1
)
SELECT event_id,
       (ip // 16777216) || '.' || ((ip // 65536) % 256) || '.'
         || ((ip // 256) % 256) || '.' || (ip % 256) AS ip,
       CAST(bits AS BIGINT) AS matched_bits, tag
FROM m
"""


def q_nfc_normalize(sf_dir: str):
    """Unicode NFC normalization (the text-canonicalization step every
    multilingual pipeline needs before hashing/dedup), ORACLE-CHECKED
    against DuckDB's ICU ``nfc_normalize``: per doc a deterministic
    DECOMPOSED string is synthesized (base letter + U+0301 combining
    acute — some pairs compose to one codepoint, q́-style pairs stay
    two), normalized, and compared on the normalized bytes plus exact
    before/after codepoint counts. Two independent Unicode
    implementations (CPython's unicodedata vs DuckDB's ICU) must agree
    on every row — a real conformance check, not a self-twin. (pyarrow
    16's utf8_normalize does NOT perform canonical composition, so the
    batch maps CPython's C-implemented normalizer over the column —
    still one shuffle-free pass.)"""
    ds = _read(sf_dir, "documents", ["doc_id"])

    def norm(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        base = np.array([chr(97 + i) for i in range(26)])
        raw = [
            "caf" + b + "́ " + b2 + "́x"
            for b, b2 in zip(
                base[ids % 26].tolist(), base[(ids * 7 + 3) % 26].tolist()
            )
        ]
        import unicodedata

        arr = pa.array(raw, pa.string())
        out = pa.array(
            [unicodedata.normalize("NFC", x) for x in raw], pa.string()
        )
        return pa.Table.from_pydict(
            {
                "doc_id": t["doc_id"],
                "nfc": out,
                "cp_before": pc.cast(pc.utf8_length(arr), pa.int64()),
                "cp_after": pc.cast(pc.utf8_length(out), pa.int64()),
            }
        )

    return ds.map_batches(norm, batch_format="pyarrow")


SQL_NFC_NORMALIZE = """
WITH raw AS (
  SELECT doc_id,
         'caf' || chr(CAST(97 + (doc_id % 26) AS INTEGER)) || chr(769)
          || ' ' || chr(CAST(97 + ((doc_id * 7 + 3) % 26) AS INTEGER))
          || chr(769) || 'x' AS s
  FROM documents
)
SELECT doc_id, nfc_normalize(s) AS nfc,
       CAST(length(s) AS BIGINT) AS cp_before,
       CAST(length(nfc_normalize(s)) AS BIGINT) AS cp_after
FROM raw
"""


def q_ua_parse(sf_dir: str):
    """User-agent parsing (the classic log-enrichment stage: browser
    family, major version, bot flag), ORACLE-CHECKED: deterministic UA
    strings are synthesized per event from five templates (Chrome,
    Safari, Firefox, curl, Googlebot) and parsed back with ONE
    vectorized RE2 extract per field — family via alternation match,
    version via the first digit run after the family token, bot via
    case-insensitive substring. The SQL twin parses with the same
    regexes, so template drift or extraction bugs break the hash.
    Shuffle-free single map pass."""
    ds = _read(sf_dir, "events", ["event_id"])

    TPL = [
        "Mozilla/5.0 (Windows NT 10.0) Chrome/{v}.0 Safari/537.36",
        "Mozilla/5.0 (Macintosh; Intel Mac OS X) Version/{v}.1 Safari/605.1",
        "Mozilla/5.0 (X11; Linux x86_64; rv:{v}.0) Gecko/20100101 Firefox/{v}.0",
        "curl/7.{v}.0",
        "Mozilla/5.0 (compatible; Googlebot/2.{v}; +http://www.google.com/bot.html)",
    ]
    FAMS = ["Chrome", "Safari", "Firefox", "curl", "Googlebot"]

    def parse(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        v = (ids % 40 + 60).astype(np.int64)
        which = (ids % 5).astype(np.int64)
        ua = [
            TPL[w].replace("{v}", str(vv))
            for w, vv in zip(which.tolist(), v.tolist())
        ]
        arr = pa.array(ua, pa.string())
        fam = np.array(FAMS)[which]
        # family decided by FIRST match in priority order (Googlebot and
        # curl before the Mozilla families; Firefox before Safari; Chrome
        # before Safari — Chrome UAs contain 'Safari' too)
        fam_extracted = np.full(len(ua), "other", dtype="U12")
        for name in ("Googlebot", "curl", "Firefox", "Chrome", "Safari"):
            hit = pc.match_substring(arr, pattern=name).to_numpy(
                zero_copy_only=False
            )
            fam_extracted[(fam_extracted == "other") & hit] = name
        major = pc.extract_regex(
            arr,
            pattern=r"(?:Chrome/|Version/|Firefox/|curl/7\.|Googlebot/2\.)(?P<m>[0-9]+)",
        )
        major_v = pc.cast(pc.struct_field(major, "m"), pa.int64())
        is_bot = pc.cast(
            pc.match_substring(arr, pattern="bot", ignore_case=True),
            pa.int64(),
        )
        return pa.Table.from_pydict(
            {
                "event_id": t["event_id"],
                "family": pa.array(fam_extracted.tolist(), pa.string()),
                "major": major_v,
                "is_bot": is_bot,
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow")


SQL_UA_PARSE = """
WITH ev AS (
  SELECT event_id, event_id % 5 AS w, event_id % 40 + 60 AS v
  FROM events
), ua AS (
  SELECT event_id,
    CASE w
      WHEN 0 THEN 'Mozilla/5.0 (Windows NT 10.0) Chrome/' || v
                  || '.0 Safari/537.36'
      WHEN 1 THEN 'Mozilla/5.0 (Macintosh; Intel Mac OS X) Version/' || v
                  || '.1 Safari/605.1'
      WHEN 2 THEN 'Mozilla/5.0 (X11; Linux x86_64; rv:' || v
                  || '.0) Gecko/20100101 Firefox/' || v || '.0'
      WHEN 3 THEN 'curl/7.' || v || '.0'
      ELSE 'Mozilla/5.0 (compatible; Googlebot/2.' || v
           || '; +http://www.google.com/bot.html)'
    END AS s
  FROM ev
)
SELECT event_id,
       CASE WHEN contains(s, 'Googlebot') THEN 'Googlebot'
            WHEN contains(s, 'curl') THEN 'curl'
            WHEN contains(s, 'Firefox') THEN 'Firefox'
            WHEN contains(s, 'Chrome') THEN 'Chrome'
            WHEN contains(s, 'Safari') THEN 'Safari'
            ELSE 'other' END AS family,
       CAST(regexp_extract(s,
            '(?:Chrome/|Version/|Firefox/|curl/7\\.|Googlebot/2\\.)([0-9]+)',
            1) AS BIGINT) AS major,
       CAST(CASE WHEN regexp_matches(lower(s), 'bot') THEN 1 ELSE 0 END
            AS BIGINT) AS is_bot
FROM ua
"""


def q_editdist2_pairs(sf_dir: str):
    """Edit-distance-≤2 similarity join (FastSS at k=2 — ≤2-deletion
    neighborhoods intersect iff lev ≤ 2; see
    ``functions/editdist.py:edit2_pairs``), ORACLE-CHECKED against
    DuckDB's built-in ``levenshtein`` over the full cross join, WITH the
    exact distance as a compared column. ``pair_cap`` is raised to 512
    here because zero-padded sequential customer names are a worst-case
    dense key space (largest variant block 294 at sf0.01) — below the cap
    blocking is zero-miss and every candidate is DP-verified, so the
    whole output hash-matches brute force."""
    from goose_parser_ray.functions.editdist import edit2_pairs

    ds = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    pairs = edit2_pairs(
        ds, col="c_name", id_col="c_custkey", pair_cap=512
    )
    return pairs


SQL_EDITDIST2_PAIRS = """
SELECT CAST(a.c_custkey AS BIGINT) AS id_a,
       CAST(b.c_custkey AS BIGINT) AS id_b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
FROM customer a
JOIN customer b
  ON a.c_custkey < b.c_custkey
 AND levenshtein(a.c_name, b.c_name) BETWEEN 1 AND 2
"""


def q_anchor_texts(sf_dir: str):
    """Anchor-text aggregation per link target (the ranking/labeling
    signal web curation builds from what OTHER pages call a URL),
    ORACLE-CHECKED: pages go through the REAL extraction stack —
    tokenizer → HTML5 tree builder → compiled ``a[href]`` selector — but
    this stage reads each link's RENDERED TEXT (``Element.text()``, the
    character-data path) rather than an attribute, then rolls up
    (dst, anchor) → count with the partial/combiner pattern. The SQL twin
    states the expected (target, anchor) multiset in closed form, so a
    text-node split/drop bug in the tree builder breaks the hash."""
    from goose_parser_ray.functions.linkgraph import AnchorTextActor
    from goose_parser_ray.functions.relational import pre_aggregated_sum

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = ds.map_batches(
        # task pool: the stage's state is one compiled selector — actor
        # spin-up costs more than it saves (media_png measurement)
        lambda t: AnchorTextActor()(t),
        batch_format="pyarrow",
        batch_size=512,
    )
    return pre_aggregated_sum(pairs, ["dst", "anchor"], {},
                              count_alias="n_links")


SQL_ANCHOR_TEXTS = """
WITH edges AS (
  SELECT (d.doc_id * 7 + g.k) % 1000 AS dst,
         'ref ' || g.k AS anchor
  FROM documents d,
       LATERAL (SELECT unnest(generate_series(1, d.doc_id % 3 + 1)) AS k) g
)
SELECT dst, anchor, CAST(COUNT(*) AS BIGINT) AS n_links
FROM edges GROUP BY dst, anchor
"""


def q_rendezvous_sharding(sf_dir: str):
    """Rendezvous (highest-random-weight) sharding with a resize
    movement proof, ORACLE-CHECKED: every doc scores each shard with a
    shared integer mix (xor then Knuth multiply, mod 2³²) and lands on
    the argmax — then the SAME scores decide placement at 8 and at 9
    shards, and the compared ``moved`` column certifies HRW's guarantee
    that a resize moves ONLY docs whose new shard is the added one
    (expected 1/9 of the corpus; no doc moves between old shards). This
    is the partitioning math a 100 TB resumable job relies on when the
    cluster grows. Shuffle-free map pass; the SQL twin mirrors the mix
    in HUGEINT then ranks per doc."""
    ds = _read(sf_dir, "documents", ["doc_id"])
    M32 = np.uint64(0xFFFFFFFF)

    def assign(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        scores = np.empty((len(d), 9), np.uint64)
        for s in range(9):
            smix = np.uint64((s * 2654435761) % (1 << 32))
            scores[:, s] = ((d ^ smix) * np.uint64(2654435761)) & M32
        shard8 = scores[:, :8].argmax(axis=1).astype(np.int64)
        shard9 = scores.argmax(axis=1).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "doc_id": t["doc_id"],
                "shard8": pa.array(shard8, pa.int64()),
                "shard9": pa.array(shard9, pa.int64()),
                "moved": pa.array(
                    (shard8 != shard9).astype(np.int64), pa.int64()
                ),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


SQL_RENDEZVOUS_SHARDING = """
WITH sc AS (
  SELECT d.doc_id, s.s,
         CAST((xor(d.doc_id, (s.s * 2654435761) % 4294967296)
               * CAST(2654435761 AS HUGEINT)) % 4294967296 AS BIGINT)
           AS score
  FROM documents d, (SELECT unnest(generate_series(0, 8)) AS s) s
),
r8 AS (
  SELECT doc_id, s AS shard8 FROM sc WHERE s < 8
  QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
                             ORDER BY score DESC, s ASC) = 1
),
r9 AS (
  SELECT doc_id, s AS shard9 FROM sc
  QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
                             ORDER BY score DESC, s ASC) = 1
)
SELECT doc_id, CAST(shard8 AS BIGINT) AS shard8,
       CAST(shard9 AS BIGINT) AS shard9,
       CAST(CASE WHEN shard8 <> shard9 THEN 1 ELSE 0 END AS BIGINT)
         AS moved
FROM r8 JOIN r9 USING (doc_id)
"""


def q_homoglyph_domains(sf_dir: str):
    """Homoglyph (IDN-spoofing) domain detection via Unicode confusable
    skeletons, ORACLE-CHECKED: every 7th doc registers a lookalike of an
    existing domain with one Latin letter swapped for its Cyrillic twin
    (i→U+0456, e→U+0435, o→U+043E — visually identical, byte-distinct),
    the skeleton map folds confusables back to ASCII (chained vectorized
    replace_substring — the UTS #39 skeleton idea over a bounded table),
    and grouping by skeleton surfaces every spoof cluster: skeletons
    carrying MORE THAN ONE raw variant are the attacks. Two-level
    aggregate: map-side (skeleton, raw) partial counts, one exchange
    over distinct variants, then a skeleton-bounded rollup. The twin
    re-states the synthesis and the same replace chain."""
    from ray.data.aggregate import Min, Sum

    from goose_parser_ray.functions.relational import pre_aggregated_sum

    CONF = [("і", "i"), ("е", "e"), ("о", "o")]

    def synth(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        base = ["site" + str(x % 400) + ".com" for x in d]
        out = []
        for x, b in zip(d, base):
            if x % 7 == 3:
                which = CONF[x % 3]
                # 'i' appears in "site", 'e' in "site", 'o' in ".com"
                out.append(b.replace(which[1], which[0], 1))
            else:
                out.append(b)
        return pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "domain": pa.array(out, pa.string())}
        )

    def skeletonize(t: pa.Table) -> pa.Table:
        s = t["domain"]
        for bad, good in CONF:
            s = pc.replace_substring(s, pattern=bad, replacement=good)
        return t.append_column("skeleton", s)

    ds = (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(synth, batch_format="pyarrow")
        .map_batches(skeletonize, batch_format="pyarrow")
    )

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = df.groupby(["skeleton", "domain"], as_index=False).agg(
            n_docs=("doc_id", "size"), first_doc=("doc_id", "min")
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    variants = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["skeleton", "domain"])
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Min("first_doc", alias_name="first_doc"),
        )
    )

    def rollup(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = df.groupby("skeleton", as_index=False).agg(
            n_variants=("domain", "nunique"),
            n_docs=("n_docs", "sum"),
            first_doc=("first_doc", "min"),
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    rolled = (
        variants.map_batches(rollup, batch_format="pyarrow")
        .groupby("skeleton")
        .aggregate(
            Sum("n_variants", alias_name="n_variants"),
            Sum("n_docs", alias_name="n_docs"),
            Min("first_doc", alias_name="first_doc"),
        )
    )

    def flag(t: pa.Table) -> pa.Table:
        nv = t["n_variants"].to_numpy(zero_copy_only=False)
        return t.append_column("spoofed", pa.array(nv > 1, pa.bool_()))

    return rolled.map_batches(flag, batch_format="pyarrow")


SQL_HOMOGLYPH_DOMAINS = """
WITH raw AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 3 AND doc_id % 3 = 0
              THEN 'sіte' || (doc_id % 400) || '.com'
              WHEN doc_id % 7 = 3 AND doc_id % 3 = 1
              THEN 'sitе' || (doc_id % 400) || '.com'
              WHEN doc_id % 7 = 3 AND doc_id % 3 = 2
              THEN 'site' || (doc_id % 400) || '.cоm'
              ELSE 'site' || (doc_id % 400) || '.com' END AS domain
  FROM documents
),
sk AS (
  SELECT doc_id, domain,
         replace(replace(replace(domain, 'і', 'i'),
                         'е', 'e'),
                 'о', 'o') AS skeleton
  FROM raw
)
SELECT skeleton,
       CAST(COUNT(DISTINCT domain) AS BIGINT) AS n_variants,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(doc_id) AS first_doc,
       COUNT(DISTINCT domain) > 1 AS spoofed
FROM sk GROUP BY skeleton
"""


def q_index_merge(sf_dir: str):
    """LSM-style inverted-index SEGMENT MERGE with tombstones,
    ORACLE-CHECKED: a base segment (docs with id % 4 != 3), a delta
    segment adding the rest, and tombstones deleting every doc with
    id % 8 == 1 are merged into fresh VByte posting blocks — the
    compaction a log-structured index runs continuously, where the delta
    OVERRIDES the base (a tombstone wins over any add for the same
    (term, doc)). All three inputs flow as one tagged (term, doc, op)
    stream; blocks stay bounded by the doc_id // 128 width; per-group
    resolution is a vectorized keep = add AND NOT deleted mask; the
    surviving docs re-encode through the real varbyte codec with the
    decode-back prefix-sum checksum, so the twin (same filtered doc set,
    closed-form byte lengths) certifies the merged bytes exactly."""
    import pandas as pd

    from goose_parser_ray.functions.dedup import (
        add_hash_bucket,
        num_shuffle_buckets,
    )
    from goose_parser_ray.functions.varbyte import (
        decode_varbyte,
        encode_varbyte,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    nb = num_shuffle_buckets(ds.count())

    def tagged_pairs(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(t["text"], " ")
        parent = pc.list_parent_indices(words)
        flat = pc.list_flatten(words)
        docs = pc.take(t["doc_id"].combine_chunks(), parent)
        keep = pc.not_equal(flat, "")
        df = pa.Table.from_arrays(
            [flat.filter(keep), docs.filter(keep)], names=["term", "doc_id"]
        ).to_pandas().drop_duplicates()
        # every (term, doc) is an add (base segment for id%4!=3, delta
        # segment for id%4==3 — same rows either way); tombstones ride
        # the same stream as op=1 rows for deleted docs
        d = df["doc_id"].to_numpy(np.int64)
        df["op"] = 0
        dels = df[d % 8 == 1].copy()
        dels["op"] = 1
        out = pd.concat([df, dels], ignore_index=True)
        return add_hash_bucket(
            pa.Table.from_pandas(out, preserve_index=False), "term", nb
        )

    def merge_blocks(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["blk"] = g["doc_id"] // 128
        terms, blks, nds, nbys, cks = [], [], [], [], []
        for (term, blk), grp in g.groupby(["term", "blk"], sort=False):
            deleted = set(
                grp.loc[grp["op"] == 1, "doc_id"].to_numpy(np.int64)
            )
            adds = grp.loc[grp["op"] == 0, "doc_id"].to_numpy(np.int64)
            docs = np.sort(np.unique(adds[~np.isin(adds, list(deleted))]))
            if docs.size == 0:
                continue
            deltas = np.concatenate(([docs[0]], np.diff(docs)))
            payload = encode_varbyte(deltas)
            rebuilt = np.cumsum(decode_varbyte(payload))
            terms.append(term)
            blks.append(int(blk))
            nds.append(docs.size)
            nbys.append(len(payload))
            cks.append(int(rebuilt.sum()))
        return pd.DataFrame(
            {
                "term": terms,
                "blk": np.asarray(blks, np.int64),
                "n_docs": np.asarray(nds, np.int64),
                "n_bytes": np.asarray(nbys, np.int64),
                "checksum": np.asarray(cks, np.int64),
            }
        )

    return (
        ds.map_batches(tagged_pairs, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(merge_blocks, batch_format="pandas")
    )


SQL_INDEX_MERGE = """
WITH w AS (
  SELECT DISTINCT t.term, d.doc_id
  FROM documents d,
       LATERAL (SELECT unnest(string_split(d.text, ' ')) AS term) t
  WHERE t.term <> '' AND d.doc_id % 8 != 1
),
b AS (
  SELECT term, doc_id, doc_id // 128 AS blk,
         MIN(doc_id) OVER (PARTITION BY term, doc_id // 128) AS first_doc
  FROM w
)
SELECT term, blk,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(CASE WHEN first_doc < 128 THEN 1
                 WHEN first_doc < 16384 THEN 2
                 WHEN first_doc < 2097152 THEN 3
                 WHEN first_doc < 268435456 THEN 4
                 ELSE 5 END
            + COUNT(*) - 1 AS BIGINT) AS n_bytes,
       CAST(SUM(doc_id) AS BIGINT) AS checksum
FROM b GROUP BY term, blk, first_doc
"""
