"""Media codecs + robust stats: line dedup, WAV/PNG/PDF/spectrum, grouped quantiles, KS, autocorr, URL canonicalization, Benford, EWMA, entropy, Mann-Whitney, attribution, TWAP, survival, Gini.

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




def q_line_dedup(sf_dir: str):
    """RefinedWeb-style duplicated-passage REMOVAL (the rewrite step that
    `dup_chunks` only signals), ORACLE-CHECKED: split every doc into
    non-overlapping 8-word segments, drop every segment that occurs in ≥2
    distinct documents, and REASSEMBLE each doc from its surviving segments
    in original order. Two honest shuffles: segments hash-bucket by content
    (data-proportional count) for the distinct-doc tally, then regroup by
    doc for the rebuild. All string surgery is Arrow-vectorized — the
    segment texts come from ONE ``pc.binary_join`` over an offset-sliced
    flat word array (no per-row join), and the rebuild joins kept segments
    the same way."""
    import pandas as pd

    from goose_parser_ray.functions.dedup import (
        add_hash_bucket,
        num_shuffle_buckets,
    )

    SEG = 8
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    nb = num_shuffle_buckets(ds.count() * 32)  # ≈ segments per doc bound

    def segments(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # empty block: the [0]-seeded starts array
            # would mismatch the zero-length repeat counts below
            return pa.Table.from_pydict(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "seg_no": pa.array([], pa.int64()),
                    "seg": pa.array([], pa.string()),
                    "__b": pa.array([], pa.int64()),
                }
            )
        words = pc.split_pattern(t["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        counts = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        counts = counts.astype(np.int64)
        flat = pc.list_flatten(words)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        n_segs = (counts + SEG - 1) // SEG
        doc_ends = np.cumsum(counts)
        doc_starts = np.concatenate([[0], doc_ends[:-1]])
        total_segs = int(n_segs.sum())
        seg_doc_start = np.repeat(
            np.concatenate([[0], np.cumsum(n_segs)[:-1]]), n_segs
        )
        seg_idx = np.arange(total_segs, dtype=np.int64) - seg_doc_start
        seg_starts = np.repeat(doc_starts, n_segs) + SEG * seg_idx
        offsets = np.concatenate(
            [seg_starts, [doc_ends[-1] if len(doc_ends) else 0]]
        )
        seg_list = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat)
        out = pa.Table.from_pydict(
            {
                "doc_id": pa.array(
                    np.repeat(t["doc_id"].to_numpy(), n_segs)
                ),
                "seg_no": pa.array(seg_idx),
                "seg": pc.binary_join(seg_list, " "),
            }
        )
        return add_hash_bucket(out, "seg", nb)

    def mark(g: pd.DataFrame) -> pd.DataFrame:
        docs_with = g.groupby("seg")["doc_id"].transform("nunique")
        out = g[["doc_id", "seg_no", "seg"]].copy()
        out["dup"] = (docs_with > 1).astype("int64")
        return out

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "seg_no"], kind="mergesort")
        stats = (
            g.groupby("doc_id", sort=True)
            .agg(n_segs=("seg", "size"), n_removed=("dup", "sum"))
            .reset_index()
        )
        kept = g[g["dup"] == 0]
        if len(kept):
            docs = kept["doc_id"].to_numpy()
            change = np.flatnonzero(np.diff(docs)) + 1
            offsets = np.concatenate([[0], change, [len(docs)]])
            seg_arr = pa.array(kept["seg"], pa.string())
            joined = pc.binary_join(
                pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), seg_arr),
                " ",
            )
            clean = pd.DataFrame(
                {"doc_id": docs[offsets[:-1]], "clean_text": joined.to_pandas()}
            )
        else:
            clean = pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "clean_text": pd.Series([], dtype=object),
                }
            )
        out = stats.merge(clean, on="doc_id", how="left")
        out["clean_text"] = out["clean_text"].fillna("")
        return out[["doc_id", "clean_text", "n_segs", "n_removed"]]

    marked = (
        ds.map_batches(segments, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(mark, batch_format="pandas")
        .map_batches(
            lambda t: add_hash_bucket(t, "doc_id", nb, out="__db"),
            batch_format="pyarrow",
        )
    )
    return marked.groupby("__db").map_groups(rebuild, batch_format="pandas")


SQL_LINE_DEDUP = """
WITH w AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS word,
         unnest(range(len(string_split(text, ' ')))) AS ord
  FROM documents
), seg AS (
  SELECT doc_id, ord // 8 AS seg_no,
         string_agg(word, ' ' ORDER BY ord) AS seg
  FROM w GROUP BY doc_id, ord // 8
), dup AS (
  SELECT seg, COUNT(DISTINCT doc_id) AS docs_with FROM seg GROUP BY seg
)
SELECT s.doc_id,
       COALESCE(string_agg(CASE WHEN d.docs_with < 2 THEN s.seg END,
                           ' ' ORDER BY s.seg_no), '') AS clean_text,
       CAST(COUNT(*) AS BIGINT) AS n_segs,
       CAST(SUM(CASE WHEN d.docs_with >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_removed
FROM seg s JOIN dup d USING (seg)
GROUP BY s.doc_id
"""


def q_media_wav(sf_dir: str):
    """REAL audio pipeline, oracle-checked end to end: deterministic square
    waves are synthesized per doc (amplitude / half-period / length keyed
    off doc_id), round-tripped through actual RIFF/PCM16 bytes (encode →
    binary column → actor-pool WAV decode → exact integer features:
    energy Σx², peak, strict-sign zero crossings). The DuckDB twin
    recomputes every feature in closed form from the same parameters — all
    integer arithmetic, exact hash compare. The audio sibling of
    q_media_pgm; the stub codecs in q_media_decode remain for formats the
    sandbox genuinely can't decode."""
    from goose_parser_ray.functions.multimodal import WavFeatureActor
    from goose_parser_ray.functions.wav import encode_wav_pcm16

    def synth(t: pa.Table) -> pa.Table:
        payloads = []
        for d in t["doc_id"].to_pylist():
            n = 800 + (d % 50) * 16
            half = 4 + (d % 8)
            amp = 1000 + (d % 100) * 10
            idx = np.arange(n, dtype=np.int64)
            x = np.where((idx // half) % 2 == 0, amp, -amp).astype(np.int16)
            payloads.append(encode_wav_pcm16(x, sample_rate=16_000))
        return pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        synth, batch_format="pyarrow"
    )
    return ds.map_batches(
        # task pool, not actor pool: WavFeatureActor's setup is an import
        # bind — actor spin-up costs more than it saves (measured
        # on media_png: stage wall 3.0s -> 1.4s at sf0.1/32 CPUs)
        lambda t: WavFeatureActor()(t),
        batch_format="pyarrow",
        batch_size=64,  # wide binary payloads — small batches (guide)
    )


SQL_MEDIA_WAV = """
WITH p AS (
  SELECT doc_id,
         800 + (doc_id % 50) * 16 AS n,
         4 + (doc_id % 8) AS half,
         1000 + (doc_id % 100) * 10 AS amp
  FROM documents
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_samples,
       CAST(16000 AS BIGINT) AS sample_rate,
       CAST(n * amp * amp AS BIGINT) AS energy,
       CAST(amp AS BIGINT) AS peak,
       CAST((n - 1) // half AS BIGINT) AS zero_crossings
FROM p
"""


def q_media_png(sf_dir: str):
    """REAL compressed-image pipeline, oracle-checked end to end:
    deterministic RGB gradients are synthesized per doc, encoded through
    the in-repo zlib PNG codec with a per-row CYCLING scanline filter
    (None/Sub/Up/Average/Paeth all exercised on every image), decoded in
    an actor pool, and summarized as the FULL-raster pixel sum — so the
    hash compare against the closed-form DuckDB twin proves every byte of
    DEFLATE + unfiltering reconstruction, not just a sampled thumbnail.
    The compressed sibling of q_media_pgm/q_media_ppm."""
    from goose_parser_ray.functions.multimodal import PngStatsActor
    from goose_parser_ray.functions.pngmini import encode_png

    def synth(t: pa.Table) -> pa.Table:
        payloads = []
        for d in t["doc_id"].to_pylist():
            w = 16 + (d & 15)
            h = 16 + ((d >> 4) & 15)
            i = np.arange(h, dtype=np.int64)[:, None, None]
            j = np.arange(w, dtype=np.int64)[None, :, None]
            c = np.arange(3, dtype=np.int64)[None, None, :]
            img = ((31 * i + 17 * j + 7 * c + d) % 256).astype(np.uint8)
            payloads.append(encode_png(img, filter_mode="cycle"))
        return pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        synth, batch_format="pyarrow"
    )
    return ds.map_batches(
        # task pool, not actor pool: setup is an import bind — actor
        # spin-up costs more than it saves (measured here: stage wall
        # 3.0s -> 1.4s at sf0.1/32 CPUs)
        lambda t: PngStatsActor()(t),
        batch_format="pyarrow",
        batch_size=64,  # wide binary payloads — small batches (guide)
    )


SQL_MEDIA_PNG = """
WITH dims AS (
  SELECT doc_id,
         16 + (doc_id & 15) AS width,
         16 + ((doc_id // 16) & 15) AS height
  FROM documents
),
pix AS (
  SELECT d.doc_id, d.width, d.height,
         (31 * a.i + 17 * b.j + 7 * e.c + d.doc_id) % 256 AS val
  FROM dims d,
       UNNEST(generate_series(0, d.height - 1)) AS a(i),
       UNNEST(generate_series(0, d.width - 1)) AS b(j),
       UNNEST(generate_series(0, 2)) AS e(c)
)
SELECT doc_id, width, height, CAST(3 AS BIGINT) AS channels,
       CAST(SUM(val) AS BIGINT) AS px_sum
FROM pix GROUP BY doc_id, width, height
"""


def q_audio_spectrum(sf_dir: str):
    """REAL frequency-domain audio features, oracle-checked: square waves
    whose period divides the clip length exactly are synthesized per doc,
    round-tripped through RIFF/PCM16 bytes, then analyzed with a full-clip
    ``np.fft.rfft`` in an actor pool. For an exactly-periodic square wave
    the spectrum is analytically sparse (odd harmonics of n/(2·half), all
    other bins identically zero), so the emitted integer features —
    dominant bin, its Hz, active-bin count at a 10×-amplitude threshold —
    are decision-margin-exact despite the float FFT, and the DuckDB twin
    states them closed-form. The frequency-domain sibling of q_media_wav's
    time-domain features."""
    from goose_parser_ray.functions.multimodal import SpectrumActor
    from goose_parser_ray.functions.wav import encode_wav_pcm16

    def synth(t: pa.Table) -> pa.Table:
        payloads = []
        for d in t["doc_id"].to_pylist():
            n = 32 * (25 + d % 50)
            half = 2 ** (1 + d % 4)  # 2/4/8/16 — period 2·half divides n
            amp = 1000 + (d % 100) * 10
            idx = np.arange(n, dtype=np.int64)
            x = np.where((idx // half) % 2 == 0, amp, -amp).astype(np.int16)
            payloads.append(encode_wav_pcm16(x, sample_rate=16_000))
        return pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        synth, batch_format="pyarrow"
    )
    return ds.map_batches(
        # task pool, not actor pool: SpectrumActor's setup is an import
        # bind — actor spin-up costs more than it saves (measured
        # on media_png: stage wall 3.0s -> 1.4s at sf0.1/32 CPUs)
        lambda t: SpectrumActor()(t),
        batch_format="pyarrow",
        batch_size=64,
    )


SQL_AUDIO_SPECTRUM = """
WITH p AS (
  SELECT doc_id,
         32 * (25 + doc_id % 50) AS n,
         CAST(POWER(2, 1 + doc_id % 4) AS BIGINT) AS half
  FROM documents
)
SELECT doc_id,
       CAST(n // (2 * half) AS BIGINT) AS dom_bin,
       CAST(8000 // half AS BIGINT) AS dom_freq_hz,
       CAST((half + 1) // 2 AS BIGINT) AS n_active_bins
FROM p
"""


def q_grouped_quantiles(sf_dir: str):
    """Exact per-group quantile BANDS (p25/p50/p75/p90) computed the way
    that still works at 10¹² rows: instead of sorting each group's raw
    values (q_quantiles — group payload grows with the corpus), aggregate
    to per-(lang, value) COUNTS first — the partial/combiner shuffle moves
    at most |langs| × |value domain| rows no matter the corpus size — then
    pick each quantile closed-form from the per-lang cumulative counts.
    Same quantile_disc definition as DuckDB (smallest v with
    cum(v) ≥ ⌈q·n⌉)."""
    import pandas as pd

    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    counts = pre_aggregated_sum(
        ds, keys=["lang", "n_chars"], sums={}, count_alias="cnt"
    )

    QS = [("p25", 0.25), ("p50", 0.50), ("p75", 0.75), ("p90", 0.90)]

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("n_chars", kind="mergesort")
        cum = g["cnt"].cumsum().to_numpy()
        vals = g["n_chars"].to_numpy()
        n = int(cum[-1])
        row = {"lang": [g["lang"].iloc[0]], "n_docs": [np.int64(n)]}
        for name, q in QS:
            target = int(np.ceil(q * n))
            row[name] = [np.int64(vals[np.searchsorted(cum, target)])]
        return pd.DataFrame(row)

    return counts.groupby("lang").map_groups(pick, batch_format="pandas")


SQL_GROUPED_QUANTILES = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(quantile_disc(n_chars, 0.25) AS BIGINT) AS p25,
       CAST(quantile_disc(n_chars, 0.50) AS BIGINT) AS p50,
       CAST(quantile_disc(n_chars, 0.75) AS BIGINT) AS p75,
       CAST(quantile_disc(n_chars, 0.90) AS BIGINT) AS p90
FROM documents GROUP BY lang
"""


def q_geo_mean(sf_dir: str):
    """Per-group GEOMETRIC mean (the right average for multiplicative
    quantities like doc-length ratios) under the repo's fixed-point log
    discipline: each ln(n_chars) is e6-rounded per element and summed as
    int64 (exact in any order — same recipe as bm25/nb_classify), so the
    distributed sum hash-matches the SQL twin; ONE scalar exp per group at
    the end mirrors the twin's float op order."""

    ds = _read(sf_dir, "documents", ["lang", "n_chars"])

    def ln_e6(t: pa.Table) -> pa.Table:
        # positive-domain guard matches the SQL twin's WHERE: DuckDB LN(0)
        # raises while numpy yields -inf — filter both sides identically
        t = t.filter(pc.greater(t["n_chars"], pa.scalar(0, pa.int64())))
        x = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        ln = np.floor(np.log(x) * 1e6 + 0.5).astype(np.int64)
        return pa.Table.from_pydict({"lang": t["lang"], "ln_e6": pa.array(ln)})

    agg = pre_aggregated_sum(
        ds.map_batches(ln_e6, batch_format="pyarrow"),
        keys=["lang"], sums={"ln_e6": "sum_ln_e6"}, count_alias="n_docs",
    )

    def finish(t: pa.Table) -> pa.Table:
        s = t["sum_ln_e6"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = t["n_docs"].to_numpy(zero_copy_only=False).astype(np.float64)
        gm = np.floor(np.exp(s / 1e6 / n) * 100 + 0.5).astype(np.int64)
        return t.append_column("geo_mean_c2", pa.array(gm))

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_GEO_MEAN = """
SELECT lang,
       CAST(SUM(CAST(ROUND(LN(n_chars) * 1000000) AS BIGINT)) AS BIGINT)
           AS sum_ln_e6,
       COUNT(*) AS n_docs,
       CAST(ROUND(EXP(SUM(CAST(ROUND(LN(n_chars) * 1000000) AS BIGINT))
                      / 1000000.0 / COUNT(*)) * 100) AS BIGINT)
           AS geo_mean_c2
FROM documents WHERE n_chars > 0 GROUP BY lang
"""


def q_window_distinct_users(sf_dir: str):
    """Exact COUNT(DISTINCT user) per hopping window (1h window / 30min
    hop) — the dedup-WITHIN-window shape the plain hopping aggregate can't
    express (distinct is not a sum). Two bounded stages: fan-out →
    per-(window, user) dedup via the map-side-combined count aggregate
    (its output is the distinct pair set), then a second rollup counts
    pairs per window. Both exchanges move per-key partials only; no raw
    event ever shuffles twice."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def fan_out(t: pa.Table) -> pa.Table:
        base = pc.floor_temporal(t["ts"], multiple=30, unit="minute")
        prev = pc.subtract(
            base, pa.scalar(1_800_000_000, pa.duration("us"))
        )
        users = pa.concat_arrays([pc.cast(t["user_id"], pa.int64()).combine_chunks()] * 2)
        starts = pa.concat_arrays(
            [base.combine_chunks(), prev.combine_chunks()]
        )
        win = pc.strftime(starts, "%Y-%m-%d %H:%M:00")
        return pa.Table.from_arrays([win, users], names=["win_start", "user_id"])

    pairs = pre_aggregated_sum(
        ds.map_batches(fan_out, batch_format="pyarrow"),
        keys=["win_start", "user_id"], sums={}, count_alias="__n",
    ).drop_columns(["__n"])
    return pre_aggregated_sum(
        pairs, keys=["win_start"], sums={}, count_alias="n_users"
    )


SQL_WINDOW_DISTINCT_USERS = """
WITH w AS (
  SELECT user_id,
         unnest([date_trunc('minute', ts) - INTERVAL (EXTRACT(minute FROM ts)::INT % 30) MINUTE,
                 date_trunc('minute', ts) - INTERVAL (EXTRACT(minute FROM ts)::INT % 30) MINUTE - INTERVAL 30 MINUTE]) AS ws
  FROM events
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:00') AS win_start,
       COUNT(DISTINCT user_id) AS n_users
FROM w GROUP BY 1
"""


def q_phrase_search(sf_dir: str):
    """Exact PHRASE search (consecutive-word match) through positional
    postings — the IR operator `postings`/`bm25` can't express (bag-of-words
    scoring ignores adjacency). One pass explodes (doc, position) rows for
    the PHRASE TERMS ONLY (map-side filter — the exchange carries the three
    terms' postings, not the corpus); every candidate row re-aligns to its
    implied phrase START (pos − term_index), and a start with all three
    terms present is a match — a per-(doc, start) count==3 test, vectorized
    per doc bucket. Requires distinct phrase words (one row per word per
    position); repeated-word phrases would need per-term multiplicity."""
    import pandas as pd

    from goose_parser_ray.functions.dedup import (
        add_hash_bucket,
        num_shuffle_buckets,
    )

    PHRASE = ["slow", "hash", "batch"]
    terms = pa.array(PHRASE)
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    nb = num_shuffle_buckets(ds.count())

    def positions(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # empty block: see q_line_dedup.segments
            return pa.Table.from_pydict(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "start": pa.array([], pa.int64()),
                    "term": pa.array([], pa.int64()),
                    "__b": pa.array([], pa.int64()),
                }
            )
        words = pc.split_pattern(t["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        counts = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        counts = counts.astype(np.int64)
        flat = pc.list_flatten(words)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        ords = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(
            starts, counts
        )
        docs = np.repeat(t["doc_id"].to_numpy(), counts)
        tidx = pc.index_in(flat, value_set=terms)
        keep = pc.is_valid(tidx).to_numpy(zero_copy_only=False)
        tidx_np = tidx.to_numpy(zero_copy_only=False)[keep].astype(np.int64)
        out = pa.Table.from_pydict(
            {
                "doc_id": pa.array(docs[keep]),
                # phrase start this occurrence would imply
                "start": pa.array(ords[keep] - tidx_np),
                "term": pa.array(tidx_np),
            }
        )
        return add_hash_bucket(out, "doc_id", nb, out="__b")

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        # distinct phrase words → one row per (doc, start, term); a start
        # holding all 3 terms is a complete phrase occurrence
        hits = (
            g.groupby(["doc_id", "start"], sort=False)["term"]
            .size()
            .reset_index(name="k")
        )
        hits = hits[hits["k"] == len(PHRASE)]
        out = hits.groupby("doc_id", sort=False).size().reset_index(
            name="n_matches"
        )
        out["n_matches"] = out["n_matches"].astype("int64")
        return out

    return (
        ds.map_batches(positions, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(verify, batch_format="pandas")
    )


SQL_PHRASE_SEARCH = """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
         unnest(range(len(string_split(text, ' ')))) AS ord
  FROM documents
)
SELECT a.doc_id, COUNT(*) AS n_matches
FROM w a
JOIN w b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
JOIN w c ON a.doc_id = c.doc_id AND c.ord = a.ord + 2
WHERE a.word = 'slow' AND b.word = 'hash' AND c.word = 'batch'
GROUP BY a.doc_id
"""


def q_media_pdf(sf_dir: str):
    """REAL PDF layout-text pipeline, oracle-checked end to end: each doc's
    first 12 words are typeset into an actual single-page PDF (FlateDecode
    content stream, correct xref) and round-tripped through real bytes —
    binary column → actor-pool parse (object walk, zlib inflate, Tj
    tokenization) → extracted text. The DuckDB twin recomputes the expected
    text closed-form from the same words, so the hash compare certifies the
    whole encode→parse path. This replaces the stub-only PDF branch of
    q_media_decode for the north rule's media-span parse obligation."""
    from goose_parser_ray.functions.multimodal import PdfTextActor
    from goose_parser_ray.functions.pdfmini import encode_pdf

    def synth(t: pa.Table) -> pa.Table:
        payloads = []
        for txt in t["text"].to_pylist():
            words = (txt or "").split(" ")[:12]
            lines = [" ".join(words[i : i + 4]) for i in range(0, len(words), 4)]
            payloads.append(encode_pdf(lines))
        return pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        synth, batch_format="pyarrow"
    )
    return ds.map_batches(
        # task pool, not actor pool: PdfTextActor's setup is an import
        # bind — actor spin-up costs more than it saves (measured
        # on media_png: stage wall 3.0s -> 1.4s at sf0.1/32 CPUs)
        lambda t: PdfTextActor()(t),
        batch_format="pyarrow",
        batch_size=64,  # wide binary payloads — small batches (guide)
    )


SQL_MEDIA_PDF = """
WITH w AS (
  SELECT doc_id,
         list_slice(string_split(text, ' '), 1, 12) AS first12,
         len(string_split(text, ' ')) AS n_words
  FROM documents
)
SELECT doc_id,
       CAST(CEIL(LEAST(n_words, 12) / 4.0) AS BIGINT) AS n_lines,
       array_to_string(first12, ' ') AS extracted_text,
       CAST(length(array_to_string(first12, ' ')) AS BIGINT) AS n_chars
FROM w
"""


def q_ks_test(sf_dir: str):
    """Two-sample Kolmogorov–Smirnov distance between the click and error
    value distributions, ORACLE-CHECKED with pure-integer arithmetic:
    D = max_v |F₁(v)·n₂ − F₂(v)·n₁| / (n₁·n₂) over the cents-quantized
    value domain, so the numerator is an exact BIGINT prefix extremum and
    ``d_e6 = max·1e6 // (n1·n2)`` matches DuckDB ``//`` with no float
    anywhere (valid while n₁·n₂ < 2⁶³ — beyond that the statistic itself
    needs fewer than e6 digits anyway).

    Scale shape: the exchange is bounded by the score DOMAIN (map-side
    combine → grouped (v, n_click, n_error)); both CDFs ride ONE
    distributed range-bucketed scan by folding them into the signed
    per-group weight w = c₁·n₂ − c₂·n₁, whose max |inclusive prefix sum|
    IS the KS numerator."""
    import pandas as pd

    from goose_parser_ray.functions.packing import global_scan_offsets

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["event_type"], value_set=pa.array(["click", "error"]))
        t = t.filter(keep)
        v = _cents(t["value"]).to_numpy(zero_copy_only=False)
        pos = (
            pc.equal(t["event_type"], "click")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        g = pd.DataFrame({"v": v, "p": pos}).groupby("v", sort=False).agg(
            c1=("p", "sum"), c=("p", "size")
        )
        return pa.Table.from_pydict(
            {
                "v": g.index.to_numpy(np.int64),
                "c1": g["c1"].to_numpy(np.int64),
                "c2": (g["c"] - g["c1"]).to_numpy(np.int64),
            }
        )

    grouped = pre_aggregated_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["v"],
        sums={"c1": "c1", "c2": "c2"},
    ).materialize()  # consumed 3× (totals + scan passes); domain-bounded small
    n_groups = max(1, grouped.count())
    tot = grouped.map_batches(
        lambda t: pa.Table.from_pydict(
            {
                "n1": [int(pc.sum(t["c1"]).as_py() or 0)],
                "n2": [int(pc.sum(t["c2"]).as_py() or 0)],
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    n1, n2 = int(tot["n1"].sum()), int(tot["n2"].sum())

    def weight(t: pa.Table) -> pa.Table:
        c1 = t["c1"].to_numpy(zero_copy_only=False)
        c2 = t["c2"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({"v": t["v"], "w": c1 * n2 - c2 * n1})

    scanned = global_scan_offsets(
        grouped.map_batches(weight, batch_format="pyarrow"),
        order_col="v",
        size_col="w",
        offset_col="w_before",
        n_rows=n_groups,
    )

    def local_max(t: pa.Table) -> pa.Table:
        w = t["w"].to_numpy(zero_copy_only=False)
        wb = t["w_before"].to_numpy(zero_copy_only=False)
        m = int(np.abs(wb + w).max()) if len(w) else 0
        return pa.Table.from_pydict({"m": [m]})

    parts = scanned.map_batches(local_max, batch_format="pyarrow").to_pandas()
    d_num = int(parts["m"].max()) if len(parts) else 0
    return pa.Table.from_pydict(
        {
            "n1": pa.array([n1], pa.int64()),
            "n2": pa.array([n2], pa.int64()),
            "d_e6": pa.array([d_num * 1_000_000 // max(1, n1 * n2)], pa.int64()),
        }
    )


SQL_KS_TEST = """
WITH s AS (
  SELECT CAST(ROUND(100 * value) AS BIGINT) AS v,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS pos
  FROM events WHERE event_type IN ('click', 'error')
),
g AS (
  SELECT v, CAST(SUM(pos) AS BIGINT) AS c1,
         CAST(SUM(1 - pos) AS BIGINT) AS c2
  FROM s GROUP BY v
),
n AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2 FROM g),
c AS (
  SELECT CAST(SUM(c1 * (SELECT n2 FROM n) - c2 * (SELECT n1 FROM n))
              OVER (ORDER BY v) AS BIGINT) AS f
  FROM g
)
SELECT n1, n2,
       CAST((SELECT MAX(ABS(f)) FROM c) * 1000000 // (n1 * n2) AS BIGINT) AS d_e6
FROM n
"""


def q_autocorr(sf_dir: str):
    """Pooled lag-1 autocorrelation of event values (per-user LAG pairs),
    ORACLE-CHECKED. Values quantize to integer units so every moment
    (n, Σx, Σy, Σxy, Σx², Σy²) stays below 2⁵³ at compare scale — the
    BIGINT→DOUBLE casts are then EXACT on both sides and the single float
    expression (corr_e6 via sqrt) is mirrored op-for-op, so FLOOR lands
    identically (IEEE mult/div/sqrt are correctly rounded).

    Scale shape: the user_deltas machinery — hash-bucketed users with
    data-proportional bucket count, one vectorized sort+shift per bucket,
    then six integer partials per bucket to the driver (exact in any
    accumulation order)."""
    import math

    import pandas as pd

    from goose_parser_ray.functions.dedup import num_shuffle_buckets

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    nb = num_shuffle_buckets(ds.count())

    def add_bucket(t: pa.Table) -> pa.Table:
        t = pa.Table.from_arrays(
            [t["user_id"], t["ts"], t["event_id"], _cents(t["value"], 1)],
            names=["user_id", "ts", "event_id", "v"],
        )
        return _dedup.add_hash_bucket(t, "user_id", nb, "__db")

    def moments(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        prev = g.groupby("user_id")["v"].shift()
        mask = prev.notna()
        x = prev[mask].to_numpy(np.int64)
        y = g.loc[mask, "v"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "n": [len(x)],
                "sx": [int(x.sum())],
                "sy": [int(y.sum())],
                "sxy": [int((x * y).sum())],
                "sxx": [int((x * x).sum())],
                "syy": [int((y * y).sum())],
            }
        )

    parts = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__db")
        .map_groups(moments, batch_format="pandas")
        .to_pandas()
    )
    n = int(parts["n"].sum())
    sx, sy = int(parts["sx"].sum()), int(parts["sy"].sum())
    sxy = int(parts["sxy"].sum())
    sxx, syy = int(parts["sxx"].sum()), int(parts["syy"].sum())
    num = n * sxy - sx * sy
    denx, deny = n * sxx - sx * sx, n * syy - sy * sy
    if denx * deny == 0:
        corr_e6 = 0
    else:
        corr_e6 = int(
            math.floor(
                float(num) * 1000000.0 / math.sqrt(float(denx) * float(deny))
            )
        )
    return pa.Table.from_pydict(
        {
            "n_pairs": pa.array([n], pa.int64()),
            "corr_e6": pa.array([corr_e6], pa.int64()),
        }
    )


SQL_AUTOCORR = """
WITH d AS (
  SELECT user_id,
         CAST(ROUND(value) AS BIGINT) AS y,
         LAG(CAST(ROUND(value) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS x
  FROM events
),
p AS (SELECT x, y FROM d WHERE x IS NOT NULL),
m AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM p)
SELECT CAST(n AS BIGINT) AS n_pairs,
       CAST(CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) = 0 THEN 0
            ELSE FLOOR(CAST(n * sxy - sx * sy AS DOUBLE) * 1000000.0
                 / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)))
            END AS BIGINT) AS corr_e6
FROM m
"""


def q_orc_roundtrip(sf_dir: str):
    """Columnar interchange: export the events table to ORC shards (one
    per block, content-keyed streaming sink) and read it back through the
    parallel ``read_binary_files`` + pyarrow.orc decode path — proving a
    lossless event_id/event_type/value roundtrip row-for-row against the
    original parquet (see ``sources/orcio.py``)."""
    import hashlib
    import shutil

    from goose_parser_ray.sources.orcio import read_orc, write_orc_shards

    out = "/tmp/orc_roundtrip_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    shutil.rmtree(out, ignore_errors=True)
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    write_orc_shards(ds, out, key_col="event_id")
    return read_orc(out).map_batches(
        lambda t: pa.Table.from_pydict(
            {
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "v_cents": _cents(t["value"]),
            }
        ),
        batch_format="pyarrow",
    )


SQL_ORC_ROUNDTRIP = """
SELECT event_id, event_type,
       CAST(ROUND(100 * value) AS BIGINT) AS v_cents
FROM events
"""


def q_url_canonical(sf_dir: str):
    """URL canonicalization dedup (the crawl-curation step BEFORE content
    dedup): synthesize a deterministically messy URL per document
    (scheme/host case noise, www. subdomain, :443 default port, trailing
    path slash, utm_* tracking params, #fragment), canonicalize it with
    the exact same six-step vectorized string pipeline the DuckDB twin
    runs (lower → strip fragment → strip utm params → fold :443 →
    fold www. → fold path slash), and group to (canonical url, n_docs,
    first_doc). The kept-group membership is hash-compared, so the oracle
    guards every canonicalization rule. Map-side partial combine bounds
    the exchange at (distinct canonical URLs) × blocks."""
    import pandas as pd

    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def _mod(col, m: int):
        # Arrow has no modulo kernel; id - (id // m) * m (ids non-negative)
        return pc.subtract(
            col, pc.multiply(pc.divide(col, m), pa.scalar(m, pa.int64()))
        )

    def synth_and_canon(t: pa.Table) -> pa.Table:
        d = t["doc_id"]
        m2, m3 = _mod(d, 2), _mod(d, 3)
        m4, m5, m7 = _mod(d, 4), _mod(d, 5), _mod(d, 7)
        empty = pa.scalar("")
        url = pc.binary_join_element_wise(
            pc.if_else(pc.equal(m2, 0), pa.scalar("HTTPS://"), pa.scalar("https://")),
            pc.if_else(pc.equal(m3, 0), pa.scalar("www."), empty),
            pc.if_else(pc.equal(m2, 0), pc.utf8_upper(t["source"]), t["source"]),
            pa.scalar(".EXAMPLE.com"),
            pc.if_else(pc.equal(m5, 0), pa.scalar(":443"), empty),
            pa.scalar("/p/"),
            pc.cast(m5, pa.string()),
            pc.if_else(pc.equal(m4, 0), pa.scalar("/"), empty),
            pa.scalar("?id="),
            pc.cast(m3, pa.string()),
            pc.if_else(
                pc.equal(m2, 0),
                pa.scalar("&utm_source=feed&utm_medium=rss"),
                empty,
            ),
            pc.if_else(pc.equal(m7, 0), pa.scalar("#frag"), empty),
            "",
        )
        # six canonicalization steps, op-for-op the SQL twin's order
        u = pc.utf8_lower(url)
        u = pc.replace_substring_regex(u, pattern="#.*$", replacement="")
        u = pc.replace_substring_regex(
            u, pattern="&utm_[a-z]+=[a-z]+", replacement=""
        )
        u = pc.replace_substring(u, pattern=":443/", replacement="/")
        u = pc.replace_substring(u, pattern="://www.", replacement="://")
        u = pc.replace_substring(u, pattern="/?id=", replacement="?id=")
        return pa.Table.from_pydict({"url": u, "doc_id": d})

    def partial(t: pa.Table) -> pa.Table:
        g = (
            t.to_pandas()
            .groupby("url", sort=False)
            .agg(n=("doc_id", "size"), mn=("doc_id", "min"))
        )
        # from_pydict, not from_pandas: pandas metadata makes the schema
        # unhashable for Ray's shuffle-side schema dedup (warn-spam)
        return pa.Table.from_pydict(
            {
                "url": pa.array(g.index, pa.string()),
                "n": pa.array(g["n"].to_numpy(np.int64)),
                "mn": pa.array(g["mn"].to_numpy(np.int64)),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("url", sort=False).agg(
            n_docs=("n", "sum"), first_doc=("mn", "min")
        )
        return out.reset_index().astype({"n_docs": "int64", "first_doc": "int64"})

    return (
        ds.map_batches(synth_and_canon, batch_format="pyarrow")
        .map_batches(partial, batch_format="pyarrow")
        .groupby("url")
        .map_groups(merge, batch_format="pandas")
    )


SQL_URL_CANONICAL = """
WITH u AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END)
         || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
         || (CASE WHEN doc_id % 2 = 0 THEN UPPER(source) ELSE source END)
         || '.EXAMPLE.com'
         || (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END)
         || '/p/' || CAST(doc_id % 5 AS VARCHAR)
         || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
         || '?id=' || CAST(doc_id % 3 AS VARCHAR)
         || (CASE WHEN doc_id % 2 = 0
             THEN '&utm_source=feed&utm_medium=rss' ELSE '' END)
         || (CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END) AS url
  FROM documents
),
c AS (
  SELECT doc_id,
         REPLACE(REPLACE(REPLACE(
           REGEXP_REPLACE(
             REGEXP_REPLACE(LOWER(url), '#.*$', ''),
             '&utm_[a-z]+=[a-z]+', '', 'g'),
           ':443/', '/'), '://www.', '://'), '/?id=', '?id=') AS url
  FROM u
)
SELECT url, COUNT(*) AS n_docs, CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM c GROUP BY url
"""


def q_sentence_stats(sf_dir: str):
    """Sentence segmentation statistics per language, ORACLE-CHECKED. The
    corpus is synthetic word soup with no punctuation, so both sides first
    punctuate deterministically (REPLACE ' table ' → '. ' — sequential
    non-overlapping left-to-right in Arrow and DuckDB alike), then split
    on '[.!?]+' (RE2 in both engines), trim SPACES only (DuckDB TRIM
    strips ' ', so the engine uses utf8_trim(' ') rather than the
    all-whitespace kernel), drop empties, and aggregate (lang →
    n_sentences, sum_chars). Fully vectorized: list_flatten +
    list_parent_indices fan-out, map-side combine, tiny lang-domain
    shuffle."""
    import pandas as pd

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        punct = pc.replace_substring(
            t["text"], pattern=" table ", replacement=". "
        )
        parts = pc.split_pattern_regex(punct, pattern="[.!?]+")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        idx = pc.list_parent_indices(parts)
        flat = pc.utf8_trim(pc.list_flatten(parts), characters=" ")
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        lang = pc.take(t["lang"], idx).filter(keep)
        g = pd.DataFrame(
            {
                "lang": lang.to_pandas(),
                "len": pc.utf8_length(flat).to_numpy(zero_copy_only=False),
            }
        ).groupby("lang", sort=False)["len"].agg(["size", "sum"])
        return pa.Table.from_pydict(
            {
                "lang": pa.array(g.index, pa.string()),
                "n_sentences": pa.array(g["size"].to_numpy(np.int64)),
                "sum_chars": pa.array(g["sum"].to_numpy(np.int64)),
            }
        )

    return pre_aggregated_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["lang"],
        sums={"n_sentences": "n_sentences", "sum_chars": "sum_chars"},
    )


SQL_SENTENCE_STATS = """
WITH p AS (
  SELECT lang, REPLACE(text, ' table ', '. ') AS text FROM documents
),
s AS (
  SELECT lang, TRIM(x) AS sent
  FROM (
    SELECT lang, UNNEST(regexp_split_to_array(text, '[.!?]+')) AS x FROM p
  )
  WHERE TRIM(x) <> ''
)
SELECT lang,
       COUNT(*) AS n_sentences,
       CAST(SUM(LENGTH(sent)) AS BIGINT) AS sum_chars
FROM s GROUP BY lang
"""


def q_blocklist_filter(sf_dir: str):
    """Blocklist screening (the C4/RefinedWeb banned-term gate): count
    occurrences of any blocklist term per document with ONE compiled RE2
    alternation pass (scales to thousands of terms at constant scan
    count, vs one pass per term), keep offending docs. Leftmost
    non-overlapping match semantics are identical in Arrow's RE2 and
    DuckDB's regexp_extract_all, so the oracle hash-compares the full
    (doc_id, n_matches) membership."""
    pattern = "(?:spark|vector|stream)"
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def screen(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t["text"], pattern=pattern)
        out = pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "n_matches": pc.cast(n, pa.int64())}
        )
        return out.filter(pc.greater(out["n_matches"], 0))

    return ds.map_batches(screen, batch_format="pyarrow")


SQL_BLOCKLIST_FILTER = """
SELECT doc_id,
       CAST(LEN(regexp_extract_all(text, '(?:spark|vector|stream)'))
            AS BIGINT) AS n_matches
FROM documents
WHERE LEN(regexp_extract_all(text, '(?:spark|vector|stream)')) > 0
"""


def q_csv_roundtrip(sf_dir: str):
    """Text interchange: export events to CSV shards through Ray Data's
    native streaming sink and read them back with the parallel
    ``read_csv`` path. Floats don't survive a text roundtrip bit-exact,
    so ``value`` is folded to integer cents BEFORE export — the
    int/string schema is lossless through CSV and the oracle hash proves
    row-for-row identity with the source parquet."""
    import hashlib
    import shutil

    out = "/tmp/csv_roundtrip_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    shutil.rmtree(out, ignore_errors=True)
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"]).map_batches(
        lambda t: pa.Table.from_pydict(
            {
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "v_cents": _cents(t["value"]),
            }
        ),
        batch_format="pyarrow",
    )
    ds.write_csv(out)
    return ray.data.read_csv(out)


SQL_CSV_ROUNDTRIP = """
SELECT event_id, event_type,
       CAST(ROUND(100 * value) AS BIGINT) AS v_cents
FROM events
"""


def q_jsonl_roundtrip(sf_dir: str):
    """Row-oriented interchange: export events to JSONL shards
    (``write_json`` emits one JSON object per line) and read them back
    through the parallel ``read_json`` path. Same cents-before-export
    discipline as the CSV twin keeps the roundtrip lossless."""
    import hashlib
    import shutil

    out = "/tmp/jsonl_roundtrip_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    shutil.rmtree(out, ignore_errors=True)
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"]).map_batches(
        lambda t: pa.Table.from_pydict(
            {
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "v_cents": _cents(t["value"]),
            }
        ),
        batch_format="pyarrow",
    )
    ds.write_json(out)
    return ray.data.read_json(out)


SQL_JSONL_ROUNDTRIP = SQL_CSV_ROUNDTRIP


def q_k_anonymize(sf_dir: str):
    """k-anonymity suppression (privacy gate before corpus release):
    drop every document whose quasi-identifier combination
    (lang, source) is shared by fewer than K=4 documents. Shape is
    broadcast-filter, not shuffle: per-batch partial counts feed a tiny
    (lang, source) groupby, the surviving key set is ``ray.put`` once,
    and each batch filters map-side with a vectorized ``is_in`` — the
    corpus itself never moves. Oracle is the window-count QUALIFY twin."""
    import pandas as pd

    K = 4
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "source"])

    def partial_counts(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(t["lang"], t["source"], "|")
        vc = pa.chunked_array([key]).combine_chunks().value_counts()
        return pa.Table.from_pydict(
            {
                "key": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    counts = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("key")
        .sum("n")
        .take_all()
    )  # one row per distinct (lang, source) — tiny at any corpus size
    kept = pa.array(
        sorted(r["key"] for r in counts if r["sum(n)"] >= K), pa.string()
    )
    kept_ref = ray.put(kept)

    def suppress(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(t["lang"], t["source"], "|")
        mask = pc.is_in(key, value_set=ray.get(kept_ref))
        return t.filter(mask)

    return ds.map_batches(suppress, batch_format="pyarrow")


SQL_K_ANONYMIZE = """
SELECT doc_id, lang, source FROM (
  SELECT doc_id, lang, source,
         COUNT(*) OVER (PARTITION BY lang, source) AS n
  FROM documents
) WHERE n >= 4
"""


def _benford_e6() -> dict[int, int]:
    """log10(1 + 1/d) in e6 fixed point — the Benford first-digit law.
    Computed once here and formatted as literals into the SQL twin so
    engine and oracle share identical constants by construction."""
    import math

    return {d: round(math.log10(1.0 + 1.0 / d) * 1_000_000) for d in range(1, 10)}


def q_benford(sf_dir: str):
    """Benford first-digit screen (fraud/synthetic-data detector for a
    numeric column): first digit of the order total in integer cents,
    observed count per digit alongside the Benford-law expectation in
    e6 fixed point (``n_total * round(log10(1+1/d)*1e6)`` — integer on
    both sides, no float drift). Digit extraction is one vectorized
    cast→slice pass; the count is a 9-group aggregate of map-side
    partials."""
    ds = _read(sf_dir, "orders", ["o_totalprice"])
    n_total = ds.count()  # metadata-only row count
    consts = _benford_e6()

    def digits(t: pa.Table) -> pa.Table:
        cents = _cents(t["o_totalprice"])
        d = pc.cast(
            pc.utf8_slice_codeunits(pc.cast(cents, pa.string()), 0, 1), pa.int64()
        )
        vc = pa.chunked_array([d]).combine_chunks().value_counts()
        return pa.Table.from_pydict(
            {
                "digit": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    def finalize(t: pa.Table) -> pa.Table:
        exp = pa.array(
            [n_total * consts[d] for d in t["digit"].to_pylist()], pa.int64()
        )
        return pa.Table.from_pydict(
            {"digit": t["digit"], "n_obs": t["sum(n)"], "exp_e6": exp}
        )

    return (
        ds.map_batches(digits, batch_format="pyarrow")
        .groupby("digit")
        .sum("n")
        .map_batches(finalize, batch_format="pyarrow")
    )


SQL_BENFORD = f"""
WITH d AS (
  SELECT CAST(SUBSTR(CAST(CAST(ROUND(100 * o_totalprice) AS BIGINT) AS VARCHAR),
                     1, 1) AS BIGINT) AS digit
  FROM orders
), t AS (SELECT COUNT(*) AS n FROM d)
SELECT digit, COUNT(*) AS n_obs,
       CAST((SELECT n FROM t) * CASE digit
            {' '.join(f'WHEN {d} THEN {c}' for d, c in _benford_e6().items())}
            END AS BIGINT) AS exp_e6
FROM d GROUP BY digit
"""


def q_ewma_value(sf_dir: str):
    """Per-user exponentially-weighted moving average of event value —
    an inherently sequential per-key fold made distributed + vectorized:
    users are hash-bucketed (data-proportional bucket count, one shuffle
    group each), and inside a bucket the recurrence
    ``s_t = (9*s_{{t-1}} + x_t + 5) // 10`` runs step-synchronously
    across ALL users at once (one numpy pass per time-step rank, not per
    row) — loop length = max events/user, not bucket rows. The integer
    recurrence is exactly reproducible, so the DuckDB twin folds the
    same lists with ``list_reduce`` and the hash must match row-for-row."""
    import pandas as pd

    from goose_parser_ray.functions.dedup import num_shuffle_buckets

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    nb = num_shuffle_buckets(ds.count())

    def add_bucket(t: pa.Table) -> pa.Table:
        t = pa.Table.from_arrays(
            [t["event_id"], t["user_id"], t["ts"], _cents(t["value"])],
            names=["event_id", "user_id", "ts", "v_c"],
        )
        return _dedup.add_hash_bucket(t, "user_id", nb, "__db")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"user_id": [], "ts": [], "ewma_c": []})
        # event_id tiebreak ⇒ a total order, deterministic on both sides
        g = g.sort_values(
            ["user_id", "ts", "v_c", "event_id"], kind="mergesort"
        ).reset_index(drop=True)
        x = g["v_c"].to_numpy(np.int64)
        pos = g.groupby("user_id").cumcount().to_numpy()
        s = x.copy()  # rank-0 rows: EWMA seeds at the first observation
        for k in range(1, int(pos.max()) + 1):
            idx = np.nonzero(pos == k)[0]
            # row idx-1 is the same user at rank k-1 (sorted by user,rank)
            s[idx] = (9 * s[idx - 1] + x[idx] + 5) // 10
        return pd.DataFrame(
            {
                "user_id": g["user_id"],
                "ts": g["ts"].dt.strftime("%Y-%m-%d %H:%M:%S"),
                "ewma_c": s,
            }
        )

    ds = ds.map_batches(add_bucket, batch_format="pyarrow")
    return ds.groupby("__db").map_groups(fold, batch_format="pandas")


SQL_EWMA_VALUE = """
WITH d AS (
  SELECT user_id, ts, event_id,
         CAST(ROUND(100 * value) AS BIGINT) AS v_c
  FROM events
), h AS (
  SELECT user_id, ts,
         list(v_c) OVER (PARTITION BY user_id ORDER BY ts, v_c, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS hist
  FROM d
)
SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       CAST(list_reduce(hist, (s, x) -> (9*s + x + 5) // 10) AS BIGINT)
         AS ewma_c
FROM h
"""


def q_char_entropy(sf_dir: str):
    """Per-document character-level Shannon entropy in e6 fixed point —
    the classic gibberish / binary-junk detector for web-corpus quality
    gating. Pure map, zero shuffle: each batch decodes its Arrow string
    buffer ONCE into a flat codepoint array (no per-row Python), builds
    (doc, codepoint) counts with a single ``np.unique`` over a packed
    key, and folds -p·ln p per doc with ``np.bincount``. Float
    discipline: each (doc, char) term is e6-rounded THEN integer-summed,
    so the result is independent of summation order on both engines."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def ent(t: pa.Table) -> pa.Table:
        a = t["text"].combine_chunks()
        lens = pc.utf8_length(a).to_numpy(zero_copy_only=False).astype(np.int64)
        # one C decode pass: UTF-8 buffer -> str -> UTF-32 codepoint array
        off = np.frombuffer(a.buffers()[1], np.int32)
        data = np.frombuffer(a.buffers()[2], np.uint8)[off[0] : off[-1]]
        cp = np.frombuffer(
            bytes(data).decode("utf-8").encode("utf-32-le"), np.uint32
        ).astype(np.int64)
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        key, counts = np.unique(doc_of * 0x110000 + cp, return_counts=True)
        d = key // 0x110000
        p = counts / lens[d].astype(np.float64)
        term_e6 = np.floor(-(p) * np.log(p) * 1_000_000.0 + 0.5)
        ent_e6 = np.bincount(d, weights=term_e6, minlength=len(lens))
        mask = lens > 0  # SQL's GROUP BY emits no row for empty text
        return pa.Table.from_pydict(
            {
                "doc_id": t["doc_id"].to_numpy(zero_copy_only=False)[mask],
                "ent_e6": ent_e6.astype(np.int64)[mask],
            }
        )

    return ds.map_batches(ent, batch_format="pyarrow")


SQL_CHAR_ENTROPY = """
WITH c AS (
  SELECT doc_id, substring(text, gs.i, 1) AS ch
  FROM documents,
       LATERAL (SELECT unnest(generate_series(1, length(text))) AS i) gs
), k AS (
  SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS n FROM c GROUP BY doc_id, ch
), t AS (
  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS tot FROM k GROUP BY doc_id
)
SELECT k.doc_id,
       CAST(SUM(CAST(ROUND(
         -(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))
         * LN(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)) * 1000000.0
       ) AS BIGINT)) AS BIGINT) AS ent_e6
FROM k JOIN t USING (doc_id)
GROUP BY k.doc_id
"""


def q_mann_whitney(sf_dir: str):
    """Mann-Whitney U rank-sum test between the click and view value
    distributions — the non-parametric A/B twin of ``ks_test``, exact in
    integers: tie-averaged ranks are carried DOUBLED (2·avgrank =
    2·cum_before + c + 1, always integral), so rank sums and
    U = R − n(n+1)/2 never touch a float. Scale shape: the exchange is
    bounded by the cents-quantized value DOMAIN (map-side value_counts →
    tiny grouped table); the corpus crosses the wire as one row per
    distinct (type, value)."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["event_type"], value_set=pa.array(["click", "view"]))
        t = t.filter(keep)
        v = _cents(t["value"]).to_numpy(zero_copy_only=False)
        pos = (
            pc.equal(t["event_type"], "click")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        g = pd.DataFrame({"v": v, "p": pos}).groupby("v", sort=False).agg(
            c1=("p", "sum"), c=("p", "size")
        )
        return pa.Table.from_pydict(
            {
                "v": g.index.to_numpy(np.int64),
                "c1": g["c1"].to_numpy(np.int64),
                "c2": (g["c"] - g["c1"]).to_numpy(np.int64),
            }
        )

    grouped = (
        pre_aggregated_sum(
            ds.map_batches(partial, batch_format="pyarrow"),
            keys=["v"],
            sums={"c1": "c1", "c2": "c2"},
        )
        .sort("v")
        .to_pandas()
    )  # one row per distinct cents value — domain-bounded small
    c1 = grouped["c1"].to_numpy(np.int64)
    c2 = grouped["c2"].to_numpy(np.int64)
    c = c1 + c2
    cum_before = np.concatenate(([0], np.cumsum(c)[:-1]))
    r2 = 2 * cum_before + c + 1  # doubled tie-averaged rank per value
    n1, n2 = int(c1.sum()), int(c2.sum())
    r2_1, r2_2 = int((c1 * r2).sum()), int((c2 * r2).sum())
    return pa.Table.from_pydict(
        {
            "event_type": pa.array(["click", "view"], pa.string()),
            "n_obs": pa.array([n1, n2], pa.int64()),
            "rank2_sum": pa.array([r2_1, r2_2], pa.int64()),
            "u2x": pa.array(
                [r2_1 - n1 * (n1 + 1), r2_2 - n2 * (n2 + 1)], pa.int64()
            ),
        }
    )


SQL_MANN_WHITNEY = """
WITH d AS (
  SELECT event_type, CAST(ROUND(100 * value) AS BIGINT) AS v
  FROM events WHERE event_type IN ('click', 'view')
), c AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM d GROUP BY v
), r AS (
  SELECT v, 2 * (SUM(c) OVER (ORDER BY v) - c) + c + 1 AS r2 FROM c
), g AS (
  SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS n
  FROM d GROUP BY event_type, v
)
SELECT event_type,
       CAST(SUM(n) AS BIGINT) AS n_obs,
       CAST(SUM(n * r2) AS BIGINT) AS rank2_sum,
       CAST(SUM(n * r2) - SUM(n) * (SUM(n) + 1) AS BIGINT) AS u2x
FROM g JOIN r USING (v)
GROUP BY event_type
"""


def q_attribution(sf_dir: str):
    """Last-touch attribution: each purchase is credited to the user's
    most recent click no more than 7 days earlier — the marketing-
    analytics window join. Map-side prune keeps only click/purchase rows
    before the exchange; users are hash-bucketed (data-proportional
    count) and the per-user fold is cython-vectorized (groupby cummax +
    shift), never a Python loop. Ties in ts break on event_id, giving a
    total order shared with the SQL window frame."""
    import pandas as pd

    from goose_parser_ray.functions.dedup import num_shuffle_buckets

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    nb = num_shuffle_buckets(ds.count())

    def prune_bucket(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["event_type"], value_set=pa.array(["click", "purchase"]))
        return _dedup.add_hash_bucket(t.filter(keep), "user_id", nb, "__ab")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"event_id": [], "user_id": [], "ts": [], "click_ts": []}
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        ).reset_index(drop=True)
        ts_us = g["ts"].astype("int64")
        click_ts = ts_us.where(g["event_type"] == "click")
        # cummax leaves NaN AT non-click rows (it only skips them for the
        # accumulation) — ffill carries the running max onto every row
        last = (
            click_ts.groupby(g["user_id"]).cummax().groupby(g["user_id"]).ffill()
        )
        prev = last.groupby(g["user_id"]).shift(1)  # strictly-preceding frame
        is_p = (g["event_type"] == "purchase") & prev.notna()
        window = prev >= ts_us - 7 * 86_400 * 1_000_000
        out = g[is_p & window]
        if len(out) == 0:
            return empty
        return pd.DataFrame(
            {
                "event_id": out["event_id"].to_numpy(np.int64),
                "user_id": out["user_id"].to_numpy(np.int64),
                "ts": out["ts"].dt.strftime("%Y-%m-%d %H:%M:%S"),
                "click_ts": pd.to_datetime(
                    prev[is_p & window].astype("int64"), unit="us"
                ).dt.strftime("%Y-%m-%d %H:%M:%S"),
            }
        )

    ds = ds.map_batches(prune_bucket, batch_format="pyarrow")
    return ds.groupby("__ab").map_groups(fold, batch_format="pandas")


SQL_ATTRIBUTION = """
WITH e AS (
  SELECT event_id, user_id, ts, event_type
  FROM events WHERE event_type IN ('click', 'purchase')
), a AS (
  SELECT event_id, user_id, ts, event_type,
         MAX(CASE WHEN event_type = 'click' THEN ts END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS click_ts
  FROM e
)
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       strftime(click_ts, '%Y-%m-%d %H:%M:%S') AS click_ts
FROM a
WHERE event_type = 'purchase' AND click_ts IS NOT NULL
  AND click_ts >= ts - INTERVAL 7 DAY
"""


def q_adamic_adar(sf_dir: str):
    """Adamic–Adar link prediction over the DOM-extracted link graph:
    page pairs sharing in-link targets, scored Σ 1/ln(indegree) in e6
    fixed point. The edge set comes through the REAL extraction stack
    (tokenizer → tree builder → ``a[href]`` selector), same as
    ``link_graph``; the oracle states it in closed form. Pair generation
    groups by target — group payload is the target's in-degree, bounded
    by graph structure, and the per-pair weight is e6-rounded before the
    exact integer (a,b) sum. At adversarial in-degree skew the dedup
    family's star-cap (functions/dedup.py) is the documented fallback;
    this exact variant matches the oracle pair-for-pair."""
    import pandas as pd

    from goose_parser_ray.functions.linkgraph import extract_links

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    edges = extract_links(ds, concurrency=_pool())

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "a": pd.Series([], dtype=np.int64),
                "b": pd.Series([], dtype=np.int64),
                "n": pd.Series([], dtype=np.int64),
                "w": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) < 2:
            return empty
        out = []
        for _, grp in g.groupby("dst", sort=False):
            d = len(grp)
            if d < 2:
                continue
            src = np.sort(grp["src"].to_numpy(np.int64))
            w = int(np.floor(1_000_000.0 / np.log(float(d)) + 0.5))
            ia, ib = np.triu_indices(d, k=1)
            out.append(
                pd.DataFrame(
                    {
                        "a": src[ia],
                        "b": src[ib],
                        "n": np.ones(len(ia), np.int64),
                        "w": np.full(len(ia), w, np.int64),
                    }
                )
            )
        return pd.concat(out, ignore_index=True) if out else empty

    pair_ds = edges.groupby("dst").map_groups(pairs, batch_format="pandas")
    return pre_aggregated_sum(
        pair_ds, keys=["a", "b"], sums={"n": "cn", "w": "aa_e6"}
    )


SQL_ADAMIC_ADAR = """
WITH edges AS (
  SELECT d.doc_id AS src, CAST((d.doc_id * 7 + g.k) % 1000 AS BIGINT) AS dst
  FROM documents d,
       LATERAL (SELECT unnest(generate_series(1, d.doc_id % 3 + 1)) AS k) g
), deg AS (
  SELECT dst, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY dst
), p AS (
  SELECT e1.src AS a, e2.src AS b,
         CAST(ROUND(1000000.0 / LN(CAST(deg.d AS DOUBLE))) AS BIGINT) AS w
  FROM edges e1
  JOIN edges e2 USING (dst)
  JOIN deg USING (dst)
  WHERE e1.src < e2.src
)
SELECT a, b, CAST(COUNT(*) AS BIGINT) AS cn, CAST(SUM(w) AS BIGINT) AS aa_e6
FROM p GROUP BY a, b
"""


def q_twap(sf_dir: str):
    """Per-user time-weighted average value — each observation is held
    until the user's next event, so the exact aggregate is
    Σ v·gap / Σ gap. Numerator and denominator are returned as separate
    exact integers (cents × seconds) rather than a lossy quotient. Gap
    seconds mirror DuckDB ``date_diff('second', …)`` boundary-crossing
    semantics (epoch-floor difference, not duration floor). Same
    bucketed cython-vectorized per-user fold as ``attribution``."""
    import pandas as pd

    from goose_parser_ray.functions.dedup import num_shuffle_buckets

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    nb = num_shuffle_buckets(ds.count())

    def add_bucket(t: pa.Table) -> pa.Table:
        t = pa.Table.from_arrays(
            [t["event_id"], t["user_id"], t["ts"], _cents(t["value"])],
            names=["event_id", "user_id", "ts", "v_c"],
        )
        return _dedup.add_hash_bucket(t, "user_id", nb, "__tb")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype=np.int64),
                    "dur_s": pd.Series([], dtype=np.int64),
                    "twap_num": pd.Series([], dtype=np.int64),
                }
            )
        g = g.sort_values(
            ["user_id", "ts", "v_c", "event_id"], kind="mergesort"
        ).reset_index(drop=True)
        sec = g["ts"].astype("int64") // 1_000_000  # epoch-second floor
        nxt = sec.groupby(g["user_id"]).shift(-1)
        gap = (nxt - sec).dropna().astype(np.int64)
        kept = g.loc[gap.index]
        agg = (
            pd.DataFrame(
                {
                    "user_id": kept["user_id"].to_numpy(np.int64),
                    "dur_s": gap.to_numpy(np.int64),
                    "twap_num": kept["v_c"].to_numpy(np.int64)
                    * gap.to_numpy(np.int64),
                }
            )
            .groupby("user_id", as_index=False)
            .sum()
        )
        return agg

    ds = ds.map_batches(add_bucket, batch_format="pyarrow")
    return ds.groupby("__tb").map_groups(fold, batch_format="pandas")


SQL_TWAP = """
WITH d AS (
  SELECT user_id, ts, event_id, CAST(ROUND(100 * value) AS BIGINT) AS v_c
  FROM events
), l AS (
  SELECT user_id, v_c,
         CAST(date_diff('second', ts,
              LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, v_c, event_id))
           AS BIGINT) AS gap_s
  FROM d
)
SELECT user_id,
       CAST(SUM(gap_s) AS BIGINT) AS dur_s,
       CAST(SUM(v_c * gap_s) AS BIGINT) AS twap_num
FROM l WHERE gap_s IS NOT NULL
GROUP BY user_id
"""


def q_survival(sf_dir: str):
    """Kaplan-Meier risk table over user lifetimes (churn analysis):
    lifetime = day-span between a user's first and last event; a user
    still active in the final 14 days is right-CENSORED. The output is
    the exact-integer KM table — deaths dᵢ and at-risk nᵢ per event
    time — from which the estimator is a trivial product; emitting the
    table instead of the product keeps the oracle float-free. Mergeable
    per-user endpoint aggregate (≤2 candidate rows per user per batch
    cross the exchange is not even needed — min/max combine natively);
    the day-domain risk table is tiny at any corpus size."""
    import pandas as pd
    from ray.data.aggregate import Max, Min

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def to_us(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "user_id": t["user_id"],
                "us": pc.cast(t["ts"], pa.int64()),
            }
        )

    spans = (
        ds.map_batches(to_us, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("us", alias_name="f"), Max("us", alias_name="l"))
    ).materialize()  # one row per user; consumed twice (max + table)
    mx = int(spans.max("l"))
    cutoff = mx - 14 * 86_400 * 1_000_000

    def lifetimes(t: pa.Table) -> pa.Table:
        f = t["f"].to_numpy(zero_copy_only=False)
        l = t["l"].to_numpy(zero_copy_only=False)
        day = 86_400 * 1_000_000
        lt = l // day - f // day  # date_diff('day') boundary crossings
        death = (l <= cutoff).astype(np.int64)
        g = pd.DataFrame({"lt": lt, "d": death}).groupby("lt", sort=False).agg(
            d=("d", "sum"), c=("d", "size")
        )
        return pa.Table.from_pydict(
            {
                "lt": g.index.to_numpy(np.int64),
                "d": g["d"].to_numpy(np.int64),
                "c": g["c"].to_numpy(np.int64),
            }
        )

    grouped = (
        pre_aggregated_sum(
            spans.map_batches(lifetimes, batch_format="pyarrow"),
            keys=["lt"],
            sums={"d": "d", "c": "c"},
        )
        .sort("lt")
        .to_pandas()
    )  # day-domain bounded small
    c = grouped["c"].to_numpy(np.int64)
    n_risk = np.cumsum(c[::-1])[::-1]  # users with lifetime >= lt
    out = pa.Table.from_pydict(
        {
            "lt": grouped["lt"].to_numpy(np.int64),
            "d": grouped["d"].to_numpy(np.int64),
            "n_risk": n_risk,
        }
    )
    return out.filter(pc.greater(out["d"], 0))


SQL_SURVIVAL = """
WITH u AS (
  SELECT user_id, MIN(ts) AS f, MAX(ts) AS l FROM events GROUP BY user_id
), m AS (SELECT MAX(l) AS mx FROM u),
s AS (
  SELECT date_diff('day', f, l) AS lt,
         CASE WHEN l <= (SELECT mx FROM m) - INTERVAL 14 DAY
              THEN 1 ELSE 0 END AS death
  FROM u
), g AS (
  SELECT lt, CAST(SUM(death) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM s GROUP BY lt
)
SELECT CAST(lt AS BIGINT) AS lt, d,
       CAST(SUM(c) OVER (ORDER BY lt DESC) AS BIGINT) AS n_risk
FROM g
QUALIFY d > 0
"""


def q_gini(sf_dir: str):
    """Gini concentration coefficient of event value per event type
    (inequality screen for spend/engagement distributions), EXACT in
    integers: with values cents-quantized and tie groups occupying
    consecutive ranks, 2·Σ rank·xᵢ = Σ c·v·(2·cum_before + c + 1), so
    G = gini_num / gini_den is reported as an exact integer fraction.
    Exchange bounded by the value DOMAIN (map-side value_counts, one row
    per distinct (type, cents))."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        v = _cents(t["value"]).to_numpy(zero_copy_only=False)
        g = (
            pd.DataFrame(
                {"et": t["event_type"].to_pandas(), "v": v}
            )
            .groupby(["et", "v"], sort=False)
            .size()
        )
        idx = g.index.to_frame(index=False)
        return pa.Table.from_pydict(
            {
                "event_type": idx["et"].to_numpy(),
                "v": idx["v"].to_numpy(np.int64),
                "c": g.to_numpy(np.int64),
            }
        )

    grouped = (
        pre_aggregated_sum(
            ds.map_batches(partial, batch_format="pyarrow"),
            keys=["event_type", "v"],
            sums={"c": "c"},
        )
        .sort(["event_type", "v"])
        .to_pandas()
    )  # one row per distinct (type, cents) — domain-bounded small
    out = []
    for et, g in grouped.groupby("event_type", sort=True):
        c = g["c"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        cb = np.concatenate(([0], np.cumsum(c)[:-1]))
        n = int(c.sum())
        sx = int((c * v).sum())
        s2 = int((c * v * (2 * cb + c + 1)).sum())
        out.append((et, n, s2 - (n + 1) * sx, n * sx))
    return pa.Table.from_pydict(
        {
            "event_type": pa.array([o[0] for o in out], pa.string()),
            "n": pa.array([o[1] for o in out], pa.int64()),
            "gini_num": pa.array([o[2] for o in out], pa.int64()),
            "gini_den": pa.array([o[3] for o in out], pa.int64()),
        }
    )


SQL_GINI = """
WITH d AS (
  SELECT event_type, CAST(ROUND(100 * value) AS BIGINT) AS v FROM events
), c AS (
  SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS c
  FROM d GROUP BY event_type, v
), r AS (
  SELECT event_type, v, c,
         SUM(c) OVER (PARTITION BY event_type ORDER BY v) - c AS cb
  FROM c
)
SELECT event_type,
       CAST(SUM(c) AS BIGINT) AS n,
       CAST(SUM(c * v * (2 * cb + c + 1)) - (SUM(c) + 1) * SUM(c * v)
            AS BIGINT) AS gini_num,
       CAST(SUM(c) * SUM(c * v) AS BIGINT) AS gini_den
FROM r GROUP BY event_type
"""


def q_media_gif(sf_dir: str):
    """REAL palette-image pipeline, oracle-checked end to end: per doc a
    deterministic palette (power-of-two sized, 2..256 entries) and index
    raster are synthesized, encoded through the in-repo GIF89a/LZW codec
    (variable-width codes, 12-bit dictionary resets, sub-block framing),
    decoded in an actor pool, and summarized as the full-raster RGB sum
    after palette lookup plus the count of distinct indices used — so the
    hash compare against the closed-form DuckDB twin proves the LZW index
    stream was reconstructed bit-exactly. The palette sibling of
    q_media_png (upstream: goose-parser media spans carry opaque binary
    payloads; this is the decode stage run in an actor pool)."""
    from goose_parser_ray.functions.gifmini import encode_gif
    from goose_parser_ray.functions.multimodal import GifStatsActor

    def synth(t: pa.Table) -> pa.Table:
        payloads = []
        for d in t["doc_id"].to_pylist():
            w = 8 + (d & 15)
            h = 8 + ((d >> 4) & 15)
            p_n = 1 << (1 + d % 8)  # 2..256, power of two == GCT size
            pi = np.arange(p_n, dtype=np.int64)
            pal = np.stack(
                [
                    (37 * pi + d) % 256,
                    (11 * pi + 2 * d) % 256,
                    (53 * pi + 3 * d + 1) % 256,
                ],
                axis=1,
            ).astype(np.uint8)
            i = np.arange(h, dtype=np.int64)[:, None]
            j = np.arange(w, dtype=np.int64)[None, :]
            idx = ((7 * i + 13 * j + d) % p_n).astype(np.uint8)
            payloads.append(encode_gif(w, h, pal, idx))
        return pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        synth, batch_format="pyarrow"
    )
    return ds.map_batches(
        # task pool, not actor pool: GifStatsActor's setup is an import
        # bind — actor spin-up costs more than it saves (measured
        # on media_png: stage wall 3.0s -> 1.4s at sf0.1/32 CPUs)
        lambda t: GifStatsActor()(t),
        batch_format="pyarrow",
        batch_size=64,  # wide binary payloads — small batches (guide)
    )


SQL_MEDIA_GIF = """
WITH dims AS (
  SELECT doc_id,
         8 + (doc_id & 15) AS width,
         8 + ((doc_id // 16) & 15) AS height,
         CAST(POWER(2, 1 + doc_id % 8) AS BIGINT) AS p_n
  FROM documents
),
pix AS (
  SELECT d.doc_id, d.width, d.height, d.p_n,
         (7 * a.i + 13 * b.j + d.doc_id) % d.p_n AS p
  FROM dims d,
       UNNEST(generate_series(0, d.height - 1)) AS a(i),
       UNNEST(generate_series(0, d.width - 1)) AS b(j)
)
SELECT doc_id, width, height,
       p_n AS palette_size,
       CAST(COUNT(DISTINCT p) AS BIGINT) AS colors_used,
       CAST(SUM((37 * p + doc_id) % 256 + (11 * p + 2 * doc_id) % 256
                + (53 * p + 3 * doc_id + 1) % 256) AS BIGINT) AS rgb_sum
FROM pix GROUP BY doc_id, width, height, p_n
"""


def q_video_frames(sf_dir: str):
    """REAL video-frame-sampling pipeline, ORACLE-CHECKED end to end: per
    doc a deterministic ANIMATED GIF89a (2..6 frames, per-frame Graphic
    Control delays, NETSCAPE2.0 loop extension, one LZW stream per frame)
    is synthesized with the in-repo codec, then ``VideoFrameSampleActor``
    decodes the container frame-by-frame and keeps every 2nd frame
    (frame 0 always — the thumbnail convention), fanning one input row
    out to one row per SAMPLED frame with exact-integer summaries
    (GCE delay, distinct palette indices used, palette-mapped RGB sum).
    The hash compare against the closed-form DuckDB twin proves every
    sampled frame's LZW index stream AND its extension-block delay were
    reconstructed bit-exactly — the multi-frame "video" sibling of
    q_media_gif (upstream: goose-parser media spans carry opaque binary
    payloads; frame-sampling is the stage a video pipeline runs before
    per-frame feature extraction)."""
    from goose_parser_ray.functions.gifmini import encode_gif_animated
    from goose_parser_ray.functions.multimodal import VideoFrameSampleActor

    def synth(t: pa.Table) -> pa.Table:
        payloads = []
        for d in t["doc_id"].to_pylist():
            w = 8 + (d % 9)
            h = 6 + (d % 7)
            p_n = 1 << (1 + d % 7)  # 2..128, power of two == GCT size
            pi = np.arange(p_n, dtype=np.int64)
            pal = np.stack(
                [
                    (37 * pi + d) % 256,
                    (11 * pi + 2 * d) % 256,
                    (53 * pi + 3 * d + 1) % 256,
                ],
                axis=1,
            ).astype(np.uint8)
            n_frames = 2 + (d % 5)  # 2..6
            i = np.arange(h, dtype=np.int64)[:, None]
            j = np.arange(w, dtype=np.int64)[None, :]
            frames = [
                ((7 * i + 13 * j + 5 * k + d) % p_n).astype(np.uint8)
                for k in range(n_frames)
            ]
            delays = [4 + ((d + 3 * k) % 10) for k in range(n_frames)]
            payloads.append(encode_gif_animated(w, h, pal, frames, delays))
        return pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        synth, batch_format="pyarrow"
    )
    return ds.map_batches(
        # task pool, not actor pool: the actor's setup is an import
        # bind — actor spin-up costs more than it saves (measured
        # on media_png: stage wall 3.0s -> 1.4s at sf0.1/32 CPUs)
        lambda t: VideoFrameSampleActor(stride=2)(t),
        batch_format="pyarrow",
        batch_size=64,  # wide binary payloads — small batches (guide)
    )


SQL_VIDEO_FRAMES = """
WITH dims AS (
  SELECT doc_id,
         8 + (doc_id % 9) AS width,
         6 + (doc_id % 7) AS height,
         CAST(POWER(2, 1 + doc_id % 7) AS BIGINT) AS p_n,
         2 + (doc_id % 5) AS n_frames
  FROM documents
),
fr AS (
  SELECT d.*, f.k AS frame_no
  FROM dims d, UNNEST(generate_series(0, d.n_frames - 1)) AS f(k)
  WHERE f.k % 2 = 0
),
pix AS (
  SELECT fr.doc_id, fr.frame_no,
         (7 * a.i + 13 * b.j + 5 * fr.frame_no + fr.doc_id) % fr.p_n AS p
  FROM fr,
       UNNEST(generate_series(0, fr.height - 1)) AS a(i),
       UNNEST(generate_series(0, fr.width - 1)) AS b(j)
)
SELECT p.doc_id, p.frame_no,
       4 + ((p.doc_id + 3 * p.frame_no) % 10) AS delay_cs,
       CAST(COUNT(DISTINCT p.p) AS BIGINT) AS colors_used,
       CAST(SUM((37 * p.p + p.doc_id) % 256 + (11 * p.p + 2 * p.doc_id) % 256
                + (53 * p.p + 3 * p.doc_id + 1) % 256) AS BIGINT) AS rgb_sum
FROM pix p GROUP BY p.doc_id, p.frame_no
"""


def q_scene_cuts(sf_dir: str):
    """Scene-change detection over a REAL multi-frame container,
    ORACLE-CHECKED: animated GIF89a clips are synthesized so consecutive
    frames within a scene differ by a +1 index drift (motion) while every
    second transition jumps the whole raster by +40 (a cut), the in-repo
    codec decodes each frame, and per transition the SAD (sum of absolute
    index differences against the previous frame — indices are the
    luminance proxy; the synthesized palette is monotone) is compared to
    a per-pixel threshold. One row per transition: (doc_id, frame_no,
    sad, is_cut). The closed-form DuckDB twin re-states every pixel of
    both frames, so the hash compare certifies the decoder reconstructed
    ADJACENT frames consistently — the property frame-sampling alone
    (q_video_frames) never checks. Scale shape: map-only decode + numpy
    SAD, no shuffle."""
    from goose_parser_ray.functions.gifmini import encode_gif_animated
    from goose_parser_ray.functions.gifmini import decode_gif_frames

    def synth(t: pa.Table) -> pa.Table:
        payloads = []
        for d in t["doc_id"].to_pylist():
            w = 8 + (d % 9)
            h = 6 + (d % 7)
            p_n = 1 << (2 + d % 6)  # 4..128
            pi = np.arange(p_n, dtype=np.int64)
            pal = np.stack([(2 * pi) % 256] * 3, axis=1).astype(np.uint8)
            n_frames = 3 + (d % 4)  # 3..6
            i = np.arange(h, dtype=np.int64)[:, None]
            j = np.arange(w, dtype=np.int64)[None, :]
            frames = [
                ((7 * i + 13 * j + d + 40 * (k // 2) + k % 2) % p_n).astype(
                    np.uint8
                )
                for k in range(n_frames)
            ]
            payloads.append(encode_gif_animated(w, h, pal, frames))
        return pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    def sad_stage(t: pa.Table) -> pa.Table:
        doc_ids, frame_nos, sads, cuts = [], [], [], []
        for d, p in zip(t["doc_id"].to_pylist(), t["payload"].to_pylist()):
            w, h, pal, frames, _ = decode_gif_frames(p or b"")
            prev = frames[0].astype(np.int64)
            for k in range(1, len(frames)):
                cur = frames[k].astype(np.int64)
                sad = int(np.abs(cur - prev).sum())
                doc_ids.append(d)
                frame_nos.append(k)
                sads.append(sad)
                cuts.append(sad > 3 * w * h)  # cut = mean |delta| > 3
                prev = cur
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "frame_no": pa.array(frame_nos, pa.int64()),
                "sad": pa.array(sads, pa.int64()),
                "is_cut": pa.array(cuts, pa.bool_()),
            }
        )

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        synth, batch_format="pyarrow"
    )
    return ds.map_batches(
        sad_stage, batch_format="pyarrow", batch_size=128
    )


SQL_SCENE_CUTS = """
WITH dims AS (
  SELECT doc_id,
         8 + (doc_id % 9) AS width,
         6 + (doc_id % 7) AS height,
         CAST(POWER(2, 2 + doc_id % 6) AS BIGINT) AS p_n,
         3 + (doc_id % 4) AS n_frames
  FROM documents
),
tr AS (
  SELECT d.*, f.k AS frame_no
  FROM dims d, UNNEST(generate_series(1, d.n_frames - 1)) AS f(k)
),
pix AS (
  SELECT t.doc_id, t.frame_no, t.width, t.height,
         ABS(
           (7 * a.i + 13 * b.j + t.doc_id
            + 40 * (t.frame_no // 2) + t.frame_no % 2) % t.p_n
           - (7 * a.i + 13 * b.j + t.doc_id
              + 40 * ((t.frame_no - 1) // 2) + (t.frame_no - 1) % 2) % t.p_n
         ) AS ad
  FROM tr t,
       UNNEST(generate_series(0, t.height - 1)) AS a(i),
       UNNEST(generate_series(0, t.width - 1)) AS b(j)
)
SELECT doc_id, frame_no,
       CAST(SUM(ad) AS BIGINT) AS sad,
       SUM(ad) > 3 * width * height AS is_cut
FROM pix GROUP BY doc_id, frame_no, width, height
"""


def q_format_sniff(sf_dir: str):
    """Magic-byte format sniffing + spoof detection over REAL mixed
    payloads, ORACLE-CHECKED: each doc carries an actual encoded file
    (doc_id % 6 rotates through the six in-repo codecs — PNG, GIF, PDF,
    WAV, BMP, PGM) plus a CLAIMED format label that is sometimes wrong
    ((3*doc_id) % 6 — a crawl's Content-Type/extension header is
    untrusted). The sniff stage classifies by leading magic bytes only
    (vectorized slice-compare, never a full decode — the cheap gate a
    100 TB ingest runs before routing payloads to per-format decode
    pools), then (claimed, actual) pairs are counted with map-side
    partials. Mismatched rows are the spoofed ones. The twin re-states
    both labels closed-form; payload LENGTHS are compression-dependent
    and deliberately not emitted."""
    from ray.data.aggregate import Min, Sum

    from goose_parser_ray.functions.bmpmini import encode_bmp
    from goose_parser_ray.functions.gifmini import encode_gif
    from goose_parser_ray.functions.netpbm import encode_pgm
    from goose_parser_ray.functions.pdfmini import encode_pdf
    from goose_parser_ray.functions.pngmini import encode_png
    from goose_parser_ray.functions.wav import encode_wav_pcm16

    FORMATS = ["png", "gif", "pdf", "wav", "bmp", "pgm"]

    def synth(t: pa.Table) -> pa.Table:
        payloads, claimed = [], []
        for d in t["doc_id"].to_pylist():
            kind = d % 6
            g = ((np.arange(64, dtype=np.int64).reshape(8, 8) * 3 + d) % 256
                 ).astype(np.uint8)
            if kind == 0:
                p = encode_png(g)
            elif kind == 1:
                pal = np.stack([np.arange(4, dtype=np.int64) * 60] * 3,
                               axis=1).astype(np.uint8)
                p = encode_gif(8, 8, pal, (g % 4).astype(np.uint8))
            elif kind == 2:
                p = encode_pdf([f"doc {d} line one", "line two"])
            elif kind == 3:
                s = (((np.arange(256, dtype=np.int64) * 31 + d) % 2048)
                     - 1024).astype(np.int16)
                p = encode_wav_pcm16(s)
            elif kind == 4:
                p = encode_bmp(np.stack([g] * 3, axis=2))
            else:
                p = encode_pgm(g)
            payloads.append(p)
            claimed.append(FORMATS[(3 * d) % 6])
        return pa.Table.from_pydict(
            {
                "doc_id": t["doc_id"],
                "claimed": pa.array(claimed, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    def sniff(t: pa.Table) -> pa.Table:
        ps = t["payload"].to_pylist()
        head = np.frombuffer(
            b"".join((p or b"")[:12].ljust(12, b"\x00") for p in ps),
            np.uint8,
        ).reshape(-1, 12)

        def has(prefix: bytes, at: int = 0) -> np.ndarray:
            want = np.frombuffer(prefix, np.uint8)
            return (head[:, at : at + len(want)] == want).all(axis=1)

        actual = np.select(
            [
                has(b"\x89PNG\r\n\x1a\n"),
                has(b"GIF87a") | has(b"GIF89a"),
                has(b"%PDF-"),
                has(b"RIFF") & has(b"WAVE", at=8),
                has(b"BM"),
                has(b"P5"),
            ],
            FORMATS,
            default="unknown",
        )
        return pa.Table.from_pydict(
            {
                "doc_id": t["doc_id"],
                "claimed": t["claimed"],
                "actual": pa.array(actual.tolist(), pa.string()),
            }
        )

    labeled = (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(synth, batch_format="pyarrow", batch_size=256)
        .map_batches(sniff, batch_format="pyarrow")
    )

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = df.groupby(["claimed", "actual"], as_index=False).agg(
            first_doc=("doc_id", "min"), n_docs=("doc_id", "size")
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        labeled.map_batches(partial, batch_format="pyarrow")
        .groupby(["claimed", "actual"])
        .aggregate(
            Min("first_doc", alias_name="first_doc"),
            Sum("n_docs", alias_name="n_docs"),
        )
    )


SQL_FORMAT_SNIFF = """
WITH f(i, name) AS (VALUES (0, 'png'), (1, 'gif'), (2, 'pdf'),
                           (3, 'wav'), (4, 'bmp'), (5, 'pgm')),
lab AS (
  SELECT d.doc_id, fc.name AS claimed, fa.name AS actual
  FROM documents d
  JOIN f fc ON fc.i = (3 * d.doc_id) % 6
  JOIN f fa ON fa.i = d.doc_id % 6
)
SELECT claimed, actual,
       MIN(doc_id) AS first_doc,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM lab GROUP BY claimed, actual
"""


def q_audio_segments(sf_dir: str):
    """Silence-split audio segmentation over REAL WAV PCM,
    ORACLE-CHECKED: per doc an int16 waveform alternates loud bursts
    (|x| ≥ 200) and near-silence (|x| ≤ 25) in 64-sample blocks with a
    doc-dependent phase, is encoded to actual RIFF/PCM bytes, decoded by
    the in-repo codec, and split at the |x| ≥ 100 threshold into
    contiguous voiced runs (vectorized diff-of-mask + reduceat — no
    Python loop over samples). One row per segment: start sample, length,
    peak |x| and the exact |x| sum — the VAD-style pre-segmentation an
    audio pipeline runs before per-segment feature extraction. The
    gaps-and-islands DuckDB twin re-states every sample, so the hash
    compare certifies the PCM byte stream was reconstructed exactly.
    Scale shape: map-only decode + numpy runs, no shuffle."""
    from goose_parser_ray.functions.wav import decode_wav_pcm16
    from goose_parser_ray.functions.wav import encode_wav_pcm16

    def synth(t: pa.Table) -> pa.Table:
        payloads = []
        for d in t["doc_id"].to_pylist():
            n = 512 + 64 * (d % 4)
            ts = np.arange(n, dtype=np.int64)
            loud = ((ts // 64 + d) % 3) != 0
            x = np.where(
                loud, (37 * ts + d) % 1000 + 200, ts % 50 - 25
            ).astype(np.int16)
            payloads.append(encode_wav_pcm16(x))
        return pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    def segment(t: pa.Table) -> pa.Table:
        doc_ids, seg_nos, starts, lengths, peaks, sums = [], [], [], [], [], []
        for d, p in zip(t["doc_id"].to_pylist(), t["payload"].to_pylist()):
            x, _, _ = decode_wav_pcm16(p or b"")
            ax = np.abs(x.astype(np.int64))
            mask = (ax >= 100).astype(np.int8)
            edges = np.flatnonzero(np.diff(np.concatenate(([0], mask, [0]))))
            run_starts, run_ends = edges[0::2], edges[1::2]
            if run_starts.size:
                peak = np.maximum.reduceat(ax, run_starts)
                csum = np.concatenate(([0], np.cumsum(ax)))
                asum = csum[run_ends] - csum[run_starts]
                for s_no in range(run_starts.size):
                    doc_ids.append(d)
                    seg_nos.append(s_no)
                    starts.append(int(run_starts[s_no]))
                    lengths.append(int(run_ends[s_no] - run_starts[s_no]))
                    peaks.append(int(peak[s_no]))
                    sums.append(int(asum[s_no]))
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "seg_no": pa.array(seg_nos, pa.int64()),
                "start_sample": pa.array(starts, pa.int64()),
                "n_samples": pa.array(lengths, pa.int64()),
                "peak_abs": pa.array(peaks, pa.int64()),
                "abs_sum": pa.array(sums, pa.int64()),
            }
        )

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        synth, batch_format="pyarrow", batch_size=256
    )
    return ds.map_batches(segment, batch_format="pyarrow", batch_size=256)


SQL_AUDIO_SEGMENTS = """
WITH s AS (
  SELECT d.doc_id, ts.t,
         CASE WHEN ((ts.t // 64 + d.doc_id) % 3) != 0
              THEN (37 * ts.t + d.doc_id) % 1000 + 200
              ELSE ts.t % 50 - 25 END AS x
  FROM documents d,
       UNNEST(generate_series(0, 511 + 64 * (d.doc_id % 4))) AS ts(t)
),
loud AS (
  SELECT doc_id, t, ABS(x) AS ax,
         t - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY t) AS grp
  FROM s WHERE ABS(x) >= 100
),
runs AS (
  SELECT doc_id, MIN(t) AS start_sample,
         CAST(COUNT(*) AS BIGINT) AS n_samples,
         CAST(MAX(ax) AS BIGINT) AS peak_abs,
         CAST(SUM(ax) AS BIGINT) AS abs_sum
  FROM loud GROUP BY doc_id, grp
)
SELECT doc_id,
       ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY start_sample) - 1
         AS seg_no,
       start_sample, n_samples, peak_abs, abs_sum
FROM runs
"""


def q_pdf_pages(sf_dir: str):
    """MULTI-page PDF page fan-out, ORACLE-CHECKED — the document
    sibling of q_video_frames: each doc's first 24 words paginate into
    up to three REAL PDF pages (one /Page object + one FlateDecode
    content stream per page, /Kids array fixing page order), and
    ``extract_pdf_pages`` walks the object graph back — sequential
    object walk with stream SKIPPING by declared /Length, so compressed
    bytes can never fake an object header — emitting one row per page
    with its line count and reconstructed text. The closed-form twin
    re-slices the same words per page, so the hash compare certifies
    page ORDER (Kids), per-page stream isolation, and Tj text recovery.
    Scale shape: map-only, small batches for wide binaries."""
    from goose_parser_ray.functions.pdfmini import (
        encode_pdf_pages,
        extract_pdf_pages,
    )

    def synth(t: pa.Table) -> pa.Table:
        payloads = []
        for txt in t["text"].to_pylist():
            words = (txt or "").split(" ")[:24]
            pages = [words[i : i + 8] for i in range(0, len(words), 8)] or [[]]
            payloads.append(
                encode_pdf_pages(
                    [
                        [" ".join(pw[i : i + 4]) for i in range(0, len(pw), 4)]
                        for pw in pages
                    ]
                )
            )
        return pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    def per_page(t: pa.Table) -> pa.Table:
        doc_ids, page_nos, n_lines, texts = [], [], [], []
        for d, p in zip(t["doc_id"].to_pylist(), t["payload"].to_pylist()):
            for pno, lines in enumerate(extract_pdf_pages(p or b"")):
                doc_ids.append(d)
                page_nos.append(pno)
                n_lines.append(len(lines))
                texts.append(" ".join(lines))
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "page_no": pa.array(page_nos, pa.int64()),
                "n_lines": pa.array(n_lines, pa.int64()),
                "page_text": pa.array(texts, pa.string()),
            }
        )

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        synth, batch_format="pyarrow"
    )
    return ds.map_batches(
        per_page, batch_format="pyarrow", batch_size=64
    )


SQL_PDF_PAGES = """
WITH w AS (
  SELECT doc_id, list_slice(string_split(text, ' '), 1, 24) AS w24
  FROM documents
),
p AS (
  SELECT doc_id, w24, g.p
  FROM w,
       UNNEST(generate_series(
         0, CAST(CEIL(LEN(w24) / 8.0) AS BIGINT) - 1)) AS g(p)
)
SELECT doc_id, p AS page_no,
       CAST(CEIL(LEAST(LEN(w24) - p * 8, 8) / 4.0) AS BIGINT) AS n_lines,
       array_to_string(
         list_slice(w24, p * 8 + 1, LEAST(p * 8 + 8, LEN(w24))), ' ')
         AS page_text
FROM p
"""


def q_audio_downsample(sf_dir: str):
    """Integer audio decimation (the 16 kHz → 4 kHz front-end resample),
    ORACLE-CHECKED: the same RIFF/PCM waveforms as q_audio_segments are
    decoded and decimated ×4 with a box filter kept as EXACT block SUMS
    (no division, no float — the sum is the mean times a constant, so
    downstream energy math is unchanged and the twin is closed-form).
    Emitted per doc: input/output sample counts and a position-weighted
    checksum Σ (i+1)·out_i that certifies every output sample AND its
    order. Scale shape: map-only decode + one reshape-sum, no shuffle."""
    from goose_parser_ray.functions.wav import decode_wav_pcm16
    from goose_parser_ray.functions.wav import encode_wav_pcm16

    def synth(t: pa.Table) -> pa.Table:
        payloads = []
        for d in t["doc_id"].to_pylist():
            n = 512 + 64 * (d % 4)
            ts = np.arange(n, dtype=np.int64)
            loud = ((ts // 64 + d) % 3) != 0
            x = np.where(
                loud, (37 * ts + d) % 1000 + 200, ts % 50 - 25
            ).astype(np.int16)
            payloads.append(encode_wav_pcm16(x))
        return pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    def decimate(t: pa.Table) -> pa.Table:
        n_ins, n_outs, cks = [], [], []
        for p in t["payload"].to_pylist():
            x, _, _ = decode_wav_pcm16(p or b"")
            xi = x.astype(np.int64)
            out = xi.reshape(-1, 4).sum(axis=1)
            w = np.arange(1, out.size + 1, dtype=np.int64)
            n_ins.append(xi.size)
            n_outs.append(out.size)
            cks.append(int((w * out).sum()))
        return pa.Table.from_pydict(
            {
                "doc_id": t["doc_id"],
                "n_in": pa.array(n_ins, pa.int64()),
                "n_out": pa.array(n_outs, pa.int64()),
                "checksum": pa.array(cks, pa.int64()),
            }
        )

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        synth, batch_format="pyarrow", batch_size=256
    )
    return ds.map_batches(decimate, batch_format="pyarrow", batch_size=256)


SQL_AUDIO_DOWNSAMPLE = """
WITH s AS (
  SELECT d.doc_id, ts.t,
         CASE WHEN ((ts.t // 64 + d.doc_id) % 3) != 0
              THEN (37 * ts.t + d.doc_id) % 1000 + 200
              ELSE ts.t % 50 - 25 END AS x
  FROM documents d,
       UNNEST(generate_series(0, 511 + 64 * (d.doc_id % 4))) AS ts(t)
),
blocks AS (
  SELECT doc_id, t // 4 AS i, SUM(x) AS v
  FROM s GROUP BY doc_id, t // 4
)
SELECT doc_id,
       CAST(4 * COUNT(*) AS BIGINT) AS n_in,
       CAST(COUNT(*) AS BIGINT) AS n_out,
       CAST(SUM((i + 1) * v) AS BIGINT) AS checksum
FROM blocks GROUP BY doc_id
"""


def q_video_neardup(sf_dir: str):
    """VIDEO near-duplicate detection by frame-fingerprint overlap — the
    flagship composition of the media-temporal family, ORACLE-CHECKED:
    every group of four docs shares the same clip CONTENT (seed =
    doc_id - doc_id % 4) but each doc's animated-GIF bytes differ (a
    per-doc dither shifts every 4×4 block sum by the same constant) and
    the clips differ in LENGTH (3..5 frames by doc_id % 3), so byte
    hashing finds nothing while per-frame dHashing after real decode
    finds everything: decode → per-frame difference hash (shared
    ``dhash_from_raster`` kernel) → distinct (doc, hash) → pairs of
    videos sharing ≥ 2 frame fingerprints with the shared-frame count.
    The twin recomputes every frame's 64 bits closed-form (dither
    cancels in block sums) and self-joins on hash equality, certifying
    pair identification AND overlap counts — including the organic
    cross-group collisions from the pattern's period 97. Scale shape:
    map-only decode+hash, pairs form inside data-proportional
    hash-keyed buckets, never all-pairs."""
    import pandas as pd

    from goose_parser_ray.functions.dedup import (
        add_coarse_bucket,
        num_shuffle_buckets,
    )
    from goose_parser_ray.functions.gifmini import (
        decode_gif_frames,
        encode_gif_animated,
    )
    from goose_parser_ray.functions.multimodal import dhash_from_raster

    H, W = 32, 36

    def synth(t: pa.Table) -> pa.Table:
        bi = np.arange(8, dtype=np.int64)[:, None]
        bj = np.arange(9, dtype=np.int64)[None, :]
        i = np.arange(H, dtype=np.int64)[:, None]
        j = np.arange(W, dtype=np.int64)[None, :]
        pal = np.stack([np.arange(256, dtype=np.int64) % 256] * 3, axis=1
                       ).astype(np.uint8)
        payloads = []
        for d in t["doc_id"].to_pylist():
            seed = d - d % 4
            n_frames = 3 + d % 3
            dither = ((2 * i + 3 * j + d) % 4 == 0).astype(np.int64)
            frames = []
            for k in range(n_frames):
                grid = (23 * bi + 41 * bj + 17 * k + seed) % 97 + 50
                img = np.repeat(np.repeat(grid, 4, axis=0), 4, axis=1)
                frames.append((img + dither).astype(np.uint8))
            payloads.append(encode_gif_animated(W, H, pal, frames))
        return pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    def frame_hashes(t: pa.Table) -> pa.Table:
        doc_ids, his, los = [], [], []
        for d, p in zip(t["doc_id"].to_pylist(), t["payload"].to_pylist()):
            _, _, _, frames, _ = decode_gif_frames(p or b"")
            seen = set()
            for fr in frames:
                hi, lo = dhash_from_raster(fr)
                if (hi, lo) not in seen:  # distinct (doc, hash)
                    seen.add((hi, lo))
                    doc_ids.append(d)
                    his.append(hi)
                    los.append(lo)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "hi": pa.array(his, pa.int64()),
                "lo": pa.array(los, pa.int64()),
            }
        )

    ds = _read(sf_dir, "documents", ["doc_id"])
    nb = num_shuffle_buckets(ds.count() * 4)
    hashes = (
        ds.map_batches(synth, batch_format="pyarrow", batch_size=64)
        .map_batches(frame_hashes, batch_format="pyarrow", batch_size=64)
        .map_batches(
            lambda t: add_coarse_bucket(t, ["hi", "lo"], nb),
            batch_format="pyarrow",
        )
    )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, f in g.groupby(["hi", "lo"], sort=False):
            ids = np.sort(f["doc_id"].to_numpy(np.int64))
            if len(ids) < 2:
                continue
            ii, jj = np.triu_indices(len(ids), k=1)
            out_a.append(ids[ii])
            out_b.append(ids[jj])
        if not out_a:
            return pd.DataFrame(
                {
                    "id_a": pd.Series([], dtype=np.int64),
                    "id_b": pd.Series([], dtype=np.int64),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        df = pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        )
        out = df.groupby(["id_a", "id_b"], as_index=False).size()
        return out.rename(columns={"size": "n"})

    pairs = hashes.groupby("__b").map_groups(
        pairs_in_bucket, batch_format="pandas"
    )
    agg = pre_aggregated_sum(pairs, keys=["id_a", "id_b"], sums={"n": "n"})

    def gate(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(n >= 2))
        return t.rename_columns(["id_a", "id_b", "n_shared"])

    return agg.map_batches(gate, batch_format="pyarrow")


SQL_VIDEO_NEARDUP = """
WITH fr AS (
  SELECT d.doc_id, d.doc_id - d.doc_id % 4 AS seed, f.k
  FROM documents d,
       UNNEST(generate_series(0, 2 + d.doc_id % 3)) AS f(k)
),
bits AS (
  SELECT fr.doc_id, fr.k, bi.bi, bj.bj,
         CASE WHEN (23 * bi.bi + 41 * bj.bj + 17 * fr.k + fr.seed) % 97
                 > (23 * bi.bi + 41 * (bj.bj + 1) + 17 * fr.k + fr.seed) % 97
              THEN 1 ELSE 0 END AS bit
  FROM fr,
       UNNEST(generate_series(0, 7)) AS bi(bi),
       UNNEST(generate_series(0, 7)) AS bj(bj)
),
h AS (
  SELECT DISTINCT doc_id,
         CAST(SUM(CASE WHEN bi < 4
                       THEN bit * (CAST(1 AS BIGINT) << (8 * bi + bj))
                       ELSE 0 END) AS BIGINT) AS lo,
         CAST(SUM(CASE WHEN bi >= 4
                       THEN bit * (CAST(1 AS BIGINT) << (8 * (bi - 4) + bj))
                       ELSE 0 END) AS BIGINT) AS hi
  FROM bits GROUP BY doc_id, k
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM h a JOIN h b ON a.doc_id < b.doc_id AND a.hi = b.hi AND a.lo = b.lo
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= 2
"""


def q_rgb_to_luma(sf_dir: str):
    """RGB → luma conversion (integer BT.601: Y = (77R + 150G + 29B) >> 8,
    the JPEG/vision-preprocessing grayscale step), ORACLE-CHECKED over
    REAL image bytes: deterministic RGB gradients are encoded to actual
    binary PPM (P6), decoded by the in-repo Netpbm codec, converted with
    the fixed-point kernel (no floats — the >> 8 IS the spec), and
    summarized as exact integers (luma sum, min, max) so the twin
    certifies every converted pixel. Scale shape: map-only decode +
    vectorized integer dot, no shuffle."""
    from goose_parser_ray.functions.netpbm import decode_ppm, encode_ppm

    def synth(t: pa.Table) -> pa.Table:
        payloads = []
        for d in t["doc_id"].to_pylist():
            w = 9 + (d % 6)
            h = 7 + (d % 5)
            i = np.arange(h, dtype=np.int64)[:, None, None]
            j = np.arange(w, dtype=np.int64)[None, :, None]
            c = np.arange(3, dtype=np.int64)[None, None, :]
            img = ((19 * i + 31 * j + 83 * c + d) % 256).astype(np.uint8)
            payloads.append(encode_ppm(img))
        return pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    def luma(t: pa.Table) -> pa.Table:
        sums, mins, maxs = [], [], []
        for p in t["payload"].to_pylist():
            img = decode_ppm(p or b"").astype(np.int64)
            y = (77 * img[:, :, 0] + 150 * img[:, :, 1] + 29 * img[:, :, 2]
                 ) >> 8
            sums.append(int(y.sum()))
            mins.append(int(y.min()))
            maxs.append(int(y.max()))
        return pa.Table.from_pydict(
            {
                "doc_id": t["doc_id"],
                "luma_sum": pa.array(sums, pa.int64()),
                "luma_min": pa.array(mins, pa.int64()),
                "luma_max": pa.array(maxs, pa.int64()),
            }
        )

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        synth, batch_format="pyarrow", batch_size=256
    )
    return ds.map_batches(luma, batch_format="pyarrow", batch_size=256)


SQL_RGB_TO_LUMA = """
WITH pix AS (
  SELECT d.doc_id,
         (77 * ((19 * a.i + 31 * b.j + d.doc_id) % 256)
          + 150 * ((19 * a.i + 31 * b.j + 83 + d.doc_id) % 256)
          + 29 * ((19 * a.i + 31 * b.j + 166 + d.doc_id) % 256)) // 256 AS y
  FROM documents d,
       UNNEST(generate_series(0, 6 + (d.doc_id % 5))) AS a(i),
       UNNEST(generate_series(0, 8 + (d.doc_id % 6))) AS b(j)
)
SELECT doc_id,
       CAST(SUM(y) AS BIGINT) AS luma_sum,
       CAST(MIN(y) AS BIGINT) AS luma_min,
       CAST(MAX(y) AS BIGINT) AS luma_max
FROM pix GROUP BY doc_id
"""


def q_audio_mixdown(sf_dir: str):
    """Stereo → mono mixdown over REAL 2-channel RIFF/PCM bytes,
    ORACLE-CHECKED: per doc an interleaved stereo waveform (distinct L/R
    formulas) is encoded with channels=2, decoded by the in-repo codec,
    de-interleaved, and mixed as EXACT SUMS L+R (no /2, no float — the
    sum is the mean times two, so downstream energy math is unchanged);
    emitted per doc: frame count and the position-weighted mono checksum
    Σ (i+1)·(L_i+R_i) certifying every frame of BOTH channels and the
    interleave order. Scale shape: map-only, no shuffle."""
    from goose_parser_ray.functions.wav import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    def synth(t: pa.Table) -> pa.Table:
        payloads = []
        for d in t["doc_id"].to_pylist():
            n = 256 + 32 * (d % 4)  # frames
            ts = np.arange(n, dtype=np.int64)
            left = (53 * ts + d) % 2000 - 1000
            right = (29 * ts + 2 * d) % 1500 - 750
            inter = np.empty(2 * n, dtype=np.int16)
            inter[0::2] = left.astype(np.int16)
            inter[1::2] = right.astype(np.int16)
            payloads.append(encode_wav_pcm16(inter, channels=2))
        return pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    def mixdown(t: pa.Table) -> pa.Table:
        frames_out, cks = [], []
        for p in t["payload"].to_pylist():
            x, _, ch = decode_wav_pcm16(p or b"")
            if ch != 2:
                raise ValueError("mixdown: expected stereo payload")
            xi = x.astype(np.int64)
            mono = xi[0::2] + xi[1::2]
            w = np.arange(1, mono.size + 1, dtype=np.int64)
            frames_out.append(mono.size)
            cks.append(int((w * mono).sum()))
        return pa.Table.from_pydict(
            {
                "doc_id": t["doc_id"],
                "n_frames": pa.array(frames_out, pa.int64()),
                "checksum": pa.array(cks, pa.int64()),
            }
        )

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        synth, batch_format="pyarrow", batch_size=256
    )
    return ds.map_batches(mixdown, batch_format="pyarrow", batch_size=256)


SQL_AUDIO_MIXDOWN = """
WITH s AS (
  SELECT d.doc_id, ts.t,
         (53 * ts.t + d.doc_id) % 2000 - 1000
           + (29 * ts.t + 2 * d.doc_id) % 1500 - 750 AS mono
  FROM documents d,
       UNNEST(generate_series(0, 255 + 32 * (d.doc_id % 4))) AS ts(t)
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(SUM((t + 1) * mono) AS BIGINT) AS checksum
FROM s GROUP BY doc_id
"""


def q_hist_equalize(sf_dir: str):
    """Histogram EQUALIZATION (the classic contrast-normalization
    preprocessing step, in the OpenCV integer formulation
    out = (cdf(v) − cdf_min) · 255 // (n − cdf_min)), ORACLE-CHECKED
    over REAL image bytes: deterministic low-contrast grayscale PGMs are
    decoded by the in-repo codec, equalized with a vectorized
    bincount→cumsum→lookup (no floats — integer floor division IS the
    spec), and summarized as exact integers (equalized sum, min, max,
    distinct levels). The twin rebuilds the per-image CDF with a window
    cumsum and maps every pixel through it, so the hash compare
    certifies the whole transform pixel-exactly. Scale shape: map-only
    decode + O(pixels + 256) per image, no shuffle."""
    from goose_parser_ray.functions.netpbm import decode_pgm, encode_pgm

    def synth(t: pa.Table) -> pa.Table:
        payloads = []
        for d in t["doc_id"].to_pylist():
            w = 12 + (d % 5)
            h = 10 + (d % 7)
            i = np.arange(h, dtype=np.int64)[:, None]
            j = np.arange(w, dtype=np.int64)[None, :]
            # low-contrast band [60, 60+40): equalization must stretch it
            img = (60 + (7 * i + 11 * j + d) % 40).astype(np.uint8)
            payloads.append(encode_pgm(img))
        return pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    def equalize(t: pa.Table) -> pa.Table:
        sums, mins, maxs, lvls = [], [], [], []
        for p in t["payload"].to_pylist():
            img = decode_pgm(p or b"").astype(np.int64)
            n = img.size
            hist = np.bincount(img.ravel(), minlength=256)
            cdf = np.cumsum(hist)
            cdf_min = int(cdf[np.nonzero(hist)[0][0]])
            lut = (cdf - cdf_min) * 255 // (n - cdf_min)
            out = lut[img]
            sums.append(int(out.sum()))
            mins.append(int(out.min()))
            maxs.append(int(out.max()))
            lvls.append(int(np.unique(out).size))
        return pa.Table.from_pydict(
            {
                "doc_id": t["doc_id"],
                "eq_sum": pa.array(sums, pa.int64()),
                "eq_min": pa.array(mins, pa.int64()),
                "eq_max": pa.array(maxs, pa.int64()),
                "eq_levels": pa.array(lvls, pa.int64()),
            }
        )

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        synth, batch_format="pyarrow", batch_size=256
    )
    return ds.map_batches(equalize, batch_format="pyarrow", batch_size=256)


SQL_HIST_EQUALIZE = """
WITH pix AS (
  SELECT d.doc_id,
         60 + (7 * a.i + 11 * b.j + d.doc_id) % 40 AS v
  FROM documents d,
       UNNEST(generate_series(0, 9 + (d.doc_id % 7))) AS a(i),
       UNNEST(generate_series(0, 11 + (d.doc_id % 5))) AS b(j)
),
hist AS (
  SELECT doc_id, v, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM pix GROUP BY doc_id, v
),
cdf AS (
  SELECT doc_id, v, cnt,
         SUM(cnt) OVER (PARTITION BY doc_id ORDER BY v
                        ROWS UNBOUNDED PRECEDING) AS c,
         SUM(cnt) OVER (PARTITION BY doc_id) AS n
  FROM hist
),
firsts AS (
  SELECT doc_id, MIN(v) AS v0 FROM hist GROUP BY doc_id
),
lut AS (
  SELECT c.doc_id, c.v,
         (c.c - f0.c0) * 255 // (c.n - f0.c0) AS outv,
         c.cnt
  FROM cdf c
  JOIN (SELECT c2.doc_id, c2.c AS c0
        FROM cdf c2 JOIN firsts f ON f.doc_id = c2.doc_id AND f.v0 = c2.v)
       f0 ON f0.doc_id = c.doc_id
)
SELECT doc_id,
       CAST(SUM(outv * cnt) AS BIGINT) AS eq_sum,
       CAST(MIN(outv) AS BIGINT) AS eq_min,
       CAST(MAX(outv) AS BIGINT) AS eq_max,
       CAST(COUNT(DISTINCT outv) AS BIGINT) AS eq_levels
FROM lut GROUP BY doc_id
"""


def q_otsu_threshold(sf_dir: str):
    """Otsu binarization threshold (the OCR/document-scan segmentation
    step), ORACLE-CHECKED with EXACT arithmetic end to end: bimodal
    grayscale PGMs (a dark band and a bright band mixed per pixel) are
    decoded by the in-repo codec and the threshold maximizing
    between-class variance is found over the present gray levels. The
    objective (S·W0 − S0·N)² / (W0·(N−W0)) is a fraction; to keep the
    argmax float-free BOTH sides evaluate the quotient
    num·10¹⁸ // den — Python big ints here, HUGEINT in the DuckDB twin —
    with the smallest-threshold tie-break, so threshold, foreground
    count AND the scaled objective value hash-match exactly. Scale
    shape: map-only decode + a ≤256-level loop per image (constant
    work, the codec-loop class), no shuffle."""
    from goose_parser_ray.functions.netpbm import decode_pgm, encode_pgm

    SCALE = 10**18

    def synth(t: pa.Table) -> pa.Table:
        payloads = []
        for d in t["doc_id"].to_pylist():
            w = 12 + (d % 5)
            h = 10 + (d % 7)
            i = np.arange(h, dtype=np.int64)[:, None]
            j = np.arange(w, dtype=np.int64)[None, :]
            dark = 30 + (5 * i + 7 * j + d) % 25
            bright = 170 + (3 * i + 11 * j + d) % 30
            fg = (2 * i + 3 * j + d) % 5 < 2  # ~40% bright pixels
            img = np.where(fg, bright, dark).astype(np.uint8)
            payloads.append(encode_pgm(img))
        return pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    def otsu(t: pa.Table) -> pa.Table:
        ts_, fgs, qs = [], [], []
        for p in t["payload"].to_pylist():
            img = decode_pgm(p or b"").astype(np.int64)
            n = int(img.size)
            s_tot = int(img.sum())
            vals, cnts = np.unique(img.ravel(), return_counts=True)
            best = (-1, -1, -1)  # (q, -t) ordering via explicit compare
            w0 = s0 = 0
            for v, c in zip(vals.tolist(), cnts.tolist()):
                w0 += c
                s0 += v * c
                if w0 == n:
                    break  # class1 empty — not a valid threshold
                num = (s_tot * w0 - s0 * n) ** 2
                den = w0 * (n - w0)
                q = num * SCALE // den
                if q > best[0]:
                    best = (q, v, n - w0)
            ts_.append(best[1])
            fgs.append(best[2])
            qs.append(best[0])
        return pa.Table.from_pydict(
            {
                "doc_id": t["doc_id"],
                "otsu_t": pa.array(ts_, pa.int64()),
                "n_fg": pa.array(fgs, pa.int64()),
                "score_q": pa.array([str(q) for q in qs], pa.string()),
            }
        )

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        synth, batch_format="pyarrow", batch_size=256
    )
    return ds.map_batches(otsu, batch_format="pyarrow", batch_size=256)


SQL_OTSU_THRESHOLD = """
WITH pix AS (
  SELECT d.doc_id,
         CASE WHEN (2 * a.i + 3 * b.j + d.doc_id) % 5 < 2
              THEN 170 + (3 * a.i + 11 * b.j + d.doc_id) % 30
              ELSE 30 + (5 * a.i + 7 * b.j + d.doc_id) % 25 END AS v
  FROM documents d,
       UNNEST(generate_series(0, 9 + (d.doc_id % 7))) AS a(i),
       UNNEST(generate_series(0, 11 + (d.doc_id % 5))) AS b(j)
),
hist AS (
  SELECT doc_id, v, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM pix GROUP BY doc_id, v
),
cum AS (
  SELECT doc_id, v,
         SUM(cnt) OVER (PARTITION BY doc_id ORDER BY v
                        ROWS UNBOUNDED PRECEDING) AS w0,
         SUM(v * cnt) OVER (PARTITION BY doc_id ORDER BY v
                            ROWS UNBOUNDED PRECEDING) AS s0,
         SUM(cnt) OVER (PARTITION BY doc_id) AS n,
         SUM(v * cnt) OVER (PARTITION BY doc_id) AS s
  FROM hist
),
scored AS (
  SELECT doc_id, v, n - w0 AS n_fg,
         CAST(CAST(s * w0 - s0 * n AS HUGEINT)
              * CAST(s * w0 - s0 * n AS HUGEINT)
              * CAST(1000000000000000000 AS HUGEINT)
              // CAST(w0 * (n - w0) AS HUGEINT) AS HUGEINT) AS q
  FROM cum WHERE w0 < n
),
ranked AS (
  SELECT doc_id, v, n_fg, q,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY q DESC, v ASC) AS rn
  FROM scored
)
SELECT doc_id, CAST(v AS BIGINT) AS otsu_t,
       CAST(n_fg AS BIGINT) AS n_fg,
       CAST(q AS VARCHAR) AS score_q
FROM ranked WHERE rn = 1
"""


def ccl_blob_stats(img) -> "tuple[int, int, int]":
    """Runs-based two-pass 8-connected component labeling over a boolean
    mask; returns (n_blobs, max_area, total_foreground). Union-find over
    row runs — the standard scan-line CCL, no per-pixel Python."""
    parent: "dict[int, int]" = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    run_id = 0
    prev_runs: "list[tuple[int, int, int]]" = []  # raw half-open (s, e, id)
    sizes: "dict[int, int]" = {}
    for row in img:
        edges = np.flatnonzero(
            np.diff(np.concatenate(([0], row.view(np.int8), [0])))
        )
        cur = []
        for s, e in zip(edges[0::2], edges[1::2]):
            rid = run_id
            run_id += 1
            parent[rid] = rid
            sizes[rid] = int(e - s)
            # 8-connectivity against RAW half-open prev-row runs:
            # cur cols [s, e-1], prev cols [ps, pe-1]; diagonal touch
            # iff s <= (pe-1)+1 and ps <= (e-1)+1, i.e. s<=pe, ps<=e.
            # (Storing expanded bounds AND comparing with <= double-counted
            # the tolerance, wrongly unioning runs across a 2-column gap.)
            for ps, pe, pid in prev_runs:
                if s <= pe and ps <= e:
                    union(rid, pid)
            cur.append((int(s), int(e), rid))
        prev_runs = cur
    blob_sizes: "dict[int, int]" = {}
    for rid, sz in sizes.items():
        root = find(rid)
        blob_sizes[root] = blob_sizes.get(root, 0) + sz
    return (
        len(blob_sizes),
        max(blob_sizes.values()) if blob_sizes else 0,
        sum(blob_sizes.values()),
    )


def q_image_blobs(sf_dir: str):
    """Connected-component BLOB labeling on binary masks (the OCR /
    document-layout step after binarization), ORACLE-CHECKED: masks with
    1..4 disjoint rectangles (deterministic placement with ≥3 px
    separation) are encoded as real PGM bytes, decoded, and labeled by a
    REAL runs-based two-pass union-find (row runs → union 8-connected
    overlaps between consecutive rows — the standard scan-line CCL, no
    per-pixel Python), emitting blob count, largest blob area and total
    foreground. The twin states the planted rectangle geometry closed
    form, so a labeling bug that merges or splits ANY blob breaks the
    hash. Scale shape: map-only decode + per-image bounded labeling, no
    shuffle."""
    from goose_parser_ray.functions.netpbm import decode_pgm, encode_pgm

    def synth(t: pa.Table) -> pa.Table:
        payloads = []
        for d in t["doc_id"].to_pylist():
            img = np.zeros((32, 40), np.uint8)
            k = 1 + d % 4
            for r in range(k):
                x0 = 2 + 9 * r
                y0 = 3 + 6 * r
                wr = 3 + (d + r) % 4
                hr = 2 + (d + 2 * r) % 3
                img[y0 : y0 + hr, x0 : x0 + wr] = 255
            payloads.append(encode_pgm(img))
        return pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    def label(t: pa.Table) -> pa.Table:
        nb, ma, tf = [], [], []
        for p in t["payload"].to_pylist():
            b, a, f = ccl_blob_stats(decode_pgm(p or b"") > 0)
            nb.append(b)
            ma.append(a)
            tf.append(f)
        return pa.Table.from_pydict(
            {
                "doc_id": t["doc_id"],
                "n_blobs": pa.array(nb, pa.int64()),
                "max_area": pa.array(ma, pa.int64()),
                "total_fg": pa.array(tf, pa.int64()),
            }
        )

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        synth, batch_format="pyarrow", batch_size=256
    )
    return ds.map_batches(label, batch_format="pyarrow", batch_size=256)


SQL_IMAGE_BLOBS = """
WITH rects AS (
  SELECT d.doc_id,
         (3 + (d.doc_id + r.r) % 4) * (2 + (d.doc_id + 2 * r.r) % 3)
           AS area
  FROM documents d,
       UNNEST(generate_series(0, d.doc_id % 4)) AS r(r)
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_blobs,
       CAST(MAX(area) AS BIGINT) AS max_area,
       CAST(SUM(area) AS BIGINT) AS total_fg
FROM rects GROUP BY doc_id
"""


def q_sobel_energy(sf_dir: str):
    """Sobel edge energy (the canonical gradient feature extraction),
    ORACLE-CHECKED with exact integers: textured grayscale PGMs are
    decoded by the in-repo codec and convolved with the integer Sobel
    pair (Gx = [[-1,0,1],[-2,0,2],[-1,0,1]], Gy its transpose) over the
    INTERIOR pixels (no border-policy ambiguity), summarizing per doc
    the L1 gradient magnitude sum |Gx|+|Gy| and its maximum — the
    blur/sharpness signal an image-quality gate thresholds on. The
    convolution is pure slice arithmetic (vectorized, no Python pixel
    loop); the twin re-states every neighbor from the pixel formula
    closed-form. Scale shape: map-only, no shuffle."""
    from goose_parser_ray.functions.netpbm import decode_pgm, encode_pgm

    def synth(t: pa.Table) -> pa.Table:
        payloads = []
        for d in t["doc_id"].to_pylist():
            w = 12 + (d % 5)
            h = 10 + (d % 7)
            i = np.arange(h, dtype=np.int64)[:, None]
            j = np.arange(w, dtype=np.int64)[None, :]
            img = (60 + (7 * i + 11 * j + d) % 40).astype(np.uint8)
            payloads.append(encode_pgm(img))
        return pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    def sobel(t: pa.Table) -> pa.Table:
        sums, maxs = [], []
        for p in t["payload"].to_pylist():
            a = decode_pgm(p or b"").astype(np.int64)
            gx = (
                (a[:-2, 2:] + 2 * a[1:-1, 2:] + a[2:, 2:])
                - (a[:-2, :-2] + 2 * a[1:-1, :-2] + a[2:, :-2])
            )
            gy = (
                (a[2:, :-2] + 2 * a[2:, 1:-1] + a[2:, 2:])
                - (a[:-2, :-2] + 2 * a[:-2, 1:-1] + a[:-2, 2:])
            )
            mag = np.abs(gx) + np.abs(gy)
            sums.append(int(mag.sum()))
            maxs.append(int(mag.max()))
        return pa.Table.from_pydict(
            {
                "doc_id": t["doc_id"],
                "edge_sum": pa.array(sums, pa.int64()),
                "edge_max": pa.array(maxs, pa.int64()),
            }
        )

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        synth, batch_format="pyarrow", batch_size=256
    )
    return ds.map_batches(sobel, batch_format="pyarrow", batch_size=256)


SQL_SOBEL_ENERGY = """
WITH g AS (
  SELECT d.doc_id, a.i, b.j,
         (60 + (7 * (a.i - 1) + 11 * (b.j + 1) + d.doc_id) % 40)
           + 2 * (60 + (7 * a.i + 11 * (b.j + 1) + d.doc_id) % 40)
           + (60 + (7 * (a.i + 1) + 11 * (b.j + 1) + d.doc_id) % 40)
           - (60 + (7 * (a.i - 1) + 11 * (b.j - 1) + d.doc_id) % 40)
           - 2 * (60 + (7 * a.i + 11 * (b.j - 1) + d.doc_id) % 40)
           - (60 + (7 * (a.i + 1) + 11 * (b.j - 1) + d.doc_id) % 40)
           AS gx,
         (60 + (7 * (a.i + 1) + 11 * (b.j - 1) + d.doc_id) % 40)
           + 2 * (60 + (7 * (a.i + 1) + 11 * b.j + d.doc_id) % 40)
           + (60 + (7 * (a.i + 1) + 11 * (b.j + 1) + d.doc_id) % 40)
           - (60 + (7 * (a.i - 1) + 11 * (b.j - 1) + d.doc_id) % 40)
           - 2 * (60 + (7 * (a.i - 1) + 11 * b.j + d.doc_id) % 40)
           - (60 + (7 * (a.i - 1) + 11 * (b.j + 1) + d.doc_id) % 40)
           AS gy
  FROM documents d,
       UNNEST(generate_series(1, 8 + (d.doc_id % 7))) AS a(i),
       UNNEST(generate_series(1, 10 + (d.doc_id % 5))) AS b(j)
)
SELECT doc_id,
       CAST(SUM(ABS(gx) + ABS(gy)) AS BIGINT) AS edge_sum,
       CAST(MAX(ABS(gx) + ABS(gy)) AS BIGINT) AS edge_max
FROM g GROUP BY doc_id
"""


def q_template_match(sf_dir: str):
    """Exact TEMPLATE MATCHING (integer SSD over all offsets — the
    logo/watermark localization primitive), ORACLE-CHECKED with a
    planted ground truth: each doc's 24×28 texture carries a bilinear
    i·j term (so no two offsets look alike), a 6×7 template is cropped
    at a doc-dependent location, BOTH are round-tripped through real PGM
    bytes, and the matcher scans every offset computing the exact sum of
    squared differences with a (smallest dy, then dx) tie-break — the
    planted offset scores SSD 0 and must be recovered. The twin
    re-states the full offset×pixel SSD surface closed-form, so a
    matcher that is off by one pixel ANYWHERE breaks the hash. Scale
    shape: map-only decode + a bounded offset loop with vectorized
    window diffs (constant per image), no shuffle."""
    from goose_parser_ray.functions.netpbm import decode_pgm, encode_pgm

    H, W, TH, TW = 24, 28, 6, 7

    def synth(t: pa.Table) -> pa.Table:
        imgs, tmpls = [], []
        for d in t["doc_id"].to_pylist():
            i = np.arange(H, dtype=np.int64)[:, None]
            j = np.arange(W, dtype=np.int64)[None, :]
            img = ((13 * i + 17 * j + i * j + d) % 251).astype(np.uint8)
            y0 = 3 + d % 9
            x0 = 4 + d % 11
            imgs.append(encode_pgm(img))
            tmpls.append(encode_pgm(img[y0 : y0 + TH, x0 : x0 + TW]))
        return pa.Table.from_pydict(
            {
                "doc_id": t["doc_id"],
                "image": pa.array(imgs, pa.binary()),
                "template": pa.array(tmpls, pa.binary()),
            }
        )

    def match(t: pa.Table) -> pa.Table:
        dys, dxs, ssds = [], [], []
        for ip, tp in zip(t["image"].to_pylist(), t["template"].to_pylist()):
            img = decode_pgm(ip or b"").astype(np.int64)
            tmpl = decode_pgm(tp or b"").astype(np.int64)
            best = None
            for dy in range(H - TH + 1):
                win = img[dy : dy + TH]
                for dx in range(W - TW + 1):
                    ssd = int(
                        ((win[:, dx : dx + TW] - tmpl) ** 2).sum()
                    )
                    if best is None or ssd < best[0]:
                        best = (ssd, dy, dx)
            dys.append(best[1])
            dxs.append(best[2])
            ssds.append(best[0])
        return pa.Table.from_pydict(
            {
                "doc_id": t["doc_id"],
                "best_dy": pa.array(dys, pa.int64()),
                "best_dx": pa.array(dxs, pa.int64()),
                "ssd_min": pa.array(ssds, pa.int64()),
            }
        )

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        synth, batch_format="pyarrow", batch_size=128
    )
    return ds.map_batches(match, batch_format="pyarrow", batch_size=128)


SQL_TEMPLATE_MATCH = """
WITH surf AS (
  SELECT d.doc_id, o.dy, o.dx,
         SUM(POWER(
           (13 * (o.dy + p.ti) + 17 * (o.dx + p.tj)
              + (o.dy + p.ti) * (o.dx + p.tj) + d.doc_id) % 251
           - (13 * (3 + d.doc_id % 9 + p.ti)
              + 17 * (4 + d.doc_id % 11 + p.tj)
              + (3 + d.doc_id % 9 + p.ti) * (4 + d.doc_id % 11 + p.tj)
              + d.doc_id) % 251, 2)) AS ssd
  FROM documents d,
       (SELECT a.dy, b.dx
        FROM UNNEST(generate_series(0, 18)) AS a(dy),
             UNNEST(generate_series(0, 21)) AS b(dx)) o,
       (SELECT a.ti, b.tj
        FROM UNNEST(generate_series(0, 5)) AS a(ti),
             UNNEST(generate_series(0, 6)) AS b(tj)) p
  GROUP BY d.doc_id, o.dy, o.dx
),
ranked AS (
  SELECT doc_id, dy, dx, ssd,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY ssd ASC, dy ASC, dx ASC) AS rn
  FROM surf
)
SELECT doc_id, CAST(dy AS BIGINT) AS best_dy,
       CAST(dx AS BIGINT) AS best_dx,
       CAST(ssd AS BIGINT) AS ssd_min
FROM ranked WHERE rn = 1
"""


def q_integral_image(sf_dir: str):
    """Summed-area table (integral image — the O(1) box-sum primitive
    behind Viola–Jones features and fast box blurs), ORACLE-CHECKED:
    decoded PGMs build a 2-D prefix-sum table once, then five
    doc-dependent rectangular windows are answered by the 4-corner
    identity SAT[y1,x1] − SAT[y0-1,x1] − SAT[y1,x0-1] + SAT[y0-1,x0-1];
    the twin computes the same window sums by brute-force pixel
    summation, so any corner-index error in the SAT lookup breaks the
    hash. One row per (doc, window). Scale shape: map-only, constant
    per image, no shuffle."""
    from goose_parser_ray.functions.netpbm import decode_pgm, encode_pgm

    H, W = 20, 24

    def synth(t: pa.Table) -> pa.Table:
        payloads = []
        for d in t["doc_id"].to_pylist():
            i = np.arange(H, dtype=np.int64)[:, None]
            j = np.arange(W, dtype=np.int64)[None, :]
            img = ((11 * i + 23 * j + d) % 256).astype(np.uint8)
            payloads.append(encode_pgm(img))
        return pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    def windows_for(d: int):
        out = []
        for q in range(5):
            y0 = (3 * d + 5 * q) % (H - 4)
            x0 = (7 * d + 11 * q) % (W - 5)
            y1 = y0 + 2 + (d + q) % 3
            x1 = x0 + 3 + (d + 2 * q) % 2
            out.append((q, y0, x0, y1, x1))
        return out

    def sat_query(t: pa.Table) -> pa.Table:
        doc_ids, q_nos, sums = [], [], []
        for d, p in zip(t["doc_id"].to_pylist(), t["payload"].to_pylist()):
            img = decode_pgm(p or b"").astype(np.int64)
            sat = np.zeros((H + 1, W + 1), np.int64)
            sat[1:, 1:] = img.cumsum(axis=0).cumsum(axis=1)
            for q, y0, x0, y1, x1 in windows_for(d):
                s = int(
                    sat[y1 + 1, x1 + 1]
                    - sat[y0, x1 + 1]
                    - sat[y1 + 1, x0]
                    + sat[y0, x0]
                )
                doc_ids.append(d)
                q_nos.append(q)
                sums.append(s)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "q_no": pa.array(q_nos, pa.int64()),
                "window_sum": pa.array(sums, pa.int64()),
            }
        )

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        synth, batch_format="pyarrow", batch_size=256
    )
    return ds.map_batches(sat_query, batch_format="pyarrow", batch_size=256)


SQL_INTEGRAL_IMAGE = """
WITH wins AS (
  SELECT d.doc_id, q.q,
         (3 * d.doc_id + 5 * q.q) % 16 AS y0,
         (7 * d.doc_id + 11 * q.q) % 19 AS x0,
         (3 * d.doc_id + 5 * q.q) % 16 + 2 + (d.doc_id + q.q) % 3 AS y1,
         (7 * d.doc_id + 11 * q.q) % 19 + 3 + (d.doc_id + 2 * q.q) % 2
           AS x1
  FROM documents d, UNNEST(generate_series(0, 4)) AS q(q)
),
px AS (
  SELECT w.doc_id, w.q,
         (11 * a.i + 23 * b.j + w.doc_id) % 256 AS v
  FROM wins w,
       UNNEST(generate_series(w.y0, w.y1)) AS a(i),
       UNNEST(generate_series(w.x0, w.x1)) AS b(j)
)
SELECT doc_id, CAST(q AS BIGINT) AS q_no,
       CAST(SUM(v) AS BIGINT) AS window_sum
FROM px GROUP BY doc_id, q
"""


def q_image_pyramid(sf_dir: str):
    """Multi-resolution image PYRAMID (the mipmap/coarse-to-fine
    preprocessing structure), ORACLE-CHECKED: 32×32 decoded rasters are
    reduced through 3 levels of 2× box downsampling kept as EXACT block
    SUMS (level L cell = sum of its 4^L source pixels — no division, no
    float), each level summarized by its cell count, total (invariant
    across levels — the conservation check is part of the hash) and a
    position-weighted checksum certifying every cell and its layout.
    One row per (doc, level). Scale shape: map-only decode + reshape
    sums, no shuffle."""
    from goose_parser_ray.functions.netpbm import decode_pgm, encode_pgm

    N = 32

    def synth(t: pa.Table) -> pa.Table:
        payloads = []
        for d in t["doc_id"].to_pylist():
            i = np.arange(N, dtype=np.int64)[:, None]
            j = np.arange(N, dtype=np.int64)[None, :]
            img = ((29 * i + 37 * j + d) % 256).astype(np.uint8)
            payloads.append(encode_pgm(img))
        return pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    def pyramid(t: pa.Table) -> pa.Table:
        doc_ids, levels, cells, totals, cks = [], [], [], [], []
        for d, p in zip(t["doc_id"].to_pylist(), t["payload"].to_pylist()):
            a = decode_pgm(p or b"").astype(np.int64)
            for lvl in range(1, 4):
                n = N >> lvl
                a = a.reshape(n, 2, n, 2).sum(axis=(1, 3))
                w = (
                    np.arange(1, n * n + 1, dtype=np.int64).reshape(n, n)
                )
                doc_ids.append(d)
                levels.append(lvl)
                cells.append(n * n)
                totals.append(int(a.sum()))
                cks.append(int((w * a).sum()))
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "level": pa.array(levels, pa.int64()),
                "n_cells": pa.array(cells, pa.int64()),
                "total": pa.array(totals, pa.int64()),
                "checksum": pa.array(cks, pa.int64()),
            }
        )

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        synth, batch_format="pyarrow", batch_size=256
    )
    return ds.map_batches(pyramid, batch_format="pyarrow", batch_size=256)


SQL_IMAGE_PYRAMID = """
WITH px AS (
  SELECT d.doc_id, a.i, b.j,
         (29 * a.i + 37 * b.j + d.doc_id) % 256 AS v
  FROM documents d,
       UNNEST(generate_series(0, 31)) AS a(i),
       UNNEST(generate_series(0, 31)) AS b(j)
),
lv AS (
  SELECT p.doc_id, l.lvl,
         p.i // CAST(POWER(2, l.lvl) AS BIGINT) AS ci,
         p.j // CAST(POWER(2, l.lvl) AS BIGINT) AS cj,
         p.v,
         CAST(32 / POWER(2, l.lvl) AS BIGINT) AS n
  FROM px p, UNNEST(generate_series(1, 3)) AS l(lvl)
),
cellsums AS (
  SELECT doc_id, lvl, n, ci, cj, SUM(v) AS s
  FROM lv GROUP BY doc_id, lvl, n, ci, cj
)
SELECT doc_id, CAST(lvl AS BIGINT) AS level,
       CAST(n * n AS BIGINT) AS n_cells,
       CAST(SUM(s) AS BIGINT) AS total,
       CAST(SUM((ci * n + cj + 1) * s) AS BIGINT) AS checksum
FROM cellsums GROUP BY doc_id, lvl, n
"""


def q_image_dhash_dedup(sf_dir: str):
    """Perceptual image near-dup via difference-hash, ORACLE-CHECKED end
    to end: every third doc shares a base 32×36 grayscale pattern
    (d0 = doc_id - doc_id % 3) but each doc's PGM payload is perturbed by
    a doc-specific ±1 pixel dither — the three payloads are byte-distinct,
    so an exact byte/content hash keeps all three, yet the dither adds a
    constant 4 to every 4×4 block sum, so the dHash comparisons (is this
    block brighter than its right neighbor?) are untouched and the three
    collapse to ONE perceptual cluster. The pipeline is the image sibling
    of content near-dup: real PGM encode → ``ImageDHashActor`` decode +
    64-bit dHash (two int64 halves) → map-side (hash → min/count)
    partials → one aggregate exchange. Hamming-tolerant variants compose
    with the existing ``hamming1_join`` over (dhash_hi, dhash_lo). Scale
    shape: map-only hash, partials before the shuffle, group domain
    bounded by distinct base patterns (≤ corpus/3)."""
    from ray.data.aggregate import Min, Sum

    from goose_parser_ray.functions.netpbm import encode_pgm
    from goose_parser_ray.functions.multimodal import ImageDHashActor

    H, W = 32, 36  # 8×9 grid of 4×4 blocks

    def synth(t: pa.Table) -> pa.Table:
        i = np.arange(H, dtype=np.int64)[:, None]
        j = np.arange(W, dtype=np.int64)[None, :]
        bi = i // 4
        bj = j // 4
        payloads = []
        for d in t["doc_id"].to_pylist():
            d0 = d - d % 3
            base = (31 * bi + 17 * bj + d0) % 199
            # dither: exactly 4 hits per 4x4 block for EVERY d (residues
            # of 2i+3j mod 4 are uniform within a block), so block sums
            # shift by a constant and no dHash comparison can flip
            dither = ((2 * i + 3 * j + d) % 4 == 0).astype(np.int64)
            payloads.append(encode_pgm((base + dither).astype(np.uint8)))
        return pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        synth, batch_format="pyarrow"
    )
    hashes = ds.map_batches(
        # task pool, not actor pool: the actor's setup is an import
        # bind — actor spin-up costs more than it saves (measured
        # on media_png: stage wall 3.0s -> 1.4s at sf0.1/32 CPUs)
        lambda t: ImageDHashActor()(t),
        batch_format="pyarrow",
        batch_size=128,
    )

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = df.groupby(["dhash_hi", "dhash_lo"], as_index=False).agg(
            first_doc=("doc_id", "min"), n_docs=("doc_id", "size")
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = hashes.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(["dhash_hi", "dhash_lo"]).aggregate(
        Min("first_doc", alias_name="first_doc"),
        Sum("n_docs", alias_name="n_docs"),
    )


SQL_IMAGE_DHASH_DEDUP = """
WITH g AS (
  SELECT doc_id, bi.bi, bj.bj,
         CASE WHEN (31 * bi.bi + 17 * bj.bj + doc_id - doc_id % 3) % 199
                 > (31 * bi.bi + 17 * (bj.bj + 1) + doc_id - doc_id % 3) % 199
              THEN 1 ELSE 0 END AS bit
  FROM documents,
       UNNEST(generate_series(0, 7)) AS bi(bi),
       UNNEST(generate_series(0, 7)) AS bj(bj)
),
h AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN bi < 4
                       THEN bit * (CAST(1 AS BIGINT) << (8 * bi + bj))
                       ELSE 0 END) AS BIGINT) AS dhash_lo,
         CAST(SUM(CASE WHEN bi >= 4
                       THEN bit * (CAST(1 AS BIGINT) << (8 * (bi - 4) + bj))
                       ELSE 0 END) AS BIGINT) AS dhash_hi
  FROM g GROUP BY doc_id
)
SELECT dhash_hi, dhash_lo,
       MIN(doc_id) AS first_doc,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM h GROUP BY dhash_hi, dhash_lo
"""


def q_image_neardup(sf_dir: str):
    """Hamming-TOLERANT perceptual image pairing, ORACLE-CHECKED — the
    composition q_image_dhash_dedup points at: consecutive doc pairs
    (2k, 2k+1) share a base block pattern but the odd doc's top-left
    block is nudged past its right neighbor, flipping EXACTLY ONE of the
    64 dHash comparisons, so exact-hash grouping misses every planted
    pair and only a distance-1 match finds them. Pipeline: real PGM
    encode → ``ImageDHashActor`` decode+hash → 64-char bitstring →
    ``hamming1_pairs`` (split-block blocking: Hamming ≤ 1 strings agree
    exactly on one half — zero misses, no all-pairs scan). The twin
    recomputes every bit closed-form and self-joins on
    bit_count(xor) ≤ 1, so it also certifies the ORGANIC distance-0
    collisions (base patterns repeat every 97 groups). Scale shape:
    map-only hash, the pair search inherits hamming1_pairs' bounded
    blocked-compare slabs."""
    from goose_parser_ray.functions.dedup import hamming1_pairs
    from goose_parser_ray.functions.netpbm import encode_pgm
    from goose_parser_ray.functions.multimodal import ImageDHashActor

    H, W = 32, 36

    def synth(t: pa.Table) -> pa.Table:
        bi = np.arange(8, dtype=np.int64)[:, None]
        bj = np.arange(9, dtype=np.int64)[None, :]
        payloads = []
        for d in t["doc_id"].to_pylist():
            k = d // 2
            grid = (23 * bi + 41 * bj + k) % 97 + 50
            if d % 2 == 1:
                right = grid[0, 1]
                grid = grid.copy()
                grid[0, 0] = right - 1 if grid[0, 0] > right else right + 1
            img = np.repeat(np.repeat(grid, 4, axis=0), 4, axis=1)
            payloads.append(encode_pgm(img.astype(np.uint8)))
        return pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    hashes = (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(synth, batch_format="pyarrow")
        .map_batches(
            lambda t: ImageDHashActor()(t),
            batch_format="pyarrow",
            batch_size=128,
        )
    )

    def bitstring(t: pa.Table) -> pa.Table:
        hi = t["dhash_hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = t["dhash_lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        shifts = np.arange(32, dtype=np.int64)
        bits = np.ascontiguousarray(
            np.concatenate(
                [(hi[:, None] >> shifts) & 1, (lo[:, None] >> shifts) & 1],
                axis=1,
            ).astype(np.uint8)
            + ord("0")
        )
        s = [b.decode() for b in bits.view("S64").ravel()]
        return pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "bits": pa.array(s, pa.string())}
        )

    keyed = hashes.map_batches(bitstring, batch_format="pyarrow")
    return hamming1_pairs(keyed, col="bits", id_col="doc_id")


SQL_IMAGE_NEARDUP = """
WITH cells AS (
  SELECT d.doc_id, bi.bi, bj.bj,
         CASE WHEN d.doc_id % 2 = 1 AND bi.bi = 0 AND bj.bj = 0 THEN
           CASE WHEN (d.doc_id // 2) % 97 + 50
                   > (41 + d.doc_id // 2) % 97 + 50
                THEN (41 + d.doc_id // 2) % 97 + 49
                ELSE (41 + d.doc_id // 2) % 97 + 51 END
         ELSE (23 * bi.bi + 41 * bj.bj + d.doc_id // 2) % 97 + 50
         END AS v
  FROM documents d,
       UNNEST(generate_series(0, 7)) AS bi(bi),
       UNNEST(generate_series(0, 8)) AS bj(bj)
),
bits AS (
  SELECT c1.doc_id, c1.bi, c1.bj,
         CASE WHEN c1.v > c2.v THEN 1 ELSE 0 END AS bit
  FROM cells c1
  JOIN cells c2 ON c1.doc_id = c2.doc_id AND c1.bi = c2.bi
               AND c2.bj = c1.bj + 1
  WHERE c1.bj < 8
),
h AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN bi < 4
                       THEN bit * (CAST(1 AS BIGINT) << (8 * bi + bj))
                       ELSE 0 END) AS BIGINT) AS lo,
         CAST(SUM(CASE WHEN bi >= 4
                       THEN bit * (CAST(1 AS BIGINT) << (8 * (bi - 4) + bj))
                       ELSE 0 END) AS BIGINT) AS hi
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b
FROM h a JOIN h b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 1
"""


def q_media_bmp(sf_dir: str):
    """REAL Windows-BMP pipeline (the bottom-up/BGR/row-padded sibling of
    q_media_ppm), ORACLE-CHECKED: deterministic RGB gradients — widths
    chosen NOT divisible by 4 so the row-padding path is always exercised
    — are encoded to actual 24-bit BI_RGB bytes, decoded back by the
    in-repo ``bmpmini`` codec in an actor pool, and summarized as exact
    integers including the top-left pixel (the orientation proof: a
    row-flip or BGR mix-up breaks the hash). Closed-form SQL twin states
    every pixel."""
    from goose_parser_ray.functions.bmpmini import encode_bmp
    from goose_parser_ray.functions.multimodal import BmpStatsActor

    def synth(t: pa.Table) -> pa.Table:
        payloads = []
        for d in t["doc_id"].to_pylist():
            w = 9 + (d % 6)
            h = 7 + (d % 5)
            i = np.arange(h, dtype=np.int64)[:, None, None]
            j = np.arange(w, dtype=np.int64)[None, :, None]
            c = np.arange(3, dtype=np.int64)[None, None, :]
            img = ((23 * i + 29 * j + 71 * c + d) % 256).astype(np.uint8)
            payloads.append(encode_bmp(img))
        return pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        synth, batch_format="pyarrow"
    )
    return ds.map_batches(
        # task pool, not actor pool: BmpStatsActor's setup is an import
        # bind — actor spin-up costs more than it saves (measured
        # on media_png: stage wall 3.0s -> 1.4s at sf0.1/32 CPUs)
        lambda t: BmpStatsActor()(t),
        batch_format="pyarrow",
        batch_size=64,  # wide binary payloads — small batches (guide)
    ).sort("doc_id")


SQL_MEDIA_BMP = """
WITH dims AS (
  SELECT doc_id, 9 + (doc_id % 6) AS width, 7 + (doc_id % 5) AS height
  FROM documents
),
pix AS (
  SELECT d.doc_id, d.width, d.height, c.c, i.i, j.j,
         (23 * i.i + 29 * j.j + 71 * c.c + d.doc_id) % 256 AS val
  FROM dims d,
       (SELECT unnest(generate_series(0, 11)) AS i) i,
       (SELECT unnest(generate_series(0, 14)) AS j) j,
       (SELECT unnest(generate_series(0, 2)) AS c) c
  WHERE i.i < d.height AND j.j < d.width
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(MAX(width) AS BIGINT) AS width,
       CAST(MAX(height) AS BIGINT) AS height,
       CAST(SUM(CASE WHEN c = 0 THEN val END) AS BIGINT) AS r_sum,
       CAST(SUM(CASE WHEN c = 1 THEN val END) AS BIGINT) AS g_sum,
       CAST(SUM(CASE WHEN c = 2 THEN val END) AS BIGINT) AS b_sum,
       CAST(MAX(CASE WHEN c = 0 AND i = 0 AND j = 0 THEN val END) AS BIGINT)
         AS r00,
       CAST(MAX(CASE WHEN c = 1 AND i = 0 AND j = 0 THEN val END) AS BIGINT)
         AS g00,
       CAST(MAX(CASE WHEN c = 2 AND i = 0 AND j = 0 THEN val END) AS BIGINT)
         AS b00
FROM pix GROUP BY doc_id ORDER BY doc_id
"""


def q_media_tiff(sf_dir: str):
    """REAL TIFF pipeline (baseline uncompressed, the IFD/strip sibling of
    q_media_bmp), ORACLE-CHECKED: deterministic RGB gradients are encoded
    to actual little-endian TIFF bytes with 4-row strips (heights chosen so
    every image spans ≥2 strips), decoded back by the in-repo ``tiffmini``
    codec in an actor pool — IFD walk, out-of-line value arrays, strip
    reassembly — and summarized as exact integers incl. the top-left pixel
    (orientation/channel-order proof) and ``n_strips`` (reassembly proof).
    Closed-form SQL twin states every pixel."""
    from goose_parser_ray.functions.multimodal import TiffStatsActor
    from goose_parser_ray.functions.tiffmini import encode_tiff

    def synth(t: pa.Table) -> pa.Table:
        payloads = []
        for d in t["doc_id"].to_pylist():
            w = 6 + (d % 7)
            h = 5 + (d % 6)
            i = np.arange(h, dtype=np.int64)[:, None, None]
            j = np.arange(w, dtype=np.int64)[None, :, None]
            c = np.arange(3, dtype=np.int64)[None, None, :]
            img = ((31 * i + 17 * j + 53 * c + d) % 256).astype(np.uint8)
            payloads.append(encode_tiff(img, rows_per_strip=4))
        return pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        synth, batch_format="pyarrow"
    )
    return ds.map_batches(
        # task pool, not actor pool: TiffStatsActor's setup is an import
        # bind — actor spin-up costs more than it saves (measured
        # on media_png: stage wall 3.0s -> 1.4s at sf0.1/32 CPUs)
        lambda t: TiffStatsActor()(t),
        batch_format="pyarrow",
        batch_size=64,  # wide binary payloads — small batches (guide)
    ).sort("doc_id")


SQL_MEDIA_TIFF = """
WITH dims AS (
  SELECT doc_id, 6 + (doc_id % 7) AS width, 5 + (doc_id % 6) AS height
  FROM documents
),
pix AS (
  SELECT d.doc_id, d.width, d.height, c.c, i.i, j.j,
         (31 * i.i + 17 * j.j + 53 * c.c + d.doc_id) % 256 AS val
  FROM dims d,
       (SELECT unnest(generate_series(0, 10)) AS i) i,
       (SELECT unnest(generate_series(0, 12)) AS j) j,
       (SELECT unnest(generate_series(0, 2)) AS c) c
  WHERE i.i < d.height AND j.j < d.width
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(MAX(width) AS BIGINT) AS width,
       CAST(MAX(height) AS BIGINT) AS height,
       CAST((MAX(height) + 3) // 4 AS BIGINT) AS n_strips,
       CAST(SUM(CASE WHEN c = 0 THEN val END) AS BIGINT) AS r_sum,
       CAST(SUM(CASE WHEN c = 1 THEN val END) AS BIGINT) AS g_sum,
       CAST(SUM(CASE WHEN c = 2 THEN val END) AS BIGINT) AS b_sum,
       CAST(MAX(CASE WHEN c = 0 AND i = 0 AND j = 0 THEN val END) AS BIGINT)
         AS r00,
       CAST(MAX(CASE WHEN c = 1 AND i = 0 AND j = 0 THEN val END) AS BIGINT)
         AS g00,
       CAST(MAX(CASE WHEN c = 2 AND i = 0 AND j = 0 THEN val END) AS BIGINT)
         AS b00
FROM pix
GROUP BY doc_id
ORDER BY doc_id
"""
