"""Diagnostics + maintenance + graph breadth: Wilson CTR, funnels, retention, Markov, outliers, compaction, schema evolution, skew profile, DQ audit, PPR, random walks, assortativity, association rules, seasonal profiles, pushdown scan, mutual information.

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
from goose_parser_ray.queries.versioning_graph2 import _SQL_CAPPED_BASKETS, _basket_pair_counts, _capped_baskets




def q_wilson_ctr(sf_dir: str):
    """Daily click-through rate with a Wilson-style lower confidence
    bound (z = 2): the ranking-safe CTR that small-sample days can't
    game. One day-domain aggregate (map-side combine), then the bound in
    e6 fixed point with the one float subexpression written op-for-op
    like the SQL (IEEE mirror discipline) so FLOOR(SQRT(...)) lands on
    the same integer on both engines."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        keep = pc.is_in(t["event_type"], value_set=pa.array(["click", "view"]))
        t = t.filter(keep)
        day = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False) // (
            86_400 * 1_000_000
        )
        k = (
            pc.equal(t["event_type"], "click")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        g = pd.DataFrame({"day": day, "k": k}).groupby("day", sort=False).agg(
            k=("k", "sum"), n=("k", "size")
        )
        return pa.Table.from_pydict(
            {
                "day": g.index.to_numpy(np.int64),
                "k": g["k"].to_numpy(np.int64),
                "n": g["n"].to_numpy(np.int64),
            }
        )

    grouped = pre_aggregated_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["day"],
        sums={"k": "k", "n": "n"},
    )

    def bound(t: pa.Table) -> pa.Table:
        import pandas as pd

        k = t["k"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        # mirror of the SQL expression, op for op
        inner = np.floor(
            np.sqrt((k * (n - k) / n + 1.0) * 1_000_000_000_000.0)
        ).astype(np.int64)
        ki = t["k"].to_numpy(zero_copy_only=False)
        ni = t["n"].to_numpy(zero_copy_only=False)
        lb = ((ki + 2) * 1_000_000 - 2 * inner) // (ni + 4)
        day_s = pd.to_datetime(
            t["day"].to_numpy(zero_copy_only=False) * 86_400, unit="s"
        ).strftime("%Y-%m-%d")
        return pa.Table.from_pydict(
            {
                "day": pa.array(day_s, pa.string()),
                "k": t["k"],
                "n": t["n"],
                "wilson_lb_e6": pa.array(lb, pa.int64()),
            }
        )

    return grouped.map_batches(bound, batch_format="pyarrow")


SQL_WILSON_CTR = """
WITH d AS (
  SELECT CAST(ts AS DATE) AS day,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS k
  FROM events WHERE event_type IN ('click', 'view')
), g AS (
  SELECT day, CAST(SUM(k) AS BIGINT) AS k, CAST(COUNT(*) AS BIGINT) AS n
  FROM d GROUP BY day
)
SELECT strftime(day, '%Y-%m-%d') AS day, k, n,
       CAST(((k + 2) * 1000000
             - 2 * CAST(FLOOR(SQRT(
                 (CAST(k AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))
                  / CAST(n AS DOUBLE) + 1.0) * 1000000000000.0
               )) AS BIGINT))
            // (n + 4) AS BIGINT) AS wilson_lb_e6
FROM g
"""


def q_funnel_steps(sf_dir: str):
    """Three-step conversion funnel with a 72-hour step window: per user,
    the first ``signup``, then the first ``click`` within 72 h of it, then
    the first ``purchase`` within 72 h of that click; the user's furthest
    stage (1/2/3) is emitted. One user-bucketed fold (payload = the
    user's own events) — the per-user step minima are three vectorized
    masked ``transform('min')`` passes, no joins, no per-row Python.
    Timestamps stay exact through the float64 transforms (µs since epoch
    ≈ 1.8e15 ≪ 2^53)."""
    import pandas as pd

    from goose_parser_ray.functions.dedup import num_shuffle_buckets

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    nb = num_shuffle_buckets(ds.count())
    win_us = 72 * 3600 * 1_000_000

    def add_bucket(t: pa.Table) -> pa.Table:
        t = pa.Table.from_arrays(
            [t["user_id"], pc.cast(t["ts"], pa.int64()), t["event_type"]],
            names=["user_id", "us", "event_type"],
        )
        return _dedup.add_hash_bucket(t, "user_id", nb, "__fb")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype=np.int64),
                    "stage": pd.Series([], dtype=np.int64),
                }
            )
        g = g.reset_index(drop=True)
        uid = g["user_id"]
        us = g["us"]
        et = g["event_type"]
        t1 = us.where(et.eq("signup")).groupby(uid).transform("min")
        t2 = (
            us.where(et.eq("click") & (us >= t1) & (us <= t1 + win_us))
            .groupby(uid)
            .transform("min")
        )
        t3 = (
            us.where(et.eq("purchase") & (us >= t2) & (us <= t2 + win_us))
            .groupby(uid)
            .transform("min")
        )
        per = (
            pd.DataFrame({"user_id": uid, "t1": t1, "t2": t2, "t3": t3})
            .groupby("user_id", as_index=False)
            .min()
        )
        per = per[per["t1"].notna()]
        stage = np.where(
            per["t3"].notna(), 3, np.where(per["t2"].notna(), 2, 1)
        )
        return pd.DataFrame(
            {
                "user_id": per["user_id"].to_numpy(np.int64),
                "stage": stage.astype(np.int64),
            }
        )

    ds = ds.map_batches(add_bucket, batch_format="pyarrow")
    return ds.groupby("__fb").map_groups(fold, batch_format="pandas")


SQL_FUNNEL_STEPS = """
WITH u1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), u2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN u1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts >= u1.t1
    AND e.ts <= u1.t1 + INTERVAL 72 HOUR
  GROUP BY e.user_id
), u3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN u2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= u2.t2
    AND e.ts <= u2.t2 + INTERVAL 72 HOUR
  GROUP BY e.user_id
)
SELECT u1.user_id,
       CAST(CASE WHEN u3.user_id IS NOT NULL THEN 3
                 WHEN u2.user_id IS NOT NULL THEN 2 ELSE 1 END AS BIGINT)
         AS stage
FROM u1
LEFT JOIN u2 ON u1.user_id = u2.user_id
LEFT JOIN u3 ON u1.user_id = u3.user_id
"""


def q_retention(sf_dir: str):
    """Cohort retention matrix: cohort = a user's first active day,
    offset = whole weeks since that day; cell = distinct users from the
    cohort active in that week. One user-bucketed fold computes the
    cohort day and the per-user distinct (cohort, week) pairs locally
    (users are disjoint across buckets, so bucket-local distinct counts
    sum exactly); the cross-bucket exchange carries only
    (cohort_day, offset_week, count) — calendar-domain bounded at any
    corpus size."""
    import pandas as pd

    from goose_parser_ray.functions.dedup import num_shuffle_buckets

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    nb = num_shuffle_buckets(ds.count())

    def add_bucket(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t["ts"], pa.int64()), 86_400 * 1_000_000)
        t = pa.Table.from_arrays([t["user_id"], day], names=["user_id", "day"])
        return _dedup.add_hash_bucket(t, "user_id", nb, "__rb")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "cohort_day": pd.Series([], dtype=np.int64),
                    "offset_week": pd.Series([], dtype=np.int64),
                    "users": pd.Series([], dtype=np.int64),
                }
            )
        g = g.reset_index(drop=True)
        d0 = g.groupby("user_id")["day"].transform("min")
        p = pd.DataFrame(
            {
                "cohort_day": d0.to_numpy(np.int64),
                "offset_week": ((g["day"] - d0) // 7).to_numpy(np.int64),
                "user_id": g["user_id"],
            }
        ).drop_duplicates()
        agg = (
            p.groupby(["cohort_day", "offset_week"], as_index=False, sort=False)
            .size()
            .rename(columns={"size": "users"})
        )
        agg["users"] = agg["users"].astype(np.int64)
        return agg

    ds = ds.map_batches(add_bucket, batch_format="pyarrow")
    partial = ds.groupby("__rb").map_groups(fold, batch_format="pandas")
    return pre_aggregated_sum(
        partial, keys=["cohort_day", "offset_week"], sums={"users": "users"}
    )


SQL_RETENTION = """
WITH d AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events
), f AS (
  SELECT user_id, MIN(day) AS d0 FROM d GROUP BY user_id
), p AS (
  SELECT DISTINCT d.user_id, f.d0, (d.day - f.d0) // 7 AS ow
  FROM d JOIN f USING (user_id)
)
SELECT CAST(d0 AS BIGINT) AS cohort_day, CAST(ow AS BIGINT) AS offset_week,
       CAST(COUNT(*) AS BIGINT) AS users
FROM p GROUP BY d0, ow
"""


def q_markov_transitions(sf_dir: str):
    """First-order Markov transition counts over each user's event-type
    sequence (consecutive pairs ordered by ts with event_id as the
    deterministic tie-break — the same total order the SQL LEAD twin
    uses). User-bucketed fold: one mergesort + grouped shift(-1) per
    bucket, bucket-local pair counts, then a type-domain-bounded
    (|types|² rows) cross-bucket sum."""
    import pandas as pd

    from goose_parser_ray.functions.dedup import num_shuffle_buckets

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    nb = num_shuffle_buckets(ds.count())

    def add_bucket(t: pa.Table) -> pa.Table:
        return _dedup.add_hash_bucket(t, "user_id", nb, "__mb")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "src_type": pd.Series([], dtype=object),
                    "dst_type": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        g = g.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        ).reset_index(drop=True)
        nxt = g.groupby("user_id")["event_type"].shift(-1)
        keep = nxt.notna()
        agg = (
            pd.DataFrame(
                {"src_type": g["event_type"][keep], "dst_type": nxt[keep]}
            )
            .groupby(["src_type", "dst_type"], as_index=False, sort=False)
            .size()
            .rename(columns={"size": "n"})
        )
        agg["n"] = agg["n"].astype(np.int64)
        return agg

    ds = ds.map_batches(add_bucket, batch_format="pyarrow")
    partial = ds.groupby("__mb").map_groups(fold, batch_format="pandas")
    return pre_aggregated_sum(
        partial, keys=["src_type", "dst_type"], sums={"n": "n"}
    )


SQL_MARKOV = """
WITH l AS (
  SELECT user_id, event_type AS a,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS b
  FROM events
)
SELECT a AS src_type, b AS dst_type, CAST(COUNT(*) AS BIGINT) AS n
FROM l WHERE b IS NOT NULL GROUP BY a, b
"""


def q_mad_outliers(sf_dir: str):
    """Robust outlier counts per event type via median absolute
    deviation, EXACT in the cents domain: med = the rank-⌈n/2⌉ value,
    mad = the same rank statistic of |v − med|, outlier ⇔
    |v − med| > 3·mad (the 1.4826 normal-consistency constant is folded
    into the multiplier choice, keeping everything integer). The
    exchange carries one row per distinct (type, cents) — value-domain
    bounded, the same counting shape as ``gini`` — and the rank scans
    are driver-side numpy over that tiny table."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        v = _cents(t["value"]).to_numpy(zero_copy_only=False)
        g = (
            pd.DataFrame({"et": t["event_type"].to_pandas(), "v": v})
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
        v = g["v"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        n = int(c.sum())
        thresh = (n + 1) // 2
        med = int(v[np.searchsorted(np.cumsum(c), thresh)])
        av = np.abs(v - med)
        order = np.argsort(av, kind="stable")
        mad = int(av[order][np.searchsorted(np.cumsum(c[order]), thresh)])
        n_out = int(c[av > 3 * mad].sum())
        out.append((et, n, med, mad, n_out))
    return pa.Table.from_pydict(
        {
            "event_type": pa.array([o[0] for o in out], pa.string()),
            "n": pa.array([o[1] for o in out], pa.int64()),
            "med_c": pa.array([o[2] for o in out], pa.int64()),
            "mad_c": pa.array([o[3] for o in out], pa.int64()),
            "n_outliers": pa.array([o[4] for o in out], pa.int64()),
        }
    )


SQL_MAD_OUTLIERS = """
WITH d AS (
  SELECT event_type, CAST(ROUND(100 * value) AS BIGINT) AS v FROM events
), c AS (
  SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS c
  FROM d GROUP BY event_type, v
), t AS (
  SELECT event_type, CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY event_type
), r AS (
  SELECT c.event_type, c.v, c.c,
         SUM(c.c) OVER (PARTITION BY c.event_type ORDER BY c.v) AS cum
  FROM c
), med AS (
  SELECT r.event_type, CAST(MIN(r.v) AS BIGINT) AS med
  FROM r JOIN t USING (event_type)
  WHERE r.cum >= (t.n + 1) // 2 GROUP BY r.event_type
), a AS (
  SELECT c.event_type, ABS(c.v - med.med) AS av, CAST(SUM(c.c) AS BIGINT) AS c
  FROM c JOIN med USING (event_type) GROUP BY 1, 2
), ar AS (
  SELECT a.event_type, a.av, a.c,
         SUM(a.c) OVER (PARTITION BY a.event_type ORDER BY a.av) AS cum
  FROM a
), mad AS (
  SELECT ar.event_type, CAST(MIN(ar.av) AS BIGINT) AS mad
  FROM ar JOIN t USING (event_type)
  WHERE ar.cum >= (t.n + 1) // 2 GROUP BY ar.event_type
)
SELECT c.event_type, MAX(t.n) AS n, MAX(med.med) AS med_c,
       MAX(mad.mad) AS mad_c,
       CAST(COALESCE(SUM(CASE WHEN ABS(c.v - med.med) > 3 * mad.mad
                              THEN c.c END), 0) AS BIGINT) AS n_outliers
FROM c
JOIN med USING (event_type) JOIN mad USING (event_type)
JOIN t USING (event_type)
GROUP BY c.event_type
"""


def q_compaction(sf_dir: str):
    """Small-file compaction round trip, ORACLE-CHECKED for row
    preservation: the documents table is deliberately shattered into tiny
    part files (the layout a per-shard-committing resumable job leaves
    behind), then ``compact_shards`` coalesces them shuffle-free — Ray
    packs small fragments into blocks at the READER, the writer re-slices
    to the target file size — and the compacted directory is read back and
    returned in full. The hash compare proves compaction is lossless; the
    file-count drop itself is asserted in tests."""
    import hashlib
    import shutil

    from goose_parser_ray.sources.io import compact_shards

    base = "/tmp/compaction_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    small, packed = base + "/small", base + "/packed"
    shutil.rmtree(base, ignore_errors=True)
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    ds.write_parquet(small, max_rows_per_file=8)  # the pathological layout
    stats = compact_shards(small, packed, target_rows_per_file=512)
    if stats["files_out"] > max(1, stats["files_in"] // 4):
        raise AssertionError(f"compaction did not compact: {stats}")
    return ray.data.read_parquet(packed)


SQL_COMPACTION = """
SELECT doc_id, lang, n_chars FROM documents
"""


def q_schema_evolution(sf_dir: str):
    """Schema-evolution read, ORACLE-CHECKED: the corpus is written as two
    generations of shards — OLD (doc_id as int32, no ``n_chars``; the
    schema a year-old crawl run produced) and NEW (int64 + the added
    column) — then read back through ONE ``read_evolving`` call whose
    target schema pushes the unification into the pyarrow scanner:
    per-fragment int32→int64 widening and typed-null fill for the missing
    column, no per-batch fixup stage and no driver-side schema sniffing.
    The SQL twin states the expected merged relation closed-form."""
    import hashlib
    import shutil

    import pyarrow.parquet as pq

    from goose_parser_ray.sources.io import read_evolving

    base = "/tmp/schema_evo_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    shutil.rmtree(base, ignore_errors=True)

    def write_generation(t: pa.Table) -> pa.Table:
        old = t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 1), 1))
        new = t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 1), 0))
        tag = hashlib.md5(old["doc_id"].to_string().encode()).hexdigest()[:12]
        pq.write_table(
            pa.Table.from_arrays(
                [pc.cast(old["doc_id"], pa.int32()), old["lang"]],
                names=["doc_id", "lang"],
            ),
            f"{base}/old-{tag}.parquet",
        )
        pq.write_table(
            pa.Table.from_arrays(
                [new["doc_id"], new["lang"], new["n_chars"]],
                names=["doc_id", "lang", "n_chars"],
            ),
            f"{base}/new-{tag}.parquet",
        )
        return pa.Table.from_pydict({"n": [len(t)]})

    import os

    os.makedirs(base, exist_ok=True)
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    # consume the writer stage (side-effect map — one tiny count row per block)
    ds.map_batches(write_generation, batch_format="pyarrow").count()

    target = pa.schema(
        [("doc_id", pa.int64()), ("lang", pa.string()), ("n_chars", pa.int64())]
    )
    return read_evolving(base, target)


SQL_SCHEMA_EVOLUTION = """
SELECT doc_id, lang,
       CASE WHEN doc_id % 2 = 0 THEN n_chars END AS n_chars
FROM documents
"""


def q_pair_windows(sf_dir: str):
    """Windowed stream self-join: count ordered event-type pairs (a, b)
    where b follows a for the same user within 10 minutes (strictly after
    in the (ts, event_id) total order). The scale shape: user-bucketed
    fold — inside each bucket one lexicographic sort, per-segment
    ``searchsorted`` on an int64 composite key (segment × time-span;
    bounded because users-per-bucket is data-proportional — guarded
    loudly), and per-type prefix sums turn the quadratic pair count into
    O(rows × |types|). Cross-bucket exchange is the |types|² count
    matrix."""
    import pandas as pd

    from goose_parser_ray.functions.dedup import num_shuffle_buckets

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    nb = num_shuffle_buckets(ds.count())
    win_us = 600 * 1_000_000

    def add_bucket(t: pa.Table) -> pa.Table:
        return _dedup.add_hash_bucket(t, "user_id", nb, "__pb")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "type_a": pd.Series([], dtype=object),
                "type_b": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        ).reset_index(drop=True)
        us = g["ts"].astype("int64").to_numpy()
        seg = pd.factorize(g["user_id"], sort=False)[0].astype(np.int64)
        rel = us - us.min()
        span = int(rel.max()) + win_us + 1
        if seg.max() + 1 > (2**62) // span:
            raise AssertionError(
                "composite key overflow: users-per-bucket x time-span too "
                "large — raise the bucket count"
            )
        key = seg * span + rel
        # rng[a] = first index past a's 10-minute window within a's user
        # segment (key construction keeps windows from crossing segments)
        rng = np.searchsorted(key, key + win_us, side="right")
        types, tcodes = np.unique(g["event_type"].to_numpy(), return_inverse=True)
        out_a, out_b, out_n = [], [], []
        for tb in range(len(types)):
            cum = np.concatenate(([0], np.cumsum(tcodes == tb)))
            cnt = cum[rng] - cum[np.arange(len(g)) + 1]
            if cnt.any():
                s = (
                    pd.Series(cnt)
                    .groupby(pd.Series(tcodes))
                    .sum()
                )
                for ta, n in s[s > 0].items():
                    out_a.append(types[ta])
                    out_b.append(types[tb])
                    out_n.append(int(n))
        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "type_a": out_a,
                "type_b": out_b,
                "n": np.asarray(out_n, np.int64),
            }
        )

    ds = ds.map_batches(add_bucket, batch_format="pyarrow")
    partial = ds.groupby("__pb").map_groups(fold, batch_format="pandas")
    return pre_aggregated_sum(partial, keys=["type_a", "type_b"], sums={"n": "n"})


SQL_PAIR_WINDOWS = """
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND (b.ts > a.ts OR (b.ts = a.ts AND b.event_id > a.event_id))
 AND b.ts <= a.ts + INTERVAL 10 MINUTE
GROUP BY a.event_type, b.event_type
"""


def q_skew_profile(sf_dir: str):
    """Key-skew diagnostics — the profile you run BEFORE picking a join or
    groupby strategy at corpus scale: per-user event counts rolled into
    power-of-two buckets (bucket = ⌊log₂ count⌋ via exact integer frexp,
    no float log), with key count, event mass, and the largest key per
    bucket. Two bounded exchanges: per-(bucket, user) partials combine
    map-side, then the log-domain-bounded (≤ 64 rows) final fold."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["user_id"])
    per_user = pre_aggregated_sum(
        ds, keys=["user_id"], sums={}, count_alias="cnt"
    )

    def bucketize(t: pa.Table) -> pa.Table:
        cnt = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        _m, e = np.frexp(cnt.astype(np.float64))
        bucket = e.astype(np.int64) - 1  # exact: cnt in [2^b, 2^(b+1))
        return pa.Table.from_pydict(
            {
                "bucket_log2": bucket,
                "n_keys": np.ones(len(cnt), np.int64),
                "n_events": cnt,
                "max_count": cnt,
            }
        )

    from ray.data.aggregate import Max, Sum

    def partial_fold(t: pa.Table) -> pa.Table:
        # map-side combine per block: the final groupby's payload is then
        # ≤ 64 log-buckets × blocks, never the per-user table (most users
        # share a handful of low buckets — an unbounded map_groups payload
        # otherwise)
        df = t.to_pandas()
        out = df.groupby("bucket_log2", as_index=False).agg(
            n_keys=("n_keys", "sum"),
            n_events=("n_events", "sum"),
            max_count=("max_count", "max"),
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        per_user.map_batches(bucketize, batch_format="pyarrow")
        .map_batches(partial_fold, batch_format="pyarrow")
        .groupby("bucket_log2")
        .aggregate(
            Sum("n_keys", alias_name="n_keys"),
            Sum("n_events", alias_name="n_events"),
            Max("max_count", alias_name="max_count"),
        )
    )


SQL_SKEW_PROFILE = """
WITH c AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY user_id
)
SELECT CAST(FLOOR(LOG2(cnt)) AS BIGINT) AS bucket_log2,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(cnt) AS BIGINT) AS n_events,
       CAST(MAX(cnt) AS BIGINT) AS max_count
FROM c GROUP BY 1
"""


def q_dq_audit(sf_dir: str):
    """Data-quality audit — the expectation-check pass a production
    pipeline runs before promoting a batch: per-check violation counts in
    ONE streaming pass (null keys, non-positive amounts, out-of-range
    timestamps) plus an exact duplicate-key count via the id-bucketed
    distinct (ids disjoint across buckets ⇒ bucket-local distinct counts
    sum exactly — the q_retention argument). Output is the tidy
    (check, n) table dashboards ingest."""
    import pandas as pd

    from goose_parser_ray.functions.dedup import num_shuffle_buckets

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    nb = num_shuffle_buckets(ds.count())
    lo = 1_262_304_000_000_000  # 2010-01-01 in µs
    hi = 1_893_456_000_000_000  # 2030-01-01 in µs

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        checks = {
            "rows_total": t.num_rows,
            "null_user_id": t["user_id"].null_count,
            "nonpositive_value": int(
                pc.sum(
                    pc.cast(
                        pc.and_kleene(
                            pc.is_valid(t["value"]),
                            pc.less_equal(t["value"], 0.0),
                        ),
                        pa.int64(),
                    )
                ).as_py()
                or 0
            ),
            "ts_out_of_range": int(
                pc.sum(
                    pc.cast(
                        pc.or_kleene(pc.less(us, lo), pc.greater_equal(us, hi)),
                        pa.int64(),
                    )
                ).as_py()
                or 0
            ),
        }
        return pa.Table.from_pydict(
            {
                "check_name": pa.array(list(checks), pa.string()),
                "n": pa.array([int(v) for v in checks.values()], pa.int64()),
            }
        )

    flat = pre_aggregated_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["check_name"],
        sums={"n": "n"},
    )

    # duplicate ids: total − distinct, distinct summed over disjoint buckets
    def bucket_ids(t: pa.Table) -> pa.Table:
        t = pa.Table.from_arrays([t["event_id"]], names=["event_id"])
        return _dedup.add_hash_bucket(t, "event_id", nb, "__db")

    def distinct_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"d": [np.int64(g["event_id"].nunique())]})

    per_bucket = (
        ds.map_batches(bucket_ids, batch_format="pyarrow")
        .groupby("__db")
        .map_groups(distinct_in_bucket, batch_format="pandas")
    )
    totals = {r["check_name"]: r["n"] for r in flat.take_all()}
    # distributed scalar sum: the per-bucket table grows with the corpus
    # (rows/50k buckets) — never collect it driver-side
    n_distinct = int(per_bucket.sum("d") or 0)
    rows = sorted(totals.items()) + [
        ("dup_event_id", totals["rows_total"] - n_distinct)
    ]
    return pa.Table.from_pydict(
        {
            "check_name": pa.array([r[0] for r in rows], pa.string()),
            "n": pa.array([int(r[1]) for r in rows], pa.int64()),
        }
    )


SQL_DQ_AUDIT = """
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS us, value FROM events
), checks AS (
  SELECT 'rows_total' AS check_name, COUNT(*) AS n FROM e
  UNION ALL
  SELECT 'null_user_id', COUNT(*) FILTER (WHERE user_id IS NULL) FROM e
  UNION ALL
  SELECT 'nonpositive_value',
         COUNT(*) FILTER (WHERE value IS NOT NULL AND value <= 0) FROM e
  UNION ALL
  SELECT 'ts_out_of_range',
         COUNT(*) FILTER (WHERE us < 1262304000000000
                             OR us >= 1893456000000000) FROM e
  UNION ALL
  SELECT 'dup_event_id',
         COUNT(*) - COUNT(DISTINCT event_id) FROM e
)
SELECT check_name, CAST(n AS BIGINT) AS n FROM checks ORDER BY check_name
"""


def q_rate_spikes(sf_dir: str):
    """Calendar-windowed rate-spike screen: per (event_type, day) counts
    against the trailing 7 CALENDAR days (absent days count 0 — a RANGE
    frame, not a ROWS frame), spike ⇔ 7·n > 2·trail_sum with the trailing
    window nonempty. All-integer decision, so exact cross-engine. The
    exchange is day-domain bounded (types × days) — per-type day series
    fold driver-free via map_groups, windows via two searchsorted scans."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def to_day(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t["ts"], pa.int64()), 86_400 * 1_000_000)
        return pa.Table.from_pydict({"event_type": t["event_type"], "day": day})

    counts = pre_aggregated_sum(
        ds.map_batches(to_day, batch_format="pyarrow"),
        keys=["event_type", "day"],
        sums={},
        count_alias="n",
    )

    def windows(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("day", kind="mergesort").reset_index(drop=True)
        days = g["day"].to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        cum = np.concatenate(([0], np.cumsum(n)))
        lo = np.searchsorted(days, days - 7, side="left")
        hi = np.searchsorted(days, days - 1, side="right")
        trail = cum[hi] - cum[lo]
        spike = (hi > lo) & (7 * n > 2 * trail)
        return pd.DataFrame(
            {
                "event_type": g["event_type"],
                "day": days,
                "n": n,
                "trail_sum": trail.astype(np.int64),
                "is_spike": spike.astype(np.int64),
            }
        )

    return counts.groupby("event_type").map_groups(
        windows, batch_format="pandas"
    )


SQL_RATE_SPIKES = """
WITH c AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, CAST(day AS BIGINT) AS day, n,
       CAST(COALESCE(SUM(n) OVER w, 0) AS BIGINT) AS trail_sum,
       CAST(CASE WHEN COUNT(n) OVER w > 0
                  AND 7 * n > 2 * COALESCE(SUM(n) OVER w, 0)
                 THEN 1 ELSE 0 END AS BIGINT) AS is_spike
FROM c
WINDOW w AS (PARTITION BY event_type ORDER BY day
             RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)
"""


def q_reject_reasons(sf_dir: str):
    """Filter-cascade audit — the "why did my corpus shrink" report every
    curation run needs: each doc gets the FIRST matching rejection reason
    (too_short → too_long → bad_lang → kept, the cascade order a real
    filter applies), rolled up to (reason, n_docs, first_doc). Map-side
    partial combine; the exchange is reason-domain bounded (4 rows)."""
    from ray.data.aggregate import Min, Sum

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def classify(t: pa.Table) -> pa.Table:
        n = t["n_chars"]
        reason = pc.if_else(
            pc.less(n, 100),
            pa.scalar("too_short"),
            pc.if_else(
                pc.greater(n, 400),
                pa.scalar("too_long"),
                pc.if_else(
                    pc.is_in(
                        t["lang"],
                        value_set=pa.array(["en", "de", "fr"]),
                    ),
                    pa.scalar("kept"),
                    pa.scalar("bad_lang"),
                ),
            ),
        )
        return pa.Table.from_pydict(
            {
                "reason": reason,
                "n_docs": pa.array(np.ones(t.num_rows, np.int64)),
                "first_doc": t["doc_id"],
            }
        )

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        out = df.groupby("reason", as_index=False).agg(
            n_docs=("n_docs", "sum"), first_doc=("first_doc", "min")
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        ds.map_batches(classify, batch_format="pyarrow")
        .map_batches(partial, batch_format="pyarrow")
        .groupby("reason")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Min("first_doc", alias_name="first_doc"),
        )
    )


SQL_REJECT_REASONS = """
WITH r AS (
  SELECT doc_id,
         CASE WHEN n_chars < 100 THEN 'too_short'
              WHEN n_chars > 400 THEN 'too_long'
              WHEN lang IN ('en', 'de', 'fr') THEN 'kept'
              ELSE 'bad_lang' END AS reason
  FROM documents
)
SELECT reason, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM r GROUP BY reason
"""


def q_dup_cluster_sizes(sf_dir: str):
    """Duplicate-cluster profile: histogram of exact-text cluster sizes
    (how much of the corpus is 1×, 2×, k×-replicated — the number that
    decides whether dedup is worth a full pass). Content-hash bucketed
    fold (identical texts share a bucket ⇒ bucket-local cluster sizes are
    exact), then a size-domain-bounded (≤ max multiplicity) sum — the
    corpus text never shuffles twice."""
    import pandas as pd

    from goose_parser_ray.functions.dedup import num_shuffle_buckets

    ds = _read(sf_dir, "documents", ["text"])
    nb = num_shuffle_buckets(ds.count())

    def bucket(t: pa.Table) -> pa.Table:
        return _dedup.add_hash_bucket(t, "text", nb, "__hb")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby("text", dropna=False).size()
        hist = sizes.value_counts()
        return pd.DataFrame(
            {
                "cluster_size": hist.index.to_numpy(np.int64),
                "n_clusters": hist.to_numpy(np.int64),
            }
        )

    partial = ds.map_batches(bucket, batch_format="pyarrow").groupby(
        "__hb"
    ).map_groups(fold, batch_format="pandas")
    return pre_aggregated_sum(
        partial, keys=["cluster_size"], sums={"n_clusters": "n_clusters"}
    )


SQL_DUP_CLUSTER_SIZES = """
WITH c AS (
  SELECT text, CAST(COUNT(*) AS BIGINT) AS cluster_size
  FROM documents GROUP BY text
)
SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
FROM c GROUP BY cluster_size
"""


def q_arrow_roundtrip(sf_dir: str):
    """Arrow IPC (Feather v2) export → parallel ingest, ORACLE-CHECKED
    row-for-row against the source table: real shard FILES on disk (one
    per block, map-side — the same pattern as the WARC/CSV/JSONL
    roundtrips), read back through ``sources.io.read_documents``'s IPC
    branch (one read task per file; Feather-or-stream fallback). Floats
    survive IPC bit-exactly (binary columnar format — no text rounding),
    so value as exact cents on both sides compares trivially."""
    import hashlib
    import os
    import shutil

    import pyarrow.feather as feather

    from goose_parser_ray.sources.io import read_documents

    base = "/tmp/arrow_rt_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    src = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def write_shard(t: pa.Table) -> pa.Table:
        tag = hashlib.md5(t["doc_id"].to_string().encode()).hexdigest()[:12]
        feather.write_feather(t, f"{base}/shard-{tag}.feather")
        return pa.Table.from_pydict({"n": [t.num_rows]})

    src.map_batches(write_shard, batch_format="pyarrow").count()
    return read_documents(base + "/", fmt="arrow")


SQL_ARROW_ROUNDTRIP = """
SELECT doc_id, lang, n_chars FROM documents
"""


def q_ngram_jaccard(sf_dir: str):
    """EXACT 3-gram (word-shingle) Jaccard near-dup join — the
    n-gram-level sibling of q_set_similarity's unigram sets: shingles are
    far more discriminative than token sets on template-generated text, so
    the same PPJoin machinery runs at a lower τ without pair explosion.
    Shingle construction is fully Arrow/numpy-vectorized (flat word array
    + parent offsets → element-wise 3-way binary_join → per-doc list
    rebuild; no per-row Python), emitting a shingle-token column the
    prefix-filter join consumes unchanged."""
    from goose_parser_ray.functions.dedup import set_similarity_join

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def shingle3(t: pa.Table) -> pa.Table:
        words = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(t["text"], "")), pattern=r"\s+"
        )
        flat = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        f = pc.list_flatten(flat)
        parent = pc.list_parent_indices(flat).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(f, "").to_numpy(zero_copy_only=False)
        toks = f.filter(pa.array(keep))
        parent = parent[keep]
        n = len(parent)
        if n >= 3:
            ok = parent[:-2] == parent[2:]
            a = toks.slice(0, n - 2).filter(pa.array(ok))
            b = toks.slice(1, n - 2).filter(pa.array(ok))
            c = toks.slice(2, n - 2).filter(pa.array(ok))
            sh = pc.binary_join_element_wise(a, b, c, "\x1f")
            sh_parent = parent[:-2][ok]
        else:
            sh = pa.array([], pa.string())
            sh_parent = np.array([], np.int64)
        counts = np.bincount(sh_parent, minlength=t.num_rows) if len(
            sh_parent
        ) else np.zeros(t.num_rows, np.int64)
        offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
        lst = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), sh)
        joined = pc.binary_join(lst, " ")
        return pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "shingles": joined}
        )

    sh_ds = ds.map_batches(shingle3, batch_format="pyarrow")
    return set_similarity_join(
        sh_ds, col="shingles", threshold_num=6, threshold_den=10
    )


SQL_NGRAM_JACCARD = r"""
WITH arrs AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS arr
  FROM documents
), tok0 AS (
  SELECT doc_id, arr[g.i] AS tok, g.i AS pos
  FROM arrs, UNNEST(generate_series(1, len(arr))) AS g(i)
), tok AS (
  SELECT doc_id, tok,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS ord
  FROM tok0 WHERE tok <> ''
), sh0 AS (
  SELECT doc_id,
         tok || chr(31) || LEAD(tok, 1) OVER w
             || chr(31) || LEAD(tok, 2) OVER w AS s
  FROM tok
  WINDOW w AS (PARTITION BY doc_id ORDER BY ord)
  QUALIFY LEAD(tok, 2) OVER w IS NOT NULL
), sh AS (
  SELECT DISTINCT doc_id, s FROM sh0
), sz AS (
  SELECT doc_id, COUNT(*) AS l FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       CAST(10000 * i // (sa.l + sb.l - i) AS BIGINT) AS jac_e4
FROM inter
JOIN sz sa ON sa.doc_id = id_a
JOIN sz sb ON sb.doc_id = id_b
WHERE 10 * i >= 6 * (sa.l + sb.l - i)
"""


def q_winsorize(sf_dir: str):
    """Per-group winsorized mean (clip at the p05/p95 rank statistics
    before averaging — the robust-preprocessing step that tames heavy
    tails without dropping rows), EXACT in the cents domain: the p05/p95
    cut points are rank-⌈q·n⌉ values from cumulative counts (same
    discipline as grouped_quantiles), the clipped sum is Σ count·clip(v)
    over the distinct-value table, and the means are integer floor-divides.
    Exchange = one row per distinct (type, cents) — value-domain bounded."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        v = _cents(t["value"]).to_numpy(zero_copy_only=False)
        g = (
            pd.DataFrame({"et": t["event_type"].to_pandas(), "v": v})
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

    counts = pre_aggregated_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["event_type", "v"],
        sums={"c": "c"},
    )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("v", kind="mergesort")
        v = g["v"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        cum = np.cumsum(c)
        n = int(cum[-1])
        lo = int(v[np.searchsorted(cum, int(np.ceil(0.05 * n)))])
        hi = int(v[np.searchsorted(cum, int(np.ceil(0.95 * n)))])
        mean_c = int(np.dot(c, v)) // n
        wins_mean_c = int(np.dot(c, np.clip(v, lo, hi))) // n
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n": [np.int64(n)],
                "p05_c": [np.int64(lo)],
                "p95_c": [np.int64(hi)],
                "mean_c": [np.int64(mean_c)],
                "wins_mean_c": [np.int64(wins_mean_c)],
            }
        )

    return counts.groupby("event_type").map_groups(pick, batch_format="pandas")


SQL_WINSORIZE = """
WITH d AS (
  SELECT event_type, CAST(ROUND(100 * value) AS BIGINT) AS v FROM events
), cut AS (
  SELECT event_type,
         CAST(quantile_disc(v, 0.05) AS BIGINT) AS lo,
         CAST(quantile_disc(v, 0.95) AS BIGINT) AS hi,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v) AS BIGINT) AS sv
  FROM d GROUP BY event_type
)
SELECT d.event_type, MAX(cut.n) AS n,
       MAX(cut.lo) AS p05_c, MAX(cut.hi) AS p95_c,
       CAST(MAX(cut.sv) // MAX(cut.n) AS BIGINT) AS mean_c,
       CAST(SUM(LEAST(GREATEST(d.v, cut.lo), cut.hi)) // MAX(cut.n)
            AS BIGINT) AS wins_mean_c
FROM d JOIN cut USING (event_type)
GROUP BY d.event_type
"""


def q_grouping_sets(sf_dir: str):
    """GROUPING SETS ((lang, source), (lang), ()) with an explicit
    GROUPING-id column — completes the OLAP trio next to q_cube_agg and
    q_rollup_lineitem, same scale shape: ONE distributed partial pass to
    the finest cells, every requested set re-aggregated from that
    (langs × sources)-bounded table; the corpus is read once."""
    import pandas as pd

    ds = _read(sf_dir, "documents", ["lang", "source", "n_chars"])
    base = pre_aggregated_sum(
        ds, keys=["lang", "source"], sums={"n_chars": "sum_chars"},
        count_alias="n_docs",
    ).to_pandas()

    levels = []
    for keys, gid in ((["lang", "source"], 0), (["lang"], 1), ([], 3)):
        lvl = (
            base.groupby(keys, as_index=False)[["sum_chars", "n_docs"]].sum()
            if keys
            else base[["sum_chars", "n_docs"]].sum().to_frame().T
        )
        for filled in ("lang", "source"):
            if filled not in keys:
                lvl[filled] = "ALL"
        lvl["grouping_id"] = gid
        levels.append(
            lvl[["lang", "source", "grouping_id", "sum_chars", "n_docs"]]
        )
    out = pd.concat(levels, ignore_index=True)
    for c in ("grouping_id", "sum_chars", "n_docs"):
        out[c] = out[c].astype("int64")
    return out


SQL_GROUPING_SETS = """
SELECT COALESCE(lang, 'ALL') AS lang,
       COALESCE(source, 'ALL') AS source,
       CAST(GROUPING(lang, source) AS BIGINT) AS grouping_id,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents
GROUP BY GROUPING SETS ((lang, source), (lang), ())
"""


def q_ppr(sf_dir: str):
    """PERSONALIZED PageRank (teleport restricted to a seed set — the
    recommendation/random-walk-with-restart variant): seeds are the
    suppliers with suppkey % 10 == 0; mass teleports back to them, so
    ranks measure proximity to the seed neighborhood rather than global
    centrality. Same tiered engine as q_pagerank (driver bincount under
    the pair guard, per-round join + broadcast-seed base map past it);
    fixed 3 rounds so the oracle unrolls identically."""
    from goose_parser_ray.functions.graph import pagerank_distributed

    ds = _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])

    # deterministic small seed set: suppkey % 10 == 0
    def pick_seeds(t: pa.Table) -> pa.Table:
        sk = pc.cast(t["l_suppkey"], pa.int64())
        keep = pc.equal(
            pc.subtract(
                sk,
                pc.multiply(
                    pc.divide(sk, pa.scalar(10, pa.int64())),
                    pa.scalar(10, pa.int64()),
                ),
            ),
            pa.scalar(0, pa.int64()),
        )
        return pa.Table.from_pydict({"node": sk.filter(keep)})

    seeds = ds.map_batches(pick_seeds, batch_format="pyarrow")
    ranks = pagerank_distributed(
        ds, src="l_suppkey", dst="l_partkey",
        damping=0.85, max_iters=3, tol=0.0,
        teleport_seeds=seeds,
    )
    return (
        ranks.map_batches(
            lambda t: pa.Table.from_pydict(
                {"node": t["node"], "rank_e6": _cents(t["rank"], 1_000_000)}
            ),
            batch_format="pyarrow",
        )
        .sort(["rank_e6", "node"], descending=[True, False])
        .limit(20)
    )


SQL_PPR = """
WITH edges AS (
  SELECT CAST(l_suppkey AS BIGINT) AS u, CAST(l_partkey AS BIGINT) AS v
  FROM lineitem
),
deg AS (SELECT u, COUNT(*) AS deg FROM edges GROUP BY u),
nodes AS (SELECT u AS node FROM edges UNION SELECT v FROM edges),
seeds AS (SELECT DISTINCT u AS node FROM edges WHERE u % 10 = 0),
ns AS (SELECT COUNT(*) AS n FROM seeds),
t AS (SELECT nodes.node,
             CASE WHEN seeds.node IS NOT NULL
                  THEN 1.0 / (SELECT n FROM ns) ELSE 0.0 END AS tv
      FROM nodes LEFT JOIN seeds ON nodes.node = seeds.node),
r0 AS (SELECT node, tv AS rank FROM t),
d1 AS (SELECT 1.0 - COALESCE(SUM(r.rank), 0) AS dm
       FROM r0 r JOIN deg ON deg.u = r.node),
c1 AS (SELECT e.v AS node, SUM(r.rank / deg.deg) AS c
       FROM edges e JOIN r0 r ON e.u = r.node JOIN deg ON deg.u = e.u
       GROUP BY e.v),
r1 AS (SELECT t.node,
              (0.15 + 0.85 * (SELECT dm FROM d1)) * t.tv
              + 0.85 * COALESCE(c1.c, 0) AS rank
       FROM t LEFT JOIN c1 ON t.node = c1.node),
d2 AS (SELECT 1.0 - COALESCE(SUM(r.rank), 0) AS dm
       FROM r1 r JOIN deg ON deg.u = r.node),
c2 AS (SELECT e.v AS node, SUM(r.rank / deg.deg) AS c
       FROM edges e JOIN r1 r ON e.u = r.node JOIN deg ON deg.u = e.u
       GROUP BY e.v),
r2 AS (SELECT t.node,
              (0.15 + 0.85 * (SELECT dm FROM d2)) * t.tv
              + 0.85 * COALESCE(c2.c, 0) AS rank
       FROM t LEFT JOIN c2 ON t.node = c2.node),
d3 AS (SELECT 1.0 - COALESCE(SUM(r.rank), 0) AS dm
       FROM r2 r JOIN deg ON deg.u = r.node),
c3 AS (SELECT e.v AS node, SUM(r.rank / deg.deg) AS c
       FROM edges e JOIN r2 r ON e.u = r.node JOIN deg ON deg.u = e.u
       GROUP BY e.v),
r3 AS (SELECT t.node,
              (0.15 + 0.85 * (SELECT dm FROM d3)) * t.tv
              + 0.85 * COALESCE(c3.c, 0) AS rank
       FROM t LEFT JOIN c3 ON t.node = c3.node)
SELECT node, CAST(ROUND(rank * 1000000) AS BIGINT) AS rank_e6
FROM r3 ORDER BY rank_e6 DESC, node LIMIT 20
"""


def q_random_walks(sf_dir: str):
    """Deterministic random-walk corpus sampling (the node2vec p=q=1
    walk generator that feeds graph-embedding training), ORACLE-CHECKED:
    3-step walks over the undirected part co-purchase graph from every
    seed (part % 50 == 0), neighbor choice = an integer hash rule both
    engines state verbatim (``functions/graph.py:random_walks``). The
    SQL twin unrolls the three hops as ranked-adjacency joins."""
    from goose_parser_ray.functions.graph import random_walks

    und = _copurchase_edges(sf_dir, mask=15).map_batches(
        lambda t: pa.Table.from_pydict(
            {
                "u": pa.concat_arrays(
                    [t["u"].combine_chunks(), t["v"].combine_chunks()]
                ),
                "v": pa.concat_arrays(
                    [t["v"].combine_chunks(), t["u"].combine_chunks()]
                ),
            }
        ),
        batch_format="pyarrow",
    )

    def pick_seeds(t: pa.Table) -> pa.Table:
        keep = pc.equal(
            pc.subtract(
                t["u"],
                pc.multiply(
                    pc.divide(t["u"], pa.scalar(50, pa.int64())),
                    pa.scalar(50, pa.int64()),
                ),
            ),
            pa.scalar(0, pa.int64()),
        )
        return pa.Table.from_pydict({"node": t["u"].filter(keep)})

    und = und.materialize()
    seeds = und.map_batches(pick_seeds, batch_format="pyarrow")
    return random_walks(und, seeds, steps=3)


SQL_RANDOM_WALKS = """
WITH li AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
  WHERE (l_orderkey & 15) = 0
),
e0 AS (SELECT a.p AS u, b.p AS v FROM li a JOIN li b
       ON a.o = b.o AND a.p < b.p),
edges AS (SELECT DISTINCT u, v FROM
          (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0)),
ranked AS (
  SELECT u, v,
         ROW_NUMBER() OVER (PARTITION BY u ORDER BY v) - 1 AS r,
         COUNT(*) OVER (PARTITION BY u) AS deg
  FROM edges
),
seeds AS (SELECT DISTINCT u AS node FROM edges WHERE u % 50 = 0),
w0 AS (SELECT ROW_NUMBER() OVER (ORDER BY node) - 1 AS walk_id, node
       FROM seeds),
s1 AS (SELECT w.walk_id, rk.v AS node FROM w0 w JOIN ranked rk
       ON rk.u = w.node
      AND rk.r = ((w.walk_id * 2654435761 + 1 * 40503 + w.node * 69069)
                  % 2147483647) % rk.deg),
s2 AS (SELECT w.walk_id, rk.v AS node FROM s1 w JOIN ranked rk
       ON rk.u = w.node
      AND rk.r = ((w.walk_id * 2654435761 + 2 * 40503 + w.node * 69069)
                  % 2147483647) % rk.deg),
s3 AS (SELECT w.walk_id, rk.v AS node FROM s2 w JOIN ranked rk
       ON rk.u = w.node
      AND rk.r = ((w.walk_id * 2654435761 + 3 * 40503 + w.node * 69069)
                  % 2147483647) % rk.deg)
SELECT walk_id, CAST(0 AS BIGINT) AS step, node FROM w0
UNION ALL SELECT walk_id, 1, node FROM s1
UNION ALL SELECT walk_id, 2, node FROM s2
UNION ALL SELECT walk_id, 3, node FROM s3
"""


def q_assortativity(sf_dir: str):
    """Degree assortativity of the part co-purchase graph (Newman's r —
    do hubs link to hubs?). Every moment is an EXACT int64 sum over the
    symmetric edge expansion (Σx, Σxy, Σx² with x = deg(u), y = deg(v)),
    emitted alongside r_e6 whose one sqrt is mirrored op-for-op by the
    twin (the wilson_ctr discipline). Scale shape: degree attach is one
    node-keyed join against the node-bounded degree table; moments
    map-side combine to ONE row."""
    und = _copurchase_edges(sf_dir, mask=15).map_batches(
        lambda t: pa.Table.from_pydict(
            {
                "u": pa.concat_arrays(
                    [t["u"].combine_chunks(), t["v"].combine_chunks()]
                ),
                "v": pa.concat_arrays(
                    [t["v"].combine_chunks(), t["u"].combine_chunks()]
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    deg = pre_aggregated_sum(
        und.map_batches(
            lambda t: pa.Table.from_pydict({"u": t["u"]}),
            batch_format="pyarrow",
        ),
        keys=["u"], sums={}, count_alias="deg",
    ).materialize()
    npart = _dedup._default_join_partitions()
    from goose_parser_ray.functions.relational import compact_for_join

    j = (
        und.join(
            compact_for_join(deg, npart), join_type="inner",
            num_partitions=npart, on=("u",),
        )
        .join(
            compact_for_join(
                deg.map_batches(
                    lambda t: pa.Table.from_pydict(
                        {"v": t["u"], "deg_v": t["deg"]}
                    ),
                    batch_format="pyarrow",
                ),
                npart,
            ),
            join_type="inner", num_partitions=npart, on=("v",),
        )
    )

    def moments(t: pa.Table) -> pa.Table:
        x = t["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t["deg_v"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "m": pa.array([len(x)], pa.int64()),
                "sx": pa.array([int(x.sum())], pa.int64()),
                "sy": pa.array([int(y.sum())], pa.int64()),
                "sxy": pa.array([int(np.dot(x, y))], pa.int64()),
                "sxx": pa.array([int(np.dot(x, x))], pa.int64()),
                "syy": pa.array([int(np.dot(y, y))], pa.int64()),
            }
        )

    rows = j.map_batches(moments, batch_format="pyarrow").take_all()
    m = sum(r["m"] for r in rows)
    sx = sum(r["sx"] for r in rows)
    sy = sum(r["sy"] for r in rows)
    sxy = sum(r["sxy"] for r in rows)
    sxx = sum(r["sxx"] for r in rows)
    syy = sum(r["syy"] for r in rows)
    num = m * sxy - sx * sy
    den_x = m * sxx - sx * sx
    den_y = m * syy - sy * sy
    # one float sqrt, same op order as the SQL twin
    r_e6 = int(np.floor(1_000_000.0 * num / np.sqrt(float(den_x) * float(den_y))))
    return pa.Table.from_pydict(
        {
            "m": pa.array([m], pa.int64()),
            "num": pa.array([num], pa.int64()),
            "den_x": pa.array([den_x], pa.int64()),
            "den_y": pa.array([den_y], pa.int64()),
            "r_e6": pa.array([r_e6], pa.int64()),
        }
    )


SQL_ASSORTATIVITY = """
WITH li AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
  WHERE (l_orderkey & 15) = 0
),
e0 AS (SELECT DISTINCT a.p AS u, b.p AS v FROM li a JOIN li b
       ON a.o = b.o AND a.p < b.p),
edges AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY u),
j AS (SELECT du.deg AS x, dv.deg AS y
      FROM edges e JOIN deg du ON du.u = e.u JOIN deg dv ON dv.u = e.v),
mo AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
              CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
              CAST(SUM(x * y) AS BIGINT) AS sxy,
              CAST(SUM(x * x) AS BIGINT) AS sxx,
              CAST(SUM(y * y) AS BIGINT) AS syy
       FROM j)
SELECT m,
       CAST(m * sxy - sx * sy AS BIGINT) AS num,
       CAST(m * sxx - sx * sx AS BIGINT) AS den_x,
       CAST(m * syy - sy * sy AS BIGINT) AS den_y,
       CAST(FLOOR(1000000.0 * (m * sxy - sx * sy)
                  / SQRT(CAST(m * sxx - sx * sx AS DOUBLE)
                         * CAST(m * syy - sy * sy AS DOUBLE)))
            AS BIGINT) AS r_e6
FROM mo
"""


def q_assoc_rules(sf_dir: str):
    """Association rules over co-purchase pairs — frequent_pairs extended
    to the full market-basket metrics, ALL integer-exact: support count,
    confidence_e4 = 10⁴·co // c(u) (directed u→v), and
    lift_e6 = 10⁶·co·N // (c(u)·c(v)). Same scale shape as item_cf: one
    bucketed basket fold, map-side pair expansion, two node-bounded count
    attaches."""
    dis = _capped_baskets(sf_dir)
    n_baskets = (
        dis.map_batches(
            lambda t: pa.Table.from_pydict(
                {"o": t["o"].take(pa.array([], pa.int64()))}
            )
            if t.num_rows == 0
            else pa.Table.from_pydict(
                {"o": pc.unique(t["o"].combine_chunks())}
            ),
            batch_format="pyarrow",
        )
        .count()
    )  # baskets are whole per block, so per-block unique orders sum exactly
    cnt = pre_aggregated_sum(
        dis.map_batches(
            lambda t: pa.Table.from_arrays([t["p"]], names=["p"]),
            batch_format="pyarrow",
        ),
        keys=["p"], sums={}, count_alias="c",
    )
    npart = _dedup._default_join_partitions()
    from goose_parser_ray.functions.relational import compact_for_join

    co = _basket_pair_counts(dis).map_batches(
        lambda t: t.filter(pc.greater_equal(t["support"], 2)),
        batch_format="pyarrow",
    ).materialize()
    # directed rules: emit both u->v and v->u before the confidence attach
    directed = co.map_batches(
        lambda t: pa.Table.from_pydict(
            {
                "a": pa.concat_arrays(
                    [t["u"].combine_chunks(), t["v"].combine_chunks()]
                ),
                "b": pa.concat_arrays(
                    [t["v"].combine_chunks(), t["u"].combine_chunks()]
                ),
                "co": pa.concat_arrays(
                    [t["support"].combine_chunks(),
                     t["support"].combine_chunks()]
                ),
            }
        ),
        batch_format="pyarrow",
    )
    j = compact_for_join(directed.materialize(), npart).join(
        compact_for_join(
            cnt.map_batches(
                lambda t: pa.Table.from_pydict({"a": t["p"], "ca": t["c"]}),
                batch_format="pyarrow",
            ),
            npart,
        ),
        join_type="inner", num_partitions=npart, on=("a",),
    )
    j = compact_for_join(j.materialize(), npart).join(
        compact_for_join(
            cnt.map_batches(
                lambda t: pa.Table.from_pydict({"b": t["p"], "cb": t["c"]}),
                batch_format="pyarrow",
            ),
            npart,
        ),
        join_type="inner", num_partitions=npart, on=("b",),
    )

    def metrics(t: pa.Table) -> pa.Table:
        co_ = t["co"].to_numpy(zero_copy_only=False).astype(np.int64)
        ca = t["ca"].to_numpy(zero_copy_only=False).astype(np.int64)
        cb = t["cb"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "antecedent": t["a"],
                "consequent": t["b"],
                "support": co_,
                "confidence_e4": (10_000 * co_) // ca,
                "lift_e6": (1_000_000 * co_ * n_baskets) // (ca * cb),
            }
        )

    return j.map_batches(metrics, batch_format="pyarrow")


SQL_ASSOC_RULES = f"""
WITH {_SQL_CAPPED_BASKETS}
, n AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS nb FROM li)
, cnt AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS c FROM li GROUP BY p)
, co AS (
  SELECT a.p AS u, b.p AS v, CAST(COUNT(*) AS BIGINT) AS support
  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p HAVING COUNT(*) >= 2
), directed AS (
  SELECT u AS a, v AS b, support FROM co
  UNION ALL SELECT v, u, support FROM co
)
SELECT d.a AS antecedent, d.b AS consequent, d.support,
       CAST(10000 * d.support // ca.c AS BIGINT) AS confidence_e4,
       CAST(1000000 * d.support * (SELECT nb FROM n)
            // (ca.c * cb.c) AS BIGINT) AS lift_e6
FROM directed d
JOIN cnt ca ON ca.p = d.a
JOIN cnt cb ON cb.p = d.b
"""


def q_degree_hist(sf_dir: str):
    """Degree distribution of the co-purchase graph in power-of-two
    buckets — the graph-shape profile (is this scale-free? where do the
    hubs start?) that decides join/salting strategy, same exact integer
    frexp log₂ bucketing as q_skew_profile, node-bounded degree table,
    ≤64-row final aggregate."""
    from ray.data.aggregate import Max, Sum

    und = _copurchase_edges(sf_dir, mask=15).map_batches(
        lambda t: pa.Table.from_pydict(
            {
                "u": pa.concat_arrays(
                    [t["u"].combine_chunks(), t["v"].combine_chunks()]
                )
            }
        ),
        batch_format="pyarrow",
    )
    deg = pre_aggregated_sum(und, keys=["u"], sums={}, count_alias="deg")

    def bucketize(t: pa.Table) -> pa.Table:
        import pandas as pd

        d = t["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        _m, e = np.frexp(d.astype(np.float64))
        df = pd.DataFrame(
            {"bucket_log2": e.astype(np.int64) - 1, "one": 1, "deg": d}
        )
        out = df.groupby("bucket_log2", as_index=False).agg(
            n_nodes=("one", "sum"), max_deg=("deg", "max")
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        deg.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket_log2")
        .aggregate(
            Sum("n_nodes", alias_name="n_nodes"),
            Max("max_deg", alias_name="max_deg"),
        )
    )


SQL_DEGREE_HIST = """
WITH li AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
  WHERE (l_orderkey & 15) = 0
),
e0 AS (SELECT DISTINCT a.p AS u, b.p AS v FROM li a JOIN li b
       ON a.o = b.o AND a.p < b.p),
edges AS (SELECT u FROM e0 UNION ALL SELECT v FROM e0),
deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY u)
SELECT CAST(FLOOR(LOG2(deg)) AS BIGINT) AS bucket_log2,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(MAX(deg) AS BIGINT) AS max_deg
FROM deg GROUP BY 1
"""


def q_seasonal_profile(sf_dir: str):
    """Diurnal activity profile: per (event_type, hour-of-day) event count
    and exact-cents value sum — the seasonality table ops dashboards and
    anomaly baselines read. Domain-bounded (types × 24) exchange, all
    integer."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def to_hour(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        hour = pc.divide(
            pc.subtract(
                us,
                pc.multiply(
                    pc.divide(us, 86_400_000_000), pa.scalar(86_400_000_000)
                ),
            ),
            3_600_000_000,
        )
        return pa.Table.from_pydict(
            {
                "event_type": t["event_type"],
                "hour": hour,
                "v": _cents(t["value"]),
            }
        )

    return pre_aggregated_sum(
        ds.map_batches(to_hour, batch_format="pyarrow"),
        keys=["event_type", "hour"],
        sums={"v": "sum_value_c"},
        count_alias="n",
    )


SQL_SEASONAL_PROFILE = """
SELECT event_type,
       CAST((epoch_us(ts) % 86400000000) // 3600000000 AS BIGINT) AS hour,
       CAST(SUM(CAST(ROUND(100 * value) AS BIGINT)) AS BIGINT)
         AS sum_value_c,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2
"""


def q_gap_hist(sf_dir: str):
    """Inter-arrival-time profile: per-user consecutive event gaps (µs,
    (ts, event_id) total order) rolled into power-of-two-second buckets —
    the cadence fingerprint bot/burst detectors read. User-bucketed fold
    (one mergesort + grouped diff per bucket, same shape as
    markov_transitions), exact integer frexp bucketing, ~40-bucket
    exchange."""
    import pandas as pd

    from goose_parser_ray.functions.dedup import num_shuffle_buckets

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    nb = num_shuffle_buckets(ds.count())

    def add_bucket(t: pa.Table) -> pa.Table:
        return _dedup.add_hash_bucket(t, "user_id", nb, "__gb")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "bucket_log2_s": pd.Series([], dtype=np.int64),
                "n_gaps": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        ).reset_index(drop=True)
        us = g["ts"].astype("int64").to_numpy()
        same = g["user_id"].to_numpy()[1:] == g["user_id"].to_numpy()[:-1]
        gap_s = (us[1:] - us[:-1])[same] // 1_000_000
        gap_s = np.maximum(gap_s, 1)  # sub-second gaps land in bucket 0
        _m, e = np.frexp(gap_s.astype(np.float64))
        hist = pd.Series(e.astype(np.int64) - 1).value_counts()
        if hist.empty:
            return empty
        return pd.DataFrame(
            {
                "bucket_log2_s": hist.index.to_numpy(np.int64),
                "n_gaps": hist.to_numpy(np.int64),
            }
        )

    partial = ds.map_batches(add_bucket, batch_format="pyarrow").groupby(
        "__gb"
    ).map_groups(fold, batch_format="pandas")
    return pre_aggregated_sum(
        partial, keys=["bucket_log2_s"], sums={"n_gaps": "n_gaps"}
    )


SQL_GAP_HIST = """
WITH l AS (
  SELECT user_id, epoch_us(ts) AS us,
         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nxt
  FROM events
), g AS (
  SELECT GREATEST((nxt - us) // 1000000, 1) AS gap_s
  FROM l WHERE nxt IS NOT NULL
)
SELECT CAST(FLOOR(LOG2(gap_s)) AS BIGINT) AS bucket_log2_s,
       CAST(COUNT(*) AS BIGINT) AS n_gaps
FROM g GROUP BY 1
"""


def q_pushdown_scan(sf_dir: str):
    """Scan-level predicate pushdown ("prune at the read"): the row
    filter rides into the pyarrow scanner via ``read_parquet(filter=…)``,
    so row groups whose min/max statistics exclude the predicate are
    never decoded and non-matching rows never enter the object store —
    the difference between scanning 100 TB and scanning the 0.1% that
    matters. Exact-cents output; the oracle states the same predicate."""
    import pyarrow.dataset as pds

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "value"],
        filter=(pds.field("event_type") == "purchase")
        & (pds.field("value") > 300.0),
    )
    return ds.map_batches(
        lambda t: pa.Table.from_pydict(
            {"event_id": t["event_id"], "value_c": _cents(t["value"])}
        ),
        batch_format="pyarrow",
    )


SQL_PUSHDOWN_SCAN = """
SELECT event_id, CAST(ROUND(100 * value) AS BIGINT) AS value_c
FROM events
WHERE event_type = 'purchase' AND value > 300.0
"""


def q_image_pipeline(sf_dir: str):
    """REAL image transform chain, oracle-checked end to end: synthetic
    RGB gradients → PNG encode (cycling filters) → actor-pool decode →
    8×8 nearest thumbnail → PNG RE-ENCODE → second decode → exact channel
    sum. The mid-pipeline re-encode is the artifact a production
    thumbnail job writes back; the closed-form DuckDB twin recomputes the
    sampled pixels, so the hash compare proves the whole
    decode∘resize∘encode∘decode chain is bit-exact. (q_media_pipeline
    remains the disclosed-stub plumbing demo for codecs the sandbox
    can't decode.)"""
    from goose_parser_ray.functions.multimodal import PngThumbRoundtripActor
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
    out = ds.map_batches(
        # task pool, not actor pool: setup is an import bind — actor
        # spin-up costs more than it saves (measured on media_png:
        # stage wall 3.0s -> 1.4s at sf0.1/32 CPUs)
        lambda t: PngThumbRoundtripActor()(t),
        batch_format="pyarrow",
        batch_size=64,
    )
    return out.select_columns(["doc_id", "width", "height", "thumb_sum"])


SQL_IMAGE_PIPELINE = """
WITH dims AS (
  SELECT doc_id,
         16 + (doc_id & 15) AS width,
         16 + ((doc_id // 16) & 15) AS height
  FROM documents
),
pix AS (
  SELECT d.doc_id, d.width, d.height,
         (31 * ((a.i * d.height) // 8) + 17 * ((b.j * d.width) // 8)
          + 7 * e.c + d.doc_id) % 256 AS val
  FROM dims d,
       UNNEST(generate_series(0, 7)) AS a(i),
       UNNEST(generate_series(0, 7)) AS b(j),
       UNNEST(generate_series(0, 2)) AS e(c)
)
SELECT doc_id, width, height, CAST(SUM(val) AS BIGINT) AS thumb_sum
FROM pix GROUP BY doc_id, width, height
"""


def q_mutual_info(sf_dir: str):
    """Mutual information between lang and source (how much one column
    predicts the other — the dependency screen feature selection and
    leakage audits run), under the repo's fixed-point log discipline:
    per-cell terms n_xy·ln(N·n_xy/(n_x·n_y))/N are e6-rounded ELEMENT-WISE
    and summed as int64 (exact in any order — the char_entropy/geo_mean
    recipe), with the ln argument formed by the identical float ops as the
    SQL twin. One domain-bounded (langs × sources) exchange."""
    ds = _read(sf_dir, "documents", ["lang", "source"])
    cells = pre_aggregated_sum(
        ds, keys=["lang", "source"], sums={}, count_alias="n_xy"
    ).to_pandas()  # langs × sources — domain-bounded
    n = int(cells["n_xy"].sum())
    nx = cells.groupby("lang")["n_xy"].transform("sum").to_numpy(np.int64)
    ny = cells.groupby("source")["n_xy"].transform("sum").to_numpy(np.int64)
    nxy = cells["n_xy"].to_numpy(np.int64)
    # identical float op order as the twin: N*n_xy first, then /(n_x*n_y)
    arg = (float(n) * nxy) / (nx * ny).astype(np.float64)
    term = 1_000_000.0 * (nxy * np.log(arg)) / float(n)
    mi_e6 = int(np.round(term).astype(np.int64).sum())
    return pa.Table.from_pydict(
        {
            "n_docs": pa.array([n], pa.int64()),
            "n_cells": pa.array([len(cells)], pa.int64()),
            "mi_e6": pa.array([mi_e6], pa.int64()),
        }
    )


SQL_MUTUAL_INFO = """
WITH c AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_xy
  FROM documents GROUP BY lang, source
), m AS (
  SELECT c.*,
         SUM(n_xy) OVER (PARTITION BY lang) AS n_x,
         SUM(n_xy) OVER (PARTITION BY source) AS n_y,
         SUM(n_xy) OVER () AS n
  FROM c
)
SELECT CAST(MAX(n) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(CAST(ROUND(
           1000000.0 * (n_xy * LN((CAST(n AS DOUBLE) * n_xy)
                                  / (n_x * n_y))) / CAST(n AS DOUBLE)
       ) AS BIGINT)) AS BIGINT) AS mi_e6
FROM m
"""


def q_transition_entropy(sf_dir: str):
    """Conditional entropy of each user-sequence step, H(next | current)
    per source state — how predictable behavior is (bots collapse toward
    0; uniform browsing approaches ln |types|). Reuses the
    markov_transitions fold for the |types|²-bounded counts, then the
    fixed-point log discipline (element-wise e6 rounding, int sums, float
    ops mirrored by the twin)."""
    import pandas as pd

    from goose_parser_ray.functions.dedup import num_shuffle_buckets

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    nb = num_shuffle_buckets(ds.count())

    def add_bucket(t: pa.Table) -> pa.Table:
        return _dedup.add_hash_bucket(t, "user_id", nb, "__tb")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "src_type": pd.Series([], dtype=object),
                    "dst_type": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        g = g.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        ).reset_index(drop=True)
        nxt = g.groupby("user_id")["event_type"].shift(-1)
        keep = nxt.notna()
        agg = (
            pd.DataFrame(
                {"src_type": g["event_type"][keep], "dst_type": nxt[keep]}
            )
            .groupby(["src_type", "dst_type"], as_index=False, sort=False)
            .size()
            .rename(columns={"size": "n"})
        )
        agg["n"] = agg["n"].astype(np.int64)
        return agg

    counts = pre_aggregated_sum(
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__tb")
        .map_groups(fold, batch_format="pandas"),
        keys=["src_type", "dst_type"],
        sums={"n": "n"},
    ).to_pandas()  # |types|² — domain-bounded
    tot = counts.groupby("src_type")["n"].transform("sum").to_numpy(np.int64)
    nn = counts["n"].to_numpy(np.int64)
    # mirrored float ops: p = n/tot (per cell), term = -1e6 * ln(p) * n / tot
    term = -1_000_000.0 * (nn * np.log(nn / tot.astype(np.float64))) / tot
    counts["h_term_e6"] = np.round(term).astype(np.int64)
    out = (
        counts.groupby("src_type", as_index=False)
        .agg(n_out=("n", "sum"), h_e6=("h_term_e6", "sum"))
    )
    return pa.Table.from_pydict(
        {
            "src_type": pa.array(out["src_type"], pa.string()),
            "n_out": pa.array(out["n_out"].to_numpy(np.int64), pa.int64()),
            "h_e6": pa.array(out["h_e6"].to_numpy(np.int64), pa.int64()),
        }
    )


SQL_TRANSITION_ENTROPY = """
WITH l AS (
  SELECT user_id, event_type AS a,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS b
  FROM events
), c AS (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n
  FROM l WHERE b IS NOT NULL GROUP BY a, b
), m AS (
  SELECT c.*, SUM(n) OVER (PARTITION BY a) AS tot FROM c
)
SELECT a AS src_type, CAST(SUM(n) AS BIGINT) AS n_out,
       CAST(SUM(CAST(ROUND(
           -1000000.0 * (n * LN(n / CAST(tot AS DOUBLE)))
           / CAST(tot AS DOUBLE)
       ) AS BIGINT)) AS BIGINT) AS h_e6
FROM m GROUP BY a
"""


def q_churn_rate(sf_dir: str):
    """Weekly churn: of the users active in week w (weeks since epoch),
    the share with no activity in w+1 — the product-health metric cohort
    dashboards lead with. User-bucketed fold — each user's distinct week
    set is bucket-local, so active/churned flags are exact without a
    cross-user shuffle; the exchange is calendar-bounded (week, counts)
    rows. The global last week is excluded on both sides (no w+1
    evidence). rate_e4 is an exact integer ratio."""
    import pandas as pd

    from goose_parser_ray.functions.dedup import num_shuffle_buckets

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    nb = num_shuffle_buckets(ds.count())

    def to_week(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        week = pc.divide(us, 7 * 86_400_000_000)
        t2 = pa.Table.from_pydict({"user_id": t["user_id"], "week": week})
        return _dedup.add_hash_bucket(t2, "user_id", nb, "__cb")

    bucketed = ds.map_batches(to_week, batch_format="pyarrow").materialize()
    gmax = int(bucketed.max("week"))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "week": pd.Series([], dtype=np.int64),
                    "active": pd.Series([], dtype=np.int64),
                    "churned": pd.Series([], dtype=np.int64),
                }
            )
        p = pd.DataFrame(
            {"u": g["user_id"], "m": g["week"].to_numpy(np.int64)}
        ).drop_duplicates()
        nxt = p.assign(m=p["m"] - 1)  # (u, m) exists at m+1 → marker at m
        p["has_next"] = (
            p.merge(nxt.assign(k=1), on=["u", "m"], how="left")["k"]
            .notna()
            .to_numpy()
        )
        p = p[p["m"] < gmax]
        out = p.groupby("m", as_index=False).agg(
            active=("u", "size"),
            churned=("has_next", lambda s: int((~s).sum())),
        )
        return pd.DataFrame(
            {
                "week": out["m"].to_numpy(np.int64),
                "active": out["active"].to_numpy(np.int64),
                "churned": out["churned"].to_numpy(np.int64),
            }
        )

    agg = pre_aggregated_sum(
        bucketed.groupby("__cb").map_groups(fold, batch_format="pandas"),
        keys=["week"],
        sums={"active": "active", "churned": "churned"},
    )
    return agg.map_batches(
        lambda t: t.append_column(
            "churn_rate_e4",
            pc.divide(pc.multiply(t["churned"], 10_000), t["active"]),
        ),
        batch_format="pyarrow",
    )


SQL_CHURN_RATE = """
WITH am AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS m
  FROM events
), gmax AS (SELECT MAX(m) AS gm FROM am),
flags AS (
  SELECT a.user_id, a.m,
         CASE WHEN b.user_id IS NULL THEN 1 ELSE 0 END AS churned
  FROM am a
  LEFT JOIN am b ON b.user_id = a.user_id AND b.m = a.m + 1
  WHERE a.m < (SELECT gm FROM gmax)
)
SELECT m AS week, CAST(COUNT(*) AS BIGINT) AS active,
       CAST(SUM(churned) AS BIGINT) AS churned,
       CAST(10000 * SUM(churned) // COUNT(*) AS BIGINT) AS churn_rate_e4
FROM flags GROUP BY m
"""


def q_fk_orphans(sf_dir: str):
    """Referential-integrity audit over the star schema's five FK edges,
    ORACLE-CHECKED: per relationship, exact counts of child rows, orphan
    child rows (FK value absent from the parent), parent rows, and
    childless parents. Scale shape: per relation, child keys are
    map-side pre-aggregated to (key, cnt) partials (shuffle payload is
    DISTINCT keys, never child rows), then ONE full-outer hash join
    against the parent key column; the per-relation rollup of that join
    is another map-side partial sum, so the driver assembles exactly five
    result rows. No row-proportional collect anywhere."""
    from goose_parser_ray.functions.dedup import _default_join_partitions
    from goose_parser_ray.functions.relational import compact_for_join

    rels = [
        ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
        ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ]
    np_join = _default_join_partitions()
    out = {
        "relationship": [], "n_child": [], "n_orphan_child": [],
        "n_parent": [], "n_childless_parent": [],
    }
    for name, child, ck, parent, pk in rels:
        ckeys = _read(sf_dir, child, [ck])

        def cnt_partial(t: pa.Table, _ck=ck) -> pa.Table:
            import pandas as pd
            df = pd.DataFrame({"k": t[_ck].to_numpy(zero_copy_only=False)})
            g = df.groupby("k", as_index=False).size()
            return pa.Table.from_pydict(
                {"k": pa.array(g["k"].to_numpy(), pa.int64()),
                 "cnt": pa.array(g["size"].to_numpy(), pa.int64())}
            )

        ccnt = pre_aggregated_sum(
            ckeys.map_batches(cnt_partial, batch_format="pyarrow"),
            keys=["k"], sums={"cnt": "cnt"},
        )
        pkeys = _read(sf_dir, parent, [pk]).map_batches(
            lambda t, _pk=pk: pa.Table.from_pydict(
                {"k": pc.cast(t[_pk], pa.int64()),
                 "one": pa.array(np.ones(t.num_rows, np.int64))}
            ),
            batch_format="pyarrow",
        )
        joined = compact_for_join(ccnt, np_join).join(
            compact_for_join(pkeys, np_join),
            join_type="full_outer", num_partitions=np_join,
            on=("k",), right_on=("k",), right_suffix="_p",
        )

        def roll(t: pa.Table) -> pa.Table:
            cnt = pc.fill_null(t["cnt"], 0).to_numpy(zero_copy_only=False)
            par = pc.fill_null(t["one"], 0).to_numpy(zero_copy_only=False)
            return pa.Table.from_pydict(
                {
                    "n_child": [int(cnt.sum())],
                    "n_orphan_child": [int(cnt[par == 0].sum())],
                    "n_parent": [int(par.sum())],
                    "n_childless_parent": [int(((cnt == 0) & (par == 1)).sum())],
                }
            )

        # roll emits ONE row per joined block — the driver sums a stream
        # bounded by block count, never by row count.
        sums = joined.map_batches(roll, batch_format="pyarrow").to_pandas()
        out["relationship"].append(name)
        for c in ("n_child", "n_orphan_child", "n_parent",
                  "n_childless_parent"):
            out[c].append(int(sums[c].sum()))
    return pa.Table.from_pydict(
        {k: pa.array(v) for k, v in out.items()}
    )


SQL_FK_ORPHANS = """
WITH rel AS (
  SELECT 'lineitem->orders' AS relationship,
         (SELECT COUNT(*) FROM lineitem) AS n_child,
         (SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o
            ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL)
           AS n_orphan_child,
         (SELECT COUNT(*) FROM orders) AS n_parent,
         (SELECT COUNT(*) FROM orders o LEFT JOIN
            (SELECT DISTINCT l_orderkey FROM lineitem) l
            ON o.o_orderkey = l.l_orderkey WHERE l.l_orderkey IS NULL)
           AS n_childless_parent
  UNION ALL
  SELECT 'orders->customer',
         (SELECT COUNT(*) FROM orders),
         (SELECT COUNT(*) FROM orders o LEFT JOIN customer c
            ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL),
         (SELECT COUNT(*) FROM customer),
         (SELECT COUNT(*) FROM customer c LEFT JOIN
            (SELECT DISTINCT o_custkey FROM orders) o
            ON c.c_custkey = o.o_custkey WHERE o.o_custkey IS NULL)
  UNION ALL
  SELECT 'customer->nation',
         (SELECT COUNT(*) FROM customer),
         (SELECT COUNT(*) FROM customer c LEFT JOIN nation n
            ON c.c_nationkey = n.n_nationkey WHERE n.n_nationkey IS NULL),
         (SELECT COUNT(*) FROM nation),
         (SELECT COUNT(*) FROM nation n LEFT JOIN
            (SELECT DISTINCT c_nationkey FROM customer) c
            ON n.n_nationkey = c.c_nationkey WHERE c.c_nationkey IS NULL)
  UNION ALL
  SELECT 'supplier->nation',
         (SELECT COUNT(*) FROM supplier),
         (SELECT COUNT(*) FROM supplier s LEFT JOIN nation n
            ON s.s_nationkey = n.n_nationkey WHERE n.n_nationkey IS NULL),
         (SELECT COUNT(*) FROM nation),
         (SELECT COUNT(*) FROM nation n LEFT JOIN
            (SELECT DISTINCT s_nationkey FROM supplier) s
            ON n.n_nationkey = s.s_nationkey WHERE s.s_nationkey IS NULL)
  UNION ALL
  SELECT 'lineitem->part',
         (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(*) FROM lineitem l LEFT JOIN part p
            ON l.l_partkey = p.p_partkey WHERE p.p_partkey IS NULL),
         (SELECT COUNT(*) FROM part),
         (SELECT COUNT(*) FROM part p LEFT JOIN
            (SELECT DISTINCT l_partkey FROM lineitem) l
            ON p.p_partkey = l.l_partkey WHERE l.l_partkey IS NULL)
)
SELECT relationship,
       CAST(n_child AS BIGINT) AS n_child,
       CAST(n_orphan_child AS BIGINT) AS n_orphan_child,
       CAST(n_parent AS BIGINT) AS n_parent,
       CAST(n_childless_parent AS BIGINT) AS n_childless_parent
FROM rel
"""


def q_integrity_audit(sf_dir: str):
    """Bit-rot / integrity verification pass, ORACLE-CHECKED: every doc's
    payload carries the CRC32 computed at WRITE time; afterwards every
    23rd-ish payload (doc_id % 23 == 5) suffers a single flipped byte —
    the silent-corruption model a petabyte store audits for. The verify
    stage recomputes zlib.crc32 over the actual bytes and compares; a
    single-byte flip always changes CRC32, so the flag is deterministic.
    The twin states the expected verdict closed-form from the planted
    corruption rule, so the hash compare certifies the auditor found
    EXACTLY the corrupted rows (no false alarms, no misses). Scale
    shape: map-only, CRC at C speed per row, no shuffle."""
    import zlib

    def audit(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        oks, sizes = [], []
        for d, txt in zip(ids, t["text"].to_pylist()):
            payload = (txt or "").encode("utf-8")
            stored = zlib.crc32(payload)
            if d % 23 == 5 and payload:
                payload = (
                    bytes([payload[0] ^ 0xFF]) + payload[1:]
                )  # post-write corruption
            oks.append(zlib.crc32(payload) == stored)
            sizes.append(len(payload))
        return pa.Table.from_pydict(
            {
                "doc_id": t["doc_id"],
                "n_bytes": pa.array(sizes, pa.int64()),
                "crc_ok": pa.array(oks, pa.bool_()),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        audit, batch_format="pyarrow"
    )


SQL_INTEGRITY_AUDIT = """
SELECT doc_id,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       NOT (doc_id % 23 = 5 AND strlen(text) > 0) AS crc_ok
FROM documents
"""
