"""Scalar-kernel tests for the round-4c operators: watermark lateness logic
(seeded two-phase prefix max ≡ sequential scan) and the temperature-mixture
rate arithmetic. Distributed value parity runs through the oracle gate
(q:late_events / temperature_mixture / media_tiff)."""

from __future__ import annotations

import math

import numpy as np


def _sequential_late(event_ids, secs, allowed=600):
    """Reference: one sequential pass in arrival order."""
    order = np.argsort(event_ids, kind="stable")
    s = np.asarray(secs)[order]
    wm = -(1 << 62)
    n_late = 0
    max_lateness = 0
    for v in s:
        lateness = max(0, wm - int(v))
        n_late += lateness > allowed
        max_lateness = max(max_lateness, lateness)
        wm = max(wm, int(v))
    return n_late, max_lateness


def _bucketed_late(event_ids, secs, nb, allowed=600):
    """The q_late_events two-phase scan, run in-process: per-bucket max →
    exclusive running max over buckets → seeded in-bucket scan."""
    eids = np.asarray(event_ids)
    s = np.asarray(secs)
    mx = int(eids.max())
    b = eids * nb // (mx + 1)
    base = {}
    running = -(1 << 62)
    for bk in sorted(set(b.tolist())):
        base[bk] = running
        running = max(running, int(s[b == bk].max()))
    n_late = 0
    max_lateness = 0
    for bk in sorted(set(b.tolist())):
        mask = b == bk
        sub_ids = eids[mask]
        sub_s = s[mask][np.argsort(sub_ids, kind="stable")]
        prev = np.empty_like(sub_s)
        prev[0] = base[bk]
        if len(sub_s) > 1:
            np.maximum.accumulate(sub_s[:-1], out=prev[1:])
            prev[1:] = np.maximum(prev[1:], prev[0])
        lateness = np.maximum(prev - sub_s, 0)
        n_late += int((lateness > allowed).sum())
        max_lateness = max(max_lateness, int(lateness.max()))
    return n_late, max_lateness


def test_two_phase_watermark_matches_sequential():
    rng = np.random.default_rng(3)
    n = 5_000
    eids = rng.permutation(n) * 3 + 1  # sparse, shuffled arrival ids
    secs = rng.integers(0, 100_000, size=n)
    # heavy out-of-orderness: 10% of events dragged far into the past
    late_mask = rng.random(n) < 0.1
    secs = np.where(late_mask, secs - rng.integers(0, 5_000, size=n), secs)
    ref = _sequential_late(eids, secs)
    for nb in (1, 7, 64):
        assert _bucketed_late(eids, secs, nb) == ref


def test_watermark_bucket_boundary_lateness():
    """A late event whose watermark-setter sits in an EARLIER bucket is
    only caught through the seeded base — the case a naive per-bucket scan
    misses."""
    eids = np.array([1, 2, 100, 101])
    secs = np.array([0, 10_000, 10, 10_001])
    # event 100 is 9_990 s behind the watermark set by event 2
    assert _sequential_late(eids, secs) == (1, 9_990)
    assert _bucketed_late(eids, secs, nb=4) == (1, 9_990)


def test_temperature_rates_flatten_distribution():
    """α=0.5 budgets: keep-rate ordering is inverse to source size, exact
    ints mirror the SQL twin's FLOOR(SQRT(n*1e6)) discipline."""
    n_by_src = {"big": 9_000, "mid": 900, "small": 90}
    tot = sum(n_by_src.values())
    budget = tot // 2
    s_by = {
        k: int(math.floor(math.sqrt(n * 1_000_000.0)))
        for k, n in n_by_src.items()
    }
    ss = sum(s_by.values())
    r = {
        k: min(1_000_000, (budget * s_by[k] * 1_000_000) // (ss * n))
        for k, n in n_by_src.items()
    }
    assert r["small"] == 1_000_000  # tiny curated source: keep everything
    # α=0.5 over-allocates to small sources: mid saturates too, only the
    # crawl-sized source is thinned (the intended flattening behavior)
    assert r["mid"] == 1_000_000
    assert r["big"] < 1_000_000
    # admitted mass stays within the budget (sub-ppm rounding slack)
    admitted = sum(n * r[k] for k, n in n_by_src.items())
    assert admitted <= budget * 1_000_000
    assert admitted >= (budget - len(n_by_src)) * 1_000_000 * 0.8
