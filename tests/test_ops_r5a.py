"""Round-5 regression tests for ADVICE.md findings (no Ray needed)."""
import numpy as np
import pytest


# ---------------------------------------------------------------- CCL


def _mask(rows):
    return np.array(rows, dtype=bool)


class TestCCL8Connectivity:
    """ADVICE r4: expanded bounds + <= double-counted the diagonal
    tolerance, unioning runs across a 2-column gap."""

    def test_two_column_gap_is_two_blobs(self):
        from goose_parser_ray.queries.media_stats import ccl_blob_stats

        # row0 cols 0-1, row1 cols 3-4: one background column (col 2)
        # strictly separates their 8-neighborhoods -> two blobs.
        n, mx, tot = ccl_blob_stats(_mask([[1, 1, 0, 0, 0],
                                           [0, 0, 0, 1, 1]]))
        assert (n, mx, tot) == (2, 2, 4)

    def test_diagonal_touch_is_one_blob(self):
        from goose_parser_ray.queries.media_stats import ccl_blob_stats

        # row0 cols 0-1, row1 cols 2-3: corners touch diagonally.
        n, mx, tot = ccl_blob_stats(_mask([[1, 1, 0, 0],
                                           [0, 0, 1, 1]]))
        assert (n, mx, tot) == (1, 4, 4)

    def test_vertical_overlap_one_blob(self):
        from goose_parser_ray.queries.media_stats import ccl_blob_stats

        n, mx, tot = ccl_blob_stats(_mask([[0, 1, 1, 0],
                                           [0, 0, 1, 1]]))
        assert (n, mx, tot) == (1, 4, 4)

    def test_same_row_separate_runs(self):
        from goose_parser_ray.queries.media_stats import ccl_blob_stats

        n, mx, tot = ccl_blob_stats(_mask([[1, 0, 1]]))
        assert (n, mx, tot) == (2, 1, 2)

    def test_u_shape_merges_late(self):
        from goose_parser_ray.queries.media_stats import ccl_blob_stats

        # two vertical arms joined by a bottom bar -> one blob
        n, mx, tot = ccl_blob_stats(_mask([[1, 0, 0, 1],
                                           [1, 0, 0, 1],
                                           [1, 1, 1, 1]]))
        assert (n, mx, tot) == (1, 8, 8)

    def test_empty_mask(self):
        from goose_parser_ray.queries.media_stats import ccl_blob_stats

        assert ccl_blob_stats(_mask([[0, 0], [0, 0]])) == (0, 0, 0)

    def test_checkerboard_is_one_blob(self):
        from goose_parser_ray.queries.media_stats import ccl_blob_stats

        # 8-connectivity joins all diagonal neighbors
        n, mx, tot = ccl_blob_stats(_mask([[1, 0, 1],
                                           [0, 1, 0],
                                           [1, 0, 1]]))
        assert (n, mx, tot) == (1, 5, 5)


# ---------------------------------------------------------- varbyte


class TestVarbyteOverflow:
    """ADVICE r4: a stream whose terminator payload pushes the value past
    2^64 must raise ValueError per the documented contract, not leak an
    OverflowError out of numpy."""

    def test_64bit_overflow_raises_valueerror(self):
        from goose_parser_ray.functions.varbyte import decode_varbyte

        bad = bytes([0x01] * 9 + [0x81])
        with pytest.raises(ValueError):
            decode_varbyte(bad)

    def test_max_uint63_roundtrip(self):
        from goose_parser_ray.functions.varbyte import (
            decode_varbyte,
            encode_varbyte,
        )

        vals = [0, 1, 127, 128, 2**32, 2**63 - 1]
        assert decode_varbyte(encode_varbyte(vals)).tolist() == vals

    def test_truncated_stream_raises(self):
        from goose_parser_ray.functions.varbyte import decode_varbyte

        with pytest.raises(ValueError):
            decode_varbyte(bytes([0x01, 0x02]))  # no terminator byte
