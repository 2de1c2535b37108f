"""Shared Arrow helpers: per-row reductions over list columns.

One vectorized kernel over the FLATTENED child values + a cumsum/offset
reduction gives per-row counts without any per-row Python — used by both
the extract prefilter (any metadata value matches) and the text-statistics
stopword counters.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def one_chunk(col):
    """Normalize a (Chunked)Array to a single contiguous Array."""
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def rowwise_sums(list_arr: pa.Array, flat_values) -> np.ndarray:
    """Per-row sum of int64 values aligned with ``list_arr.flatten()`` —
    the weighted generalization of :func:`rowwise_flag_counts` (same
    cumsum/offset reduction, no per-row Python)."""
    vals = np.asarray(flat_values).astype(np.int64)
    cum = np.concatenate([[0], np.cumsum(vals)])
    offsets = np.asarray(list_arr.offsets).astype(np.int64)
    return cum[offsets[1:]] - cum[offsets[:-1]]


def rowwise_flag_counts(list_arr: pa.Array, flat_flags) -> np.ndarray:
    """Per-row count of True flags, where ``flat_flags`` is a boolean array
    aligned with ``list_arr.flatten()`` (may contain nulls → False)."""
    import pyarrow.compute as pc

    hits = np.asarray(pc.fill_null(flat_flags, False)).astype(np.int64)
    cum = np.concatenate([[0], np.cumsum(hits)])
    offsets = np.asarray(list_arr.offsets).astype(np.int64)
    return cum[offsets[1:]] - cum[offsets[:-1]]
