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


def collect_tables(ds) -> pa.Table:
    """Materialize a SMALL dataset and concatenate its blocks into one
    driver-side Arrow table.

    Always ``materialize()`` first: on this Ray version a bare
    ``ray.get(ds.to_arrow_refs())`` on a lazy plan executes the DAG and
    then a follow-up schema peek RE-EXECUTES the entire upstream plan a
    second time (observed as an extra ``... -> LimitOperator[limit=1]``
    run costing the full pipeline — it doubled remove_common_lines'
    count+groupby phase from 9.7 s to 17 s at bench scale).  Materializing
    pins the executed blocks so every later peek is free.

    Only call this on results the driver may legitimately hold (common-line
    sets, join small sides, sketch outputs) — never on corpus-sized data.
    """
    import ray

    tabs = ray.get(ds.materialize().to_arrow_refs())
    if not tabs:
        return pa.table({})
    return pa.concat_tables(tabs, promote_options="default")


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
