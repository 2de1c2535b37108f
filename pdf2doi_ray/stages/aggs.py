"""Multi-statistic grouped summary as ONE combiner-first shuffle.

The classic per-key profile (count / sum / min / max / mean) computed the
way every wide aggregation in this repo is: a per-batch Arrow ``group_by``
collapses raw rows to one partial row per distinct key per batch, the
global ``groupby`` only merges partials, and the mean derives from
(sum, count) in a final vectorized projection — never a second pass.

Floats are milli-scaled to integers at the edge (``floor(value*1000)``,
the repo-wide convention shared with :mod:`.windowfns`) so every
statistic — including the floor-divided mean — is exact and
engine-independent.  The mean uses integer floor division; numpy ``//``
floors while DuckDB ``//`` truncates, identical for the non-negative sums
this operator targets (metrics, sizes, prices) — callers with signed
values should derive their own mean from the returned (sum, n).

Reference: pdf2doi only counts successes in its log lines (``main.py``);
per-key statistical profiles are the corpus-health analog an extraction
pipeline reports per partition/host/type.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .windowfns import _milli
from ..arrowutil import one_chunk


def grouped_summary(ds, key_col: str, value_col: str):
    """(key, n, sum_milli, min_milli, max_milli, avg_milli) per key."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(t: pa.Table) -> pa.Table:
        vm = _milli(one_chunk(t[value_col]))
        g = pa.table({
            key_col: t[key_col],
            "vm": pa.array(vm, type=pa.int64()),
        }).group_by(key_col).aggregate([
            ("vm", "count"), ("vm", "sum"), ("vm", "min"), ("vm", "max"),
        ])
        return pa.table({
            key_col: g[key_col],
            "n_p": g["vm_count"].cast(pa.int64()),
            "sum_p": g["vm_sum"].cast(pa.int64()),
            "min_p": g["vm_min"],
            "max_p": g["vm_max"],
        })

    def finalize(t: pa.Table) -> pa.Table:
        n = np.asarray(one_chunk(t["n"]))
        s = np.asarray(one_chunk(t["sum_milli"]))
        avg = np.where(n > 0, s // np.maximum(n, 1), 0)
        return t.append_column("avg_milli",
                               pa.array(avg, type=pa.int64()))

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(key_col)
            .aggregate(Sum("n_p", alias_name="n"),
                       Sum("sum_p", alias_name="sum_milli"),
                       Min("min_p", alias_name="min_milli"),
                       Max("max_p", alias_name="max_milli"))
            .map_batches(finalize, batch_format="pyarrow"))


#: sentinel standing in for NULL at rolled-up levels while the rows are in
#: flight — Ray's sort-based groupby cannot partition null keys (documented
#: sandbox quirk), so the ROLLUP carries this and converts back at the end.
_ROLLUP_ALL = "\x00__ALL__"


def cube_counts(ds, col_a: str, col_b: str):
    """``GROUP BY CUBE(a, b)`` counts — ROLLUP's three levels plus the
    (·, b) cross-slice, still ONE pass and ONE shuffle (the extra level is
    one more vectorized re-aggregation of the same per-batch fine
    partial)."""
    return rollup_counts(ds, col_a, col_b, _cube=True)


def rollup_counts(ds, col_a: str, col_b: str, _cube: bool = False):
    """``GROUP BY ROLLUP(a, b)`` counts in ONE pass and ONE shuffle.

    Each batch emits partial counts at all three grouping levels —
    (a, b), (a, ·), (·, ·) — from a single Arrow ``group_by`` (the coarser
    levels are vectorized re-aggregations of the finest partial, so the
    input is scanned once).  Rolled-up positions travel as a non-null
    sentinel because Ray's sort shuffle cannot partition null keys, and
    the final projection converts them back to real NULLs to match the
    SQL ``ROLLUP`` output.  Shuffle volume: ≤ (|a×b| + |a| + 1) combiner
    rows per batch.  Returns (col_a, col_b, n) with NULLs marking
    subtotal/grand-total rows.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        fine = t.select([col_a, col_b]).group_by([col_a, col_b]) \
            .aggregate([([], "count_all")])
        a = fine[col_a]
        b = fine[col_b]
        for col in (a, b):
            if pc.any(pc.equal(col, _ROLLUP_ALL)).as_py():
                raise ValueError(
                    "rollup_counts: input value collides with the internal "
                    f"rolled-up sentinel {_ROLLUP_ALL!r}")
        n = fine["count_all"].cast(pa.int64())
        mid = pa.table({col_a: a, "n": n}).group_by(col_a) \
            .aggregate([("n", "sum")])
        total = int(pc.sum(n).as_py() or 0)
        parts = [
            pa.table({col_a: a, col_b: b, "n_p": n}),
            pa.table({col_a: mid[col_a],
                      col_b: pa.array([_ROLLUP_ALL] * mid.num_rows,
                                      type=pa.string()),
                      "n_p": mid["n_sum"].cast(pa.int64())}),
        ]
        if _cube:
            midb = pa.table({col_b: b, "n": n}).group_by(col_b) \
                .aggregate([("n", "sum")])
            parts.append(pa.table({
                col_a: pa.array([_ROLLUP_ALL] * midb.num_rows,
                                type=pa.string()),
                col_b: midb[col_b],
                "n_p": midb["n_sum"].cast(pa.int64())}))
        if total:
            parts.append(pa.table({
                col_a: pa.array([_ROLLUP_ALL], type=pa.string()),
                col_b: pa.array([_ROLLUP_ALL], type=pa.string()),
                "n_p": pa.array([total], type=pa.int64())}))
        return pa.concat_tables(parts)

    def finalize(t: pa.Table) -> pa.Table:
        def denull(col):
            arr = t[col].combine_chunks() \
                if isinstance(t[col], pa.ChunkedArray) else t[col]
            mask = pc.equal(arr, _ROLLUP_ALL)
            return pc.if_else(mask, pa.scalar(None, type=pa.string()), arr)
        return pa.table({col_a: denull(col_a), col_b: denull(col_b),
                         "n": t["n"]})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby([col_a, col_b])
            .aggregate(Sum("n_p", alias_name="n"))
            .map_batches(finalize, batch_format="pyarrow"))


def value_quantiles_milli(ds, value_col: str,
                          quantiles_permille=(250, 500, 750, 900)):
    """EXACT quantiles of a continuous float column, milli-quantized.

    ``floor(value*1000)`` bounds the distinct-value cardinality (a t-digest
    -class problem becomes an exact histogram: for web metrics the milli
    grid is a few 10^5 distinct values regardless of corpus size), then the
    repo's histogram-quantile machinery runs unchanged — per-batch
    value→count partials, a tiny ``groupby(value)`` merge, and the shared
    driver walk.  Quantile definition identical to
    :func:`.textstats.token_count_quantiles` (value at 1-based rank
    ``ceil(q/1000 · n)`` ascending), mirrored by the SQL oracle over the
    same quantized values.  Returns (q_permille, value) with ``value`` in
    milli units.
    """
    from ray.data.aggregate import Sum

    from .textstats import quantiles_from_histogram

    def partial(t: pa.Table) -> pa.Table:
        vm = _milli(one_chunk(t[value_col]))
        g = pa.table({"value": pa.array(vm, type=pa.int64())}) \
            .group_by("value").aggregate([("value", "count")])
        return g.select(["value", "value_count"]) \
            .rename_columns(["value", "n"])

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("value").aggregate(Sum("n", alias_name="n"))
            .to_pandas())
    return quantiles_from_histogram(hist, quantiles_permille)


def value_quantiles_milli_by_group(ds, group_col: str, value_col: str,
                                   quantiles_permille=(500, 900)):
    """Exact milli-quantized quantiles of a float column PER GROUP — the
    grouped counterpart of :func:`value_quantiles_milli` (e.g. p50/p90
    event value per event type).

    Keyed histogram partials: per-batch arrow ``group_by([group, value])``
    → global merge → driver walk per group over the tiny (group, value, n)
    frame.  Driver memory is |groups|·|distinct milli values| rows — the
    same bound (and the same tree-merge escape past ~10⁷ rows) as
    ``token_count_quantiles_by_group``.  Returns
    (group_col, q_permille, value).
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    from .textstats import quantiles_from_histogram

    def partial(t: pa.Table) -> pa.Table:
        vm = _milli(one_chunk(t[value_col]))
        g = pa.table({
            group_col: t[group_col],
            "value": pa.array(vm, type=pa.int64()),
        }).group_by([group_col, "value"]).aggregate([([], "count_all")])
        return pa.table({group_col: g[group_col], "value": g["value"],
                         "n": g["count_all"].cast(pa.int64())})

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby([group_col, "value"])
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas())
    out = []
    if group_col in hist.columns:
        for key, sub in hist.groupby(group_col, sort=True):
            q = quantiles_from_histogram(sub[["value", "n"]],
                                         quantiles_permille)
            q.insert(0, group_col, key)
            out.append(q)
    if not out:
        return pd.DataFrame({group_col: pd.Series(dtype=object),
                             "q_permille": pd.Series(dtype="int64"),
                             "value": pd.Series(dtype="int64")})
    return pd.concat(out, ignore_index=True)
