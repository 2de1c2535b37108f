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
