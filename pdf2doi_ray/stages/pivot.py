"""Wide conditional-count pivot: one row per key, one ``n_<category>``
int64 column per category value.

The category set is an EXPLICIT argument, not discovered from the data —
at fleet scale the pivot width is schema (fixed, known up front), while a
data-driven width would make the output schema depend on which blocks
arrived (and an adversarial high-cardinality pivot column would explode
it).  Unlisted categories are ignored.

Plan: one vectorized per-batch partial (factorize keys, scatter-add into a
|keys|×|categories| count matrix) so the shuffle carries one wide row per
key per batch, then a single ``groupby(key)`` summing each category column.
Skew-safe for the same reason the combiner aggregations are: a hot key
contributes ≤ one row per batch to the exchange regardless of its row
count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def pivot_counts(ds, key_col: str, pivot_col: str, categories):
    """``SELECT key, count(*) FILTER (WHERE pivot = cat) AS n_<cat>, ...
    GROUP BY key`` as a combiner-first Ray Data aggregate."""
    from ray.data.aggregate import Sum

    from ..arrowutil import one_chunk

    categories = list(categories)
    out_cols = [f"n_{c}" for c in categories]

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        keys = one_chunk(t[key_col])
        piv = one_chunk(t[pivot_col]).to_numpy(zero_copy_only=False)
        uk, inv = np.unique(np.asarray(keys), return_inverse=True)
        # C-vectorized category encode; unlisted values code to -1
        col = pd.Categorical(piv, categories=categories).codes \
            .astype(np.int64)
        m = np.zeros((len(uk), len(categories)), dtype=np.int64)
        known = col >= 0
        np.add.at(m, (inv[known], col[known]), 1)
        cols = {key_col: pa.array(uk, type=keys.type)}
        for j, name in enumerate(out_cols):
            cols[name] = pa.array(m[:, j], type=pa.int64())
        return pa.table(cols)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(key_col)
            .aggregate(*[Sum(name, alias_name=name) for name in out_cols]))
