"""Generic per-group sorted-block engine.

Every "window over one key's ordered rows" operator in this repo
(sessions, streaks, gaps, balances, baskets …) shares one plan: sort by
(group, order...), run the group kernel over groups fully INTERIOR to a
block, re-emit the block-edge groups' raw rows to key-sharded stitch
tasks, and union the two paths — each group resolves on exactly one
path, so the union is disjoint and exact.  :func:`per_group_apply` is
that plan factored out; the caller supplies only the vectorized group
kernel.

Scale contract (inherited from the hand-rolled instances): the sort is
the one exchange; interior groups cost zero extra movement; only edge
groups (≤ 2 per block) re-shuffle, sharded by key hash so one
pathological group bounds one stitch task, never the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .stitch import DEFAULT_STITCH_SHARDS, sharded_stitch
from ..arrowutil import one_chunk

__all__ = ["per_group_apply"]


def per_group_apply(ds, group_col: str, order_cols, kernel,
                    out_schema: pa.Schema,
                    stitch_shards: int = DEFAULT_STITCH_SHARDS):
    """Apply ``kernel(table) -> pa.Table`` to every group's complete,
    (``order_cols``)-ordered row set, distributed.

    ``kernel`` receives a pyarrow table holding one or MORE whole
    groups, rows already sorted by (group, *order) — it must treat
    groups independently (the interior path hands it many groups at
    once; the stitch path hands it one shard's groups).  Its output
    must match ``out_schema`` exactly.  ``group_col`` must be int64.
    """
    sort_keys = [group_col, *order_cols]
    carry_cols = None  # filled by first batch: the sorted projection

    srt = ds.sort(sort_keys)

    def empty_out():
        return pa.table({f.name: pa.array([], type=f.type)
                         for f in out_schema})

    def block_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        mark = pa.field("_edge", pa.bool_())
        if n == 0:
            base = empty_out().append_column(
                mark, pa.array([], type=pa.bool_()))
            for name in t.schema.names:
                base = base.append_column(
                    f"_c_{name}", pa.array([], type=t.schema.field(
                        name).type))
            return base
        g = np.asarray(one_chunk(t[group_col])).astype(np.int64)
        change = np.nonzero(g[1:] != g[:-1])[0] + 1
        starts = np.concatenate([[0], change]).astype(np.int64)
        last = len(starts) - 1
        lo = starts[1] if last >= 1 else n
        hi = starts[last] if last >= 1 else 0
        interior = (kernel(t.slice(lo, hi - lo)) if lo < hi
                    else empty_out())
        n_i = interior.num_rows
        out = interior.append_column(
            mark, pa.array(np.zeros(n_i, bool)))
        edge_idx = np.concatenate([np.arange(0, lo),
                                   np.arange(hi, n)]) if last >= 1 \
            else np.arange(0, n)
        edge = t.take(edge_idx)
        n_b = len(edge_idx)
        for name in t.schema.names:
            out = out.append_column(
                f"_c_{name}",
                pa.nulls(n_i, t.schema.field(name).type))
        # edge rows: null kernel columns, raw columns carried, flagged
        edge_tbl = pa.table(
            {f.name: pa.nulls(n_b, f.type) for f in out_schema})
        edge_tbl = edge_tbl.append_column(
            mark, pa.array(np.ones(n_b, bool)))
        for name in t.schema.names:
            edge_tbl = edge_tbl.append_column(
                f"_c_{name}", one_chunk(edge[name]))
        return pa.concat_tables([out, edge_tbl])

    mixed = srt.map_batches(block_rows, batch_format="pyarrow",
                            batch_size=None).materialize()
    out_names = [f.name for f in out_schema]
    interior = mixed.map_batches(
        lambda t: t.filter(pc.equal(t["_edge"], False))
        .select(out_names),
        batch_format="pyarrow")

    sch = mixed.schema()
    if sch is None:          # fully-empty input: no blocks survive the sort
        import ray.data
        return ray.data.from_arrow(empty_out())
    src_names = [n for n in sch.names if n.startswith("_c_")]

    def stitch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty_out()
        raw = pa.table({n[3:]: t[n] for n in src_names})
        idx = np.lexsort(tuple(
            np.asarray(one_chunk(raw[c])) for c in
            reversed([group_col, *order_cols])))
        return kernel(raw.take(idx))

    carries = mixed.map_batches(
        lambda t: t.filter(t["_edge"]).select(src_names),
        batch_format="pyarrow")
    cross = sharded_stitch(
        carries,
        lambda t: np.asarray(one_chunk(t[f"_c_{group_col}"])),
        stitch, num_shards=stitch_shards)
    return interior.union(cross)
