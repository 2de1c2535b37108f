"""Distinct set operations between two keyed Datasets: INTERSECT / EXCEPT.

SQL's bag-of-rows set ops reduced to the repo's combiner-first shuffle
discipline:

* each side runs a per-batch DISTINCT combiner that emits one row per
  distinct key per batch, tagged with two int64 presence flags
  ``(in_a, in_b)`` — raw rows never enter the exchange;
* the tagged streams union (block concatenation, no data movement) and a
  single ``groupby(key)`` takes ``Max`` of each flag — after which every
  distinct key is ONE row carrying exact both-sides membership;
* a final vectorized filter keeps ``a∧b`` (INTERSECT) or ``a∧¬b``
  (EXCEPT).

One shuffle total, volume bounded by distinct-keys-per-batch.  Both ops
are DISTINCT semantics (SQL ``INTERSECT`` / ``EXCEPT`` without ``ALL``),
and keys must be non-null (Ray's sort shuffle cannot partition nulls —
route nullable keys through a sentinel first, see
``pipelines/identify.method_stats``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _tag_side(ds, col: str, flags: tuple[int, int]):
    a_flag, b_flag = flags

    def partial(t: pa.Table) -> pa.Table:
        vals = pc.unique(t[col].combine_chunks()
                         if isinstance(t[col], pa.ChunkedArray) else t[col])
        if vals.null_count:
            raise ValueError(
                f"set-op key column {col!r} contains nulls; map them to a "
                "sentinel before the set operation")
        n = len(vals)
        return pa.table({
            col: vals,
            "in_a": pa.array(np.full(n, a_flag, dtype=np.int64)),
            "in_b": pa.array(np.full(n, b_flag, dtype=np.int64)),
        })

    return ds.map_batches(partial, batch_format="pyarrow")


def _membership(ds_a, ds_b, col: str):
    from ray.data.aggregate import Max

    tagged = _tag_side(ds_a, col, (1, 0)).union(
        _tag_side(ds_b, col, (0, 1)))
    return (tagged.groupby(col)
            .aggregate(Max("in_a", alias_name="a"),
                       Max("in_b", alias_name="b")))


def _filtered(members, col: str, keep_b: bool):
    def pick(t: pa.Table) -> pa.Table:
        a = pc.equal(t["a"], 1)
        b = pc.equal(t["b"], 1)
        mask = pc.and_(a, b) if keep_b else pc.and_(a, pc.invert(b))
        return pa.table({col: t[col].filter(mask)})

    return members.map_batches(pick, batch_format="pyarrow")


def distinct_intersect(ds_a, ds_b, col: str):
    """Distinct keys present in BOTH datasets (SQL ``INTERSECT``)."""
    return _filtered(_membership(ds_a, ds_b, col), col, keep_b=True)


def distinct_except(ds_a, ds_b, col: str):
    """Distinct keys present in ``ds_a`` but NOT ``ds_b`` (SQL
    ``EXCEPT``)."""
    return _filtered(_membership(ds_a, ds_b, col), col, keep_b=False)


def union_by_name(ds_a, ds_b):
    """Schema-evolution union: concatenate two Datasets whose schemas
    share names but not shape (a crawl snapshot that gained columns, a
    source that dropped one) — missing columns null-fill, like SQL's
    ``UNION ALL BY NAME``.  Columns order canonically (sorted by name)
    so downstream schema checks are deterministic; same-name columns
    must agree on type (a silent cast would corrupt data — refuse
    instead).

    Pure streaming: one schema peek per side, then a per-batch
    null-padding map and Ray's zero-movement block-concatenation union.
    """
    sa, sb = ds_a.schema(), ds_b.schema()
    types: dict = {}
    for sch in (sa, sb):
        for name, typ in zip(sch.names, sch.types):
            if name in types and types[name] != typ:
                raise ValueError(
                    f"union_by_name: column {name!r} has conflicting "
                    f"types {types[name]} vs {typ}")
            types[name] = typ
    names = sorted(types)

    def pad(t: pa.Table) -> pa.Table:
        cols = {}
        for name in names:
            if name in t.column_names:
                cols[name] = t[name]
            else:
                cols[name] = pa.nulls(t.num_rows, type=types[name])
        return pa.table(cols)

    return (ds_a.map_batches(pad, batch_format="pyarrow")
            .union(ds_b.map_batches(pad, batch_format="pyarrow")))
