"""Relational equi-joins as Ray Data stages.

The reference resolves every lookup in-process (its resume scan re-reads the
previous run's metadata per file, ``main.py``/``finders.py``); a general
engine needs the two distributed shapes explicitly:

* :func:`broadcast_hash_join` — dimension-table pattern.  The small side is
  materialized ONCE, put in the object store, and every map task joins its
  Arrow batch against it with pyarrow's C++ hash join.  The big side never
  shuffles — at 100 TB this is the only sane plan when one side fits in a
  worker's heap (``ray_guide``: broadcast small sides with ``ray.put``
  instead of a shuffle join).
* :func:`shuffle_hash_join` — fact-to-fact pattern.  Both sides are large, so
  the exchange is unavoidable; we delegate to Ray Data's native
  ``Dataset.join`` (hash-partitioned aggregator actors) rather than
  hand-rolling the same shuffle.  ``num_partitions`` bounds per-partition
  memory — size it so (|left|+|right|)/P fits an aggregator.

Both return only ``project`` columns (pruned exchange: never carry payload
columns through a join).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def broadcast_hash_join(big, small, on, right_on=None, join_type="inner",
                        project=None):
    """Join ``big`` (a Dataset) against ``small`` (a Dataset that fits in
    memory) on key columns ``on`` (left) / ``right_on`` (right, defaults to
    ``on``).  The small side is collected to one Arrow table and broadcast
    via ``ray.put``; each batch of ``big`` runs a pyarrow C++ hash join
    against it — no shuffle, no per-row Python.

    ``join_type`` is any pa.Table.join type (inner / left outer / left semi /
    left anti ...).  ``project`` optionally restricts output columns (after
    join; right key columns are dropped by pyarrow for inner joins on equal
    names, kept under their own names otherwise).

    Scale contract: |small| must fit in the object store once and in each
    map task's heap during the join (dimension tables; NOT another fact
    table — use :func:`shuffle_hash_join` for that).
    """
    import ray

    on = list(on) if not isinstance(on, str) else [on]
    right_keys = (list(right_on) if not isinstance(right_on, str)
                  else [right_on]) if right_on is not None else on

    from ..arrowutil import collect_tables
    small_tbl = collect_tables(small)
    small_ref = ray.put(small_tbl)

    def join_batch(t: pa.Table) -> pa.Table:
        # ray.get on a plasma-resident Arrow table is a zero-copy mmap after
        # the first (per-node) fetch — cheap per batch, no per-actor state
        rhs = ray.get(small_ref)
        out = t.join(rhs, keys=on, right_keys=right_keys,
                     join_type=join_type)
        if project is not None:
            out = out.select(list(project))
        return out

    return big.map_batches(join_batch, batch_format="pyarrow")


def shuffle_hash_join(left, right, on, right_on=None, join_type="inner",
                      num_partitions=32, project=None,
                      fold_empty_blocks=True):
    """Large×large equi-join via Ray Data's native hash-partitioned join.

    Thin, documented wrapper: both inputs are hash-partitioned on the key
    into ``num_partitions`` independent partitions joined by aggregator
    actors — the per-partition footprint is (|L|+|R|)/P, so P is the memory
    knob (and the output block count).  Keys with web-zipfian skew land one
    hot partition; pre-salt the key (see ``stages/skew.py``) or split the
    hot key's join into a broadcast of its right rows when one key dominates.
    """
    on = (on,) if isinstance(on, str) else tuple(on)
    right_on = ((right_on,) if isinstance(right_on, str)
                else tuple(right_on)) if right_on is not None else None
    # this Ray build's hash join crashes ("No match ... for key field
    # reference") when ANY input block is empty, even schema-typed ones
    # (verified on a minimal [empty, full] from_arrow_refs fixture); a
    # no-op re-batch folds empty blocks away without a shuffle.  The
    # re-batch is a streaming copy pass over both inputs — callers whose
    # producers PROVABLY never emit an empty block may pass
    # fold_empty_blocks=False to skip it.  A fully EMPTY side still needs
    # a producer-level sentinel row — see
    # corpus.contamination_flags_distributed.bench_grams (inner, "" vs
    # "\n" sentinels) and corpus.crawl_diff (outer, null-key sentinels).
    def _no_empty_blocks(ds):
        if not fold_empty_blocks:
            return ds
        return ds.map_batches(lambda t: t, batch_format="pyarrow",
                              batch_size=8192)

    out = _no_empty_blocks(left).join(
        _no_empty_blocks(right), join_type=join_type,
        num_partitions=num_partitions,
        on=on, right_on=right_on)
    if project is not None:
        out = out.select_columns(list(project))
    return out
