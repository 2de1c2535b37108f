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


def _clamp_join_partitions(requested: int) -> int:
    """Clamp a hash-join's partition count so its aggregator pool can
    never reserve more than ~a quarter of the cluster's CPUs.

    Ray's hash join reserves ``0.125 CPU × num_partitions`` of
    aggregator-ACTOR cpu for the whole shuffle: partitions are packed
    onto ``min(P, max_hash_shuffle_aggregators)`` actors, but each
    actor requests ``0.125 × its partition share``, so the pool's SUM
    is always P/8 CPUs no matter how few actors run.  Capping the
    actor COUNT therefore cannot help (measured on this build: P=32
    with an 8-actor cap → 8 actors × 0.5 CPU = 4.0 CPUs — the entire
    4-CPU test cluster — with upstream map tasks stuck forever at
    ``num_waiting_for_remote_node_resources``).  Clamping P ≤ 2×CPUs
    bounds the reservation at CPUs/4 and is a no-op on any cluster
    with ≥ P/2 cores, so production-scale joins keep their requested
    partitioning.
    """
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 0))
    except Exception:  # noqa: BLE001 — not initialised yet
        return requested
    if not cpus:
        return requested
    return max(2, min(requested, 2 * cpus))


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
    num_partitions = _clamp_join_partitions(num_partitions)
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


def local_supplier_revenue(region, nation, customer, supplier, orders,
                           lineitem, region_name="ASIA",
                           start_us=None, end_us=None, num_partitions=8):
    """TPC-H-Q5-style local-supplier revenue: per-nation revenue of one
    region's customers over a date window, counting only line items whose
    SUPPLIER sits in the customer's own nation — the canonical 6-table
    star join (two dimension chains into one fact exchange).

    Plan (dimension sides NEVER shuffle — the only sane shape at 100 TB):

    1. region(filtered) ⟶ nation ⟶ customer: two broadcast hash joins
       collapse the region/nation chain into a (c_custkey, c_nationkey,
       n_name) dimension of the region's customers;
    2. orders date-filtered at the read, broadcast-joined against that
       dimension → (o_orderkey, c_nationkey, n_name);
    3. lineitem reduced per row to ``rev = floor(l_extendedprice ·
       (1−l_discount) · 1000)`` (int64-exact, bit-identical to the SQL
       oracle, same kernel as :func:`shipping_priority`), broadcast-joined
       against the (s_suppkey, s_nationkey) supplier dimension;
    4. ONE shuffle hash join on the orderkey — the only exchange, carrying
       4 narrow columns — then the c==s nationkey filter IN the map stage
       and a ≤|nations|-row groupby Sum.

    Returns pandas (n_name, revenue_milli) sorted revenue desc, name asc.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    start = pa.scalar(start_us, type=pa.timestamp("us"))
    end = pa.scalar(end_us, type=pa.timestamp("us"))

    def filter_region(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.equal(t["r_name"], region_name)) \
                .select(["r_regionkey"])

    nations = broadcast_hash_join(
        nation, region.map_batches(filter_region, batch_format="pyarrow"),
        on=["n_regionkey"], right_on=["r_regionkey"], join_type="left semi",
        project=["n_nationkey", "n_name"])

    cust = broadcast_hash_join(
        customer.select_columns(["c_custkey", "c_nationkey"]), nations,
        on=["c_nationkey"], right_on=["n_nationkey"],
        project=["c_custkey", "c_nationkey", "n_name"])

    def filter_orders(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.and_(pc.greater_equal(t["o_orderdate"], start),
                       pc.less(t["o_orderdate"], end))
        return t.filter(keep).select(["o_orderkey", "o_custkey"])

    orders_dim = broadcast_hash_join(
        orders.map_batches(filter_orders, batch_format="pyarrow"), cust,
        on=["o_custkey"], right_on=["c_custkey"],
        project=["o_orderkey", "c_nationkey", "n_name"])

    def reduce_lineitem(t: pa.Table) -> pa.Table:
        price = np.asarray(t["l_extendedprice"].combine_chunks()
                           if isinstance(t["l_extendedprice"],
                                         pa.ChunkedArray)
                           else t["l_extendedprice"], dtype=np.float64)
        disc = np.asarray(t["l_discount"].combine_chunks()
                          if isinstance(t["l_discount"], pa.ChunkedArray)
                          else t["l_discount"], dtype=np.float64)
        rev = np.floor((price * (1.0 - disc)) * 1000.0).astype(np.int64)
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_suppkey": t["l_suppkey"],
                         "rev": pa.array(rev)})

    li = broadcast_hash_join(
        lineitem.map_batches(reduce_lineitem, batch_format="pyarrow"),
        supplier.select_columns(["s_suppkey", "s_nationkey"]),
        on=["l_suppkey"], right_on=["s_suppkey"],
        project=["l_orderkey", "rev", "s_nationkey"])

    # sentinel rows (keys -1 vs -2, real keys are ≥0) keep BOTH sides of
    # the fact join non-empty — this Ray build's hash join crashes on a
    # fully empty side (e.g. an empty date window) and never invokes a
    # map UDF on an empty block, so per-batch padding can't cover it;
    # the inner join drops both sentinels.  Same pattern as
    # corpus.contamination_flags_distributed.
    import ray.data as rd
    li_sentinel = rd.from_arrow(pa.table({
        "l_orderkey": pa.array([-1], type=pa.int64()),
        "rev": pa.array([0], type=pa.int64()),
        "s_nationkey": pa.array([-1], type=pa.int32())}))
    dim_sentinel = rd.from_arrow(pa.table({
        "o_orderkey": pa.array([-2], type=pa.int64()),
        "c_nationkey": pa.array([-1], type=pa.int32()),
        "n_name": pa.array([""], type=pa.string())}))

    joined = shuffle_hash_join(
        li.union(li_sentinel), orders_dim.union(dim_sentinel),
        on="l_orderkey", right_on="o_orderkey",
        num_partitions=num_partitions,
        project=["rev", "s_nationkey", "c_nationkey", "n_name"])

    def local_only(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = t.filter(pc.equal(t["s_nationkey"], t["c_nationkey"]))
        return t.select(["n_name", "rev"])

    grouped = joined.map_batches(local_only, batch_format="pyarrow") \
        .groupby("n_name").aggregate(Sum("rev", alias_name="revenue_milli"))

    out = grouped.to_pandas()          # ≤ |nations| rows by construction
    if "n_name" not in out.columns:    # fully-empty input
        out = pd.DataFrame({"n_name": pd.Series(dtype="object"),
                            "revenue_milli": pd.Series(dtype="int64")})
    out = out.sort_values(["revenue_milli", "n_name"],
                          ascending=[False, True]).reset_index(drop=True)
    return pd.DataFrame({
        "n_name": out["n_name"].to_numpy(),
        "revenue_milli": out["revenue_milli"].to_numpy().astype(np.int64),
    })


def revenue_by_part_type(part, lineitem, start_us=None, end_us=None):
    """TPC-H-Q14-flavored part-type revenue mix: per part TYPE, the exact
    milli-integer revenue and item count of one ship-date window — the
    promo-share building block (share = type_rev / Σ rev, computed by the
    consumer from the exact numerators; no float division inside).

    Shape: the part table is a DIMENSION — broadcast once, joined into
    each date-filtered lineitem batch with pyarrow's C++ hash join — and
    the per-batch partial collapses each batch to ≤ |types| rows BEFORE
    the groupby, so the only exchange carries combiner output (≤ types ×
    blocks tiny rows).  Same int64 ``floor(price·(1−disc)·1000)`` revenue
    kernel as :func:`shipping_priority`, bit-identical to the SQL oracle.

    Returns pandas (p_type, revenue_milli, n_items) sorted revenue desc,
    type asc.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    start = pa.scalar(start_us, type=pa.timestamp("us"))
    end = pa.scalar(end_us, type=pa.timestamp("us"))

    def reduce_lineitem(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.and_(pc.greater_equal(t["l_shipdate"], start),
                       pc.less(t["l_shipdate"], end))
        t = t.filter(keep)
        price = np.asarray(t["l_extendedprice"].combine_chunks()
                           if isinstance(t["l_extendedprice"],
                                         pa.ChunkedArray)
                           else t["l_extendedprice"], dtype=np.float64)
        disc = np.asarray(t["l_discount"].combine_chunks()
                          if isinstance(t["l_discount"], pa.ChunkedArray)
                          else t["l_discount"], dtype=np.float64)
        rev = np.floor((price * (1.0 - disc)) * 1000.0).astype(np.int64)
        return pa.table({"l_partkey": t["l_partkey"],
                         "rev": pa.array(rev)})

    joined = broadcast_hash_join(
        lineitem.map_batches(reduce_lineitem, batch_format="pyarrow"),
        part.select_columns(["p_partkey", "p_type"]),
        on=["l_partkey"], right_on=["p_partkey"],
        project=["p_type", "rev"])

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        types = t["p_type"].combine_chunks() \
            if isinstance(t["p_type"], pa.ChunkedArray) else t["p_type"]
        codes = pc.dictionary_encode(types)
        idx = np.asarray(codes.indices, dtype=np.int64)
        k = len(codes.dictionary)
        rev = np.asarray(t["rev"].combine_chunks()
                         if isinstance(t["rev"], pa.ChunkedArray)
                         else t["rev"], dtype=np.int64)
        sums = np.zeros(k, dtype=np.int64)
        cnts = np.zeros(k, dtype=np.int64)
        if len(idx):
            np.add.at(sums, idx, rev)
            np.add.at(cnts, idx, 1)
        return pa.table({"p_type": codes.dictionary,
                         "rev": pa.array(sums),
                         "n": pa.array(cnts)})

    grouped = (joined.map_batches(partial, batch_format="pyarrow")
               .groupby("p_type")
               .aggregate(Sum("rev", alias_name="revenue_milli"),
                          Sum("n", alias_name="n_items")))

    out = grouped.to_pandas()          # ≤ |types| rows by construction
    if "p_type" not in out.columns:
        out = pd.DataFrame({"p_type": pd.Series(dtype="object"),
                            "revenue_milli": pd.Series(dtype="int64"),
                            "n_items": pd.Series(dtype="int64")})
    out = out.sort_values(["revenue_milli", "p_type"],
                          ascending=[False, True]).reset_index(drop=True)
    return pd.DataFrame({
        "p_type": out["p_type"].to_numpy(),
        "revenue_milli": out["revenue_milli"].to_numpy().astype(np.int64),
        "n_items": out["n_items"].to_numpy().astype(np.int64),
    })


def shipping_priority(customer, orders, lineitem, segment="BUILDING",
                      cutoff_us=None, k=10, num_partitions=8):
    """TPC-H-Q3-style shipping priority: the ``k`` highest-revenue orders
    of one market segment where the order predates the cutoff but at
    least one line item shipped after it (open revenue in flight) — the
    canonical selective 3-table join + aggregate + global top-k.

    Plan (all filters BEFORE any exchange, all payloads pruned at the
    read by the caller):

    1. customer filtered to the segment → key-only Dataset, broadcast
       left-SEMI join into the date-filtered orders (dimension side never
       shuffles);
    2. lineitem date-filtered and reduced per row to
       ``revenue_milli = floor(l_extendedprice·(1−l_discount)·1000)`` —
       two IEEE doubles ops + floor, bit-identical in numpy and the SQL
       oracle, so the int64 Sum is exact and hash-stable;
    3. ONE shuffle hash join on the orderkey, groupby Sum, then a
       bounded global top-k: each batch forwards its ≤k best rows
       (revenue desc, orderkey asc) and the driver merges tiny partials —
       at any corpus size the driver sees ≤ k × blocks rows.

    Returns pandas (rank, o_orderkey, revenue_milli, o_date_days,
    o_orderpriority).
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    cutoff = pa.scalar(cutoff_us, type=pa.timestamp("us"))

    def filter_cust(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.equal(t["c_mktsegment"], segment)) \
                .select(["c_custkey"])

    def filter_orders(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = t.filter(pc.less(t["o_orderdate"], cutoff))
        days = pc.divide(t["o_orderdate"].cast(pa.int64()),
                         86_400_000_000)
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_custkey": t["o_custkey"],
            "o_date_days": days,
            "o_orderpriority": t["o_orderpriority"],
        })

    def reduce_lineitem(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = t.filter(pc.greater(t["l_shipdate"], cutoff))
        price = np.asarray(t["l_extendedprice"].combine_chunks()
                           if isinstance(t["l_extendedprice"],
                                         pa.ChunkedArray)
                           else t["l_extendedprice"], dtype=np.float64)
        disc = np.asarray(t["l_discount"].combine_chunks()
                          if isinstance(t["l_discount"], pa.ChunkedArray)
                          else t["l_discount"], dtype=np.float64)
        rev = np.floor((price * (1.0 - disc)) * 1000.0).astype(np.int64)
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "rev": pa.array(rev)})

    open_orders = broadcast_hash_join(
        orders.map_batches(filter_orders, batch_format="pyarrow"),
        customer.map_batches(filter_cust, batch_format="pyarrow"),
        on=["o_custkey"], right_on=["c_custkey"], join_type="left semi",
        project=["o_orderkey", "o_date_days", "o_orderpriority"])

    # empty-side guard (cutoff outside the data range empties either
    # side): never-matching sentinels, dropped by the inner join
    import ray.data as _rd
    joined = shuffle_hash_join(
        lineitem.map_batches(reduce_lineitem, batch_format="pyarrow")
        .union(_sentinel_rows({"l_orderkey": (-1, pa.int64()),
                               "rev": (0, pa.int64())})),
        open_orders.union(_rd.from_arrow(pa.table({
            "o_orderkey": pa.array([-2], type=pa.int64()),
            "o_date_days": pa.array([0], type=pa.int64()),
            "o_orderpriority": pa.array([""], type=pa.string())}))),
        on="l_orderkey", right_on="o_orderkey",
        num_partitions=num_partitions,
        project=["l_orderkey", "rev", "o_date_days", "o_orderpriority"])

    grouped = joined.groupby(
        ["l_orderkey", "o_date_days", "o_orderpriority"]) \
        .aggregate(Sum("rev", alias_name="revenue_milli"))

    def block_topk(t: pa.Table) -> pa.Table:
        rev = np.asarray(t["revenue_milli"].combine_chunks()
                         if isinstance(t["revenue_milli"], pa.ChunkedArray)
                         else t["revenue_milli"]).astype(np.int64)
        keys = np.asarray(t["l_orderkey"].combine_chunks()
                          if isinstance(t["l_orderkey"], pa.ChunkedArray)
                          else t["l_orderkey"]).astype(np.int64)
        order = np.lexsort((keys, -rev))[:k]
        return t.take(pa.array(order, type=pa.int64()))

    parts = grouped.map_batches(block_topk,
                                batch_format="pyarrow").to_pandas()
    if "l_orderkey" not in parts.columns:      # fully-empty input
        parts = pd.DataFrame({
            "l_orderkey": pd.Series(dtype="int64"),
            "o_date_days": pd.Series(dtype="int64"),
            "o_orderpriority": pd.Series(dtype="object"),
            "revenue_milli": pd.Series(dtype="int64"),
        })
    parts = parts.sort_values(
        ["revenue_milli", "l_orderkey"],
        ascending=[False, True]).head(k)
    return pd.DataFrame({
        "rank": np.arange(1, len(parts) + 1, dtype=np.int64),
        "o_orderkey": parts["l_orderkey"].to_numpy(),
        "revenue_milli": parts["revenue_milli"].to_numpy(),
        "o_date_days": parts["o_date_days"].to_numpy(),
        "o_orderpriority": parts["o_orderpriority"].to_numpy(),
    })


def _i64(col) -> np.ndarray:
    c = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return np.asarray(c, dtype=np.int64)


def _f64(col) -> np.ndarray:
    c = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return np.asarray(c, dtype=np.float64)


def _sentinel_rows(schema: dict):
    """One-row never-matching Dataset that keeps a hash-join side
    non-empty (this Ray build's join crashes on a fully-empty,
    schema-less side — see :func:`shuffle_hash_join`).  ``schema`` maps
    column name → (value, pyarrow type); callers pick key values outside
    the real domain (all TPC-H keys are non-negative, so -1 on one side
    vs -2 on the other can never meet) and, for anti joins — where an
    unmatched LEFT sentinel passes through — filter it back out after.
    """
    import ray.data
    return ray.data.from_arrow(pa.table({
        name: pa.array([val], type=typ)
        for name, (val, typ) in schema.items()}))


def order_priority_semi(orders, lineitem, start_us=None, end_us=None,
                        flag: str = "R", num_partitions: int = 8):
    """TPC-H-Q4-style EXISTS semi-join: per order priority, how many
    orders of one date window have at least one line item carrying the
    given return flag.  This is the big-build-side semi-join shape the
    dimension-broadcast joins can't cover: BOTH inputs are fact tables,
    so the probe keys come from the fact scan itself.

    Plan: lineitem is filtered to the flag and collapsed per batch to its
    UNIQUE order keys (np.unique — one narrow int64 column crosses the
    exchange); orders is window-filtered and key/priority-projected; ONE
    native hash-partitioned ``left_semi`` join matches them (duplicate
    probe keys across batches are harmless — semi joins never multiply
    rows); the survivors collapse per batch to ≤5 (priority, n) partials
    before a tiny groupby.  Returns pandas (o_orderpriority, n_orders)
    sorted by priority.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    start = pa.scalar(start_us, type=pa.timestamp("us"))
    end = pa.scalar(end_us, type=pa.timestamp("us"))

    def flagged_keys(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keys = np.unique(_i64(
            t.filter(pc.equal(t["l_returnflag"], flag))["l_orderkey"]))
        return pa.table({"l_orderkey": pa.array(keys, type=pa.int64())})

    def window_orders(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.and_(pc.greater_equal(t["o_orderdate"], start),
                       pc.less(t["o_orderdate"], end))
        return t.filter(keep).select(["o_orderkey", "o_orderpriority"])

    # sentinels: an out-of-range window empties the orders side and a flag
    # absent from lineitem empties the probe side — either crashes the
    # join without them; -1 never matches -2, and the left sentinel is
    # dropped by left_semi itself (it matches nothing)
    left = orders.map_batches(window_orders, batch_format="pyarrow") \
        .union(_sentinel_rows({"o_orderkey": (-1, pa.int64()),
                               "o_orderpriority": ("", pa.string())}))
    right = lineitem.map_batches(flagged_keys, batch_format="pyarrow") \
        .union(_sentinel_rows({"l_orderkey": (-2, pa.int64())}))
    matched = shuffle_hash_join(
        left, right, on="o_orderkey", right_on="l_orderkey",
        join_type="left_semi", num_partitions=num_partitions)

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        codes = pc.dictionary_encode(
            t["o_orderpriority"].combine_chunks()
            if isinstance(t["o_orderpriority"], pa.ChunkedArray)
            else t["o_orderpriority"])
        cnt = np.zeros(len(codes.dictionary), dtype=np.int64)
        if t.num_rows:
            np.add.at(cnt, np.asarray(codes.indices, dtype=np.int64), 1)
        return pa.table({"o_orderpriority": codes.dictionary,
                         "n": pa.array(cnt)})

    out = (matched.map_batches(partial, batch_format="pyarrow")
           .groupby("o_orderpriority")
           .aggregate(Sum("n", alias_name="n_orders"))).to_pandas()
    if "o_orderpriority" not in out.columns:
        out = pd.DataFrame({"o_orderpriority": pd.Series(dtype="object"),
                            "n_orders": pd.Series(dtype="int64")})
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def order_count_distribution(customer, orders):
    """TPC-H-Q13-style two-level aggregation: the distribution of
    orders-per-customer, INCLUDING the zero bucket (customers with no
    orders — the left-outer part of Q13, recovered arithmetically).

    Plan: orders collapses per batch to (custkey, n) partials, one
    groupby Sum gives per-customer counts; the counts collapse per batch
    to (c_count, custdist) partials and a second tiny groupby gives the
    histogram.  The zero bucket never shuffles: it is
    ``count(customer) − Σ custdist`` — two scalar aggregates — which is
    exact because every order's custkey references an existing customer
    (enforced by the synthesizer; same referential assumption Q13's
    LEFT JOIN encodes).  Returns pandas (c_count, custdist) sorted
    custdist desc, c_count desc.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    def per_cust_partial(t: pa.Table) -> pa.Table:
        keys, cnt = np.unique(_i64(t["o_custkey"]), return_counts=True)
        return pa.table({"o_custkey": pa.array(keys, type=pa.int64()),
                         "n": pa.array(cnt.astype(np.int64))})

    counts = (orders.map_batches(per_cust_partial, batch_format="pyarrow")
              .groupby("o_custkey").aggregate(Sum("n", alias_name="c_count")))

    def hist_partial(t: pa.Table) -> pa.Table:
        vals, cnt = np.unique(_i64(t["c_count"]), return_counts=True)
        return pa.table({"c_count": pa.array(vals, type=pa.int64()),
                         "custdist": pa.array(cnt.astype(np.int64))})

    hist = (counts.map_batches(hist_partial, batch_format="pyarrow")
            .groupby("c_count")
            .aggregate(Sum("custdist", alias_name="custdist"))).to_pandas()
    if "c_count" not in hist.columns:
        hist = pd.DataFrame({"c_count": pd.Series(dtype="int64"),
                             "custdist": pd.Series(dtype="int64")})
    n_zero = customer.count() - int(hist["custdist"].sum())
    if n_zero > 0:
        hist = pd.concat([hist, pd.DataFrame(
            {"c_count": [0], "custdist": [n_zero]})], ignore_index=True)
    return hist.sort_values(["custdist", "c_count"],
                            ascending=[False, False]).reset_index(drop=True)


def large_volume_orders(customer, orders, lineitem, qty_threshold: int,
                        k: int = 100):
    """TPC-H-Q18-style GROUP BY + HAVING + join-back: the ``k``
    biggest-ticket orders whose total line-item quantity exceeds the
    threshold, with the buyer's name attached.

    Plan: lineitem collapses per batch to (orderkey, qty) int64 partials
    (quantities are integral by data contract; asserted), one groupby Sum
    + HAVING filter leaves a survivor set that is TINY by construction
    (the threshold is the selectivity knob — Q18's classic yields
    a handful of rows per million orders), so the join-back inverts:
    survivors broadcast into the orders scan, then the customer name
    lookup is a second broadcast join keyed the other way (survivor side
    stays the broadcast side both times; the fact tables never shuffle).
    Returns pandas (c_name, o_custkey, o_orderkey, o_date_days,
    totalprice_milli, total_qty) sorted totalprice desc, orderkey asc,
    top ``k``.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    def qty_partial(t: pa.Table) -> pa.Table:
        q = np.asarray(t["l_quantity"].combine_chunks()
                       if isinstance(t["l_quantity"], pa.ChunkedArray)
                       else t["l_quantity"], dtype=np.float64)
        qi = q.astype(np.int64)
        if not np.array_equal(qi, q):
            raise ValueError("large_volume_orders: non-integral quantity")
        keys = _i64(t["l_orderkey"])
        uk, inv = np.unique(keys, return_inverse=True)
        sums = np.zeros(len(uk), dtype=np.int64)
        np.add.at(sums, inv, qi)
        return pa.table({"l_orderkey": pa.array(uk, type=pa.int64()),
                         "qty": pa.array(sums)})

    def having(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.greater(t["total_qty"],
                                   pa.scalar(qty_threshold, pa.int64())))

    survivors = (lineitem.map_batches(qty_partial, batch_format="pyarrow")
                 .groupby("l_orderkey")
                 .aggregate(Sum("qty", alias_name="total_qty"))
                 .map_batches(having, batch_format="pyarrow"))

    def order_cols(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        days = pc.divide(t["o_orderdate"].cast(pa.int64()), 86_400_000_000)
        price = np.asarray(t["o_totalprice"].combine_chunks()
                           if isinstance(t["o_totalprice"], pa.ChunkedArray)
                           else t["o_totalprice"], dtype=np.float64)
        milli = np.floor(price * 1000.0).astype(np.int64)
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"],
                         "o_date_days": days,
                         "totalprice_milli": pa.array(milli)})

    hit_orders = broadcast_hash_join(
        orders.map_batches(order_cols, batch_format="pyarrow"),
        survivors, on=["o_orderkey"], right_on=["l_orderkey"],
        join_type="inner")

    named = broadcast_hash_join(
        customer.select_columns(["c_custkey", "c_name"]),
        hit_orders, on=["c_custkey"], right_on=["o_custkey"],
        join_type="inner",
        project=["c_name", "c_custkey", "o_orderkey", "o_date_days",
                 "totalprice_milli", "total_qty"])

    out = named.to_pandas()            # ≤ |survivors| rows by construction
    if "c_name" not in out.columns:
        out = pd.DataFrame({c: pd.Series(dtype=d) for c, d in [
            ("c_name", "object"), ("c_custkey", "int64"),
            ("o_orderkey", "int64"), ("o_date_days", "int64"),
            ("totalprice_milli", "int64"), ("total_qty", "int64")]})
    return out.sort_values(["totalprice_milli", "o_orderkey"],
                           ascending=[False, True]).head(k) \
              .reset_index(drop=True)


def returnflag_priority_counts(orders, lineitem, start_us=None, end_us=None,
                               num_partitions: int = 8):
    """TPC-H-Q12-style conditional aggregation over a fact-fact join:
    per return flag, how many window-shipped line items belong to
    high-priority orders (1-URGENT / 2-HIGH) vs everything else.

    Plan: orders reduces per batch to (orderkey, is_high) — the CASE
    collapses the priority string to one bit BEFORE the exchange — and
    lineitem to (orderkey, returnflag); one shuffle hash join, then a
    ≤|flags|-row per-batch combiner carrying both conditional counts and
    a tiny groupby.  Returns pandas (l_returnflag, high_line_count,
    low_line_count) sorted by flag.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    start = pa.scalar(start_us, type=pa.timestamp("us"))
    end = pa.scalar(end_us, type=pa.timestamp("us"))

    def order_bit(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        hi = pc.or_(pc.equal(t["o_orderpriority"], "1-URGENT"),
                    pc.equal(t["o_orderpriority"], "2-HIGH"))
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "is_high": hi.combine_chunks()
                         if isinstance(hi, pa.ChunkedArray) else hi})

    def li_window(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.and_(pc.greater_equal(t["l_shipdate"], start),
                       pc.less(t["l_shipdate"], end))
        return t.filter(keep).select(["l_orderkey", "l_returnflag"])

    # empty-window guard: -1 vs -2 sentinels never match, inner join
    # drops them (see _sentinel_rows)
    joined = shuffle_hash_join(
        lineitem.map_batches(li_window, batch_format="pyarrow")
        .union(_sentinel_rows({"l_orderkey": (-1, pa.int64()),
                               "l_returnflag": ("", pa.string())})),
        orders.map_batches(order_bit, batch_format="pyarrow")
        .union(_sentinel_rows({"o_orderkey": (-2, pa.int64()),
                               "is_high": (False, pa.bool_())})),
        on="l_orderkey", right_on="o_orderkey",
        num_partitions=num_partitions,
        project=["l_returnflag", "is_high"])

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        codes = pc.dictionary_encode(
            t["l_returnflag"].combine_chunks()
            if isinstance(t["l_returnflag"], pa.ChunkedArray)
            else t["l_returnflag"])
        idx = np.asarray(codes.indices, dtype=np.int64)
        hi = np.asarray(t["is_high"].combine_chunks()
                        if isinstance(t["is_high"], pa.ChunkedArray)
                        else t["is_high"], dtype=np.bool_)
        kk = len(codes.dictionary)
        h = np.zeros(kk, dtype=np.int64)
        lo = np.zeros(kk, dtype=np.int64)
        if len(idx):
            np.add.at(h, idx[hi], 1)
            np.add.at(lo, idx[~hi], 1)
        return pa.table({"l_returnflag": codes.dictionary,
                         "h": pa.array(h), "l": pa.array(lo)})

    out = (joined.map_batches(partial, batch_format="pyarrow")
           .groupby("l_returnflag")
           .aggregate(Sum("h", alias_name="high_line_count"),
                      Sum("l", alias_name="low_line_count"))).to_pandas()
    if "l_returnflag" not in out.columns:
        out = pd.DataFrame({"l_returnflag": pd.Series(dtype="object"),
                            "high_line_count": pd.Series(dtype="int64"),
                            "low_line_count": pd.Series(dtype="int64")})
    return out.sort_values("l_returnflag").reset_index(drop=True)


def idle_rich_customers(customer, orders, since_us=None,
                        num_partitions: int = 8):
    """TPC-H-Q22-style anti-join gated by a global scalar: per nation,
    the count and total balance of customers who (a) hold an
    above-average account balance — average over positive balances,
    computed exactly in integer cents and compared as a cross-multiplied
    rational so no float division enters the hash — and (b) have placed
    no order since ``since_us`` (the anti-join; ``None`` = never ordered
    at all, the literal Q22 predicate — this synthesizer gives every
    customer at least one order, so callers pass a recency cutoff).

    Plan: pass 1 is two scalar combiner sums over the customer scan
    (n_pos, sum_cents) — broadcast back as plain Python ints; pass 2
    filters customers by ``cents·n_pos > sum_cents``, anti-joins against
    per-batch-unique order custkeys with the native hash-partitioned
    ``left_anti`` join, and collapses to ≤|nations| partials before the
    tiny groupby.  Returns pandas (c_nationkey, n_cust, total_acctbal_c)
    sorted by nation.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    def cents(t: pa.Table):
        bal = np.asarray(t["c_acctbal"].combine_chunks()
                         if isinstance(t["c_acctbal"], pa.ChunkedArray)
                         else t["c_acctbal"], dtype=np.float64)
        return np.floor(bal * 100.0).astype(np.int64)

    def pos_partial(t: pa.Table) -> pa.Table:
        c = cents(t)
        c = c[c > 0]
        return pa.table({"n": pa.array([len(c)], type=pa.int64()),
                         "s": pa.array([int(c.sum())], type=pa.int64())})

    stats = (customer.map_batches(pos_partial, batch_format="pyarrow")
             .sum(["n", "s"]))
    n_pos, sum_cents = int(stats["sum(n)"]), int(stats["sum(s)"])

    def rich(t: pa.Table) -> pa.Table:
        c = cents(t)
        keep = c * n_pos > sum_cents
        t = t.filter(pa.array(keep))
        return pa.table({
            "c_custkey": t["c_custkey"],
            "c_nationkey": t["c_nationkey"].cast(pa.int64()),
            "acctbal_c": pa.array(c[keep], type=pa.int64())})

    since = pa.scalar(since_us, type=pa.timestamp("us"))

    def okeys(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if since_us is not None:
            t = t.filter(pc.greater_equal(t["o_orderdate"], since))
        keys = np.unique(_i64(t["o_custkey"]))
        return pa.table({"o_custkey": pa.array(keys, type=pa.int64())})

    # empty-side guards: no rich customers (all balances equal) or no
    # orders past the cutoff each empty a side and crash the join.  The
    # LEFT sentinel survives a left_anti join by construction (it matches
    # nothing), so it is filtered back out immediately after.
    idle = shuffle_hash_join(
        customer.map_batches(rich, batch_format="pyarrow")
        .union(_sentinel_rows({"c_custkey": (-1, pa.int64()),
                               "c_nationkey": (-1, pa.int64()),
                               "acctbal_c": (0, pa.int64())})),
        orders.map_batches(okeys, batch_format="pyarrow")
        .union(_sentinel_rows({"o_custkey": (-2, pa.int64())})),
        on="c_custkey", right_on="o_custkey", join_type="left_anti",
        num_partitions=num_partitions)

    def drop_sentinel(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.greater_equal(t["c_custkey"],
                                         pa.scalar(0, pa.int64())))

    idle = idle.map_batches(drop_sentinel, batch_format="pyarrow")

    def partial(t: pa.Table) -> pa.Table:
        nk = _i64(t["c_nationkey"])
        bal = _i64(t["acctbal_c"])
        uk, inv = np.unique(nk, return_inverse=True)
        n = np.zeros(len(uk), dtype=np.int64)
        s = np.zeros(len(uk), dtype=np.int64)
        np.add.at(n, inv, 1)
        np.add.at(s, inv, bal)
        return pa.table({"c_nationkey": pa.array(uk, type=pa.int64()),
                         "n": pa.array(n), "s": pa.array(s)})

    out = (idle.map_batches(partial, batch_format="pyarrow")
           .groupby("c_nationkey")
           .aggregate(Sum("n", alias_name="n_cust"),
                      Sum("s", alias_name="total_acctbal_c"))).to_pandas()
    if "c_nationkey" not in out.columns:
        out = pd.DataFrame({"c_nationkey": pd.Series(dtype="int64"),
                            "n_cust": pd.Series(dtype="int64"),
                            "total_acctbal_c": pd.Series(dtype="int64")})
    return out.sort_values("c_nationkey").reset_index(drop=True)


def returned_item_customers(customer, nation, orders, lineitem,
                            start_us=None, end_us=None, k: int = 20,
                            num_partitions: int = 8):
    """TPC-H-Q10-style returned-item ranking: the ``k`` customers who
    lost the most revenue to returns ('R' line items) against orders of
    one quarter, with name and nation attached.

    Plan: orders window-reduces to (orderkey, custkey) and lineitem to
    (orderkey, rev_milli) rows filtered to the flag; ONE shuffle join on
    the orderkey; per-batch custkey combiner + groupby Sum; then the
    bounded top-k trick (each batch forwards its ≤k best) makes the
    survivor set ≤k rows, which flips the name lookup into a broadcast
    of the SURVIVORS into the customer scan and a driver-side nation
    map — the customer fact table never shuffles.  Returns pandas
    (c_custkey, c_name, n_name, acctbal_c, revenue_milli) sorted
    revenue desc, custkey asc.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    start = pa.scalar(start_us, type=pa.timestamp("us"))
    end = pa.scalar(end_us, type=pa.timestamp("us"))

    def window_orders(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.and_(pc.greater_equal(t["o_orderdate"], start),
                       pc.less(t["o_orderdate"], end))
        return t.filter(keep).select(["o_orderkey", "o_custkey"])

    def returned_rev(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        price = np.asarray(t["l_extendedprice"].combine_chunks()
                           if isinstance(t["l_extendedprice"],
                                         pa.ChunkedArray)
                           else t["l_extendedprice"], dtype=np.float64)
        disc = np.asarray(t["l_discount"].combine_chunks()
                          if isinstance(t["l_discount"], pa.ChunkedArray)
                          else t["l_discount"], dtype=np.float64)
        rev = np.floor(price * (1.0 - disc) * 1000.0).astype(np.int64)
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "rev": pa.array(rev)})

    # empty-window / no-returns guard: never-matching sentinels, dropped
    # by the inner join (see _sentinel_rows)
    joined = shuffle_hash_join(
        lineitem.map_batches(returned_rev, batch_format="pyarrow")
        .union(_sentinel_rows({"l_orderkey": (-1, pa.int64()),
                               "rev": (0, pa.int64())})),
        orders.map_batches(window_orders, batch_format="pyarrow")
        .union(_sentinel_rows({"o_orderkey": (-2, pa.int64()),
                               "o_custkey": (-1, pa.int64())})),
        on="l_orderkey", right_on="o_orderkey",
        num_partitions=num_partitions, project=["o_custkey", "rev"])

    def partial(t: pa.Table) -> pa.Table:
        keys = _i64(t["o_custkey"])
        uk, inv = np.unique(keys, return_inverse=True)
        s = np.zeros(len(uk), dtype=np.int64)
        np.add.at(s, inv, _i64(t["rev"]))
        return pa.table({"o_custkey": pa.array(uk, type=pa.int64()),
                         "rev": pa.array(s)})

    grouped = (joined.map_batches(partial, batch_format="pyarrow")
               .groupby("o_custkey")
               .aggregate(Sum("rev", alias_name="revenue_milli")))

    def block_topk(t: pa.Table) -> pa.Table:
        rev = _i64(t["revenue_milli"])
        keys = _i64(t["o_custkey"])
        order = np.lexsort((keys, -rev))[:k]
        return t.take(pa.array(order, type=pa.int64()))

    tops = grouped.map_batches(block_topk,
                               batch_format="pyarrow").to_pandas()
    if "o_custkey" not in tops.columns:
        tops = pd.DataFrame({"o_custkey": pd.Series(dtype="int64"),
                             "revenue_milli": pd.Series(dtype="int64")})
    tops = tops.sort_values(["revenue_milli", "o_custkey"],
                            ascending=[False, True]).head(k)

    import ray
    import ray.data
    winners = ray.data.from_arrow(pa.table({
        "w_custkey": pa.array(tops["o_custkey"].to_numpy(),
                              type=pa.int64()),
        "revenue_milli": pa.array(tops["revenue_milli"].to_numpy(),
                                  type=pa.int64())}))

    def cust_cols(t: pa.Table) -> pa.Table:
        bal = np.asarray(t["c_acctbal"].combine_chunks()
                         if isinstance(t["c_acctbal"], pa.ChunkedArray)
                         else t["c_acctbal"], dtype=np.float64)
        return pa.table({
            "c_custkey": t["c_custkey"], "c_name": t["c_name"],
            "c_nationkey": t["c_nationkey"].cast(pa.int64()),
            "acctbal_c": pa.array(np.floor(bal * 100.0).astype(np.int64)),
        })

    named = broadcast_hash_join(
        customer.map_batches(cust_cols, batch_format="pyarrow"),
        winners, on=["c_custkey"], right_on=["w_custkey"],
        join_type="inner").to_pandas()
    if "c_custkey" not in named.columns:
        named = pd.DataFrame({c: pd.Series(dtype=d) for c, d in [
            ("c_custkey", "int64"), ("c_name", "object"),
            ("c_nationkey", "int64"), ("acctbal_c", "int64"),
            ("revenue_milli", "int64")]})
    nmap = {int(r["n_nationkey"]): r["n_name"]
            for r in nation.take_all()}          # ≤ 25-row dimension
    named["n_name"] = named["c_nationkey"].map(nmap)
    named = named.drop(columns=["c_nationkey"])
    return named.sort_values(["revenue_milli", "c_custkey"],
                             ascending=[False, True]) \
        [["c_custkey", "c_name", "n_name", "acctbal_c",
          "revenue_milli"]].reset_index(drop=True)


def nation_pair_volume(customer, supplier, nation, orders, lineitem,
                       nation_a: str, nation_b: str,
                       start_us=None, end_us=None,
                       num_partitions: int = 8):
    """TPC-H-Q7-style bilateral shipping volume: yearly revenue between
    two nations, in both directions (supplier nation ≠ customer nation),
    over a ship-date range.

    Plan: the nation filter collapses BOTH dimension chains before any
    exchange — supplier→nation broadcasts into the window-filtered
    lineitem scan (keeping only the two nations' suppliers) and
    customer→nation into the orders scan — so the single shuffle join on
    the orderkey carries only pre-filtered rows already reduced to
    (key, supp_nation, rev, year) / (key, cust_nation); a ≤(2·2·years)
    combiner and tiny groupby finish.  Returns pandas (supp_nation,
    cust_nation, l_year, revenue_milli) sorted by the three keys.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    start = pa.scalar(start_us, type=pa.timestamp("us"))
    end = pa.scalar(end_us, type=pa.timestamp("us"))

    nat = {r["n_name"]: int(r["n_nationkey"]) for r in nation.take_all()}
    keys_ab = {nat[nation_a], nat[nation_b]}
    names = {v: k for k, v in nat.items()}

    def supp_dim(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        nk = t["s_nationkey"].cast(pa.int64())
        t = pa.table({"s_suppkey": t["s_suppkey"], "s_nationkey": nk})
        return t.filter(pc.is_in(t["s_nationkey"],
                                 value_set=pa.array(sorted(keys_ab),
                                                    type=pa.int64())))

    def cust_dim(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        nk = t["c_nationkey"].cast(pa.int64())
        t = pa.table({"c_custkey": t["c_custkey"], "c_nationkey": nk})
        return t.filter(pc.is_in(t["c_nationkey"],
                                 value_set=pa.array(sorted(keys_ab),
                                                    type=pa.int64())))

    def li_window(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.and_(pc.greater_equal(t["l_shipdate"], start),
                       pc.less(t["l_shipdate"], end))
        t = t.filter(keep)
        price = np.asarray(t["l_extendedprice"].combine_chunks()
                           if isinstance(t["l_extendedprice"],
                                         pa.ChunkedArray)
                           else t["l_extendedprice"], dtype=np.float64)
        disc = np.asarray(t["l_discount"].combine_chunks()
                          if isinstance(t["l_discount"], pa.ChunkedArray)
                          else t["l_discount"], dtype=np.float64)
        rev = np.floor(price * (1.0 - disc) * 1000.0).astype(np.int64)
        year = pc.year(t["l_shipdate"]).cast(pa.int64())
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_suppkey": t["l_suppkey"],
                         "rev": pa.array(rev), "l_year": year})

    li_n = broadcast_hash_join(
        lineitem.map_batches(li_window, batch_format="pyarrow"),
        supplier.map_batches(supp_dim, batch_format="pyarrow"),
        on=["l_suppkey"], right_on=["s_suppkey"], join_type="inner",
        project=["l_orderkey", "rev", "l_year", "s_nationkey"])

    ord_n = broadcast_hash_join(
        orders.select_columns(["o_orderkey", "o_custkey"]),
        customer.map_batches(cust_dim, batch_format="pyarrow"),
        on=["o_custkey"], right_on=["c_custkey"], join_type="inner",
        project=["o_orderkey", "c_nationkey"])

    # a nation with zero suppliers (tiny scale factors) leaves li_n FULLY
    # empty, which this Ray build's hash join cannot partition (schema-less
    # side); per the engine-wide contract a fully-empty inner-join side
    # needs a driver-side never-matching sentinel row unioned in (order
    # keys are non-negative, so -1 vs -2 can never meet)
    import ray.data
    li_sentinel = ray.data.from_arrow(pa.table({
        "l_orderkey": pa.array([-1], type=pa.int64()),
        "rev": pa.array([0], type=pa.int64()),
        "l_year": pa.array([0], type=pa.int64()),
        "s_nationkey": pa.array([-1], type=pa.int64())}))
    ord_sentinel = ray.data.from_arrow(pa.table({
        "o_orderkey": pa.array([-2], type=pa.int64()),
        "c_nationkey": pa.array([-1], type=pa.int64())}))

    joined = shuffle_hash_join(
        li_n.union(li_sentinel), ord_n.union(ord_sentinel),
        on="l_orderkey", right_on="o_orderkey",
        num_partitions=num_partitions,
        project=["rev", "l_year", "s_nationkey", "c_nationkey"])

    def partial(t: pa.Table) -> pa.Table:
        sn = _i64(t["s_nationkey"])
        cn = _i64(t["c_nationkey"])
        keep = sn != cn
        sn, cn = sn[keep], cn[keep]
        yr = _i64(t["l_year"])[keep]
        rv = _i64(t["rev"])[keep]
        # raising encoding-budget guard (repo convention, cf.
        # dup_ngram_spans): silent overflow would merge distinct triples
        if len(sn) and (sn.max() >= 32 or cn.max() >= 32
                        or yr.max() >= 4096):
            raise ValueError(
                "nation_pair_volume: encoding budget exceeded "
                "(nationkey < 32 and year < 4096 required)")
        enc = (sn * 32 + cn) * 4096 + yr
        uk, inv = np.unique(enc, return_inverse=True)
        s = np.zeros(len(uk), dtype=np.int64)
        np.add.at(s, inv, rv)
        return pa.table({"enc": pa.array(uk, type=pa.int64()),
                         "rev": pa.array(s)})

    out = (joined.map_batches(partial, batch_format="pyarrow")
           .groupby("enc")
           .aggregate(Sum("rev", alias_name="revenue_milli"))).to_pandas()
    if "enc" not in out.columns:
        out = pd.DataFrame({"enc": pd.Series(dtype="int64"),
                            "revenue_milli": pd.Series(dtype="int64")})
    enc = out["enc"].to_numpy(dtype="int64", na_value=0) \
        if len(out) else np.empty(0, dtype=np.int64)
    res = pd.DataFrame({
        "supp_nation": [names[int(e)] for e in enc // (32 * 4096)],
        "cust_nation": [names[int(e)] for e in (enc // 4096) % 32],
        "l_year": (enc % 4096).astype("int64") if len(out)
        else pd.Series(dtype="int64"),
        "revenue_milli": out["revenue_milli"].astype("int64")
        if len(out) else pd.Series(dtype="int64"),
    })
    return res.sort_values(["supp_nation", "cust_nation", "l_year"]) \
              .reset_index(drop=True)


def small_quantity_revenue(part, lineitem, brand: str = "Brand#1"):
    """TPC-H-Q17-style correlated-average threshold: total revenue of
    line items whose quantity is below 20% of their part's own average
    quantity, restricted to one brand — the canonical correlated scalar
    subquery, distributed as two scans plus a broadcast of the per-part
    statistics.

    The 0.2·avg comparison is exact: ``qty < sum_qty/(5·cnt)`` is
    evaluated as ``qty·5·cnt < sum_qty`` (quantities are integral by
    data contract — asserted — and cnt > 0 by construction), so no
    float division enters the result.

    Plan: brand-filtered part keys broadcast into lineitem scan #1,
    which collapses per batch to (partkey, sum_qty, cnt) partials → one
    small groupby (brand-filtered: |stats| ≈ |part|/|brands|) → the
    stats broadcast into lineitem scan #2, where the rational filter and
    an int64 revenue sum run per batch (zero further exchanges; the
    driver receives one scalar pair).  Returns one-row pandas
    (total_price_milli, n_items) — Q17's avg_yearly = total/7 is left to
    the consumer to keep the op integer-exact.
    """
    import pandas as pd

    import ray.data
    from ray.data.aggregate import Sum

    def brand_keys(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.equal(t["p_brand"], brand)) \
                .select(["p_partkey"])

    def qty_partial(t: pa.Table) -> pa.Table:
        q = np.asarray(t["l_quantity"].combine_chunks()
                       if isinstance(t["l_quantity"], pa.ChunkedArray)
                       else t["l_quantity"], dtype=np.float64)
        qi = q.astype(np.int64)
        if not np.array_equal(qi, q):
            raise ValueError("small_quantity_revenue: non-integral qty")
        keys = _i64(t["l_partkey"])
        uk, inv = np.unique(keys, return_inverse=True)
        s = np.zeros(len(uk), dtype=np.int64)
        c = np.zeros(len(uk), dtype=np.int64)
        np.add.at(s, inv, qi)
        np.add.at(c, inv, 1)
        return pa.table({"l_partkey": pa.array(uk, type=pa.int64()),
                         "sum_qty": pa.array(s), "cnt": pa.array(c)})

    branded_li = broadcast_hash_join(
        lineitem.select_columns(["l_partkey", "l_quantity",
                                 "l_extendedprice"]),
        part.map_batches(brand_keys, batch_format="pyarrow"),
        on=["l_partkey"], right_on=["p_partkey"], join_type="left semi")

    stats = (branded_li.map_batches(qty_partial, batch_format="pyarrow")
             .groupby("l_partkey")
             .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                        Sum("cnt", alias_name="cnt")))

    def below_threshold(t: pa.Table) -> pa.Table:
        # joined columns: l_quantity, l_extendedprice, sum_qty, cnt
        q = np.asarray(t["l_quantity"].combine_chunks()
                       if isinstance(t["l_quantity"], pa.ChunkedArray)
                       else t["l_quantity"], dtype=np.float64) \
            .astype(np.int64)
        sq = _i64(t["sum_qty"])
        cn = _i64(t["cnt"])
        keep = q * 5 * cn < sq
        price = np.asarray(t["l_extendedprice"].combine_chunks()
                           if isinstance(t["l_extendedprice"],
                                         pa.ChunkedArray)
                           else t["l_extendedprice"],
                           dtype=np.float64)[keep]
        total = int(np.floor(price * 1000.0).astype(np.int64).sum())
        return pa.table({"p": pa.array([total], type=pa.int64()),
                         "n": pa.array([int(keep.sum())],
                                       type=pa.int64())})

    gated = broadcast_hash_join(
        branded_li, stats, on=["l_partkey"], right_on=["l_partkey"],
        join_type="inner")
    agg = gated.map_batches(below_threshold,
                            batch_format="pyarrow").sum(["p", "n"])
    return pd.DataFrame({
        "total_price_milli": [int(agg["sum(p)"] or 0)],
        "n_items": [int(agg["sum(n)"] or 0)]})


def top_supplier_revenue(supplier, lineitem, start_us=None, end_us=None):
    """TPC-H-Q15-style argmax with ties: the supplier(s) whose shipped
    revenue over one window is the global maximum, with names attached.

    Plan: lineitem window-reduces per batch to (suppkey, rev) partials
    (same floor-milli kernel as the other revenue ops) → ONE groupby Sum
    → the global max is a scalar ``Dataset.max`` over that small
    per-supplier table → the tie-set (usually one row) filters out and
    broadcasts into the supplier scan for the name.  Returns pandas
    (s_suppkey, s_name, revenue_milli) sorted by suppkey.
    """
    import pandas as pd

    import ray.data
    from ray.data.aggregate import Sum

    start = pa.scalar(start_us, type=pa.timestamp("us"))
    end = pa.scalar(end_us, type=pa.timestamp("us"))

    def rev_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.and_(pc.greater_equal(t["l_shipdate"], start),
                       pc.less(t["l_shipdate"], end))
        t = t.filter(keep)
        price = np.asarray(t["l_extendedprice"].combine_chunks()
                           if isinstance(t["l_extendedprice"],
                                         pa.ChunkedArray)
                           else t["l_extendedprice"], dtype=np.float64)
        disc = np.asarray(t["l_discount"].combine_chunks()
                          if isinstance(t["l_discount"], pa.ChunkedArray)
                          else t["l_discount"], dtype=np.float64)
        rev = np.floor(price * (1.0 - disc) * 1000.0).astype(np.int64)
        keys = _i64(t["l_suppkey"])
        uk, inv = np.unique(keys, return_inverse=True)
        s = np.zeros(len(uk), dtype=np.int64)
        np.add.at(s, inv, rev)
        return pa.table({"l_suppkey": pa.array(uk, type=pa.int64()),
                         "rev": pa.array(s)})

    per_supp = (lineitem.map_batches(rev_partial, batch_format="pyarrow")
                .groupby("l_suppkey")
                .aggregate(Sum("rev", alias_name="revenue_milli"))) \
        .materialize()                 # consumed twice: max + filter
    best = per_supp.max("revenue_milli")
    if best is None:
        return pd.DataFrame({"s_suppkey": pd.Series(dtype="int64"),
                             "s_name": pd.Series(dtype="object"),
                             "revenue_milli": pd.Series(dtype="int64")})

    def winners_only(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.equal(t["revenue_milli"],
                                 pa.scalar(int(best), pa.int64())))

    winners = per_supp.map_batches(winners_only, batch_format="pyarrow")
    named = broadcast_hash_join(
        supplier.select_columns(["s_suppkey", "s_name"]), winners,
        on=["s_suppkey"], right_on=["l_suppkey"], join_type="inner",
        project=["s_suppkey", "s_name", "revenue_milli"]).to_pandas()
    if "s_suppkey" not in named.columns:
        named = pd.DataFrame({"s_suppkey": pd.Series(dtype="int64"),
                              "s_name": pd.Series(dtype="object"),
                              "revenue_milli": pd.Series(dtype="int64")})
    return named.sort_values("s_suppkey").reset_index(drop=True)


def write_bucketed(ds, key_col: str, out_dir: str, n_buckets: int = 32):
    """Write ``ds`` as a hash-bucketed hive layout ``out_dir/bucket=B/`` —
    ONE streaming ``write_parquet(partition_cols)`` pass, no shuffle, no
    materialize.  ``bucket = mix64(key) % n_buckets`` (Fibonacci-hash mix,
    same function on every table) — two tables written with the same
    ``n_buckets`` are CO-PARTITIONED on the key, which is the storage
    contract :func:`bucketed_join` exploits.  Pick one partitioning key
    per subject area and reuse the layout across every downstream join."""
    from ..arrowutil import one_chunk

    def tag(t: pa.Table) -> pa.Table:
        k = np.asarray(one_chunk(t[key_col])).astype(np.uint64)
        h = (k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(1)
        return t.append_column(
            "bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64)))

    ds.map_batches(tag, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["bucket"])


def bucketed_join(left_dir: str, right_dir: str, on: str, right_on: str,
                  n_buckets: int, project=None, join_type: str = "inner"):
    """Join two CO-BUCKETED hive layouts (written by :func:`write_bucketed`
    with the same ``n_buckets``) bucket-by-bucket with ZERO exchange: the
    driving Dataset is just the ``n_buckets`` bucket ids, and each map task
    reads ONE bucket directory from each side (hive-fragment pruning — no
    other bucket's bytes move) and runs a local pyarrow hash join.

    This is the storage-layout answer to the repeated-fact-join problem:
    the hash shuffle is paid ONCE at write time and amortized over every
    subsequent join / groupby on the same key — at 100 TB, re-bucketing
    per query is the difference between one exchange per pipeline and
    none.  Skewed keys cost a big bucket, not a hot aggregator; raise
    ``n_buckets`` so the largest bucket pair fits a worker's heap.
    """
    import ray.data

    def join_one(t: pa.Table) -> pa.Table:
        import pyarrow.dataset as pads
        out = []
        for b in t["id"].to_pylist():
            lt = pads.dataset(left_dir, partitioning="hive").to_table(
                filter=(pads.field("bucket") == b))
            rt = pads.dataset(right_dir, partitioning="hive").to_table(
                filter=(pads.field("bucket") == b))
            j = lt.drop_columns(["bucket"]).join(
                rt.drop_columns(["bucket"]), keys=[on],
                right_keys=[right_on], join_type=join_type)
            out.append(j.select(list(project)) if project is not None
                       else j)
        return pa.concat_tables(out)

    return ray.data.range(n_buckets).map_batches(
        join_one, batch_format="pyarrow", batch_size=1)


def salted_join(left, right, on: str, right_on: str = None,
                hot_keys=None, hot_threshold: int = 1 << 20,
                n_salts: int = 8, num_partitions: int = 32, project=None):
    """Skew-aware large×large equi-join via key SALTING — the standard fix
    for web-zipfian join keys (hosts, domains, boilerplate hashes) where a
    plain hash partition lands one aggregator with most of the data.

    Hot keys (detected from a combiner-first left-side key count unless
    passed explicitly — detection costs one narrow (key, n) exchange over
    per-batch-distinct rows) get their LEFT rows spread across ``n_salts``
    composite keys ``(key, salt)`` and their RIGHT rows replicated once
    per salt; cold keys ride along with salt 0 and no replication.  ONE
    hash-partitioned join on the composite key replaces the skewed one —
    the hot key's probe side now occupies ``n_salts`` aggregators, at the
    price of ``n_salts×`` build-side copies of the (few) hot keys' rows.
    Result is bit-identical to the unsalted join for ANY salt assignment;
    with no hot keys it degenerates to the plain join (no extra branch,
    no empty-side hazards).
    """
    import ray
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from ..arrowutil import one_chunk

    right_key = right_on or on

    if hot_keys is None:
        def kcount(t: pa.Table) -> pa.Table:
            g = pa.table({"k": one_chunk(t[on])}).group_by("k") \
                .aggregate([("k", "count")])
            return pa.table({"k": g["k"],
                             "n": g["k_count"].cast(pa.int64())})

        counts = (left.map_batches(kcount, batch_format="pyarrow")
                  .groupby("k").aggregate(Sum("n", alias_name="n")))
        hot_keys = [r["k"] for r in counts.map_batches(
            lambda t: t.filter(pc.greater_equal(
                t["n"], pa.scalar(hot_threshold, pa.int64()))),
            batch_format="pyarrow").take_all()]

    hot_arr = pa.array(sorted(hot_keys))
    hot_ref = ray.put(hot_arr)

    def salt_left(t: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        m = np.asarray(pc.is_in(one_chunk(t[on]), value_set=hot)) \
            if len(hot) else np.zeros(t.num_rows, dtype=bool)
        salt = np.where(m, np.arange(t.num_rows, dtype=np.int64)
                        % n_salts, 0)
        return t.append_column("_salt", pa.array(salt))

    def salt_right(t: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        m = pc.is_in(one_chunk(t[right_key]), value_set=hot) \
            if len(hot) else pa.array(np.zeros(t.num_rows, dtype=bool))
        cold = t.filter(pc.invert(m)).append_column(
            "_salt", pa.array(np.zeros(
                t.num_rows - int(pc.sum(pc.cast(m, pa.int8())).as_py()
                                 or 0), dtype=np.int64)))
        hot_rows = t.filter(m)
        copies = [cold] + [
            hot_rows.append_column(
                "_salt", pa.array(np.full(hot_rows.num_rows, s,
                                          dtype=np.int64)))
            for s in range(n_salts)]
        return pa.concat_tables(copies)

    out = shuffle_hash_join(
        left.map_batches(salt_left, batch_format="pyarrow"),
        right.map_batches(salt_right, batch_format="pyarrow"),
        on=(on, "_salt"), right_on=(right_key, "_salt"),
        num_partitions=num_partitions, fold_empty_blocks=True)
    if project is not None:
        return out.select_columns(list(project))
    return out.map_batches(lambda t: t.drop_columns(["_salt"]),
                           batch_format="pyarrow")


def bucketed_lookup(layout_dir: str, on: str, keys, n_buckets: int,
                    project=None):
    """Point lookups against a :func:`write_bucketed` layout: hash the
    requested keys with the layout's bucket function, read ONLY the
    bucket directories they land in (hive-fragment pruning — untouched
    buckets cost zero bytes), and filter to the exact keys.  The
    storage-layout answer to "fetch these 50 urls out of 10^12": a full
    scan touches every file; the bucketed layout touches
    ``≤ min(len(keys), n_buckets)`` of them.
    """
    import ray
    import ray.data
    import pyarrow.compute as pc

    from ..arrowutil import one_chunk

    k = np.asarray(keys, dtype=np.uint64)
    h = (k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(1)
    buckets = sorted(set((h % np.uint64(n_buckets)).astype(int).tolist()))
    keys_ref = ray.put(pa.array(np.asarray(keys, dtype=np.int64)))

    def read_one(t: pa.Table) -> pa.Table:
        import pyarrow.dataset as pads
        out = []
        for b in t["id"].to_pylist():
            tbl = pads.dataset(layout_dir, partitioning="hive").to_table(
                filter=(pads.field("bucket") == b))
            hit = tbl.filter(pc.is_in(one_chunk(tbl[on]),
                                      value_set=ray.get(keys_ref)))
            out.append(hit.drop_columns(["bucket"]))
        res = pa.concat_tables(out)
        return res.select(list(project)) if project is not None else res

    return ray.data.from_items(
        [{"id": b} for b in buckets]).map_batches(
        read_one, batch_format="pyarrow", batch_size=1)


def bucketed_upsert(layout_dir: str, changes, key_col: str, n_buckets: int,
                    out_dir: str):
    """Incremental upsert into a :func:`write_bucketed` layout that
    rewrites ONLY the buckets a changed key hashes into: change rows
    REPLACE same-key rows, new keys append.  The 100 TB maintenance
    story — a 0.1 % daily delta touches ~min(|delta|, n_buckets) bucket
    directories; the other ~99.9 % of bytes move by file COPY (an
    object-store metadata op at scale), never parsed.

    Plan: the delta is written bucketed once (same mix64 bucket
    function, so it co-partitions with the base), the dirty-bucket set
    comes from the delta layout's directory listing (metadata only),
    and one map task per bucket either merges (anti-join base on the
    delta's keys + concat delta — both sides are single-bucket reads)
    or copies the base files through untouched.  Change keys must be
    unique (run :func:`~pdf2doi_ray.stages.aggs.cdc_apply` first to
    collapse a CDC log); violated uniqueness raises loudly.

    Returns the bookkeeping Dataset (bucket, n_rows, rewritten) —
    consume it to run the sink; read the new layout back with
    ``read_parquet(out_dir)`` (drop the hive ``bucket`` column).
    """
    import glob
    import os
    import shutil

    import ray
    import ray.data
    import pyarrow.compute as pc

    from ..arrowutil import one_chunk

    chg_dir = out_dir.rstrip("/") + "__delta"
    shutil.rmtree(chg_dir, ignore_errors=True)
    shutil.rmtree(out_dir, ignore_errors=True)
    write_bucketed(changes, key_col, chg_dir, n_buckets)
    dirty = {int(os.path.basename(p).split("=")[1])
             for p in glob.glob(os.path.join(chg_dir, "bucket=*"))}
    base_buckets = {int(os.path.basename(p).split("=")[1])
                    for p in glob.glob(os.path.join(layout_dir, "bucket=*"))}
    os.makedirs(out_dir, exist_ok=True)

    def _read_bucket(root: str, b: int) -> pa.Table:
        import pyarrow.dataset as pads
        return pads.dataset(root, partitioning="hive").to_table(
            filter=(pads.field("bucket") == b)).drop_columns(["bucket"])

    def merge_one(t: pa.Table) -> pa.Table:
        rows = []
        for b in t["id"].to_pylist():
            dst = os.path.join(out_dir, f"bucket={b}")
            if b not in dirty:
                os.makedirs(dst, exist_ok=True)
                n = 0
                for f in glob.glob(os.path.join(layout_dir,
                                                f"bucket={b}", "*")):
                    shutil.copy(f, dst)
                rows.append((b, -1, False))
                continue
            chg = _read_bucket(chg_dir, b)
            keys = one_chunk(chg[key_col])
            if len(keys) != len(pc.unique(keys)):
                raise ValueError(
                    "bucketed_upsert: duplicate keys in the change set — "
                    "collapse the CDC log (cdc_apply) first")
            if b in base_buckets:
                base = _read_bucket(layout_dir, b)
                kept = base.filter(pc.invert(pc.is_in(
                    one_chunk(base[key_col]), value_set=keys)))
                merged = pa.concat_tables([kept, chg])
            else:
                merged = chg
            os.makedirs(dst, exist_ok=True)
            import pyarrow.parquet as pq
            pq.write_table(merged, os.path.join(dst, "part-0.parquet"))
            rows.append((b, merged.num_rows, True))
        return pa.table({
            "bucket": pa.array([r[0] for r in rows], type=pa.int64()),
            "n_rows": pa.array([r[1] for r in rows], type=pa.int64()),
            "rewritten": pa.array([r[2] for r in rows], type=pa.bool_())})

    all_b = sorted(base_buckets | dirty)
    return ray.data.from_items([{"id": b} for b in all_b]).map_batches(
        merge_one, batch_format="pyarrow", batch_size=1)


def market_share_q8(region, nation, customer, supplier, orders, lineitem,
                    part, region_name: str, part_type: str,
                    target_nation: str, start_us, end_us,
                    num_partitions: int = 8):
    """TPC-H-Q8-style national market share: per order-year, the revenue
    fraction supplied by ``target_nation`` among ``part_type`` line items
    sold to ``region_name`` customers — emitted as EXACT integer
    numerator/denominator (``mkt_num / mkt_den``, milli-revenue), so no
    float division exists to mismatch the SQL mirror.

    Same shape discipline as :func:`local_supplier_revenue`: every
    dimension chain (region→nation→customer, part, supplier→nation)
    collapses broadcast-side; the ONE exchange is the lineitem×orders
    fact join on the orderkey carrying (year, rev, is_target); a
    ≤|years|-row combiner groupby finishes.
    """
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from ..arrowutil import one_chunk

    start = pa.scalar(start_us, type=pa.timestamp("us"))
    end = pa.scalar(end_us, type=pa.timestamp("us"))

    nations_r = broadcast_hash_join(
        nation,
        region.map_batches(
            lambda t: t.filter(pc.equal(t["r_name"], region_name)).select(
                ["r_regionkey"]), batch_format="pyarrow"),
        on=["n_regionkey"], right_on=["r_regionkey"], join_type="left semi",
        project=["n_nationkey"])
    cust = broadcast_hash_join(
        customer.select_columns(["c_custkey", "c_nationkey"]), nations_r,
        on=["c_nationkey"], right_on=["n_nationkey"], join_type="left semi",
        project=["c_custkey"])

    def filter_orders(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(t["o_orderdate"], start),
                       pc.less(t["o_orderdate"], end))
        t = t.filter(keep)
        yr = pc.year(t["o_orderdate"])
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"],
                         "o_year": pc.cast(yr, pa.int64())})

    orders_dim = broadcast_hash_join(
        orders.map_batches(filter_orders, batch_format="pyarrow"), cust,
        on=["o_custkey"], right_on=["c_custkey"], join_type="left semi",
        project=["o_orderkey", "o_year"])

    parts = part.map_batches(
        lambda t: t.filter(pc.equal(t["p_type"], part_type)).select(
            ["p_partkey"]), batch_format="pyarrow")
    supp_nat = broadcast_hash_join(
        supplier.select_columns(["s_suppkey", "s_nationkey"]), nation,
        on=["s_nationkey"], right_on=["n_nationkey"],
        project=["s_suppkey", "n_name"])

    def reduce_li(t: pa.Table) -> pa.Table:
        price = np.asarray(one_chunk(t["l_extendedprice"]),
                           dtype=np.float64)
        disc = np.asarray(one_chunk(t["l_discount"]), dtype=np.float64)
        rev = np.floor((price * (1.0 - disc)) * 1000.0).astype(np.int64)
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_suppkey": t["l_suppkey"],
                         "l_partkey": t["l_partkey"],
                         "rev": pa.array(rev)})

    li = lineitem.map_batches(reduce_li, batch_format="pyarrow")
    li = broadcast_hash_join(li, parts, on=["l_partkey"],
                             right_on=["p_partkey"], join_type="left semi",
                             project=["l_orderkey", "l_suppkey", "rev"])
    li = broadcast_hash_join(li, supp_nat, on=["l_suppkey"],
                             right_on=["s_suppkey"],
                             project=["l_orderkey", "rev", "n_name"])

    fact = shuffle_hash_join(li, orders_dim, on="l_orderkey",
                             right_on="o_orderkey",
                             num_partitions=num_partitions,
                             fold_empty_blocks=True)

    def partial(t: pa.Table) -> pa.Table:
        is_t = pc.cast(pc.equal(t["n_name"], target_nation), pa.int64())
        num = pc.multiply(t["rev"], is_t)
        g = pa.table({"o_year": t["o_year"], "num": num, "den": t["rev"]}) \
            .group_by("o_year").aggregate([("num", "sum"), ("den", "sum")])
        return g.rename_columns(["o_year", "num", "den"])

    return (fact.map_batches(partial, batch_format="pyarrow")
            .groupby("o_year")
            .aggregate(Sum("num", alias_name="mkt_num"),
                       Sum("den", alias_name="mkt_den")))


def waiting_suppliers(orders, supplier, lineitem, flag: str = "R",
                      status: str = "F", num_partitions: int = 8,
                      num_shards: int = 32):
    """TPC-H-Q21-style sole-blame assignment: per supplier, the number of
    multi-supplier orders of one status where that supplier is the ONLY
    one whose line items carry the given return flag (EXISTS another
    supplier in the order + NOT EXISTS another flagged supplier).  The
    test schema has no commit/receipt dates, so the return flag is the
    lateness proxy; the semi+anti join SHAPE is Q21's.

    Plan (the heaviest classic TPC-H shape, done in narrow integers):
    lineitem collapses per batch to DISTINCT ``(orderkey, suppkey,
    late)`` triples via one lexsort + segment max — only three int64
    columns cross the exchange, and a hot order costs its distinct
    suppliers per batch, not its line items.  A sharded stitch keyed by
    orderkey merges cross-batch duplicates and reduces every order
    segment vectorized to ``(n_supp, n_late, late_supp)``; ``sum(suppkey
    * late)`` IS the blamed supplier exactly when ``n_late == 1``, so no
    per-group Python runs anywhere.  Qualifying orders semi-join the
    status-filtered order keys in ONE hash-partitioned exchange
    (both sides are fact tables — no broadcast), per-batch ``(suppkey,
    n)`` partials feed a tiny groupby Sum, and ``s_name`` arrives via a
    dimension broadcast.  Returns pandas ``(s_name, numwait)`` sorted by
    numwait DESC, name ASC.

    Reference parity note: the reference ranks/filters per document in
    process (finders.py's per-file cascade); multi-table blame joins are
    beyond-reference relational surface.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    from .stitch import sharded_stitch

    def triples(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ok = _i64(t["l_orderkey"])
        sk = _i64(t["l_suppkey"])
        late = np.asarray(
            pc.cast(pc.equal(t["l_returnflag"], flag), pa.int64()))
        if len(ok) == 0:
            return pa.table({"l_orderkey": pa.array([], type=pa.int64()),
                             "s_suppkey": pa.array([], type=pa.int64()),
                             "late": pa.array([], type=pa.int64())})
        order = np.lexsort((sk, ok))
        o, s, l = ok[order], sk[order], late[order]
        new = np.ones(len(o), dtype=bool)
        new[1:] = (o[1:] != o[:-1]) | (s[1:] != s[:-1])
        starts = np.flatnonzero(new)
        lmax = np.maximum.reduceat(l, starts)
        return pa.table({"l_orderkey": pa.array(o[starts]),
                         "s_suppkey": pa.array(s[starts]),
                         "late": pa.array(lmax)})

    def per_order(t: pa.Table) -> pa.Table:
        # merge cross-batch duplicate (orderkey, suppkey) pairs, then
        # reduce each orderkey segment: all rows of an order share a
        # shard by construction (sharded by orderkey)
        ok = _i64(t["l_orderkey"])
        sk = _i64(t["s_suppkey"])
        late = _i64(t["late"])
        order = np.lexsort((sk, ok))
        o, s, l = ok[order], sk[order], late[order]
        new_pair = np.ones(len(o), dtype=bool)
        new_pair[1:] = (o[1:] != o[:-1]) | (s[1:] != s[:-1])
        ps = np.flatnonzero(new_pair)
        o, s = o[ps], s[ps]
        l = np.maximum.reduceat(l, ps)
        new_o = np.ones(len(o), dtype=bool)
        new_o[1:] = o[1:] != o[:-1]
        os_ = np.flatnonzero(new_o)
        n_supp = np.add.reduceat(np.ones_like(o), os_)
        n_late = np.add.reduceat(l, os_)
        late_supp = np.add.reduceat(s * l, os_)
        keep = (n_supp >= 2) & (n_late == 1)
        return pa.table({"l_orderkey": pa.array(o[os_][keep]),
                         "s_suppkey": pa.array(late_supp[keep])})

    blamed = sharded_stitch(
        lineitem.map_batches(triples, batch_format="pyarrow"),
        lambda t: _i64(t["l_orderkey"]), per_order, num_shards=num_shards)

    def status_keys(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.equal(t["o_orderstatus"], status)) \
            .select(["o_orderkey"])

    left = blamed.union(_sentinel_rows(
        {"l_orderkey": (-1, pa.int64()), "s_suppkey": (-1, pa.int64())}))
    right = orders.map_batches(status_keys, batch_format="pyarrow") \
        .union(_sentinel_rows({"o_orderkey": (-2, pa.int64())}))
    matched = shuffle_hash_join(left, right, on="l_orderkey",
                                right_on="o_orderkey",
                                join_type="left_semi",
                                num_partitions=num_partitions)

    def cnt_partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(_i64(t["s_suppkey"]), return_counts=True)
        return pa.table({"s_suppkey": pa.array(u),
                         "n": pa.array(c.astype(np.int64))})

    agg = (matched.map_batches(cnt_partial, batch_format="pyarrow")
           .groupby("s_suppkey").aggregate(Sum("n", alias_name="numwait")))
    out = broadcast_hash_join(
        agg, supplier.map_batches(
            lambda t: t.select(["s_suppkey", "s_name"]),
            batch_format="pyarrow"),
        on="s_suppkey", project=["s_name", "numwait"]).to_pandas()
    if "s_name" not in out.columns:
        out = pd.DataFrame({"s_name": pd.Series(dtype="object"),
                            "numwait": pd.Series(dtype="int64")})
    return out.sort_values(["numwait", "s_name"],
                           ascending=[False, True]).reset_index(drop=True)


def brand_bracket_revenue(part, lineitem,
                          brackets=(("Brand#1", 1, 11),
                                    ("Brand#2", 10, 20),
                                    ("Brand#3", 20, 30))):
    """TPC-H-Q19-style disjunctive-predicate revenue: total discounted
    revenue of line items whose (part brand, quantity) falls in any of
    the given brackets — the classic OR-of-ANDs filter that defeats
    naive predicate pushdown.

    Plan: the part dimension is pruned to bracket brands BEFORE the
    broadcast (only matching partkeys ship), each lineitem batch joins
    the broadcast table (pyarrow C++ hash join), the bracket disjunction
    evaluates as one vectorized boolean reduction, and per-batch scalar
    partials reduce to ONE row — zero shuffles at any fact-table size.

    Money exactness: per-row ``rev_milli = floor(l_extendedprice * (1 -
    l_discount) * 1000)`` (single IEEE-754 multiply chain, identical in
    numpy and DuckDB).  Returns pandas ``(revenue_milli, n_items)``.
    """
    import pandas as pd
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    brands = sorted({b for b, _, _ in brackets})

    def prune_parts(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["p_brand"],
                        value_set=pa.array(brands, type=pa.string()))
        return t.filter(keep).select(["p_partkey", "p_brand"])

    dim = part.map_batches(prune_parts, batch_format="pyarrow")
    joined = broadcast_hash_join(
        lineitem, dim, on="l_partkey", right_on="p_partkey",
        project=["l_quantity", "l_extendedprice", "l_discount",
                 "p_brand"])

    def partial(t: pa.Table) -> pa.Table:
        qty = _f64(t["l_quantity"])
        brand = t["p_brand"].combine_chunks() \
            if isinstance(t["p_brand"], pa.ChunkedArray) else t["p_brand"]
        keep = np.zeros(t.num_rows, dtype=bool)
        for b, lo, hi in brackets:
            keep |= (np.asarray(pc.equal(brand, b))
                     & (qty >= lo) & (qty <= hi))
        price = _f64(t["l_extendedprice"])[keep]
        disc = _f64(t["l_discount"])[keep]
        rev = np.floor((price * (1.0 - disc)) * 1000.0).astype(np.int64)
        return pa.table({
            "revenue_milli": pa.array([int(rev.sum())], type=pa.int64()),
            "n_items": pa.array([int(keep.sum())], type=pa.int64())})

    sums = joined.map_batches(partial, batch_format="pyarrow") \
        .aggregate(Sum("revenue_milli", alias_name="revenue_milli"),
                   Sum("n_items", alias_name="n_items"))
    return pd.DataFrame({
        "revenue_milli": [int(sums["revenue_milli"] or 0)],
        "n_items": [int(sums["n_items"] or 0)]}).astype("int64")


def bucket_sync_diff(dir_a: str, dir_b: str, key_col: str,
                     n_buckets: int, cols=None):
    """Merkle-style anti-entropy between two hash-bucketed layouts
    (written by :func:`write_bucketed` with the same ``n_buckets``): per
    bucket, an ORDER-INDEPENDENT content checksum — the wrap-around
    uint64 sum of per-row md5 hashes over ``cols`` (default: the key
    column) — so two replicas compare 100 TB by exchanging ``n_buckets``
    scalar rows, and only mismatching buckets need a re-ship.

    Plan: the driving Dataset is the bucket ids; each map task reads the
    SAME bucket directory from both layouts (hive-fragment pruning — no
    other bucket's bytes move), checksums both sides locally, and emits
    one ``(bucket, status, n_a, n_b)`` row.  Statuses: ``match``,
    ``mismatch``, ``only_a``, ``only_b``, ``empty``.  No exchange at all
    — the output IS n_buckets rows.

    Row hashing reuses the corpus md5-u64 idiom (sum of row hashes is
    insertion-order-free, so block layout cannot perturb the checksum;
    a multiset difference that sums to exactly 0 collides — ~2⁻⁶⁴ per
    bucket pair).
    """
    import ray.data

    from .corpus import md5_u64

    use_cols = list(cols) if cols is not None else [key_col]

    def checksum(tbl: pa.Table):
        if tbl.num_rows == 0:
            return np.uint64(0), 0
        import pyarrow.compute as pc
        parts = [pc.cast(tbl[c], pa.string()) for c in use_cols]
        joined = parts[0] if len(parts) == 1 else \
            pc.binary_join_element_wise(*parts, "\x1f")
        hv = md5_u64(joined.combine_chunks()
                     if isinstance(joined, pa.ChunkedArray) else joined)
        return np.sum(hv, dtype=np.uint64), tbl.num_rows

    def diff_one(t: pa.Table) -> pa.Table:
        import pyarrow.dataset as pads
        rows = {"bucket": [], "status": [], "n_a": [], "n_b": []}
        for b in t["id"].to_pylist():
            out = []
            for d in (dir_a, dir_b):
                tb = pads.dataset(d, partitioning="hive").to_table(
                    columns=use_cols,
                    filter=(pads.field("bucket") == b))
                out.append(checksum(tb))
            (ca, na), (cb, nb) = out
            if na == 0 and nb == 0:
                status = "empty"
            elif na == 0:
                status = "only_b"
            elif nb == 0:
                status = "only_a"
            elif ca == cb and na == nb:
                status = "match"
            else:
                status = "mismatch"
            rows["bucket"].append(b)
            rows["status"].append(status)
            rows["n_a"].append(na)
            rows["n_b"].append(nb)
        return pa.table({
            "bucket": pa.array(rows["bucket"], type=pa.int64()),
            "status": pa.array(rows["status"], type=pa.string()),
            "n_a": pa.array(rows["n_a"], type=pa.int64()),
            "n_b": pa.array(rows["n_b"], type=pa.int64())})

    return ray.data.range(n_buckets).map_batches(
        diff_one, batch_format="pyarrow", batch_size=1)


def rebalance_matrix(ds, key_col: str, old_buckets: int,
                     new_buckets: int):
    """Layout-replanning audit: if a bucketed layout moves from
    ``old_buckets`` to ``new_buckets``, which (old → new) bucket cells
    receive how many rows — i.e. exactly how much data a re-bucketing
    job will move (the diagonal-ish cells that keep their bucket id cost
    nothing under the same hash).  Uses the same Fibonacci ``mix64`` as
    :func:`write_bucketed`, so the plan is byte-faithful to what the
    rewrite would do.

    One combiner per batch (composite ``old * new_buckets + new``
    bincount) into ONE tiny ``groupby`` — the exchange is bounded by
    ``old_buckets × new_buckets`` rows per batch.  Returns a Dataset of
    ``(old_bucket, new_bucket, n_rows)``.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        k = np.asarray(t[key_col].combine_chunks()
                       if isinstance(t[key_col], pa.ChunkedArray)
                       else t[key_col]).astype(np.uint64)
        h = (k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(1)
        old = (h % np.uint64(old_buckets)).astype(np.int64)
        new = (h % np.uint64(new_buckets)).astype(np.int64)
        cnt = np.bincount(old * new_buckets + new,
                          minlength=old_buckets * new_buckets)
        nz = np.flatnonzero(cnt)
        return pa.table({
            "old_bucket": pa.array((nz // new_buckets).astype(np.int64)),
            "new_bucket": pa.array((nz % new_buckets).astype(np.int64)),
            "n": pa.array(cnt[nz].astype(np.int64))})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["old_bucket", "new_bucket"])
            .aggregate(Sum("n", alias_name="n_rows")))


def profit_by_nation_year(nation, supplier, lineitem, part,
                          name_substr: str = "widget"):
    """TPC-H-Q9-style product-type profit: per supplier nation × ship
    year, ``sum(revenue − cost)`` over line items of parts whose name
    contains ``name_substr`` — revenue is the house milli-revenue kernel
    (``floor(extendedprice·(1−discount)·1000)``), cost is the Q9
    ``supplycost·quantity`` term re-based on the part's retail price
    (this schema has no partsupp table): ``floor(retailprice·1000) ·
    quantity``.  Both terms are int64-exact and bit-identical to the SQL
    oracle, so the aggregate carries no float.

    Plan (no fact-fact exchange at all): part (filtered, ≤|part| rows of
    (key, retail_milli)) and supplier→nation (s_suppkey→n_name) collapse
    broadcast-side; lineitem streams ONCE through the two pyarrow hash
    joins and a per-batch (n_name, year) combiner; the only exchange is
    a ≤|nations·years|-row groupby Sum.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..arrowutil import one_chunk

    def filter_part(t: pa.Table) -> pa.Table:
        t = t.filter(pc.match_substring(t["p_name"], name_substr))
        retail = np.asarray(one_chunk(t["p_retailprice"]), dtype=np.float64)
        return pa.table({
            "p_partkey": t["p_partkey"],
            "retail_milli": pa.array(
                np.floor(retail * 1000.0).astype(np.int64))})

    parts_f = part.map_batches(filter_part, batch_format="pyarrow")
    supp_nat = broadcast_hash_join(
        supplier.select_columns(["s_suppkey", "s_nationkey"]), nation,
        on=["s_nationkey"], right_on=["n_nationkey"],
        project=["s_suppkey", "n_name"])

    def reduce_li(t: pa.Table) -> pa.Table:
        price = np.asarray(one_chunk(t["l_extendedprice"]), dtype=np.float64)
        disc = np.asarray(one_chunk(t["l_discount"]), dtype=np.float64)
        qty = np.asarray(one_chunk(t["l_quantity"]),
                         dtype=np.float64).astype(np.int64)
        rev = np.floor(price * (1.0 - disc) * 1000.0).astype(np.int64)
        yr = pc.cast(pc.year(t["l_shipdate"]), pa.int64())
        return pa.table({"l_partkey": t["l_partkey"],
                         "l_suppkey": t["l_suppkey"],
                         "rev": pa.array(rev), "qty": pa.array(qty),
                         "o_year": yr})

    li = broadcast_hash_join(
        lineitem.map_batches(reduce_li, batch_format="pyarrow"), parts_f,
        on=["l_partkey"], right_on=["p_partkey"],
        project=["l_suppkey", "rev", "qty", "o_year", "retail_milli"])
    li = broadcast_hash_join(
        li, supp_nat, on=["l_suppkey"], right_on=["s_suppkey"],
        project=["rev", "qty", "o_year", "retail_milli", "n_name"])

    def combine(t: pa.Table) -> pa.Table:
        rev = np.asarray(one_chunk(t["rev"]))
        cost = (np.asarray(one_chunk(t["retail_milli"]))
                * np.asarray(one_chunk(t["qty"])))
        g = pa.table({"n_name": t["n_name"], "o_year": t["o_year"],
                      "profit": pa.array(rev - cost)}) \
            .group_by(["n_name", "o_year"]).aggregate([("profit", "sum")])
        return g.select(["n_name", "o_year", "profit_sum"]) \
            .rename_columns(["n_name", "o_year", "profit"])

    return (li.map_batches(combine, batch_format="pyarrow")
            .groupby(["n_name", "o_year"])
            .aggregate(Sum("profit", alias_name="profit_milli")))


def cheapest_supplier_per_part(lineitem, part, max_size: int = 10):
    """TPC-H-Q2-style minimum-cost supplier: for every part with
    ``p_size ≤ max_size``, the supplier observed offering it at the
    lowest line price, ties broken by the smallest supplier key — a
    grouped lexicographic argmin over the fact table (this schema has no
    partsupp, so the offer set is the observed lineitem rows).

    The (price, suppkey) pair packs into one int64 composite
    (``price_milli·2²⁰ + suppkey``; both ranges asserted) so the whole
    argmin is a single ``groupby(partkey).Min`` after a per-batch
    ``group_by`` combiner — one exchange carrying ≤|parts| rows per
    batch, no sort, no window.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    from ..arrowutil import one_chunk

    keys = part.map_batches(
        lambda t: t.filter(pc.less_equal(t["p_size"], max_size)).select(
            ["p_partkey"]), batch_format="pyarrow")

    li = broadcast_hash_join(
        lineitem.select_columns(
            ["l_partkey", "l_suppkey", "l_extendedprice"]), keys,
        on=["l_partkey"], right_on=["p_partkey"], join_type="left semi")

    def combine(t: pa.Table) -> pa.Table:
        price = np.asarray(one_chunk(t["l_extendedprice"]),
                           dtype=np.float64)
        pm = np.floor(price * 1000.0).astype(np.int64)
        sk = np.asarray(one_chunk(t["l_suppkey"])).astype(np.int64)
        if len(sk):
            assert sk.min() >= 0 and sk.max() < (1 << 20), \
                "suppkey out of composite range"
            assert pm.min() >= 0 and pm.max() < (1 << 42), \
                "price_milli out of composite range"
        comp = pm * (1 << 20) + sk
        g = pa.table({"p_partkey": t["l_partkey"],
                      "comp": pa.array(comp)}) \
            .group_by("p_partkey").aggregate([("comp", "min")])
        return g.select(["p_partkey", "comp_min"]) \
            .rename_columns(["p_partkey", "comp"])

    best = (li.map_batches(combine, batch_format="pyarrow")
            .groupby("p_partkey").aggregate(Min("comp", alias_name="comp")))

    def decode(t: pa.Table) -> pa.Table:
        comp = np.asarray(one_chunk(t["comp"]))
        return pa.table({
            "p_partkey": t["p_partkey"],
            "best_price_milli": pa.array(comp >> 20),
            "best_suppkey": pa.array(comp & ((1 << 20) - 1))})

    return best.map_batches(decode, batch_format="pyarrow")


def supplier_counts_by_part_class(lineitem, part,
                                  exclude_brand: str = "Brand#1"):
    """TPC-H-Q16-style supplier counts: distinct suppliers observed per
    (brand, type, size) part class, excluding one brand — the canonical
    COUNT(DISTINCT) after a dimension join.

    Distinctness is per CLASS, not per part (two parts of one class
    sharing a supplier count that supplier once), so the part attributes
    attach broadcast-side FIRST, each batch dedups its (brand, type,
    size, suppkey) tuples with a pyarrow ``group_by``, and the one real
    shuffle is a groupby over those combiner-reduced tuples.  The final
    per-class count is a second, ≤|classes|-row exchange.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def filter_attrs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(pc.equal(t["p_brand"], exclude_brand)))
        return pa.table({"p_partkey": t["p_partkey"],
                         "p_brand": t["p_brand"], "p_type": t["p_type"],
                         "p_size": pc.cast(t["p_size"], pa.int64())})

    attrs = part.map_batches(filter_attrs, batch_format="pyarrow")

    joined = broadcast_hash_join(
        lineitem.select_columns(["l_partkey", "l_suppkey"]), attrs,
        on=["l_partkey"], right_on=["p_partkey"],
        project=["p_brand", "p_type", "p_size", "l_suppkey"])

    def distinct_tuples(t: pa.Table) -> pa.Table:
        return t.group_by(
            ["p_brand", "p_type", "p_size", "l_suppkey"]).aggregate([])

    tuples = (joined.map_batches(distinct_tuples, batch_format="pyarrow")
              .groupby(["p_brand", "p_type", "p_size", "l_suppkey"])
              .aggregate(Sum("l_suppkey", alias_name="_one")))

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by(["p_brand", "p_type", "p_size"]).aggregate(
            [([], "count_all")])
        return g.select(["p_brand", "p_type", "p_size", "count_all"]) \
            .rename_columns(["p_brand", "p_type", "p_size", "n"])

    return (tuples.map_batches(combine, batch_format="pyarrow")
            .groupby(["p_brand", "p_type", "p_size"])
            .aggregate(Sum("n", alias_name="supplier_cnt")))


def ship_latency_histogram(orders, lineitem, num_partitions: int = 32):
    """Order→ship latency distribution — (latency_days, n_items) where
    latency = epoch-day(l_shipdate) − epoch-day(o_orderdate) for every
    line item: the fulfillment-SLA histogram.

    Both sides project to (key, day) int64 pairs BEFORE the hash join
    (the only exchange that carries data); the joined stream collapses
    per batch to distinct-latency partials and ONE tiny groupby Sum —
    the histogram is latency-bounded, not row-bounded.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..arrowutil import one_chunk

    def _days(col, key, out):
        def fn(t: pa.Table) -> pa.Table:
            d = _i64(pc.cast(pc.cast(one_chunk(t[col]),
                                     pa.timestamp("us")), pa.int64())) \
                // 86_400_000_000
            return pa.table({key: t[key], out: pa.array(d)})
        return fn

    o = orders.map_batches(_days("o_orderdate", "o_orderkey", "oday"),
                           batch_format="pyarrow")
    l = lineitem.map_batches(_days("l_shipdate", "l_orderkey", "sday"),
                             batch_format="pyarrow")
    j = shuffle_hash_join(l, o, on="l_orderkey", right_on="o_orderkey",
                          num_partitions=num_partitions,
                          project=("oday", "sday"))

    def hist(t: pa.Table) -> pa.Table:
        lat = _i64(one_chunk(t["sday"])) - _i64(one_chunk(t["oday"]))
        uniq, cnt = np.unique(lat, return_counts=True)
        return pa.table({"latency_days": pa.array(uniq),
                         "n_items": pa.array(cnt.astype(np.int64))})

    return (j.map_batches(hist, batch_format="pyarrow")
            .groupby("latency_days")
            .aggregate(Sum("n_items", alias_name="n_items")))


def supplier_fill_rate(orders, lineitem, sla_days: int = 30,
                       num_partitions: int = 32):
    """Supplier fulfillment scorecard — per supplier, how many line
    items shipped within ``sla_days`` of the order date, as the exact
    (n_on_time, n_items) integer pair (consumers divide; no float rate
    crosses the wire).  Returns (l_suppkey, n_on_time, n_items).

    The projected hash join from :func:`ship_latency_histogram`, then
    a per-batch supplier combiner and ONE groupby Sum — the exchange
    carries two int64 counters per distinct supplier per batch.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..arrowutil import one_chunk

    def _days(col, keep):
        def fn(t: pa.Table) -> pa.Table:
            d = _i64(pc.cast(pc.cast(one_chunk(t[col]),
                                     pa.timestamp("us")), pa.int64())) \
                // 86_400_000_000
            out = {k: t[k] for k in keep}
            out["day"] = pa.array(d)
            return pa.table(out)
        return fn

    o = orders.map_batches(_days("o_orderdate", ["o_orderkey"]),
                           batch_format="pyarrow") \
        .map_batches(lambda t: t.rename_columns(["o_orderkey", "oday"]),
                     batch_format="pyarrow")
    l = lineitem.map_batches(_days("l_shipdate",
                                   ["l_orderkey", "l_suppkey"]),
                             batch_format="pyarrow") \
        .map_batches(lambda t: t.rename_columns(
            ["l_orderkey", "l_suppkey", "sday"]),
            batch_format="pyarrow")
    j = shuffle_hash_join(l, o, on="l_orderkey", right_on="o_orderkey",
                          num_partitions=num_partitions,
                          project=("l_suppkey", "oday", "sday"))

    def rate_partial(t: pa.Table) -> pa.Table:
        sk = np.asarray(one_chunk(t["l_suppkey"])).astype(np.int64)
        lat = _i64(one_chunk(t["sday"])) - _i64(one_chunk(t["oday"]))
        ok = (lat <= sla_days).astype(np.int64)
        uniq, inv = np.unique(sk, return_inverse=True)
        on_time = np.zeros(len(uniq), dtype=np.int64)
        n = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(on_time, inv, ok)
        np.add.at(n, inv, 1)
        return pa.table({"l_suppkey": pa.array(uniq),
                         "n_on_time": pa.array(on_time),
                         "n_items": pa.array(n)})

    return (j.map_batches(rate_partial, batch_format="pyarrow")
            .groupby("l_suppkey")
            .aggregate(Sum("n_on_time", alias_name="n_on_time"),
                       Sum("n_items", alias_name="n_items")))


def part_copurchase_pairs(lineitem, min_orders: int = 2,
                          stitch_shards: int = 32):
    """Market-basket pair mining — distinct part pairs bought together
    in one order, counted across orders, thresholded at ``min_orders``
    (the co-purchase lift numerator).  Returns
    (part_a, part_b, n_orders) with part_a < part_b.

    Baskets are tiny (a handful of line items per order), so the pair
    fan-out is quadratic only in BASKET size, never corpus size.
    Sorted-block plan: one sort on (orderkey, partkey); orders interior
    to a block expand to per-batch (pair → count) combiner partials,
    edge orders re-emit raw rows to orderkey-sharded stitch shards, and
    ONE pair-keyed groupby Sum merges.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..arrowutil import one_chunk
    from .stitch import sharded_stitch

    def _pairs(ok, pk):
        """Pair partial counts over arrays sorted by (order, part)."""
        starts = np.concatenate(
            [[0], np.nonzero(ok[1:] != ok[:-1])[0] + 1, [len(ok)]])
        pas, pbs = [], []
        for s, e in zip(starts[:-1], starts[1:]):
            parts = np.unique(pk[s:e])
            m = len(parts)
            if m < 2:
                continue
            ia, ib = np.triu_indices(m, k=1)
            pas.append(parts[ia])
            pbs.append(parts[ib])
        if not pas:
            z = np.empty(0, dtype=np.int64)
            return z, z, z
        pa_all = np.concatenate(pas)
        pb_all = np.concatenate(pbs)
        key = pa_all << np.int64(32) | pb_all
        uniq, cnt = np.unique(key, return_counts=True)
        return (uniq >> np.int64(32), uniq & ((1 << 32) - 1),
                cnt.astype(np.int64))

    def block_rows(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "part_a": pa.array([], type=pa.int64()),
            "part_b": pa.array([], type=pa.int64()),
            "n_orders": pa.array([], type=pa.int64()),
            "okey": pa.array([], type=pa.int64()),
            "boundary": pa.array([], type=pa.bool_())})
        n = t.num_rows
        if n == 0:
            return empty
        ok = np.asarray(one_chunk(t["l_orderkey"])).astype(np.int64)
        pk = np.asarray(one_chunk(t["l_partkey"])).astype(np.int64)
        change = np.nonzero(ok[1:] != ok[:-1])[0] + 1
        starts = np.concatenate([[0], change]).astype(np.int64)
        last = len(starts) - 1
        lo = starts[1] if last >= 1 else n
        hi = starts[last] if last >= 1 else 0
        if lo < hi:
            a, b, c = _pairs(ok[lo:hi], pk[lo:hi])
        else:
            a = b = c = np.empty(0, dtype=np.int64)
        edge_idx = np.concatenate([np.arange(0, lo),
                                   np.arange(hi, n)]) if last >= 1 \
            else np.arange(0, n)
        n_i, n_b = len(a), len(edge_idx)
        return pa.table({
            "part_a": pa.array(np.concatenate([a, pk[edge_idx]])),
            "part_b": pa.array(np.concatenate(
                [b, np.zeros(n_b, np.int64)])),
            "n_orders": pa.array(np.concatenate(
                [c, np.zeros(n_b, np.int64)])),
            "okey": pa.array(np.concatenate(
                [np.full(n_i, -1, np.int64), ok[edge_idx]])),
            "boundary": pa.array([False] * n_i + [True] * n_b)})

    def stitch(t: pa.Table) -> pa.Table:
        out = pa.table({"part_a": pa.array([], type=pa.int64()),
                        "part_b": pa.array([], type=pa.int64()),
                        "n_orders": pa.array([], type=pa.int64())})
        if t.num_rows == 0:
            return out
        ok = np.asarray(one_chunk(t["okey"])).astype(np.int64)
        pk = np.asarray(one_chunk(t["part_a"])).astype(np.int64)
        order = np.lexsort((pk, ok))
        a, b, c = _pairs(ok[order], pk[order])
        return pa.table({"part_a": pa.array(a), "part_b": pa.array(b),
                         "n_orders": pa.array(c)})

    srt = lineitem.map_batches(
        lambda t: t.select(["l_orderkey", "l_partkey"]),
        batch_format="pyarrow").sort(["l_orderkey", "l_partkey"])
    mixed = srt.map_batches(block_rows, batch_format="pyarrow",
                            batch_size=None).materialize()
    interior = mixed.map_batches(
        lambda t: t.filter(pc.equal(t["boundary"], False))
        .select(["part_a", "part_b", "n_orders"]),
        batch_format="pyarrow")
    carries = mixed.map_batches(
        lambda t: t.filter(t["boundary"]).select(["part_a", "okey"]),
        batch_format="pyarrow")
    cross = sharded_stitch(
        carries,
        lambda t: np.asarray(one_chunk(t["okey"])),
        stitch, num_shards=stitch_shards)
    agg = (interior.union(cross)
           .groupby(["part_a", "part_b"])
           .aggregate(Sum("n_orders", alias_name="n_orders")))
    return agg.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_orders"], min_orders)),
        batch_format="pyarrow")


def revenue_hhi_by_nation(nation, supplier, lineitem,
                          num_partitions: int = 32):
    """Supplier-concentration HHI per nation — the Herfindahl index of
    each nation's supplier revenue shares, in permille and EXACT:
    hhi‰ = ⌊1000 · Σrᵢ² / (Σrᵢ)²⌋ over milli-revenues, computed in
    Python big integers on the |suppliers|-bounded aggregate (the SQL
    mirror rides DuckDB HUGEINT — the :func:`host_rate_outliers`
    precedent for sums that outgrow int64).  Returns
    (n_name, hhi_permille, n_suppliers).

    Revenue kernel: floor(extendedprice·(1−discount)·1000), the repo
    convention.  One combiner groupby to (suppkey, revenue), a
    broadcast of the small supplier→nation dimension, then the
    bounded driver fold.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..arrowutil import one_chunk

    def rev_partial(t: pa.Table) -> pa.Table:
        ep = one_chunk(t["l_extendedprice"]).to_numpy(
            zero_copy_only=False).astype(np.float64)
        dc = one_chunk(t["l_discount"]).to_numpy(
            zero_copy_only=False).astype(np.float64)
        r = np.floor(ep * (1.0 - dc) * 1000.0).astype(np.int64)
        sk = np.asarray(one_chunk(t["l_suppkey"])).astype(np.int64)
        uniq, inv = np.unique(sk, return_inverse=True)
        s = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(s, inv, r)
        return pa.table({"l_suppkey": pa.array(uniq),
                         "rev": pa.array(s)})

    per_supp = (lineitem.map_batches(rev_partial,
                                     batch_format="pyarrow")
                .groupby("l_suppkey")
                .aggregate(Sum("rev", alias_name="rev"))
                .to_pandas())
    sup = supplier.select_columns(
        ["s_suppkey", "s_nationkey"]).to_pandas()
    nat = nation.select_columns(["n_nationkey", "n_name"]).to_pandas()
    j = per_supp.merge(sup, left_on="l_suppkey", right_on="s_suppkey") \
        .merge(nat, left_on="s_nationkey", right_on="n_nationkey")
    out_n, out_h, out_c = [], [], []
    for name, g in j.groupby("n_name"):
        revs = [int(v) for v in g["rev"]]
        tot = sum(revs)
        num = sum(v * v for v in revs)
        out_n.append(name)
        out_h.append(0 if tot == 0 else 1000 * num // (tot * tot))
        out_c.append(len(revs))
    return pa.table({
        "n_name": pa.array(out_n, type=pa.string()),
        "hhi_permille": pa.array(out_h, type=pa.int64()),
        "n_suppliers": pa.array(out_c, type=pa.int64())})


def bloom_semi_revenue(orders, lineitem, price_threshold: float = 200_000.0,
                       fpp: float = 0.01, num_partitions: int = 32):
    """Semi-join pushdown with a Bloom prefilter: revenue statistics of
    lineitems belonging to high-value orders (``o_totalprice ≥ T``),
    exact despite the approximate filter.

    The scale pattern: the filtered order-key set is hashed into a
    distributed :class:`~pdf2doi_ray.state.bloom.IntBloomFilter` (bit
    positions travel, never keys), broadcast once via ``ray.put``, and
    every lineitem batch drops bloom-negatives BEFORE the exchange —
    at selective thresholds that eliminates most of the big side's
    shuffle volume.  Bloom false positives are recovered by an exact
    hash join against the (unique-key) order side, so ANY fpp yields
    byte-identical results.  Returns
    (l_returnflag, n_items, sum_qty_milli, revenue_milli).
    """
    import ray
    from ray.data.aggregate import Count, Sum

    from ..state.bloom import build_int_bloom_distributed

    def hi_orders(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        mask = pc.greater_equal(t["o_totalprice"],
                                pa.scalar(price_threshold))
        return pa.table({"o_orderkey": t["o_orderkey"].filter(mask)})

    keys = orders.map_batches(hi_orders, batch_format="pyarrow") \
        .materialize()
    n_keys = max(1, keys.count())
    bloom_ref = ray.put(build_int_bloom_distributed(
        keys, "o_orderkey", n_items=n_keys, fpp=fpp))

    def prefilter(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        bf = ray.get(bloom_ref)
        ok = t["l_orderkey"].combine_chunks() if isinstance(
            t["l_orderkey"], pa.ChunkedArray) else t["l_orderkey"]
        mask = bf.contains_many(np.asarray(ok))
        kept = t.filter(pa.array(mask))
        qm = pc.cast(pc.floor(pc.multiply(kept["l_quantity"],
                                          pa.scalar(1000.0))), pa.int64())
        rm = pc.cast(pc.floor(pc.multiply(
            pc.multiply(kept["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), kept["l_discount"])),
            pa.scalar(1000.0))), pa.int64())
        return pa.table({"l_orderkey": kept["l_orderkey"],
                         "l_returnflag": kept["l_returnflag"],
                         "qty_milli": qm, "rev_milli": rm})

    survivors = lineitem.map_batches(prefilter, batch_format="pyarrow")
    # exact recovery join: o_orderkey is unique → inner ≡ left-semi
    verified = shuffle_hash_join(
        survivors, keys, on="l_orderkey", right_on="o_orderkey",
        num_partitions=num_partitions,
        project=["l_returnflag", "qty_milli", "rev_milli"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("l_returnflag").aggregate(
            [([], "count_all"), ("qty_milli", "sum"),
             ("rev_milli", "sum")])
        return pa.table({
            "l_returnflag": g["l_returnflag"],
            "n_p": g["count_all"].cast(pa.int64()),
            "q_p": g["qty_milli_sum"].cast(pa.int64()),
            "r_p": g["rev_milli_sum"].cast(pa.int64())})

    return (verified.map_batches(partial, batch_format="pyarrow")
            .groupby("l_returnflag")
            .aggregate(Sum("n_p", alias_name="n_items"),
                       Sum("q_p", alias_name="sum_qty_milli"),
                       Sum("r_p", alias_name="revenue_milli")))


def supplier_lead_quantiles(orders, lineitem,
                            quantiles_permille=(500, 900),
                            num_partitions: int = 32):
    """Per-supplier exact p50/p90 order→ship latency in days — the
    fulfilment-SLA scorecard.  One big×big hash join on the order key
    (both sides pre-projected to two int64 columns), then the grouped
    exact-quantile engine: latency's bounded day domain means the
    (supplier, latency) histogram exchange carries combiner rows, never
    line items.  Returns (l_suppkey, q_permille, value) with value in
    milli-days (day × 1000, the repo-wide milli grid).
    """
    from .aggs import value_quantiles_milli_by_group

    def li_proj(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "l_suppkey": t["l_suppkey"],
            "ship_day": pc.divide(pc.cast(pc.cast(
                t["l_shipdate"], pa.timestamp("us")), pa.int64()),
                pa.scalar(86_400_000_000))})

    def o_proj(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "order_day": pc.divide(pc.cast(pc.cast(
                t["o_orderdate"], pa.timestamp("us")), pa.int64()),
                pa.scalar(86_400_000_000))})

    joined = shuffle_hash_join(
        lineitem.map_batches(li_proj, batch_format="pyarrow"),
        orders.map_batches(o_proj, batch_format="pyarrow"),
        on="l_orderkey", right_on="o_orderkey",
        num_partitions=num_partitions)

    def latency(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "l_suppkey": t["l_suppkey"],
            "lat_days": pc.subtract(t["ship_day"], t["order_day"])})

    return value_quantiles_milli_by_group(
        joined.map_batches(latency, batch_format="pyarrow"),
        "l_suppkey", "lat_days", quantiles_permille)


def promo_revenue_share(part, lineitem, num_partitions: int = 32):
    """TPC-H Q14 shape over every month: the promo-type revenue share,
    ``(month, promo_rev_milli, total_rev_milli, promo_permille)``.

    Both join sides pre-project to the minimum columns (part to a 0/1
    promo flag); revenue milli-scales at the edge so the monthly sums
    and the permille share are exact integers.  The month-key groupby
    moves one combiner row per (month, batch).
    """
    from ray.data.aggregate import Sum

    def part_proj(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "p_partkey": t["p_partkey"],
            "is_promo": pc.cast(pc.equal(t["p_type"],
                                         pa.scalar("PROMO")),
                                pa.int64())})

    def li_proj(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        us = pc.cast(pc.cast(t["l_shipdate"], pa.timestamp("us")),
                     pa.int64())
        us_np = np.asarray(us.combine_chunks()
                           if isinstance(us, pa.ChunkedArray) else us)
        secs = us_np // 1_000_000
        days = secs // 86_400
        # month id = year*12 + (month-1), from the day index via numpy
        # datetime64 (exact calendar arithmetic, no float)
        months = (np.datetime64("1970-01-01") + days.astype(
            "timedelta64[D]")).astype("datetime64[M]").astype(np.int64)
        rm = pc.cast(pc.floor(pc.multiply(
            pc.multiply(t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"])),
            pa.scalar(1000.0))), pa.int64())
        return pa.table({"l_partkey": t["l_partkey"],
                         "month": pa.array(months),
                         "rev_milli": rm})

    joined = shuffle_hash_join(
        lineitem.map_batches(li_proj, batch_format="pyarrow"),
        part.map_batches(part_proj, batch_format="pyarrow"),
        on="l_partkey", right_on="p_partkey",
        num_partitions=num_partitions)

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        promo = pc.multiply(t["rev_milli"], t["is_promo"])
        g = pa.table({"month": t["month"], "p": promo,
                      "r": t["rev_milli"]}) \
            .group_by("month").aggregate([("p", "sum"), ("r", "sum")])
        return pa.table({"month": g["month"],
                         "p_p": g["p_sum"].cast(pa.int64()),
                         "r_p": g["r_sum"].cast(pa.int64())})

    def finalize(t: pa.Table) -> pa.Table:
        from ..arrowutil import one_chunk
        p = np.asarray(one_chunk(t["promo_rev_milli"]))
        r = np.asarray(one_chunk(t["total_rev_milli"]))
        share = 1000 * p // np.maximum(r, 1)
        return t.append_column("promo_permille", pa.array(share))

    return (joined.map_batches(partial, batch_format="pyarrow")
            .groupby("month")
            .aggregate(Sum("p_p", alias_name="promo_rev_milli"),
                       Sum("r_p", alias_name="total_rev_milli"))
            .map_batches(finalize, batch_format="pyarrow"))


def join_cardinality(left, right, left_key: str, right_key: str):
    """Optimizer-style EXACT join-size profile WITHOUT materializing
    the join: ``|A ⋈ B| = Σ_k c_A(k)·c_B(k)`` over per-key counts.
    Returns one row (join_rows, n_matched_keys, max_fanout).

    Both sides collapse to (key, count) with per-batch combiners, so
    the only exchange is a counts×counts hash join — the join's OUTPUT
    never exists anywhere, which is the point: sizing a 10^12-row join
    before paying for it.  ``max_fanout`` is the skew headline (the
    hot key's output contribution).
    """
    from ray.data.aggregate import Count, Max, Sum

    def counted(ds, key):
        def partial(t: pa.Table) -> pa.Table:
            g = t.select([key]).group_by(key).aggregate(
                [([], "count_all")])
            return pa.table({key: g[key],
                             "c_p": g["count_all"].cast(pa.int64())})
        return (ds.map_batches(partial, batch_format="pyarrow")
                .groupby(key).aggregate(Sum("c_p", alias_name="c")))

    joined = shuffle_hash_join(
        counted(left, left_key).map_batches(
            lambda t: t.rename_columns([left_key, "c_l"]),
            batch_format="pyarrow"),
        counted(right, right_key).map_batches(
            lambda t: t.rename_columns([right_key, "c_r"]),
            batch_format="pyarrow"),
        on=left_key, right_on=right_key, num_partitions=8)

    def product(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        p = pc.multiply(t["c_l"], t["c_r"])
        return pa.table({"p": p})

    out = joined.map_batches(product, batch_format="pyarrow") \
        .aggregate(Sum("p", alias_name="join_rows"),
                   Count(alias_name="n_matched_keys"),
                   Max("p", alias_name="max_fanout"))
    import pandas as pd
    return pd.DataFrame([{
        "join_rows": int(out["join_rows"]),
        "n_matched_keys": int(out["n_matched_keys"]),
        "max_fanout": int(out["max_fanout"])}])


def open_order_backlog(orders, lineitem, num_partitions: int = 8):
    """Daily open-order backlog series: for every day, how many orders
    have been placed but not yet fully shipped (open interval =
    order day → LAST lineitem ship day).  Interval stabbing via delta
    encoding: each order contributes (+1 at open, −1 after close), one
    tiny groupby(day) sums deltas, and the prefix sum over the dense
    bounded day domain (≈10³ days — the histogram-walk contract) runs
    in one block.  Days with zero open orders are omitted (inner-join
    semantics).  Returns (day, n_open).

    Exchanges: per-order Max(ship_day) combiner groupby + one
    counts-sized hash join orders⋈spans — line items collapse to one
    row per order BEFORE the join.
    """
    from ray.data.aggregate import Max, Sum

    def li_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        day = pc.divide(pc.cast(pc.cast(t["l_shipdate"],
                                        pa.timestamp("us")), pa.int64()),
                        pa.scalar(86_400_000_000))
        g = pa.table({"l_orderkey": t["l_orderkey"], "d": day}) \
            .group_by("l_orderkey").aggregate([("d", "max")])
        return pa.table({"l_orderkey": g["l_orderkey"],
                         "d_p": g["d_max"].cast(pa.int64())})

    last_ship = (lineitem.map_batches(li_partial, batch_format="pyarrow")
                 .groupby("l_orderkey")
                 .aggregate(Max("d_p", alias_name="end_day")))

    def o_proj(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "open_day": pc.divide(pc.cast(pc.cast(
                t["o_orderdate"], pa.timestamp("us")), pa.int64()),
                pa.scalar(86_400_000_000))})

    spans = shuffle_hash_join(
        orders.map_batches(o_proj, batch_format="pyarrow"), last_ship,
        on="o_orderkey", right_on="l_orderkey",
        num_partitions=num_partitions)

    def deltas(t: pa.Table) -> pa.Table:
        from ..arrowutil import one_chunk
        od = np.asarray(one_chunk(t["open_day"])).astype(np.int64)
        ed = np.asarray(one_chunk(t["end_day"])).astype(np.int64)
        # degenerate spans (shipped "before" ordered — dirty data) are
        # empty intervals: they must contribute nothing, not a negative
        # run over [ed+1, od)
        ok = od <= ed
        od, ed = od[ok], ed[ok]
        day = np.concatenate([od, ed + 1])
        dl = np.concatenate([np.ones(len(od), dtype=np.int64),
                             -np.ones(len(ed), dtype=np.int64)])
        g = pa.table({"day": pa.array(day), "dl": pa.array(dl)}) \
            .group_by("day").aggregate([("dl", "sum")])
        return pa.table({"day": g["day"],
                         "d_p": g["dl_sum"].cast(pa.int64())})

    def cumsum(t: pa.Table) -> pa.Table:
        from ..arrowutil import one_chunk
        if t.num_rows == 0:
            return pa.table({"day": pa.array([], type=pa.int64()),
                             "n_open": pa.array([], type=pa.int64())})
        day = np.asarray(one_chunk(t["day"]))
        dl = np.asarray(one_chunk(t["delta"]))
        order = np.argsort(day, kind="stable")
        day, dl = day[order], dl[order]
        # expand sparse delta days to the dense series
        lo, hi = int(day[0]), int(day[-1])
        dense = np.zeros(hi - lo + 1, dtype=np.int64)
        dense[day - lo] = dl
        run = np.cumsum(dense)
        keep = run > 0
        days = np.arange(lo, hi + 1, dtype=np.int64)[keep]
        return pa.table({"day": pa.array(days),
                         "n_open": pa.array(run[keep])})

    return (spans.map_batches(deltas, batch_format="pyarrow")
            .groupby("day").aggregate(Sum("d_p", alias_name="delta"))
            .repartition(1)
            .map_batches(cumsum, batch_format="pyarrow",
                         batch_size=None))


def revenue_yoy_growth(nation, supplier, lineitem):
    """Year-over-year revenue growth per supplier nation:
    (n_name, year, revenue_milli, prev_revenue_milli, growth_permille)
    for every year with an observed predecessor year — the board-slide
    analytic, growth as exact permille of the prior year.

    Same broadcast shape as Q9 (supplier→nation map rides the task
    closure; lineitem streams once, combiner per (nation, year)); the
    YoY delta is a per-nation sorted adjacency over the tiny
    |nations·years| aggregate — no window shuffle, no self-join.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..arrowutil import one_chunk

    sup = supplier.select_columns(["s_suppkey", "s_nationkey"]) \
        .to_pandas()
    nat = nation.select_columns(["n_nationkey", "n_name"]).to_pandas()
    s2n = dict(zip(
        sup["s_suppkey"],
        sup["s_nationkey"].map(
            dict(zip(nat["n_nationkey"], nat["n_name"])))))

    def partial(t: pa.Table) -> pa.Table:
        sk = np.asarray(one_chunk(t["l_suppkey"]))
        names = np.array([s2n.get(int(k), "") for k in
                          np.unique(sk)], dtype=object)
        uniq, inv = np.unique(sk, return_inverse=True)
        nm = names[inv]
        us = np.asarray(pc.cast(pc.cast(one_chunk(t["l_shipdate"]),
                                        pa.timestamp("us")),
                                pa.int64()))
        yr = 1970 + (us // 86_400_000_000).astype("timedelta64[D]") \
            .astype("datetime64[D]").astype("datetime64[Y]") \
            .astype(np.int64)
        rm = np.asarray(pc.cast(pc.floor(pc.multiply(
            pc.multiply(one_chunk(t["l_extendedprice"]),
                        pc.subtract(pa.scalar(1.0),
                                    one_chunk(t["l_discount"]))),
            pa.scalar(1000.0))), pa.int64()))
        g = pa.table({"n_name": pa.array(nm, type=pa.string()),
                      "year": pa.array(yr),
                      "rm": pa.array(rm)}) \
            .group_by(["n_name", "year"]).aggregate([("rm", "sum")])
        return pa.table({"n_name": g["n_name"], "year": g["year"],
                         "r_p": g["rm_sum"].cast(pa.int64())})

    def yoy(t: pa.Table) -> pa.Table:
        import pandas as pd
        df = t.to_pandas().sort_values(["n_name", "year"]) \
            .reset_index(drop=True)
        prev = df.groupby("n_name")["revenue_milli"].shift(1)
        prev_year = df.groupby("n_name")["year"].shift(1)
        keep = (df["year"] - prev_year) == 1
        out = df[keep].copy()
        out["prev_revenue_milli"] = prev[keep].astype("int64")
        num = (1000 * (out["revenue_milli"]
                       - out["prev_revenue_milli"])).to_numpy()
        den = out["prev_revenue_milli"].clip(lower=1).to_numpy()
        # TRUNCATING division (SQL // truncates; Python // floors —
        # they differ on negative growth)
        out["growth_permille"] = np.where(
            num >= 0, num // den, -((-num) // den)).astype("int64")
        return pa.Table.from_pandas(out.reset_index(drop=True),
                                    preserve_index=False)

    return (lineitem.map_batches(partial, batch_format="pyarrow")
            .groupby(["n_name", "year"])
            .aggregate(Sum("r_p", alias_name="revenue_milli"))
            .repartition(1)
            .map_batches(yoy, batch_format="pyarrow", batch_size=None))


def manifest_reconcile(left, right, on: str = "id",
                       left_flag: str = "has_left",
                       right_flag: str = "has_right",
                       num_partitions: int = 32):
    """Training-manifest reconciliation: FULL OUTER join two id manifests
    and report every id missing from either side — the pre-flight check
    a multi-artifact pipeline (text + embeddings, frames + captions)
    runs before training so one-sided rows fail loudly instead of
    silently dropping in an inner join downstream.

    One hash-partitioned full-outer exchange over (id, marker) rows —
    payloads never join; callers project to the key upstream.  Returns
    (id, has_left, has_right) for the NON-complete ids only (complete
    ids would dominate the output and carry no information).
    """
    import numpy as np

    def mark(col):
        def f(t: pa.Table) -> pa.Table:
            ids = t[on].combine_chunks().cast(pa.int64()) \
                if isinstance(t[on], pa.ChunkedArray) else t[on].cast(pa.int64())
            return pa.table({on: ids, col: pa.array(
                np.ones(t.num_rows, dtype=np.int64))})
        return f

    l = left.map_batches(mark("_l"), batch_format="pyarrow").materialize()
    r = right.map_batches(mark("_r"), batch_format="pyarrow").materialize()
    # this Ray build's hash join cannot take a zero-block side at all
    # (empty-block folding can't help when NO block exists): a one-sided
    # manifest degenerates to "every row of the other side is incomplete"
    if l.count() == 0 or r.count() == 0:
        def solo(flag_present, flag_absent):
            def f(t: pa.Table) -> pa.Table:
                import numpy as np
                return pa.table({
                    on: t[on],
                    left_flag: pa.array(np.full(
                        t.num_rows, 1 if flag_present == "_l" else 0,
                        dtype=np.int64)),
                    right_flag: pa.array(np.full(
                        t.num_rows, 1 if flag_present == "_r" else 0,
                        dtype=np.int64)),
                })
            return f
        if l.count() == 0 and r.count() == 0:
            import ray.data
            return ray.data.from_arrow(pa.table({
                on: pa.array([], type=pa.int64()),
                left_flag: pa.array([], type=pa.int64()),
                right_flag: pa.array([], type=pa.int64())}))
        side, flag = (r, "_r") if l.count() == 0 else (l, "_l")
        return side.map_batches(solo(flag, None), batch_format="pyarrow")
    joined = shuffle_hash_join(l, r, on=on, join_type="full_outer",
                               num_partitions=num_partitions)

    def emit(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        lv = pc.fill_null(t["_l"], 0)
        rv = pc.fill_null(t["_r"], 0)
        keep = pc.or_(pc.equal(lv, 0), pc.equal(rv, 0))
        out = pa.table({on: t[on],
                        left_flag: lv.cast(pa.int64()),
                        right_flag: rv.cast(pa.int64())})
        return out.filter(keep)

    return joined.map_batches(emit, batch_format="pyarrow")


def bitext_candidates(docs, key_col: str = "source", tol: int = 200,
                      num_partitions: int = 32):
    """Bitext-mining candidate pairs: documents under the SAME key
    (host/source) in DIFFERENT languages whose lengths differ by at most
    ``tol`` characters — the cheap structural prefilter every
    translation-pair miner (ccMatrix/WikiMatrix style) runs before
    paying for alignment scoring.  Returns (key, doc_a, doc_b, lang_a,
    lang_b, len_diff) with ``doc_a < doc_b``.

    Band-join plan: rows bucket by ``n_chars // tol``; the probe side
    replicates each row at buckets ``b−1, b, b+1`` (3× fan-out of
    16-byte key rows — texts never travel), so every pair within
    ``tol`` meets in EXACTLY one (key, bucket) partition of ONE
    :func:`shuffle_hash_join`; the ``doc_a < doc_b`` filter keeps one
    orientation, so no dedup pass is needed.  A hot key spreads over
    its length buckets instead of one reducer; within one (key, bucket)
    cell the join is the C++ hash join, not a Python pair loop.
    """
    import pyarrow.compute as pc

    from ..arrowutil import one_chunk

    def sides(t: pa.Table):
        n = pc.utf8_length(one_chunk(t["text"])).cast(pa.int64())
        b = pc.divide(n, tol)
        return pa.table({"key": t[key_col], "b": b,
                         "doc": one_chunk(t["doc_id"]).cast(pa.int64()),
                         "lg": t["lang"], "n": n})

    def probe_explode(t: pa.Table) -> pa.Table:
        base = sides(t)
        out = []
        for d in (-1, 0, 1):
            out.append(base.set_column(
                base.column_names.index("b"), "b",
                pc.add(base["b"], d)))
        return pa.concat_tables(out)

    left = docs.map_batches(
        lambda t: sides(t).rename_columns(
            ["key", "b", "doc_a", "lang_a", "n_a"]),
        batch_format="pyarrow")
    right = docs.map_batches(
        lambda t: probe_explode(t).rename_columns(
            ["key", "b", "doc_b", "lang_b", "n_b"]),
        batch_format="pyarrow")
    joined = shuffle_hash_join(left, right, on=("key", "b"),
                               num_partitions=num_partitions)

    def finish(t: pa.Table) -> pa.Table:
        da = np.asarray(one_chunk(t["doc_a"]))
        db = np.asarray(one_chunk(t["doc_b"]))
        na = np.asarray(one_chunk(t["n_a"]))
        nb = np.asarray(one_chunk(t["n_b"]))
        la = one_chunk(t["lang_a"]).to_numpy(zero_copy_only=False)
        lb = one_chunk(t["lang_b"]).to_numpy(zero_copy_only=False)
        keep = (da < db) & (la != lb) & (np.abs(na - nb) <= tol)
        sel = t.filter(pa.array(keep))
        return pa.table({
            "key": sel["key"],
            "doc_a": sel["doc_a"],
            "doc_b": sel["doc_b"],
            "lang_a": sel["lang_a"],
            "lang_b": sel["lang_b"],
            "len_diff": pc.abs(pc.subtract(sel["n_a"], sel["n_b"])),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


def suffix_prefix_overlap(docs, k: int = 8):
    """Document-reassembly detector: pairs where doc A's LAST ``k``
    tokens equal doc B's FIRST ``k`` tokens — the signature of one
    logical document split across crawl records (pagination,
    length-truncated fetches re-crawled with offset).  A near-dup pass
    misses these (the overlap is a sliver of either doc); this finds
    exactly the stitch points.

    One vectorized projection per batch (split → ``list_slice`` head /
    tail → ``binary_join``), then ONE hash join of tail-keys against
    head-keys on the token string itself (exact by construction — no
    hash-verify step needed); ``doc_a != doc_b`` drops self-loops.
    Docs shorter than ``k`` tokens emit nothing.  Returns
    (doc_a, doc_b, boundary_gram) where A's tail == B's head.
    """
    import pyarrow.compute as pc

    from ..arrowutil import one_chunk

    def ends(t: pa.Table, which: str) -> pa.Table:
        toks = pc.split_pattern(one_chunk(t["text"]), " ")
        n = np.asarray(pc.list_value_length(toks).cast(pa.int64()))
        ok = n >= k
        toks = toks.filter(pa.array(ok))
        ids = one_chunk(t["doc_id"]).filter(pa.array(ok))
        if toks.offset != 0:
            toks = pa.concat_arrays([toks])
        m = len(toks)
        if m == 0:
            return pa.table({"doc": pa.array([], type=pa.int64()),
                             "gram": pa.array([], type=pa.string())})
        offs = np.asarray(toks.offsets).astype(np.int64)
        # per-row slice start (list_slice can't take per-row starts):
        # gather the k head/tail token indices with one repeat+arange
        starts = offs[:-1] if which == "head" else offs[1:] - k
        idx = np.repeat(starts, k) + np.tile(np.arange(k), m)
        vals = toks.values.take(pa.array(idx))
        lists = pa.ListArray.from_arrays(
            pa.array(np.arange(m + 1, dtype=np.int64) * k,
                     type=pa.int32()), vals)
        return pa.table({"doc": ids.cast(pa.int64()),
                         "gram": pc.binary_join(lists, " ")})

    tails = docs.map_batches(
        lambda t: ends(t, "tail").rename_columns(["doc_a", "gram"]),
        batch_format="pyarrow")
    heads = docs.map_batches(
        lambda t: ends(t, "head").rename_columns(["doc_b", "gram"]),
        batch_format="pyarrow")
    joined = shuffle_hash_join(tails, heads, on=("gram",))

    def finish(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t["doc_a"], t["doc_b"])
        sel = t.filter(keep)
        return pa.table({"doc_a": sel["doc_a"], "doc_b": sel["doc_b"],
                         "boundary_gram": sel["gram"]})

    return joined.map_batches(finish, batch_format="pyarrow")
