"""SQL-window-function analogs: per-group top-k (``row_number() <= k``) and
per-key rolling frame aggregates (``ROWS BETWEEN w-1 PRECEDING AND CURRENT``).

Ray Data has neither; both decompose into the repo's two standard scalable
shapes:

* top-k: a per-batch COMBINER first (each batch keeps at most k rows per
  group — pandas C sort + ``groupby.head``), so the shuffle moves ≤ k rows
  per group per batch regardless of group skew; the final merge groups by a
  HASH BUCKET of the key (bounded task count, vectorized inside) instead of
  per-group ``map_groups`` (per-group scheduling overhead scales with group
  count — same rejection as ``graph.py``'s note).
* rolling: the sort-contract pattern shared with ``windows.session_counts``
  / ``asof.py`` — global sort on (key, ts, id), every row interior to a
  block (its w-1 predecessors are in-block) resolves vectorized via one
  cumsum; only the ≤ w-1 leading rows of each block's FIRST key segment plus
  the trailing w-1 rows of its LAST segment re-emit to the sharded stitch
  (``stitch.sharded_stitch``, keyed by the group key, so cross-block windows
  co-locate).

Rolling sums aggregate an INTEGER milli-scaled value (``floor(value*1000)``
— one IEEE multiply + floor, bit-identical in numpy and the SQL oracle), so
results are exact and hash-stable: float window sums would depend on
accumulation order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..arrowutil import one_chunk
from .stitch import DEFAULT_STITCH_SHARDS, sharded_stitch

TOPK_BUCKETS = 32


def grouped_top_k(ds, group_col: str, order_col: str, tie_col: str,
                  k: int, n_buckets: int = TOPK_BUCKETS):
    """Top ``k`` rows per ``group_col`` by ``order_col`` DESC, ties broken by
    ``tie_col`` ASC — i.e. ``row_number() OVER (PARTITION BY group ORDER BY
    order DESC, tie ASC) <= k``.  Output: group, rank (1-based), order, tie.

    (tie_col must be unique within a group for a deterministic result.)
    """
    cols = [group_col, order_col, tie_col]

    def _sorted_with_pos(t: pa.Table):
        """Arrow C sort on (group ASC, order DESC, tie ASC) + vectorized
        position-within-group (boundary mask → segment-start accumulate)."""
        st = t.sort_by([(group_col, "ascending"), (order_col, "descending"),
                        (tie_col, "ascending")])
        g = one_chunk(st[group_col])
        m = len(g)
        new_grp = np.ones(m, dtype=bool)
        if m > 1:
            ne = pc.fill_null(pc.not_equal(g.slice(1), g.slice(0, m - 1)),
                              True)
            new_grp[1:] = np.asarray(ne, dtype=bool)
        idx = np.arange(m, dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(new_grp, idx, 0))
        return st, idx - seg_start

    def partial(t: pa.Table) -> pa.Table:
        st, pos = _sorted_with_pos(t.select(cols))
        return st.filter(pa.array(pos < k))

    def bucket_of(t: pa.Table) -> np.ndarray:
        import pandas as pd

        col = one_chunk(t[group_col])
        if pa.types.is_integer(col.type):
            return np.asarray(col).astype(np.int64)
        return pd.util.hash_array(
            col.to_numpy(zero_copy_only=False)).astype(np.int64) \
            & np.int64(0x7FFFFFFFFFFFFFFF)

    def merge_bucket(t: pa.Table) -> pa.Table:
        st, pos = _sorted_with_pos(t)
        keep = pos < k
        st = st.filter(pa.array(keep))
        return st.append_column(
            "rank", pa.array(pos[keep] + 1, type=pa.int64())) \
            .select([group_col, "rank", order_col, tie_col])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    # ≤ k rows per group per batch survive; the bucketed merge is the same
    # sharded-stitch machinery the sorted-block operators use
    return sharded_stitch(partials, bucket_of, merge_bucket,
                          num_shards=n_buckets)


def _milli(vals) -> np.ndarray:
    # floor(value * 1000) as int64: multiply and floor are single IEEE-754
    # ops, so numpy and DuckDB produce the same integer for every double.
    # Nulls/NaNs are rejected LOUDLY: floor(NaN).astype(int64) silently
    # yields INT64_MIN and corrupts every downstream sum — callers must
    # filter or fill first (SQL aggregates skip NULLs; a silent skip here
    # would diverge from count(*), so the contract is explicit instead).
    arr = np.asarray(vals, dtype=np.float64)
    if np.isnan(arr).any():
        raise ValueError("_milli: null/NaN values in input — filter or "
                         "fill the value column before milli-scaling")
    return np.floor(arr * 1000.0).astype(np.int64)


def _rolling_for_segments(vm: np.ndarray, starts: np.ndarray,
                          ends: np.ndarray, w) -> np.ndarray:
    """Rolling w-row sums over concatenated segments [starts[j], ends[j]);
    ``w=None`` = unbounded preceding (running / prefix sums)."""
    n = len(vm)
    cc = np.concatenate([[0], np.cumsum(vm)])
    seg_start = np.repeat(starts, ends - starts)   # per-row segment start
    i = np.arange(n)
    lo = seg_start if w is None else np.maximum(i - (w - 1), seg_start)
    return cc[i + 1] - cc[lo]


def running_user_sum(events, stitch_shards: int = DEFAULT_STITCH_SHARDS):
    """Per-user running (prefix) sum — ``ROWS UNBOUNDED PRECEDING``.  Same
    sorted-block plan as :func:`rolling_user_sum` with an unbounded frame;
    the edge-segment re-emission already carries each boundary user's full
    event set, so the stitch is exact for any frame length."""
    return rolling_user_sum(events, w=None, stitch_shards=stitch_shards)


def rolling_user_sum(events, w=3,
                     stitch_shards: int = DEFAULT_STITCH_SHARDS):
    """Per-user rolling sum of ``floor(value*1000)`` over the last ``w``
    events (``w=None`` = all preceding) ordered by (ts, event_id) —
    ``SUM(vm) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN w-1 PRECEDING AND CURRENT ROW)``.
    Output: event_id, user_id, roll_sum (int64).
    """
    def kernel(vm, starts, ends):
        return _rolling_for_segments(vm, starts, ends, w), None

    return _windowed_user_op(events, kernel, "roll_sum", stitch_shards)


def rolling_time_user_sum(events, window_s: int = 3600,
                          stitch_shards: int = DEFAULT_STITCH_SHARDS):
    """Time-RANGE rolling sum — ``SUM(vm) OVER (PARTITION BY user_id
    ORDER BY ts RANGE BETWEEN window_s PRECEDING AND CURRENT ROW)``.

    Unlike the ROWS frames, the frame is defined by the order-key VALUES:
    every row in ``[ts-window, ts]`` counts, and rows sharing the current
    ts are peers (all included, even later-sorted ones) — exactly SQL
    RANGE semantics.  Kernel: per segment, two ``searchsorted`` probes
    against the segment's sorted ts array bound the frame and a prefix-sum
    difference evaluates it; the per-segment loop touches users, not rows,
    and every row's work stays vectorized.  Same sorted-block +
    boundary-stitch distribution as the ROWS frames (the stitch re-emits
    raw boundary rows with their timestamps, so any window length is
    exact across block edges).  Output: event_id, user_id, range_sum.
    """
    win_us = np.int64(window_s) * np.int64(1_000_000)

    def kernel(vm, starts, ends, ts):
        out = np.empty(len(vm), dtype=np.int64)
        cc = np.concatenate([[0], np.cumsum(vm)])
        for s, e in zip(starts, ends):
            seg = ts[s:e]
            lo = s + np.searchsorted(seg, seg - win_us, side="left")
            hi = s + np.searchsorted(seg, seg, side="right")
            out[s:e] = cc[hi] - cc[lo]
        return out, None

    return _windowed_user_op(events, kernel, "range_sum", stitch_shards,
                             needs_ts=True)


def lag_user_value(events, stitch_shards: int = DEFAULT_STITCH_SHARDS):
    """``LAG(vm) OVER (PARTITION BY user_id ORDER BY ts, event_id)`` over
    the milli-scaled value — NULL for each user's first event, exactly the
    SQL window function.  Same sorted-block + sharded-stitch plan as the
    rolling sums.  Output: event_id, user_id, lag_vm (nullable int64)."""
    def kernel(vm, starts, ends):
        out = np.zeros(len(vm), dtype=np.int64)
        if len(vm) > 1:
            out[1:] = vm[:-1]
        valid = np.ones(len(vm), dtype=bool)
        valid[starts] = False                  # first row of each segment
        return out, valid

    return _windowed_user_op(events, kernel, "lag_vm", stitch_shards)


def lead_user_value(events, stitch_shards: int = DEFAULT_STITCH_SHARDS):
    """``LEAD(vm) OVER (PARTITION BY user_id ORDER BY ts, event_id)`` —
    NULL for each user's LAST event.  Same engine as :func:`lag_user_value`
    with the shift reversed.  Output: event_id, user_id, lead_vm
    (nullable int64)."""
    def kernel(vm, starts, ends):
        out = np.zeros(len(vm), dtype=np.int64)
        if len(vm) > 1:
            out[:-1] = vm[1:]
        valid = np.ones(len(vm), dtype=bool)
        valid[np.asarray(ends) - 1] = False    # last row of each segment
        return out, valid

    return _windowed_user_op(events, kernel, "lead_vm", stitch_shards)


def _rank_kernel(dense: bool, mod):
    """Vectorized RANK / DENSE_RANK over concatenated segments, ordered by
    ``vm`` (or ``vm % mod``).  No per-segment Python: one global lexsort
    with segment id as the primary key keeps segments contiguous, tie runs
    resolve with a max-accumulated anchor (RANK) or a cumulative
    new-value count rebased per segment (DENSE_RANK), and results scatter
    back to row order.  Row order within a segment is irrelevant to a
    value-ordered rank, so the boundary stitch (which re-sorts by ts) is
    automatically consistent."""
    def kernel(vm, starts, ends):
        if mod is not None:
            if len(vm) and vm.min() < 0:
                raise ValueError(
                    "rank modulo ordering requires non-negative milli "
                    "values (numpy and SQL disagree on negative %)")
            key = vm % mod
        else:
            key = vm
        n = len(key)
        seg_id = np.repeat(np.arange(len(starts)), ends - starts)
        order = np.lexsort((key, seg_id))
        ks, ss = key[order], seg_id[order]
        idx = np.arange(n)
        new = np.ones(n, dtype=bool)
        if n > 1:
            new[1:] = (ks[1:] != ks[:-1]) | (ss[1:] != ss[:-1])
        if dense:
            newcount = np.cumsum(new)
            base = np.repeat(newcount[starts] - 1, ends - starts)
            r_sorted = (newcount - base).astype(np.int64)
        else:
            anchor = np.maximum.accumulate(np.where(new, idx, 0))
            seg_start = np.repeat(starts, ends - starts)
            r_sorted = (anchor - seg_start + 1).astype(np.int64)
        out = np.empty(n, dtype=np.int64)
        out[order] = r_sorted
        return out, None

    return kernel


def rank_user_value(events, mod=100,
                    stitch_shards: int = DEFAULT_STITCH_SHARDS):
    """``RANK() OVER (PARTITION BY user_id ORDER BY vm % mod)`` — ties
    share a rank, the next distinct value skips past them.  ``mod``
    coarsens the milli value so tie runs actually occur (``None`` ranks
    the exact milli value).  Output: event_id, user_id, rnk."""
    return _windowed_user_op(events, _rank_kernel(False, mod), "rnk",
                             stitch_shards)


def dense_rank_user_value(events, mod=100,
                          stitch_shards: int = DEFAULT_STITCH_SHARDS):
    """``DENSE_RANK()`` twin of :func:`rank_user_value` — no gaps after
    tie runs.  Output: event_id, user_id, drnk."""
    return _windowed_user_op(events, _rank_kernel(True, mod), "drnk",
                             stitch_shards)


def row_number_user(events, stitch_shards: int = DEFAULT_STITCH_SHARDS):
    """``ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)``
    — unique 1..n position per user.  The kernel is position-in-segment;
    (ts, event_id) uniqueness makes it deterministic.  Output: event_id,
    user_id, rn."""
    def kernel(vm, starts, ends):
        idx = np.arange(len(vm))
        seg_start = np.repeat(starts, ends - starts)
        return (idx - seg_start + 1).astype(np.int64), None

    return _windowed_user_op(events, kernel, "rn", stitch_shards)


def _windowed_user_op(events, kernel, out_col: str,
                      stitch_shards: int = DEFAULT_STITCH_SHARDS,
                      needs_ts: bool = False):
    """Shared engine of the per-user ordered window functions.

    Sorted-block plan: sort (user_id, ts, event_id); rows of users fully
    interior to a block resolve with one vectorized ``kernel(vm, starts,
    ends) -> (values, valid_mask_or_None)`` call; each block's edge
    segments (first and last user) re-emit raw (user_id, ts, event_id, vm)
    rows to the per-user sharded stitch, which lexsorts and reruns the
    SAME kernel — so any per-segment window function gets the distributed
    plan for free.  ``needs_ts=True`` kernels take a fourth argument, the
    rows' epoch-µs timestamps in segment order — RANGE (time-windowed)
    frames need the order-key VALUES, not just positions.
    """
    def block_roll(t: pa.Table) -> pa.Table:
        n = t.num_rows
        empty = pa.table({
            "event_id": pa.array([], type=pa.int64()),
            "user_id": pa.array([], type=pa.int64()),
            out_col: pa.array([], type=pa.int64()),
            "ts_us": pa.array([], type=pa.int64()),
            "vm": pa.array([], type=pa.int64()),
            "boundary": pa.array([], type=pa.bool_())})
        if n == 0:
            return empty
        us = np.asarray(one_chunk(t["user_id"])).astype(np.int64)
        eid = np.asarray(one_chunk(t["event_id"])).astype(np.int64)
        ts = np.asarray(pc.cast(pc.cast(one_chunk(t["ts"]),
                                        pa.timestamp("us")), pa.int64()))
        vm = _milli(one_chunk(t["value"]))
        change = np.nonzero(us[1:] != us[:-1])[0] + 1
        starts = np.concatenate([[0], change]).astype(np.int64)
        ends = np.concatenate([change, [n]]).astype(np.int64)
        last = len(starts) - 1
        interior = np.arange(1, last) if last >= 1 else np.empty(0, dtype=int)
        if len(interior):
            # interior segments are contiguous in a sorted block: one slice
            i_starts, i_ends = starts[interior], ends[interior]
            idx = np.arange(ends[0], starts[last])
            args = (ts[idx],) if needs_ts else ()
            roll, valid = kernel(vm[idx], i_starts - ends[0],
                                 i_ends - ends[0], *args)
        else:
            idx = np.empty(0, dtype=np.int64)
            roll = np.empty(0, dtype=np.int64)
            valid = None
        edge_idx = np.concatenate(
            [np.arange(starts[0], ends[0]),
             np.arange(starts[last], ends[last])]) if last >= 1 \
            else np.arange(starts[0], ends[0])
        edge_idx = np.unique(edge_idx)
        n_i, n_b = len(idx), len(edge_idx)
        out_valid = None
        if valid is not None:
            out_valid = np.concatenate([valid, np.ones(n_b, dtype=bool)])
        return pa.table({
            "event_id": pa.array(np.concatenate([eid[idx], eid[edge_idx]])),
            "user_id": pa.array(np.concatenate([us[idx], us[edge_idx]])),
            out_col: pa.array(
                np.concatenate([roll, np.full(n_b, -1, np.int64)]),
                mask=(None if out_valid is None else ~out_valid)),
            "ts_us": pa.array(
                np.concatenate([np.full(n_i, -1, np.int64), ts[edge_idx]])),
            "vm": pa.array(
                np.concatenate([np.full(n_i, 0, np.int64), vm[edge_idx]])),
            "boundary": pa.array([False] * n_i + [True] * n_b),
        })

    def stitch(t: pa.Table) -> pa.Table:
        us = np.asarray(one_chunk(t["user_id"])).astype(np.int64)
        if len(us) == 0:
            return pa.table({"event_id": pa.array([], type=pa.int64()),
                             "user_id": pa.array([], type=pa.int64()),
                             out_col: pa.array([], type=pa.int64())})
        eid = np.asarray(one_chunk(t["event_id"])).astype(np.int64)
        ts = np.asarray(one_chunk(t["ts_us"])).astype(np.int64)
        vm = np.asarray(one_chunk(t["vm"])).astype(np.int64)
        order = np.lexsort((eid, ts, us))
        us, eid, vm, ts = us[order], eid[order], vm[order], ts[order]
        change = np.nonzero(us[1:] != us[:-1])[0] + 1
        starts = np.concatenate([[0], change]).astype(np.int64)
        ends = np.concatenate([change, [len(us)]]).astype(np.int64)
        roll, valid = kernel(vm, starts, ends,
                             *((ts,) if needs_ts else ()))
        return pa.table({"event_id": pa.array(eid),
                         "user_id": pa.array(us),
                         out_col: pa.array(
                             roll,
                             mask=(None if valid is None else ~valid))})

    srt = events.sort(["user_id", "ts", "event_id"])
    mixed = srt.map_batches(block_roll, batch_format="pyarrow",
                            batch_size=None).materialize()
    interior = mixed.map_batches(
        lambda t: t.filter(pc.equal(t["boundary"], False))
        .select(["event_id", "user_id", out_col]),
        batch_format="pyarrow")
    carries = mixed.map_batches(
        lambda t: t.filter(t["boundary"])
        .select(["event_id", "user_id", "ts_us", "vm"]),
        batch_format="pyarrow")
    cross = sharded_stitch(
        carries,
        lambda t: np.asarray(one_chunk(t["user_id"])).astype(np.int64),
        stitch, num_shards=stitch_shards)
    return interior.union(cross)


def ntile_user(events, n: int = 4,
               stitch_shards: int = DEFAULT_STITCH_SHARDS):
    """``NTILE(n) OVER (PARTITION BY user_id ORDER BY ts, event_id)`` —
    rows split into ``n`` buckets as evenly as possible, the first
    ``len % n`` buckets one row larger (the SQL distribution rule, which
    differs from the naive ``i*n//len`` even spread).  Same sorted-block
    engine as the other window functions.  Output: event_id, user_id,
    tile (int64)."""
    def kernel(vm, starts, ends):
        lens = ends - starts
        pos = np.arange(len(vm)) - np.repeat(starts, lens)  # 0-based
        L = np.repeat(lens, lens)
        q, r = L // n, L % n
        big = r * (q + 1)                   # rows in the enlarged tiles
        in_big = pos < big
        tile = np.where(
            in_big,
            pos // np.maximum(q + 1, 1),
            r + np.where(q > 0, (pos - big) // np.maximum(q, 1), 0),
        ) + 1
        return tile.astype(np.int64), None

    return _windowed_user_op(events, kernel, "tile", stitch_shards)


def first_value_user(events, stitch_shards: int = DEFAULT_STITCH_SHARDS):
    """``FIRST_VALUE(vm) OVER (PARTITION BY user_id ORDER BY ts,
    event_id)`` — every row carries its user's earliest milli value.
    Kernel: one gather of ``vm[starts]`` repeated across each segment.
    Output: event_id, user_id, first_vm (int64)."""
    def kernel(vm, starts, ends):
        return np.repeat(vm[starts], ends - starts), None

    return _windowed_user_op(events, kernel, "first_vm", stitch_shards)


def last_value_user(events, stitch_shards: int = DEFAULT_STITCH_SHARDS):
    """``LAST_VALUE(vm) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)`` — the SQL
    default frame stops at CURRENT ROW, so the oracle must widen it; this
    returns each user's final milli value on every row.  Output:
    event_id, user_id, last_vm (int64)."""
    def kernel(vm, starts, ends):
        return np.repeat(vm[np.asarray(ends) - 1], ends - starts), None

    return _windowed_user_op(events, kernel, "last_vm", stitch_shards)


def _value_order_stats_kernel(mod, stat: str):
    """Shared kernel for PERCENT_RANK / CUME_DIST over concatenated
    segments ordered by ``vm % mod`` — same lexsort + tie-run machinery
    as :func:`_rank_kernel`, emitting integer permille so the SQL oracle
    ((rank-1)*1000 // max(n-1,1), resp. 1000*count_le // n) matches
    bit-for-bit with no float quantile in sight."""
    def kernel(vm, starts, ends):
        if mod is not None:
            if len(vm) and vm.min() < 0:
                raise ValueError(
                    "permille order stats modulo ordering requires "
                    "non-negative milli values (numpy and SQL disagree "
                    "on negative %)")
            key = vm % mod
        else:
            key = vm
        n = len(key)
        if n == 0:
            return np.empty(0, dtype=np.int64), None
        lens = ends - starts
        seg_id = np.repeat(np.arange(len(starts)), lens)
        L = np.repeat(lens, lens)
        order = np.lexsort((key, seg_id))
        ks, ss = key[order], seg_id[order]
        idx = np.arange(n)
        new = np.ones(n, dtype=bool)
        if n > 1:
            new[1:] = (ks[1:] != ks[:-1]) | (ss[1:] != ss[:-1])
        seg_start = np.repeat(starts, lens)
        if stat == "percent_rank":
            anchor = np.maximum.accumulate(np.where(new, idx, 0))
            rank = (anchor - seg_start + 1).astype(np.int64)
            val_sorted = (rank - 1) * 1000 // np.maximum(L - 1, 1)
        else:                                   # cume_dist
            run_id = np.cumsum(new) - 1
            run_first = np.nonzero(new)[0]
            run_last = np.concatenate([run_first[1:] - 1, [n - 1]])
            cnt_le = (run_last[run_id] - seg_start + 1).astype(np.int64)
            val_sorted = cnt_le * 1000 // L
        out = np.empty(n, dtype=np.int64)
        out[order] = val_sorted
        return out, None

    return kernel


def percent_rank_user_value(events, mod=100,
                            stitch_shards: int = DEFAULT_STITCH_SHARDS):
    """``PERCENT_RANK() OVER (PARTITION BY user_id ORDER BY vm % mod)``
    as exact integer permille: (rank-1)·1000 // max(n-1, 1) — 0 for
    single-row partitions, 1000 for the top of every larger one.
    Output: event_id, user_id, pr_permille."""
    return _windowed_user_op(events,
                             _value_order_stats_kernel(mod, "percent_rank"),
                             "pr_permille", stitch_shards)


def cume_dist_user_value(events, mod=100,
                         stitch_shards: int = DEFAULT_STITCH_SHARDS):
    """``CUME_DIST()`` twin: 1000·|rows with key ≤ mine| // n, ties
    counted through their whole run (SQL RANGE-frame semantics).
    Output: event_id, user_id, cume_permille."""
    return _windowed_user_op(events,
                             _value_order_stats_kernel(mod, "cume_dist"),
                             "cume_permille", stitch_shards)


def ratio_to_report(events, group_col: str = "event_type",
                    value_col: str = "value",
                    id_col: str = "event_id"):
    """RATIO_TO_REPORT window parity: every row's share of its group's
    total, as exact integer permille over milli-scaled values
    (`v_milli * 1000 // S_milli`).  Groups with non-positive totals are
    rejected loudly (a share of a zero/negative total is ill-defined).

    Plan: per-batch (group, sum) combiner → ONE tiny ``groupby`` → the
    group-total table broadcasts via ``ray.put`` and every batch joins
    it locally (pyarrow hash join) — rows never shuffle.  Group count is
    schema-small by contract (event types, langs); corpus-cardinality
    groups should use a shuffle join instead (same split as elsewhere).

    Returns ``(id, group, value_milli, share_permille)``.
    """
    import ray

    from ray.data.aggregate import Sum

    from ..arrowutil import collect_tables, one_chunk

    def total_partial(t: pa.Table) -> pa.Table:
        vm = _milli(one_chunk(t[value_col]))
        g = pa.table({"group": t[group_col], "s": pa.array(vm)}) \
            .group_by("group").aggregate([("s", "sum")])
        return g.rename_columns(["group", "s"])

    totals = collect_tables(
        events.map_batches(total_partial, batch_format="pyarrow")
        .groupby("group").aggregate(Sum("s", alias_name="s")))
    s_np = np.asarray(totals["s"], dtype=np.int64)
    if (s_np <= 0).any():
        raise ValueError("ratio_to_report: non-positive group total")
    tot_ref = ray.put(totals)

    def share(t: pa.Table) -> pa.Table:
        vm = _milli(one_chunk(t[value_col]))
        j = pa.table({"id": t[id_col], "group": t[group_col],
                      "value_milli": pa.array(vm)}) \
            .join(ray.get(tot_ref), keys=["group"])
        v = np.asarray(one_chunk(j["value_milli"]), dtype=np.int64)
        s = np.asarray(one_chunk(j["s"]), dtype=np.int64)
        return pa.table({"id": j["id"], "group": j["group"],
                         "value_milli": j["value_milli"],
                         "share_permille": pa.array(v * 1000 // s)})

    return events.map_batches(share, batch_format="pyarrow")


def max_burst_per_user(events, window_s: int = 60,
                       stitch_shards: int = DEFAULT_STITCH_SHARDS):
    """Peak request burst per user: the maximum number of a user's
    events inside any trailing ``window_s`` time window — the
    rate-limit / abuse-detection statistic, with exact SQL RANGE-frame
    semantics (``COUNT(*) OVER (... RANGE window PRECEDING)`` then a
    per-user MAX).

    The per-row frame count is two ``searchsorted`` probes per user
    segment on the shared :func:`_windowed_user_op` engine (frames are
    exact across block edges via the boundary stitch); the per-user max
    is one combiner groupby.  Output: (user_id, max_burst).
    """
    from ray.data.aggregate import Max

    win_us = np.int64(window_s) * np.int64(1_000_000)

    def kernel(vm, starts, ends, ts):
        out = np.empty(len(vm), dtype=np.int64)
        for s, e in zip(starts, ends):
            seg = ts[s:e]
            lo = np.searchsorted(seg, seg - win_us, side="left")
            hi = np.searchsorted(seg, seg, side="right")
            out[s:e] = hi - lo
        return out, None

    per_row = _windowed_user_op(events, kernel, "burst", stitch_shards,
                                needs_ts=True)

    def combine(t: pa.Table) -> pa.Table:
        g = t.select(["user_id", "burst"]).group_by("user_id") \
            .aggregate([("burst", "max")])
        return g.select(["user_id", "burst_max"]) \
            .rename_columns(["user_id", "burst"])

    return (per_row.map_batches(combine, batch_format="pyarrow")
            .groupby("user_id").aggregate(Max("burst",
                                              alias_name="max_burst")))


def grouped_top_k_ties(ds, group_col: str, order_col: str, k: int,
                       n_buckets: int = TOPK_BUCKETS):
    """``RANK() OVER (PARTITION BY group ORDER BY order DESC) <= k`` —
    the ties-keep-all variant of :func:`grouped_top_k` (row_number
    semantics): every row whose ORDER VALUE ties a kept value survives,
    so the output per group can exceed ``k`` exactly when SQL's RANK
    does.

    Same combiner-first plan: the per-batch partial keeps each group's
    rows with rank ≤ k (rank = 1 + count of DISTINCT greater values,
    computed vectorized from the sorted block's value-change mask), so a
    batch forwards at most k distinct values per group (ties included);
    the bucketed merge re-ranks whole groups.  Returns (group, rank,
    order) with rank the SQL RANK value.
    """

    def _sorted_rank(t: pa.Table):
        st = t.sort_by([(group_col, "ascending"),
                        (order_col, "descending")])
        g = one_chunk(st[group_col])
        v = one_chunk(st[order_col])
        m = len(g)
        new_grp = np.ones(m, dtype=bool)
        new_val = np.ones(m, dtype=bool)
        if m > 1:
            ne_g = pc.fill_null(pc.not_equal(g.slice(1), g.slice(0, m - 1)),
                                True)
            ne_v = pc.fill_null(pc.not_equal(v.slice(1), v.slice(0, m - 1)),
                                True)
            new_grp[1:] = np.asarray(ne_g, dtype=bool)
            new_val[1:] = np.asarray(ne_v, dtype=bool) | new_grp[1:]
        idx = np.arange(m, dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(new_grp, idx, 0))
        # SQL RANK: 1 + number of group rows STRICTLY ABOVE this row's
        # value = position of this value-segment's first row within the
        # group (dense_rank would count distinct values instead)
        val_start = np.maximum.accumulate(np.where(new_val, idx, 0))
        rank = val_start - seg_start + 1
        return st, rank

    def partial(t: pa.Table) -> pa.Table:
        st, rank = _sorted_rank(t.select([group_col, order_col]))
        return st.filter(pa.array(rank <= k))

    def bucket_of(t: pa.Table) -> np.ndarray:
        import pandas as pd

        col = one_chunk(t[group_col])
        if pa.types.is_integer(col.type):
            return np.asarray(col).astype(np.int64)
        return pd.util.hash_array(
            col.to_numpy(zero_copy_only=False)).astype(np.int64) \
            & np.int64(0x7FFFFFFFFFFFFFFF)

    def merge_bucket(t: pa.Table) -> pa.Table:
        st, rank = _sorted_rank(t)
        keep = rank <= k
        st = st.filter(pa.array(keep))
        return st.append_column(
            "rank", pa.array(rank[keep], type=pa.int64())) \
            .select([group_col, "rank", order_col])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return sharded_stitch(partials, bucket_of, merge_bucket,
                          num_shards=n_buckets)
