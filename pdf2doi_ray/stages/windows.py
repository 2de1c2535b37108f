"""Windowed / session aggregates over the ``events`` stream table.

Ray Data has no event-time windowing; these operators implement the two
standard shapes explicitly (ray_guide: streaming-shaped workloads):

* tumbling windows: assign ``window = floor(epoch(ts)/size)`` in a vectorized
  ``map_batches``, pre-aggregate per batch (combiner), then a small composite
  groupby.  Only (key, window) partials shuffle.
* session windows: ``groupby(user_id).map_groups`` over ts-sorted groups with
  a gap rule — the partitioning assumption is one user's events fit one group.

Aggregates are min/max/count (exact, order-independent) so results are
hash-identical to the SQL oracle — no float accumulation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .stitch import DEFAULT_STITCH_SHARDS, sharded_stitch
from ..arrowutil import one_chunk

TUMBLE_SECONDS = 3600
SESSION_GAP_SECONDS = 1800


def tumbling_counts(events, window_s: int = TUMBLE_SECONDS):
    """(event_type, window) → n_events, min/max value."""
    from ray.data.aggregate import Count, Max, Min, Sum

    def assign(t: pa.Table) -> pa.Table:
        # floor division on the raw microsecond value: pc.divide truncates
        # toward zero, which mis-assigns pre-1970 (negative-epoch) events;
        # floor(floor(us/1e6)/W) == floor(us/(W*1e6)) for positive divisors,
        # so this matches the oracle's floor(epoch(ts)/W) exactly
        us = np.asarray(pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                                pa.int64()))
        window = pa.array(us // (window_s * 1_000_000), type=pa.int64())
        tbl = pa.table({"event_type": t["event_type"], "window": window,
                        "value": t["value"]})
        g = tbl.group_by(["event_type", "window"]).aggregate(
            [("value", "count"), ("value", "min"), ("value", "max")])
        return g.select(["event_type", "window", "value_count",
                         "value_min", "value_max"]).rename_columns(
            ["event_type", "window", "n", "vmin", "vmax"])

    partials = events.map_batches(assign, batch_format="pyarrow")
    return (partials.groupby(["event_type", "window"])
            .aggregate(Sum("n", alias_name="n_events"),
                       Min("vmin", alias_name="min_value"),
                       Max("vmax", alias_name="max_value")))


def sliding_counts(events, window_s: int = TUMBLE_SECONDS, slide_s: int = 900):
    """Sliding windows (size W, slide S, W divisible by S): each event lands
    in W/S windows — vectorized explode per batch + combiner + small
    composite groupby.  ``window_slot`` is the window's start in units of S.
    """
    assert window_s % slide_s == 0
    k = window_s // slide_s
    from ray.data.aggregate import Sum

    def explode(t: pa.Table) -> pa.Table:
        # single int floor division (see tumbling_counts: truncation-safe
        # for negative epochs)
        epoch = np.asarray(pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                                   pa.int64())) // (slide_s * 1_000_000)
        types = np.asarray(t["event_type"])
        slots = (epoch[:, None] - np.arange(k)[None, :]).ravel()
        types_r = np.repeat(types, k)
        tbl = pa.table({"event_type": pa.array(types_r),
                        "window_slot": pa.array(slots, type=pa.int64())})
        g = tbl.group_by(["event_type", "window_slot"]).aggregate(
            [("window_slot", "count")])
        return g.select(["event_type", "window_slot", "window_slot_count"]) \
            .rename_columns(["event_type", "window_slot", "n"])

    return (events.map_batches(explode, batch_format="pyarrow")
            .groupby(["event_type", "window_slot"])
            .aggregate(Sum("n", alias_name="n_events")))


def session_counts(events, gap_s: int = SESSION_GAP_SECONDS,
                   stitch_shards: int = DEFAULT_STITCH_SHARDS):
    """Per-user session statistics (gap-based session windows).

    Vectorized sorted-block sessionization (round 2; replaces a per-user
    pandas ``map_groups`` whose per-group overhead scales with user count):
    events sort on ``(user_id, ts)``; each sorted block detects its user
    boundaries with one numpy comparison and computes ``n_events`` /
    ``n_sessions`` for every user fully interior to the block via a cumsum
    over gap flags — users interior to a sorted block are provably complete
    (sorted keys are globally contiguous).  Only the (≤2 per block) edge
    users' event rows are re-emitted and stitched, sharded by
    ``user_id % P`` (round 3; every edge row of a user co-locates, so the
    per-shard lexsort+cumsum is exact).  A single pathological user still
    bounds one shard (pre-split such users by day upstream).
    """
    gap_us = gap_s * 1_000_000

    def _per_group(us, ts, starts, ends):
        """(user, n_events, n_sessions) arrays for the given group slices."""
        flags = ((ts[1:] - ts[:-1]) > gap_us) & (us[1:] == us[:-1])
        cf = np.concatenate([[0], np.cumsum(flags)])
        ne = ends - starts
        nsess = 1 + cf[ends - 1] - cf[starts]
        return us[starts], ne.astype(np.int64), nsess.astype(np.int64)

    def block_sessions(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "user_id": pa.array([], type=pa.int64()),
            "n_events": pa.array([], type=pa.int64()),
            "n_sessions": pa.array([], type=pa.int64()),
            "ts": pa.array([], type=pa.int64()),
            "boundary": pa.array([], type=pa.bool_())})
        n = t.num_rows
        if n == 0:
            return empty
        us = np.asarray(t["user_id"].combine_chunks()
                        if isinstance(t["user_id"], pa.ChunkedArray)
                        else t["user_id"]).astype(np.int64)
        # normalize to MICROseconds first: pandas-sourced datasets carry
        # ns-precision timestamps and a bare int64 cast would inflate gaps
        ts_col = t["ts"].combine_chunks() if isinstance(t["ts"], pa.ChunkedArray) \
            else t["ts"]
        ts = np.asarray(pc.cast(pc.cast(ts_col, pa.timestamp("us")),
                                pa.int64()))
        change = np.nonzero(us[1:] != us[:-1])[0] + 1
        starts = np.concatenate([[0], change]).astype(np.int64)
        ends = np.concatenate([change, [n]]).astype(np.int64)
        last = len(starts) - 1
        interior = np.arange(1, last) if last >= 1 else np.empty(0, dtype=int)
        iu, ine, insess = _per_group(us, ts, starts[interior], ends[interior]) \
            if len(interior) else (np.empty(0, np.int64),) * 3
        # edge users: re-emit raw event rows for the stitch
        edge_idx = np.concatenate(
            [np.arange(starts[0], ends[0]),
             np.arange(starts[last], ends[last])]) if last >= 1 \
            else np.arange(starts[0], ends[0])
        edge_idx = np.unique(edge_idx)
        n_i, n_b = len(iu), len(edge_idx)
        return pa.table({
            "user_id": pa.array(np.concatenate([iu, us[edge_idx]])),
            "n_events": pa.array(
                np.concatenate([ine, np.full(n_b, -1, np.int64)])),
            "n_sessions": pa.array(
                np.concatenate([insess, np.full(n_b, -1, np.int64)])),
            "ts": pa.array(
                np.concatenate([np.full(n_i, -1, np.int64), ts[edge_idx]])),
            "boundary": pa.array([False] * n_i + [True] * n_b),
        })

    def stitch(t: pa.Table) -> pa.Table:
        us = np.asarray(t["user_id"].combine_chunks()
                        if isinstance(t["user_id"], pa.ChunkedArray)
                        else t["user_id"])
        ts = np.asarray(t["ts"].combine_chunks()
                        if isinstance(t["ts"], pa.ChunkedArray)
                        else t["ts"])
        if len(us) == 0:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "n_events": pa.array([], type=pa.int64()),
                             "n_sessions": pa.array([], type=pa.int64())})
        order = np.lexsort((ts, us))
        us, ts = us[order], ts[order]
        change = np.nonzero(us[1:] != us[:-1])[0] + 1
        starts = np.concatenate([[0], change]).astype(np.int64)
        ends = np.concatenate([change, [len(us)]]).astype(np.int64)
        u, ne, nsess = _per_group(us, ts, starts, ends)
        return pa.table({"user_id": pa.array(u),
                         "n_events": pa.array(ne),
                         "n_sessions": pa.array(nsess)})

    srt = events.sort(["user_id", "ts"])
    mixed = srt.map_batches(block_sessions, batch_format="pyarrow",
                            batch_size=None).materialize()
    interior = mixed.map_batches(
        lambda t: t.filter(pc.equal(t["boundary"], False))
        .select(["user_id", "n_events", "n_sessions"]),
        batch_format="pyarrow")
    carries = mixed.map_batches(
        lambda t: t.filter(t["boundary"]).select(["user_id", "ts"]),
        batch_format="pyarrow")
    cross = sharded_stitch(
        carries,
        lambda t: np.asarray(t["user_id"].combine_chunks()
                             if isinstance(t["user_id"], pa.ChunkedArray)
                             else t["user_id"]),
        stitch, num_shards=stitch_shards)
    return interior.union(cross)


def interval_coverage(events, us_per_milli: int = 100_000,
                      stitch_shards: int = DEFAULT_STITCH_SHARDS):
    """Per-user union length of time intervals — each event opens the
    interval ``[ts, ts + floor(value*1000) * us_per_milli)`` and the
    operator reports how many microseconds of the timeline each user's
    intervals COVER, overlaps counted once (the gaps-and-islands sweep:
    uptime from heartbeats, listener-hours from play events).

    Sorted-block plan: sort (user_id, ts, event_id); within a segment the
    sweep is ``Σ max(0, end_i − max(start_i, running_max(end)_{<i}))``,
    exact for start-sorted intervals.  The segmented running max resets
    per user WITHOUT a Python loop: interval ends rank-compress through
    ``np.unique`` and ``seg_id * (R+1) + rank`` makes a strictly
    segment-dominant key whose global ``np.maximum.accumulate`` equals
    the per-segment cummax after un-keying (int64-safe: segments × ranks
    both bound by block rows).  Interior segments are final; edge
    segments re-emit raw (user, start, end) rows to the per-user sharded
    stitch, which re-sorts and reruns the same kernel — interval union
    is not mergeable from per-block scalars, so carrying the raw edge
    rows (≤ 2 segments/block) is the exact and bounded choice.

    Integer-exact end to end: durations derive from the repo's milli
    convention (``floor(value*1000)``); non-positive durations drop.
    Returns (user_id, covered_us, n_intervals).
    """
    from .windowfns import _milli

    out_empty = pa.table({
        "user_id": pa.array([], type=pa.int64()),
        "covered_us": pa.array([], type=pa.int64()),
        "n_intervals": pa.array([], type=pa.int64())})

    def _sweep(us, s, e, starts, ends):
        """Per-segment union length; (us, s, e) sorted by (us, s)."""
        n = len(s)
        seg_id = np.repeat(np.arange(len(starts)), ends - starts)
        uniq, rank = np.unique(e, return_inverse=True)
        key = seg_id * np.int64(len(uniq) + 1) + rank
        cm_rank = np.maximum.accumulate(key) - seg_id * np.int64(
            len(uniq) + 1)
        prev = np.empty(n, dtype=np.int64)
        prev[0] = 0
        prev[1:] = uniq[cm_rank[:-1]]
        prev[starts] = np.iinfo(np.int64).min  # no predecessor in segment
        lo = np.maximum(s, prev)
        contrib = np.maximum(e - lo, 0)
        covered = np.add.reduceat(contrib, starts)
        counts = ends - starts
        return pa.table({"user_id": pa.array(us[starts]),
                         "covered_us": pa.array(covered),
                         "n_intervals": pa.array(counts)})

    def to_intervals(t: pa.Table):
        us = np.asarray(one_chunk(t["user_id"])).astype(np.int64)
        s = np.asarray(pc.cast(pc.cast(one_chunk(t["ts"]),
                                       pa.timestamp("us")), pa.int64()))
        dur = _milli(one_chunk(t["value"])) * np.int64(us_per_milli)
        keep = dur > 0
        us, s, dur = us[keep], s[keep], dur[keep]
        return us, s, s + dur

    def block_cover(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "user_id": pa.array([], type=pa.int64()),
            "covered_us": pa.array([], type=pa.int64()),
            "n_intervals": pa.array([], type=pa.int64()),
            "s": pa.array([], type=pa.int64()),
            "e": pa.array([], type=pa.int64()),
            "boundary": pa.array([], type=pa.bool_())})
        if t.num_rows == 0:
            return empty
        us, s, e = to_intervals(t)
        n = len(us)
        if n == 0:
            return empty
        change = np.nonzero(us[1:] != us[:-1])[0] + 1
        starts = np.concatenate([[0], change]).astype(np.int64)
        ends = np.concatenate([change, [n]]).astype(np.int64)
        last = len(starts) - 1
        if last >= 1:
            i0, i1 = ends[0], starts[last]
            cov = _sweep(us[i0:i1], s[i0:i1], e[i0:i1],
                         starts[1:last] - i0, ends[1:last] - i0) \
                if i1 > i0 else out_empty
            edge_idx = np.concatenate([np.arange(0, ends[0]),
                                       np.arange(starts[last], n)])
        else:
            cov = out_empty
            edge_idx = np.arange(0, n)
        k, b = cov.num_rows, len(edge_idx)
        return pa.table({
            "user_id": pa.array(np.concatenate(
                [np.asarray(one_chunk(cov["user_id"])), us[edge_idx]])),
            "covered_us": pa.array(np.concatenate(
                [np.asarray(one_chunk(cov["covered_us"])),
                 np.zeros(b, np.int64)])),
            "n_intervals": pa.array(np.concatenate(
                [np.asarray(one_chunk(cov["n_intervals"])),
                 np.zeros(b, np.int64)])),
            "s": pa.array(np.concatenate(
                [np.full(k, 0, np.int64), s[edge_idx]])),
            "e": pa.array(np.concatenate(
                [np.full(k, 0, np.int64), e[edge_idx]])),
            "boundary": pa.array([False] * k + [True] * b)})

    def stitch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_empty
        us = np.asarray(one_chunk(t["user_id"])).astype(np.int64)
        s = np.asarray(one_chunk(t["s"])).astype(np.int64)
        e = np.asarray(one_chunk(t["e"])).astype(np.int64)
        order = np.lexsort((e, s, us))
        us, s, e = us[order], s[order], e[order]
        change = np.nonzero(us[1:] != us[:-1])[0] + 1
        starts = np.concatenate([[0], change]).astype(np.int64)
        ends = np.concatenate([change, [len(us)]]).astype(np.int64)
        return _sweep(us, s, e, starts, ends)

    srt = events.sort(["user_id", "ts", "event_id"])
    mixed = srt.map_batches(block_cover, batch_format="pyarrow",
                            batch_size=None).materialize()
    interior = mixed.map_batches(
        lambda t: t.filter(pc.equal(t["boundary"], False))
        .select(["user_id", "covered_us", "n_intervals"]),
        batch_format="pyarrow")
    carries = mixed.map_batches(
        lambda t: t.filter(t["boundary"]).select(["user_id", "s", "e"]),
        batch_format="pyarrow")
    cross = sharded_stitch(
        carries,
        lambda t: np.asarray(one_chunk(t["user_id"])).astype(np.int64),
        stitch, num_shards=stitch_shards)
    return interior.union(cross)


def tumbling_distinct_users(events, window_s: int = TUMBLE_SECONDS):
    """Exact COUNT(DISTINCT user) per tumbling window — the streaming
    distinct-cardinality shape (unique visitors per hour).  Distinct is
    not Sum-mergeable, so the plan is the cohort-retention one:

    1. per-batch DISTINCT (window, user) combiner (an Arrow group_by) —
       the exchange carries each pair once per batch, never events;
    2. ONE ``groupby(window, user)`` collapses pairs globally (this is
       the unavoidable exchange; the HLL register sketch is the
       implemented approximate escape when exactness is negotiable);
    3. a per-batch (window → pair count) combiner + tiny
       ``groupby(window)`` Sum — exact because step 2 emits each pair
       exactly once.
    Returns (window, n_users).
    """
    from ray.data.aggregate import Sum

    def pairs(t: pa.Table) -> pa.Table:
        us = np.asarray(pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                                pa.int64()))
        window = pa.array(us // (window_s * 1_000_000), type=pa.int64())
        return (pa.table({"window": window, "user_id": t["user_id"]})
                .group_by(["window", "user_id"]).aggregate([]))

    from ray.data.aggregate import Count

    distinct = (events.map_batches(pairs, batch_format="pyarrow")
                .groupby(["window", "user_id"])
                .aggregate(Count(alias_name="_n")))

    def wcount(t: pa.Table) -> pa.Table:
        g = (pa.table({"window": t["window"]})
             .group_by("window").aggregate([("window", "count")]))
        return pa.table({"window": g["window"],
                         "n": g["window_count"].cast(pa.int64())})

    return (distinct.map_batches(wcount, batch_format="pyarrow")
            .groupby("window").aggregate(Sum("n", alias_name="n_users")))


def late_event_accounting(events, window_s: int = TUMBLE_SECONDS,
                          lateness_s: int = 600):
    """Watermark accounting: per ``(event_type, tumbling window)``, how
    many events arrived LATE — after the watermark (the running max of
    event time over ARRIVAL order, minus the allowed lateness) had
    already passed their window's end.  This is the Beam/Flink
    allowed-lateness rule replayed over a batch table: the final state a
    streaming job would reach at end-of-stream.

    Contract: ``event_id`` is the arrival order (globally unique int64);
    ``us`` is event-time microseconds.  An event is late iff
    ``prev_max(us) - lateness >= (window+1) * window_size`` where
    ``prev_max`` is over all STRICTLY earlier arrivals (the first arrival
    is never late).

    Plan: one range-partitioned sort by ``event_id`` (the only exchange),
    then a two-pass prefix-max over the SAME materialized blocks — pass 1
    forwards ONE ``(block_min_eid, block_max_us)`` row per block to the
    driver; the exclusive prefix max across block summaries (a
    #blocks-sized driver array, broadcast back in the task closure) seeds
    each block's running max, so pass 2 resolves every row block-locally
    and collapses straight into (type, window) combiner rows.

    Returns a Dataset of ``(event_type, window, n_events, n_late)``.
    """
    from ray.data.aggregate import Sum

    w_us = window_s * 1_000_000
    l_us = lateness_s * 1_000_000
    s = events.sort("event_id").materialize()

    def block_summary(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"min_eid": pa.array([], type=pa.int64()),
                             "max_us": pa.array([], type=pa.int64())})
        eid = np.asarray(one_chunk(t["event_id"]), dtype=np.int64)
        us = np.asarray(one_chunk(t["us"]), dtype=np.int64)
        return pa.table({"min_eid": pa.array([int(eid.min())]),
                         "max_us": pa.array([int(us.max())])})

    summaries = s.map_batches(block_summary, batch_format="pyarrow",
                              batch_size=None).to_pandas()
    if len(summaries) == 0:
        import ray.data
        return ray.data.from_arrow(pa.table({
            "event_type": pa.array([], type=pa.string()),
            "window": pa.array([], type=pa.int64()),
            "n_events": pa.array([], type=pa.int64()),
            "n_late": pa.array([], type=pa.int64())}))
    summaries = summaries.sort_values("min_eid").reset_index(drop=True)
    boundaries = summaries["min_eid"].to_numpy(dtype=np.int64)
    block_max = summaries["max_us"].to_numpy(dtype=np.int64)
    lo = np.iinfo(np.int64).min
    # exclusive prefix max: base for block j = max over blocks < j
    bases = np.concatenate([[lo],
                            np.maximum.accumulate(block_max)[:-1]])

    def classify(t: pa.Table) -> pa.Table:
        empty = pa.table({"event_type": pa.array([], type=pa.string()),
                          "window": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64()),
                          "nl": pa.array([], type=pa.int64())})
        if t.num_rows == 0:
            return empty
        eid = np.asarray(one_chunk(t["event_id"]), dtype=np.int64)
        us = np.asarray(one_chunk(t["us"]), dtype=np.int64)
        j = int(np.searchsorted(boundaries, int(eid.min())))
        if j >= len(boundaries) or boundaries[j] != eid.min():
            raise AssertionError(
                "late_event_accounting: block summary mismatch — "
                "pass 2 saw a block pass 1 did not")
        base = bases[j]
        run = np.maximum.accumulate(us)
        pm = np.empty(len(us), dtype=np.int64)
        pm[0] = base
        if len(us) > 1:
            pm[1:] = np.maximum(base, run[:-1])
        win = us // w_us
        # guard the -inf sentinel: lo - l_us would wrap
        late = (pm != lo) & (pm - l_us >= (win + 1) * w_us)
        g = pa.table({"event_type": t["event_type"],
                      "window": pa.array(win),
                      "one": pa.array(np.ones(len(us), dtype=np.int64)),
                      "lt": pa.array(late.astype(np.int64))}) \
            .group_by(["event_type", "window"]) \
            .aggregate([("one", "sum"), ("lt", "sum")])
        return g.rename_columns(["event_type", "window", "n", "nl"])

    return (s.map_batches(classify, batch_format="pyarrow",
                          batch_size=None)
            .groupby(["event_type", "window"])
            .aggregate(Sum("n", alias_name="n_events"),
                       Sum("nl", alias_name="n_late")))


def bursty_hours(events, key_col: str = "event_type",
                 window_s: int = TUMBLE_SECONDS, k_sigma: int = 2):
    """Burst detection per key: tumbling windows whose event count sits
    more than ``k_sigma`` standard deviations above that key's own mean
    window count — the traffic-anomaly / crawl-storm audit, EXACT in
    integers (the z-test is cross-multiplied so no sqrt or float ever
    appears): with per-key window counts ``c``, ``n`` windows, ``S=Σc``,
    ``Q=Σc²``, a window is bursty iff

        ``c·n > S``  and  ``(c·n − S)² > k²·(n·Q − S²)``

    (algebra: z = (c−μ)/σ > k with μ=S/n, σ²=(nQ−S²)/n²; both sides
    scaled by n².)  int64 bound: ``(c·n)² < 2⁶³`` — c·n up to 3·10⁹,
    e.g. 10⁶-event windows over 3000 windows; shard longer histories.

    Plan: exact (key, window) counts via the tumbling combiner; per-key
    moments from ONE more combiner pass over the counts; moments are
    key-count-sized and broadcast back via ``ray.put`` (join the counts
    stream against them batch-locally — no second shuffle of counts).

    Returns a Dataset of ``(key, window, n_events)`` for bursty windows.
    """
    import ray

    from ray.data.aggregate import Sum

    from ..arrowutil import collect_tables

    def assign(t: pa.Table) -> pa.Table:
        us = np.asarray(pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                                pa.int64()))
        window = pa.array(us // (window_s * 1_000_000), type=pa.int64())
        g = pa.table({"key": t[key_col], "window": window}) \
            .group_by(["key", "window"]).aggregate([([], "count_all")])
        return pa.table({"key": g["key"], "window": g["window"],
                         "n": g["count_all"].cast(pa.int64())})

    counts = (events.map_batches(assign, batch_format="pyarrow")
              .groupby(["key", "window"])
              .aggregate(Sum("n", alias_name="n_events"))
              .materialize())

    def moment_partial(t: pa.Table) -> pa.Table:
        c = np.asarray(one_chunk(t["n_events"]), dtype=np.int64)
        g = pa.table({"key": t["key"],
                      "nw": pa.array(np.ones(len(c), dtype=np.int64)),
                      "s": pa.array(c), "q": pa.array(c * c)}) \
            .group_by("key").aggregate([("nw", "sum"), ("s", "sum"),
                                        ("q", "sum")])
        return g.rename_columns(["key", "nw", "s", "q"])

    moments = collect_tables(
        counts.map_batches(moment_partial, batch_format="pyarrow")
        .groupby("key").aggregate(Sum("nw", alias_name="nw"),
                                  Sum("s", alias_name="s"),
                                  Sum("q", alias_name="q")))
    mom_ref = ray.put(moments)
    k2 = k_sigma * k_sigma

    def flag(t: pa.Table) -> pa.Table:
        m = ray.get(mom_ref)
        j = t.join(m, keys=["key"])
        c = np.asarray(one_chunk(j["n_events"]), dtype=np.int64)
        nw = np.asarray(one_chunk(j["nw"]), dtype=np.int64)
        s = np.asarray(one_chunk(j["s"]), dtype=np.int64)
        q = np.asarray(one_chunk(j["q"]), dtype=np.int64)
        lhs = c * nw - s
        bursty = (lhs > 0) & (lhs * lhs > k2 * (nw * q - s * s))
        keep = pa.array(bursty)
        return pa.table({"key": j["key"].filter(keep),
                         "window": j["window"].filter(keep),
                         "n_events": j["n_events"].filter(keep)})

    return counts.map_batches(flag, batch_format="pyarrow")


def session_conversion(events, gap_s: int = SESSION_GAP_SECONDS,
                       first_type: str = "view",
                       then_type: str = "purchase",
                       stitch_shards: int = DEFAULT_STITCH_SHARDS):
    """Within-session conversion: per user, how many of their gap-based
    sessions contain a ``then_type`` event STRICTLY AFTER the session's
    first ``first_type`` event — the sequential-pattern funnel scoped to
    sessions (a purchase in a later visit doesn't credit the first one).

    Same sorted-block + sharded-stitch plan as :func:`session_counts`;
    the per-segment kernel is fully vectorized: session ids from one gap
    cumsum, per-session ``min(ts of first_type)`` / ``max(ts of
    then_type)`` via scatter reductions, conversion = strict time
    comparison (position-free, so equal-timestamp tie order between
    engines cannot flip a result; a then-event at the identical
    microsecond does NOT count).

    Returns a Dataset of ``(user_id, n_sessions, n_converted)``.
    """
    gap_us = gap_s * 1_000_000
    big = np.iinfo(np.int64).max

    def _per_rows(us, ts, et_f, et_t):
        """Per-user conversion stats over (user,ts)-sorted rows."""
        n = len(us)
        new_s = np.ones(n, dtype=bool)
        if n > 1:
            new_s[1:] = (us[1:] != us[:-1]) | \
                ((ts[1:] - ts[:-1]) > gap_us)
        sid = np.cumsum(new_s) - 1
        n_sid = int(sid[-1]) + 1 if n else 0
        first_ts = np.full(n_sid, big, dtype=np.int64)
        np.minimum.at(first_ts, sid[et_f], ts[et_f])
        then_ts = np.full(n_sid, -1, dtype=np.int64)
        np.maximum.at(then_ts, sid[et_t], ts[et_t])
        conv = (first_ts != big) & (then_ts > first_ts)
        # per-user rollup over sessions
        sess_user = us[np.flatnonzero(new_s)]
        chg = np.ones(n_sid, dtype=bool)
        if n_sid > 1:
            chg[1:] = sess_user[1:] != sess_user[:-1]
        st = np.flatnonzero(chg)
        n_sessions = np.diff(np.append(st, n_sid))
        n_conv = np.add.reduceat(conv.astype(np.int64), st) \
            if n_sid else np.empty(0, np.int64)
        return sess_user[st], n_sessions.astype(np.int64), n_conv

    def block_kernel(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "user_id": pa.array([], type=pa.int64()),
            "n_sessions": pa.array([], type=pa.int64()),
            "n_converted": pa.array([], type=pa.int64()),
            "ts": pa.array([], type=pa.int64()),
            "et": pa.array([], type=pa.string()),
            "boundary": pa.array([], type=pa.bool_())})
        n = t.num_rows
        if n == 0:
            return empty
        us = np.asarray(one_chunk(t["user_id"]), dtype=np.int64)
        ts = np.asarray(pc.cast(pc.cast(one_chunk(t["ts"]),
                                        pa.timestamp("us")), pa.int64()))
        et = one_chunk(t["event_type"])
        ef = np.asarray(pc.equal(et, first_type))
        etn = np.asarray(pc.equal(et, then_type))
        change = np.nonzero(us[1:] != us[:-1])[0] + 1
        starts = np.concatenate([[0], change]).astype(np.int64)
        last = len(starts) - 1
        lo_end = starts[1] if last >= 1 else n
        hi_start = starts[last] if last >= 1 else 0
        if last >= 1 and lo_end < hi_start:
            iu, ns, nc = _per_rows(us[lo_end:hi_start],
                                   ts[lo_end:hi_start],
                                   ef[lo_end:hi_start],
                                   etn[lo_end:hi_start])
        else:
            iu, ns, nc = (np.empty(0, np.int64),) * 3
        edge_idx = np.unique(np.concatenate(
            [np.arange(0, lo_end), np.arange(hi_start, n)])) \
            if last >= 1 else np.arange(n)
        n_i, n_b = len(iu), len(edge_idx)
        return pa.table({
            "user_id": pa.array(np.concatenate([iu, us[edge_idx]])),
            "n_sessions": pa.array(np.concatenate(
                [ns, np.full(n_b, -1, np.int64)])),
            "n_converted": pa.array(np.concatenate(
                [nc, np.full(n_b, -1, np.int64)])),
            "ts": pa.array(np.concatenate(
                [np.full(n_i, -1, np.int64), ts[edge_idx]])),
            "et": pa.array([""] * n_i + [et[int(j)].as_py()
                                         for j in edge_idx],
                           type=pa.string()),
            "boundary": pa.array([False] * n_i + [True] * n_b)})

    def stitch(t: pa.Table) -> pa.Table:
        us = np.asarray(one_chunk(t["user_id"]), dtype=np.int64)
        ts = np.asarray(one_chunk(t["ts"]), dtype=np.int64)
        et = one_chunk(t["et"])
        if len(us) == 0:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "n_sessions": pa.array([], type=pa.int64()),
                             "n_converted": pa.array([],
                                                     type=pa.int64())})
        order = np.lexsort((ts, us))
        ef = np.asarray(pc.equal(et, first_type))[order]
        etn = np.asarray(pc.equal(et, then_type))[order]
        u, ns, nc = _per_rows(us[order], ts[order], ef, etn)
        return pa.table({"user_id": pa.array(u),
                         "n_sessions": pa.array(ns),
                         "n_converted": pa.array(nc)})

    srt = events.sort(["user_id", "ts"])
    mixed = srt.map_batches(block_kernel, batch_format="pyarrow",
                            batch_size=None).materialize()
    interior = mixed.map_batches(
        lambda t: t.filter(pc.equal(t["boundary"], False))
        .select(["user_id", "n_sessions", "n_converted"]),
        batch_format="pyarrow")
    carries = mixed.map_batches(
        lambda t: t.filter(t["boundary"]).select(["user_id", "ts", "et"]),
        batch_format="pyarrow")
    cross = sharded_stitch(
        carries,
        lambda t: np.asarray(t["user_id"].combine_chunks()
                             if isinstance(t["user_id"], pa.ChunkedArray)
                             else t["user_id"]),
        stitch, num_shards=stitch_shards)
    return interior.union(cross)


def longest_streak_per_user(events,
                            stitch_shards: int = DEFAULT_STITCH_SHARDS):
    """Per-user longest run of consecutive same-type events in
    (ts, event_id) order — the gaps-and-islands "max streak" query
    (longest unbroken click chain, error burst length) without a window
    function engine.

    Same sorted-block + sharded-stitch plan as :func:`session_counts`:
    sort (user_id, ts, event_id); inside a block, run boundaries are one
    vectorized comparison over dictionary-encoded types and the per-user
    max run length falls out of ``np.maximum.reduceat`` over contiguous
    runs.  Users interior to a block are provably complete; only the
    ≤2 edge users per block re-emit raw rows, sharded by
    ``user_id % P``, where the identical kernel reruns after a lexsort.
    Returns (user_id, longest_streak), exact int64.
    """
    def _per_user_max(us, codes):
        """(user, max_run) over arrays sorted by (user, ts, id)."""
        n = len(us)
        new_run = np.empty(n, dtype=bool)
        new_run[0] = True
        new_run[1:] = (us[1:] != us[:-1]) | (codes[1:] != codes[:-1])
        rs = np.flatnonzero(new_run)
        rlen = np.concatenate([rs[1:], [n]]) - rs
        ruser = us[rs]
        uchange = np.nonzero(ruser[1:] != ruser[:-1])[0] + 1
        ustarts = np.concatenate([[0], uchange]).astype(np.int64)
        return ruser[ustarts], np.maximum.reduceat(
            rlen, ustarts).astype(np.int64)

    def _cols(t):
        us = np.asarray(one_chunk(t["user_id"])).astype(np.int64)
        ts = np.asarray(pc.cast(pc.cast(one_chunk(t["ts"]),
                                        pa.timestamp("us")), pa.int64()))
        eid = np.asarray(one_chunk(t["event_id"])).astype(np.int64)
        _, codes = np.unique(np.asarray(one_chunk(t["event_type"])),
                             return_inverse=True)
        return us, ts, eid, codes

    def block_streaks(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "user_id": pa.array([], type=pa.int64()),
            "longest_streak": pa.array([], type=pa.int64()),
            "ts": pa.array([], type=pa.int64()),
            "event_id": pa.array([], type=pa.int64()),
            "event_type": pa.array([], type=pa.string()),
            "boundary": pa.array([], type=pa.bool_())})
        n = t.num_rows
        if n == 0:
            return empty
        us, ts, eid, codes = _cols(t)
        change = np.nonzero(us[1:] != us[:-1])[0] + 1
        starts = np.concatenate([[0], change]).astype(np.int64)
        last = len(starts) - 1
        # interior users: strictly between the block's first and last user
        lo, hi = starts[1] if last >= 1 else n, starts[last] if last >= 1 \
            else 0
        if lo < hi:
            iu, imax = _per_user_max(us[lo:hi], codes[lo:hi])
        else:
            iu = imax = np.empty(0, dtype=np.int64)
        edge_idx = np.concatenate([np.arange(0, lo),
                                   np.arange(hi, n)]) if last >= 1 \
            else np.arange(0, n)
        n_i, n_b = len(iu), len(edge_idx)
        types = np.asarray(one_chunk(t["event_type"]))
        return pa.table({
            "user_id": pa.array(np.concatenate([iu, us[edge_idx]])),
            "longest_streak": pa.array(
                np.concatenate([imax, np.full(n_b, -1, np.int64)])),
            "ts": pa.array(
                np.concatenate([np.full(n_i, -1, np.int64), ts[edge_idx]])),
            "event_id": pa.array(
                np.concatenate([np.full(n_i, -1, np.int64),
                                eid[edge_idx]])),
            "event_type": pa.array(
                np.concatenate([np.full(n_i, "", dtype=object),
                                types[edge_idx]]).astype(object)),
            "boundary": pa.array([False] * n_i + [True] * n_b),
        })

    def stitch(t: pa.Table) -> pa.Table:
        out_t = pa.table({"user_id": pa.array([], type=pa.int64()),
                          "longest_streak": pa.array([], type=pa.int64())})
        if t.num_rows == 0:
            return out_t
        us, ts, eid, codes = _cols(t)
        order = np.lexsort((eid, ts, us))
        u, mx = _per_user_max(us[order], codes[order])
        return pa.table({"user_id": pa.array(u),
                         "longest_streak": pa.array(mx)})

    srt = events.sort(["user_id", "ts", "event_id"])
    mixed = srt.map_batches(block_streaks, batch_format="pyarrow",
                            batch_size=None).materialize()
    interior = mixed.map_batches(
        lambda t: t.filter(pc.equal(t["boundary"], False))
        .select(["user_id", "longest_streak"]),
        batch_format="pyarrow")
    carries = mixed.map_batches(
        lambda t: t.filter(t["boundary"])
        .select(["user_id", "ts", "event_id", "event_type"]),
        batch_format="pyarrow")
    cross = sharded_stitch(
        carries,
        lambda t: np.asarray(one_chunk(t["user_id"])),
        stitch, num_shards=stitch_shards)
    return interior.union(cross)


def peak_hour_by_type(events):
    """Per event type, the busiest hour of day (0–23) and its event
    count, ties broken toward the EARLIER hour — the grouped-argmax
    shape (peak traffic hour per endpoint) as two tiny exchanges.

    Counts pre-aggregate per batch, one ≤|types|·24-row groupby Sum
    resolves global counts, and the argmax packs (count, 23−hour) into a
    single int64 composite so a plain ``groupby(type).Max`` IS the
    lexicographic (max count, min hour) winner — no sort, no window.
    """
    from ray.data.aggregate import Max, Sum

    def partial(t: pa.Table) -> pa.Table:
        h = pc.cast(pc.hour(pc.cast(t["ts"], pa.timestamp("us"))),
                    pa.int64())
        g = pa.table({"event_type": t["event_type"], "h": h}) \
            .group_by(["event_type", "h"]).aggregate([([], "count_all")])
        return g.select(["event_type", "h", "count_all"]) \
            .rename_columns(["event_type", "h", "n"])

    counts = (events.map_batches(partial, batch_format="pyarrow")
              .groupby(["event_type", "h"])
              .aggregate(Sum("n", alias_name="n")))

    def pack(t: pa.Table) -> pa.Table:
        n = np.asarray(one_chunk(t["n"])).astype(np.int64)
        h = np.asarray(one_chunk(t["h"])).astype(np.int64)
        return pa.table({"event_type": t["event_type"],
                         "comp": pa.array(n * 32 + (23 - h))})

    best = (counts.map_batches(pack, batch_format="pyarrow")
            .groupby("event_type").aggregate(Max("comp",
                                                 alias_name="comp")))

    def decode(t: pa.Table) -> pa.Table:
        comp = np.asarray(one_chunk(t["comp"]))
        return pa.table({"event_type": t["event_type"],
                         "peak_hour": pa.array(23 - (comp % 32)),
                         "n_events": pa.array(comp // 32)})

    return best.map_batches(decode, batch_format="pyarrow")


def scd2_user_state(events, stitch_shards: int = DEFAULT_STITCH_SHARDS):
    """Type-2 slowly-changing-dimension build over an update stream:
    collapse each user's consecutive same-type events into state rows
    with validity intervals — (user_id, event_type, valid_from_us,
    valid_to_us), ``valid_to_us`` NULL for the current state.  The
    standard warehouse "dimension history from a change stream" op, in
    (ts, event_id) order.

    Same sorted-block + sharded-stitch plan as
    :func:`longest_streak_per_user`: state changes are one vectorized
    mask over dictionary codes; ``valid_to`` is the NEXT change's ts
    within the user (a shifted gather, no window engine).  Interior
    users finalize in-block; edge users re-emit raw rows to the per-user
    stitch where the identical kernel reruns after a lexsort.
    """
    def _states(us, ts, eid, codes):
        """SCD2 rows for arrays sorted by (user, ts, event_id)."""
        n = len(us)
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = (us[1:] != us[:-1]) | (codes[1:] != codes[:-1])
        ci = np.flatnonzero(change)
        cu, cf = us[ci], ts[ci]
        # next change of the SAME user closes the interval
        nxt = np.empty(len(ci), dtype=np.int64)
        nxt[:-1] = cf[1:]
        nxt[-1] = -1
        same = np.empty(len(ci), dtype=bool)
        same[:-1] = cu[1:] == cu[:-1]
        same[-1] = False
        return cu, ci, cf, np.where(same, nxt, -1)

    def _cols(t):
        us = np.asarray(one_chunk(t["user_id"])).astype(np.int64)
        ts = np.asarray(pc.cast(pc.cast(one_chunk(t["ts"]),
                                        pa.timestamp("us")), pa.int64()))
        eid = np.asarray(one_chunk(t["event_id"])).astype(np.int64)
        _, codes = np.unique(np.asarray(one_chunk(t["event_type"])),
                             return_inverse=True)
        return us, ts, eid, codes

    def _emit(types, cu, ci, cf, cto):
        return pa.table({
            "user_id": pa.array(cu),
            "event_type": pa.array(types[ci].astype(object),
                                   type=pa.string()),
            "valid_from_us": pa.array(cf),
            "valid_to_us": pa.array(
                np.ma.masked_array(cto, mask=(cto == -1)),
                type=pa.int64())})

    def block_states(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "user_id": pa.array([], type=pa.int64()),
            "event_type": pa.array([], type=pa.string()),
            "valid_from_us": pa.array([], type=pa.int64()),
            "valid_to_us": pa.array([], type=pa.int64()),
            "ts": pa.array([], type=pa.int64()),
            "event_id": pa.array([], type=pa.int64()),
            "boundary": pa.array([], type=pa.bool_())})
        n = t.num_rows
        if n == 0:
            return empty
        us, ts, eid, codes = _cols(t)
        types = np.asarray(one_chunk(t["event_type"]))
        change = np.nonzero(us[1:] != us[:-1])[0] + 1
        starts = np.concatenate([[0], change]).astype(np.int64)
        last = len(starts) - 1
        lo = starts[1] if last >= 1 else n
        hi = starts[last] if last >= 1 else 0
        if lo < hi:
            cu, ci, cf, cto = _states(us[lo:hi], ts[lo:hi], eid[lo:hi],
                                      codes[lo:hi])
            interior = _emit(types[lo:hi], cu, ci, cf, cto)
        else:
            interior = empty.select(["user_id", "event_type",
                                     "valid_from_us", "valid_to_us"])
        edge_idx = np.concatenate([np.arange(0, lo),
                                   np.arange(hi, n)]) if last >= 1 \
            else np.arange(0, n)
        n_i, n_b = interior.num_rows, len(edge_idx)
        return pa.table({
            "user_id": pa.concat_arrays([
                one_chunk(interior["user_id"]),
                pa.array(us[edge_idx], type=pa.int64())]),
            "event_type": pa.concat_arrays([
                one_chunk(interior["event_type"]),
                pa.array(types[edge_idx].astype(object),
                         type=pa.string())]),
            "valid_from_us": pa.concat_arrays([
                one_chunk(interior["valid_from_us"]),
                pa.array(np.full(n_b, -1, np.int64))]),
            "valid_to_us": pa.concat_arrays([
                one_chunk(pc.cast(interior["valid_to_us"], pa.int64())),
                pa.array(np.full(n_b, -1, np.int64))]),
            "ts": pa.concat_arrays([
                pa.array(np.full(n_i, -1, np.int64)),
                pa.array(ts[edge_idx])]),
            "event_id": pa.concat_arrays([
                pa.array(np.full(n_i, -1, np.int64)),
                pa.array(eid[edge_idx])]),
            "boundary": pa.array([False] * n_i + [True] * n_b),
        })

    def stitch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "user_id": pa.array([], type=pa.int64()),
                "event_type": pa.array([], type=pa.string()),
                "valid_from_us": pa.array([], type=pa.int64()),
                "valid_to_us": pa.array([], type=pa.int64())})
        us, ts, eid, codes = _cols(t)
        types = np.asarray(one_chunk(t["event_type"]))
        order = np.lexsort((eid, ts, us))
        cu, ci, cf, cto = _states(us[order], ts[order], eid[order],
                                  codes[order])
        return _emit(types[order], cu, ci, cf, cto)

    srt = events.sort(["user_id", "ts", "event_id"])
    mixed = srt.map_batches(block_states, batch_format="pyarrow",
                            batch_size=None).materialize()
    interior = mixed.map_batches(
        lambda t: t.filter(pc.equal(t["boundary"], False))
        .select(["user_id", "event_type", "valid_from_us", "valid_to_us"]),
        batch_format="pyarrow")
    carries = mixed.map_batches(
        lambda t: t.filter(t["boundary"])
        .select(["user_id", "ts", "event_id", "event_type"]),
        batch_format="pyarrow")
    cross = sharded_stitch(
        carries,
        lambda t: np.asarray(one_chunk(t["user_id"])),
        stitch, num_shards=stitch_shards)
    return interior.union(cross)


_POW2 = np.concatenate([[0], 2 ** np.arange(63, dtype=np.int64)])


def _log2_bucket(v: np.ndarray) -> np.ndarray:
    """floor(log2(v)) for POSITIVE int64, computed by integer
    comparisons (searchsorted over the 63 powers of two) — never
    through float log2, whose rounding flips values near exact powers."""
    return (np.searchsorted(_POW2, v, side="right") - 2).astype(np.int64)


def user_gap_histogram(events,
                       stitch_shards: int = DEFAULT_STITCH_SHARDS):
    """Corpus-wide histogram of inter-event gaps, log2-bucketed in
    seconds: bucket = floor(log2(gap_s + 1)) — the "how bursty is the
    stream" diagnostic (bucket 0 = sub-second/same-second, 10 ≈ 17 min,
    16 ≈ 18 h).  Returns (gap_bucket, n_gaps), exact int64: bucketing
    is pure integer comparison on both the engine and the SQL oracle
    (``length(printf('%b', g+1)) − 1``).

    Sorted-block plan: gaps between adjacent (ts, event_id)-ordered
    events of one user; interior users histogram in-block (a ≤63-row
    partial per block), edge users re-emit raw rows to the per-user
    stitch; ONE ≤63-row groupby Sum finishes.
    """
    def _hist(us, ts):
        """Bucket counts over per-user adjacent gaps (sorted arrays)."""
        same = us[1:] == us[:-1]
        gap_s = (ts[1:] - ts[:-1])[same] // 1_000_000
        b = _log2_bucket(gap_s + 1)
        uniq, cnt = np.unique(b, return_counts=True)
        return uniq, cnt.astype(np.int64)

    def block_gaps(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "gap_bucket": pa.array([], type=pa.int64()),
            "n_gaps": pa.array([], type=pa.int64()),
            "user_id": pa.array([], type=pa.int64()),
            "ts": pa.array([], type=pa.int64()),
            "event_id": pa.array([], type=pa.int64()),
            "boundary": pa.array([], type=pa.bool_())})
        n = t.num_rows
        if n == 0:
            return empty
        us = np.asarray(one_chunk(t["user_id"])).astype(np.int64)
        ts = np.asarray(pc.cast(pc.cast(one_chunk(t["ts"]),
                                        pa.timestamp("us")), pa.int64()))
        eid = np.asarray(one_chunk(t["event_id"])).astype(np.int64)
        change = np.nonzero(us[1:] != us[:-1])[0] + 1
        starts = np.concatenate([[0], change]).astype(np.int64)
        last = len(starts) - 1
        lo = starts[1] if last >= 1 else n
        hi = starts[last] if last >= 1 else 0
        if lo < hi:
            bk, cnt = _hist(us[lo:hi], ts[lo:hi])
        else:
            bk = cnt = np.empty(0, dtype=np.int64)
        edge_idx = np.concatenate([np.arange(0, lo),
                                   np.arange(hi, n)]) if last >= 1 \
            else np.arange(0, n)
        n_i, n_b = len(bk), len(edge_idx)
        return pa.table({
            "gap_bucket": pa.array(np.concatenate(
                [bk, np.full(n_b, -1, np.int64)])),
            "n_gaps": pa.array(np.concatenate(
                [cnt, np.full(n_b, -1, np.int64)])),
            "user_id": pa.array(np.concatenate(
                [np.full(n_i, -1, np.int64), us[edge_idx]])),
            "ts": pa.array(np.concatenate(
                [np.full(n_i, -1, np.int64), ts[edge_idx]])),
            "event_id": pa.array(np.concatenate(
                [np.full(n_i, -1, np.int64), eid[edge_idx]])),
            "boundary": pa.array([False] * n_i + [True] * n_b),
        })

    def stitch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"gap_bucket": pa.array([], type=pa.int64()),
                             "n_gaps": pa.array([], type=pa.int64())})
        us = np.asarray(one_chunk(t["user_id"])).astype(np.int64)
        ts = np.asarray(one_chunk(t["ts"])).astype(np.int64)
        eid = np.asarray(one_chunk(t["event_id"])).astype(np.int64)
        order = np.lexsort((eid, ts, us))
        bk, cnt = _hist(us[order], ts[order])
        return pa.table({"gap_bucket": pa.array(bk),
                         "n_gaps": pa.array(cnt)})

    from ray.data.aggregate import Sum

    srt = events.sort(["user_id", "ts", "event_id"])
    mixed = srt.map_batches(block_gaps, batch_format="pyarrow",
                            batch_size=None).materialize()
    interior = mixed.map_batches(
        lambda t: t.filter(pc.equal(t["boundary"], False))
        .select(["gap_bucket", "n_gaps"]),
        batch_format="pyarrow")
    carries = mixed.map_batches(
        lambda t: t.filter(t["boundary"])
        .select(["user_id", "ts", "event_id"]),
        batch_format="pyarrow")
    cross = sharded_stitch(
        carries,
        lambda t: np.asarray(one_chunk(t["user_id"])),
        stitch, num_shards=stitch_shards)
    return (interior.union(cross)
            .groupby("gap_bucket")
            .aggregate(Sum("n_gaps", alias_name="n_gaps")))


def dense_hourly_counts(events):
    """Calendar-densified hourly counts: every (event_type, absolute
    hour bucket) between the stream's first and last hour, zero-filled —
    the gap-filling dimension densification every dashboard / anomaly
    job needs before differencing (a missing hour must read 0, not be
    absent).

    Counts combine per batch then ONE small groupby; the dense frame is
    GENERATED distributed (``ray.data.range`` over hours × types, a
    divmod map — never a driver loop) and the sparse counts attach via a
    broadcast left join (|types|·|hours| rows by contract).  Returns
    (event_type, hour_bucket, n_events).
    """
    import ray.data
    from ray.data.aggregate import Sum

    from ..arrowutil import collect_tables

    def partial(t: pa.Table) -> pa.Table:
        us = np.asarray(pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                                pa.int64()))
        h = us // 3_600_000_000
        g = pa.table({"event_type": t["event_type"],
                      "h": pa.array(h, type=pa.int64())}) \
            .group_by(["event_type", "h"]).aggregate([([], "count_all")])
        return g.select(["event_type", "h", "count_all"]) \
            .rename_columns(["event_type", "h", "n"])

    counts = (events.map_batches(partial, batch_format="pyarrow")
              .groupby(["event_type", "h"])
              .aggregate(Sum("n", alias_name="n"))).materialize()

    ctab = collect_tables(counts)   # |types|×|hours| by contract
    hs = np.asarray(one_chunk(ctab["h"])).astype(np.int64)
    types = sorted(set(one_chunk(ctab["event_type"]).to_pylist()))
    h0, h1 = int(hs.min()), int(hs.max())
    n_hours = h1 - h0 + 1

    def gen(t: pa.Table) -> pa.Table:
        i = np.asarray(one_chunk(t["id"])).astype(np.int64)
        ty = np.asarray(types, dtype=object)[i // n_hours]
        return pa.table({
            "event_type": pa.array(ty, type=pa.string()),
            "hour_bucket": pa.array(h0 + (i % n_hours))})

    dense = ray.data.range(n_hours * len(types)) \
        .map_batches(gen, batch_format="pyarrow")

    from .joins import broadcast_hash_join

    joined = broadcast_hash_join(
        dense, counts, on=["event_type", "hour_bucket"],
        right_on=["event_type", "h"], join_type="left outer",
        project=["event_type", "hour_bucket", "n"])

    def fill(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "hour_bucket": t["hour_bucket"],
            "n_events": pc.fill_null(pc.cast(t["n"], pa.int64()), 0)})

    return joined.map_batches(fill, batch_format="pyarrow")


def topk_types_per_window(events, k: int = 3, window_s: int = 86400):
    """Top-``k`` event types per tumbling window (count desc, type asc)
    — the per-window leaderboard, composed from the combiner counts
    plus the bounded-partial :func:`.windowfns.grouped_top_k` (≤k rows
    per window per batch ever shuffle).  Returns
    (window_day, rank, n_events, event_type).
    """
    from ray.data.aggregate import Sum

    from .windowfns import grouped_top_k

    def partial(t: pa.Table) -> pa.Table:
        us = np.asarray(pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                                pa.int64()))
        w = us // (window_s * 1_000_000)
        g = pa.table({"w": pa.array(w, type=pa.int64()),
                      "event_type": t["event_type"]}) \
            .group_by(["w", "event_type"]).aggregate([([], "count_all")])
        return g.select(["w", "event_type", "count_all"]) \
            .rename_columns(["w", "event_type", "n"])

    counts = (events.map_batches(partial, batch_format="pyarrow")
              .groupby(["w", "event_type"])
              .aggregate(Sum("n", alias_name="n")))

    top = grouped_top_k(counts, "w", "n", "event_type", k)

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"window_day": t["w"], "rank": t["rank"],
                         "n_events": t["n"],
                         "event_type": t["event_type"]})

    return top.map_batches(rename, batch_format="pyarrow")


def day_over_day_change(events, window_s: int = 86400):
    """Per-type day-over-day count deltas: (event_type, day, n_events,
    prev_n_events) with NULL prev on each type's first day — the
    differencing step behind trend alerts, kept as exact integers (the
    caller divides).  Counts combine per batch into ONE small groupby;
    the lag attaches by joining the (small, |types|·|days|-row by
    contract) counts against themselves shifted one day, broadcast — no
    sort, no window engine.
    """
    from ray.data.aggregate import Sum

    from .joins import broadcast_hash_join

    def partial(t: pa.Table) -> pa.Table:
        us = np.asarray(pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                                pa.int64()))
        d = us // (window_s * 1_000_000)
        g = pa.table({"event_type": t["event_type"],
                      "day": pa.array(d, type=pa.int64())}) \
            .group_by(["event_type", "day"]).aggregate([([], "count_all")])
        return g.select(["event_type", "day", "count_all"]) \
            .rename_columns(["event_type", "day", "n"])

    counts = (events.map_batches(partial, batch_format="pyarrow")
              .groupby(["event_type", "day"])
              .aggregate(Sum("n", alias_name="n_events"))).materialize()

    shifted = counts.map_batches(
        lambda t: pa.table({
            "event_type": t["event_type"],
            "next_day": pc.add(t["day"], pa.scalar(1, pa.int64())),
            "prev_n_events": t["n_events"]}),
        batch_format="pyarrow")

    return broadcast_hash_join(
        counts, shifted, on=["event_type", "day"],
        right_on=["event_type", "next_day"], join_type="left outer",
        project=["event_type", "day", "n_events", "prev_n_events"])


def session_length_histogram(events, gap_s: int = SESSION_GAP_SECONDS,
                             stitch_shards: int = DEFAULT_STITCH_SHARDS):
    """Distribution of session lengths (events per gap-delimited
    session) across all users — the engagement-shape summary behind
    "how many one-event bounces?".  Returns (session_len, n_sessions),
    exact int64; cardinality is bounded by the longest session.

    Same sorted-block + sharded-stitch plan as :func:`session_counts`,
    but the in-block kernel emits each interior user's per-session
    lengths (segmented cumsum over gap flags + reduceat) already
    histogrammed to ≤|distinct lengths| rows per block; edge users
    re-emit raw rows to the per-user stitch.  ONE tiny groupby Sum
    finishes.
    """
    gap_us = gap_s * 1_000_000

    def _hist(us, ts):
        """Histogram of session lengths over (user, ts)-sorted arrays."""
        n = len(us)
        new_sess = np.empty(n, dtype=bool)
        new_sess[0] = True
        new_sess[1:] = (us[1:] != us[:-1]) | ((ts[1:] - ts[:-1]) > gap_us)
        ss = np.flatnonzero(new_sess)
        slen = np.concatenate([ss[1:], [n]]) - ss
        uniq, cnt = np.unique(slen, return_counts=True)
        return uniq.astype(np.int64), cnt.astype(np.int64)

    def block_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "session_len": pa.array([], type=pa.int64()),
            "n_sessions": pa.array([], type=pa.int64()),
            "user_id": pa.array([], type=pa.int64()),
            "ts": pa.array([], type=pa.int64()),
            "boundary": pa.array([], type=pa.bool_())})
        n = t.num_rows
        if n == 0:
            return empty
        us = np.asarray(one_chunk(t["user_id"])).astype(np.int64)
        ts = np.asarray(pc.cast(pc.cast(one_chunk(t["ts"]),
                                        pa.timestamp("us")), pa.int64()))
        change = np.nonzero(us[1:] != us[:-1])[0] + 1
        starts = np.concatenate([[0], change]).astype(np.int64)
        last = len(starts) - 1
        lo = starts[1] if last >= 1 else n
        hi = starts[last] if last >= 1 else 0
        if lo < hi:
            ln, cnt = _hist(us[lo:hi], ts[lo:hi])
        else:
            ln = cnt = np.empty(0, dtype=np.int64)
        edge_idx = np.concatenate([np.arange(0, lo),
                                   np.arange(hi, n)]) if last >= 1 \
            else np.arange(0, n)
        n_i, n_b = len(ln), len(edge_idx)
        return pa.table({
            "session_len": pa.array(np.concatenate(
                [ln, np.full(n_b, -1, np.int64)])),
            "n_sessions": pa.array(np.concatenate(
                [cnt, np.full(n_b, -1, np.int64)])),
            "user_id": pa.array(np.concatenate(
                [np.full(n_i, -1, np.int64), us[edge_idx]])),
            "ts": pa.array(np.concatenate(
                [np.full(n_i, -1, np.int64), ts[edge_idx]])),
            "boundary": pa.array([False] * n_i + [True] * n_b),
        })

    def stitch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"session_len": pa.array([], type=pa.int64()),
                             "n_sessions": pa.array([], type=pa.int64())})
        us = np.asarray(one_chunk(t["user_id"])).astype(np.int64)
        ts = np.asarray(one_chunk(t["ts"])).astype(np.int64)
        order = np.lexsort((ts, us))
        ln, cnt = _hist(us[order], ts[order])
        return pa.table({"session_len": pa.array(ln),
                         "n_sessions": pa.array(cnt)})

    from ray.data.aggregate import Sum

    srt = events.sort(["user_id", "ts"])
    mixed = srt.map_batches(block_fn, batch_format="pyarrow",
                            batch_size=None).materialize()
    interior = mixed.map_batches(
        lambda t: t.filter(pc.equal(t["boundary"], False))
        .select(["session_len", "n_sessions"]),
        batch_format="pyarrow")
    carries = mixed.map_batches(
        lambda t: t.filter(t["boundary"]).select(["user_id", "ts"]),
        batch_format="pyarrow")
    cross = sharded_stitch(
        carries,
        lambda t: np.asarray(one_chunk(t["user_id"])),
        stitch, num_shards=stitch_shards)
    return (interior.union(cross)
            .groupby("session_len")
            .aggregate(Sum("n_sessions", alias_name="n_sessions")))


def funnel_steps(events, steps=("view", "click", "purchase"),
                 num_partitions: int = 8):
    """Multi-step ordered funnel: how many users reach each step, where
    step k counts only events STRICTLY AFTER the user's step-(k−1) time
    (the product-analytics funnel, generalized past the 2-step
    conversion op).  Returns pandas (step, step_type, n_users) — one
    row per step.

    Iterated-aggregate plan (k−1 rounds, no per-user Python, no
    broadcast of user-cardinality state): round k filters the stream to
    the step's type, shuffle-hash-joins it against the previous round's
    (user, t) frontier on user_id — both sides fact-sized, so the
    exchange is the hash join, not a broadcast — and reduces to the
    per-user min time with a per-batch combiner.  Each frontier is
    strictly smaller than the last.
    """
    import pandas as pd
    import pyarrow.compute as pc2
    from ray.data.aggregate import Min

    from .joins import shuffle_hash_join

    def prep(t: pa.Table) -> pa.Table:
        us = np.asarray(pc.cast(pc.cast(one_chunk(t["ts"]),
                                        pa.timestamp("us")), pa.int64()))
        return pa.table({"user_id": t["user_id"],
                         "event_type": t["event_type"],
                         "us": pa.array(us)})

    ev = events.map_batches(prep, batch_format="pyarrow").materialize()

    def of_type(ty):
        return ev.map_batches(
            lambda t, ty=ty: t.filter(pc2.equal(t["event_type"], ty))
            .select(["user_id", "us"]), batch_format="pyarrow")

    def min_per_user(ds):
        def combine(t: pa.Table) -> pa.Table:
            g = t.group_by("user_id").aggregate([("us", "min")])
            return g.select(["user_id", "us_min"]) \
                .rename_columns(["user_id", "us"])
        return (ds.map_batches(combine, batch_format="pyarrow")
                .groupby("user_id").aggregate(Min("us", alias_name="t")))

    frontier = min_per_user(of_type(steps[0]))
    counts = [frontier.count()]
    for ty in steps[1:]:
        cand = shuffle_hash_join(
            of_type(ty), frontier, on=["user_id"],
            num_partitions=num_partitions,
            project=["user_id", "us", "t"])
        after = cand.map_batches(
            lambda t: t.filter(pc.greater(t["us"], t["t"]))
            .select(["user_id", "us"]), batch_format="pyarrow")
        frontier = min_per_user(after).materialize()
        counts.append(frontier.count())

    return pd.DataFrame({
        "step": np.arange(1, len(steps) + 1, dtype=np.int64),
        "step_type": list(steps),
        "n_users": np.asarray(counts, dtype=np.int64)})


def value_moving_range_by_type(events,
                               stitch_shards: int = DEFAULT_STITCH_SHARDS):
    """Moving-range accumulator per event type — Σ|vmᵢ − vmᵢ₋₁| and the
    diff count over each type's (ts, event_id)-ordered value stream: the
    XmR control-chart statistic (mean moving range = sum/n, left to the
    caller), exact int64 milli.

    Sorted-block plan keyed by event_type (few groups, so most blocks
    hold one interior run): interior types reduce in-block to ONE
    (type, sum, n) partial; edge types re-emit raw rows to the per-type
    stitch.  Final exchange is a ≤|types|-row groupby Sum.
    """
    from ray.data.aggregate import Sum

    from .windowfns import _milli

    def _ranges(ty, ts, vm):
        same = ty[1:] == ty[:-1]
        d = np.abs(vm[1:] - vm[:-1])[same]
        tkeys = ty[1:][same]
        uniq, inv = np.unique(tkeys, return_inverse=True)
        # int64 scatter-add (np.bincount weights are float64 — inexact
        # past 2^53, which a fleet-scale milli sum can reach)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, d)
        cnts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return uniq, sums, cnts

    def block_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "event_type": pa.array([], type=pa.string()),
            "sum_abs_diff": pa.array([], type=pa.int64()),
            "n_diffs": pa.array([], type=pa.int64()),
            "ts": pa.array([], type=pa.int64()),
            "event_id": pa.array([], type=pa.int64()),
            "vm": pa.array([], type=pa.int64()),
            "boundary": pa.array([], type=pa.bool_())})
        n = t.num_rows
        if n == 0:
            return empty
        ty = np.asarray(one_chunk(t["event_type"]))
        ts = np.asarray(pc.cast(pc.cast(one_chunk(t["ts"]),
                                        pa.timestamp("us")), pa.int64()))
        eid = np.asarray(one_chunk(t["event_id"])).astype(np.int64)
        vm = _milli(one_chunk(t["value"]))
        change = np.nonzero(ty[1:] != ty[:-1])[0] + 1
        starts = np.concatenate([[0], change]).astype(np.int64)
        last = len(starts) - 1
        lo = starts[1] if last >= 1 else n
        hi = starts[last] if last >= 1 else 0
        if lo < hi:
            u, s, c = _ranges(ty[lo:hi], ts[lo:hi], vm[lo:hi])
        else:
            u = np.empty(0, dtype=object)
            s = c = np.empty(0, dtype=np.int64)
        edge_idx = np.concatenate([np.arange(0, lo),
                                   np.arange(hi, n)]) if last >= 1 \
            else np.arange(0, n)
        n_i, n_b = len(u), len(edge_idx)
        return pa.table({
            "event_type": pa.array(
                np.concatenate([u, ty[edge_idx]]).astype(object),
                type=pa.string()),
            "sum_abs_diff": pa.array(np.concatenate(
                [s, np.full(n_b, -1, np.int64)])),
            "n_diffs": pa.array(np.concatenate(
                [c, np.full(n_b, -1, np.int64)])),
            "ts": pa.array(np.concatenate(
                [np.full(n_i, -1, np.int64), ts[edge_idx]])),
            "event_id": pa.array(np.concatenate(
                [np.full(n_i, -1, np.int64), eid[edge_idx]])),
            "vm": pa.array(np.concatenate(
                [np.full(n_i, -1, np.int64), vm[edge_idx]])),
            "boundary": pa.array([False] * n_i + [True] * n_b),
        })

    def stitch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "event_type": pa.array([], type=pa.string()),
                "sum_abs_diff": pa.array([], type=pa.int64()),
                "n_diffs": pa.array([], type=pa.int64())})
        ty = np.asarray(one_chunk(t["event_type"]))
        ts = np.asarray(one_chunk(t["ts"])).astype(np.int64)
        eid = np.asarray(one_chunk(t["event_id"])).astype(np.int64)
        vm = np.asarray(one_chunk(t["vm"])).astype(np.int64)
        order = np.lexsort((eid, ts, ty.astype(str)))
        u, s, c = _ranges(ty[order], ts[order], vm[order])
        return pa.table({
            "event_type": pa.array(u.astype(object), type=pa.string()),
            "sum_abs_diff": pa.array(s), "n_diffs": pa.array(c)})

    def shard_of(t: pa.Table) -> np.ndarray:
        import pandas as pd
        return pd.util.hash_array(
            one_chunk(t["event_type"]).to_numpy(zero_copy_only=False)) \
            .astype(np.int64) & np.int64(0x7FFFFFFFFFFFFFFF)

    srt = events.sort(["event_type", "ts", "event_id"])
    mixed = srt.map_batches(block_fn, batch_format="pyarrow",
                            batch_size=None).materialize()
    interior = mixed.map_batches(
        lambda t: t.filter(pc.equal(t["boundary"], False))
        .select(["event_type", "sum_abs_diff", "n_diffs"]),
        batch_format="pyarrow")
    carries = mixed.map_batches(
        lambda t: t.filter(t["boundary"])
        .select(["event_type", "ts", "event_id", "vm"]),
        batch_format="pyarrow")
    cross = sharded_stitch(carries, shard_of, stitch,
                           num_shards=stitch_shards)
    return (interior.union(cross)
            .groupby("event_type")
            .aggregate(Sum("sum_abs_diff", alias_name="sum_abs_diff"),
                       Sum("n_diffs", alias_name="n_diffs")))


def max_concurrent_events(events, us_per_milli: int = 1_000):
    """Peak concurrency of event intervals — each event occupies
    ``[ts, ts + floor(value·1000)·us_per_milli)`` and the operator
    reports the maximum number of simultaneously-open intervals plus
    the EARLIEST microsecond it is reached (capacity planning /
    "meeting rooms", the canonical boundary sweep).  Exact integers;
    non-positive durations drop.

    Distributed sweep on the zipWithIndex pattern: ±1 boundary rows
    sort globally on (us, delta) (ends apply before starts at a tie, so
    touching intervals never over-count); each sorted block reports
    (first key, Σdelta, running-max-relative, argmax position data),
    the driver prefix-sums the |blocks|-row metadata to place every
    block's absolute offset, and a second pass over only the blocks
    attaining the global max finds the earliest attaining boundary.
    Returns pandas one row (max_concurrent, at_us).
    """
    import pandas as pd

    def boundaries(t: pa.Table) -> pa.Table:
        us = np.asarray(pc.cast(pc.cast(one_chunk(t["ts"]),
                                        pa.timestamp("us")), pa.int64()))
        eid = np.asarray(one_chunk(t["event_id"])).astype(np.int64)
        dur = np.floor(one_chunk(t["value"]).to_numpy(
            zero_copy_only=False).astype(np.float64) * 1000.0) \
            .astype(np.int64) * us_per_milli
        keep = dur > 0
        us, dur, eid = us[keep], dur[keep], eid[keep]
        # uid makes every boundary row unique so block metadata keys
        # are unambiguous even under duplicate (us, delta) boundaries
        return pa.table({
            "us": pa.array(np.concatenate([us, us + dur])),
            "delta": pa.array(np.concatenate(
                [np.ones(len(us), np.int64),
                 np.full(len(us), -1, np.int64)])),
            "uid": pa.array(np.concatenate(
                [eid * 2, eid * 2 + 1]))})

    srt = events.map_batches(boundaries, batch_format="pyarrow") \
        .sort(["us", "delta", "uid"]).materialize()

    def block_meta(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({k: pa.array([], type=pa.int64())
                             for k in ("k_us", "k_delta", "k_uid",
                                       "dsum", "rmax")})
        d = np.asarray(one_chunk(t["delta"])).astype(np.int64)
        cs = np.cumsum(d)
        return pa.table({
            "k_us": pa.array([one_chunk(t["us"])[0].as_py()],
                             type=pa.int64()),
            "k_delta": pa.array([int(d[0])], type=pa.int64()),
            "k_uid": pa.array([one_chunk(t["uid"])[0].as_py()],
                              type=pa.int64()),
            "dsum": pa.array([int(cs[-1])], type=pa.int64()),
            "rmax": pa.array([int(cs.max())], type=pa.int64())})

    meta = srt.map_batches(block_meta, batch_format="pyarrow",
                           batch_size=None).to_pandas() \
        .sort_values(["k_us", "k_delta", "k_uid"]).reset_index(drop=True)
    if meta.empty:
        return pd.DataFrame({"max_concurrent": [0], "at_us": [0]}) \
            .astype("int64")
    offs = np.concatenate([[0], meta["dsum"].cumsum().to_numpy()[:-1]]) \
        .astype(np.int64)
    gmax = int((offs + meta["rmax"].to_numpy()).max())
    winners = set(map(tuple, meta.loc[
        offs + meta["rmax"].to_numpy() == gmax,
        ["k_us", "k_delta", "k_uid"]].to_numpy()))
    off_of = {(int(r.k_us), int(r.k_delta), int(r.k_uid)): int(o)
              for r, o in zip(meta.itertuples(), offs)}

    def first_attain(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"at_us": pa.array([], type=pa.int64())})
        key = (one_chunk(t["us"])[0].as_py(),
               one_chunk(t["delta"])[0].as_py(),
               one_chunk(t["uid"])[0].as_py())
        if key not in winners:
            return pa.table({"at_us": pa.array([], type=pa.int64())})
        d = np.asarray(one_chunk(t["delta"])).astype(np.int64)
        run = off_of[key] + np.cumsum(d)
        pos = int(np.flatnonzero(run == gmax)[0])
        return pa.table({"at_us": pa.array(
            [one_chunk(t["us"])[pos].as_py()], type=pa.int64())})

    at = srt.map_batches(first_attain, batch_format="pyarrow",
                         batch_size=None).to_pandas()
    return pd.DataFrame({"max_concurrent": [gmax],
                         "at_us": [int(at["at_us"].min())]}) \
        .astype("int64")


def time_weighted_value_sum(events,
                            stitch_shards: int = DEFAULT_STITCH_SHARDS):
    """Per-user time-weighted exposure — Σ value_milli × gap_seconds
    over adjacent (ts, event_id)-ordered events, each value held until
    the NEXT event (the step-function integral; the last event holds
    nothing).  gap_seconds = (next_us − us) // 1_000_000, floored on
    the DIFFERENCE so both engines agree on sub-second gaps.  Returns
    (user_id, tw_value_sum, n_gaps); single-event users appear with
    (0, 0).

    Sorted-block plan (the :func:`user_gap_histogram` skeleton): users
    fully interior to a block reduce to one (user, sum, gaps) partial
    in-block; the block's edge users re-emit raw rows to the per-user
    stitch shards; ONE user-keyed groupby Sum merges — each user's sum
    comes entirely from one path, so the merge is a disjoint union.
    Overflow bound: vm < 2^20 and month-scale gaps < 2^22 s keep each
    term < 2^42; callers integrating years of per-user history should
    rescale to minutes first.
    """
    from ray.data.aggregate import Sum

    from .windowfns import _milli as _milli_vals

    def _per_user(us, ts, vm):
        """(users, tw_sums, n_gaps) over arrays sorted by (user, ts)."""
        uniq, inv = np.unique(us, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        gaps = np.zeros(len(uniq), dtype=np.int64)
        if len(us) > 1:
            same = us[1:] == us[:-1]
            g = (ts[1:] - ts[:-1])[same] // 1_000_000
            w = vm[:-1][same] * g
            idx = inv[:-1][same]
            np.add.at(sums, idx, w)
            np.add.at(gaps, idx, 1)
        return uniq, sums, gaps

    def block_partial(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "user_id": pa.array([], type=pa.int64()),
            "tw_value_sum": pa.array([], type=pa.int64()),
            "n_gaps": pa.array([], type=pa.int64()),
            "ts": pa.array([], type=pa.int64()),
            "event_id": pa.array([], type=pa.int64()),
            "vm": pa.array([], type=pa.int64()),
            "boundary": pa.array([], type=pa.bool_())})
        n = t.num_rows
        if n == 0:
            return empty
        us = np.asarray(one_chunk(t["user_id"])).astype(np.int64)
        ts = np.asarray(pc.cast(pc.cast(one_chunk(t["ts"]),
                                        pa.timestamp("us")), pa.int64()))
        eid = np.asarray(one_chunk(t["event_id"])).astype(np.int64)
        vm = _milli_vals(one_chunk(t["value"]))
        change = np.nonzero(us[1:] != us[:-1])[0] + 1
        starts = np.concatenate([[0], change]).astype(np.int64)
        last = len(starts) - 1
        lo = starts[1] if last >= 1 else n
        hi = starts[last] if last >= 1 else 0
        if lo < hi:
            iu, isum, igap = _per_user(us[lo:hi], ts[lo:hi], vm[lo:hi])
        else:
            iu = isum = igap = np.empty(0, dtype=np.int64)
        edge_idx = np.concatenate([np.arange(0, lo),
                                   np.arange(hi, n)]) if last >= 1 \
            else np.arange(0, n)
        n_i, n_b = len(iu), len(edge_idx)
        return pa.table({
            "user_id": pa.array(np.concatenate([iu, us[edge_idx]])),
            "tw_value_sum": pa.array(np.concatenate(
                [isum, np.zeros(n_b, np.int64)])),
            "n_gaps": pa.array(np.concatenate(
                [igap, np.zeros(n_b, np.int64)])),
            "ts": pa.array(np.concatenate(
                [np.full(n_i, -1, np.int64), ts[edge_idx]])),
            "event_id": pa.array(np.concatenate(
                [np.full(n_i, -1, np.int64), eid[edge_idx]])),
            "vm": pa.array(np.concatenate(
                [np.full(n_i, -1, np.int64), vm[edge_idx]])),
            "boundary": pa.array([False] * n_i + [True] * n_b)})

    def stitch(t: pa.Table) -> pa.Table:
        out = pa.table({"user_id": pa.array([], type=pa.int64()),
                        "tw_value_sum": pa.array([], type=pa.int64()),
                        "n_gaps": pa.array([], type=pa.int64())})
        if t.num_rows == 0:
            return out
        us = np.asarray(one_chunk(t["user_id"])).astype(np.int64)
        ts = np.asarray(one_chunk(t["ts"])).astype(np.int64)
        eid = np.asarray(one_chunk(t["event_id"])).astype(np.int64)
        vm = np.asarray(one_chunk(t["vm"])).astype(np.int64)
        order = np.lexsort((eid, ts, us))
        uu, ss, gg = _per_user(us[order], ts[order], vm[order])
        return pa.table({"user_id": pa.array(uu),
                         "tw_value_sum": pa.array(ss),
                         "n_gaps": pa.array(gg)})

    srt = events.sort(["user_id", "ts", "event_id"])
    mixed = srt.map_batches(block_partial, batch_format="pyarrow",
                            batch_size=None).materialize()
    interior = mixed.map_batches(
        lambda t: t.filter(pc.equal(t["boundary"], False))
        .select(["user_id", "tw_value_sum", "n_gaps"]),
        batch_format="pyarrow")
    carries = mixed.map_batches(
        lambda t: t.filter(t["boundary"])
        .select(["user_id", "ts", "event_id", "vm"]),
        batch_format="pyarrow")
    cross = sharded_stitch(
        carries,
        lambda t: np.asarray(one_chunk(t["user_id"])),
        stitch, num_shards=stitch_shards)
    return (interior.union(cross)
            .groupby("user_id")
            .aggregate(Sum("tw_value_sum", alias_name="tw_value_sum"),
                       Sum("n_gaps", alias_name="n_gaps")))


def clamped_running_balance(events, pos_type: str = "purchase",
                            neg_type: str = "click",
                            stitch_shards: int = DEFAULT_STITCH_SHARDS):
    """Per-user running balance clamped below at zero — inventory /
    wallet semantics: +value_milli on ``pos_type``, −value_milli on
    ``neg_type`` (other types ignored), and the balance never goes
    negative: ``s_i = max(s_{i-1} + d_i, 0)``.

    The clamp makes the scan nonlinear, but it has the closed form
    ``s_i = pre_i − min(0, min_{j≤i} pre_j)`` (prefix sum minus the
    running minimum of the prefix, floored at 0) — both engines compute
    THAT, so no sequential recursion crosses the wire.  (Equivalently:
    the per-segment maps ``f(x) = max(x+A, M)`` compose in closed form,
    the escape hatch if one user ever outgrows a stitch shard.)
    Returns (event_id, user_id, balance_milli) for the typed rows.

    Sorted-block plan: interior users scan fully in-block (entry state
    is 0 at each user's first event); edge users re-emit raw rows to
    the per-user stitch shards.  Each row resolves on exactly one path.
    """
    from ray.data.aggregate import Sum  # noqa: F401 (engine symmetry)

    from .windowfns import _milli as _mv

    def _scan(us, d):
        pre = np.cumsum(d)
        starts = np.concatenate([[0], np.nonzero(us[1:] != us[:-1])[0] + 1])
        seg = np.repeat(np.arange(len(starts)), np.diff(
            np.concatenate([starts, [len(us)]])))
        base = pre[starts] - d[starts]          # prefix before each user
        pre_u = pre - base[seg]                  # per-user prefix
        # per-segment running min, floored at 0 (loop is per USER
        # segment with numpy bodies, not per row)
        rm_u = np.empty_like(pre_u)
        for s, e in zip(starts, np.concatenate([starts[1:], [len(us)]])):
            rm_u[s:e] = np.minimum(np.minimum.accumulate(pre_u[s:e]), 0)
        return pre_u - rm_u

    def block_rows(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "event_id": pa.array([], type=pa.int64()),
            "user_id": pa.array([], type=pa.int64()),
            "balance_milli": pa.array([], type=pa.int64()),
            "ts": pa.array([], type=pa.int64()),
            "d": pa.array([], type=pa.int64()),
            "boundary": pa.array([], type=pa.bool_())})
        n = t.num_rows
        if n == 0:
            return empty
        us = np.asarray(one_chunk(t["user_id"])).astype(np.int64)
        ts = np.asarray(pc.cast(pc.cast(one_chunk(t["ts"]),
                                        pa.timestamp("us")), pa.int64()))
        eid = np.asarray(one_chunk(t["event_id"])).astype(np.int64)
        d = np.asarray(one_chunk(t["d"])).astype(np.int64)
        change = np.nonzero(us[1:] != us[:-1])[0] + 1
        starts = np.concatenate([[0], change]).astype(np.int64)
        last = len(starts) - 1
        lo = starts[1] if last >= 1 else n
        hi = starts[last] if last >= 1 else 0
        if lo < hi:
            bal = _scan(us[lo:hi], d[lo:hi])
            iu, ie, ib = us[lo:hi], eid[lo:hi], bal
        else:
            iu = ie = ib = np.empty(0, dtype=np.int64)
        edge_idx = np.concatenate([np.arange(0, lo),
                                   np.arange(hi, n)]) if last >= 1 \
            else np.arange(0, n)
        n_i, n_b = len(iu), len(edge_idx)
        return pa.table({
            "event_id": pa.array(np.concatenate([ie, eid[edge_idx]])),
            "user_id": pa.array(np.concatenate([iu, us[edge_idx]])),
            "balance_milli": pa.array(np.concatenate(
                [ib, np.zeros(n_b, np.int64)])),
            "ts": pa.array(np.concatenate(
                [np.full(n_i, -1, np.int64), ts[edge_idx]])),
            "d": pa.array(np.concatenate(
                [np.full(n_i, -1, np.int64), d[edge_idx]])),
            "boundary": pa.array([False] * n_i + [True] * n_b)})

    def stitch(t: pa.Table) -> pa.Table:
        out = pa.table({"event_id": pa.array([], type=pa.int64()),
                        "user_id": pa.array([], type=pa.int64()),
                        "balance_milli": pa.array([], type=pa.int64())})
        if t.num_rows == 0:
            return out
        us = np.asarray(one_chunk(t["user_id"])).astype(np.int64)
        ts = np.asarray(one_chunk(t["ts"])).astype(np.int64)
        eid = np.asarray(one_chunk(t["event_id"])).astype(np.int64)
        d = np.asarray(one_chunk(t["d"])).astype(np.int64)
        order = np.lexsort((eid, ts, us))
        bal = _scan(us[order], d[order])
        return pa.table({"event_id": pa.array(eid[order]),
                         "user_id": pa.array(us[order]),
                         "balance_milli": pa.array(bal)})

    def prep(t: pa.Table) -> pa.Table:
        et = one_chunk(t["event_type"])
        keep = pc.or_(pc.equal(et, pos_type), pc.equal(et, neg_type))
        t = t.filter(keep)
        vm = _mv(one_chunk(t["value"]))
        sign = np.where(np.asarray(pc.equal(one_chunk(t["event_type"]),
                                            pos_type)), 1, -1)
        return pa.table({"event_id": t["event_id"],
                         "user_id": t["user_id"], "ts": t["ts"],
                         "d": pa.array(vm * sign)})

    srt = events.map_batches(prep, batch_format="pyarrow") \
        .sort(["user_id", "ts", "event_id"])
    mixed = srt.map_batches(block_rows, batch_format="pyarrow",
                            batch_size=None).materialize()
    interior = mixed.map_batches(
        lambda t: t.filter(pc.equal(t["boundary"], False))
        .select(["event_id", "user_id", "balance_milli"]),
        batch_format="pyarrow")
    carries = mixed.map_batches(
        lambda t: t.filter(t["boundary"])
        .select(["event_id", "user_id", "ts", "d"]),
        batch_format="pyarrow")
    cross = sharded_stitch(
        carries,
        lambda t: np.asarray(one_chunk(t["user_id"])),
        stitch, num_shards=stitch_shards)
    return interior.union(cross)


def first_touch_attribution(events, window_s: int = 86_400,
                            touch_type: str = "click",
                            conv_type: str = "purchase",
                            stitch_shards: int = DEFAULT_STITCH_SHARDS):
    """First-touch attribution — for every conversion, the EARLIEST
    touch event of the same user inside the lookback window
    ``conv_ts − window_s ≤ touch_ts < conv_ts`` (strictly before the
    conversion), plus how many touches competed.  Conversions with no
    in-window touch are dropped (unattributed).  Returns
    (purchase_id, user_id, first_click_us, n_clicks_window).

    This is a per-user RANGE join, executed as two ``searchsorted``
    probes per conversion against the user's sorted touch timestamps —
    never a pairwise expansion, so a zipfian power-user costs
    O(touches + conversions·log touches), not O(touches × conversions).
    Same sorted-block + edge-user stitch plan as the other window ops.
    """
    w_us = window_s * 1_000_000

    def _attr(us, ts, eid, is_conv):
        """Per sorted slice: attribution rows (arrays)."""
        out_pid, out_uid, out_first, out_n = [], [], [], []
        starts = np.concatenate(
            [[0], np.nonzero(us[1:] != us[:-1])[0] + 1, [len(us)]])
        for s, e in zip(starts[:-1], starts[1:]):
            conv = is_conv[s:e]
            cts = ts[s:e][~conv]
            if not conv.any() or len(cts) == 0:
                continue
            pts = ts[s:e][conv]
            pids = eid[s:e][conv]
            lo = np.searchsorted(cts, pts - w_us, side="left")
            hi = np.searchsorted(cts, pts, side="left")
            n = hi - lo
            hit = n > 0
            out_pid.append(pids[hit])
            out_uid.append(np.full(int(hit.sum()), us[s], np.int64))
            out_first.append(cts[lo[hit]])
            out_n.append(n[hit])
        if not out_pid:
            z = np.empty(0, dtype=np.int64)
            return z, z, z, z
        return (np.concatenate(out_pid), np.concatenate(out_uid),
                np.concatenate(out_first),
                np.concatenate(out_n).astype(np.int64))

    def block_rows(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "purchase_id": pa.array([], type=pa.int64()),
            "user_id": pa.array([], type=pa.int64()),
            "first_click_us": pa.array([], type=pa.int64()),
            "n_clicks_window": pa.array([], type=pa.int64()),
            "ts": pa.array([], type=pa.int64()),
            "is_conv": pa.array([], type=pa.bool_()),
            "boundary": pa.array([], type=pa.bool_())})
        n = t.num_rows
        if n == 0:
            return empty
        us = np.asarray(one_chunk(t["user_id"])).astype(np.int64)
        ts = np.asarray(one_chunk(t["us"])).astype(np.int64)
        eid = np.asarray(one_chunk(t["event_id"])).astype(np.int64)
        cv = np.asarray(one_chunk(t["is_conv"]))
        change = np.nonzero(us[1:] != us[:-1])[0] + 1
        starts = np.concatenate([[0], change]).astype(np.int64)
        last = len(starts) - 1
        lo = starts[1] if last >= 1 else n
        hi = starts[last] if last >= 1 else 0
        if lo < hi:
            pid, uid, first, cnt = _attr(us[lo:hi], ts[lo:hi],
                                         eid[lo:hi], cv[lo:hi])
        else:
            pid = uid = first = cnt = np.empty(0, dtype=np.int64)
        edge_idx = np.concatenate([np.arange(0, lo),
                                   np.arange(hi, n)]) if last >= 1 \
            else np.arange(0, n)
        n_i, n_b = len(pid), len(edge_idx)
        return pa.table({
            "purchase_id": pa.array(np.concatenate([pid, eid[edge_idx]])),
            "user_id": pa.array(np.concatenate([uid, us[edge_idx]])),
            "first_click_us": pa.array(np.concatenate(
                [first, np.zeros(n_b, np.int64)])),
            "n_clicks_window": pa.array(np.concatenate(
                [cnt, np.zeros(n_b, np.int64)])),
            "ts": pa.array(np.concatenate(
                [np.full(n_i, -1, np.int64), ts[edge_idx]])),
            "is_conv": pa.array(np.concatenate(
                [np.zeros(n_i, bool), cv[edge_idx]])),
            "boundary": pa.array([False] * n_i + [True] * n_b)})

    def stitch(t: pa.Table) -> pa.Table:
        out = pa.table({
            "purchase_id": pa.array([], type=pa.int64()),
            "user_id": pa.array([], type=pa.int64()),
            "first_click_us": pa.array([], type=pa.int64()),
            "n_clicks_window": pa.array([], type=pa.int64())})
        if t.num_rows == 0:
            return out
        us = np.asarray(one_chunk(t["user_id"])).astype(np.int64)
        ts = np.asarray(one_chunk(t["ts"])).astype(np.int64)
        eid = np.asarray(one_chunk(t["purchase_id"])).astype(np.int64)
        cv = np.asarray(one_chunk(t["is_conv"]))
        order = np.lexsort((eid, ts, us))
        pid, uid, first, cnt = _attr(us[order], ts[order], eid[order],
                                     cv[order])
        return pa.table({"purchase_id": pa.array(pid),
                         "user_id": pa.array(uid),
                         "first_click_us": pa.array(first),
                         "n_clicks_window": pa.array(cnt)})

    def prep(t: pa.Table) -> pa.Table:
        et = one_chunk(t["event_type"])
        keep = pc.or_(pc.equal(et, touch_type), pc.equal(et, conv_type))
        t = t.filter(keep)
        ts = pc.cast(pc.cast(one_chunk(t["ts"]), pa.timestamp("us")),
                     pa.int64())
        return pa.table({
            "event_id": t["event_id"], "user_id": t["user_id"],
            "us": ts,
            "is_conv": pc.equal(one_chunk(t["event_type"]), conv_type)})

    srt = events.map_batches(prep, batch_format="pyarrow") \
        .sort(["user_id", "us", "event_id"])
    mixed = srt.map_batches(block_rows, batch_format="pyarrow",
                            batch_size=None).materialize()
    interior = mixed.map_batches(
        lambda t: t.filter(pc.equal(t["boundary"], False))
        .select(["purchase_id", "user_id", "first_click_us",
                 "n_clicks_window"]),
        batch_format="pyarrow")
    carries = mixed.map_batches(
        lambda t: t.filter(t["boundary"])
        .select(["purchase_id", "user_id", "ts", "is_conv"]),
        batch_format="pyarrow")
    cross = sharded_stitch(
        carries,
        lambda t: np.asarray(one_chunk(t["user_id"])),
        stitch, num_shards=stitch_shards)
    return interior.union(cross)


def max_drawdown_by_user(events, pos_type: str = "purchase",
                         neg_type: str = "click",
                         stitch_shards: int = DEFAULT_STITCH_SHARDS):
    """Maximum drawdown of each user's running balance — the largest
    peak-to-trough drop ``max_i (runmax(pre)_i − pre_i)`` over the
    (ts, event_id)-ordered signed prefix (+value on ``pos_type``,
    −value on ``neg_type``): the risk statistic whose scan, like the
    clamp, has a closed form both engines share (running max minus
    prefix, no recursion on the wire).  Returns
    (user_id, max_drawdown_milli, n_events); single-event users report
    max(0, −d₁).

    Sorted-block + edge-user stitch; each user collapses to ONE output
    row on exactly one path, so the merge groupby is a disjoint union.
    """
    from ray.data.aggregate import Max, Sum

    from .windowfns import _milli as _mv

    def _dd(us, d):
        pre = np.cumsum(d)
        starts = np.concatenate(
            [[0], np.nonzero(us[1:] != us[:-1])[0] + 1])
        ends = np.concatenate([starts[1:], [len(us)]])
        uu = us[starts]
        out = np.empty(len(starts), dtype=np.int64)
        cnt = (ends - starts).astype(np.int64)
        for i, (s, e) in enumerate(zip(starts, ends)):
            seg = pre[s:e] - (pre[s] - d[s])
            rm = np.maximum.accumulate(np.maximum(seg, 0))
            out[i] = int((rm - seg).max())
        return uu, out, cnt

    def block_rows(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "user_id": pa.array([], type=pa.int64()),
            "max_drawdown_milli": pa.array([], type=pa.int64()),
            "n_events": pa.array([], type=pa.int64()),
            "ts": pa.array([], type=pa.int64()),
            "event_id": pa.array([], type=pa.int64()),
            "d": pa.array([], type=pa.int64()),
            "boundary": pa.array([], type=pa.bool_())})
        n = t.num_rows
        if n == 0:
            return empty
        us = np.asarray(one_chunk(t["user_id"])).astype(np.int64)
        ts = np.asarray(pc.cast(pc.cast(one_chunk(t["ts"]),
                                        pa.timestamp("us")), pa.int64()))
        eid = np.asarray(one_chunk(t["event_id"])).astype(np.int64)
        d = np.asarray(one_chunk(t["d"])).astype(np.int64)
        change = np.nonzero(us[1:] != us[:-1])[0] + 1
        starts = np.concatenate([[0], change]).astype(np.int64)
        last = len(starts) - 1
        lo = starts[1] if last >= 1 else n
        hi = starts[last] if last >= 1 else 0
        if lo < hi:
            iu, idd, icnt = _dd(us[lo:hi], d[lo:hi])
        else:
            iu = idd = icnt = np.empty(0, dtype=np.int64)
        edge_idx = np.concatenate([np.arange(0, lo),
                                   np.arange(hi, n)]) if last >= 1 \
            else np.arange(0, n)
        n_i, n_b = len(iu), len(edge_idx)
        return pa.table({
            "user_id": pa.array(np.concatenate([iu, us[edge_idx]])),
            "max_drawdown_milli": pa.array(np.concatenate(
                [idd, np.zeros(n_b, np.int64)])),
            "n_events": pa.array(np.concatenate(
                [icnt, np.zeros(n_b, np.int64)])),
            "ts": pa.array(np.concatenate(
                [np.full(n_i, -1, np.int64), ts[edge_idx]])),
            "event_id": pa.array(np.concatenate(
                [np.full(n_i, -1, np.int64), eid[edge_idx]])),
            "d": pa.array(np.concatenate(
                [np.full(n_i, -1, np.int64), d[edge_idx]])),
            "boundary": pa.array([False] * n_i + [True] * n_b)})

    def stitch(t: pa.Table) -> pa.Table:
        out = pa.table({
            "user_id": pa.array([], type=pa.int64()),
            "max_drawdown_milli": pa.array([], type=pa.int64()),
            "n_events": pa.array([], type=pa.int64())})
        if t.num_rows == 0:
            return out
        us = np.asarray(one_chunk(t["user_id"])).astype(np.int64)
        ts = np.asarray(one_chunk(t["ts"])).astype(np.int64)
        eid = np.asarray(one_chunk(t["event_id"])).astype(np.int64)
        d = np.asarray(one_chunk(t["d"])).astype(np.int64)
        order = np.lexsort((eid, ts, us))
        uu, dd, cnt = _dd(us[order], d[order])
        return pa.table({"user_id": pa.array(uu),
                         "max_drawdown_milli": pa.array(dd),
                         "n_events": pa.array(cnt)})

    def prep(t: pa.Table) -> pa.Table:
        et = one_chunk(t["event_type"])
        keep = pc.or_(pc.equal(et, pos_type), pc.equal(et, neg_type))
        t = t.filter(keep)
        vm = _mv(one_chunk(t["value"]))
        sign = np.where(np.asarray(pc.equal(one_chunk(t["event_type"]),
                                            pos_type)), 1, -1)
        return pa.table({"event_id": t["event_id"],
                         "user_id": t["user_id"], "ts": t["ts"],
                         "d": pa.array(vm * sign)})

    srt = events.map_batches(prep, batch_format="pyarrow") \
        .sort(["user_id", "ts", "event_id"])
    mixed = srt.map_batches(block_rows, batch_format="pyarrow",
                            batch_size=None).materialize()
    interior = mixed.map_batches(
        lambda t: t.filter(pc.equal(t["boundary"], False))
        .select(["user_id", "max_drawdown_milli", "n_events"]),
        batch_format="pyarrow")
    carries = mixed.map_batches(
        lambda t: t.filter(t["boundary"])
        .select(["user_id", "ts", "event_id", "d"]),
        batch_format="pyarrow")
    cross = sharded_stitch(
        carries,
        lambda t: np.asarray(one_chunk(t["user_id"])),
        stitch, num_shards=stitch_shards)
    return (interior.union(cross)
            .groupby("user_id")
            .aggregate(Max("max_drawdown_milli",
                           alias_name="max_drawdown_milli"),
                       Sum("n_events", alias_name="n_events")))


def sliding_distinct_users(events, window_h: int = 24,
                           stitch_shards: int = DEFAULT_STITCH_SHARDS):
    """Sliding-window distinct users — for every window START hour w,
    how many distinct users have ≥1 event in [w, w+window_h−1] (the
    rolling-DAU curve).  Distinct counts don't merge across buckets,
    so the engine never tries: each user's active-hour set becomes a
    union of COVERAGE INTERVALS ``[h−W+1, h]`` (gaps < W merge), every
    interval becomes a ±1 delta pair, one tiny groupby sums deltas per
    window, and a calendar-bounded prefix walk on the driver turns
    deltas into counts — the sweep-line trick: per-user work is
    O(active hours), the exchange carries interval endpoints only.
    Returns (window_hour, n_distinct) for windows with ≥1 user.

    Plan: distinct (user, hour) combiner groupby → sort(user, hour) →
    sorted-block interval merge with edge-user stitch → delta groupby
    → driver prefix over ≤ |calendar hours| rows.
    """
    from ray.data.aggregate import Count, Sum

    def _deltas(us, hs):
        """Delta rows from per-user sorted hour runs."""
        w_starts, w_deltas = [], []
        starts = np.concatenate(
            [[0], np.nonzero(us[1:] != us[:-1])[0] + 1, [len(us)]])
        for s, e in zip(starts[:-1], starts[1:]):
            h = hs[s:e]
            # split where the gap between consecutive active hours ≥ W
            brk = np.nonzero(h[1:] - h[:-1] >= window_h)[0] + 1
            seg_lo = np.concatenate([[0], brk])
            seg_hi = np.concatenate([brk, [len(h)]])
            lo_w = h[seg_lo] - (window_h - 1)
            hi_w = h[seg_hi - 1]
            w_starts.append(lo_w)
            w_deltas.append(np.ones(len(lo_w), dtype=np.int64))
            w_starts.append(hi_w + 1)
            w_deltas.append(np.full(len(hi_w), -1, dtype=np.int64))
        if not w_starts:
            z = np.empty(0, dtype=np.int64)
            return z, z
        return np.concatenate(w_starts), np.concatenate(w_deltas)

    def pairs(t: pa.Table) -> pa.Table:
        h = np.asarray(pc.cast(pc.cast(one_chunk(t["ts"]),
                                       pa.timestamp("us")),
                               pa.int64())) // 3_600_000_000
        g = pa.table({"user_id": t["user_id"], "h": pa.array(h)}) \
            .group_by(["user_id", "h"]).aggregate([([], "count_all")])
        return g.select(["user_id", "h"])

    distinct = (events.map_batches(pairs, batch_format="pyarrow")
                .groupby(["user_id", "h"])
                .aggregate(Count(alias_name="_c"))
                .drop_columns(["_c"]))

    srt = distinct.sort(["user_id", "h"])

    def block_rows(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "w": pa.array([], type=pa.int64()),
            "delta": pa.array([], type=pa.int64()),
            "user_id": pa.array([], type=pa.int64()),
            "h": pa.array([], type=pa.int64()),
            "boundary": pa.array([], type=pa.bool_())})
        n = t.num_rows
        if n == 0:
            return empty
        us = np.asarray(one_chunk(t["user_id"])).astype(np.int64)
        hs = np.asarray(one_chunk(t["h"])).astype(np.int64)
        change = np.nonzero(us[1:] != us[:-1])[0] + 1
        starts = np.concatenate([[0], change]).astype(np.int64)
        last = len(starts) - 1
        lo = starts[1] if last >= 1 else n
        hi = starts[last] if last >= 1 else 0
        if lo < hi:
            w, d = _deltas(us[lo:hi], hs[lo:hi])
        else:
            w = d = np.empty(0, dtype=np.int64)
        edge_idx = np.concatenate([np.arange(0, lo),
                                   np.arange(hi, n)]) if last >= 1 \
            else np.arange(0, n)
        n_i, n_b = len(w), len(edge_idx)
        return pa.table({
            "w": pa.array(np.concatenate(
                [w, np.zeros(n_b, np.int64)])),
            "delta": pa.array(np.concatenate(
                [d, np.zeros(n_b, np.int64)])),
            "user_id": pa.array(np.concatenate(
                [np.full(n_i, -1, np.int64), us[edge_idx]])),
            "h": pa.array(np.concatenate(
                [np.full(n_i, -1, np.int64), hs[edge_idx]])),
            "boundary": pa.array([False] * n_i + [True] * n_b)})

    def stitch(t: pa.Table) -> pa.Table:
        out = pa.table({"w": pa.array([], type=pa.int64()),
                        "delta": pa.array([], type=pa.int64())})
        if t.num_rows == 0:
            return out
        us = np.asarray(one_chunk(t["user_id"])).astype(np.int64)
        hs = np.asarray(one_chunk(t["h"])).astype(np.int64)
        order = np.lexsort((hs, us))
        w, d = _deltas(us[order], hs[order])
        return pa.table({"w": pa.array(w), "delta": pa.array(d)})

    mixed = srt.map_batches(block_rows, batch_format="pyarrow",
                            batch_size=None).materialize()
    interior = mixed.map_batches(
        lambda t: t.filter(pc.equal(t["boundary"], False))
        .select(["w", "delta"]), batch_format="pyarrow")
    carries = mixed.map_batches(
        lambda t: t.filter(t["boundary"]).select(["user_id", "h"]),
        batch_format="pyarrow")
    cross = sharded_stitch(
        carries,
        lambda t: np.asarray(one_chunk(t["user_id"])),
        stitch, num_shards=stitch_shards)
    deltas = (interior.union(cross)
              .groupby("w").aggregate(Sum("delta", alias_name="delta"))
              .to_pandas().sort_values("w").reset_index(drop=True))
    # calendar-bounded prefix walk (≤ |hours| + 2 aggregated rows)
    ws = deltas["w"].to_numpy().astype(np.int64)
    cum = deltas["delta"].to_numpy().astype(np.int64).cumsum()
    out_w, out_n = [], []
    for i in range(len(ws)):
        lo = ws[i]
        hi = ws[i + 1] if i + 1 < len(ws) else lo + 1
        if cum[i] > 0:
            rng = np.arange(lo, hi, dtype=np.int64)
            out_w.append(rng)
            out_n.append(np.full(len(rng), cum[i], dtype=np.int64))
    if out_w:
        return pa.table({
            "window_hour": pa.array(np.concatenate(out_w)),
            "n_distinct": pa.array(np.concatenate(out_n))})
    return pa.table({"window_hour": pa.array([], type=pa.int64()),
                     "n_distinct": pa.array([], type=pa.int64())})


def event_debounce(events, min_gap_s: int = 60,
                   stitch_shards: int = DEFAULT_STITCH_SHARDS):
    """Streaming throttle / debounce: keep an event iff it is the FIRST of
    its ``(user_id, event_type)`` key or arrived strictly more than
    ``min_gap_s`` after the immediately preceding event of the same key —
    the per-key rate-limit every event-ingest pipeline runs before fan-out
    (dedup-within-window with a sliding predecessor, not a fixed grid).

    Built on :func:`..stages.pergroup.per_group_apply` (sort on
    ``(user_id, event_type, ts, event_id)``, vectorized keep-mask per
    block, block-edge user groups re-resolved in key-sharded stitch
    tasks), so the only exchange is the sort; the keep decision needs one
    predecessor row, which per_group_apply's whole-group contract
    guarantees is co-resident.  Ties (equal ts within a key, broken by
    event_id) have gap 0 and are suppressed — identical to the SQL
    ``lag()`` oracle's arithmetic.

    Returns the kept rows as (event_id, user_id, event_type).
    """
    from .pergroup import per_group_apply

    gap_us = min_gap_s * 1_000_000

    def kernel(t: pa.Table) -> pa.Table:
        n = t.num_rows
        us = np.asarray(one_chunk(t["user_id"])).astype(np.int64)
        et = one_chunk(t["event_type"])
        ts = np.asarray(pc.cast(pc.cast(one_chunk(t["ts"]),
                                        pa.timestamp("us")), pa.int64()))
        newkey = np.ones(n, dtype=bool)
        if n > 1:
            same_user = us[1:] == us[:-1]
            same_type = np.asarray(
                pc.fill_null(pc.equal(et.slice(1), et.slice(0, n - 1)),
                             False), dtype=bool)
            newkey[1:] = ~(same_user & same_type)
        gap = np.zeros(n, dtype=np.int64)
        if n > 1:
            gap[1:] = ts[1:] - ts[:-1]
        keep = pa.array(newkey | (gap > gap_us))
        return pa.table({
            "event_id": one_chunk(t["event_id"]).cast(pa.int64()),
            "user_id": pa.array(us),
            "event_type": et,
        }).filter(keep)

    out_schema = pa.schema([("event_id", pa.int64()),
                            ("user_id", pa.int64()),
                            ("event_type", pa.string())])
    proj = events.select_columns(["event_id", "user_id", "event_type",
                                  "ts"])
    return per_group_apply(proj, "user_id", ["event_type", "ts",
                                             "event_id"],
                           kernel, out_schema,
                           stitch_shards=stitch_shards)
