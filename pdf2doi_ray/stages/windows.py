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
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

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
        us = np.asarray(pc.cast(t["ts"], pa.int64()))
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
        epoch = np.asarray(pc.cast(t["ts"], pa.int64())) // (slide_s * 1_000_000)
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


def session_counts(events, gap_s: int = SESSION_GAP_SECONDS):
    """Per-user session statistics (gap-based session windows).

    One group = one user's full event history, sorted by ts inside the
    group; a gap > ``gap_s`` starts a new session.
    """
    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64))
        gaps = np.diff(ts) > gap_s * 1_000_000
        n_sessions = int(gaps.sum()) + 1
        return pd.DataFrame({
            "user_id": [int(g["user_id"].iloc[0])],
            "n_events": [len(g)],
            "n_sessions": [n_sessions],
        })

    return events.groupby("user_id").map_groups(per_user,
                                                batch_format="pandas")
