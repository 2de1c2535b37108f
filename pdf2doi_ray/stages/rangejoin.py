"""Range (time-band) join: pairs of events of two types, same key, whose
timestamps lie within a band of each other.

Ray Data has no inequality join; the distributed shape is bucket
replication (the standard interval-join recipe): bucket time into
band-width windows, keep each LEFT event in its own bucket only, replicate
each RIGHT event to its bucket and both neighbors.  Every qualifying pair
then co-locates in exactly ONE group — the left event's bucket — so the
exact band predicate filters inside the group and no pair can duplicate.
Shuffle volume: 1× left + 3× right key rows (ids and timestamps only —
never payloads).

Skew (round 3): the group key is (user, bucket), so a pathological single
user-hour would otherwise bound one group AND one dense |A|×|B| kernel.
Hot groups are detected with a combiner count over the (already
materialized) bucket rows — one light shuffle of one row per (user,
bucket) per batch — and only keys whose row count exceeds
``hot_rows_per_group`` are salted: a hot LEFT event moves to sub-group
``event_id % n_salts`` and hot RIGHT events replicate to all ``n_salts``
sub-groups.  A pair still lands in exactly one group — (bucket, salt) are
functions of the LEFT event — so the join stays exact.  The hot-key set
reaches the driver as composite-hash int64s (≤ total_rows /
``hot_rows_per_group`` keys by construction); a hash collision can only
salt a COLD key, which replicates a few extra right rows and changes no
output.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..arrowutil import one_chunk

DEFAULT_HOT_ROWS = 65536
_MIX = np.int64(-7046029254386353131)       # 0x9E3779B97F4A7C15 as int64


def _mix_keys(uid: np.ndarray, bucket: np.ndarray) -> np.ndarray:
    """Composite (user, bucket) → one int64 (wrapping multiply-add mix)."""
    with np.errstate(over="ignore"):
        return uid.astype(np.int64) * _MIX + bucket.astype(np.int64)


def time_band_join(events, type_a: str, type_b: str, band_s: int = 1800,
                   n_salts: int = 8,
                   hot_rows_per_group: int = DEFAULT_HOT_ROWS):
    """(a_event_id, b_event_id) for every pair of a ``type_a`` and a
    ``type_b`` event of the same user with |ts_a − ts_b| ≤ ``band_s``.

    ``n_salts <= 1`` disables skew handling (single-pass, no hot-key
    detection); otherwise (user, bucket) groups larger than
    ``hot_rows_per_group`` rows are split across ``n_salts`` sub-groups.
    """
    from ray.data.aggregate import Sum

    band_us = band_s * 1_000_000
    bucket_us = band_us                     # bucket width = band width

    def bucket_rows(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        keep = pc.or_(pc.equal(et, type_a), pc.equal(et, type_b))
        sub = t.filter(keep)
        n = sub.num_rows
        if n == 0:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "bucket": pa.array([], type=pa.int64()),
                             "side": pa.array([], type=pa.int64()),
                             "event_id": pa.array([], type=pa.int64()),
                             "ts_us": pa.array([], type=pa.int64())})
        ts = np.asarray(pc.cast(pc.cast(sub["ts"], pa.timestamp("us")),
                                pa.int64()))
        side = np.asarray(pc.equal(sub["event_type"], type_b)).astype(np.int64)
        uid = np.asarray(one_chunk(sub["user_id"])).astype(np.int64)
        eid = np.asarray(one_chunk(sub["event_id"])).astype(np.int64)
        base = ts // bucket_us
        a_mask = side == 0
        b_mask = ~a_mask
        nb = int(b_mask.sum())
        # left events: own bucket; right events: bucket and both neighbors
        # (vectorized: 3-way repeat + tiled offsets)
        offs = np.tile(np.array([-1, 0, 1], np.int64), nb)
        r_uid = np.concatenate([uid[a_mask], np.repeat(uid[b_mask], 3)])
        r_eid = np.concatenate([eid[a_mask], np.repeat(eid[b_mask], 3)])
        r_ts = np.concatenate([ts[a_mask], np.repeat(ts[b_mask], 3)])
        r_side = np.concatenate([np.zeros(int(a_mask.sum()), np.int64),
                                 np.ones(3 * nb, np.int64)])
        r_bucket = np.concatenate([base[a_mask],
                                   np.repeat(base[b_mask], 3) + offs])
        return pa.table({"user_id": pa.array(r_uid),
                         "bucket": pa.array(r_bucket),
                         "side": pa.array(r_side),
                         "event_id": pa.array(r_eid),
                         "ts_us": pa.array(r_ts)})

    def join_group(g: pa.Table) -> pa.Table:
        side = np.asarray(one_chunk(g["side"]))
        eid = np.asarray(one_chunk(g["event_id"]))
        ts = np.asarray(one_chunk(g["ts_us"]))
        a = side == 0
        b = ~a
        if not a.any() or not b.any():
            return pa.table({"a_event_id": pa.array([], type=pa.int64()),
                             "b_event_id": pa.array([], type=pa.int64())})
        dt = np.abs(ts[a][:, None] - ts[b][None, :])
        ii, jj = np.nonzero(dt <= band_us)
        return pa.table({
            "a_event_id": pa.array(eid[a][ii], type=pa.int64()),
            "b_event_id": pa.array(eid[b][jj], type=pa.int64()),
        })

    bucketed = events.map_batches(bucket_rows, batch_format="pyarrow")
    if n_salts <= 1:
        return (bucketed.groupby(["user_id", "bucket"])
                .map_groups(join_group, batch_format="pyarrow"))

    # --- skew path: detect hot (user, bucket) groups, salt only those ---
    bucketed = bucketed.materialize()       # id/ts rows only, reused twice

    def count_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "bucket"]).aggregate([("side", "count")])
        return g.select(["user_id", "bucket", "side_count"]) \
            .rename_columns(["user_id", "bucket", "n"])

    hot_tbl = (bucketed.map_batches(count_partial, batch_format="pyarrow")
               .groupby(["user_id", "bucket"])
               .aggregate(Sum("n", alias_name="n"))
               .map_batches(
                   lambda t: t.filter(
                       pc.greater(t["n"], hot_rows_per_group)),
                   batch_format="pyarrow")
               .take_all())
    hot_mix = _mix_keys(
        np.asarray([r["user_id"] for r in hot_tbl], dtype=np.int64),
        np.asarray([r["bucket"] for r in hot_tbl], dtype=np.int64))
    hot_mix.sort()

    def add_salt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0 or len(hot_mix) == 0:
            return t.append_column(
                "salt", pa.array(np.zeros(n, np.int64)))
        uid = np.asarray(one_chunk(t["user_id"]))
        bucket = np.asarray(one_chunk(t["bucket"]))
        side = np.asarray(one_chunk(t["side"]))
        eid = np.asarray(one_chunk(t["event_id"]))
        ts = np.asarray(one_chunk(t["ts_us"]))
        mix = _mix_keys(uid, bucket)
        pos = np.searchsorted(hot_mix, mix)
        is_hot = (pos < len(hot_mix)) & \
            (hot_mix[np.minimum(pos, len(hot_mix) - 1)] == mix)
        salt = np.where(is_hot & (side == 0), eid % n_salts, 0)
        hot_b = is_hot & (side == 1)
        k = int(hot_b.sum())
        if k == 0:
            return t.append_column("salt", pa.array(salt))
        # hot right rows replicate to every salt; others keep one row
        keep = ~hot_b
        rep_salt = np.tile(np.arange(n_salts, dtype=np.int64), k)
        return pa.table({
            "user_id": pa.array(np.concatenate(
                [uid[keep], np.repeat(uid[hot_b], n_salts)])),
            "bucket": pa.array(np.concatenate(
                [bucket[keep], np.repeat(bucket[hot_b], n_salts)])),
            "side": pa.array(np.concatenate(
                [side[keep], np.repeat(side[hot_b], n_salts)])),
            "event_id": pa.array(np.concatenate(
                [eid[keep], np.repeat(eid[hot_b], n_salts)])),
            "ts_us": pa.array(np.concatenate(
                [ts[keep], np.repeat(ts[hot_b], n_salts)])),
            "salt": pa.array(np.concatenate([salt[keep], rep_salt])),
        })

    return (bucketed.map_batches(add_salt, batch_format="pyarrow")
            .groupby(["user_id", "bucket", "salt"])
            .map_groups(join_group, batch_format="pyarrow"))
