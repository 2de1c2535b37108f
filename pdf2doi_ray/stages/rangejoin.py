"""Range (time-band) join: pairs of events of two types, same key, whose
timestamps lie within a band of each other.

Ray Data has no inequality join; the distributed shape is bucket
replication (the standard interval-join recipe): bucket time into
band-width windows, keep each LEFT event in its own bucket only, replicate
each RIGHT event to its bucket and both neighbors.  Every qualifying pair
then co-locates in exactly ONE group — the left event's bucket — so the
exact band predicate filters inside the group and no pair can duplicate.
Shuffle volume: 1× left + 3× right key rows (ids and timestamps only —
never payloads).  Skew note: the group key is (user, bucket), so a
pathological single user-hour bounds one group; salt by sub-bucket if a
key can exceed a block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..arrowutil import one_chunk


def time_band_join(events, type_a: str, type_b: str, band_s: int = 1800):
    """(a_event_id, b_event_id) for every pair of a ``type_a`` and a
    ``type_b`` event of the same user with |ts_a − ts_b| ≤ ``band_s``."""
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

    return (events.map_batches(bucket_rows, batch_format="pyarrow")
            .groupby(["user_id", "bucket"])
            .map_groups(join_group, batch_format="pyarrow"))
