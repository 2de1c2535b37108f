"""As-of join — each left event matched to the LATEST right event of the
same key at or before its timestamp.

Ray Data has no join primitive, let alone an inequality one; this is the
standard event-enrichment operator (DuckDB ``ASOF JOIN``, kdb ``aj``,
pandas ``merge_asof``) expressed with the engine's sorted-block +
boundary-carry pattern:

1. both sides union with a side marker and sort on ``(user_id, ts, side)``
   — side 0 (right) before side 1 (left) at equal timestamps makes the
   inequality inclusive;
2. each sorted block resolves its own left rows with one vectorized
   running-maximum pass (index of the last right row so far, reset at user
   boundaries — no per-row Python);
3. left rows whose match lies in an earlier block (no in-block right before
   them) are emitted unresolved, together with one per-(block, user)
   last-right summary row; both are tagged with the block's first-row key
   so the single stitch block can order them globally and resolve the
   carries.  Only unresolved rows and summaries travel — the streams
   themselves never leave their blocks a second time.

Correctness leans on sorted-block contiguity (a user's rows occupy
consecutive blocks; any right row in an earlier block is ≤ every later left
row of that user in sort order).  Carry volume: typical inputs send a
handful of rows per block to the stitch, but carries ACCUMULATE across all
blocks — a right-sparse input (many keys with no right events at all)
re-emits every such left row.  The stitch is therefore SHARDED by
``user_id % P`` (round 3; replaces the round-2 ``repartition(1)`` funnel):
every carry row of a user lands in the same shard, so per-shard resolution
is exact, and the worst case bounds one shard at 1/P of the carries instead
of one task at all of them.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..arrowutil import one_chunk
from .stitch import DEFAULT_STITCH_SHARDS, sharded_stitch


def _np(col):
    return np.asarray(one_chunk(col))


def _out_table(eid, uid, mts):
    return pa.table({"event_id": pa.array(eid, type=pa.int64()),
                     "user_id": pa.array(uid, type=pa.int64()),
                     "matched_ts_us": pa.array(mts, type=pa.int64())})


def asof_join_latest(events, left_type: str, right_type: str,
                     stitch_shards: int = DEFAULT_STITCH_SHARDS):
    """events → (event_id, user_id, matched_ts_us) for every ``left_type``
    event; ``matched_ts_us`` is the microsecond timestamp of the latest
    ``right_type`` event of the same user with ts ≤ the left event's ts
    (null when none exists)."""

    def pick(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        keep = pc.or_(pc.equal(et, left_type), pc.equal(et, right_type))
        sub = t.filter(keep)
        side = pc.if_else(pc.equal(sub["event_type"], left_type),
                          pa.scalar(1, pa.int64()), pa.scalar(0, pa.int64()))
        ts_us = pc.cast(pc.cast(sub["ts"], pa.timestamp("us")), pa.int64())
        return pa.table({"user_id": sub["user_id"], "ts_us": ts_us,
                         "side": side, "event_id": sub["event_id"]})

    srt = events.map_batches(pick, batch_format="pyarrow") \
        .sort(["user_id", "ts_us", "side"])

    def block_join(t: pa.Table) -> pa.Table:
        n = t.num_rows
        empty = pa.table({
            "event_id": pa.array([], type=pa.int64()),
            "user_id": pa.array([], type=pa.int64()),
            "matched_ts_us": pa.array([], type=pa.int64()),
            "kind": pa.array([], type=pa.string()),
            "k_user": pa.array([], type=pa.int64()),
            "k_ts": pa.array([], type=pa.int64()),
            "k_side": pa.array([], type=pa.int64())})
        if n == 0:
            return empty
        us = _np(t["user_id"]).astype(np.int64)
        ts = _np(t["ts_us"]).astype(np.int64)
        side = _np(t["side"]).astype(np.int64)
        eid = _np(t["event_id"]).astype(np.int64)
        # index of the last right row at or before each position
        r = np.where(side == 0, np.arange(n), -1)
        last_r = np.maximum.accumulate(r)
        # first row index of each row's user (reset boundary)
        change = np.nonzero(us[1:] != us[:-1])[0] + 1
        starts = np.concatenate([[0], change]).astype(np.int64)
        lens = np.diff(np.concatenate([starts, [n]]))
        ustart = np.repeat(starts, lens)
        lefts = side == 1
        have = lefts & (last_r >= ustart)
        res_i = np.nonzero(have)[0]
        un_i = np.nonzero(lefts & ~have)[0]
        # per-(block, user) LAST right-row summary (for the carry)
        sum_u, sum_ts = [], []
        for s, ln in zip(starts, lens):
            e = s + ln
            lr = last_r[e - 1]
            if lr >= s:               # this user has a right row in-block
                sum_u.append(int(us[s]))
                sum_ts.append(int(ts[lr]))
        k_user, k_ts, k_side = int(us[0]), int(ts[0]), int(side[0])
        n_r, n_u, n_s = len(res_i), len(un_i), len(sum_u)
        # vectorized matched column: resolved values gathered in C, the
        # unresolved slice nulled via a mask (no per-row Python on the hot
        # resolved path)
        matched = np.concatenate(
            [ts[last_r[res_i]], np.zeros(n_u, np.int64),
             np.asarray(sum_ts, np.int64)])
        matched_mask = np.concatenate(
            [np.zeros(n_r, bool), np.ones(n_u, bool), np.zeros(n_s, bool)])
        return pa.table({
            "event_id": pa.array(np.concatenate(
                [eid[res_i], eid[un_i],
                 np.full(n_s, -1, np.int64)]), type=pa.int64()),
            "user_id": pa.array(np.concatenate(
                [us[res_i], us[un_i],
                 np.asarray(sum_u, np.int64)]), type=pa.int64()),
            "matched_ts_us": pa.array(matched, type=pa.int64(),
                                      mask=matched_mask),
            "kind": pa.array(["res"] * n_r + ["un"] * n_u + ["sum"] * n_s),
            "k_user": pa.array([k_user] * (n_r + n_u + n_s), type=pa.int64()),
            "k_ts": pa.array([k_ts] * (n_r + n_u + n_s), type=pa.int64()),
            "k_side": pa.array([k_side] * (n_r + n_u + n_s), type=pa.int64()),
        })

    mixed = srt.map_batches(block_join, batch_format="pyarrow",
                            batch_size=None).materialize()

    resolved = mixed.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "res"))
        .select(["event_id", "user_id", "matched_ts_us"]),
        batch_format="pyarrow")

    def stitch(t: pa.Table) -> pa.Table:
        kinds = t["kind"].to_pylist()
        users = t["user_id"].to_pylist()
        mts = t["matched_ts_us"].to_pylist()
        eids = t["event_id"].to_pylist()
        keys = list(zip(t["k_user"].to_pylist(), t["k_ts"].to_pylist(),
                        t["k_side"].to_pylist()))
        # per user: block-key-ordered summaries; resolve each unresolved row
        # against the latest summary from a strictly earlier block
        sums: dict[int, list[tuple[tuple, int]]] = {}
        for kd, u, m, k in zip(kinds, users, mts, keys):
            if kd == "sum":
                sums.setdefault(int(u), []).append((k, int(m)))
        for v in sums.values():
            v.sort()
        out_e, out_u, out_m = [], [], []
        for kd, u, e, k in zip(kinds, users, eids, keys):
            if kd != "un":
                continue
            best = None
            for bk, bts in sums.get(int(u), ()):
                if bk < k:
                    best = bts          # keys ascend → last wins
                else:
                    break
            out_e.append(int(e))
            out_u.append(int(u))
            out_m.append(best)
        return _out_table(out_e, out_u, out_m)

    # all carries of a user (its "un" rows and "sum" summaries) share its
    # user_id, so the user-sharded stitch resolves each user exactly
    carries = mixed.map_batches(
        lambda t: t.filter(pc.invert(pc.equal(t["kind"], "res"))),
        batch_format="pyarrow")
    carried = sharded_stitch(carries, lambda t: _np(t["user_id"]),
                             stitch, num_shards=stitch_shards)

    return resolved.union(carried)
