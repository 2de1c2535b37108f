"""As-of join: brute-force parity across block layouts, inclusive-equality
semantics, cross-block carry resolution."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _events_table(rows):
    return pa.table({
        "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows],
                                dtype="datetime64[us]")),
        "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
        "event_type": pa.array([r[3] for r in rows], type=pa.string()),
    })


def _brute(rows, left="purchase", right="click"):
    out = {}
    for eid, ts, uid, et in rows:
        if et != left:
            continue
        cands = [t2 for _, t2, u2, e2 in rows
                 if e2 == right and u2 == uid and t2 <= ts]
        out[eid] = max(cands) if cands else None
    return out


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks,stitch_shards",
                         [(1, 1), (3, 1), (3, 5), (8, 32)])
def test_asof_matches_brute_force(n_blocks, stitch_shards):
    import ray.data

    from pdf2doi_ray.stages.asof import asof_join_latest

    rng = np.random.RandomState(21)
    rows = []
    for i in range(300):
        rows.append((i, int(rng.randint(0, 10_000_000)),
                     int(rng.randint(0, 9)),
                     rng.choice(["purchase", "click", "view"])))
    ds = ray.data.from_arrow(_events_table(rows)).repartition(n_blocks)
    got = asof_join_latest(ds, "purchase", "click",
                           stitch_shards=stitch_shards).to_pandas()
    want = _brute(rows)
    got_map = {int(e): (None if pd.isna(m) else int(m))
               for e, m in zip(got["event_id"], got["matched_ts_us"])}
    assert got_map == want


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("stitch_shards", [1, 7])
def test_asof_right_sparse_many_unmatched_users(stitch_shards):
    # the round-2 verdict's named worst case: many users with ZERO right
    # events — every left row funnels to the stitch; the sharded stitch
    # must spread them by user and still emit null matches for all
    import ray.data

    from pdf2doi_ray.stages.asof import asof_join_latest

    rows = []
    for u in range(60):                       # 60 users, no clicks at all
        rows.append((u, 1000 + u, u, "purchase"))
    rows.append((100, 500, 999, "click"))     # one unrelated user with right
    rows.append((101, 600, 999, "purchase"))
    ds = ray.data.from_arrow(_events_table(rows)).repartition(6)
    got = asof_join_latest(ds, "purchase", "click",
                           stitch_shards=stitch_shards).to_pandas()
    m = {int(e): (None if pd.isna(v) else int(v))
         for e, v in zip(got["event_id"], got["matched_ts_us"])}
    want = {u: None for u in range(60)}
    want[101] = 500
    assert m == want


@pytest.mark.usefixtures("ray_session")
def test_asof_inclusive_equal_ts_and_carry():
    import ray.data

    from pdf2doi_ray.stages.asof import asof_join_latest

    rows = [
        (0, 100, 1, "click"),
        (1, 100, 1, "purchase"),      # equal ts → inclusive match at 100
        (2, 50, 2, "click"),
        (3, 200, 2, "purchase"),      # match 50 (possibly cross-block)
        (4, 10, 3, "purchase"),       # no earlier click → null
    ]
    for n_blocks in (1, 5):
        ds = ray.data.from_arrow(_events_table(rows)).repartition(n_blocks)
        got = asof_join_latest(ds, "purchase", "click").to_pandas()
        m = {int(e): (None if pd.isna(v) else int(v))
             for e, v in zip(got["event_id"], got["matched_ts_us"])}
        assert m == {1: 100, 3: 50, 4: None}, n_blocks


def _brute_band(rows, type_a="error", type_b="signup", band=1800_000_000):
    out = set()
    for ea, ta, ua, eta in rows:
        if eta != type_a:
            continue
        for eb, tb, ub, etb in rows:
            if etb == type_b and ub == ua and abs(ta - tb) <= band:
                out.add((ea, eb))
    return out


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks", [1, 4])
def test_time_band_join_matches_brute_force(n_blocks):
    import ray.data

    from pdf2doi_ray.stages.rangejoin import time_band_join

    rng = np.random.RandomState(13)
    rows = []
    for i in range(250):
        rows.append((i, int(rng.randint(0, 20_000_000_000)),
                     int(rng.randint(0, 6)),
                     rng.choice(["error", "signup", "view"])))
    ds = ray.data.from_arrow(_events_table(rows)).repartition(n_blocks)
    got = time_band_join(ds, "error", "signup", band_s=1800).to_pandas()
    pairs = set(zip(got["a_event_id"].astype(int),
                    got["b_event_id"].astype(int)))
    assert pairs == _brute_band(rows)
    assert len(pairs) == len(got)          # no duplicate pair rows


@pytest.mark.usefixtures("ray_session")
def test_time_band_join_hot_user_salted_exact():
    """A single hot user-hour exceeding hot_rows_per_group must be split
    across salt sub-groups without changing the result (round-3 skew path:
    left events move to event_id % n_salts, right events replicate)."""
    import ray.data

    from pdf2doi_ray.stages.rangejoin import time_band_join

    rng = np.random.RandomState(99)
    rows = []
    # hot user 7: 120 errors + 80 signups inside ~one band width
    for i in range(200):
        rows.append((i, int(rng.randint(0, 1800_000_000)), 7,
                     "error" if i < 120 else "signup"))
    # background users: sparse, spread over many buckets
    for i in range(200, 260):
        rows.append((i, int(rng.randint(0, 40_000_000_000)),
                     int(rng.randint(0, 4)),
                     rng.choice(["error", "signup", "view"])))
    ds = ray.data.from_arrow(_events_table(rows)).repartition(4)
    expected = _brute_band(rows)
    got = time_band_join(ds, "error", "signup", band_s=1800,
                         n_salts=4, hot_rows_per_group=32).to_pandas()
    pairs = set(zip(got["a_event_id"].astype(int),
                    got["b_event_id"].astype(int)))
    assert pairs == expected
    assert len(pairs) == len(got)          # salting must not duplicate pairs
    # and the unsalted path agrees
    got1 = time_band_join(ds, "error", "signup", band_s=1800,
                          n_salts=1).to_pandas()
    assert set(zip(got1["a_event_id"].astype(int),
                   got1["b_event_id"].astype(int))) == expected


@pytest.mark.usefixtures("ray_session")
def test_time_band_join_boundary_exact():
    import ray.data

    from pdf2doi_ray.stages.rangejoin import time_band_join

    B = 1800 * 1_000_000
    rows = [
        (0, 0, 1, "error"),
        (1, B, 1, "signup"),          # exactly at the band edge → included
        (2, 2 * B, 1, "signup"),      # band-edge to error 3, 2B to error 0
        (3, 3 * B, 1, "error"),
        (4, B + 1, 2, "signup"),      # other user: never pairs
    ]
    got = time_band_join(ray.data.from_arrow(_events_table(rows)),
                         "error", "signup", band_s=1800).to_pandas()
    pairs = set(zip(got["a_event_id"].astype(int),
                    got["b_event_id"].astype(int)))
    assert pairs == {(0, 1), (3, 2)}


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [1, 7, 42])
def test_joins_differential_vs_duckdb(seed):
    import duckdb
    import ray.data

    from pdf2doi_ray.stages.asof import asof_join_latest
    from pdf2doi_ray.stages.rangejoin import time_band_join

    rng = np.random.RandomState(seed)
    rows = []
    for i in range(400):
        rows.append((i, int(rng.randint(0, 40_000_000_000)),
                     int(rng.randint(0, 7)),
                     rng.choice(["purchase", "click", "error", "signup"])))
    tbl = _events_table(rows)
    con = duckdb.connect()
    con.register("events", tbl)

    ds = ray.data.from_arrow(tbl).repartition(3)
    got = asof_join_latest(ds, "purchase", "click",
                           stitch_shards=4).to_pandas()
    want = con.execute("""
        SELECT a.event_id, CAST(epoch_us(b.ts) AS BIGINT) AS m
        FROM (SELECT * FROM events WHERE event_type='purchase') a
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type='click') b
          ON a.user_id = b.user_id AND a.ts >= b.ts""").df()
    gmap = {int(e): (None if pd.isna(v) else int(v))
            for e, v in zip(got["event_id"], got["matched_ts_us"])}
    wmap = {int(e): (None if pd.isna(v) else int(v))
            for e, v in zip(want["event_id"], want["m"])}
    assert gmap == wmap

    got2 = time_band_join(ds, "error", "signup", band_s=600).to_pandas()
    want2 = con.execute("""
        SELECT a.event_id a_id, b.event_id b_id
        FROM (SELECT * FROM events WHERE event_type='error') a
        JOIN (SELECT * FROM events WHERE event_type='signup') b
          ON a.user_id = b.user_id
         AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 600 * 1000000""").df()
    assert set(zip(got2["a_event_id"].astype(int),
                   got2["b_event_id"].astype(int))) \
        == set(zip(want2["a_id"].astype(int), want2["b_id"].astype(int)))
