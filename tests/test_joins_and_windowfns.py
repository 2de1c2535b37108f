"""Unit tests for the relational join stages (stages/joins.py) and the
window-function analogs (stages/windowfns.py) beyond the oracle-parity
sweep: multi-block invariance, unmatched keys, join-type variants, skewed
groups, and cross-block rolling windows."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(table, n_blocks):
    import ray.data

    return ray.data.from_arrow(table).repartition(n_blocks)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks", [1, 4])
def test_broadcast_join_inner_and_unmatched(n_blocks):
    from pdf2doi_ray.stages.joins import broadcast_hash_join

    big = pa.table({"k": pa.array([1, 2, 2, 3, 9], type=pa.int64()),
                    "a": pa.array(list("vwxyz"))})
    small = pa.table({"rk": pa.array([1, 2, 3, 4], type=pa.int64()),
                      "b": pa.array([10, 20, 30, 40], type=pa.int64())})
    out = broadcast_hash_join(_ds(big, n_blocks), _ds(small, 1),
                              on=["k"], right_on=["rk"]).to_pandas()
    want = big.to_pandas().merge(
        small.to_pandas(), left_on="k", right_on="rk").drop(columns=["rk"])
    cols = sorted(out.columns)
    assert sorted(want.columns) == cols
    got = out[cols].sort_values(cols).reset_index(drop=True)
    exp = want[cols].sort_values(cols).reset_index(drop=True)
    assert got.equals(exp)
    assert 9 not in set(got["k"])          # unmatched big-side key dropped


@pytest.mark.usefixtures("ray_session")
def test_broadcast_join_semi_anti():
    from pdf2doi_ray.stages.joins import broadcast_hash_join

    big = pa.table({"k": pa.array([1, 2, 3, 4], type=pa.int64())})
    small = pa.table({"k": pa.array([2, 4], type=pa.int64()),
                      "b": pa.array([1, 1], type=pa.int64())})
    semi = broadcast_hash_join(_ds(big, 2), _ds(small, 1), on=["k"],
                               join_type="left semi").to_pandas()
    anti = broadcast_hash_join(_ds(big, 2), _ds(small, 1), on=["k"],
                               join_type="left anti").to_pandas()
    assert sorted(semi["k"]) == [2, 4]
    assert sorted(anti["k"]) == [1, 3]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("num_partitions", [2, 8])
def test_shuffle_join_matches_merge(num_partitions):
    from pdf2doi_ray.stages.joins import shuffle_hash_join

    rng = np.random.RandomState(5)
    lk = rng.randint(0, 40, size=300).astype(np.int64)
    left = pa.table({"k": lk, "la": np.arange(300, dtype=np.int64)})
    rk = np.arange(0, 50, dtype=np.int64)
    right = pa.table({"rk": rk, "rb": (rk * 7).astype(np.int64)})
    out = shuffle_hash_join(_ds(left, 4), _ds(right, 2), on="k",
                            right_on="rk",
                            num_partitions=num_partitions).to_pandas()
    want = left.to_pandas().merge(right.to_pandas(),
                                  left_on="k", right_on="rk")
    cols = sorted(set(out.columns) & set(want.columns))
    got = out[cols].sort_values(cols).reset_index(drop=True)
    exp = want[cols].sort_values(cols).reset_index(drop=True)
    assert len(out) == len(want) and got.equals(exp)


def _brute_topk(df, group, order, tie, k):
    df = df.sort_values([group, order, tie], ascending=[True, False, True])
    df = df.groupby(group, sort=False).head(k).copy()
    df["rank"] = df.groupby(group, sort=False).cumcount() + 1
    return df[[group, "rank", order, tie]]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks,k", [(1, 2), (4, 2), (4, 5)])
def test_grouped_top_k_blocks_skew_ties(n_blocks, k):
    from pdf2doi_ray.stages.windowfns import grouped_top_k

    rng = np.random.RandomState(11)
    # skew: group "hot" holds half the rows; scores collide to test ties
    groups = np.where(rng.rand(200) < 0.5, "hot",
                      rng.choice(list("abcdefg"), size=200))
    t = pa.table({"g": pa.array(groups),
                  "score": pa.array(rng.randint(0, 10, 200),
                                    type=pa.int64()),
                  "id": pa.array(np.arange(200), type=pa.int64())})
    out = grouped_top_k(_ds(t, n_blocks), "g", "score", "id",
                        k=k).to_pandas()
    want = _brute_topk(t.to_pandas(), "g", "score", "id", k)
    cols = sorted(out.columns)
    got = out[cols].sort_values(cols).reset_index(drop=True)
    exp = want[cols].sort_values(cols).reset_index(drop=True)
    assert got.equals(exp.astype(got.dtypes.to_dict()))


def _brute_rolling(df, w):
    df = df.copy()
    df["vm"] = np.floor(df["value"].to_numpy() * 1000.0).astype(np.int64)
    df = df.sort_values(["user_id", "ts", "event_id"])
    df["roll_sum"] = (df.groupby("user_id", sort=False)["vm"]
                      .rolling(w, min_periods=1).sum()
                      .reset_index(level=0, drop=True)).astype(np.int64)
    return df[["event_id", "user_id", "roll_sum"]]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks,w,shards", [(1, 3, 1), (5, 3, 4),
                                               (5, 1, 4), (7, 6, 32)])
def test_rolling_user_sum_cross_block(n_blocks, w, shards):
    import ray.data

    from pdf2doi_ray.stages.windowfns import rolling_user_sum

    rng = np.random.RandomState(3)
    n = 240
    t = pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "user_id": pa.array(np.sort(rng.randint(0, 6, n)), type=pa.int64()),
        "ts": pa.array(
            pd.to_datetime(rng.randint(0, 10**6, n), unit="s")),
        "value": pa.array(rng.randn(n) * 50),
    })
    out = rolling_user_sum(ray.data.from_arrow(t).repartition(n_blocks),
                           w=w, stitch_shards=shards).to_pandas()
    want = _brute_rolling(t.to_pandas(), w)
    cols = sorted(out.columns)
    got = out[cols].sort_values(cols).reset_index(drop=True)
    exp = want[cols].sort_values(cols).reset_index(drop=True)
    assert len(got) == n and got.equals(exp)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks", [1, 5])
def test_running_user_sum_cross_block(n_blocks):
    import ray.data

    from pdf2doi_ray.stages.windowfns import running_user_sum

    rng = np.random.RandomState(9)
    n = 120
    t = pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "user_id": pa.array(np.sort(rng.randint(0, 4, n)), type=pa.int64()),
        "ts": pa.array(pd.to_datetime(rng.randint(0, 10**6, n), unit="s")),
        "value": pa.array(rng.randn(n) * 50),
    })
    out = running_user_sum(
        ray.data.from_arrow(t).repartition(n_blocks)).to_pandas()
    df = t.to_pandas()
    df["vm"] = np.floor(df["value"].to_numpy() * 1000.0).astype(np.int64)
    df = df.sort_values(["user_id", "ts", "event_id"])
    df["roll_sum"] = df.groupby("user_id", sort=False)["vm"].cumsum()
    want = df[["event_id", "user_id", "roll_sum"]]
    cols = sorted(out.columns)
    got = out[cols].sort_values(cols).reset_index(drop=True)
    exp = want[cols].sort_values(cols).reset_index(drop=True)
    assert len(got) == n and got.equals(exp)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks", [1, 6])
def test_exact_ndv_by_group_blocks(n_blocks):
    from pdf2doi_ray.stages.sketch import exact_ndv_by_group

    rng = np.random.RandomState(2)
    g = rng.choice(list("abc"), size=500)
    v = rng.randint(0, 40, size=500).astype(np.int64)
    t = pa.table({"g": pa.array(g), "v": pa.array(v)})
    out = exact_ndv_by_group(_ds(t, n_blocks), "g", "v") \
        .to_pandas().sort_values("g").reset_index(drop=True)
    want = (pd.DataFrame({"g": g, "v": v}).groupby("g")["v"].nunique()
            .rename("ndv").reset_index())
    assert out.equals(want.astype(out.dtypes.to_dict()))


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks", [1, 4])
def test_token_quantiles_by_group_blocks(n_blocks):
    from pdf2doi_ray.stages.textstats import token_count_quantiles_by_group

    rng = np.random.RandomState(6)
    langs = rng.choice(["en", "fr"], size=200)
    texts = [" ".join(["w"] * rng.randint(1, 30)) for _ in range(200)]
    t = pa.table({"doc_id": pa.array(np.arange(200), type=pa.int64()),
                  "text": pa.array(texts), "lang": pa.array(langs)})
    out = token_count_quantiles_by_group(_ds(t, n_blocks), "lang")
    # brute: value at 1-based rank ceil(q/1000 * n) of the ascending sort
    for lang in ("en", "fr"):
        counts = np.sort([len(tx.split(" ")) for tx, lg
                          in zip(texts, langs) if lg == lang])
        for q in (250, 500, 750, 900):
            rank = -(-q * len(counts) // 1000)
            exp = counts[rank - 1]
            got = out[(out["lang"] == lang)
                      & (out["q_permille"] == q)]["value"].iloc[0]
            assert got == exp, (lang, q, got, exp)


@pytest.mark.usefixtures("ray_session")
def test_shuffle_join_left_outer_nulls():
    from pdf2doi_ray.stages.joins import shuffle_hash_join

    left = pa.table({"k": pa.array([1, 2, 3, 9], type=pa.int64()),
                     "a": pa.array(list("wxyz"))})
    right = pa.table({"rk": pa.array([2, 3, 3], type=pa.int64()),
                      "b": pa.array([20, 30, 31], type=pa.int64())})
    out = shuffle_hash_join(_ds(left, 2), _ds(right, 2), on="k",
                            right_on="rk", join_type="left_outer",
                            num_partitions=2).to_pandas()
    want = left.to_pandas().merge(right.to_pandas(), how="left",
                                  left_on="k", right_on="rk")
    cols = sorted(set(out.columns) & set(want.columns))
    got = out[cols].sort_values(cols).reset_index(drop=True)
    exp = want[cols].sort_values(cols).reset_index(drop=True)
    assert len(got) == 5                       # 1 + 1 + 2 + unmatched(9)
    assert got["b"].isna().sum() == 2          # keys 1 and 9 unmatched
    assert got.fillna(-1).equals(exp.fillna(-1).astype(got.dtypes.to_dict()))


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [0, 1])
def test_join_differential_fuzz(seed):
    """Random keys with unmatched rows on BOTH sides, broadcast vs native
    shuffle vs pandas merge — all three must agree exactly."""
    from pdf2doi_ray.stages.joins import broadcast_hash_join, shuffle_hash_join

    rng = np.random.RandomState(seed)
    lk = rng.randint(0, 30, size=rng.randint(50, 150)).astype(np.int64)
    rk = rng.randint(15, 45, size=rng.randint(20, 60)).astype(np.int64)
    left = pa.table({"k": lk, "la": np.arange(len(lk), dtype=np.int64)})
    right = pa.table({"k": rk, "rb": np.arange(len(rk), dtype=np.int64)})
    want = left.to_pandas().merge(right.to_pandas(), on="k")

    def norm(df):
        cols = sorted(df.columns)
        return df[cols].sort_values(cols).reset_index(drop=True)

    b = broadcast_hash_join(_ds(left, 3), _ds(right, 2), on=["k"]).to_pandas()
    s = shuffle_hash_join(_ds(left, 3), _ds(right, 2), on="k",
                          num_partitions=4).to_pandas()
    assert norm(b).equals(norm(want))
    assert norm(s).equals(norm(want))


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks", [1, 5])
def test_pivot_counts_blocks_and_unlisted(n_blocks):
    from pdf2doi_ray.stages.pivot import pivot_counts

    rng = np.random.RandomState(4)
    keys = rng.randint(0, 8, size=300).astype(np.int64)
    cats = rng.choice(["a", "b", "zz_unlisted"], size=300)
    t = pa.table({"u": keys, "c": pa.array(cats)})
    out = pivot_counts(_ds(t, n_blocks), "u", "c", ["a", "b"]) \
        .to_pandas().sort_values("u").reset_index(drop=True)
    df = pd.DataFrame({"u": keys, "c": cats})
    want = pd.DataFrame({
        "u": np.arange(8, dtype=np.int64),
        "n_a": [((df.u == u) & (df.c == "a")).sum() for u in range(8)],
        "n_b": [((df.u == u) & (df.c == "b")).sum() for u in range(8)],
    })
    assert out.equals(want.astype(out.dtypes.to_dict()))


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks", [1, 3, 7])
def test_lag_user_value_blocks(n_blocks):
    import pandas as pd

    from pdf2doi_ray.stages.windowfns import lag_user_value

    rng = np.random.default_rng(19)
    n = 120
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(
            pd.to_datetime(rng.integers(0, 10**6, size=n), unit="s")
            .astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(0, 9, size=n).astype(np.int64)),
        "value": pa.array(rng.uniform(0, 5, size=n)),
    })
    out = lag_user_value(_ds(t, n_blocks)).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)

    df = t.to_pandas()
    df["vm"] = np.floor(df["value"] * 1000.0).astype(np.int64)
    df = df.sort_values(["user_id", "ts", "event_id"])
    df["want"] = df.groupby("user_id")["vm"].shift(1)
    want = df.sort_values("event_id").reset_index(drop=True)
    assert len(out) == n
    a = out["lag_vm"].fillna(-1).to_numpy()
    b = want["want"].fillna(-1).to_numpy()
    assert (a == b).all()


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks", [1, 5])
def test_lead_user_value_blocks(n_blocks):
    import pandas as pd

    from pdf2doi_ray.stages.windowfns import lead_user_value

    rng = np.random.default_rng(43)
    n = 90
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(
            pd.to_datetime(rng.integers(0, 10**6, size=n), unit="s")
            .astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(0, 7, size=n).astype(np.int64)),
        "value": pa.array(rng.uniform(0, 5, size=n)),
    })
    out = lead_user_value(_ds(t, n_blocks)).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)

    df = t.to_pandas()
    df["vm"] = np.floor(df["value"] * 1000.0).astype(np.int64)
    df = df.sort_values(["user_id", "ts", "event_id"])
    df["want"] = df.groupby("user_id")["vm"].shift(-1)
    want = df.sort_values("event_id").reset_index(drop=True)
    a = out["lead_vm"].fillna(-1).to_numpy()
    b = want["want"].fillna(-1).to_numpy()
    assert len(out) == n and (a == b).all()


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks", [1, 5])
def test_rank_window_functions_blocks(n_blocks):
    from pdf2doi_ray.stages.windowfns import (dense_rank_user_value,
                                              rank_user_value,
                                              row_number_user)

    rng = np.random.default_rng(23)
    n = 150
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(
            pd.to_datetime(rng.integers(0, 10**6, size=n), unit="s")
            .astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(0, 7, size=n).astype(np.int64)),
        # values land on a coarse grid so vm % 100 produces real tie runs
        # (vm in {0,25,..,175} -> k in {0,25,50,75}, ~5 ties per key/user)
        "value": pa.array(rng.integers(0, 8, size=n) * 0.025),
    })
    df = t.to_pandas()
    df["k"] = (np.floor(df["value"] * 1000.0).astype(np.int64)) % 100
    want_rank = df.groupby("user_id")["k"].rank(method="min").astype(int)
    want_dense = df.groupby("user_id")["k"].rank(method="dense").astype(int)
    df2 = df.sort_values(["user_id", "ts", "event_id"])
    df2["rn"] = df2.groupby("user_id").cumcount() + 1
    want_rn = df2.sort_values("event_id")["rn"].to_numpy()

    got_rank = rank_user_value(_ds(t, n_blocks)).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    got_dense = dense_rank_user_value(_ds(t, n_blocks)).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    got_rn = row_number_user(_ds(t, n_blocks)).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)

    assert (got_rank["rnk"].to_numpy() == want_rank.to_numpy()).all()
    assert (got_dense["drnk"].to_numpy() == want_dense.to_numpy()).all()
    assert (got_rn["rn"].to_numpy() == want_rn).all()
    # with ties, rank must gap past tie runs while dense rank stays compact
    assert got_rank["rnk"].max() > got_dense["drnk"].max()


@pytest.mark.usefixtures("ray_session")
def test_rank_rejects_negative_values_under_mod():
    from pdf2doi_ray.stages.windowfns import rank_user_value

    t = pa.table({
        "event_id": pa.array([1, 2], type=pa.int64()),
        "ts": pa.array(pd.to_datetime([1, 2], unit="s")
                       .astype("datetime64[us]")),
        "user_id": pa.array([1, 1], type=pa.int64()),
        "value": pa.array([-1.5, 2.0]),
    })
    with pytest.raises(Exception, match="non-negative"):
        rank_user_value(_ds(t, 1)).to_pandas()


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks", [1, 4])
def test_ntile_first_last_value_blocks(n_blocks):
    import pandas as pd

    from pdf2doi_ray.stages.windowfns import (first_value_user,
                                              last_value_user, ntile_user)

    rng = np.random.default_rng(23)
    n = 130
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(
            pd.to_datetime(rng.integers(0, 10**6, size=n), unit="s")
            .astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(0, 9, size=n).astype(np.int64)),
        "value": pa.array(rng.uniform(0, 5, size=n)),
    })
    df = t.to_pandas()
    df["vm"] = np.floor(df["value"] * 1000.0).astype(np.int64)
    df = df.sort_values(["user_id", "ts", "event_id"])
    g = df.groupby("user_id")
    df["first_want"] = g["vm"].transform("first")
    df["last_want"] = g["vm"].transform("last")
    # SQL NTILE: first len%n tiles get one extra row
    pos = g.cumcount().to_numpy()
    L = g["vm"].transform("size").to_numpy()
    q, r = L // 4, L % 4
    big = r * (q + 1)
    df["tile_want"] = np.where(
        pos < big, pos // np.maximum(q + 1, 1),
        r + np.where(q > 0, (pos - big) // np.maximum(q, 1), 0)) + 1
    want = df.sort_values("event_id").reset_index(drop=True)

    for fn, col, wcol in ((ntile_user, "tile", "tile_want"),
                          (first_value_user, "first_vm", "first_want"),
                          (last_value_user, "last_vm", "last_want")):
        out = fn(_ds(t, n_blocks)).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        assert len(out) == n
        assert (out[col].to_numpy() == want[wcol].to_numpy()).all(), col


@pytest.mark.usefixtures("ray_session")
def test_ntile_uneven_distribution_exact():
    """7 rows into NTILE(4) must split 2,2,2,1 (SQL rule), not 2,2,1,2."""
    import pandas as pd

    from pdf2doi_ray.stages.windowfns import ntile_user

    n = 7
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(pd.to_datetime(np.arange(n), unit="s")
                       .astype("datetime64[us]")),
        "user_id": pa.array(np.zeros(n, dtype=np.int64)),
        "value": pa.array(np.linspace(0, 1, n)),
    })
    out = ntile_user(_ds(t, 2), n=4).to_pandas().sort_values("event_id")
    assert out["tile"].tolist() == [1, 1, 2, 2, 3, 3, 4]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks", [1, 4])
def test_percent_rank_cume_dist_blocks(n_blocks):
    import pandas as pd

    from pdf2doi_ray.stages.windowfns import (cume_dist_user_value,
                                              percent_rank_user_value)

    rng = np.random.default_rng(29)
    n = 140
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(
            pd.to_datetime(rng.integers(0, 10**6, size=n), unit="s")
            .astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(0, 9, size=n).astype(np.int64)),
        "value": pa.array(rng.uniform(0, 5, size=n)),
    })
    df = t.to_pandas()
    df["k"] = (np.floor(df["value"] * 1000.0).astype(np.int64)) % 100
    g = df.groupby("user_id")["k"]
    rank = g.rank(method="min").astype(np.int64)
    cnt = g.transform("size").to_numpy()
    df["pr_want"] = (rank - 1) * 1000 // np.maximum(cnt - 1, 1)
    cume = g.rank(method="max").astype(np.int64)       # = |rows <= mine|
    df["cd_want"] = cume * 1000 // cnt
    want = df.sort_values("event_id").reset_index(drop=True)

    for fn, col, wcol in (
            (percent_rank_user_value, "pr_permille", "pr_want"),
            (cume_dist_user_value, "cume_permille", "cd_want")):
        out = fn(_ds(t, n_blocks)).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        assert len(out) == n
        assert (out[col].to_numpy() == want[wcol].to_numpy()).all(), col


@pytest.mark.usefixtures("ray_session")
def test_percent_rank_single_row_partition_is_zero():
    import pandas as pd

    from pdf2doi_ray.stages.windowfns import percent_rank_user_value

    t = pa.table({
        "event_id": pa.array([1], type=pa.int64()),
        "ts": pa.array(pd.to_datetime([0], unit="s")
                       .astype("datetime64[us]")),
        "user_id": pa.array([7], type=pa.int64()),
        "value": pa.array([1.5]),
    })
    out = percent_rank_user_value(_ds(t, 1)).to_pandas()
    assert out["pr_permille"].tolist() == [0]
