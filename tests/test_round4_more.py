"""Round-4 second wave: exact moment statistics, HLL register rows,
interchange-format round trips, and the md5 minhash spec pin."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


# --- grouped variance / paired moments -------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_grouped_var_stats_matches_bruteforce_multiblock():
    import ray.data

    from pdf2doi_ray.stages.aggs import grouped_var_stats

    rng = np.random.default_rng(7)
    keys = rng.choice(list("abcd"), size=4000)
    vals = rng.uniform(-5, 5, size=4000)
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array(list(keys)), "v": pa.array(vals)})).repartition(7)
    out = grouped_var_stats(ds, "k", "v").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    for _, r in out.iterrows():
        vm = np.floor(vals[keys == r["k"]] * 1000).astype(object)  # py ints
        n = len(vm)
        s, q = int(sum(vm)), int(sum(v * v for v in vm))
        assert r["n"] == n and r["sum_milli"] == s
        assert r["sumsq_millisq"] == q
        assert r["var_microsq"] == (n * q - s * s) // (n * n)


@pytest.mark.usefixtures("ray_session")
def test_grouped_var_stats_python_int_finalize_no_overflow():
    # n·Σvm² past int64: 3 values of 3e9 milli → Σvm² = 2.7e19 would
    # already overflow int64 per-partial... keep partials legal but make
    # the n·Σvm² product exceed int64 to prove the finalize is arbitrary
    # precision: vm ≈ 1.5e9, n = 5 → Σvm² ≈ 1.1e19 > 2^63? (no — pick so
    # partial fits: vm = 1e9, n = 8 → Σvm² = 8e18 < 9.22e18, and
    # n·Σvm² = 6.4e19 > 2^63.)
    import ray.data

    from pdf2doi_ray.stages.aggs import grouped_var_stats

    vals = [1e6 + i for i in range(8)]        # milli ≈ 1e9 each
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array(["x"] * 8), "v": pa.array(vals)}))
    out = grouped_var_stats(ds, "k", "v").to_pandas()
    vm = [int(np.floor(v * 1000)) for v in vals]
    n, s, q = len(vm), sum(vm), sum(v * v for v in vm)
    assert q < 2 ** 63 and n * q > 2 ** 63    # the overflow regime tested
    assert int(out["var_microsq"].iloc[0]) == (n * q - s * s) // (n * n)


@pytest.mark.usefixtures("ray_session")
def test_paired_moments_bruteforce_including_negative_cov():
    import ray.data

    from pdf2doi_ray.stages.aggs import paired_moments

    rng = np.random.default_rng(11)
    x = rng.integers(0, 1000, size=3000)
    y = 1000 - x + rng.integers(0, 10, size=3000)   # strongly negative cov
    ds = ray.data.from_arrow(pa.table({
        "x": pa.array(x, type=pa.int64()),
        "y": pa.array(y, type=pa.int64())})).repartition(5)
    out = paired_moments(ds, "x", "y")
    n = len(x)
    sx, sy = int(x.sum()), int(y.sum())
    sxy = int((x.astype(object) * y.astype(object)).sum())
    assert int(out["cov_num"].iloc[0]) == n * sxy - sx * sy
    assert int(out["cov_num"].iloc[0]) < 0
    assert int(out["varx_num"].iloc[0]) == \
        n * int((x.astype(object) ** 2).sum()) - sx * sx


# --- HLL register rows ------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_hll_register_rows_equal_single_pass_registers():
    import ray.data

    from pdf2doi_ray.stages.sketch import hll_register_rows, registers_for

    vals = [f"host-{i % 700}" for i in range(5000)]
    ds = ray.data.from_arrow(pa.table({"h": pa.array(vals)})).repartition(6)
    rows = hll_register_rows(ds, "h").to_pandas() \
        .sort_values("bucket").reset_index(drop=True)
    regs = registers_for(vals)
    nz = np.nonzero(regs)[0]
    assert list(rows["bucket"]) == list(nz)
    assert list(rows["register"]) == list(regs[nz].astype(int))


def test_hll_hash_is_md5_first8_be():
    from pdf2doi_ray.stages.sketch import hash64
    v = "site3.example.org"
    assert hash64(v) == int.from_bytes(
        hashlib.md5(v.encode()).digest()[:8], "big")


# --- minhash md5 spec pin ---------------------------------------------------

def test_minhash_band_digest_is_md5_of_joined_decimal():
    from pdf2doi_ray.stages.dedup import band_rows, minhash_signature, shingles
    sig = minhash_signature(shingles("the quick brown fox jumps over it"))
    rows = band_rows(7, sig)
    b, digest = rows[3][1], rows[3][2]
    seg = sig[b * 4:(b + 1) * 4]
    want = hashlib.md5(":".join(str(int(s)) for s in seg).encode()) \
        .hexdigest()[:16]
    assert digest == want


def test_minhash_shingle_hash_is_md5():
    from pdf2doi_ray.stages.dedup import _stable64
    g = "a b c"
    assert _stable64(g) == int.from_bytes(
        hashlib.md5(g.encode()).digest()[:8], "big") >> 1


# --- interchange round trips -----------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_jsonl_and_csv_roundtrip_tricky_strings(tmp_path):
    import ray.data

    from pdf2doi_ray.sources.formats import (
        export_csv, export_jsonl, read_csv_dir, read_jsonl)

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array(['plain', 'with,comma and "quotes"',
                          "tab\there"]),
    })
    ds = ray.data.from_arrow(t)
    jd, cd = str(tmp_path / "j"), str(tmp_path / "c")
    export_jsonl(ds, jd)
    export_csv(ds, cd)
    for back in (read_jsonl(jd), read_csv_dir(cd)):
        df = back.select_columns(["doc_id", "text"]).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(df, t.to_pandas())


# --- winsorization + cohort retention ---------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_winsorize_clamps_to_exact_milli_quantiles():
    import ray.data

    from pdf2doi_ray.stages.aggs import winsorize_values_milli

    # 100 values 0.001..0.100 → milli grid 1..100; p5/p95 by the 1-based
    # ceil-rank rule land on 5 and 95 exactly
    vals = [i / 1000 for i in range(1, 101)]
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array(range(100), type=pa.int64()),
        "value": pa.array(vals, type=pa.float64()),
    })).repartition(4)
    out = winsorize_values_milli(ds, "value", 50, 950,
                                 carry_cols=("user_id",)).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    assert out["value_milli"].tolist() == list(range(1, 101))
    w = out["value_winsorized_milli"]
    assert w.min() == 5 and w.max() == 95
    assert (w == np.clip(np.arange(1, 101), 5, 95)).all()


@pytest.mark.usefixtures("ray_session")
def test_winsorize_empty_input_passes_through():
    import ray.data

    from pdf2doi_ray.stages.aggs import winsorize_values_milli

    t = pa.table({"user_id": pa.array([], type=pa.int64()),
                  "value": pa.array([], type=pa.float64())})
    out = winsorize_values_milli(ray.data.from_arrow(t), "value",
                                 carry_cols=("user_id",))
    assert out.count() == 0


@pytest.mark.usefixtures("ray_session")
def test_cohort_retention_tiny_handcomputed():
    import ray.data

    from pdf2doi_ray.stages.aggs import WEEK_US, cohort_retention

    # user 1 active weeks {0, 1, 3}; user 2 weeks {1, 1, 2} (dup activity
    # in week 1 must count once); user 3 week {3} only
    rows = [(1, 0), (1, 1), (1, 3), (2, 1), (2, 1), (2, 2), (3, 3)]
    t = pa.table({
        "user_id": pa.array([u for u, _ in rows], type=pa.int64()),
        "ts": pa.array([w * WEEK_US + 12345 for _, w in rows],
                       type=pa.timestamp("us")),
    })
    out = cohort_retention(ray.data.from_arrow(t).repartition(3),
                           num_partitions=2).to_pandas()
    got = {(r.cohort_week, r.week_offset): r.n_users
           for r in out.itertuples()}
    assert got == {(0, 0): 1, (0, 1): 1, (0, 3): 1,   # user 1
                   (1, 0): 1, (1, 1): 1,              # user 2 (dup folded)
                   (3, 0): 1}                         # user 3
