"""HyperLogLog sketch: exact mergeability, determinism, accuracy, and the
distributed partial-merge equals the single-pass sketch."""

import numpy as np
import pyarrow as pa
import pytest

from pdf2doi_ray.stages.sketch import (
    HLL_M,
    approx_ndv,
    estimate,
    merge_registers,
    registers_for,
)


def test_merge_equals_single_pass():
    vals = [f"v{i}" for i in range(5000)]
    whole = registers_for(vals)
    parts = [registers_for(vals[i:i + 700]) for i in range(0, 5000, 700)]
    assert np.array_equal(merge_registers(parts), whole)
    # merge order must not matter
    assert np.array_equal(merge_registers(list(reversed(parts))), whole)


def test_determinism_and_duplicates():
    a = registers_for(["x", "y", "z"] * 100)
    b = registers_for(["x", "y", "z"])
    assert np.array_equal(a, b)          # duplicates never change the sketch
    assert estimate(a) == estimate(b)


def test_accuracy_within_error_bound():
    for n in (50, 1000, 20000):
        est = estimate(registers_for([f"item-{i}" for i in range(n)]))
        # 4096 registers → ~1.6% standard error; allow 5%
        assert abs(est - n) <= max(2, 0.05 * n), (n, est)


def test_small_range_linear_counting():
    # fixture-sized cardinalities sit in the linear-counting range; index
    # collisions make even that approximate (observed 48 for 50) — assert
    # the documented ±5% band and determinism
    vals = [f"site{i}.example.org" for i in range(50)]
    est = estimate(registers_for(vals))
    assert abs(est - 50) <= max(3, 0.05 * 50)
    assert est == estimate(registers_for(vals))


def test_empty():
    regs = registers_for([])
    assert regs.shape == (HLL_M,)
    assert estimate(regs) == 0


@pytest.mark.usefixtures("ray_session")
def test_distributed_partials_equal_global_sketch():
    import ray.data

    vals = [f"host-{i % 3000}" for i in range(20000)]
    ds = ray.data.from_arrow(pa.table({"host": pa.array(vals)})) \
        .repartition(7)
    est = approx_ndv(ds, "host")
    assert est == estimate(registers_for(vals))
    assert abs(est - 3000) <= 0.05 * 3000


# --- Misra-Gries heavy hitters --------------------------------------------

def _zipf_tokens(rng, n=4000, vocab=400):
    # zipf-ish: token j has weight ~ 1/(j+1)
    w = 1.0 / np.arange(1, vocab + 1)
    return rng.choice([f"t{j}" for j in range(vocab)], size=n, p=w / w.sum())


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks", [1, 4])
def test_heavy_hitters_invariants_under_compression(n_blocks):
    import collections

    import ray.data

    from pdf2doi_ray.stages.sketch import heavy_hitters

    rng = np.random.default_rng(23)
    toks = _zipf_tokens(rng)
    true = collections.Counter(toks)
    t = pa.table({"token": pa.array(list(toks))})
    ds = ray.data.from_arrow(t).repartition(n_blocks)
    out = heavy_hitters(ds, "token", m=32, k=15)
    err = int(out["err_bound"].iloc[0]) if len(out) else 0
    # mergeable-summaries invariants
    for _, r in out.iterrows():
        assert r["est_count"] <= true[r["value"]]              # under-count
        assert true[r["value"]] - r["est_count"] <= err        # bounded
    # no phi-heavy hitter lost: any key with true > err must be reported
    # among the top-k if its lower bound beats the k-th estimate
    reported = set(out["value"])
    kth = out["est_count"].min() if len(out) else 0
    for key, c in true.items():
        if c - err > kth:
            assert key in reported, (key, c, err, kth)


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitters_exact_when_capacity_sufficient():
    import collections

    import ray.data

    from pdf2doi_ray.stages.sketch import heavy_hitters

    rng = np.random.default_rng(29)
    toks = _zipf_tokens(rng, n=2000, vocab=50)
    true = collections.Counter(toks)
    ds = ray.data.from_arrow(
        pa.table({"token": pa.array(list(toks))})).repartition(3)
    out = heavy_hitters(ds, "token", m=256, k=10)
    assert (out["err_bound"] == 0).all()
    want = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(out["value"], out["est_count"])) == want


# ---- KLL/MRL quantile sketch ----

def test_kll_weight_invariant_and_roundtrip():
    import numpy as np

    from pdf2doi_ray.stages.sketch import (kll_add, kll_deserialize,
                                           kll_merge, kll_new,
                                           kll_quantiles, kll_serialize,
                                           kll_total_weight)

    rng = np.random.default_rng(5)
    for gen in (rng.integers(0, 10**6, 50_000).astype(np.int64),
                np.sort(rng.integers(0, 10**6, 50_000)).astype(np.int64),
                rng.zipf(1.3, 50_000).astype(np.int64)):
        sk = kll_new()
        kll_add(sk, gen)
        assert kll_total_weight(sk) == len(gen)
        rt = kll_deserialize(kll_serialize(sk))
        assert kll_total_weight(rt) == len(gen)
        assert kll_quantiles(rt, (500,)) == kll_quantiles(sk, (500,))

    a, b = kll_new(), kll_new()
    kll_add(a, rng.integers(0, 100, 7_777).astype(np.int64))
    kll_add(b, rng.integers(50, 200, 3_333).astype(np.int64))
    m = kll_merge(a, b)
    assert kll_total_weight(m) == 7_777 + 3_333


def test_kll_rank_error_bound_single_and_merged():
    import numpy as np

    from pdf2doi_ray.stages.sketch import (kll_add, kll_merge, kll_new,
                                           kll_quantiles)

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 10**6, 100_000).astype(np.int64)
    sv = np.sort(vals)

    single = kll_new()
    kll_add(single, vals)
    merged = kll_new()
    for chunk in np.array_split(vals, 41):
        p = kll_new()
        kll_add(p, chunk)
        merged = kll_merge(merged, p)

    for sk in (single, merged):
        for q, est in kll_quantiles(sk, (100, 250, 500, 750, 900, 990)):
            true_rank = np.searchsorted(sv, est, side="right")
            err = abs(true_rank - q * len(vals) // 1000) / len(vals)
            assert err < 0.03, (q, err)     # k=512 bound with margin


@pytest.mark.usefixtures("ray_session")
def test_approx_quantiles_tracks_exact():
    """The distributed sketch must agree with the exact milli-histogram
    quantiles to within the rank bound on the shared events fixture."""
    import numpy as np
    import ray.data

    from pdf2doi_ray.stages.aggs import value_quantiles_milli
    from pdf2doi_ray.stages.sketch import approx_quantiles_milli

    ev = ray.data.read_parquet("/root/testdata/sf0.01/events.parquet",
                               columns=["value"])
    approx = approx_quantiles_milli(ev, "value")
    exact = value_quantiles_milli(
        ray.data.read_parquet("/root/testdata/sf0.01/events.parquet",
                              columns=["value"]), "value")
    vals = np.sort(np.floor(
        ray.data.read_parquet("/root/testdata/sf0.01/events.parquet",
                              columns=["value"])
        .to_pandas()["value"].to_numpy() * 1000).astype(np.int64))
    n = len(vals)
    ex = dict(zip(exact["q_permille"], exact["value"])) \
        if "q_permille" in getattr(exact, "columns", []) else None
    for _, row in approx.iterrows():
        q, est = int(row["q_permille"]), int(row["value"])
        true_rank = np.searchsorted(vals, est, side="right")
        assert abs(true_rank - q * n // 1000) <= max(0.03 * n, 2), (q, est)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks", [1, 5])
def test_kll_by_group_rank_error_vs_exact(n_blocks):
    """Per-group KLL quantiles stay within the asserted rank-error bound
    of the EXACT per-group quantiles on skewed per-group distributions,
    and the distributed (multi-blob) merge equals single-group accuracy —
    invariant under block count."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from pdf2doi_ray.stages.sketch import approx_quantiles_milli_by_group

    rng = np.random.RandomState(11)
    groups, vals = [], []
    dists = {"a": rng.exponential(5.0, 40_000),
             "b": rng.normal(100.0, 3.0, 25_000),
             "c": rng.uniform(-50.0, 50.0, 10_000)}
    for g, v in dists.items():
        groups += [g] * len(v)
        vals.append(v)
    vals = np.concatenate(vals)
    t = pa.table({"g": pa.array(groups, type=pa.string()),
                  "value": pa.array(vals, type=pa.float64())})
    out = approx_quantiles_milli_by_group(
        ray.data.from_arrow(t).repartition(n_blocks), "g", "value") \
        .to_pandas()
    assert len(out) == 3 * 4
    for g, v in dists.items():
        milli = np.floor(np.asarray(v) * 1000.0).astype(np.int64)
        milli.sort()
        n = len(milli)
        sub = out[out.g == g].set_index("q_permille")["value"]
        for q in (250, 500, 750, 900):
            got = int(sub.loc[q])
            rank = np.searchsorted(milli, got, side="right")
            assert abs(rank - q * n // 1000) <= max(0.03 * n, 1), (g, q)


def test_count_min_invariants():
    """CM guarantees: est >= true for every key (including absent keys at
    >= 0), element-wise SUM of partial tables == table of the
    concatenated stream (lossless merge), and with width >> NDV the
    estimates are exact."""
    import numpy as np

    from pdf2doi_ray.stages.sketch import (CM_DEPTH, CM_WIDTH,
                                           cm_estimate, cm_from_counts)

    rng = np.random.RandomState(3)
    keys = np.array([f"k{i}" for i in range(300)], dtype=object)
    true = rng.randint(1, 1000, size=300).astype(np.int64)
    # split the stream into 4 partials
    tables = []
    for part in np.array_split(np.arange(300), 4):
        tables.append(cm_from_counts(keys[part], true[part]))
    merged = np.sum(tables, axis=0)
    single = cm_from_counts(keys, true)
    assert (merged == single).all()
    est = cm_estimate(merged, list(keys))
    assert (est >= true).all()
    # error bound: est - true <= (e/width) * N with prob 1 - 2^-depth per
    # key; at 300 keys over 1024 buckets collisions are rare — assert the
    # deterministic upper envelope instead of the probabilistic bound
    assert (est - true <= true.sum()).all()
    # width >> NDV here, so require exactness for most keys
    assert (est == true).mean() > 0.9
    absent = cm_estimate(merged, ["nope1", "nope2"])
    assert (absent >= 0).all()
    assert absent.max() <= int(np.e / CM_WIDTH * true.sum()) + true.max()


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks", [1, 5])
def test_count_min_distributed_matches_exact(n_blocks):
    import collections

    import pyarrow as pa
    import ray.data

    from pdf2doi_ray.stages.sketch import count_min_frequencies

    vals = ["a"] * 50 + ["b"] * 30 + ["c"] * 5 + [f"x{i}" for i in range(20)]
    t = pa.table({"event_type": pa.array(vals, type=pa.string())})
    out = count_min_frequencies(
        ray.data.from_arrow(t).repartition(n_blocks), "event_type",
        probes=("a", "b", "c", "zz")).set_index("value")["est_count"]
    true = collections.Counter(vals)
    for k in ("a", "b", "c"):
        assert out[k] >= true[k]
        assert out[k] <= true[k] + 5          # 105 rows over 1024 buckets
    assert out["zz"] <= 5


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks", [1, 4])
def test_heavy_hitters_tree_matches_flat(n_blocks):
    """The tree-merged variant is exact (equal to the flat driver merge)
    when m >= NDV, and in the compressed regime still satisfies the MG
    invariants: est <= true, true - est <= err_bound, and no heavy key
    lost."""
    import collections

    import pyarrow as pa
    import ray.data

    from pdf2doi_ray.stages.sketch import heavy_hitters, heavy_hitters_tree

    vals = (["a"] * 500 + ["b"] * 300 + ["c"] * 120
            + [f"x{i}" for i in range(60) for _ in range(3)])
    t = pa.table({"v": pa.array(vals, type=pa.string())})
    ds = ray.data.from_arrow(t).repartition(n_blocks)

    # exact regime: m >= NDV on both paths -> identical frames
    flat = heavy_hitters(ds, "v", m=256, k=10)
    tree = heavy_hitters_tree(ds, "v", m=256, k=10, num_shards=4)
    assert tree.to_dict("records") == flat.to_dict("records")
    assert (tree["err_bound"] == 0).all()

    # compressed regime: invariants hold
    true = collections.Counter(vals)
    small = heavy_hitters_tree(ds, "v", m=8, k=5, num_shards=4)
    for r in small.itertuples():
        assert r.est_count <= true[r.value]
        assert true[r.value] - r.est_count <= r.err_bound
    assert small.iloc[0]["value"] == "a"      # the 500-count key survives
