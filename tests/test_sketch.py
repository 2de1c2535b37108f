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
