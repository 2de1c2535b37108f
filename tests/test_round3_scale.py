"""Round-3 scale-path tests: the candidate-id driver broadcast in
minhash_near_dups is replaced by a distributed int64 Bloom filter, and the
filter itself is exact-on-negatives / output-neutral-on-positives."""

import numpy as np
import pyarrow as pa
import pytest

import golden_impl as G


def test_int_bloom_no_false_negatives_and_low_fpp():
    from pdf2doi_ray.state.bloom import IntBloomFilter

    rng = np.random.RandomState(3)
    added = rng.randint(-2**62, 2**62, size=5000).astype(np.int64)
    other = rng.randint(-2**62, 2**62, size=20000).astype(np.int64)
    other = other[~np.isin(other, added)]
    bf = IntBloomFilter(len(added), fpp=0.01)
    bf.add_many(added)
    assert bf.contains_many(added).all()          # no false negatives
    fpp = bf.contains_many(other).mean()
    assert fpp < 0.03                             # ~1% target, loose bound
    assert bf.contains_many(np.empty(0, dtype=np.int64)).shape == (0,)


@pytest.mark.usefixtures("ray_session")
def test_distributed_int_bloom_build_matches_inmemory():
    import ray.data

    from pdf2doi_ray.state.bloom import (
        IntBloomFilter,
        build_int_bloom_distributed,
    )

    ids = np.arange(-250, 250, dtype=np.int64) * 7919
    ds = ray.data.from_arrow(pa.table({"doc_id": pa.array(ids)})) \
        .repartition(5)
    dist = build_int_bloom_distributed(ds, "doc_id", n_items=len(ids))
    mem = IntBloomFilter(len(ids))
    mem.add_many(ids)
    assert dist.n_bits == mem.n_bits and dist.n_hashes == mem.n_hashes
    assert np.array_equal(dist.bits, mem.bits)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("fpp", [0.01, 0.5])
def test_minhash_near_dups_bloom_path_output_invariant_to_fpp(fpp):
    # fpp=0.5 forces MANY false positives through the shingle stage; the
    # attach step must drop them all — output byte-identical to the golden
    # implementation at any fpp
    import ray.data

    from pdf2doi_ray.stages.dedup import minhash_near_dups

    texts = {}
    base = " ".join(f"tok{i}" for i in range(120))
    for i in range(10):
        texts[i] = base + (f" extra{i}" if i % 2 else "")
    for i in range(10, 40):
        texts[i] = " ".join(f"u{i}w{j}" for j in range(120))
    t = pa.table({"doc_id": pa.array(sorted(texts), type=pa.int64()),
                  "text": pa.array([texts[i] for i in sorted(texts)])})
    out = minhash_near_dups(ray.data.from_arrow(t).repartition(4),
                            id_filter_fpp=fpp).to_pandas()
    engine = set(zip(out["doc_a"].astype(int), out["doc_b"].astype(int),
                     out["jaccard_permille"].astype(int)))
    assert engine == G.near_dup_pairs(texts)


def test_minhash_id_path_has_no_driver_take_all():
    # the id-membership path must stay Bloom-based: the only take_all in
    # dedup.py would be a regression back to the driver-side id broadcast
    import inspect

    from pdf2doi_ray.stages import dedup

    src = inspect.getsource(dedup.minhash_near_dups)
    assert "take_all" not in src
    assert "build_int_bloom_distributed" in src


def test_str_bloom_contains_many_matches_scalar():
    from pdf2doi_ray.state.bloom import BloomFilter

    urls = [f"https://h{i % 9}.org/p{i}" for i in range(400)]
    bf = BloomFilter.build(urls[:200], fpp=0.05)
    mask = bf.contains_many(urls)
    assert mask.dtype == bool and len(mask) == 400
    assert all(bool(m) == (u in bf) for u, m in zip(urls, mask))
    assert mask[:200].all()                       # no false negatives


@pytest.mark.usefixtures("ray_session")
def test_bucketed_anti_join_vectorized_distinct_output():
    import ray.data

    from pdf2doi_ray.state.bloom import bucketed_anti_join_urls

    left = ray.data.from_arrow(pa.table({
        "url": pa.array([f"u{i % 30}" for i in range(120)])})).repartition(3)
    right = ray.data.from_arrow(pa.table({
        "url": pa.array([f"u{i}" for i in range(0, 30, 2)])}))
    out = bucketed_anti_join_urls(left, right).to_pandas()
    assert sorted(out["url"]) == sorted(f"u{i}" for i in range(1, 30, 2))
    assert len(out) == 15                          # deduplicated survivors


def _brute_ngram_adjacent(ids, texts, n=3):
    def sh(t):
        toks = t.split(" ")
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
    by_id = dict(zip(ids, texts))
    out = {}
    for i in ids:
        if i + 1 in by_id:
            a, b = sh(by_id[i]), sh(by_id[i + 1])
            inter = len(a & b)
            union = len(a) + len(b) - inter
            out[i] = (1000 * inter) // union if union else 1000
    return out


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks,stitch_shards", [(1, 1), (3, 4), (7, 32)])
def test_ngram_jaccard_boundary_exchange(n_blocks, stitch_shards):
    import ray.data

    from pdf2doi_ray.stages.dedup import ngram_jaccard_adjacent

    ids = list(range(40))
    # mix degenerate shapes: empty, <n tokens, double-space empties kept
    texts = []
    for i in ids:
        if i % 9 == 0:
            texts.append("")
        elif i % 9 == 1:
            texts.append("one two")
        elif i % 9 == 2:
            texts.append("x  y z")
        else:
            texts.append(f"w{i} w{i+1} common shared tail a b")
    t = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                  "text": pa.array(texts)})
    docs = ray.data.from_arrow(t).repartition(n_blocks)
    out = ngram_jaccard_adjacent(docs,
                                 stitch_shards=stitch_shards).to_pandas()
    got = dict(zip(out["doc_id"].astype(int),
                   out["jaccard_next_permille"].astype(int)))
    assert got == _brute_ngram_adjacent(ids, texts)
