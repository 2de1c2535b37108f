"""Round-2 scale-path tests: the driver-side materializations named in
VERDICT round 1 are gone and the distributed replacements are byte-equal.

* wordset_jaccard_adjacent: boundary-exchange shift-join == brute force,
  regardless of how the input is split into blocks/batches;
* minhash candidate generation: hot buckets (> MAX_ALL_PAIRS_BUCKET docs)
  emit star pairs, never O(n²);
* distributed Bloom build: identical bitmap to the in-memory build;
* dedup_by_url: arrow combiner + pyarrow head keeps exactly one row per url.
"""

import numpy as np
import pyarrow as pa
import pytest

import golden_impl as G


def _brute_adjacent(ids, texts):
    by_id = dict(zip(ids, texts))
    out = {}
    for i in ids:
        if i + 1 in by_id:
            a = set(by_id[i].split(" "))
            b = set(by_id[i + 1].split(" "))
            inter = len(a & b)
            union = len(a) + len(b) - inter
            out[i] = (1000 * inter) // union if union else 1000
    return out


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks,stitch_shards",
                         [(1, 1), (3, 1), (3, 4), (7, 32)])
def test_wordset_jaccard_boundary_exchange(n_blocks, stitch_shards):
    import ray.data

    from pdf2doi_ray.stages.dedup import wordset_jaccard_adjacent

    ids = list(range(40))
    texts = [f"w{i} w{i+1} common a b" for i in ids]
    t = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                  "text": pa.array(texts)})
    # repartition creates real block boundaries → cross-batch pairs must
    # come from the boundary-exchange stitch
    docs = ray.data.from_arrow(t).repartition(n_blocks)
    out = wordset_jaccard_adjacent(docs,
                                   stitch_shards=stitch_shards).to_pandas()
    got = dict(zip(out["doc_id"].astype(int),
                   out["jaccard_next_permille"].astype(int)))
    assert got == _brute_adjacent(ids, texts)


@pytest.mark.usefixtures("ray_session")
def test_wordset_jaccard_rejects_unsorted():
    import ray.data

    from pdf2doi_ray.stages.dedup import wordset_jaccard_adjacent

    t = pa.table({"doc_id": pa.array([3, 1, 2], type=pa.int64()),
                  "text": pa.array(["a", "b", "c"])})
    with pytest.raises(Exception):
        wordset_jaccard_adjacent(ray.data.from_arrow(t)).to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_minhash_hot_bucket_emits_star_pairs():
    import ray.data

    from pdf2doi_ray.stages.dedup import (
        MAX_ALL_PAIRS_BUCKET,
        minhash_candidate_pairs,
    )

    n = MAX_ALL_PAIRS_BUCKET + 16          # identical docs → one hot bucket
    t = pa.table({"doc_id": pa.array(list(range(n)), type=pa.int64()),
                  "text": pa.array(["same text for every document here"] * n)})
    out = minhash_candidate_pairs(ray.data.from_arrow(t)).to_pandas()
    pairs = set(zip(out["doc_a"].astype(int), out["doc_b"].astype(int)))
    # star from the minimum id — n-1 pairs, NOT n*(n-1)/2
    assert pairs == {(0, i) for i in range(1, n)}


@pytest.mark.usefixtures("ray_session")
def test_minhash_near_dups_matches_golden_on_synthetic():
    import ray.data

    from pdf2doi_ray.stages.dedup import minhash_near_dups

    texts = {}
    base = " ".join(f"tok{i}" for i in range(120))
    for i in range(10):
        texts[i] = base + (f" extra{i}" if i % 2 else "")
    for i in range(10, 20):
        texts[i] = " ".join(f"u{i}w{j}" for j in range(120))
    t = pa.table({"doc_id": pa.array(sorted(texts), type=pa.int64()),
                  "text": pa.array([texts[i] for i in sorted(texts)])})
    out = minhash_near_dups(ray.data.from_arrow(t).repartition(3)).to_pandas()
    engine = set(zip(out["doc_a"].astype(int), out["doc_b"].astype(int),
                     out["jaccard_permille"].astype(int)))
    assert engine == G.near_dup_pairs(texts)


@pytest.mark.usefixtures("ray_session")
def test_distributed_bloom_build_matches_inmemory():
    import ray.data

    from pdf2doi_ray.state.bloom import BloomFilter, build_bloom_distributed

    urls = [f"https://h{i % 7}.org/p{i}" for i in range(500)]
    ds = ray.data.from_arrow(pa.table({"url": pa.array(urls)})).repartition(5)
    dist = build_bloom_distributed(ds, "url", fpp=0.01)
    mem = BloomFilter.build(urls, fpp=0.01)
    assert dist.n_bits == mem.n_bits and dist.n_hashes == mem.n_hashes
    assert np.array_equal(dist.bits, mem.bits)
    assert all(u in dist for u in urls[:50])


@pytest.mark.usefixtures("ray_session")
def test_dedup_by_url_one_row_per_url():
    import ray.data

    from pdf2doi_ray.state.checkpoint import dedup_by_url

    t = pa.table({
        "url": pa.array([f"u{i % 20}" for i in range(200)]),
        "identifier": pa.array([f"id{i % 20}" for i in range(200)]),
    })
    out = dedup_by_url(ray.data.from_arrow(t).repartition(4)).to_pandas()
    assert len(out) == 20
    assert sorted(out["url"]) == sorted(f"u{i}" for i in range(20))
    # representative row is intact (duplicates are identical by contract)
    got = dict(zip(out["url"], out["identifier"]))
    assert all(got[f"u{i}"] == f"id{i}" for i in range(20))


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks,stitch_shards", [(1, 1), (4, 1), (4, 5)])
def test_session_counts_vectorized_parity(n_blocks, stitch_shards):
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.windows import session_counts

    rng = np.random.RandomState(9)
    users = rng.randint(0, 12, size=400)
    base = np.int64(1_600_000_000_000_000)
    ts = base + rng.randint(0, 3_600_000_000 * 24, size=400)
    t = pa.table({
        "user_id": pa.array(users, type=pa.int64()),
        "ts": pa.array(ts.astype("datetime64[us]")),
    })
    got = (session_counts(ray.data.from_arrow(t).repartition(n_blocks),
                          stitch_shards=stitch_shards)
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    # brute force
    rows = []
    for u in sorted(set(users)):
        tsu = np.sort(ts[users == u])
        nsess = int((np.diff(tsu) > 1800 * 1_000_000).sum()) + 1
        rows.append((u, len(tsu), nsess))
    want = pd.DataFrame(rows, columns=["user_id", "n_events", "n_sessions"])
    assert got["user_id"].tolist() == want["user_id"].tolist()
    assert got["n_events"].tolist() == want["n_events"].tolist()
    assert got["n_sessions"].tolist() == want["n_sessions"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_wordset_jaccard_rejects_interleaved_blocks():
    import ray.data

    from pdf2doi_ray.stages.dedup import wordset_jaccard_adjacent

    # odd/even interleaving: every block is ascending (per-batch check
    # passes) but no block holds consecutive ids — the stitch must detect
    # the overlapping batch ranges and raise instead of silently dropping
    # all 99 pairs (round-2 review finding)
    even = pa.table({"doc_id": pa.array(list(range(0, 40, 2)), type=pa.int64()),
                     "text": pa.array(["a b"] * 20)})
    odd = pa.table({"doc_id": pa.array(list(range(1, 40, 2)), type=pa.int64()),
                    "text": pa.array(["a b"] * 20)})
    docs = ray.data.from_arrow([even, odd])
    with pytest.raises(Exception, match="contiguous|overlap"):
        wordset_jaccard_adjacent(docs).to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_wordset_jaccard_rejects_duplicate_ids_across_batches():
    import ray.data

    from pdf2doi_ray.stages.dedup import wordset_jaccard_adjacent

    # duplicate leading id 5 in both batches: batch ranges collapse under
    # the batch_key and the overlap check alone would miss it (2nd-review
    # finding) — the duplicate-id check must raise
    a = pa.table({"doc_id": pa.array([5, 6, 10], type=pa.int64()),
                  "text": pa.array(["a"] * 3)})
    b = pa.table({"doc_id": pa.array([5, 7, 9], type=pa.int64()),
                  "text": pa.array(["a"] * 3)})
    with pytest.raises(Exception, match="unique|overlap|contiguous"):
        wordset_jaccard_adjacent(ray.data.from_arrow([a, b])).to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_knn_ivf_sparse_offset_ids_use_bottom_k_fallback():
    import ray.data

    from pdf2doi_ray.stages.similarity import knn_ivf

    rng = np.random.RandomState(5)
    vecs = rng.standard_normal((300, 16))
    ids = np.concatenate([[3], np.arange(10000, 10299)])
    emb = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids, type=pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              type=pa.list_(pa.float64())),
    }))
    # pre-fix this crashed (0-row k-means sample) or trained on 1 row;
    # the bottom-k fallback must supply the 256 smallest ids
    out = knn_ivf(emb, vecs[0], k=5, train_rows=256)
    assert len(out) == 5
    assert out["rank"].tolist() == [1, 2, 3, 4, 5]
