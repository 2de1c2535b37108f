"""Similarity search over an embedding column (``list<float>``).

* :func:`knn_bruteforce` — exact cosine top-k: per-batch vectorized numpy
  matmul against a broadcast query vector (``ray.put`` once, read per task),
  per-batch top-k partials, final tiny reduce.  The pattern scales: the
  all-pairs work stays in the map stage; only k rows per batch move.
* :func:`knn_lsh` — random-hyperplane LSH variant: buckets by sign bits,
  probes the query bucket plus Hamming-≤1 neighbors.  Approximate; the
  scale path when the corpus no longer fits a full scan.

Float math is float64 end-to-end so rankings agree with the DuckDB oracle
(`list_cosine_similarity`); outputs are integer rank/vec_id columns only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

LSH_BITS = 8
_rng = np.random.RandomState(42)
_PLANES: np.ndarray | None = None


def _stack(col) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = np.asarray(arr.flatten(), dtype=np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _cosine(mat: np.ndarray, q: np.ndarray) -> np.ndarray:
    qn = q / np.linalg.norm(q)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return (mat @ qn) / norms



def _ids(col) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return np.asarray(arr)


def _partial_table(ids_k, sims_k) -> pa.Table:
    return pa.table({"vec_id": pa.array(ids_k, type=pa.int64()),
                     "sim": pa.array(sims_k, type=pa.float64())})


def _finalize_topk(partials_ds, k: int) -> pd.DataFrame:
    partials = partials_ds.to_pandas()          # ≤ k rows per batch: tiny
    partials = partials.sort_values(["sim", "vec_id"],
                                    ascending=[False, True]).head(k)
    return pd.DataFrame({
        "rank": np.arange(1, len(partials) + 1, dtype=np.int64),
        "vec_id": partials["vec_id"].to_numpy(),
    })


def _topk_batch(ids: np.ndarray, sims: np.ndarray, k: int) -> tuple:
    """Deterministic per-batch top-k: (sim desc, vec_id asc) — ties at the
    k-th boundary must not be cut arbitrarily, or the global reduce can
    disagree with the exact (ORDER BY sim DESC, vec_id) ranking."""
    if len(ids) == 0:
        return ids, sims
    order = np.lexsort((ids, -sims))[:k]
    return ids[order], sims[order]


def query_vector(sf_dir: str) -> np.ndarray:
    """Deterministic query: the embedding of vec_id = 0 (pushdown read —
    only the matching row group / columns leave storage)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "==", 0)])
    return np.asarray(t.column("embedding")[0].as_py(), dtype=np.float64)


def knn_bruteforce(embeddings, query: np.ndarray, k: int = 10):
    """Exact top-k by cosine similarity (descending, ties → vec_id asc).

    Returns a small pandas frame ``(rank, vec_id)`` — integers only.
    """
    import ray

    qref = ray.put(query)

    def partial_topk(t: pa.Table) -> pa.Table:
        q = ray.get(qref)
        mat = _stack(t["embedding"])
        sims = _cosine(mat, q)
        ids_k, sims_k = _topk_batch(_ids(t["vec_id"]), sims, k)
        return _partial_table(ids_k, sims_k)

    return _finalize_topk(
        embeddings.map_batches(partial_topk, batch_format="pyarrow"), k)


def embedding_near_dups(embeddings, threshold: float = 0.40):
    """Embedding-cosine near-duplicate pairs (``vec_a < vec_b``), exact.

    Baseline shape: the (small) corpus matrix is broadcast once via
    ``ray.put`` and every batch does one vectorized matmul against it — the
    all-pairs work stays in the map stage, only qualifying pairs move.
    Scale path (corpus matrix no longer broadcastable): LSH-bucket both
    sides (:func:`lsh_bucket`) and do the pairwise step per bucket inside a
    ``groupby(bucket).map_groups`` — approximate across bucket boundaries.
    """
    import ray

    all_rows = embeddings.take_all()           # small side by contract
    ids = np.array([r["vec_id"] for r in all_rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in all_rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    ref = ray.put((ids, mat / norms[:, None]))

    def pairs(t: pa.Table) -> pa.Table:
        a_ids_all, unit = ray.get(ref)
        m = _stack(t["embedding"])
        mn = np.linalg.norm(m, axis=1)
        mn[mn == 0] = 1.0
        sims = (m / mn[:, None]) @ unit.T            # [batch, corpus]
        b_ids = _ids(t["vec_id"])
        ii, jj = np.nonzero(sims >= threshold)
        va, vb = b_ids[ii], a_ids_all[jj]
        keep = va < vb
        return pa.table({"vec_a": pa.array(va[keep], type=pa.int64()),
                         "vec_b": pa.array(vb[keep], type=pa.int64())})

    return embeddings.map_batches(pairs, batch_format="pyarrow")


def _kmeans(train: np.ndarray, n_centroids: int, iters: int = 10) -> np.ndarray:
    """Deterministic k-means (first-n init over vec_id-sorted training rows,
    fixed iteration count, empty clusters keep their previous centroid)."""
    cents = train[:n_centroids].copy()
    for _ in range(iters):
        d = ((train[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(n_centroids):
            members = train[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def knn_ivf(embeddings, query: np.ndarray, k: int = 10,
            n_centroids: int = 16, nprobe: int = 4,
            train_rows: int = 2048):
    """IVF-style ANN: k-means coarse quantizer (trained on a deterministic
    vec_id-ordered sample), scan only the ``nprobe`` centroids nearest to
    the query.  The scale path next to :func:`knn_lsh` — centroids broadcast,
    assignment + pruning vectorized per batch, only per-batch top-k moves.
    """
    import ray

    sample = embeddings.sort("vec_id").limit(train_rows).take_all()
    train = np.array([r["embedding"] for r in sample], dtype=np.float64)
    cents = _kmeans(train, min(n_centroids, len(train)))
    qd = ((cents - query[None, :]) ** 2).sum(axis=1)
    probe = np.argsort(qd, kind="stable")[:nprobe]
    ref = ray.put((cents, probe, query))

    def partial(t: pa.Table) -> pa.Table:
        cents_, probe_, q = ray.get(ref)
        mat = _stack(t["embedding"])
        d = ((mat[:, None, :] - cents_[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        mask = np.isin(assign, probe_)
        empty = pa.table({"vec_id": pa.array([], type=pa.int64()),
                          "sim": pa.array([], type=pa.float64())})
        if not mask.any():
            return empty
        ids = _ids(t["vec_id"])[mask]
        sims = _cosine(mat[mask], q)
        ids_k, sims_k = _topk_batch(ids, sims, k)
        return _partial_table(ids_k, sims_k)

    return _finalize_topk(
        embeddings.map_batches(partial, batch_format="pyarrow"), k)


def _planes(dim: int) -> np.ndarray:
    global _PLANES
    if _PLANES is None or _PLANES.shape[1] != dim:
        _PLANES = np.random.RandomState(42).standard_normal((LSH_BITS, dim))
    return _PLANES


def lsh_bucket(vectors: np.ndarray) -> np.ndarray:
    """Sign-bit bucket id per vector (deterministic hyperplanes)."""
    signs = (vectors @ _planes(vectors.shape[1]).T) > 0
    return (signs << np.arange(LSH_BITS)).sum(axis=1).astype(np.int64)


def knn_lsh(embeddings, query: np.ndarray, k: int = 10):
    """Approximate top-k: scan only the query's LSH bucket and its
    Hamming-≤1 neighbor buckets (multi-probe)."""
    import ray

    qbucket = int(lsh_bucket(query[None, :])[0])
    probe = {qbucket} | {qbucket ^ (1 << b) for b in range(LSH_BITS)}
    probe_arr = np.fromiter(probe, dtype=np.int64)
    qref = ray.put(query)

    def partial(t: pa.Table) -> pa.Table:
        q = ray.get(qref)
        mat = _stack(t["embedding"])
        buckets = lsh_bucket(mat)
        mask = np.isin(buckets, probe_arr)
        if not mask.any():
            return pa.table({"vec_id": pa.array([], type=pa.int64()),
                             "sim": pa.array([], type=pa.float64())})
        ids = _ids(t["vec_id"])[mask]
        sims = _cosine(mat[mask], q)
        ids_k, sims_k = _topk_batch(ids, sims, k)
        return _partial_table(ids_k, sims_k)

    return _finalize_topk(
        embeddings.map_batches(partial, batch_format="pyarrow"), k)
