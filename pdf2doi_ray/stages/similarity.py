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
    Scale path (corpus matrix no longer broadcastable):
    :func:`embedding_near_dups_lsh` — LSH-bucketed pairwise, approximate
    across bucket boundaries.

    Float-boundary note: similarities are float64 and compared to the hard
    threshold; a pair whose true cosine sits within ~1e-15 relative error of
    the threshold can differ from an oracle that sums in another order
    (DuckDB ``list_cosine_similarity``).  The fixture embeddings keep sims
    away from the boundary; for adversarial data quantize both sides to a
    common grid before comparing.
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


NEARDUP_LSH_BITS = 3      # bits per hash table
NEARDUP_LSH_TABLES = 12   # number of tables (12×3 deterministic hyperplanes)


def _neardup_planes(dim: int) -> np.ndarray:
    return np.random.RandomState(42).standard_normal(
        (NEARDUP_LSH_TABLES * NEARDUP_LSH_BITS, dim))


def embedding_near_dups_lsh(embeddings, threshold: float = 0.40,
                            bits: int = NEARDUP_LSH_BITS,
                            tables: int = NEARDUP_LSH_TABLES):
    """LSH-bucketed embedding near-dup pairs — the scale path of
    :func:`embedding_near_dups` (corpus matrix too large to broadcast).

    Multi-table sign-LSH: each vector lands in one bucket per table
    (``tables`` replicas shuffle — embeddings are small next to documents);
    the pairwise matmul runs per ``(table, bucket)`` group inside
    ``map_groups``; cross-table duplicates collapse in a final pair-key
    groupby.  Approximate: a pair whose vectors share no bucket in any table
    is missed.  At the fixture's low threshold (cos ≥ 0.40) the 12×3-bit
    configuration measures recall 1.0 vs the exact pairs
    (``tests/test_round2_scale.py``); real near-dup thresholds (≥ 0.9)
    support more bits per table and far stronger pruning.
    """
    from ray.data.aggregate import Count

    def bucket_rows(t: pa.Table) -> pa.Table:
        mat = _stack(t["embedding"])
        ids = _ids(t["vec_id"])
        planes = _neardup_planes(mat.shape[1])
        signs = (mat @ planes.T) > 0                      # [n, tables*bits]
        n = len(ids)
        tbl_ids, bks, out_ids, embs = [], [], [], []
        emb_col = _one_chunk_list(t["embedding"])
        for l in range(tables):
            seg = signs[:, l * bits:(l + 1) * bits]
            bk = (seg << np.arange(bits)).sum(axis=1).astype(np.int64)
            tbl_ids.append(np.full(n, l, dtype=np.int64))
            bks.append(bk)
            out_ids.append(ids)
            embs.append(emb_col)
        return pa.table({
            "table_id": pa.array(np.concatenate(tbl_ids), type=pa.int64()),
            "bucket": pa.array(np.concatenate(bks), type=pa.int64()),
            "vec_id": pa.array(np.concatenate(out_ids), type=pa.int64()),
            "embedding": pa.concat_arrays(embs),
        })

    def pairwise(g: pa.Table) -> pa.Table:
        mat = _stack(g["embedding"])
        ids = _ids(g["vec_id"])
        if len(ids) < 2:
            return pa.table({"vec_a": pa.array([], type=pa.int64()),
                             "vec_b": pa.array([], type=pa.int64())})
        nrm = np.linalg.norm(mat, axis=1)
        nrm[nrm == 0] = 1.0
        unit = mat / nrm[:, None]
        sims = unit @ unit.T
        ii, jj = np.nonzero(np.triu(sims >= threshold, 1))
        va = np.minimum(ids[ii], ids[jj])
        vb = np.maximum(ids[ii], ids[jj])
        return pa.table({"vec_a": pa.array(va, type=pa.int64()),
                         "vec_b": pa.array(vb, type=pa.int64())})

    buckets = embeddings.map_batches(bucket_rows, batch_format="pyarrow")
    pairs = buckets.groupby(["table_id", "bucket"]).map_groups(
        pairwise, batch_format="pyarrow")
    # a pair can surface from several tables — collapse on the pair key
    return (pairs.groupby(["vec_a", "vec_b"])
            .aggregate(Count(alias_name="n_tables"))
            .select_columns(["vec_a", "vec_b"]))


def _one_chunk_list(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


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

    # deterministic training sample WITHOUT a global sort: a streaming
    # predicate filter (vec_id < train_rows) keeps at most train_rows rows,
    # sorted on the driver (tiny).  Identical to sort+limit when vec_ids are
    # dense from 0 (the fixture contract).  For id distributions where that
    # filter keeps nothing (ids offset past train_rows), fall back to
    # per-batch bottom-k partials — the smallest train_rows ids overall,
    # matching sort+limit semantics for ANY distribution at the cost of
    # ≤ train_rows rows per batch reaching the driver.
    import pyarrow.compute as pc

    sample = embeddings.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], train_rows)),
        batch_format="pyarrow").take_all()
    if len(sample) < train_rows:
        # the filter undershot (sparse/offset ids, or a corpus smaller than
        # train_rows — the latter re-collects the same rows, cheap by
        # definition): take the true bottom-k ids via per-batch partials
        def bottom_k(t: pa.Table) -> pa.Table:
            ids = _ids(t["vec_id"])
            keep = np.sort(np.argsort(ids, kind="stable")[:train_rows])
            return t.take(pa.array(keep))

        sample = embeddings.map_batches(
            bottom_k, batch_format="pyarrow").take_all()
    sample.sort(key=lambda r: r["vec_id"])
    sample = sample[:train_rows]
    if not sample:
        raise ValueError("knn_ivf: empty embeddings dataset")
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


KNN_LSH_BITS = 8       # bits per table
KNN_LSH_TABLES = 8     # hash tables (union of probed buckets across tables)


def _knn_planes(dim: int) -> np.ndarray:
    return np.random.RandomState(42).standard_normal(
        (KNN_LSH_TABLES * KNN_LSH_BITS, dim))


def knn_lsh(embeddings, query: np.ndarray, k: int = 10,
            bits: int = KNN_LSH_BITS, tables: int = KNN_LSH_TABLES):
    """Approximate top-k: multi-table sign-LSH — a vector is scanned if, in
    ANY of the ``tables`` hash tables, it lands in the query's bucket or a
    Hamming-≤1 neighbor (multi-probe).  The 8×8-bit default scans ~27% of
    the fixture corpus for recall 0.6–0.8 at its moderate (~0.45 cosine)
    neighbor sims; corpora with genuinely close neighbors recall far higher
    at the same pruning (floor asserted in ``tests/test_golden_digests.py``).
    Scanned vectors are ranked by exact cosine, so results are a
    deterministic subset-ranking of the brute-force order.
    """
    import ray

    qref = ray.put(query)

    def partial(t: pa.Table) -> pa.Table:
        q = ray.get(qref)
        mat = _stack(t["embedding"])
        planes = _knn_planes(mat.shape[1])
        signs = (mat @ planes.T) > 0
        qsigns = (q @ planes.T) > 0
        mask = np.zeros(len(mat), dtype=bool)
        shifts = np.arange(bits)
        for l in range(tables):
            seg = signs[:, l * bits:(l + 1) * bits]
            bk = (seg << shifts).sum(axis=1).astype(np.int64)
            qb = int((qsigns[l * bits:(l + 1) * bits] << shifts).sum())
            probe = np.fromiter({qb} | {qb ^ (1 << i) for i in range(bits)},
                                dtype=np.int64)
            mask |= np.isin(bk, probe)
        if not mask.any():
            return pa.table({"vec_id": pa.array([], type=pa.int64()),
                             "sim": pa.array([], type=pa.float64())})
        ids = _ids(t["vec_id"])[mask]
        sims = _cosine(mat[mask], q)
        ids_k, sims_k = _topk_batch(ids, sims, k)
        return _partial_table(ids_k, sims_k)

    return _finalize_topk(
        embeddings.map_batches(partial, batch_format="pyarrow"), k)


def embedding_centroids(embeddings, scale: int = 1_000_000):
    """Per-label centroid of an embedding column, exact and integer.

    The vector aggregation a clustering / class-prototype pipeline needs:
    per-batch numpy scatter-add folds every vector into per-(label, dim)
    micro-scaled integer partial sums (``floor(v * scale)`` per component —
    float32→float64 conversion and the product are bit-deterministic), so
    the shuffle carries |labels|·dim combiner rows per batch, never
    vectors.  The mean uses sign-correct integer floor division (numpy
    ``//``; the SQL oracle spells out the same floor for negative sums).
    Returns (label, dim, centroid_micro, n).
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        arr = (t["embedding"].combine_chunks()
               if isinstance(t["embedding"], pa.ChunkedArray)
               else t["embedding"])
        n = len(arr)
        if n == 0:
            return pa.table({"label": pa.array([], type=pa.int64()),
                             "dim": pa.array([], type=pa.int64()),
                             "s_p": pa.array([], type=pa.int64()),
                             "n_p": pa.array([], type=pa.int64())})
        flat = np.asarray(arr.flatten(), dtype=np.float64)
        vecs = np.floor(flat * scale).astype(np.int64).reshape(n, -1)
        d = vecs.shape[1]
        labels = np.asarray(
            t["label"].combine_chunks()
            if isinstance(t["label"], pa.ChunkedArray) else t["label"]
        ).astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), d), dtype=np.int64)
        np.add.at(sums, inv, vecs)
        counts = np.bincount(inv).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(uniq, d), type=pa.int64()),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(uniq)),
                            type=pa.int64()),
            "s_p": pa.array(sums.ravel(), type=pa.int64()),
            "n_p": pa.array(np.repeat(counts, d), type=pa.int64()),
        })

    def finalize(t: pa.Table) -> pa.Table:
        s = np.asarray(t["sum_micro"].combine_chunks()
                       if isinstance(t["sum_micro"], pa.ChunkedArray)
                       else t["sum_micro"])
        n = np.asarray(t["n"].combine_chunks()
                       if isinstance(t["n"], pa.ChunkedArray) else t["n"])
        cent = s // np.maximum(n, 1)              # numpy // floors (signed)
        return pa.table({
            "label": t["label"],
            "dim": t["dim"],
            "centroid_micro": pa.array(cent, type=pa.int64()),
            "n": t["n"],
        })

    return (embeddings.map_batches(partial, batch_format="pyarrow")
            .groupby(["label", "dim"])
            .aggregate(Sum("s_p", alias_name="sum_micro"),
                       Sum("n_p", alias_name="n"))
            .map_batches(finalize, batch_format="pyarrow"))


def kmeans_fixed(embeddings, k: int = 8, iters: int = 5,
                 return_history: bool = False):
    """Lloyd's k-means with FIXED iterations — the clustering primitive
    between :func:`knn_bruteforce` (given a query) and
    :func:`embedding_centroids` (given labels): it PRODUCES the labels.
    The IVF coarse quantizer (`knn_ivf`) is the downstream consumer shape.

    Deterministic plan (the pagerank-broadcast pattern — per-round driver
    state is k×dim floats, re-broadcast each round; vectors never
    shuffle):

    * seeds: the embeddings of ``vec_id < k`` (the synthesizer's ids are
      dense from 0; pass explicit seed vectors for other corpora via the
      ``seeds`` attribute it returns);
    * each iteration: centroids broadcast once via ``ray.put``; each
      batch assigns by squared-euclidean argmin (ties → lowest cluster
      id) and emits ONE partial row — k×dim float64 sums + k counts +
      the batch's inertia, a few KiB regardless of rows;
    * driver: sum partials, recompute centroids (an emptied cluster
      keeps its previous centroid), repeat;
    * final pass: (vec_id, cluster) assignment Dataset.

    Floating-point caveat (documented, property-tested rather than
    golden-locked): partial sums are added in block order, so centroid
    bits can differ across block layouts; assignments are stable for
    separated clusters, and inertia is non-increasing per Lloyd's
    guarantee — both asserted in tests/test_training_ops.py.
    """
    import ray

    # iterate over a materialized dataset: the seed pass, every round's
    # partial pass and the final assign would otherwise re-execute the
    # whole upstream pipeline (the graph.py "express iteration as
    # materialized" rule)
    embeddings = embeddings.materialize()

    def _seed_centroids() -> np.ndarray:
        import pyarrow.compute as pc
        from ..arrowutil import collect_tables
        t = collect_tables(
            embeddings.map_batches(
                lambda t: t.select(["vec_id", "embedding"])
                .filter(pc.less(t["vec_id"], k)),
                batch_format="pyarrow"))
        if t.num_columns == 0:
            t = pa.table({"vec_id": pa.array([], type=pa.int64()),
                          "embedding": pa.array([], type=pa.list_(
                              pa.float32()))})
        ids = np.asarray(t["vec_id"])
        if sorted(ids.tolist()) != list(range(k)):
            raise ValueError(f"kmeans_fixed: seeds must be exactly the "
                             f"unique vec_id 0..{k-1} rows, found ids "
                             f"{sorted(ids.tolist())[:k+2]}")
        order = np.argsort(ids)
        return _stack(t["embedding"])[order].astype(np.float64)

    cents = _seed_centroids()
    dim = cents.shape[1]
    history = []

    for _ in range(iters):
        cref = ray.put(cents)

        def partial(t: pa.Table) -> pa.Table:
            c = ray.get(cref)
            mat = _stack(t["embedding"]).astype(np.float64)
            # squared euclid via the expansion; argmin ties -> lowest id
            d2 = ((mat * mat).sum(1)[:, None] - 2.0 * mat @ c.T
                  + (c * c).sum(1)[None, :])
            lab = d2.argmin(1)
            sums = np.zeros((k, dim), dtype=np.float64)
            np.add.at(sums, lab, mat)
            counts = np.bincount(lab, minlength=k).astype(np.float64)
            inertia = float(d2[np.arange(len(lab)), lab].sum())
            blob = np.concatenate([sums.ravel(), counts,
                                   [inertia]]).tobytes()
            return pa.table({"blob": pa.array([blob], type=pa.binary())})

        acc = np.zeros(k * dim + k + 1, dtype=np.float64)
        for r in embeddings.map_batches(partial,
                                        batch_format="pyarrow").take_all():
            acc += np.frombuffer(r["blob"], dtype=np.float64)
        sums = acc[:k * dim].reshape(k, dim)
        counts = acc[k * dim:k * dim + k]
        history.append(float(acc[-1]))
        live = counts > 0
        cents = cents.copy()
        cents[live] = sums[live] / counts[live, None]

    cref = ray.put(cents)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        mat = _stack(t["embedding"]).astype(np.float64)
        d2 = ((mat * mat).sum(1)[:, None] - 2.0 * mat @ c.T
              + (c * c).sum(1)[None, :])
        return pa.table({
            "vec_id": t["vec_id"],
            "cluster": pa.array(d2.argmin(1).astype(np.int64)),
        })

    out = embeddings.map_batches(assign, batch_format="pyarrow")
    if return_history:
        return out, cents, history
    return out


def semantic_dedup(embeddings, k: int = 8, iters: int = 5,
                   threshold: float = 0.95, max_cluster: int = 100_000):
    """SemDeDup (Abbas et al., 2023, arXiv:2303.09540): k-means the
    embedding space, find cosine-similar pairs WITHIN each cluster only,
    connected-component the pairs, keep the min ``vec_id`` per component.
    The cluster partition bounds pairwise work to Σ|cluster|² instead of
    n² — ``k`` is the paper's cost/recall knob (cross-cluster duplicates
    are missed BY DESIGN; that approximation is the algorithm).

    Plan (no joins until the final prune):

    * :func:`kmeans_fixed` broadcast rounds produce the centroids
      (deterministic seeds, fixed iterations);
    * ONE more broadcast pass labels each batch with vectors attached,
      so the per-cluster stage needs no vec_id join;
    * ``groupby(cluster).map_groups``: one numpy normalized-matmul per
      cluster (RAISES above ``max_cluster`` — past that size pairwise is
      the wrong tool: raise ``k``);
    * :func:`..stages.graph.prune_near_dups` drops non-representatives
      via the broadcast anti-join — the corpus side never shuffles.

    Returns the surviving (vec_id) rows.
    """
    import ray

    from .graph import prune_near_dups

    # consumed by kmeans (itself materializing), the assign pass and the
    # final prune — pin once instead of re-executing upstream three times
    embeddings = embeddings.materialize()
    _, cents, _ = kmeans_fixed(embeddings, k=k, iters=iters,
                               return_history=True)
    cref = ray.put(cents)

    def assign_with_vec(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        mat = _stack(t["embedding"]).astype(np.float64)
        d2 = ((mat * mat).sum(1)[:, None] - 2.0 * mat @ c.T
              + (c * c).sum(1)[None, :])
        return t.select(["vec_id", "embedding"]).append_column(
            "cluster", pa.array(d2.argmin(1).astype(np.int64)))

    labeled = embeddings.map_batches(assign_with_vec,
                                     batch_format="pyarrow")

    def pairs_of(g: pa.Table) -> pa.Table:
        ids = _ids(g["vec_id"])
        if len(ids) > max_cluster:
            raise ValueError(
                f"semantic_dedup: cluster of {len(ids)} rows exceeds "
                f"max_cluster={max_cluster}; raise k (pairwise inside a "
                "cluster is quadratic by design)")
        mat = _stack(g["embedding"]).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0.0] = 1.0            # zero vectors: cosine 0
        nm = mat / norms[:, None]
        sims = nm @ nm.T
        a, b = np.triu_indices(len(ids), 1)
        hit = sims[a, b] >= threshold
        ia, ib = ids[a[hit]], ids[b[hit]]
        return pa.table({
            "vec_a": pa.array(np.minimum(ia, ib), type=pa.int64()),
            "vec_b": pa.array(np.maximum(ia, ib), type=pa.int64()),
        })

    pairs = labeled.groupby("cluster").map_groups(
        pairs_of, batch_format="pyarrow")

    # prune the id PROJECTION: the anti-join must not carry the vector
    # payload (Acero rejects list columns in join inputs, and the ids are
    # all a downstream rewrite needs to filter the corpus)
    ids_only = embeddings.map_batches(lambda t: t.select(["vec_id"]),
                                      batch_format="pyarrow")
    return prune_near_dups(ids_only, pairs)


def embedding_gram_matrix(embs, dim: int = 64):
    """Exact integer Gram matrix of the milli-quantized embedding
    corpus — ``G = Qᵀ Q`` with ``Q = floor(emb·1000)`` — the PCA /
    whitening prep step as a pure combiner reduction: each batch emits
    one d(d+1)/2-row upper-triangle partial from a single int64 matmul,
    and ONE tiny groupby Sum merges them.  Embeddings never shuffle;
    no float ever crosses the exchange (quantization is one exact
    float32→float64 widening + multiply + floor, bit-identical to the
    SQL mirror).  Returns (i, j, gram) for i ≤ j.
    """
    from ray.data.aggregate import Sum

    iu = np.triu_indices(dim)

    def partial(t: pa.Table) -> pa.Table:
        m = _stack(t["embedding"])
        assert m.shape[1] == dim, f"expected dim {dim}, got {m.shape[1]}"
        q = np.floor(m * 1000.0).astype(np.int64)
        g = q.T @ q
        return pa.table({"i": pa.array(iu[0].astype(np.int64)),
                         "j": pa.array(iu[1].astype(np.int64)),
                         "gram": pa.array(g[iu])})

    return (embs.map_batches(partial, batch_format="pyarrow")
            .groupby(["i", "j"]).aggregate(Sum("gram",
                                               alias_name="gram")))


def embedding_int8_quantize(embeddings, levels: int = 255):
    """Per-vector int8 quantization of milli-scaled embeddings — the
    storage/bandwidth compressor in every large ANN deployment, kept
    exact end to end: v_milli = floor(v·1000) (the repo convention),
    q = (v_milli − min_milli) · levels // range_milli (0 when the
    vector is constant).  Long-format output so SQL can recompute it
    value for value: (vec_id, i, q, min_milli, range_milli).

    Pure map — no shuffle anywhere; each batch unpacks the list column
    to one (n × dim) matrix, row-reduces min/max, and emits the
    quantized grid via vectorized repeat/tile.
    """
    from ..arrowutil import one_chunk

    def fn(t: pa.Table) -> pa.Table:
        col = one_chunk(t["embedding"])
        n = len(col)
        if n == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"vec_id": z, "i": z, "q": z,
                             "min_milli": z, "range_milli": z})
        dim = len(col[0])
        vm = np.floor(np.asarray(col.flatten(), dtype=np.float64)
                      * 1000.0).astype(np.int64).reshape(n, dim)
        mn = vm.min(axis=1)
        rng = vm.max(axis=1) - mn
        safe = np.where(rng == 0, 1, rng)
        q = (vm - mn[:, None]) * levels // safe[:, None]
        q[rng == 0] = 0
        ids = np.asarray(one_chunk(t["vec_id"])).astype(np.int64)
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, dim)),
            "i": pa.array(np.tile(np.arange(dim, dtype=np.int64), n)),
            "q": pa.array(q.ravel()),
            "min_milli": pa.array(np.repeat(mn, dim)),
            "range_milli": pa.array(np.repeat(rng, dim))})

    return embeddings.map_batches(fn, batch_format="pyarrow")


def label_scatter_components(embeddings):
    """Per-(label, dimension) scatter moments of the milli-quantized
    embeddings — (n, s = Σv, ss = Σv²) exact int64: the sufficient
    statistics for within/between-class scatter (Fisher discriminant,
    silhouette baselines, per-class whitening) without a single float
    crossing the wire.  Returns (label, i, n, s, ss).

    Per batch the list column unpacks once and collapses to one moment
    row per (label, dim) — the exchange is |labels| × dim rows per
    batch, ONE groupby Sum merges.
    """
    from ray.data.aggregate import Sum

    from ..arrowutil import one_chunk

    def fn(t: pa.Table) -> pa.Table:
        col = one_chunk(t["embedding"])
        n = len(col)
        z = pa.array([], type=pa.int64())
        if n == 0:
            return pa.table({"label": z, "i": z, "n": z, "s": z,
                             "ss": z})
        dim = len(col[0])
        vm = np.floor(np.asarray(col.flatten(), dtype=np.float64)
                      * 1000.0).astype(np.int64).reshape(n, dim)
        lab = np.asarray(one_chunk(t["label"])).astype(np.int64)
        uniq, inv = np.unique(lab, return_inverse=True)
        k = len(uniq)
        cnt = np.bincount(inv, minlength=k).astype(np.int64)
        s = np.zeros((k, dim), dtype=np.int64)
        ss = np.zeros((k, dim), dtype=np.int64)
        np.add.at(s, inv, vm)
        np.add.at(ss, inv, vm * vm)
        return pa.table({
            "label": pa.array(np.repeat(uniq, dim)),
            "i": pa.array(np.tile(np.arange(dim, dtype=np.int64), k)),
            "n": pa.array(np.repeat(cnt, dim)),
            "s": pa.array(s.ravel()),
            "ss": pa.array(ss.ravel())})

    return (embeddings.map_batches(fn, batch_format="pyarrow")
            .groupby(["label", "i"])
            .aggregate(Sum("n", alias_name="n"),
                       Sum("s", alias_name="s"),
                       Sum("ss", alias_name="ss")))


def contrastive_negatives(embeddings, k: int = 4):
    """Deterministic negative sampling for contrastive training — for
    every vector, ``k`` pseudo-random partner ids drawn by the repo's
    SQL-recomputable md5 stream, skipping self by arithmetic (not
    rejection, so both engines agree without a loop):
    ``raw = md5_u64(id:j) % (N−1)``, ``neg = raw + (raw ≥ id)``.
    Returns (vec_id, neg_rank, neg_id).

    N comes from one count; the sampling is a pure map after that —
    negatives at corpus scale are exactly this cheap when the id space
    is dense (re-index through :mod:`..stages.export` sharding first
    when it isn't).
    """
    from .corpus import md5_u64
    from ..arrowutil import one_chunk

    n_total = embeddings.count()
    if n_total < 2:
        raise ValueError("contrastive_negatives: need ≥ 2 vectors")

    def fn(t: pa.Table) -> pa.Table:
        ids = np.asarray(one_chunk(t["vec_id"])).astype(np.int64)
        m = len(ids)
        out_id = np.repeat(ids, k)
        ranks = np.tile(np.arange(k, dtype=np.int64), m)
        keys = np.char.add(np.char.add(
            out_id.astype(str), ":"), ranks.astype(str))
        raw = (md5_u64(keys.astype(object))
               % np.uint64(n_total - 1)).astype(np.int64)
        neg = raw + (raw >= out_id)
        return pa.table({"vec_id": pa.array(out_id),
                         "neg_rank": pa.array(ranks),
                         "neg_id": pa.array(neg)})

    return embeddings.map_batches(fn, batch_format="pyarrow")


def _quant_milli(col) -> np.ndarray:
    """(n, dim) int64 matrix: ``floor(x·1000)`` on the float64 grid —
    the repo's embedding quantization contract (SQL:
    ``CAST(floor(x::DOUBLE * 1000) AS BIGINT)``)."""
    m = _stack(col).astype(np.float64)
    return np.floor(m * 1000.0).astype(np.int64)


def _log2_buckets(d2: np.ndarray) -> pa.Table:
    """(d2_bucket, n_p) partial histogram with the exact integer bucket
    ``bit_length(1 + d2) − 1`` (matches SQL ``length(printf('%b', d2
    + 1)) - 1``) — bit-exact, no float log anywhere."""
    if len(d2) == 0:
        return pa.table({"d2_bucket": pa.array([], type=pa.int64()),
                         "n_p": pa.array([], type=pa.int64())})
    buckets = np.frompyfunc(lambda v: int(v + 1).bit_length() - 1,
                            1, 1)(d2).astype(np.int64)
    vals, counts = np.unique(buckets, return_counts=True)
    return pa.table({"d2_bucket": pa.array(vals.astype(np.int64)),
                     "n_p": pa.array(counts.astype(np.int64))})


def adjacent_vec_distance_histogram(embeddings):
    """Log₂-bucketed histogram of quantized L2² distances between
    KEY-consecutive vectors (vec_id, vec_id+1) — the cheap drift probe
    over an embedding column (consecutive ids come from the same
    producer batch; a distance-regime change flags an encoder or
    upstream-order incident).  Returns (d2_bucket, n_pairs).

    ONE range sort on vec_id; interior pairs resolve in-block with a
    vectorized (n−1, dim) diff; each block ships its first and last
    (id, quantized vector, role) rows to a single stitch block — the
    2×#blocks sorted-adjacency contract.  Role tags (first vs last)
    make the stitch pair ONLY cross-block neighbors (a 2-row block's
    own first/last pair was already counted in-block).  Ids that are
    not consecutive pair with nothing (join semantics).
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..arrowutil import one_chunk

    srt = embeddings.select_columns(["vec_id", "embedding"]) \
        .sort("vec_id").materialize()

    def block_pairs(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table({
                "d2_bucket": pa.array([], type=pa.int64()),
                "n_p": pa.array([], type=pa.int64()),
                "_edge": pa.array([], type=pa.bool_()),
                "_role": pa.array([], type=pa.int64()),
                "_id": pa.array([], type=pa.int64()),
                "_q": pa.array([], type=pa.list_(pa.int64()))})
        ids = np.asarray(one_chunk(t["vec_id"])).astype(np.int64)
        q = _quant_milli(t["embedding"])
        if n > 1:
            consec = ids[1:] - ids[:-1] == 1
            diffs = q[1:] - q[:-1]
            d2 = (diffs * diffs).sum(axis=1)[consec]
        else:
            d2 = np.zeros(0, dtype=np.int64)
        hist = _log2_buckets(d2)
        m = hist.num_rows
        out = pa.table({
            "d2_bucket": hist["d2_bucket"],
            "n_p": hist["n_p"],
            "_edge": pa.array(np.zeros(m, bool)),
            "_role": pa.nulls(m, pa.int64()),
            "_id": pa.nulls(m, pa.int64()),
            "_q": pa.nulls(m, pa.list_(pa.int64()))})
        # carries: first row faces the previous block (role 0), last row
        # faces the next (role 1); a 1-row block emits both roles
        e_idx = np.array([0, n - 1], dtype=np.int64)
        e_role = np.array([0, 1], dtype=np.int64)
        edge = pa.table({
            "d2_bucket": pa.nulls(2, pa.int64()),
            "n_p": pa.nulls(2, pa.int64()),
            "_edge": pa.array(np.ones(2, bool)),
            "_role": pa.array(e_role),
            "_id": pa.array(ids[e_idx]),
            "_q": pa.array(list(q[e_idx]), type=pa.list_(pa.int64()))})
        return pa.concat_tables([out, edge])

    mixed = srt.map_batches(block_pairs, batch_format="pyarrow",
                            batch_size=None).materialize()
    interior = mixed.map_batches(
        lambda t: t.filter(pc.equal(t["_edge"], False))
        .select(["d2_bucket", "n_p"]), batch_format="pyarrow")

    def stitch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"d2_bucket": pa.array([], type=pa.int64()),
                             "n_p": pa.array([], type=pa.int64())})
        ids = np.asarray(one_chunk(t["_id"])).astype(np.int64)
        roles = np.asarray(one_chunk(t["_role"])).astype(np.int64)
        qs = _stack(t["_q"]).astype(np.int64)
        order = np.lexsort((roles, ids))
        ids, roles, qs = ids[order], roles[order], qs[order]
        # a cross-block neighbor pair is (block-LAST, next block-FIRST):
        # left role 1, right role 0, ids consecutive
        left = (ids[1:] - ids[:-1] == 1) & (roles[:-1] == 1) \
            & (roles[1:] == 0)
        diffs = qs[1:][left] - qs[:-1][left]
        d2 = (diffs * diffs).sum(axis=1) if diffs.size else \
            np.zeros(0, dtype=np.int64)
        return _log2_buckets(d2)

    carries = mixed.map_batches(
        lambda t: t.filter(t["_edge"]).select(["_id", "_role", "_q"]),
        batch_format="pyarrow").repartition(1)
    return (interior.union(
        carries.map_batches(stitch, batch_format="pyarrow",
                            batch_size=None))
        .groupby("d2_bucket")
        .aggregate(Sum("n_p", alias_name="n_pairs")))


def label_norm_stats(embeddings):
    """Per-label quantized-norm² statistics
    (label, n_vecs, min_norm2, max_norm2, sum_norm2) — the embedding
    health scorecard (collapsed or exploding norms per class are the
    first sign of a bad encoder checkpoint).  One combiner groupby on
    the milli grid; integers end to end.
    """
    from ray.data.aggregate import Max, Min, Sum

    from ..arrowutil import one_chunk

    def partial(t: pa.Table) -> pa.Table:
        q = _quant_milli(t["embedding"])
        n2 = (q * q).sum(axis=1)
        g = pa.table({
            "label": pc_cast_label(one_chunk(t["label"])),
            "n2": pa.array(n2)}) \
            .group_by("label").aggregate(
                [([], "count_all"), ("n2", "min"), ("n2", "max"),
                 ("n2", "sum")])
        return pa.table({"label": g["label"],
                         "c_p": g["count_all"].cast(pa.int64()),
                         "mn_p": g["n2_min"],
                         "mx_p": g["n2_max"],
                         "s_p": g["n2_sum"].cast(pa.int64())})

    return (embeddings.select_columns(["label", "embedding"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("label")
            .aggregate(Sum("c_p", alias_name="n_vecs"),
                       Min("mn_p", alias_name="min_norm2"),
                       Max("mx_p", alias_name="max_norm2"),
                       Sum("s_p", alias_name="sum_norm2")))


def pc_cast_label(col: pa.Array) -> pa.Array:
    """label column as int64 regardless of stored width."""
    import pyarrow.compute as pc
    return pc.cast(col, pa.int64())


def dim_stats(embeddings):
    """Dimension-wise scorecard on the quantized grid: per dimension
    (dim, n, sum_milli, sumsq_millisq, is_dead) — dead (zero-variance)
    dimensions are the first diagnostic on an encoder checkpoint.
    Variance derives from the exact (n, Σ, Σ²) integers caller-side.

    Per batch one (n×dim) quantized matrix folds to ≤ dim partial
    rows; one groupby(dim) merges.  Vectors never shuffle.
    """
    from ray.data.aggregate import Max, Min, Sum

    def partial(t: pa.Table) -> pa.Table:
        q = _quant_milli(t["embedding"])
        n, d = q.shape if q.size else (0, 0)
        if n == 0:
            return pa.table({
                "dim": pa.array([], type=pa.int64()),
                "n_p": pa.array([], type=pa.int64()),
                "s_p": pa.array([], type=pa.int64()),
                "ss_p": pa.array([], type=pa.int64()),
                "mn_p": pa.array([], type=pa.int64()),
                "mx_p": pa.array([], type=pa.int64())})
        return pa.table({
            "dim": pa.array(np.arange(d, dtype=np.int64)),
            "n_p": pa.array(np.full(d, n, dtype=np.int64)),
            "s_p": pa.array(q.sum(axis=0).astype(np.int64)),
            "ss_p": pa.array((q * q).sum(axis=0).astype(np.int64)),
            "mn_p": pa.array(q.min(axis=0).astype(np.int64)),
            "mx_p": pa.array(q.max(axis=0).astype(np.int64))})

    def finalize(t: pa.Table) -> pa.Table:
        from ..arrowutil import one_chunk
        mn = np.asarray(one_chunk(t["min_milli"]))
        mx = np.asarray(one_chunk(t["max_milli"]))
        return t.append_column(
            "is_dead", pa.array((mn == mx).astype(np.int64)))

    return (embeddings.select_columns(["embedding"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("dim")
            .aggregate(Sum("n_p", alias_name="n"),
                       Sum("s_p", alias_name="sum_milli"),
                       Sum("ss_p", alias_name="sumsq_millisq"),
                       Min("mn_p", alias_name="min_milli"),
                       Max("mx_p", alias_name="max_milli"))
            .map_batches(finalize, batch_format="pyarrow"))
