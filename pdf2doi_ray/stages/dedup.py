"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Designed for the 100 TB shape:

* **exact**: content-hash per batch (vectorized md5) → per-batch partial
  ``min(doc_id)`` per hash (combiner) → one small ``groupby(hash)`` — the
  shuffle moves one row per distinct hash per batch, never the documents.
* **minhash_lsh**: shingle → k minhashes (vectorized numpy, one matrix op
  per batch) → explode to (band, band_hash) bucket rows → bucket groupby →
  candidate pairs → exact n-gram Jaccard verification per pair.  Only bucket
  keys and candidate pairs shuffle; documents never do.
* **simhash**: 64-bit simhash per document from token hashes (vectorized).

All hashing is deterministic (no process-salted ``hash()``): token/shingle
hashes use blake2b-derived 64-bit integers, so every run and every worker
produces identical output.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

N_HASHES = 64
N_BANDS = 16
ROWS_PER_BAND = N_HASHES // N_BANDS

# deterministic affine minhash family over a 32-bit domain: coefficients are
# bounded so a*x + b stays inside uint64 and the whole (k × |shingles|)
# multiply-mod runs as native vectorized numpy (no Python bigints)
_P32 = np.uint64(4294967311)          # prime > 2^32
_rng = np.random.RandomState(42)
_A = _rng.randint(1, 2**31 - 1, size=N_HASHES).astype(np.uint64)
_B = _rng.randint(0, 2**31 - 1, size=N_HASHES).astype(np.uint64)


def _stable64(token: str) -> int:
    """Deterministic 63-bit token hash (blake2b truncation)."""
    return int.from_bytes(hashlib.blake2b(token.encode("utf-8"),
                                          digest_size=8).digest(), "big") >> 1


def shingles(text: str, n: int = 3) -> set[int]:
    """Hashed word n-gram shingle set."""
    words = text.split()
    if len(words) < n:
        return {_stable64(" ".join(words))} if words else set()
    return {_stable64(" ".join(words[i:i + n]))
            for i in range(len(words) - n + 1)}


def minhash_signature(sh: set[int]) -> np.ndarray:
    """k minhashes of a shingle set in one (k × |sh|) uint64 matrix op.

    Shingle hashes are folded to 32 bits so ``a*x + b < 2^63`` — the whole
    family evaluates vectorized in native numpy."""
    if not sh:
        return np.full(N_HASHES, np.iinfo(np.int64).max, dtype=np.int64)
    v = (np.fromiter(sh, dtype=np.uint64, count=len(sh))
         & np.uint64(0xFFFFFFFF))
    m = (_A[:, None] * v[None, :] + _B[:, None]) % _P32
    return m.min(axis=1).astype(np.int64)


def band_rows(doc_id: int, sig: np.ndarray):
    """LSH bucket rows: one (band, digest-of-band) pair per band."""
    out = []
    for b in range(N_BANDS):
        seg = sig[b * ROWS_PER_BAND:(b + 1) * ROWS_PER_BAND]
        digest = hashlib.blake2b(seg.tobytes(), digest_size=8).hexdigest()
        out.append((doc_id, b, digest))
    return out


def jaccard(a: set[int], b: set[int]) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


# ---------------------------------------------------------------------------
# Dataset-level operators
# ---------------------------------------------------------------------------

def dedup_exact(docs):
    """Exact dedup survivors: min ``doc_id`` per content hash.

    Combiner-first: per-batch min per hash inside ``map_batches``, then a
    small groupby over the partials (reference has no cross-document dedup;
    this guards re-processed partitions on resume, SURVEY §2.7).
    """
    from ray.data.aggregate import Min

    from .textstats import fingerprint

    def partial(t: pa.Table) -> pa.Table:
        f = fingerprint(t)
        g = f.group_by("text_hash").aggregate([("doc_id", "min")])
        return g.select(["text_hash", "doc_id_min"]) \
            .rename_columns(["text_hash", "doc_id"])

    return (docs.map_batches(partial, batch_format="pyarrow")
            .groupby("text_hash")
            .aggregate(Min("doc_id", alias_name="doc_id")))


def minhash_bucket_rows(docs, n_shingle: int = 3):
    """documents → (doc_id, band, digest) LSH bucket rows."""
    def to_bands(t: pa.Table) -> pa.Table:
        ids, bands, digests = [], [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            sig = minhash_signature(shingles(text, n_shingle))
            for d, b, h in band_rows(doc_id, sig):
                ids.append(d)
                bands.append(b)
                digests.append(h)
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "band": pa.array(bands, type=pa.int64()),
                         "digest": pa.array(digests, type=pa.string())})

    return docs.map_batches(to_bands, batch_format="pyarrow")


def minhash_candidate_pairs(docs, n_shingle: int = 3):
    """Near-duplicate candidate pairs from LSH buckets (doc_a < doc_b),
    deduplicated across bands."""
    import pandas as pd

    buckets = minhash_bucket_rows(docs, n_shingle)

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(group["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64")})
        out_a, out_b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out_a.append(ids[i])
                out_b.append(ids[j])
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b})

    cand = buckets.groupby(["band", "digest"]).map_groups(
        pairs, batch_format="pandas")
    # same pair can surface from several bands — dedup on the pair key
    from ray.data.aggregate import Count

    return (cand.groupby(["doc_a", "doc_b"])
            .aggregate(Count(alias_name="n_bands")))


def minhash_near_dups(docs, threshold_permille: int = 800, n_shingle: int = 3):
    """Verified near-duplicate pairs: candidates whose EXACT n-gram Jaccard
    (recomputed on the real shingle sets) clears ``threshold_permille``.

    The verify step broadcasts nothing: it re-reads only the candidate docs'
    texts via a small semi-join (candidate sets are tiny next to the corpus).
    Output is integer-only (jaccard in permille) for hash-stable comparison.
    """
    import ray

    cand = minhash_candidate_pairs(docs, n_shingle).to_pandas()
    if len(cand) == 0:
        return pa.table({"doc_a": pa.array([], type=pa.int64()),
                         "doc_b": pa.array([], type=pa.int64()),
                         "jaccard_permille": pa.array([], type=pa.int64())})
    needed = set(cand["doc_a"]) | set(cand["doc_b"])
    needed_ref = ray.put(needed)

    def keep(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].combine_chunks())
        mask = np.isin(ids, np.fromiter(ray.get(needed_ref), dtype=np.int64))
        return t.filter(pa.array(mask))

    texts = {r["doc_id"]: r["text"]
             for r in docs.map_batches(keep, batch_format="pyarrow")
                          .select_columns(["doc_id", "text"]).take_all()}
    rows_a, rows_b, jac = [], [], []
    for a, b in zip(cand["doc_a"], cand["doc_b"]):
        j = jaccard(shingles(texts[int(a)], n_shingle),
                    shingles(texts[int(b)], n_shingle))
        jp = int(round(j * 1000))
        if jp >= threshold_permille:
            rows_a.append(int(a))
            rows_b.append(int(b))
            jac.append(jp)
    return pa.table({"doc_a": pa.array(rows_a, type=pa.int64()),
                     "doc_b": pa.array(rows_b, type=pa.int64()),
                     "jaccard_permille": pa.array(jac, type=pa.int64())})


def wordset_jaccard_adjacent(docs):
    """Word-set Jaccard between each doc and its successor (doc_id+1) — the
    standalone n-gram-Jaccard scorer over a deterministic pair set.

    The pair side is tiny by construction, so it rides along as a broadcast
    dict (``ray.put``) and each batch scores its own rows — a broadcast
    self-join, no shuffle.  Output is integer permille (floor) for
    hash-stable oracle comparison.
    """
    import ray

    # single-space split, empties kept — exactly string_split(text, ' ') in
    # the SQL oracle (str.split() would collapse whitespace runs)
    rows = docs.select_columns(["doc_id", "text"]).take_all()
    words = {r["doc_id"]: set(r["text"].split(" ")) for r in rows}
    ref = ray.put(words)

    def score(t: pa.Table) -> pa.Table:
        w = ray.get(ref)
        ids, jac = [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(),
                                t["text"].to_pylist()):
            nxt = w.get(doc_id + 1)
            if nxt is None:
                continue
            a = set(text.split(" "))
            inter = len(a & nxt)
            union = len(a) + len(nxt) - inter
            ids.append(doc_id)
            jac.append((1000 * inter) // union if union else 1000)
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "jaccard_next_permille": pa.array(jac, type=pa.int64())})

    return docs.map_batches(score, batch_format="pyarrow")


def simhash64(text: str) -> int:
    """63-bit simhash over whitespace tokens (deterministic, vectorized:
    one ``unpackbits`` + column sum per document)."""
    toks = text.split()
    if not toks:
        return 0
    digest = b"".join(hashlib.blake2b(tok.encode("utf-8"),
                                      digest_size=8).digest() for tok in toks)
    bits = np.unpackbits(np.frombuffer(digest, dtype=np.uint8))
    acc = (2 * bits.reshape(len(toks), 64).astype(np.int64) - 1).sum(axis=0)
    weights = np.left_shift(np.uint64(1), np.arange(64, dtype=np.uint64))
    val = int(((acc > 0).astype(np.uint64) * weights).sum(dtype=np.uint64))
    return val >> 1          # 63 bits → fits arrow int64


def simhash_table(docs):
    def per_batch(t: pa.Table) -> pa.Table:
        vals = [simhash64(x) for x in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"],
                         "simhash": pa.array(vals, type=pa.int64())})

    return docs.map_batches(per_batch, batch_format="pyarrow")
