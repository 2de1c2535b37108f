"""Corpus-level training-data operators: deterministic sampling, train/test
splitting, keep-best exact dedup, corpus top-k n-grams, and TF-IDF term
scoring.

Everything here follows the repo's scale rules:

* per-batch kernels are vectorized (pyarrow.compute / numpy) — the only
  per-row Python is md5 hashing (same as :mod:`.textstats.fingerprint`);
* wide steps pre-aggregate inside ``map_batches`` before any shuffle, so a
  ``groupby`` only ever sees combiner output (one row per distinct key per
  batch), never raw corpus rows;
* global top-k uses the bounded-partial pattern (≤k rows per block to the
  driver) instead of a global sort;
* argmax-per-group runs as a plain ``Min``/``Max`` aggregate over an
  order-preserving encoded key — no per-group Python reducers;
* integer-only outputs (counts, permille buckets, scaled scores) so the
  DuckDB oracles hash-match exactly — no accumulated floats.

Tokenization matches the repo-wide SQL convention: single-space
``string_split`` with empty tokens dropped
(``list_filter(string_split(text, ' '), x -> x <> '')``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..arrowutil import one_chunk

# Knuth multiplicative hash constant (2^32 / phi).  The bucket is a pure
# function of doc_id, so the same sampling/split decision is reproducible
# across runs, engines, and the SQL oracle:
#   bucket = ((doc_id mod 2^32) * 2654435761 mod 2^32) mod buckets
# The mod-2^32 pre-fold keeps the product below 2^64 (uint64-exact in numpy;
# HUGEINT in the oracle), so there is no wraparound disagreement at any id.
HASH_MULT = 2654435761
HASH_BUCKETS = 1000


def knuth_hash32(ids) -> np.ndarray:
    """The shared Knuth fold: ((id mod 2^32) · HASH_MULT) mod 2^32 as
    uint64.  Every deterministic sampling/sharding decision in the repo
    (and its SQL mirrors) derives from THIS arithmetic — change it here
    and in the oracles together, nowhere else."""
    arr = np.asarray(ids.combine_chunks() if isinstance(ids, pa.ChunkedArray)
                     else ids).astype(np.uint64)
    return ((arr % np.uint64(2**32)) * np.uint64(HASH_MULT)) \
        % np.uint64(2**32)


def hash_bucket(ids, buckets: int = HASH_BUCKETS) -> np.ndarray:
    """Vectorized deterministic permille bucket of an int64 id column."""
    return (knuth_hash32(ids) % np.uint64(buckets)).astype(np.int64)


def hash_sample(docs, keep_permille: int = 125):
    """Deterministic corpus sample: keep rows whose hash bucket falls below
    ``keep_permille``.  A pure filter — streams, never shuffles, and the
    same rows survive on every run at any parallelism (unlike
    ``Dataset.random_sample``).  Returns (doc_id, bucket)."""
    def pick(t: pa.Table) -> pa.Table:
        b = hash_bucket(t["doc_id"])
        mask = b < keep_permille
        return pa.table({
            "doc_id": t["doc_id"].filter(pa.array(mask)),
            "bucket": pa.array(b[mask], type=pa.int64()),
        })

    return docs.map_batches(pick, batch_format="pyarrow")


def train_test_split_stats(docs, train_permille: int = 900):
    """Deterministic hash split into train/test plus per-(lang, split)
    counts.  Per-batch combiner (one arrow group_by per batch) then a
    ``groupby`` over ≤ 2·|langs| combiner rows per batch — the shuffle
    volume is independent of corpus size.  Returns (lang, split, n_docs)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        b = hash_bucket(t["doc_id"])
        split = np.where(b < train_permille, "train", "test")
        g = pa.table({
            "lang": t["lang"],
            "split": pa.array(split, type=pa.string()),
        }).group_by(["lang", "split"]).aggregate([([], "count_all")])
        return pa.table({
            "lang": g["lang"],
            "split": g["split"],
            "n_partial": g["count_all"].cast(pa.int64()),
        })

    return (docs.map_batches(partial, batch_format="pyarrow")
            .groupby(["lang", "split"])
            .aggregate(Sum("n_partial", alias_name="n_docs")))


def md5_u64(strings) -> np.ndarray:
    """First 8 md5 digest bytes big-endian as uint64 — the repo's
    SQL-recomputable string hash (DuckDB: ``('0x' ||
    substr(md5(x), 1, 16))::UBIGINT``).  Hashes each DISTINCT value
    once: web keys (hosts, sources) are zipfian, so the per-row Python
    md5 loop runs on the small unique set, and results scatter back
    through the ``np.unique`` inverse."""
    import hashlib

    vals = np.asarray(strings.to_numpy(zero_copy_only=False)
                      if hasattr(strings, "to_numpy") else strings,
                      dtype=object)
    uniq, inv = np.unique(vals, return_inverse=True)
    hv = np.fromiter(
        (int.from_bytes(hashlib.md5(u.encode("utf-8")).digest()[:8],
                        "big") for u in uniq),
        dtype=np.uint64, count=len(uniq))
    return hv[inv]


def group_split_stats(docs, group_col: str = "source",
                      train_permille: int = 900):
    """Leakage-safe train/test split: ALL rows sharing ``group_col``
    (host, source, domain) land in the same split — the contamination
    guard a document-level hash split (:func:`train_test_split_stats`)
    cannot give, since near-identical pages from one site would straddle
    the boundary.  Split = md5(group) mod 1000 vs ``train_permille``;
    md5 hashes only the batch's distinct groups (see :func:`md5_u64`).

    Same combiner-first shape as the doc-level split: one arrow
    ``group_by`` per batch, then a groupby over ≤ 2·|langs| partial rows
    per batch.  Returns (lang, split, n_docs).
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        b = (md5_u64(one_chunk(t[group_col])) % np.uint64(1000)) \
            .astype(np.int64)
        split = np.where(b < train_permille, "train", "test")
        g = pa.table({
            "lang": t["lang"],
            "split": pa.array(split, type=pa.string()),
        }).group_by(["lang", "split"]).aggregate([([], "count_all")])
        return pa.table({
            "lang": g["lang"],
            "split": g["split"],
            "n_partial": g["count_all"].cast(pa.int64()),
        })

    return (docs.map_batches(partial, batch_format="pyarrow")
            .groupby(["lang", "split"])
            .aggregate(Sum("n_partial", alias_name="n_docs")))


# keep-best encoding widths: n_chars zero-padded to 12 digits, doc_id stored
# as a 16-digit zero-padded complement (10^15 - doc_id) so that the
# lexicographic MAX of the encoded string is (max n_chars, then MIN doc_id)
# — argmax-per-group as a plain string Max aggregate, no per-group Python.
_KB_NCHARS_W = 12
_KB_ID_BASE = 10**15
_KB_ID_W = 16


def _keep_best_encode(n_chars, doc_id) -> pa.Array:
    nc = pc.ascii_lpad(pc.cast(n_chars, pa.string()), _KB_NCHARS_W, "0")
    comp = pc.subtract(pa.scalar(_KB_ID_BASE, type=pa.int64()),
                       pc.cast(doc_id, pa.int64()))
    cid = pc.ascii_lpad(pc.cast(comp, pa.string()), _KB_ID_W, "0")
    return pc.binary_join_element_wise(nc, cid, "")


def dedup_keep_best(docs):
    """Exact dedup that keeps the BEST copy per content hash — max
    ``n_chars``, ties to the smallest ``doc_id`` — instead of
    :func:`.dedup.dedup_exact`'s first-id rule (a training pipeline usually
    wants the longest/cleanest duplicate, not an arbitrary one).

    Per-batch combiner picks one candidate per hash per batch, so the
    shuffle carries ≤ one row per distinct hash per batch; the global argmax
    is a plain ``Max`` over an order-preserving string encoding (widths
    documented above: n_chars < 10^12, doc_id < 10^15 — both far beyond any
    real corpus row).  Returns (text_hash, doc_id, n_chars)."""
    from ray.data.aggregate import Max

    def partial(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        digests = np.array([hashlib.md5(s.encode("utf-8")).hexdigest()
                            for s in texts], dtype=object)
        enc = np.asarray(_keep_best_encode(t["n_chars"], t["doc_id"])
                         .to_pylist(), dtype=object)
        # best-per-hash within the batch: sort by encoded key descending,
        # keep the first occurrence of each hash
        order = np.argsort(enc, kind="stable")[::-1]
        _, first = np.unique(digests[order], return_index=True)
        keep = order[np.sort(first)]
        return pa.table({
            "text_hash": pa.array(digests[keep], type=pa.string()),
            "enc": pa.array(enc[keep], type=pa.string()),
        })

    def decode(t: pa.Table) -> pa.Table:
        nc = pc.cast(pc.utf8_slice_codeunits(t["enc"], 0, _KB_NCHARS_W),
                     pa.int64())
        comp = pc.cast(pc.utf8_slice_codeunits(
            t["enc"], _KB_NCHARS_W, _KB_NCHARS_W + _KB_ID_W), pa.int64())
        doc_id = pc.subtract(pa.scalar(_KB_ID_BASE, type=pa.int64()), comp)
        return pa.table({"text_hash": t["text_hash"], "doc_id": doc_id,
                         "n_chars": nc})

    return (docs.map_batches(partial, batch_format="pyarrow")
            .groupby("text_hash").aggregate(Max("enc", alias_name="enc"))
            .map_batches(decode, batch_format="pyarrow"))


def _tokens_nonempty(t: pa.Table):
    """Flattened nonempty tokens + their row index (doc position in batch).

    Returns (flat_tokens: pa.Array, row_idx: np.ndarray)."""
    toks = pc.split_pattern(
        t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray)
        else t["text"], " ")
    flat = toks.flatten()
    lengths = np.asarray(pc.list_value_length(toks).fill_null(0))
    row_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), lengths)
    mask = np.asarray(pc.not_equal(flat, ""))
    keep = pa.array(mask)
    return flat.filter(keep), row_idx[mask]


def top_bigrams(docs, k: int = 20):
    """Corpus-level top-k adjacent-token bigrams, (count desc, bigram asc).

    Bigram emission is fully vectorized: tokens flatten once, empty tokens
    drop with a boolean mask, and a bigram exists at every flat position
    whose neighbor belongs to the same document (one numpy comparison + one
    Arrow element-wise string join over zero-copy slices).  A per-batch
    arrow group_by combines duplicates before the shuffle, the global
    ``groupby(bigram)`` sums combiner rows, and the final top-k uses the
    bounded-partial pattern (≤k rows per block to the driver) — no global
    sort at any corpus size.  Returns pandas (rank, bigram, n_occurrences).
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        flat, row_idx = _tokens_nonempty(t)
        if len(flat) < 2:
            return pa.table({"bigram": pa.array([], type=pa.string()),
                             "n_partial": pa.array([], type=pa.int64())})
        same_doc = row_idx[1:] == row_idx[:-1]
        joined = pc.binary_join_element_wise(
            flat.slice(0, len(flat) - 1), flat.slice(1), " ")
        bigrams = joined.filter(pa.array(same_doc))
        g = pa.table({"bigram": bigrams}).group_by("bigram").aggregate(
            [([], "count_all")])
        return pa.table({"bigram": g["bigram"],
                         "n_partial": g["count_all"].cast(pa.int64())})

    def block_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values(["n_occurrences", "bigram"],
                            ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = (docs.map_batches(partial, batch_format="pyarrow")
             .groupby("bigram").aggregate(Sum("n_partial",
                                              alias_name="n_occurrences"))
             .map_batches(block_topk, batch_format="pyarrow",
                          batch_size=None)
             .to_pandas())
    if "bigram" not in parts.columns:    # fully-empty input -> schemaless
        parts = pd.DataFrame({"bigram": pd.Series(dtype=object),
                              "n_occurrences": pd.Series(dtype="int64")})
    parts = parts.sort_values(["n_occurrences", "bigram"],
                              ascending=[False, True]).head(k)
    return pd.DataFrame({
        "rank": np.arange(1, len(parts) + 1, dtype=np.int64),
        "bigram": parts["bigram"].to_numpy(),
        "n_occurrences": parts["n_occurrences"].to_numpy(),
    })


def weighted_sample(docs, weight_cap: int = 200):
    """Deterministic importance sampling: keep each document with
    probability ``min(n_tokens, weight_cap) / weight_cap`` — longer
    documents survive proportionally more often (the usual quality-biased
    mix for a training corpus), yet the decision is a pure function of
    ``doc_id`` so every run, engine, and the SQL oracle keep the SAME
    rows.

    Bernoulli draw without an RNG: the Knuth hash of ``doc_id`` is
    uniform on [0, 2^32); keep when ``hash % weight_cap < min(n_tokens,
    weight_cap)`` (hash mod is uniform because 2^32 mod weight_cap bias is
    < 2^-24 for small caps — and irrelevant here since both engines
    compute the identical expression).  A pure streaming filter: no
    shuffle, no state.  Returns (doc_id, n_tokens, weight).
    """
    def pick(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(
            t["text"].combine_chunks()
            if isinstance(t["text"], pa.ChunkedArray) else t["text"], " ")
        n_tok = np.asarray(pc.list_value_length(toks).cast(pa.int64()))
        w = np.minimum(n_tok, weight_cap)
        h = knuth_hash32(t["doc_id"]).astype(np.int64)
        keep = (h % weight_cap) < w
        return pa.table({
            "doc_id": t["doc_id"].filter(pa.array(keep)),
            "n_tokens": pa.array(n_tok[keep], type=pa.int64()),
            "weight": pa.array(w[keep], type=pa.int64()),
        })

    return docs.map_batches(pick, batch_format="pyarrow")


def uniform_sample_k(docs, k: int = 25):
    """Exactly-k deterministic uniform sample: the k rows with the smallest
    Knuth hash of ``doc_id`` (ties broken by id).

    The bounded-partial top-k pattern of
    :func:`.textstats.top_docs_by_tokens` applied to a hash priority —
    equivalent to a uniform sample without replacement, but reproducible
    across runs, engines, and the SQL oracle, and computed without a
    shuffle: each batch forwards only its own ≤k smallest-priority rows and
    the driver merges the tiny partials.  (Contrast
    :func:`hash_sample`, which keeps a *fraction*; this keeps a *count*.)
    Returns (rank, doc_id, priority)."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].combine_chunks()
                         if isinstance(t["doc_id"], pa.ChunkedArray)
                         else t["doc_id"])
        h = knuth_hash32(t["doc_id"]).astype(np.int64)
        order = np.lexsort((ids, h))[:k]
        return pa.table({"doc_id": pa.array(ids[order], type=pa.int64()),
                         "priority": pa.array(h[order], type=pa.int64())})

    parts = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    if "doc_id" not in parts.columns:    # fully-empty input -> schemaless
        parts = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                              "priority": pd.Series(dtype="int64")})
    parts = parts.sort_values(["priority", "doc_id"]).head(k)
    return pd.DataFrame({
        "rank": np.arange(1, len(parts) + 1, dtype=np.int64),
        "doc_id": parts["doc_id"].to_numpy(),
        "priority": parts["priority"].to_numpy(),
    })


def weighted_sample_k(docs, weight_col: str, k: int = 25):
    """Exactly-k deterministic WEIGHTED sample: the k rows with the
    smallest ``hash_priority // weight`` (ties broken by id) — heavier
    rows draw smaller priorities and enter the sample more often, the
    quality-weighted data-selection step of a training-mix pipeline.

    Priority arithmetic (int64-exact, SQL-mirrorable): ``pri =
    (knuth32(doc_id) * 1000) // max(weight, 1)`` with non-positive-weight
    rows excluded — a bottom-k on U/w priorities (Efraimidis–Spirakis
    STYLE: inclusion probability is monotone in weight and the scheme is
    reproducible across runs/engines, but priorities are uniform rather
    than exponential, so it is NOT distributionally identical to A-ES
    u^(1/w) sampling; callers needing exact A-ES inclusion probabilities
    accept floats and lose the oracle).  Same bounded-partial plan as
    :func:`uniform_sample_k`: each batch forwards its ≤k best rows, the
    driver merges tiny partials, no shuffle.  Returns
    (rank, doc_id, weight, priority).
    """
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].combine_chunks()
                         if isinstance(t["doc_id"], pa.ChunkedArray)
                         else t["doc_id"])
        w = np.asarray(t[weight_col].combine_chunks()
                       if isinstance(t[weight_col], pa.ChunkedArray)
                       else t[weight_col]).astype(np.int64)
        keep = w > 0
        ids, w = ids[keep], w[keep]
        h = knuth_hash32(pa.array(ids, type=pa.int64())).astype(np.int64)
        pri = (h * 1000) // w          # h < 2^32 ⇒ h·1000 < 2^42: exact
        order = np.lexsort((ids, pri))[:k]
        return pa.table({"doc_id": pa.array(ids[order], type=pa.int64()),
                         "weight": pa.array(w[order], type=pa.int64()),
                         "priority": pa.array(pri[order], type=pa.int64())})

    parts = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    if "doc_id" not in parts.columns:    # fully-empty input -> schemaless
        parts = pd.DataFrame({c: pd.Series(dtype="int64")
                              for c in ("doc_id", "weight", "priority")})
    parts = parts.sort_values(["priority", "doc_id"]).head(k)
    return pd.DataFrame({
        "rank": np.arange(1, len(parts) + 1, dtype=np.int64),
        "doc_id": parts["doc_id"].to_numpy(),
        "weight": parts["weight"].to_numpy(),
        "priority": parts["priority"].to_numpy(),
    })


def inverted_index_stats(docs):
    """Postings-list statistics per term: (term, df, cf, min_doc, max_doc).

    The aggregate skeleton of an inverted-index build: ``df`` = number of
    documents containing the term, ``cf`` = total occurrences, min/max doc
    id bound the postings range.  Exact with ONE shuffle: a document is one
    row and lives in exactly one batch, so the per-batch combiner (arrow
    ``group_by([term, doc])`` → ``group_by(term)``) emits one row per
    distinct term per batch with df/cf partials that a global
    ``groupby(term)`` just sums — raw token rows never enter the exchange.
    Full postings lists would stream out of the same combiner as
    (term, doc_id, tf) rows partitioned by term hash; the stats variant
    keeps the driver-checkable exact surface.
    """
    from ray.data.aggregate import Max, Min, Sum

    def partial(t: pa.Table) -> pa.Table:
        flat, row_idx = _tokens_nonempty(t)
        ids = np.asarray(t["doc_id"].combine_chunks()
                         if isinstance(t["doc_id"], pa.ChunkedArray)
                         else t["doc_id"])
        tf = pa.table({
            "term": flat,
            "doc_id": pa.array(ids[row_idx], type=pa.int64()),
        }).group_by(["term", "doc_id"]).aggregate([([], "count_all")])
        g = pa.table({
            "term": tf["term"],
            "doc_id": tf["doc_id"],
            "tf": tf["count_all"].cast(pa.int64()),
        }).group_by("term").aggregate([
            ("doc_id", "count"), ("tf", "sum"),
            ("doc_id", "min"), ("doc_id", "max"),
        ])
        return pa.table({
            "term": g["term"],
            "df_p": g["doc_id_count"].cast(pa.int64()),
            "cf_p": g["tf_sum"].cast(pa.int64()),
            "mn_p": g["doc_id_min"],
            "mx_p": g["doc_id_max"],
        })

    return (docs.map_batches(partial, batch_format="pyarrow")
            .groupby("term")
            .aggregate(Sum("df_p", alias_name="df"),
                       Sum("cf_p", alias_name="cf"),
                       Min("mn_p", alias_name="min_doc"),
                       Max("mx_p", alias_name="max_doc")))


def tfidf_top_terms(docs, k: int = 3, scale: int = 1_000_000):
    """Per-document top-k terms by a rationalized tf-idf.

    Score: ``score_scaled = tf · scale // df`` — integer, exact, and
    monotone in tf/df, so the ranking is engine-independent (no
    transcendental idf whose last-bit rounding could differ from the SQL
    oracle).  Ties break by term ascending.

    Plan (2 shuffles, no joins — Ray Data has no join primitive and none is
    needed):

    1. per-batch vectorized term counting: tokens flatten once, one arrow
       ``group_by([doc, term])`` per batch emits (term, doc_id, tf) — exact
       because a document is one row and never straddles batches;
    2. ``sort("term")`` + per-block group kernel attaches df (= group size,
       since each doc contributes a term once) and scores every row — the
       sort-contract pattern of :func:`.dedup.minhash_candidate_pairs`,
       guarded by the same range-disjointness check;
    3. ``sort("doc_id")`` + per-block top-k kernel (one lexsort per block)
       keeps k terms per document, same guard.

    For a bounded vocabulary the df table could instead broadcast via
    ``ray.put`` and kill shuffle #2; web-scale vocabularies (urls, typos,
    numbers) are unbounded, so the sort path is the default.
    Returns (doc_id, term, score_scaled).
    """
    from .dedup import _ranges_disjoint_check

    def term_counts(t: pa.Table) -> pa.Table:
        flat, row_idx = _tokens_nonempty(t)
        ids = np.asarray(t["doc_id"].combine_chunks()
                         if isinstance(t["doc_id"], pa.ChunkedArray)
                         else t["doc_id"])
        g = pa.table({
            "term": flat,
            "doc_id": pa.array(ids[row_idx], type=pa.int64()),
        }).group_by(["term", "doc_id"]).aggregate([([], "count_all")])
        return pa.table({"term": g["term"], "doc_id": g["doc_id"],
                         "tf": g["count_all"].cast(pa.int64())})

    def _marker_cols(n_rows: int, lo, hi, typ) -> tuple[pa.Array, pa.Array]:
        return (pa.array([None] * n_rows + [lo], type=typ),
                pa.array([None] * n_rows + [hi], type=typ))

    def attach_df(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "term": pa.array([], type=pa.string()),
                             "score_scaled": pa.array([], type=pa.int64()),
                             "tlo": pa.array([], type=pa.string()),
                             "thi": pa.array([], type=pa.string())})
        terms = np.asarray(t["term"].to_pylist(), dtype=object)
        tf = np.asarray(t["tf"].combine_chunks()
                        if isinstance(t["tf"], pa.ChunkedArray) else t["tf"])
        change = np.nonzero(terms[1:] != terms[:-1])[0] + 1
        starts = np.concatenate([[0], change]).astype(np.int64)
        ends = np.concatenate([change, [n]]).astype(np.int64)
        df = np.repeat(ends - starts, ends - starts)
        score = tf * scale // df
        tlo, thi = _marker_cols(n, terms[0], terms[-1], pa.string())
        return pa.table({
            "doc_id": pa.concat_arrays([
                t["doc_id"].combine_chunks()
                if isinstance(t["doc_id"], pa.ChunkedArray) else t["doc_id"],
                pa.array([-1], type=pa.int64())]),
            "term": pa.array(list(terms) + [None], type=pa.string()),
            "score_scaled": pa.array(np.concatenate([score, [-1]]),
                                     type=pa.int64()),
            "tlo": tlo,
            "thi": thi,
        })

    def doc_topk(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "term": pa.array([], type=pa.string()),
                             "score_scaled": pa.array([], type=pa.int64()),
                             "dlo": pa.array([], type=pa.int64()),
                             "dhi": pa.array([], type=pa.int64())})
        ids = np.asarray(t["doc_id"].combine_chunks()
                         if isinstance(t["doc_id"], pa.ChunkedArray)
                         else t["doc_id"])
        terms = np.asarray(t["term"].to_pylist(), dtype=object)
        score = np.asarray(t["score_scaled"].combine_chunks()
                           if isinstance(t["score_scaled"], pa.ChunkedArray)
                           else t["score_scaled"])
        order = np.lexsort((terms, -score, ids))   # doc asc, score desc, term asc
        sid = ids[order]
        change = np.nonzero(sid[1:] != sid[:-1])[0] + 1
        starts = np.concatenate([[0], change]).astype(np.int64)
        rank = np.arange(n, dtype=np.int64) - np.repeat(
            starts, np.diff(np.concatenate([starts, [n]])))
        keep = order[rank < k]
        keep.sort()
        m = len(keep)
        dlo, dhi = _marker_cols(m, int(ids.min()), int(ids.max()),
                                pa.int64())
        return pa.table({
            "doc_id": pa.array(np.concatenate([ids[keep], [-1]]),
                               type=pa.int64()),
            "term": pa.array(list(terms[keep]) + [None], type=pa.string()),
            "score_scaled": pa.array(np.concatenate([score[keep], [-1]]),
                                     type=pa.int64()),
            "dlo": dlo,
            "dhi": dhi,
        })

    empty_out = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "term": pa.array([], type=pa.string()),
                          "score_scaled": pa.array([], type=pa.int64())})

    def _split(ds, lo_col: str, hi_col: str, check_name: str):
        """Vectorized marker/data split (no per-row ``Dataset.filter``)."""
        def data_rows(t: pa.Table) -> pa.Table:
            keep = t.filter(pc.is_null(t[lo_col]))
            return keep.select(["doc_id", "term", "score_scaled"])

        def marker_rows(t: pa.Table) -> pa.Table:
            keep = t.filter(pc.is_valid(t[lo_col]))
            return keep.select([lo_col, hi_col])

        rows = ds.map_batches(data_rows, batch_format="pyarrow")
        # repartition(1) is load-bearing: the check compares ADJACENT block
        # ranges, so all marker rows (one per block) must meet in one task
        check = (ds.map_batches(marker_rows, batch_format="pyarrow")
                 .repartition(1)
                 .map_batches(_ranges_disjoint_check(
                     check_name, [lo_col], [hi_col], empty_out),
                     batch_format="pyarrow", batch_size=None))
        return rows, check

    scored = (docs.map_batches(term_counts, batch_format="pyarrow")
              .sort("term")
              .map_batches(attach_df, batch_format="pyarrow",
                           batch_size=None)
              .materialize())
    score_rows, t_check = _split(scored, "tlo", "thi", "tfidf_top_terms/df")

    picked = (score_rows.sort("doc_id")
              .map_batches(doc_topk, batch_format="pyarrow",
                           batch_size=None)
              .materialize())
    out_rows, d_check = _split(picked, "dlo", "dhi", "tfidf_top_terms/topk")

    return out_rows.union(t_check).union(d_check)


def _bigrams_with_rows(t: pa.Table):
    """Adjacent-token bigrams + their batch row index (vectorized; see
    :func:`top_bigrams` for the slice-and-mask construction)."""
    flat, row_idx = _tokens_nonempty(t)
    if len(flat) < 2:
        return (pa.array([], type=pa.string()),
                np.empty(0, dtype=np.int64))
    same_doc = row_idx[1:] == row_idx[:-1]
    joined = pc.binary_join_element_wise(
        flat.slice(0, len(flat) - 1), flat.slice(1), " ")
    return joined.filter(pa.array(same_doc)), row_idx[:-1][same_doc]


def top_bigram_repetition(docs, keep_below_permille: int = 180):
    """Gopher-style repetition quality filter: fraction of a document's
    adjacent-token bigrams taken by its single most frequent bigram
    (documents dominated by one repeated phrase are boilerplate/spam).

    Pure map-side — a document is one row in one batch, so both group-bys
    (per-(doc, bigram) count, then per-doc max) run inside the batch in
    Arrow C++; NO shuffle at any corpus size.  Integer permille
    (``1000·top//total``) keeps the SQL oracle hash-exact.  Documents with
    fewer than two tokens have no bigrams: permille 0, keep=true (too
    short to convict), same convention as the oracle.

    Returns (doc_id, n_bigrams, top_bigram_count, top_bigram_permille,
    keep).
    """
    def score(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].combine_chunks()
                         if isinstance(t["doc_id"], pa.ChunkedArray)
                         else t["doc_id"])
        bigrams, brow = _bigrams_with_rows(t)
        n_bi = np.bincount(brow, minlength=t.num_rows).astype(np.int64)
        top = np.zeros(t.num_rows, dtype=np.int64)
        if len(bigrams):
            c = pa.table({
                "r": pa.array(brow), "g": bigrams,
            }).group_by(["r", "g"]).aggregate([([], "count_all")])
            m = pa.table({
                "r": c["r"], "cnt": c["count_all"].cast(pa.int64()),
            }).group_by("r").aggregate([("cnt", "max")])
            top[np.asarray(m["r"].combine_chunks())] = \
                np.asarray(m["cnt_max"].combine_chunks())
        permille = np.where(n_bi > 0, 1000 * top // np.maximum(n_bi, 1), 0)
        return pa.table({
            "doc_id": pa.array(ids),
            "n_bigrams": pa.array(n_bi),
            "top_bigram_count": pa.array(top),
            "top_bigram_permille": pa.array(permille),
            "keep": pa.array(permille < keep_below_permille),
        })

    return docs.map_batches(score, batch_format="pyarrow")


def lexical_diversity(docs):
    """Type-token ratio per document: ``1000·distinct_tokens // n_tokens``
    — the lexical-diversity quality signal (machine-generated / keyword-
    stuffed pages repeat a tiny vocabulary; natural prose doesn't).

    Pure map-side like :func:`top_bigram_repetition`: a document is one
    row in one batch, so the distinct count runs inside the batch (one
    pandas C factorize + composite-int ``np.unique``); NO shuffle at any
    corpus size.  Integer permille keeps the SQL oracle hash-exact.
    Documents with zero nonempty tokens report 0/0/0.

    Returns (doc_id, n_tokens, n_types, ttr_permille).
    """
    import pandas as pd

    def score(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].combine_chunks()
                         if isinstance(t["doc_id"], pa.ChunkedArray)
                         else t["doc_id"]).astype(np.int64)
        flat, row_idx = _tokens_nonempty(t)
        n_tok = np.bincount(row_idx, minlength=t.num_rows).astype(np.int64)
        n_types = np.zeros(t.num_rows, dtype=np.int64)
        if len(flat):
            tc, tu = pd.factorize(flat.to_pandas(), sort=False)
            key = row_idx * np.int64(len(tu)) + tc.astype(np.int64)
            uniq_rows = np.unique(key) // np.int64(len(tu))
            np.add.at(n_types, uniq_rows, 1)
        permille = np.where(n_tok > 0,
                            1000 * n_types // np.maximum(n_tok, 1), 0)
        return pa.table({
            "doc_id": pa.array(ids),
            "n_tokens": pa.array(n_tok),
            "n_types": pa.array(n_types),
            "ttr_permille": pa.array(permille.astype(np.int64)),
        })

    return docs.map_batches(score, batch_format="pyarrow")


def _token_grams_with_rows(t: pa.Table, gram_len: int):
    """All ``gram_len``-token shingles of each row's nonempty tokens,
    joined with a space, plus their batch-row index — the shared kernel of
    both decontamination variants (one zero-copy slice per gram position,
    one element-wise join)."""
    flat, row_idx = _tokens_nonempty(t)
    if len(flat) < gram_len:
        return (pa.array([], type=pa.string()),
                np.empty(0, dtype=np.int64))
    n = len(flat) - gram_len + 1
    same_doc = row_idx[:n] == row_idx[gram_len - 1:]
    parts = [flat.slice(i, n) for i in range(gram_len)]
    joined = pc.binary_join_element_wise(*parts, " ")
    return joined.filter(pa.array(same_doc)), row_idx[:n][same_doc]


def contamination_flags(docs, gram_len: int = 8, benchmark_mod: int = 97):
    """Benchmark decontamination: flag corpus documents that share any
    ``gram_len``-token shingle with the held-out benchmark slice
    (``doc_id % benchmark_mod == 0`` — the deterministic stand-in for an
    eval set).  The standard pre-training leakage check.

    Plan: one filtered pass collects the benchmark documents' distinct
    grams (the benchmark side is SMALL by contract — eval sets are
    thousands of docs, not corpora) and broadcasts them once via
    ``ray.put``; the corpus pass then streams, building each batch's grams
    vectorized (``gram_len``-way Arrow element-wise join over zero-copy
    slices) and testing membership against a pandas C hash index — no
    shuffle, documents never move.  Exact string membership (no hashing),
    so the SQL oracle matches bit-for-bit.

    Returns (doc_id, n_contaminated_grams, contaminated) for NON-benchmark
    documents only.
    """
    import pandas as pd
    import ray

    def _grams_with_rows(t: pa.Table):
        return _token_grams_with_rows(t, gram_len)

    def bench_grams(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].combine_chunks()
                         if isinstance(t["doc_id"], pa.ChunkedArray)
                         else t["doc_id"])
        keep = pa.array(ids % benchmark_mod == 0)
        sub = t.filter(keep)
        grams, _ = _grams_with_rows(sub)
        return pa.table({"gram": pc.unique(grams)})

    from ..arrowutil import collect_tables
    bench = collect_tables(docs.map_batches(bench_grams,
                                            batch_format="pyarrow"))
    bench_idx = pd.Index(pc.unique(
        bench["gram"].combine_chunks()).to_pandas())
    bench_ref = ray.put(bench_idx)

    def flag(t: pa.Table) -> pa.Table:
        idx = ray.get(bench_ref)
        ids = np.asarray(t["doc_id"].combine_chunks()
                         if isinstance(t["doc_id"], pa.ChunkedArray)
                         else t["doc_id"])
        keep = pa.array(ids % benchmark_mod != 0)
        sub = t.filter(keep)
        sub_ids = ids[np.asarray(keep)]
        grams, grow = _grams_with_rows(sub)
        n_hits = np.zeros(len(sub_ids), dtype=np.int64)
        if len(grams):
            hit = idx.get_indexer(grams.to_pandas()) >= 0
            np.add.at(n_hits, grow[hit], 1)
        return pa.table({
            "doc_id": pa.array(sub_ids),
            "n_contaminated_grams": pa.array(n_hits),
            "contaminated": pa.array(n_hits > 0),
        })

    return docs.map_batches(flag, batch_format="pyarrow")


def contamination_flags_distributed(docs, gram_len: int = 8,
                                    benchmark_mod: int = 97,
                                    num_partitions: int = 8):
    """Corpus-scale variant of :func:`contamination_flags` — the
    documented escape hatch for when the benchmark gram set outgrows a
    driver broadcast (a corpus-sized "benchmark", cross-split leakage
    checks).  Exact same output, no broadcast, no driver-side state:

    1. corpus pass: per-batch (gram, doc_id, n_occ) COMBINER rows —
       duplicate grams within a (batch, doc) collapse into a count via
       one pandas-C factorize + integer composite-key ``np.unique``, so
       the join exchange carries distinct pairs, not occurrences;
    2. benchmark pass: per-batch distinct grams → one ``groupby(gram)``
       for the global distinct set;
    3. ONE hash-partitioned inner join on gram (``num_partitions`` is the
       (|corpus grams|+|bench grams|)/P memory knob; 2×P ≲ cluster CPUs
       per the triangle-count sizing rule);
    4. per-doc totals: hits union one (doc_id, 0) row per non-benchmark
       doc → combiner-friendly ``groupby(doc_id).Sum`` → flag.

    Versus the broadcast variant: documents still never shuffle, but
    every distinct (gram, doc) pair does — that is the price of a
    benchmark side with no small-side contract, and it is bounded by the
    corpus token count, not squared.  Prefer :func:`contamination_flags`
    whenever the eval set fits the object store.
    """
    from ray.data.aggregate import Count, Sum

    from .joins import shuffle_hash_join

    def _ids(t: pa.Table) -> np.ndarray:
        from ..arrowutil import one_chunk
        return np.asarray(one_chunk(t["doc_id"]))

    def corpus_pairs(t: pa.Table) -> pa.Table:
        ids = _ids(t)
        sub = t.filter(pa.array(ids % benchmark_mod != 0))
        grams, grow = _token_grams_with_rows(sub, gram_len)
        sub_ids = _ids(sub)
        if not len(grams):
            return pa.table({"gram": pa.array([], type=pa.string()),
                             "doc_id": pa.array([], type=pa.int64()),
                             "n_occ": pa.array([], type=pa.int64())})
        import pandas as pd
        codes, uniques = pd.factorize(grams.to_pandas())
        key = codes.astype(np.int64) * sub.num_rows + grow
        uk, counts = np.unique(key, return_counts=True)
        return pa.table({
            "gram": pa.array(uniques[uk // sub.num_rows], type=pa.string()),
            "doc_id": pa.array(sub_ids[uk % sub.num_rows]),
            "n_occ": pa.array(counts.astype(np.int64)),
        })

    def bench_grams(t: pa.Table) -> pa.Table:
        ids = _ids(t)
        sub = t.filter(pa.array(ids % benchmark_mod == 0))
        grams, _ = _token_grams_with_rows(sub, gram_len)
        return pa.table({"gram": pc.unique(grams)})

    # sentinel rows no real gram can equal keep BOTH join sides non-empty
    # (this Ray build's hash join crashes on a fully empty side, and Ray
    # never invokes a map UDF on an empty block, so per-batch sentinels
    # cannot cover a fully empty input): "" vs "\n" can never match each
    # other nor any gram_len-token space-join, and the inner join drops
    # them.  Empty blocks elsewhere are folded by shuffle_hash_join.
    import ray.data as rd
    bench_sentinel = rd.from_arrow(pa.table({
        "gram": pa.array([""], type=pa.string())}))
    pairs_sentinel = rd.from_arrow(pa.table({
        "gram": pa.array(["\n"], type=pa.string()),
        "doc_id": pa.array([-1], type=pa.int64()),
        "n_occ": pa.array([0], type=pa.int64())}))
    bench = (docs.map_batches(bench_grams, batch_format="pyarrow")
             .union(bench_sentinel)
             .groupby("gram").aggregate(Count())
             .select_columns(["gram"]))
    pairs = docs.map_batches(corpus_pairs,
                             batch_format="pyarrow").union(pairs_sentinel)
    hits = shuffle_hash_join(pairs, bench, on="gram",
                             num_partitions=num_partitions,
                             project=("doc_id", "n_occ"))
    def base_rows(t: pa.Table) -> pa.Table:
        keep = _ids(t)[_ids(t) % benchmark_mod != 0]
        return pa.table({
            "doc_id": pa.array(keep),
            "n_occ": pa.array(np.zeros(len(keep), dtype=np.int64)),
        })

    base = docs.map_batches(base_rows, batch_format="pyarrow")
    totals = (hits.union(base).groupby("doc_id")
              .aggregate(Sum("n_occ", alias_name="n_contaminated_grams")))

    def finalize(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n_contaminated_grams"], pa.int64())
        return pa.table({
            "doc_id": t["doc_id"],
            "n_contaminated_grams": n,
            "contaminated": pc.greater(n, 0),
        })

    return totals.map_batches(finalize, batch_format="pyarrow")


def _join_by_row(flat, row_idx: np.ndarray, n_rows: int,
                 sep: str) -> pa.Array:
    """Join flat strings back into one string per row (``""`` for rows
    with no strings).  ``row_idx`` must be non-decreasing (flat order =
    row order), which every flatten-with-offsets producer here
    guarantees."""
    counts = np.bincount(row_idx, minlength=n_rows).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(counts)))
    lst = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                   flat.combine_chunks()
                                   if isinstance(flat, pa.ChunkedArray)
                                   else flat)
    return pc.binary_join(lst, sep)


def chunk_tokens_to_lines(docs, every: int = 16):
    """Deterministic "line" structure for single-line web text: split into
    nonempty tokens and re-join every ``every`` consecutive tokens with a
    space, chunks joined by ``\\n``.  A pure vectorized map (two
    ListArray-offset joins per batch, no shuffle) that gives line-level
    operators (:func:`remove_common_lines`) a well-defined unit on corpora
    whose extraction collapsed newlines.  SQL mirror: list slicing
    ``ts[(g*every+1):(g*every+every)]`` over the token array."""
    def chunk(t: pa.Table) -> pa.Table:
        flat, row_idx = _tokens_nonempty(t)
        # token position within its row -> chunk ordinal
        starts = np.zeros(t.num_rows + 1, dtype=np.int64)
        np.add.at(starts, row_idx + 1, 1)
        first = np.cumsum(starts)[:-1]      # first flat idx of each row
        pos = np.arange(len(row_idx), dtype=np.int64) - first[row_idx]
        chunk_of = pos // every
        # join tokens within (row, chunk): line_id is dense & sorted
        # because (row_idx, chunk_of) is lexicographically non-decreasing
        new_line = np.ones(len(row_idx), dtype=bool)
        if len(row_idx):
            new_line[1:] = ((row_idx[1:] != row_idx[:-1])
                            | (chunk_of[1:] != chunk_of[:-1]))
        line_id = np.cumsum(new_line) - 1 if len(row_idx) else new_line[:0]
        n_lines = int(line_id[-1]) + 1 if len(row_idx) else 0
        lines = _join_by_row(flat, line_id.astype(np.int64), n_lines, " ")
        line_row = row_idx[new_line] if len(row_idx) else row_idx[:0]
        text = _join_by_row(lines, line_row, t.num_rows, "\n")
        out = {n: t[n] for n in t.column_names if n != "text"}
        out["text"] = text
        return pa.table(out)

    return docs.map_batches(chunk, batch_format="pyarrow")


def _chunk_lines_with_pos(t: pa.Table, every: int):
    """Chunk each doc's nonempty tokens into ``every``-token lines (the
    :func:`chunk_tokens_to_lines` unit) and return them EXPLODED:
    (lines: pa.Array, line_row: np.ndarray batch-row index,
    line_pos: np.ndarray chunk ordinal within its doc)."""
    flat, row_idx = _tokens_nonempty(t)
    if not len(row_idx):
        z = np.empty(0, dtype=np.int64)
        return pa.array([], type=pa.string()), z, z
    starts = np.zeros(t.num_rows + 1, dtype=np.int64)
    np.add.at(starts, row_idx + 1, 1)
    first = np.cumsum(starts)[:-1]
    pos = np.arange(len(row_idx), dtype=np.int64) - first[row_idx]
    chunk_of = pos // every
    new_line = np.ones(len(row_idx), dtype=bool)
    new_line[1:] = ((row_idx[1:] != row_idx[:-1])
                    | (chunk_of[1:] != chunk_of[:-1]))
    line_id = np.cumsum(new_line) - 1
    lines = _join_by_row(flat, line_id.astype(np.int64),
                         int(line_id[-1]) + 1, " ")
    return lines, row_idx[new_line], chunk_of[new_line]


_LDF_POS_BITS = 20   # < 2^20 lines per doc; doc_id < 2^43 (~8.8e12 docs)


def dedup_lines_keep_first(docs, every: int = 16, stitch_shards=None,
                           include_empty_docs: bool = False):
    """Corpus-wide EXACT line dedup, keep-first-occurrence: every line
    (16-token chunk, the :func:`chunk_tokens_to_lines` unit) appears in the
    output exactly once, at its globally first (doc_id, position); all
    later copies — across documents AND within one — are dropped and each
    doc's text is rebuilt from its surviving lines.  The RefinedWeb-style
    exact paragraph-dedup pass (Penedo et al. 2023), one granularity below
    :func:`.dedup.dedup_exact` (whole doc) and complementary to
    :func:`remove_common_lines` (which drops COMMON lines everywhere,
    keeping none).

    Plan — no document ever shuffles, no driver-side state:

    1. explode lines per batch, encode occurrence as one int64
       ``doc_id << 20 | pos`` (guarded; raises past 2^20 lines/doc or
       2^43 docs), batch combiner keeps min-enc per distinct line →
       the exchange carries ≤ one row per distinct line per batch;
    2. ``groupby(line).Min(enc)`` → the global first occurrence, decoded
       back to (doc_id, pos, line) — winners ARE the surviving rows, so
       no join back against the corpus is needed;
    3. rebuild text per doc with the sorted-block ordered string
       aggregation (:func:`.aggs.grouped_string_agg`, sep="\\n");
    4. docs whose every line lost (or with no tokens) are DROPPED by
       default — the usual curation contract, and it keeps the rebuilt
       text to one exchange.  ``include_empty_docs=True`` re-enters them
       as ``("", 0)`` via a one-row-per-doc union + Max coalesce (any
       real text/count sorts above the empty sentinel) — that coalesce
       ships the rebuilt corpus text through a SECOND exchange, so
       prefer the default at fleet scale.
    """
    from ray.data.aggregate import Max, Min

    from .aggs import grouped_string_agg

    mask = (1 << _LDF_POS_BITS) - 1

    def lines_partial(t: pa.Table) -> pa.Table:
        lines, line_row, line_pos = _chunk_lines_with_pos(t, every)
        from ..arrowutil import one_chunk
        ids_all = np.asarray(one_chunk(t["doc_id"])).astype(np.int64)
        ids = ids_all[line_row]
        if len(line_pos) and (int(line_pos.max()) > mask
                              or int(ids.max()) >= (1 << (63 - _LDF_POS_BITS))):
            raise ValueError("dedup_lines_keep_first: doc_id/pos exceeds "
                             "the 43+20-bit occurrence encoding")
        enc = (ids << _LDF_POS_BITS) | line_pos
        # batch combiner: min-enc per distinct line within this batch
        order = np.argsort(enc, kind="stable")
        lines_np = np.asarray(lines, dtype=object)[order]
        _, first = np.unique(lines_np, return_index=True)
        return pa.table({
            "line": pa.array(lines_np[first], type=pa.string()),
            "enc": pa.array(enc[order][first]),
        })

    def decode(t: pa.Table) -> pa.Table:
        from ..arrowutil import one_chunk
        enc = one_chunk(t["enc"])
        pos = pc.bit_wise_and(enc, mask)
        return pa.table({
            "doc_id": pc.shift_right(enc, _LDF_POS_BITS),
            "ts": pos, "event_id": pos,
            "line": t["line"],
        })

    winners = (docs.map_batches(lines_partial, batch_format="pyarrow")
               .groupby("line").aggregate(Min("enc", alias_name="enc"))
               .map_batches(decode, batch_format="pyarrow"))
    agg = grouped_string_agg(winners, group_col="doc_id",
                             value_col="line", sep="\n",
                             stitch_shards=stitch_shards)
    agg = agg.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "text": t["path"],
                            "n_lines_kept": t["n_events"]}),
        batch_format="pyarrow")
    if not include_empty_docs:
        return agg
    base = docs.map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "text": pa.array([""] * t.num_rows, type=pa.string()),
            "n_lines_kept": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
        }),
        batch_format="pyarrow")
    return (agg.union(base).groupby("doc_id")
            .aggregate(Max("text", alias_name="text"),
                       Max("n_lines_kept", alias_name="n_lines_kept")))


def _split_lines_with_rows(t: pa.Table, text_col: str, sep: str,
                           keep_blank: bool):
    """Flattened ``sep``-split lines of each row plus their batch-row
    index (and, with ``keep_blank``, blank lines kept as structure)."""
    from ..arrowutil import one_chunk
    col = one_chunk(t[text_col])
    lst = pc.split_pattern(col.fill_null(""), sep)
    flat = lst.flatten()
    lengths = np.asarray(pc.list_value_length(lst).fill_null(0))
    row_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), lengths)
    if keep_blank:
        return flat, row_idx
    mask = np.asarray(pc.not_equal(flat, ""))
    return flat.filter(pa.array(mask)), row_idx[mask]


def _line_count_partial(t: pa.Table, text_col: str, sep: str,
                        sentinel: str | None = None) -> pa.Table:
    """Per-batch distinct-doc line-count combiner: one string-hash pass
    (factorize), then integer-only (row, line) dedup via a composite int64
    key — ~2x the combiner throughput of hashing the strings again in
    drop_duplicates + value_counts.  ``sentinel`` (a string no real line
    can equal) is appended with partial=0 so the aggregated totals are
    never schemaless even on an empty corpus."""
    import pandas as pd

    flat, row_idx = _split_lines_with_rows(t, text_col, sep,
                                           keep_blank=False)
    codes, uniques = pd.factorize(flat.to_pandas(), sort=False)
    if not len(codes):
        lines, cnt = [], np.empty(0, dtype=np.int64)
    else:
        width = np.int64(len(uniques))
        per_doc = np.unique(row_idx * width + codes)   # one (doc,line) each
        cnt = np.bincount((per_doc % width).astype(np.int64),
                          minlength=len(uniques)).astype(np.int64)
        lines = list(uniques)
    if sentinel is not None:
        lines = list(lines) + [sentinel]
        cnt = np.concatenate([cnt, [0]])
    return pa.table({
        "line": pa.array(lines, type=pa.string()),
        "partial": pa.array(cnt),
    })


def remove_common_lines(docs, min_docs: int = 2,
                        text_col: str = "text", sep: str = "\n"):
    """CCNet-style boilerplate removal: drop every line that occurs in at
    least ``min_docs`` distinct documents (nav bars, cookie banners,
    footers — the lines that repeat across a crawl).

    Plan (two streaming passes + one small exchange):

    1. combiner pass — per batch, split each doc into lines, dedup lines
       WITHIN each doc (a doc is one row, so within-row dedup is exact
       distinct-doc counting), emit (line, partial_count);
    2. ``groupby(line)`` Sum over combiner rows only (≤ distinct lines
       per batch enter the shuffle, never raw corpus rows), filter
       ``n_docs >= min_docs``;
    3. the surviving COMMON lines are broadcast once via ``ray.put`` and
       each doc streams through a membership filter (pandas C hash
       index), rebuilding its text from the kept lines in order.

    The broadcast assumes the common-line set fits a worker heap — true
    by construction for boilerplate (few distinct lines, each with a
    huge count).  If ``min_docs`` is set so low that the set approaches
    corpus size, the scale path is to keep lines keyed and reassemble
    docs with the ordered ``aggs.grouped_string_agg`` machinery instead
    of broadcasting; a Bloom filter is NOT an exact substitute here
    (false positives would silently delete innocent lines).

    Exact string matching throughout (no hashing), so a SQL oracle
    reproduces the output bit-for-bit.  Blank lines are STRUCTURE, not
    content: they are never counted, never removed, and survive the
    rebuild (paragraph breaks stay intact).  Returns the input columns
    with ``text_col`` rewritten (``""`` when every line was removed)
    plus ``n_removed`` (occurrences dropped, within-doc repeats
    counted).  Distinct-doc counting is row-based: one input row = one
    document.
    """
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    def _lines_with_rows(t: pa.Table, keep_blank: bool):
        return _split_lines_with_rows(t, text_col, sep, keep_blank)

    def count_partial(t: pa.Table) -> pa.Table:
        return _line_count_partial(t, text_col, sep)

    totals = (docs.map_batches(count_partial, batch_format="pyarrow")
              .groupby("line").aggregate(Sum("partial",
                                             alias_name="n_docs")))
    common = totals.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_docs"], min_docs)),
        batch_format="pyarrow")
    from ..arrowutil import collect_tables
    merged = collect_tables(common)
    common_idx = pd.Index(merged["line"].to_pandas()
                          if merged.num_rows else pd.Series([], dtype=object))
    common_ref = ray.put(common_idx)

    def scrub(t: pa.Table) -> pa.Table:
        idx = ray.get(common_ref)
        flat, row_idx = _lines_with_rows(t, keep_blank=True)
        removed = np.zeros(t.num_rows, dtype=np.int64)
        if len(flat) and len(idx):
            hit = idx.get_indexer(flat.to_pandas()) >= 0
            np.add.at(removed, row_idx[hit], 1)
            flat, row_idx = flat.filter(pa.array(~hit)), row_idx[~hit]
        text = _join_by_row(flat, row_idx, t.num_rows, sep)
        out = {n: t[n] for n in t.column_names if n != text_col}
        out[text_col] = text
        out["n_removed"] = pa.array(removed)
        return pa.table(out)

    return docs.map_batches(scrub, batch_format="pyarrow")


# no real line can equal this: lines come from splitting text on "\n"
_RCL_SENTINEL = "\n"


def remove_common_lines_distributed(docs, min_docs: int = 2,
                                    text_col: str = "text", sep: str = "\n",
                                    num_partitions: int = 8,
                                    stitch_shards=None):
    """Scale-path variant of :func:`remove_common_lines` for when the
    common-line set outgrows a driver broadcast (``min_docs`` set low on a
    template-heavy crawl, cross-corpus line tables).  Same decision rule
    and the same (doc_id, text, n_removed) output — a Bloom filter is NOT
    used because its false positives would silently delete innocent lines.

    Plan — exact, no broadcast, no driver-side state:

    1. the shared distinct-doc line-count combiner → ``groupby(line)``
       Sum → common = lines with ``n_docs >= min_docs`` (a sentinel row
       no real line can equal keeps the join side schema-typed when
       nothing is common);
    2. every line OCCURRENCE (blank lines included — they are structure
       and never common) explodes with an int64 ``doc_id<<20|pos``
       encoding and LEFT-OUTER hash-joins against the common set: match
       ⇒ dropped occurrence, no match ⇒ kept;
    3. kept occurrences rebuild each doc's text with the sorted-block
       ordered string aggregation; dropped occurrences reduce to per-doc
       counts through the combiner-first path;
    4. one final ``groupby(doc_id)`` coalesces text (Max over the empty
       sentinel), n_removed (Sum), and re-enters untouched docs.

    Four exchanges total versus the broadcast variant's one — the cost of
    dropping the small-side contract; the occurrence join is the big one
    and carries (line, enc) pairs, bounded by corpus line count.
    """
    from ray.data.aggregate import Max, Sum

    from .aggs import grouped_string_agg
    from .joins import shuffle_hash_join

    mask = (1 << _LDF_POS_BITS) - 1

    totals = (docs.map_batches(
        lambda t: _line_count_partial(t, text_col, sep,
                                      sentinel=_RCL_SENTINEL),
        batch_format="pyarrow")
        .groupby("line").aggregate(Sum("partial", alias_name="n_docs")))
    common = totals.map_batches(
        lambda t: pa.table({
            "line": t.filter(pc.or_(
                pc.greater_equal(t["n_docs"], min_docs),
                pc.equal(t["line"], _RCL_SENTINEL)))["line"],
        }),
        batch_format="pyarrow")

    def occurrences(t: pa.Table) -> pa.Table:
        flat, row_idx = _split_lines_with_rows(t, text_col, sep,
                                               keep_blank=True)
        from ..arrowutil import one_chunk
        ids_all = np.asarray(one_chunk(t["doc_id"])).astype(np.int64)
        ids = ids_all[row_idx]
        starts = np.zeros(t.num_rows + 1, dtype=np.int64)
        np.add.at(starts, row_idx + 1, 1)
        first = np.cumsum(starts)[:-1]
        pos = np.arange(len(row_idx), dtype=np.int64) - first[row_idx]
        if len(pos) and (int(pos.max()) > mask
                         or int(ids.max()) >= (1 << (63 - _LDF_POS_BITS))):
            raise ValueError("remove_common_lines_distributed: doc_id/pos "
                             "exceeds the 43+20-bit occurrence encoding")
        return pa.table({
            "line": flat,
            "enc": pa.array((ids << _LDF_POS_BITS) | pos),
        })

    occ = docs.map_batches(occurrences, batch_format="pyarrow")
    joined = shuffle_hash_join(
        occ, common.map_batches(
            lambda t: pa.table({"line": t["line"],
                                "common": pa.array(
                                    np.ones(t.num_rows, dtype=np.int64))}),
            batch_format="pyarrow"),
        on="line", join_type="left_outer", num_partitions=num_partitions)

    def kept_rows(t: pa.Table) -> pa.Table:
        from ..arrowutil import one_chunk
        sub = t.filter(pc.is_null(t["common"]))
        enc = one_chunk(sub["enc"])
        pos = pc.bit_wise_and(enc, mask)
        return pa.table({
            "doc_id": pc.shift_right(enc, _LDF_POS_BITS),
            "ts": pos, "event_id": pos,
            "line": sub["line"],
        })

    def dropped_partial(t: pa.Table) -> pa.Table:
        from ..arrowutil import one_chunk
        sub = t.filter(pc.is_valid(t["common"]))
        ids = np.asarray(pc.shift_right(one_chunk(sub["enc"]),
                                        _LDF_POS_BITS))
        uids, cnt = np.unique(ids, return_counts=True)
        return pa.table({
            "doc_id": pa.array(uids),
            text_col: pa.array([""] * len(uids), type=pa.string()),
            "n_removed": pa.array(cnt.astype(np.int64)),
        })

    agg = grouped_string_agg(joined.map_batches(kept_rows,
                                                batch_format="pyarrow"),
                             group_col="doc_id", value_col="line", sep=sep,
                             stitch_shards=stitch_shards)
    agg = agg.map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            text_col: t["path"],
            "n_removed": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
        }),
        batch_format="pyarrow")
    dropped = joined.map_batches(dropped_partial, batch_format="pyarrow")
    base = docs.map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            text_col: pa.array([""] * t.num_rows, type=pa.string()),
            "n_removed": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
        }),
        batch_format="pyarrow")
    return (agg.union(dropped, base).groupby("doc_id")
            .aggregate(Max(text_col, alias_name=text_col),
                       Sum("n_removed", alias_name="n_removed")))


#: The link grammar: literal '<a href="' + unquoted url + '">' + text up
#: to the next tag.  Chosen so that SPLIT-based extraction is PROVABLY
#: equivalent to a non-overlapping regex scan: the href group ([^"]*)
#: cannot contain '"' and the anchor group ([^<]*) cannot contain '<',
#: so neither can contain the split literal — every literal occurrence
#: starts a match, exactly like regexp_extract_all.
LINK_OPEN = '<a href="'
LINK_BODY = r'^(?P<href>[^"]*)">(?P<anchor>[^<]*)'


def extract_links(docs, text_col: str = "text"):
    """Outlink extraction — (doc_id, link_pos, href, anchor) rows for
    every ``<a href="URL">TEXT`` occurrence: the crawl-graph builder
    feeding :func:`.graph.pagerank_fixed` / host statistics.  Messier
    anchor markup (extra attributes, nested tags) is expected to be
    normalized upstream by the parse stage; the grammar here is the
    exact one the SQL oracle scans, see :data:`LINK_OPEN`.

    Vectorized explode: one ``split_pattern`` on the literal open tag,
    per-fragment RE2 ``extract_regex`` for the two groups, offsets
    arithmetic for per-doc positions — no shuffle, no per-row Python.
    """
    def fn(t: pa.Table) -> pa.Table:
        from ..arrowutil import one_chunk

        rows, pos, sub = _explode_links(one_chunk(t[text_col]), t.num_rows)
        ids_all = np.asarray(one_chunk(t["doc_id"])).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids_all[rows]),
            "link_pos": pa.array(pos),
            "href": pc.struct_field(sub, "href"),
            "anchor": pc.struct_field(sub, "anchor"),
        })

    return docs.map_batches(fn, batch_format="pyarrow")


def _explode_links(txt: pa.Array, n_rows: int):
    """Shared link-explode kernel: returns (row indices, per-row 0-based
    link ordinals, struct array of href/anchor groups) for every grammar
    match in each row."""
    lst = pc.split_pattern(txt, LINK_OPEN)
    flat = lst.flatten()
    lengths = np.asarray(pc.list_value_length(lst).fill_null(0))
    row_idx = np.repeat(np.arange(n_rows, dtype=np.int64), lengths)
    starts = np.zeros(n_rows + 1, dtype=np.int64)
    np.add.at(starts, row_idx + 1, 1)
    first = np.cumsum(starts)[:-1]
    frag_pos = np.arange(len(row_idx), dtype=np.int64) - first[row_idx]
    # fragment 0 is the preamble before any link; fragments k>=1 start
    # right after the k-th open literal
    cand = frag_pos > 0
    groups = pc.extract_regex(flat.filter(pa.array(cand)), LINK_BODY)
    ok = pc.is_valid(groups)
    sub = groups.filter(pa.array(ok))
    rows = row_idx[cand][np.asarray(ok)]
    # per-doc 0-based link ordinal among MATCHING fragments
    pos = np.zeros(len(rows), dtype=np.int64)
    if len(rows):
        new_doc = np.ones(len(rows), dtype=bool)
        new_doc[1:] = rows[1:] != rows[:-1]
        seg_start = np.nonzero(new_doc)[0]
        offs = np.repeat(seg_start, np.diff(
            np.concatenate([seg_start, [len(rows)]])))
        pos = np.arange(len(rows), dtype=np.int64) - offs
    return rows, pos, sub


def host_link_graph(pages, url_col: str = "url", text_col: str = "text"):
    """Host-level link graph — (src_host, dst_host, n_links) edges from
    every grammar link in every page: the crawl-graph aggregation behind
    domain-authority ranking (feed the edges to
    :func:`.graph.pagerank_fixed` after an id encoding of the hosts).

    Per batch: the shared link explode, host extraction on both ends
    (the :func:`.skew._hosts_vec` kernels), then a factorize +
    composite-int ``np.bincount`` combiner so the exchange carries one
    row per distinct (src, dst) pair per batch — zipfian hub hosts cost
    combiner rows, not occurrence rows.  One ``groupby`` Sum.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    from ..arrowutil import one_chunk
    from .skew import _hosts_vec

    def partial(t: pa.Table) -> pa.Table:
        rows, _, sub = _explode_links(one_chunk(t[text_col]), t.num_rows)
        if not len(rows):
            return pa.table({
                "src_host": pa.array([], type=pa.string()),
                "dst_host": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
            })
        src = _hosts_vec(one_chunk(t[url_col])).take(pa.array(rows))
        dst = _hosts_vec(pc.struct_field(sub, "href"))
        sc, su = pd.factorize(src.to_pandas(), sort=False)
        dc, du = pd.factorize(dst.to_pandas(), sort=False)
        key = sc.astype(np.int64) * len(du) + dc
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "src_host": pa.array(su[uk // len(du)], type=pa.string()),
            "dst_host": pa.array(du[uk % len(du)], type=pa.string()),
            "n": pa.array(cnt.astype(np.int64)),
        })

    return (pages.map_batches(partial, batch_format="pyarrow")
            .groupby(["src_host", "dst_host"])
            .aggregate(Sum("n", alias_name="n_links")))


def anchor_text_index(pages, text_col: str = "text", k: int = 8):
    """Anchor-text index: for every link-TARGET host, the top-``k``
    anchor terms by total inbound-mention count — the web-corpus anchor
    aggregation (anchor text describes the target page better than the
    target's own text; classic search/training-signal construction).

    Per batch: the shared link explode (:func:`_explode_links`), target-
    host extraction (``skew._hosts_vec``), whitespace term split of each
    anchor (empty terms dropped), then the factorize + composite-int
    ``np.unique`` combiner so the first exchange carries one
    (host, term, n) row per batch — zipfian hub hosts cost combiner rows,
    not occurrence rows.  One ``groupby`` Sum totals the counts; the rank
    pass reuses :func:`.windowfns.grouped_top_k`'s bucketed
    ≤k-per-group merge (term is unique per host post-aggregate, so the
    tie-break is deterministic).  Returns (dst_host, rank, n_mentions,
    term).
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    from ..arrowutil import one_chunk
    from .skew import _hosts_vec
    from .windowfns import grouped_top_k

    def _empty() -> pa.Table:
        return pa.table({"dst_host": pa.array([], type=pa.string()),
                         "term": pa.array([], type=pa.string()),
                         "n": pa.array([], type=pa.int64())})

    def partial(t: pa.Table) -> pa.Table:
        rows, _, sub = _explode_links(one_chunk(t[text_col]), t.num_rows)
        if not len(rows):
            return _empty()
        dst = _hosts_vec(pc.struct_field(sub, "href"))
        terms = pc.split_pattern(pc.struct_field(sub, "anchor"), " ")
        flat = terms.flatten()
        lengths = np.asarray(pc.list_value_length(terms).fill_null(0))
        link_idx = np.repeat(np.arange(len(dst), dtype=np.int64), lengths)
        mask = np.asarray(pc.not_equal(flat, ""))
        flat, link_idx = flat.filter(pa.array(mask)), link_idx[mask]
        if not len(link_idx):
            return _empty()
        hosts = dst.take(pa.array(link_idx))
        hc, hu = pd.factorize(hosts.to_pandas(), sort=False)
        tc, tu = pd.factorize(flat.to_pandas(), sort=False)
        key = hc.astype(np.int64) * np.int64(len(tu)) + tc.astype(np.int64)
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "dst_host": pa.array(hu[uk // len(tu)], type=pa.string()),
            "term": pa.array(tu[uk % len(tu)], type=pa.string()),
            "n": pa.array(cnt.astype(np.int64)),
        })

    agg = (pages.map_batches(partial, batch_format="pyarrow")
           .groupby(["dst_host", "term"])
           .aggregate(Sum("n", alias_name="n_mentions")))
    return grouped_top_k(agg, "dst_host", "n_mentions", "term", k)


def crawl_diff(curr, prev, key_col: str = "doc_id",
               text_col: str = "text", num_partitions: int = 8,
               key_type: pa.DataType | None = None):
    """Crawl snapshot diff — classify every key across two crawls as
    ``added`` (current only), ``removed`` (previous only), ``changed``
    (both, different content hash) or ``unchanged``: the incremental-
    processing primitive that lets a recurring pipeline re-extract only
    the added/changed slice instead of the full crawl.

    Plan: each side reduces per batch to (key, md5(text)) — ~50 B/row, the
    texts never leave their batch — then ONE hash-partitioned FULL OUTER
    join on the key; the status is a vectorized null/equality case over
    the joined hashes.  Exact string hashing (md5 matches DuckDB's
    ``md5()``), so the SQL oracle reproduces the classification
    bit-for-bit.  Returns (key, status).

    Keys must be NON-NULL: each side is unioned with a one-row null-key
    sentinel dataset (null keys join nothing under SQL semantics, and
    this Ray build's hash join crashes on a fully empty side — a
    per-batch sentinel cannot help because Ray never invokes the UDF on
    an empty block, so an EMPTY previous snapshot, i.e. the first-ever
    run, would produce no rows at all); the classifier drops the
    unmatched sentinels, and would drop genuine null-key rows with them.
    """
    import ray.data as rd

    from ..arrowutil import one_chunk
    from .joins import shuffle_hash_join

    def digests(t: pa.Table, col: str) -> pa.Table:
        texts = one_chunk(t[text_col]).to_pylist()
        return pa.table({
            key_col: t[key_col],
            col: pa.array([hashlib.md5(
                s if isinstance(s, bytes) else s.encode("utf-8")
            ).hexdigest() for s in texts], type=pa.string()),
        })

    key_type = key_type if key_type is not None else pa.int64()

    def sentinel(col: str):
        return rd.from_arrow(pa.table({
            key_col: pa.array([None], type=key_type),
            col: pa.array([""], type=pa.string()),
        }))

    c = curr.map_batches(lambda t: digests(t, "h_curr"),
                         batch_format="pyarrow").union(sentinel("h_curr"))
    p = prev.map_batches(lambda t: digests(t, "h_prev"),
                         batch_format="pyarrow").union(sentinel("h_prev"))
    joined = shuffle_hash_join(c, p, on=key_col,
                               num_partitions=num_partitions,
                               join_type="full_outer")

    def classify(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[key_col]))     # drop the sentinels
        hc, hp = t["h_curr"], t["h_prev"]
        status = pc.if_else(
            pc.is_null(hp), "added",
            pc.if_else(pc.is_null(hc), "removed",
                       pc.if_else(pc.equal(hc, hp),
                                  "unchanged", "changed")))
        return pa.table({key_col: t[key_col], "status": status})

    return joined.map_batches(classify, batch_format="pyarrow")


def filter_by_group_quality(docs, group_col: str = "source",
                            value_col: str = "n_chars",
                            min_avg_milli: int = 300_000):
    """Domain-level quality gate — the UT1/RefinedWeb-style curation step
    that drops every document from a LOW-QUALITY GROUP (host, domain,
    source feed) rather than judging docs one by one: groups whose mean
    ``value_col`` (exact integer milli, ``sum*1000 // n`` — floor division
    matches SQL ``//`` because the sums are non-negative) falls below
    ``min_avg_milli`` are removed wholesale.

    Plan: per-batch (group, sum, n) combiner → one small ``groupby(group)``
    → the GOOD-group set collects and broadcasts once (group cardinality
    ≪ corpus by web contract: ~10⁷ hosts vs 10¹² pages) → docs stream
    through a pandas-C membership filter.  Documents never shuffle.  If
    the group key's cardinality ever approaches corpus size, gate with a
    :func:`.joins.shuffle_hash_join` inner join instead (the group table
    is exact, so unlike Bloom gating no recovery pass is needed).

    Returns the input columns of surviving docs unchanged.
    """
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        from ..arrowutil import one_chunk
        g = one_chunk(t[group_col])
        v = np.asarray(one_chunk(t[value_col])).astype(np.int64)
        codes, uniques = pd.factorize(g.to_pandas(), sort=False)
        return pa.table({
            group_col: pa.array(uniques, type=pa.string()),
            "s": pa.array(np.bincount(codes, weights=v,
                                      minlength=len(uniques))
                          .astype(np.int64)),
            "n": pa.array(np.bincount(codes, minlength=len(uniques))
                          .astype(np.int64)),
        })

    totals = (docs.map_batches(partial, batch_format="pyarrow")
              .groupby(group_col).aggregate(Sum("s", alias_name="s"),
                                            Sum("n", alias_name="n")))

    def good(t: pa.Table) -> pa.Table:
        avg = pc.divide(pc.multiply(t["s"], 1000), t["n"])
        return pa.table({group_col:
                         t.filter(pc.greater_equal(avg,
                                                   min_avg_milli))[group_col]})

    from ..arrowutil import collect_tables
    merged = collect_tables(totals.map_batches(good,
                                               batch_format="pyarrow"))
    good_idx = pd.Index(merged[group_col].to_pandas()
                        if merged.num_rows else pd.Series([], dtype=object))
    good_ref = ray.put(good_idx)

    def gate(t: pa.Table) -> pa.Table:
        from ..arrowutil import one_chunk
        idx = ray.get(good_ref)
        keep = idx.get_indexer(one_chunk(t[group_col]).to_pandas()) >= 0
        return t.filter(pa.array(keep))

    return docs.map_batches(gate, batch_format="pyarrow")


def top_token_counts(docs, vocab_size: int):
    """Global top-``vocab_size`` token counts, (count desc, token asc) —
    the shared vocabulary phase behind :func:`oov_rate` and
    :func:`build_vocab`.  Per-batch Arrow ``group_by`` combiner → one
    ``groupby(token)`` over combiner rows → bounded-partial top-k (≤
    ``vocab_size`` rows per block reach the driver, no global sort).
    Returns a pandas frame (token, n) sorted by the vocabulary order.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    def counts(t: pa.Table) -> pa.Table:
        flat, _ = _tokens_nonempty(t)
        g = pa.table({"token": flat}).group_by("token").aggregate(
            [([], "count_all")])
        return pa.table({"token": g["token"],
                         "n_partial": g["count_all"].cast(pa.int64())})

    def block_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["n", "token"],
                                       ascending=[False, True]) \
            .head(vocab_size)
        return pa.Table.from_pandas(df, preserve_index=False)

    vocab_df = (docs.map_batches(counts, batch_format="pyarrow")
                .groupby("token").aggregate(Sum("n_partial", alias_name="n"))
                .map_batches(block_topk, batch_format="pyarrow",
                             batch_size=None)
                .to_pandas())
    if "token" not in vocab_df.columns:
        vocab_df = pd.DataFrame({"token": pd.Series(dtype=object),
                                 "n": pd.Series(dtype="int64")})
    return vocab_df.sort_values(["n", "token"],
                                ascending=[False, True]) \
        .head(vocab_size).reset_index(drop=True)


def build_vocab(docs, vocab_size: int = 100):
    """Vocabulary construction: the corpus's top-``vocab_size`` tokens
    with contiguous ids assigned by (count desc, token asc) rank — the
    tokenizer-training precursor (a unigram vocab is the degenerate BPE
    seed).  The distributed work is the combiner-first count of
    :func:`top_token_counts`; id assignment happens driver-side over the
    vocab_size-row result — schema-sized, never corpus-sized.  Returns
    (token_id, token, n_occurrences), token_id starting at 0.
    """
    import pandas as pd

    v = top_token_counts(docs, vocab_size)
    return pd.DataFrame({
        "token_id": np.arange(len(v), dtype=np.int64),
        "token": v["token"].to_numpy(dtype=object),
        "n_occurrences": v["n"].to_numpy().astype(np.int64),
    })


def balanced_sample(docs, group_col: str = "lang",
                    rates_permille: dict | None = None,
                    default_permille: int = 1000):
    """Language/domain-balanced corpus sampling: keep each row with a
    per-group deterministic probability (permille) — the mixing step that
    downsamples over-represented languages or sources before training
    (the fixed-rate cousin of temperature sampling; the caller computes
    the rates, this op applies them at corpus scale).

    A pure filter over the stream: the group's rate looks up from a
    schema-sized dict captured in the closure, the keep decision is the
    repo's shared Knuth hash bucket of ``doc_id`` — deterministic across
    runs and parallelism, identical arithmetic to :func:`hash_sample`
    and its SQL mirror.  No shuffle, no state.  Returns
    (doc_id, group, bucket).
    """
    rates = dict(rates_permille or {})

    def pick(t: pa.Table) -> pa.Table:
        import pandas as pd

        from ..arrowutil import one_chunk

        b = hash_bucket(t["doc_id"])
        grp = one_chunk(t[group_col])
        if rates:
            # vectorized dict lookup: pandas map is a C hash-table probe,
            # not a per-row Python loop
            thr = pd.Series(grp.to_numpy(zero_copy_only=False)) \
                .map(rates).fillna(default_permille) \
                .to_numpy(dtype=np.int64)
        else:
            thr = np.full(len(b), default_permille, np.int64)
        mask = b < thr
        return pa.table({
            "doc_id": t["doc_id"].filter(pa.array(mask)),
            "group": grp.filter(pa.array(mask)),
            "bucket": pa.array(b[mask], type=pa.int64()),
        })

    return docs.map_batches(pick, batch_format="pyarrow")


def oov_rate(docs, vocab_size: int = 50):
    """Out-of-vocabulary rate per document: the permille of a doc's tokens
    absent from the corpus-wide top-``vocab_size`` token vocabulary — the
    cheap stand-in for LM-perplexity quality filtering (CCNet-style): high
    OOV flags gibberish, boilerplate-stripped residue, and wrong-language
    docs relative to the corpus's own register.

    Two passes, both shuffle-light: (1) vocabulary = global token counts
    (per-batch Arrow ``group_by`` combiner → one ``groupby`` over combiner
    rows) reduced to top-``vocab_size`` with the bounded-partial pattern
    (count desc, token asc — the deterministic tie-break the SQL oracle
    mirrors); (2) the vocab broadcasts once via ``ray.put`` (it is
    ``vocab_size`` strings — schema-sized, not corpus-sized) and every doc
    streams through one pandas-C membership gather.

    Integer permille (1000·oov // n_tokens), empty docs → 0.  Returns
    (doc_id, n_tokens, oov_permille).
    """
    import pandas as pd
    import ray

    vocab_df = top_token_counts(docs, vocab_size)
    vocab_ref = ray.put(pd.Index(vocab_df["token"].to_numpy(dtype=object)))

    def score(t: pa.Table) -> pa.Table:
        idx = ray.get(vocab_ref)
        flat, row_idx = _tokens_nonempty(t)
        n_tok = np.zeros(t.num_rows, dtype=np.int64)
        oov = np.zeros(t.num_rows, dtype=np.int64)
        if len(flat):
            np.add.at(n_tok, row_idx, 1)
            miss = idx.get_indexer(flat.to_pandas()) < 0 if len(idx) \
                else np.ones(len(flat), dtype=bool)
            np.add.at(oov, row_idx[miss], 1)
        permille = np.where(n_tok > 0, 1000 * oov // np.maximum(n_tok, 1), 0)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(n_tok),
            "oov_permille": pa.array(permille.astype(np.int64)),
        })

    return docs.map_batches(score, batch_format="pyarrow")


def explode_token_windows(docs, size: int = 32, stride: int = 16):
    """Passage windowing for retrieval/embedding pipelines: one output row
    per token window of ``size`` tokens every ``stride`` tokens (stride ==
    size gives disjoint chunks; stride < size overlapping passages).  A
    document with t tokens yields ceil(max(t - size, 0) / stride) + 1
    windows (always ≥ 1 for non-empty docs: the final, possibly short,
    tail window starts at the last stride boundary); empty docs yield no
    rows.

    Pure vectorized flat-map — per batch, one token flatten, one window
    enumeration (numpy repeat/arange arithmetic), one ListArray-offset
    ``binary_join`` rebuild; no shuffle, no per-row Python.  The fan-out
    multiplies row count by ~t/stride: budget downstream ``batch_size``
    for passage rows, not document rows.  Returns (doc_id, window_idx,
    window_start, passage) with start in token units.
    """
    if size < 1 or stride < 1:
        raise ValueError("explode_token_windows: size and stride must "
                         "be >= 1")

    def windows(t: pa.Table) -> pa.Table:
        from ..arrowutil import one_chunk
        flat, row_idx = _tokens_nonempty(t)
        ids = np.asarray(one_chunk(t["doc_id"]))
        n_tok = np.zeros(t.num_rows, dtype=np.int64)
        if len(row_idx):
            np.add.at(n_tok, row_idx, 1)
        n_win = np.where(n_tok > 0,
                         (np.maximum(n_tok - size, 0) + stride - 1)
                         // stride + 1, 0)
        # per-window doc + index
        win_doc = np.repeat(np.arange(t.num_rows), n_win)
        first = np.concatenate([[0], np.cumsum(n_win)])[:-1]
        win_idx = np.arange(int(n_win.sum()), dtype=np.int64) \
            - first[win_doc]
        win_start = win_idx * stride
        win_len = np.minimum(win_start + size, n_tok[win_doc]) - win_start
        # gather token positions for every window, then one offsets join
        tok_first = np.concatenate([[0], np.cumsum(n_tok)])[:-1]
        rep = np.repeat(np.arange(len(win_doc)), win_len) \
            if len(win_doc) else np.empty(0, dtype=np.int64)
        inner = np.arange(int(win_len.sum()), dtype=np.int64) \
            - np.concatenate([[0], np.cumsum(win_len)])[:-1][rep] \
            if len(win_doc) else np.empty(0, dtype=np.int64)
        gather = tok_first[win_doc[rep]] + win_start[rep] + inner
        toks = flat.take(pa.array(gather, type=pa.int64()))
        passage = _join_by_row(toks, rep, len(win_doc), " ")
        return pa.table({
            "doc_id": pa.array(ids[win_doc]),
            "window_idx": pa.array(win_idx),
            "window_start": pa.array(win_start.astype(np.int64)),
            "passage": passage,
        })

    return docs.map_batches(windows, batch_format="pyarrow")


def dsir_scores(docs, target_mod: int = 9, vocab_size: int = 100):
    """DSIR-style importance score for data selection (Xie et al. 2023,
    hashed-ngram importance resampling, integer-exact variant): score
    each document by how much its token mix resembles a TARGET domain
    (the deterministic ``doc_id % target_mod == 0`` slice stands in for
    "quality" target data) versus the raw corpus.

    score = Σ_{token occurrences in doc ∩ vocab} (f_target − f_raw),
    where f_* are integer permilles of each top-``vocab_size`` target
    token in the target slice / whole corpus (floor division over
    non-negative sums — SQL-exact); positive scores mean
    target-like.  No per-doc division, so negatives stay exact.

    Plan: per-batch factorize+bincount combiner emits (token, n_all,
    n_target) rows → ONE ``groupby(token)`` (shuffle bounded by distinct
    tokens per batch, the inverted-index shape) → totals via distributed
    sums over the materialized counts, vocab via the bounded-partial
    top-k (n_target desc, token asc — the oracle's tie-break) → the
    vocab diff table broadcasts once (vocab_size rows) → docs stream
    through one membership gather.  Documents never shuffle.

    Returns (doc_id, n_tokens, dsir_score).
    """
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    from ..arrowutil import one_chunk

    def counts(t: pa.Table) -> pa.Table:
        flat, row_idx = _tokens_nonempty(t)
        if not len(row_idx):
            return pa.table({"token": pa.array([], type=pa.string()),
                             "n_all_p": pa.array([], type=pa.int64()),
                             "n_tgt_p": pa.array([], type=pa.int64())})
        ids = np.asarray(one_chunk(t["doc_id"]))
        is_tgt = (ids[row_idx] % target_mod == 0).astype(np.int64)
        codes, uniques = pd.factorize(flat.to_pandas(), sort=False)
        return pa.table({
            "token": pa.array(uniques, type=pa.string()),
            "n_all_p": pa.array(np.bincount(codes,
                                            minlength=len(uniques))
                                .astype(np.int64)),
            "n_tgt_p": pa.array(np.bincount(codes, weights=is_tgt,
                                            minlength=len(uniques))
                                .astype(np.int64)),
        })

    agg = (docs.map_batches(counts, batch_format="pyarrow")
           .groupby("token").aggregate(Sum("n_all_p", alias_name="n_all"),
                                       Sum("n_tgt_p", alias_name="n_tgt"))
           ).materialize()
    total_all = int(agg.sum("n_all") or 0)
    total_tgt = int(agg.sum("n_tgt") or 0)

    def block_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["n_tgt", "token"],
                                       ascending=[False, True]) \
            .head(vocab_size)
        return pa.Table.from_pandas(df, preserve_index=False)

    vocab_df = agg.map_batches(block_topk, batch_format="pyarrow",
                               batch_size=None).to_pandas()
    if "token" not in vocab_df.columns:
        vocab_df = pd.DataFrame({"token": pd.Series(dtype=object),
                                 "n_all": pd.Series(dtype="int64"),
                                 "n_tgt": pd.Series(dtype="int64")})
    vocab_df = vocab_df.sort_values(["n_tgt", "token"],
                                    ascending=[False, True]) \
        .head(vocab_size)
    f_t = (vocab_df["n_tgt"].to_numpy(dtype=np.int64) * 1000
           // max(total_tgt, 1))
    f_r = (vocab_df["n_all"].to_numpy(dtype=np.int64) * 1000
           // max(total_all, 1))
    diff_ref = ray.put((
        pd.Index(vocab_df["token"].to_numpy(dtype=object)),
        (f_t - f_r).astype(np.int64)))

    def score(t: pa.Table) -> pa.Table:
        idx, diffs = ray.get(diff_ref)
        flat, row_idx = _tokens_nonempty(t)
        n_tok = np.zeros(t.num_rows, dtype=np.int64)
        sc = np.zeros(t.num_rows, dtype=np.int64)
        if len(flat):
            np.add.at(n_tok, row_idx, 1)
            if len(idx):
                pos = idx.get_indexer(flat.to_pandas())
                hit = pos >= 0
                np.add.at(sc, row_idx[hit], diffs[pos[hit]])
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(n_tok),
            "dsir_score": pa.array(sc),
        })

    return docs.map_batches(score, batch_format="pyarrow")


def pack_sequences(docs, seq_len: int = 64, stitch_shards=None,
                   num_partitions: int = 8):
    """Training-sequence packing: concatenate every document's tokens in
    doc_id order and cut the stream into fixed ``seq_len``-token
    sequences that SPAN document boundaries (the standard pre-training
    packing step; the last sequence may be short).  Returns
    (seq_id, n_tokens, text).

    Packing is inherently a full-corpus rewrite — every token moves
    once — but nothing ever concentrates on the driver:

    1. per-doc token counts (vectorized) → ``sort(doc_id)`` over the
       COUNT rows (~16 B each, not texts) → each sorted block emits its
       rows tagged with the block's min doc id plus ONE carry row
       (min doc id, block token total); the driver cumsums the ≤
       #blocks carries into per-block base offsets and broadcasts the
       tiny dict — one row per BLOCK, never per doc;
    2. one hash join attaches each doc's global start offset to its
       text (the single text exchange);
    3. tokens explode with global positions; the ordered string
       aggregation rebuilds each ``pos // seq_len`` sequence (the
       second and last exchange: the sort inside
       :func:`.aggs.grouped_string_agg`).
    """
    import ray
    from ray.data.aggregate import Min

    from ..arrowutil import one_chunk
    from .aggs import grouped_string_agg
    from .joins import shuffle_hash_join

    def counts(t: pa.Table) -> pa.Table:
        flat, row_idx = _tokens_nonempty(t)
        n = np.zeros(t.num_rows, dtype=np.int64)
        if len(row_idx):
            np.add.at(n, row_idx, 1)
        return pa.table({"doc_id": t["doc_id"], "n_tok": pa.array(n)})

    def block_local(t: pa.Table) -> pa.Table:
        ids = np.asarray(one_chunk(t["doc_id"]))
        n = np.asarray(one_chunk(t["n_tok"]))
        if not len(ids):
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "block_min": pa.array([], type=pa.int64()),
                             "block_max": pa.array([], type=pa.int64()),
                             "local_start": pa.array([], type=pa.int64()),
                             "is_carry": pa.array([], type=pa.bool_())})
        # duplicate doc_ids would scramble the global offsets silently
        # (bases key by block_min, and the offset join would fan out):
        # in-block dups raise here, cross-block dups raise at the driver
        # via the carry ranges' disjointness check
        if len(np.unique(ids)) != len(ids):
            raise ValueError("pack_sequences: doc_id values must be "
                             "unique (duplicate within a sorted block)")
        local = np.concatenate([[0], np.cumsum(n)[:-1]])
        bm, bx = int(ids.min()), int(ids.max())
        return pa.table({
            "doc_id": pa.array(np.concatenate([ids, [bm]])),
            "block_min": pa.array(np.full(len(ids) + 1, bm,
                                          dtype=np.int64)),
            "block_max": pa.array(np.full(len(ids) + 1, bx,
                                          dtype=np.int64)),
            "local_start": pa.array(np.concatenate(
                [local, [int(n.sum())]])),
            "is_carry": pa.array([False] * len(ids) + [True]),
        })

    tagged = (docs.map_batches(counts, batch_format="pyarrow")
              .sort("doc_id")
              .map_batches(block_local, batch_format="pyarrow",
                           batch_size=None)).materialize()
    carries = sorted(
        ((r["block_min"], r["block_max"], r["local_start"])
         for r in tagged.map_batches(
             lambda t: t.filter(one_chunk(t["is_carry"])),
             batch_format="pyarrow").take_all()),
        key=lambda p: p[0])
    bases, acc, prev_max = {}, 0, None
    for bm, bx, total in carries:
        if prev_max is not None and bm <= prev_max:
            raise ValueError("pack_sequences: doc_id values must be "
                             "unique (duplicate across sorted blocks)")
        prev_max = bx
        bases[bm] = acc
        acc += total
    bases_ref = ray.put(bases)

    def add_base(t: pa.Table) -> pa.Table:
        b = ray.get(bases_ref)
        sub = t.filter(pc.invert(one_chunk(t["is_carry"])))
        bm = np.asarray(one_chunk(sub["block_min"]))
        start = np.asarray(one_chunk(sub["local_start"]))
        # a block's rows share one block_min: resolve per unique value
        uniq, inv = np.unique(bm, return_inverse=True)
        base = np.array([b[int(x)] for x in uniq],
                        dtype=np.int64)[inv] if len(uniq) \
            else np.empty(0, dtype=np.int64)
        return pa.table({"doc_id": sub["doc_id"],
                         "start": pa.array(start + base)})

    offsets = tagged.map_batches(add_base, batch_format="pyarrow")
    # 2 x num_partitions aggregator actors coexist with the rest of the
    # DAG: keep P small relative to cluster CPUs (the triangle-count
    # sizing rule in graph.py)
    joined = shuffle_hash_join(docs, offsets, on="doc_id",
                               num_partitions=num_partitions)

    def explode(t: pa.Table) -> pa.Table:
        flat, row_idx = _tokens_nonempty(t)
        starts = np.asarray(one_chunk(t["start"]))
        if not len(row_idx):
            z = pa.array([], type=pa.int64())
            return pa.table({"seq_id": z, "ts": z, "event_id": z,
                             "line": pa.array([], type=pa.string())})
        first = np.zeros(t.num_rows + 1, dtype=np.int64)
        np.add.at(first, row_idx + 1, 1)
        base_of = np.cumsum(first)[:-1]
        local = np.arange(len(row_idx), dtype=np.int64) - base_of[row_idx]
        pos = starts[row_idx] + local
        return pa.table({
            "seq_id": pa.array(pos // seq_len),
            "ts": pa.array(pos), "event_id": pa.array(pos),
            "line": flat,
        })

    agg = grouped_string_agg(
        joined.map_batches(explode, batch_format="pyarrow"),
        group_col="seq_id", value_col="line", sep=" ",
        stitch_shards=stitch_shards)
    return agg.map_batches(
        lambda t: pa.table({"seq_id": t["seq_id"],
                            "n_tokens": t["n_events"],
                            "text": t["path"]}),
        batch_format="pyarrow")


# --- exact duplicated-span detection (word n-grams) ------------------------

NGRAM_SPAN_N = 5
_SPAN_POS_BITS = 20          # ≤ ~1M tokens per document
_SPAN_DOC_BITS = 42


def dup_ngram_spans(docs, n: int = NGRAM_SPAN_N, num_partitions: int = 8):
    """Exact duplicated-span detection — the word-n-gram variant of the
    suffix-array pass in Lee et al., *Deduplicating Training Data Makes
    Language Models Better* (2021): every corpus-wide occurrence of a word
    n-gram is flagged ``keep = this is the first occurrence`` by
    (doc_id, pos) order, so a downstream rewrite can drop every repeated
    span while provably retaining one copy.

    Plan (the line-dedup shape at token granularity):

    1. explode each doc into (gram_hash, doc_id, pos) rows — grams are
       md5-hashed once per UNIQUE gram per batch (same factorize trick as
       ``dedup.simhash_table``; md5 so DuckDB recomputes the hash exactly);
    2. per-batch combiner: min encoded (doc, pos) per hash, one row per
       distinct gram per batch into
    3. ONE ``groupby(gram_hash).Min`` — the winner per gram; then
    4. ONE hash join of the gram stream against the winners; keep is a
       vectorized equality.

    The gram stream feeds two consumers (the combiner and the join) and is
    deliberately NOT materialized: at corpus scale the token-level stream
    dwarfs the object store, so it re-executes once instead (one extra CPU
    pass over cached input blocks — the standard recompute-vs-pin call).

    Encodings: doc_id < 2^42, pos < 2^20, both RAISING guards.  Returns
    (doc_id, pos, gram_hash, keep).
    """
    import pandas as pd
    from ray.data.aggregate import Min

    from ..arrowutil import one_chunk
    from .joins import shuffle_hash_join

    def explode(t: pa.Table) -> pa.Table:
        doc_ids = np.asarray(one_chunk(t["doc_id"]), dtype=np.int64)
        texts = one_chunk(t["text"]).to_pylist()
        out_doc, out_pos, grams = [], [], []
        for d, s in zip(doc_ids, texts):
            toks = (s or "").split()
            m = len(toks) - n + 1
            if m >= (1 << _SPAN_POS_BITS):
                raise ValueError("dup_ngram_spans: document exceeds the "
                                 f"2^{_SPAN_POS_BITS} token-position budget")
            for i in range(max(m, 0)):
                out_doc.append(d)
                out_pos.append(i)
                grams.append(" ".join(toks[i:i + n]))
        if (doc_ids >= (1 << _SPAN_DOC_BITS)).any() or (doc_ids < 0).any():
            raise ValueError("dup_ngram_spans: doc_id outside the "
                             f"[0, 2^{_SPAN_DOC_BITS}) encoding budget")
        doc = np.asarray(out_doc, dtype=np.int64)
        pos = np.asarray(out_pos, dtype=np.int64)
        if len(grams):
            codes, uniq = pd.factorize(np.asarray(grams, dtype=object))
            hv = np.fromiter(
                (int.from_bytes(hashlib.md5(u.encode("utf-8")).digest()[:8],
                                "big") >> 1 for u in uniq),
                dtype=np.int64, count=len(uniq))
            h = hv[codes]
        else:
            h = np.empty(0, dtype=np.int64)
        return pa.table({
            "gram_hash": pa.array(h),
            "doc_id": pa.array(doc),
            "pos": pa.array(pos),
            "enc": pa.array(doc * (1 << _SPAN_POS_BITS) + pos),
        })

    grams = docs.map_batches(explode, batch_format="pyarrow")

    def combiner(t: pa.Table) -> pa.Table:
        g = t.select(["gram_hash", "enc"]).group_by("gram_hash") \
            .aggregate([("enc", "min")])
        return g.select(["gram_hash", "enc_min"]) \
            .rename_columns(["gram_hash", "enc_b"])

    winners = (grams.map_batches(combiner, batch_format="pyarrow")
               .groupby("gram_hash")
               .aggregate(Min("enc_b", alias_name="enc_min")))

    joined = shuffle_hash_join(grams, winners, on="gram_hash",
                               num_partitions=num_partitions)

    def flag(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "pos": t["pos"],
            "gram_hash": t["gram_hash"],
            "keep": pc.equal(t["enc"], t["enc_min"]),
        })

    return joined.map_batches(flag, batch_format="pyarrow")


def remove_dup_spans(docs, n: int = NGRAM_SPAN_N, num_partitions: int = 8):
    """The full Lee-et-al. rewrite on top of :func:`dup_ngram_spans`:
    drop every token covered by a NON-FIRST occurrence of a word n-gram
    (the repeated span), keeping the corpus-wide first occurrence intact.
    Returns (doc_id, text_deduped, n_removed).

    Plan: the span flags reduce to the DUPLICATED gram starts only (a
    near-duplicate-sized set, not the corpus) — ``groupby(doc_id)`` packs
    each doc's bad starts into ONE binary blob row (int64 LE; Acero joins
    reject list columns, binary passes through), a left-outer hash join
    attaches blobs to docs (null blob = clean doc), and the rewrite is a
    per-row numpy range-mark: scatter +1/-1 deltas at span edges, cumsum,
    mask-join the kept tokens.  The docs stream is read twice by
    dup_ngram_spans and once here (3 passes total) — recompute over
    pinning the token-level stream, as documented on the span op.
    """
    import ray.data as rd

    from ..arrowutil import one_chunk
    from .joins import shuffle_hash_join

    spans = dup_ngram_spans(docs, n=n, num_partitions=num_partitions)

    def bad_only(t: pa.Table) -> pa.Table:
        keep = one_chunk(t["keep"])
        bad = t.filter(pc.invert(keep))
        return pa.table({"doc_id": bad["doc_id"], "pos": bad["pos"]})

    def to_blob(g: pa.Table) -> pa.Table:
        starts = np.sort(np.asarray(one_chunk(g["pos"]), dtype=np.int64))
        return pa.table({
            "doc_id": pa.array([g["doc_id"][0].as_py()], type=pa.int64()),
            "bad_blob": pa.array([starts.tobytes()], type=pa.binary()),
        })

    bad = (spans.map_batches(bad_only, batch_format="pyarrow")
           .groupby("doc_id").map_groups(to_blob, batch_format="pyarrow"))
    # a fully-clean corpus leaves `bad` EMPTY, which this Ray build's hash
    # join cannot take: a null-key sentinel row keeps the side non-empty
    # and joins nothing (crawl_diff's idiom)
    sentinel = rd.from_arrow(pa.table({
        "doc_id": pa.array([None], type=pa.int64()),
        "bad_blob": pa.array([b""], type=pa.binary()),
    }))

    joined = shuffle_hash_join(docs, bad.union(sentinel), on="doc_id",
                               join_type="left_outer",
                               num_partitions=num_partitions)

    def rebuild(t: pa.Table) -> pa.Table:
        texts = one_chunk(t["text"]).to_pylist()
        blobs = one_chunk(t["bad_blob"]).to_pylist()
        out, removed = [], []
        for s, blob in zip(texts, blobs):
            toks = (s or "").split()
            if not blob:
                out.append(" ".join(toks))
                removed.append(0)
                continue
            starts = np.frombuffer(blob, dtype=np.int64)
            delta = np.zeros(len(toks) + 1, dtype=np.int64)
            np.add.at(delta, starts, 1)
            np.add.at(delta, np.minimum(starts + n, len(toks)), -1)
            covered = np.cumsum(delta[:-1]) > 0
            kept = np.asarray(toks, dtype=object)[~covered]
            out.append(" ".join(kept))
            removed.append(int(covered.sum()))
        return pa.table({
            "doc_id": t["doc_id"],
            "text_deduped": pa.array(out, type=pa.string()),
            "n_removed": pa.array(removed, type=pa.int64()),
        })

    return joined.map_batches(rebuild, batch_format="pyarrow")


def merge_dup_spans(docs, n: int = NGRAM_SPAN_N, num_partitions: int = 8,
                    stitch_shards: int | None = None):
    """Maximal duplicated REGIONS per document: the non-first n-gram
    occurrences from :func:`dup_ngram_spans` coalesced into disjoint
    token intervals (gaps-and-islands) — the audit view a curation run
    reports ("this 340-token block is boilerplate") where the rewrite
    (:func:`remove_dup_spans`) silently drops tokens.  Two equal-length
    spans merge iff they overlap OR touch (``next_pos − pos ≤ n``), so
    each island covers a contiguous token range.  Returns
    (doc_id, span_start, span_end, n_grams) with ``span_end`` exclusive.

    Plan: span flags from :func:`dup_ngram_spans` (its two exchanges),
    filter to duplicates (narrow (doc_id, pos) int rows), then the
    sorted-block islands pass of ``windows.session_counts``: sort on
    (doc_id, pos); each block resolves islands for docs fully interior
    to it with one numpy break-scan (break = doc change or gap > n) and
    re-emits only the ≤2 edge docs' rows to a doc-sharded stitch.
    """
    from ..arrowutil import one_chunk
    from .stitch import DEFAULT_STITCH_SHARDS, sharded_stitch
    if stitch_shards is None:
        stitch_shards = DEFAULT_STITCH_SHARDS

    flags = dup_ngram_spans(docs, n=n, num_partitions=num_partitions)
    dups = flags.map_batches(
        lambda t: t.filter(pc.invert(one_chunk(t["keep"])))
        .select(["doc_id", "pos"]), batch_format="pyarrow")

    def _islands(ids, pos):
        """(doc, start, end, count) arrays over sorted (ids, pos)."""
        if not len(ids):
            z = np.empty(0, dtype=np.int64)
            return z, z, z, z
        brk = np.nonzero((ids[1:] != ids[:-1])
                         | (pos[1:] - pos[:-1] > n))[0] + 1
        s = np.concatenate([[0], brk]).astype(np.int64)
        e = np.concatenate([brk, [len(ids)]]).astype(np.int64)
        return ids[s], pos[s], pos[e - 1] + n, e - s

    def block_islands(t: pa.Table) -> pa.Table:
        m = t.num_rows
        if m == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"doc_id": z, "span_start": z, "span_end": z,
                             "n_grams": z, "pos": z,
                             "boundary": pa.array([], type=pa.bool_())})
        ids = np.asarray(one_chunk(t["doc_id"]), dtype=np.int64)
        pos = np.asarray(one_chunk(t["pos"]), dtype=np.int64)
        change = np.nonzero(ids[1:] != ids[:-1])[0] + 1
        gs = np.concatenate([[0], change]).astype(np.int64)
        ge = np.concatenate([change, [m]]).astype(np.int64)
        last = len(gs) - 1
        lo, hi = ge[0], gs[last]           # interior row range
        d, ss, se, ng = _islands(ids[lo:hi], pos[lo:hi]) \
            if hi > lo else _islands(np.empty(0, np.int64),
                                     np.empty(0, np.int64))
        edge_idx = np.unique(np.concatenate(
            [np.arange(0, ge[0]), np.arange(gs[last], m)]))
        n_i, n_b = len(d), len(edge_idx)
        neg = np.full(n_b, -1, dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(np.concatenate([d, ids[edge_idx]])),
            "span_start": pa.array(np.concatenate([ss, neg])),
            "span_end": pa.array(np.concatenate([se, neg])),
            "n_grams": pa.array(np.concatenate([ng, neg])),
            "pos": pa.array(np.concatenate(
                [np.full(n_i, -1, np.int64), pos[edge_idx]])),
            "boundary": pa.array([False] * n_i + [True] * n_b),
        })

    def stitch(t: pa.Table) -> pa.Table:
        ids = np.asarray(one_chunk(t["doc_id"]), dtype=np.int64)
        pos = np.asarray(one_chunk(t["pos"]), dtype=np.int64)
        order = np.lexsort((pos, ids))
        d, ss, se, ng = _islands(ids[order], pos[order])
        return pa.table({"doc_id": pa.array(d), "span_start": pa.array(ss),
                         "span_end": pa.array(se), "n_grams": pa.array(ng)})

    mixed = (dups.sort(["doc_id", "pos"])
             .map_batches(block_islands, batch_format="pyarrow",
                          batch_size=None)).materialize()
    interior = mixed.map_batches(
        lambda t: t.filter(pc.equal(t["boundary"], False))
        .select(["doc_id", "span_start", "span_end", "n_grams"]),
        batch_format="pyarrow")
    carries = mixed.map_batches(
        lambda t: t.filter(t["boundary"]).select(["doc_id", "pos"]),
        batch_format="pyarrow")
    cross = sharded_stitch(
        carries,
        lambda t: np.asarray(one_chunk(t["doc_id"]), dtype=np.int64),
        stitch, num_shards=stitch_shards)
    return interior.union(cross)


def doc_dup_gram_fraction(docs, n: int = NGRAM_SPAN_N,
                          num_partitions: int = 8):
    """Per-document duplication score: what permille of a document's
    word n-grams already occurred earlier in the corpus (the Lee-et-al.
    "fraction of duplicated n-grams" curation signal — the per-doc
    summary of :func:`dup_ngram_spans`, where :func:`merge_dup_spans` is
    the positional audit and :func:`remove_dup_spans` the rewrite).

    Plan: the span flags' two exchanges, then each flag batch collapses
    to (doc_id, n_grams, n_dup) int64 partials (np.unique + add.at) and
    ONE groupby Sum; the permille is integer floor division after the
    exchange so the result is hash-exact.  Documents shorter than ``n``
    tokens have no grams and no row.  Returns
    (doc_id, n_grams, dup_permille).
    """
    from ray.data.aggregate import Sum

    from ..arrowutil import one_chunk

    flags = dup_ngram_spans(docs, n=n, num_partitions=num_partitions)

    def partial(t: pa.Table) -> pa.Table:
        ids = np.asarray(one_chunk(t["doc_id"]), dtype=np.int64)
        dup = ~np.asarray(one_chunk(t["keep"]), dtype=np.bool_)
        uk, inv = np.unique(ids, return_inverse=True)
        tot = np.zeros(len(uk), dtype=np.int64)
        dups = np.zeros(len(uk), dtype=np.int64)
        np.add.at(tot, inv, 1)
        np.add.at(dups, inv, dup)
        return pa.table({"doc_id": pa.array(uk, type=pa.int64()),
                         "g": pa.array(tot), "d": pa.array(dups)})

    grouped = (flags.map_batches(partial, batch_format="pyarrow")
               .groupby("doc_id")
               .aggregate(Sum("g", alias_name="n_grams"),
                          Sum("d", alias_name="n_dup")))

    def permille(t: pa.Table) -> pa.Table:
        g = np.asarray(one_chunk(t["n_grams"]), dtype=np.int64)
        d = np.asarray(one_chunk(t["n_dup"]), dtype=np.int64)
        return pa.table({"doc_id": t["doc_id"], "n_grams": t["n_grams"],
                         "dup_permille": pa.array(d * 1000 // g)})

    return grouped.map_batches(permille, batch_format="pyarrow")


def quota_sample_per_group(docs, group_col: str = "source", k: int = 5):
    """Per-group quota sampling — the host-diversity cap every web-corpus
    curation run needs ("at most k pages per host"): within each group,
    keep the ``k`` rows with the smallest deterministic Knuth-hash
    priority (ties by doc_id), so the winners are a uniform, run- and
    parallelism-independent subset of each group.

    Plan: one map computes ``priority = knuth_hash32(doc_id)`` (full
    32-bit value, same SQL-mirrorable arithmetic as
    :func:`hash_sample`) and its negation feeds
    :func:`..windowfns.grouped_top_k`'s DESC ordering — the ≤k-per-group
    combiner bounds the exchange at k·|groups| rows regardless of corpus
    size.  Returns (group, rank, doc_id, priority).
    """
    from .windowfns import grouped_top_k

    def prep(t: pa.Table) -> pa.Table:
        pr = knuth_hash32(t["doc_id"]).astype(np.int64)
        return pa.table({group_col: t[group_col],
                         "neg_priority": pa.array(-pr),
                         "doc_id": t["doc_id"]})

    top = grouped_top_k(docs.map_batches(prep, batch_format="pyarrow"),
                        group_col, "neg_priority", "doc_id", k=k)

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({group_col: t[group_col], "rank": t["rank"],
                         "doc_id": t["doc_id"],
                         "priority": pc.negate(t["neg_priority"])})

    return top.map_batches(finish, batch_format="pyarrow")


def ngram_diversity(docs, gram_len: int = 3):
    """Corpus-level distinct-n diversity per language — how repetitive a
    slice of the corpus is (distinct ``gram_len``-token shingles vs total
    occurrences; low ratios flag template/boilerplate farms and mode
    collapse in synthetic data).

    Distinctness counts DISTINCT 64-bit md5 gram hashes (:func:`md5_u64`
    idiom): the exchange then moves (lang, int64) rows instead of gram
    strings, and the SQL oracle recomputes the identical hash, so the
    contract stays exact at any scale (a 64-bit collision would change
    both sides equally).  Plan: per batch, shingle (zero-copy slices +
    one element-wise join, the :func:`_token_grams_with_rows` kernel),
    hash, dedup (lang, hv) within the batch and pre-count totals; one
    groupby(lang, hv) distinct + a per-batch second combiner collapse
    the distinct count; totals ride a separate tiny groupby(lang).

    Returns (lang, n_grams, n_distinct, distinct_permille).
    """
    from ray.data.aggregate import Count, Sum

    def partial_pairs(t: pa.Table) -> pa.Table:
        grams, row_idx = _token_grams_with_rows(t, gram_len)
        if len(grams) == 0:
            return pa.table({"lang": pa.array([], type=pa.string()),
                             "hv": pa.array([], type=pa.int64())})
        lang = one_chunk(t["lang"]).take(pa.array(row_idx))
        hv = md5_u64(grams).view(np.int64)
        g = pa.table({"lang": lang, "hv": pa.array(hv)}) \
            .group_by(["lang", "hv"]).aggregate([])
        return g.select(["lang", "hv"])

    def partial_totals(t: pa.Table) -> pa.Table:
        grams, row_idx = _token_grams_with_rows(t, gram_len)
        if len(grams) == 0:
            return pa.table({"lang": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        lang = one_chunk(t["lang"]).take(pa.array(row_idx))
        g = pa.table({"lang": lang}).group_by(["lang"]) \
            .aggregate([([], "count_all")])
        return pa.table({"lang": g["lang"],
                         "n": g["count_all"].cast(pa.int64())})

    def count_distinct(t: pa.Table) -> pa.Table:
        g = t.group_by(["lang"]).aggregate([([], "count_all")])
        return pa.table({"lang": g["lang"],
                         "nd": g["count_all"].cast(pa.int64())})

    distinct = (docs.map_batches(partial_pairs, batch_format="pyarrow")
                .groupby(["lang", "hv"])
                .aggregate(Count(alias_name="c"))
                .map_batches(count_distinct, batch_format="pyarrow")
                .groupby("lang").aggregate(Sum("nd", alias_name="n_distinct")))
    totals = (docs.map_batches(partial_totals, batch_format="pyarrow")
              .groupby("lang").aggregate(Sum("n", alias_name="n_grams")))

    import ray.data

    from ..arrowutil import collect_tables

    t_tbl = collect_tables(totals)
    d_tbl = collect_tables(distinct)
    joined = t_tbl.join(d_tbl, keys=["lang"], join_type="inner") \
        .sort_by("lang")
    ng = np.asarray(one_chunk(joined["n_grams"]), dtype=np.int64)
    nd = np.asarray(one_chunk(joined["n_distinct"]), dtype=np.int64)
    out = pa.table({
        "lang": joined["lang"],
        "n_grams": pa.array(ng),
        "n_distinct": pa.array(nd),
        "distinct_permille": pa.array(nd * 1000 // np.maximum(ng, 1)),
    })
    return ray.data.from_arrow(out)


def inverted_index(docs, k_postings: int = 8, n_buckets: int = 32):
    """Bounded inverted index: per token, its document frequency and the
    ``k_postings`` smallest doc ids as a comma-joined posting list — the
    IR primitive behind keyword lookup over a curated corpus (bounded
    postings keep hot stopword rows from exploding; df stays exact).

    ONE exchange: each batch emits per token a partial-count row plus at
    most ``k_postings`` candidate (token, doc_id) rows — (token, doc_id)
    pairs are globally distinct because a document's text lives in one
    row, so in-batch dedup is global dedup and counts merge additively.
    Rows route to ``hash(token) % n_buckets`` groups; each bucket task
    merges ALL its tokens vectorized (lexsort + segment reduceat +
    ``binary_join``), never per-token Python — the same
    bounded-task-count rationale as :mod:`.windowfns`'s top-k.

    Returns (token, df, postings).
    """
    from .stitch import hash_shard_str

    def partial(t: pa.Table) -> pa.Table:
        flat, row_idx = _tokens_nonempty(t)
        empty = pa.table({
            "bucket": pa.array([], type=pa.int64()),
            "token": pa.array([], type=pa.string()),
            "doc_id": pa.array([], type=pa.int64()),
            "n_partial": pa.array([], type=pa.int64())})
        if len(flat) == 0:
            return empty
        ids = np.asarray(one_chunk(t["doc_id"])).astype(np.int64)[row_idx]
        d = pa.table({"token": flat, "doc_id": pa.array(ids)}) \
            .group_by(["token", "doc_id"]).aggregate([([], "count_all")])
        tok = one_chunk(d["token"])
        did = np.asarray(one_chunk(d["doc_id"]), dtype=np.int64)
        # per-token segment views over the (token, doc_id)-sorted pairs
        order = np.lexsort(
            (did, np.asarray(tok.to_numpy(zero_copy_only=False),
                             dtype=object)))
        tok = tok.take(pa.array(order))
        did = did[order]
        n = len(did)
        new = np.ones(n, dtype=bool)
        if n > 1:
            new[1:] = np.asarray(
                pc.not_equal(tok.slice(1), tok.slice(0, n - 1)), dtype=bool)
        seg_start = np.maximum.accumulate(np.where(new, np.arange(n), 0))
        pos = np.arange(n) - seg_start
        cand = pos < k_postings
        starts = np.nonzero(new)[0]
        counts = np.diff(np.concatenate([starts, [n]]))
        head = pa.table({
            "token": tok.take(pa.array(starts)),
            "n_partial": pa.array(counts.astype(np.int64))})
        return pa.table({
            "bucket": pa.array(np.concatenate([
                hash_shard_str(head["token"]) % n_buckets,
                (hash_shard_str(tok) % n_buckets)[cand]])),
            "token": pa.concat_arrays(
                [one_chunk(head["token"]), tok.filter(pa.array(cand))]),
            "doc_id": pa.array(np.concatenate(
                [np.full(len(starts), -1, np.int64), did[cand]])),
            "n_partial": pa.array(np.concatenate(
                [counts.astype(np.int64),
                 np.zeros(int(cand.sum()), np.int64)])),
        })

    def merge_bucket(g: pa.Table) -> pa.Table:
        out_empty = pa.table({
            "token": pa.array([], type=pa.string()),
            "df": pa.array([], type=pa.int64()),
            "postings": pa.array([], type=pa.string())})
        if g.num_rows == 0:
            return out_empty
        is_count = pc.equal(g["doc_id"], pa.scalar(-1, pa.int64()))
        cnt = g.filter(is_count).group_by("token") \
            .aggregate([("n_partial", "sum")])
        cand = g.filter(pc.invert(is_count))
        tok = one_chunk(cand["token"])
        did = np.asarray(one_chunk(cand["doc_id"]), dtype=np.int64)
        order = np.lexsort(
            (did, np.asarray(tok.to_numpy(zero_copy_only=False),
                             dtype=object)))
        tok = tok.take(pa.array(order))
        did = did[order]
        n = len(did)
        new = np.ones(n, dtype=bool)
        if n > 1:
            new[1:] = np.asarray(
                pc.not_equal(tok.slice(1), tok.slice(0, n - 1)), dtype=bool)
        seg_start = np.maximum.accumulate(np.where(new, np.arange(n), 0))
        keep = (np.arange(n) - seg_start) < k_postings
        idx = np.nonzero(keep)[0]
        tok_k = tok.take(pa.array(idx))
        did_k = did[idx]
        m = len(idx)
        new_k = np.ones(m, dtype=bool)
        if m > 1:
            new_k[1:] = np.asarray(
                pc.not_equal(tok_k.slice(1), tok_k.slice(0, m - 1)),
                dtype=bool)
        starts_k = np.nonzero(new_k)[0]
        offsets = np.concatenate([starts_k, [m]]).astype(np.int32)
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            pc.cast(pa.array(did_k), pa.string()))
        post = pa.table({
            "token": tok_k.take(pa.array(starts_k)),
            "postings": pc.binary_join(lists, ",")})
        joined = pa.table({
            "token": cnt["token"],
            "df": cnt["n_partial_sum"].cast(pa.int64()),
        }).join(post, keys=["token"], join_type="inner")
        return joined.select(["token", "df", "postings"])

    return (docs.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(merge_bucket, batch_format="pyarrow"))


def fuzzy_token_pairs(docs, max_token_len: int = 64,
                      token_col: str | None = None):
    """All distinct token pairs at Levenshtein distance exactly 1 over
    the corpus vocabulary — typo clustering / vocabulary normalization
    without the O(V²) all-pairs scan.

    Deletion-neighborhood blocking (the FastSS / SymSpell trick): two
    tokens with ED ≤ 1 necessarily share a bucket keyed by the token
    itself or one of its single-character deletions (substitution pairs
    share the same-position deletion; insertion/deletion pairs meet in
    the shorter token's own bucket).  The converse is FALSE ("ab"/"ba"
    share buckets at ED 2), so survivors verify with an exact
    Levenshtein check — per-row Python, but gated to candidate pairs
    only (the repo's prefilter convention).

    Plan: distinct vocabulary via one combiner-first groupby (the op is
    inherently vocab-scale — orders of magnitude below corpus rows);
    variant generation is a loop over CHARACTER POSITIONS of vectorized
    slice+join kernels, never over tokens; candidate pairs come from
    :func:`pdf2doi_ray.stages.aggs.event_type_cooccurrence` reused with
    (md5-bucket, token) as its (group, value) — its in-batch dedup,
    single sort and vectorized segment-pair kernel apply unchanged.
    With ``token_col`` set, each row's value in that column is taken as
    one vocabulary entry instead of splitting ``text`` — e.g. host /
    source names, where an ED-1 pair is the typo-squat signal.

    Returns (token_a, token_b).
    """
    from ray.data.aggregate import Count

    from .aggs import event_type_cooccurrence

    def distinct_toks(t: pa.Table) -> pa.Table:
        if token_col is not None:
            flat = one_chunk(t[token_col])
        else:
            flat, _ = _tokens_nonempty(t)
        g = pa.table({"token": flat}).group_by("token").aggregate([])
        return g.select(["token"])

    vocab = (docs.map_batches(distinct_toks, batch_format="pyarrow")
             .groupby("token").aggregate(Count(alias_name="c")))

    def variants(t: pa.Table) -> pa.Table:
        tok = one_chunk(t["token"])
        n = len(tok)
        if n == 0:
            return pa.table({"hv": pa.array([], type=pa.int64()),
                             "token": pa.array([], type=pa.string())})
        lens = np.asarray(pc.utf8_length(tok), dtype=np.int64)
        outs_h, outs_t = [], []
        # the token's own bucket
        outs_h.append(md5_u64(tok).view(np.int64))
        outs_t.append(tok)
        for d in range(int(min(lens.max(), max_token_len))):
            has = lens > d
            if not has.any():
                break
            sub = tok.filter(pa.array(has))
            var = pc.binary_join_element_wise(
                pc.utf8_slice_codeunits(sub, 0, d),
                pc.utf8_slice_codeunits(sub, d + 1, 2**31 - 1), "")
            outs_h.append(md5_u64(var).view(np.int64))
            outs_t.append(sub)
        return pa.table({
            "hv": pa.array(np.concatenate(outs_h)),
            "token": pa.concat_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                 else a for a in outs_t]),
        })

    cand = event_type_cooccurrence(
        vocab.map_batches(variants, batch_format="pyarrow"),
        group_col="hv", value_col="token")

    def verify(t: pa.Table) -> pa.Table:
        import pandas as pd
        a = t["type_a"].to_pandas()
        b = t["type_b"].to_pandas()

        def ed1(x: str, y: str) -> bool:
            lx, ly = len(x), len(y)
            if abs(lx - ly) > 1 or x == y:
                return False
            if lx == ly:
                return sum(1 for p, q in zip(x, y) if p != q) == 1
            if lx > ly:
                x, y, lx, ly = y, x, ly, lx
            # x shorter by one: one skip allowed
            i = 0
            while i < lx and x[i] == y[i]:
                i += 1
            return x[i:] == y[i + 1:]

        keep = pa.array([ed1(x, y) for x, y in zip(a, b)])
        return pa.table({"token_a": t["type_a"].filter(keep),
                         "token_b": t["type_b"].filter(keep)})

    return cand.map_batches(verify, batch_format="pyarrow")


def dedup_url_daily(pages):
    """Crawl revisit policy: ONE page per (url, UTC day), keeping the
    earliest fetch — the recrawl-collapse step before any content
    pipeline, so a hot page fetched hourly contributes one row per day.

    Combiner-first: per batch, an Arrow ``group_by(url, day)`` collapses
    to (min fetch second, visit count) partials; the one exchange is a
    ``groupby(["url", "day"])`` merging Min/Sum — shuffle volume is
    distinct (url, day) pairs per batch, never raw fetches.  Day is
    ``epoch_s // 86400`` (non-negative timestamps, floor == SQL ``//``).
    Returns (url, day, first_ts_s, n_visits).
    """
    from ray.data.aggregate import Min, Sum

    def partial(t: pa.Table) -> pa.Table:
        s = np.asarray(pc.cast(pc.cast(one_chunk(t["warc_ts"]),
                                       pa.timestamp("us")), pa.int64())) \
            // np.int64(1_000_000)
        day = s // np.int64(86_400)
        g = pa.table({
            "url": t["url"], "day": pa.array(day), "s": pa.array(s),
        }).group_by(["url", "day"]).aggregate([("s", "min"),
                                               ("s", "count")])
        return pa.table({
            "url": g["url"], "day": g["day"],
            "first_ts_s": g["s_min"].cast(pa.int64()),
            "n_visits": g["s_count"].cast(pa.int64())})

    return (pages.map_batches(partial, batch_format="pyarrow")
            .groupby(["url", "day"])
            .aggregate(Min("first_ts_s", alias_name="first_ts_s"),
                       Sum("n_visits", alias_name="n_visits")))


def token_budget_head(docs, budget_tokens: int, seed: str = "budget"):
    """Deterministic token-budget truncation: keep the prefix of the
    md5-seeded corpus order whose cumulative whitespace-token count stays
    within ``budget_tokens`` — the "cut this corpus to N training tokens"
    step of a data-mix plan, reproducible across runs and engines (the
    order is ``md5_63(seed ':' doc_id)``, the :func:`.export.seeded_shuffle`
    permutation, so re-cuts at a bigger budget are strict supersets).

    Same block-carry plan as :func:`pack_sequences` /
    ``export.seeded_shuffle``: per-doc token counts (vectorized split) →
    ``sort(skey, doc_id)`` over ~24 B count rows (texts never move) → each
    sorted block emits LOCAL inclusive cumsums plus ONE carry row (block
    total); the driver cumsums the ≤ #blocks carries into per-block base
    offsets, broadcasts the tiny dict, and a vectorized
    ``base + local ≤ budget`` filter keeps the prefix.  Returns
    (doc_id, n_tok, cum_tok) of kept docs, ``cum_tok`` inclusive.
    """
    import ray

    def key_rows(t: pa.Table) -> pa.Table:
        ids = np.asarray(one_chunk(t["doc_id"]), dtype=np.int64)
        flat, row_idx = _tokens_nonempty(t)
        n = np.zeros(t.num_rows, dtype=np.int64)
        if len(row_idx):
            np.add.at(n, row_idx, 1)
        ks = np.fromiter(
            (int.from_bytes(
                hashlib.md5(f"{seed}:{int(d)}".encode()).digest()[:8],
                "big") >> 1 for d in ids),
            dtype=np.int64, count=len(ids))
        return pa.table({"doc_id": pa.array(ids), "skey": pa.array(ks),
                         "n_tok": pa.array(n)})

    def block_local(t: pa.Table) -> pa.Table:
        n_rows = t.num_rows
        if not n_rows:
            z = pa.array([], type=pa.int64())
            return pa.table({"doc_id": z, "bkey": z, "bdoc": z,
                             "n_tok": z, "cum": z,
                             "is_carry": pa.array([], type=pa.bool_())})
        ids = np.asarray(one_chunk(t["doc_id"]), dtype=np.int64)
        ks = np.asarray(one_chunk(t["skey"]), dtype=np.int64)
        n = np.asarray(one_chunk(t["n_tok"]), dtype=np.int64)
        cum = np.cumsum(n)                       # inclusive
        bkey, bdoc = int(ks[0]), int(ids[0])     # block min under the sort
        return pa.table({
            "doc_id": pa.array(np.concatenate([ids, [bdoc]])),
            "bkey": pa.array(np.full(n_rows + 1, bkey, dtype=np.int64)),
            "bdoc": pa.array(np.full(n_rows + 1, bdoc, dtype=np.int64)),
            "n_tok": pa.array(np.concatenate([n, [0]])),
            "cum": pa.array(np.concatenate([cum, [int(cum[-1])]])),
            "is_carry": pa.array([False] * n_rows + [True]),
        })

    tagged = (docs.map_batches(key_rows, batch_format="pyarrow")
              .sort(["skey", "doc_id"])
              .map_batches(block_local, batch_format="pyarrow",
                           batch_size=None)).materialize()
    carries = sorted(
        ((r["bkey"], r["bdoc"], r["cum"])
         for r in tagged.map_batches(
             lambda t: t.filter(one_chunk(t["is_carry"])),
             batch_format="pyarrow").take_all()))
    bases, acc = {}, 0
    for bk, bd, total in carries:
        bases[(bk, bd)] = acc
        acc += total
    bases_ref = ray.put(bases)

    def keep_prefix(t: pa.Table) -> pa.Table:
        b = ray.get(bases_ref)
        sub = t.filter(pc.invert(one_chunk(t["is_carry"])))
        if sub.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"doc_id": z, "n_tok": z, "cum_tok": z})
        bk = np.asarray(one_chunk(sub["bkey"]), dtype=np.int64)
        bd = np.asarray(one_chunk(sub["bdoc"]), dtype=np.int64)
        cum = np.asarray(one_chunk(sub["cum"]), dtype=np.int64)
        pairs = np.stack([bk, bd], axis=1)
        uniq, inv = np.unique(pairs, axis=0, return_inverse=True)
        base = np.array([b[(int(x), int(y))] for x, y in uniq],
                        dtype=np.int64)[inv]
        g = base + cum
        keep = g <= budget_tokens
        return pa.table({"doc_id": one_chunk(sub["doc_id"]).filter(
                             pa.array(keep)),
                         "n_tok": one_chunk(sub["n_tok"]).filter(
                             pa.array(keep)),
                         "cum_tok": pa.array(g[keep])})

    return tagged.map_batches(keep_prefix, batch_format="pyarrow")


def group_token_budget(docs, budgets: dict, group_col: str = "lang",
                       seed: str = "budget"):
    """Per-GROUP token-budget truncation — the training-mixture enforcer:
    each group (language, source, domain) keeps the prefix of ITS seeded
    md5 order whose cumulative token count stays within ``budgets[group]``;
    groups without a budget are dropped (they are not in the mix).  The
    grouped generalization of :func:`token_budget_head`, same
    reproducibility contract (bigger budgets ⇒ supersets per group).

    Block-carry plan over ``sort(group, skey, doc_id)`` count rows: each
    sorted block splits into group RUNS, every run emits local inclusive
    cumsums tagged with the run's first (skey, doc_id) plus ONE carry row
    (group, first-key, run total); the driver orders each group's ≤
    #blocks carries and cumsums them into per-run bases — rows at the
    driver stay ≤ blocks × groups-per-block, texts never move.  The
    budgets dict is schema-sized and travels in the task closure.
    Returns (doc_id, group, n_tok, cum_tok) of kept docs.
    """
    import ray

    def key_rows(t: pa.Table) -> pa.Table:
        ids = np.asarray(one_chunk(t["doc_id"]), dtype=np.int64)
        flat, row_idx = _tokens_nonempty(t)
        n = np.zeros(t.num_rows, dtype=np.int64)
        if len(row_idx):
            np.add.at(n, row_idx, 1)
        ks = np.fromiter(
            (int.from_bytes(
                hashlib.md5(f"{seed}:{int(d)}".encode()).digest()[:8],
                "big") >> 1 for d in ids),
            dtype=np.int64, count=len(ids))
        return pa.table({"doc_id": pa.array(ids),
                         "grp": one_chunk(t[group_col]),
                         "skey": pa.array(ks), "n_tok": pa.array(n)})

    def block_local(t: pa.Table) -> pa.Table:
        n_rows = t.num_rows
        if not n_rows:
            z = pa.array([], type=pa.int64())
            return pa.table({"doc_id": z,
                             "grp": pa.array([], type=pa.string()),
                             "rkey": z, "rdoc": z, "n_tok": z, "cum": z,
                             "is_carry": pa.array([], type=pa.bool_())})
        ids = np.asarray(one_chunk(t["doc_id"]), dtype=np.int64)
        grp = np.asarray(one_chunk(t["grp"]))
        ks = np.asarray(one_chunk(t["skey"]), dtype=np.int64)
        n = np.asarray(one_chunk(t["n_tok"]), dtype=np.int64)
        # group runs within the (grp, skey, doc) sorted block
        change = np.nonzero(grp[1:] != grp[:-1])[0] + 1
        starts = np.concatenate([[0], change]).astype(np.int64)
        ends = np.concatenate([change, [n_rows]]).astype(np.int64)
        cum = np.cumsum(n)
        base = np.repeat(np.concatenate([[0], cum[ends[:-1] - 1]]),
                         ends - starts)
        local = cum - base                       # per-run inclusive cumsum
        rkey = np.repeat(ks[starts], ends - starts)
        rdoc = np.repeat(ids[starts], ends - starts)
        run_tot = local[ends - 1]
        return pa.table({
            "doc_id": pa.array(np.concatenate([ids, ids[starts]])),
            "grp": pa.array(np.concatenate([grp, grp[starts]])),
            "rkey": pa.array(np.concatenate([rkey, ks[starts]])),
            "rdoc": pa.array(np.concatenate([rdoc, ids[starts]])),
            "n_tok": pa.array(np.concatenate(
                [n, np.zeros(len(starts), dtype=np.int64)])),
            "cum": pa.array(np.concatenate([local, run_tot])),
            "is_carry": pa.array([False] * n_rows + [True] * len(starts)),
        })

    tagged = (docs.map_batches(key_rows, batch_format="pyarrow")
              .sort(["grp", "skey", "doc_id"])
              .map_batches(block_local, batch_format="pyarrow",
                           batch_size=None)).materialize()
    carries = sorted(
        ((r["grp"], r["rkey"], r["rdoc"], r["cum"])
         for r in tagged.map_batches(
             lambda t: t.filter(one_chunk(t["is_carry"])),
             batch_format="pyarrow").take_all()))
    bases, acc_by_grp = {}, {}
    for g, rk, rd, total in carries:
        bases[(g, rk, rd)] = acc_by_grp.get(g, 0)
        acc_by_grp[g] = acc_by_grp.get(g, 0) + total
    bases_ref = ray.put(bases)

    def keep_prefix(t: pa.Table) -> pa.Table:
        b = ray.get(bases_ref)
        sub = t.filter(pc.invert(one_chunk(t["is_carry"])))
        out_schema = {"doc_id": pa.int64(), "grp": pa.string(),
                      "n_tok": pa.int64(), "cum_tok": pa.int64()}
        if sub.num_rows == 0:
            return pa.table({c: pa.array([], type=ty)
                             for c, ty in out_schema.items()})
        grp = np.asarray(one_chunk(sub["grp"]))
        rk = np.asarray(one_chunk(sub["rkey"]), dtype=np.int64)
        rd = np.asarray(one_chunk(sub["rdoc"]), dtype=np.int64)
        cum = np.asarray(one_chunk(sub["cum"]), dtype=np.int64)
        trip = np.stack([rk, rd], axis=1)
        uniq, inv = np.unique(trip, axis=0, return_inverse=True)
        # run identity is (rkey, rdoc) — doc ids are unique, so the pair
        # cannot alias across groups; resolve per unique run
        first = np.full(len(uniq), len(inv), dtype=np.int64)
        np.minimum.at(first, inv, np.arange(len(inv)))
        base = np.array(
            [b[(grp[int(f)], int(x), int(y))]
             for (x, y), f in zip(uniq, first)], dtype=np.int64)[inv] \
            if len(uniq) else np.empty(0, dtype=np.int64)
        g_cum = base + cum
        uniq_g, inv_g = np.unique(grp, return_inverse=True)
        bud = np.array([budgets.get(str(x), -1) for x in uniq_g],
                       dtype=np.int64)[inv_g]
        keep = g_cum <= bud
        km = pa.array(keep)
        return pa.table({"doc_id": one_chunk(sub["doc_id"]).filter(km),
                         "grp": one_chunk(sub["grp"]).filter(km),
                         "n_tok": one_chunk(sub["n_tok"]).filter(km),
                         "cum_tok": pa.array(g_cum[keep])})

    return tagged.map_batches(keep_prefix, batch_format="pyarrow")


def detect_moved_pages(old_pages, new_pages, url_col: str = "url",
                       content_col: str = "text",
                       num_partitions: int = 8):
    """Cross-crawl MOVED-content detection: a page whose url disappeared
    from the old crawl while its exact content reappeared under a url new
    to the new crawl — the redirect-less site reorganizations a crawl
    maintainer wants to patch into the url-keyed resume state (otherwise
    every moved page re-extracts as "new").

    Plan (all exchanges carry ~50 B (url, md5) rows, texts never move):

    1. each side reduces per batch to (url, content md5) + the
       :func:`crawl_diff` null-key sentinel (this Ray build's join needs
       non-empty sides);
    2. ONE full-outer url join classifies urls; removed keep their OLD
       hash, added their NEW hash;
    3. per-hash Min(url) on each slice (deterministic pairing when a
       content blob had several urls);
    4. ONE inner hash join pairs removed×added on the content hash —
       each side unioned with a distinct never-matching sentinel row
       ("\\x00L" / "\\x00R"), so a move-free crawl pair yields an empty
       result instead of an empty-side join crash.
    Returns (content_md5, old_url, new_url).
    """
    import ray.data as rd

    from .joins import shuffle_hash_join

    def digests(suffix):
        def fn(t: pa.Table) -> pa.Table:
            texts = one_chunk(t[content_col]).to_pylist()
            hs = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in texts]
            return pa.table({"url": t[url_col],
                             "h" + suffix: pa.array(hs, type=pa.string())})
        return fn

    sent_old = rd.from_arrow(pa.table(
        {"url": pa.array([None], type=pa.string()),
         "h_old": pa.array(["\x00"], type=pa.string())}))
    sent_new = rd.from_arrow(pa.table(
        {"url": pa.array([None], type=pa.string()),
         "h_new": pa.array(["\x00"], type=pa.string())}))
    old_d = old_pages.map_batches(digests("_old"),
                                  batch_format="pyarrow").union(sent_old)
    new_d = new_pages.map_batches(digests("_new"),
                                  batch_format="pyarrow").union(sent_new)
    # Ray's full outer join COALESCES the equal-named key into one "url"
    # column: a removed row (right miss) carries the old url, an added
    # row (left miss) the new one — exactly the two urls the classifier
    # needs
    joined = shuffle_hash_join(old_d, new_d, on="url",
                               join_type="full_outer",
                               num_partitions=num_partitions)

    from ray.data.aggregate import Min

    def removed(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_null(one_chunk(t["h_new"])),
                       pc.is_valid(one_chunk(t["url"])))
        s = t.filter(keep)
        return pa.table({"h": s["h_old"], "old_url": s["url"]})

    def added(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_null(one_chunk(t["h_old"])),
                       pc.is_valid(one_chunk(t["url"])))
        s = t.filter(keep)
        return pa.table({"h2": s["h_new"], "new_url": s["url"]})

    joined = joined.materialize()
    rem = (joined.map_batches(removed, batch_format="pyarrow")
           .union(rd.from_arrow(pa.table(
               {"h": pa.array(["\x00L"]),
                "old_url": pa.array([""], type=pa.string())})))
           .groupby("h").aggregate(Min("old_url", alias_name="old_url")))
    add = (joined.map_batches(added, batch_format="pyarrow")
           .union(rd.from_arrow(pa.table(
               {"h2": pa.array(["\x00R"]),
                "new_url": pa.array([""], type=pa.string())})))
           .groupby("h2").aggregate(Min("new_url", alias_name="new_url")))
    pairs = shuffle_hash_join(rem, add, on="h", right_on="h2",
                              num_partitions=num_partitions)
    return pairs.map_batches(
        lambda t: pa.table({"content_md5": t["h"],
                            "old_url": t["old_url"],
                            "new_url": t["new_url"]}),
        batch_format="pyarrow")


def byte_pair_counts(docs, k: int = 20, text_col: str = "text"):
    """Top-``k`` adjacent byte pairs WITHIN tokens — the candidate table
    of the first BPE merge step (tokenizer induction over the corpus).
    A pair counts at every text position where neither byte is a space
    and the two bytes belong to the same document.

    Fully vectorized over Arrow's own byte layout: each batch's texts are
    viewed as one contiguous uint8 buffer (no copy), the pair id is
    ``256*b[i] + b[i+1]``, space-adjacent and document-edge positions are
    masked, and ONE ``np.bincount`` collapses the batch to ≤65536
    ``(pair_id, n)`` rows — the exchange is bounded by the alphabet
    squared, never the corpus.  Global ``groupby(pair_id)`` Sum, then the
    bounded-partial top-k (≤k rows per block to the driver).  Ties break
    by pair id ascending == byte-lexicographic pair order (ASCII).

    Returns pandas ``(rank, pair, n_occurrences)`` with ``pair`` as the
    2-character string.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        arr = pc.cast(
            t[text_col].combine_chunks()
            if isinstance(t[text_col], pa.ChunkedArray) else t[text_col],
            pa.large_utf8())
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int64,
                             count=len(arr) + 1, offset=8 * arr.offset)
        rel = (offs - offs[0]).astype(np.int64)
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8,
                             count=int(rel[-1]), offset=int(offs[0]))
        empty = pa.table({"pair_id": pa.array([], type=pa.int64()),
                          "n_partial": pa.array([], type=pa.int64())})
        L = int(rel[-1])
        if L < 2:
            return empty
        b1 = data[:-1].astype(np.int64)
        b2 = data[1:].astype(np.int64)
        ok = (b1 != 32) & (b2 != 32)
        # a pair at index i spans bytes (i, i+1); it crosses a document
        # edge exactly when i+1 is an interior doc start — O(#docs)
        # instead of an O(L log D) per-position searchsorted
        edge = rel[1:-1]
        edge = edge[(edge > 0) & (edge < L)]
        ok[edge - 1] = False
        if not ok.any():
            return empty
        cnt = np.bincount((b1[ok] << 8) | b2[ok], minlength=65536)
        nz = np.flatnonzero(cnt)
        return pa.table({"pair_id": pa.array(nz, type=pa.int64()),
                         "n_partial": pa.array(cnt[nz], type=pa.int64())})

    def block_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["n_occurrences", "pair_id"], ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = (docs.map_batches(partial, batch_format="pyarrow")
             .groupby("pair_id")
             .aggregate(Sum("n_partial", alias_name="n_occurrences"))
             .map_batches(block_topk, batch_format="pyarrow",
                          batch_size=None)
             .to_pandas())
    if "pair_id" not in parts.columns:
        parts = pd.DataFrame({"pair_id": pd.Series(dtype="int64"),
                              "n_occurrences": pd.Series(dtype="int64")})
    parts = parts.sort_values(["n_occurrences", "pair_id"],
                              ascending=[False, True]).head(k)
    ids = parts["pair_id"].to_numpy(dtype=np.int64)
    return pd.DataFrame({
        "rank": np.arange(1, len(parts) + 1, dtype=np.int64),
        "pair": [chr(i >> 8) + chr(i & 255) for i in ids],
        "n_occurrences": parts["n_occurrences"].to_numpy(),
    })


def collocation_lift(docs, k: int = 20, min_count: int = 5,
                     scale: int = 1000):
    """Top-``k`` collocations: adjacent-token bigrams ranked by exact
    integer LIFT — ``n_ab * N * scale // (n_a * n_b)`` where ``N`` is the
    corpus token count (lift ``scale`` = the pair co-occurs exactly as
    often as independence predicts; PMI's argument without the log, so
    integers stay exact).  Bigrams below ``min_count`` occurrences are
    noise-gated out.

    Plan: three combiner-first aggregations share one tokenize pass
    shape — (1) scalar ``N``; (2) unigram counts, ONE ``groupby(token)``
    whose result is vocabulary-sized and broadcasts once via ``ray.put``
    (the DSIR vocab-broadcast contract: |vocab| ≪ corpus, fits the object
    store); (3) bigram counts, ONE ``groupby(bigram)``.  Each grouped
    bigram block then joins the broadcast vocab twice (pyarrow C++ hash
    join on the split halves), computes lift vectorized, and forwards its
    own top-``k`` — the bounded-partial global top-k.

    int64 bound: ``n_ab * N * scale < 2**63`` — at web scale gate with a
    higher ``min_count``/smaller ``scale`` or run the lift step in 128-bit
    (DuckDB HUGEINT / Python int) over the ≤k×blocks candidate rows.

    Returns pandas ``(rank, bigram, n_ab, lift_scaled)``; ties break by
    lift desc, bigram asc.
    """
    import pandas as pd
    import ray

    from ray.data.aggregate import Sum

    def uni_partial(t: pa.Table) -> pa.Table:
        flat, _ = _tokens_nonempty(t)
        g = pa.table({"tok": flat}).group_by("tok") \
            .aggregate([([], "count_all")])
        return pa.table({"tok": g["tok"],
                         "n_partial": g["count_all"].cast(pa.int64())})

    uc = (docs.map_batches(uni_partial, batch_format="pyarrow")
          .groupby("tok").aggregate(Sum("n_partial", alias_name="n"))
          .materialize())
    n_total = int(uc.aggregate(Sum("n"))["sum(n)"] or 0)
    if n_total == 0:
        return pd.DataFrame({"rank": pd.Series(dtype="int64"),
                             "bigram": pd.Series(dtype=object),
                             "n_ab": pd.Series(dtype="int64"),
                             "lift_scaled": pd.Series(dtype="int64")})
    from ..arrowutil import collect_tables
    uc_ref = ray.put(collect_tables(uc))

    def bi_partial(t: pa.Table) -> pa.Table:
        flat, row_idx = _tokens_nonempty(t)
        if len(flat) < 2:
            return pa.table({"bigram": pa.array([], type=pa.string()),
                             "n_partial": pa.array([], type=pa.int64())})
        same_doc = row_idx[1:] == row_idx[:-1]
        joined = pc.binary_join_element_wise(
            flat.slice(0, len(flat) - 1), flat.slice(1), " ")
        g = pa.table({"bigram": joined.filter(pa.array(same_doc))}) \
            .group_by("bigram").aggregate([([], "count_all")])
        return pa.table({"bigram": g["bigram"],
                         "n_partial": g["count_all"].cast(pa.int64())})

    def block_lift_topk(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["n_ab"], min_count))
        if t.num_rows == 0:
            return pa.table({"bigram": pa.array([], type=pa.string()),
                             "n_ab": pa.array([], type=pa.int64()),
                             "lift_scaled": pa.array([], type=pa.int64())})
        halves = pc.split_pattern(one_chunk(t["bigram"]), " ")
        t = pa.table({"bigram": t["bigram"], "n_ab": t["n_ab"],
                      "w1": pc.list_element(halves, 0),
                      "w2": pc.list_element(halves, 1)})
        vocab = ray.get(uc_ref)
        t = t.join(vocab.rename_columns(["w1", "n_a"]), keys=["w1"])
        t = t.join(vocab.rename_columns(["w2", "n_b"]), keys=["w2"])
        n_ab = np.asarray(one_chunk(t["n_ab"]), dtype=np.int64)
        n_a = np.asarray(one_chunk(t["n_a"]), dtype=np.int64)
        n_b = np.asarray(one_chunk(t["n_b"]), dtype=np.int64)
        lift = n_ab * n_total * scale // (n_a * n_b)
        df = pd.DataFrame({
            "bigram": one_chunk(t["bigram"]).to_pandas(),
            "n_ab": n_ab, "lift_scaled": lift})
        df = df.sort_values(["lift_scaled", "bigram"],
                            ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = (docs.map_batches(bi_partial, batch_format="pyarrow")
             .groupby("bigram").aggregate(Sum("n_partial",
                                              alias_name="n_ab"))
             .map_batches(block_lift_topk, batch_format="pyarrow",
                          batch_size=None)
             .to_pandas())
    if "bigram" not in parts.columns:
        parts = pd.DataFrame({"bigram": pd.Series(dtype=object),
                              "n_ab": pd.Series(dtype="int64"),
                              "lift_scaled": pd.Series(dtype="int64")})
    parts = parts.sort_values(["lift_scaled", "bigram"],
                              ascending=[False, True]).head(k)
    return pd.DataFrame({
        "rank": np.arange(1, len(parts) + 1, dtype=np.int64),
        "bigram": parts["bigram"].to_numpy(),
        "n_ab": parts["n_ab"].to_numpy(),
        "lift_scaled": parts["lift_scaled"].to_numpy(),
    })


def continuation_counts(docs, k: int = 20):
    """Kneser-Ney continuation counts: for each token, the number of
    DISTINCT tokens that immediately precede it anywhere in the corpus —
    the quantity KN smoothing uses instead of raw frequency (how many
    contexts a word completes, not how often).  Returns the top-``k``
    tokens by continuation count (ties: token ascending) as pandas
    ``(rank, token, n_contexts)``.

    Plan: per batch, DISTINCT adjacent ``(prev, tok)`` pairs (one Arrow
    group_by over the same zero-copy token stream the bigram ops use —
    a stop-word costs its distinct predecessors per batch, never its
    occurrences); ONE ``groupby(prev, tok)`` dedups across batches; per
    batch of surviving pairs, ``(tok, 1)`` partials feed ONE
    ``groupby(tok)`` Sum; bounded-partial top-k.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    def pair_partial(t: pa.Table) -> pa.Table:
        flat, row_idx = _tokens_nonempty(t)
        if len(flat) < 2:
            return pa.table({"prev": pa.array([], type=pa.string()),
                             "tok": pa.array([], type=pa.string())})
        same_doc = row_idx[1:] == row_idx[:-1]
        keep = pa.array(same_doc)
        g = pa.table({"prev": flat.slice(0, len(flat) - 1).filter(keep),
                      "tok": flat.slice(1).filter(keep)}) \
            .group_by(["prev", "tok"]).aggregate([])
        return g

    from ray.data.aggregate import Count
    pairs = (docs.map_batches(pair_partial, batch_format="pyarrow")
             .groupby(["prev", "tok"]).aggregate(Count()))

    def tok_partial(t: pa.Table) -> pa.Table:
        g = pa.table({"token": t["tok"]}).group_by("token") \
            .aggregate([([], "count_all")])
        return pa.table({"token": g["token"],
                         "n_partial": g["count_all"].cast(pa.int64())})

    def block_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["n_contexts", "token"], ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = (pairs.map_batches(tok_partial, batch_format="pyarrow")
             .groupby("token")
             .aggregate(Sum("n_partial", alias_name="n_contexts"))
             .map_batches(block_topk, batch_format="pyarrow",
                          batch_size=None)
             .to_pandas())
    if "token" not in parts.columns:
        parts = pd.DataFrame({"token": pd.Series(dtype=object),
                              "n_contexts": pd.Series(dtype="int64")})
    parts = parts.sort_values(["n_contexts", "token"],
                              ascending=[False, True]).head(k)
    return pd.DataFrame({
        "rank": np.arange(1, len(parts) + 1, dtype=np.int64),
        "token": parts["token"].to_numpy(),
        "n_contexts": parts["n_contexts"].to_numpy(),
    })


def co_citation_counts(pages, url_col: str = "url",
                       text_col: str = "text", k: int = 20):
    """Co-citation projection of the crawl graph: top-``k`` host PAIRS
    most often linked from the same page (the bipartite page→host graph
    projected onto hosts — the classic "related domains" signal).
    A pair counts once per citing page regardless of link multiplicity;
    pair order is canonical (lexicographically smaller host first).

    Per batch: the shared link explode + host kernels, then per-page
    DISTINCT dst hosts via one lexsort, then all within-page pairs
    emitted with vectorized repeat/arange segment arithmetic (fan-out
    bounded by links-per-page², a per-PAGE property independent of
    corpus size), combined with an Arrow group_by before the ONE
    ``groupby(pair)`` Sum.  Bounded-partial top-k (count desc, hosts
    asc).  Returns pandas ``(rank, host_a, host_b, n_pages)``.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    from ..arrowutil import one_chunk
    from .skew import _hosts_vec

    empty = pa.table({"host_a": pa.array([], type=pa.string()),
                      "host_b": pa.array([], type=pa.string()),
                      "n": pa.array([], type=pa.int64())})

    def partial(t: pa.Table) -> pa.Table:
        rows, _, sub = _explode_links(one_chunk(t[text_col]), t.num_rows)
        if not len(rows):
            return empty
        dst = _hosts_vec(pc.struct_field(sub, "href"))
        d = np.asarray(dst.to_pandas(), dtype=object)
        r = np.asarray(rows, dtype=np.int64)
        # distinct (page, host): lexsort + boundary mask
        order = np.lexsort((d.astype(str), r))
        r, d = r[order], d[order]
        keep = np.ones(len(r), dtype=bool)
        keep[1:] = (r[1:] != r[:-1]) | (d[1:] != d[:-1])
        r, d = r[keep], d[keep]
        # within-page pair fan-out: for a page with m hosts emit
        # m*(m-1)/2 (i<j) pairs via repeat/arange segment arithmetic
        new_pg = np.ones(len(r), dtype=bool)
        new_pg[1:] = r[1:] != r[:-1]
        seg_start = np.flatnonzero(new_pg)
        seg_len = np.diff(np.append(seg_start, len(r)))
        m = seg_len
        n_pairs = (m * (m - 1)) // 2
        if n_pairs.sum() == 0:
            return empty
        # fully vectorized (i, j) i<j fan-out: each row pairs with every
        # LATER row of its segment — repeat + grouped-arange cumsum trick
        seg_end = np.repeat(seg_start + m, m)
        row_idx = np.arange(len(r), dtype=np.int64)
        cnt = seg_end - row_idx - 1
        a_idx = np.repeat(row_idx, cnt)
        grp_start = np.cumsum(cnt) - cnt
        offs = np.arange(int(cnt.sum()), dtype=np.int64) \
            - np.repeat(grp_start, cnt)
        b_idx = a_idx + 1 + offs
        ha, hb = d[a_idx], d[b_idx]
        swap = ha > hb
        ha2 = np.where(swap, hb, ha)
        hb2 = np.where(swap, ha, hb)
        g = pa.table({"host_a": pa.array(ha2.astype(str)),
                      "host_b": pa.array(hb2.astype(str))}) \
            .group_by(["host_a", "host_b"]).aggregate([([], "count_all")])
        return pa.table({"host_a": g["host_a"], "host_b": g["host_b"],
                         "n": g["count_all"].cast(pa.int64())})

    def block_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["n_pages", "host_a", "host_b"],
            ascending=[False, True, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = (pages.map_batches(partial, batch_format="pyarrow")
             .groupby(["host_a", "host_b"])
             .aggregate(Sum("n", alias_name="n_pages"))
             .map_batches(block_topk, batch_format="pyarrow",
                          batch_size=None)
             .to_pandas())
    if "host_a" not in parts.columns:
        parts = pd.DataFrame({"host_a": pd.Series(dtype=object),
                              "host_b": pd.Series(dtype=object),
                              "n_pages": pd.Series(dtype="int64")})
    parts = parts.sort_values(["n_pages", "host_a", "host_b"],
                              ascending=[False, True, True]).head(k)
    return pd.DataFrame({
        "rank": np.arange(1, len(parts) + 1, dtype=np.int64),
        "host_a": parts["host_a"].to_numpy(),
        "host_b": parts["host_b"].to_numpy(),
        "n_pages": parts["n_pages"].to_numpy(),
    })


def lang_vocab_overlap(docs, lang_col: str = "lang"):
    """Vocabulary-overlap matrix between language slices: for every
    language pair, the number of SHARED distinct tokens, the union size,
    and the exact Jaccard permille — the cross-lingual contamination /
    script-mix audit (a "French" slice sharing most of its vocabulary
    with the English slice is mislabeled).

    Plan — the bitmask-histogram trick, so pair counts never require a
    token-level self-join: (1) per-batch DISTINCT ``(token, lang)``
    pairs; (2) ONE ``groupby(token, lang)`` dedup — after it every pair
    exists exactly once, so (3) per-batch ``(token, 2^lang_idx)``
    partials into ONE ``groupby(token)`` Sum compute each token's exact
    language BITMASK (sum of distinct powers == bitwise OR); (4) a
    ≤2^|langs| mask histogram reduces per batch, and every pairwise
    intersection/union is driver arithmetic over ≤2^|langs| scalar rows.
    |langs| is schema-small by contract (≤20 for the mask to stay cheap;
    the histogram is exact at any corpus size).

    Returns pandas ``(lang_a, lang_b, n_shared, n_union,
    jaccard_permille)`` over all pairs lang_a < lang_b.
    """
    import pandas as pd
    from ray.data.aggregate import Count, Sum

    def pair_partial(t: pa.Table) -> pa.Table:
        flat, row_idx = _tokens_nonempty(t)
        langs = (t[lang_col].combine_chunks()
                 if isinstance(t[lang_col], pa.ChunkedArray)
                 else t[lang_col])
        lv = np.asarray(langs.to_pandas(), dtype=object)
        g = pa.table({"token": flat,
                      "lang": pa.array(lv[row_idx].astype(str))}) \
            .group_by(["token", "lang"]).aggregate([])
        return g

    pairs = (docs.map_batches(pair_partial, batch_format="pyarrow")
             .groupby(["token", "lang"]).aggregate(Count())
             .materialize())
    langs = sorted(set(
        pairs.groupby("lang").count().to_pandas()["lang"]))
    if len(langs) > 20:
        raise ValueError("lang_vocab_overlap: too many language slices "
                         "for the bitmask histogram (max 20)")
    lidx = {g: i for i, g in enumerate(langs)}

    def bit_partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        lv = (t["lang"].combine_chunks()
              if isinstance(t["lang"], pa.ChunkedArray)
              else t["lang"]).to_pandas()
        bits = lv.map(lidx).to_numpy(dtype=np.int64)
        return pa.table({"token": t["token"],
                         "b": pa.array(np.int64(1) << bits)})

    masks = (pairs.map_batches(bit_partial, batch_format="pyarrow")
             .groupby("token").aggregate(Sum("b", alias_name="mask")))

    def mask_hist(t: pa.Table) -> pa.Table:
        m = np.asarray(t["mask"].combine_chunks()
                       if isinstance(t["mask"], pa.ChunkedArray)
                       else t["mask"], dtype=np.int64)
        cnt = np.bincount(m, minlength=1 << len(langs))
        nz = np.flatnonzero(cnt)
        return pa.table({"mask": pa.array(nz.astype(np.int64)),
                         "n": pa.array(cnt[nz].astype(np.int64))})

    hist = (masks.map_batches(mask_hist, batch_format="pyarrow")
            .groupby("mask").aggregate(Sum("n", alias_name="n"))
            .to_pandas())
    hm = dict(zip(hist["mask"].astype(int), hist["n"].astype(int))) \
        if "mask" in hist.columns else {}

    rows = []
    for i, a in enumerate(langs):
        for j in range(i + 1, len(langs)):
            b = langs[j]
            shared = sum(n for m, n in hm.items()
                         if (m >> i) & 1 and (m >> j) & 1)
            union = sum(n for m, n in hm.items()
                        if (m >> i) & 1 or (m >> j) & 1)
            rows.append((a, b, shared, union,
                         shared * 1000 // union if union else 0))
    return pd.DataFrame(rows, columns=["lang_a", "lang_b", "n_shared",
                                       "n_union", "jaccard_permille"]) \
        .astype({"n_shared": "int64", "n_union": "int64",
                 "jaccard_permille": "int64"})


def hapax_stats_by_lang(docs):
    """Per-language hapax-legomena statistics — how much of each
    language's vocabulary occurs exactly once in the corpus (the
    classic lexical-richness / OCR-noise signal: junk tokens are
    overwhelmingly hapaxes).  Returns (lang, n_hapax, vocab_size),
    exact int64.

    Combiner-first: each batch collapses its (lang, token) occurrences
    with an Arrow ``group_by`` before the ONE wide exchange
    (``groupby(lang, token).Sum``); hapax-ness then needs only the
    summed count per type, so the second exchange carries exactly
    |langs| rows of per-batch (n_hapax, vocab) partials.  No token
    list ever reaches the driver.
    """
    from ray.data.aggregate import Sum

    from ..arrowutil import one_chunk

    def pair_counts(t: pa.Table) -> pa.Table:
        flat, row_idx = _tokens_nonempty(t)
        langs = np.asarray(one_chunk(t["lang"]))
        g = pa.table({"lang": pa.array(langs[row_idx].astype(object),
                                       type=pa.string()),
                      "token": flat}) \
            .group_by(["lang", "token"]).aggregate([([], "count_all")])
        return g.select(["lang", "token", "count_all"]) \
            .rename_columns(["lang", "token", "n"])

    types = (docs.map_batches(pair_counts, batch_format="pyarrow")
             .groupby(["lang", "token"]).aggregate(Sum("n", alias_name="n")))

    def partial(t: pa.Table) -> pa.Table:
        n = np.asarray(one_chunk(t["n"]))
        g = pa.table({"lang": t["lang"],
                      "h": pa.array((n == 1).astype(np.int64)),
                      "v": pa.array(np.ones(len(n), dtype=np.int64))}) \
            .group_by("lang").aggregate([("h", "sum"), ("v", "sum")])
        return g.select(["lang", "h_sum", "v_sum"]) \
            .rename_columns(["lang", "h", "v"])

    return (types.map_batches(partial, batch_format="pyarrow")
            .groupby("lang")
            .aggregate(Sum("h", alias_name="n_hapax"),
                       Sum("v", alias_name="vocab_size")))


def url_pattern_counts(pages, url_col: str = "url"):
    """Crawler-trap detector: collapse every digit run in the URL to
    ``N`` and count pages per (host, pattern) — a calendar/session-id
    trap shows up as one pattern with a pathological count while real
    content spreads over many.  One RE2 ``replace_substring_regex`` +
    the shared host kernel per batch, per-batch combiner, ONE groupby.
    Returns (host, pattern, n_pages).
    """
    from ray.data.aggregate import Sum

    from ..arrowutil import one_chunk
    from .skew import _hosts_vec

    def partial(t: pa.Table) -> pa.Table:
        urls = one_chunk(t[url_col])
        pat = pc.replace_substring_regex(urls, r"\d+", "N")
        g = pa.table({"host": _hosts_vec(urls), "pattern": pat}) \
            .group_by(["host", "pattern"]).aggregate([([], "count_all")])
        return g.select(["host", "pattern", "count_all"]) \
            .rename_columns(["host", "pattern", "n"])

    return (pages.map_batches(partial, batch_format="pyarrow")
            .groupby(["host", "pattern"])
            .aggregate(Sum("n", alias_name="n_pages")))


def token_budget_allocation(docs, budget: int, group_col: str = "lang"):
    """Largest-remainder budget split: allocate an integer token budget
    across groups proportionally to their exact token counts —
    ``base = budget·n//total`` per group, the ``budget − Σbase``
    leftover units going to the largest remainders (ties to the smaller
    group name): the standard seat-apportionment rule, used to pin
    per-source quotas for a mixture before sampling.  Exact integers
    end to end, deterministic under any block split.

    Per-batch token-count combiner → ONE |groups|-row groupby; the
    apportionment itself runs on the ≤|groups|-row result (driver-side
    by contract, like every |groups|-bounded decision in the repo).
    Returns pandas (group, n_tokens, quota).
    """
    from ray.data.aggregate import Sum

    from ..arrowutil import one_chunk

    def partial(t: pa.Table) -> pa.Table:
        flat, row_idx = _tokens_nonempty(t)
        langs = np.asarray(one_chunk(t[group_col]))
        g = pa.table({"group": pa.array(langs[row_idx].astype(object),
                                        type=pa.string())}) \
            .group_by("group").aggregate([([], "count_all")])
        return g.select(["group", "count_all"]) \
            .rename_columns(["group", "n"])

    counts = (docs.map_batches(partial, batch_format="pyarrow")
              .groupby("group").aggregate(Sum("n", alias_name="n_tokens"))
              .to_pandas().sort_values("group").reset_index(drop=True))
    n = counts["n_tokens"].to_numpy().astype(np.int64)
    total = int(n.sum())
    base = budget * n // total
    rem = budget * n - base * total        # remainder numerators
    leftover = budget - int(base.sum())
    # rank by (remainder desc, group asc); counts is group-sorted already
    order = np.lexsort((np.arange(len(n)), -rem))
    quota = base.copy()
    quota[order[:leftover]] += 1
    counts["quota"] = quota
    return counts


def verbose_docs_vs_lang_median(docs):
    """Docs more than 1.5× as long (in tokens) as their language's
    exact median — the "suspiciously verbose for its language" outlier
    gate, a cross-multiplied integer comparison (``2·n_tokens >
    3·median``) against medians from the streaming grouped radix-select
    (:func:`..stages.aggs.exact_kth_by_group`; no sort, no per-group
    collect).  Two passes over a 3-column reduced stream; medians ride
    the closure.  Returns (doc_id, lang, n_tokens, lang_median).
    """
    from ray.data.aggregate import Count

    from ..arrowutil import one_chunk
    from .aggs import exact_kth_by_group

    def reduce(t: pa.Table) -> pa.Table:
        flat, row_idx = _tokens_nonempty(t)
        n = np.bincount(row_idx, minlength=t.num_rows).astype(np.int64)
        return pa.table({"doc_id": t["doc_id"], "lang": t["lang"],
                         "value": pa.array(n.astype(np.float64))})

    red = docs.map_batches(reduce, batch_format="pyarrow").materialize()
    counts = red.groupby("lang").count().to_pandas()
    ranks = {str(r["lang"]): (int(r["count()"]) + 1) // 2
             for _, r in counts.iterrows()}
    med = exact_kth_by_group(red, "lang", "value", ranks)
    gkeys = np.asarray(med["group"], dtype=str)
    gmeds = np.asarray(med["value"], dtype=np.float64).astype(np.int64)

    def flag(t: pa.Table) -> pa.Table:
        langs = np.asarray(one_chunk(t["lang"]), dtype=str)
        v = np.asarray(one_chunk(t["value"])).astype(np.int64)
        m = gmeds[np.searchsorted(gkeys, langs)]
        keep = 2 * v > 3 * m
        return pa.table({"doc_id": one_chunk(t["doc_id"]).filter(
                             pa.array(keep)),
                         "lang": one_chunk(t["lang"]).filter(
                             pa.array(keep)),
                         "n_tokens": pa.array(v[keep]),
                         "lang_median": pa.array(m[keep])})

    return red.map_batches(flag, batch_format="pyarrow")


def vocab_coverage_curve(docs, max_log2: int = 30):
    """Vocabulary coverage curve — how much of the token stream the top
    2^i most-frequent types cover, for every power-of-two rank up to
    just past the vocabulary size: the tokenizer-budget planning signal
    (rank order: count DESC, token ASC).  Returns
    (rank_cut, cum_occurrences, cum_permille), permille by integer
    floor division.

    Fully distributed — the vocabulary is never materialized anywhere:
    combiner token counts, ONE (n desc, token) range sort, the
    :func:`..stages.aggs.global_value_rank` block-offset zipWithIndex
    (driver state = |blocks| rows), then each block collapses to at
    most |cuts| ≈ log₂(V) partial rows (cut, Σ n over ranks ≤ cut) and
    one tiny groupby Sum finishes.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        flat, _ = _tokens_nonempty(t)
        g = pa.table({"token": flat}).group_by("token") \
            .aggregate([([], "count_all")])
        return pa.table({"token": g["token"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    counts = (docs.map_batches(partial, batch_format="pyarrow")
              .groupby("token").aggregate(Sum("n", alias_name="n")))

    srt = counts.map_batches(
        lambda t: pa.table({"token": t["token"], "n": t["n"]}),
        batch_format="pyarrow") \
        .sort(["n", "token"], descending=[True, False]).materialize()

    def block_meta(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"k_n": pa.array([], type=pa.int64()),
                             "k_tok": pa.array([], type=pa.string()),
                             "rows": pa.array([], type=pa.int64())})
        return pa.table({
            "k_n": pa.array([one_chunk(t["n"])[0].as_py()],
                            type=pa.int64()),
            "k_tok": pa.array([one_chunk(t["token"])[0].as_py()],
                              type=pa.string()),
            "rows": pa.array([t.num_rows], type=pa.int64())})

    meta = srt.map_batches(block_meta, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    meta = meta.sort_values(["k_n", "k_tok"],
                            ascending=[False, True]).reset_index(drop=True)
    offsets = np.concatenate([[0], meta["rows"].cumsum().to_numpy()[:-1]]) \
        .astype(np.int64)
    key_n = meta["k_n"].to_numpy().astype(np.int64)
    key_t = meta["k_tok"].to_numpy()
    vocab_size = int(meta["rows"].sum())
    cuts = np.array([1 << i for i in range(max_log2 + 1)
                     if i == 0 or (1 << (i - 1)) < vocab_size],
                    dtype=np.int64)

    def cut_partials(t: pa.Table) -> pa.Table:
        empty = pa.table({"rank_cut": pa.array([], type=pa.int64()),
                          "cum_occurrences": pa.array([], type=pa.int64())})
        if t.num_rows == 0:
            return empty
        n0 = one_chunk(t["n"])[0].as_py()
        t0 = one_chunk(t["token"])[0].as_py()
        i = 0
        while key_n[i] != n0 or key_t[i] != t0:
            i += 1
        ranks = offsets[i] + np.arange(1, t.num_rows + 1, dtype=np.int64)
        nv = np.asarray(one_chunk(t["n"])).astype(np.int64)
        csum = np.cumsum(nv)
        pos = np.searchsorted(ranks, cuts, side="right")
        live = pos > 0
        return pa.table({"rank_cut": pa.array(cuts[live]),
                         "cum_occurrences": pa.array(csum[pos[live] - 1])})

    curve = (srt.map_batches(cut_partials, batch_format="pyarrow",
                             batch_size=None)
             .groupby("rank_cut")
             .aggregate(Sum("cum_occurrences",
                            alias_name="cum_occurrences")))
    def finish(t: pa.Table, _tot: int) -> pa.Table:
        cum = np.asarray(one_chunk(t["cum_occurrences"])).astype(np.int64)
        return pa.table({
            "rank_cut": t["rank_cut"],
            "cum_occurrences": t["cum_occurrences"],
            "cum_permille": pa.array(cum * 1000 // _tot)})

    grand = int(srt.sum("n"))
    import functools
    return curve.map_batches(functools.partial(finish, _tot=grand),
                             batch_format="pyarrow")


def kmv_vocab_sample(docs, k: int = 64):
    """KMV (k-minimum-values) distinct sample of the corpus vocabulary
    — the k DISTINCT tokens with the smallest 63-bit md5 hashes: a
    deterministic, mergeable, SQL-recomputable sketch whose k-th value
    also estimates the vocabulary NDV (the classic bottom-k
    estimator).  Returns (hash63, token), the k smallest.

    Combiner-first: per batch, distinct tokens hash once
    (:func:`md5_u64` — the unique-set loop) and only the batch's k
    smallest survive; the global merge is one ≤ k·blocks-row
    ``sort().limit(k)``.  No vocabulary ever materializes.
    """
    def partial(t: pa.Table) -> pa.Table:
        flat, _ = _tokens_nonempty(t)
        toks = np.unique(np.asarray(flat, dtype=object).astype(str))
        if len(toks) == 0:
            return pa.table({"hash63": pa.array([], type=pa.int64()),
                             "token": pa.array([], type=pa.string())})
        hv = (md5_u64(toks) >> np.uint64(1)).astype(np.int64)
        order = np.argsort(hv)[:k]
        return pa.table({
            "hash63": pa.array(hv[order]),
            "token": pa.array(toks[order].astype(object),
                              type=pa.string())})

    merged = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby(["hash63", "token"]).count() \
        .drop_columns(["count()"])
    return merged.sort("hash63").limit(k)


def template_clusters(docs, min_pages: int = 2):
    """Templated-page detection — pages whose TEXT STRUCTURE is
    identical after every alphanumeric run collapses to ``#`` (the
    boilerplate-mill signature: nav shells, listing pages, galleries
    differ only in the filled-in words).  Returns one row per template
    with at least ``min_pages`` members: (template_hash63, n_pages).

    Pure combiner pipeline: the normalization is ONE RE2
    ``replace_substring_regex`` per batch, the hash is
    :func:`md5_u64` over the batch's DISTINCT normalized forms, and
    the exchange carries (hash, count) partials — one tiny groupby
    Sum, then a vectorized threshold filter.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        norm = pc.replace_substring_regex(one_chunk(t["text"]),
                                          pattern="[a-zA-Z0-9]+",
                                          replacement="#")
        arr = np.asarray(norm, dtype=object).astype(str)
        uniq, cnt = np.unique(arr, return_counts=True)
        hv = (md5_u64(uniq) >> np.uint64(1)).astype(np.int64)
        return pa.table({"template_hash63": pa.array(hv),
                         "n_pages": pa.array(cnt.astype(np.int64))})

    agg = (docs.map_batches(partial, batch_format="pyarrow")
           .groupby("template_hash63")
           .aggregate(Sum("n_pages", alias_name="n_pages")))

    def gate(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["n_pages"], min_pages))

    return agg.map_batches(gate, batch_format="pyarrow")


def internal_link_ratio(pages, url_col: str = "url",
                        text_col: str = "text"):
    """Internal-vs-external outlink split per source host — the
    site-insularity metric crawl schedulers use (a host that mostly
    links to itself gets budget differently from a hub).  Returns
    (src_host, n_internal, n_external).

    Rides :func:`host_link_graph`'s combiner edges: the flag is one
    vectorized equality on the (src, dst) pair, the exchange carries
    the two counters per host per batch.
    """
    from ray.data.aggregate import Sum

    edges = host_link_graph(pages, url_col=url_col, text_col=text_col)

    def split(t: pa.Table) -> pa.Table:
        same = np.asarray(pc.equal(one_chunk(t["src_host"]),
                                   one_chunk(t["dst_host"])))
        n = np.asarray(one_chunk(t["n_links"])).astype(np.int64)
        return pa.table({
            "src_host": t["src_host"],
            "n_internal": pa.array(np.where(same, n, 0)),
            "n_external": pa.array(np.where(same, 0, n))})

    return (edges.map_batches(split, batch_format="pyarrow")
            .groupby("src_host")
            .aggregate(Sum("n_internal", alias_name="n_internal"),
                       Sum("n_external", alias_name="n_external")))


def source_minhash_signatures(docs, n_slots: int = 16):
    """Per-source MinHash signature over the source's DISTINCT token
    set — sig(source, slot) = min over tokens of
    ``md5_u64(slot || ':' || token) >> 1``: the set-similarity sketch
    (P[sig_a = sig_b] = Jaccard(A, B)) in the repo's SQL-recomputable
    hash, so unlike the banded doc-level LSH this one is EXACTLY
    oracle-checkable.  Returns (source, slot, sig63).

    Combiner-first: each batch hashes its distinct (slot, token)
    strings once (:func:`md5_u64`'s unique-set loop) and emits one
    candidate min per (source, slot); ONE groupby Min finishes —
    |sources| × n_slots rows total.
    """
    from ray.data.aggregate import Min

    def partial(t: pa.Table) -> pa.Table:
        flat, row_idx = _tokens_nonempty(t)
        src = np.asarray(one_chunk(t["source"]),
                         dtype=object)[row_idx].astype(str)
        toks = np.asarray(flat, dtype=object).astype(str)
        pair = np.char.add(np.char.add(src, "\x01"), toks)
        uniq = np.unique(pair)
        i = np.char.find(uniq, "\x01")
        srcs = np.array([u[:k] for u, k in zip(uniq, i)], dtype=object)
        tks = np.array([u[k + 1:] for u, k in zip(uniq, i)],
                       dtype=object)
        out_s, out_slot, out_sig = [], [], []
        for slot in range(n_slots):
            hv = (md5_u64(np.char.add(f"{slot}:", tks.astype(str)))
                  >> np.uint64(1)).astype(np.int64)
            su, inv = np.unique(srcs.astype(str), return_inverse=True)
            mins = np.full(len(su), np.iinfo(np.int64).max, np.int64)
            np.minimum.at(mins, inv, hv)
            out_s.append(su.astype(object))
            out_slot.append(np.full(len(su), slot, np.int64))
            out_sig.append(mins)
        return pa.table({
            "source": pa.array(np.concatenate(out_s),
                               type=pa.string()),
            "slot": pa.array(np.concatenate(out_slot)),
            "sig63": pa.array(np.concatenate(out_sig))})

    return (docs.map_batches(partial, batch_format="pyarrow")
            .groupby(["source", "slot"])
            .aggregate(Min("sig63", alias_name="sig63")))


def source_similarity_pairs(docs, n_slots: int = 16):
    """Estimated Jaccard between every source pair from the MinHash
    signatures — ``n_equal_slots / n_slots`` is the unbiased
    set-similarity estimate (:func:`source_minhash_signatures`
    provides the exactly-oracled signatures; this is the pairing
    pass).  Returns (source_a, source_b, n_equal_slots) for pairs
    agreeing on ≥ 1 slot, a < b.

    The signature table is |sources| × n_slots BY CONSTRUCTION, so
    the pairing folds driver-side over the aggregated sketch — at web
    scale the signatures (not the corpora) are what pairwise work
    touches, which is the entire point of sketching first.
    """
    import pandas as pd

    sig = source_minhash_signatures(docs, n_slots=n_slots).to_pandas()
    j = sig.merge(sig, on=["slot", "sig63"], suffixes=("_a", "_b"))
    j = j[j["source_a"] < j["source_b"]]
    out = (j.groupby(["source_a", "source_b"]).size()
           .reset_index(name="n_equal_slots")
           .sort_values(["source_a", "source_b"])
           .reset_index(drop=True))
    return pa.table({
        "source_a": pa.array(out["source_a"], type=pa.string()),
        "source_b": pa.array(out["source_b"], type=pa.string()),
        "n_equal_slots": pa.array(
            out["n_equal_slots"].to_numpy().astype(np.int64))})


def source_mix_plan(docs, cap_tokens: int = 100_000):
    """Capped-proportional data-mixing allocator: per source, the token
    inventory and the mixing weight an LLM training run would sample it
    at — ``weight = min(n_tokens, cap)`` (source capping prevents one
    crawl from dominating the mix; the standard alternative to
    temperature sampling, exact in integers).  Returns
    (source, n_docs, n_tokens, capped_tokens, mix_permille).

    One combiner groupby(source) carries (n_docs, n_tokens) partials;
    the permille normalisation folds over the |sources|-row result in a
    single block (sources ≪ docs by corpus contract — the same
    margins-over-cells bound as ``type_weekday_contingency``).
    Tokenizer contract: single-space split INCLUDING empty tokens,
    matching ``token_stats``.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.list_value_length(
            pc.split_pattern(one_chunk(t["text"]), " ")).cast(pa.int64())
        g = pa.table({"source": t["source"], "n_tok": toks}) \
            .group_by("source").aggregate(
                [([], "count_all"), ("n_tok", "sum")])
        return pa.table({"source": g["source"],
                         "d_p": g["count_all"].cast(pa.int64()),
                         "t_p": g["n_tok_sum"].cast(pa.int64())})

    def finalize(t: pa.Table) -> pa.Table:
        tok = np.asarray(one_chunk(t["n_tokens"])).astype(np.int64)
        capped = np.minimum(tok, cap_tokens)
        total = int(capped.sum())
        mix = 1000 * capped // max(total, 1)
        return pa.table({
            "source": one_chunk(t["source"]),
            "n_docs": one_chunk(t["n_docs"]),
            "n_tokens": pa.array(tok),
            "capped_tokens": pa.array(capped),
            "mix_permille": pa.array(mix)})

    return (docs.map_batches(partial, batch_format="pyarrow")
            .groupby("source")
            .aggregate(Sum("d_p", alias_name="n_docs"),
                       Sum("t_p", alias_name="n_tokens"))
            .repartition(1)
            .map_batches(finalize, batch_format="pyarrow",
                         batch_size=None))


def dup_rate_by_source(docs):
    """Within-source duplicate rate: per source the document count, the
    distinct-text count (md5 identity, the repo dedup key) and the
    duplicate fraction in permille — the boilerplate health metric a
    crawl operator watches per feed.

    ONE exchange: per-batch ``group_by(source, hash)`` collapses
    repeats, the global ``groupby`` merges (source, hash) partials, and
    a second per-batch combiner + tiny groupby(source) folds distinct
    counts — duplicates never travel.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        h = md5_u64(one_chunk(t["text"])).astype(np.int64)
        g = pa.table({"source": t["source"], "h": pa.array(h)}) \
            .group_by(["source", "h"]).aggregate([([], "count_all")])
        return pa.table({"source": g["source"], "h": g["h"],
                         "n_p": g["count_all"].cast(pa.int64())})

    def per_source(t: pa.Table) -> pa.Table:
        g = t.group_by("source").aggregate(
            [([], "count_all"), ("n", "sum")])
        return pa.table({"source": g["source"],
                         "u_p": g["count_all"].cast(pa.int64()),
                         "d_p": g["n_sum"].cast(pa.int64())})

    def finalize(t: pa.Table) -> pa.Table:
        n = np.asarray(one_chunk(t["n_docs"])).astype(np.int64)
        u = np.asarray(one_chunk(t["n_distinct"])).astype(np.int64)
        return t.append_column(
            "dup_permille",
            pa.array(1000 * (n - u) // np.maximum(n, 1)))

    return (docs.map_batches(partial, batch_format="pyarrow")
            .groupby(["source", "h"])
            .aggregate(Sum("n_p", alias_name="n"))
            .map_batches(per_source, batch_format="pyarrow")
            .groupby("source")
            .aggregate(Sum("u_p", alias_name="n_distinct"),
                       Sum("d_p", alias_name="n_docs"))
            .map_batches(finalize, batch_format="pyarrow"))


def interleave_order(docs, cap_tokens: int = 100_000,
                     scale: int = 1_048_576):
    """Deterministic stride-interleaved TRAINING ORDER over the capped
    source mix (:func:`source_mix_plan`'s weights made into a schedule):
    document ``i`` of source ``s`` trains at virtual time
    ``i·scale // w_s``, so heavier sources appear proportionally more
    often and every run replays the identical order.  Returns
    (doc_id, source, vtime, global_pos).

    Three exchanges, all block-bounded at the driver: a grouped
    zipWithIndex (rank within source, by doc_id), a vectorized vtime
    projection against the broadcast |sources|-row weight table, and a
    global zipWithIndex over the unique (vtime, source, rk) total
    order.  Integer bound: ``rank·scale`` must stay inside int64 —
    ranks to ~8.8e12 at the default scale.
    """
    from ray.data.aggregate import Sum

    from .aggs import grouped_zip_index

    def tok_partial(t: pa.Table) -> pa.Table:
        toks = pc.list_value_length(
            pc.split_pattern(one_chunk(t["text"]), " ")).cast(pa.int64())
        g = pa.table({"source": t["source"], "n_tok": toks}) \
            .group_by("source").aggregate([("n_tok", "sum")])
        return pa.table({"source": g["source"],
                         "t_p": g["n_tok_sum"].cast(pa.int64())})

    weights = (docs.map_batches(tok_partial, batch_format="pyarrow")
               .groupby("source")
               .aggregate(Sum("t_p", alias_name="n_tokens"))
               .to_pandas())
    w_of = {s: max(1, min(int(n), cap_tokens))
            for s, n in zip(weights["source"], weights["n_tokens"])}

    ranked = grouped_zip_index(
        docs.select_columns(["doc_id", "source"]), "source", "doc_id")

    def vtime(t: pa.Table) -> pa.Table:
        src = one_chunk(t["source"]).to_numpy(zero_copy_only=False)
        rk = np.asarray(one_chunk(t["rk"])).astype(np.int64)
        uniq, inv = np.unique(src, return_inverse=True)
        w = np.fromiter((w_of[s] for s in uniq), dtype=np.int64,
                        count=len(uniq))[inv]
        return pa.table({"doc_id": t["doc_id"], "source": t["source"],
                         "rk": t["rk"],
                         "vtime": pa.array(rk * scale // w)})

    vt = ranked.map_batches(vtime, batch_format="pyarrow") \
        .sort(["vtime", "source", "rk"]).materialize()

    def block_meta(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"k_v": pa.array([], type=pa.int64()),
                             "k_s": pa.array([], type=pa.string()),
                             "k_r": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        return pa.table({
            "k_v": pa.array([one_chunk(t["vtime"])[0].as_py()],
                            type=pa.int64()),
            "k_s": pa.array([one_chunk(t["source"])[0].as_py()],
                            type=pa.string()),
            "k_r": pa.array([one_chunk(t["rk"])[0].as_py()],
                            type=pa.int64()),
            "n": pa.array([t.num_rows], type=pa.int64())})

    meta = vt.map_batches(block_meta, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    meta = meta.sort_values(["k_v", "k_s", "k_r"]).reset_index(drop=True)
    offsets = {(int(v), s, int(r)): int(o) for v, s, r, o in zip(
        meta["k_v"], meta["k_s"], meta["k_r"],
        np.concatenate([[0], meta["n"].cumsum().to_numpy()[:-1]]))}

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "source": pa.array([], type=pa.string()),
                             "vtime": pa.array([], type=pa.int64()),
                             "global_pos": pa.array([], type=pa.int64())})
        key = (one_chunk(t["vtime"])[0].as_py(),
               one_chunk(t["source"])[0].as_py(),
               one_chunk(t["rk"])[0].as_py())
        base = offsets[key]
        return pa.table({
            "doc_id": t["doc_id"], "source": t["source"],
            "vtime": t["vtime"],
            "global_pos": pa.array(
                base + np.arange(1, t.num_rows + 1, dtype=np.int64))})

    return vt.map_batches(assign, batch_format="pyarrow",
                          batch_size=None)


def padding_waste_report(docs, bucket: int = 64):
    """Length-bucketed batching efficiency: if each document pads up to
    the next multiple of ``bucket`` tokens (the standard bucketed-
    batching compromise between packing and truncation), how much
    compute is wasted per bucket?  Returns
    (bucket_len, n_docs, sum_tokens, sum_padding, waste_permille).

    One combiner groupby over the bounded bucket domain (≤ max-doc-len
    / bucket rows); tokenizer contract shared with ``token_stats``
    (single-space split, empties counted).  Empty docs land in the
    first bucket (bucket_len = ``bucket``), padding entirely.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        n_tok = pc.list_value_length(
            pc.split_pattern(one_chunk(t["text"]), " ")) \
            .cast(pa.int64())
        nt = np.asarray(n_tok)
        blen = np.maximum((nt + bucket - 1) // bucket, 1) * bucket
        g = pa.table({"bucket_len": pa.array(blen),
                      "nt": pa.array(nt),
                      "pad": pa.array(blen - nt)}) \
            .group_by("bucket_len").aggregate(
                [([], "count_all"), ("nt", "sum"), ("pad", "sum")])
        return pa.table({"bucket_len": g["bucket_len"],
                         "d_p": g["count_all"].cast(pa.int64()),
                         "t_p": g["nt_sum"].cast(pa.int64()),
                         "p_p": g["pad_sum"].cast(pa.int64())})

    def finalize(t: pa.Table) -> pa.Table:
        tok = np.asarray(one_chunk(t["sum_tokens"])).astype(np.int64)
        pad = np.asarray(one_chunk(t["sum_padding"])).astype(np.int64)
        return t.append_column(
            "waste_permille",
            pa.array(1000 * pad // np.maximum(tok + pad, 1)))

    return (docs.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket_len")
            .aggregate(Sum("d_p", alias_name="n_docs"),
                       Sum("t_p", alias_name="sum_tokens"),
                       Sum("p_p", alias_name="sum_padding"))
            .map_batches(finalize, batch_format="pyarrow"))


#: default curation-gate grid for :func:`gate_grid_report` — the small sweep a
#: curation run tunes over; semantics shared with ``quality_flags``
GATE_GRID = ((10, 25), (10, 50), (20, 25), (20, 50), (40, 25), (40, 50))


def gate_grid_report(docs, grid=GATE_GRID):
    """Single-pass curation-gate tuning: evaluate EVERY (min_tokens,
    stop_permille_min) config of the grid in one scan instead of |grid|
    scans — per config the surviving-document count and pass rate.
    Returns (min_tokens, stop_permille_min, n_pass, n_docs,
    pass_permille).

    Per batch the base statistics (token count, stopword count — the
    ``quality_flags`` definitions) compute ONCE; each config is then a
    vectorized compare + sum, and |grid| partial rows per batch merge in
    a tiny groupby.  The pattern that matters at 100 TB: a 6-point
    hyperparameter sweep costs one read, not six.
    """
    from ray.data.aggregate import Sum

    from .textstats import LANG_STOPWORDS

    stops = set(LANG_STOPWORDS["en"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(one_chunk(t["text"]), " ")
        n_tok = np.asarray(pc.list_value_length(toks).cast(pa.int64()))
        flat = toks.flatten()
        is_stop = pc.is_in(flat, value_set=pa.array(sorted(stops)))
        from ..arrowutil import rowwise_flag_counts
        n_stop = rowwise_flag_counts(toks, is_stop).astype(np.int64)
        rows = {"min_tokens": [], "stop_permille_min": [],
                "p_p": [], "d_p": []}
        n_docs = len(n_tok)
        for mt, sp in grid:
            ok = (n_tok >= mt) & (n_stop * 1000 >= sp * n_tok)
            rows["min_tokens"].append(mt)
            rows["stop_permille_min"].append(sp)
            rows["p_p"].append(int(ok.sum()))
            rows["d_p"].append(n_docs)
        return pa.table({
            "min_tokens": pa.array(rows["min_tokens"], type=pa.int64()),
            "stop_permille_min": pa.array(rows["stop_permille_min"],
                                          type=pa.int64()),
            "p_p": pa.array(rows["p_p"], type=pa.int64()),
            "d_p": pa.array(rows["d_p"], type=pa.int64())})

    def finalize(t: pa.Table) -> pa.Table:
        p = np.asarray(one_chunk(t["n_pass"])).astype(np.int64)
        d = np.asarray(one_chunk(t["n_docs"])).astype(np.int64)
        return t.append_column(
            "pass_permille", pa.array(1000 * p // np.maximum(d, 1)))

    return (docs.map_batches(partial, batch_format="pyarrow")
            .groupby(["min_tokens", "stop_permille_min"])
            .aggregate(Sum("p_p", alias_name="n_pass"),
                       Sum("d_p", alias_name="n_docs"))
            .map_batches(finalize, batch_format="pyarrow"))


def crawl_frontier_topk(pages, k: int = 100):
    """Politeness-aware crawl-frontier head: the next ``k`` urls to
    fetch, preferring urls on the LEAST-crawled hosts (ascending host
    page count, then url) — the deterministic priority the frontier
    scheduler pops.  Returns (rank, url, host, host_pages).

    Host counts come from one combiner groupby and broadcast (hosts ≪
    pages by web contract — the ``host_quality_filter`` escape applies
    past that); the top-k itself is the bounded-partial pattern: every
    block surrenders at most k candidate rows, the driver-side merge
    sorts k·#blocks rows, never the corpus.
    """
    import ray
    from ray.data.aggregate import Sum

    def host_of(urls: pa.Array) -> pa.Array:
        return pc.replace_substring_regex(
            urls, r"^[^/]*://([^/]*).*$", r"\1")

    def count_partial(t: pa.Table) -> pa.Table:
        g = pa.table({"host": host_of(one_chunk(t["url"]))}) \
            .group_by("host").aggregate([([], "count_all")])
        return pa.table({"host": g["host"],
                         "c_p": g["count_all"].cast(pa.int64())})

    counts = (pages.map_batches(count_partial, batch_format="pyarrow")
              .groupby("host").aggregate(Sum("c_p", alias_name="n"))
              .to_pandas())
    count_ref = ray.put(dict(zip(counts["host"], counts["n"])))

    def block_topk(t: pa.Table) -> pa.Table:
        lookup = ray.get(count_ref)
        urls = one_chunk(t["url"]).to_numpy(zero_copy_only=False)
        hosts = host_of(one_chunk(t["url"])) \
            .to_numpy(zero_copy_only=False)
        hc = np.fromiter((lookup[h] for h in hosts), dtype=np.int64,
                         count=len(hosts))
        order = np.lexsort((urls, hc))[:k]
        return pa.table({
            "url": pa.array(urls[order]),
            "host": pa.array(hosts[order]),
            "host_pages": pa.array(hc[order])})

    def merge(t: pa.Table) -> pa.Table:
        urls = one_chunk(t["url"]).to_numpy(zero_copy_only=False)
        hosts = one_chunk(t["host"]).to_numpy(zero_copy_only=False)
        hc = np.asarray(one_chunk(t["host_pages"])).astype(np.int64)
        order = np.lexsort((urls, hc))[:k]
        return pa.table({
            "rank": pa.array(np.arange(1, len(order) + 1,
                                       dtype=np.int64)),
            "url": pa.array(urls[order]),
            "host": pa.array(hosts[order]),
            "host_pages": pa.array(hc[order])})

    return (pages.map_batches(block_topk, batch_format="pyarrow")
            .repartition(1)
            .map_batches(merge, batch_format="pyarrow",
                         batch_size=None))


def source_lang_concentration(docs):
    """Per-source language-mix concentration: (source, n_docs, n_langs,
    lang_simpson_permille) where the Simpson index is
    ``1000·Σ c_l² // n²`` over the source's per-language doc counts —
    1000 = monolingual feed, low = even mix.  The multilingual-balance
    audit over crawl feeds.

    One (source, lang) combiner groupby, then a per-source fold over
    the ≤|sources|·|langs| cell table (margins-over-cells contract).
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = t.select(["source", "lang"]) \
            .group_by(["source", "lang"]).aggregate([([], "count_all")])
        return pa.table({"source": g["source"], "lang": g["lang"],
                         "n_p": g["count_all"].cast(pa.int64())})

    def fold(t: pa.Table) -> pa.Table:
        import pandas as pd
        df = t.to_pandas()
        rows = []
        for src, sub in df.groupby("source", sort=True):
            c = sub["n"].to_numpy().astype(np.int64)
            n = int(c.sum())
            rows.append({"source": src, "n_docs": n,
                         "n_langs": len(c),
                         "lang_simpson_permille":
                             int(1000 * (c * c).sum() // max(n * n, 1))})
        out = pd.DataFrame(rows, columns=["source", "n_docs", "n_langs",
                                          "lang_simpson_permille"])
        return pa.Table.from_pandas(out, preserve_index=False)

    return (docs.map_batches(partial, batch_format="pyarrow")
            .groupby(["source", "lang"])
            .aggregate(Sum("n_p", alias_name="n"))
            .repartition(1)
            .map_batches(fold, batch_format="pyarrow", batch_size=None))


def batch_padding_plan(docs, batch_docs: int = 64):
    """Dynamic-batching audit: sort docs by whitespace-token count
    DESCENDING (longest-first — the standard padding-minimizing collation
    order), cut the stream into fixed-size batches of ``batch_docs`` docs,
    and report what a pad-to-longest collator spends per batch:
    ``pad_waste = n_docs·max_tokens − sum_tokens``.

    Plan (two narrow exchanges, driver bounded by block count):

    * one range-partitioned sort on ``(−n_tokens, doc_id)`` over a
      2-int64-column projection (text never crosses the exchange);
    * the block-offset zipWithIndex (same mechanism as
      ``aggs.global_value_rank``): one metadata pass collects each block's
      (first key, row count), the driver prefix-sums |blocks| offsets,
      a second pass derives each row's global rank and thus its
      ``batch_id = rank // batch_docs`` without any per-row shuffle;
    * per-block PARTIAL per-batch aggregates (contiguous ranks mean a
      batch spans at most two blocks) merged by one groupby(batch_id)
      whose input is ≤ #batches + #blocks partial rows — never the doc
      stream.

    Returns (batch_id, n_docs, max_tokens, sum_tokens, pad_waste).
    """
    from ray.data.aggregate import Max, Sum

    from .textstats import _tokens

    def prep(t: pa.Table) -> pa.Table:
        nt = np.asarray(
            pc.list_value_length(_tokens(one_chunk(t["text"])))
        ).astype(np.int64)
        return pa.table({
            "neg": pa.array(-nt),
            "doc_id": one_chunk(t["doc_id"]).cast(pa.int64()),
        })

    srt = docs.map_batches(prep, batch_format="pyarrow") \
        .sort(["neg", "doc_id"]).materialize()

    def block_meta(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"k_neg": pa.array([], type=pa.int64()),
                             "k_id": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        return pa.table({
            "k_neg": pa.array([one_chunk(t["neg"])[0].as_py()],
                              type=pa.int64()),
            "k_id": pa.array([one_chunk(t["doc_id"])[0].as_py()],
                             type=pa.int64()),
            "n": pa.array([t.num_rows], type=pa.int64())})

    meta = srt.map_batches(block_meta, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    if meta.empty:            # fully-empty input: no batch emitted a meta
        import ray.data
        return ray.data.from_arrow(pa.table({
            "batch_id": pa.array([], type=pa.int64()),
            "n_docs": pa.array([], type=pa.int64()),
            "max_tokens": pa.array([], type=pa.int64()),
            "sum_tokens": pa.array([], type=pa.int64()),
            "pad_waste": pa.array([], type=pa.int64())}))
    meta = meta.sort_values(["k_neg", "k_id"]).reset_index(drop=True)
    offsets = np.concatenate([[0], meta["n"].cumsum().to_numpy()[:-1]]) \
        .astype(np.int64)
    key_neg = meta["k_neg"].to_numpy().astype(np.int64)
    key_id = meta["k_id"].to_numpy().astype(np.int64)

    def partial(t: pa.Table) -> pa.Table:
        cols = {"batch_id": pa.array([], type=pa.int64()),
                "nd_p": pa.array([], type=pa.int64()),
                "mt_p": pa.array([], type=pa.int64()),
                "st_p": pa.array([], type=pa.int64())}
        if t.num_rows == 0:
            return pa.table(cols)
        neg = np.asarray(one_chunk(t["neg"]))
        i = int(np.searchsorted(key_neg, neg[0]))
        id0 = one_chunk(t["doc_id"])[0].as_py()
        while key_neg[i] != neg[0] or key_id[i] != id0:
            i += 1
        rank = offsets[i] + np.arange(t.num_rows, dtype=np.int64)
        bid = rank // batch_docs
        nt = -neg
        # segment-reduce per batch id (contiguous within the sorted block)
        change = np.nonzero(bid[1:] != bid[:-1])[0] + 1
        starts = np.concatenate([[0], change]).astype(np.int64)
        ends = np.concatenate([change, [t.num_rows]]).astype(np.int64)
        csum = np.concatenate([[0], np.cumsum(nt)])
        return pa.table({
            "batch_id": pa.array(bid[starts]),
            "nd_p": pa.array(ends - starts),
            # longest-first sort ⇒ per-batch max is the first row's count
            "mt_p": pa.array(nt[starts]),
            "st_p": pa.array(csum[ends] - csum[starts]),
        })

    def finish(t: pa.Table) -> pa.Table:
        nd = one_chunk(t["n_docs"]).cast(pa.int64())
        mt = one_chunk(t["max_tokens"]).cast(pa.int64())
        st = one_chunk(t["sum_tokens"]).cast(pa.int64())
        return pa.table({
            "batch_id": one_chunk(t["batch_id"]),
            "n_docs": nd, "max_tokens": mt, "sum_tokens": st,
            "pad_waste": pc.subtract(pc.multiply(nd, mt), st),
        })

    return (srt.map_batches(partial, batch_format="pyarrow",
                            batch_size=None)
            .groupby("batch_id")
            .aggregate(Sum("nd_p", alias_name="n_docs"),
                       Max("mt_p", alias_name="max_tokens"),
                       Sum("st_p", alias_name="sum_tokens"))
            .map_batches(finish, batch_format="pyarrow"))


def doc_frequency_spectrum(docs):
    """Good–Turing "frequency of frequencies" over the corpus vocabulary:
    for every document-frequency ``d``, how many distinct terms appear in
    exactly ``d`` documents — the smoothing table every count-based LM /
    quality model starts from, and the fastest corpus-health fingerprint
    (a fat head = boilerplate, a thin tail = dedup damage).

    Combiner-first second-order aggregation: per batch, terms dedup
    per-doc (one ``list_parent_indices`` explode + in-batch groupby) and
    pre-count docs per term, so the ``groupby(term)`` exchange moves one
    row per (term, batch); the df→count step pre-histograms per batch
    again, so the second exchange moves one row per (df, batch).  Term
    strings cross the wire once; text never does.  Returns
    (doc_freq, n_terms).
    """
    from ray.data.aggregate import Sum

    from .textstats import _tokens

    def term_doc_partial(t: pa.Table) -> pa.Table:
        toks = _tokens(one_chunk(t["text"]))
        flat = toks.flatten()
        parent = pc.list_parent_indices(toks)
        pairs = pa.table({"d": parent, "term": flat}) \
            .group_by(["d", "term"]).aggregate([])
        g = pairs.group_by("term").aggregate([([], "count_all")])
        return pa.table({"term": g["term"],
                         "c_p": g["count_all"].cast(pa.int64())})

    df = (docs.map_batches(term_doc_partial, batch_format="pyarrow")
          .groupby("term").aggregate(Sum("c_p", alias_name="df")))

    def hist_partial(t: pa.Table) -> pa.Table:
        g = t.select(["df"]).group_by("df").aggregate([([], "count_all")])
        return pa.table({"doc_freq": g["df"].cast(pa.int64()),
                         "n_p": g["count_all"].cast(pa.int64())})

    return (df.map_batches(hist_partial, batch_format="pyarrow")
            .groupby("doc_freq").aggregate(Sum("n_p",
                                               alias_name="n_terms")))


def vocab_growth_curve(docs, probes=(8, 32, 128, 512)):
    """Heaps-law vocabulary-growth probe per source: how many distinct
    terms the first ``N`` documents (by doc_id order) of each source
    contain, for each probe ``N`` — the curve that says whether a source
    is still contributing new vocabulary or just repeating itself.

    No text-wide sort: the doc rank never materializes per row.
    Instead (1) one explode+combiner ``groupby(source, term).Min(doc_id)``
    finds each term's FIRST document; (2) the per-source probe CUTOFF
    doc_ids (the N-th smallest doc_id) come from the grouped-top-k
    combiner over a 2-int column (≤ max(probes) rows per source per
    batch cross the exchange); (3) the |sources|×|probes| cutoff table
    broadcasts into a per-batch counting partial.  A source with fewer
    than N docs counts its whole vocabulary at that probe, matching the
    SQL ``first_rank <= N`` semantics.  Returns (source, probe,
    vocab_size).
    """
    from ray.data.aggregate import Min, Sum

    from .textstats import _tokens
    from .windowfns import grouped_top_k

    kmax = max(probes)

    def first_doc_partial(t: pa.Table) -> pa.Table:
        toks = _tokens(one_chunk(t["text"]))
        flat = toks.flatten()
        parent = np.asarray(pc.list_parent_indices(toks))
        did = np.asarray(one_chunk(t["doc_id"]).cast(pa.int64()))[parent]
        src = one_chunk(t["source"]).take(pa.array(parent))
        g = pa.table({"source": src, "term": flat,
                      "m_p": pa.array(did)}) \
            .group_by(["source", "term"]).aggregate([("m_p", "min")])
        return g.rename_columns(["source", "term", "m_p"])

    first_doc = (docs.map_batches(first_doc_partial,
                                  batch_format="pyarrow")
                 .groupby(["source", "term"])
                 .aggregate(Min("m_p", alias_name="first_doc")))

    def neg_ids(t: pa.Table) -> pa.Table:
        did = np.asarray(one_chunk(t["doc_id"]).cast(pa.int64()))
        return pa.table({"source": one_chunk(t["source"]),
                         "neg": pa.array(-did),
                         "doc_id": pa.array(did)})

    ranked = grouped_top_k(
        docs.map_batches(neg_ids, batch_format="pyarrow"),
        "source", "neg", "doc_id", k=kmax).materialize()
    # rank r == r-th smallest doc_id of the source (neg sorts descending)
    cut_tbl = ranked.to_pandas()
    cutoffs = {}
    per_source_n = cut_tbl.groupby("source")["rank"].max().to_dict()
    for r in cut_tbl.itertuples():
        for p in probes:
            if r.rank == min(p, per_source_n[r.source]):
                cutoffs[(r.source, p)] = int(r.doc_id)

    def count_partial(t: pa.Table) -> pa.Table:
        src = one_chunk(t["source"])
        fd = np.asarray(one_chunk(t["first_doc"]).cast(pa.int64()))
        out_s, out_p, out_c = [], [], []
        import pandas as pd
        sv = src.to_numpy(zero_copy_only=False)
        for s in pd.unique(sv):
            m = sv == s
            for p in probes:
                cut = cutoffs.get((s, p))
                c = int((fd[m] <= cut).sum()) if cut is not None \
                    else int(m.sum())
                out_s.append(s); out_p.append(p); out_c.append(c)
        return pa.table({"source": pa.array(out_s, type=pa.string()),
                         "probe": pa.array(out_p, type=pa.int64()),
                         "c_p": pa.array(out_c, type=pa.int64())})

    return (first_doc.map_batches(count_partial, batch_format="pyarrow")
            .groupby(["source", "probe"])
            .aggregate(Sum("c_p", alias_name="vocab_size")))


def skipgram_cooccurrence(docs, window: int = 3, k: int = 20):
    """Corpus-level top-k ORDERED skip-gram co-occurrences: pairs
    ``(term_i, term_j)`` with ``0 < j − i ≤ window`` inside a document —
    the window-co-occurrence counts word2vec/GloVe-style embedding
    trainers and collocation miners consume (generalizes
    :func:`top_bigrams`'s adjacent-only window).

    Vectorization: tokens flatten once; for each offset ``1..window`` one
    zero-copy slice pair + one same-doc mask + one element-wise join
    emits that offset's pairs; an in-batch group_by combines before the
    single ``groupby(pair)`` exchange, and the final top-k uses the
    bounded-partial pattern (≤k rows per block to the driver).  Returns
    pandas (rank, pair, n_occurrences).
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        flat, row_idx = _tokens_nonempty(t)
        chunks = []
        n = len(flat)
        for off in range(1, window + 1):
            if n <= off:
                break
            same_doc = row_idx[off:] == row_idx[:-off]
            joined = pc.binary_join_element_wise(
                flat.slice(0, n - off), flat.slice(off), " ")
            chunks.append(joined.filter(pa.array(same_doc)))
        if not chunks:
            return pa.table({"pair": pa.array([], type=pa.string()),
                             "n_partial": pa.array([], type=pa.int64())})
        g = pa.table({"pair": pa.concat_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
             for c in chunks])}).group_by("pair").aggregate(
            [([], "count_all")])
        return pa.table({"pair": g["pair"],
                         "n_partial": g["count_all"].cast(pa.int64())})

    def block_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values(["n_occurrences", "pair"],
                            ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = (docs.map_batches(partial, batch_format="pyarrow")
             .groupby("pair").aggregate(Sum("n_partial",
                                            alias_name="n_occurrences"))
             .map_batches(block_topk, batch_format="pyarrow",
                          batch_size=None)
             .to_pandas())
    if "pair" not in parts.columns:
        parts = pd.DataFrame({"pair": pd.Series(dtype=object),
                              "n_occurrences": pd.Series(dtype="int64")})
    parts = parts.sort_values(["n_occurrences", "pair"],
                              ascending=[False, True]).head(k)
    return pd.DataFrame({
        "rank": np.arange(1, len(parts) + 1, dtype=np.int64),
        "pair": parts["pair"].to_numpy(),
        "n_occurrences": parts["n_occurrences"].to_numpy(),
    })


def doc_novelty(docs):
    """Per-document vocabulary novelty: how many of a document's distinct
    terms appear for the FIRST time in the corpus in this document
    (first = smallest doc_id), as count and permille of the doc's
    distinct vocabulary — the "is this crawl slice still contributing
    new content" gate a curation pipeline applies before paying for
    dedup/quality models on stale slices.

    Two tagged partial streams share one ``groupby(doc_id)`` exchange:
    the per-doc distinct-term count resolves fully in-batch (a doc's
    tokens live in its own row), and the new-term counts come off the
    ``groupby(term).Min(doc_id)`` first-occurrence table via a per-batch
    count combiner.  Term strings cross the wire once.  Returns
    (doc_id, n_terms, n_new_terms, novelty_permille).
    """
    from ray.data.aggregate import Min, Sum

    from .textstats import _tokens

    def tot_partial(t: pa.Table) -> pa.Table:
        toks = _tokens(one_chunk(t["text"]))
        pairs = pa.table({
            "d": pc.list_parent_indices(toks),
            "term": toks.flatten(),
        }).group_by(["d", "term"]).aggregate([])
        g = pairs.group_by("d").aggregate([([], "count_all")])
        did = np.asarray(one_chunk(t["doc_id"]).cast(pa.int64()))
        return pa.table({
            "doc_id": pa.array(did[np.asarray(g["d"])]),
            "tot_p": g["count_all"].cast(pa.int64()),
            "new_p": pa.array(np.zeros(len(g), dtype=np.int64)),
        })

    def term_min_partial(t: pa.Table) -> pa.Table:
        toks = _tokens(one_chunk(t["text"]))
        parent = np.asarray(pc.list_parent_indices(toks))
        did = np.asarray(one_chunk(t["doc_id"]).cast(pa.int64()))[parent]
        g = pa.table({"term": toks.flatten(), "m_p": pa.array(did)}) \
            .group_by("term").aggregate([("m_p", "min")])
        return g.rename_columns(["term", "m_p"])

    first_doc = (docs.map_batches(term_min_partial,
                                  batch_format="pyarrow")
                 .groupby("term").aggregate(Min("m_p",
                                                alias_name="d0")))

    def new_partial(t: pa.Table) -> pa.Table:
        g = t.select(["d0"]).group_by("d0").aggregate([([], "count_all")])
        n = len(g)
        return pa.table({
            "doc_id": g["d0"].cast(pa.int64()),
            "tot_p": pa.array(np.zeros(n, dtype=np.int64)),
            "new_p": g["count_all"].cast(pa.int64()),
        })

    tot = docs.map_batches(tot_partial, batch_format="pyarrow")
    new = first_doc.map_batches(new_partial, batch_format="pyarrow")

    def finish(t: pa.Table) -> pa.Table:
        nt = np.asarray(t["n_terms"].combine_chunks()
                        if isinstance(t["n_terms"], pa.ChunkedArray)
                        else t["n_terms"]).astype(np.int64)
        nn = np.asarray(t["n_new_terms"].combine_chunks()
                        if isinstance(t["n_new_terms"], pa.ChunkedArray)
                        else t["n_new_terms"]).astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_terms": pa.array(nt),
            "n_new_terms": pa.array(nn),
            "novelty_permille": pa.array(1000 * nn // nt),
        })

    return (tot.union(new)
            .groupby("doc_id")
            .aggregate(Sum("tot_p", alias_name="n_terms"),
                       Sum("new_p", alias_name="n_new_terms"))
            .map_batches(finish, batch_format="pyarrow"))


def delta_oov_rate(docs):
    """Incremental-ingest vocabulary audit: treating even doc_ids as the
    ALREADY-INGESTED corpus and odd doc_ids as the incoming delta, report
    per new document how many of its distinct terms are out-of-vocabulary
    vs the old corpus (count + permille) — the "is this slice new
    content or re-crawl" gate an incremental pipeline applies before
    paying for full dedup (complements :func:`doc_novelty`, which ranks
    within one corpus by doc_id).

    Shape: old-side distinct vocabulary via one combiner
    ``groupby(term)``; new-side (doc, term) distinct pairs hash-join the
    vocabulary ON TERM (large×large, hash-partitioned — the vocabulary
    does NOT broadcast); matched counts and in-batch totals merge in one
    final ``groupby(doc_id)``.  Returns (doc_id, n_terms, n_oov,
    oov_permille).
    """
    from ray.data.aggregate import Sum

    from .textstats import _tokens
    from .joins import shuffle_hash_join

    def split(parity):
        def f(t: pa.Table) -> pa.Table:
            did = one_chunk(t["doc_id"]).cast(pa.int64())
            keep = pc.equal(pc.bit_wise_and(did, 1), parity)
            return pa.table({"doc_id": did,
                             "text": one_chunk(t["text"])}).filter(keep)
        return f

    old = docs.map_batches(split(0), batch_format="pyarrow")
    new = docs.map_batches(split(1), batch_format="pyarrow")

    def old_vocab_partial(t: pa.Table) -> pa.Table:
        toks = _tokens(one_chunk(t["text"]))
        g = pa.table({"term": toks.flatten()}).group_by("term") \
            .aggregate([])
        return g.append_column("one", pa.array(
            np.ones(len(g), dtype=np.int64)))

    vocab = (old.map_batches(old_vocab_partial, batch_format="pyarrow")
             .groupby("term").aggregate(Sum("one", alias_name="seen")))

    def new_pairs(t: pa.Table) -> pa.Table:
        toks = _tokens(one_chunk(t["text"]))
        parent = np.asarray(pc.list_parent_indices(toks))
        did = np.asarray(one_chunk(t["doc_id"]))[parent]
        return pa.table({"doc_id": pa.array(did),
                         "term": toks.flatten()}) \
            .group_by(["doc_id", "term"]).aggregate([]) \
            .rename_columns(["doc_id", "term"])

    pairs = new.map_batches(new_pairs, batch_format="pyarrow")

    def tot_partial(t: pa.Table) -> pa.Table:
        g = t.select(["doc_id"]).group_by("doc_id") \
            .aggregate([([], "count_all")])
        n = len(g)
        return pa.table({
            "doc_id": g["doc_id"].cast(pa.int64()),
            "tot_p": g["count_all"].cast(pa.int64()),
            "in_p": pa.array(np.zeros(n, dtype=np.int64))})

    # the hash join cannot take a zero-block side: an empty delta yields
    # an empty report; an empty old corpus makes every term OOV.
    # Materialize pairs BEFORE deriving totals so the explode runs once.
    pairs = pairs.materialize()
    vocab = vocab.materialize()
    totals = pairs.map_batches(tot_partial, batch_format="pyarrow")
    if pairs.count() == 0:
        import ray.data
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], type=pa.int64()),
            "n_terms": pa.array([], type=pa.int64()),
            "n_oov": pa.array([], type=pa.int64()),
            "oov_permille": pa.array([], type=pa.int64())}))
    if vocab.count() == 0:
        import ray.data
        matched = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], type=pa.int64())}))
    else:
        matched = shuffle_hash_join(pairs, vocab, on="term",
                                    project=["doc_id"])

    def in_partial(t: pa.Table) -> pa.Table:
        g = t.select(["doc_id"]).group_by("doc_id") \
            .aggregate([([], "count_all")])
        n = len(g)
        return pa.table({
            "doc_id": g["doc_id"].cast(pa.int64()),
            "tot_p": pa.array(np.zeros(n, dtype=np.int64)),
            "in_p": g["count_all"].cast(pa.int64())})

    in_vocab = matched.map_batches(in_partial, batch_format="pyarrow")

    def finish(t: pa.Table) -> pa.Table:
        tot = np.asarray(one_chunk(t["n_terms"])).astype(np.int64)
        inn = np.asarray(one_chunk(t["n_in"])).astype(np.int64)
        oov = tot - inn
        return pa.table({
            "doc_id": one_chunk(t["doc_id"]),
            "n_terms": pa.array(tot),
            "n_oov": pa.array(oov),
            "oov_permille": pa.array(1000 * oov // tot),
        })

    return (totals.union(in_vocab)
            .groupby("doc_id")
            .aggregate(Sum("tot_p", alias_name="n_terms"),
                       Sum("in_p", alias_name="n_in"))
            .map_batches(finish, batch_format="pyarrow"))


def corpus_datacard(docs):
    """The corpus data card: the one-screen summary (doc/token/char
    volume, language spread, exact-dup rate, quality-gate pass rate)
    every released training set ships with — long-format (metric, value)
    rows so downstream dashboards join on the metric name.

    One streaming pass computes the additive metrics per batch (docs,
    tokens, chars, quality passes) as O(1) partial rows; the two
    distinct-counts each use their own combiner exchange: languages
    through a ≤|langs|-per-batch groupby, exact-dup texts through the
    md5 ``groupby(hash)`` (the dedup_exact exchange).  Returns pandas
    (metric, value) with metrics: n_docs, n_tokens, n_chars, n_quality,
    n_langs, n_distinct_texts.
    """
    import hashlib

    import pandas as pd
    from ray.data.aggregate import Sum

    from .textstats import _tokens, quality_flags

    def adds(t: pa.Table) -> pa.Table:
        toks = _tokens(one_chunk(t["text"]))
        q = quality_flags(t.select(["doc_id", "text"]))
        return pa.table({
            "n_docs_p": pa.array([t.num_rows], type=pa.int64()),
            "n_tokens_p": pa.array(
                [int(np.asarray(pc.list_value_length(toks))
                     .astype(np.int64).sum())], type=pa.int64()),
            "n_chars_p": pa.array(
                [int(np.asarray(pc.utf8_length(one_chunk(t["text"])))
                     .astype(np.int64).sum())], type=pa.int64()),
            "n_quality_p": pa.array(
                [int(np.asarray(q["is_quality"]).sum())],
                type=pa.int64()),
        })

    sums = docs.map_batches(adds, batch_format="pyarrow") \
        .sum(["n_docs_p", "n_tokens_p", "n_chars_p", "n_quality_p"])

    def lang_partial(t: pa.Table) -> pa.Table:
        return t.select(["lang"]).group_by("lang").aggregate([])

    n_langs = docs.map_batches(lang_partial, batch_format="pyarrow") \
        .groupby("lang").count().count()

    def hash_partial(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5(x.encode()).hexdigest()
              for x in one_chunk(t["text"]).to_pylist()]
        return pa.table({"h": pa.array(hs, type=pa.string())}) \
            .group_by("h").aggregate([])

    n_distinct = docs.map_batches(hash_partial, batch_format="pyarrow") \
        .groupby("h").count().count()

    rows = [("n_docs", int(sums["sum(n_docs_p)"])),
            ("n_tokens", int(sums["sum(n_tokens_p)"])),
            ("n_chars", int(sums["sum(n_chars_p)"])),
            ("n_quality", int(sums["sum(n_quality_p)"])),
            ("n_langs", int(n_langs)),
            ("n_distinct_texts", int(n_distinct))]
    return pd.DataFrame(rows, columns=["metric", "value"])


def pps_systematic_sample(docs, n_target: int = 100):
    """Probability-proportional-to-size SYSTEMATIC sample: walking the
    corpus in doc_id order with a token-count cumsum, keep every document
    whose token interval crosses one of ``n_target`` evenly spaced
    boundaries of the total token mass — the deterministic
    weighted-without-replacement subsample (long docs proportionally
    likely, short ones never over-picked twice) a corpus audit draws,
    with zero RNG so the SQL oracle reproduces it bit-for-bit.

    The crossing test is pure integer: keep iff ``(cum_after·n)//total >
    (cum_before·n)//total``.  Plan: one 2-int64 sort on doc_id, then the
    WEIGHTED block-offset pattern (the zipWithIndex machinery with
    per-block TOKEN SUMS instead of row counts — the driver prefix-sums
    |blocks| metas and each block resolves its rows' global cumsum
    locally).  Returns (doc_id, n_tokens) of the selected docs (≤
    n_target + 1 rows).
    """
    from .textstats import _tokens

    def prep(t: pa.Table) -> pa.Table:
        nt = np.asarray(
            pc.list_value_length(_tokens(one_chunk(t["text"])))
        ).astype(np.int64)
        return pa.table({
            "doc_id": one_chunk(t["doc_id"]).cast(pa.int64()),
            "tok": pa.array(nt)})

    srt = docs.map_batches(prep, batch_format="pyarrow") \
        .sort("doc_id").materialize()

    def block_meta(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"k_id": pa.array([], type=pa.int64()),
                             "s": pa.array([], type=pa.int64())})
        return pa.table({
            "k_id": pa.array([one_chunk(t["doc_id"])[0].as_py()],
                             type=pa.int64()),
            "s": pa.array([int(np.asarray(one_chunk(t["tok"])).sum())],
                          type=pa.int64())})

    meta = srt.map_batches(block_meta, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    if meta.empty:
        import ray.data
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], type=pa.int64()),
            "n_tokens": pa.array([], type=pa.int64())}))
    meta = meta.sort_values("k_id").reset_index(drop=True)
    offsets = np.concatenate([[0], meta["s"].cumsum().to_numpy()[:-1]]) \
        .astype(np.int64)
    total = int(meta["s"].sum())
    key_id = meta["k_id"].to_numpy().astype(np.int64)

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or total == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "n_tokens": pa.array([], type=pa.int64())})
        id0 = one_chunk(t["doc_id"])[0].as_py()
        i = int(np.searchsorted(key_id, id0))
        tok = np.asarray(one_chunk(t["tok"]))
        ca = offsets[i] + np.cumsum(tok)
        cb = ca - tok
        keep = (ca * n_target) // total > (cb * n_target) // total
        return pa.table({"doc_id": one_chunk(t["doc_id"]),
                         "n_tokens": pa.array(tok)}).filter(
            pa.array(keep))

    return srt.map_batches(assign, batch_format="pyarrow",
                           batch_size=None)


def temperature_mixture_plan(docs, source_col: str = "source"):
    """Temperature-smoothed data-mixing allocator (the multilingual-
    pretraining counterpart of :func:`source_mix_plan`'s cap rule):
    per-source sampling weight ∝ ``p_s^(1/2)``, computed EXACTLY with
    integer square roots (``math.isqrt`` in the engine, ``floor(sqrt)``
    in the oracle — identical for token counts < 2^52, i.e. far past
    100 TB).  Smoothing lifts low-resource sources; ``epochs_permille``
    is the expected duplication factor each source incurs under the
    smoothed draw (``>1000`` = that source repeats — the overfitting
    signal mixture designers watch).

    One combiner ``groupby(source)`` carrying (n_docs, n_tokens)
    partials; the |sources|-row finalize folds in a single block with
    Python big-int arithmetic (the Σtok·w product overflows int64 at
    corpus scale; the RESULT permilles are small).  Returns (source,
    n_docs, n_tokens, weight_permille, epochs_permille).
    """
    import math

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.list_value_length(
            pc.split_pattern(one_chunk(t["text"]), " ")).cast(pa.int64())
        g = pa.table({"source": t[source_col], "n_tok": toks}) \
            .group_by("source").aggregate(
                [([], "count_all"), ("n_tok", "sum")])
        return pa.table({"source": g["source"],
                         "d_p": g["count_all"].cast(pa.int64()),
                         "t_p": g["n_tok_sum"].cast(pa.int64())})

    def finalize(t: pa.Table) -> pa.Table:
        tok = [int(x) for x in one_chunk(t["n_tokens"]).to_pylist()]
        w = [math.isqrt(x) for x in tok]
        tot_tok, tot_w = sum(tok), sum(w)
        weight = [1000 * x // tot_w if tot_w else 0 for x in w]
        epochs = [1000 * tot_tok * x // (tot_w * ts)
                  if tot_w and ts else 0 for x, ts in zip(w, tok)]
        return pa.table({
            "source": one_chunk(t["source"]),
            "n_docs": one_chunk(t["n_docs"]).cast(pa.int64()),
            "n_tokens": pa.array(tok, type=pa.int64()),
            "weight_permille": pa.array(weight, type=pa.int64()),
            "epochs_permille": pa.array(epochs, type=pa.int64()),
        })

    # |sources|-row result: one block so the normalisation sees every
    # source (same margins-over-cells bound as source_mix_plan)
    return (docs.map_batches(partial, batch_format="pyarrow")
            .groupby("source")
            .aggregate(Sum("d_p", alias_name="n_docs"),
                       Sum("t_p", alias_name="n_tokens"))
            .repartition(1)
            .map_batches(finalize, batch_format="pyarrow",
                         batch_size=None))


def curate_v4(docs, containment_tau_permille: int = 900,
              k_profile: int = 20):
    """End-to-end curation v4 — the round-5 composition exercising the
    new operator tier as ONE pipeline: (1) drop documents whose
    corpus-trained trigram language prediction disagrees with their
    label (mislabel/mojibake gate); (2) drop the higher-id member of
    every exact max-containment pair ≥ τ (quote/inclusion dedup);
    (3) report the temperature-smoothed (τ=1/2) mixing plan over the
    survivors.  Returns (source, n_docs, n_tokens, weight_permille,
    epochs_permille).

    Composition stays streaming: the language gate is the profile
    broadcast + an in-batch filter (no join — text passes through);
    the containment drop list is O(contained duplicates) and
    broadcasts once (the ``embedding_dedup_prune`` contract); the
    mixture fold is the |sources|-row block.
    """
    import ray

    from ..arrowutil import one_chunk
    from .dedup import containment_pairs
    from .textstats import langid_trigram_predictions

    preds = langid_trigram_predictions(
        docs, k_profile, keep_cols=("lang", "source", "text"))
    # containment's candidate machinery reads its input several times
    # (df pass, probes, elements, verify) — materialize the gated corpus
    # once rather than re-running profile scoring per consumer (the
    # object store spills past memory; same trade as minhash's cand)
    surv1 = preds.map_batches(
        lambda t: t.filter(pc.equal(t["pred_lang"], t["lang"]))
        .select(["doc_id", "text", "lang", "source"]),
        batch_format="pyarrow").materialize()

    pairs = containment_pairs(surv1.select_columns(["doc_id", "text"]),
                              tau_permille=containment_tau_permille)
    drop_tab = pairs.select_columns(["doc_b"]).to_pandas()
    drop_ref = ray.put(np.unique(drop_tab["doc_b"].to_numpy()
                                 .astype(np.int64))
                       if len(drop_tab) else np.array([], dtype=np.int64))

    def anti(t: pa.Table) -> pa.Table:
        dl = ray.get(drop_ref)
        if not len(dl):
            return t
        ids = np.asarray(one_chunk(t["doc_id"]))
        return t.filter(pa.array(~np.isin(ids, dl)))

    surv2 = surv1.map_batches(anti, batch_format="pyarrow")
    return temperature_mixture_plan(surv2)


def t5_span_corruption(docs, mask_mod: int = 8):
    """T5-style span-corruption pair generation (Raffel et al. 2020 —
    public literature): deterministic ~1/``mask_mod`` of each document's
    tokens mask out; CONTIGUOUS masked runs collapse to one sentinel
    ``<X_k>`` in the input and re-emit as ``<X_k> tok tok …`` in the
    target — the denoising-objective data prep every encoder-decoder
    pretraining run needs, kept seedless-deterministic
    (``(pos·31 + doc_id·17) % mask_mod == 0``) so the DuckDB oracle
    replays it exactly.  Returns (doc_id, input_text, target_text,
    n_masked).

    Pure per-batch map — ZERO shuffles, no state: one flat-token view,
    one vectorized mask + run-start detection, and two lexsort-ordered
    rebuilds (input = unmasked tokens + run-start sentinels; target =
    sentinels + masked tokens) re-joined per row via Arrow offsets.
    """
    from ..arrowutil import one_chunk

    def corrupt(t: pa.Table) -> pa.Table:
        n_rows = t.num_rows
        empty = pa.table({
            "doc_id": pa.array([], type=pa.int64()),
            "input_text": pa.array([], type=pa.string()),
            "target_text": pa.array([], type=pa.string()),
            "n_masked": pa.array([], type=pa.int64())})
        if n_rows == 0:
            return empty
        ids = np.asarray(one_chunk(t["doc_id"]), dtype=np.int64)
        flat, row_idx = _tokens_nonempty(t)
        if len(flat) == 0:
            return pa.table({
                "doc_id": pa.array(ids),
                "input_text": pa.array([""] * n_rows),
                "target_text": pa.array([""] * n_rows),
                "n_masked": pa.array(np.zeros(n_rows, dtype=np.int64))})
        # within-row positions
        starts = np.searchsorted(row_idx, np.arange(n_rows))
        pos = np.arange(len(row_idx), dtype=np.int64) - starts[row_idx]
        mask = ((pos * 31 + ids[row_idx] * 17) % mask_mod) == 0
        prev_mask = np.concatenate([[False], mask[:-1]])
        same_row = np.concatenate([[False], row_idx[1:] == row_idx[:-1]])
        run_start = mask & ~(prev_mask & same_row)
        # run id within row (0-based): global cumsum of run starts,
        # rebased by the cumsum value just before each row's first token
        g_run = np.cumsum(run_start)
        base = np.zeros(n_rows, dtype=np.int64)
        nz = starts > 0
        base[nz] = g_run[starts[nz] - 1]
        rid = g_run - 1 - base[row_idx]
        sent = np.array([f"<X_{k}>" for k in range(int(rid.max()) + 1 if
                                                   mask.any() else 1)],
                        dtype=object)
        toks = flat.to_numpy(zero_copy_only=False)

        def rebuild(el_rows, el_keys, el_vals):
            """join el_vals (object tokens) per row ordered by el_keys."""
            order = np.lexsort((el_keys, el_rows))
            r, v = el_rows[order], el_vals[order]
            counts = np.bincount(r, minlength=n_rows)
            offs = np.concatenate([[0], np.cumsum(counts)])
            lists = pa.ListArray.from_arrays(
                pa.array(offs, type=pa.int32()),
                pa.array(v, type=pa.string()))
            return pc.binary_join(lists, " ")

        # input: unmasked tokens (key 2*pos+1) + sentinels at run starts
        # (key 2*pos) — sentinel sits where its run began
        um = ~mask
        in_rows = np.concatenate([row_idx[um], row_idx[run_start]])
        in_keys = np.concatenate([2 * pos[um] + 1, 2 * pos[run_start]])
        in_vals = np.concatenate([toks[um], sent[rid[run_start]]])
        input_text = rebuild(in_rows, in_keys, in_vals)
        # target: sentinels at run starts (key 2*pos) + masked tokens
        # (key 2*pos+1)
        tg_rows = np.concatenate([row_idx[run_start], row_idx[mask]])
        tg_keys = np.concatenate([2 * pos[run_start], 2 * pos[mask] + 1])
        tg_vals = np.concatenate([sent[rid[run_start]], toks[mask]])
        target_text = rebuild(tg_rows, tg_keys, tg_vals)
        n_masked = np.bincount(row_idx[mask], minlength=n_rows) \
            .astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids),
            "input_text": input_text,
            "target_text": target_text,
            "n_masked": pa.array(n_masked)})

    return docs.map_batches(corrupt, batch_format="pyarrow")


def mlm_masking_pairs(docs, mask_mod: int = 7):
    """BERT-style masked-LM data prep (Devlin et al. 2018 — public
    literature), seedless-deterministic so the SQL oracle replays it
    bit-exact: token ``pos`` of doc ``d`` is selected when
    ``(pos·31 + d·17) % mask_mod == 0`` (~1/mod of tokens); selected
    tokens follow the 80/10/10 rule via ``r = (pos + d) % 10``:
    r < 8 → ``[MASK]``, r == 8 → a deterministic in-document
    "random" replacement (the token at ``(pos·13 + 7) % n_tokens`` —
    self-contained, no vocab broadcast), r == 9 → kept unchanged.
    Returns (doc_id, masked_text, n_selected, n_masked, n_random) —
    ``masked_text`` is the model input; the label positions are the
    selected ones by construction.

    Pure per-batch vectorized map, ZERO shuffles: one flat-token view,
    arithmetic selection, one gather for the random replacements, one
    Arrow list rebuild.
    """
    from ..arrowutil import one_chunk

    def mask_batch(t: pa.Table) -> pa.Table:
        n_rows = t.num_rows
        if n_rows == 0:
            return pa.table({
                "doc_id": pa.array([], type=pa.int64()),
                "masked_text": pa.array([], type=pa.string()),
                "n_selected": pa.array([], type=pa.int64()),
                "n_masked": pa.array([], type=pa.int64()),
                "n_random": pa.array([], type=pa.int64())})
        ids = np.asarray(one_chunk(t["doc_id"]), dtype=np.int64)
        flat, row_idx = _tokens_nonempty(t)
        if len(flat) == 0:
            return pa.table({
                "doc_id": pa.array(ids),
                "masked_text": pa.array([""] * n_rows),
                "n_selected": pa.array(np.zeros(n_rows, dtype=np.int64)),
                "n_masked": pa.array(np.zeros(n_rows, dtype=np.int64)),
                "n_random": pa.array(np.zeros(n_rows, dtype=np.int64))})
        starts = np.searchsorted(row_idx, np.arange(n_rows))
        lens = np.diff(np.concatenate([starts, [len(row_idx)]]))
        pos = np.arange(len(row_idx), dtype=np.int64) - starts[row_idx]
        d = ids[row_idx]
        sel = ((pos * 31 + d * 17) % mask_mod) == 0
        r = (pos + d) % 10
        toks = flat.to_numpy(zero_copy_only=False).copy()
        to_mask = sel & (r < 8)
        to_rand = sel & (r == 8)
        toks[to_mask] = "[MASK]"
        if to_rand.any():
            n_tok = lens[row_idx[to_rand]]
            src = starts[row_idx[to_rand]] + (pos[to_rand] * 13 + 7) % n_tok
            toks[to_rand] = flat.to_numpy(zero_copy_only=False)[src]
        lists = pa.ListArray.from_arrays(
            pa.array(np.concatenate([starts, [len(row_idx)]]),
                     type=pa.int32()),
            pa.array(toks, type=pa.string()))
        return pa.table({
            "doc_id": pa.array(ids),
            "masked_text": pc.binary_join(lists, " "),
            "n_selected": pa.array(np.bincount(
                row_idx[sel], minlength=n_rows).astype(np.int64)),
            "n_masked": pa.array(np.bincount(
                row_idx[to_mask], minlength=n_rows).astype(np.int64)),
            "n_random": pa.array(np.bincount(
                row_idx[to_rand], minlength=n_rows).astype(np.int64)),
        })

    return docs.map_batches(mask_batch, batch_format="pyarrow")
