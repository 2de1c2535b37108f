"""Ranked retrieval over the corpus — the data-selection side of a
training pipeline (query-scored curation a la retrieval-based data
selection), expressed as broadcast-query streaming passes.

Both operators follow the engine's bounded-partial contract: the query
term set is schema-sized and rides in the task closure; per-batch
combiners emit O(|Q|) or O(k) rows; nothing document-sized ever crosses
an exchange and there are no joins or sorts of the corpus itself.

Reference anchor: the reference scores candidate identifiers by scan
order (reference/pdf2doi/finders.py:268-318); these operators are the
beyond-reference corpus-retrieval tier the build brief asks for.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .corpus import _tokens_nonempty

BM25_SCALE = 1000          # milli-scaled idf and saturation terms
RRF_SCALE = 1_000_000      # micro-scaled reciprocal ranks
RRF_K = 60                 # the standard RRF damping constant


def _np(col) -> np.ndarray:
    return np.asarray(col.combine_chunks()
                      if isinstance(col, pa.ChunkedArray) else col)


def bm25_top_docs(docs, query_terms, k: int = 20):
    """Top-``k`` documents for a broadcast query under integer-exact BM25.

    Exact arithmetic contract (mirrored verbatim by the SQL oracle; every
    quantity is an int64 and both engines floor-divide, so scores are
    bit-identical):

    - ``ND``  = number of documents (all rows, including empty texts)
    - ``AVD`` = ``total_nonempty_tokens // ND`` (integer average doc length)
    - per query term *t* with document frequency ``df``:
      ``idf_scaled = ND * 1000 // df``
    - per (doc, term) with term frequency ``tf`` and doc length ``dl``
      (k1 = 1.2, b = 0.75 folded into integers: 22/10 and 3/4):
      ``sat_scaled = 22 * tf * AVD * 1000 // (10 * tf * AVD + 3 * AVD + 9 * dl)``
    - ``contrib = idf_scaled * sat_scaled // 1000``
    - ``score_scaled(doc) = sum(contrib)`` over matched terms; docs with
      ``score_scaled == 0`` (no match, or all contributions floored away)
      emit no row, exactly like the SQL join.

    int64 bound: ``sat_scaled <= 2200``, so a contribution is at most
    ``2.2 * ND * 1000`` — safe past 10^15 documents; the per-term factors
    (``22 * tf * AVD * 1000``) depend only on document length, never corpus
    size, which is why ``AVD`` (not the total token count) appears in the
    saturation term.

    Plan — two streaming passes, zero shuffles:

    1. stats pass: per-batch combiner emits |Q| df rows (distinct docs in
       the batch containing each query term) plus one sentinel row with
       (n_docs, n_tokens); the ≤(|Q|+1)-per-batch partials reduce on the
       driver.
    2. score pass: ``{term: df}``, ``ND``, ``AVD`` ride the closure; each
       batch computes tf/dl vectorized, scatter-adds contributions per doc,
       and emits only its own top-k (score desc, doc_id asc) — the
       bounded-partial global top-k of
       :func:`.textstats.top_docs_by_tokens`.

    Returns pandas (rank, doc_id, score_scaled).
    """
    import pandas as pd

    terms = list(dict.fromkeys(query_terms))
    if not terms:
        raise ValueError("bm25_top_docs: empty query")
    qarr = pa.array(terms, type=pa.string())

    def stats_partial(t: pa.Table) -> pa.Table:
        flat, row_idx = _tokens_nonempty(t)
        hit = np.asarray(pc.is_in(flat, value_set=qarr))
        # distinct (doc, term) pairs -> per-term df within the batch
        pairs = pa.table({
            "term": flat.filter(pa.array(hit)),
            "row": pa.array(row_idx[hit], type=pa.int64()),
        }).group_by(["term", "row"]).aggregate([])
        dfc = pairs.group_by("term").aggregate([([], "count_all")])
        return pa.table({
            "term": pa.concat_arrays([dfc["term"].combine_chunks(),
                                      pa.array([None], type=pa.string())]),
            "df": pa.concat_arrays([
                dfc["count_all"].cast(pa.int64()).combine_chunks(),
                pa.array([0], type=pa.int64())]),
            "nd": pa.array([0] * dfc.num_rows + [t.num_rows],
                           type=pa.int64()),
            "avn": pa.array([0] * dfc.num_rows + [len(flat)],
                            type=pa.int64()),
        })

    stats = docs.map_batches(stats_partial,
                             batch_format="pyarrow").to_pandas()
    if "term" not in stats.columns:
        raise ValueError("bm25_top_docs: empty corpus")
    nd = int(stats["nd"].sum())
    avn = int(stats["avn"].sum())
    if nd == 0:
        raise ValueError("bm25_top_docs: empty corpus")
    avd = max(avn // nd, 1)
    df_map = stats.dropna(subset=["term"]).groupby("term")["df"].sum()
    idf = {t: nd * BM25_SCALE // int(d)
           for t, d in df_map.items() if int(d) > 0}
    if not idf:        # no document contains any query term
        return pd.DataFrame({"rank": pd.Series(dtype="int64"),
                             "doc_id": pd.Series(dtype="int64"),
                             "score_scaled": pd.Series(dtype="int64")})
    idf_arr = np.array([idf.get(t, 0) for t in terms], dtype=np.int64)

    def score_partial(t: pa.Table) -> pa.Table:
        flat, row_idx = _tokens_nonempty(t)
        ids = _np(t["doc_id"])
        dl = np.zeros(t.num_rows, dtype=np.int64)
        np.add.at(dl, row_idx, 1)
        hit = np.asarray(pc.is_in(flat, value_set=qarr))
        tfp = pa.table({
            "term": flat.filter(pa.array(hit)),
            "row": pa.array(row_idx[hit], type=pa.int64()),
        }).group_by(["term", "row"]).aggregate([([], "count_all")])
        rows = _np(tfp["row"])
        tf = _np(tfp["count_all"].cast(pa.int64()))
        tidx = np.asarray(pc.index_in(tfp["term"].combine_chunks(), qarr))
        dlr = dl[rows]
        sat = (22 * tf * avd * BM25_SCALE) // (10 * tf * avd + 3 * avd
                                               + 9 * dlr)
        contrib = idf_arr[tidx] * sat // BM25_SCALE
        score = np.zeros(t.num_rows, dtype=np.int64)
        np.add.at(score, rows, contrib)
        nz = np.nonzero(score)[0]
        order = nz[np.lexsort((ids[nz], -score[nz]))][:k]
        return pa.table({
            "doc_id": pa.array(ids[order], type=pa.int64()),
            "score_scaled": pa.array(score[order], type=pa.int64()),
        })

    parts = docs.map_batches(score_partial,
                             batch_format="pyarrow").to_pandas()
    if "doc_id" not in parts.columns:
        parts = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                              "score_scaled": pd.Series(dtype="int64")})
    parts = parts.sort_values(["score_scaled", "doc_id"],
                              ascending=[False, True]).head(k)
    return pd.DataFrame({
        "rank": np.arange(1, len(parts) + 1, dtype=np.int64),
        "doc_id": parts["doc_id"].to_numpy(dtype=np.int64),
        "score_scaled": parts["score_scaled"].to_numpy(dtype=np.int64),
    })


def rrf_fuse_top_docs(docs, k: int = 20, depth: int = 50):
    """Reciprocal-rank fusion of two global rankings of the corpus —
    (n_tokens desc, doc_id asc) and (n_chars desc, doc_id asc) — each
    truncated at ``depth``, fused by
    ``rrf_scaled = sum(1_000_000 // (60 + rank))`` over the lists the doc
    appears in, output re-ranked (rrf desc, doc_id asc) and cut at ``k``.

    Both input rankings use the bounded-partial top-``depth`` pattern
    (≤depth rows per batch to the driver, no global sort); the fusion
    itself touches ≤2·depth rows.  Integer reciprocal ranks make the
    fusion exact and engine-independent.  Returns pandas
    (rank, doc_id, rrf_scaled).
    """
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(
            t["text"].combine_chunks()
            if isinstance(t["text"], pa.ChunkedArray) else t["text"], " ")
        flat_len = np.asarray(pc.list_value_length(toks).fill_null(0),
                              dtype=np.int64)
        nonempty = np.zeros(t.num_rows, dtype=np.int64)
        flat = toks.flatten()
        row_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), flat_len)
        mask = np.asarray(pc.not_equal(flat, ""))
        np.add.at(nonempty, row_idx[mask], 1)
        ids = _np(t["doc_id"])
        nchars = _np(t["n_chars"])
        keep_t = np.lexsort((ids, -nonempty))[:depth]
        keep_c = np.lexsort((ids, -nchars))[:depth]
        keep = np.unique(np.concatenate([keep_t, keep_c]))
        return pa.table({
            "doc_id": pa.array(ids[keep], type=pa.int64()),
            "n_tokens": pa.array(nonempty[keep], type=pa.int64()),
            "n_chars": pa.array(nchars[keep], type=pa.int64()),
        })

    parts = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    if "doc_id" not in parts.columns:
        parts = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                              "n_tokens": pd.Series(dtype="int64"),
                              "n_chars": pd.Series(dtype="int64")})
    by_tok = parts.sort_values(["n_tokens", "doc_id"],
                               ascending=[False, True]).head(depth)
    by_chr = parts.sort_values(["n_chars", "doc_id"],
                               ascending=[False, True]).head(depth)
    rrf: dict[int, int] = {}
    for frame in (by_tok, by_chr):
        for r, d in enumerate(frame["doc_id"].to_numpy(), start=1):
            rrf[int(d)] = rrf.get(int(d), 0) + RRF_SCALE // (RRF_K + r)
    fused = sorted(rrf.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pd.DataFrame({
        "rank": np.arange(1, len(fused) + 1, dtype=np.int64),
        "doc_id": np.array([d for d, _ in fused], dtype=np.int64),
        "rrf_scaled": np.array([s for _, s in fused], dtype=np.int64),
    })


def proximity_cooccurrence(docs, term_a: str, term_b: str,
                           window: int = 3):
    """Documents where ``term_a`` and ``term_b`` co-occur within
    ``window`` token positions, with the exact minimum distance —
    the phrase/proximity operator of a ranked-retrieval stack
    (positions are 1-based among NONEMPTY tokens).

    Plan: one streaming pass, zero shuffles.  Per batch the token stream
    flattens once (shared :func:`.corpus._tokens_nonempty` kernel);
    within-row positions come from one subtract-the-segment-start
    vectorized pass; each A-occurrence finds its nearest B-occurrence by
    binary search over composite ``row * stride + pos`` keys (both hit
    lists are already row-major sorted, so ``np.searchsorted`` gives the
    two bracketing candidates), and a scatter-min per row produces the
    per-document minimum — no per-row Python, no position explosion
    across the exchange.  Docs are never split across batches (row-based
    blocks), so each batch's answer is final.

    Returns a Dataset of ``(doc_id, min_dist)`` filtered to
    ``min_dist <= window``.
    """
    from .corpus import _tokens_nonempty

    if term_a == term_b:
        raise ValueError("proximity_cooccurrence: distinct terms required")

    def batch_hits(t: pa.Table) -> pa.Table:
        flat, row_idx = _tokens_nonempty(t)
        n = len(flat)
        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "min_dist": pa.array([], type=pa.int64())})
        if n == 0:
            return empty
        # 1-based position among nonempty tokens of the same row
        starts = np.ones(n, dtype=bool)
        starts[1:] = row_idx[1:] != row_idx[:-1]
        idx = np.arange(n, dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(starts, idx, 0))
        pos = idx - seg_start + 1

        am = np.asarray(pc.equal(flat, term_a))
        bm = np.asarray(pc.equal(flat, term_b))
        if not am.any() or not bm.any():
            return empty
        stride = np.int64(int(pos.max()) + 1)
        a_key = row_idx[am] * stride + pos[am]
        b_key = row_idx[bm] * stride + pos[bm]
        ins = np.searchsorted(b_key, a_key)
        best = np.full(len(a_key), np.iinfo(np.int64).max)
        for cand in (np.clip(ins - 1, 0, len(b_key) - 1),
                     np.clip(ins, 0, len(b_key) - 1)):
            same_row = (b_key[cand] // stride) == (a_key // stride)
            d = np.abs(a_key - b_key[cand])
            best = np.where(same_row, np.minimum(best, d), best)
        a_rows = row_idx[am]
        row_best = np.full(t.num_rows, np.iinfo(np.int64).max)
        np.minimum.at(row_best, a_rows, best)
        hit = row_best <= window
        ids = _np(t["doc_id"]).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids[hit], type=pa.int64()),
            "min_dist": pa.array(row_best[hit], type=pa.int64())})

    return docs.map_batches(batch_hits, batch_format="pyarrow")
