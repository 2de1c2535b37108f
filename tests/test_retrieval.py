"""Ranked retrieval: BM25 and reciprocal-rank fusion.

Multi-block invariance (the bounded-partial merge must be exact under any
partitioning), brute-force reference arithmetic, and degenerate inputs.
"""

import numpy as np
import pandas as pd
import pytest

from pdf2doi_ray.stages.retrieval import bm25_top_docs, rrf_fuse_top_docs

SF = "/root/testdata/sf0.001"


def _docs_ds(n_blocks, columns=("doc_id", "text")):
    import ray.data
    return ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=list(columns),
                                 override_num_blocks=n_blocks)


def _bm25_reference(df: pd.DataFrame, terms, k):
    """Independent row-at-a-time Python-int implementation."""
    toks = [[w for w in t.split(" ") if w] for t in df["text"]]
    nd = len(df)
    avn = sum(len(t) for t in toks)
    avd = max(avn // nd, 1)
    df_t = {q: sum(1 for t in toks if q in t) for q in terms}
    scores = {}
    for did, tok in zip(df["doc_id"], toks):
        dl = len(tok)
        s = 0
        for q in terms:
            tf = tok.count(q)
            if tf == 0 or df_t[q] == 0:
                continue
            idf = nd * 1000 // df_t[q]
            sat = (22 * tf * avd * 1000) // (10 * tf * avd + 3 * avd
                                             + 9 * dl)
            s += idf * sat // 1000
        if s > 0:
            scores[int(did)] = s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pd.DataFrame({
        "rank": np.arange(1, len(ranked) + 1, dtype=np.int64),
        "doc_id": np.array([d for d, _ in ranked], dtype=np.int64),
        "score_scaled": np.array([s for _, s in ranked], dtype=np.int64),
    })


@pytest.mark.usefixtures("ray_session")
def test_bm25_matches_reference_any_partitioning():
    terms = ("hash", "join", "vector", "slow")
    raw = pd.read_parquet(f"{SF}/documents.parquet",
                          columns=["doc_id", "text"])
    want = _bm25_reference(raw, terms, k=20)
    for nb in (1, 7):
        got = bm25_top_docs(_docs_ds(nb), terms, k=20)
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


@pytest.mark.usefixtures("ray_session")
def test_bm25_no_matching_terms_is_empty():
    got = bm25_top_docs(_docs_ds(3), ("zzzznotaterm",), k=5)
    assert len(got) == 0
    assert list(got.columns) == ["rank", "doc_id", "score_scaled"]


@pytest.mark.usefixtures("ray_session")
def test_bm25_rejects_empty_query():
    with pytest.raises(ValueError):
        bm25_top_docs(_docs_ds(1), (), k=5)


@pytest.mark.usefixtures("ray_session")
def test_rrf_matches_reference_any_partitioning():
    raw = pd.read_parquet(f"{SF}/documents.parquet",
                          columns=["doc_id", "text", "n_chars"])
    nt = raw["text"].map(lambda t: sum(1 for w in t.split(" ") if w))
    a = raw.assign(nt=nt).sort_values(["nt", "doc_id"],
                                      ascending=[False, True]).head(50)
    b = raw.sort_values(["n_chars", "doc_id"],
                        ascending=[False, True]).head(50)
    rrf = {}
    for frame in (a, b):
        for r, d in enumerate(frame["doc_id"], start=1):
            rrf[int(d)] = rrf.get(int(d), 0) + 1_000_000 // (60 + r)
    fused = sorted(rrf.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    want = pd.DataFrame({
        "rank": np.arange(1, len(fused) + 1, dtype=np.int64),
        "doc_id": np.array([d for d, _ in fused], dtype=np.int64),
        "rrf_scaled": np.array([s for _, s in fused], dtype=np.int64),
    })
    for nb in (1, 7):
        got = rrf_fuse_top_docs(
            _docs_ds(nb, ("doc_id", "text", "n_chars")), k=20, depth=50)
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
