"""Golden oracles for the queries the driver can only rows-check
(minhash_near_dups, simhash, winnow_fingerprints) plus stated recall floors
for the two approximate ANN variants (knn_lsh, knn_ivf) — VERDICT round-1
next-round item 3.  The reference values come from the independent naive
implementations in ``golden_impl.py``; the recall floors are measured
against the exact brute-force ranking."""

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import golden_impl as G

SF = "/root/testdata/sf0.001"


def _docs_dict():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


@pytest.mark.usefixtures("ray_session")
def test_minhash_near_dups_matches_independent_impl():
    import __ray_entry__ as e

    out = e.queries()["minhash_near_dups"](SF).to_pandas()
    engine = set(zip(out["doc_a"].astype(int), out["doc_b"].astype(int),
                     out["jaccard_permille"].astype(int)))
    golden = G.near_dup_pairs(_docs_dict())
    assert engine == golden
    assert len(engine) == len(out)           # no duplicate pair rows


@pytest.mark.usefixtures("ray_session")
def test_simhash_matches_independent_impl():
    import __ray_entry__ as e

    out = e.queries()["simhash"](SF).to_pandas()
    docs = _docs_dict()
    assert len(out) == len(docs)
    for doc_id, sh in zip(out["doc_id"], out["simhash"]):
        assert int(sh) == G.simhash(docs[int(doc_id)]), doc_id


@pytest.mark.usefixtures("ray_session")
def test_winnow_matches_independent_impl():
    import __ray_entry__ as e

    out = e.queries()["winnow_fingerprints"](SF).to_pandas()
    docs = _docs_dict()
    got = {}
    for doc_id, seq, fp in zip(out["doc_id"], out["seq"],
                               out["fingerprint"]):
        got.setdefault(int(doc_id), {})[int(seq)] = int(fp)
    assert set(got) == set(docs)
    for doc_id, text in docs.items():
        fps = G.winnow(text)
        seqs = got[doc_id]
        assert sorted(seqs) == list(range(len(fps))), doc_id
        assert [seqs[i] for i in range(len(fps))] == fps, doc_id


def _exact_topk(k=10):
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"])
    mat = np.array([np.asarray(e, dtype=np.float64)
                    for e in t["embedding"].to_pylist()])
    q = mat[int(np.nonzero(ids == 0)[0][0])]
    qn = q / np.linalg.norm(q)
    nrm = np.linalg.norm(mat, axis=1)
    nrm[nrm == 0] = 1.0
    sims = (mat @ qn) / nrm
    order = np.lexsort((ids, -sims))[:k]
    return set(int(i) for i in ids[order])


@pytest.mark.usefixtures("ray_session")
def test_knn_lsh_recall_floor():
    import __ray_entry__ as e

    exact = _exact_topk()
    got = set(e.queries()["knn_lsh"](SF)["vec_id"].astype(int))
    # stated floor: ≥ 0.5 at the fixture's moderate (~0.45 cosine) neighbor
    # sims with the 8×8-bit multi-probe config (measured 0.6–0.8); corpora
    # with genuinely close neighbors recall far higher at the same pruning
    assert len(got & exact) / 10 >= 0.5


@pytest.mark.usefixtures("ray_session")
def test_knn_ivf_recall_floor():
    import __ray_entry__ as e

    exact = _exact_topk()
    got = set(e.queries()["knn_ivf"](SF)["vec_id"].astype(int))
    # stated floor: ≥ 0.7 with 16 centroids / 4 probes (measured 0.9)
    assert len(got & exact) / 10 >= 0.7


@pytest.mark.usefixtures("ray_session")
def test_embedding_near_dups_lsh_recall():
    import __ray_entry__ as e

    exact_out = e.queries()["embedding_near_dups"](SF).to_pandas()
    exact = set(zip(exact_out["vec_a"].astype(int),
                    exact_out["vec_b"].astype(int)))
    lsh_out = e.queries()["embedding_near_dups_lsh"](SF).to_pandas()
    got = set(zip(lsh_out["vec_a"].astype(int), lsh_out["vec_b"].astype(int)))
    assert got <= exact                       # precision 1.0: exact verify
    # stated floor ≥ 0.9 (12×3-bit config measures 1.0 on the fixture)
    assert len(got & exact) / max(1, len(exact)) >= 0.9


@pytest.mark.usefixtures("ray_session")
def test_simhash_near_dups_matches_brute_force():
    """Banded LSH must find EXACTLY the brute-force hamming<=k pairs:
    recall 1.0 is guaranteed by pigeonhole (k+1 bands), precision by the
    popcount verify, so the sets are equal — not just overlapping."""
    import numpy as np

    import __ray_entry__ as e

    out = e.queries()["simhash_near_dups"](SF).to_pandas()
    docs = _docs_dict()
    ids = sorted(docs)
    sh = np.array([G.simhash(docs[i]) for i in ids], dtype=np.uint64)
    brute = set()
    for i in range(len(ids)):
        x = sh[i] ^ sh[i + 1:]
        ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8),
                            axis=1).sum(axis=1)
        for j, h in zip(range(i + 1, len(ids)), ham):
            if h <= 3:
                brute.add((ids[i], ids[j], int(h)))
    engine = set(zip(out["pair_a"].astype(int), out["pair_b"].astype(int),
                     out["hamming"].astype(int)))
    assert engine == brute
    assert len(out) == len(engine)           # no duplicate pair rows
