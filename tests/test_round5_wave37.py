"""Wave-37 operator tests: containment pairs, k-core decomposition."""
import numpy as np
import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_containment_pairs_finds_quote_inclusion():
    import ray.data

    from pdf2doi_ray.stages.dedup import containment_pairs

    quote = "to be or not to be that is the question"
    article = ("in this long article about drama we observe that " + quote
               + " remains the most quoted line of the entire play and "
                 "critics keep returning to it for new readings")
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [quote, article,
                 "unrelated text about cooking pasta with fresh basil "
                 "and plenty of olive oil in a big pan"],
    })
    got = containment_pairs(ray.data.from_pandas(docs).repartition(2),
                            tau_permille=800).to_pandas()
    pairs = {(a, b): c for a, b, c in
             zip(got["doc_a"], got["doc_b"], got["containment_permille"])}
    # the quote's shingles are a subset of the article's -> containment 1000
    assert pairs.get((0, 1)) == 1000
    assert not any(2 in p for p in pairs)
    # jaccard would have REJECTED this pair at the same threshold
    from pdf2doi_ray.stages.dedup import minhash_near_dups
    jac = minhash_near_dups(ray.data.from_pandas(docs).repartition(2),
                            threshold_permille=800).to_pandas()
    assert len(jac) == 0


@pytest.mark.usefixtures("ray_session")
def test_containment_pairs_stop_gram_demotion_still_exact():
    """Boilerplate opener shared by every doc must not break completeness
    (prefix demotion) nor flood the result (threshold on min side)."""
    import ray.data

    from pdf2doi_ray.stages.dedup import containment_pairs

    stop = "copyright terms apply to all content on this site"
    docs = []
    for i in range(40):
        docs.append({"doc_id": i,
                     "text": f"{stop} unique body w{i}a w{i}b w{i}c "
                             f"w{i}d w{i}e w{i}f"})
    # doc 100 contained in doc 0 (its whole text is doc 0's opening)
    docs.append({"doc_id": 100, "text": f"{stop} unique body"})
    df = pd.DataFrame(docs)
    got = containment_pairs(ray.data.from_pandas(df).repartition(3),
                            tau_permille=900, hot_df=8).to_pandas()
    pairs = {(a, b) for a, b in zip(got["doc_a"], got["doc_b"])}
    # doc 100's set is exactly the shared opening + 'unique body' grams,
    # fully inside EVERY doc -> pairs (i, 100) for all i
    assert all((i, 100) in pairs for i in range(40))
    # but no (i, j) pair among the full docs (their containment is the
    # stop prefix over ~15 shingles < 0.9)
    assert not any(b != 100 for _, b in pairs)


@pytest.mark.usefixtures("ray_session")
def test_kcore_decomposition_peels_trees_keeps_cycles():
    import ray.data

    from pdf2doi_ray.stages.graph import kcore_decomposition

    # triangle 0-1-2, square 10-11-12-13, pendant chain 2-20-21,
    # isolated edge 30-31
    pairs = pd.DataFrame({
        "vec_a": [0, 1, 0, 10, 11, 12, 10, 2, 20, 30],
        "vec_b": [1, 2, 2, 11, 12, 13, 13, 20, 21, 31],
    })
    got = kcore_decomposition(ray.data.from_pandas(pairs).repartition(2),
                              k=2)
    got = got if isinstance(got, pd.DataFrame) else got.to_pandas()
    core = dict(zip(got["node"], got["core_degree"]))
    assert set(core) == {0, 1, 2, 10, 11, 12, 13}
    assert all(core[n] == 2 for n in core)
    # k=3: square dies (degree 2), triangle dies too (degree 2) -> empty
    got3 = kcore_decomposition(
        ray.data.from_pandas(pairs).repartition(2), k=3)
    got3 = got3 if isinstance(got3, pd.DataFrame) else got3.to_pandas()
    assert len(got3) == 0 and list(got3.columns) == ["node",
                                                     "core_degree"]
    # k4 clique survives k=3
    cl = pd.DataFrame({"vec_a": [0, 0, 0, 1, 1, 2],
                       "vec_b": [1, 2, 3, 2, 3, 3]})
    gotc = kcore_decomposition(ray.data.from_pandas(cl), k=3)
    gotc = gotc if isinstance(gotc, pd.DataFrame) else gotc.to_pandas()
    assert dict(zip(gotc["node"], gotc["core_degree"])) == \
        {0: 3, 1: 3, 2: 3, 3: 3}


@pytest.mark.usefixtures("ray_session")
def test_curate_v4_composition():
    """Language-gate drops the mislabeled doc; containment dedup drops
    the quoted copy; mixture reports over the survivors only."""
    import ray.data

    from pdf2doi_ray.stages.corpus import curate_v4

    en = "the cat sat on the mat and the dog ran in the park all day"
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [en,
                 en + " extra tail words",      # contains doc 0 -> dropped
                 "der hund lief im park den ganzen tag und die katze sass",
                 en.replace("cat", "bird")],    # en text labeled de:
        "lang": ["en", "en", "de", "de"],       # mislabel -> gated out
        "source": ["s1", "s1", "s2", "s2"],
    })
    got = curate_v4(ray.data.from_pandas(docs).repartition(2),
                    containment_tau_permille=900)
    got = got if isinstance(got, pd.DataFrame) else got.to_pandas()
    got = got.set_index("source")
    # s1 survivors: doc 0 only (doc 1 contains doc 0's whole set ->
    # higher id dropped); s2 survivors: doc 2 only (doc 3 mislabeled)
    assert got.loc["s1", "n_docs"] == 1
    assert got.loc["s2", "n_docs"] == 1
    assert got.loc["s1", "n_tokens"] == len(en.split(" "))
