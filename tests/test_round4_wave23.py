"""Round-4 wave-23: edge triangle support, per-doc vocabulary novelty."""

import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_edge_triangle_support_counts_and_zeros():
    import ray.data

    from pdf2doi_ray.stages.graph import edge_triangle_support

    # K4 on {1,2,3,4}: every edge sits in exactly 2 triangles; plus a
    # pendant edge (4,5) with support 0
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    df = pd.DataFrame({"vec_a": [a for a, _ in edges],
                       "vec_b": [b for _, b in edges]})
    got = edge_triangle_support(
        ray.data.from_pandas(df).repartition(3)).to_pandas()
    sup = {(r.vec_a, r.vec_b): r.support for r in got.itertuples()}
    assert len(sup) == 7
    for e in edges[:-1]:
        assert sup[e] == 2, (e, sup)
    assert sup[(4, 5)] == 0


@pytest.mark.usefixtures("ray_session")
def test_edge_triangle_support_triangle_free():
    import ray.data

    from pdf2doi_ray.stages.graph import edge_triangle_support

    df = pd.DataFrame({"vec_a": [1, 3], "vec_b": [2, 4]})
    got = edge_triangle_support(ray.data.from_pandas(df)).to_pandas()
    assert sorted(got["support"].tolist()) == [0, 0]


@pytest.mark.usefixtures("ray_session")
def test_doc_novelty_first_occurrence_attribution():
    import ray.data

    from pdf2doi_ray.stages.corpus import doc_novelty

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b a", "b c", "c d e"],
    })
    got = doc_novelty(ray.data.from_pandas(docs).repartition(3)) \
        .to_pandas().set_index("doc_id")
    # doc1: terms {a,b} both new → 2/2; doc2: {b,c} new {c} → 1/2;
    # doc3: {c,d,e} new {d,e} → 2/3
    assert got.loc[1, "n_terms"] == 2 and got.loc[1, "n_new_terms"] == 2
    assert got.loc[1, "novelty_permille"] == 1000
    assert got.loc[2, "n_terms"] == 2 and got.loc[2, "n_new_terms"] == 1
    assert got.loc[2, "novelty_permille"] == 500
    assert got.loc[3, "n_terms"] == 3 and got.loc[3, "n_new_terms"] == 2
    assert got.loc[3, "novelty_permille"] == 666
