"""Round-4 wave-22: method-agreement matrix, skip-gram co-occurrence."""

import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_method_agreement_counts_conflicts():
    import ray.data

    from pdf2doi_ray.pipelines.identify import method_agreement
    from pdf2doi_ray.sources.pages import synthesize_pages

    import numpy as np
    docs = pd.DataFrame({
        "doc_id": np.arange(40, dtype=np.int64),  # slots 0..19 twice
        "text": ["plain body words"] * 40,
        "lang": ["en"] * 40,
    })
    pages = synthesize_pages(docs)
    got = method_agreement(ray.data.from_pandas(pages).repartition(4)) \
        .to_pandas()
    by = {(r.method_a, r.method_b): (r.n_both, r.n_agree)
          for r in got.itertuples()}
    # slot 12 (meta mc vs text tc) ×2 docs; slot 13 (url vs text tc) ×2;
    # infos and filename never co-fire; nothing ever agrees
    assert by[("document_infos", "filename")] == (0, 0)
    assert by[("document_infos", "document_text")] == (2, 0)
    assert by[("filename", "document_text")] == (2, 0)


@pytest.mark.usefixtures("ray_session")
def test_skipgram_window_and_ranking():
    import ray.data

    from pdf2doi_ray.stages.corpus import skipgram_cooccurrence

    docs = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["a b c d", "a c"],
    })
    got = skipgram_cooccurrence(
        ray.data.from_pandas(docs).repartition(2), window=2, k=50)
    counts = dict(zip(got["pair"], got["n_occurrences"]))
    # doc1 offsets 1-2: ab bc cd ac bd; doc2: ac → "a c" count 2
    assert counts == {"a c": 2, "a b": 1, "b c": 1, "c d": 1, "b d": 1}
    assert got.iloc[0]["pair"] == "a c" and got.iloc[0]["rank"] == 1
    # cross-doc pair must not exist ("d a" would need doc spanning)
    assert "d a" not in counts
