"""Round-4 wave-31: corpus data card."""

import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_corpus_datacard_metrics():
    import ray.data

    from pdf2doi_ray.stages.corpus import corpus_datacard

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b", "a b", "c"],
        "lang": ["en", "en", "fr"],
    })
    got = corpus_datacard(ray.data.from_pandas(docs).repartition(3))
    m = dict(zip(got["metric"], got["value"]))
    assert m["n_docs"] == 3
    assert m["n_tokens"] == 5        # 2 + 2 + 1
    assert m["n_chars"] == 7         # 3 + 3 + 1
    assert m["n_langs"] == 2
    assert m["n_distinct_texts"] == 2
    assert m["n_quality"] == 0       # all below the 20-token gate
