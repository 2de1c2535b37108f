"""Zero-row robustness for the third-session wave operators: an empty
input (or empty filter result) must yield an empty result, not a crash —
the guarantee driver queries rely on when a filter drains a partition."""

import pandas as pd
import pytest


def _empty(cols):
    import ray.data
    df = pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols})
    return ray.data.from_pandas(df)


@pytest.mark.usefixtures("ray_session")
def test_empty_event_ops():
    from pdf2doi_ray.stages.windows import event_debounce

    ev = _empty([("event_id", "int64"), ("user_id", "int64"),
                 ("event_type", object), ("ts", "datetime64[us]")])
    assert event_debounce(ev).count() == 0


@pytest.mark.usefixtures("ray_session")
def test_empty_doc_ops():
    from pdf2doi_ray.stages.corpus import (batch_padding_plan,
                                           doc_frequency_spectrum,
                                           doc_novelty, delta_oov_rate,
                                           skipgram_cooccurrence)

    docs = _empty([("doc_id", "int64"), ("text", object)])
    assert batch_padding_plan(docs).count() == 0
    assert doc_frequency_spectrum(docs).count() == 0
    assert doc_novelty(docs).count() == 0
    assert delta_oov_rate(docs).count() == 0
    assert len(skipgram_cooccurrence(docs)) == 0


@pytest.mark.usefixtures("ray_session")
def test_empty_graph_ops():
    from pdf2doi_ray.stages.graph import (edge_triangle_support,
                                          personalized_pagerank)

    edges = _empty([("vec_a", "int64"), ("vec_b", "int64")])
    assert edge_triangle_support(edges).count() == 0
    e2 = _empty([("src", "int64"), ("dst", "int64")])
    nodes = _empty([("node", "int64"), ("seed", "int64")])
    assert personalized_pagerank(e2, nodes).count() == 0


@pytest.mark.usefixtures("ray_session")
def test_empty_textstats_ops():
    from pdf2doi_ray.stages.textstats import (byte_inventory_by_lang,
                                              token_weighted_char_quantiles)

    docs = _empty([("text", object), ("lang", object)])
    assert byte_inventory_by_lang(docs).count() == 0
    q = token_weighted_char_quantiles(_empty([("text", object)]))
    # probes still emit rows, with zero totals
    assert (q["total_tokens"] == 0).all()


@pytest.mark.usefixtures("ray_session")
def test_empty_join_and_topk_ops():
    from pdf2doi_ray.stages.joins import manifest_reconcile
    from pdf2doi_ray.stages.windowfns import grouped_top_k_ties

    l = _empty([("id", "int64")])
    r = _empty([("id", "int64")])
    assert manifest_reconcile(l, r).count() == 0
    ds = _empty([("lang", object), ("n_tokens", "int64")])
    assert grouped_top_k_ties(ds, "lang", "n_tokens", k=3).count() == 0
