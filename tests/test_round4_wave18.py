"""Round-4 wave-18: basket-size histogram, lang run-length audit."""

import pandas as pd
import pytest


def _rd(df, blocks=3):
    import ray.data
    return ray.data.from_pandas(df).repartition(blocks)


@pytest.mark.usefixtures("ray_session")
def test_basket_size_histogram_cross_block_orders():
    from pdf2doi_ray.stages.aggs import basket_size_histogram

    li = pd.DataFrame({"l_orderkey": [1, 1, 1, 2, 3, 3]})
    for blocks in (1, 6):
        got = basket_size_histogram(_rd(li, blocks)).to_pandas() \
            .sort_values("basket_size").reset_index(drop=True)
        assert got["basket_size"].tolist() == [1, 2, 3]
        assert got["n_orders"].tolist() == [1, 1, 1]


@pytest.mark.usefixtures("ray_session")
def test_lang_run_stats_islands():
    from pdf2doi_ray.stages.aggs import lang_run_stats

    docs = pd.DataFrame({
        "doc_id": list(range(7)),
        #        en en fr en en en fr → en: runs [2,3]; fr: [1,1]
        "lang": ["en", "en", "fr", "en", "en", "en", "fr"]})
    for blocks in (1, 7):
        got = lang_run_stats(_rd(docs, blocks)).to_pandas() \
            .sort_values("lang").reset_index(drop=True)
        by = {r.lang: r for r in got.itertuples()}
        assert (by["en"].n_runs, by["en"].max_run,
                by["en"].n_docs) == (2, 3, 5)
        assert (by["fr"].n_runs, by["fr"].max_run,
                by["fr"].n_docs) == (2, 1, 2)
