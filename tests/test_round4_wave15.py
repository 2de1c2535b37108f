"""Round-4 wave-15: YoY revenue growth, dimension scorecard, lang
concentration."""

import datetime

import pandas as pd
import pytest


def _rd(df, blocks=3):
    import ray.data
    return ray.data.from_pandas(df).repartition(blocks)


@pytest.mark.usefixtures("ray_session")
def test_revenue_yoy_growth_truncating_negative():
    from pdf2doi_ray.stages.joins import revenue_yoy_growth

    d = datetime.datetime
    nation = pd.DataFrame({"n_nationkey": [1], "n_name": ["FR"]})
    supplier = pd.DataFrame({"s_suppkey": [10], "s_nationkey": [1]})
    li = pd.DataFrame({
        "l_suppkey": [10, 10, 10],
        "l_shipdate": [d(2020, 6, 1), d(2021, 6, 1), d(2023, 6, 1)],
        "l_extendedprice": [300.0, 100.0, 50.0],
        "l_discount": [0.0, 0.0, 0.0]})
    got = revenue_yoy_growth(_rd(nation, 1), _rd(supplier, 1),
                             _rd(li, 2)).to_pandas() \
        .sort_values("year").reset_index(drop=True)
    # 2021 vs 2020: -200/300 → trunc(-666.7) = -666; 2023 has no 2022
    assert got["year"].tolist() == [2021]
    assert got["growth_permille"].tolist() == [-666]
    assert got["prev_revenue_milli"].tolist() == [300000]


@pytest.mark.usefixtures("ray_session")
def test_dim_stats_detects_dead_dimension():
    from pdf2doi_ray.stages.similarity import dim_stats

    rows = pd.DataFrame({
        "embedding": [[0.5, 1.0], [0.5, 2.0], [0.5, 3.0]]})
    got = dim_stats(_rd(rows, 2)).to_pandas() \
        .sort_values("dim").reset_index(drop=True)
    assert got["is_dead"].tolist() == [1, 0]
    assert got["sum_milli"].tolist() == [1500, 6000]
    assert got["sumsq_millisq"].tolist() == [750000, 14_000_000]
    assert got["n"].tolist() == [3, 3]


@pytest.mark.usefixtures("ray_session")
def test_source_lang_concentration_monolingual_vs_even():
    from pdf2doi_ray.stages.corpus import source_lang_concentration

    docs = pd.DataFrame({
        "source": ["mono"] * 4 + ["even"] * 4,
        "lang": ["en"] * 4 + ["en", "fr", "de", "es"]})
    got = source_lang_concentration(_rd(docs, 3)).to_pandas() \
        .sort_values("source").reset_index(drop=True)
    by = {r.source: r for r in got.itertuples()}
    assert by["mono"].lang_simpson_permille == 1000
    assert by["even"].lang_simpson_permille == 250
    assert by["even"].n_langs == 4
