"""Round-4 wave-9: bloom semi-join, lead-time quantiles, Q14 share,
source mix allocator, within-source dup rate."""

import datetime

import pandas as pd
import pytest


def _rd(df, blocks=3):
    import ray.data
    return ray.data.from_pandas(df).repartition(blocks)


@pytest.mark.usefixtures("ray_session")
def test_bloom_semi_revenue_exact_under_heavy_false_positives():
    """A deliberately saturated filter (fpp→1) admits everything at the
    prefilter; the recovery join must still produce the exact answer."""
    from pdf2doi_ray.stages.joins import bloom_semi_revenue

    orders = pd.DataFrame({
        "o_orderkey": [1, 2, 3],
        "o_totalprice": [50.0, 500.0, 700.0]})
    li = pd.DataFrame({
        "l_orderkey": [1, 1, 2, 3, 3],
        "l_returnflag": ["A", "N", "N", "A", "A"],
        "l_quantity": [1.0, 2.0, 3.0, 4.0, 5.5],
        "l_extendedprice": [10.0, 10.0, 10.0, 10.0, 10.0],
        "l_discount": [0.0, 0.0, 0.5, 0.0, 0.0]})
    for fpp in (0.01, 0.9):
        got = bloom_semi_revenue(
            _rd(orders, 2), _rd(li, 3), price_threshold=400.0,
            fpp=fpp, num_partitions=4).to_pandas() \
            .sort_values("l_returnflag").reset_index(drop=True)
        # orders 2 and 3 qualify → lines (2,N), (3,A), (3,A)
        assert got["l_returnflag"].tolist() == ["A", "N"]
        assert got["n_items"].tolist() == [2, 1]
        assert got["sum_qty_milli"].tolist() == [9500, 3000]
        assert got["revenue_milli"].tolist() == [20000, 5000]


@pytest.mark.usefixtures("ray_session")
def test_supplier_lead_quantiles_tiny_fixture():
    from pdf2doi_ray.stages.joins import supplier_lead_quantiles

    d = datetime.datetime
    orders = pd.DataFrame({
        "o_orderkey": [1, 2],
        "o_orderdate": [d(2024, 1, 1), d(2024, 1, 10)]})
    li = pd.DataFrame({
        "l_orderkey": [1, 1, 2],
        "l_suppkey": [5, 5, 5],
        "l_shipdate": [d(2024, 1, 3), d(2024, 1, 8), d(2024, 1, 11)]})
    got = supplier_lead_quantiles(
        _rd(orders, 1), _rd(li, 2), quantiles_permille=(500, 1000),
        num_partitions=2)
    got = got.sort_values(["l_suppkey", "q_permille"]) \
        .reset_index(drop=True)
    # latencies (days): 2, 7, 1 → sorted 1,2,7; p50 = 2nd = 2, p100 = 7
    assert got["q_permille"].tolist() == [500, 1000]
    assert got["value"].tolist() == [2000, 7000]   # milli-days


@pytest.mark.usefixtures("ray_session")
def test_promo_revenue_share_months_and_zero_promo():
    from pdf2doi_ray.stages.joins import promo_revenue_share

    d = datetime.datetime
    part = pd.DataFrame({
        "p_partkey": [1, 2], "p_type": ["PROMO", "STANDARD"]})
    li = pd.DataFrame({
        "l_partkey": [1, 2, 2],
        "l_shipdate": [d(2023, 12, 31), d(2023, 12, 15), d(2024, 1, 1)],
        "l_extendedprice": [100.0, 300.0, 50.0],
        "l_discount": [0.0, 0.0, 0.0]})
    got = promo_revenue_share(_rd(part, 1), _rd(li, 2),
                              num_partitions=2).to_pandas() \
        .sort_values("month").reset_index(drop=True)
    # Dec 2023 = month 647 since 1970-01; Jan 2024 = 648
    assert got["month"].tolist() == [647, 648]
    assert got["promo_rev_milli"].tolist() == [100000, 0]
    assert got["total_rev_milli"].tolist() == [400000, 50000]
    assert got["promo_permille"].tolist() == [250, 0]


@pytest.mark.usefixtures("ray_session")
def test_source_mix_plan_caps_dominant_source():
    from pdf2doi_ray.stages.corpus import source_mix_plan

    docs = pd.DataFrame({
        "source": ["big"] * 4 + ["small"],
        # 5 tokens per doc (single-space contract, incl. empties)
        "text": ["a b c d e"] * 4 + ["x y z w v"]})
    got = source_mix_plan(_rd(docs, 2), cap_tokens=10).to_pandas() \
        .sort_values("source").reset_index(drop=True)
    assert got["n_tokens"].tolist() == [20, 5]
    assert got["capped_tokens"].tolist() == [10, 5]
    # 10/15 and 5/15 → 666 and 333 permille (floor)
    assert got["mix_permille"].tolist() == [666, 333]


@pytest.mark.usefixtures("ray_session")
def test_dup_rate_by_source_cross_block_duplicates():
    from pdf2doi_ray.stages.corpus import dup_rate_by_source

    docs = pd.DataFrame({
        "source": ["s1"] * 4 + ["s2"] * 2,
        "text": ["dup", "dup", "dup", "uniq", "a", "b"]})
    for blocks in (1, 4):
        got = dup_rate_by_source(_rd(docs, blocks)).to_pandas() \
            .sort_values("source").reset_index(drop=True)
        assert got["n_docs"].tolist() == [4, 2]
        assert got["n_distinct"].tolist() == [2, 2]
        assert got["dup_permille"].tolist() == [500, 0]
