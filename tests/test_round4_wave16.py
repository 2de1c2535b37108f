"""Round-4 wave-16: conversion latency, Lorenz deciles, row-group
advisor."""

import datetime

import pandas as pd
import pytest


def _rd(df, blocks=3):
    import ray.data
    return ray.data.from_pandas(df).repartition(blocks)


@pytest.mark.usefixtures("ray_session")
def test_conversion_latency_prior_click_only():
    from pdf2doi_ray.stages.aggs import conversion_latency_histogram

    t0 = datetime.datetime(2024, 1, 1)

    def s(sec):
        return t0 + datetime.timedelta(seconds=sec)

    ev = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 3, 3],
        "event_id": [1, 2, 3, 4, 5, 6],
        "ts": [s(0), s(90), s(600), s(0), s(0), s(30)],
        "event_type": ["click", "purchase", "purchase",
                       "purchase",          # user 2: no prior click
                       "purchase", "click"]})  # user 3: click AFTER
    for blocks in (1, 5):
        got = conversion_latency_histogram(_rd(ev, blocks)).to_pandas() \
            .sort_values("latency_bucket").reset_index(drop=True)
        # user1: gaps 1 min (bucket 1) and 10 min (bucket 3); others none
        assert got["latency_bucket"].tolist() == [1, 3]
        assert got["n_conversions"].tolist() == [1, 1]


@pytest.mark.usefixtures("ray_session")
def test_lorenz_deciles_concentrated_revenue():
    from pdf2doi_ray.stages.aggs import lorenz_revenue_deciles

    orders = pd.DataFrame({
        "o_custkey": list(range(10)),
        # nine 1.0 orders and one 91.0 whale → whale holds 910‰
        "o_totalprice": [1.0] * 9 + [91.0]})
    got = lorenz_revenue_deciles(_rd(orders, 3))
    got = got.sort_values("decile").reset_index(drop=True)
    assert got["n_customers_cum"].tolist() == list(range(1, 11))
    # bottom 9 deciles: k/100 of revenue each cumulative step
    assert got["value_share_permille"].tolist() == [
        10, 20, 30, 40, 50, 60, 70, 80, 90, 1000]


@pytest.mark.usefixtures("ray_session")
def test_rowgroup_advisor_arithmetic():
    from pdf2doi_ray.stages.aggs import rowgroup_advisor

    docs = pd.DataFrame({"text": ["a" * 100] * 4})
    got = rowgroup_advisor(_rd(docs, 2), target_bytes=1000)
    assert got["n_rows"].tolist() == [4]
    assert got["sum_text_bytes"].tolist() == [400]
    assert got["avg_row_bytes_milli"].tolist() == [100000]
    # passing a custom target is engine-side only (oracle pins 128 MiB)
    assert got["rows_per_target"].tolist() == [10]
