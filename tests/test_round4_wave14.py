"""Round-4 wave-14: nested percentile, encoding advisor, weekly
retention."""

import datetime

import pandas as pd
import pytest


def _rd(df, blocks=3):
    import ray.data
    return ray.data.from_pandas(df).repartition(blocks)


@pytest.mark.usefixtures("ray_session")
def test_median_user_value_ignores_whales():
    from pdf2doi_ray.stages.aggs import median_user_value

    ev = pd.DataFrame({
        # user 1: mean 1.0; user 2: mean 2.0; user 3 (whale): mean 100
        "user_id": [1, 1, 2, 2, 3],
        "value": [0.5, 1.5, 2.0, 2.0, 100.0]})
    got = median_user_value(_rd(ev, 2), quantiles_permille=(500, 1000))
    got = got.sort_values("q_permille").reset_index(drop=True)
    # per-user means (permille-of-milli): 1000, 2000, 100000
    assert got["value"].tolist() == [2_000_000 // 1, 100_000_000 // 1]


@pytest.mark.usefixtures("ray_session")
def test_encoding_advisor_flags_low_cardinality():
    from pdf2doi_ray.stages.aggs import encoding_advisor

    ev = pd.DataFrame({
        "event_type": ["a"] * 50,
        "user_id": list(range(50))})
    got = encoding_advisor(_rd(ev, 3)).to_pandas() \
        .sort_values("column").reset_index(drop=True)
    by = {r.column: r for r in got.itertuples()}
    assert by["event_type"].n_distinct == 1
    assert by["event_type"].use_dictionary == 1
    assert by["user_id"].n_distinct == 50
    assert by["user_id"].use_dictionary == 0
    assert by["user_id"].n_rows == 50


@pytest.mark.usefixtures("ray_session")
def test_weekly_retention_adjacency_and_last_week_drop():
    from pdf2doi_ray.stages.aggs import weekly_retention

    wk = datetime.timedelta(days=7)
    t0 = datetime.datetime(2024, 1, 5)
    ev = pd.DataFrame({
        "user_id": [1, 1, 2, 2, 3],
        #       u1 w0→w1 retained; u2 w0→w2 NOT; u3 only w1
        "ts": [t0, t0 + wk, t0, t0 + 2 * wk, t0 + wk]})
    for blocks in (1, 4):
        got = weekly_retention(_rd(ev, blocks)).to_pandas() \
            .sort_values("week").reset_index(drop=True)
        # weeks observed: w, w+1, w+2 — last dropped
        assert len(got) == 2
        assert got["n_active"].tolist() == [2, 2]
        assert got["n_retained"].tolist() == [1, 0]
        assert got["retention_permille"].tolist() == [500, 0]
