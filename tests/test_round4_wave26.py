"""Round-4 wave-26: title/h1 agreement, spend-decile transition matrix."""

import numpy as np
import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_title_h1_consistency_set_semantics():
    import ray.data

    from pdf2doi_ray.stages.skew import title_h1_consistency

    # craft pages whose title/h1 overlap is known; duplicate tokens in the
    # title must count once (set semantics)
    pages = pd.DataFrame({
        "url": ["https://a.example.org/p1", "https://a.example.org/p2"],
        "warc_ts": pd.to_datetime(["2025-01-01", "2025-01-02"]),
        "html": [
            b"<html><head><title>alpha beta alpha</title></head>"
            b"<body><h1>beta gamma</h1><main>x</main></body></html>",
            b"<html><head><title>one two</title></head>"
            b"<body><h1>three four</h1><main>x</main></body></html>",
        ],
        "text": ["x", "x"],
        "lang": ["en", "en"],
    })
    got = title_h1_consistency(
        ray.data.from_pandas(pages).repartition(2)).to_pandas() \
        .set_index("url")
    r1 = got.loc["https://a.example.org/p1"]
    # title set {alpha, beta}, h1 {beta, gamma} → common 1, union 3
    assert (r1.n_title_terms, r1.n_h1_terms, r1.n_common) == (2, 2, 1)
    assert r1.jaccard_permille == 333
    r2 = got.loc["https://a.example.org/p2"]
    assert (r2.n_common, r2.jaccard_permille) == (0, 0)


@pytest.mark.usefixtures("ray_session")
def test_value_decile_transition_small_matrix():
    import ray.data

    from pdf2doi_ray.stages.aggs import value_decile_transition

    base = pd.Timestamp("2024-01-01")
    rows = []
    # week 0: users 0..9 spend u each; week 1: reversed → decile flip
    for u in range(10):
        rows.append((u, base + pd.Timedelta(hours=u), float(u + 1)))
        rows.append((u, base + pd.Timedelta(days=7, hours=u),
                     float(10 - u)))
    ev = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    got = value_decile_transition(
        ray.data.from_pandas(ev).repartition(4)).to_pandas()
    by = {(r.dec_w1, r.dec_w2): r.n_users for r in got.itertuples()}
    # 10 users, 10 deciles → each user its own decile, exactly reversed
    assert sum(by.values()) == 10
    for d in range(10):
        assert by[(d, 9 - d)] == 1
