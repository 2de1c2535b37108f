"""Round-4 wave-11: join-size profile, open-order backlog,
padding-waste report, event-type trigrams."""

import datetime

import pandas as pd
import pytest


def _rd(df, blocks=3):
    import ray.data
    return ray.data.from_pandas(df).repartition(blocks)


@pytest.mark.usefixtures("ray_session")
def test_join_cardinality_counts_products():
    from pdf2doi_ray.stages.joins import join_cardinality

    left = pd.DataFrame({"l_orderkey": [1, 1, 1, 2, 3]})
    right = pd.DataFrame({"o_orderkey": [1, 1, 2, 4]})
    got = join_cardinality(_rd(left, 2), _rd(right, 2),
                           "l_orderkey", "o_orderkey")
    # key 1: 3×2=6; key 2: 1×1=1; keys 3,4 unmatched
    assert got["join_rows"].tolist() == [7]
    assert got["n_matched_keys"].tolist() == [2]
    assert got["max_fanout"].tolist() == [6]


@pytest.mark.usefixtures("ray_session")
def test_open_order_backlog_skips_degenerate_spans():
    from pdf2doi_ray.stages.joins import open_order_backlog

    d = datetime.datetime
    orders = pd.DataFrame({
        "o_orderkey": [1, 2, 3],
        "o_orderdate": [d(2024, 1, 1), d(2024, 1, 2), d(2024, 1, 10)]})
    li = pd.DataFrame({
        "l_orderkey": [1, 1, 2, 3],
        # order 1 open 1st–3rd; order 2 open 2nd–2nd;
        # order 3 ships BEFORE its order date → empty interval
        "l_shipdate": [d(2024, 1, 2), d(2024, 1, 3), d(2024, 1, 2),
                       d(2024, 1, 5)]})
    got = open_order_backlog(_rd(orders, 2), _rd(li, 2)).to_pandas() \
        .sort_values("day").reset_index(drop=True)
    day0 = got["day"].iloc[0]
    assert got["n_open"].tolist() == [1, 2, 1]
    assert (got["day"] - day0).tolist() == [0, 1, 2]


@pytest.mark.usefixtures("ray_session")
def test_padding_waste_buckets_and_empty_doc():
    from pdf2doi_ray.stages.corpus import padding_waste_report

    docs = pd.DataFrame({"text": [
        " ".join(["t"] * 64),       # exactly one bucket, zero pad
        " ".join(["t"] * 65),       # two buckets, 63 pad
        ""]})                       # 1 token ('' splits to ['']), 63 pad
    got = padding_waste_report(_rd(docs, 2), bucket=64).to_pandas() \
        .sort_values("bucket_len").reset_index(drop=True)
    assert got["bucket_len"].tolist() == [64, 128]
    assert got["n_docs"].tolist() == [2, 1]
    assert got["sum_padding"].tolist() == [63, 63]
    assert got["sum_tokens"].tolist() == [65, 65]
    assert got["waste_permille"].tolist() == [492, 492]


@pytest.mark.usefixtures("ray_session")
def test_event_type_trigrams_cross_block_sequences():
    from pdf2doi_ray.stages.aggs import event_type_trigrams

    t0 = datetime.datetime(2024, 1, 1)

    def s(sec):
        return t0 + datetime.timedelta(seconds=sec)

    ev = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 2, 2, 2],
        "event_id": [1, 2, 3, 4, 5, 6, 7],
        "ts": [s(0), s(1), s(2), s(3), s(0), s(1), s(2)],
        "event_type": ["a", "b", "a", "b", "a", "b", "a"]})
    for blocks in (1, 7):
        got = event_type_trigrams(_rd(ev, blocks)).to_pandas() \
            .sort_values(["t1", "t2", "t3"]).reset_index(drop=True)
        # user1: aba, bab; user2: aba → aba×2, bab×1
        assert got["t1"].tolist() == ["a", "b"]
        assert got["n"].tolist() == [2, 1]
