"""Round-4 wave-10: prefix-dup detection, out-of-order audit,
stride-interleaved training order."""

import datetime

import pandas as pd
import pytest


def _rd(df, blocks=3):
    import ray.data
    return ray.data.from_pandas(df).repartition(blocks)


@pytest.mark.usefixtures("ray_session")
def test_prefix_dup_flags_equal_prefix_and_unrelated():
    from pdf2doi_ray.stages.dedup import prefix_dup_flags

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["ab", "ab", "abc", "b", "abcd"]})
    # sorted: ab, ab, abc, abcd, b — BOTH "ab" twins are dups (the
    # first by its equal twin, the second by "abc"); "abc" by "abcd"
    for blocks in (1, 5):
        got = prefix_dup_flags(_rd(docs, blocks)).to_pandas()
        flags = dict(zip(got["doc_id"], got["is_prefix_dup"]))
        assert len(got) == 5
        assert flags[1] == 1 and flags[2] == 1 and flags[3] == 1
        assert flags[4] == 0 and flags[5] == 0


@pytest.mark.usefixtures("ray_session")
def test_prefix_dup_flags_cross_block_boundary():
    """Many single-row blocks force every comparison through the
    stitch; flags must be identical to the one-block run."""
    from pdf2doi_ray.stages.dedup import prefix_dup_flags

    docs = pd.DataFrame({
        "doc_id": list(range(8)),
        "text": ["x", "xy", "xyz", "q", "qq", "r", "rs", "z"]})
    one = prefix_dup_flags(_rd(docs, 1)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    many = prefix_dup_flags(_rd(docs, 8)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(one, many)
    assert dict(zip(one["doc_id"], one["is_prefix_dup"])) == {
        0: 1, 1: 1, 2: 0, 3: 1, 4: 0, 5: 1, 6: 0, 7: 0}


@pytest.mark.usefixtures("ray_session")
def test_out_of_order_rate_detects_regressions():
    from pdf2doi_ray.stages.aggs import out_of_order_rate

    t0 = datetime.datetime(2024, 1, 1)

    def s(sec):
        return t0 + datetime.timedelta(seconds=sec)

    ev = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 2],
        "event_id": [10, 11, 12, 13, 14],
        #           ok   ok   LATE  ok(equal not late)
        "ts": [s(0), s(10), s(5), s(10), s(0)]})
    for blocks in (1, 4):
        got = out_of_order_rate(_rd(ev, blocks)).to_pandas() \
            .sort_values("user_id").reset_index(drop=True)
        assert got["n_events"].tolist() == [4, 1]
        assert got["n_out_of_order"].tolist() == [1, 0]
        assert got["ooo_permille"].tolist() == [250, 0]


@pytest.mark.usefixtures("ray_session")
def test_interleave_order_stride_schedule():
    from pdf2doi_ray.stages.corpus import interleave_order

    # source a: 4 docs × 2 tokens = 8 tokens; source b: 2 docs × 2 = 4
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "source": ["a", "a", "a", "a", "b", "b"],
        "text": ["t t", "t t", "t t", "t t", "t t", "t t"]})
    for blocks in (1, 3):
        got = interleave_order(_rd(docs, blocks), cap_tokens=100) \
            .to_pandas().sort_values("global_pos").reset_index(drop=True)
        assert len(got) == 6
        assert got["global_pos"].tolist() == [1, 2, 3, 4, 5, 6]
        # vtime = rk*2^20//w: a (w=8) advances half as fast as b (w=4)
        # order: a1(131072) a2(262144) b1(262144)... tie (vtime) breaks
        # by source name: a before b
        assert got["doc_id"].tolist() == [1, 2, 5, 3, 4, 6]


@pytest.mark.usefixtures("ray_session")
def test_grouped_zip_index_ranks_within_groups():
    from pdf2doi_ray.stages.aggs import grouped_zip_index

    df = pd.DataFrame({
        "g": ["x", "y", "x", "y", "x"],
        "k": [30, 10, 10, 20, 20]})
    got = grouped_zip_index(_rd(df, 3), "g", "k").to_pandas() \
        .sort_values(["g", "k"]).reset_index(drop=True)
    assert got["rk"].tolist() == [1, 2, 3, 1, 2]
