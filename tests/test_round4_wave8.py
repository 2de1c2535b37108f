"""Round-4 wave-8: char forensics, word-length histogram, gap moments,
DAU/WAU stickiness."""

import datetime

import pandas as pd
import pyarrow as pa
import pytest


def _rd(df, blocks=3):
    import ray.data
    return ray.data.from_pandas(df).repartition(blocks)


def test_char_class_profile_counts_every_class():
    from pdf2doi_ray.stages.textstats import char_class_profile

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": ["Ab1 \t\n", "", "!!??"],
    })
    out = char_class_profile(t).to_pydict()
    assert out["n_digit"] == [1, 0, 0]
    assert out["n_upper"] == [1, 0, 0]
    assert out["n_lower"] == [1, 0, 0]
    assert out["n_space"] == [3, 0, 0]   # ' ', \t, \n
    assert out["n_other"] == [0, 0, 4]


def test_char_class_profile_sliced_batch():
    """Offsets-normalisation path: a sliced table must classify the
    right bytes (a raw-buffer view off by the slice would not)."""
    from pdf2doi_ray.stages.textstats import char_class_profile

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": ["zzzz", "A1", "  "],
    }).slice(1, 2)
    out = char_class_profile(t).to_pydict()
    assert out["n_upper"] == [1, 0]
    assert out["n_digit"] == [1, 0]
    assert out["n_space"] == [0, 2]


def test_char_simpson_degenerate_and_uniform():
    from pdf2doi_ray.stages.textstats import char_simpson

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": ["aaaa", "abcd", ""],
    })
    out = char_simpson(t).to_pydict()
    # all-same text: collision probability 1 → 1000 permille
    assert out["simpson_permille"] == [1000, 250, 0]
    assert out["n_distinct_chars"] == [1, 4, 0]
    assert out["n_chars"] == [4, 4, 0]


@pytest.mark.usefixtures("ray_session")
def test_word_len_histogram_excludes_empty_tokens():
    from pdf2doi_ray.stages.textstats import word_len_histogram

    docs = pd.DataFrame({"text": ["a  bb", " ccc", "", "dd dd"]})
    got = word_len_histogram(_rd(docs, 2)).to_pandas() \
        .sort_values("word_len").reset_index(drop=True)
    # words: a, bb, ccc, dd, dd → len 1×1, 2×3, 3×1
    assert got["word_len"].tolist() == [1, 2, 3]
    assert got["n_words"].tolist() == [1, 3, 1]


@pytest.mark.usefixtures("ray_session")
def test_user_gap_moments_minute_floor_and_singletons():
    from pdf2doi_ray.stages.aggs import user_gap_moments

    base = datetime.datetime(2024, 1, 1)
    ev = pd.DataFrame({
        "user_id": [7, 7, 7, 9],
        "ts": [base,
               base + datetime.timedelta(seconds=90),    # gap 1 min (floor)
               base + datetime.timedelta(seconds=90 + 600),  # gap 10 min
               base],                                    # singleton user
    })
    for blocks in (1, 4):
        got = user_gap_moments(_rd(ev, blocks)).to_pandas() \
            .sort_values("user_id").reset_index(drop=True)
        assert got["user_id"].tolist() == [7]   # user 9 has no gaps
        assert got["n_gaps"].tolist() == [2]
        assert got["sum_gap_min"].tolist() == [11]
        assert got["sum_gap_sq_min"].tolist() == [101]
        assert got["max_gap_min"].tolist() == [10]


@pytest.mark.usefixtures("ray_session")
def test_dau_wau_stickiness_window_and_day_filter():
    from pdf2doi_ray.stages.aggs import dau_wau_stickiness

    day0 = datetime.datetime(2024, 1, 1)

    def at(d, u):
        return {"user_id": u, "ts": day0 + datetime.timedelta(days=d)}

    # u1 active day 0 and 3; u2 active day 3; nothing on days 1,2
    ev = pd.DataFrame([at(0, 1), at(0, 1), at(3, 1), at(3, 2)])
    for blocks in (1, 3):
        got = dau_wau_stickiness(_rd(ev, blocks)).to_pandas() \
            .sort_values("day").reset_index(drop=True)
        # only observed days (0 and 3) emit rows
        assert len(got) == 2
        d0, d3 = got.iloc[0], got.iloc[1]
        assert d3["day"] - d0["day"] == 3
        assert (d0["dau"], d0["wau"]) == (1, 1)
        # day 3 window [−3..3] covers u1's day-0 activity too
        assert (d3["dau"], d3["wau"]) == (2, 2)
        assert d0["stickiness_permille"] == 1000
        assert d3["stickiness_permille"] == 1000
