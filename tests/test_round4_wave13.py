"""Round-4 wave-13: adjacent-vector distance histogram, label norm
stats."""

import numpy as np
import pandas as pd
import pytest


def _emb(rows, blocks=3):
    import ray.data
    return ray.data.from_pandas(pd.DataFrame(rows)).repartition(blocks)


@pytest.mark.usefixtures("ray_session")
def test_adjacent_vec_histogram_pairs_and_gaps():
    from pdf2doi_ray.stages.similarity import \
        adjacent_vec_distance_histogram

    rows = {
        "vec_id": [0, 1, 3, 4],     # gap between 1 and 3: no pair
        "embedding": [[0.0, 0.0], [0.001, 0.0],   # d2 = 1 → bucket 1
                      [0.0, 0.0], [0.0, 0.0]],    # d2 = 0 → bucket 0
    }
    for blocks in (1, 4):
        got = adjacent_vec_distance_histogram(_emb(rows, blocks)) \
            .to_pandas().sort_values("d2_bucket").reset_index(drop=True)
        assert got["d2_bucket"].tolist() == [0, 1]
        assert got["n_pairs"].tolist() == [1, 1]


@pytest.mark.usefixtures("ray_session")
def test_adjacent_vec_histogram_single_row_blocks_no_double_count():
    """All-singleton blocks: every pair crosses a boundary; counts must
    equal the one-block run (and a 2-row block must not double-count
    its own first/last pair)."""
    from pdf2doi_ray.stages.similarity import \
        adjacent_vec_distance_histogram

    rng = np.random.default_rng(7)
    rows = {"vec_id": list(range(9)),
            "embedding": [list(v) for v in
                          rng.normal(size=(9, 4)).astype(np.float32)]}
    one = adjacent_vec_distance_histogram(_emb(rows, 1)).to_pandas() \
        .sort_values("d2_bucket").reset_index(drop=True)
    many = adjacent_vec_distance_histogram(_emb(rows, 9)).to_pandas() \
        .sort_values("d2_bucket").reset_index(drop=True)
    two = adjacent_vec_distance_histogram(_emb(rows, 4)).to_pandas() \
        .sort_values("d2_bucket").reset_index(drop=True)
    pd.testing.assert_frame_equal(one, many)
    pd.testing.assert_frame_equal(one, two)
    assert int(one["n_pairs"].sum()) == 8


@pytest.mark.usefixtures("ray_session")
def test_label_norm_stats_quantized_grid():
    from pdf2doi_ray.stages.similarity import label_norm_stats

    rows = {
        "label": pd.array([1, 1, 2], dtype="int32"),
        "embedding": [[1.0, 0.0], [0.0, 2.0], [0.0015, 0.0]],
    }
    got = label_norm_stats(_emb(rows, 2)).to_pandas() \
        .sort_values("label").reset_index(drop=True)
    # norms²: 1000², 2000², floor(1.5)²=1
    assert got["label"].tolist() == [1, 2]
    assert got["min_norm2"].tolist() == [1_000_000, 1]
    assert got["max_norm2"].tolist() == [4_000_000, 1]
    assert got["sum_norm2"].tolist() == [5_000_000, 1]
    assert got["n_vecs"].tolist() == [2, 1]
