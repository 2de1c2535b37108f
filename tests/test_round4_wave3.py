"""Round-4 third wave: exact MAD, vocabulary construction, balanced
sampling."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.mark.usefixtures("ray_session")
def test_mad_event_values_handcomputed():
    import ray.data

    from pdf2doi_ray.stages.aggs import mad_values_milli

    # milli grid: [1, 2, 3, 10, 100]; median (ceil-rank, 1-based rank 3)
    # = 3; |dev| = [2, 1, 0, 7, 97] → sorted [0, 1, 2, 7, 97], rank 3 = 2
    vals = [0.001, 0.002, 0.003, 0.010, 0.100]
    ds = ray.data.from_arrow(pa.table({
        "value": pa.array(vals, type=pa.float64())})).repartition(3)
    out = mad_values_milli(ds, "value")
    assert out["median_milli"].tolist() == [3]
    assert out["mad_milli"].tolist() == [2]
    assert str(out["median_milli"].dtype) == "int64"


@pytest.mark.usefixtures("ray_session")
def test_mad_empty_input_zero_rows():
    import ray.data

    from pdf2doi_ray.stages.aggs import mad_values_milli

    t = pa.table({"value": pa.array([], type=pa.float64())})
    out = mad_values_milli(ray.data.from_arrow(t), "value")
    assert len(out) == 0
    assert list(out.columns) == ["median_milli", "mad_milli"]


@pytest.mark.usefixtures("ray_session")
def test_build_vocab_rank_and_tiebreak():
    import ray.data

    from pdf2doi_ray.stages.corpus import build_vocab

    # counts: "b"=3, "a"=3, "c"=2, "d"=1 → ids by (count desc, token asc):
    # a=0, b=1, c=2, d=3
    texts = ["a b c", "b a", "a b c d", ""]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(4), type=pa.int64()),
        "text": pa.array(texts)})).repartition(2)
    out = build_vocab(ds, vocab_size=3)
    assert out["token"].tolist() == ["a", "b", "c"]
    assert out["token_id"].tolist() == [0, 1, 2]
    assert out["n_occurrences"].tolist() == [3, 3, 2]


@pytest.mark.usefixtures("ray_session")
def test_balanced_sample_deterministic_and_rate_bounded():
    import ray.data

    from pdf2doi_ray.stages.corpus import balanced_sample

    n = 4000
    langs = np.where(np.arange(n) % 2 == 0, "en", "fr").astype(object)
    t = pa.table({"doc_id": pa.array(range(n), type=pa.int64()),
                  "lang": pa.array(list(langs))})
    ds = ray.data.from_arrow(t).repartition(5)
    out = balanced_sample(ds, group_col="lang",
                          rates_permille={"en": 100, "fr": 1000}) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # all fr rows kept (rate 1000‰); en rows thinned to roughly 10%
    n_fr = (out["group"] == "fr").sum()
    n_en = (out["group"] == "en").sum()
    assert n_fr == n // 2
    assert 0.05 * n / 2 < n_en < 0.2 * n / 2
    # the kept set is exactly {bucket < rate} — rerun must agree row-for-row
    out2 = balanced_sample(ds, group_col="lang",
                           rates_permille={"en": 100, "fr": 1000}) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out.equals(out2)
    assert (out["bucket"] <
            np.where(out["group"] == "en", 100, 1000)).all()


@pytest.mark.usefixtures("ray_session")
def test_balanced_sample_default_rate_keeps_unlisted_groups():
    import ray.data

    from pdf2doi_ray.stages.corpus import balanced_sample

    t = pa.table({"doc_id": pa.array(range(100), type=pa.int64()),
                  "lang": pa.array(["de"] * 100)})
    out = balanced_sample(ray.data.from_arrow(t),
                          rates_permille={"en": 1}).to_pandas()
    assert len(out) == 100  # default 1000‰ = keep everything


@pytest.mark.usefixtures("ray_session")
def test_melt_columns_roundtrip():
    """melt emits exactly one (id, stat, value) row per id per column,
    preserving values; single-column melt degenerates to a rename."""
    import ray.data

    from pdf2doi_ray.stages.aggs import melt_columns

    t = pa.table({"doc_id": pa.array([10, 11], type=pa.int64()),
                  "x": pa.array([1, 2], type=pa.int64()),
                  "y": pa.array([3, 4], type=pa.int64())})
    out = (melt_columns(ray.data.from_arrow(t), "doc_id", ["x", "y"])
           .to_pandas().sort_values(["doc_id", "stat"])
           .reset_index(drop=True))
    assert len(out) == 4
    assert out.loc[(out.doc_id == 10) & (out.stat == "x"),
                   "value"].item() == 1
    assert out.loc[(out.doc_id == 11) & (out.stat == "y"),
                   "value"].item() == 4
    single = (melt_columns(ray.data.from_arrow(t), "doc_id", ["y"])
              .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(single["value"]) == [3, 4]
    assert set(single["stat"]) == {"y"}


@pytest.mark.usefixtures("ray_session")
def test_weighted_sample_monotone_and_blockcount_invariant():
    """Same result at any block count; doubling every weight can only
    improve a row's priority; zero/negative-weight rows never sampled."""
    import pandas as pd
    import ray
    import ray.data

    from pdf2doi_ray.stages.corpus import weighted_sample_k

    ids = pa.array(range(1, 201), type=pa.int64())
    w = pa.array([(i % 7) + 1 for i in range(1, 201)], type=pa.int64())
    t = pa.table({"doc_id": ids, "n": w})

    def run(n_blocks, tbl=t):
        ds = ray.data.from_arrow(tbl).repartition(n_blocks)
        return weighted_sample_k(ds, "n", k=10)

    a, b = run(1), run(7)
    pd.testing.assert_frame_equal(a, b)
    # brute-force oracle
    import numpy as np

    from pdf2doi_ray.stages.corpus import knuth_hash32
    h = knuth_hash32(ids).astype(np.int64)
    pri = (h * 1000) // np.asarray(w)
    order = np.lexsort((np.asarray(ids), pri))[:10]
    assert list(a["doc_id"]) == list(np.asarray(ids)[order])
    # zero-weight rows are excluded even if their priority would win
    t2 = pa.table({"doc_id": ids, "n": pa.array([0] * 200,
                                                type=pa.int64())})
    assert len(run(3, t2)) == 0
