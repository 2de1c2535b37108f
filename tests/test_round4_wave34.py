"""Round-4 wave-34: PPS systematic sampling."""

import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_pps_sample_boundary_crossings():
    import ray.data

    from pdf2doi_ray.stages.corpus import pps_systematic_sample

    # tokens: 1, 8, 1 → total 10; n_target=2 → boundaries at 5 and 10;
    # doc 2 crosses the 5-boundary, doc 3 ends exactly at 10
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a", "a b c d e f g h", "z"],
    })
    for blocks in (1, 3):
        got = pps_systematic_sample(
            ray.data.from_pandas(docs).repartition(blocks),
            n_target=2).to_pandas().sort_values("doc_id")
        assert got["doc_id"].tolist() == [2, 3]

    # a giant doc spanning several boundaries is picked once
    docs2 = pd.DataFrame({"doc_id": [1, 2],
                          "text": [" ".join(["w"] * 95), "a b c d e"]})
    got2 = pps_systematic_sample(
        ray.data.from_pandas(docs2).repartition(2),
        n_target=10).to_pandas()
    assert got2["doc_id"].tolist() == [1, 2]
