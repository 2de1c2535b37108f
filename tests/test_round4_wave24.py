"""Round-4 wave-24: incremental OOV audit, aspect-ratio bucketing plan."""

import numpy as np
import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_delta_oov_rate_counts():
    import ray.data

    from pdf2doi_ray.stages.corpus import delta_oov_rate

    docs = pd.DataFrame({
        "doc_id": [0, 2, 1, 3],
        # old corpus (even ids): vocabulary {a, b, c}
        # doc 1: {a, x} → 1 OOV of 2; doc 3: {y, z} → 2 OOV of 2
        "text": ["a b", "b c", "a x", "y z z"],
    })
    got = delta_oov_rate(ray.data.from_pandas(docs).repartition(4)) \
        .to_pandas().set_index("doc_id")
    assert set(got.index) == {1, 3}
    assert (got.loc[1, "n_terms"], got.loc[1, "n_oov"],
            got.loc[1, "oov_permille"]) == (2, 1, 500)
    assert (got.loc[3, "n_terms"], got.loc[3, "n_oov"],
            got.loc[3, "oov_permille"]) == (2, 2, 1000)


def test_aspect_bucket_thresholds():
    from pdf2doi_ray.stages.multimodal import aspect_bucket

    got = aspect_bucket(np.array([300, 625, 626, 875, 1000, 1167,
                                  1168, 1667, 1668, 5000]))
    assert got.tolist() == [500, 500, 750, 750, 1000, 1000,
                            1333, 1333, 2000, 2000]


@pytest.mark.usefixtures("ray_session")
def test_aspect_bucket_plan_over_synth_corpus():
    from pdf2doi_ray.stages.multimodal import aspect_bucket_plan

    got = aspect_bucket_plan("/root/testdata/sf0.001").to_pandas() \
        .set_index("bucket_permille")["n_images"].to_dict()
    # synth dims: w=8+d%32, h=8+d%16 → square for d%32<16, wide otherwise;
    # ids 0..499 = 15 full 32-cycles (240 square) + remainder 0..19
    # (16 square + 4 wide) → 256 / 244
    assert got == {1000: 256, 2000: 244}
