"""Round-4 wave-30: keep-best canonical map for dup clusters."""

import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_dup_canonical_map_picks_best_quality():
    import ray.data

    from pdf2doi_ray.stages.graph import dup_canonical_map

    # clusters {1,2,3} and {10,11}; quality: 2 is best in c1; 10 and 11
    # tie in c2 → smaller id (10) wins
    pairs = pd.DataFrame({"vec_a": [1, 2, 10], "vec_b": [2, 3, 11]})
    quality = pd.DataFrame({"node": [1, 2, 3, 10, 11],
                            "q": [5, 9, 7, 4, 4]})
    got = dup_canonical_map(
        ray.data.from_pandas(pairs).repartition(2),
        ray.data.from_pandas(quality)).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    m = dict(zip(got["node"], got["canonical"]))
    assert m == {1: 2, 3: 2, 11: 10}
