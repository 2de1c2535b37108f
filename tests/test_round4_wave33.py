"""Round-4 wave-33: cluster churn report."""

import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_cluster_churn_split_merge_and_node_flow():
    import ray.data

    from pdf2doi_ray.stages.graph import cluster_churn_report

    # old: {1,2,3} (c=1) and {5,6} (c=5); new: {1,2} (1), {3,5,6} (3),
    # plus new node 9 alone (9); node 2 dropped? no — keep all but add 9
    old = ray.data.from_pandas(pd.DataFrame({
        "node": [1, 2, 3, 5, 6], "component": [1, 1, 1, 5, 5]}))
    new = ray.data.from_pandas(pd.DataFrame({
        "node": [1, 2, 3, 5, 6, 9],
        "component": [1, 1, 3, 3, 3, 9]}))
    got = cluster_churn_report(old, new)
    m = dict(zip(got["metric"], got["value"]))
    assert m["n_old_clusters"] == 2
    assert m["n_new_clusters"] == 3
    assert m["n_shared_nodes"] == 5
    assert m["n_new_nodes"] == 1
    assert m["n_dropped_nodes"] == 0
    # old cluster 1 split into new {1,3}; new cluster 3 merged old {1,5}
    assert m["n_split_old"] == 1
    assert m["n_merged_new"] == 1
