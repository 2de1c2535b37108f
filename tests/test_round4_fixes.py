"""Round-4 fixes (VERDICT r3): clipboard-sink byte parity with the
reference's -clip loop, slot-5 url uniqueness under replication, and the
documented semantics of url-keyed operators when keys DO duplicate."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _reference_clip_loop(results) -> str:
    # reference/pdf2doi/main.py:229-241, verbatim logic: concatenate
    # identifier + '\n' for truthy validation_info, in iteration order
    text = ""
    for result in results:
        if result["validation_info"]:
            text = text + result["identifier"] + "\n"
    return text


@pytest.mark.usefixtures("ray_session")
def test_clip_text_matches_reference_loop():
    import ray.data

    from pdf2doi_ray.pipelines.identify import clip_text

    rows = [
        {"url": "https://a/3.pdf", "identifier": "10.1/c",
         "validation_info": "True"},
        {"url": "https://a/1.pdf", "identifier": "10.1/a",
         "validation_info": "True"},
        {"url": "https://a/2.pdf", "identifier": None,
         "validation_info": None},          # unvalidated: skipped entirely
        {"url": "https://a/0.pdf", "identifier": "10.1/z",
         "validation_info": ""},            # falsy string: skipped (ref: if)
        {"url": "https://a/4.pdf", "identifier": "2201.00001",
         "validation_info": "True"},
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
    got = clip_text(ds)
    want = _reference_clip_loop(sorted(rows, key=lambda r: r["url"]))
    assert got == want
    assert got == "10.1/a\n10.1/c\n2201.00001\n"


@pytest.mark.usefixtures("ray_session")
def test_clip_text_empty_and_all_invalid():
    import ray.data

    from pdf2doi_ray.pipelines.identify import clip_text

    ds = ray.data.from_arrow(pa.Table.from_pylist(
        [{"url": "u", "identifier": None, "validation_info": None}]))
    assert clip_text(ds) == ""


def test_slot5_urls_unique_under_replication():
    from pdf2doi_ray.sources.pages import synthesize_pages

    # k = doc_id*R + r; k=45 and k=90045 are both slot 5 and collide in
    # every basename component (period 90 000): ym, n5, site all match
    batch = pd.DataFrame({
        "doc_id": [22, 45022],
        "text": ["alpha beta", "gamma delta"],
        "lang": ["en", "en"],
    })
    out = synthesize_pages(batch, replication=2)
    assert len(out) == 4
    assert out["url"].nunique() == 4, out["url"].tolist()
    k45 = out.loc[out.index[1], "url"]        # doc 22, r=1 -> k=45, slot 5
    assert "/docs/p45/" in k45
    assert k45.endswith(".pdf")
    # basename unchanged: the filename finder still sees the arXiv shape
    assert k45.rsplit("/", 1)[1] == "1045.10585.pdf"


def test_replication1_urls_unchanged():
    from pdf2doi_ray.sources.pages import synthesize_pages

    batch = pd.DataFrame({"doc_id": [45], "text": ["t"], "lang": ["en"]})
    out = synthesize_pages(batch, replication=1)
    # exactly the SQL oracle's arithmetic — no uniquifying segment at R=1
    assert out.loc[0, "url"] == \
        "https://site45.example.org/docs/1045.10585.pdf"


@pytest.mark.usefixtures("ray_session")
def test_crawl_diff_duplicate_keys_pairing_semantics():
    """crawl_diff is a full-outer join on the key: a key occurring m times
    in the current crawl and n times in the previous yields m*n rows, one
    per pairing — the documented behavior when callers violate the
    keys-are-unique-per-crawl contract (sources/pages.py)."""
    import ray.data

    from pdf2doi_ray.stages.corpus import crawl_diff

    curr = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(["u", "u", "v"], type=pa.string()),
        "text": ["A", "B", "C"],
    }))
    prev = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(["u"], type=pa.string()),
        "text": ["A"],
    }))
    out = crawl_diff(curr, prev, key_col="doc_id", num_partitions=2,
                     key_type=pa.string()).to_pandas()
    got = sorted(map(tuple, out[["doc_id", "status"]].values.tolist()))
    assert got == [("u", "changed"), ("u", "unchanged"), ("v", "added")]


@pytest.mark.usefixtures("ray_session")
def test_dedup_by_url_collapses_duplicates():
    import ray.data

    from pdf2doi_ray.state.checkpoint import dedup_by_url

    t = pa.table({
        "url": ["a", "a", "a", "b"],
        "identifier": ["1", "1", "1", "2"],
    })
    out = dedup_by_url(ray.data.from_arrow(t).repartition(2)).to_pandas()
    assert sorted(out["url"]) == ["a", "b"]


@pytest.mark.usefixtures("ray_session")
def test_incremental_reuse_join_modes_equivalent():
    """The broadcast (default) and shuffle reuse filters must produce the
    same byte-identical incremental output."""
    import tempfile

    import ray.data

    from pdf2doi_ray.config import DEFAULT_CONFIG
    from pdf2doi_ray.pipelines.identify import (identify_incremental,
                                                identify_pages)
    from pdf2doi_ray.sources.pages import pages_dataset, previous_crawl_batch

    sf = "/root/testdata/sf0.001"
    curr = pages_dataset(sf)
    prev = pages_dataset(sf).map_batches(previous_crawl_batch,
                                         batch_format="pyarrow")
    pdir = tempfile.mkdtemp(prefix="incr_modes_")
    identify_pages(prev, DEFAULT_CONFIG).write_parquet(pdir)

    def run(mode):
        out = identify_incremental(pages_dataset(sf), prev, pdir,
                                   DEFAULT_CONFIG, num_partitions=2,
                                   reuse_join=mode).to_pandas()
        return out.sort_values("url").reset_index(drop=True)

    a, b = run("broadcast"), run("shuffle")
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_collect_tables_single_execution_and_empty():
    """collect_tables materializes before to_arrow_refs (a bare
    ray.get(ds.to_arrow_refs()) on a lazy plan re-executes the whole
    upstream DAG for a follow-up schema peek on this Ray version) and
    concatenates blocks faithfully, including all-empty-block results."""
    import ray
    import ray.data

    from pdf2doi_ray.arrowutil import collect_tables

    calls = []

    def counting(t: pa.Table) -> pa.Table:
        calls.append(1)
        return t

    t = pa.table({"k": pa.array(list(range(100)), type=pa.int64())})
    ds = ray.data.from_arrow(t).map_batches(
        counting, batch_format="pyarrow", batch_size=None)
    out = collect_tables(ds)
    assert out.num_rows == 100
    assert sorted(np.asarray(out["k"]).tolist()) == list(range(100))
    # the UDF list is driver-local, so calls only records driver-side
    # invocations (none); re-peeking the collected ds must not re-run
    # the plan — materialize() pins blocks, so schema() is free
    mat = ds.materialize()
    _ = mat.schema()
    _ = mat.schema()

    empty = ray.data.from_arrow(t).filter(lambda r: False)
    out_empty = collect_tables(
        empty.map_batches(lambda b: b, batch_format="pyarrow"))
    assert out_empty.num_rows == 0


def test_clamp_join_partitions_small_cluster(ray_session):
    """Hash-join aggregator pools reserve 0.125 CPU x num_partitions no
    matter how few actors host them, so P=32 reserves 4.0 CPUs — the whole
    4-CPU test cluster — and upstream maps deadlock (observed live:
    dispatch queue stuck at num_waiting_for_remote_node_resources=2 with
    8 aggregators x 0.5 CPU).  shuffle_hash_join must clamp P <= 2xCPUs
    on small clusters and keep the caller's P on big ones."""
    from pdf2doi_ray.stages.joins import (_clamp_join_partitions,
                                          shuffle_hash_join)
    import ray
    import ray.data as rd

    cpus = int(ray.cluster_resources()["CPU"])  # 4 in the fixture
    assert _clamp_join_partitions(32) == min(32, 2 * cpus)
    assert _clamp_join_partitions(2 * cpus + 5) == 2 * cpus
    assert _clamp_join_partitions(2) == 2          # floor survives
    assert _clamp_join_partitions(cpus) == cpus    # small P untouched

    # end-to-end: the exact shape that deadlocked — P=32 on the 4-CPU
    # fixture — must now complete
    l = rd.range(20000).map_batches(
        lambda t: t.rename_columns(["k"]), batch_format="pyarrow")
    r = rd.range(5000).map_batches(
        lambda t: t.rename_columns(["k"]), batch_format="pyarrow")
    out = shuffle_hash_join(l, r, on="k", num_partitions=32)
    assert out.count() == 5000
