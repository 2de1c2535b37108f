"""Shard checkpointing, resume, previous-output skip, finalize dedup."""

import os
import shutil

import pandas as pd
import pytest

FIX = "/tmp/pdf2doi_ckpt_fixture"
OUT = "/tmp/pdf2doi_ckpt_out"


@pytest.fixture()
def sharded_pages(ray_session):
    """Two-shard pages parquet derived from sf0.001 documents."""
    import ray.data

    from pdf2doi_ray.sources.pages import pages_dataset

    shutil.rmtree(FIX, ignore_errors=True)
    pages_dataset("/root/testdata/sf0.001").repartition(2).write_parquet(FIX)
    yield FIX


def _run(input_dir, out_dir, fail_on=None):
    from pdf2doi_ray.config import DEFAULT_CONFIG
    from pdf2doi_ray.pipelines.identify import identify_pages
    from pdf2doi_ray.state.checkpoint import checkpointed_run

    calls = []

    def build(ds):
        calls.append(1)
        if fail_on is not None and len(calls) == fail_on:
            raise RuntimeError("injected shard failure")
        return identify_pages(ds, DEFAULT_CONFIG)

    summary = checkpointed_run(input_dir, out_dir, build,
                               columns=["url", "html", "lang"])
    return summary, len(calls)


def test_checkpoint_resume_exactly_once(sharded_pages):
    import ray.data

    shutil.rmtree(OUT, ignore_errors=True)

    # first attempt dies on the second shard
    with pytest.raises(RuntimeError, match="injected"):
        _run(sharded_pages, OUT, fail_on=2)
    from pdf2doi_ray.state.checkpoint import read_manifest
    assert len(read_manifest(OUT)) == 1          # one shard published

    # resume: shard 1 skipped, shard 2 runs; output is complete and unique
    summary, calls = _run(sharded_pages, OUT)
    assert summary["shards_skipped"] == 1 and summary["shards_run"] == 1
    assert calls == 1

    out = ray.data.read_parquet(OUT).to_pandas()
    assert len(out) == 500
    assert out["url"].is_unique

    # idempotent: a third run skips everything
    summary, calls = _run(sharded_pages, OUT)
    assert summary["shards_skipped"] == 2 and calls == 0


def test_previous_results_skip(sharded_pages):
    import ray.data

    from pdf2doi_ray.config import DEFAULT_CONFIG
    from pdf2doi_ray.pipelines.identify import identify_pages
    from pdf2doi_ray.state.checkpoint import with_previous_results

    prev_dir = "/tmp/pdf2doi_prev_out"
    shutil.rmtree(prev_dir, ignore_errors=True)
    pages = ray.data.read_parquet(sharded_pages,
                                  columns=["url", "html", "lang"])
    identify_pages(pages, DEFAULT_CONFIG).write_parquet(prev_dir)
    baseline = ray.data.read_parquet(prev_dir).to_pandas() \
        .sort_values("url").reset_index(drop=True)

    processed = []

    def counting_identify(remaining):
        ds = identify_pages(remaining, DEFAULT_CONFIG)
        return ds

    combined = with_previous_results(
        ray.data.read_parquet(sharded_pages, columns=["url", "html", "lang"]),
        prev_dir, counting_identify)
    got = combined.to_pandas().sort_values("url").reset_index(drop=True)

    # same final result set as a from-scratch run
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], baseline[sorted(baseline.columns)])


def test_dedup_by_url(ray_session):
    import pyarrow as pa
    import ray.data

    from pdf2doi_ray.state.checkpoint import dedup_by_url

    ids = ray.data.from_arrow(pa.table({
        "url": ["a", "b", "a", "c", "b"],
        "identifier": ["1", "2", "1", None, "2"],
    }))
    out = dedup_by_url(ids).to_pandas()
    assert sorted(out["url"]) == ["a", "b", "c"]
