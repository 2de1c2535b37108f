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


@pytest.mark.usefixtures("ray_session")
def test_identify_incremental_reuses_and_recomputes():
    """Reuse proof: a poisoned previous row for an UNCHANGED page
    surfaces verbatim in the incremental output (the cascade never ran
    on it), while a poisoned row for a CHANGED page is recomputed and a
    REMOVED page's row never re-enters."""
    import shutil
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data

    from pdf2doi_ray.config import DEFAULT_CONFIG
    from pdf2doi_ray.pipelines.identify import (identify_incremental,
                                                identify_pages)
    from pdf2doi_ray.sources.pages import pages_dataset

    curr = pages_dataset("/root/testdata/sf0.001").limit(60).materialize()

    from pdf2doi_ray.sources.pages import previous_crawl_batch

    prev = curr.map_batches(previous_crawl_batch,
                            batch_format="pyarrow").materialize()
    prev_dir = tempfile.mkdtemp(prefix="incr_test_prev_")
    try:
        identify_pages(prev, DEFAULT_CONFIG).write_parquet(prev_dir)
        # poison one unchanged and one changed url's stored identifier
        stored = pq.read_table(prev_dir).to_pandas()
        curr_urls = set(u for u in curr.to_pandas()["url"])
        secs_of = {r["url"]: r["warc_ts"].timestamp()
                   for r in curr.to_pandas().to_dict("records")}
        unchanged = [u for u in stored["url"]
                     if u in curr_urls and int(secs_of[u]) % 5 != 0]
        changed = [u for u in stored["url"]
                   if u in curr_urls and int(secs_of[u]) % 5 == 0]
        assert unchanged and changed
        u0, c0 = unchanged[0], changed[0]
        stored.loc[stored.url == u0, "identifier"] = "10.9999/poison-keep"
        stored.loc[stored.url == c0, "identifier"] = "10.9999/poison-lose"
        shutil.rmtree(prev_dir)
        import os
        os.makedirs(prev_dir)
        pq.write_table(pa.Table.from_pandas(stored, preserve_index=False),
                       f"{prev_dir}/part.parquet")

        out = identify_incremental(curr, prev, prev_dir,
                                   DEFAULT_CONFIG).to_pandas()
        fresh = identify_pages(curr, DEFAULT_CONFIG).to_pandas()
        by_url = out.set_index("url")["identifier"]
        assert by_url[u0] == "10.9999/poison-keep"        # reused
        assert by_url[c0] == fresh.set_index("url")["identifier"][c0]
        assert by_url[c0] != "10.9999/poison-lose"        # recomputed
        assert not any(u.endswith("-old") for u in out["url"])  # removed
        # everything except the poisoned unchanged row matches a full run
        rest = out[out.url != u0].sort_values("url").reset_index(drop=True)
        frest = fresh[fresh.url != u0].sort_values("url") \
            .reset_index(drop=True)
        assert rest.to_dict("records") == frest.to_dict("records")
    finally:
        shutil.rmtree(prev_dir, ignore_errors=True)


@pytest.mark.usefixtures("ray_session")
def test_identify_incremental_detects_text_only_change():
    """The diff hashes every payload column the cascade consumes: a page
    whose html is byte-identical but whose text column changed must be
    recomputed (with use_html=True AND with the text-only config), not
    reused stale."""
    import tempfile

    import pyarrow as pa
    import ray.data

    from pdf2doi_ray.config import DEFAULT_CONFIG
    from pdf2doi_ray.pipelines.identify import (identify_incremental,
                                                identify_pages)

    import shutil

    same_html = b"<html><body>no ids here</body></html>"
    curr = ray.data.from_arrow(pa.table({
        "url": pa.array(["https://a/x", "https://a/y"]),
        "warc_ts": pa.array([1, 2], type=pa.timestamp("us")),
        "html": pa.array([same_html, same_html], type=pa.binary()),
        "text": pa.array(["doi: 10.1234/tx.1 end", "plain"]),
        "lang": pa.array(["en", "en"]),
    }))
    prev = ray.data.from_arrow(pa.table({
        "url": pa.array(["https://a/x", "https://a/y"]),
        "warc_ts": pa.array([1, 2], type=pa.timestamp("us")),
        "html": pa.array([same_html, same_html], type=pa.binary()),
        "text": pa.array(["plain old", "plain"]),   # x's text changed
        "lang": pa.array(["en", "en"]),
    }))
    for cfg in (DEFAULT_CONFIG, DEFAULT_CONFIG.with_(use_html=False)):
        prev_dir = tempfile.mkdtemp(prefix="incr_txt_")
        try:
            identify_pages(prev, cfg).write_parquet(prev_dir)
            out = identify_incremental(curr, prev, prev_dir, cfg,
                                       num_partitions=2).to_pandas()
            fresh = identify_pages(curr, cfg).to_pandas()
            assert out.sort_values("url").reset_index(drop=True) \
                .to_dict("records") == fresh.sort_values("url") \
                .reset_index(drop=True).to_dict("records")
            if not cfg.use_html:
                # text-only cascade: the recomputed row must carry the
                # CURRENT text's doi, not the stale None from prev
                got = out.set_index("url")["identifier"]["https://a/x"]
                assert got == "10.1234/tx.1"
        finally:
            shutil.rmtree(prev_dir, ignore_errors=True)


@pytest.mark.usefixtures("ray_session")
def test_pack_sequences_duplicate_ids_raise():
    import pyarrow as pa
    import ray.data

    from pdf2doi_ray.stages.corpus import pack_sequences

    t = pa.table({
        "doc_id": pa.array([1, 1, 2], type=pa.int64()),
        "text": pa.array(["a b", "c d", "e"]),
    })
    with pytest.raises(Exception, match="unique"):
        pack_sequences(ray.data.from_arrow(t), seq_len=2,
                       num_partitions=2).to_pandas()
