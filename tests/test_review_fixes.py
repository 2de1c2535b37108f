"""Regression tests for the round-1 code-review findings."""

import shutil
import subprocess
import sys

import pyarrow as pa
import pytest

from pdf2doi_ray.config import DEFAULT_CONFIG, EngineConfig, from_ini, to_ini
from pdf2doi_ray.html_extract import parse_page
from pdf2doi_ray.stages.extract import make_extract_fn


def test_prefilter_passes_unicode_digits():
    # Python \d (and the reference) match Unicode decimal digits; the RE2
    # prefilter must not drop such rows before the exact cascade sees them.
    batch = pa.table({
        "url": ["https://h.org/p.html"],
        "text": ["see doi: 10.١٢٣٤/abc here"],
        "meta_keys": pa.array([[]], type=pa.list_(pa.string())),
        "meta_vals": pa.array([[]], type=pa.list_(pa.string())),
    })
    out = make_extract_fn(DEFAULT_CONFIG)(batch)
    assert out["identifier"][0].as_py() == "10.١٢٣٤/abc"
    assert out["method"][0].as_py() == "document_text"


def test_from_ini_tuple_fields(tmp_path):
    ini = tmp_path / "e.ini"
    ini.write_text("[engine]\nmethods = filename, document_text\n"
                   "keys_blocklist = wps-journaldoi,junk\n"
                   "parse_batch_size = 128\n")
    cfg = from_ini(str(ini))
    assert cfg.methods == ("filename", "document_text")
    assert cfg.keys_blocklist == ("wps-journaldoi", "junk")
    assert cfg.parse_batch_size == 128
    # round-trip
    out = tmp_path / "r.ini"
    to_ini(cfg, str(out))
    assert from_ini(str(out)).methods == cfg.methods


def test_self_closing_title_does_not_swallow_body():
    p = parse_page(b"<html><head><title/></head><body>"
                   b"<main>doi: 10.1234/x end</main></body></html>")
    assert p.text == "doi: 10.1234/x end"
    assert p.title is None


def test_knn_tie_break_at_partition_boundary(ray_session):
    import numpy as np
    import ray.data

    from pdf2doi_ray.stages.similarity import knn_bruteforce

    # four identical-similarity vectors; exact ranking must be by vec_id
    v = [1.0] + [0.0] * 7
    emb = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([0, 3, 1, 2], type=pa.int64()),
        "embedding": pa.array([v, v, v, v], type=pa.list_(pa.float32())),
    }))
    out = knn_bruteforce(emb, np.array(v), k=2)
    assert list(out["vec_id"]) == [0, 1]


def test_web_validate_loud_on_redirect(ray_session):
    import ray.data

    from pdf2doi_ray.stages.web import attach_web_validation

    ids = ray.data.from_arrow(pa.table({
        "identifier": ["10.1/redirected"],
        "validation_info": ["True"],
    }))
    with pytest.raises(Exception, match="redirect"):
        attach_web_validation(ids, lambda url: (302, ""),
                              concurrency=1).to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_checkpointed_skip_resolved_no_duplication(tmp_path):
    """--skip-resolved-from + checkpointed mode must not duplicate previous
    rows once per shard (review finding #1) — run the CLI end-to-end."""
    import pyarrow.parquet as pq
    import ray.data

    from pdf2doi_ray.sources.pages import pages_dataset

    fix = str(tmp_path / "pages")
    pages_dataset("/root/testdata/sf0.001").repartition(3).write_parquet(fix)
    prev = str(tmp_path / "prev")
    out = str(tmp_path / "out")

    env_run = [sys.executable, "-m", "pdf2doi_ray.run"]
    subprocess.run(env_run + ["--input", fix, "--output", prev,
                              "--no-checkpoint"], check=True,
                   capture_output=True)
    subprocess.run(env_run + ["--input", fix, "--output", out,
                              "--skip-resolved-from", prev], check=True,
                   capture_output=True)
    t = pq.read_table(out)
    urls = t.column("url").to_pylist()
    assert len(urls) == 500
    assert len(set(urls)) == 500


def test_fast_path_charset_hybrid_meta_parity():
    # '<meta charset=... name=... content=...>' must not be miscounted as a
    # pure charset meta (round-2 review finding)
    import pdf2doi_ray.html_extract as hx

    h = ('<html><head><meta charset="utf-8" name="citation_doi" '
         'content="10.1234/x"></head><body><main>M</main></body></html>')
    save = hx._parse_page_fast
    hx._parse_page_fast = lambda s: None
    try:
        full = hx.parse_page(h)
    finally:
        hx._parse_page_fast = save
    assert hx.parse_page(h) == full
    assert full.meta_keys == ["citation_doi"]


def test_pages_warc_ts_is_microseconds(ray_session):
    from pdf2doi_ray.sources.pages import pages_dataset

    sch = pages_dataset("/root/testdata/sf0.001").schema()
    assert str(sch.base_schema.field("warc_ts").type) == "timestamp[us]"


@pytest.mark.usefixtures("ray_session")
def test_checkpoint_empty_output_shard(tmp_path):
    import ray.data

    from pdf2doi_ray.sources.pages import pages_dataset
    from pdf2doi_ray.state.checkpoint import checkpointed_run

    fix = str(tmp_path / "in")
    out = str(tmp_path / "out")
    pages_dataset("/root/testdata/sf0.001").repartition(2).write_parquet(fix)

    def drop_all(ds):
        return ds.map_batches(lambda t: t.slice(0, 0), batch_format="pyarrow")

    s = checkpointed_run(fix, out, drop_all, columns=["url", "html", "lang"])
    assert s["shards_run"] == 2 and s["rows_out"] == 0
    s2 = checkpointed_run(fix, out, drop_all, columns=["url", "html", "lang"])
    assert s2["shards_skipped"] == 2


def test_ini_parse_concurrency_round_trip(tmp_path):
    cfg = EngineConfig(parse_concurrency=(1, 8))
    path = str(tmp_path / "c.ini")
    to_ini(cfg, path)
    assert from_ini(path).parse_concurrency == (1, 8)
    (tmp_path / "d.ini").write_text("[engine]\nparse_concurrency = 4\n")
    assert from_ini(str(tmp_path / "d.ini")).parse_concurrency == 4
