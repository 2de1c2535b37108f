"""Bloom-filter resume: exactness incl. deliberate false positives."""

import shutil

import pytest

from pdf2doi_ray.state.bloom import BloomFilter, bucketed_anti_join_urls


def test_bloom_no_false_negatives_and_bounded_fpp():
    items = [f"https://h{i}.org/p{i}" for i in range(5000)]
    bf = BloomFilter.build(items, fpp=0.01)
    assert all(it in bf for it in items)            # no false negatives ever
    others = [f"https://x{i}.net/q{i}" for i in range(5000)]
    fp = sum(o in bf for o in others) / len(others)
    assert fp < 0.03


@pytest.mark.usefixtures("ray_session")
def test_bucketed_anti_join():
    import pyarrow as pa
    import ray.data

    left = ray.data.from_arrow(pa.table({"url": [f"u{i}" for i in range(100)]}))
    right = ray.data.from_arrow(pa.table({"url": [f"u{i}" for i in range(0, 100, 2)]}))
    out = bucketed_anti_join_urls(left, right).to_pandas()
    assert sorted(out["url"]) == sorted(f"u{i}" for i in range(1, 100, 2))


@pytest.mark.usefixtures("ray_session")
def test_bloom_resume_byte_identical_even_with_tiny_filter():
    """A deliberately undersized filter (huge fpp) must still produce a
    byte-identical final result — false positives are recovered by the
    exact bucketed anti-join."""
    import ray.data

    from pdf2doi_ray.config import DEFAULT_CONFIG
    from pdf2doi_ray.pipelines.identify import identify_pages
    from pdf2doi_ray.sources.pages import pages_dataset
    from pdf2doi_ray.state.bloom import with_previous_results_bloom

    fix = "/tmp/pdf2doi_bloom_fix"
    prev = "/tmp/pdf2doi_bloom_prev"
    shutil.rmtree(fix, ignore_errors=True)
    shutil.rmtree(prev, ignore_errors=True)
    pages_dataset("/root/testdata/sf0.001").repartition(2).write_parquet(fix)

    def pages():
        return ray.data.read_parquet(fix, columns=["url", "html", "lang"])

    identify_pages(pages(), DEFAULT_CONFIG).write_parquet(prev)
    baseline = ray.data.read_parquet(prev).to_pandas() \
        .sort_values("url").reset_index(drop=True)

    combined = with_previous_results_bloom(
        pages(), prev,
        lambda remaining: identify_pages(remaining, DEFAULT_CONFIG),
        fpp=0.4)                                    # forces many false positives
    got = combined.to_pandas().sort_values("url").reset_index(drop=True)
    assert len(got) == len(baseline)
    cols = sorted(baseline.columns)
    assert got[cols].fillna("~").eq(baseline[cols].fillna("~")).all().all()
