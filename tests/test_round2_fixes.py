"""Round-2 ADVICE regression tests: mixed-case fast-path divergence, null
url per-row degradation, negative-epoch window assignment."""

import numpy as np
import pyarrow as pa
import pytest

import pdf2doi_ray.html_extract as hx


def full_only(payload):
    save = hx._parse_page_fast
    hx._parse_page_fast = lambda h: None
    try:
        return hx.parse_page(payload)
    finally:
        hx._parse_page_fast = save


def test_mixed_case_meta_taken_by_full_scan():
    # ADVICE (medium): '<META NAME=...>' silently dropped by the fast path
    html = ('<META NAME="citation_doi" CONTENT="10.1234/x">'
            "<main>body text</main>")
    assert hx._parse_page_fast(html) is None
    page = hx.parse_page(html)
    assert page.meta_keys == ["citation_doi"]
    assert page.meta_vals == ["10.1234/x"]
    assert page == full_only(html)


def test_mixed_case_nav_and_title():
    for html in ("<NAV>menu</NAV><main>kept</main>",
                 "<TITLE>up</TITLE><main>kept</main>",
                 "<NAV>menu<main>suppressed</main></NAV>"):
        assert hx._parse_page_fast(html) is None
        assert hx.parse_page(html) == full_only(html)


def test_null_url_degrades_single_row():
    # ADVICE (low): a null url must degrade that row alone, not crash the
    # batch task (reference main.py:132-142 per-file swallow)
    from pdf2doi_ray.config import DEFAULT_CONFIG
    from pdf2doi_ray.stages.extract import make_extract_fn

    fn = make_extract_fn(DEFAULT_CONFIG)
    batch = pa.table({
        "url": pa.array([None, "https://x.org/10.1234%2Fok.pdf", None],
                        type=pa.string()),
        "text": pa.array(["see doi: 10.1234/intext end", "plain",
                          "no identifier patterns at all"],
                         type=pa.string()),
    })
    out = fn(batch)
    # row 0: url null → filename method raises → whole row degrades
    assert out["identifier"][0].as_py() is None
    assert out["method"][0].as_py() is None
    # row 1 unaffected
    assert out["identifier"][1].as_py() == "10.1234/ok.pdf"
    # row 2: null url on a NON-candidate row (no prefilter hit) must degrade
    # identically, not keep the exhausted stamp (round-2 review finding)
    assert out["identifier"][2].as_py() is None
    assert out["method"][2].as_py() is None


@pytest.mark.usefixtures("ray_session")
def test_negative_epoch_window_assignment():
    # ADVICE (low): pre-1970 events truncated toward zero → wrong window
    import duckdb
    import ray.data

    from pdf2doi_ray.stages.windows import sliding_counts, tumbling_counts

    ts = pa.array(
        np.array([-3_600_500_000, -1, 0, 1, 3_599_999_999, -7_200_000_000],
                 dtype="datetime64[us]"))
    events = pa.table({
        "ts": ts,
        "event_type": pa.array(["a"] * 6),
        "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0]),
    })
    got = (tumbling_counts(ray.data.from_arrow(events)).to_pandas()
           .sort_values(["event_type", "window"]).reset_index(drop=True))
    duckdb.register("ev", events)
    want = duckdb.sql("""
        SELECT event_type, CAST(floor(epoch(ts)/3600) AS BIGINT) AS window,
               count(value) AS n_events, min(value) AS min_value,
               max(value) AS max_value
        FROM ev GROUP BY 1, 2 ORDER BY 1, 2""").df()
    assert got["window"].tolist() == want["window"].tolist()
    assert got["n_events"].tolist() == want["n_events"].tolist()

    got_s = (sliding_counts(ray.data.from_arrow(events)).to_pandas()
             .sort_values(["event_type", "window_slot"])
             .reset_index(drop=True))
    want_s = duckdb.sql("""
        WITH e AS (SELECT event_type,
                          CAST(floor(epoch(ts)/900) AS BIGINT) AS base
                   FROM ev)
        SELECT event_type, CAST(base - off AS BIGINT) AS window_slot,
               count(*) AS n_events
        FROM e, unnest(range(0, 4)) AS t(off)
        GROUP BY 1, 2 ORDER BY 1, 2""").df()
    assert got_s["window_slot"].tolist() == want_s["window_slot"].tolist()
    assert got_s["n_events"].tolist() == want_s["n_events"].tolist()
