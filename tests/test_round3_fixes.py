"""Round-3 advice fixes (title-histogram tie-break parity, HLL saturation
clamp, collision-resistant seed file names) and the online transport
wiring (flag -> constructed transports -> pipeline splices)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf2doi_ray.html_extract import title_by_font_histogram


def test_font_histogram_count_tie_keeps_first_seen_size():
    # 12px and 20px tie at two spans each; the reference's stable count-desc
    # sort keeps the FIRST-SEEN size (12px) as the paragraph size, so the
    # 20px run IS a headline — the old larger-size tie-break returned None
    html = ('<p style="font-size:12px">body one text</p>'
            '<p style="font-size:12px">body two text</p>'
            '<div style="font-size:20px">The Tied Larger Headline</div>'
            '<div style="font-size:20px">Continues Here</div>')
    assert title_by_font_histogram(html) == \
        "The Tied Larger Headline Continues Here"


def test_font_histogram_tie_first_seen_larger_gives_none():
    # same tie but the larger size comes first → paragraph = 20px and
    # nothing exceeds it → None (first-seen, not min/max, decides)
    html = ('<div style="font-size:20px">big one</div>'
            '<div style="font-size:20px">big two</div>'
            '<p style="font-size:12px">small a</p>'
            '<p style="font-size:12px">small b</p>')
    assert title_by_font_histogram(html) is None


def test_hll_estimate_saturated_registers_capped():
    from pdf2doi_ray.stages.sketch import HLL_M, estimate

    regs = np.full(HLL_M, 70, dtype=np.uint8)     # raw e >> 2^64
    assert estimate(regs) == 2 ** 64              # capped, no NaN/ValueError

    # large-range correction still applies just below the cap
    regs2 = np.full(HLL_M, 51, dtype=np.uint8)
    est = estimate(regs2)
    assert 0 < est <= 2 ** 64

    # the corrected value is clamped too: without it regs=52 exceeds 2^64
    # (~1.28x) and the estimator goes non-monotone across the cap boundary
    prev = 0
    for rank in (50, 51, 52, 53, 70):
        cur = estimate(np.full(HLL_M, rank, dtype=np.uint8))
        assert prev <= cur <= 2 ** 64, rank
        prev = cur


def test_seed_files_are_collision_resistant(tmp_path):
    import hashlib

    from pdf2doi_ray.state.checkpoint import seed_identifier

    out = str(tmp_path / "seeds")
    r1 = seed_identifier(out, "https://x.org/a.html", "10.1/a")
    r2 = seed_identifier(out, "https://x.org/b.html", "10.1/b")
    d1 = hashlib.blake2b(b"https://x.org/a.html", digest_size=8).hexdigest()
    assert r1["path"].endswith(f"seed-{d1}.parquet")
    assert r1["path"] != r2["path"]
    t = pq.read_table(f"{out}/part=__seed__")
    assert t.num_rows == 2                        # neither seed overwritten


# --- round-3 online wiring: flag -> constructed transports -> splices ----

def _cli_args(*argv):
    from pdf2doi_ray.run import build_parser
    return build_parser().parse_args([*argv, "--output", "/tmp/x"])


def test_online_flag_sets_both_config_flags():
    from pdf2doi_ray.config import DEFAULT_CONFIG
    from pdf2doi_ray.run import resolve_config

    cfg = resolve_config(DEFAULT_CONFIG,
                         _cli_args("--input", "/tmp/in", "--online"))
    assert cfg.websearch and cfg.webvalidation
    cfg = resolve_config(DEFAULT_CONFIG,
                         _cli_args("--input", "/tmp/in", "--websearch"))
    assert cfg.websearch and not cfg.webvalidation
    cfg = resolve_config(DEFAULT_CONFIG, _cli_args("--input", "/tmp/in"))
    assert not cfg.websearch and not cfg.webvalidation


def test_online_splices_construct_transports_eagerly_and_in_order():
    from pdf2doi_ray.config import DEFAULT_CONFIG
    from pdf2doi_ray.transports import online_splices

    built = {"fetch": 0, "search": 0}

    def fetch_factory():
        built["fetch"] += 1
        return lambda url: (200, "")

    def search_factory():
        built["search"] += 1
        return lambda q, stop: []

    # offline config -> nothing constructed, nothing spliced
    assert online_splices(DEFAULT_CONFIG, fetch_factory, search_factory) == []
    assert built == {"fetch": 0, "search": 0}

    cfg = DEFAULT_CONFIG.with_(websearch=True, webvalidation=True)
    splices = online_splices(cfg, fetch_factory, search_factory)
    # constructed at wiring time (driver), one search + one fetch per stage
    assert built == {"fetch": 2, "search": 1}
    assert [name for name, _ in splices] == ["websearch", "webvalidation"]


@pytest.mark.usefixtures("ray_session")
def test_identify_pages_online_end_to_end_with_fakes():
    """--online pipeline shape: websearch resolves an exhausted row with the
    parsed columns still attached, then webvalidation stamps every
    identifier's validation_info."""
    import ray.data

    from pdf2doi_ray.config import DEFAULT_CONFIG
    from pdf2doi_ray.pipelines.identify import identify_pages_online
    from pdf2doi_ray.transports import online_splices

    def fetch_factory():
        def fetch(url):
            if url.startswith("https://doi.org/"):
                return 200, "VALID:" + url.rsplit("/", 2)[-2] + "/" + \
                    url.rsplit("/", 1)[-1]
            return 200, "body mentions doi: 10.5555/via.search here"
        return fetch

    def search_factory():
        return lambda q, stop: ["https://pub.example.org/found-it"]

    cfg = DEFAULT_CONFIG.with_(websearch=True, webvalidation=True,
                               use_html=False)
    splices = dict(online_splices(cfg, fetch_factory, search_factory))
    pages = ray.data.from_arrow(pa.table({
        "url": ["https://a.org/one.html", "https://b.org/two.html"],
        "text": ["cite as doi: 10.1234/offline.hit thanks",
                 "Document Title Words Only, no identifiers anywhere"],
        "lang": ["en", "en"],
    }))
    out = identify_pages_online(pages, cfg, splices).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert list(out["identifier"]) == ["10.1234/offline.hit",
                                       "10.5555/via.search"]
    assert out["method"][1] == "first_N_characters_google"
    # webvalidation overwrote validation_info for both rows
    assert all(v.startswith("VALID:") for v in out["validation_info"])
