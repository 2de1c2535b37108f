"""Round-3 advice fixes: title-histogram tie-break parity, HLL saturation
clamp, collision-resistant seed file names."""

import numpy as np
import pyarrow.parquet as pq

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
