"""Unit tests for the webtext normalization stages (stages/textnorm.py)."""

import pyarrow as pa
import pytest

from pdf2doi_ray.stages.textnorm import _canon_url_kernel, _norm_text_kernel


def _run(kernel, values):
    return kernel(pa.array(values, type=pa.string())).to_pylist()


def test_norm_text_nfc_case_whitespace():
    got = _run(_norm_text_kernel, [
        "  Hello\t\nWORLD  ",
        "Cafe\u0301 au  lait",  # combining acute -> NFC e-acute, run collapse
        "\u00e9 already composed",
        "",
        "   ",
        None,
    ])
    assert got == [
        "hello world",
        "caf\u00e9 au lait",
        "\u00e9 already composed",
        "",
        "",
        None,
    ]


@pytest.mark.parametrize("url,want", [
    # fragment stripped, scheme+host lowercased, default port dropped,
    # path case preserved
    ("HTTP://Www.Example.ORG:80/Path/X#frag", "http://www.example.org/Path/X"),
    ("https://A.example.org:443/", "https://a.example.org"),
    # non-default port kept
    ("https://a.example.org:8443/p", "https://a.example.org:8443/p"),
    # bare trailing slash dropped only when it IS the whole path
    ("http://h.org/", "http://h.org"),
    ("http://h.org/a/", "http://h.org/a/"),
    # query case preserved; fragment with slashes fully removed
    ("http://H.org/p?Q=V#a/b/c", "http://h.org/p?Q=V"),
    # no scheme -> whole value lowercased once, never duplicated
    ("Plain-String", "plain-string"),
])
def test_canon_url(url, want):
    assert _run(_canon_url_kernel, [url]) == [want]


def test_norm_text_nonascii_matches_duckdb():
    """The oracle runs DuckDB nfc_normalize; the Ray kernel must agree on
    non-ASCII input too (this sandbox's pyarrow utf8_normalize is broken --
    it decomposes under NFC -- hence the unicodedata hybrid)."""
    import duckdb

    vals = [
        "Cafe" + chr(0x301) + "  deux   mots",   # combining acute
        "Stra" + chr(0xDF) + "e",                # sharp s (lower keeps it)
        chr(0x212B) + " unit",                   # Angstrom sign -> U+00C5
        "plain ascii ONLY",
    ]
    got = _run(_norm_text_kernel, vals)
    con = duckdb.connect()
    want = [
        con.execute(
            "SELECT regexp_replace(regexp_replace(lower(nfc_normalize(?)),"
            " '\\s+', ' ', 'g'), '^ | $', '', 'g')", [v]).fetchone()[0]
        for v in vals
    ]
    assert got == want


def test_norm_text_unicode_fuzz_vs_duckdb():
    """Randomized differential fuzz of the full normalize kernel vs the
    oracle SQL chain over an adversarial alphabet: combining marks,
    precomposed accents, compatibility chars, CJK, emoji, mixed
    whitespace.  Locks the NFC hybrid byte-for-byte against DuckDB."""
    import random

    import duckdb

    alphabet = (
        list("abcXYZ09 .?!") + ["\t", "\n", "  "]
        + [chr(0x301), chr(0x308)]              # combining acute/diaeresis
        + [chr(0xE9), chr(0xC5), chr(0x212B)]   # é, Å, Angstrom sign
        + [chr(0xDF), chr(0x130)]               # ß, İ (dotted capital I)
        + [chr(0x4E2D), chr(0x6587)]            # CJK
        + ["\U0001F600"]                        # emoji
    )
    rng = random.Random(31)
    vals = ["".join(rng.choice(alphabet)
                    for _ in range(rng.randrange(0, 30)))
            for _ in range(400)]
    got = _run(_norm_text_kernel, vals)
    con = duckdb.connect()
    sql = ("SELECT regexp_replace(regexp_replace(lower(nfc_normalize(?)),"
           " '\\s+', ' ', 'g'), '^ | $', '', 'g')")
    want = [con.execute(sql, [v]).fetchone()[0] for v in vals]
    mismatches = [(v, g, w) for v, g, w in zip(vals, got, want) if g != w]
    assert not mismatches, mismatches[:3]


def test_redact_pii_adversarial_vs_duckdb():
    """Differential check of the PII redaction kernel + counts against the
    oracle's DuckDB regexp chain on adversarial fixtures: overlapping
    candidates, boundary-adjacent dotted quads, over-long octet runs,
    emails at string edges, '+' runs too short/long for the phone rule."""
    import duckdb

    from pdf2doi_ray.stages.textnorm import (_PII_STEPS, _redact_kernel)

    vals = [
        "mail john.doe+spam@example.co.uk or admin@sub.domain.org now",
        "server 192.168.0.1 and 8.8.8.8, not 999.999.999.9999x",
        "call +1-555-123-4567 or +44-20-7946-0958 today",
        "a@b.io. trailing ip 10.0.0.255.",
        "ambiguous +12345678 vs +1234567 (too short) vs 1.2.3.4@x.yz",
        "version 1.2.3.4.5 dotted deeper than a quad",
        "+1-2-3-4-5-6-7-8-9-0-1-2-3-4-5 over-long phone run",
        "",
        "no pii at all",
    ]
    arr = pa.array(vals, type=pa.string())
    got = _redact_kernel(arr).to_pylist()
    import pyarrow.compute as pc
    got_counts = [
        pc.count_substring_regex(arr, pattern=pat).to_pylist()
        for pat, _ in _PII_STEPS
    ]

    con = duckdb.connect()
    email_p, phone_p, ip_p = (p for p, _ in _PII_STEPS)
    sql = ("SELECT regexp_replace(regexp_replace(regexp_replace(?,"
           " ?, '<EMAIL>', 'g'), ?, '<PHONE>', 'g'), ?, '<IP>', 'g'),"
           " len(regexp_extract_all(?, ?)),"
           " len(regexp_extract_all(?, ?)),"
           " len(regexp_extract_all(?, ?))")
    for i, v in enumerate(vals):
        want = con.execute(sql, [v, email_p, phone_p, ip_p,
                                 v, email_p, v, phone_p, v, ip_p]).fetchone()
        assert got[i] == want[0], (v, got[i], want[0])
        assert (got_counts[0][i], got_counts[1][i], got_counts[2][i]) == (
            want[1], want[2], want[3]), v


@pytest.mark.usefixtures("ray_session")
def test_redact_pii_dataset():
    import ray.data

    from pdf2doi_ray.stages.textnorm import redact_pii

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array([
            "reach me at a@b.org or c@d.io from 10.0.0.1",
            "clean",
            "+1-555-123-4567",
        ], type=pa.string()),
    })
    out = redact_pii(ray.data.from_arrow(t).repartition(2)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out["clean_text"]) == [
        "reach me at <EMAIL> or <EMAIL> from <IP>", "clean", "<PHONE>"]
    assert list(out["n_emails"]) == [2, 0, 0]
    assert list(out["n_ips"]) == [1, 0, 0]
    assert list(out["n_phones"]) == [0, 0, 1]
