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
