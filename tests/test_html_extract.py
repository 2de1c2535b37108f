"""HTML main-content extraction contract tests."""

from pdf2doi_ray.html_extract import candidate_titles, escape_text, parse_page


def test_roundtrip_byte_identity():
    text = 'weird & <tagged> text\nwith 100% "quotes" and ünïcode'
    html = ("<html><head><title>T page here</title></head><body>"
            "<header><nav>menu</nav></header><h1>Headline text</h1>"
            f"<main>{escape_text(text)}</main>"
            "<footer>foot</footer></body></html>").encode()
    p = parse_page(html)
    assert p.text == text
    assert p.title == "T page here"
    assert p.h1 == "Headline text"


def test_boilerplate_and_scripts_stripped():
    html = (b"<body><nav>NO</nav><script>var x='NO';</script>"
            b"<style>.no{}</style><main>YES</main>"
            b"<aside>NO</aside><footer>NO</footer></body>")
    assert parse_page(html).text == "YES"


def test_no_main_falls_back_to_visible_body():
    html = b"<body><header>NO</header><p>A</p><div>B</div></body>"
    assert parse_page(html).text.replace("", "") == "AB"


def test_nested_boilerplate_depth():
    html = b"<body><main>keep<nav>drop<nav>deep</nav>still</nav>back</main></body>"
    assert parse_page(html).text == "keepback"


def test_meta_pairs_in_document_order():
    html = (b'<head><meta charset="utf-8">'
            b'<meta name="a" content="1"><meta property="og:title" content="t">'
            b'<meta name="b" content="x &amp; y"></head><body></body>')
    p = parse_page(html)
    assert p.meta_keys == ["a", "og:title", "b"]
    assert p.meta_vals == ["1", "t", "x & y"]


def test_first_h1_only_and_nested_markup():
    html = b"<body><h1>One <em>em</em> done</h1><h1>Two</h1><main>m</main></body>"
    assert parse_page(html).h1 == "One em done"


def test_malformed_degrades_not_raises():
    for payload in [b"", b"<", b"<<<>>>", b"<body", b"\xff\xfe garbage",
                    b"<script>never closed", "plain str input"]:
        p = parse_page(payload)
        assert isinstance(p.text, str)


def test_head_text_never_leaks_into_body_text():
    html = b"<head><title>TT long enough</title></head><body><main>M</main></body>"
    assert parse_page(html).text == "M"


def test_candidate_titles_order_gates_dedup():
    cands = candidate_titles(
        "https://x.org/" + "a" * 40,
        "A Proper Document Title",      # <title>
        "A Headline Long Enough",       # h1
        ["citation_title", "dc.title", "other"],
        ["Four Words Meta Title Here", "short", "ignored"],
    )
    # longest-first ordering (the reference googles longest first)
    assert cands == ["a" * 40, "Four Words Meta Title Here",
                     "A Proper Document Title", "A Headline Long Enough"]
    # short (<12 chars) and 'other'-key values excluded
    assert "short" not in cands and "ignored" not in cands
