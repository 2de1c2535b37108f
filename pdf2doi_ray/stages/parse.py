"""Stateful parse stage: ``html: binary`` → text / title / h1 / metadata.

The engine analog of the reference's heavyweight PDF reader stage
(``/root/reference/pdf2doi/finders.py:360-518``): a callable class run as a
Ray Data actor pool via ``map_batches(HtmlParse, concurrency=..., ...)`` so
per-worker setup happens once in ``__init__`` and each ``__call__`` only does
per-batch work.  Batches are Arrow in / Arrow out; the multi-KB ``html``
binary column is consumed here and NOT forwarded — early projection keeps the
downstream pipeline narrow (the 100 TB payload bytes never travel past this
stage).

Per-row failure parity: a payload the parser cannot handle degrades that one
row to empty text / no metadata instead of failing the task, mirroring the
reference's per-document try/except policy (main.py:132-142).
"""

from __future__ import annotations

import pyarrow as pa

import re

from ..html_extract import parse_page, title_by_font_histogram

#: case-insensitive byte/str probes for the font-title gate — one C pass
#: over the RAW payload, no decode unless it hits (the style kernel's
#: regex is IGNORECASE, so the gate must be too)
_FONT_PROBE_B = re.compile(rb"font-size", re.I)
_FONT_PROBE_S = re.compile(r"font-size", re.I)

PARSED_FIELDS = [
    ("text", pa.string()),
    ("title", pa.string()),
    ("h1", pa.string()),
    ("font_title", pa.string()),
    ("meta_keys", pa.list_(pa.string())),
    ("meta_vals", pa.list_(pa.string())),
    ("segments", pa.list_(pa.string())),
]


class HtmlParse:
    """Actor-pool batch parser.  Forwards every input column except ``html``
    and appends the parsed columns.

    ``emit_segments=False`` skips the per-unit text column (a full duplicate
    of main text) — the whole-document reader never consumes it, so the
    flagship path avoids doubling the parsed intermediate."""

    def __init__(self, emit_segments: bool = True) -> None:
        # Compiled scanner regexes live at module import; touching the parser
        # here surfaces import errors at actor start rather than first batch.
        parse_page(b"<html><body><main>warm</main></body></html>")
        self._emit_segments = emit_segments

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("html").to_pylist()
        texts: list[str] = []
        titles: list[str | None] = []
        h1s: list[str | None] = []
        ftitles: list[str | None] = []
        mkeys: list[list[str]] = []
        mvals: list[list[str]] = []
        segs: list[list[str]] = []
        for payload in payloads:
            # compute first, append exactly once after: a partial-append on
            # exception would desync the column lengths
            try:
                p = parse_page(payload or b"")
            except Exception:
                p = None
            # font-histogram headline (reference title source 2): the
            # case-insensitive probe runs on the RAW payload (one C pass,
            # no decode); styleless pages (the common case) skip the second
            # markup scan entirely.  Its own except: a font-step failure
            # must not degrade the successfully parsed row.
            ft = None
            if p is not None:
                try:
                    raw = payload or b""
                    hit = _FONT_PROBE_B.search(raw) if isinstance(raw, bytes) \
                        else _FONT_PROBE_S.search(raw)
                    if hit:
                        html_s = raw.decode("utf-8", errors="replace") \
                            if isinstance(raw, bytes) else raw
                        ft = title_by_font_histogram(html_s)
                except Exception:
                    ft = None
            if p is None:
                texts.append("")
                titles.append(None)
                h1s.append(None)
                ftitles.append(None)
                mkeys.append([])
                mvals.append([])
                segs.append([])
            else:
                texts.append(p.text)
                titles.append(p.title)
                h1s.append(p.h1)
                ftitles.append(ft)
                mkeys.append(p.meta_keys)
                mvals.append(p.meta_vals)
                segs.append(list(p.segments))

        out = batch.drop_columns(["html"])
        fields = list(zip(PARSED_FIELDS,
                          (texts, titles, h1s, ftitles, mkeys, mvals, segs)))
        if not self._emit_segments:
            fields = [f for f in fields if f[0][0] != "segments"]
        for (name, typ), col in fields:
            arr = pa.array(col, type=typ)
            if name in out.column_names:
                out = out.set_column(out.column_names.index(name), name, arr)
            else:
                out = out.append_column(name, arr)
        return out
