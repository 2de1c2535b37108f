"""WARC source / sink — Common Crawl's native archive format.

A WARC file is a concatenation of records, each a header block of
``Name: value`` lines framed by ``Content-Length`` (ISO-28500); Common
Crawl ships its raw fetches as gzip-member-per-record ``.warc.gz`` plus
derived WET/WAT sidecars.  This module implements the uncompressed
framing from the public spec (no external warc libs in the image):

* :func:`export_warc` — pages → one ``.warc`` file per batch, each row a
  ``WARC-Type: response`` record carrying ``WARC-Target-URI``,
  ``WARC-Date`` (epoch-µs preserved exactly in a fractional-seconds
  ISO-8601 stamp) and the raw ``html`` payload bytes.  Each map task
  writes its own file (named by the batch's first timestamp — unique by
  the fixture's key contract), so the sink is one streaming pass with no
  driver involvement and a crashed export leaves complete, re-readable
  files behind.
* :func:`read_warc` — ``read_binary_files`` (one task per file) →
  vectorized-enough record walk: the parser jumps header→payload by
  ``Content-Length`` (never scanning payload bytes for separators, so
  binary payloads containing ``\\r\\n\\r\\n`` survive) and emits Arrow
  columns (url, warc_ts, html).

Round-trip contract (locked by the ``warc_roundtrip`` driver query and
``tests/test_round4_wave5.py``): ``read_warc(export_warc(pages))``
reproduces (url, warc_ts, html) byte-for-byte; the query itself asserts
payload equality distributed (hash join back to the source + ``pc.equal``
count) because SQL cannot rebuild the html bytes.

Reference tie-in: pdf2doi walks local PDF files one at a time
(``main.py`` directory scan); the 100 TB analog of "the input directory"
is a WARC segment listing, which this reader turns into the same
(url, payload) batches the extraction cascade consumes.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

_CRLF = b"\r\n"


def _iso(us: int) -> str:
    """Epoch-µs → ISO-8601 with fractional seconds (lossless)."""
    import datetime

    dt = datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=us)
    return dt.strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"


def _record(url: str, us: int, payload: bytes) -> bytes:
    head = (b"WARC/1.0" + _CRLF
            + b"WARC-Type: response" + _CRLF
            + b"WARC-Target-URI: " + url.encode("utf-8") + _CRLF
            + b"WARC-Date: " + _iso(us).encode("ascii") + _CRLF
            + b"Content-Length: " + str(len(payload)).encode("ascii")
            + _CRLF + _CRLF)
    return head + payload + _CRLF + _CRLF


def export_warc(pages, out_dir: str) -> str:
    """Write (url, warc_ts, html) pages as uncompressed ``.warc`` files,
    one per batch — a streaming sink (each task writes its own file and
    emits one bookkeeping row; nothing gathers at the driver)."""
    import pyarrow.compute as pc

    os.makedirs(out_dir, exist_ok=True)

    def write_batch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"path": pa.array([], type=pa.string()),
                             "n_records": pa.array([], type=pa.int64())})
        urls = t["url"].to_pylist()
        us = pc.cast(pc.cast(t["warc_ts"], pa.timestamp("us")),
                     pa.int64()).to_pylist()
        html = t["html"].to_pylist()
        blob = b"".join(_record(u, s, p)
                        for u, s, p in zip(urls, us, html))
        path = os.path.join(out_dir, f"part-{min(us)}.warc")
        with open(path, "wb") as f:
            f.write(blob)
        return pa.table({"path": pa.array([path]),
                         "n_records": pa.array([t.num_rows],
                                               type=pa.int64())})

    return pages.map_batches(write_batch, batch_format="pyarrow")


def _parse_warc_bytes(blob: bytes):
    """Walk one WARC file's records by Content-Length framing."""
    urls, stamps, payloads = [], [], []
    pos, n = 0, len(blob)
    while pos < n:
        end_head = blob.index(b"\r\n\r\n", pos)
        head = blob[pos:end_head].decode("utf-8")
        fields = {}
        for line in head.split("\r\n")[1:]:
            k, _, v = line.partition(": ")
            fields[k] = v
        clen = int(fields["Content-Length"])
        body = blob[end_head + 4:end_head + 4 + clen]
        urls.append(fields["WARC-Target-URI"])
        stamps.append(fields["WARC-Date"])
        payloads.append(body)
        pos = end_head + 4 + clen + 4          # payload + record CRLFCRLF
    return urls, stamps, payloads


def read_warc(path_or_dir: str):
    """WARC source: one read task per ``.warc`` file → (url, warc_ts,
    html) Arrow blocks.  Header fields parse in Python (headers are tiny);
    payload bytes move by slice, never by scan."""
    import ray.data

    def parse(t: pa.Table) -> pa.Table:
        import datetime

        urls_all, us_all, pay_all = [], [], []
        for blob in t["bytes"].to_pylist():
            urls, stamps, payloads = _parse_warc_bytes(blob)
            urls_all.extend(urls)
            epoch = datetime.datetime(1970, 1, 1)
            one_us = datetime.timedelta(microseconds=1)
            us_all.extend(
                (datetime.datetime.strptime(s, "%Y-%m-%dT%H:%M:%S.%fZ")
                 - epoch) // one_us for s in stamps)
            pay_all.extend(payloads)
        return pa.table({
            "url": pa.array(urls_all, type=pa.string()),
            "warc_ts": pa.array(np.array(us_all, dtype=np.int64)).cast(
                pa.timestamp("us")),
            "html": pa.array(pay_all, type=pa.binary()),
        })

    return ray.data.read_binary_files(path_or_dir).map_batches(
        parse, batch_format="pyarrow")
