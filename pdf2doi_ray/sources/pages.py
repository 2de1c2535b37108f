"""Deterministic Common-Crawl-style ``pages`` table synthesizer.

The engine's canonical input is a Parquet table of web pages with schema
``(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)`` (BASELINE.json ``input_hint``).  No such table ships with the
sandbox, so this module derives one *deterministically* (pure arithmetic on
``doc_id`` — no RNG) from the driver-generated ``documents`` table, embedding
DOI / arXiv identifiers in metadata, url and text in every priority-conflict
combination from FIXTURES.md §3.

Because every injected value is an arithmetic function of ``doc_id``, an
independent DuckDB oracle can recompute the expected extraction output per
row in pure SQL — that three-way agreement (engine == Python oracle == SQL
oracle) is the correctness gate.

Slot map (``slot = page_key % 20``; ``reg = 1000+(k*7)%9000``,
``ym = 1000+k%9000``, ``n5 = 10000+(k*13)%90000``):

====  =========================================  =============================
slot  construction                               expected (default config)
====  =========================================  =============================
0,1   meta ``citation_doi = 10.{reg}/meta.{k}``  that DOI via document_infos
2     blocklisted meta DOI + text DOI ``tx``     text DOI via document_text
3,4   url basename ``10.{reg}%2Fu{k}.pdf``       ``10.{reg}/u{k}.pdf`` filename
5     url basename ``{ym}.{n5}.pdf``             all-null (offline arXiv
                                                 rewrite degrade, method null)
6     text ``doi: 10.{reg}/tm.{k}`` marker form  document_text
7,8   text bare ``10.{reg}/tb.{k}``              document_text
9     text ``(10.{reg}/v.{k}abc(`` letters-follow grammar v2, ``…/v.{k}``
10    text ``https://doi.org/10.{reg}/uf.{k}``   document_text
11    text ``arXiv:{ym}.{n5}v2``                 all-null degrade (method null)
12    meta ``mc`` DOI + text ``tc`` DOI          meta wins (document_infos)
13    url DOI + text ``tc`` DOI                  url wins (filename)
14    text arXiv + DOI ``dd``                    DOI wins
15    text two marker DOIs ``m1``,``m2``         first (``m1``) wins
16    meta under non-priority key, ``:`` sep     standardised ``…/ns.{k}``
17    text ``Doi: 10.{reg}/TD.{k}.``             lowercased, dot-stripped
18    text unsupported bracketed DOI             null, method exhausted
19    untouched base text                        null, method exhausted
====  =========================================  =============================
"""

from __future__ import annotations

import numpy as np
import pandas as pd

EPOCH = pd.Timestamp("2025-01-01")

#: benign metadata present on every page (never matches the prefilter).
BENIGN_META = ("generator", "engine/2.1")

_UNSUPPORTED_DOI = "10.1642/0004-8038(2005)122[0121:POTPIS]2.0.CO;2"


def _esc(s: pd.Series) -> pd.Series:
    return (s.str.replace("&", "&amp;", regex=False)
             .str.replace("<", "&lt;", regex=False)
             .str.replace(">", "&gt;", regex=False))


def synthesize_pages(batch: pd.DataFrame, replication: int = 1) -> pd.DataFrame:
    """Vectorized pages synthesis for one ``documents`` batch.

    With ``replication=R`` each document yields R pages with independent
    page keys ``k = doc_id*R + r`` (the SQL oracle assumes R=1).
    """
    R = replication
    doc_id = np.repeat(batch["doc_id"].to_numpy(), R)
    base_text = batch["text"].to_numpy().repeat(R)
    lang = batch["lang"].to_numpy().repeat(R)
    r = np.tile(np.arange(R, dtype=np.int64), len(batch))
    k = doc_id * R + r

    K = pd.Series(k).astype(str)
    reg = pd.Series(1000 + (k * 7) % 9000).astype(str)
    ym = pd.Series(1000 + k % 9000).astype(str)
    n5 = pd.Series(10000 + (k * 13) % 90000).astype(str)
    slot = k % 20
    site = "site" + pd.Series(k % 50).astype(str) + ".example.org"

    text_suffix = pd.Series(np.select(
        [slot == 2, slot == 6, np.isin(slot, (7, 8)), slot == 9, slot == 10,
         slot == 11, np.isin(slot, (12, 13)), slot == 14, slot == 15,
         slot == 17, slot == 18],
        [" doi: 10." + reg + "/tx." + K + " end",
         " doi: 10." + reg + "/tm." + K + " end",
         " see 10." + reg + "/tb." + K + " here",
         " as in (10." + reg + "/v." + K + "abc( noted",
         " via https://doi.org/10." + reg + "/uf." + K + " ok",
         " preprint arXiv:" + ym + "." + n5 + "v2 appeared",
         " body doi: 10." + reg + "/tc." + K + " end",
         " both arXiv:" + ym + "." + n5 + " and doi: 10." + reg + "/dd." + K + " end",
         " doi: 10." + reg + "/m1." + K + " then doi: 10." + reg + "/m2." + K + " end",
         " Doi: 10." + reg + "/TD." + K + ". fin",
         " ref doi: " + _UNSUPPORTED_DOI + " none"],
        default=""))
    text = pd.Series(base_text) + text_suffix

    basename = pd.Series(np.select(
        [np.isin(slot, (3, 4, 13)), slot == 5],
        ["10." + reg + "%2Fu" + K + ".pdf", ym + "." + n5 + ".pdf"],
        default="page-" + K + ".html"))
    # urls must be a KEY per crawl (the contract every url-keyed operator —
    # dedup-by-url, resume, crawl diff — relies on).  Every basename embeds
    # the unique k except slot 5, whose arXiv-shaped name ym.n5.pdf is
    # periodic in k (period 90 000) BY DESIGN: the filename finder must see
    # exactly that shape.  At replication>1 (bench scale, where k crosses
    # the period) slot-5 urls are uniquified through a path segment instead,
    # which the basename-only filename finder never reads; at the oracle's
    # replication=1 scale nothing changes, so the SQL url arithmetic holds.
    seg = pd.Series(np.where(slot == 5, "p" + K + "/", "")) if R > 1 \
        else ""
    url = "https://" + site + "/docs/" + seg + basename

    bk, bv = BENIGN_META
    benign = f'<meta name="{bk}" content="{bv}">'
    meta_html = benign + pd.Series(np.select(
        [np.isin(slot, (0, 1)), slot == 2, slot == 12, slot == 16],
        ['<meta name="citation_doi" content="10.' + reg + '/meta.' + K + '">',
         '<meta name="wps-journaldoi" content="10.' + reg + '/blocked.' + K + '">',
         '<meta name="citation_doi" content="10.' + reg + '/mc.' + K + '">',
         '<meta name="author" content="nobody">'
         '<meta name="identifier" content="10.' + reg + ':ns.' + K + '">'],
        default=""))

    title = "Document " + K + " from " + site
    h1 = "Study " + K + " of stream processing"
    html = ('<!DOCTYPE html><html lang="' + pd.Series(lang) + '"><head>'
            '<meta charset="utf-8">' + meta_html
            + "<title>" + title + "</title></head><body><header><nav>Home | "
            "About | " + site + "</nav></header><h1>" + h1 + "</h1><main>"
            + _esc(text) + "</main><footer>&copy; " + site
            + " archive</footer></body></html>")

    return pd.DataFrame({
        "url": url,
        "warc_ts": EPOCH + pd.to_timedelta(k, unit="s"),
        "html": html.str.encode("utf-8"),
        "text": text,
        "lang": lang,
    })


def pages_dataset(sf_dir: str, replication: int = 1):
    """Lazy Ray Dataset of synthesized pages for one scale-factor directory.

    Reads only the three needed ``documents`` columns and synthesizes pages
    per batch — the pages table streams, it is never materialized whole.
    """
    import ray.data

    import pyarrow as pa

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang"])

    def gen(b):
        # return a metadata-free Arrow table (pandas schema metadata defeats
        # Ray's block-schema dedup and is dead weight on every block); the
        # warc_ts column is cast to the documented timestamp[us] (pandas
        # hands Arrow ns-precision by default)
        t = pa.Table.from_pandas(synthesize_pages(b, replication),
                                 preserve_index=False)
        i = t.column_names.index("warc_ts")
        t = t.set_column(i, "warc_ts",
                         t["warc_ts"].cast(pa.timestamp("us")))
        return t.replace_schema_metadata(None)

    return ds.map_batches(gen, batch_format="pandas", batch_size=1024)


# ---------------------------------------------------------------------------
# Python oracle (the SQL oracle in __ray_entry__ mirrors this arithmetic;
# tests assert three-way agreement engine == this == SQL).
# ---------------------------------------------------------------------------

def expected_for_key(k: int, replace_arxiv_by_doi: bool = True):
    """Expected (identifier, identifier_type, method) for page key ``k``."""
    reg = 1000 + (k * 7) % 9000
    ym = 1000 + k % 9000
    n5 = 10000 + (k * 13) % 90000
    slot = k % 20
    exhausted = (None, None, "first_N_characters_google")
    if slot in (0, 1):
        return (f"10.{reg}/meta.{k}", "DOI", "document_infos")
    if slot == 2:
        return (f"10.{reg}/tx.{k}", "DOI", "document_text")
    if slot in (3, 4, 13):
        return (f"10.{reg}/u{k}.pdf", "DOI", "filename")
    if slot == 5:
        return ((None, None, None) if replace_arxiv_by_doi
                else (f"{ym}.{n5}", "arxiv ID", "filename"))
    if slot == 6:
        return (f"10.{reg}/tm.{k}", "DOI", "document_text")
    if slot in (7, 8):
        return (f"10.{reg}/tb.{k}", "DOI", "document_text")
    if slot == 9:
        return (f"10.{reg}/v.{k}", "DOI", "document_text")
    if slot == 10:
        return (f"10.{reg}/uf.{k}", "DOI", "document_text")
    if slot == 11:
        return ((None, None, None) if replace_arxiv_by_doi
                else (f"{ym}.{n5}", "arxiv ID", "document_text"))
    if slot == 12:
        return (f"10.{reg}/mc.{k}", "DOI", "document_infos")
    if slot == 14:
        return (f"10.{reg}/dd.{k}", "DOI", "document_text")
    if slot == 15:
        return (f"10.{reg}/m1.{k}", "DOI", "document_text")
    if slot == 16:
        return (f"10.{reg}/ns.{k}", "DOI", "document_infos")
    if slot == 17:
        return (f"10.{reg}/td.{k}", "DOI", "document_text")
    return exhausted


def previous_crawl_batch(t, drop_mod: int = 7, change_mod: int = 5,
                         ghost_mod: int = 11):
    """Deterministic PREVIOUS-crawl synthesis from a current-crawl batch,
    shared by the incremental-extraction oracle query, its bench row, and
    the reuse-proof test (one recipe, no drift): pages whose second-
    resolution warc_ts key is ≡0 mod ``drop_mod`` are ABSENT (→ added in
    the current crawl), ≡0 mod ``change_mod`` carry different html
    (→ changed), and ghost urls suffixed ``-old`` for keys ≡0 mod
    ``ghost_mod`` exist only here (→ removed)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    secs = np.asarray(pc.divide(pc.cast(t["warc_ts"], pa.int64()),
                                1_000_000))
    keep = secs % drop_mod != 0
    sub = t.filter(pa.array(keep))
    html = np.asarray(sub["html"].to_pylist(), dtype=object)
    html[secs[keep] % change_mod == 0] = \
        b"<html><body>old content</body></html>"
    ghosts = t.filter(pa.array(secs % ghost_mod == 0))
    cols = {}
    for name in t.column_names:
        if name == "url":
            cols[name] = pa.array(
                sub["url"].to_pylist()
                + [u + "-old" for u in ghosts["url"].to_pylist()],
                type=pa.string())
        elif name == "html":
            cols[name] = pa.array(list(html) + ghosts["html"].to_pylist(),
                                  type=pa.binary())
        else:
            cols[name] = pa.concat_arrays([
                sub[name].combine_chunks(),
                ghosts[name].combine_chunks()])
    return pa.table(cols)
