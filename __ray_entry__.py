"""Driver contract for the graft builder (Ray Data target).

The driver initialises Ray BEFORE importing this module; nothing here may
call ``ray.init`` / ``ray.shutdown``.  Each ``queries()`` callable takes an
``sf_dir`` and returns a lazy ``ray.data.Dataset`` (or pandas/pyarrow for
small results); ``oracle_sql()`` gives the DuckDB-equivalent SQL over the
pre-registered testdata views.

The extraction queries run over the deterministic ``pages`` table synthesized
from ``documents`` (see :mod:`pdf2doi_ray.sources.pages`): because every
injected identifier is pure arithmetic on ``doc_id``, the SQL oracle
recomputes the expected output independently — the engine derives it through
the real parse + cascade machinery.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# ---------------------------------------------------------------------------
# Shared SQL fragments for the pages-derived oracles (R=1: page key == doc_id)
# ---------------------------------------------------------------------------

_D = """
  SELECT doc_id AS k,
         doc_id % 20 AS slot,
         CAST(1000 + (doc_id*7) % 9000 AS VARCHAR) AS reg,
         CAST(1000 + doc_id % 9000 AS VARCHAR) AS ym,
         CAST(10000 + (doc_id*13) % 90000 AS VARCHAR) AS n5,
         CAST(doc_id AS VARCHAR) AS ks,
         CAST(doc_id % 50 AS VARCHAR) AS site,
         text AS base_text,
         lang
  FROM documents
"""

_URL = ("'https://site' || site || '.example.org/docs/' || "
        "CASE WHEN slot IN (3,4,13) THEN '10.' || reg || '%2Fu' || ks || '.pdf' "
        "     WHEN slot = 5 THEN ym || '.' || n5 || '.pdf' "
        "     ELSE 'page-' || ks || '.html' END")

_DOI_SLOTS = "(0,1,2,3,4,6,7,8,9,10,12,13,14,15,16,17)"

_IDENTIFIER = f"""CASE
    WHEN slot IN (0,1) THEN '10.' || reg || '/meta.' || ks
    WHEN slot = 2  THEN '10.' || reg || '/tx.' || ks
    WHEN slot IN (3,4,13) THEN '10.' || reg || '/u' || ks || '.pdf'
    WHEN slot = 6  THEN '10.' || reg || '/tm.' || ks
    WHEN slot IN (7,8) THEN '10.' || reg || '/tb.' || ks
    WHEN slot = 9  THEN '10.' || reg || '/v.' || ks
    WHEN slot = 10 THEN '10.' || reg || '/uf.' || ks
    WHEN slot = 12 THEN '10.' || reg || '/mc.' || ks
    WHEN slot = 14 THEN '10.' || reg || '/dd.' || ks
    WHEN slot = 15 THEN '10.' || reg || '/m1.' || ks
    WHEN slot = 16 THEN '10.' || reg || '/ns.' || ks
    WHEN slot = 17 THEN '10.' || reg || '/td.' || ks
    ELSE NULL END"""

_METHOD = """CASE WHEN slot IN (0,1,12,16) THEN 'document_infos'
    WHEN slot IN (3,4,13) THEN 'filename'
    WHEN slot IN (2,6,7,8,9,10,14,15,17) THEN 'document_text'
    WHEN slot IN (18,19) THEN 'first_N_characters_google'
    ELSE NULL END"""

# variant with the reference's -no_arxiv2doi flag: arXiv hits survive
_IDENTIFIER_KA = _IDENTIFIER.replace(
    "ELSE NULL END",
    "WHEN slot IN (5,11) THEN ym || '.' || n5 ELSE NULL END")
_METHOD_KA = """CASE WHEN slot IN (0,1,12,16) THEN 'document_infos'
    WHEN slot IN (3,4,5,13) THEN 'filename'
    WHEN slot IN (2,6,7,8,9,10,11,14,15,17) THEN 'document_text'
    WHEN slot IN (18,19) THEN 'first_N_characters_google'
    ELSE NULL END"""

_TEXT_SUFFIX = """CASE
    WHEN slot = 2  THEN ' doi: 10.' || reg || '/tx.' || ks || ' end'
    WHEN slot = 6  THEN ' doi: 10.' || reg || '/tm.' || ks || ' end'
    WHEN slot IN (7,8) THEN ' see 10.' || reg || '/tb.' || ks || ' here'
    WHEN slot = 9  THEN ' as in (10.' || reg || '/v.' || ks || 'abc( noted'
    WHEN slot = 10 THEN ' via https://doi.org/10.' || reg || '/uf.' || ks || ' ok'
    WHEN slot = 11 THEN ' preprint arXiv:' || ym || '.' || n5 || 'v2 appeared'
    WHEN slot IN (12,13) THEN ' body doi: 10.' || reg || '/tc.' || ks || ' end'
    WHEN slot = 14 THEN ' both arXiv:' || ym || '.' || n5 || ' and doi: 10.' || reg || '/dd.' || ks || ' end'
    WHEN slot = 15 THEN ' doi: 10.' || reg || '/m1.' || ks || ' then doi: 10.' || reg || '/m2.' || ks || ' end'
    WHEN slot = 17 THEN ' Doi: 10.' || reg || '/TD.' || ks || '. fin'
    WHEN slot = 18 THEN ' ref doi: 10.1642/0004-8038(2005)122[0121:POTPIS]2.0.CO;2 none'
    ELSE '' END"""


def _identify_sql(id_expr: str, method_expr: str) -> str:
    return f"""
WITH d AS ({_D})
SELECT {_URL} AS url,
       {id_expr} AS identifier,
       CASE WHEN slot IN {_DOI_SLOTS} THEN 'DOI'
            WHEN slot IN (5,11) AND {id_expr} IS NOT NULL THEN 'arxiv ID'
            ELSE NULL END AS identifier_type,
       {method_expr} AS method,
       CASE WHEN {id_expr} IS NOT NULL THEN 'True' ELSE NULL END AS validation_info
FROM d
"""


# ---------------------------------------------------------------------------
# Ray-side query implementations
# ---------------------------------------------------------------------------

def _pages(sf_dir: str):
    from pdf2doi_ray.sources.pages import pages_dataset
    return pages_dataset(sf_dir)


def _q_extract(sf_dir: str):
    from pdf2doi_ray.config import DEFAULT_CONFIG
    from pdf2doi_ray.pipelines.identify import identify_pages
    return identify_pages(_pages(sf_dir), DEFAULT_CONFIG)


def _q_extract_keep_arxiv(sf_dir: str):
    from pdf2doi_ray.config import NO_ARXIV2DOI_CONFIG
    from pdf2doi_ray.pipelines.identify import identify_pages
    return identify_pages(_pages(sf_dir), NO_ARXIV2DOI_CONFIG)


def _q_text_parity(sf_dir: str):
    import pyarrow.compute as pc

    from pdf2doi_ray.stages.parse import HtmlParse

    parsed = _pages(sf_dir).map_batches(
        HtmlParse, batch_format="pyarrow", batch_size=256,
        concurrency=(1, 4), num_cpus=1)

    def project(t):
        t = t.select(["url", "text"])
        import pyarrow as pa
        return t.append_column("n_chars", pc.utf8_length(t["text"]).cast(pa.int64()))

    return parsed.map_batches(project, batch_format="pyarrow")


def _q_titles(sf_dir: str):
    import pyarrow as pa

    from pdf2doi_ray.html_extract import candidate_titles
    from pdf2doi_ray.stages.parse import HtmlParse

    parsed = _pages(sf_dir).map_batches(
        HtmlParse, batch_format="pyarrow", batch_size=256,
        concurrency=(1, 4), num_cpus=1)

    def choose(t):
        urls = t["url"].to_pylist()
        cands = [candidate_titles(u, ti, h, mk or [], mv or [])
                 for u, ti, h, mk, mv in zip(
                     urls, t["title"].to_pylist(), t["h1"].to_pylist(),
                     t["meta_keys"].to_pylist(), t["meta_vals"].to_pylist())]
        return pa.table({
            "url": t["url"],
            "best_title": pa.array([c[0] if c else None for c in cands]),
            "n_titles": pa.array([len(c) for c in cands], type=pa.int64()),
        })

    return parsed.map_batches(choose, batch_format="pyarrow")


def _q_method_stats(sf_dir: str):
    from pdf2doi_ray.pipelines.identify import identify_pages, method_stats
    return method_stats(identify_pages(_pages(sf_dir)))


def _q_rate_by_lang(sf_dir: str):
    import pyarrow as pa
    import pyarrow.compute as pc

    from pdf2doi_ray.pipelines.identify import identify_pages

    ids = identify_pages(_pages(sf_dir), keep_columns=("lang",))

    # partial aggregation inside map_batches (combiner), then a tiny groupby —
    # the shuffle moves one row per (lang, batch), not one per page.
    def partial(t):
        found = pc.is_valid(t["identifier"]).cast(pa.int64())
        tbl = pa.table({"lang": t["lang"], "found": found})
        g = tbl.group_by("lang").aggregate([("found", "sum"), ("found", "count")])
        return g.rename_columns(["lang", "n_found", "n_pages"])

    from ray.data.aggregate import Sum

    partials = ids.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("lang").aggregate(
        Sum("n_found", alias_name="n_found"),
        Sum("n_pages", alias_name="n_pages"),
    )


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 (driver smoke check)."""
    return _q_extract("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "extract_identifiers": _q_extract,
        "extract_identifiers_keep_arxiv": _q_extract_keep_arxiv,
        "extract_text_parity": _q_text_parity,
        "title_candidates": _q_titles,
        "method_stats": _q_method_stats,
        "extraction_rate_by_lang": _q_rate_by_lang,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "extract_identifiers": _identify_sql(_IDENTIFIER, _METHOD),
        "extract_identifiers_keep_arxiv": _identify_sql(_IDENTIFIER_KA, _METHOD_KA),
        "extract_text_parity": f"""
WITH d AS ({_D})
SELECT {_URL} AS url,
       base_text || {_TEXT_SUFFIX} AS text,
       length(base_text || {_TEXT_SUFFIX}) AS n_chars
FROM d
""",
        "title_candidates": f"""
WITH d AS ({_D})
SELECT {_URL} AS url,
       'Study ' || ks || ' of stream processing' AS best_title,
       CAST(2 AS BIGINT) AS n_titles
FROM d
""",
        "method_stats": f"""
WITH d AS ({_D})
SELECT {_METHOD} AS method, COUNT(*) AS n_rows
FROM d GROUP BY 1
""",
        "extraction_rate_by_lang": f"""
WITH d AS ({_D})
SELECT lang,
       CAST(SUM(CASE WHEN {_IDENTIFIER} IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_found,
       COUNT(*) AS n_pages
FROM d GROUP BY lang
""",
    }
