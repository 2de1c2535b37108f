"""Flagship pipeline: pages → parse → extract → identifiers.

Assembles the streaming Ray Data pipeline mirroring the reference's
per-document driver cascade (``/root/reference/pdf2doi/main.py:105-189``) as
two batch stages:

1. :class:`pdf2doi_ray.stages.parse.HtmlParse` — actor pool over the binary
   ``html`` column, emits text/title/h1/meta and drops the payload;
2. :func:`pdf2doi_ray.stages.extract.make_extract_fn` — stateless vectorized
   prefilter + exact cascade, emits the identifier columns.

The whole pipeline is shuffle-free (embarrassingly parallel per row); the
only wide operations in this engine live in the resume/dedup and metrics
paths (see :mod:`pdf2doi_ray.state.checkpoint` and
:func:`method_stats`).
"""

from __future__ import annotations

from ..config import DEFAULT_CONFIG, EngineConfig
from ..stages.extract import make_extract_fn
from ..stages.parse import HtmlParse

#: identifier output schema (FIXTURES.md §2)
RESULT_COLUMNS = ["url", "identifier", "identifier_type", "method",
                  "validation_info"]


def identify_pages(pages, cfg: EngineConfig = DEFAULT_CONFIG,
                   keep_columns: tuple[str, ...] = ()):
    """pages Dataset → identifiers Dataset (streaming, lazy).

    ``keep_columns`` carries extra input columns (e.g. ``lang``) through to
    the result for downstream metrics.
    """
    if cfg.use_html:
        parsed = pages.map_batches(
            HtmlParse,
            batch_format="pyarrow",
            batch_size=cfg.parse_batch_size,
            concurrency=cfg.parse_concurrency or (1, 8),
            num_cpus=1,
        )
    else:
        parsed = pages
    extracted = parsed.map_batches(
        make_extract_fn(cfg),
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
    )
    return extracted.select_columns(RESULT_COLUMNS + list(keep_columns))


def method_stats(identifiers):
    """Per-method result counts — the run-metrics aggregation (a small
    groupby over the already-narrow result stream)."""
    from ray.data.aggregate import Count

    return identifiers.groupby("method").aggregate(Count(alias_name="n_rows"))
