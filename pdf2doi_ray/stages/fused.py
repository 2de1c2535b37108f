"""Fused parse+extract actor stage for the flagship pipeline.

Composable pipelines use :class:`~pdf2doi_ray.stages.parse.HtmlParse` and
:func:`~pdf2doi_ray.stages.extract.make_extract_fn` as separate stages; the
flagship identifier pipeline fuses them into ONE actor-pool stage so the
wide intermediate (full text + metadata lists per page) never leaves the
worker — only the narrow identifier columns travel through the object store.
At 100 TB that intermediate would otherwise be re-serialized and shipped for
every block.
"""

from __future__ import annotations

import pyarrow as pa

from ..config import DEFAULT_CONFIG, EngineConfig
from .extract import make_extract_fn
from .parse import HtmlParse


class IdentifyPages:
    """html pages batch → identifier columns batch, in one hop.

    Keeps ``url`` plus ``keep_columns`` from the input and appends
    ``identifier / identifier_type / method / validation_info``.
    """

    def __init__(self, cfg: EngineConfig = DEFAULT_CONFIG,
                 keep_columns: tuple[str, ...] = ()) -> None:
        self._parse = HtmlParse(emit_segments=(cfg.reader == "segmented"))
        self._extract = make_extract_fn(cfg)
        self._cfg = cfg
        self._keep = ("url", *keep_columns)

    def __call__(self, batch: pa.Table) -> pa.Table:
        parsed = self._parse(batch) if self._cfg.use_html else batch
        result = self._extract(parsed)
        keep = [c for c in self._keep if c in result.column_names]
        return result.select(
            keep + ["identifier", "identifier_type", "method",
                    "validation_info"])
