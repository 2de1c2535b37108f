"""Pluggable online validation/search stages (OFF by default, like the
reference with ``-nwv -nws``).

The reference's online paths — dx.doi.org DOI validation with a bounded
retry loop, export.arxiv.org ID validation, google-search enrichment
(``/root/reference/pdf2doi/finders.py:37-95, 266-292``) — are per-row HTTP
lookups.  At engine scale they are rate-limited actor pools a deployment can
splice between extract and finalize.  This sandbox has no network, so the
stage ships as a real actor class with the transport injected: production
passes a ``fetch`` callable (requests session wrapper); tests pass a fake.
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa

#: validator outcome sentinels, mirroring the reference's return convention
#: (finders.py:37-75): str/True = validated info, False = invalid,
#: None = not found / connection failure after retries.
MAX_RETRIES = 10


class WebValidate:
    """Actor-pool stage: re-validate extracted identifiers via a keyed
    external service (the join-like lookup of SURVEY §2.4).

    ``fetch(url) -> (status, body)`` is injected; without one the stage
    raises at construction (no silent network use).  The fetch MUST follow
    redirects (doi.org answers valid DOIs with 30x → publisher page; the
    reference's urlopen does the same) — a bare 30x reaching this stage is
    treated as a mis-configured transport and surfaces as a loud error, not
    a silent not-found.  Retries 5xx up to ``MAX_RETRIES`` times per row
    like the reference's loop (finders.py:50-61); 404 → not found; any
    2xx → validated.
    """

    def __init__(self, fetch: Callable[[str], tuple[int, str]] | None = None,
                 endpoint: str = "https://doi.org/") -> None:
        if fetch is None:
            raise NotImplementedError(
                "WebValidate needs an injected fetch callable; this "
                "environment has no network access")
        self._fetch = fetch
        self._endpoint = endpoint

    def _validate_one(self, identifier: str | None) -> str | None:
        if not identifier:
            return None
        for _ in range(MAX_RETRIES):
            status, body = self._fetch(self._endpoint + identifier)
            if status == 404:
                return None
            if status >= 500:
                continue
            if 200 <= status < 300:
                return body
            if 300 <= status < 400:
                raise RuntimeError(
                    "WebValidate received a redirect status — the injected "
                    "fetch must follow redirects (see class docstring)")
            return None
        return None

    def __call__(self, batch: pa.Table) -> pa.Table:
        infos = [self._validate_one(i)
                 for i in batch["identifier"].to_pylist()]
        col = pa.array(infos, type=pa.string())
        if "validation_info" in batch.column_names:
            return batch.set_column(
                batch.column_names.index("validation_info"),
                "validation_info", col)
        return batch.append_column("validation_info", col)


def attach_web_validation(identifiers, fetch, concurrency=(1, 4),
                          batch_size: int = 64):
    """Splice the rate-limited validation actor pool onto an identifier
    stream.  Small batches + small pool on purpose: the external service is
    the bottleneck, not the cluster."""
    return identifiers.map_batches(
        WebValidate, fn_constructor_kwargs={"fetch": fetch},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=0.25)
