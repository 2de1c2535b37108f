"""Google-search finder methods 4–5 — the last two entries of the
reference's finder registry, as a transport-injected actor-pool stage.

Reference semantics reproduced (``/root/reference/pdf2doi/finders.py``):

* ``title_google`` (finders.py:792-818): collect possible titles, longest
  first; for each title run a bounded google search; first valid identifier
  wins.
* ``first_N_characters_google`` (finders.py:820-861): ascii-scrub the
  document text (non-ASCII and ``\\n \\r \\t`` → space), take the first N
  characters, google that; skip the method entirely if the scrub leaves an
  empty string.
* per-result scan (finders.py:266-292): for each search-result url, FIRST
  scan the url string itself for an identifier, then fetch the page and scan
  its body; any exception inside the search loop is swallowed and the method
  reports not-found.
* an arXiv hit goes through the same rewrite (and offline degrade quirk) as
  every other method (finders.py:665-684).

This sandbox has no network, so — like :mod:`pdf2doi_ray.stages.web` — the
stage ships with ``search``/``fetch`` injected: production passes real
transports, tests pass fakes.  The stage is an actor pool sized small on
purpose (the external service is the bottleneck, not the cluster), spliced
AFTER the offline extract stage so it re-attempts only exhausted rows.
"""

from __future__ import annotations

import re
from collections.abc import Callable

import pyarrow as pa

from ..cascade import DEGRADED, EXHAUSTED_METHOD, Found, rewrite_arxiv, search_texts
from ..config import DEFAULT_CONFIG, EngineConfig
from ..html_extract import candidate_titles
from ..idpatterns import validate_offline

#: reference default ``numb_results_google_search`` (config.py:45)
NUMB_RESULTS_DEFAULT = 6

_NON_ASCII = re.compile(r"[^\x00-\x7f]")


def ascii_scrub(text: str, n: int) -> str:
    """The reference's query preparation (finders.py:844-852)."""
    text = _NON_ASCII.sub(" ", text)
    for ch in ("\n", "\r", "\t"):
        text = text.replace(ch, " ")
    return text[:n]


class GoogleSearchFinder:
    """Actor-pool stage: re-attempt exhausted rows via web search.

    ``search(query, stop) -> iterable[str]`` yields result urls (the
    ``googlesearch.search`` contract); ``fetch(url) -> (status, body)`` is
    the page transport.  Both are required — no silent network use.
    """

    def __init__(self,
                 search: Callable | None = None,
                 fetch: Callable | None = None,
                 cfg: EngineConfig = DEFAULT_CONFIG,
                 numb_results: int = NUMB_RESULTS_DEFAULT,
                 validate: Callable = validate_offline) -> None:
        if search is None or fetch is None:
            raise NotImplementedError(
                "GoogleSearchFinder needs injected search and fetch "
                "callables; this environment has no network access")
        self._search = search
        self._fetch = fetch
        self._cfg = cfg
        self._numb_results = numb_results
        self._validate = validate

    def _try_query(self, query: str):
        """One bounded google search; reference finders.py:266-292."""
        try:
            n = 0
            for url in self._search(query, self._numb_results):
                if n >= self._numb_results:
                    break
                ident, kind, verdict = search_texts([url], self._validate)
                if ident:
                    return ident, kind, verdict
                _status, body = self._fetch(url)
                ident, kind, verdict = search_texts([body], self._validate)
                if ident:
                    return ident, kind, verdict
                n += 1
        except Exception:
            # the reference swallows any search-loop error (finders.py:289)
            pass
        return None, None, None

    def _find_row(self, url, title, h1, meta_keys, meta_vals, text,
                  font_title=None) -> Found | None:
        # method 4: title_google
        for t in candidate_titles(url or "", title, h1,
                                  meta_keys or [], meta_vals or [],
                                  font_title=font_title):
            ident, kind, verdict = self._try_query(t)
            if ident:
                return self._finish(ident, kind, verdict, "title_google")
        # method 5: first_N_characters_google
        if isinstance(text, str):
            snippet = ascii_scrub(text, self._cfg.n_characters)
            if snippet:
                ident, kind, verdict = self._try_query(snippet)
                if ident:
                    return self._finish(ident, kind, verdict,
                                        "first_N_characters_google")
        return None

    def _finish(self, ident, kind, verdict, method) -> Found:
        rewritten = rewrite_arxiv(ident, kind, verdict, method, self._cfg)
        if rewritten is None:
            return DEGRADED
        ident, kind, verdict, method = rewritten
        info = verdict if isinstance(verdict, str) else str(verdict)
        return Found(ident, kind, method, info)

    def __call__(self, batch: pa.Table) -> pa.Table:
        idents = batch["identifier"].to_pylist()
        kinds = batch["identifier_type"].to_pylist()
        methods = batch["method"].to_pylist()
        vinfos = batch["validation_info"].to_pylist()
        has_meta = "meta_keys" in batch.column_names
        for i in range(batch.num_rows):
            # only exhausted rows retry; degraded rows (null method) stay
            # degraded — in the reference their exception aborted the whole
            # cascade before the google methods ran
            if idents[i] is not None or methods[i] != EXHAUSTED_METHOD:
                continue
            found = self._find_row(
                batch["url"][i].as_py(),
                batch["title"][i].as_py() if "title" in batch.column_names else None,
                batch["h1"][i].as_py() if "h1" in batch.column_names else None,
                batch["meta_keys"][i].as_py() if has_meta else [],
                batch["meta_vals"][i].as_py() if has_meta else [],
                batch["text"][i].as_py() if "text" in batch.column_names else None,
                font_title=batch["font_title"][i].as_py()
                if "font_title" in batch.column_names else None,
            )
            if found is not None:
                idents[i] = found.identifier
                kinds[i] = found.id_type
                methods[i] = found.method
                vinfos[i] = found.validation_info
        out = batch
        for name, vals in (("identifier", idents), ("identifier_type", kinds),
                           ("method", methods), ("validation_info", vinfos)):
            out = out.set_column(out.column_names.index(name), name,
                                 pa.array(vals, type=pa.string()))
        return out


def attach_google_search(extracted, search, fetch,
                         cfg: EngineConfig = DEFAULT_CONFIG,
                         numb_results: int = NUMB_RESULTS_DEFAULT,
                         concurrency=(1, 4), batch_size: int = 64):
    """Splice the websearch actor pool onto an extract-stage output that
    still carries the parsed columns (title/h1/meta/text).  Small batches +
    small pool: the external service is the bottleneck."""
    return extracted.map_batches(
        GoogleSearchFinder,
        fn_constructor_kwargs={"search": search, "fetch": fetch,
                               "cfg": cfg, "numb_results": numb_results},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=0.25)
