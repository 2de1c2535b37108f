"""Identifier-extraction stage: vectorized prefilter + exact per-row cascade.

At web scale almost no page contains a DOI/arXiv pattern, so the stage first
runs ONE vectorized RE2 kernel per column (``pyarrow.compute
.match_substring_regex``) to find the rows that could possibly hit:

* text:  must contain ``10.<4 digits>`` or ``<4 digits>.<digit>`` — every
  grammar version requires one of these literals (proved in
  ``tests/test_idpatterns.py``);
* url:   same, plus ``%`` (percent-encoding can hide the separator);
* meta:  any metadata *value* matching the text prefilter (computed over the
  flattened list column with one kernel + an offset reduction — no per-row
  Python until a row is a candidate).

Only candidate rows pay the exact Python cascade
(:func:`pdf2doi_ray.cascade.identify_row`); all other rows are emitted
directly with the reference's exhausted-row shape.  The prefilter is
conservative by construction, so results are byte-identical to running the
cascade on every row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..cascade import DEGRADED, EXHAUSTED_METHOD, Found, identify_row, rewrite_arxiv
from ..config import EngineConfig
from ..idpatterns import (
    ARXIV2007,
    ARXIV_REGEXP,
    DOI_REGEXP,
    PREFILTER_SRC,
    standardise_doi,
)

URL_PREFILTER_SRC = r"10\.|%|[0-9\p{Nd}]{4}\.[0-9\p{Nd}]"

OUTPUT_FIELDS = ("identifier", "identifier_type", "method", "validation_info")

# ---------------------------------------------------------------------------
# Vectorized text-only fast route.
#
# For rows where ONLY the document_text method can hit (no metadata/url
# candidates) and the text is pure ASCII, the grammar cascade can run as a
# chain of RE2 ``extract_regex`` kernels — one per grammar version — with
# per-row Python reduced to validating the handful of first hits:
#
# * Python ``re`` and RE2 agree on these patterns over ASCII text (same
#   leftmost-first semantics; the \s/\d class difference only exists for
#   non-ASCII input, which is routed to the exact loop);
# * a row whose FIRST hit of version v validates returns exactly that hit in
#   the exact cascade too (later hits/versions are never consulted);
# * a row whose first hit does NOT validate falls back to the exact per-row
#   loop (the cascade would try the SECOND hit of the same version next —
#   not expressible with a first-match kernel);
# * a row with no RE2 match for a version has no Python match either (ASCII
#   equivalence), so the chain may move on; exhausting all 8 versions proves
#   the exact cascade finds nothing.
# ---------------------------------------------------------------------------

def _named(pattern: str) -> str:
    # single anonymous capture group → named, for pc.extract_regex; Python's
    # '$' (end-of-text OR before a final newline) becomes RE2 '\n?\z' —
    # consuming the optional newline is harmless, only the group is read
    return "(?i)" + pattern.replace("(10", "(?P<id>10", 1) \
        .replace(r"(\d{4}", r"(?P<id>\d{4}", 1) \
        .replace("$", r"\n?\z")


_CHAIN = ([("doi", _named(p)) for p in DOI_REGEXP]
          + [("arxiv", _named(p)) for p in ARXIV_REGEXP])
_NON_ASCII = r"[^\x00-\x7f]"


from ..arrowutil import one_chunk as _one_chunk
from ..arrowutil import rowwise_flag_counts


def _mask(col, pattern: str) -> np.ndarray:
    """Vectorized boolean mask: row value matches ``pattern`` (null → False)."""
    m = pc.fill_null(pc.match_substring_regex(_one_chunk(col), pattern), False)
    return np.asarray(m)


def _list_any(col, pattern: str) -> np.ndarray:
    """Per-row 'any list element matches pattern' over a list<string> column,
    via one vectorized kernel on the flattened values + an offset reduction."""
    arr = _one_chunk(col)
    flat = arr.flatten()
    if len(flat) == 0:
        return np.zeros(len(arr), dtype=bool)
    return rowwise_flag_counts(
        arr, pc.match_substring_regex(flat, pattern)) > 0


def make_extract_fn(cfg: EngineConfig):
    """Build the stateless ``map_batches`` function for this config.

    The config is captured by value in the closure (no global state); the
    compiled grammars live at module import, once per worker process.
    """

    full_cascade = tuple(cfg.methods) == ("document_infos", "filename",
                                          "document_text")
    exhausted = EXHAUSTED_METHOD if full_cascade else cfg.methods[-1]

    def extract(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        has_meta = "meta_keys" in batch.column_names

        # prefilter only the columns of enabled methods — a disabled method
        # must not mark rows as candidates (nor cost a kernel)
        if "document_text" not in cfg.methods:
            text_mask = np.zeros(n, dtype=bool)
        elif cfg.reader == "segmented":
            # per-segment matching: the concatenated text column is NOT a
            # superset (an unterminated entity at a node boundary decodes
            # differently in the concatenation) — prefilter the segments
            if "segments" not in batch.column_names:
                raise ValueError(
                    "reader='segmented' needs a 'segments' column "
                    "(parse the html payload; pre-extracted text has no "
                    "unit boundaries)")
            text_mask = _list_any(batch["segments"], PREFILTER_SRC)
        elif "text" in batch.column_names:
            text_mask = _mask(batch["text"], PREFILTER_SRC)
        else:
            text_mask = np.zeros(n, dtype=bool)
        url_mask = _mask(batch["url"], URL_PREFILTER_SRC) \
            if "filename" in cfg.methods else np.zeros(n, dtype=bool)
        meta_mask = _list_any(batch["meta_vals"], PREFILTER_SRC) \
            if "document_infos" in cfg.methods and has_meta \
            else np.zeros(n, dtype=bool)
        candidate = text_mask | url_mask | meta_mask
        if "filename" in cfg.methods:
            # a NULL url cannot be shortcut to the exhausted shape: the
            # exact cascade RAISES in the filename method and degrades the
            # row to all-null (reference main.py:132-142) — route every
            # null-url row through the slow path so the try/except there
            # reproduces that, whether or not any prefilter matched
            candidate |= np.asarray(pc.is_null(_one_chunk(batch["url"])))

        identifier: list[str | None] = [None] * n
        id_type: list[str | None] = [None] * n
        method: list[str | None] = [exhausted] * n
        vinfo: list[str | None] = [None] * n

        slow = candidate.copy()

        # ---- vectorized text-only fast route (see module comment) -------
        # whole-document reader only: per-unit scanning has different
        # version-priority interleaving than a whole-text regex chain
        if cfg.reader == "whole" and "document_text" in cfg.methods \
                and text_mask.any():
            blocked = np.zeros(n, dtype=bool)
            if "document_infos" in cfg.methods:
                blocked |= meta_mask
            if "filename" in cfg.methods:
                blocked |= url_mask
                # a NULL url makes the filename method raise, degrading the
                # whole row (per-row failure parity) — the text-only fast
                # route would wrongly return the text hit instead
                blocked |= np.asarray(pc.is_null(_one_chunk(batch["url"])))
            ascii_only = ~_mask(batch["text"], _NON_ASCII)
            fastable = text_mask & ~blocked & ascii_only
            positions = np.nonzero(fastable)[0]
            if len(positions):
                texts_sub = _one_chunk(batch["text"]).take(pa.array(positions))
                slow[positions] = False          # decided below or exhausted
                for kind, pattern in _CHAIN:
                    if len(positions) == 0:
                        break
                    m = pc.extract_regex(texts_sub, pattern)
                    hit = np.asarray(pc.is_valid(m))
                    if hit.any():
                        raws = pc.struct_field(m, "id").to_pylist()
                        for li in np.nonzero(hit)[0]:
                            row = positions[li]
                            raw = raws[li]
                            if kind == "doi":
                                std = standardise_doi(raw)
                                found = (Found(std, "DOI", "document_text",
                                               "True") if std else None)
                            else:
                                if ARXIV2007.match(raw):
                                    rw = rewrite_arxiv(raw, "arxiv ID", True,
                                                       "document_text", cfg)
                                    found = DEGRADED if rw is None else Found(
                                        rw[0], rw[1], rw[3],
                                        "True" if rw[2] is True else str(rw[2]))
                                else:
                                    found = None
                            if found is None:
                                # first hit invalid → the exact loop must try
                                # the SECOND hit of this same version
                                slow[row] = True
                            else:
                                identifier[row] = found.identifier
                                id_type[row] = found.id_type
                                method[row] = found.method
                                vinfo[row] = found.validation_info
                        keep = ~hit
                        positions = positions[keep]
                        texts_sub = texts_sub.filter(pa.array(keep))
                # rows surviving the whole chain have no hit in any grammar:
                # they keep the exhausted defaults (already initialized)

        idxs = np.nonzero(slow)[0]
        if len(idxs):
            take = pa.array(idxs)
            urls = batch["url"].take(take).to_pylist()
            if cfg.reader == "segmented":
                texts = batch["segments"].take(take).to_pylist()
            elif "text" in batch.column_names:
                texts = batch["text"].take(take).to_pylist()
            else:
                texts = [None] * len(idxs)
            if has_meta:
                mks = batch["meta_keys"].take(take).to_pylist()
                mvs = batch["meta_vals"].take(take).to_pylist()
            else:
                mks = mvs = [[]] * len(idxs)
            for j, i in enumerate(idxs):
                try:
                    found = identify_row(urls[j], texts[j], mks[j] or [],
                                         mvs[j] or [], cfg)
                except Exception:
                    # per-row failure parity (reference main.py:132-142): an
                    # exception anywhere in one file's cascade is swallowed
                    # and that row alone degrades to the all-null shape —
                    # e.g. a null url reaching the filename method
                    found = DEGRADED
                identifier[i] = found.identifier
                id_type[i] = found.id_type
                method[i] = found.method
                vinfo[i] = found.validation_info

        out = batch
        for name, col in zip(OUTPUT_FIELDS, (identifier, id_type, method, vinfo)):
            out = out.append_column(name, pa.array(col, type=pa.string()))
        return out

    return extract
