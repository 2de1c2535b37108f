"""Per-row identifier-finding cascade (pure kernels, no Ray).

Reimplements the reference's finder cascade semantics
(``/root/reference/pdf2doi/finders.py:294-357, 627-790`` and
``main.py:105-189``) as pure functions over plain Python values, so the batch
stages in :mod:`pdf2doi_ray.stages.extract` can call them row-wise on the
(small, prefiltered) subset of rows that can possibly contain an identifier.

Priority orders are part of the correctness contract:

* methods: ``document_infos`` > ``filename`` > ``document_text`` (the two
  google methods exist but are disabled offline, exactly like the reference
  with ``websearch=False``);
* within a text: DOI grammar v0→v4 before arXiv v0→v2, first hit that
  survives validation wins, and the *standardised* DOI is returned;
* within the metadata map: priority keys first, then document order, each key
  checked at most once, blocklisted keys never;
* within a filename/url basename: percent-decoded, then every dot-prefix
  variant longest-first.

Offline quirks reproduced on purpose (verified against the reference):

* a filename hit keeps trailing extensions that fit the DOI grammar
  (``10.1063%2F1.2409490.pdf`` → ``10.1063/1.2409490.pdf``);
* with ``replace_arxiv_by_doi=True`` (the reference default) an offline arXiv
  hit degrades the WHOLE row to all-null: the reference calls ``.keys()`` on
  its boolean offline validation info (finders.py:670), the AttributeError
  propagates out of the whole per-file cascade and is swallowed at
  main.py:140-142 leaving ``{'identifier': None}``;
* when every method fails, the reference still stamps the last attempted
  method name, so exhausted rows carry ``method='first_N_characters_google'``
  with a null identifier, while degraded rows carry a null method.
"""

from __future__ import annotations

from itertools import accumulate
from typing import NamedTuple
from urllib.parse import unquote

from .config import EngineConfig
from .idpatterns import (
    ARXIV_REGEXP,
    DOI_REGEXP,
    arxiv_hits,
    doi_hits,
    standardise_doi,
    validate_offline,
)


class Found(NamedTuple):
    identifier: str | None
    id_type: str | None          # 'DOI' | 'arxiv ID' | 'arxiv DOI' | None
    method: str | None
    validation_info: str | None


#: sentinel for the reference's offline arXiv-rewrite crash: the whole row
#: degrades to `{'identifier': None}` with no other keys.
DEGRADED = Found(None, None, None, None)

#: the reference stamps the last attempted method even on total failure
#: (finders.py:688-691 runs for method 5 too; __find_doi returns its dict).
EXHAUSTED_METHOD = "first_N_characters_google"


def search_texts(texts, validate=validate_offline):
    """First valid identifier across ``texts`` (reference finders.py:294-357).

    Scans each text unit in order; within a unit tries every DOI grammar
    version (all ``findall`` hits, in order) and only then every arXiv
    version.  DOI hits are returned in standardised form, arXiv hits raw.
    Returns ``(identifier, kind, validation) `` with kind in
    ``{'DOI', 'arxiv ID'}`` or ``(None, None, None)``.
    """
    if not isinstance(texts, (list, tuple)):
        texts = [texts]
    for text in texts:
        if isinstance(text, bytes):
            text = text.decode()
        # doi_hits/arxiv_hits swallow extractor errors per grammar version
        # (e.g. non-string input), matching the reference's bare excepts.
        for v in range(len(DOI_REGEXP)):
            for hit in doi_hits(text, v):
                verdict = validate(hit, "doi")
                if verdict:
                    return standardise_doi(hit), "DOI", verdict
        for v in range(len(ARXIV_REGEXP)):
            for hit in arxiv_hits(text, v):
                verdict = validate(hit, "arxiv")
                if verdict:
                    return hit, "arxiv ID", verdict
    return None, None, None


def url_basename(url: str) -> str:
    """The path segment after the last '/' — the url analog of the
    reference's ``os.path.basename(file.name)`` (finders.py:747)."""
    return url.rsplit("/", 1)[-1]


def filename_variants(url: str) -> list[str]:
    """Percent-decoded basename plus every dot-prefix variant, longest first
    (reference finders.py:747-753: ``unquote`` then ``accumulate`` on '.')."""
    name = unquote(url_basename(url))
    prefixes = list(accumulate(name.split("."), lambda a, b: f"{a}.{b}"))
    return list(reversed(prefixes))


def search_filename(url: str, validate=validate_offline):
    """Method 'filename' over the url basename (finders.py:735-761)."""
    return search_texts(filename_variants(url), validate)


def search_info(meta_keys, meta_vals, cfg: EngineConfig,
                validate=validate_offline):
    """Method 'document_infos' over a metadata key→value map
    (reference finders.py:694-733).

    ``meta_keys`` / ``meta_vals`` are parallel sequences in document order.
    Duplicate keys collapse dict-style (later value wins) before scanning,
    matching the reference's dict input.  Priority keys are scanned first;
    blocklisted keys (case-insensitive) are never scanned; each key is
    scanned at most once.
    """
    if not meta_keys:
        return None, None, None
    info = dict(zip(meta_keys, meta_vals))
    block = {b.lower() for b in cfg.keys_blocklist}
    for key in list(cfg.keys_to_check_first) + list(info.keys()):
        if key in info and key.lower() not in block:
            identifier, kind, verdict = search_texts(info[key], validate)
            if identifier:
                return identifier, kind, verdict
            del info[key]
    return None, None, None


def rewrite_arxiv(identifier, kind, verdict, method, cfg: EngineConfig):
    """The arXiv→DOI rewrite block (reference finders.py:665-684).

    With an offline (boolean) verdict and ``replace_arxiv_by_doi=True`` the
    reference crashes on ``verdict.keys()`` and the whole row degrades; we
    detect exactly that condition and signal it with ``None``.  With a
    dict verdict (an online validator plugged in) the full rewrite runs.
    Returns ``(identifier, kind, verdict, method)`` or ``None`` for the
    degraded row.
    """
    if not identifier or kind != "arxiv ID" or not cfg.replace_arxiv_by_doi:
        return identifier, kind, verdict, method
    if not hasattr(verdict, "keys"):
        return None                                    # the AttributeError path
    if verdict.get("arxiv_doi"):
        journal_doi = verdict["arxiv_doi"]
        new_verdict = validate_offline(journal_doi, "doi")
        if new_verdict:
            return journal_doi, "DOI", new_verdict, method + " + arxiv2doi"
        return identifier, kind, verdict, method
    return (f"10.48550/arXiv.{identifier}", "arxiv DOI", verdict,
            method + " + arxiv2doi")


def _info_str(verdict) -> str | None:
    if verdict is None:
        return None
    return verdict if isinstance(verdict, str) else str(verdict)


def identify_row(url: str, text: str | None, meta_keys, meta_vals,
                 cfg: EngineConfig, validate=validate_offline) -> Found:
    """Full per-row method cascade (reference main.py:146-189).

    Runs document_infos → filename → document_text with first-hit-wins, the
    arXiv rewrite applied to whichever method hits.  Offline, the google
    methods contribute nothing but the last attempted method name.
    """
    if isinstance(text, (list, tuple)):
        units = list(text)                 # segmented reader: per-unit scan
    else:
        units = [text] if text is not None else []
    attempts = {
        "document_infos": lambda: search_info(meta_keys, meta_vals, cfg, validate),
        "filename": lambda: search_filename(url, validate),
        "document_text": lambda: search_texts(units, validate),
    }
    full_cascade = tuple(cfg.methods) == tuple(attempts)
    for method in cfg.methods:
        identifier, kind, verdict = attempts[method]()
        if identifier:
            rewritten = rewrite_arxiv(identifier, kind, verdict, method, cfg)
            if rewritten is None:
                return DEGRADED
            identifier, kind, verdict, method = rewritten
            return Found(identifier, kind, method, _info_str(verdict))
    # the reference stamps the LAST attempted method on exhausted rows: the
    # full cascade falls through to the (offline no-op) google methods, a
    # single-method call stamps that method (finders.py:688-691)
    last = EXHAUSTED_METHOD if full_cascade else cfg.methods[-1]
    return Found(None, None, last, None)
