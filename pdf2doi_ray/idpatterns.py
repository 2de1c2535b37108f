"""Identifier pattern spec: DOI / arXiv regexes, normalization, offline validation.

This module is the single source of truth for *what counts as an identifier*.
The regular-expression strings are the conformance spec taken from the
reference engine (``/root/reference/pdf2doi/patterns.py:14-69``; the DOI
grammar itself originates from crossref's published matching notes) — the
byte-level behavior of these patterns IS the correctness contract, so the
pattern strings are reproduced verbatim.  Everything around them (compilation
strategy, normalization implementation, the offline validator) is new code
designed for vectorized batch execution:

* every pattern is compiled exactly once at import time (one compile per Ray
  worker process — nothing recompiles per batch or per row);
* ``PREFILTER`` is a conservative superset pattern used by the batch stages to
  drop, via a single vectorized ``pyarrow.compute`` kernel, the (at web scale,
  overwhelming) majority of rows that cannot possibly contain an identifier.
  Every one of the 5 DOI regexes requires the literal shape ``10.\\d{4}`` and
  every arXiv regex requires ``\\d{4}.\\d``, so a row matching neither can
  never produce a hit in the exact cascade (proved in tests).
"""

from __future__ import annotations

import re

# --------------------------------------------------------------------------
# Normalization grammar (reference: patterns.py:14-24).  Verbose+multiline
# named-group pattern; ``standardise_doi`` reassembles the canonical
# ``10.<registrant>/<suffix>`` form from the *last* match in the string.
# --------------------------------------------------------------------------
_DOI_CANONICAL_SRC = r"""(?xm)
  (?P<marker>   doi[:\/\s]{0,3})?
  (?P<prefix>
    (?P<namespace> 10)
    [.]
    (?P<registrant> \d{2,9})
  )
  (?P<sep>     [:\-\/\s\]])
  (?P<suffix>  [\-._;()\/:a-z0-9]+[a-z0-9])
  (?P<trailing> ([\s\n\"<.]|$))
"""
_DOI_CANONICAL = re.compile(_DOI_CANONICAL_SRC)

# --------------------------------------------------------------------------
# Search grammars, strict → loose.  Order is part of the contract: the
# cascade tries version 0 first and short-circuits on the first hit that
# survives validation (reference: patterns.py:45-54 and finders.py:329-339).
# --------------------------------------------------------------------------
DOI_REGEXP: list[str] = [
    # v0: explicit "doi" marker (with optional separators) before the DOI.
    r'doi[\s\.\:]{0,2}(10\.\d{4}[\d\:\.\-\/a-z]+)(?:[\s\n\"<]|$)',
    # v1: bare DOI terminated by whitespace / quote / '<' / end-of-string.
    r'(10\.\d{4}[\d\:\.\-\/a-z]+)(?:[\s\n\"<]|$)',
    # v2: DOI ending in digits, tolerating letters right after it.
    r'(10\.\d{4}[\:\.\-\/a-z]+[\:\.\-\d]+)(?:[\s\na-z\"<]|$)',
    # v3: DOI embedded in a resolver URL (https://doi.org/<doi> and friends).
    r'https?://[ -~]*doi[ -~]*/(10\.\d{4,9}/[-._;()/:a-z0-9]+)(?:[\s\n\"<]|$)',
    # v4: the whole string is exactly a DOI (metadata-field shape).
    r'^(10\.\d{4,9}/[-._;()/:a-z0-9]+)$',
]

ARXIV_REGEXP: list[str] = [
    # v0: "arXiv:YYMM.number(vN)" marker form (post-2007 scheme).
    r'arxiv[\s]*\:[\s]*(\d{4}\.\d+)(?:v\d+)?(?:[\s\n\"<]|$)',
    # v1: bare ID immediately followed by ".pdf" (filename shape).
    r'(\d{4}\.\d+)(?:v\d+)?(?:\.pdf)',
    # v2: the whole string is exactly an arXiv ID.
    r'^(\d{4}\.\d+)(?:v\d+)?$',
]

# Post-2007 arXiv ID shape, used by the offline validator (patterns.py:41).
ARXIV2007_SRC = r'^(\d{4}\.\d+)(?:v\d+)?$'

# Compiled once per worker process; the cascade loops index into these.
DOI_SEARCH = [re.compile(p, re.I) for p in DOI_REGEXP]
ARXIV_SEARCH = [re.compile(p, re.I) for p in ARXIV_REGEXP]
ARXIV2007 = re.compile(ARXIV2007_SRC, re.I)

# Conservative vectorized prefilter (see module docstring).  Applied with
# pyarrow.compute.match_substring_regex (RE2) over whole batch columns.
# NB: Python's \d (used by the exact cascade, like the reference) matches
# ANY Unicode decimal digit, while RE2's \d is ASCII-only — the RE2 pattern
# therefore uses [0-9\p{Nd}] so e.g. Arabic-Indic digits still pass the
# prefilter and reach the exact cascade.
_D_RE2 = r"[0-9\p{Nd}]"
PREFILTER_SRC = rf"10\.{_D_RE2}{{4}}|{_D_RE2}{{4}}\.{_D_RE2}"
#: Python-side equivalent (used in tests / pure-Python callers)
PREFILTER = re.compile(r"10\.\d{4}|\d{4}\.\d")


def standardise_doi(candidate: str) -> str | None:
    """Normalize a raw DOI-like string to canonical ``10.<registrant>/<suffix>``.

    Lowercases, drops any ``doi:`` marker, rewrites the separator to ``/`` and
    strips trailing junk.  When the string contains several grammar matches,
    the LAST one wins (reference semantics: the ``dict.update`` loop at
    patterns.py:30-37 — each match fully overwrites registrant+suffix, so
    keeping the final match object is equivalent).  Returns ``None`` when no
    match exists.
    """
    last = None
    for m in _DOI_CANONICAL.finditer(candidate.lower()):
        last = m
    if last is None:
        return None
    return f"10.{last.group('registrant')}/{last.group('suffix')}"


def doi_hits(text: str, version: int) -> list[str]:
    """All capture-group hits of DOI grammar ``version`` in ``text``.

    Case-insensitive ``findall`` over the raw (non-lowercased) text —
    normalization happens later in :func:`standardise_doi`
    (reference: finders.py:214-238).
    """
    try:
        return DOI_SEARCH[version].findall(text)
    except Exception:
        return []


def arxiv_hits(text: str, version: int) -> list[str]:
    """All capture-group hits of arXiv grammar ``version`` in ``text``
    (reference: finders.py:189-212)."""
    try:
        return ARXIV_SEARCH[version].findall(text)
    except Exception:
        return []


def validate_offline(identifier: str | None, kind: str = "doi"):
    """Pure, network-free validation predicate (reference: finders.py:97-186
    with ``webvalidation=False``).

    * DOI: valid iff :func:`standardise_doi` yields a canonical form.
    * arXiv: valid iff the ID matches the post-2007 shape.

    Returns ``True`` / ``False`` (and ``None`` for empty input), mirroring the
    reference's offline return values so downstream logic — including the
    arXiv→DOI rewrite degradation quirk — behaves identically.
    """
    if not identifier:
        return None
    if kind == "doi":
        return True if standardise_doi(identifier) else False
    if kind == "arxiv":
        return True if ARXIV2007.match(identifier) else False
    return False
