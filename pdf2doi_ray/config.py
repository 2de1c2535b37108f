"""Engine configuration.

The reference keeps a process-global mutable config singleton persisted to an
INI file (``/root/reference/pdf2doi/config.py:39-91``).  In a distributed
engine global mutable state is a correctness hazard (every Ray worker would
need an identical copy and any mutation would silently diverge), so the
engine uses a frozen dataclass built once on the driver and captured by
value in every stage closure / actor constructor.  Defaults mirror the
reference defaults (config.py:40-49) where they are meaningful offline.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


@dataclass(frozen=True)
class EngineConfig:
    # --- cascade semantics (reference config.py:40-49) -------------------
    #: rewrite a found arXiv ID into a DOI.  Reference default is True; in
    #: offline mode the reference's rewrite crashes on its bool validation
    #: info and degrades the whole row to all-null (finders.py:665-684 +
    #: main.py:140-142) — we reproduce that byte-for-byte when this is True.
    replace_arxiv_by_doi: bool = True
    #: network validation / google-search methods.  Always False here: the
    #: engine targets offline conformance; online validators are pluggable
    #: actor stages a user can enable out-of-band.
    webvalidation: bool = False
    websearch: bool = False
    #: first-N-characters truncation for the (offline-disabled) search method.
    n_characters: int = 1000
    #: metadata keys scanned before all others (reference main.py:156 uses
    #: ['/doi', '/pdf2doi_identifier'] for PDF info dicts; the HTML analogs
    #: are the citation meta tags).
    keys_to_check_first: tuple[str, ...] = ("citation_doi", "pdf2doi_identifier")
    #: metadata keys never scanned — known to hold journal-level (not
    #: article-level) DOIs (reference finders.py:715).
    keys_blocklist: tuple[str, ...] = ("wps-journaldoi",)

    #: ordered offline finder methods to run (the reference's finder_methods
    #: registry, finders.py:867-873, restricted to the offline ones).  A
    #: proper subset mirrors calling find_identifier(file, method=...) with a
    #: single method.
    methods: tuple[str, ...] = ("document_infos", "filename", "document_text")

    #: document_text scanning granularity — the reader_libraries analog
    #: (__init__.py:18-23): "whole" scans the concatenated main text (the
    #: pdfminer-style whole-document reader); "segmented" scans text units
    #: in document order with first-unit-wins (the PyPdf-style per-page
    #: reader, finders.py:488-502 + 294-357).  The two can disagree when an
    #: earlier unit matches only a looser grammar than a later unit.
    reader: str = "whole"

    # --- input handling --------------------------------------------------
    #: parse the html binary column (actor-pool stage) instead of trusting a
    #: pre-extracted ``text`` column.
    use_html: bool = True

    #: "tasks": run the fused parse+extract as stateless tasks — correct when
    #: per-worker setup is cheap (compiled regexes import once per worker
    #: process, giving the same amortization as an actor with none of the
    #: actor-management cost; actor spawn is expensive on this cluster).
    #: "actors": a real actor pool — use when the parser holds heavyweight
    #: state (models, dictionaries) worth pinning in long-lived processes.
    parse_mode: str = "tasks"

    # --- physical execution knobs (per-stage; tuned for multi-MB binary
    # rows on parse, KB rows on extract) ----------------------------------
    #: rows per parse batch.  Sized for ~KB-scale html payloads; drop this
    #: (e.g. to 64) when payloads are multi-MB so batch × concurrency fits
    #: worker heaps.
    parse_batch_size: int = 4096
    parse_concurrency: int | tuple[int, int] | None = None  # None = default pool
    extract_batch_size: int = 4096

    def __post_init__(self) -> None:
        if self.reader not in ("whole", "segmented"):
            raise ValueError(
                f"reader must be 'whole' or 'segmented', got {self.reader!r}")
        if self.parse_mode not in ("tasks", "actors"):
            raise ValueError(
                f"parse_mode must be 'tasks' or 'actors', got {self.parse_mode!r}")

    def with_(self, **kw) -> "EngineConfig":
        return replace(self, **kw)


def from_ini(path: str) -> "EngineConfig":
    """Load overrides from an INI file (driver-side only), with the
    reference's string→bool/int coercion semantics
    (config.py:76-91, 93-106): 'true'/'false' case-insensitive → bool,
    digit strings → int, everything else stays a string."""
    import configparser

    cp = configparser.ConfigParser()
    cp.read(path)
    if "engine" not in cp:
        return EngineConfig()
    kw = {}
    defaults = EngineConfig()
    valid = EngineConfig.__dataclass_fields__
    for key, raw in cp["engine"].items():
        if key not in valid:
            continue
        if key == "parse_concurrency":
            # int, "min,max" int pair, or "none"
            parts = [s.strip() for s in raw.split(",") if s.strip()]
            if not parts or parts[0].lower() == "none":
                kw[key] = None
            elif len(parts) == 1:
                kw[key] = int(parts[0])
            else:
                kw[key] = tuple(int(s) for s in parts)
            continue
        if isinstance(getattr(defaults, key), tuple):
            # string-tuple fields (methods, key lists): comma-separated
            kw[key] = tuple(s.strip() for s in raw.split(",") if s.strip())
            continue
        low = raw.strip().lower()
        if low in ("true", "false"):
            kw[key] = low == "true"
        elif raw.strip().lstrip("-").isdigit():
            kw[key] = int(raw)
        else:
            kw[key] = raw
    return EngineConfig(**kw)


def to_ini(cfg: EngineConfig, path: str) -> None:
    """Persist scalar params to INI (driver-side convenience)."""
    import configparser
    from dataclasses import fields

    cp = configparser.ConfigParser()
    def fmt(v):
        return ",".join(str(x) for x in v) if isinstance(v, tuple) else str(v)

    cp["engine"] = {f.name: fmt(getattr(cfg, f.name)) for f in fields(cfg)
                    if isinstance(getattr(cfg, f.name),
                                  (bool, int, str, tuple))}
    with open(path, "w") as fh:
        cp.write(fh)


DEFAULT_CONFIG = EngineConfig()
#: config variant that keeps arXiv IDs instead of reproducing the reference's
#: offline degrade-to-null rewrite (the reference's ``-no_arxiv2doi`` flag).
NO_ARXIV2DOI_CONFIG = EngineConfig(replace_arxiv_by_doi=False)
