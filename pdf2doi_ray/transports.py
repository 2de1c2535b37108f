"""Production transport constructors for the online stages (round 3).

The online stages (:mod:`pdf2doi_ray.stages.web`,
:mod:`pdf2doi_ray.stages.google`) are transport-INJECTED: tests pass fakes,
production passes real callables.  This module is the production side — the
flag→constructor wiring that turns ``EngineConfig.webvalidation`` /
``EngineConfig.websearch`` (the reference's ``-nwv`` / ``-nws`` inverses,
``/root/reference/pdf2doi/main.py:278-292``) into constructed transports and
pipeline splices.

This sandbox has no network, so the constructors import their HTTP
libraries lazily and raise a clear error when the library (or the network)
is absent; the WIRING is fully testable by injecting factory fakes into
:func:`online_splices` (see ``tests/test_round3_fixes.py``).
"""

from __future__ import annotations

from .config import EngineConfig

DEFAULT_TIMEOUT_S = 10.0
#: the reference sends a desktop UA on its dx.doi.org requests
#: (finders.py:43-47); any stable UA works for the engine.
USER_AGENT = "pdf2doi-ray/1.0 (+batch identifier validation)"


def make_requests_fetch(timeout_s: float = DEFAULT_TIMEOUT_S):
    """``fetch(url) -> (status, body)`` over a pooled ``requests.Session``.

    Follows redirects (the WebValidate contract: doi.org answers valid DOIs
    with 30x → publisher page).  5xx/404 statuses are RETURNED, not raised —
    the stage's retry loop owns that policy.  Connection-level errors map to
    status 599 with an empty body so one dead row cannot kill an actor.
    """
    try:
        import requests
    except ImportError as e:                      # pragma: no cover
        raise NotImplementedError(
            "online mode needs the 'requests' package; install it or run "
            "offline (webvalidation=False, websearch=False)") from e
    session = requests.Session()
    session.headers["User-Agent"] = USER_AGENT

    def fetch(url: str) -> tuple[int, str]:
        try:
            r = session.get(url, timeout=timeout_s, allow_redirects=True)
            return r.status_code, r.text
        except requests.RequestException:
            return 599, ""
    return fetch


def make_google_search():
    """``search(query, stop) -> iterable[str]`` over the ``googlesearch``
    package (the library the reference uses, finders.py:266)."""
    try:
        from googlesearch import search as _gs
    except ImportError as e:                      # pragma: no cover
        raise NotImplementedError(
            "websearch mode needs the 'googlesearch-python' package; "
            "install it or run offline (websearch=False)") from e

    def search(query: str, stop: int):
        return _gs(query, stop=stop)
    return search


def online_splices(cfg: EngineConfig,
                   fetch_factory=make_requests_fetch,
                   search_factory=make_google_search):
    """Flag → constructed transports + ordered pipeline splices.

    Returns ``[(name, splice)]`` where each ``splice(ds) -> ds`` attaches
    one online actor-pool stage, in cascade order: ``websearch`` re-attempts
    exhausted rows first (methods 4–5 need the parsed columns still
    attached), then ``webvalidation`` re-validates every identifier.
    Transports are constructed HERE, eagerly, so a missing library fails at
    flag-parse time on the driver — not inside a worker actor mid-run.
    ``fetch_factory`` / ``search_factory`` exist as the test seam.
    """
    from .stages.google import attach_google_search
    from .stages.web import attach_web_validation

    splices: list[tuple[str, object]] = []
    if cfg.websearch:
        search = search_factory()
        fetch = fetch_factory()
        splices.append((
            "websearch",
            lambda ds: attach_google_search(ds, search, fetch, cfg)))
    if cfg.webvalidation:
        vfetch = fetch_factory()
        splices.append((
            "webvalidation",
            lambda ds: attach_web_validation(ds, vfetch)))
    return splices
