"""Main-content extraction from raw HTML payloads (pure kernel, no Ray).

This is the engine's analog of the reference's binary-payload parsers: where
pdf2doi turns PDF bytes into page texts + an info dict + layout-derived titles
(``/root/reference/pdf2doi/finders.py:360-518`` and
``find_title_via_pymupdf.py:8-128``), this module turns an HTML byte payload
into:

* ``text``  — the main content: every text node inside ``<main>`` when the
  document has one, otherwise every visible ``<body>`` text node, always
  excluding script/style payloads and boilerplate containers
  (``nav``/``header``/``footer``/``aside``).  Entity references are decoded.
  The extraction contract is deterministic and byte-stable: for documents
  produced by :mod:`pdf2doi_ray.sources.pages` the recovered text is
  byte-identical to the original (the conformance invariant).
* ``title`` — the ``<title>`` element text (layout-independent title source).
* ``h1``    — the first ``<h1>`` element text (the DOM-heuristic headline,
  analog of the reference's largest-font ``<h1>`` tag heuristic).
* ``meta``  — ordered ``(name, content)`` pairs from ``<meta>`` elements
  (``name`` or ``property`` attribute), the analog of the PDF info dict.

Implementation: a single forward scan over one compiled tag/comment regex —
no per-character Python loop, no external dependencies.  Designed to be held
by a stateful actor-pool stage (:class:`pdf2doi_ray.stages.parse.HtmlParse`)
and run per batch.
"""

from __future__ import annotations

import re
from html import unescape
from typing import NamedTuple

# One pass: comments, CDATA, doctype/PI, or a tag.  DOTALL so comments with
# newlines are consumed whole.
_MARKUP = re.compile(r"<!--.*?-->|<!\[CDATA\[.*?\]\]>|<[^>]*>", re.S)
_TAG_NAME = re.compile(r"</?\s*([a-zA-Z][a-zA-Z0-9-]*)")
_ATTR = re.compile(
    r"""([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))"""
)

#: content of these elements is never text (raw-text elements).
_RAW_TEXT = {"script", "style"}
#: boilerplate containers whose text is stripped from main content.
_BOILERPLATE = {"nav", "header", "footer", "aside"}
#: void elements never push nesting state.
_VOID = {"meta", "br", "hr", "img", "link", "input", "base", "col", "embed",
         "source", "track", "wbr", "area", "param"}


class ParsedPage(NamedTuple):
    text: str
    title: str | None
    h1: str | None
    meta_keys: list[str]
    meta_vals: list[str]
    #: main-content text units in document order — one entry per text node
    #: (tag boundaries split units).  The analog of the reference's per-page
    #: ``texts`` list (finders.py:488-502); ``text`` is their concatenation.
    segments: tuple[str, ...] = ()


def _attrs(tag_src: str) -> dict[str, str]:
    out = {}
    for m in _ATTR.finditer(tag_src):
        out[m.group(1).lower()] = m.group(2) or m.group(3) or m.group(4) or ""
    return out


_BAD_LT = re.compile(r"<(?![a-zA-Z/!])")
_NESTED_LT = re.compile(r"<[^>]*<")
#: any tag NAME containing an uppercase letter — the fast-path guards below
#: are all case-sensitive literals/regexes while the full scanner lowercases
#: tag names, so a mixed-case page (<META ...>, <TITLE>, <NAV>) must take
#: the full scan or the two paths silently diverge.
_UPPER_TAG = re.compile(r"</?[a-zA-Z0-9-]*[A-Z]")
_BOILER_TAG = re.compile(r"</?(?:nav|header|footer|aside)\b")
_META_FAST = re.compile(
    r'<meta\s+(?:name|property)="([^"]*)"\s+content="([^"]*)"\s*/?>')
_META_CHARSET = re.compile(r'<meta\s+charset="[^"]*"\s*/?>')
_TITLE_FAST = re.compile(r"<title>([^<]*)</title>")
_H1_FAST = re.compile(r"<h1>([^<]*)</h1>")


def _parse_page_fast(html: str) -> ParsedPage | None:
    """Common-case fast path.  Returns None (→ full scan) unless the page
    provably matches the simple shape where the fast extraction is
    byte-identical to the full scanner:

    * exactly one ``<main>`` whose content has no markup,
    * no script/style/comment/CDATA anywhere (they could fake tags),
    * metas in double-quoted name-then-content form, title/h1 markup-free.
    """
    if ("<script" in html or "<style" in html or "<!--" in html
            or "<![CDATA[" in html):
        return None
    # tag names are case-insensitive to the full scanner but not to the fast
    # guards — bail on any uppercase letter in a tag name
    if _UPPER_TAG.search(html):
        return None
    # any '<' that doesn't start a tag (stray '<', '<<', '< ') changes how
    # the full scanner tokenizes — bail; also bail on multiple <title>
    # elements (the full scanner concatenates their text)
    # also: a '<' inside a tag region (`<text &<main>`) makes the tokenizer
    # swallow the inner tag — the fast substring finds would disagree
    if _BAD_LT.search(html) or _NESTED_LT.search(html) \
            or html.count("<title") > 1:
        return None
    i = html.find("<main>")
    if i == -1:
        return None
    j = html.find("</main>", i)
    # exactly one <main...> in the whole document, and it is the plain one
    # (an attribute-bearing <main id=...> BEFORE it would be the real main)
    if j == -1 or html.find("<main") != i or html.find("<main", i + 6) != -1:
        return None
    inner = html[i + 6:j]
    if "<" in inner:
        return None
    # <main> inside an unclosed boilerplate container is suppressed by the
    # full scanner — replay its clamped depth walk over the prefix (a bare
    # count is ordering-blind: '</nav><nav>' would balance yet leave the
    # scanner at depth 1 because stray closes clamp at zero)
    boiler_depth = 0
    for m in _BOILER_TAG.finditer(html, 0, i):
        if m.group(0)[1] == "/":
            boiler_depth = max(0, boiler_depth - 1)
        else:
            boiler_depth += 1
    if boiler_depth:
        return None

    # every '<meta' occurrence must be either a full _META_FAST match or a
    # PURE charset meta at exactly that position — anything else (single
    # quotes, reordered attributes, charset+name hybrids) → full scan
    meta_matches = list(_META_FAST.finditer(html))
    accounted = {m.start() for m in meta_matches}
    accounted |= {m.start() for m in _META_CHARSET.finditer(html)}
    pos = html.find("<meta")
    while pos != -1:
        if pos not in accounted:
            return None
        pos = html.find("<meta", pos + 1)
    metas = [(m.group(1), m.group(2)) for m in meta_matches]
    # the match must be the FIRST occurrence of the tag — otherwise a
    # markup-bearing first title/h1 would be silently skipped in favor of a
    # later simple one (the full scanner keeps the first)
    tm = _TITLE_FAST.search(html)
    if (tm.start() if tm else -1) != html.find("<title"):
        return None
    hm = _H1_FAST.search(html)
    if (hm.start() if hm else -1) != html.find("<h1"):
        return None
    if "&" in inner:
        inner = unescape(inner)
    # empty elements collect no text node in the full scanner → None
    title = unescape(tm.group(1)) if tm and tm.group(1) else None
    h1 = unescape(hm.group(1)) if hm and hm.group(1) else None
    segments = (inner,) if inner else ()      # inner is already unescaped
    return ParsedPage(inner, title, h1,
                      [k for k, _ in metas],
                      [unescape(v) for _, v in metas],
                      segments)


def parse_page(payload: bytes | str) -> ParsedPage:
    """Extract main text, title, first h1 and meta pairs from an HTML payload.

    Tolerant by construction: unknown tags are structural no-ops, unclosed
    raw-text elements swallow to end-of-document, attribute junk is ignored.
    Never raises on string input — malformed markup degrades to best-effort
    text, mirroring the reference's per-document try/except degradation
    policy (finders.py:374-387, 465-471).
    """
    html = payload.decode("utf-8", errors="replace") if isinstance(payload, bytes) else payload
    fast = _parse_page_fast(html)
    if fast is not None:
        return fast
    lower = None        # lowercased copy built lazily (only raw-text skipping needs it)

    main_parts: list[str] = []          # text inside <main>
    body_parts: list[str] = []          # visible body text (no-<main> fallback)
    title_parts: list[str] = []
    h1_parts: list[str] = []
    meta_keys: list[str] = []
    meta_vals: list[str] = []

    boiler = 0          # nesting depth of boilerplate containers
    main_depth = 0      # nesting depth of <main>
    saw_main = False
    in_body = False
    saw_body = False
    in_title = False
    in_h1 = False
    h1_done = False

    pos = 0
    n = len(html)
    while pos < n:
        m = _MARKUP.search(html, pos)
        if m is None:
            chunk = html[pos:]
            pos = n
        else:
            chunk = html[pos:m.start()]
            pos = m.end()

        if chunk:
            if in_title:
                title_parts.append(chunk)
            elif in_h1 and not h1_done:
                h1_parts.append(chunk)
            elif boiler == 0:
                if main_depth > 0:
                    main_parts.append(chunk)
                elif in_body:
                    # only explicit body content counts toward the fallback
                    # text (head text like <title> is captured above)
                    body_parts.append(chunk)

        if m is None:
            break
        tag_src = m.group(0)
        if not tag_src.startswith("<") or tag_src.startswith("<!"):
            continue                     # comment / CDATA / doctype
        name_m = _TAG_NAME.match(tag_src)
        if not name_m:
            continue
        name = name_m.group(1).lower()
        closing = tag_src.startswith("</")
        self_closing = tag_src.endswith("/>") or name in _VOID

        if not closing and name in _RAW_TEXT:
            # skip payload up to the matching close tag (or EOF)
            if lower is None:
                lower = html.lower()
            end = lower.find(f"</{name}", pos)
            if end == -1:
                break
            gt = html.find(">", end)
            pos = n if gt == -1 else gt + 1
            continue

        if name == "meta" and not closing:
            a = _attrs(tag_src)
            key = a.get("name") or a.get("property")
            if key is not None:
                meta_keys.append(key)
                meta_vals.append(unescape(a.get("content", "")))
            continue

        if name in _BOILERPLATE:
            if closing:
                boiler = max(0, boiler - 1)
            elif not self_closing:
                boiler += 1
        elif name == "main":
            if closing:
                main_depth = max(0, main_depth - 1)
            elif not self_closing:
                main_depth += 1
                saw_main = True
        elif name == "body":
            if closing:
                in_body = False
            else:
                in_body = True
                saw_body = True
        elif name == "title":
            if closing:
                in_title = False
            elif not self_closing:        # <title/> must not flip state on
                in_title = True
        elif name == "h1":
            if closing:
                if in_h1:
                    h1_done = True
                in_h1 = False
            elif not h1_done and not self_closing:
                in_h1 = True

    parts = main_parts if saw_main else body_parts
    text = "".join(parts)
    title = "".join(title_parts) if title_parts else None
    h1 = "".join(h1_parts) if h1_parts else None
    # segments are unescaped per text node; `text` stays unescape(concat) —
    # for a pathological UNTERMINATED entity at a node boundary (e.g. '&'
    # ending one node, '#123' starting the next) the two can differ, which
    # is why segmented-mode consumers must not derive matches from `text`
    return ParsedPage(unescape(text), _clean(title), _clean(h1),
                      meta_keys, meta_vals,
                      tuple(unescape(p) for p in parts))


def _clean(s: str | None) -> str | None:
    return unescape(s) if s is not None else None


def escape_text(s: str) -> str:
    """Minimal entity escaping used by the page synthesizer — the exact
    inverse of the extraction path for arbitrary text content."""
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


_STYLE_SIZE = re.compile(r"font-size\s*:\s*(\d+(?:\.\d+)?)\s*(?:px|pt)", re.I)


def title_by_font_histogram(html: str) -> str | None:
    """HTML analog of the reference's pymupdf font-size histogram title
    (``find_title_via_pymupdf.py:8-128``): every text node votes with its
    effective inline ``font-size`` (nearest styled ancestor); the most
    frequent size is the paragraph size; the LARGEST size above it is the
    ``<h1>`` tag of the reference's size→tag map, and the first consecutive
    run of text at that size is the title.  Returns None when no styled
    text exists or nothing is larger than the paragraph size — mirroring
    the reference's bare-except fallthrough in ``find_possible_titles``.
    """
    stack: list[float | None] = []          # size pushed per open tag
    spans: list[tuple[float, str]] = []

    def current_size() -> float | None:
        for s in reversed(stack):
            if s is not None:
                return s
        return None

    pos = 0
    for m in _MARKUP.finditer(html):
        chunk = html[pos:m.start()]
        pos = m.end()
        size = current_size()
        if chunk.strip() and size is not None:
            spans.append((size, unescape(chunk).strip()))
        tag = m.group(0)
        if not tag.startswith("<") or tag.startswith("<!"):
            continue
        nm = _TAG_NAME.match(tag)
        if not nm:
            continue
        name = nm.group(1).lower()
        if tag.startswith("</"):
            if stack:
                stack.pop()
            continue
        if tag.endswith("/>") or name in _VOID:
            continue
        sz = None
        style = _attrs(tag).get("style")
        if style:
            sm = _STYLE_SIZE.search(style)
            if sm:
                sz = float(sm.group(1))
        stack.append(sz)
    tail = html[pos:]
    if tail.strip() and current_size() is not None:
        spans.append((current_size(), unescape(tail).strip()))

    if not spans:
        return None
    counts: dict[float, int] = {}
    first_seen: dict[float, int] = {}
    for idx, (s, _) in enumerate(spans):
        counts[s] = counts.get(s, 0) + 1
        first_seen.setdefault(s, idx)
    # paragraph = most frequent size; count ties keep the FIRST-SEEN size,
    # matching the reference's stable count-desc sort over dict insertion
    # order (find_title_via_pymupdf.py:27)
    p_size = max(counts, key=lambda s: (counts[s], -first_seen[s]))
    h1_size = max(counts)
    if h1_size <= p_size:
        return None
    parts: list[str] = []
    for s, t in spans:
        if s == h1_size:
            parts.append(t)
        elif parts:
            break
    title = " ".join(parts).strip()
    return title or None


def candidate_titles(url: str, title, h1, meta_keys, meta_vals,
                     font_title: str | None = None) -> list[str]:
    """Order-preserving deduped title candidates, mirroring the reference's
    ``find_possible_titles`` source order and length gates
    (finders.py:390-443): DOM headline, document title element, 'title'-ish
    metadata values (>12 chars and >3 words), long url basename (>30 chars).
    """
    out: list[str] = []
    if isinstance(h1, str) and len(h1.strip()) > 12:
        out.append(h1.strip())
    # source #2 of the reference (find_title_via_pymupdf): the font-size
    # histogram headline, when the caller computed one from the raw html
    if isinstance(font_title, str) and len(font_title.strip()) > 12:
        out.append(font_title.strip())
    if isinstance(title, str) and len(title.strip()) > 12:
        out.append(title.strip())
    for k, v in zip(meta_keys, meta_vals):
        if "title" in k.lower() and isinstance(v, str) \
                and len(v.strip()) > 12 and len(v.split()) > 3:
            out.append(v.strip())
    base = url.rsplit("/", 1)[-1]
    if len(base.strip()) > 30:
        out.append(base.strip())
    seen: list[str] = []
    for t in out:
        if t not in seen:
            seen.append(t)
    # longest-first: the reference googles the longest candidate first
    # (finders.py:807, stable sort keeps source order on ties)
    seen.sort(key=len, reverse=True)
    return seen
