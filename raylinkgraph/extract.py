"""Pinned reference extractor: html bytes -> (text, links).

The reference repo (acezen/GraphScope) contains no HTML/WARC extractor
(see SURVEY.md "Critical negative finding"); per FIXTURES.md §B2 this
module IS the reference extractor. It is a pure, deterministic, stdlib-only
function; the correctness invariant for the distributed pipeline is that
the actor-pool `map_batches` path produces byte-identical `text` per `url`
at any parallelism, compared against this function run single-threaded.

Spec (FIXTURES.md §B2, frozen):
- ``text``: concatenation of character data outside <script>/<style>,
  entity-decoded, whitespace-normalized (runs of whitespace -> single
  space, stripped), unicode-NFC, decoded from utf-8 with errors="replace".
- ``links``: every <a href> resolved against the page url
  (urllib.parse.urljoin), then normalized (lowercase scheme+host, strip
  fragment, drop non-http(s)); duplicates preserved (dedup happens in the
  edge-table stage).
"""

from __future__ import annotations

import re
import unicodedata
from html.parser import HTMLParser
from urllib.parse import urljoin, urlsplit, urlunsplit

_WS_RE = re.compile(r"\s+")

# Tags whose character data is never visible text.
_SKIP_TAGS = frozenset({"script", "style"})


class _Extractor(HTMLParser):
    """Single-pass visible-text + <a href> collector.

    ``convert_charrefs=True`` (the default) makes HTMLParser decode
    entities into the character data stream, which implements the
    "entity-decoded" clause of the spec.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self.hrefs: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag == "a":
            for name, value in attrs:
                if name == "href" and value is not None:
                    self.hrefs.append(value)
                    break

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0:
            self.chunks.append(data)


def normalize_url(url: str) -> str | None:
    """Canonicalize a resolved URL; return None if it must be dropped.

    Lowercase scheme and host, strip the fragment, drop anything that is
    not http(s). Path, query, and port are preserved verbatim.
    """
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    netloc = parts.netloc.lower()
    return urlunsplit((scheme, netloc, parts.path, parts.query, ""))


def extract(html: bytes, base_url: str = "") -> tuple[str, list[str]]:
    """Pure reference extraction: html bytes -> (visible text, out-links).

    Deterministic; no network, locale, or time dependence.
    """
    raw = html.decode("utf-8", errors="replace")
    parser = _Extractor()
    parser.feed(raw)
    parser.close()
    text = _WS_RE.sub(" ", "".join(parser.chunks)).strip()
    text = unicodedata.normalize("NFC", text)
    links: list[str] = []
    for href in parser.hrefs:
        try:
            resolved = urljoin(base_url, href)
        except ValueError:
            continue
        norm = normalize_url(resolved)
        if norm is not None:
            links.append(norm)
    return text, links


def extract_text(html: bytes) -> str:
    """Text-only variant (used by the text_table stage)."""
    return extract(html)[0]


# ---------------------------------------------------------------------------
# Gated fast path
# ---------------------------------------------------------------------------
# html.parser.HTMLParser is a per-character Python state machine and is
# the measured wall-clock floor of the build pipeline (~337 us/page).
# For the overwhelmingly common simple-HTML shape, the same spec can be
# computed with C-speed regex passes ~5x faster. The fast path is GATED:
# any construct whose HTMLParser semantics the regex pipeline does not
# replicate exactly (comments, CDATA, processing instructions, uppercase
# tags, numeric charrefs, non-template <a> forms, stray angle brackets,
# whitespace in hrefs, unusual relative URL forms) returns None and the
# caller falls back to the pinned parser for that page. The invariant is
# therefore preserved BY CONSTRUCTION (never "close enough": either
# provably-identical constructs or the pinned parser), and additionally
# asserted byte-for-byte over generated corpora + adversarial fallback
# cases in tests/test_extract_fast.py.

_UNSAFE_RE = re.compile(r"<!--|<!\[|<\?|<[A-Z/]?[A-Z]|&#")
_SS_RE = re.compile(r"<(script|style)\b[^>]*>.*?</\1>", re.S)
# strict form only: anything a stray "<"/">" leaves behind trips the
# post-strip punt check below (HTMLParser treats "< 2" as text data)
_TAG_RE = re.compile(r"</?[a-z][^<>]*>")
_A_RE = re.compile(r'<a href="([^"<>]*)">')
_ABS_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^#]*)")
_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*):")


def extract_fast(html: bytes, base_url: str = "") -> tuple[str, list[str]] | None:
    """Spec-identical extraction for gated simple HTML; None = punt."""
    import html as _htmlmod

    raw = html.decode("utf-8", errors="replace")
    if _UNSAFE_RE.search(raw):
        return None
    if raw.count("<a ") + raw.count("<a>") != len(_A_RE.findall(raw)):
        return None
    body = _SS_RE.sub("", raw)
    if "<script" in body or "<style" in body:
        return None  # nested/unbalanced script-style: let HTMLParser decide
    hrefs = _A_RE.findall(body)
    txt = _TAG_RE.sub("", body)
    if "<" in txt or ">" in txt:
        return None  # stray angle brackets: HTMLParser data-mode subtleties
    txt = _WS_RE.sub(" ", _htmlmod.unescape(txt)).strip()
    txt = unicodedata.normalize("NFC", txt)
    m = _ABS_RE.match(base_url)
    base_root = (m.group(1).lower() + "://" + m.group(2).lower()) if m else None
    links: list[str] = []
    for href in hrefs:
        if "&" in href:
            href = _htmlmod.unescape(href)
        if any(c in href for c in " \t\n\r\\"):
            return None
        am = _ABS_RE.match(href)
        if am:
            scheme = am.group(1).lower()
            if scheme in ("http", "https"):
                links.append(scheme + "://" + am.group(2).lower() + am.group(3))
            continue
        sm = _SCHEME_RE.match(href)
        if sm:
            if sm.group(1).lower() in ("http", "https"):
                return None  # "http:foo" scheme-no-authority oddity
            continue  # mailto:/javascript:/... -> dropped, same as pinned
        if href.startswith("/") and not href.startswith("//") and base_root:
            links.append(base_root + href.split("#", 1)[0])
        else:
            return None  # ./ ../ ?q #f //host etc: urljoin territory
    return txt, links


def extract_auto(html: bytes, base_url: str = "") -> tuple[str, list[str]]:
    """Fast path when gated-safe, pinned parser otherwise — always
    byte-identical to extract()."""
    fast = extract_fast(html, base_url)
    return fast if fast is not None else extract(html, base_url)


class _AnchorExtractor(HTMLParser):
    """(href, anchor-text) collector for anchor-signal pipelines.

    Separate from the pinned ``_Extractor`` so the byte-parity text
    invariant stays frozen: this parser records the visible character
    data INSIDE each <a href=...> element (nested tags included,
    entity-decoded), paired with the raw href. Nested anchors are not
    valid HTML; an <a> opening inside an open <a> closes the previous
    one (the html5 parse behavior)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.pairs: list[tuple[str, str]] = []
        self._href: str | None = None
        self._buf: list[str] = []

    def _flush(self) -> None:
        if self._href is not None:
            self.pairs.append((self._href, "".join(self._buf)))
        self._href, self._buf = None, []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "a":
            self._flush()
            for name, value in attrs:
                if name == "href" and value is not None:
                    self._href = value
                    break

    def handle_endtag(self, tag: str) -> None:
        if tag == "a":
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._href is not None:
            self._buf.append(data)


def extract_anchors(html: bytes, base_url: str = "") -> list[tuple[str, str]]:
    """html bytes -> [(normalized dst url, whitespace-normalized anchor
    text)], same URL canonicalization + drop rules as extract()."""
    parser = _AnchorExtractor()
    parser.feed(html.decode("utf-8", errors="replace"))
    parser.close()
    parser._flush()
    out: list[tuple[str, str]] = []
    for href, anchor in parser.pairs:
        try:
            resolved = urljoin(base_url, href)
        except ValueError:
            continue
        norm = normalize_url(resolved)
        if norm is None:
            continue
        a = _WS_RE.sub(" ", anchor).strip()
        out.append((norm, unicodedata.normalize("NFC", a)))
    return out


class _TitleExtractor(HTMLParser):
    """Collects the FIRST <title> element's text (entity-decoded by
    HTMLParser with convert_charrefs, the same machinery as the pinned
    text extractor)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.in_title = False
        self.done = False
        self.parts: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "title" and not self.done:
            self.in_title = True

    def handle_endtag(self, tag):
        if tag == "title" and self.in_title:
            self.in_title = False
            self.done = True

    def handle_data(self, data):
        if self.in_title:
            self.parts.append(data)


def extract_title(html: bytes) -> str:
    """html bytes -> whitespace-normalized text of the first <title>
    ('' when absent) — the page-metadata companion of extract() /
    extract_anchors() (reference pipelines surface title as a vertex
    property of the page table)."""
    p = _TitleExtractor()
    p.feed(html.decode("utf-8", errors="replace"))
    p.close()
    t = _WS_RE.sub(" ", "".join(p.parts)).strip()
    return unicodedata.normalize("NFC", t)
