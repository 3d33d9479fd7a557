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
