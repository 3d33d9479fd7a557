"""Arrow schemas + deterministic synthetic pages generator (FIXTURES.md §B1).

The pages table matches BASELINE.json `input_hint` exactly:
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string).

Generation is counter-based and shard-deterministic: page rows are produced
in fixed-size shards of ``GEN_SHARD_ROWS`` pages, each shard seeded with
``Philox(key=[seed, shard_idx])`` — so the table content depends only on
(n_pages, seed), never on parallelism or shard processing order. The true
link graph is known at generation time (``true_links``), giving a ground
truth for the extract -> edge-table stages.

Skew knobs (exercise the super-node paths the north rule demands):
- site ids are Zipf(1.1)-distributed  -> a few huge sites;
- link targets are drawn as floor(n * u**3) -> page 0 & friends get huge
  in-degree;
- every 1009th page is a "hub" with ~40x the normal out-degree;
- ~5% of pages have zero out-links (dangling, exercises PageRank's
  dangling-mass redistribution, cf. reference
  analytical_engine/apps/pagerank/pagerank_networkx.h:82-85).
"""

from __future__ import annotations

import datetime

import numpy as np
import pyarrow as pa

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("s")),
        ("html", pa.large_binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

TEXT_SCHEMA = pa.schema(
    [("url", pa.string()), ("text", pa.string()), ("lang", pa.string())]
)

EDGES_SCHEMA = pa.schema([("src_id", pa.int64()), ("dst_id", pa.int64())])

GEN_SHARD_ROWS = 8192
_EPOCH = datetime.datetime(2024, 10, 8, 0, 0, 0)

_VOCAB = (
    "web graph page link rank crawl index site node edge shard batch "
    "arrow stream data vertex label round message partition hash text"
).split()


def _n_sites(n_pages: int) -> int:
    return max(4, n_pages // 50)


def _site_of(rng: np.random.Generator, n_sites: int) -> int:
    return int((rng.zipf(1.1) - 1) % n_sites)


def page_url(site: int, idx: int) -> str:
    return f"https://site{site}.example/p{idx}"


def _page_plan(rng: np.random.Generator, i: int, n_pages: int, n_sites: int):
    """Deterministic per-page plan: (site, lang, targets, forms, junk).

    ``targets`` are global page indices; ``forms`` picks the href rendering
    (0 absolute, 1 relative-if-same-site, 2 #fragment suffix, 3
    uppercase-host). Consumes a fixed draw pattern from ``rng``.
    """
    site = _site_of(rng, n_sites)
    lang = "zh" if i % 97 == 0 else "en"
    if rng.random() < 0.05:
        out_deg = 0  # dangling page
    else:
        # web-realistic density: mean ~17 links/page, pareto tail to 200
        out_deg = min(200, 4 + int(rng.pareto(1.3) * 4))
    if i % 1009 == 0:
        out_deg = min(n_pages - 1, out_deg * 40)
    u = rng.random(out_deg)
    targets = np.minimum((n_pages * u**3).astype(np.int64), n_pages - 1)
    forms = rng.integers(0, 4, size=out_deg)
    junk = rng.random() < 0.15
    n_paras = int(rng.integers(1, 4))
    words = rng.integers(0, len(_VOCAB), size=n_paras * 8)
    return site, lang, targets, forms, junk, n_paras, words


def _target_site(i: int, n_pages: int, n_sites: int, seed: int) -> int:
    """Site of global page i, recomputed without generating the page.

    The site is the FIRST rng draw in ``_page_plan``, so replaying just
    that draw from the page's own per-row stream reproduces it. To keep
    this cheap we give every page its own Philox substream keyed by
    (seed, shard, row) for the site draw only.
    """
    rng = np.random.Generator(np.random.Philox(key=[seed, i]))
    return _site_of(rng, n_sites)


class PageGen:
    """Deterministic generator for one fixed-size shard of the pages table."""

    def __init__(self, n_pages: int, seed: int = 42):
        self.n_pages = n_pages
        self.seed = seed
        self.n_sites = _n_sites(n_pages)
        self._site_cache: dict[int, int] = {}

    def site_of(self, i: int) -> int:
        s = self._site_cache.get(i)
        if s is None:
            s = _target_site(i, self.n_pages, self.n_sites, self.seed)
            self._site_cache[i] = s
        return s

    def url_of(self, i: int) -> str:
        return page_url(self.site_of(i), i)

    def true_links(self, i: int) -> list[str]:
        """Canonical (normalized) out-link urls of page i, dups preserved."""
        rng = np.random.Generator(np.random.Philox(key=[self.seed, i]))
        _, _, targets, _, _, _, _ = _page_plan(rng, i, self.n_pages, self.n_sites)
        return [self.url_of(int(j)) for j in targets]

    def _render(self, i: int) -> tuple[str, str, bytes, str]:
        rng = np.random.Generator(np.random.Philox(key=[self.seed, i]))
        site, lang, targets, forms, junk, n_paras, words = _page_plan(
            rng, i, self.n_pages, self.n_sites
        )
        self._site_cache[i] = site
        url = page_url(site, i)
        title = f"Page {i} of site{site}"
        paras = [
            " ".join(_VOCAB[w] for w in words[k * 8 : (k + 1) * 8]) for k in range(n_paras)
        ]
        html = [
            f"<html><head><title>{title}</title>",
            "<style>p { margin: 0; }</style></head>",
            f"<body>\n<h1>{title} &amp; links</h1>\n",
        ]
        text_parts = [title, title, "& links"]
        for k, p in enumerate(paras):
            html.append(f"<p>{p}</p>\n")
            text_parts.append(p)
        for t, f in zip(targets, forms):
            t = int(t)
            tsite = self.site_of(t)
            canon = page_url(tsite, t)
            if f == 1 and tsite == site:
                href = f"/p{t}"
            elif f == 2:
                href = canon + "#frag"
            elif f == 3:
                href = f"HTTPS://SITE{tsite}.EXAMPLE/p{t}"
            else:
                href = canon
            anchor = f"to {t}"
            html.append(f'<a href="{href}">{anchor}</a>\n')
            text_parts.append(anchor)
        if junk:
            html.append('<a href="mailto:x@example.com">mail</a>\n')
            html.append('<a href="javascript:void(0)">js</a>\n')
            text_parts.append("mail")
            text_parts.append("js")
        html.append("<script>var x = 1 < 2;</script></body></html>")
        text = " ".join(" ".join(text_parts).split())
        return url, lang, "".join(html).encode("utf-8"), text

    def shard_table(self, shard_idx: int) -> pa.Table:
        lo = shard_idx * GEN_SHARD_ROWS
        hi = min(lo + GEN_SHARD_ROWS, self.n_pages)
        urls, tss, htmls, texts, langs = [], [], [], [], []
        for i in range(lo, hi):
            url, lang, html, text = self._render(i)
            urls.append(url)
            tss.append(_EPOCH + datetime.timedelta(seconds=i))
            htmls.append(html)
            texts.append(text)
            langs.append(lang)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("s")),
                "html": pa.array(htmls, pa.large_binary()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
            },
            schema=PAGES_SCHEMA,
        )

    def num_shards(self) -> int:
        return (self.n_pages + GEN_SHARD_ROWS - 1) // GEN_SHARD_ROWS

    def table(self) -> pa.Table:
        """Whole table in memory — for small test scales only."""
        return pa.concat_tables(self.shard_table(s) for s in range(self.num_shards()))

    def true_edge_pairs(self) -> set[tuple[str, str]]:
        """Ground-truth deduplicated, self-loop-free (src_url, dst_url) set."""
        pairs = set()
        for i in range(self.n_pages):
            src = self.url_of(i)
            for dst in self.true_links(i):
                if dst != src:
                    pairs.add((src, dst))
        return pairs
