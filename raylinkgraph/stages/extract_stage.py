"""Distributed HTML extraction: a stateful actor-pool `map_batches` stage.

The per-row invariant (BASELINE.json `input_hint`): for every url the
distributed output `text` is byte-identical to the single-process pinned
extractor (raylinkgraph.extract.extract) on the same html bytes, at any
parallelism.

The stage is a callable CLASS so it runs as a Ray actor pool: parser
machinery is constructed once per actor in ``__init__`` (amortized across
batches), work happens per batch in ``__call__``. The wide ``html`` binary
column is dropped on output — it must never travel past this stage
(SURVEY.md §7 known-hard #6).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from raylinkgraph.extract import extract_auto


class ExtractPages:
    """pages(url, html, lang) -> (url, text, lang, links:list<string>)."""

    def __init__(self) -> None:
        # Gated fast-path extractor with pinned-parser fallback (always
        # byte-identical to raylinkgraph.extract.extract); kept as an
        # attribute so future model-backed extractors slot in here
        # without changing the pipeline shape.
        self._extract = extract_auto

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        texts: list[str] = []
        links: list[list[str]] = []
        for url, html in zip(urls, htmls):
            t, ls = self._extract(html, url)
            texts.append(t)
            links.append(ls)
        cols = {
            "url": batch.column("url"),
            "text": pa.array(texts, pa.string()),
            "links": pa.array(links, pa.large_list(pa.string())),
        }
        if "lang" in batch.column_names:
            cols["lang"] = batch.column("lang")
        return pa.table(cols)


def extract_pages(
    pages: rd.Dataset,
    *,
    concurrency: int | tuple[int, int] = (1, 4),
    batch_size: int = 256,
) -> rd.Dataset:
    """Run the extraction actor pool over a pages Dataset.

    ``batch_size`` is small because html payloads are wide; tune so
    batch_size x concurrency of raw html fits comfortably in worker heaps.
    """
    return pages.map_batches(
        ExtractPages,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def text_table(extracted: rd.Dataset) -> rd.Dataset:
    """(url, text, lang) view — the text_table of FIXTURES.md §B3."""
    return extracted.select_columns(["url", "text", "lang"])


def link_pairs(extracted: rd.Dataset) -> rd.Dataset:
    """Explode links -> (src_url, dst_url) rows, self-loops dropped.

    Vectorized: uses the Arrow list layout (parent indices + flattened
    values), no per-row Python loop.
    """

    def explode(batch: pa.Table) -> pa.Table:
        links = batch.column("links")
        if isinstance(links, pa.ChunkedArray):
            links = links.combine_chunks()
        flat = links.flatten()
        parents = pa.compute.list_parent_indices(links)
        src = batch.column("url").take(parents)
        out = pa.table({"src_url": src, "dst_url": flat})
        return out.filter(pa.compute.not_equal(out["src_url"], out["dst_url"]))

    return extracted.select_columns(["url", "links"]).map_batches(
        explode, batch_format="pyarrow"
    )


class ExtractAnchorPairs:
    """pages(url, html) -> (src_url, dst_url, anchor) rows — the anchor
    text signal (how web search attributes off-page text to a target
    document). Actor-pool stage: parser state per actor, html dropped on
    output. Self-links dropped to mirror link_pairs."""

    def __init__(self) -> None:
        from raylinkgraph.extract import extract_anchors

        self._extract = extract_anchors

    def __call__(self, batch: pa.Table) -> pa.Table:
        srcs: list[str] = []
        dsts: list[str] = []
        anchors: list[str] = []
        for url, html in zip(
            batch.column("url").to_pylist(), batch.column("html").to_pylist()
        ):
            for dst, anchor in self._extract(html, url):
                if dst != url:
                    srcs.append(url)
                    dsts.append(dst)
                    anchors.append(anchor)
        return pa.table(
            {
                "src_url": pa.array(srcs, pa.string()),
                "dst_url": pa.array(dsts, pa.string()),
                "anchor": pa.array(anchors, pa.string()),
            }
        )


def anchor_text_counts(
    pages: rd.Dataset,
    *,
    concurrency: int | tuple[int, int] = (1, 4),
    batch_size: int = 256,
    buckets: int = 32,
) -> rd.Dataset:
    """(dst_url, anchor, n): how often each exact anchor string points at
    each target url across the corpus. Per-batch pre-combine, then ONE
    hash(dst_url)-bucketed fold — anchors travel with their rows, nothing
    is broadcast (the at-scale anchor-signal aggregation)."""
    import numpy as np
    import pandas as pd

    pairs = pages.select_columns(["url", "html"]).map_batches(
        ExtractAnchorPairs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )

    def precombine(b: pd.DataFrame) -> pd.DataFrame:
        out = (
            b.groupby(["dst_url", "anchor"], sort=True)
            .size()
            .reset_index(name="n")
        )
        out["__p"] = (
            pd.util.hash_pandas_object(out["dst_url"], index=False).to_numpy(
                np.uint64
            )
            % np.uint64(buckets)
        ).astype(np.int32)
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby(["dst_url", "anchor"], sort=True)["n"].sum().reset_index()
        )
        out["n"] = out["n"].astype(np.int64)
        return out

    return (
        pairs.map_batches(precombine, batch_format="pandas")
        .groupby("__p")
        .map_groups(fold, batch_format="pandas")
    )


class ExtractTitles:
    """pages(url, html) -> (url, title): page-metadata extraction
    (reference pipelines carry title as a vertex property of the page
    table). Actor-pool stage, html dropped on output."""

    def __init__(self) -> None:
        from raylinkgraph.extract import extract_title

        self._title = extract_title

    def __call__(self, batch: pa.Table) -> pa.Table:
        titles = [
            self._title(html) for html in batch.column("html").to_pylist()
        ]
        return pa.table(
            {
                "url": batch.column("url"),
                "title": pa.array(titles, pa.string()),
            }
        )


def page_titles(
    pages: rd.Dataset,
    *,
    concurrency: int | tuple[int, int] = (1, 4),
    batch_size: int = 256,
) -> rd.Dataset:
    """(url, title) metadata table from the pages parquet."""
    return pages.select_columns(["url", "html"]).map_batches(
        ExtractTitles,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
