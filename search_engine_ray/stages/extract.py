"""Extraction + routing stage (stateless ``map_batches`` over Arrow).

Re-expresses reference M1/M2/M3/M5 (SURVEY.md §2.2): HTML -> normalized text
/ whole text / title, plus URL -> (site, path) normalization and the
document-partition routing key.  Pure functions over the batch; the regexes
and hash parameters live at module scope so stateless Ray tasks pay no
per-batch setup.

Routing: ``part = stable_hash(url) % num_partitions`` — split-stable, so a
resumed run routes every url to the same partition (the checkpoint unit) and
duplicate urls (same page captured at several ``warc_ts``) collide into the
same partition where the segment builder dedups them (reference D1 analogue,
``PageAnalyzer.java:398-447``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import stable_hash_array
from ..functions.html import scan_parts
from ..functions.urls import split_site_path


def assign_part_batch(batch: pa.Table, num_partitions: int) -> pa.Table:
    # Arrow column goes straight into the vectorized hash (zero-copy on the
    # string data buffer); stay in uint64 array land for the modulo
    import numpy as np

    h = stable_hash_array(batch["url"])
    part = (h % np.uint64(num_partitions)).astype("int32")
    return batch.append_column("part", pa.array(part, pa.int32()))


def make_part_filter(keep_parts: set[int] | None):
    """Batch filter dropping rows of already-committed partitions (resume).
    ``None`` keeps everything."""
    if keep_parts is None:
        return lambda batch: batch

    def _filter(batch: pa.Table) -> pa.Table:
        import numpy as np

        part = batch["part"].to_numpy()
        keep = np.isin(part, np.fromiter(keep_parts, dtype=np.int32, count=len(keep_parts)))
        return batch.filter(pa.array(keep))

    return _filter


def extract_links_batch(batch: pa.Table) -> pa.Table:
    """M4 link extractor as a batch stage: html -> ``links: list<string>``
    (same-site absolute or root-relative hrefs, no fragments, distinct,
    reference ``PageAnalyzer.java:437-447``).  Crawl-graph byproduct — the
    batch engine consumes an already-crawled table and does not follow links.
    """
    from ..functions.html import extract_links
    from ..functions.urls import split_site_path

    links_col = []
    for url, raw in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
        html_s = raw.decode("utf-8", errors="replace") if isinstance(raw, (bytes, bytearray)) else (raw or "")
        site, _ = split_site_path(url)
        links_col.append(extract_links(html_s, site) if html_s else [])
    return batch.append_column("links", pa.array(links_col, pa.list_(pa.string())))


def crawl_frontier(pages):
    """Reference D1 frontier dedup as ONE shuffle: distinct normalized
    (site, path) link targets minus pages already in the corpus.

    Union the link targets (tagged ``is_page=0``) with the corpus's own
    normalized paths (``is_page=1``), then a single ``groupby(site, path)``
    aggregate keeps targets never seen as a page — the scalable restatement
    of the reference's ``findBySiteAndPathIn`` DB probe under a lock
    (``PageAnalyzer.java:398-434``): no broadcast set, no driver-side state,
    works at any corpus size.

    Returns a Dataset ``(site, path, n_refs)``.
    """
    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    from ..functions.urls import normalized_path, split_site_path

    def links_rows(batch: pa.Table) -> pa.Table:
        from ..functions.html import extract_links

        sites, paths = [], []
        for url, raw in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
            html_s = raw.decode("utf-8", errors="replace") if isinstance(raw, (bytes, bytearray)) else (raw or "")
            site, _ = split_site_path(url)
            for href in (extract_links(html_s, site) if html_s else []):
                try:
                    p = normalized_path(site, href)
                except ValueError:  # foreign-site / malformed -> dropped
                    continue
                sites.append(site)
                paths.append(p)
        n = len(sites)
        return pa.table({"site": pa.array(sites, pa.string()),
                         "path": pa.array(paths, pa.string()),
                         "is_page": pa.array([0] * n, pa.int8()),
                         "refs": pa.array([1] * n, pa.int64())})

    def page_rows(batch: pa.Table) -> pa.Table:
        sites, paths = [], []
        for url in batch["url"].to_pylist():
            site, path = split_site_path(url)
            sites.append(site)
            paths.append(path)
        n = len(sites)
        return pa.table({"site": pa.array(sites, pa.string()),
                         "path": pa.array(paths, pa.string()),
                         "is_page": pa.array([1] * n, pa.int8()),
                         "refs": pa.array([0] * n, pa.int64())})

    link_side = pages.map_batches(links_rows, batch_format="pyarrow")
    page_side = pages.map_batches(page_rows, batch_format="pyarrow")
    unioned = link_side.union(page_side)
    agg = unioned.groupby(["site", "path"]).aggregate(
        Max("is_page", alias_name="seen"), Sum("refs", alias_name="n_refs"))
    return agg.filter(expr="seen == 0").drop_columns(["seen"])


def extract_batch(batch: pa.Table) -> pa.Table:
    """html -> text, whole_text, title, site, path columns.

    Per-row Python (an HTML parse is irreducibly per-document), but the stage
    itself is an embarrassingly parallel stateless task over Arrow batches —
    throughput scales with cluster CPUs, which is what matters at 100 TB.
    """
    htmls = batch["html"].to_pylist()
    urls = batch["url"].to_pylist()
    texts, wholes, titles, sites, paths = [], [], [], [], []
    for url, raw in zip(urls, htmls):
        html_s = raw.decode("utf-8", errors="replace") if isinstance(raw, (bytes, bytearray)) else (raw or "")
        text, whole, title = scan_parts(html_s) if html_s else ("", "", "")
        site, path = split_site_path(url)
        texts.append(text)
        wholes.append(whole)
        titles.append(title)
        sites.append(site)
        paths.append(path)
    # whitespace-run collapse + strip as ONE Arrow kernel per column (the
    # scalar path's _WS_RUN.sub / .strip, vectorized — same byte output)
    ws = "[ \t\r\n\f\x0b]+"
    ws_chars = " \t\r\n\f\x0b"
    text_arr = pc.utf8_trim(
        pc.replace_substring_regex(pa.array(texts, pa.string()),
                                   pattern=ws, replacement=" "),
        characters=ws_chars)
    title_arr = pc.utf8_trim(
        pc.replace_substring_regex(pa.array(titles, pa.string()),
                                   pattern=ws, replacement=" "),
        characters=ws_chars)
    out = batch.drop_columns(["html"])
    out = out.append_column("text_x", text_arr)
    out = out.append_column("whole_text", pa.array(wholes, pa.string()))
    out = out.append_column("title", title_arr)
    out = out.append_column("site", pa.array(sites, pa.string()))
    out = out.append_column("path", pa.array(paths, pa.string()))
    return out
