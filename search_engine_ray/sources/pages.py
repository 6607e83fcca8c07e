"""Input sources (reference S1/S6 analogues, SURVEY.md §2.1).

The live Jsoup crawler (``PageAnalyzer.getPageHtml``) is replaced by a
Parquet source of already-crawled Common-Crawl-style pages per the
input_hint; reads prune to exactly the columns a pipeline needs so only
required bytes leave storage.
"""

from __future__ import annotations

import ray.data as rd

PAGE_COLUMNS = ["url", "warc_ts", "html"]


def read_pages(paths, columns: list[str] | None = None, **kwargs) -> rd.Dataset:
    """Pages table with column pruning (default: what the index build needs —
    the golden ``text``/``lang`` columns stay in storage)."""
    return rd.read_parquet(paths, columns=columns or PAGE_COLUMNS, **kwargs)


def read_documents(sf_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    """Driver-generated plain-text documents table (TESTDATA.md)."""
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)
