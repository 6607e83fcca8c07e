"""Statistics pipelines (reference A4, ``StatisticsServiceImpl.java:30-58``).

The reference loads every page and lemma row into RAM to count them
(``:37,41``); here statistics are metadata reads (manifests) plus pruned-
column aggregates.
"""

from __future__ import annotations

import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..state.manifest import done_parts, failed_parts


def index_statistics(index_dir: str) -> dict:
    """Control-plane statistics from per-partition manifests — no data read.

    Shape mirrors the reference's ``/api/statistics`` payload: totals plus a
    per-partition detail list (the reference's per-site detail,
    ``dto/statistics/StatisticsResponse`` family).  Failed partitions
    (reference FAILED status + last_error, ``model/Site.java`` /
    ``PageAnalyzer.java:541-548``) surface from their markers; ``indexing``
    is true while a build's exchange run files exist (the in-progress
    signal a batch build actually has).
    """
    import glob
    import os

    manifests = done_parts(index_dir)
    failed = failed_parts(index_dir)
    detailed = [
        {
            "part": p,
            "pages": m.n_docs,
            "lemmas": m.n_terms,
            "postings": m.n_postings,
            "bytes_postings": m.bytes_postings,
            "wall_sec": m.wall_sec,
            "status": m.status,
        }
        for p, m in sorted(manifests.items())
    ]
    for p, rec in sorted(failed.items()):
        if p not in manifests:
            detailed.append({"part": p, "status": "failed",
                             "last_error": rec.get("last_error", ""),
                             "status_time": rec.get("status_time")})
    return {
        "total": {
            "partitions": len(manifests),
            "pages": sum(m.n_docs for m in manifests.values()),
            "lemmas": sum(m.n_terms for m in manifests.values()),
            "postings": sum(m.n_postings for m in manifests.values()),
            "failed": len([p for p in failed if p not in manifests]),
            "indexing": bool(glob.glob(os.path.join(index_dir, ".runs-*"))),
        },
        "detailed": detailed,
    }


def site_statistics(index_dir: str) -> rd.Dataset:
    """Per-site page and lemma counts from the segment metadata
    (``doc_meta.groupby(site).count`` + ``dict.groupby(site).count``)."""
    import glob

    docs = rd.read_parquet(sorted(glob.glob(f"{index_dir}/part=*/docs.parquet")),
                           columns=["site", "doc_len"])
    pages = docs.groupby("site").aggregate(Count(alias_name="pages"),
                                           Sum("doc_len", alias_name="tokens"))
    dicts = rd.read_parquet(sorted(glob.glob(f"{index_dir}/part=*/dict.parquet")),
                            columns=["site", "term"])
    lemmas = dicts.groupby("site").aggregate(Count(alias_name="lemma_rows"))
    # both sides are per-site tiny aggregates: join on the driver
    p = {r["site"]: r for r in pages.take_all()}
    l = {r["site"]: r for r in lemmas.take_all()}
    rows = [
        {"site": s, "pages": p[s]["pages"], "tokens": p[s]["tokens"],
         "lemma_rows": l.get(s, {}).get("lemma_rows", 0)}
        for s in sorted(p)
    ]
    return rd.from_items(rows)
