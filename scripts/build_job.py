"""Index-build job entry point (``ray job submit`` / CLI).

    ray job submit -- python scripts/build_job.py \
        --pages /data/pages_glob --index /data/index_v1 [--morphology default]

Or standalone (Ray auto-initialises local mode). The driver contract
(`__ray_entry__`) must NOT own a Ray session; this script, `bench.py` and
the pytest fixture are the only session owners.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pages", required=True,
                    help="parquet path/glob of input pages (url, warc_ts, html)")
    ap.add_argument("--index", required=True, help="output index directory")
    ap.add_argument("--morphology", default="default",
                    choices=["default", "simple"])
    ap.add_argument("--docs-per-partition", type=int, default=50_000)
    ap.add_argument("--no-resume", action="store_true",
                    help="ignore committed partitions and rebuild everything")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    try:
        from search_engine_ray.config import IndexBuildConfig
        from search_engine_ray.pipelines.build import build_index
        from search_engine_ray.pipelines.stats import index_statistics
        from search_engine_ray.sources.pages import read_pages

        cfg = IndexBuildConfig(
            morphology=args.morphology,
            target_docs_per_partition=args.docs_per_partition)
        # read_pages prunes to (url, warc_ts, html) at the read — only the
        # needed bytes leave storage
        res = build_index(read_pages(args.pages), args.index, cfg,
                          resume=not args.no_resume)
        stats = index_statistics(args.index)
        print(json.dumps({
            "index_dir": res.index_dir,
            "num_partitions": res.num_partitions,
            "built_parts": res.built_parts,
            "skipped_parts": res.skipped_parts,
            "n_docs": res.n_docs,
            "n_postings": res.n_postings,
            "bytes_postings": res.bytes_postings,
            "total": stats["total"],
        }))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
