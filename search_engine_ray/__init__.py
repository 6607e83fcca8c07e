"""search_engine_ray — a Ray-Data-native full-text index build + query engine.

Re-expresses the capabilities of the reference ``karvli/search-engine``
(Spring Boot / MySQL crawler-indexer, see /root/repo/SURVEY.md) as idiomatic
Ray Data pipelines: ``ray.data.Dataset`` -> ``map_batches`` over zero-copy
Arrow batches, actor pools for stateful stages (morphology, segment
searchers), one document-partitioned exchange (group-keyed run files on fast
scratch — no sort-based all-to-all) for the index build, and
partitioned-Parquet index segments with per-partition manifests
(checkpoint / lineage / metrics).

Nothing here calls ``ray.init()`` — the caller (driver, bench.py, tests)
owns the Ray session.
"""

__version__ = "0.1.0"
