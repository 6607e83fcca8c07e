"""Engine configuration.

Replaces the reference's Spring ``@ConfigurationProperties`` classes
(``config/SitesList.java``, ``config/SearchBot.java``,
``config/SearchSettings.java:12-20``, ``application.yaml:19-39``) with plain
dataclasses.  The crawler-identity / politeness settings are dropped with the
live crawler (batch Parquet input, SURVEY.md §2.1-S2); the surviving knobs are
the search/snippet settings plus the new scale knobs of the Ray build.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class SearchSettings:
    """Reference ``config/SearchSettings.java:12-20``: snippet context width.

    ``site_names`` replaces the reference's configured site list's display
    names (``config/SitesList.java`` -> ``SearchData.siteName``): a site url
    maps to a human name; unmapped sites echo their url."""

    words_range: int = 2  # significant words of context left/right of a hit
    default_limit: int = 20  # ApiController.java:77-82
    default_offset: int = 0
    site_names: tuple[tuple[str, str], ...] = ()

    def site_name(self, site: str) -> str:
        for s, name in self.site_names:
            if s == site:
                return name
        return site


@dataclass(frozen=True)
class Bm25Params:
    k1: float = 1.2
    b: float = 0.75


@dataclass(frozen=True)
class IndexBuildConfig:
    """Physical knobs of the index build pipeline (SURVEY.md §7).

    ``num_partitions`` is the document-partitioning fan-out: every document is
    routed to ``part = stable_hash(url) % num_partitions`` and each partition
    becomes one self-contained index segment (all terms of its documents).
    Partition count is the resume/checkpoint unit and bounds the memory of the
    per-partition ``map_groups`` segment build — size it so one partition's
    token stream fits a worker heap.  ``None`` -> derived from cluster size at
    run time (no hard-coded pool sizes; SURVEY.md §4.2).
    """

    num_partitions: int | None = None
    target_docs_per_partition: int = 50_000
    block_size: int = 128  # postings per skip-block (block-max metadata unit)
    lemmatizer_batch_size: int = 256  # HTML rows are fat; keep batches modest
    extract_batch_size: int = 256
    # shuffle-write width of the two-phase exchange: docs per run-writer task
    # (each task emits ≤1 file per partition it saw; bigger batches -> fewer,
    # larger run files).  Physical knob — does not affect output bytes.
    run_write_batch_size: int = 4096
    # partitions per exchange group: run files and segment-build tasks are
    # keyed by ``part // exchange_group``, so partition granularity (the
    # checkpoint/resume/segment unit, kept small for cache-friendly builds)
    # decouples from exchange granularity (kept coarse to bound file count:
    # files ~= writer_tasks x n_groups).  1 = one group per partition.
    exchange_group: int = 1
    # where the exchange's run files live.  None -> inside index_dir.  On a
    # cluster this should be fast node-local scratch (NVMe) or the shared
    # store's burst tier — the exchange is transient, write-once/read-once,
    # and at scale its bandwidth, not capacity, is what matters.  The bench
    # points it at tmpfs, the single-node analog of NVMe shuffle dirs.
    exchange_dir: str | None = None
    morphology: str = "default"  # "default" (stem+stop) or "simple" (identity)
    store_doc_text: bool = True  # keep extracted text for snippet generation
    # positional postings: per (doc, term) the 0-based indices into the doc's
    # kept-token stream, varint-delta-packed next to the tfs — enables phrase
    # queries (pipelines/phrase.phrase_search).  Off by default: ~doc_len
    # extra varints per doc through the exchange and into the segments.
    store_positions: bool = False
    bm25: Bm25Params = field(default_factory=Bm25Params)


def derive_num_partitions(num_docs_hint: int, cfg: IndexBuildConfig) -> int:
    if cfg.num_partitions is not None:
        return max(1, cfg.num_partitions)
    import math

    return max(1, math.ceil(num_docs_hint / cfg.target_docs_per_partition))
