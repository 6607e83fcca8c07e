"""Flagship pipeline: full-corpus index build (reference ``startIndexing``).

Ray-native restatement of ``IndexingServiceImpl.startIndexing``
(``services/IndexingServiceImpl.java:40-95`` + the recursive
``PageAnalyzer`` crawl, SURVEY.md §3.1) as a linear streaming Dataset plan:

    phase A (shuffle write, streaming, no all-to-all):
      read_parquet(pages, columns=[url, warc_ts, html])    # prune at read
        -> map_batches(assign_part)          # stateless; split-stable route
        -> map_batches(part filter)          # resume: drop committed parts
        -> map_batches(extract_batch)        # stateless HTML->text
        -> map_batches(Lemmatizer, concurrency=(2,N))  # actor pool (ST1)
        -> map_batches(write_runs)           # part-keyed run files on disk
    phase B (shuffle read, one task per partition):
      from_items(todo parts) -> map_batches(build_from_runs)  # segment+manifest
      -> (tiny) stats rows -> finalize: global dictionary + corpus stats

The exchange goes through part-keyed run files instead of Ray's sort-based
``groupby`` — measured 5-10x cheaper at equal correctness (the sort carries
the full document payload through sample+exchange, while the run writer
streams each block straight to its partitions' files), and it is exactly the
disk-backed shuffle large engines use, so a retried/resumed build re-reads
only its own partition's bytes.  No stage materializes the corpus; the
executor streams blocks with backpressure end to end.  The reference's
per-site locks / mutable counters (``PageAnalyzer.java:179-218``) are all
replaced by this one exchange + pure aggregates.  Concurrency is derived
from ``ray.cluster_resources()`` — no hard-coded pool sizes (SURVEY.md §4.2).
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import time as _timemod
from dataclasses import asdict, dataclass

import ray
import ray.data as rd

from ..config import IndexBuildConfig, derive_num_partitions
from ..stages.extract import assign_part_batch, extract_batch, make_part_filter
from ..stages.lemmatize import Lemmatizer
from ..stages.segments import RunWriterActor, make_runs_segment_builder
from ..state.manifest import done_parts

CORPUS_STATS = "corpus_stats.json"
GLOBAL_DICT_DIR = "global_dict"


@dataclass
class BuildResult:
    index_dir: str
    num_partitions: int
    built_parts: int
    skipped_parts: int
    n_docs: int
    n_terms_sum: int
    n_postings: int
    total_tokens: int
    bytes_postings: int


def _config_hash(cfg: IndexBuildConfig, num_partitions: int) -> str:
    # "hashv" is the url-routing hash version: stable_hash_array changed in
    # round 2 (blake2b loop -> vectorized polynomial+splitmix64), which
    # re-routes every url, so indexes built under a different version must
    # rebuild rather than resume (build_index invalidates mismatched parts).
    payload = json.dumps(
        {"p": num_partitions, "block": cfg.block_size, "morph": cfg.morphology,
         "text": cfg.store_doc_text, "hashv": 2,
         # only present when on, so round-2 indexes keep their hashes
         **({"pos": True} if cfg.store_positions else {})}, sort_keys=True)
    return hashlib.blake2b(payload.encode(), digest_size=8).hexdigest()


def _wait_for_cpus(cpus: int, timeout: float = 15.0,
                   plateau: float = 1.0) -> None:
    """Block until (nearly) all cluster CPUs are schedulable again —
    actor pools release their reservations asynchronously after their
    execution finishes.

    Returns early when the release PLATEAUS: occasionally a couple of
    actors linger well past teardown (observed: 28/32 free for >15s), and
    burning the full timeout to recover 4 CPUs costs far more than running
    the build 28-wide.  The danger case this guard exists for — only the
    reserve CPUs free, measured 12x slowdown — shows up as avail < half
    the cluster, so the plateau exit also requires avail >= cpus/2."""
    import time as _time

    deadline = _time.monotonic() + timeout
    avail = 0.0
    best = -1.0
    best_t = _time.monotonic()
    while _time.monotonic() < deadline:
        avail = ray.available_resources().get("CPU", 0)
        if avail >= cpus - 1:
            return
        now = _time.monotonic()
        if avail > best:
            best, best_t = avail, now
        elif avail >= cpus / 2 and now - best_t >= plateau:
            return  # release stalled at a usable width — don't burn timeout
        _time.sleep(0.2)
    # Proceeding with fewer CPUs is correct but slow (the build tasks get
    # only the reserve CPUs — measured 12x); make it diagnosable.
    import logging

    logging.getLogger(__name__).warning(
        "actor-pool CPUs not released after %.0fs (available %.0f / expected"
        " ~%d); segment build will run under-parallelized", timeout, avail,
        cpus)


def _pool_sizes(num_docs_hint: int) -> tuple[tuple[int, int], int, int]:
    """(lemmatizer pool bounds, writer actors, cpus) from the cluster AND
    the work size.

    Ray Data's actor autoscaler ramps far too slowly for short jobs (measured
    2.3x wall on 400k docs with min=2 vs a full pool), so the pool MINIMUM is
    sized from the known input: roughly one actor per 5k docs, clamped to
    [2, max].  Small inputs still skip the full-pool startup cost; large
    inputs start wide immediately.

    The run WRITER is its own (small) actor pool — a task-pool writer
    competes with reads for the leftover CPUs and gets starved at low
    widths, letting chain outputs pile toward object-store capacity
    (measured 6x collapse at 6.4M docs / 8 CPUs).  Split from the measured
    work ratio: chain ~0.14 ms/doc vs write ~0.03 ms/doc => writer ~1/6 of
    the node, one CPU of read headroom (reads are ~0.01 ms/doc)."""
    cpus = int(ray.cluster_resources().get("CPU", 4))
    writer = max(1, cpus // 6)
    read_reserve = max(1, cpus // 16)
    pool_max = max(2, cpus - writer - read_reserve)
    pool_min = max(2, min(pool_max, num_docs_hint // 5_000))
    return (pool_min, pool_max), writer, cpus


def build_index(
    pages: rd.Dataset,
    index_dir: str,
    cfg: IndexBuildConfig | None = None,
    *,
    num_docs_hint: int | None = None,
    resume: bool = True,
) -> BuildResult:
    """Build (or resume) the inverted index for ``pages`` into ``index_dir``.

    ``pages`` must carry url/warc_ts/html (input_hint shape); extra columns
    are tolerated.  Idempotent: committed partitions are skipped when
    ``resume=True``; output is deterministic given the input row SET
    (any arrival order, any parallelism level).
    """
    cfg = cfg or IndexBuildConfig()
    os.makedirs(index_dir, exist_ok=True)

    if num_docs_hint is None:
        num_docs_hint = pages.count()  # metadata-only for parquet sources
    num_partitions = derive_num_partitions(num_docs_hint, cfg)
    cfg_hash = _config_hash(cfg, num_partitions)

    already = done_parts(index_dir) if resume else {}
    # a committed partition only counts as done under the SAME config hash:
    # a config/hash-version change re-routes or re-shapes every partition,
    # so stale segments are deleted and rebuilt (never silently mixed)
    stale = {p for p, m in already.items() if m.config_hash != cfg_hash}
    if stale:
        import shutil as _shutil

        for p in sorted(stale):
            _shutil.rmtree(os.path.join(index_dir, f"part={p:05d}"),
                           ignore_errors=True)
        already = {p: m for p, m in already.items() if p not in stale}
    todo = set(range(num_partitions)) - set(already)
    lem_actors, writer_actors, cpus = _pool_sizes(num_docs_hint)

    stats_rows = []
    if todo:
        import shutil

        exchange_root = cfg.exchange_dir or index_dir
        runs_dir = os.path.join(exchange_root, f".runs-{cfg_hash}")
        shutil.rmtree(runs_dir, ignore_errors=True)  # partial runs are invalid

        # Two streaming executions, one per exchange side.  The barrier
        # between them is inherent ("group g's runs are complete only when
        # every writer finished"), and it must be a real execution boundary:
        # inside one execution the idle lemmatizer actor pool keeps holding
        # its CPU reservations through the barrier, capping the build side
        # at the few reserve CPUs (measured 12x slowdown).  The document
        # payload moves through group-keyed run files; only tiny ack rows
        # come back to the driver.
        _log = logging.getLogger(__name__)
        _t_phase = _timemod.perf_counter()
        keep = None if len(todo) == num_partitions else todo
        ds = pages
        if "text" in ds.schema().names:  # golden column: never ship it
            ds = ds.drop_columns([c for c in ("text", "lang") if c in ds.schema().names])
        ds = ds.map_batches(assign_part_batch, batch_format="pyarrow",
                            fn_kwargs={"num_partitions": num_partitions},
                            batch_size=cfg.extract_batch_size)
        if keep is not None:
            ds = ds.map_batches(make_part_filter(keep), batch_format="pyarrow")
        ds = ds.map_batches(extract_batch, batch_format="pyarrow",
                            batch_size=cfg.extract_batch_size)
        ds = ds.map_batches(
            Lemmatizer,
            fn_constructor_kwargs={"morphology": cfg.morphology,
                                   "drop_text": True,
                                   "store_positions": cfg.store_positions},
            batch_format="pyarrow",
            batch_size=cfg.lemmatizer_batch_size,
            concurrency=lem_actors,
            num_cpus=1,
        )
        acks = ds.map_batches(
            RunWriterActor,
            fn_constructor_kwargs={"runs_dir": runs_dir,
                                   "exchange_group": cfg.exchange_group},
            batch_format="pyarrow",
            batch_size=cfg.run_write_batch_size,
            concurrency=(writer_actors, writer_actors),
            num_cpus=1)
        # ---- drive the shuffle-write execution, collecting ack groups ----
        groups_with_data: set[int] = set()
        for b in acks.iter_batches(batch_format="pyarrow", batch_size=4096):
            groups_with_data.update(b["grp"].to_pylist())
        _log.info("build phase A (shuffle-write) %.2fs",
                  _timemod.perf_counter() - _t_phase)
        _t_phase = _timemod.perf_counter()

        # The write execution is done, but Ray Data keeps the finished
        # execution's actor pools (and their CPU reservations) alive as
        # long as the Dataset object is referenced — measured: 9/32 CPUs
        # free 15 s after the execution finished, with phase B then running
        # under-parallelized (the "12x slowdown" of round 1).  Dropping the
        # references lets the pools tear down in ~1-2 s.
        del acks, ds
        import gc as _gc

        _gc.collect()
        _wait_for_cpus(cpus)
        _log.info("build barrier (actor CPU release) %.2fs",
                  _timemod.perf_counter() - _t_phase)
        _t_phase = _timemod.perf_counter()

        # ---- shuffle read: one task per exchange group --------------------
        grps = sorted(groups_with_data)
        if grps:
            grp_ds = rd.from_items([{"grp": g} for g in grps],
                                   override_num_blocks=len(grps))
            stats = grp_ds.map_batches(
                make_runs_segment_builder(runs_dir, index_dir, cfg, cfg_hash),
                batch_format="pyarrow")
            stats_rows = stats.take_all()  # one tiny row per partition
        _log.info("build phase B (segment build) %.2fs",
                  _timemod.perf_counter() - _t_phase)
        _t_phase = _timemod.perf_counter()

        # hash routing can leave partitions with zero documents (no ack row,
        # no group): commit empty segments so resume sees them done
        from ..stages.segments import commit_empty_part

        missing = todo - set(done_parts(index_dir))
        for p in sorted(missing):
            commit_empty_part(index_dir, p, cfg, cfg_hash)

        if set(done_parts(index_dir)) >= set(range(num_partitions)):
            shutil.rmtree(runs_dir, ignore_errors=True)

    if todo or not os.path.exists(os.path.join(index_dir, CORPUS_STATS)):
        _t_fin = _timemod.perf_counter()
        finalize_index(index_dir)
        logging.getLogger(__name__).info(
            "build finalize %.2fs", _timemod.perf_counter() - _t_fin)

    built = {r["part"] for r in stats_rows}
    manifests = done_parts(index_dir)
    return BuildResult(
        index_dir=index_dir,
        num_partitions=num_partitions,
        built_parts=len(built),
        skipped_parts=len(already),
        n_docs=sum(m.n_docs for m in manifests.values()),
        n_terms_sum=sum(m.n_terms for m in manifests.values()),
        n_postings=sum(m.n_postings for m in manifests.values()),
        total_tokens=sum(m.total_tokens for m in manifests.values()),
        bytes_postings=sum(m.bytes_postings for m in manifests.values()),
    )


def reindex_urls(
    pages: rd.Dataset,
    index_dir: str,
    urls: list[str],
    cfg: IndexBuildConfig | None = None,
    *,
    num_docs_hint: int | None = None,
) -> BuildResult:
    """Batch equivalent of ``POST /api/indexPage`` (reference §3.2,
    ``IndexingServiceImpl.java:145-210``) and of page-delete cleanup (D3):
    invalidate the partitions owning ``urls`` and rebuild ONLY those from the
    current ``pages`` input — updated pages get re-extracted/re-lemmatized,
    removed pages disappear, df/doc_len re-aggregate, all other segments'
    files are untouched.  The reference's row-level upsert under per-site
    locks (``PageAnalyzer.java:179-218``) becomes an idempotent partition
    swap (SURVEY.md §2.7-D2/D3, §7.7)."""
    import dataclasses
    import shutil

    from ..functions.hashing import stable_hash_array

    cfg = cfg or IndexBuildConfig()
    # partition count MUST match the existing index (it defines url routing):
    # pin it from the committed corpus stats, never re-derive from doc count
    existing = load_corpus_stats(index_dir)
    num_partitions = int(existing["num_partitions"])
    cfg = dataclasses.replace(cfg, num_partitions=num_partitions)
    # Refuse to produce a silently mixed-config index: the victim partitions
    # would rebuild under the caller's cfg while every other partition keeps
    # the committed one (different morphology/block_size => different
    # postings for the same input).
    committed = done_parts(index_dir)
    if committed:
        committed_hash = next(iter(committed.values())).config_hash
        want_hash = _config_hash(cfg, num_partitions)
        if committed_hash != want_hash:
            raise ValueError(
                f"reindex_urls config mismatch: index {index_dir} was built "
                f"with config_hash={committed_hash} but the caller's cfg "
                f"hashes to {want_hash}; pass the original cfg or rebuild "
                "from scratch (resume=False)")
    if num_docs_hint is None:
        num_docs_hint = pages.count()
    # NB: stay in array land — a scalar np.uint64 mixed with a Python int
    # promotes to float64 and silently corrupts the modulo
    import numpy as np

    victims = set((stable_hash_array(list(urls)) % np.uint64(num_partitions))
                  .astype(np.int64).tolist())
    for p in sorted(victims):
        shutil.rmtree(os.path.join(index_dir, f"part={p:05d}"),
                      ignore_errors=True)
    res = build_index(pages, index_dir, cfg, num_docs_hint=num_docs_hint,
                      resume=True)
    finalize_index(index_dir)  # df/avgdl changed even for untouched parts
    return res


def finalize_index(index_dir: str) -> None:
    """Global term dictionary + corpus stats from committed segments.

    ``df_global = groupby(term).sum(per-part df)`` over the per-part postings
    metadata (term+df columns only — parquet column pruning keeps the heavy
    binary columns on disk).  Corpus stats (N, avgdl) come from manifests.
    The reference's analogue is the ``lemmas`` table + the statistics
    aggregates (``StatisticsServiceImpl.java:30-58``), computed there by
    loading every row into RAM — here it is a metadata-sized aggregate.
    """
    manifests = done_parts(index_dir)
    if not manifests:
        return
    part_files = [
        os.path.join(index_dir, f"part={p:05d}", "postings.parquet")
        for p in sorted(manifests)
    ]
    out_dir = os.path.join(index_dir, GLOBAL_DICT_DIR)
    tmp_dir = out_dir + ".tmp"
    import shutil

    shutil.rmtree(tmp_dir, ignore_errors=True)
    # the dictionary is metadata-scale (Σ per-part vocab).  Below a few
    # million rows a single-node pyarrow group_by beats a distributed
    # shuffle's fixed cost by 10-100x; above it (real web-scale vocab) the
    # Ray hash aggregate takes over.
    total_terms = sum(m.n_terms for m in manifests.values())
    if total_terms <= 2_000_000:
        import pyarrow as pa
        import pyarrow.parquet as pq

        t = pa.concat_tables(
            pq.read_table(f, columns=["term", "df"]) for f in part_files)
        agg_t = t.group_by("term").aggregate([("df", "sum")]) \
            .rename_columns(["term", "df"])
        os.makedirs(tmp_dir, exist_ok=True)
        pq.write_table(agg_t, os.path.join(tmp_dir, "dict.parquet"))
    else:
        ds = rd.read_parquet(part_files, columns=["term", "df"])
        from ray.data.aggregate import Sum

        agg = ds.groupby("term").aggregate(Sum("df", alias_name="df"))
        agg.write_parquet(tmp_dir)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.rename(tmp_dir, out_dir)

    n_docs = sum(m.n_docs for m in manifests.values())
    total_tokens = sum(m.total_tokens for m in manifests.values())
    stats = {
        "n_docs": n_docs,
        "total_tokens": total_tokens,
        "avgdl": (total_tokens / n_docs) if n_docs else 0.0,
        "num_partitions": len(manifests),
        "parts": sorted(manifests),
        "per_part": {str(p): asdict(m) for p, m in sorted(manifests.items())},
    }
    tmp = os.path.join(index_dir, CORPUS_STATS + ".tmp")
    with open(tmp, "w") as f:
        json.dump(stats, f, indent=1)
    os.rename(tmp, os.path.join(index_dir, CORPUS_STATS))


def load_corpus_stats(index_dir: str) -> dict:
    with open(os.path.join(index_dir, CORPUS_STATS)) as f:
        return json.load(f)
