"""Per-partition index-segment builder (the ``map_groups`` of the one shuffle).

The build pipeline's single all-to-all exchange is ``groupby("part")`` over
compact per-document rows; this module turns one partition's documents into a
self-contained, immutable index segment on disk:

``part=NNNNN/
    docs.parquet      doc_id,url,site,path,title,doc_len,code[,whole_text]
    postings.parquet  term,df,doc_ids(bin),tfs(bin),block_* skip metadata
    dict.parquet      site,term,df   (reference ``lemmas`` table, A2)
    _MANIFEST.json    fingerprint / counts / metrics (lineage)``

Design notes (SURVEY.md §7.3/§7.4):

- Document-partitioned segments (the classic web-scale layout) make head-term
  skew a non-issue for the shuffle: a stopword-class term's postings are split
  across all partitions by construction (this IS the salting — the salt is the
  document partition), and queries k-way-merge per-partition top-k.
- doc_id = ``part * 2**40 + rank(url within part)`` — deterministic,
  resume-stable (depends only on the partition's url set), dense within a
  partition so delta+varint compresses to ~1 byte/doc gap.
- Input dedup (reference D1, ``PageAnalyzer.java:398-447``): same url ->
  same partition, keep the latest ``warc_ts`` capture (ties: lexicographically
  larger title/text wins via stable sort order) — no extra shuffle.
- All term-level work is vectorized: pyarrow list-flatten + ``np.repeat`` for
  the explode, dictionary-encode + stable argsort for the term grouping,
  ``np.flatnonzero`` boundaries; Python touches each *term* once (to slice),
  never each posting.
"""

from __future__ import annotations

import os
import time
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .. import __version__
from ..config import IndexBuildConfig
from ..state.manifest import PartManifest, commit_part_dir, part_dirname, write_manifest

DOC_ID_PART_SHIFT = 40  # doc_id = part << 40 | local_rank


def make_run_writer(runs_dir: str, exchange_group: int = 1):
    """Stateless shuffle-WRITE side of the two-phase exchange.

    Each task splits its batch by exchange group (``part // exchange_group``)
    and appends one complete (open-write-close) parquet run file per group it
    saw — ``runs/grp=G/run-<uuid>.parquet``.  This replaces a sort-based
    ``groupby("part")`` all-to-all: the exchange goes through storage (how
    external-shuffle engines do it), each run is a self-contained file, and a
    retried task merely adds a duplicate run that the resume logic discards
    with the whole runs dir.  File count ~= tasks × groups-per-task; batch
    size (IndexBuildConfig.run_write_batch_size) and ``exchange_group``
    control it.  The ``part`` column rides inside the file, so one group's
    build task splits its parts in memory without re-reading.
    """

    def write_runs(batch: pa.Table) -> pa.Table:
        parts = batch["part"].to_numpy(zero_copy_only=False)
        # ONE stable part-sort + zero-copy slices replace the old
        # per-group filter scans (k full mask passes over the batch), and
        # — the real win — every run file's rows arrive PART-SORTED, so
        # the phase-B reader splits them with zero-copy slices instead of
        # a full materializing argsort+take of every byte (phase B is the
        # DRAM-bound side; the writer runs in phase A, which scales).
        if parts.size > 1 and np.any(np.diff(parts) < 0):
            order = np.argsort(parts, kind="stable")
            batch = batch.take(pa.array(order, pa.int64()))
            parts = parts[order]
        grps = parts // np.int32(exchange_group)
        bounds = np.flatnonzero(np.diff(grps)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [grps.size]))
        rows = []
        for s, e in zip(starts, ends):
            if e <= s:
                continue
            g = int(grps[s])
            sub = batch.slice(s, e - s)
            d = os.path.join(runs_dir, f"grp={g}")
            os.makedirs(d, exist_ok=True)
            tmp = os.path.join(d, f".tmp-run-{uuid.uuid4().hex}.parquet")
            # snappy+dictionary (parquet defaults) measured FASTER end-to-end
            # than uncompressed/plain OR Arrow-IPC+mmap here: the exchange
            # dir is tmpfs shared with the object store, so uncompressed
            # runs (2.5x bytes) blow its capacity and the whole build pays
            # (IPC experiment: phase A 68->90s, phase B 37->124s); fewer
            # bytes through tmpfs beats saving codec CPU
            pq.write_table(sub, tmp)
            os.rename(tmp, tmp.replace(".tmp-run-", "run-"))
            rows.append((g, sub.num_rows))
        return pa.table({
            "grp": pa.array([r[0] for r in rows], pa.int32()),
            "rows": pa.array([r[1] for r in rows], pa.int64()),
        })

    return write_runs


class RunWriterActor:
    """Actor-pool wrapper for the run writer.

    A TASK-pool writer competes with read tasks for the non-pool CPUs; at
    low CPU counts the scheduler starves it, chain outputs pile up toward
    object-store capacity, and the pipeline collapses once eviction starts
    (measured: 6.4M docs at 8 CPUs ran 6x slower with all write tasks
    deferred to the end of the run).  Dedicated writer actors guarantee the
    exchange drains at production rate regardless of cluster width.
    """

    def __init__(self, runs_dir: str, exchange_group: int = 1) -> None:
        self._fn = make_run_writer(runs_dir, exchange_group)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self._fn(batch)


def make_runs_segment_builder(runs_dir: str, index_dir: str,
                              cfg: IndexBuildConfig, config_hash: str):
    """Shuffle-READ side: one task per exchange GROUP pulls that group's run
    files once (only its own bytes leave storage), splits them by ``part``
    in memory, and builds each partition's segment with the same vectorized
    builder the map_groups path uses — partitions stay small (cache-friendly
    builds, fine-grained resume) while exchange files stay coarse."""

    builder = make_segment_builder(index_dir, cfg, config_hash)

    def _empty_stats(part: int) -> pa.Table:
        return pa.table({
            "part": pa.array([part], pa.int32()),
            "n_docs": pa.array([0], pa.int64()),
            "n_terms": pa.array([0], pa.int64()),
            "n_postings": pa.array([0], pa.int64()),
            "total_tokens": pa.array([0], pa.int64()),
            "bytes_postings": pa.array([0], pa.int64()),
            "wall_sec": pa.array([0.0], pa.float64()),
        })

    def build_from_runs(batch: pa.Table) -> pa.Table:
        import glob as _glob
        import logging as _logging
        import time as _time

        outs = []
        # callers pass either distinct grp rows (resume path) or run-writer
        # ack groups (one row per writer task) — dedupe either way
        for grp in sorted(set(batch["grp"].to_pylist())):
            files = sorted(_glob.glob(
                os.path.join(runs_dir, f"grp={int(grp)}", "run-*.parquet")))
            if not files:
                continue
            _t_read = _time.perf_counter()
            # Phase B is DRAM-bound (BASELINE.md), so every byte matters:
            # * ``read_dictionary`` keeps the heavy terms column in its
            #   on-disk dictionary form — the flat term STRINGS never
            #   materialize; only int32 codes + each file's small dictionary
            #   leave the decoder, and the builder re-uses the codes
            #   directly instead of re-hashing every posting's string.
            # * the split into parts happens PER RUN FILE, right after its
            #   decode while the file's ~MBs are still cache-resident — not
            #   as one whole-group gather (which streamed the entire group
            #   through DRAM a second time).  Per-part tables then assemble
            #   with zero-copy concat + one dictionary unification (an
            #   int32 remap over codes, not a string pass).
            # * ParquetFile.read skips pq.read_table's per-call dataset
            #   machinery — measured ~40% less per-file overhead across the
            #   ~190 small runs each group reads.
            chunks: dict[int, list[pa.Table]] = {}
            n_rows = 0
            for f in files:
                t = pq.ParquetFile(f, read_dictionary=["terms.list.element"]) \
                    .read(use_threads=False)
                n_rows += t.num_rows
                parts = t["part"].to_numpy(zero_copy_only=False)
                uniq = np.unique(parts)
                if uniq.size == 1:
                    chunks.setdefault(int(uniq[0]), []).append(t)
                    continue
                diffs = np.diff(parts)
                if np.all(diffs >= 0):
                    # run files are written part-sorted (make_run_writer):
                    # the split is pure zero-copy slices — no materializing
                    # take, no extra DRAM pass over the heavy columns
                    tt, ps = t, parts
                else:  # legacy / externally-written unsorted run
                    order = np.argsort(parts, kind="stable")
                    tt = t.take(pa.array(order, pa.int64()))
                    ps = parts[order]
                    diffs = np.diff(ps)
                bounds = np.flatnonzero(diffs) + 1
                starts = np.concatenate(([0], bounds))
                ends = np.concatenate((bounds, [ps.size]))
                for s, e in zip(starts, ends):
                    chunks.setdefault(int(ps[s]), []).append(
                        tt.slice(s, e - s))
            _logging.getLogger(__name__).info(
                "grp %d: read %d run files (%d rows, %d parts) %.2fs",
                int(grp), len(files), n_rows, len(chunks),
                _time.perf_counter() - _t_read)
            for part in sorted(chunks):
                gt = pa.concat_tables(chunks[part],
                                      promote_options="permissive") \
                    .unify_dictionaries()
                outs.append(builder(gt))
        return pa.concat_tables(outs) if outs else _empty_stats(-1).slice(0, 0)

    return build_from_runs


def commit_empty_part(index_dir: str, part: int, cfg: IndexBuildConfig,
                      config_hash: str) -> None:
    """Hash routing can leave a partition with zero documents; it still needs
    a committed (empty) segment so resume bookkeeping sees it as done."""
    docs_schema = pa.schema([
        ("doc_id", pa.int64()), ("url", pa.string()), ("site", pa.string()),
        # doc_len is int32 — MUST match the non-empty builder's docs schema
        # (Lemmatizer emits int32) or cross-part reads/merges hit promotion
        ("path", pa.string()), ("title", pa.string()), ("doc_len", pa.int32()),
        ("code", pa.int32()),
    ] + ([("whole_text", pa.string())] if cfg.store_doc_text else []))
    postings_schema = pa.schema([
        ("term", pa.string()), ("df", pa.int64()), ("doc_ids", pa.binary()),
        ("tfs", pa.binary()), ("block_last_docid", pa.list_(pa.int64())),
        ("block_off_docs", pa.list_(pa.int64())),
        ("block_off_tfs", pa.list_(pa.int64())),
        ("block_max_tf", pa.list_(pa.int32())),
        ("block_min_dl", pa.list_(pa.int32())),
        ("block_first_docid", pa.list_(pa.int64())),
    ] + ([("positions", pa.binary()), ("block_off_pos", pa.list_(pa.int64()))]
         if cfg.store_positions else []))
    dict_schema = pa.schema([("site", pa.string()), ("term", pa.string()),
                             ("df", pa.int64())])
    final_dir = os.path.join(index_dir, part_dirname(part))
    tmp_dir = os.path.join(index_dir, f".tmp-{part_dirname(part)}-{uuid.uuid4().hex[:8]}")
    os.makedirs(tmp_dir, exist_ok=True)
    pq.write_table(docs_schema.empty_table(), os.path.join(tmp_dir, "docs.parquet"))
    pq.write_table(postings_schema.empty_table(), os.path.join(tmp_dir, "postings.parquet"))
    pq.write_table(dict_schema.empty_table(), os.path.join(tmp_dir, "dict.parquet"))
    write_manifest(
        tmp_dir,
        PartManifest(part=part, status="done", input_fingerprint="0" * 16,
                     config_hash=config_hash, input_rows=0, n_docs=0,
                     n_terms=0, n_postings=0, total_tokens=0,
                     bytes_postings=0, bytes_docs=0, wall_sec=0.0,
                     engine_version=__version__,
                     extra={"block_size": cfg.block_size,
                            "store_positions": cfg.store_positions}),
    )
    commit_part_dir(tmp_dir, final_dir)
    from ..state.manifest import clear_failed_marker

    clear_failed_marker(index_dir, part)


def make_segment_builder(index_dir: str, cfg: IndexBuildConfig, config_hash: str):
    """Returns the map_groups fn; the closure carries only small config.

    A build exception writes a per-partition failed marker (last_error +
    timestamp, reference FAILED semantics ``PageAnalyzer.java:541-548``)
    before propagating, so a crashed run leaves a diagnosable record and
    resume rebuilds exactly the failed partitions; a later successful
    commit clears the marker."""

    def build_segment(group: pa.Table) -> pa.Table:
        from ..state.manifest import clear_failed_marker, write_failed_marker

        part = int(group["part"][0].as_py())
        try:
            out = _build_segment_inner(group, part, index_dir, cfg, config_hash)
        except Exception as exc:  # noqa: BLE001 — marker then re-raise
            import traceback

            write_failed_marker(index_dir, part,
                                f"{exc!r}\n{traceback.format_exc(limit=8)}",
                                config_hash)
            raise
        clear_failed_marker(index_dir, part)
        return out

    return build_segment


def _build_segment_inner(group: pa.Table, part: int, index_dir: str,
                         cfg: IndexBuildConfig, config_hash: str) -> pa.Table:
        t0 = time.monotonic()

        # --- dedup per url: latest warc_ts wins (deterministic) ----------
        # The sort/dedup permutation is computed on the LIGHT key columns
        # only; the heavy list columns (terms/tfs) are never gathered —
        # postings are built from the original row order with doc ids mapped
        # through the permutation.  Under 32-wide concurrency the build is
        # DRAM-bandwidth-bound, so skipping the full-table take/filter is a
        # direct scaling win, not just a constant factor.
        order = pc.sort_indices(
            group.select(["url", "warc_ts", "title"]),
            sort_keys=[("url", "ascending"), ("warc_ts", "descending"),
                       ("title", "descending")],
        )
        order_np = order.to_numpy().astype(np.int64)
        u_sorted = group["url"].take(order)
        if isinstance(u_sorted, pa.ChunkedArray):
            u_sorted = u_sorted.combine_chunks()
        n_rows = group.num_rows
        first_of_url = np.ones(n_rows, dtype=bool)
        if n_rows > 1:
            first_of_url[1:] = pc.not_equal(
                u_sorted.slice(1), u_sorted.slice(0, n_rows - 1)
            ).to_numpy(zero_copy_only=False)
        kept = order_np[first_of_url]  # original-row indices, url-sorted
        had_dups = kept.size != n_rows

        # doc-level (light) columns of the surviving rows, url-sorted
        heavy = {"terms", "tfs", "part", "poss"}
        g = group.select([c for c in group.column_names
                          if c not in heavy]).take(pa.array(kept))

        # --- deterministic doc ids (already url-sorted) ------------------
        n_docs = g.num_rows
        doc_ids = (np.int64(part) << DOC_ID_PART_SHIFT) + np.arange(n_docs, dtype=np.int64)

        # Order-independent input fingerprint (lineage), computed over the
        # DEDUPED rows with wrap-around uint64 SUM: a Ray task retry in the
        # shuffle-write phase duplicates run files, and dedup absorbs the
        # duplicate doc rows — fingerprinting pre-dedup rows (or XOR, which
        # cancels exact-duplicate pairs) would make lineage depend on retry
        # history.  input_rows is likewise the deduped count.
        input_rows = n_docs
        from ..functions.hashing import _POLY_P, _splitmix64, stable_hash_array

        with np.errstate(over="ignore"):
            hu = stable_hash_array(g["url"].to_pylist())
            ts_col = g["warc_ts"]
            if pa.types.is_timestamp(ts_col.type) or pa.types.is_integer(ts_col.type):
                ht = pc.cast(ts_col, pa.int64(), safe=False).to_numpy(
                    zero_copy_only=False).astype(np.uint64)
            else:
                ht = stable_hash_array([str(t) for t in ts_col.to_pylist()])
            fp = np.add.reduce(_splitmix64(hu * _POLY_P ^ ht),
                               dtype=np.uint64) if n_docs else np.uint64(0)

        # --- explode terms/tfs vectorized (original row order) -----------
        # flatten BEFORE combining chunks: for the dictionary-typed exchange
        # path only int32 codes are copied, never the term strings
        terms_list = group["terms"]
        tfs_list = group["tfs"]
        lens = pc.list_value_length(terms_list).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat_terms = pc.list_flatten(terms_list)
        if isinstance(flat_terms, pa.ChunkedArray):
            flat_terms = flat_terms.combine_chunks()
        flat_tfs_arr = pc.list_flatten(tfs_list)
        if isinstance(flat_tfs_arr, pa.ChunkedArray):
            flat_tfs_arr = flat_tfs_arr.combine_chunks()
        flat_tfs = flat_tfs_arr.to_numpy().astype(np.int64)
        has_pos = "poss" in group.column_names
        if has_pos:
            flat_poss = pc.list_flatten(group["poss"])
            if isinstance(flat_poss, pa.ChunkedArray):
                flat_poss = flat_poss.combine_chunks()
        # doc id per ORIGINAL row (-1 = dropped duplicate)
        row_doc_id = np.full(n_rows, -1, dtype=np.int64)
        row_doc_id[kept] = doc_ids
        dl_all = group["doc_len"].to_numpy(zero_copy_only=False).astype(np.int64)
        site_all = group["site"]
        site_codes_doc = pc.dictionary_encode(
            site_all.combine_chunks() if isinstance(site_all, pa.ChunkedArray)
            else site_all)
        site_idx_raw = np.asarray(site_codes_doc.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
        sites_raw = site_codes_doc.dictionary.to_pylist()
        # dictionary_encode assigns codes in ARRIVAL order, which depends on
        # run-file arrival; re-rank lexicographically so the dict table's
        # row order (sorted by (site, term) code) is input-order-invariant —
        # the cross-parallelism byte-identity guarantee covers dict.parquet
        site_lex = sorted(range(len(sites_raw)), key=sites_raw.__getitem__)
        site_rank = np.empty(max(1, len(sites_raw)), np.int64)
        for r, i in enumerate(site_lex):
            site_rank[i] = r
        sites_dict = [sites_raw[i] for i in site_lex]
        site_idx_doc = site_rank[site_idx_raw] if site_idx_raw.size else site_idx_raw
        doc_len_arr = dl_all[kept]

        if pa.types.is_dictionary(flat_terms.type):
            # exchange path: codes arrive pre-unified from the run reader —
            # the re-encode (a full string hash pass) is skipped entirely.
            # The dictionary may contain terms of OTHER parts in the same
            # exchange group; they have no postings rows, so after the
            # lexicographic re-rank below they simply never get emitted.
            dict_enc = flat_terms
        else:
            dict_enc = pc.dictionary_encode(flat_terms)
        raw_idx = np.asarray(dict_enc.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
        raw_dict: list[str] = dict_enc.dictionary.to_pylist()
        # re-rank dictionary indices lexicographically so the postings table
        # is written TERM-SORTED — parquet row-group min/max stats then prune
        # point lookups in the streaming (non-preload) query path
        lex = sorted(range(len(raw_dict)), key=raw_dict.__getitem__)
        rank_of = np.empty(max(1, len(raw_dict)), np.int64)
        for r, i in enumerate(lex):
            rank_of[i] = r
        term_idx = rank_of[raw_idx] if raw_idx.size else raw_idx
        term_dict: list[str] = [raw_dict[i] for i in lex]

        # Per-posting ROW index instead of per-posting copies of every doc
        # attribute: phase B is DRAM-bound, so the old three int64 repeats
        # (doc_id, doc_len, site) + a two-key lexsort cost real wall time
        # under wide concurrency.  One int32 repeat + a single packed
        # (term, doc-rank) int64 key sort carries the same information;
        # doc-level attributes come back as post-sort gathers through the
        # row index.
        post_rows = np.repeat(np.arange(n_rows, dtype=np.int32), lens)
        # postings of dropped duplicate rows carry doc_id -1 — filter them
        # out before grouping (no-op on the common dup-free path)
        if had_dups:
            valid = row_doc_id[post_rows] >= 0
            term_idx = term_idx[valid]
            post_rows = post_rows[valid]
            flat_tfs = flat_tfs[valid]
            if has_pos:
                flat_poss = flat_poss.filter(pa.array(valid))

        # postings must be term-grouped with doc_ids ascending inside each
        # term: doc_id = part_base + rank with rank < n_docs, so the pair
        # packs into one int64 key (keys are unique — a (doc, term) pair
        # occurs once — so any sort order rule is deterministic).
        part_base = np.int64(part) << DOC_ID_PART_SHIFT
        rank = row_doc_id[post_rows] - part_base
        bits = int(max(1, n_docs)).bit_length()
        key = (term_idx.astype(np.int64) << bits) | rank
        sort_ix = np.argsort(key)
        skey = key[sort_ix]
        term_sorted = skey >> bits
        docs_sorted = (skey & ((np.int64(1) << bits) - 1)) + part_base
        tfs_sorted = flat_tfs[sort_ix]
        rows_sorted = post_rows[sort_ix]
        dls_sorted = dl_all[rows_sorted]
        if has_pos:
            # one materializing take lays every posting's packed positions
            # contiguously in sort order: each term's positions blob is then
            # ONE buffer slice, block offsets one gather — no per-posting
            # python work anywhere
            poss_sorted = flat_poss.take(pa.array(sort_ix, pa.int64()))
            if isinstance(poss_sorted, pa.ChunkedArray):
                poss_sorted = poss_sorted.combine_chunks()
            pos_values = poss_sorted.buffers()[2] or b""
            if len(sort_ix):
                pos_offs = np.frombuffer(poss_sorted.buffers()[1], np.int32,
                                         count=len(sort_ix) + 1) \
                    .astype(np.int64)
            else:
                pos_offs = np.zeros(1, np.int64)

        boundaries = np.flatnonzero(np.diff(term_sorted)) + 1
        starts = np.concatenate(([0], boundaries))
        ends = np.concatenate((boundaries, [term_sorted.size]))

        # --- encode ALL terms in one vectorized pass ---------------------
        # Byte-identical to the old per-term encode_postings loop (same
        # gap/varint/block spec), computed whole-part: one global gap array
        # with resets at every term start AND every in-term block start,
        # ONE varint call for the part, per-term blobs as zero-copy buffer
        # slices, block metadata via reduceat.  Measured 6.5x faster than
        # the loop at 60k terms / 1.2M postings — phase B CPU, not bytes.
        from ..functions.codec import varint_encode_with_lengths

        n_post = int(term_sorted.size)
        n_terms = int(starts.size)
        lens_term = ends - starts
        bs = cfg.block_size
        off_in_term = np.arange(n_post, dtype=np.int64) \
            - np.repeat(starts, lens_term)
        is_blk = (off_in_term % bs) == 0
        gaps = np.empty(n_post, np.int64)
        if n_post:
            gaps[0] = docs_sorted[0]
            np.subtract(docs_sorted[1:], docs_sorted[:-1], out=gaps[1:])
            gaps[is_blk] = docs_sorted[is_blk]
        doc_buf, doc_lens_b = varint_encode_with_lengths(gaps)
        tf_buf, tf_lens_b = varint_encode_with_lengths(tfs_sorted)
        cum_d = np.zeros(n_post + 1, np.int64)
        np.cumsum(doc_lens_b, out=cum_d[1:])
        cum_t = np.zeros(n_post + 1, np.int64)
        np.cumsum(tf_lens_b, out=cum_t[1:])
        blk_starts = np.flatnonzero(is_blk)
        blk_term = np.searchsorted(starts, blk_starts, side="right") - 1
        blk_ends = np.minimum(blk_starts + bs, ends[blk_term]) \
            if blk_starts.size else blk_starts
        # reduceat segments end at the NEXT listed index (final one at
        # n_post); block boundaries include every term start, so no
        # segment crosses a term
        blk_max_tf = (np.maximum.reduceat(tfs_sorted, blk_starts)
                      .astype(np.int32) if blk_starts.size
                      else np.empty(0, np.int32))
        blk_min_dl = (np.minimum.reduceat(dls_sorted, blk_starts)
                      .astype(np.int32) if blk_starts.size
                      else np.empty(0, np.int32))
        tb = np.append(np.searchsorted(blk_starts, starts),
                       blk_starts.size).astype(np.int32)
        term_bounds = np.append(starts, n_post).astype(np.int64)

        def _bin_col(buf: bytes, cum: np.ndarray) -> pa.Array:
            offs = cum[term_bounds]
            if len(buf) > 2**31 - 1:  # int32 offset guard (parts are
                return pa.array(      # bounded; fallback keeps correctness)
                    [bytes(memoryview(buf)[offs[i]:offs[i + 1]])
                     for i in range(n_terms)], pa.binary())
            return pa.BinaryArray.from_buffers(
                pa.binary(), n_terms,
                [None, pa.py_buffer(offs.astype(np.int32).tobytes()),
                 pa.py_buffer(buf)])

        def _blk_list(flat: np.ndarray, typ) -> pa.ListArray:
            return pa.ListArray.from_arrays(pa.array(tb, pa.int32()),
                                            pa.array(flat, typ))

        term_col = (pc.take(pa.array(term_dict, pa.string()),
                            pa.array(term_sorted[starts], pa.int64()))
                    if n_terms else pa.array([], pa.string()))
        bytes_postings = len(doc_buf) + len(tf_buf)
        pos_cols = {}
        if has_pos:
            pos_b = bytes(pos_values)
            p_offs = pos_offs[term_bounds]
            if len(pos_b) > 2**31 - 1:
                pos_col = pa.array(
                    [pos_b[p_offs[i]:p_offs[i + 1]] for i in range(n_terms)],
                    pa.binary())
            else:
                pos_col = pa.BinaryArray.from_buffers(
                    pa.binary(), n_terms,
                    [None, pa.py_buffer(p_offs.astype(np.int32).tobytes()),
                     pa.py_buffer(pos_b)])
            blk_off_pos = ((pos_offs[blk_starts]
                            - pos_offs[starts[blk_term]])
                           if blk_starts.size else np.empty(0, np.int64))
            pos_cols = {"positions": pos_col,
                        "block_off_pos": _blk_list(blk_off_pos, pa.int64())}
            bytes_postings += int(p_offs[-1] - p_offs[0]) if n_terms else 0

        postings_tbl = pa.table(
            {
                "term": term_col,
                "df": pa.array(lens_term.astype(np.int64), pa.int64()),
                "doc_ids": _bin_col(doc_buf, cum_d),
                "tfs": _bin_col(tf_buf, cum_t),
                "block_last_docid": _blk_list(
                    docs_sorted[blk_ends - 1] if blk_starts.size
                    else np.empty(0, np.int64), pa.int64()),
                "block_off_docs": _blk_list(
                    cum_d[blk_starts] - cum_d[starts[blk_term]]
                    if blk_starts.size else np.empty(0, np.int64),
                    pa.int64()),
                "block_off_tfs": _blk_list(
                    cum_t[blk_starts] - cum_t[starts[blk_term]]
                    if blk_starts.size else np.empty(0, np.int64),
                    pa.int64()),
                "block_max_tf": _blk_list(blk_max_tf, pa.int32()),
                "block_min_dl": _blk_list(blk_min_dl, pa.int32()),
                "block_first_docid": _blk_list(
                    docs_sorted[blk_starts] if blk_starts.size
                    else np.empty(0, np.int64), pa.int64()),
                **pos_cols,
            }
        )

        # --- per-(site, term) document frequency (reference A2) ----------
        st_key = site_idx_doc[rows_sorted] * np.int64(len(term_dict)) \
            + term_sorted
        uniq_st, st_counts = np.unique(st_key, return_counts=True)
        if uniq_st.size:
            nt = np.int64(len(term_dict))
            dict_site = pc.take(pa.array(sites_dict, pa.string()),
                                pa.array(uniq_st // nt))
            dict_term = pc.take(pa.array(term_dict, pa.string()),
                                pa.array(uniq_st % nt))
        else:
            dict_site = pa.array([], pa.string())
            dict_term = pa.array([], pa.string())
        dict_tbl = pa.table(
            {
                "site": dict_site,
                "term": dict_term,
                "df": pa.array(st_counts.astype(np.int64), pa.int64()),
            }
        )

        docs_cols = {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "url": g["url"],
            "site": g["site"],
            "path": g["path"],
            "title": g["title"],
            "doc_len": g["doc_len"],
            # the reference stores the fetch status per page (Page.code,
            # model/Page.java:28-30, incl. 102/415/500 sentinels); a
            # Common-Crawl-style input may carry it as a `code` column —
            # pass it through, else 200 stands in for batch input
            "code": (pc.cast(g["code"], pa.int32())
                     if "code" in g.column_names
                     else pa.array(np.full(n_docs, 200, dtype=np.int32))),
        }
        if cfg.store_doc_text and "whole_text" in g.column_names:
            docs_cols["whole_text"] = g["whole_text"]
        # user passthrough columns (e.g. an upstream id) ride along into the
        # doc metadata — the engine's extension surface for per-doc payloads
        known = {"url", "warc_ts", "html", "part", "site", "path", "title",
                 "doc_len", "terms", "tfs", "poss", "text_x", "whole_text",
                 "text", "lang"}
        for name in g.column_names:
            if name not in known and name not in docs_cols:
                docs_cols[name] = g[name]
        docs_tbl = pa.table(docs_cols)

        # --- atomic commit ----------------------------------------------
        final_dir = os.path.join(index_dir, part_dirname(part))
        tmp_dir = os.path.join(index_dir, f".tmp-{part_dirname(part)}-{uuid.uuid4().hex[:8]}")
        os.makedirs(tmp_dir, exist_ok=True)
        pq.write_table(docs_tbl, os.path.join(tmp_dir, "docs.parquet"))
        # small row groups: term-sorted + min/max stats => point lookups read
        # one row group instead of the whole segment (streaming query path)
        pq.write_table(postings_tbl, os.path.join(tmp_dir, "postings.parquet"),
                       row_group_size=1024)
        pq.write_table(dict_tbl, os.path.join(tmp_dir, "dict.parquet"))
        wall = time.monotonic() - t0
        write_manifest(
            tmp_dir,
            PartManifest(
                part=part,
                status="done",
                input_fingerprint=f"{int(fp):016x}",
                config_hash=config_hash,
                input_rows=input_rows,
                n_docs=n_docs,
                n_terms=n_terms,
                n_postings=int(term_sorted.size),
                total_tokens=int(doc_len_arr.sum()),
                bytes_postings=bytes_postings,
                bytes_docs=docs_tbl.nbytes,
                wall_sec=round(wall, 4),
                engine_version=__version__,
                # numeric writer settings: merge_indexes re-encodes with the
                # SAME block size instead of inferring it from skip metadata
                extra={"block_size": cfg.block_size,
                       "store_positions": cfg.store_positions},
            ),
        )
        commit_part_dir(tmp_dir, final_dir)

        return pa.table(
            {
                "part": pa.array([part], pa.int32()),
                "n_docs": pa.array([n_docs], pa.int64()),
                "n_terms": pa.array([n_terms], pa.int64()),
                "n_postings": pa.array([int(term_sorted.size)], pa.int64()),
                "total_tokens": pa.array([int(doc_len_arr.sum())], pa.int64()),
                "bytes_postings": pa.array([bytes_postings], pa.int64()),
                "wall_sec": pa.array([wall], pa.float64()),
            }
        )
