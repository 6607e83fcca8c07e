"""Benchmark harness (driver contract).

Default mode: run the headline pipelines over ``$GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and print ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": ..., "num_cpus": N}

``--scaling``: run the identical index-build job twice in FRESH processes at
two parallelism levels (num_cpus=8 and num_cpus=32) over the same input and
report docs/s at both plus scaling efficiency ``(tp_hi/tp_lo)/(hi/lo)``
(the sandbox substitute for the north rule's N->4N-node criterion; see
BASELINE.md).  The scaling corpus is a larger seeded synthetic page table
(SURVEY.md corpus generator) so per-doc compute, not fixed session startup,
dominates.

Only this script owns the Ray session (ray.init/shutdown).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
DEFAULT_SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# 6.4M docs (~9 GB parquet): large enough that the fixed per-execution
# envelope (~10 s: executor startup, actor spawn, ramp/drain tails —
# measured width-independent) is amortized, as it is in the 100-TB
# regime the scaling criterion models. One-time generation, cached.
SCALING_DOCS = int(os.environ.get("GRAFT_SCALING_DOCS", "6400000"))
SCALING_LEVELS = tuple(
    int(x) for x in os.environ.get("GRAFT_SCALING_LEVELS", "8,32").split(","))
SCALING_REPEATS = int(os.environ.get("GRAFT_SCALING_REPEATS", "3"))


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _fresh_dir(path: str) -> str:
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    return path


def _build_flagship(sf_dir: str, index_dir: str) -> dict:
    """Fresh (non-resumed) flagship index build; returns timing + counters."""
    from search_engine_ray.config import IndexBuildConfig
    from search_engine_ray.corpus import pages_from_documents
    from search_engine_ray.pipelines.build import build_index

    import pyarrow.parquet as pq

    n_hint = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    _fresh_dir(index_dir)
    t0 = time.perf_counter()
    res = build_index(
        pages_from_documents(sf_dir), index_dir,
        IndexBuildConfig(morphology="default", target_docs_per_partition=1000),
        num_docs_hint=n_hint, resume=False)
    wall = time.perf_counter() - t0
    return {"wall_s": wall, "n_docs": res.n_docs, "docs_per_s": res.n_docs / wall}


def _query_terms(index_dir: str, n: int = 8) -> list[list[str]]:
    """Pick query term lists from the built index's global dictionary:
    mix of head and mid-df terms, deterministic."""
    import pyarrow.parquet as pq

    from search_engine_ray.pipelines.build import GLOBAL_DICT_DIR

    t = pq.read_table(os.path.join(index_dir, GLOBAL_DICT_DIR))
    pairs = sorted(zip(t["term"].to_pylist(), t["df"].to_pylist()),
                   key=lambda x: (-x[1], x[0]))
    terms = [p[0] for p in pairs]
    if not terms:
        return []
    head = terms[: max(1, len(terms) // 4)]
    mid = terms[len(terms) // 3: len(terms) // 3 + max(1, len(terms) // 4)] or head
    qs: list[list[str]] = []
    for i in range(n):
        if i % 3 == 0:
            qs.append([head[i % len(head)]])
        elif i % 3 == 1:
            qs.append([head[i % len(head)], mid[i % len(mid)]])
        else:
            qs.append([mid[i % len(mid)], mid[(i + 1) % len(mid)],
                       head[(i + 2) % len(head)]])
    return qs


def _bench_queries(index_dir: str) -> dict:
    """BM25 (WAND) and reference-scorer latency over the built index."""
    from search_engine_ray.pipelines.query import IndexReader

    ix = IndexReader(index_dir, preload=True)
    term_sets = _query_terms(index_dir)
    lat_bm25, lat_ref = [], []
    for terms in term_sets:
        q = " ".join(terms)
        ix.search(q, scorer="bm25", with_snippets=False)  # warm
        for _ in range(3):
            t0 = time.perf_counter()
            ix.search(q, scorer="bm25", with_snippets=False)
            lat_bm25.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            ix.search(q, scorer="reference", with_snippets=False)
            lat_ref.append(time.perf_counter() - t0)
    # partition-parallel scatter/gather path (pipelines/scatter.py): same
    # queries through the searcher-actor pool, rank-identical results
    from search_engine_ray.pipelines.scatter import ScatterIndex

    lat_scatter = []
    with ScatterIndex(index_dir, preload=True) as sc:
        for terms in term_sets:
            q = " ".join(terms)
            sc.search(q, scorer="bm25", with_snippets=False)  # warm
            for _ in range(3):
                t0 = time.perf_counter()
                sc.search(q, scorer="bm25", with_snippets=False)
                lat_scatter.append(time.perf_counter() - t0)
    return {
        "bm25_p50_s": statistics.median(lat_bm25) if lat_bm25 else 0.0,
        "bm25_p95_s": (sorted(lat_bm25)[int(0.95 * (len(lat_bm25) - 1))]
                       if lat_bm25 else 0.0),
        "ref_p50_s": statistics.median(lat_ref) if lat_ref else 0.0,
        "scatter_bm25_p50_s": (statistics.median(lat_scatter)
                               if lat_scatter else 0.0),
        "n_queries": len(term_sets),
    }


HEADLINE = [
    # name -> queries() key (timed end-to-end incl. consuming the result)
    "tf", "dictionary", "search_bm25", "search_batch", "exact_dedup",
    "minhash_lsh", "simhash_dedup", "knn_cosine", "knn_ivf",
    "events_window", "sessionize", "doc_quality", "approx_users_daily",
    "users_daily",
    # round-2 operators
    "dedup_clusters", "heavy_hitters", "events_analytic",
    "event_value_quantiles", "events_range_join", "decontaminate",
    "top_docs_per_lang", "sample_stratified", "lineitem_pricing",
    "pii_scrub", "line_dedup", "doc_repetition", "customer_orders",
    "dup_ngrams", "doc_ppl", "bpe_tokenize", "pagerank_suppliers",
    "embedding_dup_blocked", "lineitem_rollup", "event_value_hist",
    "custkeys_negative_balance", "urgent_lineitems_bloom", "image_meta_png",
    "image_meta_jpeg", "events_rolling", "events_funnel",
    "tfidf_topk", "sample_weighted", "user_event_pivot", "user_top_event",
    # round-3 operators
    "events_rolling_time", "events_rank", "lineitem_cube", "kmeans_embed",
    "similar_docs", "search_phrase", "search_phrase_idx", "warc_roundtrip",
    "customer_orders_skew", "image_dhash", "audio_features",
    "doc_cosine_pairs", "user_retention", "user_event_seq", "doc_linreg",
    "knn_pq", "dictionary_incremental", "jsonl_roundtrip", "csv_roundtrip",
    "orders_except_all", "events_by_hour", "events_profile", "customer_orders_full", "events_anomaly",
    # round-4 operators
    "image_dup_pairs", "sparse_stop_pairs", "events_profile_hll",
    "search_phrase_scatter", "image_meta_jpeg420",
    # round-5 operators
    "image_dup_clusters", "image_meta_jpeg_prog", "events_first_last",
    "event_cents_quantiles_global", "tpch_q3",
    "substring_dedup", "substring_dedup_clean", "event_percentile_cont",
    "event_type_percentile_cont", "ngram_containment",
    "jsonl_gz_roundtrip", "nfc_normalize_docs", "events_pushdown",
    "pack_docs", "warc_extract_tf", "search_near", "search_prefix",
    "search_andnot", "sample_k_per_lang",
    # round-5 second half: composed curation + TPC-H joins + reshape
    "curate_corpus", "lineitem_unpivot", "tpch_q5", "tpch_q10", "tpch_q18",
    "promo_revenue_monthly", "event_type_corr", "props_key_stats",
    "events_user_anomaly",
    "tpch_q4", "tpch_q6", "tpch_q12", "tpch_q19", "events_type_mad",
    "events_spearman", "events_iso_weekly", "customer_orders_merge",
    "tpch_q7", "embedding_dim_stats", "jaccard_prefix",
    "event_type_percentile_refined", "audio_spectral",
    "tpch_q13", "tpch_q16", "tpch_q17", "tpch_q22",
    "tpch_q15", "tpch_q11",
    "dedup_survivors", "quality_filter_gopher", "dataset_split",
    "orc_roundtrip", "partitioned_parquet_roundtrip",
    "events_watermark", "minhash_survivors", "search_or", "tpch_q9",
    "tpch_q2", "tpch_q8", "embedding_centroids", "events_winsorized",
    "tpch_q21", "tpch_q20", "search_fuzzy", "events_global_rank",
    "image_meta_gif", "fold_accents_docs", "doc_ppl_bigram",
    "lang_pmi_keywords", "term_drift", "events_rolling_distinct",
    "events_quarantine", "events_entropy", "doc_compression_ratio",
    "audio_resample", "event_transitions", "supplier_triangles",
    "events_global_ntile",
]


def _consume(obj) -> int:
    """Fully execute a lazy result; returns row count."""
    try:
        import ray.data as rd

        if isinstance(obj, rd.Dataset):
            n = 0
            for b in obj.iter_batches(batch_format="pyarrow", batch_size=8192):
                n += b.num_rows
            return n
    except ImportError:
        pass
    return len(obj)


def run_default(sf_dir: str, num_cpus: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    try:
        timings: dict[str, float] = {}
        t_all = time.perf_counter()

        index_dir = "/tmp/serx_bench_index"
        b = _build_flagship(sf_dir, index_dir)
        timings["index_build"] = round(b["wall_s"], 4)

        qb = _bench_queries(index_dir)
        timings["query_bm25_p50"] = round(qb["bm25_p50_s"], 6)
        timings["query_bm25_p95"] = round(qb["bm25_p95_s"], 6)
        timings["query_ref_p50"] = round(qb["ref_p50_s"], 6)
        timings["query_scatter_p50"] = round(qb["scatter_bm25_p50_s"], 6)

        import __ray_entry__ as entrymod

        qmap = entrymod.queries()
        for name in HEADLINE:
            fn = qmap[name]
            t0 = time.perf_counter()
            _consume(fn(sf_dir))
            timings[name] = round(time.perf_counter() - t0, 4)

        total = time.perf_counter() - t_all

        # same-window host-delivery probe (pure-register spin): BENCH_rN
        # files are compared ACROSS rounds, and the hypervisor's cycle
        # delivery drifts 15-30% window to window (BASELINE.md) — this
        # one number lets a reader normalize round-over-round walls
        @ray.remote
        def _spin(n: int) -> float:
            t0 = time.perf_counter()
            x = 0
            for _ in range(n):
                x = (x * 1103515245 + 12345) & 0x7FFFFFFF
            return time.perf_counter() - t0

        n_spin = 20_000_000
        ray.get([_spin.remote(n_spin) for _ in range(num_cpus)])  # warm
        base = min(ray.get(_spin.remote(n_spin)) for _ in range(3))
        ts = ray.get([_spin.remote(n_spin) for _ in range(num_cpus)])
        eff_cores = round(num_cpus * base / (sum(ts) / len(ts)), 2)

        # The driver's BENCH capture truncates long stdout (r3 and r4 both
        # recorded "parsed": null with the headline walls cut off), so the
        # ONE stdout line stays compact: headline metrics + a dozen flagship
        # walls.  The full per-entry map goes to a committed repo artifact.
        payload = {
            "metric": "headline_pipelines_wall",
            "value": round(total, 3),
            "unit": "sec",
            "sf": _sf_of(sf_dir),
            "num_cpus": num_cpus,
            "index_docs_per_s": round(b["docs_per_s"], 1),
            "index_n_docs": b["n_docs"],
            "spin_effective_cores": eff_cores,
            # cross-round comparability: value covers THIS headline set
            # (ADVICE r4: the set grows each round, readers must detect it)
            "headline_set": "r5r",   # r5q + Q21/Q20 + fuzzy term query
            "headline_n": len(HEADLINE),
            "detail_file": "BENCH_QUERIES.json",
        }
        try:
            with open(os.path.join(REPO, "BENCH_QUERIES.json"), "w") as f:
                json.dump({**payload, "queries": timings}, f, indent=1,
                          sort_keys=True)
                f.write("\n")
        except OSError:
            pass  # read-only checkout: stdout still carries the headline
        compact = [
            "index_build", "query_bm25_p50", "query_bm25_p95",
            "query_ref_p50", "query_scatter_p50", "tf", "dictionary",
            "search_bm25", "search_batch", "exact_dedup", "minhash_lsh",
            "doc_cosine_pairs", "events_analytic", "events_rolling",
        ]
        payload["queries"] = {k: timings[k] for k in compact if k in timings}
        return payload
    finally:
        ray.shutdown()


# --------------------------------------------------------------------------
# scaling mode
# --------------------------------------------------------------------------

def _gen_shard(args: tuple) -> None:
    path, i, n, start = args
    import pyarrow.parquet as pq

    from search_engine_ray.corpus import synth_pages_table

    t = synth_pages_table(n, seed=42 + i, num_sites=50,
                          words_per_doc=300, dup_every=0, start=start)
    pq.write_table(t, os.path.join(path, f"pages_{i:04d}.parquet"))


def _scaling_input(path: str, num_docs: int) -> str:
    """Seeded synthetic page corpus, generated once (process-parallel),
    reused by both scaling legs.  Many ~2k-doc shards so file-level read
    parallelism exceeds the widest CPU level."""
    marker = os.path.join(path, f".ok_{num_docs}")
    if os.path.exists(marker):
        return path
    _fresh_dir(path)
    from concurrent.futures import ProcessPoolExecutor

    shard = 2_000
    jobs = [(path, i, min(shard, num_docs - start), start)
            for i, start in enumerate(range(0, num_docs, shard))]
    with ProcessPoolExecutor(max_workers=min(16, os.cpu_count() or 4)) as ex:
        list(ex.map(_gen_shard, jobs, chunksize=1))
    open(marker, "w").close()
    return path


def run_build_worker(input_dir: str, out_dir: str, num_cpus: int) -> None:
    """Fresh-process leg of the scaling experiment (one parallelism level)."""
    import logging
    import ray

    # phase walls (build.py logs at INFO) go to the leg's stderr so the
    # Amdahl serial term stays diagnosable per run
    logging.getLogger("search_engine_ray").setLevel(logging.INFO)
    logging.basicConfig(level=logging.WARNING)

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    try:
        import ray.data as rd

        from search_engine_ray.config import IndexBuildConfig
        from search_engine_ray.pipelines.build import build_index

        import glob

        import pyarrow.parquet as pq

        n_hint = sum(pq.read_metadata(f).num_rows
                     for f in glob.glob(os.path.join(input_dir, "*.parquet")))
        # ~4k docs (~20 MB) per block: Ray's default coalescing packed the
        # 6.4M-doc corpus into 28k-row blocks, ballooning each fused chain
        # task's working set to ~300-500 MB and slowing phase A ~2x
        # (allocator/page churn); small blocks also pipeline better
        pages = rd.read_parquet(input_dir,
                                override_num_blocks=max(1, n_hint // 4000))
        _fresh_dir(out_dir)
        # partition count fixed by the INPUT (≈32 parts), not the CPU level,
        # so both legs do identical work and produce identical output
        # small cache-friendly partitions, coarse exchange groups (~32),
        # tmpfs exchange (single-node analog of per-node NVMe shuffle dirs)
        n_parts = max(1, (n_hint + 12_499) // 12_500)
        # Exchange-group count capped at 64: each write batch appends one
        # run file PER GROUP it touches, so rows-per-file is
        # run_write_batch_size / n_groups — groups growing with the input
        # (512 at 6.4M docs) shredded the exchange into ~30-row parquet
        # files and made the write side 10x slower than linear.  64 groups
        # x 64k-row batches keeps run files ~1000 rows at any input size
        # (per NODE at multi-node scale, since each node runs its own
        # writers against node-local scratch).
        cfg = IndexBuildConfig(morphology="default",
                               target_docs_per_partition=12_500,
                               exchange_group=max(1, n_parts // 64),
                               lemmatizer_batch_size=1024,
                               extract_batch_size=1024,
                               run_write_batch_size=65536,
                               exchange_dir=f"/dev/shm/serx_exchange_{num_cpus}")
        t0 = time.perf_counter()
        res = build_index(pages, out_dir, cfg,
                          num_docs_hint=n_hint, resume=False)
        wall = time.perf_counter() - t0
        print(json.dumps({"num_cpus": num_cpus, "wall_s": wall,
                          "n_docs": res.n_docs,
                          "docs_per_s": res.n_docs / wall}))
    finally:
        ray.shutdown()


def run_spin_worker(width: int) -> None:
    """Fresh-process effective-core probe at one width (pure-register spin,
    zero memory traffic).  Run immediately before a scaling leg, it measures
    what the HOST is delivering in that window — the per-pair isolation
    evidence for the N->4N criterion (hypervisor cycle stealing at width 32
    is 14-30% and drifts on a minutes timescale; see BASELINE.md)."""
    import ray

    ray.init(address="local", num_cpus=width, include_dashboard=False)
    try:
        @ray.remote
        def spin(n: int) -> float:
            t0 = time.perf_counter()
            x = 0
            for _ in range(n):
                x = (x * 1103515245 + 12345) & 0x7FFFFFFF
            return time.perf_counter() - t0

        N = 20_000_000
        ray.get([spin.remote(N) for _ in range(width)])  # warm workers
        base = min(ray.get(spin.remote(N)) for _ in range(3))
        means = []
        for _ in range(2):
            ts = ray.get([spin.remote(N) for _ in range(width)])
            means.append(sum(ts) / len(ts))
        print(json.dumps({"width": width,
                          "effective_cores": round(
                              width * base / min(means), 2)}))
    finally:
        ray.shutdown()


def run_membw_worker(width: int) -> None:
    """Fresh-process aggregate DRAM-bandwidth probe at one width (numpy
    triad, ~192 MB working set per worker — far beyond LLC).  The spin
    probe normalizes CPU-cycle stealing but is blind to MEMORY-bandwidth
    interference (zero memory traffic); a bandwidth-bound build leg sees
    both.  Run in the same window as a scaling leg, the hi/lo bandwidth
    ratio is the DRAM-side ceiling any bandwidth-bound job could reach."""
    import numpy as np
    import ray

    ray.init(address="local", num_cpus=width, include_dashboard=False)
    try:
        N = 8_000_000  # 64 MB per array; 3 arrays per worker
        PASSES = 6

        @ray.remote
        def triad(seed: int) -> float:
            rng = np.random.RandomState(seed)
            b = rng.rand(N)
            c = rng.rand(N)
            a = np.empty_like(b)
            t0 = time.perf_counter()
            for _ in range(PASSES):
                np.multiply(c, 0.5, out=a)
                a += b
            return time.perf_counter() - t0

        ray.get([triad.remote(i) for i in range(width)])  # warm + page in
        best = None
        for rep in range(2):
            t0 = time.perf_counter()
            ray.get([triad.remote(1000 + rep * width + i)
                     for i in range(width)])
            wall = time.perf_counter() - t0
            gbps = width * PASSES * 3 * N * 8 / wall / 1e9
            best = max(best or 0.0, gbps)
        print(json.dumps({"width": width, "membw_gbps": round(best, 2)}))
    finally:
        ray.shutdown()


def run_scaling(sf_dir: str) -> dict:
    input_dir = _scaling_input(
        f"/tmp/serx_scaling_pages_{SCALING_DOCS // 1000}k", SCALING_DOCS)
    # Each leg runs SCALING_REPEATS times and the BEST wall is used: this VM
    # shares hardware (writeback storms, neighbor noise cause up to 2x wall
    # variance between identical runs), and best-of-N is the standard way to
    # measure the code rather than the neighbors.  All runs are reported.
    # Legs are INTERLEAVED (lo, hi, lo, hi, ...) rather than all-lo-then-
    # all-hi: this VM's noise drifts on a minutes timescale, so adjacent
    # lo/hi runs see comparable conditions and per-round efficiencies are
    # meaningful alongside the best-wall headline.
    runs_by_level: dict[int, list] = {c: [] for c in SCALING_LEVELS}
    spin_by_level: dict[int, list] = {c: [] for c in SCALING_LEVELS}
    membw_by_level: dict[int, list] = {c: [] for c in SCALING_LEVELS}
    def _sub_json(argv: list[str], retries: int = 1):
        # A transient Ray-init / port / OOM hiccup in ONE probe must not
        # discard a 30-minute run (it did once: a --membw-worker subprocess
        # died under check=True and the whole 5-rep result was lost).
        # Retry once; a probe that still fails returns None and the caller
        # records NaN (the rep's ceiling normalization skips it).
        for attempt in range(retries + 1):
            try:
                out = subprocess.run(
                    [sys.executable, os.path.join(REPO, "bench.py")] + argv,
                    capture_output=True, text=True, check=True, cwd=REPO)
                return json.loads(out.stdout.strip().splitlines()[-1])
            except (subprocess.CalledProcessError, ValueError,
                    IndexError) as exc:
                print(f"probe {argv[0]} attempt {attempt} failed: {exc}",
                      file=sys.stderr)
                time.sleep(10)
        return None

    for _ in range(max(1, SCALING_REPEATS)):
        for cpus in SCALING_LEVELS:
            # flush dirty pages (corpus gen / previous leg) so delayed
            # writeback doesn't steal I/O bandwidth from the measurement
            subprocess.run(["sync"], check=False)
            time.sleep(5)
            # same-window host-ceiling probes (fresh process, same width):
            # spin = CPU-cycle delivery; membw = aggregate DRAM bandwidth
            spin = _sub_json(["--spin-worker", "--num-cpus", str(cpus)])
            spin_by_level[cpus].append(
                spin["effective_cores"] if spin else float("nan"))
            mbw = _sub_json(["--membw-worker", "--num-cpus", str(cpus)])
            membw_by_level[cpus].append(
                mbw["membw_gbps"] if mbw else float("nan"))
            # the measurement itself gets one retry too, but a double
            # failure here IS fatal: a missing build leg breaks the pairing
            run = _sub_json(
                ["--build-worker", "--input", input_dir,
                 "--out", f"/tmp/serx_scaling_index_{cpus}",
                 "--num-cpus", str(cpus)])
            if run is None:
                raise RuntimeError(
                    f"build leg at {cpus} cpus failed twice; aborting")
            runs_by_level[cpus].append(run)
    legs = {c: min(rs, key=lambda r: r["wall_s"])
            for c, rs in runs_by_level.items()}
    all_runs = {str(c): [round(r["wall_s"], 2) for r in rs]
                for c, rs in runs_by_level.items()}
    lo, hi = SCALING_LEVELS
    pair_effs = [
        round((h["docs_per_s"] / l["docs_per_s"]) / (hi / lo), 3)
        for l, h in zip(runs_by_level[lo], runs_by_level[hi])
    ]
    # Per-pair host ceiling from the same-window spin probes: the raw
    # efficiency any software could have reached in that rep's windows.
    pair_ceilings = [
        round((ch / cl) / (hi / lo), 3)
        for cl, ch in zip(spin_by_level[lo], spin_by_level[hi])
    ]
    pair_effs_normalized = [
        round(e / c, 3) for e, c in zip(pair_effs, pair_ceilings)]
    # DRAM-side ceiling: how much MORE aggregate bandwidth the hi width
    # actually gets in that window.  A fully bandwidth-bound job cannot
    # exceed this no matter how it is written; the build's raw efficiency
    # sitting ABOVE it is direct evidence of partial compute-boundedness.
    pair_bw_ceilings = [
        round((bh / bl) / (hi / lo), 3)
        for bl, bh in zip(membw_by_level[lo], membw_by_level[hi])
    ]
    eff = (legs[hi]["docs_per_s"] / legs[lo]["docs_per_s"]) / (hi / lo)
    identical = _indexes_identical(f"/tmp/serx_scaling_index_{lo}",
                                   f"/tmp/serx_scaling_index_{hi}")
    return {
        "metric": "index_build_scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "queries": {
            f"build_docs_per_s_cpus{lo}": round(legs[lo]["docs_per_s"], 1),
            f"build_docs_per_s_cpus{hi}": round(legs[hi]["docs_per_s"], 1),
            f"build_wall_s_cpus{lo}": round(legs[lo]["wall_s"], 2),
            f"build_wall_s_cpus{hi}": round(legs[hi]["wall_s"], 2),
        },
        "sf": _sf_of(sf_dir),
        "num_cpus": max(SCALING_LEVELS),
        "scaling_docs": SCALING_DOCS,
        "levels": list(SCALING_LEVELS),
        "all_wall_s": all_runs,
        "pair_efficiencies": pair_effs,
        "spin_effective_cores": {str(c): v for c, v in spin_by_level.items()},
        "membw_gbps": {str(c): v for c, v in membw_by_level.items()},
        "pair_host_ceilings": pair_ceilings,
        "pair_membw_ceilings": pair_bw_ceilings,
        "pair_efficiencies_normalized": pair_effs_normalized,
        "median_normalized_efficiency": round(
            statistics.median(pair_effs_normalized), 3)
        if pair_effs_normalized else None,
        # determinism across parallelism levels (SURVEY §5.5): both legs'
        # segment payloads must be byte-identical
        "indexes_identical": identical,
    }


def run_calibration() -> dict:
    """Pure-register spin loop at each scaling width: measures what the
    HOST actually delivers, independent of this engine.  A loop with zero
    memory traffic that inflates at higher widths proves hypervisor cycle
    oversubscription — ``effective_cores[w] = w * t_serial / t_mean(w)``
    is then the PHYSICAL ceiling any software (including a perfect
    embarrassingly-parallel job) can reach on this box.  BASELINE.md cites
    this as the isolation evidence for the scaling criterion."""
    import ray

    ray.init(address="local", num_cpus=max(SCALING_LEVELS),
             include_dashboard=False)
    try:
        @ray.remote
        def spin(n: int) -> float:
            t0 = time.perf_counter()
            x = 0
            for _ in range(n):
                x = (x * 1103515245 + 12345) & 0x7FFFFFFF
            return time.perf_counter() - t0

        N = 20_000_000
        ray.get(spin.remote(N))  # warm a worker
        base = min(ray.get(spin.remote(N)) for _ in range(3))
        eff_cores = {}
        for width in SCALING_LEVELS:
            means = []
            for _ in range(3):
                ts = ray.get([spin.remote(N) for _ in range(width)])
                means.append(sum(ts) / len(ts))
            eff_cores[width] = round(width * base / min(means), 2)
        lo, hi = SCALING_LEVELS
        return {
            "metric": "cpu_calibration_effective_cores",
            "value": eff_cores[hi],
            "unit": "cores",
            "queries": {f"effective_cores_{w}": v
                        for w, v in eff_cores.items()},
            "sf": -1.0,
            "num_cpus": hi,
            "spin_serial_s": round(base, 3),
            # ceiling for (tp_hi/tp_lo)/(hi/lo) on THIS host
            "physical_efficiency_ceiling": round(
                (eff_cores[hi] / eff_cores[lo]) / (hi / lo), 3),
        }
    finally:
        ray.shutdown()


def _indexes_identical(a: str, b: str) -> bool:
    import glob
    import hashlib

    def digest(root: str) -> str:
        h = hashlib.blake2b(digest_size=16)
        for f in sorted(glob.glob(os.path.join(root, "part=*", "*.parquet"))):
            h.update(os.path.relpath(f, root).encode())
            with open(f, "rb") as fh:
                h.update(hashlib.blake2b(fh.read(), digest_size=16).digest())
        return h.hexdigest()

    try:
        return digest(a) == digest(b)
    except OSError:
        return False


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--calibrate", action="store_true",
                    help="pure-spin effective-core measurement at the "
                         "scaling widths (host cycle-delivery ceiling)")
    ap.add_argument("--build-worker", action="store_true")
    ap.add_argument("--membw-worker", action="store_true",
                    help="aggregate DRAM-bandwidth probe at --num-cpus")
    ap.add_argument("--spin-worker", action="store_true",
                    help="internal: single-width effective-core probe")
    ap.add_argument("--input")
    ap.add_argument("--out")
    ap.add_argument("--num-cpus", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    args = ap.parse_args()

    if args.build_worker:
        if not (args.input and args.out):
            ap.error("--build-worker requires --input and --out")
        run_build_worker(args.input, args.out, args.num_cpus)
        return
    if args.spin_worker:
        run_spin_worker(args.num_cpus)
        return
    if args.membw_worker:
        run_membw_worker(args.num_cpus)
        return
    if args.calibrate:
        result = run_calibration()
    elif args.scaling:
        result = run_scaling(args.sf_dir)
    else:
        result = run_default(args.sf_dir, args.num_cpus)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
