"""Benchmark decontamination: flag corpus documents that share word-n-gram
shingles with a (small) benchmark/eval set.

The standard LLM-training hygiene step (e.g. GPT-3 appendix C, PaLM §C):
any training document with n-gram overlap against an eval benchmark is
flagged/dropped so the benchmark stays held out.  The reference engine has
no analog (it indexes everything it crawls); this belongs to the
training-data operator family of SURVEY §2.11.

Scale shape: the benchmark side is SMALL by construction (eval sets are
MBs), so its distinct shingle-hash set is collected once, sorted, and
``ray.put`` — every batch task does one zero-copy ``searchsorted``
membership probe per shingle.  The corpus side streams through one
stateless vectorized ``map_batches``; no shuffle at all.

Membership is compared on 64-bit splitmix shingle hashes (the same
``_batch_shingles`` kernel as the dedup family); the SQL oracle compares
the shingle *strings*, so parity additionally witnesses hash-collision
freedom on the test corpus (collision odds ~n²/2⁶⁴).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from search_engine_ray.stages.dedup import _batch_shingles

__all__ = ["benchmark_shingles", "decontaminate", "duplicate_ngram_stats"]


def benchmark_shingles(bench_ds: rd.Dataset, *, n: int = 3,
                       text_col: str = "text") -> np.ndarray:
    """Sorted distinct shingle hashes of the (small) benchmark dataset.

    Collected to the driver on purpose: the benchmark side of a
    decontamination pass is small by definition.  Raises if it is not, so
    a misuse (pointing this at the corpus) fails loudly instead of OOMing.
    """
    hashes: list[np.ndarray] = []
    total = 0
    for batch in bench_ds.iter_batches(batch_format="pyarrow"):
        _, sh, _ = _batch_shingles(batch[text_col].to_pylist(), n)
        hashes.append(sh)
        total += sh.size
        if total > 50_000_000:
            raise ValueError(
                "benchmark shingle set exceeds 50M — this operator expects "
                "a small eval-set side; decontaminating against a corpus-"
                "sized side needs a shuffle join, not a broadcast")
    if not hashes:
        return np.empty(0, np.uint64)
    return np.unique(np.concatenate(hashes))


def decontaminate(corpus: rd.Dataset, bench_hashes: np.ndarray, *,
                  n: int = 3, text_col: str = "text",
                  id_col: str = "doc_id") -> rd.Dataset:
    """Per corpus document: how many of its distinct word-``n``-grams appear
    in the benchmark shingle set.

    Output: ``(doc_id, n_hits, contaminated)`` — one row per input document
    (``n_hits == 0`` rows included, so the caller can either filter or keep
    the audit trail).
    """
    bench_ref = ray.put(np.sort(np.asarray(bench_hashes, np.uint64)))

    def probe(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        ids = batch[id_col].to_numpy()
        docs, sh, _ = _batch_shingles(batch[text_col].to_pylist(), n)
        if bench.size and sh.size:
            pos = np.searchsorted(bench, sh)
            pos[pos == bench.size] = 0
            hit = bench[pos] == sh
        else:
            hit = np.zeros(sh.size, bool)
        n_hits = np.bincount(docs[hit], minlength=len(ids)).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_hits": pa.array(n_hits, pa.int64()),
            "contaminated": pa.array(n_hits > 0),
        })

    return corpus.map_batches(probe, batch_format="pyarrow")


def duplicate_ngram_stats(corpus: rd.Dataset, *, n: int = 5,
                          text_col: str = "text", id_col: str = "doc_id",
                          max_broadcast: int = 50_000_000,
                          force_shuffle: bool = False) -> rd.Dataset:
    """Corpus-internal duplicate-passage signal (the word-n-gram relaxation
    of suffix-array substring dedup, Lee et al. 2021 "Deduplicating Training
    Data Makes Language Models Better"): for each document, how many of its
    word-``n``-gram window positions carry a gram that also occurs in at
    least one OTHER document of the corpus.

    Two passes:

    1. per-doc DISTINCT gram hashes stream into one ``groupby(gram)``
       document-frequency count; grams with df >= 2 form the duplicate set.
    2. if the duplicate set fits a worker heap (``max_broadcast``, default
       50M grams = 400 MB) it is collected and ``ray.put`` once, and ALL
       window positions re-derive per batch (cheaper than shuffling them:
       the gram table is ~#words rows) to probe the sorted set with one
       ``searchsorted``.  Beyond the guard (or with ``force_shuffle``) the
       operator switches to the no-broadcast plan: the positional gram
       table hash-partitions by gram into a semi-join against the
       duplicate-gram table, per-doc hit counts come from one
       ``groupby(doc_id)``, and a final left join on ``doc_id`` restores
       zero-hit documents — nothing proportional to the duplicate set in
       any single process.

    Output: ``(doc_id, n_grams, n_dup_grams, dup_gram_frac)`` for every
    input document — docs shorter than ``n`` words get ``(0, 0, 0.0)``.
    ``dup_gram_frac`` is the single division n_dup/n_grams (bit-exact vs
    the SQL oracle, on either plan).
    """
    from ray.data.aggregate import Count, Sum

    narrow = corpus.select_columns([id_col, text_col])

    def distinct_grams(batch: pa.Table) -> pa.Table:
        _, sh, _ = _batch_shingles(batch[text_col].to_pylist(), n)
        return pa.table({"gram": pa.array(sh.view(np.int64), pa.int64()),
                         "one": pa.array(np.ones(sh.size, np.int64))})

    df = narrow.map_batches(distinct_grams, batch_format="pyarrow") \
        .groupby("gram").aggregate(Sum("one", alias_name="nd"))
    dup_ds = df.filter(expr="nd >= 2").select_columns(["gram"]).materialize()

    if force_shuffle or dup_ds.count() > max_broadcast:
        return _dup_ngram_stats_shuffle(narrow, dup_ds, n=n,
                                        text_col=text_col, id_col=id_col)

    dup = dup_ds.take_all()
    dup_sorted = np.sort(np.array([r["gram"] for r in dup], np.int64)
                         .view(np.uint64))
    ref = ray.put(dup_sorted)

    def count_positions(batch: pa.Table) -> pa.Table:
        bad = ray.get(ref)
        ids = batch[id_col].to_numpy()
        docs, sh, counts = _batch_shingles(
            batch[text_col].to_pylist(), n, distinct=False)
        if bad.size and sh.size:
            pos = np.searchsorted(bad, sh)
            pos[pos == bad.size] = 0
            hit = bad[pos] == sh
        else:
            hit = np.zeros(sh.size, bool)
        n_dup = np.bincount(docs[hit], minlength=len(ids)).astype(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            frac = np.where(counts > 0, n_dup / counts, 0.0)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_grams": pa.array(counts, pa.int64()),
            "n_dup_grams": pa.array(n_dup, pa.int64()),
            "dup_gram_frac": pa.array(frac, pa.float64()),
        })

    return narrow.map_batches(count_positions, batch_format="pyarrow")


def _dup_ngram_stats_shuffle(narrow: rd.Dataset, dup_ds: rd.Dataset, *,
                             n: int, text_col: str, id_col: str
                             ) -> rd.Dataset:
    """No-broadcast plan for :func:`duplicate_ngram_stats` (see its
    docstring): semi-join the positional gram table against the
    duplicate-gram table, count hits per doc, left-join back onto the
    per-doc totals so zero-hit documents keep their ``(n, 0, 0.0)`` row."""
    from ray.data.aggregate import Count

    from .relational import drop_empty_blocks, shuffle_hash_join

    def positions(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        docs, sh, _ = _batch_shingles(batch[text_col].to_pylist(), n,
                                      distinct=False)
        return pa.table({id_col: pa.array(ids[docs], pa.int64()),
                         "gram": pa.array(sh.view(np.int64), pa.int64())})

    # both join right sides derive from aggregates, which can pad their
    # output with schemaless empty blocks that crash the join key resolver
    dup_clean = drop_empty_blocks(dup_ds, empty_schema=pa.schema(
        [("gram", pa.int64())]))
    hits = shuffle_hash_join(
        narrow.map_batches(positions, batch_format="pyarrow"), dup_clean,
        on=("gram",), how="semi")
    per_doc_hits = drop_empty_blocks(
        hits.groupby(id_col).aggregate(Count(alias_name="n_dup_grams")),
        empty_schema=pa.schema([(id_col, pa.int64()),
                                ("n_dup_grams", pa.int64())]))

    def totals(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        _, _, counts = _batch_shingles(batch[text_col].to_pylist(), n,
                                       distinct=False)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "n_grams": pa.array(counts, pa.int64())})

    joined = shuffle_hash_join(
        narrow.map_batches(totals, batch_format="pyarrow"), per_doc_hits,
        on=(id_col,), how="left")

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        counts = batch["n_grams"].to_numpy()
        n_dup = pc.fill_null(batch["n_dup_grams"], 0) \
            .cast(pa.int64()).to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            frac = np.where(counts > 0, n_dup / counts, 0.0)
        return pa.table({
            id_col: batch[id_col],
            "n_grams": pa.array(counts, pa.int64()),
            "n_dup_grams": pa.array(n_dup, pa.int64()),
            "dup_gram_frac": pa.array(frac, pa.float64()),
        })

    return joined.map_batches(finish, batch_format="pyarrow")
