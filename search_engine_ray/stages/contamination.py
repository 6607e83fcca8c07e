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
                          max_broadcast: int = 50_000_000) -> rd.Dataset:
    """Corpus-internal duplicate-passage signal (the word-n-gram relaxation
    of suffix-array substring dedup, Lee et al. 2021 "Deduplicating Training
    Data Makes Language Models Better"): for each document, how many of its
    word-``n``-gram window positions carry a gram that also occurs in at
    least one OTHER document of the corpus.

    Two passes:

    1. per-doc DISTINCT gram hashes stream into one ``groupby(gram)``
       document-frequency count; grams with df >= 2 form the duplicate set,
       collected and ``ray.put`` once (guard: ``max_broadcast``; at corpus
       sizes where the duplicate-gram set exceeds worker heaps, fall back to
       hash-partitioning the positional gram table by gram hash and joining
       the df table there instead of broadcasting).
    2. ALL window positions re-derive per batch (cheaper than shuffling
       them: the gram table is ~#words rows) and probe the sorted duplicate
       set with one ``searchsorted`` per batch.

    Output: ``(doc_id, n_grams, n_dup_grams, dup_gram_frac)`` for every
    input document — docs shorter than ``n`` words get ``(0, 0, 0.0)``.
    ``dup_gram_frac`` is the single division n_dup/n_grams (bit-exact vs
    the SQL oracle).
    """
    from ray.data.aggregate import Sum

    narrow = corpus.select_columns([id_col, text_col])

    def distinct_grams(batch: pa.Table) -> pa.Table:
        _, sh, _ = _batch_shingles(batch[text_col].to_pylist(), n)
        return pa.table({"gram": pa.array(sh.view(np.int64), pa.int64()),
                         "one": pa.array(np.ones(sh.size, np.int64))})

    df = narrow.map_batches(distinct_grams, batch_format="pyarrow") \
        .groupby("gram").aggregate(Sum("one", alias_name="nd"))
    dup = df.filter(expr="nd >= 2").select_columns(["gram"]).take_all()
    if len(dup) > max_broadcast:
        raise ValueError(
            f"duplicate-gram set has {len(dup)} grams > max_broadcast="
            f"{max_broadcast}; broadcast would not fit worker heaps. Fall "
            "back to hash-partitioning the positional gram table by gram "
            "hash and joining the df table there, or raise max_broadcast.")
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
