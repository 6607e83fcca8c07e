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

__all__ = ["benchmark_shingles", "decontaminate"]


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
