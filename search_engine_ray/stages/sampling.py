"""Deterministic sampling operators for training-data pipelines.

`ds.random_sample` is nondeterministic across runs and parallelism, which
makes sampled corpora unreproducible; these operators derive membership from
a multiplicative integer hash of a key column, so a sample is a pure
function of the data — stable across reruns, resumes, partitioning, and
cluster size, and exactly mirrorable in SQL for the oracle contract.

Scale shape: both operators are stateless vectorized ``map_batches`` (the
Bernoulli filter is embarrassingly parallel; the stratified variant bounds
the shuffle with the same partial-top-k trick as ``grouped_topk``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from search_engine_ray.stages.relational import grouped_topk

__all__ = ["hash_of_key", "bernoulli_sample", "stratified_sample",
           "weighted_sample_n"]

# Knuth's multiplicative hash constant (2^32 / phi); public domain folklore.
_KNUTH = 2654435761


def hash_of_key(key: np.ndarray, seed: int = 0) -> np.ndarray:
    """``(key * 2654435761 + seed) mod 2^32`` as uint32.

    Computed in int64 without wraparound so the identical expression is
    valid ANSI SQL (DuckDB raises on int64 overflow instead of wrapping, so
    parity requires staying inside int64: key < ~3.47e9).  For larger id
    spaces use the engine's blake2b-based ``stable_hash`` routing family —
    this hash exists for SQL-mirrorable sampling.
    """
    k = np.asarray(key, np.int64)
    if k.size and int(k.max(initial=0)) > (2**63 - 1) // _KNUTH:
        raise ValueError("key too large for overflow-free SQL-parity hash; "
                         "use stable_hash-based sampling instead")
    return ((k * _KNUTH + seed) % (1 << 32)).astype(np.uint32)


def bernoulli_sample(ds: rd.Dataset, *, key_col: str, p: float,
                     seed: int = 0) -> rd.Dataset:
    """Keep a row iff ``hash(key) < p * 2^32`` — a deterministic Bernoulli
    sample with rate ``p`` over the key distribution."""
    threshold = np.uint32(min(int(p * (1 << 32)), (1 << 32) - 1))

    def keep(batch: pa.Table) -> pa.Table:
        h = hash_of_key(batch[key_col].to_numpy(), seed)
        return batch.filter(pa.array(h < threshold))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(ds: rd.Dataset, *, strata_col: str, key_col: str,
                      n_per_stratum: int, seed: int = 0) -> rd.Dataset:
    """Exactly ``n`` rows per stratum (fewer if the stratum is smaller):
    the ``n`` rows with the smallest key hash — a uniform without-replacement
    draw per stratum, deterministic for any input order/parallelism.

    Output adds ``h`` (the sampling hash) and ``rank`` (1-based draw order
    within the stratum).
    """

    def add_hash(batch: pa.Table) -> pa.Table:
        h = hash_of_key(batch[key_col].to_numpy(), seed)
        return batch.append_column("h", pa.array(h.astype(np.int64), pa.int64()))

    return grouped_topk(ds.map_batches(add_hash, batch_format="pyarrow"),
                        group_col=strata_col, order_col="h", tie_col=key_col,
                        k=n_per_stratum, descending=False)


def weighted_sample_n(ds: rd.Dataset, *, key_col: str, weight_col: str,
                      n: int, seed: int = 0) -> rd.Dataset:
    """Exactly ``n`` rows drawn WITHOUT replacement with probability
    proportional to ``weight_col`` — Efraimidis–Spirakis priorities made
    deterministic: ``u = (hash(key) + 1) / 2^32+1`` in (0, 1), priority
    ``-ln(u) / w`` (an Exp(w) draw), keep the n smallest.  The use case is
    quality-weighted corpus resampling (weight = quality score / length):
    reproducible across reruns, resumes, and any parallelism, and exactly
    mirrorable in SQL.

    Rows with weight <= 0 are excluded (zero mass).  Scale shape: one
    stateless vectorized priority pass; the partial-top-k trick bounds the
    exchange to ≤n rows per block before a single tiny merge.
    """

    def with_priority(batch: pa.Table) -> pa.Table:
        w = batch[weight_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        keep = w > 0
        batch = batch.filter(pa.array(keep))
        if batch.num_rows == 0:
            return batch.append_column("__pri", pa.array([], pa.float64()))
        h = hash_of_key(batch[key_col].to_numpy(), seed).astype(np.float64)
        u = (h + 1.0) / 4294967297.0
        pri = -np.log(u) / w[keep]
        return batch.append_column("__pri", pa.array(pri, pa.float64()))

    prid = ds.map_batches(with_priority, batch_format="pyarrow")

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__g", pa.array(np.zeros(batch.num_rows, np.int64), pa.int64()))

    top = grouped_topk(prid.map_batches(tag, batch_format="pyarrow"),
                       group_col="__g", order_col="__pri", tie_col=key_col,
                       k=n, descending=False)

    def strip(batch: pa.Table) -> pa.Table:
        return batch.drop_columns(["__g", "__pri", "rank"])

    return top.map_batches(strip, batch_format="pyarrow")
