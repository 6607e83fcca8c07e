"""Approximate (sketch) aggregates — beyond-the-reference operators for
large-scale pipelines (SURVEY.md training-data addenda).

HyperLogLog distinct counting as a proper distributed aggregate: the map
side folds each batch into per-group register arrays (a partial aggregate —
4 KB per group regardless of cardinality), the reduce side merges registers
by element-wise max inside ``groupby().map_groups``.  Register merge is
associative + commutative, so the estimate is independent of batch order,
block boundaries, and parallelism level — the determinism the rest of the
engine guarantees everywhere else.

At 100 TB scale this replaces a full-shuffle ``COUNT(DISTINCT ...)`` with a
shuffle of (n_groups x 4 KB) partials.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..functions.hashing import HLL_P, hll_estimate, hll_fold, stable_hash_array


def _day_of(ts_col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    return (ts_col.cast(pa.int64()).to_numpy() // (86_400 * 1_000_000)).astype(np.int64)


def approx_distinct_daily(events: rd.Dataset, key_col: str = "user_id",
                          ts_col: str = "ts", p: int = HLL_P) -> rd.Dataset:
    """(day, approx_distinct) — HLL estimate of distinct ``key_col`` values
    per UTC day.  ``day`` = epoch_days."""

    def partial(batch: pa.Table) -> pa.Table:
        days = _day_of(batch[ts_col])
        keys = batch[key_col].to_pylist()
        hashes = stable_hash_array([str(k) for k in keys])
        out_day, out_regs = [], []
        for d in np.unique(days):
            regs = hll_fold(hashes[days == d], p=p)
            out_day.append(int(d))
            out_regs.append(regs.tobytes())
        return pa.table({
            "day": pa.array(out_day, pa.int64()),
            "registers": pa.array(out_regs, pa.binary()),
        })

    def merge(group: pa.Table) -> pa.Table:
        day = int(group["day"][0].as_py())
        regs = np.zeros(1 << p, np.uint8)
        for buf in group["registers"].to_pylist():
            regs = np.maximum(regs, np.frombuffer(buf, np.uint8))
        return pa.table({
            "day": pa.array([day], pa.int64()),
            "approx_distinct": pa.array([hll_estimate(regs)], pa.float64()),
        })

    partials = events.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("day").map_groups(merge, batch_format="pyarrow")


def exact_distinct_daily(events: rd.Dataset, key_col: str = "user_id",
                         ts_col: str = "ts") -> rd.Dataset:
    """(day, n_users) — EXACT distinct ``key_col`` per UTC day.

    The oracle-checked sibling of :func:`approx_distinct_daily` (which is
    probabilistic and therefore driver-checked rows-only).  Scale shape:
    a map-side combiner collapses each batch to its distinct (day, key)
    pairs, one hash aggregate dedups globally, and the per-day count runs
    over the (tiny) deduped stream — no row-level all-to-all of raw events.
    """
    from ray.data.aggregate import Count

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        days = _day_of(batch[ts_col])
        keys = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = np.unique(np.stack([days, keys], axis=1), axis=0)
        return pa.table({
            "day": pa.array(uniq[:, 0], pa.int64()),
            key_col: pa.array(uniq[:, 1], pa.int64()),
        })

    pairs = events.map_batches(distinct_pairs, batch_format="pyarrow")
    deduped = pairs.groupby(["day", key_col]).aggregate(Count(alias_name="_c"))
    return deduped.drop_columns(["_c"]).groupby("day").aggregate(
        Count(alias_name="n_users"))


# --------------------------------------------------------------------------
# Count-Min heavy hitters
# --------------------------------------------------------------------------

def heavy_hitters_cms(docs: rd.Dataset, *, min_count: int,
                      text_col: str = "text") -> rd.Dataset:
    """Terms whose corpus-wide occurrence count is >= ``min_count``, with
    Count-Min estimated counts (est >= true, never under — so the output is
    a superset of the true heavy hitters; the overestimate is bounded by
    eps*N w.h.p., eps ~ e/width).

    Two streaming passes, both shuffle-light:

    1. every batch folds its tokens into a (depth x width) partial sketch
      (a fixed 512 KB regardless of batch size); partials tree-merge by
      element-wise sum into ONE global sketch — the only "wide" step moves
      ``n_blocks`` sketches, not tokens;
    2. the candidate-term stream (per-batch distinct -> one dedup groupby)
      probes the broadcast sketch and keeps terms with est >= min_count.

    This is how you find hot n-grams/URLs/terms in a 100 TB corpus without
    a full groupby-count over every token occurrence.
    """
    import re

    import ray

    from ..functions.hashing import cms_fold, cms_query

    word_re = re.compile(r"[a-z]+")

    def partial_sketch(batch: pa.Table) -> pa.Table:
        toks = [t for s in batch[text_col].to_pylist()
                for t in word_re.findall((s or "").lower())]
        counts = cms_fold(stable_hash_array(toks))
        return pa.table({"sketch": pa.array([counts.tobytes()], pa.binary())})

    def merge_group(group: pa.Table) -> pa.Table:
        from ..functions.hashing import CMS_DEPTH, CMS_WIDTH

        acc = np.zeros((CMS_DEPTH, CMS_WIDTH), np.int64)
        for buf in group["sketch"].to_pylist():
            acc += np.frombuffer(buf, np.int64).reshape(CMS_DEPTH, CMS_WIDTH)
        return pa.table({"sketch": pa.array([acc.tobytes()], pa.binary())})

    sketch_rows = docs.map_batches(partial_sketch, batch_format="pyarrow") \
        .map_batches(lambda t: t.append_column("g", pa.nulls(t.num_rows, pa.int8())),
                     batch_format="pyarrow") \
        .groupby("g").map_groups(merge_group, batch_format="pyarrow") \
        .take_all()
    from ..functions.hashing import CMS_DEPTH, CMS_WIDTH

    sketch = np.frombuffer(sketch_rows[0]["sketch"], np.int64) \
        .reshape(CMS_DEPTH, CMS_WIDTH)
    sketch_ref = ray.put(sketch)

    def batch_distinct(batch: pa.Table) -> pa.Table:
        toks = set(t for s in batch[text_col].to_pylist()
                   for t in word_re.findall((s or "").lower()))
        return pa.table({"term": pa.array(sorted(toks), pa.string())})

    def probe_batch(batch: pa.Table) -> pa.Table:
        terms = batch["term"].to_pylist()
        est = cms_query(ray.get(sketch_ref), stable_hash_array(terms))
        keep = est >= min_count
        return pa.table({
            "term": batch["term"].filter(pa.array(keep)),
            "est_count": pa.array(est[keep], pa.int64()),
        })

    from ray.data.aggregate import Count

    distinct = docs.map_batches(batch_distinct, batch_format="pyarrow") \
        .groupby("term").aggregate(Count(alias_name="_n")) \
        .drop_columns(["_n"])
    return distinct.map_batches(probe_batch, batch_format="pyarrow")
