"""Column profiling — the data-quality pass every ingest pipeline runs
before anything expensive touches the corpus.

One streaming pass per table: each block emits ONE partial row per
profiled column (count / nulls / min / max / integer-cent sum / per-block
distincts), partials combine through Ray's tree aggregates, and the only
exchange is the per-column distinct-count groupby (bounded by the
column's cardinality — swap in the HLL sketch from ``pipelines/sketches``
when a column's NDV itself is corpus-scale).  All emitted statistics are
exact and SQL-mirrorable: counts are ints, min/max are element picks,
the sum is floor-cents int64 (order-free).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

__all__ = ["profile_numeric_columns", "zscore_outliers"]


def zscore_outliers(ds: rd.Dataset, *, value_col: str, id_col: str,
                    z: int = 3) -> rd.Dataset:
    """Rows whose value lies more than ``z`` standard deviations from the
    global mean — the standard two-pass anomaly filter, in EXACT integer
    arithmetic: with cents ``x``, ``S = sum(x)``, ``Q = sum(x^2)``,
    ``n``, the test ``(x - mean)^2 > z^2 * var`` is equivalent to
    ``(n*x - S)^2 > z^2 * (n*Q - S^2)`` — all int64, no float means, so
    boundary rows classify identically in numpy and SQL.

    Pass 1 collapses each block to one (n, S, Q) partial (tree
    aggregate); pass 2 streams the stateless flag.  Int64 bounds: needs
    ``(n * max|x|)^2 < 2^63`` — document ranges when reusing.
    """

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False)
        x = np.floor(v * 100.0).astype(np.int64)
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "s": pa.array([int(x.sum())], pa.int64()),
            "q": pa.array([int((x * x).sum())], pa.int64()),
        })

    stats = ds.map_batches(partial, batch_format="pyarrow") \
        .sum(["n", "s", "q"])
    n, s, q = (int(stats["sum(n)"]), int(stats["sum(s)"]),
               int(stats["sum(q)"]))
    rhs = z * z * (n * q - s * s)

    def flag(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False)
        x = np.floor(v * 100.0).astype(np.int64)
        lhs = (n * x - s)
        keep = lhs * lhs > rhs
        t = batch.filter(pa.array(keep))
        xt = np.floor(t[value_col].to_numpy(zero_copy_only=False)
                      * 100.0).astype(np.int64)
        return pa.table({
            id_col: t[id_col],
            "cents": pa.array(xt, pa.int64()),
        })

    return ds.map_batches(flag, batch_format="pyarrow")


def grouped_zscore_outliers(ds: rd.Dataset, *, group_col: str,
                            value_col: str, id_col: str,
                            z: int = 3) -> rd.Dataset:
    """PER-GROUP two-pass z-score outliers — the aggregate→rejoin shape:
    pass 1 collapses each block to ≤|groups-in-block| (group, n, S, Q)
    partials and one group-cardinality groupby; the stats table is
    group-cardinality (at extreme SF too big to broadcast) so it
    hash-joins BACK onto the stream (`shuffle_hash_join` on the group
    key), and pass 2 is the same stateless exact-integer inequality as
    :func:`zscore_outliers`: ``(n*x - S)^2 > z^2 (n*Q - S^2)`` per
    group.  Int64 bound: ``(n_g * max|x|)^2 < 2^63`` per group ``g``.
    """
    from ray.data.aggregate import Sum

    from .relational import shuffle_hash_join

    def partial(batch: pa.Table) -> pa.Table:
        g = batch[group_col].to_numpy(zero_copy_only=False)
        x = np.floor(batch[value_col].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
        keys, inv = np.unique(g, return_inverse=True)
        s = np.zeros(keys.size, np.int64)
        q = np.zeros(keys.size, np.int64)
        np.add.at(s, inv, x)
        np.add.at(q, inv, x * x)
        return pa.table({
            group_col: pa.array(keys),
            "n": pa.array(np.bincount(inv, minlength=keys.size)
                          .astype(np.int64)),
            "s": pa.array(s, pa.int64()),
            "q": pa.array(q, pa.int64())})

    stats = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(group_col) \
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                   Sum("q", alias_name="q"))

    def shape(batch: pa.Table) -> pa.Table:
        x = np.floor(batch[value_col].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
        return pa.table({id_col: batch[id_col],
                         group_col: batch[group_col],
                         "cents": pa.array(x, pa.int64())})

    j = shuffle_hash_join(ds.map_batches(shape, batch_format="pyarrow"),
                          stats, on=(group_col,), how="inner")

    def flag(batch: pa.Table) -> pa.Table:
        x = batch["cents"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        s = batch["s"].to_numpy(zero_copy_only=False)
        q = batch["q"].to_numpy(zero_copy_only=False)
        lhs = n * x - s
        keep = lhs * lhs > z * z * (n * q - s * s)
        return batch.filter(pa.array(keep)) \
            .select([id_col, group_col, "cents"])

    from .relational import drop_empty_blocks

    # the join can emit zero-column padding blocks that would corrupt the
    # concatenated schema; the flagged output is outlier-sized, so the
    # materializing strip is cheap
    return drop_empty_blocks(
        j.map_batches(flag, batch_format="pyarrow"),
        empty_schema=pa.schema([
            pa.field(id_col, pa.int64()),
            pa.field(group_col, pa.int64()),
            pa.field("cents", pa.int64())]))


def grouped_mad_outliers(ds: rd.Dataset, *, group_col: str,
                         value_col: str, id_col: str,
                         k_num: int = 3, k_den: int = 1,
                         group_type: "pa.DataType | None" = None
                         ) -> rd.Dataset:
    """PER-GROUP robust outliers by median absolute deviation — the
    robust-statistics complement to :func:`grouped_zscore_outliers`
    (mean/stddev blow up under the very outliers they hunt; median/MAD
    have a 50% breakdown point).  Two exact grouped medians
    (:func:`~.relational.grouped_percentile_cont`, the PERCENTILE_CONT
    integer-exact contract) each REJOIN onto the stream by the group key
    (aggregate→rejoin, group-cardinality stats never broadcast):

        cents      = floor(value * 100)                  (int64)
        med_x100   = 100 * median(cents)                 (exact, pass 1)
        dev        = |100*cents - med_x100|              (cents×100)
        mad_x10000 = 100 * median(dev)                   (exact, pass 2)
        outlier   ⇔ k_den * 100 * dev > k_num * mad_x10000

    — all-int64, no float in the hash surface.  Scale note: the grouped
    median sorts each group in one worker (the documented
    ``grouped_percentile_cont`` caveat); at corpus scale swap in the
    ``_global_rank_select`` histogram-refinement rank selection per
    group — same integer contract, no single-worker sort.
    """
    from .relational import (drop_empty_blocks, grouped_percentile_cont,
                             shuffle_hash_join)

    def shape(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.is_valid(batch[value_col]))
        x = np.floor(b[value_col].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
        return pa.table({id_col: b[id_col], group_col: b[group_col],
                         "cents": pa.array(x, pa.int64())})

    base = ds.map_batches(shape, batch_format="pyarrow")

    med = grouped_percentile_cont(base, group_col=group_col,
                                  value_col="cents", ps=(50,),
                                  count_alias="n_med") \
        .map_batches(lambda b: pa.table({
            group_col: b[group_col],
            "med_x100": b["p50_x100"]}), batch_format="pyarrow")
    j1 = shuffle_hash_join(base, med, on=(group_col,), how="inner")

    def dev_shape(b: pa.Table) -> pa.Table:
        c = b["cents"].to_numpy(zero_copy_only=False)
        m = b["med_x100"].to_numpy(zero_copy_only=False)
        return pa.table({id_col: b[id_col], group_col: b[group_col],
                         "cents": b["cents"], "med_x100": b["med_x100"],
                         "dev": pa.array(np.abs(100 * c - m), pa.int64())})

    devds = j1.map_batches(dev_shape, batch_format="pyarrow")

    mad = grouped_percentile_cont(devds, group_col=group_col,
                                  value_col="dev", ps=(50,),
                                  count_alias="n_mad") \
        .map_batches(lambda b: pa.table({
            group_col: b[group_col],
            "mad_x10000": b["p50_x100"]}), batch_format="pyarrow")
    j2 = shuffle_hash_join(devds, mad, on=(group_col,), how="inner")

    def flag(b: pa.Table) -> pa.Table:
        dev = b["dev"].to_numpy(zero_copy_only=False)
        madv = b["mad_x10000"].to_numpy(zero_copy_only=False)
        keep = k_den * 100 * dev > k_num * madv
        return b.filter(pa.array(keep)) \
            .select([id_col, group_col, "cents", "med_x100",
                     "mad_x10000"])

    gt = group_type if group_type is not None else pa.string()
    return drop_empty_blocks(
        j2.map_batches(flag, batch_format="pyarrow"),
        empty_schema=pa.schema([
            pa.field(id_col, pa.int64()), pa.field(group_col, gt),
            pa.field("cents", pa.int64()),
            pa.field("med_x100", pa.int64()),
            pa.field("mad_x10000", pa.int64())]))


def profile_numeric_columns(ds: rd.Dataset, columns: list[str],
                            ndv: str = "exact") -> pd.DataFrame:
    """(column, n, n_null, n_distinct, min_v, max_v, sum_cents) per
    profiled numeric column (see module doc).  Returns a tiny DataFrame —
    profiling output is metadata-scale by definition.

    ``ndv`` picks the distinct-count plan:

    * ``"exact"`` (default, the oracle-checked path): one distinct-shuffle
      per column — bounded by the column's cardinality, fine while NDV
      fits an exchange;
    * ``"approx"``: HyperLogLog — each block folds its values into one
      2^p-byte register row per column, registers merge by element-wise
      max, the estimate is ±~2% at p=12 and NOTHING cardinality-
      proportional ever moves.  The corpus-scale plan when a column's NDV
      itself is huge (ids, hashes).  Values hash by their float64 bit
      pattern (splitmix64), so the same number always lands in the same
      register regardless of block layout or parallelism.
    """
    if ndv not in ("exact", "approx"):
        raise ValueError(f"ndv must be 'exact' or 'approx', got {ndv!r}")

    def partial(batch: pa.Table) -> pa.Table:
        rows = {"column": [], "n": [], "n_null": [], "min_v": [],
                "max_v": [], "sum_cents": []}
        for col in columns:
            c = batch[col]
            valid = c.drop_null()
            v = valid.to_numpy(zero_copy_only=False).astype(np.float64)
            rows["column"].append(col)
            rows["n"].append(len(c))
            rows["n_null"].append(c.null_count)
            rows["min_v"].append(float(v.min()) if len(v) else np.inf)
            rows["max_v"].append(float(v.max()) if len(v) else -np.inf)
            rows["sum_cents"].append(
                int(np.floor(v * 100.0).astype(np.int64).sum()))
        return pa.table({
            "column": pa.array(rows["column"], pa.string()),
            "n": pa.array(rows["n"], pa.int64()),
            "n_null": pa.array(rows["n_null"], pa.int64()),
            "min_v": pa.array(rows["min_v"], pa.float64()),
            "max_v": pa.array(rows["max_v"], pa.float64()),
            "sum_cents": pa.array(rows["sum_cents"], pa.int64()),
        })

    from ray.data.aggregate import Max, Min, Sum

    agg = ds.select_columns(columns) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("column").aggregate(
            Sum("n", alias_name="n"),
            Sum("n_null", alias_name="n_null"),
            Min("min_v", alias_name="min_v"),
            Max("max_v", alias_name="max_v"),
            Sum("sum_cents", alias_name="sum_cents")) \
        .to_pandas()

    if ndv == "approx":
        ndv_by_col = _hll_ndv(ds, columns)
    else:
        # exact NDV per column: one distinct-shuffle each,
        # cardinality-bounded
        ndv_by_col = {}
        for col in columns:
            def distinct_block(batch: pa.Table, _c=col) -> pa.Table:
                u = pc.unique(batch[_c].drop_null())
                return pa.table({_c: u})

            ndv_by_col[col] = ds.select_columns([col]) \
                .map_batches(distinct_block, batch_format="pyarrow") \
                .groupby(col).count().count()
    agg["n_distinct"] = agg["column"].map(ndv_by_col).astype("int64")
    cols = ["column", "n", "n_null", "n_distinct", "min_v", "max_v",
            "sum_cents"]
    return agg[cols].sort_values("column").reset_index(drop=True)


def _hll_ndv(ds: rd.Dataset, columns: list[str],
             p: int | None = None) -> dict[str, int]:
    """HyperLogLog NDV estimate per column in ONE streaming pass over all
    columns together: every block folds each column's values into a
    2^p-byte register row (hash = splitmix64 of the float64 bit pattern,
    zero-normalized so ``-0.0`` and ``0.0`` count once, like SQL
    DISTINCT); the register rows merge by element-wise max in a per-column
    ``map_groups``.  The exchange moves ``n_blocks × n_columns`` 4 KB rows
    — nothing cardinality-proportional.
    """
    from ..functions.hashing import HLL_P, _splitmix64, hll_estimate, hll_fold

    if p is None:
        p = HLL_P

    def partial(batch: pa.Table) -> pa.Table:
        out_col, out_regs = [], []
        for col in columns:
            v = batch[col].drop_null() \
                .to_numpy(zero_copy_only=False).astype(np.float64)
            v = np.where(v == 0.0, 0.0, v)  # fold -0.0 into 0.0
            hashes = _splitmix64(v.view(np.uint64))
            out_col.append(col)
            out_regs.append(hll_fold(hashes, p=p).tobytes())
        return pa.table({
            "column": pa.array(out_col, pa.string()),
            "registers": pa.array(out_regs, pa.binary()),
        })

    def merge(group: pa.Table) -> pa.Table:
        col = group["column"][0].as_py()
        regs = np.zeros(1 << p, np.uint8)
        for buf in group["registers"].to_pylist():
            regs = np.maximum(regs, np.frombuffer(buf, np.uint8))
        return pa.table({
            "column": pa.array([col], pa.string()),
            "n_distinct": pa.array([int(round(hll_estimate(regs)))],
                                   pa.int64()),
        })

    rows = ds.select_columns(columns) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("column").map_groups(merge, batch_format="pyarrow") \
        .take_all()
    return {r["column"]: int(r["n_distinct"]) for r in rows}


def column_entropy(ds: rd.Dataset, columns: list[str]) -> rd.Dataset:
    """Exact Shannon-entropy profile per column — the distribution-
    concentration signal a data-quality dashboard tracks next to NDV
    (a column whose entropy collapses between snapshots went
    near-constant even if its NDV did not move).

    Output per column: ``(column, n, ndv, sum_clnc_q)`` where
    ``sum_clnc_q = Σ_v floor(c_v·ln(c_v)·1e4 + 0.5)`` over the column's
    distinct-value counts — quantized ONCE per distinct value so the
    sum is exact int64 and order-free (the proven ln-quantization
    contract); ``H = ln(n) − sum_clnc_q / (1e4·n)`` nats is one float
    expression away and stays off the hash surface.

    Scale shape: one pass emits per-batch partial (column, value, c)
    counts (values stringified, NULL → a sentinel, matching the SQL
    UNION ALL shape); ONE (column, value) groupby at
    distinct-values-scale; quantization is a stateless batch map; the
    final per-column rollup is column-count-sized.
    """
    from ray.data.aggregate import Count, Sum

    def partial(batch: pa.Table) -> pa.Table:
        cols_out, vals_out, cnt_out = [], [], []
        for col in columns:
            arr = batch[col]
            vals = ["__null__" if v is None else str(v)
                    for v in arr.to_pylist()]
            uniq, cnt = np.unique(np.asarray(vals, object),
                                  return_counts=True)
            cols_out.extend([col] * len(uniq))
            vals_out.extend(uniq.tolist())
            cnt_out.extend(cnt.astype(np.int64).tolist())
        return pa.table({
            "column": pa.array(cols_out, pa.string()),
            "val": pa.array(vals_out, pa.string()),
            "c": pa.array(cnt_out, pa.int64())})

    counts = ds.select_columns(columns) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["column", "val"]).aggregate(Sum("c", alias_name="c"))

    def quantize(batch: pa.Table) -> pa.Table:
        c = batch["c"].to_numpy().astype(np.float64)
        q = np.floor(c * np.log(c) * 1e4 + 0.5).astype(np.int64)
        return pa.table({
            "column": batch["column"],
            "c": batch["c"],
            "qv": pa.array(q, pa.int64())})

    from .relational import drop_empty_blocks

    quantized = drop_empty_blocks(
        counts.map_batches(quantize, batch_format="pyarrow"),
        empty_schema=pa.schema([("column", pa.string()),
                                ("c", pa.int64()), ("qv", pa.int64())]))
    return quantized.groupby("column").aggregate(
        Sum("c", alias_name="n"),
        Count(alias_name="ndv"),
        Sum("qv", alias_name="sum_clnc_q"))
