"""Generic relational stages: broadcast hash join and pre-aggregated rollup.

The reference resolves its page<->site and lemma-dictionary foreign keys
with in-process lookups (``model/Page.java`` site FK;
``services/SearchServiceImpl.java:126`` lemma->site filter).  At cluster
scale the same shape is a BROADCAST HASH JOIN: the small side is built once
on the driver (or from a small Dataset), shipped to the object store with
``ray.put`` exactly once, and every ``map_batches`` task reads it zero-copy —
no all-to-all shuffle of the big side, which never leaves its blocks.

``broadcast_hash_join`` is the reusable operator; ``pipelines/docqueries``
and the TPC-H-style enrichment queries in ``__ray_entry__`` use it.  The
100-TB contract: the SMALL side must fit a worker heap (dimension tables,
id->label maps); the big side streams.

``shuffle_hash_join`` is the big-big complement: both sides hash-partition
on the key (one all-to-all exchange each, Ray Data's native ``Dataset.join``
aggregator actors) and co-partitioned pairs join locally — use it when
neither side fits a worker heap; prefer the broadcast form whenever one
does, because it moves only the small side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def _patch_hash_shuffle_schema_broadcast() -> None:
    """Fix a Ray 2.49 hash-shuffle schema-broadcast race.

    ``groupby().aggregate`` and ``Dataset.join`` emit ZERO-COLUMN padding
    blocks for empty partitions.  The hash-shuffle operator broadcasts a
    schema to its aggregator pool exactly ONCE — using whichever input
    block arrives first (``hash_shuffle.py`` ``_do_add_input_inner``:
    ``should_broadcast_schemas`` latches on the first block).  When that
    first block is padding, every aggregator whose partition receives no
    real shard builds a schema-less empty table, and a downstream join's
    key resolution crashes with "No match ... for key field reference" —
    nondeterministically, because it depends on bundle arrival order
    (observed on aggregate->join and join->join compositions at small SF).

    The patch skips the latch for zero-column bundles so the one-shot
    broadcast is spent on the first REAL schema.  A side whose blocks are
    ALL padding still has no schema to broadcast — that is the documented
    ``drop_empty_blocks(empty_schema=...)`` case.
    """
    try:
        from ray.data._internal.execution.operators.hash_shuffle import (
            HashShufflingOperatorBase,
        )
    except ImportError:  # pragma: no cover - future Ray refactor
        return
    if getattr(HashShufflingOperatorBase, "_serx_schema_patch", False):
        return
    orig = HashShufflingOperatorBase._do_add_input_inner

    def patched(self, input_bundle, input_index):
        sch = input_bundle.schema
        names = getattr(sch, "names", None) if sch is not None else None
        zero_col = names is not None and len(names) == 0
        if zero_col and not self._has_schemas_broadcasted[input_index]:
            # spend the broadcast on the first REAL schema instead
            self._has_schemas_broadcasted[input_index] = True
            try:
                return orig(self, input_bundle, input_index)
            finally:
                self._has_schemas_broadcasted[input_index] = False
        return orig(self, input_bundle, input_index)

    HashShufflingOperatorBase._do_add_input_inner = patched
    HashShufflingOperatorBase._serx_schema_patch = True


_patch_hash_shuffle_schema_broadcast()


def _small_table(small: "rd.Dataset | pa.Table") -> pa.Table:
    if isinstance(small, pa.Table):
        return small
    # small side materializes by contract (dimension-table scale)
    refs = small.to_arrow_refs()
    return pa.concat_tables(ray.get(refs), promote_options="permissive")


def broadcast_hash_join(
    big: rd.Dataset,
    small: "rd.Dataset | pa.Table",
    *,
    big_key: str,
    small_key: str,
    select: list[str] | None = None,
    how: str = "inner",
) -> rd.Dataset:
    """Join a streaming big side against a broadcast small side.

    ``select`` names the small-side columns to append (default: all except
    the key).  ``how`` is ``"inner"`` (drop unmatched big rows) or
    ``"left"`` (keep them, null payload).  Matching is by exact key equality
    with a sorted-key binary search per batch (vectorized ``searchsorted``);
    duplicate small-side keys are rejected — pre-aggregate the small side
    first (a 1:N small side would need an explode, not a lookup).
    """
    st = _small_table(small)
    if select is None:
        select = [c for c in st.column_names if c != small_key]
    keys = st[small_key].to_numpy(zero_copy_only=False)
    order = np.argsort(keys, kind="stable")
    skeys = keys[order]
    if skeys.size > 1 and (skeys[1:] == skeys[:-1]).any():
        raise ValueError(
            f"broadcast_hash_join: small side has duplicate {small_key!r} "
            "keys; aggregate the small side to unique keys first")
    payload = {c: st[c].take(pa.array(order)).combine_chunks() for c in select}
    ref = ray.put((skeys, payload))

    def join_batch(batch: pa.Table) -> pa.Table:
        g_keys, g_payload = ray.get(ref)
        bk = batch[big_key].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(g_keys, bk)
        pos_c = np.clip(pos, 0, max(0, g_keys.size - 1))
        hit = (g_keys.size > 0) & (g_keys[pos_c] == bk)
        out = batch
        if how == "inner":
            if not hit.all():
                out = out.filter(pa.array(hit))
                pos_c = pos_c[hit]
            for c in select:
                out = out.append_column(
                    c, g_payload[c].take(pa.array(pos_c, pa.int64())))
        elif how == "left":
            idx = np.where(hit, pos_c, -1)
            take_ix = pa.array(
                np.where(idx >= 0, idx, 0), pa.int64())
            null_mask = pa.array(idx < 0)
            for c in select:
                col = g_payload[c].take(take_ix)
                col = pc.if_else(null_mask, pa.nulls(len(out), col.type), col)
                out = out.append_column(c, col)
        else:
            raise ValueError(f"unsupported how={how!r}")
        return out

    return big.map_batches(join_batch, batch_format="pyarrow")


_JOIN_TYPES = {
    "inner": "inner", "left": "left_outer", "right": "right_outer",
    "full": "full_outer", "semi": "left_semi", "anti": "left_anti",
    # native names pass through
    "left_outer": "left_outer", "right_outer": "right_outer",
    "full_outer": "full_outer", "left_semi": "left_semi",
    "right_semi": "right_semi", "left_anti": "left_anti",
    "right_anti": "right_anti",
}


def drop_empty_blocks(ds: rd.Dataset, *,
                      empty_schema: pa.Schema | None = None) -> rd.Dataset:
    """Strip zero-column padding blocks that ``groupby().aggregate`` can
    emit.  Such blocks have NO schema, ``map_batches`` never calls the UDF
    on them, and a downstream ``Dataset.join`` crashes resolving the key
    column ("No match ... for key field reference").  The driver only sees
    one boolean per block; data stays in the object store.

    ``empty_schema`` supplies the result schema when EVERY block is empty
    (otherwise an all-empty input raises, because the dataset would have no
    schema at all).
    """

    @ray.remote
    def has_rows(t: pa.Table) -> bool:
        return bool(t.num_columns and t.num_rows)

    refs = ds.materialize().to_arrow_refs()
    keep = [r for r, ok in zip(refs, ray.get([has_rows.remote(r)
                                              for r in refs])) if ok]
    if keep:
        return rd.from_arrow_refs(keep)
    if empty_schema is None:
        raise ValueError("drop_empty_blocks: every block is empty and no "
                         "empty_schema was provided")
    return rd.from_arrow(empty_schema.empty_table())


def shuffle_hash_join(left: rd.Dataset, right: rd.Dataset, *,
                      on: tuple[str, ...], right_on: tuple[str, ...] | None = None,
                      how: str = "inner",
                      num_partitions: int | None = None) -> rd.Dataset:
    """Hash-partitioned equi-join for two LARGE datasets.

    Both sides are hash-partitioned on the join key (one all-to-all
    exchange per side; key skew hurts — salt hot keys upstream) and each
    co-partitioned pair joins locally in an aggregator actor.  ``how``:
    inner / left / right / full / semi / anti (semi and anti return left
    columns only).  ``num_partitions`` defaults to the cluster CPU count
    so every core owns one partition; raise it when a partition of either
    side would not fit an aggregator's heap.
    """
    if how not in _JOIN_TYPES:
        raise ValueError(f"unsupported how={how!r}; one of {sorted(_JOIN_TYPES)}")
    if num_partitions is None:
        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 8)))
    return left.join(right, _JOIN_TYPES[how], num_partitions,
                     on=tuple(on), right_on=tuple(right_on) if right_on else None)


def skew_salted_join(big: rd.Dataset, dim: rd.Dataset, *, big_key: str,
                     dim_key: str, hot_threshold: int = 100_000,
                     max_hot: int = 65_536, how: str = "inner",
                     num_partitions: int | None = None,
                     select: list[str] | None = None) -> rd.Dataset:
    """Skew-aware big x dimension join: HOT keys bypass the shuffle.

    The classic AQE skew-join move: a hash-partitioned join sends every
    row of a hot key to ONE aggregator (``shuffle_hash_join``'s documented
    weakness), so a zipfian big side stalls on its head keys.  Here the
    big side's key histogram is measured first (per-block pyarrow
    ``group_by`` partials -> one vocabulary-scale groupby — only (key,
    count) rows ever shuffle); keys with ``count >= hot_threshold`` are
    declared hot (guarded by ``max_hot``, the broadcastable bound), the
    dimension rows for hot keys broadcast once via ``broadcast_hash_join``
    (the big side STREAMS — no exchange at all for the skewed mass), and
    only the cold remainder goes through the ordinary shuffle join.  The
    union is exactly the plain join's rows (pytest + driver-oracle checked
    with a threshold low enough to force both paths).

    ``dim`` must be unique on ``dim_key`` (a dimension table — the same
    contract as ``broadcast_hash_join``).  ``how``: inner or left.
    """
    if how not in ("inner", "left"):
        raise ValueError("skew_salted_join supports how = inner | left")
    from ray.data.aggregate import Sum

    def key_counts(batch: pa.Table) -> pa.Table:
        res = batch.select([big_key]).group_by(big_key) \
            .aggregate([([], "count_all")])
        return pa.table({big_key: res[big_key],
                         "n": res["count_all"].cast(pa.int64())})

    hist = big.map_batches(key_counts, batch_format="pyarrow") \
        .groupby(big_key).aggregate(Sum("n", alias_name="n"))

    def pick_hot(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return batch.filter(_pc.greater_equal(batch["n"], hot_threshold)) \
            .select([big_key])

    hot_rows = hist.map_batches(pick_hot, batch_format="pyarrow").take_all()
    if len(hot_rows) > max_hot:
        raise ValueError(
            f"skew_salted_join: {len(hot_rows)} hot keys exceed max_hot="
            f"{max_hot}; raise hot_threshold or max_hot")
    hot = np.sort(np.array([r[big_key] for r in hot_rows], np.int64))

    if select is None:
        sel_cols = None
    else:
        sel_cols = list(select)

    def is_hot(batch: pa.Table, invert: bool = False) -> pa.Table:
        k = batch[big_key].to_numpy(zero_copy_only=False)
        if not hot.size:
            m = np.zeros(len(k), bool)
        else:
            pos = np.clip(np.searchsorted(hot, k), 0, hot.size - 1)
            m = hot[pos] == k
        return batch.filter(pa.array(~m if invert else m))

    import functools

    cold_big = big.map_batches(functools.partial(is_hot, invert=True),
                               batch_format="pyarrow")
    cold = shuffle_hash_join(cold_big, dim, on=(big_key,),
                             right_on=(dim_key,), how=how,
                             num_partitions=num_partitions)
    if not hot.size:
        return cold if sel_cols is None else cold.select_columns(sel_cols)
    hot_big = big.map_batches(is_hot, batch_format="pyarrow")

    def dim_hot(batch: pa.Table) -> pa.Table:
        k = batch[dim_key].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(hot, k), 0, hot.size - 1)
        return batch.filter(pa.array(hot[pos] == k))

    hot_dim_tbl = pa.concat_tables(
        ray.get(dim.map_batches(dim_hot, batch_format="pyarrow")
                .to_arrow_refs()), promote_options="permissive")
    if dim_key != big_key:
        i = hot_dim_tbl.schema.get_field_index(dim_key)
        hot_dim_tbl = hot_dim_tbl.set_column(
            i, big_key, hot_dim_tbl.column(dim_key))
    hot_join = broadcast_hash_join(hot_big, hot_dim_tbl, big_key=big_key,
                                   small_key=big_key, how=how)
    if sel_cols is None:
        sel_cols = sorted(set(cold.schema().names)
                          & set(hot_join.schema().names))
    return cold.select_columns(sel_cols) \
        .union(hot_join.select_columns(sel_cols))


def grouped_quantiles(ds: rd.Dataset, *, group_col: str, value_col: str,
                      qs: tuple[float, ...] = (0.5, 0.95, 0.99),
                      count_alias: str = "n") -> rd.Dataset:
    """Exact per-group discrete quantiles (DuckDB ``quantile_disc``
    semantics: ``sorted[ceil(q*n) - 1]`` — an actual element, so results
    are bit-identical across engines, no interpolation arithmetic).

    Scale shape: only the (group, value) columns shuffle — prune the read
    to those two.  Exact quantiles fundamentally need each group's values
    in one place (8 bytes/value after pruning); for groups beyond a
    worker's heap use a two-pass histogram refinement or a sketch
    (``pipelines/sketches``) instead — this operator is the exact
    oracle-checkable member of the family.
    """
    import math

    cols = {f"p{int(round(q * 100))}": q for q in qs}

    def per_group(g: pa.Table) -> pa.Table:
        key = g[group_col][0]
        v = np.sort(g[value_col].to_numpy(zero_copy_only=False))
        n = v.size
        out: dict = {group_col: pa.array([key.as_py()]),
                     count_alias: pa.array([n], pa.int64())}
        for name, q in cols.items():
            idx = min(n - 1, max(0, math.ceil(q * n) - 1))
            out[name] = pa.array([float(v[idx])], pa.float64())
        return pa.table(out)

    return ds.select_columns([group_col, value_col]) \
        .groupby(group_col).map_groups(per_group, batch_format="pyarrow")


def grouped_percentile_cont(ds: rd.Dataset, *, group_col: str,
                            value_col: str, ps: tuple[int, ...] = (50, 90),
                            count_alias: str = "n") -> rd.Dataset:
    """Exact per-group interpolated percentiles (PERCENTILE_CONT) over an
    int64 column with INTEGER-EXACT output: per percent ``p`` the column
    ``p{p}_x100 = lo*(100-num) + hi*num`` where lo/hi are the bracketing
    order statistics at 0-based position ``(n-1)*p/100`` and
    ``num = (n-1)*p mod 100`` — pure int64, no float hash surface (see
    :func:`global_percentile_cont` for the global / too-big-to-sort
    variant of the same contract).  Same scale shape and caveat as
    :func:`grouped_quantiles`: only two pruned columns shuffle, each
    group sorts in one worker — when a group outgrows a worker, swap in
    :func:`grouped_percentile_cont_refined` (bit-identical output, no
    per-group sort).
    """
    for p in ps:
        if not (0 <= int(p) <= 100):
            raise ValueError(f"percent {p} outside [0, 100]")

    def per_group(g: pa.Table) -> pa.Table:
        key = g[group_col][0]
        v = np.sort(g[value_col].drop_null().to_numpy(zero_copy_only=False)
                    .astype(np.int64))
        n = v.size
        out: dict = {group_col: pa.array([key.as_py()]),
                     count_alias: pa.array([n], pa.int64())}
        for p in ps:
            h100 = (n - 1) * int(p)
            lo, num = divmod(h100, 100)
            hi = lo + 1 if num else lo
            x100 = int(v[lo]) * (100 - num) + int(v[hi]) * num
            out[f"p{int(p)}_x100"] = pa.array([x100], pa.int64())
        return pa.table(out)

    return ds.select_columns([group_col, value_col]) \
        .groupby(group_col).map_groups(per_group, batch_format="pyarrow")


def ordered_prefix_sum(ds: rd.Dataset, *, order_col: str, value_col: str,
                       out_col: str = "cum_before") -> rd.Dataset:
    """Distributed EXCLUSIVE prefix sum over the ``order_col``-sorted
    stream — the classic two-pass parallel scan: sort, then one tiny task
    per block computes its local sum (one scalar per block reaches the
    driver), the driver turns block sums into exclusive block offsets
    (metadata-scale), and a second pass adds ``offset + local exclusive
    cumsum`` per block.  Nothing row-proportional ever sits on the
    driver; the only all-to-all is the sort itself.

    ``out_col`` holds the sum of ``value_col`` over all STRICTLY
    PRECEDING rows in ``order_col`` order (SQL ``SUM(v) OVER (ORDER BY o
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)``, NULL→0).
    ``order_col`` must be unique for a deterministic result.
    """
    sorted_ds = ds.sort(order_col).materialize()
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def block_stat(t: pa.Table) -> tuple[int, int]:
        if t.num_rows == 0:
            return (0, None)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return (int(v.sum()), t[order_col][0].as_py())

    stats = ray.get([block_stat.remote(r) for r in refs])
    # blocks of a sorted dataset arrive in key order; verify and derive
    # each block's exclusive offset (metadata-scale: one scalar per block)
    keyed = [(k, s, i) for i, (s, k) in enumerate(stats) if k is not None]
    if sorted(k for k, _, _ in keyed) != [k for k, _, _ in keyed]:
        raise AssertionError("sorted dataset blocks out of key order")
    offsets = {}
    acc = 0
    for k, s, i in keyed:
        offsets[i] = acc
        acc += s

    @ray.remote
    def scan_block(t: pa.Table, off: int) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cum = np.concatenate([[0], np.cumsum(v)[:-1]]) + off if v.size \
            else np.zeros(0, np.int64)
        return t.append_column(out_col, pa.array(cum, pa.int64()))

    out = [scan_block.remote(refs[i], offsets[i]) for _, _, i in keyed]
    if not out:
        return sorted_ds.map_batches(
            lambda t: t.append_column(out_col,
                                      pa.array([], pa.int64())),
            batch_format="pyarrow")
    return rd.from_arrow_refs(out)


def ordered_prefix_max(ds: rd.Dataset, *, order_cols: list[str],
                       value_col: str,
                       out_col: str = "run_max") -> rd.Dataset:
    """Distributed INCLUSIVE running max over the ``order_cols``-sorted
    stream — the same two-pass parallel scan as :func:`ordered_prefix_sum`
    (max is associative): sort, one scalar (block max + first key) per
    block to the driver, exclusive per-block max offsets
    (metadata-scale), then ``np.maximum(offset, local running max)`` per
    block.  ``out_col`` equals SQL ``MAX(v) OVER (ORDER BY ... ROWS
    BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)``; the combined
    ``order_cols`` key must be unique for a deterministic result.  This
    is the event-time WATERMARK primitive: with v = event ts and order =
    arrival, ``run_max - allowed_lateness`` is the watermark each row
    sees."""
    sorted_ds = ds.sort(order_cols).materialize()
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def block_stat(t: pa.Table):
        if t.num_rows == 0:
            return (None, None)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        key = tuple(t[c][0].as_py() for c in order_cols)
        return (int(v.max()), key)

    stats = ray.get([block_stat.remote(r) for r in refs])
    keyed = [(k, m, i) for i, (m, k) in enumerate(stats) if k is not None]
    if sorted(k for k, _, _ in keyed) != [k for k, _, _ in keyed]:
        raise AssertionError("sorted dataset blocks out of key order")
    offsets = {}
    acc = None
    for k, m, i in keyed:
        offsets[i] = acc
        acc = m if acc is None else max(acc, m)

    @ray.remote
    def scan_block(t: pa.Table, off) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        run = np.maximum.accumulate(v) if v.size else v
        if off is not None and run.size:
            run = np.maximum(run, np.int64(off))
        return t.append_column(out_col, pa.array(run, pa.int64()))

    out = [scan_block.remote(refs[i], offsets[i]) for _, _, i in keyed]
    if not out:
        return sorted_ds.map_batches(
            lambda t: t.append_column(out_col, pa.array([], pa.int64())),
            batch_format="pyarrow")
    return rd.from_arrow_refs(out)


def pack_sequences(ds: rd.Dataset, *, order_col: str, token_col: str,
                   budget: int) -> rd.Dataset:
    """Deterministic training-sequence packing: walk documents in
    ``order_col`` order and assign each a sequence id by its cumulative
    token offset — ``seq_id = cum_before // budget``, ``seq_offset =
    cum_before % budget`` (fixed-boundary packing: a document belongs to
    the sequence its FIRST token lands in).  Built on
    :func:`ordered_prefix_sum`, so the assignment is bit-identical at any
    parallelism and SQL-window-checkable — unlike greedy packing, whose
    reset rule is inherently sequential.
    """
    scanned = ordered_prefix_sum(ds, order_col=order_col,
                                 value_col=token_col)

    def assign(t: pa.Table) -> pa.Table:
        cum = t["cum_before"].to_numpy()
        return t.append_column(
            "seq_id", pa.array(cum // budget, pa.int64())).append_column(
            "seq_offset", pa.array(cum % budget, pa.int64()))

    return scanned.map_batches(assign, batch_format="pyarrow")


def global_row_number(ds: rd.Dataset, *, order_cols: list[str],
                      descending: bool | list[bool] = False,
                      out_col: str = "rnk") -> rd.Dataset:
    """Distributed global ``ORDER BY`` + dense ``ROW_NUMBER()`` — the
    full-table ordered-export primitive (SQL ``ROW_NUMBER() OVER (ORDER BY
    ...)`` with no partition clause, rank from 1).

    Scale shape: the range-partitioned ``ds.sort`` is the ONLY all-to-all;
    rank assignment is the same two-pass parallel scan as
    :func:`ordered_prefix_sum` with a row COUNT per block instead of a
    value sum — one ``(n_rows, first_key)`` scalar pair per block reaches
    the driver, the driver derives exclusive row offsets
    (metadata-scale), and a second zero-copy pass appends ``offset +
    arange + 1``.  Nothing row-proportional ever sits on the driver, and
    the result is bit-identical at any parallelism PROVIDED the combined
    ``order_cols`` key is unique (same contract as the prefix scans).

    ``descending`` mirrors ``Dataset.sort``'s flag (scalar or per-column
    list).  Rows whose sort key contains NULL are the caller's problem —
    filter them first; both Arrow and DuckDB default to nulls-last but
    the tie-break contract needs real values.
    """
    sorted_ds = ds.sort(order_cols, descending=descending).materialize()
    refs = sorted_ds.to_arrow_refs()

    desc = list(descending) if isinstance(descending, (list, tuple)) \
        else [descending] * len(order_cols)

    @ray.remote
    def block_stat(t: pa.Table):
        if t.num_rows == 0:
            return (0, None)
        return (t.num_rows, tuple(t[c][0].as_py() for c in order_cols))

    stats = ray.get([block_stat.remote(r) for r in refs])
    keyed = [(k, n, i) for i, (n, k) in enumerate(stats) if k is not None]
    # blocks of a sorted dataset arrive in key order; verify respecting
    # per-column direction (can't negate strings, so compare pairwise)
    for (ka, _, _), (kb, _, _) in zip(keyed, keyed[1:]):
        for a, b, d in zip(ka, kb, desc):
            if a == b:
                continue
            if (a > b) != d:
                raise AssertionError("sorted dataset blocks out of key order")
            break
    offsets = {}
    acc = 0
    for _, n, i in keyed:
        offsets[i] = acc
        acc += n

    @ray.remote
    def rank_block(t: pa.Table, off: int) -> pa.Table:
        rnk = off + 1 + np.arange(t.num_rows, dtype=np.int64)
        return t.append_column(out_col, pa.array(rnk, pa.int64()))

    out = [rank_block.remote(refs[i], offsets[i]) for _, _, i in keyed]
    if not out:
        return sorted_ds.map_batches(
            lambda t: t.append_column(out_col, pa.array([], pa.int64())),
            batch_format="pyarrow")
    return rd.from_arrow_refs(out)


def grouped_topk(ds: rd.Dataset, *, group_col: str, order_col: str,
                 tie_col: str, k: int, descending: bool = True) -> rd.Dataset:
    """Top-k rows per group with a deterministic (order, tie) sort.

    Scale shape (SURVEY §2.6 family): a per-BATCH partial top-k bounds the
    all-to-all to at most ``k`` rows per (group, block) — the groupby then
    merges tiny partials instead of shuffling the full table.  Ties break on
    ``tie_col`` ascending, so output is order- and parallelism-invariant.
    Output adds an int64 ``rank`` column (1-based within the group).
    """

    def _topk_table(t: pa.Table, with_rank: bool) -> pa.Table:
        gv = t[group_col]
        enc = (gv.combine_chunks() if isinstance(gv, pa.ChunkedArray) else gv
               ).dictionary_encode()
        gidx = np.asarray(enc.indices.to_numpy(zero_copy_only=False),
                          np.int64)
        v = t[order_col].to_numpy(zero_copy_only=False).astype(np.float64)
        tie = t[tie_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, -v if descending else v, gidx))
        gs = gidx[order]
        first = np.ones(gs.size, bool)
        if gs.size > 1:
            first[1:] = gs[1:] != gs[:-1]
        # rank within group = position since the group's first row
        starts = np.flatnonzero(first)
        rank = np.arange(gs.size, dtype=np.int64) - np.repeat(
            starts, np.diff(np.append(starts, gs.size))) + 1
        keep = rank <= k
        sel = order[keep]
        out = t.take(pa.array(sel, pa.int64()))
        if with_rank:
            out = out.append_column("rank", pa.array(rank[keep], pa.int64()))
        return out

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        return _topk_table(batch, with_rank=False)

    def merge(group: pa.Table) -> pa.Table:
        return _topk_table(group, with_rank=True)

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(group_col).map_groups(merge, batch_format="pyarrow")


def grouping_sets(ds: rd.Dataset, *, keys: tuple[str, ...],
                  sets: tuple[tuple[str, ...], ...],
                  sum_cols: dict[str, str],
                  count_alias: str = "n_rows",
                  grouping_id_col: str = "grouping_id") -> rd.Dataset:
    """Multi-level aggregate over ``GROUP BY GROUPING SETS`` semantics
    (rollup/cube are special cases of ``sets``).

    Contract (mirrors DuckDB exactly): each grouping set aggregates the
    whole input over its subset of ``keys``; key columns absent from a set
    come back NULL; ``grouping_id`` is DuckDB's ``GROUPING(*keys)`` bitmask
    (first key = most significant bit), which disambiguates a rolled-up
    NULL from a NULL that exists in the data.  Key columns must be strings
    (the only key shape this engine's tables use); sums must be over exact
    types (ints, or integer-valued floats below 2**53) so results are
    order-independent under the value-hash oracle.

    Scale shape: ONE all-to-all.  The map side replicates each batch once
    per grouping set but collapses it to per-set distinct key combos with a
    vectorized ``pyarrow`` group_by before anything shuffles — the exchange
    carries |sets| x (distinct combos per block) partial rows, never
    |sets| x |rows|.  Rolled-up keys travel as a sentinel string (Ray's
    sort-based groupby needs orderable keys) and are restored to NULL in a
    final stateless pass.
    """
    _SENT = "\x00\x00rollup"
    bit = {k: 1 << (len(keys) - 1 - i) for i, k in enumerate(keys)}
    gids = [sum(bit[k] for k in keys if k not in s) for s in sets]
    value_cols = sorted(set(sum_cols.values()))
    sum_names = list(sum_cols)

    def partial(batch: pa.Table) -> pa.Table:
        outs = []
        for s, gid in zip(sets, gids):
            cols: dict = {}
            n = batch.num_rows
            for k in keys:
                cols[k] = (batch[k] if k in s
                           else pa.array(np.full(n, _SENT, object), pa.string()))
            cols[grouping_id_col] = pa.array(
                np.full(n, gid, np.int64), pa.int64())
            for name, src in sum_cols.items():
                cols[f"__s_{name}"] = batch[src]
            cols["__cnt"] = pa.array(np.ones(n, np.int64), pa.int64())
            t = pa.table(cols)
            aggs = [(f"__s_{name}", "sum") for name in sum_names]
            aggs.append(("__cnt", "sum"))
            g = t.group_by(list(keys) + [grouping_id_col]).aggregate(aggs)
            g = g.rename_columns(
                list(keys) + [grouping_id_col]
                + [f"__s_{name}" for name in sum_names] + ["__cnt"])
            outs.append(g)
        return pa.concat_tables(outs)

    from ray.data.aggregate import Sum

    aggs = [Sum(f"__s_{name}", alias_name=f"__s_{name}")
            for name in sum_names]
    aggs.append(Sum("__cnt", alias_name="__cnt"))
    merged = ds.select_columns(
        sorted(set(keys) | set(value_cols))) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(list(keys) + [grouping_id_col]).aggregate(*aggs)

    def finalize(batch: pa.Table) -> pa.Table:
        cols: dict = {}
        for k in keys:
            arr = batch[k]
            mask = pc.equal(arr, _SENT)
            cols[k] = pc.if_else(mask, pa.scalar(None, pa.string()), arr)
        cols[grouping_id_col] = batch[grouping_id_col]
        for name in sum_names:
            cols[name] = batch[f"__s_{name}"]
        cols[count_alias] = batch["__cnt"]
        return pa.table(cols)

    return merged.map_batches(finalize, batch_format="pyarrow")


def grouped_quantiles_hist(ds: rd.Dataset, *, group_col: str,
                           value_col: str,
                           qs: tuple[float, ...] = (0.5, 0.95, 0.99),
                           bin_width: float = 1.0,
                           count_alias: str = "n") -> rd.Dataset:
    """Approximate per-group quantiles from a fixed-width histogram — the
    scale sibling of ``grouped_quantiles``: the exchange carries per-block
    (group, bin, count) partials (bounded by the value RANGE / bin_width,
    not the row count), so groups of any size fit any worker.

    Deterministic frozen spec (SQL-mirrorable, unlike a t-digest): the
    answer for quantile ``q`` is ``quantile_disc`` over the BINNED values
    ``floor(v / bin_width) * bin_width`` — i.e. the lower edge of the bin
    holding the ceil(q*n)-th element.  Both engines compute the same IEEE
    double divide+floor+multiply, so results are bit-identical; error is
    bounded by ``bin_width`` by construction.

    Scale shape: one stateless vectorized binning pass with a per-batch
    ``pyarrow`` group_by combiner, then ONE groupby(group) over tiny
    histogram partials merged per group with numpy — no (group, value)
    shuffle, no per-group sort of raw values.
    """
    import math

    cols = {f"p{int(round(q * 100))}": q for q in qs}

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.floor(v / bin_width)
        t = pa.table({group_col: batch[group_col],
                      "__bin": pa.array(b, pa.float64()),
                      "__cnt": pa.array(np.ones(v.size, np.int64), pa.int64())})
        g = t.group_by([group_col, "__bin"]).aggregate([("__cnt", "sum")])
        return g.rename_columns([group_col, "__bin", "__cnt"])

    def per_group(g: pa.Table) -> pa.Table:
        key = g[group_col][0]
        b = g["__bin"].to_numpy(zero_copy_only=False)
        c = g["__cnt"].to_numpy(zero_copy_only=False)
        order = np.argsort(b, kind="stable")
        b, c = b[order], c[order]
        # merge duplicate bins arriving from different blocks
        uniq, start = np.unique(b, return_index=True)
        csum = np.add.reduceat(c, start)
        cum = np.cumsum(csum)
        n = int(cum[-1])
        out: dict = {group_col: pa.array([key.as_py()]),
                     count_alias: pa.array([n], pa.int64())}
        for name, q in cols.items():
            rank = min(n, max(1, math.ceil(q * n)))
            i = int(np.searchsorted(cum, rank))
            out[name] = pa.array([float(uniq[i] * bin_width)], pa.float64())
        return pa.table(out)

    return ds.select_columns([group_col, value_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(group_col).map_groups(per_group, batch_format="pyarrow")


def set_op(left: rd.Dataset, right: rd.Dataset, *, op: str,
           columns: tuple[str, ...]) -> rd.Dataset:
    """SQL set operations with DISTINCT semantics — ``INTERSECT``,
    ``EXCEPT`` (left minus right), ``UNION`` — over the named columns.

    Scale shape: ONE all-to-all.  Each side collapses every block to its
    distinct key combos with a vectorized ``pyarrow`` group_by and tags
    them with a presence bit per side; a single groupby then ORs the bits
    (integer ``Max``) and a stateless filter applies the set rule.  The
    exchange carries per-block distincts, never raw rows, and neither side
    is ever materialized on the driver.
    """
    from ray.data.aggregate import Max

    if op not in ("intersect", "except", "union"):
        raise ValueError(f"unsupported op: {op!r}")

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table(
                    {c: batch[c] for c in columns}
                    | {"__l": pa.array([], pa.int64()),
                       "__r": pa.array([], pa.int64())})
            t = pa.table({c: batch[c] for c in columns})
            d = t.group_by(list(columns)).aggregate([])
            n = d.num_rows
            return d.append_column(
                "__l", pa.array(np.full(n, 1 - side, np.int64), pa.int64())
            ).append_column(
                "__r", pa.array(np.full(n, side, np.int64), pa.int64()))
        return fn

    both = left.select_columns(list(columns)) \
        .map_batches(tag(0), batch_format="pyarrow") \
        .union(right.select_columns(list(columns))
               .map_batches(tag(1), batch_format="pyarrow"))
    merged = both.groupby(list(columns)).aggregate(
        Max("__l", alias_name="__l"), Max("__r", alias_name="__r"))

    def keep(batch: pa.Table) -> pa.Table:
        l = batch["__l"].to_numpy()
        r = batch["__r"].to_numpy()
        if op == "intersect":
            mask = (l == 1) & (r == 1)
        elif op == "except":
            mask = (l == 1) & (r == 0)
        else:
            mask = np.ones(l.size, bool)
        return pa.table({c: batch[c].filter(pa.array(mask))
                         for c in columns})

    return merged.map_batches(keep, batch_format="pyarrow")


def set_op_all(left: rd.Dataset, right: rd.Dataset, *, op: str,
               columns: tuple[str, ...]) -> rd.Dataset:
    """SQL set operations with BAG (ALL) semantics — ``INTERSECT ALL``
    (min of multiplicities) and ``EXCEPT ALL`` (left multiplicity minus
    right, floored at 0) — the multiset complements of :func:`set_op`.

    Scale shape: identical ONE all-to-all — each side collapses blocks to
    (key combo, count) partials with a vectorized ``pyarrow`` group_by, a
    single groupby SUMs per side, and a stateless finalize re-expands the
    result multiplicity with ``np.repeat`` (bounded by the answer size,
    never the inputs).
    """
    from ray.data.aggregate import Sum

    if op not in ("intersect_all", "except_all"):
        raise ValueError(f"unsupported op: {op!r}")

    def counted(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            t = pa.table({c: batch[c] for c in columns})
            d = t.group_by(list(columns)).aggregate([([], "count_all")])
            n = d.num_rows
            zero = pa.array(np.zeros(n, np.int64))
            cnt = d["count_all"].cast(pa.int64())
            return pa.table(
                {c: d[c] for c in columns}
                | {"__nl": cnt if side == 0 else zero,
                   "__nr": zero if side == 0 else cnt})
        return fn

    both = left.select_columns(list(columns)) \
        .map_batches(counted(0), batch_format="pyarrow") \
        .union(right.select_columns(list(columns))
               .map_batches(counted(1), batch_format="pyarrow"))
    merged = both.groupby(list(columns)).aggregate(
        Sum("__nl", alias_name="__nl"), Sum("__nr", alias_name="__nr"))

    def expand(batch: pa.Table) -> pa.Table:
        nl = batch["__nl"].to_numpy()
        nr = batch["__nr"].to_numpy()
        mult = np.minimum(nl, nr) if op == "intersect_all" \
            else np.maximum(nl - nr, 0)
        idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), mult)
        t = batch.select(list(columns)).take(pa.array(idx))
        return t

    return merged.map_batches(expand, batch_format="pyarrow")


def _bloom_positions(keys: np.ndarray, num_bits: int, num_hashes: int,
                     seed: int) -> "list[np.ndarray]":
    """Double-hashed bit positions (splitmix64) for int64/uint64 keys."""
    from ..functions.hashing import _splitmix64

    k = keys.astype(np.int64).view(np.uint64)
    h1 = _splitmix64(k + np.uint64(0x9E3779B97F4A7C15 * (seed + 1) & (2**64 - 1)))
    h2 = _splitmix64(k ^ np.uint64(0xBF58476D1CE4E5B9)) | np.uint64(1)
    mask = np.uint64(num_bits - 1)
    return [(h1 + np.uint64(i) * h2) & mask for i in range(num_hashes)]


def bloom_prefilter(big: rd.Dataset, keys: rd.Dataset, *, big_key: str,
                    keys_key: str, num_bits: int = 1 << 23,
                    num_hashes: int = 4, seed: int = 0,
                    fanin: int = 8) -> rd.Dataset:
    """Filter ``big`` to (a superset of) the rows whose ``big_key`` appears
    in ``keys`` — the classic shuffle-pruning pattern for big-big joins: a
    Bloom filter of the key side is tiny (``num_bits/8`` bytes regardless
    of key count) where an exact broadcast set would not fit, and the rows
    it removes never enter the downstream exchange.  Follow with an exact
    ``shuffle_hash_join(how="semi")`` over the survivors when exact
    semantics are required (false-positive rate ~(1-e^(-kn/m))^k; zero
    false NEGATIVES by construction, so the composition is exact).

    Scale shape: the key side collapses to ONE fixed-size bitmap — each
    block builds a partial (vectorized splitmix64 double hashing), partials
    OR-merge through a ``fanin``-way Ray task tree (O(log blocks) rounds,
    driver never sees more than the final bitmap), the result is
    ``ray.put`` once, and the big side streams through a stateless probe.
    ``num_bits`` must be a power of two.  int64 keys only (the engine's
    join keys); hash strings to int64 first (`functions/hashing`).
    """
    if num_bits & (num_bits - 1):
        raise ValueError("num_bits must be a power of two")
    words = num_bits // 64

    def partial(batch: pa.Table) -> pa.Table:
        bits = np.zeros(words, np.uint64)
        if batch.num_rows and keys_key in batch.column_names:
            k = batch[keys_key].to_numpy(zero_copy_only=False)
            for pos in _bloom_positions(k, num_bits, num_hashes, seed):
                np.bitwise_or.at(bits, pos >> np.uint64(6),
                                 np.uint64(1) << (pos & np.uint64(63)))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    part_refs = keys.select_columns([keys_key]) \
        .map_batches(partial, batch_format="pyarrow") \
        .materialize().to_arrow_refs()

    @ray.remote
    def or_merge(*tables: pa.Table) -> pa.Table:
        acc = np.zeros(words, np.uint64)
        for t in tables:
            if t.num_rows:
                acc |= np.frombuffer(t["bits"][0].as_py(), np.uint64)
        return pa.table({"bits": pa.array([acc.tobytes()], pa.binary())})

    refs = list(part_refs)
    while len(refs) > 1:
        refs = [or_merge.remote(*refs[i:i + fanin])
                for i in range(0, len(refs), fanin)]
    bits_tbl = ray.get(refs[0]) if refs else None
    final = (np.frombuffer(bits_tbl["bits"][0].as_py(), np.uint64)
             if bits_tbl is not None and bits_tbl.num_rows
             else np.zeros(words, np.uint64))
    bits_ref = ray.put(final)

    def probe(batch: pa.Table, _ref=bits_ref) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        bits = ray.get(_ref)
        k = batch[big_key].to_numpy(zero_copy_only=False)
        keep = np.ones(k.size, bool)
        for pos in _bloom_positions(k, num_bits, num_hashes, seed):
            keep &= ((bits[pos >> np.uint64(6)]
                      >> (pos & np.uint64(63))) & np.uint64(1)).astype(bool)
        return batch.filter(pa.array(keep))

    return big.map_batches(probe, batch_format="pyarrow")


def pivot_counts(ds: rd.Dataset, *, group_col: str, pivot_col: str,
                 values: tuple[str, ...],
                 other_alias: str | None = "other") -> rd.Dataset:
    """Pivot a categorical column into per-value count columns (the
    long->wide reshape: one output row per group, one int64 column per
    pivot value, optionally an ``other`` bucket for unlisted values).
    Counts (not float sums) keep the result exact under the value-hash
    oracle regardless of combine order.

    Scale shape: ONE all-to-all — each block collapses to per-(group,
    value) partial counts widened locally (vectorized searchsorted), so
    the exchange carries |values|+2 int64 columns per distinct group per
    block, never raw rows.
    """
    from ray.data.aggregate import Sum

    vals = np.array(sorted(values), object)
    names = list(vals) + ([other_alias] if other_alias else [])

    def partial(batch: pa.Table) -> pa.Table:
        g = batch[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        enc = g.dictionary_encode()
        gidx = np.asarray(enc.indices.to_numpy(zero_copy_only=False),
                          np.int64)
        keys = enc.dictionary.to_pylist()
        p = np.asarray(batch[pivot_col].to_numpy(zero_copy_only=False),
                       object)
        pos = np.searchsorted(vals, p)
        pos = np.clip(pos, 0, max(vals.size - 1, 0))
        hit = (vals[pos] == p) if vals.size else np.zeros(p.size, bool)
        col_of = np.where(hit, pos, vals.size)  # last column = other
        ncols = vals.size + 1
        counts = np.zeros((len(keys), ncols), np.int64)
        np.add.at(counts, (gidx, col_of), 1)
        out = {group_col: pa.array(keys)}
        for j, name in enumerate(list(vals)):
            out[name] = pa.array(counts[:, j], pa.int64())
        if other_alias:
            out[other_alias] = pa.array(counts[:, vals.size], pa.int64())
        return pa.table(out)

    aggs = [Sum(n, alias_name=n) for n in names]
    return ds.select_columns([group_col, pivot_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(group_col).aggregate(*aggs)


def unpivot(ds: rd.Dataset, *, id_cols: tuple[str, ...],
            value_cols: tuple[str, ...], var_name: str = "variable",
            value_name: str = "value",
            include_nulls: bool = False) -> rd.Dataset:
    """Wide -> long reshape (pivot_counts' inverse, SQL UNPIVOT / melt):
    one output row per (input row, value column), carrying the id columns,
    the column NAME and its value.  NULL cells are DROPPED by default —
    SQL UNPIVOT semantics — and kept (as null value rows) with
    ``include_nulls=True`` (pandas ``melt`` semantics).

    Scale shape: pure per-batch — the id columns are reused zero-copy per
    value column, the name column is a run-end-compressible constant, and
    no exchange happens at all; |value_cols| × input rows stream out with
    backpressure.  Value columns are cast to a common Arrow type up front
    so concatenation is well-typed (mixed int/float unpivots promote).
    """
    if not value_cols:
        raise ValueError("unpivot: need at least one value column")

    def melt(batch: pa.Table) -> pa.Table:
        vtype = batch.schema.field(value_cols[0]).type
        for c in value_cols[1:]:
            t = batch.schema.field(c).type
            if t != vtype:
                vtype = pa.float64() if (pa.types.is_floating(t)
                                         or pa.types.is_floating(vtype)) \
                    else pa.int64()
        parts = []
        for c in value_cols:
            src = batch if include_nulls else batch.filter(
                pc.is_valid(batch[c]))
            t = src.select(list(id_cols))
            t = t.append_column(
                var_name, pa.DictionaryArray.from_arrays(
                    pa.array(np.zeros(len(src), np.int32)),
                    pa.array([c], pa.string())).cast(pa.string()))
            parts.append(t.append_column(value_name, src[c].cast(vtype)))
        return pa.concat_tables(parts)

    return ds.select_columns(list(id_cols) + list(value_cols)) \
        .map_batches(melt, batch_format="pyarrow")


def grouped_mode(ds: rd.Dataset, *, group_col: str, value_col: str,
                 count_alias: str = "n") -> rd.Dataset:
    """Most frequent value per group, deterministic (ties: smallest value).

    Scale shape: per-batch (group, value) partial counts via a vectorized
    ``pyarrow`` group_by, ONE groupby over the (group, value) partials,
    then the ≤1-row-per-(group, block) ``grouped_topk`` merge — raw rows
    never shuffle, and no group's distinct-value set needs to fit anywhere
    special.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({group_col: batch[group_col],
                      value_col: batch[value_col]})
        g = t.group_by([group_col, value_col]).aggregate([([], "count_all")])
        return g.rename_columns([group_col, value_col, "__c"])

    counts = ds.select_columns([group_col, value_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby([group_col, value_col]) \
        .aggregate(Sum("__c", alias_name=count_alias))
    top = grouped_topk(counts, group_col=group_col, order_col=count_alias,
                       tie_col=value_col, k=1, descending=True)

    def strip(batch: pa.Table) -> pa.Table:
        return batch.drop_columns(["rank"])

    return top.map_batches(strip, batch_format="pyarrow")


def global_quantiles(ds: rd.Dataset, *, value_col: str,
                     qs: tuple[float, ...] = (0.25, 0.5, 0.9),
                     n_buckets: int = 4096) -> pa.Table:
    """Exact GLOBAL discrete quantiles over an int64 column via iterative
    histogram refinement — the scale path :func:`grouped_quantiles`'
    docstring promises for data that cannot sort in one worker.

    No sort, no row shuffle, no materialization: each round is one pruned
    column pass that bins every batch's values into ``n_buckets`` buckets
    per still-active quantile (``<= len(qs) * n_buckets`` tiny count rows
    leave each batch) plus a metadata-scale ``groupby(bucket)`` sum; the
    candidate range shrinks ``n_buckets``-fold per round, so a 2^36-wide
    value domain resolves in 3 passes.  Driver holds one (quantile,
    bucket) count table per round — O(len(qs) * n_buckets), never rows.

    Semantics are DuckDB ``quantile_disc``: result = ``sorted[ceil(q*n)
    - 1]`` — an actual element of the column, bit-identical across
    engines.  NULLs are skipped (SQL aggregate semantics).  Returns a
    small in-memory table ``(q, value, n)``.
    """
    import math

    col, n, lo0, hi0 = _global_column_stats(ds, value_col)
    if n == 0:
        return pa.table({"q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})
    ks = {float(q): min(n, max(1, math.ceil(q * n))) for q in qs}
    by_rank = _global_rank_select(col, value_col, set(ks.values()),
                                  lo0, hi0, n_buckets)
    out = sorted((q, by_rank[k]) for q, k in ks.items())
    return pa.table({"q": pa.array([q for q, _ in out], pa.float64()),
                     "value": pa.array([v for _, v in out], pa.int64()),
                     "n": pa.array([n] * len(out), pa.int64())})


def _global_column_stats(ds: rd.Dataset, value_col: str
                         ) -> tuple[rd.Dataset, int, int, int]:
    """(pruned column dataset, non-null count, min, max) in one pass."""
    from ray.data.aggregate import Count, Max, Min

    col = ds.select_columns([value_col])
    stats = col.aggregate(Min(value_col), Max(value_col),
                          Count(value_col, ignore_nulls=True))
    n = int(stats[f"count({value_col})"])
    if n == 0:
        return col, 0, 0, 0
    return (col, n, int(stats[f"min({value_col})"]),
            int(stats[f"max({value_col})"]))


def _global_rank_select(col: rd.Dataset, value_col: str, ranks: set[int],
                        lo0: int, hi0: int, n_buckets: int
                        ) -> dict[int, int]:
    """Exact value at each 1-based RANK of the sorted int64 column, by the
    iterative histogram refinement documented in :func:`global_quantiles`
    (which now delegates here).  All requested ranks refine concurrently:
    one pruned column pass per round regardless of ``len(ranks)``."""
    # state per rank: [lo, hi] candidate range + residual rank k within it
    state = {int(r): [lo0, hi0, int(r)] for r in ranks}

    while True:
        active = {q: (lo, hi) for q, (lo, hi, _k) in state.items()
                  if lo < hi}
        if not active:
            break
        plan = {q: (lo, max(1, (hi - lo + n_buckets) // n_buckets))
                for q, (lo, hi) in active.items()}
        qi_of = {q: i for i, q in enumerate(sorted(active))}

        def hist(batch: pa.Table, plan=plan, qi_of=qi_of,
                 active=active) -> pa.Table:
            v = batch[value_col].drop_null().to_numpy(zero_copy_only=False)
            qi_out, b_out, c_out = [], [], []
            for q, (lo, width) in plan.items():
                hi = active[q][1]
                x = v[(v >= lo) & (v <= hi)]
                if not x.size:
                    continue
                b = (x - lo) // width
                counts = np.bincount(b)
                nz = np.flatnonzero(counts)
                qi_out.append(np.full(nz.size, qi_of[q], np.int32))
                b_out.append(nz.astype(np.int64))
                c_out.append(counts[nz].astype(np.int64))
            if not qi_out:
                return pa.table({"qi": pa.array([], pa.int32()),
                                 "bucket": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64())})
            return pa.table({
                "qi": pa.array(np.concatenate(qi_out)),
                "bucket": pa.array(np.concatenate(b_out)),
                "cnt": pa.array(np.concatenate(c_out)),
            })

        from ray.data.aggregate import Sum

        rows = drop_empty_blocks(
            col.map_batches(hist, batch_format="pyarrow")
            .groupby(["qi", "bucket"]).aggregate(Sum("cnt", alias_name="c")),
            empty_schema=pa.schema([("qi", pa.int32()),
                                    ("bucket", pa.int64()),
                                    ("c", pa.int64())])).take_all()
        by_q: dict[int, list] = {}
        for r in rows:
            by_q.setdefault(int(r["qi"]), []).append(
                (int(r["bucket"]), int(r["c"])))
        for q, (lo, width) in plan.items():
            buckets = sorted(by_q.get(qi_of[q], []))
            k = state[q][2]
            acc = 0
            for b, c in buckets:
                if acc + c >= k:
                    state[q][0] = lo + b * width
                    state[q][1] = min(state[q][1], lo + (b + 1) * width - 1)
                    state[q][2] = k - acc
                    break
                acc += c

    return {r: lo for r, (lo, _hi, _k) in state.items()}


def global_percentile_cont(ds: rd.Dataset, *, value_col: str,
                           ps: tuple[int, ...] = (25, 50, 90),
                           n_buckets: int = 4096) -> pa.Table:
    """Exact GLOBAL interpolated percentiles (SQL ``PERCENTILE_CONT`` /
    DuckDB ``quantile_cont``) over an int64 column, without a sort and
    with an INTEGER-EXACT output — no float interpolation on either side
    of the oracle.

    For integer percent ``p`` over ``n`` values the continuous quantile
    sits at 0-based position ``h = (n-1) * p / 100`` between the order
    statistics at ranks ``floor(h)`` and ``floor(h)+1``; both are exact
    integers from :func:`_global_rank_select` (one shared histogram-
    refinement pass resolves every needed rank), and the interpolation
    ``lo + (h - floor(h)) * (hi - lo)`` is returned scaled by 100:
    ``interp_x100 = lo * (100 - num) + hi * num`` with
    ``num = (n-1) * p mod 100`` — pure int64 arithmetic, bit-stable
    across engines (``interp_x100 / 100`` is the SQL double).

    Returns a small table ``(p, n, rank_lo, lo_value, hi_value, frac_num,
    interp_x100)`` sorted by ``p``.
    """
    col, n, lo0, hi0 = _global_column_stats(ds, value_col)
    if n == 0:
        empty = pa.array([], pa.int64())
        return pa.table({"p": empty, "n": empty, "rank_lo": empty,
                         "lo_value": empty, "hi_value": empty,
                         "frac_num": empty, "interp_x100": empty})
    plan = {}
    ranks: set[int] = set()
    for p in ps:
        if not (0 <= p <= 100):
            raise ValueError(f"percent {p} outside [0, 100]")
        h100 = (n - 1) * int(p)               # h * 100, exact integer
        rank_lo = h100 // 100 + 1             # 1-based floor rank
        num = h100 % 100
        rank_hi = rank_lo + 1 if num else rank_lo
        plan[int(p)] = (rank_lo, rank_hi, num)
        ranks.update((rank_lo, rank_hi))
    by_rank = _global_rank_select(col, value_col, ranks, lo0, hi0, n_buckets)
    rows = []
    for p in sorted(plan):
        rank_lo, rank_hi, num = plan[p]
        lo, hi = by_rank[rank_lo], by_rank[rank_hi]
        rows.append((p, n, rank_lo, lo, hi, num,
                     lo * (100 - num) + hi * num))
    cols = list(zip(*rows))
    names = ["p", "n", "rank_lo", "lo_value", "hi_value", "frac_num",
             "interp_x100"]
    return pa.table({nm: pa.array(list(c), pa.int64())
                     for nm, c in zip(names, cols)})


def range_merge_join(left: rd.Dataset, right: rd.Dataset, *,
                     on: str, right_on: str | None = None,
                     how: str = "inner",
                     num_partitions: int | None = None,
                     sample_per_block: int = 64) -> rd.Dataset:
    """Range-partitioned SORT-MERGE equi-join — the ordered complement to
    :func:`shuffle_hash_join`.

    Plan: (1) a bounded deterministic key sample of the left side (every
    n/``sample_per_block``-th key per block — ``blocks × 64`` scalars on
    the driver, never row-proportional) picks ``num_partitions - 1``
    equal-frequency BOUNDARIES, so clustered / monotone key
    distributions that a hash partitioner would scatter stay range-local
    and ranges balance by observed row count; (2) both sides tag a range
    id with ONE vectorized ``searchsorted`` per batch and exchange on
    it; (3) each co-ranged pair merge-joins locally, fully vectorized
    (sort both sides by key, ``searchsorted`` lo/hi bounds per left row,
    ``np.repeat`` pair expansion — no per-row Python).  Output rows come
    out key-sorted WITHIN each range (downstream merges / ordered writes
    read runs, not shuffles).

    SQL NULL-key contract (pinned for the other two join primitives):
    ``inner`` drops null-key rows on both sides; ``left`` keeps left
    rows with a null payload.  ``how``: inner | left.  Non-key column
    names must be disjoint.  The sample pass re-executes the left
    upstream once (the documented recompute-over-materialize tradeoff —
    same as the substring-dedup df pass).
    """
    if how not in ("inner", "left"):
        raise ValueError("range_merge_join supports how = inner | left")
    rkey = right_on or on
    if num_partitions is None:
        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 8)))

    def sample(batch: pa.Table) -> pa.Table:
        col = batch[on].drop_null()
        n = len(col)
        if n == 0:
            return pa.table({on: col})
        step = max(1, n // sample_per_block)
        return pa.table({on: col.take(pa.array(
            np.arange(0, n, step, dtype=np.int64)))})

    sampled = left.select_columns([on]) \
        .map_batches(sample, batch_format="pyarrow").take_all()
    keys = np.sort(np.array([r[on] for r in sampled]))
    if keys.size:
        qs = np.linspace(0, keys.size - 1, num_partitions + 1)[1:-1]
        bounds = np.unique(keys[qs.astype(np.int64)])
    else:
        bounds = keys[:0]

    def tag(batch: pa.Table, side: int, key: str,
            other_cols: list[tuple[str, pa.DataType]]) -> pa.Table:
        valid = pc.is_valid(batch[key])
        if side == 1 or how == "inner":
            batch = batch.filter(valid)
            k = batch[key].to_numpy(zero_copy_only=False)
            rid = np.searchsorted(bounds, k, side="right").astype(np.int64)
        else:  # left outer keeps null-key left rows, own range
            k = batch[key].to_numpy(zero_copy_only=False)
            rid = np.where(
                valid.to_numpy(zero_copy_only=False),
                np.searchsorted(
                    bounds,
                    np.where(valid.to_numpy(zero_copy_only=False), k, bounds[0] if bounds.size else 0),
                    side="right"),
                -1).astype(np.int64)
        out = {"_rid": pa.array(rid, pa.int64()),
               "_side": pa.array(np.full(len(batch), side, np.int64),
                                 pa.int64())}
        for name in batch.column_names:
            out[name] = batch[name]
        for name, typ in other_cols:
            out[name] = pa.nulls(len(batch), typ)
        return pa.table(out)

    lschema, rschema = left.schema(), right.schema()
    lcols = list(zip(lschema.names, lschema.types))
    rcols = [(n, t) for n, t in zip(rschema.names, rschema.types)
             if n != rkey]
    # rcols excludes the right key (it merges onto ``on``), so ANY name
    # shared with the left — including a right payload column named like
    # ``on`` — is a genuine collision
    overlap = {n for n, _ in lcols} & {n for n, _ in rcols}
    if overlap:
        raise ValueError(f"range_merge_join: overlapping non-key columns "
                         f"{sorted(overlap)}")

    tagged_l = left.map_batches(
        lambda b: tag(b, 0, on, rcols), batch_format="pyarrow")
    # the right key column is renamed onto the left's so the merged
    # output carries ONE key column (USING semantics, like Dataset.join)
    def shape_right(b: pa.Table) -> pa.Table:
        if rkey != on:
            b = b.rename_columns(
                [on if c == rkey else c for c in b.column_names])
        return tag(b, 1, on, [(n, t) for n, t in lcols if n != on])

    tagged_r = right.map_batches(shape_right, batch_format="pyarrow")
    unioned = tagged_l.union(tagged_r)

    l_names = [n for n, _ in lcols]
    r_names = [n for n, _ in rcols if n != on]

    def merge(g: pa.Table) -> pa.Table:
        side = g["_side"].to_numpy(zero_copy_only=False)
        lt = g.filter(pa.array(side == 0)).select(l_names)
        rt = g.filter(pa.array(side == 1)).select([on] + r_names)
        if len(lt) == 0:
            # a range with only right-side rows joins to nothing
            return pa.table({**{n: lt[n] for n in l_names},
                             **{n: pa.nulls(0, rt[n].type)
                                for n in r_names}})
        lk = lt[on].to_numpy(zero_copy_only=False)
        lorder = np.argsort(lk, kind="stable")
        lt = lt.take(pa.array(lorder))
        lk = lk[lorder]
        rk = rt[on].to_numpy(zero_copy_only=False)
        rorder = np.argsort(rk, kind="stable")
        rt = rt.take(pa.array(rorder))
        rk = rk[rorder]
        # null-key left rows (how="left", rid == -1 groups) match nothing
        lvalid = pc.is_valid(lt[on]).to_numpy(zero_copy_only=False)
        lo = np.searchsorted(rk, lk, side="left")
        hi = np.searchsorted(rk, lk, side="right")
        cnt = np.where(lvalid, hi - lo, 0)
        total = int(cnt.sum())
        l_idx = np.repeat(np.arange(lk.size, dtype=np.int64), cnt)
        starts = np.repeat(np.cumsum(cnt) - cnt, cnt)
        r_idx = np.repeat(lo, cnt) + (np.arange(total, dtype=np.int64)
                                      - starts)
        out_l = lt.take(pa.array(l_idx, pa.int64()))
        out_r = rt.take(pa.array(r_idx, pa.int64()))
        cols = {n: out_l[n] for n in l_names}
        for n in r_names:
            cols[n] = out_r[n]
        matched = pa.table(cols)
        if how == "inner":
            return matched
        miss = cnt == 0
        if not miss.any():
            return matched
        lt_miss = lt.filter(pa.array(miss))
        mcols = {n: lt_miss[n] for n in l_names}
        for n in r_names:
            mcols[n] = pa.nulls(len(lt_miss), rt[n].type)
        return pa.concat_tables([matched, pa.table(mcols)],
                                promote_options="permissive")

    return unioned.groupby("_rid").map_groups(merge,
                                              batch_format="pyarrow")


def grouped_percentile_cont_refined(ds: rd.Dataset, *, group_col: str,
                                    value_col: str,
                                    ps: tuple[int, ...] = (50, 90),
                                    n_buckets: int = 1024,
                                    count_alias: str = "n") -> pa.Table:
    """Exact per-group PERCENTILE_CONT WITHOUT the one-worker-per-group
    sort — the corpus-scale path :func:`grouped_percentile_cont`'s
    docstring promises: the same iterative histogram-refinement rank
    selection as :func:`_global_rank_select`, run for EVERY group's
    ranks concurrently.  Each round broadcasts per-(group, rank-slot)
    integer bounds once via ``ray.put``, every block bins its rows
    vectorized (one searchsorted group lookup + one bincount per slot —
    no per-group Python inside the pass), and one (group, slot, bucket)
    groupby returns bucket counts; ranges shrink ×``n_buckets`` per
    round, so an int64 cents domain resolves in 2-3 passes regardless
    of group sizes.  No group ever sorts in one worker.

    Output: identical columns and values to
    :func:`grouped_percentile_cont` — ``(group, n, p{p}_x100 ...)`` as a
    driver-side ``pa.Table`` (group-cardinality: the same size every
    grouped-aggregate consumer already holds; at extreme group counts
    the driver state is the documented bound).
    """
    from ray.data.aggregate import Max, Min, Sum

    for p in ps:
        if not (0 <= int(p) <= 100):
            raise ValueError(f"percent {p} outside [0, 100]")

    def stats_partial(b: pa.Table) -> pa.Table:
        g = b[group_col].to_numpy(zero_copy_only=False)
        v = b[value_col].to_numpy(zero_copy_only=False)
        keys, inv = np.unique(g, return_inverse=True)
        n = np.bincount(inv, minlength=keys.size).astype(np.int64)
        mn = np.full(keys.size, np.iinfo(np.int64).max, np.int64)
        mx = np.full(keys.size, np.iinfo(np.int64).min, np.int64)
        np.minimum.at(mn, inv, v)
        np.maximum.at(mx, inv, v)
        return pa.table({group_col: pa.array(keys),
                         "n": pa.array(n, pa.int64()),
                         "mn": pa.array(mn, pa.int64()),
                         "mx": pa.array(mx, pa.int64())})

    stats = ds.map_batches(stats_partial, batch_format="pyarrow") \
        .groupby(group_col) \
        .aggregate(Sum("n", alias_name="n"),
                   Min("mn", alias_name="mn"),
                   Max("mx", alias_name="mx"))
    st = pa.concat_tables(
        [t for t in ray.get(stats.materialize().to_arrow_refs())
         if t.num_columns], promote_options="permissive")
    groups = st[group_col].to_pylist()
    ns = st["n"].to_numpy(zero_copy_only=False)
    mns = st["mn"].to_numpy(zero_copy_only=False)
    mxs = st["mx"].to_numpy(zero_copy_only=False)
    g_sorted = np.argsort(np.asarray(groups), kind="stable")
    groups = [groups[i] for i in g_sorted]
    ns, mns, mxs = ns[g_sorted], mns[g_sorted], mxs[g_sorted]
    g_keys = np.asarray(groups)

    # rank plan per group: each percent needs the order statistics at
    # rank_lo and (if interpolating) rank_lo + 1 — at most 2*len(ps)
    # distinct ranks per group; slot j holds the j-th distinct rank
    rank_lists = []
    for gi in range(len(groups)):
        n = int(ns[gi])
        rset = set()
        for p in ps:
            h100 = (n - 1) * int(p)
            r_lo = h100 // 100 + 1
            rset.add(r_lo)
            if h100 % 100:
                rset.add(r_lo + 1)
        rank_lists.append(sorted(rset))
    n_slots = max(len(r) for r in rank_lists) if rank_lists else 0
    n_groups = len(groups)
    lo = np.zeros((n_groups, n_slots), np.int64)
    hi = np.zeros((n_groups, n_slots), np.int64)
    kk = np.zeros((n_groups, n_slots), np.int64)   # residual rank
    live = np.zeros((n_groups, n_slots), bool)
    for gi, rl in enumerate(rank_lists):
        for j, r in enumerate(rl):
            lo[gi, j], hi[gi, j], kk[gi, j] = mns[gi], mxs[gi], r
            live[gi, j] = True

    while True:
        active = live & (lo < hi)
        if not active.any():
            break
        width = np.maximum(1, (hi - lo + n_buckets) // n_buckets)
        ref = ray.put((g_keys, lo.copy(), hi.copy(), width.copy(),
                       active.copy()))

        def hist(batch: pa.Table) -> pa.Table:
            keys, los, his, widths, act = ray.get(ref)
            g = batch[group_col].to_numpy(zero_copy_only=False)
            v = batch[value_col].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(keys, g)
            pos = np.clip(pos, 0, max(0, keys.size - 1))
            ok_g = (keys.size > 0) & (keys[pos] == g)
            gi_out, sl_out, b_out, c_out = [], [], [], []
            for j in range(los.shape[1]):
                in_rng = ok_g & act[pos, j] \
                    & (v >= los[pos, j]) & (v <= his[pos, j])
                if not in_rng.any():
                    continue
                gi = pos[in_rng]
                b = (v[in_rng] - los[gi, j]) // widths[gi, j]
                key = gi * n_buckets + b      # slot-local composite
                u, c = np.unique(key, return_counts=True)
                gi_out.append((u // n_buckets).astype(np.int64))
                sl_out.append(np.full(u.size, j, np.int64))
                b_out.append((u % n_buckets).astype(np.int64))
                c_out.append(c.astype(np.int64))
            if not gi_out:
                return pa.table({"gi": pa.array([], pa.int64()),
                                 "slot": pa.array([], pa.int64()),
                                 "bucket": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64())})
            return pa.table({"gi": pa.array(np.concatenate(gi_out)),
                             "slot": pa.array(np.concatenate(sl_out)),
                             "bucket": pa.array(np.concatenate(b_out)),
                             "cnt": pa.array(np.concatenate(c_out))})

        rows = drop_empty_blocks(
            ds.map_batches(hist, batch_format="pyarrow")
            .groupby(["gi", "slot", "bucket"])
            .aggregate(Sum("cnt", alias_name="c")),
            empty_schema=pa.schema([("gi", pa.int64()),
                                    ("slot", pa.int64()),
                                    ("bucket", pa.int64()),
                                    ("c", pa.int64())])).take_all()
        by_gs: dict[tuple[int, int], list] = {}
        for r in rows:
            by_gs.setdefault((int(r["gi"]), int(r["slot"])), []).append(
                (int(r["bucket"]), int(r["c"])))
        for (gi, j), buckets in by_gs.items():
            if not active[gi, j]:
                continue
            w = int(width[gi, j])
            base = int(lo[gi, j])
            k = int(kk[gi, j])
            acc = 0
            for b, c in sorted(buckets):
                if acc + c >= k:
                    lo[gi, j] = base + b * w
                    hi[gi, j] = min(int(hi[gi, j]), base + (b + 1) * w - 1)
                    kk[gi, j] = k - acc
                    break
                acc += c

    out: dict = {group_col: pa.array(groups),
                 count_alias: pa.array(ns, pa.int64())}
    for p in ps:
        vals = []
        for gi in range(n_groups):
            n = int(ns[gi])
            h100 = (n - 1) * int(p)
            r_lo = h100 // 100 + 1
            num = h100 % 100
            rl = rank_lists[gi]
            v_lo = int(lo[gi, rl.index(r_lo)])
            v_hi = int(lo[gi, rl.index(r_lo + 1)]) if num else v_lo
            vals.append(v_lo * (100 - num) + v_hi * num)
        out[f"p{int(p)}_x100"] = pa.array(vals, pa.int64())
    return pa.table(out)
