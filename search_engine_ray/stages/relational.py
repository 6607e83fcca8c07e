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
