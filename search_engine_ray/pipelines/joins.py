"""Custom joins Ray Data lacks as built-ins (SURVEY custom-operator note).

As-of join: each left row matches the single right row with the greatest
``right_ts <= left_ts`` within the same key — the standard event-stream ×
slowly-changing-dimension join.

Expressed as ONE ``groupby(key)`` over the tagged union of both sides (no
broadcast, no per-batch reshipping): within a key's group, right rows are
sorted once and left rows resolve by ``np.searchsorted``.  Partitioning
assumption (documented per the custom-operator contract): one key's rows fit
a worker — keys are users/entities, so group size is bounded by per-entity
activity, not corpus size; a pathological hot key would need key-salting
plus right-side replication, which this implementation does not do.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    key_col: str,
    left_ts_col: str = "ts",
    right_ts_col: str = "ts",
    right_value_cols: list[str],
    left_keep_cols: list[str],
) -> rd.Dataset:
    """For every left row: the latest right row with ``ts <= left_ts`` of
    the same key.  Unmatched left rows are dropped (inner as-of semantics,
    = DuckDB ``ASOF JOIN``).  Output columns: ``left_keep_cols`` +
    ``right_ts_us`` (int64 epoch us) + ``right_<value_col>``.

    Documented contract: ``left_keep_cols`` must be int64-typed (they ride
    through the tagged union as int64 nulls on the right side); right values
    are carried as float64; (key, right_ts) pairs should be unique — ties on
    right_ts resolve arbitrarily among the tied rows.
    """

    def tag_left(batch: pa.Table) -> pa.Table:
        cols = {key_col: batch[key_col]}
        for c in left_keep_cols:
            if c != key_col:
                cols[c] = batch[c].cast(pa.int64())
        cols["_ts_us"] = batch[left_ts_col].cast(pa.int64())
        cols["_side"] = pa.array(np.zeros(batch.num_rows, np.int8))
        t = pa.table(cols)
        for c in right_value_cols:  # schema union: right cols as nulls
            t = t.append_column(f"_r_{c}", pa.nulls(batch.num_rows, pa.float64()))
        return t

    def tag_right(batch: pa.Table) -> pa.Table:
        cols = {key_col: batch[key_col]}
        cols["_ts_us"] = batch[right_ts_col].cast(pa.int64())
        cols["_side"] = pa.array(np.ones(batch.num_rows, np.int8))
        t = pa.table(cols)
        for c in left_keep_cols:
            if c != key_col:
                t = t.append_column(c, pa.nulls(batch.num_rows, pa.int64()))
        for c in right_value_cols:
            t = t.append_column(f"_r_{c}", batch[c].cast(pa.float64()))
        return t

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.map_batches(tag_right, batch_format="pyarrow")

    def resolve(group: pa.Table) -> pa.Table:
        side = group["_side"].to_numpy(zero_copy_only=False)
        ts = group["_ts_us"].to_numpy(zero_copy_only=False)
        r_mask = side == 1
        l_mask = ~r_mask
        r_ts = ts[r_mask]
        order = np.argsort(r_ts, kind="stable")
        r_ts = r_ts[order]
        l_ts = ts[l_mask]
        pos = np.searchsorted(r_ts, l_ts, side="right") - 1
        matched = pos >= 0
        l_idx = np.flatnonzero(l_mask)[matched]
        r_global = np.flatnonzero(r_mask)[order]
        m_idx = r_global[pos[matched]]

        out = {}
        for c in left_keep_cols:
            out[c] = group[c].take(pa.array(l_idx, pa.int64()))
        out["right_ts_us"] = pa.array(ts[m_idx], pa.int64())
        for c in right_value_cols:
            out[f"right_{c}"] = group[f"_r_{c}"].take(pa.array(m_idx, pa.int64()))
        return pa.table(out)

    return lt.union(rt).groupby(key_col).map_groups(resolve,
                                                    batch_format="pyarrow")


def bounded_interval_join(
    events: rd.Dataset,
    intervals: pa.Table,
    *,
    ts_col: str = "ts",
    id_col: str = "interval_id",
    start_col: str = "start_us",
    max_len_us: int,
    keep_cols: list[str] | None = None,
) -> rd.Dataset:
    """Range join: event rows x (possibly overlapping) fixed-length
    intervals, ``start <= ts <= start + max_len_us`` inclusive.

    The interval table is the SMALL side: broadcast once (``ray.put``),
    sorted by start.  Per batch, each event's candidate intervals are the
    contiguous run of starts in ``[ts - max_len_us, ts]`` — two
    ``searchsorted`` calls — and the (event, interval) pairs explode
    vectorized.  The bounded length is what makes the candidate set a
    contiguous run; arbitrary-length intervals would need an interval
    tree or a partition-by-time-bucket shuffle instead (documented
    custom-operator contract, SURVEY §2.4).
    """
    import ray

    keep_cols = keep_cols or []
    starts = intervals[start_col].to_numpy(zero_copy_only=False).astype(np.int64)
    ids = intervals[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(starts, kind="stable")
    ref = ray.put((starts[order], ids[order]))
    ml = np.int64(max_len_us)

    def join_batch(batch: pa.Table) -> pa.Table:
        g_starts, g_ids = ray.get(ref)
        ts = batch[ts_col].cast(pa.int64()).to_numpy()
        lo = np.searchsorted(g_starts, ts - ml, side="left")
        hi = np.searchsorted(g_starts, ts, side="right")
        counts = hi - lo
        n_out = int(counts.sum())
        row_of = np.repeat(np.arange(ts.size), counts)
        # flat candidate index: lo[row] + position-within-run
        offs = np.zeros(ts.size + 1, np.int64)
        np.cumsum(counts, out=offs[1:])
        cand = lo[row_of] + (np.arange(n_out, dtype=np.int64) - offs[row_of])
        cols = {id_col: pa.array(g_ids[cand], pa.int64()),
                ts_col: batch[ts_col].take(pa.array(row_of, pa.int64()))}
        for c in keep_cols:
            cols[c] = batch[c].take(pa.array(row_of, pa.int64()))
        return pa.table(cols)

    return events.map_batches(join_batch, batch_format="pyarrow")
