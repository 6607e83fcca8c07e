"""Windowed / sessionized aggregates over the ``events`` stream table.

Ray Data has no event-time window operator; per the streaming-shaped
guidance the input is treated as a partitioned log: tumbling windows are a
plain ``groupby(key, window)`` after a vectorized window-assignment
``map_batches``; session windows sort each key's group by ts inside
``map_groups`` and split on gaps.  Ordering assumption: none for tumbling
(commutative aggregates); per-key ts sort is local to the group for
sessions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def assign_tumbling_window(batch: pa.Table, size_sec: int,
                           ts_col: str = "ts") -> pa.Table:
    epoch_us = batch[ts_col].cast(pa.int64())
    win = pc.multiply(pc.floor(pc.divide(epoch_us, size_sec * 1_000_000)).cast(pa.int64()),
                      size_sec)
    return batch.append_column("window_start", win.cast(pa.int64()))


def tumbling_window_agg(events: rd.Dataset, size_sec: int = 300,
                        key_col: str = "user_id") -> rd.Dataset:
    """Per (key, tumbling window): event count, value sum/mean/min/max."""
    ds = events.map_batches(assign_tumbling_window, batch_format="pyarrow",
                            fn_kwargs={"size_sec": size_sec})
    return ds.groupby([key_col, "window_start"]).aggregate(
        Count(alias_name="n_events"),
        Sum("value", alias_name="sum_value"),
        Mean("value", alias_name="mean_value"),
        Min("value", alias_name="min_value"),
        Max("value", alias_name="max_value"),
    )


def assign_hopping_windows(batch: pa.Table, size_sec: int, hop_sec: int,
                           ts_col: str = "ts") -> pa.Table:
    """Replicate each event into its ``size/hop`` overlapping windows
    (flat-map shaped: output rows = input rows x k).  ``size_sec`` must be a
    multiple of ``hop_sec`` so every event lands in exactly k windows."""
    if size_sec % hop_sec:
        raise ValueError("size_sec must be a multiple of hop_sec")
    k = size_sec // hop_sec
    epoch_us = batch[ts_col].cast(pa.int64()).to_numpy()
    w_last = (epoch_us // (hop_sec * 1_000_000)) * hop_sec
    n = batch.num_rows
    idx = np.repeat(np.arange(n, dtype=np.int64), k)
    offs = np.tile(np.arange(k, dtype=np.int64) * hop_sec, n)
    wins = np.repeat(w_last, k) - offs
    out = batch.take(pa.array(idx))
    return out.append_column("window_start", pa.array(wins, pa.int64()))


def hopping_window_agg(events: rd.Dataset, size_sec: int = 600,
                       hop_sec: int = 300,
                       key_col: str = "user_id") -> rd.Dataset:
    """Per (key, hopping window): count + value sum/min/max.  The window
    replication happens inside ``map_batches`` (vectorized repeat/tile), the
    wide step is the same single groupby as the tumbling case."""
    ds = events.map_batches(assign_hopping_windows, batch_format="pyarrow",
                            fn_kwargs={"size_sec": size_sec,
                                       "hop_sec": hop_sec})
    return ds.groupby([key_col, "window_start"]).aggregate(
        Count(alias_name="n_events"),
        Sum("value", alias_name="sum_value"),
        Min("value", alias_name="min_value"),
        Max("value", alias_name="max_value"),
    )


def sessionize(events: rd.Dataset, gap_sec: int = 1800,
               key_col: str = "user_id") -> rd.Dataset:
    """Gap-based session windows per key.

    ``groupby(key).map_groups``: sort the key's events by ts, start a new
    session when the gap to the previous event exceeds ``gap_sec``.  Output:
    one row per session (key, session_id, n_events, start/end epoch seconds,
    sum_value).  session_id numbers sessions per key from 0 in ts order —
    deterministic given the event set.
    """

    def per_key(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[("ts", "ascending"),
                                                  ("event_id", "ascending")])
        g = group.take(order)
        ts = g["ts"].cast(pa.int64()).to_numpy() // 1_000_000
        vals = g["value"].to_numpy()
        gaps = np.diff(ts, prepend=ts[0] if len(ts) else 0)
        new_session = gaps > gap_sec
        if len(ts):
            new_session[0] = False
        session = np.cumsum(new_session).astype(np.int64)
        n_sessions = int(session[-1]) + 1 if len(ts) else 0
        if n_sessions:
            # one pass: session boundaries -> reduceat (no per-session scan)
            bounds = np.concatenate([[0], np.flatnonzero(new_session)])
            starts = ts[bounds]
            ends = ts[np.concatenate([bounds[1:] - 1, [len(ts) - 1]])]
            counts = np.diff(np.concatenate([bounds, [len(ts)]]))
            sums = np.add.reduceat(vals, bounds)
        else:
            starts = ends = counts = np.zeros(0, np.int64)
            sums = np.zeros(0, np.float64)
        key = group[key_col][0].as_py()
        return pa.table({
            key_col: pa.array([key] * n_sessions, pa.int64()),
            "session_id": pa.array(np.arange(n_sessions, dtype=np.int64)),
            "n_events": pa.array(counts),
            "start_sec": pa.array(starts),
            "end_sec": pa.array(ends),
            "sum_value": pa.array(sums),
        })

    return events.groupby(key_col).map_groups(per_key, batch_format="pyarrow")

def rolling_agg(events: rd.Dataset, *, k: int = 4, key_col: str = "user_id",
                ts_col: str = "ts", order_col: str = "event_id",
                value_col: str = "value") -> rd.Dataset:
    """Per-key rolling-window aggregates over the last ``k`` rows
    (``ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW``): rolling integer-cent
    sum, rolling row count, rolling integer-cent max.

    Scale shape: ONE shuffle (``groupby(key)``), then vectorized numpy per
    group (prefix-sum difference for the sum, ``sliding_window_view`` max
    for the max) — same one-key-fits-a-worker contract as
    :func:`analytic_per_key`.  All value-derived outputs are
    ``floor(value*100)`` int64 cents, bit-exact vs the SQL windowed
    SUM/MAX regardless of association order or float formatting; NULL
    values are skipped exactly like SQL aggregates (a frame with no valid
    value yields NULL, COUNT(*) still counts its rows), and the bytes
    under every null bit are zeroed so the physical buffers are canonical.
    """

    def per_key(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[(ts_col, "ascending"),
                                                  (order_col, "ascending")])
        g = group.take(order)
        n = g.num_rows
        vcol = g[value_col]
        valid = pc.is_valid(vcol).to_numpy(zero_copy_only=False)
        v = pc.fill_null(vcol, 0.0).to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100.0).astype(np.int64)
        cents[~valid] = 0  # NULL contributes nothing to the windowed SUM
        cum = np.concatenate([[0], np.cumsum(cents)])
        cum_valid = np.concatenate([[0], np.cumsum(valid.astype(np.int64))])
        pos = np.arange(1, n + 1)
        lo = np.maximum(pos - k, 0)
        frame_valid = cum_valid[pos] - cum_valid[lo]
        null_frame = frame_valid == 0  # SQL: SUM/MAX over all-NULL is NULL
        roll_cents = cum[pos] - cum[lo]
        roll_n = pos.astype(np.int64) - lo
        ninf = np.iinfo(np.int64).min
        m = np.where(valid, cents, ninf)
        if n >= k:
            from numpy.lib.stride_tricks import sliding_window_view

            full = sliding_window_view(m, k).max(axis=1)
            head = np.maximum.accumulate(m[:k - 1]) if k > 1 \
                else np.empty(0, m.dtype)
            roll_max = np.concatenate([head, full])
        else:
            roll_max = np.maximum.accumulate(m) if n else m
        roll_cents[null_frame] = 0
        roll_max = np.where(null_frame, 0, roll_max)
        return pa.table({
            order_col: g[order_col],
            key_col: g[key_col],
            "rn": pa.array(pos.astype(np.int64)),
            "roll_cents": pa.array(roll_cents, pa.int64(), mask=null_frame),
            "roll_n": pa.array(roll_n, pa.int64()),
            "roll_max_cents": pa.array(roll_max, pa.int64(), mask=null_frame),
        })

    return events.groupby(key_col).map_groups(per_key, batch_format="pyarrow")


def rolling_time_agg(events: rd.Dataset, *, window_sec: int = 600,
                     key_col: str = "user_id", ts_col: str = "ts",
                     order_col: str = "event_id",
                     value_col: str = "value") -> rd.Dataset:
    """Per-key time-based rolling aggregates over the trailing
    ``window_sec`` seconds (``RANGE BETWEEN window_sec PRECEDING AND
    CURRENT ROW``): row count and integer-cent sum.

    RANGE semantics (exactly SQL's): the frame of row *i* is every row *j*
    of the key with ``ts_j`` in ``[ts_i - window_sec, ts_i]`` — including
    *peers* (rows sharing ``ts_i``) regardless of tie-break order, which is
    why the frame is computed on the ts array with two ``searchsorted``
    probes (left edge ``ts_i - W`` 'left', right edge ``ts_i`` 'right')
    rather than row offsets.  Sum is over ``floor(value*100)`` int64 cents
    (bit-exact vs the SQL windowed SUM under any association order); count
    is exact by construction.

    Scale shape: ONE shuffle (``groupby(key)``), then one sort + two
    vectorized searchsorted passes + a prefix-sum difference per group —
    same one-key-fits-a-worker contract as :func:`analytic_per_key`.
    """

    def per_key(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[(ts_col, "ascending"),
                                                  (order_col, "ascending")])
        g = group.take(order)
        n = g.num_rows
        ts = g[ts_col].cast(pa.timestamp("us"), safe=False) \
            .cast(pa.int64()).to_numpy() // 1_000_000
        v = g[value_col].to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100.0).astype(np.int64)
        cum = np.concatenate([[0], np.cumsum(cents)])
        lo = np.searchsorted(ts, ts - window_sec, side="left")
        hi = np.searchsorted(ts, ts, side="right")
        return pa.table({
            order_col: g[order_col],
            key_col: g[key_col],
            "win_n": pa.array(hi - lo, pa.int64()),
            "win_cents": pa.array(cum[hi] - cum[lo], pa.int64()),
        })

    return events.groupby(key_col).map_groups(per_key, batch_format="pyarrow")


def rolling_distinct_time(events: rd.Dataset, *, window_sec: int = 600,
                          key_col: str = "user_id", ts_col: str = "ts",
                          order_col: str = "event_id",
                          value_col: str = "event_type") -> rd.Dataset:
    """Per-key rolling COUNT(DISTINCT value) over the trailing
    ``window_sec`` seconds (``RANGE BETWEEN window_sec PRECEDING AND
    CURRENT ROW``, peer-inclusive like :func:`rolling_time_agg`) — the
    "distinct event types / distinct pages in the last N minutes"
    engagement feature that plain rolling counts can't express.

    Exact and fully vectorized via first-occurrence dominance: with the
    key's rows ts-sorted, let ``p_j`` be the index of value ``v_j``'s
    previous occurrence (−1 if none) and ``lo_i = searchsorted(ts,
    ts_i − W)``.  A row ``j`` inside the frame is a FIRST occurrence
    within it iff ``p_j < lo_i``; every ``j < lo_i`` trivially satisfies
    that (``p_j < j``), so ``distinct(i) = #{j ≤ i : p_j < lo_i} −
    lo_i``.  Because ``lo`` is nondecreasing, ``p_j < lo_i ⇔ i ≥ t_j``
    with ``t_j = searchsorted(lo, p_j, 'right')`` — each ``j``
    contributes to all ``i ≥ max(j, t_j)``, one ``bincount`` + one
    ``cumsum``.  Peers (equal ts) share a frame: the value computed at
    the run's LAST row broadcasts back over the run.  O(n log n), no
    Python loop.

    Scale shape: ONE shuffle (``groupby(key)``), same
    one-key-fits-a-worker contract as the rest of this module.
    """

    def per_key(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[(ts_col, "ascending"),
                                                  (order_col, "ascending")])
        g = group.take(order)
        n = g.num_rows
        ts = g[ts_col].cast(pa.timestamp("us"), safe=False) \
            .cast(pa.int64()).to_numpy() // 1_000_000
        vcol = g[value_col]
        enc = (vcol.combine_chunks() if isinstance(vcol, pa.ChunkedArray)
               else vcol).dictionary_encode()
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False),
                           np.int64)
        # previous same-value index per row: stable sort by code keeps
        # position order inside each code run
        by_code = np.argsort(codes, kind="stable")
        prev = np.full(n, -1, np.int64)
        if n > 1:
            same = codes[by_code][1:] == codes[by_code][:-1]
            prev[by_code[1:][same]] = by_code[:-1][same]
        lo = np.searchsorted(ts, ts - window_sec, side="left")
        hi = np.searchsorted(ts, ts, side="right")
        t_j = np.searchsorted(lo, prev, side="right")
        start = np.maximum(np.arange(n, dtype=np.int64), t_j)
        firsts = np.cumsum(np.bincount(start, minlength=n))
        # evaluate at each peer run's last row (hi-1), where frame end
        # == row index + 1; identical for the whole run by equal (ts)
        d = firsts[hi - 1] - lo
        return pa.table({
            order_col: g[order_col],
            key_col: g[key_col],
            "win_n": pa.array(hi - lo, pa.int64()),
            "win_distinct": pa.array(d, pa.int64()),
        })

    return events.groupby(key_col).map_groups(per_key, batch_format="pyarrow")


def event_transitions(events: rd.Dataset, *, key_col: str = "user_id",
                      ts_col: str = "ts", order_col: str = "event_id",
                      type_col: str = "event_type") -> rd.Dataset:
    """Corpus-level Markov TRANSITION counts over per-key ordered event
    streams: ``(from_type, to_type, n)`` for every adjacent pair in each
    key's (ts, order)-sorted history — the first-order behavioral model
    behind next-event prediction, anomaly scoring and funnel design.

    Scale shape: ONE key shuffle; each group emits at most
    ``|types|²`` partial rows (vectorized: dictionary codes, one
    ``np.unique`` over packed from·K+to keys), then a transition-matrix-
    scale groupby sums partials — nothing event-proportional re-shuffles.
    """
    from ray.data.aggregate import Sum

    def per_key(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[(ts_col, "ascending"),
                                                  (order_col, "ascending")])
        g = group.take(order)
        tcol = g[type_col]
        enc = (tcol.combine_chunks() if isinstance(tcol, pa.ChunkedArray)
               else tcol).dictionary_encode()
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False),
                           np.int64)
        vocab = enc.dictionary.to_pylist()
        k = max(len(vocab), 1)
        if len(codes) < 2:
            return pa.table({"from_type": pa.array([], pa.string()),
                             "to_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        packed = codes[:-1] * k + codes[1:]
        uniq, cnt = np.unique(packed, return_counts=True)
        return pa.table({
            "from_type": pa.array([vocab[int(u) // k] for u in uniq],
                                  pa.string()),
            "to_type": pa.array([vocab[int(u) % k] for u in uniq],
                                pa.string()),
            "n": pa.array(cnt.astype(np.int64), pa.int64())})

    return events.groupby(key_col) \
        .map_groups(per_key, batch_format="pyarrow") \
        .groupby(["from_type", "to_type"]) \
        .aggregate(Sum("n", alias_name="n"))


def rank_features(events: rd.Dataset, *, key_col: str = "user_id",
                  value_col: str = "value", order_col: str = "event_id",
                  ntiles: int = 4) -> rd.Dataset:
    """Per-key SQL rank-family window functions over ``value`` ascending:
    ``RANK`` / ``DENSE_RANK`` / ``PERCENT_RANK`` / ``CUME_DIST`` (peer-based,
    so ties get equal outputs and no tie-break is needed) and ``NTILE(n)``
    ordered by ``(value, order_col)`` (NTILE assigns by row position, so the
    tie-break makes it deterministic — mirrored in the SQL oracle).

    Float outputs are single IEEE divisions of exact integers —
    ``(rank-1)/(n-1)`` and ``peers_through/n`` — computed identically by
    DuckDB, so the driver's value hash matches bitwise.

    Scale shape: ONE shuffle, vectorized numpy per group (one sort, one
    run-length pass), one-key-fits-a-worker contract.
    """

    def per_key(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group,
                                sort_keys=[(value_col, "ascending"),
                                           (order_col, "ascending")])
        g = group.take(order)
        n = g.num_rows
        v = g[value_col].to_numpy(zero_copy_only=False)
        new_peer = np.empty(n, bool)
        if n:
            new_peer[0] = True
            new_peer[1:] = v[1:] != v[:-1]
        starts = np.flatnonzero(new_peer)                 # peer-group starts
        ends = np.concatenate([starts[1:], [n]])          # exclusive ends
        sizes = ends - starts
        gidx = np.cumsum(new_peer) - 1                    # peer group index
        rnk = starts[gidx] + 1                            # RANK
        drnk = gidx + 1                                   # DENSE_RANK
        pct = ((rnk - 1) / (n - 1)) if n > 1 else np.zeros(n)
        cume = ends[gidx] / n if n else np.zeros(0)
        # NTILE(t): first n%t tiles get n//t+1 rows, by row position
        pos = np.arange(n, dtype=np.int64)
        base, rem = divmod(n, ntiles) if n else (0, 0)
        cut = rem * (base + 1)
        if base:
            tile = np.where(pos < cut, pos // (base + 1),
                            rem + (pos - cut) // base) + 1
        else:  # fewer rows than tiles: one row per tile
            tile = pos + 1
        return pa.table({
            order_col: g[order_col],
            key_col: g[key_col],
            "rnk": pa.array(rnk, pa.int64()),
            "drnk": pa.array(drnk, pa.int64()),
            "pct_rank": pa.array(pct, pa.float64()),
            "cume": pa.array(cume, pa.float64()),
            "tile": pa.array(tile, pa.int64()),
        })

    return events.groupby(key_col).map_groups(per_key, batch_format="pyarrow")


def funnel_match(events: rd.Dataset, *,
                 steps: tuple[str, str, str] = ("view", "click", "purchase"),
                 within_sec: int = 3600, key_col: str = "user_id",
                 ts_col: str = "ts", order_col: str = "event_id",
                 type_col: str = "event_type") -> rd.Dataset:
    """Per-key ordered-funnel completion: does the key have events
    ``steps[0]`` then ``steps[1]`` then ``steps[2]`` in strictly increasing
    (ts, order) with the whole chain inside ``within_sec``?

    ANY completion counts (the standard product-analytics semantics), not
    just the earliest-greedy chain — computed in one vectorized prefix-MAX
    sweep per key: for every step-2 event, the LATEST step-1 timestamp
    strictly before it (the latest start can only widen the time budget);
    for every step-3 event, the max of that value over step-2 events
    strictly before it.  A step-3 row completes iff that value is within
    ``within_sec``.  Same dynamic program in the SQL oracle (two windowed
    ``MAX ... ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING``).  ONE
    shuffle; per-key history in one worker.

    Output per key: ``(key, n_step1, n_step2, n_step3, completed)``.
    """
    s1, s2, s3 = steps

    def per_key(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[(ts_col, "ascending"),
                                                  (order_col, "ascending")])
        g = group.take(order)
        ts = g[ts_col].cast(pa.int64()).to_numpy() // 1_000_000
        et = g[type_col].to_numpy(zero_copy_only=False)
        is1, is2, is3 = et == s1, et == s2, et == s3
        ninf = np.iinfo(np.int64).min
        # LATEST step-1 ts strictly before each row
        m1 = np.maximum.accumulate(np.where(is1, ts, ninf))
        m1_before = np.concatenate([[ninf], m1[:-1]]) if ts.size else m1
        # max over step-2 rows (of their m1_before) strictly before each row
        m2 = np.maximum.accumulate(np.where(is2, m1_before, ninf))
        m2_before = np.concatenate([[ninf], m2[:-1]]) if ts.size else m2
        ok = is3 & (m2_before > ninf) & (ts - m2_before <= within_sec)
        key = group[key_col][0].as_py()
        return pa.table({
            key_col: pa.array([key], pa.int64()),
            "n_step1": pa.array([int(is1.sum())], pa.int64()),
            "n_step2": pa.array([int(is2.sum())], pa.int64()),
            "n_step3": pa.array([int(is3.sum())], pa.int64()),
            "completed": pa.array([bool(ok.any())]),
        })

    return events.groupby(key_col).map_groups(per_key, batch_format="pyarrow")


def retention_matrix(events: rd.Dataset, *, key_col: str = "user_id",
                     ts_col: str = "ts", max_offset: int = 30,
                     day_sec: int = 86_400) -> rd.Dataset:
    """Cohort retention: ``(cohort_day, day_offset, n_users)`` — the
    product-analytics staple.  A user's cohort is their FIRST active day;
    ``n_users`` counts distinct users of that cohort active again exactly
    ``offset`` days later (offset 0 = cohort size).

    Scale shape: one ``groupby(key)`` (each user's history is tiny); per
    key the distinct active days come from one ``np.unique``, cohort =
    ``days[0]``, offsets = ``days - cohort`` (capped at ``max_offset``);
    then ONE metadata-scale groupby over (cohort, offset) pairs — at most
    ``max_offset + 1`` rows per user leave the first shuffle.
    """
    from ray.data.aggregate import Count

    def per_key(group: pa.Table) -> pa.Table:
        ts = group[ts_col].cast(pa.timestamp("us"), safe=False) \
            .cast(pa.int64()).to_numpy() // 1_000_000
        days = np.unique(ts // day_sec)
        cohort = days[0] if len(days) else 0
        off = days - cohort
        off = off[off <= max_offset]
        return pa.table({
            "cohort_day": pa.array(np.full(len(off), cohort, np.int64)),
            "day_offset": pa.array(off.astype(np.int64)),
        })

    return events.groupby(key_col) \
        .map_groups(per_key, batch_format="pyarrow") \
        .groupby(["cohort_day", "day_offset"]) \
        .aggregate(Count(alias_name="n_users"))


def collect_ordered(events: rd.Dataset, *, key_col: str = "user_id",
                    ts_col: str = "ts", order_col: str = "event_id",
                    value_col: str = "event_type", k: int = 20,
                    sep: str = ",") -> rd.Dataset:
    """Per-key ordered collect: the first ``k`` values by (ts, order) as
    one joined string — SQL's ``string_agg(v ORDER BY ...)`` over a
    LIMIT-k window; the sequence-mining/session-path primitive.

    One key shuffle; per group one sort + a python join of <= k strings
    (bounded by contract, not by data).
    """

    def per_key(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[(ts_col, "ascending"),
                                                  (order_col, "ascending")])
        g = group.take(order[:k])
        vals = g[value_col].to_pylist()
        key = group[key_col][0].as_py()
        return pa.table({
            key_col: pa.array([key], pa.int64()),
            "seq": pa.array([sep.join(map(str, vals))], pa.string()),
            "n_total": pa.array([group.num_rows], pa.int64()),
        })

    return events.groupby(key_col).map_groups(per_key,
                                              batch_format="pyarrow")


def analytic_per_key(events: rd.Dataset, key_col: str = "user_id",
                     ts_col: str = "ts", order_col: str = "event_id",
                     value_col: str = "value") -> rd.Dataset:
    """Per-key analytic (window) functions: row_number, lag/lead, gap to the
    previous event, and a cumulative sum.

    Scale shape: ONE shuffle (``groupby(key)``), then fully vectorized numpy
    per group.  Same partitioning assumption as :func:`sessionize`: one key's
    history must fit in a worker — true for per-user event logs at any corpus
    size, because the shuffle spreads *keys*, not time.

    Every value-derived column is integer cents (``floor(value*100)`` as
    int64): DuckDB's windowed ``SUM`` uses tree aggregation whose float
    association order differs from a sequential ``np.cumsum`` (observed
    ~1e-12 drift), and float columns expose the hash to formatting /
    signed-zero / null-payload encoding differences, so the SQL-parity
    contract is integers-only.  NULL handling mirrors SQL exactly:
    ``LAG``/``LEAD`` of a NULL value is NULL, the windowed ``SUM`` skips
    NULLs and is NULL until the key's first valid value, ``gap_sec`` is
    NULL when either timestamp is NULL.  Bytes under every null bit are
    zeroed so the physical buffers are canonical.
    """

    def per_key(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[(ts_col, "ascending"),
                                                  (order_col, "ascending")])
        g = group.take(order)
        n = g.num_rows
        vcol = g[value_col]
        valid = pc.is_valid(vcol).to_numpy(zero_copy_only=False)
        v = pc.fill_null(vcol, 0.0).to_numpy(zero_copy_only=False)
        tcol = g[ts_col].cast(pa.int64())
        ts_valid = pc.is_valid(tcol).to_numpy(zero_copy_only=False)
        ts = pc.fill_null(tcol, 0).to_numpy(zero_copy_only=False) // 1_000_000
        cents = np.floor(v * 100.0).astype(np.int64)
        cents[~valid] = 0  # NULL value: no contribution to the running sum
        zero1 = np.zeros(1, np.int64)
        one_true = np.ones(1, bool)
        prev = np.concatenate([zero1, cents[:-1]]) if n else cents
        nxt = np.concatenate([cents[1:], zero1]) if n else cents
        # LAG/LEAD of a NULL value is NULL, as is the missing boundary cell
        prev_mask = np.concatenate([one_true, ~valid[:-1]]) if n \
            else np.zeros(0, bool)
        next_mask = np.concatenate([~valid[1:], one_true]) if n \
            else np.zeros(0, bool)
        gap = np.concatenate([zero1, np.diff(ts)]) if n else ts
        prev_ts_valid = np.concatenate([[False], ts_valid[:-1]]) if n \
            else ts_valid
        gap_mask = ~(ts_valid & prev_ts_valid)
        # SQL windowed SUM over an all-NULL prefix is NULL, not 0
        cum_mask = np.cumsum(valid.astype(np.int64)) == 0
        cum = np.cumsum(cents)
        # zero the bytes under every null bit: canonical physical buffers
        prev[prev_mask] = 0
        nxt[next_mask] = 0
        gap[gap_mask] = 0
        cum[cum_mask] = 0
        return pa.table({
            order_col: g[order_col],
            key_col: g[key_col],
            "rn": pa.array(np.arange(1, n + 1, dtype=np.int64)),
            "prev_cents": pa.array(prev, pa.int64(), mask=prev_mask),
            "next_cents": pa.array(nxt, pa.int64(), mask=next_mask),
            "gap_sec": pa.array(gap, pa.int64(), mask=gap_mask),
            "cum_cents": pa.array(cum, pa.int64(), mask=cum_mask),
        })

    return events.groupby(key_col).map_groups(per_key, batch_format="pyarrow")


def first_last_values(events: rd.Dataset, *, key_col: str = "user_id",
                      ts_col: str = "ts", order_col: str = "event_id",
                      value_col: str = "value", nth: int = 2) -> rd.Dataset:
    """Per-key SQL ``FIRST_VALUE`` / ``LAST_VALUE`` / ``NTH_VALUE(n)``
    window functions over the WHOLE partition (``ROWS BETWEEN UNBOUNDED
    PRECEDING AND UNBOUNDED FOLLOWING``), ordered by (ts, order).

    Outputs are integer cents (``floor(value*100)`` int64) with SQL NULL
    semantics: FIRST/LAST/NTH copy the frame row's value VERBATIM — if
    that row's value is NULL the output is NULL (no IGNORE NULLS) — and
    ``NTH_VALUE(n)`` is NULL when the partition has fewer than ``n``
    rows.  Bytes under null bits are zeroed (canonical buffers).

    Scale shape: ONE shuffle (``groupby(key)``), vectorized numpy per
    group — same one-key-fits-a-worker contract as the rest of this
    module.
    """

    def per_key(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[(ts_col, "ascending"),
                                                  (order_col, "ascending")])
        g = group.take(order)
        n = g.num_rows
        vcol = g[value_col]
        valid = pc.is_valid(vcol).to_numpy(zero_copy_only=False)
        v = pc.fill_null(vcol, 0.0).to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100.0).astype(np.int64)
        cents[~valid] = 0
        first_c = np.full(n, cents[0] if n else 0, np.int64)
        first_m = np.full(n, not (n and valid[0]), bool)
        last_c = np.full(n, cents[-1] if n else 0, np.int64)
        last_m = np.full(n, not (n and valid[-1]), bool)
        if n >= nth:
            nth_c = np.full(n, cents[nth - 1], np.int64)
            nth_m = np.full(n, not valid[nth - 1], bool)
        else:
            nth_c = np.zeros(n, np.int64)
            nth_m = np.ones(n, bool)
        first_c[first_m] = 0
        last_c[last_m] = 0
        nth_c[nth_m] = 0
        return pa.table({
            order_col: g[order_col],
            key_col: g[key_col],
            "rn": pa.array(np.arange(1, n + 1, dtype=np.int64)),
            "first_cents": pa.array(first_c, pa.int64(), mask=first_m),
            "last_cents": pa.array(last_c, pa.int64(), mask=last_m),
            "nth_cents": pa.array(nth_c, pa.int64(), mask=nth_m),
        })

    return events.groupby(key_col).map_groups(per_key, batch_format="pyarrow")
