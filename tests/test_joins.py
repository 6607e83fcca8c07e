"""As-of join semantics (pipelines/joins.py)."""

import datetime as dt

import pyarrow as pa
import ray.data as rd

from search_engine_ray.pipelines.joins import asof_join


def _ts(sec):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


def test_asof_join_semantics(ray_session):
    left = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "user_id": pa.array([7, 7, 7, 8, 9], pa.int64()),
        "ts": pa.array([_ts(5), _ts(10), _ts(99), _ts(10), _ts(1)],
                       pa.timestamp("us")),
    })
    right = pa.table({
        "user_id": pa.array([7, 7, 8], pa.int64()),
        "rts": pa.array([_ts(10), _ts(50), _ts(20)], pa.timestamp("us")),
        "rvalue": pa.array([1.5, 2.5, 9.0], pa.float64()),
    })
    out = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                    key_col="user_id", left_ts_col="ts", right_ts_col="rts",
                    right_value_cols=["rvalue"],
                    left_keep_cols=["event_id", "user_id"]) \
        .to_pandas().set_index("event_id").sort_index()
    # event 1 (ts=5): before any dim row -> dropped
    # event 2 (ts=10): exact-ts match included -> rvalue 1.5
    # event 3 (ts=99): latest dim row at 50 -> 2.5
    # event 4 (user 8, ts=10): dim row at 20 is in the future -> dropped
    # event 5 (user 9): no dim rows at all -> dropped
    assert list(out.index) == [2, 3]
    assert out.loc[2, "right_rvalue"] == 1.5
    assert out.loc[3, "right_rvalue"] == 2.5
    base = int(_ts(10).timestamp() * 1_000_000)
    assert out.loc[2, "right_ts_us"] == base


def test_analytic_per_key(ray_session):
    from search_engine_ray.pipelines.windows import analytic_per_key

    events = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "user_id": pa.array([7, 7, 7, 8, 8], pa.int64()),
        "ts": pa.array([_ts(0), _ts(30), _ts(10), _ts(5), _ts(5)],
                       pa.timestamp("us")),
        "value": pa.array([1.0, 2.5, 0.5, 9.99, 3.0], pa.float64()),
    })
    out = analytic_per_key(rd.from_arrow(events)).to_pandas() \
        .sort_values(["user_id", "rn"]).reset_index(drop=True)
    # user 7 in ts order: events 1 (v=1.0), 3 (v=0.5), 2 (v=2.5)
    u7 = out[out.user_id == 7]
    assert list(u7.event_id) == [1, 3, 2]
    assert list(u7.rn) == [1, 2, 3]
    assert u7.prev_cents.tolist()[1:] == [100, 50]
    assert u7.prev_cents.isna().tolist() == [True, False, False]
    assert u7.next_cents.tolist()[:2] == [50, 250]
    assert u7.next_cents.isna().tolist() == [False, False, True]
    assert u7.gap_sec.tolist()[1:] == [10, 20]
    assert u7.gap_sec.isna().tolist() == [True, False, False]
    assert list(u7.cum_cents) == [100, 150, 400]
    # user 8: same ts -> order by event_id; floor(9.99*100) == 999 in
    # float64 (9.99*100 = 999.0000000000001) — identical in DuckDB, which
    # is exactly the double-for-double parity the operator promises.
    u8 = out[out.user_id == 8]
    assert list(u8.event_id) == [4, 5]
    assert list(u8.cum_cents) == [999, 1299]
