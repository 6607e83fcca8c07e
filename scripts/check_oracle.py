"""Local mimic of the driver's DuckDB oracle cross-check.

Runs every ``queries()`` entry against ``oracle_sql()`` on a given sf dir:
row count, sorted-column schema, and order-insensitive value comparison.
Usage: python scripts/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd


def fetch(obj):
    """Return ``(pandas_df, arrow_table_or_None)``.

    The Arrow side preserves validity bitmaps, so per-column null counts can
    be compared against the oracle's Arrow result — pandas folds NULL into
    NaN and would hide exactly the null-vs-NaN encoding bugs the driver's
    value hash catches (round-2 ``events_analytic``).
    """
    import pyarrow as pa

    try:
        import ray
        import ray.data as rd

        if isinstance(obj, rd.Dataset):
            tbls = [t for t in ray.get(obj.to_arrow_refs())
                    if t.num_rows and t.num_columns]
            tbl = pa.concat_tables(tbls, promote_options="permissive") if tbls else None
            return (tbl.to_pandas() if tbl is not None else obj.to_pandas()), tbl
    except ImportError:
        pass
    if isinstance(obj, pa.Table):
        return obj.to_pandas(), obj
    # pandas input: NaN->null on conversion, same as the driver's ingest
    return obj, pa.Table.from_pandas(obj, preserve_index=False)


def null_counts(tbl) -> dict[str, int]:
    return {name: tbl.column(name).null_count for name in sorted(tbl.column_names)}


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    return df


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    problems = []
    if list(got.columns) != list(exp.columns):
        problems.append(f"columns differ: {list(got.columns)} vs {list(exp.columns)}")
        return problems
    if len(got) != len(exp):
        problems.append(f"row count {len(got)} vs {len(exp)}")
        return problems
    for col in got.columns:
        a, b = got[col].to_numpy(), exp[col].to_numpy()
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            af = a.astype(np.float64)
            bf = b.astype(np.float64)
            bad = ~(np.isclose(af, bf, rtol=0, atol=0) | (np.isnan(af) & np.isnan(bf)))
            if bad.any():
                i = int(np.flatnonzero(bad)[0])
                problems.append(f"col {col}: {bad.sum()} mismatches, first at {i}: {af[i]!r} vs {bf[i]!r}")
        else:
            bad = a != b
            if getattr(bad, "any", lambda: bad)():
                i = int(np.flatnonzero(bad)[0])
                problems.append(f"col {col}: {bad.sum()} mismatches, first at {i}: {a[i]!r} vs {b[i]!r}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR", log_to_driver=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time

        t0 = time.monotonic()
        try:
            got_df, got_tbl = fetch(fn(sf_dir))
            got = canon(got_df)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        ray_t = time.monotonic() - t0
        if name not in oracles:
            print(f"okNR {name}: rows={len(got)} (rows-only, no oracle) [{ray_t:.1f}s]")
            continue
        t0 = time.monotonic()
        try:
            exp_tbl = con.execute(oracles[name]).arrow()
            exp = canon(exp_tbl.to_pandas())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            failures += 1
            continue
        sql_t = time.monotonic() - t0
        problems = compare(name, got, exp)
        if not problems and got_tbl is not None:
            nc_got, nc_exp = null_counts(got_tbl), null_counts(exp_tbl)
            if nc_got != nc_exp:
                diffs = {c: (nc_got.get(c), nc_exp.get(c))
                         for c in set(nc_got) | set(nc_exp)
                         if nc_got.get(c) != nc_exp.get(c)}
                problems = [f"null-count mismatch (ray vs oracle): {diffs}"]
        if problems:
            print(f"FAIL {name}: rows={len(got)}/{len(exp)} " + "; ".join(problems))
            failures += 1
        else:
            print(f"OK   {name}: rows={len(got)} [ray {ray_t:.1f}s, sql {sql_t:.1f}s]")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
