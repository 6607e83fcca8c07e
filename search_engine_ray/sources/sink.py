"""Resumable hive-partitioned parquet sink.

The resumable-output contract (SURVEY §2.11 / the 100-TB brief): output
partitioned so a failed run can SKIP finished work, never half-written
files.  Granularity is the INPUT SHARD — the unit Ray retries and the
unit a restarted job can check cheaply:

* one writer task per input file (an actor-free ``map_batches`` over the
  file list, ``batch_size=1`` — each task owns its shard end to end);
* the task splits the shard by the partition key and writes
  ``<root>/<key>=<v>/shard-<md5(path)>.parquet`` via tmp + atomic
  ``os.rename`` — DETERMINISTIC names, so a re-run of a half-finished
  shard overwrites its own files idempotently instead of duplicating;
* a ``<root>/_done/<md5(path)>.done`` marker commits the shard only
  after every one of its partition files is renamed; a crash between
  renames leaves no marker and the whole shard re-runs;
* resume = skip marked shards before any bytes are read (the ack row
  says ``skipped=True``; nothing row-proportional moves).

``read_parquet(root)`` restores the partition column from the directory
key (hive layout).  The ``_done`` bookkeeping directory is invisible to
readers that glob ``<key>=*`` dirs; `ray.data.read_parquet` on the root
must exclude it (pass ``<root>/<key>=*`` or filter), same as Spark's
``_SUCCESS`` convention.
"""

from __future__ import annotations

import hashlib
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

__all__ = ["write_partitioned", "partition_dirs"]


def _shard_tag(path: str) -> str:
    return hashlib.md5(path.encode()).hexdigest()[:16]


def partition_dirs(root: str) -> list[str]:
    """The data directories of a partitioned root (excludes ``_done``)."""
    return sorted(os.path.join(root, d) for d in os.listdir(root)
                  if "=" in d)


def write_partitioned(paths: list[str], root: str, *,
                      partition_col: str, columns: list[str] | None = None,
                      resume: bool = True) -> pa.Table:
    """Write the given parquet shards into ``root`` hive-partitioned by
    ``partition_col``; returns the ack table (one row per input shard:
    ``path, n_rows, n_parts, skipped``).  See the module docstring for
    the resume/atomicity contract."""
    done_dir = os.path.join(root, "_done")
    os.makedirs(done_dir, exist_ok=True)

    def write_shard(b: pa.Table) -> pa.Table:
        out_path, out_rows, out_parts, out_skip = [], [], [], []
        for path in b["path"].to_pylist():
            tag = _shard_tag(path)
            marker = os.path.join(done_dir, f"{tag}.done")
            if resume and os.path.exists(marker):
                out_path.append(path)
                out_rows.append(0)
                out_parts.append(0)
                out_skip.append(True)
                continue
            t = pq.read_table(path, columns=columns)
            keys = np.asarray(t[partition_col].to_pylist(), object)
            order = np.argsort(keys, kind="stable")
            tt = t.take(pa.array(order, pa.int64()))
            ks = keys[order]
            bounds = np.flatnonzero(ks[1:] != ks[:-1]) + 1
            starts = np.concatenate(([0], bounds)) if ks.size else \
                np.zeros(0, np.int64)
            ends = np.concatenate((bounds, [ks.size])) if ks.size else \
                np.zeros(0, np.int64)
            n_parts = 0
            for s, e in zip(starts, ends):
                key = str(ks[s])
                d = os.path.join(root, f"{partition_col}={key}")
                os.makedirs(d, exist_ok=True)
                tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
                pq.write_table(
                    tt.slice(s, e - s).drop_columns([partition_col]), tmp)
                # deterministic final name: idempotent across re-runs
                os.rename(tmp, os.path.join(d, f"shard-{tag}.parquet"))
                n_parts += 1
            with open(marker + ".tmp", "w") as f:
                f.write(path + "\n")
            os.rename(marker + ".tmp", marker)   # commit point
            out_path.append(path)
            out_rows.append(t.num_rows)
            out_parts.append(n_parts)
            out_skip.append(False)
        return pa.table({
            "path": pa.array(out_path, pa.string()),
            "n_rows": pa.array(out_rows, pa.int64()),
            "n_parts": pa.array(out_parts, pa.int64()),
            "skipped": pa.array(out_skip, pa.bool_()),
        })

    files = rd.from_items([{"path": p} for p in sorted(paths)])
    acks = files.map_batches(write_shard, batch_format="pyarrow",
                             batch_size=1)
    tbls = [t for t in acks.to_arrow_refs()]
    import ray as _ray
    parts = [x for x in _ray.get(tbls) if x.num_rows]
    return pa.concat_tables(parts) if parts else pa.table({
        "path": pa.array([], pa.string()),
        "n_rows": pa.array([], pa.int64()),
        "n_parts": pa.array([], pa.int64()),
        "skipped": pa.array([], pa.bool_())})
