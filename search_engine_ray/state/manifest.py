"""Per-partition checkpoint manifests — the engine's control plane.

Replaces the reference's mutable ``sites`` status rows
(``model/Site.java:14-44``, heartbeats at ``PageAnalyzer.java:498-539``) with
immutable per-partition manifest JSON (north rule: "resumable from checkpoint
with per-partition lineage + metrics").

Commit protocol (idempotent under Ray task retries, SURVEY.md §4.1):
a segment is built entirely inside ``<index>/.tmp-part=NNNNN-<nonce>/``,
its manifest written last, then the directory is atomically ``os.rename``d to
``<index>/part=NNNNN``.  A concurrently retried task that finds the final
directory already present discards its own tmp dir — double-writes are
impossible, partial directories are invisible.

Resume: :func:`done_parts` lists committed partitions; the build filters them
out of the input *before* the expensive stages.  The manifest records the
partition's input fingerprint (order-independent XOR of row hashes), row
counts, byte sizes, config hash and wall time — the lineage/metrics record.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import asdict, dataclass, field

MANIFEST_NAME = "_MANIFEST.json"


@dataclass
class PartManifest:
    part: int
    status: str  # "done" | "failed"
    input_fingerprint: str
    config_hash: str
    input_rows: int
    n_docs: int
    n_terms: int
    n_postings: int
    total_tokens: int
    bytes_postings: int
    bytes_docs: int
    wall_sec: float
    engine_version: str
    last_error: str = ""
    extra: dict = field(default_factory=dict)


def part_dirname(part: int) -> str:
    return f"part={part:05d}"


def write_manifest(dir_path: str, m: PartManifest) -> None:
    tmp = os.path.join(dir_path, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(asdict(m), f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, os.path.join(dir_path, MANIFEST_NAME))


def read_manifest(part_dir: str) -> PartManifest | None:
    path = os.path.join(part_dir, MANIFEST_NAME)
    try:
        with open(path) as f:
            return PartManifest(**json.load(f))
    except (OSError, ValueError, TypeError):
        return None


def commit_part_dir(tmp_dir: str, final_dir: str) -> bool:
    """Atomically publish a built partition. Returns False if another task
    already committed it (tmp work is discarded)."""
    try:
        os.rename(tmp_dir, final_dir)
        return True
    except OSError:
        if os.path.isdir(final_dir):
            shutil.rmtree(tmp_dir, ignore_errors=True)
            return False
        raise


def done_parts(index_dir: str) -> dict[int, PartManifest]:
    """Committed partitions with a valid 'done' manifest."""
    out: dict[int, PartManifest] = {}
    if not os.path.isdir(index_dir):
        return out
    for name in os.listdir(index_dir):
        if not name.startswith("part="):
            continue
        m = read_manifest(os.path.join(index_dir, name))
        if m is not None and m.status == "done":
            out[m.part] = m
    return out


# --- failure markers (reference FAILED status + last_error) -----------------
# The reference marks a whole site FAILED with an error string
# (``dto/indexing/PageAnalyzer.java:541-548``, ``model/Site.java`` status /
# last_error).  Batch equivalent: a segment-build exception writes a
# per-partition failed marker OUTSIDE the atomic part-dir protocol (markers
# never block a later successful commit), the exception still propagates so
# Ray retries / the job fails loudly, and a subsequent successful commit
# clears the marker.  ``done_parts`` ignores markers, so resume rebuilds
# exactly the failed partitions.

FAILED_DIR = "_failed"


def write_failed_marker(index_dir: str, part: int, error: str,
                        config_hash: str = "") -> None:
    d = os.path.join(index_dir, FAILED_DIR)
    os.makedirs(d, exist_ok=True)
    import time

    payload = {"part": part, "status": "failed", "last_error": error[:4000],
               "config_hash": config_hash, "status_time": time.time()}
    tmp = os.path.join(d, f"part={part:05d}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, os.path.join(d, f"part={part:05d}.json"))


def clear_failed_marker(index_dir: str, part: int) -> None:
    try:
        os.remove(os.path.join(index_dir, FAILED_DIR, f"part={part:05d}.json"))
    except OSError:
        pass


def failed_parts(index_dir: str) -> dict[int, dict]:
    """part -> failure record (last_error, config_hash, status_time)."""
    d = os.path.join(index_dir, FAILED_DIR)
    out: dict[int, dict] = {}
    if not os.path.isdir(d):
        return out
    for name in os.listdir(d):
        if not (name.startswith("part=") and name.endswith(".json")):
            continue
        try:
            with open(os.path.join(d, name)) as f:
                rec = json.load(f)
            out[int(rec["part"])] = rec
        except (OSError, ValueError, KeyError):
            continue
    return out
