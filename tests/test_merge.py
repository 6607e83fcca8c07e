"""Index merge/compaction (pipelines/merge): byte-identity vs full build,
reindex-delta (last source wins) semantics."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from search_engine_ray.config import IndexBuildConfig
from search_engine_ray.pipelines.build import build_index
from search_engine_ray.pipelines.merge import merge_indexes


def _pages(rows):
    return rd.from_arrow(pa.table({
        "url": pa.array([r[0] for r in rows]),
        "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "html": pa.array(
            [f"<html><title>t</title><body>{r[2]}</body></html>".encode()
             for r in rows], pa.binary()),
    }))


def _corpus(i0, n):
    words = ["apple", "banana", "cherry", "date", "elder", "fig"]
    return [(f"http://s{i % 3}.example/p{i}", 1_000_000 * i,
             " ".join(words[(i + j) % len(words)]
                      for j in range(3 + i % 4)))
            for i in range(i0, i0 + n)]


def _seg_bytes(index_dir):
    out = {}
    for d in sorted(os.listdir(index_dir)):
        if not d.startswith("part="):
            continue
        for f in ["docs.parquet", "postings.parquet", "dict.parquet"]:
            out[f"{d}/{f}"] = open(os.path.join(index_dir, d, f),
                                   "rb").read()
    return out


def test_merge_equals_full_build(ray_session, tmp_path):
    cfg = IndexBuildConfig(morphology="simple", num_partitions=3)
    a, b = _corpus(0, 40), _corpus(40, 40)
    build_index(_pages(a), str(tmp_path / "ia"), cfg, resume=False)
    build_index(_pages(b), str(tmp_path / "ib"), cfg, resume=False)
    build_index(_pages(a + b), str(tmp_path / "full"), cfg, resume=False)
    res = merge_indexes([str(tmp_path / "ia"), str(tmp_path / "ib")],
                        str(tmp_path / "merged"))
    assert res["n_docs"] == 80
    got = _seg_bytes(str(tmp_path / "merged"))
    want = _seg_bytes(str(tmp_path / "full"))
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == want[k], f"{k} differs"
    # global dict equal too (values, not bytes — different aggregate paths)
    gd = pq.read_table(str(tmp_path / "merged/global_dict/dict.parquet")) \
        .to_pandas().sort_values("term").reset_index(drop=True)
    fd = pq.read_table(str(tmp_path / "full/global_dict/dict.parquet")) \
        .to_pandas().sort_values("term").reset_index(drop=True)
    assert gd.equals(fd)


def test_merge_last_source_wins(ray_session, tmp_path):
    cfg = IndexBuildConfig(morphology="simple", num_partitions=2)
    old = [("http://x.example/a", 1_000_000, "apple banana"),
           ("http://x.example/b", 2_000_000, "cherry date")]
    new = [("http://x.example/a", 9_000_000, "fig fig fig")]
    build_index(_pages(old), str(tmp_path / "old"), cfg, resume=False)
    build_index(_pages(new), str(tmp_path / "delta"), cfg, resume=False)
    res = merge_indexes([str(tmp_path / "old"), str(tmp_path / "delta")],
                        str(tmp_path / "out"))
    assert res["n_docs"] == 2  # /a deduped, delta version kept
    # the merged index must equal a fresh build over (b-old, a-new)
    build_index(_pages([old[1], new[0]]), str(tmp_path / "want"), cfg,
                resume=False)
    assert _seg_bytes(str(tmp_path / "out")) == \
        _seg_bytes(str(tmp_path / "want"))


def test_merge_resume_skips_committed_parts(ray_session, tmp_path):
    import json
    import os

    cfg = IndexBuildConfig(morphology="simple", num_partitions=3)
    a, b = _corpus(0, 30), _corpus(30, 30)
    build_index(_pages(a), str(tmp_path / "ia"), cfg, resume=False)
    build_index(_pages(b), str(tmp_path / "ib"), cfg, resume=False)
    out = str(tmp_path / "m")
    r1 = merge_indexes([str(tmp_path / "ia"), str(tmp_path / "ib")], out)
    assert r1["parts"] == 3 and r1["skipped"] == 0
    before = _seg_bytes(out)
    # simulate a killed merge: drop one part's manifest
    os.remove(os.path.join(out, "part=00001", "_MANIFEST.json"))
    r2 = merge_indexes([str(tmp_path / "ia"), str(tmp_path / "ib")], out)
    assert r2["parts"] == 1 and r2["skipped"] == 2
    assert r2["n_docs"] == r1["n_docs"] == 60
    assert _seg_bytes(out) == before
    # fully committed: third run rebuilds nothing
    r3 = merge_indexes([str(tmp_path / "ia"), str(tmp_path / "ib")], out)
    assert r3["parts"] == 0 and r3["skipped"] == 3
    # a stale manifest (different lineage) does get rebuilt
    mpath = os.path.join(out, "part=00002", "_MANIFEST.json")
    m = json.load(open(mpath))
    m["input_fingerprint"] = "merge:stale"
    json.dump(m, open(mpath, "w"))
    r4 = merge_indexes([str(tmp_path / "ia"), str(tmp_path / "ib")], out)
    assert r4["parts"] == 1 and r4["skipped"] == 2
    assert _seg_bytes(out) == before


def test_merge_rejects_mixed_configs(ray_session, tmp_path):
    import pytest

    c1 = IndexBuildConfig(morphology="simple", num_partitions=2)
    c2 = IndexBuildConfig(morphology="simple", num_partitions=2,
                          block_size=64)
    build_index(_pages(_corpus(0, 6)), str(tmp_path / "x"), c1, resume=False)
    build_index(_pages(_corpus(6, 6)), str(tmp_path / "y"), c2, resume=False)
    with pytest.raises(ValueError, match="different configs"):
        merge_indexes([str(tmp_path / "x"), str(tmp_path / "y")],
                      str(tmp_path / "z"))


def test_merge_positional_byte_identity(ray_session, tmp_path):
    """Positional indexes (store_positions=True) must merge losslessly:
    merged segment files byte-identical to a fresh positional build, and
    phrase search over the merged index returns the fresh build's rows
    (regression: merge used to drop the positions columns silently)."""
    from search_engine_ray.pipelines.phrase import phrase_search
    from search_engine_ray.state.manifest import done_parts

    cfg = IndexBuildConfig(morphology="simple", num_partitions=3,
                           store_positions=True)
    a, b = _corpus(0, 40), _corpus(40, 40)
    build_index(_pages(a), str(tmp_path / "ia"), cfg, resume=False)
    build_index(_pages(b), str(tmp_path / "ib"), cfg, resume=False)
    build_index(_pages(a + b), str(tmp_path / "full"), cfg, resume=False)
    merge_indexes([str(tmp_path / "ia"), str(tmp_path / "ib")],
                  str(tmp_path / "merged"))
    got = _seg_bytes(str(tmp_path / "merged"))
    want = _seg_bytes(str(tmp_path / "full"))
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == want[k], f"{k} differs"
    # positions survived: a phrase hit exists and matches the fresh build
    ph = ["banana", "cherry"]
    rows_m = phrase_search(str(tmp_path / "merged"), ph).to_pandas()
    rows_f = phrase_search(str(tmp_path / "full"), ph).to_pandas()
    assert len(rows_f) > 0
    cols = sorted(rows_f.columns)
    assert rows_m[cols].sort_values(cols).reset_index(drop=True).equals(
        rows_f[cols].sort_values(cols).reset_index(drop=True))
    # manifests persist the numeric writer settings
    for m in done_parts(str(tmp_path / "merged")).values():
        assert m.extra.get("block_size") == cfg.block_size
        assert m.extra.get("store_positions") is True


def test_merge_uses_manifest_block_size(ray_session, tmp_path):
    """A non-default block_size where no term spans >1 block used to be
    re-encoded at the engine default; the manifest-persisted setting keeps
    byte-identity."""
    cfg = IndexBuildConfig(morphology="simple", num_partitions=2,
                           block_size=256)
    a, b = _corpus(0, 20), _corpus(20, 20)
    build_index(_pages(a), str(tmp_path / "ia"), cfg, resume=False)
    build_index(_pages(b), str(tmp_path / "ib"), cfg, resume=False)
    build_index(_pages(a + b), str(tmp_path / "full"), cfg, resume=False)
    merge_indexes([str(tmp_path / "ia"), str(tmp_path / "ib")],
                  str(tmp_path / "merged"))
    assert _seg_bytes(str(tmp_path / "merged")) == \
        _seg_bytes(str(tmp_path / "full"))
