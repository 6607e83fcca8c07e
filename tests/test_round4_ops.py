"""Round-4 operator tests: generic fingerprint hamming pairs (shared by
SimHash text dedup and dHash image dedup), HLL profile NDV (see
test_round3_ops for the accuracy test), and scatter-path phrase search."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def test_sig_hamming_pairs_exact(ray_session):
    """Known 64-bit signatures -> exact pair set: pigeonhole recall is
    EXACT for hamming <= 15 with four 16-bit bands, so every qualifying
    pair must appear, with its true distance, exactly once."""
    from search_engine_ray.stages.dedup import sig_hamming_pairs

    base = 0x0123456789ABCDEF
    sigs = {
        1: base,
        2: base ^ 0x1,                  # hamming 1 from base
        3: base ^ 0x3,                  # hamming 2 from base, 1 from #2
        4: base ^ (1 << 63),            # hamming 1, in the top band
        5: 0xFEDCBA9876543210,          # far from everything
    }
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(sigs), pa.int64()),
        "sig": pa.array([np.uint64(v) for v in sigs.values()], pa.uint64()),
    }))
    out = sig_hamming_pairs(ds, sig_col="sig", max_hamming=2) \
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    got = {(int(r.doc_a), int(r.doc_b)): int(r.hamming)
           for r in out.itertuples()}
    # exact expected set, distances verified by hand:
    #   1-2: 1 bit; 1-3: 2 bits; 2-3: 1 bit; 1-4: 1 bit; 2-4: 2 bits;
    #   3-4: 3 bits (> max) -> absent; 5 pairs with nothing
    assert got == {(1, 2): 1, (1, 3): 2, (2, 3): 1, (1, 4): 1, (2, 4): 2}


def test_sig_hamming_pairs_bucket_cap(ray_session):
    """Over-full band buckets are dropped (bounded quadratic verify):
    constant signatures exceed max_bucket and yield no pairs, while a
    small distinct group still pairs."""
    from search_engine_ray.stages.dedup import sig_hamming_pairs

    n = 30
    ids = np.arange(n, dtype=np.int64)
    sigs = np.full(n, 0xAAAAAAAAAAAAAAAA, np.uint64)
    # two extra docs whose shared-band buckets stay small
    ids = np.concatenate([ids, [100, 101]])
    sigs = np.concatenate(
        [sigs, np.array([0x5555000012340000, 0x5555000012340001], np.uint64)])
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                 "sig": pa.array(sigs, pa.uint64())}))
    out = sig_hamming_pairs(ds, sig_col="sig", max_hamming=2,
                            max_bucket=10).to_pandas()
    got = {(int(r.doc_a), int(r.doc_b)): int(r.hamming)
           for r in out.itertuples()}
    assert got == {(100, 101): 1}


def test_scatter_phrase_matches_phrase_search(ray_session, tmp_path):
    """Phrase through the PartRangeSearcher pool must equal the
    per-partition phrase_search path row-for-row (disjoint ranges ->
    concat gather), on a 3-partition positional index split across
    2 actors."""
    from search_engine_ray.config import IndexBuildConfig
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.pipelines.phrase import phrase_search
    from search_engine_ray.pipelines.scatter import ScatterIndex

    rng = np.random.RandomState(11)
    words = ["apple", "banana", "cherry", "date", "elder"]
    rows = []
    for i in range(40):
        toks = [words[t] for t in rng.randint(0, len(words), 10)]
        if i % 3 == 0:
            toks[2:2] = ["apple", "banana"]
        rows.append((f"http://s{i % 2}.example/p{i}", 1_000_000 * (i + 1),
                     " ".join(toks)))
    pages = rd.from_arrow(pa.table({
        "url": pa.array([r[0] for r in rows]),
        "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "html": pa.array(
            [f"<html><title>t</title><body>{r[2]}</body></html>".encode()
             for r in rows], pa.binary()),
    }))
    idx = str(tmp_path / "idx")
    build_index(pages, idx,
                IndexBuildConfig(morphology="simple", num_partitions=3,
                                 store_positions=True, block_size=4),
                resume=False)

    direct = phrase_search(idx, ["apple", "banana"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    with ScatterIndex(idx, num_searchers=2, preload=False) as sc:
        pooled = sc.phrase(["apple", "banana"]).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(direct, pooled)
    assert len(direct) >= 13  # every i%3==0 doc matches


def test_vectorized_postings_encode_matches_per_term_reference(tmp_path):
    """The whole-part vectorized postings encode (round 4) must be
    byte-identical, cell for cell, to the per-term encode_postings
    reference on the SAME input — blobs, block metadata, positions.
    Exercises small block_size (many blocks per term), single-posting
    terms, and the positions path.  ``_build_segment_inner`` is a plain
    function: no Ray needed."""
    import pyarrow.parquet as pq

    from search_engine_ray.config import IndexBuildConfig
    from search_engine_ray.functions.codec import (encode_postings,
                                                   varint_encode)
    from search_engine_ray.stages.segments import (DOC_ID_PART_SHIFT,
                                                   _build_segment_inner)

    rng = np.random.RandomState(21)
    words = [f"w{i:02d}" for i in range(17)]
    n_docs = 40
    urls = [f"http://s{i % 3}.example/p{i:03d}" for i in range(n_docs)]
    terms_l, tfs_l, poss_l, dls = [], [], [], []
    for i in range(n_docs):
        k = rng.randint(1, 9)
        t = sorted(rng.choice(len(words), k, replace=False).tolist())
        tf = rng.randint(1, 4, k).tolist()
        terms_l.append([words[j] for j in t])
        tfs_l.append(tf)
        # positions: tf[j] ascending ints, delta+varint packed (first abs)
        blobs = []
        for f in tf:
            pos = np.sort(rng.choice(50, f, replace=False)).astype(np.int64)
            gaps = np.diff(np.concatenate(([0], pos)))
            gaps[0] = pos[0]
            blobs.append(varint_encode(gaps))
        poss_l.append(blobs)
        dls.append(int(sum(tf)))
    part = 3
    group = pa.table({
        "url": pa.array(urls),
        "warc_ts": pa.array([1_000_000 * (i + 1) for i in range(n_docs)],
                            pa.timestamp("us")),
        "title": pa.array([f"t{i}" for i in range(n_docs)]),
        "site": pa.array([f"http://s{i % 3}.example" for i in range(n_docs)]),
        "path": pa.array([f"/p{i:03d}" for i in range(n_docs)]),
        "doc_len": pa.array(dls, pa.int32()),
        "part": pa.array([part] * n_docs, pa.int32()),
        "terms": pa.array(terms_l, pa.list_(pa.string())),
        "tfs": pa.array(tfs_l, pa.list_(pa.int32())),
        "poss": pa.array(poss_l, pa.list_(pa.binary())),
    })
    cfg = IndexBuildConfig(morphology="simple", num_partitions=4,
                           block_size=2, store_positions=True,
                           store_doc_text=False)
    idx = str(tmp_path / "idx")
    _build_segment_inner(group, part, idx, cfg, "deadbeef")
    got = pq.read_table(f"{idx}/part={part:05d}/postings.parquet") \
        .sort_by("term").to_pylist()

    # independent per-term reference (urls unique => doc order = url rank)
    order = np.argsort(np.array(urls))
    rank_of = np.empty(n_docs, np.int64)
    rank_of[order] = np.arange(n_docs)
    base = np.int64(part) << DOC_ID_PART_SHIFT
    ref: dict[str, list] = {}
    for i in range(n_docs):
        for t, f, b in zip(terms_l[i], tfs_l[i], poss_l[i]):
            ref.setdefault(t, []).append((int(base + rank_of[i]), f,
                                          dls[i], b))
    assert len(got) == len(ref)
    for row in got:
        postings = sorted(ref[row["term"]])
        ids = np.array([p[0] for p in postings], np.int64)
        tfs = np.array([p[1] for p in postings], np.int64)
        dl = np.array([p[2] for p in postings], np.int64)
        enc = encode_postings(ids, tfs, dl, block_size=cfg.block_size)
        assert row["df"] == enc.df
        assert row["doc_ids"] == enc.doc_ids
        assert row["tfs"] == enc.tfs
        assert row["block_last_docid"] == enc.block_last_docid.tolist()
        assert row["block_off_docs"] == enc.block_off_docs.tolist()
        assert row["block_off_tfs"] == enc.block_off_tfs.tolist()
        assert row["block_max_tf"] == enc.block_max_tf.tolist()
        assert row["block_min_dl"] == enc.block_min_dl.tolist()
        assert row["block_first_docid"] == enc.block_first_docid.tolist()
        # positions: concatenation of per-posting blobs in doc order,
        # block byte offsets at every block_size-th posting
        blob = b"".join(p[3] for p in postings)
        assert row["positions"] == blob
        lens = np.array([len(p[3]) for p in postings], np.int64)
        cum = np.concatenate(([0], np.cumsum(lens)))
        expect_off = cum[:-1][::cfg.block_size]  # one per block, exact count
        assert row["block_off_pos"] == expect_off.tolist()


def test_dhash_pairs_groups_images(ray_session):
    """dHash -> band bucket -> hamming verify finds perturbed variants of
    the same base image and nothing else."""
    from search_engine_ray.functions.png import encode_png
    from search_engine_ray.stages.dedup import dhash_pairs
    from search_engine_ray.stages.multimodal import DHashImage

    rng = np.random.RandomState(7)
    imgs, ids = [], []
    for g in range(5):
        base = (rng.randint(0, 64, (24, 32)).astype(np.int64) * 4) \
            .astype(np.uint8)
        for v in range(3):
            im = base.copy()
            im[0, 0] ^= v  # off-grid tweak: <= 2 dHash bits
            imgs.append(encode_png(im))
            ids.append(g * 10 + v)
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "payload": pa.array(imgs, pa.binary())})
    sig = rd.from_arrow(tbl).map_batches(
        DHashImage, fn_constructor_kwargs={"decoder": "png"},
        batch_format="pyarrow", concurrency=1)
    out = dhash_pairs(sig, max_hamming=2).to_pandas()
    for r in out.itertuples():
        assert int(r.doc_a) // 10 == int(r.doc_b) // 10, \
            f"cross-group pair {r.doc_a}-{r.doc_b}"
    # every group's (v0, v1, v2) trio collapses to >= 1 found pair
    groups_with_pairs = {int(r.doc_a) // 10 for r in out.itertuples()}
    assert groups_with_pairs == set(range(5))
