"""Index merge / compaction: combine N index versions part-by-part.

The reference's only maintenance paths are full delete-and-recrawl
(``services/IndexingServiceImpl.java:82-84``) and single-page upsert
(``:145-182``); this engine's batch equivalents are partition rebuild
(``pipelines/build.reindex_urls``) and — new in round 3 — *merge*: given
several indexes built over corpus shards (or an old index plus a delta
index over re-crawled pages), produce one index equal to a fresh build
over the union, without touching the raw HTML again.  This is the
classic LSM/segment-compaction move of every production search engine.

Correctness contract (tested byte-for-byte): because partition
assignment is ``stable_hash(url) % P``, a url lives in the SAME part
number in every source, so output part *p* depends only on the sources'
part-*p* segments — merge is embarrassingly parallel over parts, no
shuffle at any scale.  Duplicate urls across sources keep the LAST
source's row (later index wins — reindex-delta semantics).  Doc ids are
re-assigned url-sorted exactly like the builder, postings are decoded,
doc-id-mapped and re-encoded with identical block metadata, and the
per-(site, term) dictionary is recomputed from the merged postings — so
``merge(build(A), build(B))`` produces byte-identical segment files to
``build(A+B)`` whenever A and B are disjoint.

Scale shape: one Ray task per output part (``map_batches`` over a part-id
dataset); each task's memory is bounded by the merged size of ONE part
(the builder's own per-part bound).  Sources stream nothing to the
driver; the final global-dict/corpus-stats pass is the builder's own
metadata-scale ``finalize_index``.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from ..functions.codec import EncodedPostings, decode_postings, encode_postings
from ..state.manifest import (PartManifest, commit_part_dir, done_parts,
                              part_dirname, write_manifest)
from ..stages.segments import DOC_ID_PART_SHIFT

__all__ = ["merge_indexes"]


def _read_postings_rows(path: str):
    """Yield (term, EncodedPostings, positions_blob_or_None) rows from one
    segment file.  ``positions`` (varint gap stream, per-posting delta with
    absolute first value — the layout stages/segments writes) rides along
    so positional indexes merge losslessly."""
    t = pq.read_table(path)
    has_pos = "positions" in t.column_names
    for row in t.to_pylist():
        yield row["term"], EncodedPostings(
            df=row["df"], doc_ids=row["doc_ids"], tfs=row["tfs"],
            block_last_docid=np.array(row["block_last_docid"], np.int64),
            block_off_docs=np.array(row["block_off_docs"], np.int64),
            block_off_tfs=np.array(row["block_off_tfs"], np.int64),
            block_max_tf=np.array(row["block_max_tf"], np.int32),
            block_min_dl=np.array(row["block_min_dl"], np.int32),
            block_first_docid=np.array(row["block_first_docid"], np.int64),
        ), (row["positions"] if has_pos else None)


def _merge_one_part(part: int, source_dirs: list[str], out_dir: str,
                    block_size: int, config_hash: str) -> dict:
    t0 = time.monotonic()
    pdir = part_dirname(part)
    docs_tbls = []
    for si, src in enumerate(source_dirs):
        p = os.path.join(src, pdir, "docs.parquet")
        if os.path.exists(p):
            t = pq.read_table(p)
            docs_tbls.append(t.append_column(
                "_src", pa.array(np.full(t.num_rows, si, np.int64))))
    if not docs_tbls:
        return {"part": part, "n_docs": 0, "skipped": True}
    docs = pa.concat_tables(docs_tbls, promote_options="permissive")

    # --- dedup by url, LAST source wins; then url-sort for new doc ids ---
    order = pc.sort_indices(docs.select(["url", "_src"]),
                            sort_keys=[("url", "ascending"),
                                       ("_src", "descending")])
    docs = docs.take(order)
    urls = docs["url"].combine_chunks() if isinstance(
        docs["url"], pa.ChunkedArray) else docs["url"]
    n = docs.num_rows
    first = np.ones(n, bool)
    if n > 1:
        first[1:] = pc.not_equal(urls.slice(1),
                                 urls.slice(0, n - 1)).to_numpy(
            zero_copy_only=False)
    kept_docs = docs.filter(pa.array(first))
    n_docs = kept_docs.num_rows
    part_base = np.int64(part) << DOC_ID_PART_SHIFT
    new_ids = part_base + np.arange(n_docs, dtype=np.int64)

    # old doc_id -> new doc_id (url-sorted rank), -1 for dropped dups.
    # Old ids are part-local ranks under the same base, so a dense array
    # indexed by old rank per source is O(part size).
    old_ids = docs["doc_id"].to_numpy()
    src_col = docs["_src"].to_numpy()
    maps: list[np.ndarray] = []
    for si in range(len(source_dirs)):
        sel = src_col == si
        if not sel.any():
            maps.append(np.empty(0, np.int64))
            continue
        ranks = (old_ids[sel] - part_base).astype(np.int64)
        m = np.full(int(ranks.max()) + 1, -1, np.int64)
        kept_sel = first[sel]
        # position of each surviving row of this source in kept_docs:
        pos_in_kept = np.cumsum(first) - 1
        m[ranks[kept_sel]] = new_ids[pos_in_kept[sel][kept_sel]]
        maps.append(m)

    new_doc_len = kept_docs["doc_len"].to_numpy().astype(np.int64)
    dl_of_new = np.zeros(n_docs, np.int64)
    dl_of_new[:] = new_doc_len

    # --- decode + remap postings per source, accumulate per term ---------
    # Fallback block-size inference (pre-round-4 manifests lack the numeric
    # setting in extra): entry count of the first block of any multi-block
    # term; if every term fits one block, any size >= max df re-encodes
    # identically.
    inferred_bs = 0
    has_pos = False
    per_term_ids: dict[str, list[np.ndarray]] = {}
    per_term_tfs: dict[str, list[np.ndarray]] = {}
    per_term_pos: dict[str, list[np.ndarray]] = {}
    from ..functions.codec import varint_decode

    for si, src in enumerate(source_dirs):
        p = os.path.join(src, pdir, "postings.parquet")
        if not os.path.exists(p):
            continue
        m = maps[si]
        for term, enc, pos_blob in _read_postings_rows(p):
            if not inferred_bs and len(enc.block_first_docid) > 1:
                from ..functions.codec import decode_block_docids

                inferred_bs = len(decode_block_docids(enc, 0))
            ids, tfs = decode_postings(enc)
            nid = m[(ids - part_base).astype(np.int64)]
            keep = nid >= 0
            if pos_blob is not None:
                has_pos = True
                # absolute per-posting positions from the flat gap stream
                # (same reconstruction as pipelines/phrase._decode_term_row)
                tfs64 = tfs.astype(np.int64)
                gaps = varint_decode(pos_blob, count=int(tfs64.sum()))
                pstarts = np.zeros(len(ids), np.int64)
                np.cumsum(tfs64[:-1], out=pstarts[1:])
                cs = np.cumsum(gaps)
                carry = np.where(pstarts > 0, cs[pstarts - 1], 0)
                pos_abs = cs - np.repeat(carry, tfs64)
                if not keep.all():
                    pos_abs = pos_abs[np.repeat(keep, tfs64)]
            if not keep.any():
                continue
            per_term_ids.setdefault(term, []).append(nid[keep])
            per_term_tfs.setdefault(term, []).append(tfs[keep])
            if pos_blob is not None:
                per_term_pos.setdefault(term, []).append(pos_abs)

    # --- re-encode term-sorted (identical writer settings to the builder)
    rows_term, rows_df = [], []
    rows_docids, rows_tfs = [], []
    rows_blast, rows_boffd, rows_bofft = [], [], []
    rows_bmaxtf, rows_bmindl, rows_bfirst = [], [], []
    rows_pos, rows_boffp = [], []
    bytes_postings = 0
    n_postings = 0
    site_arr = np.asarray(kept_docs["site"].to_pylist(), object)
    block_size = block_size or inferred_bs
    if not block_size:
        from ..config import IndexBuildConfig

        block_size = IndexBuildConfig().block_size
    st_pairs: dict[tuple[str, str], int] = {}
    from ..functions.codec import varint_encode_with_lengths

    for term in sorted(per_term_ids):
        ids = np.concatenate(per_term_ids[term])
        tfs = np.concatenate(per_term_tfs[term])
        ix = np.argsort(ids)
        if has_pos:
            # reorder the flat position stream into the new posting order,
            # then re-delta + varint exactly like the builder (byte-identical
            # for the same posting set)
            pos_flat = np.concatenate(per_term_pos[term])
            tfs64 = tfs.astype(np.int64)
            src_starts = np.zeros(len(ids), np.int64)
            np.cumsum(tfs64[:-1], out=src_starts[1:])
            lens = tfs64[ix]
            out_starts = np.zeros(len(ids), np.int64)
            np.cumsum(lens[:-1], out=out_starts[1:])
            gather = np.repeat(src_starts[ix] - out_starts, lens) \
                + np.arange(pos_flat.size, dtype=np.int64)
            pos_sorted = pos_flat[gather]
            gaps = pos_sorted.copy()
            if pos_sorted.size:
                gaps[1:] -= pos_sorted[:-1]
                gaps[out_starts] = pos_sorted[out_starts]
            buf, lens_b = varint_encode_with_lengths(gaps)
            cum = np.zeros(gaps.size + 1, np.int64)
            np.cumsum(lens_b, out=cum[1:])
            posting_byte_starts = cum[out_starts]
            blk = np.arange(0, len(ids), block_size, dtype=np.int64)
            rows_pos.append(bytes(buf))
            rows_boffp.append(posting_byte_starts[blk].tolist())
            bytes_postings += len(rows_pos[-1])
        ids, tfs = ids[ix], tfs[ix]
        local = (ids - part_base).astype(np.int64)
        enc = encode_postings(ids, tfs, dl_of_new[local],
                              block_size=block_size)
        rows_term.append(term)
        rows_df.append(enc.df)
        rows_docids.append(enc.doc_ids)
        rows_tfs.append(enc.tfs)
        rows_blast.append(enc.block_last_docid.tolist())
        rows_boffd.append(enc.block_off_docs.tolist())
        rows_bofft.append(enc.block_off_tfs.tolist())
        rows_bmaxtf.append(enc.block_max_tf.tolist())
        rows_bmindl.append(enc.block_min_dl.tolist())
        rows_bfirst.append(enc.block_first_docid.tolist())
        bytes_postings += len(enc.doc_ids) + len(enc.tfs)
        n_postings += enc.df
        for s, c in zip(*np.unique(site_arr[local], return_counts=True)):
            st_pairs[(s, term)] = st_pairs.get((s, term), 0) + int(c)

    postings_tbl = pa.table({
        "term": pa.array(rows_term, pa.string()),
        "df": pa.array(rows_df, pa.int64()),
        "doc_ids": pa.array(rows_docids, pa.binary()),
        "tfs": pa.array(rows_tfs, pa.binary()),
        "block_last_docid": pa.array(rows_blast, pa.list_(pa.int64())),
        "block_off_docs": pa.array(rows_boffd, pa.list_(pa.int64())),
        "block_off_tfs": pa.array(rows_bofft, pa.list_(pa.int64())),
        "block_max_tf": pa.array(rows_bmaxtf, pa.list_(pa.int32())),
        "block_min_dl": pa.array(rows_bmindl, pa.list_(pa.int32())),
        "block_first_docid": pa.array(rows_bfirst, pa.list_(pa.int64())),
        **({"positions": pa.array(rows_pos, pa.binary()),
            "block_off_pos": pa.array(rows_boffp, pa.list_(pa.int64()))}
           if has_pos else {}),
    })

    st_sorted = sorted(st_pairs)
    dict_tbl = pa.table({
        "site": pa.array([s for s, _ in st_sorted], pa.string()),
        "term": pa.array([t for _, t in st_sorted], pa.string()),
        "df": pa.array([st_pairs[k] for k in st_sorted], pa.int64()),
    })

    docs_tbl = kept_docs.drop_columns(["_src"]).set_column(
        kept_docs.schema.get_field_index("doc_id"), "doc_id",
        pa.array(new_ids, pa.int64())).combine_chunks()

    import uuid

    final_dir = os.path.join(out_dir, pdir)
    tmp_dir = os.path.join(out_dir, f".tmp-{pdir}-{uuid.uuid4().hex[:8]}")
    os.makedirs(tmp_dir, exist_ok=True)
    pq.write_table(docs_tbl, os.path.join(tmp_dir, "docs.parquet"))
    pq.write_table(postings_tbl, os.path.join(tmp_dir, "postings.parquet"),
                   row_group_size=1024)
    pq.write_table(dict_tbl, os.path.join(tmp_dir, "dict.parquet"))
    write_manifest(tmp_dir, PartManifest(
        part=part, status="done",
        input_fingerprint="merge:" + ",".join(
            _src_fingerprint(s, part) for s in source_dirs),
        config_hash=config_hash,
        input_rows=n_docs, n_docs=n_docs, n_terms=len(rows_term),
        n_postings=int(n_postings),
        total_tokens=int(new_doc_len.sum()),
        bytes_postings=bytes_postings, bytes_docs=docs_tbl.nbytes,
        wall_sec=time.monotonic() - t0, engine_version="merge-1",
        extra={"block_size": int(block_size),
               "store_positions": bool(has_pos)},
    ))
    commit_part_dir(tmp_dir, final_dir)
    return {"part": part, "n_docs": int(n_docs),
            "n_terms": len(rows_term), "skipped": False}


def _src_fingerprint(src: str, part: int) -> str:
    from ..state.manifest import read_manifest

    m = read_manifest(os.path.join(src, part_dirname(part)))
    return m.input_fingerprint if m else "absent"


def merge_indexes(source_dirs: list[str], out_dir: str, *,
                  resume: bool = True) -> dict:
    """Merge/compact N committed indexes into ``out_dir`` (see module doc).

    All sources must share a partition count and config hash (block size
    etc. — byte-identity is only defined within one config).  Runs one Ray
    task per part via a Dataset pipeline, then the builder's own
    ``finalize_index`` for the global dictionary + corpus stats.

    ``resume=True`` (default): output parts whose committed manifest
    already records this exact merge — same config hash and the same
    per-source input fingerprints (the ``merge:fp1,fp2,...`` lineage
    string, order-sensitive because later sources win dedup) — are
    skipped, so a killed merge re-runs only its missing/stale parts; the
    same contract as ``build_index``'s per-partition checkpointing.
    """
    from .build import finalize_index

    per_src = [done_parts(s) for s in source_dirs]
    if not any(per_src):
        raise ValueError("no committed parts in any source")
    hashes = {m.config_hash for d in per_src for m in d.values()}
    if len(hashes) > 1:
        raise ValueError(f"sources built with different configs: {hashes}")
    config_hash = next(iter(hashes))
    all_parts = sorted({p for d in per_src for p in d})
    skipped = {}
    if resume and os.path.isdir(out_dir):
        committed = done_parts(out_dir)
        for p in list(all_parts):
            m = committed.get(p)
            want_fp = "merge:" + ",".join(
                _src_fingerprint(s, p) for s in source_dirs)
            if m and m.config_hash == config_hash \
                    and m.input_fingerprint == want_fp:
                skipped[p] = m
        all_parts = [p for p in all_parts if p not in skipped]
        if not all_parts:
            finalize_index(out_dir)
            return {"parts": 0, "skipped": len(skipped),
                    "n_docs": sum(m.n_docs for m in skipped.values())}
    # The numeric block size is persisted in part manifests' ``extra``
    # (round 4+); sources share one config hash so any manifest's value
    # stands for all.  Pre-round-4 sources lack it -> 0, and each part
    # falls back to skip-metadata inference, then the engine default.
    block_size = 0
    for d in per_src:
        for m in d.values():
            bs = (m.extra or {}).get("block_size")
            if bs:
                block_size = int(bs)
                break
        if block_size:
            break
    os.makedirs(out_dir, exist_ok=True)

    # clear stale/incomplete output dirs for the parts being rebuilt —
    # commit_part_dir is first-wins and would otherwise discard the rebuild
    import shutil

    for p in all_parts:
        shutil.rmtree(os.path.join(out_dir, part_dirname(p)),
                      ignore_errors=True)

    srcs = list(source_dirs)

    def run(batch: pa.Table) -> pa.Table:
        out = [_merge_one_part(int(p), srcs, out_dir, block_size,
                               config_hash)
               for p in batch["part"].to_pylist()]
        return pa.table({
            "part": pa.array([o["part"] for o in out], pa.int64()),
            "n_docs": pa.array([o["n_docs"] for o in out], pa.int64()),
        })

    stats = rd.from_arrow(pa.table({
        "part": pa.array(all_parts, pa.int64())})) \
        .repartition(len(all_parts)) \
        .map_batches(run, batch_format="pyarrow").take_all()
    finalize_index(out_dir)
    return {"parts": len(stats), "skipped": len(skipped),
            "n_docs": sum(r["n_docs"] for r in stats)
            + sum(m.n_docs for m in skipped.values())}
