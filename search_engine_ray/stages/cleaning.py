"""Corpus-cleaning operators for training-data pipelines.

Three families, each with a frozen SQL-mirrorable rule so the driver's
DuckDB oracle can verify values (``__ray_entry__.oracle_sql``):

* :func:`scrub_pii` — redact emails / IPv4 addresses / phone numbers with
  typed placeholder tokens (RE2 patterns, identical strings on the DuckDB
  side, which is also RE2-backed).
* :func:`line_dedup` — C4/CCNet-style boilerplate-line removal: a line
  whose exact text occurs in more than ``max_docs`` distinct documents is
  removed from *every* document.
* :func:`repetition_stats` — Gopher-style within-document repetition
  signals (duplicate-line fraction, duplicate-line character fraction).

The reference engine has none of these (its cleaning is the HTML → text
extraction, ``dto/indexing/PageAnalyzer.java``); they are round-2 scale
additions per SURVEY §2.11.

Scale shape
-----------
``scrub_pii`` and ``repetition_stats`` are single vectorized ``map_batches``
passes (Arrow RE2 kernels / numpy over flattened line tables) —
embarrassingly parallel.

``line_dedup`` is the broadcast-small-side design: the only exchange is a
``groupby`` over **(line_hash int64, count)** pairs (one row per distinct
(doc, line), never the line text), the resulting boilerplate hash set —
small by construction, it is the corpus's *repeated* boilerplate — is
``ray.put`` once and read per task, and the second pass rewrites each
document in place without the text ever leaving its row.  A guard caps the
broadcast set (default 5M hashes = 40 MB) and fails loudly with the
documented fallback (hash-partitioned anti-join of the line table) rather
than silently OOMing at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Sum

from ..functions.hashing import stable_hash_array

__all__ = ["scrub_pii", "line_dedup", "repetition_stats",
           "PII_EMAIL_RE", "PII_IPV4_RE", "PII_PHONE_RE"]

# Frozen PII rules (RE2 syntax — valid verbatim for both pyarrow.compute
# and DuckDB regexp_* which are RE2-backed).  Replacement is sequential
# email -> ipv4 -> phone; match counts are measured on the ORIGINAL text,
# per pattern independently (diagnostic columns, not a state machine).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PII_PHONE_RE = r"\+?[0-9][0-9()\-\s]{7,}[0-9]"


def scrub_pii(docs: rd.Dataset, *, text_col: str = "text",
              id_col: str = "doc_id") -> rd.Dataset:
    """Redact PII; returns (doc_id, text, n_emails, n_ips, n_phones)."""

    def scrub(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        n_emails = pc.count_substring_regex(text, PII_EMAIL_RE)
        n_ips = pc.count_substring_regex(text, PII_IPV4_RE)
        n_phones = pc.count_substring_regex(text, PII_PHONE_RE)
        out = pc.replace_substring_regex(text, PII_EMAIL_RE, "<EMAIL>")
        out = pc.replace_substring_regex(out, PII_IPV4_RE, "<IP>")
        out = pc.replace_substring_regex(out, PII_PHONE_RE, "<PHONE>")
        return pa.table({
            id_col: batch[id_col],
            "text": out,
            "n_emails": n_emails.cast(pa.int64()),
            "n_ips": n_ips.cast(pa.int64()),
            "n_phones": n_phones.cast(pa.int64()),
        })

    return docs.select_columns([id_col, text_col]) \
        .map_batches(scrub, batch_format="pyarrow")


def _flat_lines(text: pa.ChunkedArray | pa.Array):
    """Split a text column on '\\n' -> (list_array, parent_idx, flat_lines,
    line_hash int64).  ``split_pattern`` yields [''] for '' (1 line), same
    as DuckDB ``string_split`` — every doc has >= 1 line."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lst = pc.split_pattern(text, "\n")
    parent = pc.list_parent_indices(lst).to_numpy().astype(np.int64, copy=False)
    flat = pc.list_flatten(lst)
    h = stable_hash_array(flat).view(np.int64)
    return lst, parent, flat, h


def _distinct_per_doc(parent: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Mask of first occurrence of each (doc, line_hash) pair (sorted-order
    first; any representative works — callers only count or group)."""
    order = np.lexsort((h, parent))
    ps, hs = parent[order], h[order]
    first_sorted = np.ones(ps.size, bool)
    first_sorted[1:] = (ps[1:] != ps[:-1]) | (hs[1:] != hs[:-1])
    mask = np.zeros(ps.size, bool)
    mask[order] = first_sorted
    return mask


def _rebuild_docs(batch: pa.Table, lst, parent: np.ndarray, flat,
                  keep: np.ndarray, id_col: str) -> pa.Table:
    """Reassemble (doc_id, clean_text, n_lines, n_removed) from a per-line
    keep mask — shared by both line_dedup plans."""
    n_rows = len(batch)
    kept_per_doc = np.bincount(parent[keep], minlength=n_rows)
    offsets = np.zeros(n_rows + 1, np.int64)
    np.cumsum(kept_per_doc, out=offsets[1:])
    kept_list = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()),
        flat.filter(pa.array(keep)).cast(pa.string()))
    n_lines = pc.list_value_length(lst).cast(pa.int64())
    return pa.table({
        id_col: batch[id_col],
        "clean_text": pc.binary_join(kept_list, "\n").cast(pa.string()),
        "n_lines": n_lines,
        "n_removed": pc.subtract(
            n_lines, pa.array(kept_per_doc, pa.int64())),
    })


def line_dedup(docs: rd.Dataset, *, max_docs: int = 1,
               text_col: str = "text", id_col: str = "doc_id",
               max_broadcast: int = 5_000_000,
               force_shuffle: bool = False) -> rd.Dataset:
    """Remove every line whose text appears in more than ``max_docs``
    distinct documents.  Returns (doc_id, clean_text, n_lines, n_removed)
    for every input document (``clean_text=''`` if nothing survived).

    Plan selection: the boilerplate-line-hash set broadcasts while it fits
    a worker heap (``max_broadcast``); beyond that (or with
    ``force_shuffle``) the operator switches to the hash-partitioned plan —
    the positional (doc, line position, line hash) table semi-joins the
    boilerplate set by line hash, removal positions come back to each
    document through one doc-keyed join, and the rewrite drops them by
    index.  Identical output either way.
    """
    import ray

    narrow = docs.select_columns([id_col, text_col])

    def line_counts(batch: pa.Table) -> pa.Table:
        _, parent, _, h = _flat_lines(batch[text_col])
        keep = _distinct_per_doc(parent, h)
        return pa.table({"line_hash": pa.array(h[keep], pa.int64()),
                         "one": pa.array(np.ones(int(keep.sum()), np.int64))})

    counts = narrow.map_batches(line_counts, batch_format="pyarrow") \
        .groupby("line_hash").aggregate(Sum("one", alias_name="nd"))
    dup_ds = counts.filter(expr=f"nd > {int(max_docs)}") \
        .select_columns(["line_hash"]).materialize()

    if force_shuffle or dup_ds.count() > max_broadcast:
        return _line_dedup_shuffle(narrow, dup_ds, text_col=text_col,
                                   id_col=id_col)

    dup = dup_ds.take_all()
    dup_sorted = np.sort(np.array([r["line_hash"] for r in dup], np.int64))
    ref = ray.put(dup_sorted)

    def rewrite(batch: pa.Table) -> pa.Table:
        import ray as _ray

        bad = _ray.get(ref)
        lst, parent, flat, h = _flat_lines(batch[text_col])
        pos = np.searchsorted(bad, h)
        pos[pos == bad.size] = 0
        if bad.size:
            dupmask = bad[pos] == h
        else:
            dupmask = np.zeros(h.size, bool)
        return _rebuild_docs(batch, lst, parent, flat, ~dupmask, id_col)

    return narrow.map_batches(rewrite, batch_format="pyarrow")


def _line_dedup_shuffle(narrow: rd.Dataset, dup_ds: rd.Dataset, *,
                        text_col: str, id_col: str) -> rd.Dataset:
    """No-broadcast plan for :func:`line_dedup` (see its docstring)."""
    from .relational import drop_empty_blocks, shuffle_hash_join

    def line_rows(batch: pa.Table) -> pa.Table:
        lst, parent, _, h = _flat_lines(batch[text_col])
        ids = batch[id_col].to_numpy()
        lens = pc.list_value_length(lst).to_numpy().astype(np.int64)
        starts = np.zeros(len(batch), np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        pos = np.arange(h.size, dtype=np.int64) - starts[parent]
        return pa.table({id_col: pa.array(ids[parent], pa.int64()),
                         "pos": pa.array(pos, pa.int64()),
                         "line_hash": pa.array(h, pa.int64())})

    dup_clean = drop_empty_blocks(dup_ds, empty_schema=pa.schema(
        [("line_hash", pa.int64())]))
    removed = shuffle_hash_join(
        narrow.map_batches(line_rows, batch_format="pyarrow"), dup_clean,
        on=("line_hash",), how="semi")

    def collect_part(group: pa.Table) -> pa.Table:
        # all docs routed to this part: one lexsort, then per-doc runs of
        # removed positions packed into ONE binary column (acero joins
        # reject list payloads; the int64 blob decodes vectorized downstream)
        ids = group[id_col].to_numpy()
        pos = group["pos"].to_numpy()
        order = np.lexsort((pos, ids))
        ids_s, pos_s = ids[order].astype(np.int64), pos[order].astype(np.int64)
        first = np.ones(ids_s.size, bool)
        first[1:] = ids_s[1:] != ids_s[:-1]
        starts = np.flatnonzero(first)
        # int64 offsets (large_binary): a routing part can accumulate far
        # more than 2^31 packed position bytes at corpus scale
        offsets = (np.concatenate([starts, [ids_s.size]]) * 8).astype(np.int64)
        blob = pa.Array.from_buffers(
            pa.large_binary(), starts.size,
            [None, pa.py_buffer(offsets.tobytes()),
             pa.py_buffer(pos_s.tobytes())])
        return pa.table({id_col: pa.array(ids_s[starts], pa.int64()),
                         "removed_blob": blob})

    # coarse-part routing (same pattern as the dedup bucket groupbys):
    # one group per routing part, docs walked as sorted runs inside it —
    # not one tiny map_groups call per document
    from .dedup import _shuffle_parts

    n_parts = _shuffle_parts()

    def add_part(b: pa.Table) -> pa.Table:
        from ..functions.hashing import _splitmix64

        ids = b[id_col].to_numpy().astype(np.uint64)
        part = (_splitmix64(ids) % np.uint64(n_parts)).astype(np.int32)
        return b.append_column("dpart", pa.array(part, pa.int32()))

    rem_lists = drop_empty_blocks(
        removed.map_batches(add_part, batch_format="pyarrow")
        .groupby("dpart").map_groups(collect_part, batch_format="pyarrow"),
        empty_schema=pa.schema([(id_col, pa.int64()),
                                ("removed_blob", pa.large_binary())]))

    joined = shuffle_hash_join(narrow, rem_lists, on=(id_col,), how="left")

    def rewrite(batch: pa.Table) -> pa.Table:
        lst, parent, flat, h = _flat_lines(batch[text_col])
        rp = batch["removed_blob"]
        if isinstance(rp, pa.ChunkedArray):
            rp = rp.combine_chunks()
        if not pa.types.is_large_binary(rp.type):
            rp = rp.cast(pa.large_binary())
        # decode the packed positions in one pass: per-row byte lengths give
        # the repeat counts; row slices are contiguous, so the value span is
        # one int64 view (nulls contribute zero bytes)
        n_rem = (pc.fill_null(pc.binary_length(rp), 0).to_numpy()
                 .astype(np.int64) // 8)
        rem_parent = np.repeat(np.arange(len(rp), dtype=np.int64), n_rem)
        off = np.frombuffer(rp.buffers()[1], np.int64)[
            rp.offset: rp.offset + len(rp) + 1]
        rem_pos = np.frombuffer(rp.buffers()[2], np.uint8)[
            off[0]: off[-1]].view(np.int64) if len(rp) else \
            np.zeros(0, np.int64)
        lens = pc.list_value_length(lst).to_numpy().astype(np.int64)
        starts = np.zeros(len(batch), np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        keep = np.ones(h.size, bool)
        keep[starts[rem_parent] + rem_pos] = False
        return _rebuild_docs(batch, lst, parent, flat, keep, id_col)

    return joined.map_batches(rewrite, batch_format="pyarrow")


def repetition_stats(docs: rd.Dataset, *, text_col: str = "text",
                     id_col: str = "doc_id") -> rd.Dataset:
    """Within-document repetition signals (Gopher quality rules):
    (doc_id, n_lines, n_dup_lines, dup_line_frac, dup_line_char_frac).

    ``n_dup_lines`` = lines minus distinct lines; ``dup_line_char_frac`` =
    characters in lines whose within-doc occurrence count > 1 (all
    occurrences) over all line characters (0.0 when the doc has no line
    characters).  Pure vectorized map — no exchange.
    """

    def stats(batch: pa.Table) -> pa.Table:
        lst, parent, flat, h = _flat_lines(batch[text_col])
        n_rows = len(batch)
        lens = pc.utf8_length(flat).to_numpy().astype(np.int64, copy=False)

        order = np.lexsort((h, parent))
        ps, hs = parent[order], h[order]
        new_grp = np.ones(ps.size, bool)
        if ps.size:
            new_grp[1:] = (ps[1:] != ps[:-1]) | (hs[1:] != hs[:-1])
        grp_id = np.cumsum(new_grp) - 1 if ps.size else new_grp.astype(np.int64)
        grp_sizes = np.bincount(grp_id) if ps.size else np.empty(0, np.int64)
        occ_sorted = grp_sizes[grp_id] if ps.size else np.empty(0, np.int64)
        occ = np.empty(ps.size, np.int64)
        occ[order] = occ_sorted

        n_lines = np.bincount(parent, minlength=n_rows)
        n_distinct = np.bincount(parent[_distinct_per_doc(parent, h)],
                                 minlength=n_rows)
        total_chars = np.zeros(n_rows, np.int64)
        np.add.at(total_chars, parent, lens)
        dup_chars = np.zeros(n_rows, np.int64)
        dup_sel = occ > 1
        np.add.at(dup_chars, parent[dup_sel], lens[dup_sel])

        n_dup = n_lines - n_distinct
        with np.errstate(divide="ignore", invalid="ignore"):
            frac = np.where(n_lines > 0, n_dup / n_lines, 0.0)
            cfrac = np.where(total_chars > 0, dup_chars / total_chars, 0.0)
        return pa.table({
            id_col: batch[id_col],
            "n_lines": pa.array(n_lines, pa.int64()),
            "n_dup_lines": pa.array(n_dup, pa.int64()),
            "dup_line_frac": pa.array(frac, pa.float64()),
            "dup_line_char_frac": pa.array(cfrac, pa.float64()),
        })

    return docs.select_columns([id_col, text_col]) \
        .map_batches(stats, batch_format="pyarrow")
