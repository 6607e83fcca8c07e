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


def line_dedup(docs: rd.Dataset, *, max_docs: int = 1,
               text_col: str = "text", id_col: str = "doc_id",
               max_broadcast: int = 5_000_000) -> rd.Dataset:
    """Remove every line whose text appears in more than ``max_docs``
    distinct documents.  Returns (doc_id, clean_text, n_lines, n_removed)
    for every input document (``clean_text=''`` if nothing survived).
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
    dup = counts.filter(expr=f"nd > {int(max_docs)}") \
        .select_columns(["line_hash"]).take_all()
    if len(dup) > max_broadcast:
        raise ValueError(
            f"line_dedup boilerplate set has {len(dup)} lines > "
            f"max_broadcast={max_broadcast}; broadcast would not fit worker "
            "heaps. Fall back to a hash-partitioned anti-join of the line "
            "table (shuffle lines by line_hash, drop groups with a dup "
            "marker) or raise max_broadcast explicitly.")
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
        keep = ~dupmask
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

    return narrow.map_batches(rewrite, batch_format="pyarrow")


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
