"""Phrase (positional) matching.

The reference engine has no phrase queries — its index stores only
(page, lemma, tf) (``model/Index.java:13-34``) and search is a bag-of-
lemmas AND (``services/SearchServiceImpl.java:152-180``).  Round 3 adds
the standard full-text feature on top of the same token pipeline:

* **Position semantics**: a document's token positions are the 0-based
  running index over its KEPT tokens — the cleaned, morphology-surviving
  lemma stream in original text order (the same stream the TF counter
  consumes).  A phrase ``[q0 .. qm-1]`` matches at position ``p`` iff the
  kept token at ``p+j`` normalizes to ``qj`` for every ``j`` — i.e.
  adjacency AFTER cleaning/stop-filtering, the common "phrase with stop
  words elided" contract.
* :func:`phrase_counts` — the streaming operator over a raw document
  table: one stateless/actor ``map_batches`` pass, no shuffle, exactly
  SQL-mirrorable for ``morphology="simple"`` (the oracle rebuilds
  positions with ``row_number() OVER (PARTITION BY doc ORDER BY token
  ordinal)`` and self-joins ``p+1 .. p+m-1``).
* The index-backed path (positional postings) lives with the segment
  reader; ``tests`` cross-check the two.

Scale shape: the per-batch matcher is fully vectorized — the Arrow
tokenize kernels are shared with the Lemmatizer stage
(``stages/lemmatize.py``), phrase-slot membership is computed on the
batch's UNIQUE surface forms only, and the adjacency test is ``m-1``
shifted boolean ANDs over the kept-token stream.  Memory per batch is
O(tokens); nothing leaves the task but (doc_id, n_matches) rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.morphology import get_morphology
from ..functions.tokenize import SPLIT_RE, TOKEN_RE, clean_token

__all__ = ["PhraseCounter", "NgramTF", "phrase_counts", "phrase_search",
           "normalize_phrase"]


def normalize_phrase(phrase: list[str] | str,
                     morphology: str = "simple") -> list[str]:
    """The query side of the contract: clean + normalize each phrase word
    with exactly the document pipeline (tokenize.clean_token + morphology);
    dropped words are elided, keeping the order and duplicates of the
    survivors (unlike ``lemmas_of_query``, which dedups for the AND path)."""
    text = phrase if isinstance(phrase, str) else " ".join(phrase)
    morph = get_morphology(morphology)
    out = []
    for raw in SPLIT_RE.split(text.lower()):
        if not raw:
            continue
        w = clean_token(raw)
        t = morph.normal_word(w) if w else ""
        if t:
            out.append(t)
    return out


class NgramTF:
    """Callable-class stage: per-doc word n-gram term frequencies —
    ``(id, term, tf)`` rows where ``term`` is the space-joined n-gram of
    KEPT tokens (the same cleaned/normalized stream every other stage
    consumes, so the SQL mirror is the positions CTE self-joined n-1
    times).  The tf base layer for n-gram-vector similarity
    (``stages/dedup.sparse_cosine_pairs``).

    Vectorized like :class:`PhraseCounter`: Arrow tokenize kernels, then
    the n-gram keys pack as base-V integers over the batch vocabulary and
    count with one ``np.unique`` — n-gram STRINGS are materialized only
    for the batch's distinct keys."""

    def __init__(self, n: int = 2, morphology: str = "simple",
                 text_column: str = "text", id_column: str = "doc_id"):
        self.n = int(n)
        if self.n < 1:
            raise ValueError("n >= 1")
        self.morph = get_morphology(morphology)
        self.text_column = text_column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_docs = batch.num_rows
        out_schema = pa.schema([(self.id_column, pa.int64()),
                                ("term", pa.string()),
                                ("tf", pa.int64())])
        if not n_docs:
            return out_schema.empty_table()
        texts = batch[self.text_column]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lower = pc.utf8_lower(texts)
        toks = pc.ascii_split_whitespace(lower)
        lens = pc.fill_null(pc.list_value_length(toks), 0).to_numpy() \
            .astype(np.int64)
        flat = pc.list_flatten(toks)
        simple = pc.match_substring_regex(flat, r"^[а-яёa-z]+$")
        rest = pc.invert(simple)
        if pc.any(rest).as_py():
            rest_words = pc.struct_field(
                pc.extract_regex(flat.filter(rest), pattern=TOKEN_RE.pattern),
                "word")
            words = pc.replace_with_mask(flat, rest, rest_words)
        else:
            words = flat
        enc = words.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        surface = enc.dictionary.to_pylist()
        normal = self.morph.normal_word
        normed = [normal(s) for s in surface]
        vocab = sorted({t for t in normed if t})
        vid = {t: i for i, t in enumerate(vocab)}
        dict_to_vid = np.array([vid.get(t, -1) for t in normed], np.int64) \
            if normed else np.empty(0, np.int64)
        idx = enc.indices.to_numpy(zero_copy_only=False)
        valid = ~np.isnan(idx) if idx.dtype.kind == "f" \
            else np.ones(len(idx), bool)
        didx = np.where(valid, idx, 0).astype(np.int64)
        tid = np.where(valid, dict_to_vid[didx] if len(dict_to_vid) else -1,
                       -1)
        keep = tid >= 0
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)[keep]
        tid = tid[keep]
        n = self.n
        m = len(tid)
        if m < n:
            return out_schema.empty_table()
        V = np.int64(max(1, len(vocab)))
        w = m - n + 1
        key = tid[:w].copy()
        for j in range(1, n):
            key = key * V + tid[j:j + w]
        same_doc = doc_of[:w] == doc_of[n - 1:]
        key, gdoc = key[same_doc], doc_of[:w][same_doc]
        combo = gdoc * (V ** n) + key
        uk, counts = np.unique(combo, return_counts=True)
        u_doc = uk // (V ** n)
        u_key = uk % (V ** n)
        # build strings only for this batch's distinct n-gram keys
        distinct_keys, inv = np.unique(u_key, return_inverse=True)
        parts = []
        rem = distinct_keys.copy()
        for _ in range(n):
            parts.append(rem % V)
            rem //= V
        parts.reverse()
        vocab_arr = np.asarray(vocab, object)
        strings = [" ".join(vocab_arr[p[i]] for p in parts)
                   for i in range(len(distinct_keys))]
        ids = batch[self.id_column].to_numpy(zero_copy_only=False)
        return pa.table({
            self.id_column: pa.array(ids[u_doc], pa.int64()),
            "term": pa.array(np.asarray(strings, object)[inv], pa.string()),
            "tf": pa.array(counts.astype(np.int64), pa.int64()),
        })


def _normalized_stream(morph, batch: pa.Table, text_column: str
                       ) -> tuple[np.ndarray, np.ndarray, list[str]]:
    """Kept-token stream for a batch, kernel-for-kernel the Lemmatizer
    fast path (lowercase, ascii whitespace split, anchored TOKEN_RE
    clean, normalization via the surface-form dictionary): returns
    ``(doc_of, dict_index, normalized_dictionary)`` where positions are
    defined over exactly the stream the index stores tfs for."""
    texts = batch[text_column]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lower = pc.utf8_lower(texts)
    toks = pc.ascii_split_whitespace(lower)
    lens = pc.fill_null(pc.list_value_length(toks), 0).to_numpy() \
        .astype(np.int64)
    flat = pc.list_flatten(toks)
    simple = pc.match_substring_regex(flat, r"^[а-яёa-z]+$")
    rest = pc.invert(simple)
    if pc.any(rest).as_py():
        rest_words = pc.struct_field(
            pc.extract_regex(flat.filter(rest), pattern=TOKEN_RE.pattern),
            "word")
        words = pc.replace_with_mask(flat, rest, rest_words)
    else:
        words = flat

    enc = words.dictionary_encode()
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    surface = enc.dictionary.to_pylist()
    normal = morph.normal_word
    normed = [normal(s) for s in surface]
    kept_dict = np.array([bool(t) for t in normed], bool) \
        if normed else np.empty(0, bool)

    idx = enc.indices.to_numpy(zero_copy_only=False)
    valid = ~np.isnan(idx) if idx.dtype.kind == "f" \
        else np.ones(len(idx), bool)
    didx = np.where(valid, idx, 0).astype(np.int64)
    keep = valid & (kept_dict[didx] if len(kept_dict) else False)

    n_docs = batch.num_rows
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)[keep]
    return doc_of, didx[keep], normed


class ProximityCounter:
    """Callable-class stage: per-doc count of UNORDERED proximity pairs —
    positions ``(pa, pb)`` of ``term_a`` / ``term_b`` in the same document
    with ``|pa - pb| <= slop`` (the classic NEAR/k query the exact-phrase
    operator can't express).  Positions are kept-token ordinals, identical
    to the phrase/index stream.

    Vectorized across the whole batch: each side's positions become one
    sorted ``doc * 2^32 + pos`` key array and the pair count per A-token
    is two ``searchsorted`` calls — no per-doc loop."""

    def __init__(self, term_a: str, term_b: str, slop: int = 3,
                 morphology: str = "simple", text_column: str = "text",
                 id_column: str = "doc_id") -> None:
        if slop < 1:
            raise ValueError("slop must be >= 1")
        self.term_a = term_a
        self.term_b = term_b
        self.slop = int(slop)
        self.morph = get_morphology(morphology)
        self.text_column = text_column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_docs = batch.num_rows
        ids = batch[self.id_column]
        if not n_docs:
            return pa.table({self.id_column: ids.slice(0, 0),
                             "n_pairs": pa.array([], pa.int64())})
        doc_of, kdict, normed = _normalized_stream(
            self.morph, batch, self.text_column)
        n = len(kdict)
        # kept-token ordinal within each doc (doc_of is non-decreasing)
        if n:
            first = np.ones(n, bool)
            first[1:] = doc_of[1:] != doc_of[:-1]
            starts = np.flatnonzero(first)
            pos = np.arange(n, dtype=np.int64) - np.repeat(
                starts, np.diff(np.append(starts, n)))
        else:
            pos = np.zeros(0, np.int64)
        is_a = np.array([t == self.term_a for t in normed], bool) \
            if normed else np.empty(0, bool)
        is_b = np.array([t == self.term_b for t in normed], bool) \
            if normed else np.empty(0, bool)
        SHIFT = np.int64(1) << np.int64(32)
        key = doc_of * SHIFT + pos
        ka = key[is_a[kdict]] if n else np.zeros(0, np.int64)
        kb = key[is_b[kdict]] if n else np.zeros(0, np.int64)
        counts = np.zeros(n_docs, np.int64)
        if ka.size and kb.size:
            lo = np.searchsorted(kb, ka - self.slop, side="left")
            hi = np.searchsorted(kb, ka + self.slop, side="right")
            per_a = hi - lo
            np.add.at(counts, (ka >> np.int64(32)).astype(np.int64),
                      per_a)
        sel = counts > 0
        return pa.table({
            self.id_column: ids.filter(pa.array(sel)),
            "n_pairs": pa.array(counts[sel], pa.int64()),
        })


class PhraseCounter:
    """Callable-class stage: per-doc occurrence count of one phrase.

    Tokenization is kernel-for-kernel the Lemmatizer's fast path
    (``stages/lemmatize.py`` — lowercase, ascii whitespace split, anchored
    TOKEN_RE clean, unique-surface-form normalization), so positions are
    defined over exactly the stream the index stores tfs for.
    """

    def __init__(self, phrase: list[str], morphology: str = "simple",
                 text_column: str = "text", id_column: str = "doc_id",
                 keep_zero: bool = False) -> None:
        if not phrase:
            raise ValueError("empty phrase")
        self.phrase = list(phrase)
        self.morph = get_morphology(morphology)
        self.text_column = text_column
        self.id_column = id_column
        self.keep_zero = keep_zero

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_docs = batch.num_rows
        ids = batch[self.id_column]
        empty = pa.table({self.id_column: ids.slice(0, 0),
                          "n_matches": pa.array([], pa.int64())})
        if not n_docs:
            return empty
        doc_of, kdict, normed = _normalized_stream(
            self.morph, batch, self.text_column)
        # phrase-slot membership per DICT entry (tokens inherit it below)
        slot_dict = [np.array([t == q for t in normed], bool)
                     if normed else np.empty(0, bool)
                     for q in self.phrase]
        n = len(kdict)
        m = len(self.phrase)
        if n >= m:
            w = n - m + 1
            match = slot_dict[0][kdict[:w]].copy()
            for j in range(1, m):
                match &= slot_dict[j][kdict[j:j + w]]
            match &= doc_of[:w] == doc_of[m - 1:]
            counts = np.bincount(doc_of[:w][match], minlength=n_docs) \
                .astype(np.int64)
        else:
            counts = np.zeros(n_docs, np.int64)
        if self.keep_zero:
            sel = np.ones(n_docs, bool)
        else:
            sel = counts > 0
        return pa.table({
            self.id_column: ids.filter(pa.array(sel)),
            "n_matches": pa.array(counts[sel], pa.int64()),
        })


def _decode_term_row(row: dict) -> tuple[np.ndarray, np.ndarray]:
    """(doc_ids, flat positions) for one positional postings row; positions
    are delta-decoded per posting (first value absolute — the same layout
    stages/lemmatize packs and stages/segments concatenates)."""
    from ..functions.codec import (EncodedPostings, decode_postings,
                                   varint_decode)

    enc = EncodedPostings(
        df=row["df"], doc_ids=row["doc_ids"], tfs=row["tfs"],
        block_last_docid=np.array(row["block_last_docid"], np.int64),
        block_off_docs=np.array(row["block_off_docs"], np.int64),
        block_off_tfs=np.array(row["block_off_tfs"], np.int64),
        block_max_tf=np.array(row["block_max_tf"], np.int32),
        block_min_dl=np.array(row["block_min_dl"], np.int32),
        block_first_docid=np.array(row["block_first_docid"], np.int64),
    )
    ids, tfs = decode_postings(enc)
    n_pos = int(tfs.sum())
    gaps = varint_decode(row["positions"], count=n_pos)
    starts = np.zeros(len(ids), np.int64)
    np.cumsum(tfs[:-1], out=starts[1:])
    cs = np.cumsum(gaps)
    carry = np.where(starts > 0, cs[starts - 1], 0)
    pos = cs - np.repeat(carry, tfs)
    return ids, pos, tfs


def _phrase_part(index_dir: str, part_dir: str,
                 terms: list[str]) -> pa.Table:
    import os

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "n_matches": pa.array([], pa.int64())})
    path = os.path.join(index_dir, part_dir, "postings.parquet")
    uniq = sorted(set(terms))
    t = pq.read_table(path, filters=pads.field("term").isin(uniq))
    if t.num_rows < len(uniq):
        return empty  # a phrase term is absent from this partition
    if "positions" not in t.column_names:
        raise ValueError(
            "index lacks positional postings — build with "
            "IndexBuildConfig(store_positions=True)")
    rows = {r["term"]: r for r in t.to_pylist()}
    decoded = {term: _decode_term_row(rows[term]) for term in uniq}
    # AND-intersect the candidate doc set first (rarest term would go first
    # in a cost-based version; m is tiny).  Candidates give every slot a
    # SHARED compact rank space so (doc, pos) packs into one int64 key.
    cand: np.ndarray | None = None
    for term in uniq:
        ids = decoded[term][0]
        cand = ids if cand is None else np.intersect1d(
            cand, ids, assume_unique=True)
    if cand is None or not len(cand):
        return empty
    # slot j contributes keys cand_rank*2^32 + (pos - j); a phrase start p
    # in doc d survives iff (d, p) is in EVERY slot's key set
    inter: np.ndarray | None = None
    for j, term in enumerate(terms):
        ids, pos, tfs = decoded[term]
        doc_of = np.repeat(ids, tfs)
        ridx = np.searchsorted(cand, doc_of)
        ridx[ridx >= len(cand)] = 0
        keep = (cand[ridx] == doc_of) & (pos >= j)
        keys = (ridx[keep] << np.int64(32)) | (pos[keep] - j)
        keys.sort()
        inter = keys if inter is None else np.intersect1d(
            inter, keys, assume_unique=True)
        if not len(inter):
            return empty
    ranks = (inter >> np.int64(32)).astype(np.int64)
    uniq_ranks, counts = np.unique(ranks, return_counts=True)
    return pa.table({
        "doc_id": pa.array(cand[uniq_ranks], pa.int64()),
        "n_matches": pa.array(counts.astype(np.int64), pa.int64()),
    })


def phrase_search(index_dir: str, phrase: list[str] | str, *,
                  morphology: str = "simple") -> rd.Dataset:
    """Index-backed phrase query over positional postings (one Ray task per
    partition; parts hold disjoint documents, so results just concatenate).
    ``morphology`` must match the index build's.  Each task reads ONLY the
    phrase terms' rows (parquet row-group pruning on the term-sorted
    segment), so cost is O(sum df of the phrase terms), not corpus size."""
    import glob
    import os

    terms = normalize_phrase(phrase, morphology)
    if not terms:
        raise ValueError("phrase normalizes to no terms")
    parts = sorted(os.path.basename(p) for p in
                   glob.glob(os.path.join(index_dir, "part=*")))

    def run(batch: pa.Table) -> pa.Table:
        outs = [_phrase_part(index_dir, p, terms)
                for p in batch["part_dir"].to_pylist()]
        return pa.concat_tables(outs)

    return rd.from_arrow(pa.table({"part_dir": pa.array(parts)})) \
        .repartition(max(1, len(parts))) \
        .map_batches(run, batch_format="pyarrow")


def phrase_counts(docs: rd.Dataset, phrase: list[str] | str, *,
                  morphology: str = "simple", text_column: str = "text",
                  id_column: str = "doc_id",
                  concurrency=(1, 8)) -> rd.Dataset:
    """(doc_id, n_matches) for documents containing the phrase (see
    module doc).  One actor-pool ``map_batches`` pass, zero shuffle."""
    terms = normalize_phrase(phrase, morphology)
    return docs.map_batches(
        PhraseCounter,
        fn_constructor_kwargs={"phrase": terms, "morphology": morphology,
                               "text_column": text_column,
                               "id_column": id_column},
        batch_format="pyarrow", concurrency=concurrency)
