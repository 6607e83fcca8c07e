"""Lemmatizer stage — the stateful actor-pool transform (reference ST1).

Re-expresses ``LemmasFinder.findLemmas`` (``services/LemmasFinder.java:31-46``):
text -> tokens (tokenize.py, reference ``getWords``) -> stop/POS filter +
normal form (morphology.py, ``isFittingWord``/``getNormalWord``) -> per-doc
term-frequency map (reference's ``HashMap<String,Integer>``, A1).

Shape choice for scale: ONE output row per document with parallel
``terms:list<string>`` / ``tfs:list<int32>`` list columns instead of an
exploded (term, doc, tf) row table — the explode happens vectorized inside
the per-partition segment build (pyarrow ``flatten`` + ``np.repeat``), so the
only shuffle of the whole pipeline moves compact per-doc rows, not one row
per posting.

The morphology provider (dictionary tables + memo cache) is built once per
actor in ``__init__`` — pass this CLASS to ``map_batches(..., concurrency=N)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.morphology import get_morphology
from ..functions.tokenize import SPLIT_RE, TOKEN_RE


class Lemmatizer:
    """Callable-class stage: ``map_batches(Lemmatizer, fn_constructor_kwargs=
    {'morphology': 'default'}, concurrency=..., batch_format='pyarrow')``.

    Fully vectorized: lowercase/split/clean run as Arrow C++ kernels
    (``utf8_lower`` / ``split_pattern_regex`` / RE2 ``extract_regex`` with the
    exact TOKEN_RE), and the Python morphology function touches only the
    batch's UNIQUE surface forms (dictionary-encode first; term frequency is
    zipfian, so uniques are a tiny fraction of the stream and the per-actor
    memo cache makes repeat batches near-free).  Per-doc TF maps are one
    ``np.unique`` over ``doc_idx * V + term_id`` keys — no Python per token.
    """

    def __init__(self, morphology: str = "default", text_column: str = "text_x",
                 drop_text: bool = False,
                 store_positions: bool = False) -> None:
        self.morph = get_morphology(morphology)
        self.text_column = text_column
        self.drop_text = drop_text
        self.store_positions = store_positions

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_docs = batch.num_rows
        texts = batch[self.text_column]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()

        # --- tokenize (Arrow kernels; semantics == tokenize.tokenize) -----
        lower = pc.utf8_lower(texts)
        # ascii_split_whitespace splits on exactly SPLIT_RE's class
        # ([ \t\n\x0b\f\r]+, Java ASCII \s) and is ~6x cheaper than the RE2
        # split kernel in a single-threaded Ray worker
        toks = pc.ascii_split_whitespace(lower)
        lens = pc.fill_null(pc.list_value_length(toks), 0).to_numpy() \
            .astype(np.int64)
        flat = pc.list_flatten(toks)  # null-text docs contribute 0 tokens
        # anchored clean/trim: non-matching raw tokens -> null (dropped),
        # exactly the reference's keep-iff-fully-matches rule.  Fast path:
        # ~99% of lowercased tokens are already a bare word ([а-яёa-z]+ —
        # TOKEN_RE maps those to themselves), so the expensive capture-group
        # extract runs only on the remainder (5x cheaper end-to-end).
        simple = pc.match_substring_regex(flat, r"^[а-яёa-z]+$")
        rest = pc.invert(simple)
        if pc.any(rest).as_py():
            rest_words = pc.struct_field(
                pc.extract_regex(flat.filter(rest), pattern=TOKEN_RE.pattern),
                "word")
            words = pc.replace_with_mask(flat, rest, rest_words)
        else:
            words = flat

        # --- normalize unique surface forms only --------------------------
        enc = words.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        surface = enc.dictionary.to_pylist()
        normal = self.morph.normal_word
        normed = [normal(s) for s in surface]

        # batch vocabulary, sorted so term ids sort == lexicographic sort
        vocab = sorted({t for t in normed if t})
        vid = {t: i for i, t in enumerate(vocab)}
        dict_to_vid = np.array([vid.get(t, -1) for t in normed], np.int64) \
            if normed else np.empty(0, np.int64)

        idx = enc.indices.to_numpy(zero_copy_only=False)  # float w/ nan if null
        valid = ~np.isnan(idx) if idx.dtype.kind == "f" else np.ones(len(idx), bool)
        tid = np.full(len(idx), -1, np.int64)
        if len(idx):
            tid[valid] = dict_to_vid[idx[valid].astype(np.int64)]
        keep = tid >= 0

        # --- per-doc TF: one np.unique over combined keys -----------------
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)[keep]
        v = max(1, len(vocab))
        uk, counts = np.unique(doc_idx * v + tid[keep], return_counts=True)
        d_of = uk // v
        t_of = uk % v

        per_doc = np.bincount(d_of, minlength=n_docs).astype(np.int64)
        offsets = np.zeros(n_docs + 1, np.int64)
        np.cumsum(per_doc, out=offsets[1:])
        vocab_arr = pa.array(vocab, pa.string())
        terms_list = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()).cast(pa.int32()),
            vocab_arr.take(pa.array(t_of, pa.int64())) if len(uk)
            else pa.array([], pa.string()))
        tfs_list = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()).cast(pa.int32()),
            pa.array(counts.astype(np.int32), pa.int32()) if len(uk)
            else pa.array([], pa.int32()))
        doc_len = np.bincount(d_of, weights=counts, minlength=n_docs) \
            .astype(np.int32)

        out = batch
        if self.drop_text:
            out = out.drop_columns([self.text_column])
        out = out.append_column("terms", terms_list)
        out = out.append_column("tfs", tfs_list)
        out = out.append_column("doc_len", pa.array(doc_len, pa.int32()))
        if self.store_positions:
            out = out.append_column(
                "poss", self._positions_list(doc_idx, tid[keep], v, offsets,
                                             n_docs))
        return out

    @staticmethod
    def _positions_list(doc_idx: np.ndarray, tid_kept: np.ndarray, v: int,
                        offsets: np.ndarray, n_docs: int) -> pa.ListArray:
        """``poss: list<binary>`` aligned with ``terms``: per (doc, term) the
        0-based positions in the doc's kept-token stream, delta-encoded
        (first value absolute) and varint-packed.

        Fully vectorized: positions come from one bincount/cumsum, the
        (doc, term) grouping from one stable argsort over the same combined
        key ``np.unique`` sorts by (so group order matches ``terms``), and
        the whole batch's varints are encoded in ONE call — the per-group
        binary values are zero-copy slices of that single buffer via a
        ``BinaryArray.from_buffers`` offsets vector.
        """
        from ..functions.codec import varint_encode_with_lengths

        n_kept = len(doc_idx)
        kcounts = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
        kstarts = np.zeros(n_docs, np.int64)
        np.cumsum(kcounts[:-1], out=kstarts[1:])
        pos = np.arange(n_kept, dtype=np.int64) - kstarts[doc_idx]
        key = doc_idx * v + tid_kept
        order = np.argsort(key, kind="stable")  # within group: pos ascending
        skey = key[order]
        spos = pos[order]
        gstarts = np.concatenate(([0], np.flatnonzero(np.diff(skey)) + 1)) \
            if n_kept else np.empty(0, np.int64)
        gaps = spos.copy()
        if n_kept:
            gaps[1:] -= spos[:-1]
            gaps[gstarts] = spos[gstarts]
        buf, lens_b = varint_encode_with_lengths(gaps)
        cum = np.concatenate(([0], np.cumsum(lens_b)))
        byte_offsets = np.concatenate(
            (cum[gstarts], [cum[-1]])).astype(np.int32)
        n_groups = len(gstarts)
        bin_arr = pa.BinaryArray.from_buffers(
            pa.binary(), n_groups,
            [None, pa.py_buffer(byte_offsets.tobytes()),
             pa.py_buffer(bytes(buf))])
        return pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()).cast(pa.int32()), bin_arr)


def lemmas_of_query(query: str, morphology: str = "default") -> list[str]:
    """Query -> ordered distinct lemma list (reference M11: the keySet of the
    query's TF map, ``SearchServiceImpl.java:101-102,118-119``).  Driver-side
    scalar helper — a single query needs no Dataset."""
    morph = get_morphology(morphology)
    seen: dict[str, None] = {}
    for raw in SPLIT_RE.split(query.lower()):
        if not raw:
            continue
        m = TOKEN_RE.match(raw)
        if m is None:
            continue
        term = morph.normal_word(m.group("word"))
        if term:
            seen.setdefault(term, None)
    return list(seen)
