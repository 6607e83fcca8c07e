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

import pyarrow as pa

from ..functions.morphology import get_morphology
from ..functions.tokenize import SPLIT_RE, TOKEN_RE


class Lemmatizer:
    """Callable-class stage: ``map_batches(Lemmatizer, fn_constructor_kwargs=
    {'morphology': 'default'}, concurrency=..., batch_format='pyarrow')``."""

    def __init__(self, morphology: str = "default", text_column: str = "text_x",
                 drop_text: bool = False) -> None:
        self.morph = get_morphology(morphology)
        self.text_column = text_column
        self.drop_text = drop_text

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_column].to_pylist()
        normal = self.morph.normal_word
        split = SPLIT_RE.split
        match = TOKEN_RE.match

        terms_col: list[list[str]] = []
        tfs_col: list[list[int]] = []
        doc_lens: list[int] = []
        for text in texts:
            counts: dict[str, int] = {}
            if text:
                for raw in split(text.lower()):
                    if not raw:
                        continue
                    m = match(raw)
                    if m is None:
                        continue
                    term = normal(m.group("word"))
                    if term:
                        counts[term] = counts.get(term, 0) + 1
            # deterministic term order within the doc row
            terms = sorted(counts)
            terms_col.append(terms)
            tfs_col.append([counts[t] for t in terms])
            doc_lens.append(sum(counts.values()))

        out = batch
        if self.drop_text:
            out = out.drop_columns([self.text_column])
        out = out.append_column("terms", pa.array(terms_col, pa.list_(pa.string())))
        out = out.append_column("tfs", pa.array(tfs_col, pa.list_(pa.int32())))
        out = out.append_column("doc_len", pa.array(doc_lens, pa.int32()))
        return out


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
