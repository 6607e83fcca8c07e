"""End-to-end training-data curation pipeline.

Composes the engine's text-curation stages into the shape a real LLM
data-prep run takes over raw documents:

    quality gate  ->  language filter  ->  exact dedup (keep first)
                  ->  PII scrub        ->  token accounting

Every rule is frozen and integer/verbatim-string valued so the whole
composition is value-checkable against one DuckDB SQL statement
(``__ray_entry__.oracle_sql()['curate_corpus']``).

Scale notes (100 TB):

- The gate runs BEFORE the dedup shuffle: one streaming ``map_batches``
  pass computes tokens, language and content hash together, and drops
  rejected docs inside the batch — only survivors' bytes enter the
  exchange.  On web text the gate typically removes 20–60 % of input,
  so this ordering halves shuffle volume for free.
- Exact dedup must co-locate identical texts once; that is ONE
  hash-partitioned exchange of the surviving text (``groupby`` on the
  16-byte md5).  There is no cheaper exact plan: any winner-list
  scheme still has to move either the text or the winner ids through
  a second exchange of the same cardinality.
- PII scrub and token accounting are stateless per-batch Arrow kernels
  downstream of the dedup — they stream, nothing materializes.

Reference analogue: the reference curates at crawl time (dedup
``PageAnalyzer.java:398-447``, cleanup on ingest); this pipeline is the
batch re-expression over an already-fetched corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.textstats import (QUALITY_STOPWORDS, _BPE_CHUNK, _TOKEN_RE,
                                   content_hash_batch)
from ..stages.cleaning import PII_EMAIL_RE, PII_IPV4_RE, PII_PHONE_RE

__all__ = ["curate_corpus"]


def _gate_batch(batch: pa.Table, *, min_tokens: int,
                stop_per_50: int) -> pa.Table:
    """Single-pass gate: token/stopword/subword accounting + charset
    language id + content hash, then the keep-filter applied in-batch.

    Emits (doc_id, text, content_hash, n_tokens, n_subwords) for the
    survivors only — rejected docs never leave the reading task.
    """
    texts = batch["text"].to_pylist()
    stop = set(QUALITY_STOPWORDS)
    n_tokens = np.empty(len(texts), np.int64)
    n_stop = np.empty(len(texts), np.int64)
    n_sub = np.empty(len(texts), np.int64)
    for i, t in enumerate(texts):
        toks = _TOKEN_RE.findall((t or "").lower())
        n_tokens[i] = len(toks)
        n_stop[i] = sum(1 for w in toks if w in stop)
        n_sub[i] = sum((len(w) + _BPE_CHUNK - 1) // _BPE_CHUNK for w in toks)
    lower = pc.utf8_lower(batch["text"])
    # the frozen charset rule (functions/textstats.langid_batch): docs with
    # any cyrillic are 'ru'; keep = latin-only docs ('en')
    is_en = pc.and_(
        pc.invert(pc.match_substring_regex(lower, "[а-яё]")),
        pc.match_substring_regex(lower, "[a-z]"))
    # integer-form quality predicate: n_tokens >= min AND
    # stop_ratio >= stop_per_50/50 expressed as n_stop*50 >= n_tokens*k
    keep = (is_en.to_numpy(zero_copy_only=False)
            & (n_tokens >= min_tokens)
            & (n_stop * 50 >= n_tokens * stop_per_50))
    out = pa.table({
        "doc_id": batch["doc_id"],
        "text": batch["text"],
        "n_tokens": pa.array(n_tokens, pa.int64()),
        "n_subwords": pa.array(n_sub, pa.int64()),
    }).filter(pa.array(keep))
    return content_hash_batch(out)


def _keep_first(group: pa.Table) -> pa.Table:
    """Per content-hash group: keep the minimum-doc_id row (deterministic
    winner, same rule as stages/dedup.exact_duplicates)."""
    if len(group) == 0:
        return group.drop_columns(["content_hash"])
    ids = group["doc_id"].to_numpy(zero_copy_only=False)
    return group.take([int(np.argmin(ids))]).drop_columns(["content_hash"])


def curate_corpus(docs: rd.Dataset, *, min_tokens: int = 20,
                  stop_per_50: int = 1) -> rd.Dataset:
    """Curate raw (doc_id, text) into a deduplicated, scrubbed corpus.

    Returns (doc_id, text, n_tokens, n_subwords, n_pii): the PII-redacted
    text plus the ORIGINAL-text token accounting (counts are corpus stats,
    not tokenizer input — redaction placeholders must not distort them)
    and the total redaction count.
    """
    gated = docs.map_batches(
        _gate_batch, batch_format="pyarrow",
        fn_kwargs={"min_tokens": min_tokens, "stop_per_50": stop_per_50})
    unique = gated.groupby("content_hash").map_groups(
        _keep_first, batch_format="pyarrow")

    def _scrub(batch: pa.Table) -> pa.Table:
        # same redaction rules as stages/cleaning.scrub_pii, inlined so the
        # token-accounting columns stream through without a re-join
        text = batch["text"]
        n_pii = pc.add(
            pc.add(pc.count_substring_regex(text, PII_EMAIL_RE),
                   pc.count_substring_regex(text, PII_IPV4_RE)),
            pc.count_substring_regex(text, PII_PHONE_RE)).cast(pa.int64())
        out = pc.replace_substring_regex(text, PII_EMAIL_RE, "<EMAIL>")
        out = pc.replace_substring_regex(out, PII_IPV4_RE, "<IP>")
        out = pc.replace_substring_regex(out, PII_PHONE_RE, "<PHONE>")
        return pa.table({
            "doc_id": batch["doc_id"],
            "text": out,
            "n_tokens": batch["n_tokens"],
            "n_subwords": batch["n_subwords"],
            "n_pii": n_pii,
        })

    return unique.map_batches(_scrub, batch_format="pyarrow")
