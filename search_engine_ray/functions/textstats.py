"""Text analysis kernels for training-data pipelines.

Language-ID (charset heuristic), quality metrics (length / token /
stopword-ratio), token counting and document fingerprinting — each defined by
a frozen, SQL-mirrorable rule so the driver's DuckDB oracle can verify the
Ray pipeline value-for-value (see ``__ray_entry__.oracle_sql``).

All batch functions are ``map_batches(fn, batch_format="pyarrow")`` bodies:
vectorized where a kernel exists, tight per-row loops (compiled regex, no
allocation churn) where not.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# frozen EN stop list for the quality metric (intentionally small and SQL-
# inlineable — distinct from morphology.EN_STOPWORDS which models POS classes)
QUALITY_STOPWORDS = ("the", "a", "an", "and", "or", "of", "in", "on", "at",
                     "to", "is", "was", "it", "for", "with", "as", "by")

_TOKEN_RE = re.compile(r"[a-z]+")
_WS_RE = re.compile(r"[ \t\n\r]+")


def langid_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Charset-rule language ID: cyrillic -> ru, latin -> en, else other.

    (The frozen oracle rule; a real pipeline would swap in an n-gram model —
    the provider seam is the same ``map_batches`` stage.)
    """
    lower = pc.utf8_lower(batch[text_col])
    is_ru = pc.match_substring_regex(lower, "[а-яё]")
    is_en = pc.match_substring_regex(lower, "[a-z]")
    lang = pc.if_else(is_ru, pa.scalar("ru"),
                      pc.if_else(is_en, pa.scalar("en"), pa.scalar("other")))
    return batch.append_column("lang_id", lang)


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc quality metrics: n_chars, n_tokens, n_letters, n_uniq_tokens,
    stop_ratio (QUALITY_STOPWORDS share of tokens; 0.0 for empty docs)."""
    texts = batch[text_col].to_pylist()
    stop = set(QUALITY_STOPWORDS)
    n_tokens = np.empty(len(texts), np.int64)
    n_letters = np.empty(len(texts), np.int64)
    n_uniq = np.empty(len(texts), np.int64)
    stop_ratio = np.empty(len(texts), np.float64)
    for i, t in enumerate(texts):
        toks = _TOKEN_RE.findall((t or "").lower())
        n_tokens[i] = len(toks)
        n_letters[i] = sum(map(len, toks))
        n_uniq[i] = len(set(toks))
        stop_ratio[i] = (sum(1 for w in toks if w in stop) / len(toks)) if toks else 0.0
    out = batch.append_column("n_chars", pc.utf8_length(batch[text_col]).cast(pa.int64()))
    out = out.append_column("n_tokens", pa.array(n_tokens))
    out = out.append_column("n_letters", pa.array(n_letters))
    out = out.append_column("n_uniq_tokens", pa.array(n_uniq))
    out = out.append_column("stop_ratio", pa.array(stop_ratio))
    return out


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministic content fingerprint: md5 of the whitespace-normalized
    lowercased text (matches DuckDB ``md5(trim(regexp_replace(...)))``)."""
    texts = batch[text_col].to_pylist()
    fps = [hashlib.md5(_WS_RE.sub(" ", (t or "").lower()).strip().encode()).hexdigest()
           for t in texts]
    return batch.append_column("fingerprint", pa.array(fps, pa.string()))


def content_hash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Exact-dedup key: md5 of the raw text (DuckDB ``md5(text)``)."""
    texts = batch[text_col].to_pylist()
    hs = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
    return batch.append_column("content_hash", pa.array(hs, pa.string()))


# BPE-ish subword counting: words, then greedy fixed-size chunks of long
# words (a deterministic stand-in for a learned BPE vocab — no tokenizer
# libs in this environment).  chunk==4 chars; a w-char word contributes
# ceil(len/4) subword tokens.  Exactly mirrorable in SQL.
_BPE_CHUNK = 4


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """(n_words, n_subwords) per doc: whitespace-ish word split via the
    [a-z]+ scan, plus the BPE-ish subword count."""
    n_words, n_sub = [], []
    for t in batch[text_col].to_pylist():
        toks = _TOKEN_RE.findall((t or "").lower())
        n_words.append(len(toks))
        n_sub.append(sum((len(w) + _BPE_CHUNK - 1) // _BPE_CHUNK for w in toks))
    out = batch.drop_columns([text_col])
    out = out.append_column("n_words", pa.array(n_words, pa.int64()))
    out = out.append_column("n_subwords", pa.array(n_sub, pa.int64()))
    return out


def compression_ratio_batch(batch: pa.Table, text_col: str = "text",
                            level: int = 6) -> pa.Table:
    """zlib compression-ratio quality signal (the Gopher-family proxy:
    highly repetitive boilerplate compresses far below natural prose).
    Output per doc: utf-8 byte length, zlib-compressed length at the
    frozen ``level``, and ``ratio_q = floor(n_comp * 10000 / max(n, 1))``
    — an exact integer given the bytes, but the bytes depend on the
    zlib build, so this operator is pytest-gated (property: repetitive
    << natural << random), not SQL-oracled.  Stateless, vectorizes at
    the document level (zlib is per-payload C code)."""
    import zlib

    ids = batch["doc_id"]
    n_raw, n_comp = [], []
    for t in batch[text_col].to_pylist():
        b = (t or "").encode()
        n_raw.append(len(b))
        n_comp.append(len(zlib.compress(b, level)))
    n = np.maximum(np.array(n_raw, np.int64), 1)
    c = np.array(n_comp, np.int64)
    return pa.table({
        "doc_id": ids,
        "n_bytes": pa.array(n_raw, pa.int64()),
        "n_compressed": pa.array(c, pa.int64()),
        "ratio_q": pa.array(c * 10_000 // n, pa.int64()),
    })
