"""LM-flavored corpus operators (stages/lm.py) and corpus-internal
duplicate-n-gram stats (stages/contamination.py)."""

import math

import numpy as np
import pyarrow as pa
import ray.data as rd

from search_engine_ray.stages.contamination import duplicate_ngram_stats
from search_engine_ray.stages.lm import (BpeEncoder, bpe_encode, train_bpe,
                                         unigram_logprob_stats,
                                         word_frequencies)


def _docs():
    return pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumps over a sleeping cat",
            "completely different text here",
            "",
        ])})


# --------------------------------------------------------------------------
# duplicate n-grams
# --------------------------------------------------------------------------

def test_duplicate_ngram_stats(ray_session):
    out = duplicate_ngram_stats(rd.from_arrow(_docs()), n=5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # docs 1/2 share the 5-grams starting at 'the','quick' ("the quick brown
    # fox jumps", "quick brown fox jumps over"); the rest diverge
    assert out.n_grams.tolist() == [5, 5, 0, 0]
    assert out.n_dup_grams.tolist() == [2, 2, 0, 0]
    assert out.dup_gram_frac.tolist() == [0.4, 0.4, 0.0, 0.0]


def test_duplicate_ngram_shuffle_fallback_matches_broadcast(ray_session):
    """Guard trip (max_broadcast=1) switches to the hash-partitioned
    semi-join plan instead of raising — output identical to broadcast."""
    ds = rd.from_arrow(_docs()).repartition(3)

    def canon(d):
        return d.sort_values("doc_id").reset_index(drop=True)

    bcast = canon(duplicate_ngram_stats(ds, n=5).to_pandas())
    assert bcast.equals(canon(
        duplicate_ngram_stats(ds, n=5, force_shuffle=True).to_pandas()))
    assert bcast.equals(canon(
        duplicate_ngram_stats(ds, n=5, max_broadcast=1).to_pandas()))


def test_unigram_and_tfidf_shuffle_fallbacks(ray_session):
    from search_engine_ray.stages.lm import tfidf_topk_terms

    ds = rd.from_arrow(_docs()).repartition(3)

    def canon(d, cols):
        return d.sort_values(cols).reset_index(drop=True)

    u_b = canon(unigram_logprob_stats(ds).to_pandas(), ["doc_id"])
    u_s = canon(unigram_logprob_stats(ds, max_broadcast=1).to_pandas(),
                ["doc_id"])
    assert u_b.equals(u_s)

    t_b = canon(tfidf_topk_terms(ds, k=3).to_pandas(), ["doc_id", "rank"])
    t_s = canon(tfidf_topk_terms(ds, k=3, max_broadcast=1).to_pandas(),
                ["doc_id", "rank"])
    assert t_b.equals(t_s)


def test_duplicate_ngram_within_doc_repeat_not_dup(ray_session):
    # a gram repeated only WITHIN one doc has document-frequency 1
    docs = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["a b c a b c a b c"])})
    out = duplicate_ngram_stats(rd.from_arrow(docs), n=3).to_pandas()
    assert out.n_grams.tolist() == [7]
    assert out.n_dup_grams.tolist() == [0]


# --------------------------------------------------------------------------
# unigram LM scoring
# --------------------------------------------------------------------------

def test_unigram_logprob_matches_reference(ray_session):
    docs = _docs()
    out = unigram_logprob_stats(rd.from_arrow(docs)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    # brute-force reference
    texts = docs["text"].to_pylist()
    toks = [t.lower().split() for t in texts]
    from collections import Counter
    counts = Counter(w for ts in toks for w in ts)
    total = sum(counts.values())
    q = {w: math.floor(math.log(c / total) * 1e4 + 0.5)
         for w, c in counts.items()}
    exp_sum = [sum(q[w] for w in ts) for ts in toks]
    exp_n = [len(ts) for ts in toks]
    assert out.n_tokens.tolist() == exp_n
    assert out.sum_logp_q.tolist() == exp_sum
    # ppl of the empty doc is 0.0 by contract; others positive
    assert out.ppl.tolist()[3] == 0.0
    assert all(p > 1.0 for p in out.ppl.tolist()[:3])
    # repeated tokens ('the' twice in doc 1) make doc 1 lower-ppl than doc 3
    assert out.ppl[0] < out.ppl[2]


# --------------------------------------------------------------------------
# BPE
# --------------------------------------------------------------------------

def _ref_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Reference encoder: apply merges strictly in learned order."""
    syms = list(word) + ["</w>"]
    for a, b in merges:
        out = []
        j = 0
        while j < len(syms):
            if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                out.append(a + b)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    return syms


def test_train_bpe_classic_example():
    # Sennrich et al. example shape: 'low' family
    freq = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe(freq, num_merges=4)
    assert merges[0] == ("e", "s")       # 9 occurrences
    assert merges[1] == ("es", "t")      # 9
    assert merges[2] == ("est", "</w>")  # 9
    assert merges[3] == ("l", "o")       # 7
    # deterministic: same input -> same merges
    assert train_bpe(freq, num_merges=4) == merges


def test_bpe_encoder_matches_reference_order():
    freq = {"hello": 4, "help": 3, "hell": 2, "yellow": 2}
    merges = train_bpe(freq, num_merges=6)
    enc = BpeEncoder(merges)
    for w in freq:
        assert enc._encode_word(w) == _ref_encode(w, merges), w
    # unseen word still encodes (falls back to chars + learned merges)
    assert enc._encode_word("hero") == _ref_encode("hero", merges)


def test_bpe_encode_pipeline(ray_session):
    docs = _docs()
    wf = word_frequencies(rd.from_arrow(docs))
    assert wf["the"] == 3 and wf["quick"] == 2
    merges = train_bpe(wf, num_merges=20)
    out = bpe_encode(rd.from_arrow(docs), merges, concurrency=2) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out.n_words.tolist() == [9, 9, 4, 0]
    # every word encodes to >= 1 token; empty doc encodes to 0
    assert out.n_bpe_tokens.tolist()[3] == 0
    assert (out.n_bpe_tokens[:3] >= out.n_words[:3]).all()
    # token totals match per-word reference encoding
    enc = BpeEncoder(merges)
    import re
    for i, t in enumerate(docs["text"].to_pylist()):
        ws = re.findall(r"[a-z]+", t.lower())
        assert out.n_bpe_tokens[i] == sum(len(enc._encode_word(w)) for w in ws)


def test_tfidf_topk_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd

    from search_engine_ray.stages.lm import tfidf_topk_terms

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["the cat sat on the mat",
                 "the dog ate the cat food",
                 "quantum flux capacitors hum quietly",
                 ""],
    })
    tbl = pa.Table.from_pandas(docs, preserve_index=False)
    out = tfidf_topk_terms(rd.from_arrow(tbl).repartition(3), k=3) \
        .to_pandas().sort_values(["doc_id", "rank"]).reset_index(drop=True)
    exp = duckdb.sql("""
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
            FROM docs),
        tf AS (SELECT doc_id, term, COUNT(*)::BIGINT AS tf
               FROM toks GROUP BY doc_id, term),
        df AS (SELECT term, COUNT(DISTINCT doc_id)::BIGINT AS df
               FROM toks GROUP BY term),
        n AS (SELECT COUNT(*)::BIGINT AS n FROM docs),
        s AS (SELECT t.doc_id, t.term,
                     t.tf * CAST(floor(ln(CAST(n.n AS DOUBLE) / df.df)
                                       * 10000 + 0.5) AS BIGINT) AS score_q
              FROM tf t JOIN df USING (term), n),
        r AS (SELECT doc_id, term, score_q,
                     ROW_NUMBER() OVER (PARTITION BY doc_id
                                        ORDER BY score_q DESC, term) AS rank
              FROM s)
        SELECT doc_id, term, score_q, rank::BIGINT AS rank
        FROM r WHERE rank <= 3 ORDER BY doc_id, rank
    """).df()
    assert out.doc_id.tolist() == exp.doc_id.tolist()
    assert out.term.tolist() == exp.term.tolist()
    assert out.score_q.tolist() == exp.score_q.tolist()
    assert out["rank"].tolist() == exp["rank"].tolist()
    # parallelism invariance
    out1 = tfidf_topk_terms(rd.from_arrow(tbl).repartition(1), k=3) \
        .to_pandas().sort_values(["doc_id", "rank"]).reset_index(drop=True)
    assert out.equals(out1)
