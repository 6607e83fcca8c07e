"""Round-5 operator tests: ExactSubstr duplicated-span stats
(stages/dedup.py substring_dedup_stats, Lee et al. 2022)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd


def _brute_span_stats(texts: dict[int, str], k: int) -> dict[int, tuple]:
    """Reference implementation with TRUE substrings and a per-position
    boolean mask — no fingerprints, no interval arithmetic."""
    from collections import Counter

    occ = Counter()
    for t in texts.values():
        for i in range(len(t) - k + 1):
            occ[t[i:i + k]] += 1
    out = {}
    for d, t in texts.items():
        L = len(t)
        starts = [i for i in range(L - k + 1) if occ[t[i:i + k]] >= 2]
        mask = np.zeros(L, bool)
        for s in starts:
            mask[s:s + k] = True
        n_masked = int(mask.sum())
        # maximal contiguous masked regions
        n_spans = int(np.sum(np.diff(np.concatenate(
            [[0], mask.view(np.int8)])) == 1))
        out[d] = (L, max(L - k + 1, 0), len(starts), n_spans, n_masked)
    return out


CORPUS = {
    1: "the quick brown fox jumps over the lazy dog again and again",
    2: "a totally unique line with no repeats whatsoever here",
    3: "the quick brown fox naps; the quick brown fox naps once more",
    4: "short",                                  # < k: zero windows
    5: "xyxyxyxyxyxyxyxyxyxyxyxyxy",             # self-repetition only
    6: "jumps over the lazy dog again and then jumps over the lazy dog",
    7: "ünïcödé text with ünïcödé repetition ünïcödé text with stuff",
}


def _run(ds_rows, k, **kw):
    from search_engine_ray.stages.dedup import substring_dedup_stats

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(ds_rows), pa.int64()),
        "text": pa.array([ds_rows[d] for d in ds_rows], pa.string())}))
    t = pa.Table.from_pylist(substring_dedup_stats(ds, k=k, **kw).take_all())
    return {r["doc_id"]: (r["n_chars"], r["n_windows"], r["n_dup_starts"],
                          r["n_spans"], r["n_masked"])
            for r in t.to_pylist()}


@pytest.mark.parametrize("k", [5, 15])
def test_substring_dedup_matches_bruteforce(ray_session, k):
    """Engine output == per-position boolean-mask reference: duplicated
    windows across docs AND within one doc, overlapping/touching span
    union, sub-k docs, non-ASCII codepoints (char semantics, not bytes)."""
    assert _run(CORPUS, k) == _brute_span_stats(CORPUS, k)


def test_substring_dedup_shuffle_plan_parity(ray_session):
    """The no-broadcast (semi-join + per-group union) plan returns the
    same rows as the broadcast plan."""
    a = _run(CORPUS, 15)
    b = _run(CORPUS, 15, force_shuffle=True)
    assert a == b


def test_substring_dedup_clean_text(ray_session):
    """emit_text=True removes exactly the masked characters, in order
    (per-position boolean-mask reference), including non-ASCII docs and
    the fully-duplicated doc (empty result)."""
    from collections import Counter

    from search_engine_ray.stages.dedup import substring_dedup_stats

    k = 15
    occ = Counter()
    for t in CORPUS.values():
        for i in range(len(t) - k + 1):
            occ[t[i:i + k]] += 1
    expect = {}
    for d, t in CORPUS.items():
        mask = np.zeros(len(t), bool)
        for i in range(len(t) - k + 1):
            if occ[t[i:i + k]] >= 2:
                mask[i:i + k] = True
        expect[d] = "".join(c for c, m in zip(t, mask) if not m)

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(CORPUS), pa.int64()),
        "text": pa.array([CORPUS[d] for d in CORPUS], pa.string())}))
    rows = substring_dedup_stats(ds, k=k, emit_text=True).take_all()
    got = {r["doc_id"]: r["clean_text"] for r in rows}
    assert got == expect
    # doc 5 is pure self-repetition: everything masked
    assert got[5] == ""
    with pytest.raises(ValueError, match="broadcast"):
        substring_dedup_stats(ds, k=k, emit_text=True, force_shuffle=True)


def test_substring_dedup_random_fuzz(ray_session):
    """Randomized corpora over a tiny alphabet (dense collisions, heavy
    overlap, empty docs) vs the boolean-mask reference, k in {3, 5, 8} —
    guards the reduceat interval-union arithmetic's edge cases."""
    rng = np.random.default_rng(57)
    for trial in range(4):
        k = int(rng.choice([3, 5, 8]))
        texts = {}
        for d in range(12):
            L = int(rng.integers(0, 60))
            texts[d] = "".join(chr(97 + c) for c in rng.integers(0, 3, L))
        assert _run(texts, k) == _brute_span_stats(texts, k), (trial, k)


def test_proximity_counter_slop_boundary(ray_session):
    """NEAR/k pair counts: boundary inclusion at exactly slop, unordered
    (b before a counts), multiple pairs per doc, cross-doc isolation."""
    from search_engine_ray.pipelines.phrase import ProximityCounter

    docs = {
        1: "alpha x x beta",            # dist 3 == slop -> 1 pair
        2: "alpha x x x beta",          # dist 4 > slop -> 0
        3: "beta alpha",                # unordered, dist 1 -> 1
        4: "alpha beta alpha",          # pairs (0,1), (2,1) -> 2
        5: "alpha one two",             # no beta -> absent
    }
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()), pa.string())}))
    rows = ds.map_batches(
        ProximityCounter,
        fn_constructor_kwargs={"term_a": "alpha", "term_b": "beta",
                               "slop": 3},
        batch_format="pyarrow", concurrency=1).take_all()
    got = {r["doc_id"]: r["n_pairs"] for r in rows}
    assert got == {1: 1, 3: 1, 4: 2}


def test_ngram_containment_finds_subset(ray_session):
    """Containment (|A∩B| / min) catches a small doc embedded in a much
    larger one that symmetric Jaccard misses at the same threshold."""
    from search_engine_ray.stages.dedup import (ngram_containment_pairs,
                                                ngram_jaccard_pairs)

    small = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    big = filler + " " + small + " " + " ".join(
        f"p{i} q{i} r{i}" for i in range(40))
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([small, big], pa.string())}))
    cont = ngram_containment_pairs(ds, n=3, threshold=0.8,
                                   max_shingle_df=50).take_all()
    assert [(r["doc_a"], r["doc_b"]) for r in cont] == [(1, 2)]
    assert cont[0]["containment"] == 1.0          # fully contained
    jac = ngram_jaccard_pairs(ds, n=3, threshold=0.8,
                              max_shingle_df=50).take_all()
    assert jac == []                              # Jaccard blind to subsets


def test_substring_dedup_all_unique(ray_session):
    """A corpus with no duplicated window yields all-zero stats rows."""
    rng = np.random.default_rng(41)
    texts = {i: "".join(chr(97 + c) for c in rng.integers(0, 26, 40))
             for i in range(5)}
    got = _run(texts, 15)
    for d, t in texts.items():
        assert got[d] == (len(t), max(len(t) - 14, 0), 0, 0, 0)


def test_curate_corpus_end_to_end(ray_session):
    """Gate, language filter, dedup winner, scrub and accounting on a
    corpus built to exercise every branch (the parquet fixtures have no
    exact duplicates, so the dedup arm needs a synthetic witness)."""
    from search_engine_ray.pipelines.curate import curate_corpus

    good = ("the quick brown fox jumps over the lazy dog and then "
            "runs off into the woods to find a meal for the day")
    dup = good                                   # exact copy: loses to id 1
    short = "the cat"                            # fails min_tokens
    nostop = " ".join(f"tok{i}" for i in range(30))  # fails stop gate
    russian = ("съешь же ещё этих мягких французских булок " * 5
               + "and the " * 10)                # cyrillic -> dropped
    pii = good + " mail bob@example.com ip 10.0.0.1 call +1 (555) 123-4567"
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "text": pa.array([good, dup, short, nostop, russian, pii],
                         pa.string()),
    }))
    rows = {r["doc_id"]: r for r in curate_corpus(ds).take_all()}
    assert set(rows) == {1, 6}                   # 2 deduped, 3-5 gated
    assert rows[1]["text"] == good
    assert rows[1]["n_pii"] == 0
    assert rows[6]["n_pii"] == 3
    assert "<EMAIL>" in rows[6]["text"] and "<IP>" in rows[6]["text"] \
        and "<PHONE>" in rows[6]["text"]
    assert "bob@example.com" not in rows[6]["text"]
    n_tok = len(good.split())
    assert rows[1]["n_tokens"] == n_tok
    # subwords: ceil(len/4) per [a-z]+ token of the ORIGINAL text
    assert rows[1]["n_subwords"] == sum(
        (len(w) + 3) // 4 for w in good.split())
