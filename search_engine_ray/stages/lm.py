"""Language-model-flavored corpus operators: unigram-LM scoring and BPE
tokenizer training.

CCNet (Wenzek et al. 2020) filters Common-Crawl text by language-model
perplexity; Gopher/MassiveText and most modern pretraining pipelines keep a
close variant.  The reference engine has no analog (its quality signal is
the rank/relevance pipeline, ``dto/indexing/PageAnalyzer.java``); these are
round-2 scale additions per SURVEY §2.11.

:func:`unigram_logprob_stats` scores every document under the corpus's own
unigram language model — the self-scoring variant keeps the operator closed
(no external model file) while exercising the exact distributed shape of
CCNet scoring: global token-count aggregate, broadcast model, vectorized
per-batch scoring.  Log-probabilities are quantized to integer
deci-milli-nats (``floor(ln(p) * 1e4 + 0.5)``) *per vocabulary entry* so
per-document sums are exact integers — bit-identical between the engine and
the DuckDB oracle regardless of summation order (same trick as the
cent-quantized money columns; see MEMORY: floor(x+0.5) on both sides).

:func:`train_bpe` / :class:`BpeEncoder` implement byte-pair-encoding
tokenizer training the way production trainers do it at scale: the corpus
reduces to an aggregated (word, count) dictionary — the ONLY distributed
step, one groupby whose output is vocabulary-sized, not corpus-sized — and
the merge loop runs on that compressed dictionary (each merge touches only
words containing the pair; cost is O(vocab), independent of corpus size).
Encoding streams through an actor pool whose state (merge ranks) is built
once per actor in ``__init__``; each batch dictionary-encodes to unique
words, encodes each unique word once, and maps back.

Scale shape
-----------
* unigram pass 1 pre-aggregates token counts inside each batch (``np.unique``)
  before the single ``groupby`` — shuffle rows are per-batch-distinct, not
  per-token.  The (hash, count) model is broadcast once (``ray.put``); a
  guard caps it (default 50M entries = 800 MB) and fails loudly with the
  documented fallback (hash-partition the positional token table and join
  the count table there) rather than silently OOMing.
* BPE's distributed step is the same word-count groupby; the driver-side
  merge loop sees only the aggregated dictionary (capped by ``max_words``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Sum

from .dedup import _WORD_RE
from ..functions.hashing import stable_hash_array

__all__ = ["unigram_logprob_stats", "bigram_logprob_stats", "train_bpe",
           "BpeEncoder", "bpe_encode"]

#: quantization scale for integer log-probs (1e4 = deci-milli-nats)
LOGPROB_QUANT = 1e4


def _token_hashes(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(doc_idx, token_hash) for every token position of the batch, in
    document order.  Tokenization is the frozen ``[a-z]+`` on lowercased
    text — identical to the SQL oracle's ``regexp_extract_all``."""
    toks_per_doc = [_WORD_RE.findall((t or "").lower()) for t in texts]
    lens = np.array([len(t) for t in toks_per_doc], np.int64)
    flat = [t for toks in toks_per_doc for t in toks]
    doc_of = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    if not flat:
        return doc_of, np.empty(0, np.uint64)
    return doc_of, stable_hash_array(flat)


def unigram_logprob_stats(docs: rd.Dataset, *, text_col: str = "text",
                          id_col: str = "doc_id",
                          max_broadcast: int = 50_000_000,
                          force_shuffle: bool = False) -> rd.Dataset:
    """Score every document under the corpus's own unigram LM.

    Output per input document: ``(doc_id, n_tokens, sum_logp_q, ppl)``.
    ``sum_logp_q`` is the int64 sum over token positions of
    ``floor(ln(count(w)/T) * 1e4 + 0.5)`` (quantized once per vocabulary
    entry, so the sum is exact); ``ppl = exp(-sum_logp_q / 1e4 / n_tokens)``
    (0.0 for empty documents).  Every corpus token has count >= 1 — the
    self-scoring model has no OOV path.

    Plan selection: the (hash, count) model broadcasts while it fits a
    worker heap (``max_broadcast``, default 50M entries = 800 MB); beyond
    that (or with ``force_shuffle``) the positional token table
    hash-partitions by token into an inner join against the quantized
    (token, logprob) table, per-doc sums come from one ``groupby(doc_id)``,
    and a doc-keyed left join restores empty documents.  Identical output
    either way (the quantized per-entry integers make sums order-free).
    """
    narrow = docs.select_columns([id_col, text_col])

    def partial_counts(batch: pa.Table) -> pa.Table:
        _, h = _token_hashes(batch[text_col].to_pylist())
        uniq, cnt = np.unique(h, return_counts=True)
        return pa.table({"tok": pa.array(uniq.view(np.int64), pa.int64()),
                         "c": pa.array(cnt.astype(np.int64), pa.int64())})

    vocab = narrow.map_batches(partial_counts, batch_format="pyarrow") \
        .groupby("tok").aggregate(Sum("c", alias_name="c")).materialize()
    if force_shuffle or vocab.count() > max_broadcast:
        return _unigram_stats_shuffle(narrow, vocab, text_col=text_col,
                                      id_col=id_col)
    rows = vocab.take_all()
    hashes = np.array([r["tok"] for r in rows], np.int64).view(np.uint64)
    counts = np.array([r["c"] for r in rows], np.int64)
    order = np.argsort(hashes)
    hashes, counts = hashes[order], counts[order]
    total = int(counts.sum())
    # quantize ONCE per vocab entry: per-doc sums of these ints are exact
    q = np.floor(np.log(counts / total) * LOGPROB_QUANT + 0.5).astype(np.int64)
    model = ray.put((hashes, q))

    def score(batch: pa.Table) -> pa.Table:
        hs, qs = ray.get(model)
        ids = batch[id_col].to_numpy()
        doc_of, h = _token_hashes(batch[text_col].to_pylist())
        pos = np.searchsorted(hs, h)  # every token is in-vocab
        n_tokens = np.bincount(doc_of, minlength=len(ids)).astype(np.int64)
        sum_q = np.zeros(len(ids), np.int64)
        np.add.at(sum_q, doc_of, qs[pos])
        with np.errstate(divide="ignore", invalid="ignore"):
            ppl = np.where(
                n_tokens > 0,
                np.exp(-(sum_q / LOGPROB_QUANT) / np.maximum(n_tokens, 1)),
                0.0)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "sum_logp_q": pa.array(sum_q, pa.int64()),
            "ppl": pa.array(ppl, pa.float64()),
        })

    return narrow.map_batches(score, batch_format="pyarrow")


def _unigram_stats_shuffle(narrow: rd.Dataset, vocab: rd.Dataset, *,
                           text_col: str, id_col: str) -> rd.Dataset:
    """No-broadcast plan for :func:`unigram_logprob_stats` (see its
    docstring)."""
    from ray.data.aggregate import Count

    from .relational import drop_empty_blocks, shuffle_hash_join

    total = int(vocab.aggregate(Sum("c", alias_name="t"))["t"])

    def add_q(batch: pa.Table) -> pa.Table:
        c = batch["c"].to_numpy()
        # same float expression as the broadcast path — bit-identical q
        q = np.floor(np.log(c / total) * LOGPROB_QUANT + 0.5).astype(np.int64)
        return pa.table({"tok": batch["tok"], "q": pa.array(q, pa.int64())})

    vq = drop_empty_blocks(
        vocab.map_batches(add_q, batch_format="pyarrow"),
        empty_schema=pa.schema([("tok", pa.int64()), ("q", pa.int64())]))

    def positions(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        doc_of, h = _token_hashes(batch[text_col].to_pylist())
        return pa.table({id_col: pa.array(ids[doc_of], pa.int64()),
                         "tok": pa.array(h.view(np.int64), pa.int64())})

    joined = shuffle_hash_join(
        narrow.map_batches(positions, batch_format="pyarrow"), vq,
        on=("tok",), how="inner")
    sums = drop_empty_blocks(
        joined.groupby(id_col).aggregate(
            Sum("q", alias_name="sum_logp_q"),
            Count(alias_name="n_tokens")),
        empty_schema=pa.schema([(id_col, pa.int64()),
                                ("sum_logp_q", pa.int64()),
                                ("n_tokens", pa.int64())]))

    all_ids = narrow.map_batches(
        lambda b: pa.table({id_col: b[id_col]}), batch_format="pyarrow")
    out = shuffle_hash_join(all_ids, sums, on=(id_col,), how="left")

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n_tokens = pc.fill_null(batch["n_tokens"], 0) \
            .cast(pa.int64()).to_numpy()
        sum_q = pc.fill_null(batch["sum_logp_q"], 0) \
            .cast(pa.int64()).to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            ppl = np.where(
                n_tokens > 0,
                np.exp(-(sum_q / LOGPROB_QUANT) / np.maximum(n_tokens, 1)),
                0.0)
        return pa.table({
            id_col: batch[id_col],
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "sum_logp_q": pa.array(sum_q, pa.int64()),
            "ppl": pa.array(ppl, pa.float64()),
        })

    return out.map_batches(finish, batch_format="pyarrow")


#: odd 64-bit mixing multiplier for combining (h1, h2) into one bigram key
_BIGRAM_MIX = np.uint64(0x9E3779B97F4A7C15)


def _bigram_keys(texts: list[str]) -> tuple[np.ndarray, np.ndarray,
                                            np.ndarray]:
    """(doc_idx, bigram_key, first_token_hash) for every ADJACENT token
    pair of the batch.  The bigram key mixes the two 64-bit token hashes
    (``h1 * odd_const ^ h2``) — same negligible-collision contract as the
    unigram hash vocabulary."""
    doc_of, h = _token_hashes(texts)
    if not len(h):
        e = np.empty(0, np.int64)
        return e, np.empty(0, np.uint64), np.empty(0, np.uint64)
    same_doc = doc_of[1:] == doc_of[:-1]
    h1 = h[:-1][same_doc]
    h2 = h[1:][same_doc]
    with np.errstate(over="ignore"):
        key = (h1 * _BIGRAM_MIX) ^ h2
    return doc_of[:-1][same_doc], key, h1


def bigram_logprob_stats(docs: rd.Dataset, *, text_col: str = "text",
                         id_col: str = "doc_id",
                         max_broadcast: int = 50_000_000,
                         force_shuffle: bool = False) -> rd.Dataset:
    """Score every document under the corpus's own BIGRAM LM —
    ``P(w_i | w_{i-1}) = count(w_{i-1} w_i) / count_ctx(w_{i-1})`` where
    the context count sums the bigram counts sharing the first token
    (so probabilities per context sum to exactly 1; no smoothing needed:
    self-scoring has no OOV path).  The CCNet-style quality signal one
    order up from :func:`unigram_logprob_stats` — repetitive boilerplate
    scores near 0 nats while natural prose does not, a separation the
    unigram model cannot see.

    Output per document: ``(doc_id, n_bigrams, sum_logp2_q)`` —
    ``n_bigrams = max(n_tokens - 1, 0)`` and the int64 sum over adjacent
    pairs of ``floor(ln(cb/cctx) * 1e4 + 0.5)`` quantized ONCE per bigram
    vocabulary entry (order-free exact sums, same contract as unigram).

    Plan selection mirrors the unigram operator: the sorted
    (bigram_key, q) model broadcasts under ``max_broadcast``; past the
    guard (or with ``force_shuffle``) the positional pair table
    hash-partitions into an inner join against the distributed
    (key, q) table — built by joining the bigram-count table with the
    context-count table on the first-token hash — then one
    ``groupby(doc_id)`` and a doc-keyed left join restores short
    documents.  Identical output either way.
    """
    from ray.data.aggregate import Count, Min

    from .relational import drop_empty_blocks, shuffle_hash_join

    narrow = docs.select_columns([id_col, text_col])

    def partial_counts(batch: pa.Table) -> pa.Table:
        _, key, h1 = _bigram_keys(batch[text_col].to_pylist())
        uniq, idx, cnt = np.unique(key, return_index=True,
                                   return_counts=True)
        return pa.table({
            "big": pa.array(uniq.view(np.int64), pa.int64()),
            "h1": pa.array(h1[idx].view(np.int64), pa.int64()),
            "c": pa.array(cnt.astype(np.int64), pa.int64())})

    # h1 is functionally dependent on the key (Min = the value)
    bv = narrow.map_batches(partial_counts, batch_format="pyarrow") \
        .groupby("big").aggregate(Min("h1", alias_name="h1"),
                                  Sum("c", alias_name="c")).materialize()
    ctx = bv.groupby("h1").aggregate(Sum("c", alias_name="cc"))

    if force_shuffle or bv.count() > max_broadcast:
        return _bigram_stats_shuffle(narrow, bv, ctx, text_col=text_col,
                                     id_col=id_col)

    ctx_rows = ctx.take_all()
    ctx_h = np.array([r["h1"] for r in ctx_rows], np.int64)
    ctx_c = np.array([r["cc"] for r in ctx_rows], np.int64)
    co = np.argsort(ctx_h)
    ctx_h, ctx_c = ctx_h[co], ctx_c[co]
    rows = bv.take_all()
    # sort in UNSIGNED key order — score() searches the uint64 view
    keys = np.array([r["big"] for r in rows], np.int64).view(np.uint64)
    h1s = np.array([r["h1"] for r in rows], np.int64)
    cb = np.array([r["c"] for r in rows], np.int64)
    ko = np.argsort(keys)
    keys, h1s, cb = keys[ko], h1s[ko], cb[ko]
    cc = ctx_c[np.searchsorted(ctx_h, h1s)]
    q = np.floor(np.log(cb / cc) * LOGPROB_QUANT + 0.5).astype(np.int64)
    model = ray.put((keys, q))

    def score(batch: pa.Table) -> pa.Table:
        ks, qs = ray.get(model)
        ids = batch[id_col].to_numpy()
        doc_of, key, _ = _bigram_keys(batch[text_col].to_pylist())
        pos = np.searchsorted(ks, key)  # every corpus bigram is in-vocab
        n_big = np.bincount(doc_of, minlength=len(ids)).astype(np.int64)
        sum_q = np.zeros(len(ids), np.int64)
        np.add.at(sum_q, doc_of, qs[pos])
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_bigrams": pa.array(n_big, pa.int64()),
            "sum_logp2_q": pa.array(sum_q, pa.int64()),
        })

    return narrow.map_batches(score, batch_format="pyarrow")


def _bigram_stats_shuffle(narrow: rd.Dataset, bv: rd.Dataset,
                          ctx: rd.Dataset, *, text_col: str,
                          id_col: str) -> rd.Dataset:
    """No-broadcast plan for :func:`bigram_logprob_stats` (see its
    docstring): all-distributed, nothing model-sized on the driver."""
    from ray.data.aggregate import Count

    from .relational import drop_empty_blocks, shuffle_hash_join

    withcc = shuffle_hash_join(bv, ctx, on=("h1",), how="inner")

    def add_q(batch: pa.Table) -> pa.Table:
        cb = batch["c"].to_numpy()
        cc = batch["cc"].to_numpy()
        # same float expression as the broadcast path — bit-identical q
        q = np.floor(np.log(cb / cc) * LOGPROB_QUANT + 0.5).astype(np.int64)
        return pa.table({"big": batch["big"], "q": pa.array(q, pa.int64())})

    vq = drop_empty_blocks(
        withcc.map_batches(add_q, batch_format="pyarrow"),
        empty_schema=pa.schema([("big", pa.int64()), ("q", pa.int64())]))

    def positions(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        doc_of, key, _ = _bigram_keys(batch[text_col].to_pylist())
        return pa.table({id_col: pa.array(ids[doc_of], pa.int64()),
                         "big": pa.array(key.view(np.int64), pa.int64())})

    joined = shuffle_hash_join(
        narrow.map_batches(positions, batch_format="pyarrow"), vq,
        on=("big",), how="inner")
    sums = drop_empty_blocks(
        joined.groupby(id_col).aggregate(
            Sum("q", alias_name="sum_logp2_q"),
            Count(alias_name="n_bigrams")),
        empty_schema=pa.schema([(id_col, pa.int64()),
                                ("sum_logp2_q", pa.int64()),
                                ("n_bigrams", pa.int64())]))
    all_ids = narrow.map_batches(
        lambda b: pa.table({id_col: b[id_col]}), batch_format="pyarrow")
    out = shuffle_hash_join(all_ids, sums, on=(id_col,), how="left")

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            id_col: batch[id_col],
            "n_bigrams": pc.fill_null(batch["n_bigrams"], 0)
            .cast(pa.int64()),
            "sum_logp2_q": pc.fill_null(batch["sum_logp2_q"], 0)
            .cast(pa.int64()),
        })

    return out.map_batches(finish, batch_format="pyarrow")


def pmi_keywords(docs: rd.Dataset, *, text_col: str = "text",
                 lang_col: str = "lang", k: int = 10, min_count: int = 5,
                 max_broadcast: int = 50_000_000,
                 force_shuffle: bool = False) -> rd.Dataset:
    """Per-language PMI keyword extraction — the feature-selection /
    characteristic-vocabulary primitive (which terms are diagnostic of a
    language / domain slice; the same shape selects features for a
    fastText-style quality or language classifier).

    ``PMI(term, lang) = ln( P(term, lang) / (P(term) P(lang)) )`` over
    token OCCURRENCES, quantized to integer deci-milli-nats per
    (term, lang) cell: ``pmi_q = floor(ln((n_tl·N) / (n_t·n_l)) · 1e4
    + 0.5)`` with every count an exact int64 and ONE float expression
    evaluated identically by DuckDB, so ranking and output are bit-exact.
    Cells with ``n_tl < min_count`` drop (the standard PMI
    rare-term guard); top-``k`` per language by ``(pmi_q DESC, term)``.

    Scale shape: per-batch partial (lang, term) counts before the one
    vocabulary-scale groupby; the per-term totals table broadcasts under
    ``max_broadcast`` (vectorized ``pc.index_in`` lookup) and
    hash-partition-joins past the guard (``force_shuffle`` — identical
    output, see the plan-parity test); per-language totals are
    language-scale (driver dict); the final top-k is
    :func:`..relational.grouped_topk` (per-batch partial top-k bounds
    the exchange to k rows per (lang, block)).
    """
    import pyarrow.compute as pc

    from .relational import drop_empty_blocks, grouped_topk, \
        shuffle_hash_join

    narrow = docs.select_columns([lang_col, text_col])

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[tuple, int] = {}
        langs = batch[lang_col].to_pylist()
        for lang, t in zip(langs, batch[text_col].to_pylist()):
            for w in _WORD_RE.findall((t or "").lower()):
                key = (lang, w)
                counts[key] = counts.get(key, 0) + 1
        ks = list(counts.keys())
        return pa.table({
            lang_col: pa.array([a for a, _ in ks], pa.string()),
            "term": pa.array([b for _, b in ks], pa.string()),
            "c": pa.array(list(counts.values()), pa.int64())})

    tl = narrow.map_batches(partial, batch_format="pyarrow") \
        .groupby([lang_col, "term"]) \
        .aggregate(Sum("c", alias_name="n_tl")).materialize()

    # language totals: language-scale, driver-side by construction
    l_rows = tl.groupby(lang_col) \
        .aggregate(Sum("n_tl", alias_name="n_l")).take_all()
    n_l = {r[lang_col]: int(r["n_l"]) for r in l_rows}
    n_total = sum(n_l.values())

    nt = tl.groupby("term").aggregate(Sum("n_tl", alias_name="n_t"))

    if force_shuffle or nt.count() > max_broadcast:
        joined = shuffle_hash_join(tl, nt, on=("term",), how="inner")

        def add_pmi_joined(batch: pa.Table) -> pa.Table:
            return _pmi_columns(batch, batch["n_t"].to_numpy(), n_l,
                                n_total, lang_col, min_count)

        scored = drop_empty_blocks(
            joined.map_batches(add_pmi_joined, batch_format="pyarrow"),
            empty_schema=pa.schema([(lang_col, pa.string()),
                                    ("term", pa.string()),
                                    ("n_tl", pa.int64()),
                                    ("pmi_q", pa.int64())]))
    else:
        vt = nt.take_all()
        terms = pa.array([r["term"] for r in vt], pa.string())
        counts = np.array([r["n_t"] for r in vt], np.int64)
        model = ray.put((terms, counts))

        def add_pmi(batch: pa.Table) -> pa.Table:
            ts, cs = ray.get(model)
            pos = pc.index_in(batch["term"], value_set=ts) \
                .to_numpy(zero_copy_only=False)
            return _pmi_columns(batch, cs[pos], n_l, n_total, lang_col,
                                min_count)

        scored = drop_empty_blocks(
            tl.map_batches(add_pmi, batch_format="pyarrow"),
            empty_schema=pa.schema([(lang_col, pa.string()),
                                    ("term", pa.string()),
                                    ("n_tl", pa.int64()),
                                    ("pmi_q", pa.int64())]))
    return grouped_topk(scored, group_col=lang_col, order_col="pmi_q",
                        tie_col="term", k=k, descending=True)


def _pmi_columns(batch: pa.Table, n_t: np.ndarray, n_l: dict, n_total: int,
                 lang_col: str, min_count: int) -> pa.Table:
    """Shared pmi_q computation — ONE float expression, identical in both
    plans and in the SQL oracle: ln((n_tl·N) / (n_t·n_l))·1e4, floor+0.5."""
    n_tl = batch["n_tl"].to_numpy()
    keep = n_tl >= min_count
    langs = np.asarray(batch[lang_col].to_pylist(), object)
    nl = np.array([n_l[x] for x in langs], np.int64)
    with np.errstate(divide="ignore"):
        ratio = (n_tl.astype(np.float64) * float(n_total)) \
            / (n_t.astype(np.float64) * nl.astype(np.float64))
        q = np.floor(np.log(ratio) * LOGPROB_QUANT + 0.5).astype(np.int64)
    return pa.table({
        lang_col: pa.array(langs[keep], pa.string()),
        "term": pa.array(np.asarray(batch["term"].to_pylist(),
                                    object)[keep], pa.string()),
        "n_tl": pa.array(n_tl[keep], pa.int64()),
        "pmi_q": pa.array(q[keep], pa.int64()),
    })


def term_drift_stats(docs: rd.Dataset, *, text_col: str = "text",
                     side_col: str = "side",
                     min_total: int = 10) -> rd.Dataset:
    """Term-frequency DRIFT between two corpus snapshots — the
    distribution-shift monitor a recurring crawl pipeline runs between
    snapshot N and N+1 (which vocabulary surged / collapsed; feeds both
    quality alerts and dedup-threshold retuning).

    Input rows carry ``side`` ∈ {0, 1} (snapshot id).  Output per term
    with ``n_a + n_b >= min_total``: exact counts ``(n_a, n_b)`` and the
    Haldane-corrected log-odds-ratio (the classic 0.5-cell 2×2
    correction, so zero cells stay finite) quantized to integer
    deci-milli-nats: ``logodds_q = floor(ln(((n_a+0.5)·(N_b−n_b+0.5)) /
    ((n_b+0.5)·(N_a−n_a+0.5))) · 1e4 + 0.5)`` — ONE float expression on
    exact int64 counts, evaluated identically by DuckDB.

    Scale shape: per-batch partial (term, c_a, c_b) counts before the
    single vocabulary-scale groupby; the two corpus totals are scalars
    (one tiny aggregate); scoring is a stateless vectorized batch pass —
    no broadcast table, no second exchange.
    """

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, list] = {}
        sides = batch[side_col].to_pylist()
        for side, t in zip(sides, batch[text_col].to_pylist()):
            j = 1 if side else 0
            for w in _WORD_RE.findall((t or "").lower()):
                e = counts.get(w)
                if e is None:
                    counts[w] = e = [0, 0]
                e[j] += 1
        return pa.table({
            "term": pa.array(list(counts.keys()), pa.string()),
            "c_a": pa.array([v[0] for v in counts.values()], pa.int64()),
            "c_b": pa.array([v[1] for v in counts.values()], pa.int64())})

    tc = docs.select_columns([side_col, text_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("c_a", alias_name="n_a"),
                                   Sum("c_b", alias_name="n_b")) \
        .materialize()
    tot = tc.aggregate(Sum("n_a", alias_name="ta"),
                       Sum("n_b", alias_name="tb"))
    n_tot_a, n_tot_b = int(tot["ta"]), int(tot["tb"])

    def score(batch: pa.Table) -> pa.Table:
        n_a = batch["n_a"].to_numpy()
        n_b = batch["n_b"].to_numpy()
        keep = (n_a + n_b) >= min_total
        n_a, n_b = n_a[keep], n_b[keep]
        # ONE float expression, same operation order as the SQL oracle
        ratio = ((n_a + 0.5) * ((n_tot_b - n_b) + 0.5)) \
            / ((n_b + 0.5) * ((n_tot_a - n_a) + 0.5))
        q = np.floor(np.log(ratio) * LOGPROB_QUANT + 0.5).astype(np.int64)
        terms = np.asarray(batch["term"].to_pylist(), object)[keep]
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "n_a": pa.array(n_a, pa.int64()),
            "n_b": pa.array(n_b, pa.int64()),
            "logodds_q": pa.array(q, pa.int64()),
        })

    return tc.map_batches(score, batch_format="pyarrow")


# --------------------------------------------------------------------------
# BPE tokenizer training
# --------------------------------------------------------------------------

def word_frequencies(docs: rd.Dataset, *, text_col: str = "text",
                     max_words: int = 10_000_000) -> dict[str, int]:
    """Aggregated (word, count) dictionary of the corpus — BPE training's
    only distributed step.  Per-batch partial counts (dictionary-encode)
    stream into one vocabulary-sized groupby; the collected dict is capped
    by ``max_words`` (fail loudly; production trainers cap vocab the same
    way — rare tail words do not influence early merges)."""

    def partial(batch: pa.Table) -> pa.Table:
        toks: dict[str, int] = {}
        for t in batch[text_col].to_pylist():
            for w in _WORD_RE.findall((t or "").lower()):
                toks[w] = toks.get(w, 0) + 1
        return pa.table({"word": pa.array(list(toks.keys()), pa.string()),
                         "c": pa.array(list(toks.values()), pa.int64())})

    agg = docs.select_columns([text_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("c", alias_name="c"))
    rows = agg.take_all()
    if len(rows) > max_words:
        raise ValueError(
            f"word dictionary has {len(rows)} entries > max_words="
            f"{max_words}; cap the vocabulary (drop count-1 tail words "
            "inside partial_counts) before collecting.")
    return {r["word"]: int(r["c"]) for r in rows}


def train_bpe(word_freq: dict[str, int], *, num_merges: int
              ) -> list[tuple[str, str]]:
    """Classic BPE merge learning (Sennrich et al. 2016) on an aggregated
    word-frequency dictionary.  Deterministic: the best pair maximizes
    (count, then lexicographically smallest (a, b)) — ties cannot reorder
    between runs or cluster sizes.  Returns the ordered merge list.

    Cost: O(num_merges * words-containing-pair); the dictionary is
    vocabulary-sized, so this is independent of corpus size — the standard
    industrial shape (distributed count, local merge loop).
    """
    # word -> symbol tuple, weighted by count
    words: list[tuple[list[str], int]] = [
        (list(w) + ["</w>"], c) for w, c in sorted(word_freq.items()) if w]
    merges: list[tuple[str, str]] = []
    # pair -> total count; pair -> set of word indices containing it
    pair_count: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}

    def add_word(idx: int, sign: int) -> None:
        syms, c = words[idx]
        for a, b in zip(syms, syms[1:]):
            pair_count[(a, b)] = pair_count.get((a, b), 0) + sign * c
            if sign > 0:
                pair_words.setdefault((a, b), set()).add(idx)

    for i in range(len(words)):
        add_word(i, +1)

    for _ in range(num_merges):
        best = None
        for p, c in pair_count.items():
            if c <= 0:
                continue
            if best is None or c > best[1] or (c == best[1] and p < best[0]):
                best = (p, c)
        if best is None:
            break
        (a, b), _c = best
        merges.append((a, b))
        ab = a + b
        for idx in list(pair_words.get((a, b), ())):
            syms, c = words[idx]
            add_word(idx, -1)
            out: list[str] = []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(ab)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[idx] = (out, c)
            add_word(idx, +1)
    return merges


class BpeEncoder:
    """Actor-pool encode stage: merge ranks built once per actor, batches
    dictionary-encode to unique words, each unique word encodes once.

    Output per input row: ``(doc_id, n_words, n_bpe_tokens)`` plus the
    encoded token strings when ``emit_tokens`` (list<string> column —
    useful at test scale, heavy at corpus scale)."""

    def __init__(self, merges: list[tuple[str, str]], *,
                 text_col: str = "text", id_col: str = "doc_id",
                 emit_tokens: bool = False) -> None:
        self.rank = {tuple(m): i for i, m in enumerate(merges)}
        self.text_col, self.id_col = text_col, id_col
        self.emit_tokens = emit_tokens
        self.cache: dict[str, list[str]] = {}

    def _encode_word(self, w: str) -> list[str]:
        got = self.cache.get(w)
        if got is not None:
            return got
        syms = list(w) + ["</w>"]
        while len(syms) > 1:
            ranked = [(self.rank.get((a, b)), i) for i, (a, b)
                      in enumerate(zip(syms, syms[1:]))
                      if (a, b) in self.rank]
            if not ranked:
                break
            _, i = min(ranked)
            syms[i:i + 2] = [syms[i] + syms[i + 1]]
        self.cache[w] = syms
        return syms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col]
        texts = batch[self.text_col].to_pylist()
        n_words = np.zeros(len(texts), np.int64)
        n_tok = np.zeros(len(texts), np.int64)
        toks_out: list[list[str]] = []
        for i, t in enumerate(texts):
            ws = _WORD_RE.findall((t or "").lower())
            n_words[i] = len(ws)
            row: list[str] = []
            for w in ws:
                e = self._encode_word(w)
                n_tok[i] += len(e)
                if self.emit_tokens:
                    row.extend(e)
            toks_out.append(row)
        cols = {
            "doc_id": ids,
            "n_words": pa.array(n_words, pa.int64()),
            "n_bpe_tokens": pa.array(n_tok, pa.int64()),
        }
        if self.emit_tokens:
            cols["tokens"] = pa.array(toks_out, pa.list_(pa.string()))
        return pa.table(cols)


def bpe_encode(docs: rd.Dataset, merges: list[tuple[str, str]], *,
               text_col: str = "text", id_col: str = "doc_id",
               concurrency: int | None = None) -> rd.Dataset:
    """Encode the corpus with a trained merge list (actor pool; ranks and
    the per-actor word cache live in ``__init__``)."""
    if concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 4)) \
            if ray.is_initialized() else 4
        concurrency = max(2, cpus // 2)
    return docs.select_columns([id_col, text_col]).map_batches(
        BpeEncoder, fn_constructor_kwargs={
            "merges": merges, "text_col": text_col, "id_col": id_col},
        batch_format="pyarrow", concurrency=concurrency)


def tfidf_topk_terms(docs: rd.Dataset, *, text_col: str = "text",
                     id_col: str = "doc_id", k: int = 5,
                     num_docs: int | None = None,
                     max_broadcast: int = 50_000_000,
                     force_shuffle: bool = False) -> rd.Dataset:
    """Top-``k`` TF-IDF terms per document, exact and oracle-checkable.

    Frozen integer spec (mirrored in the ``tfidf_topk`` SQL oracle): the
    score is ``tf * idf_q`` with ``idf_q = floor(ln(N / df) * 1e4 + 0.5)``
    quantized ONCE per vocabulary entry — integer products and the
    (score desc, term asc) tie-break make the result bit-identical at any
    parallelism.  Tokenization is the frozen ``[a-z]+`` on lowercased text.

    Scale shape: tf per (doc, term) is computed entirely inside the batch
    (a document lives in one row — no shuffle); df is one vocabulary-sized
    groupby of per-batch distinct-term partials; the (term, idf_q) table is
    broadcast once while it fits a worker heap (``max_broadcast``), and
    beyond that (or with ``force_shuffle``) scoring switches to a
    hash-partitioned inner join of the (doc, term, tf) table against the
    (term, idf_q) table — identical output (integer products).  Scoring is
    otherwise a stateless searchsorted pass; the only row-scale exchange is
    ``grouped_topk``'s ≤k-rows-per-(doc, block) merge.
    """
    from .relational import drop_empty_blocks, grouped_topk, shuffle_hash_join

    narrow = docs.select_columns([id_col, text_col])
    if num_docs is None:
        num_docs = docs.count()

    def _doc_term_tf(batch: pa.Table):
        ids = batch[id_col].to_numpy()
        toks_per_doc = [_WORD_RE.findall((t or "").lower())
                        for t in batch[text_col].to_pylist()]
        lens = np.array([len(t) for t in toks_per_doc], np.int64)
        flat = [t for toks in toks_per_doc for t in toks]
        if not flat:
            return ids, np.empty(0, np.int64), np.empty(0, object), \
                np.empty(0, np.int64)
        doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
        uniq, inv = np.unique(np.asarray(flat, object), return_inverse=True)
        key = doc_of * uniq.size + inv
        uk, cnt = np.unique(key, return_counts=True)
        return ids, uk // uniq.size, uniq[uk % uniq.size], \
            cnt.astype(np.int64)

    def df_partial(batch: pa.Table) -> pa.Table:
        _, _, terms, _ = _doc_term_tf(batch)
        ut, c = np.unique(terms, return_counts=True)
        return pa.table({"term": pa.array(ut.tolist(), pa.string()),
                         "df": pa.array(c.astype(np.int64), pa.int64())})

    df_ds = narrow.map_batches(df_partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("df", alias_name="df")).materialize()

    if force_shuffle or df_ds.count() > max_broadcast:
        def add_idf(batch: pa.Table) -> pa.Table:
            dfs = batch["df"].to_numpy()
            # same float expression as the broadcast path below
            idf_q = np.floor(np.log(float(num_docs) / dfs) * LOGPROB_QUANT
                             + 0.5).astype(np.int64)
            return pa.table({"term": batch["term"],
                             "idf_q": pa.array(idf_q, pa.int64())})

        vq = drop_empty_blocks(
            df_ds.map_batches(add_idf, batch_format="pyarrow"),
            empty_schema=pa.schema([("term", pa.string()),
                                    ("idf_q", pa.int64())]))

        def tf_rows(batch: pa.Table) -> pa.Table:
            ids, doc_idx, terms, tf = _doc_term_tf(batch)
            return pa.table({
                id_col: pa.array(ids[doc_idx], pa.int64()),
                "term": pa.array(terms.tolist(), pa.string()),
                "tf": pa.array(tf, pa.int64())})

        joined = shuffle_hash_join(
            narrow.map_batches(tf_rows, batch_format="pyarrow"), vq,
            on=("term",), how="inner")

        def score_joined(batch: pa.Table) -> pa.Table:
            score = batch["tf"].to_numpy() * batch["idf_q"].to_numpy()
            return pa.table({id_col: batch[id_col], "term": batch["term"],
                             "score_q": pa.array(score, pa.int64())})

        scored = joined.map_batches(score_joined, batch_format="pyarrow")
        return grouped_topk(scored, group_col=id_col, order_col="score_q",
                            tie_col="term", k=k, descending=True)

    rows = df_ds.take_all()
    terms_sorted = np.array([r["term"] for r in rows], object)
    dfs = np.array([r["df"] for r in rows], np.int64)
    order = np.argsort(terms_sorted)
    terms_sorted, dfs = terms_sorted[order], dfs[order]
    idf_q = np.floor(np.log(float(num_docs) / dfs) * LOGPROB_QUANT
                     + 0.5).astype(np.int64)
    model = ray.put((terms_sorted, idf_q))

    def score(batch: pa.Table) -> pa.Table:
        ts, qs = ray.get(model)
        ids, doc_idx, terms, tf = _doc_term_tf(batch)
        pos = np.searchsorted(ts, terms)
        return pa.table({
            id_col: pa.array(ids[doc_idx], pa.int64()),
            "term": pa.array(terms.tolist(), pa.string()),
            "score_q": pa.array(tf * qs[pos], pa.int64()),
        })

    scored = narrow.map_batches(score, batch_format="pyarrow")
    return grouped_topk(scored, group_col=id_col, order_col="score_q",
                        tie_col="term", k=k, descending=True)
