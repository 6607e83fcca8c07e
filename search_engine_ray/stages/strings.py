"""String-similarity self-join: pairs within a Levenshtein distance bound.

Fuzzy-duplicate detection over short keys (titles, URLs, product names,
doc prefixes) — a standard data-cleaning join the reference engine has no
analogue for (its only string ops are tokenize/trim,
``services/LemmasFinder.java:260-290``).  Round-3 LLM-pipeline addition
per SURVEY §2.11.

Semantics (mirrored exactly by the DuckDB ``levenshtein`` oracle): over
key strings ``s = text[:prefix_len]`` (character slice, UTF-8 aware both
engines), emit every pair ``(a, b)``, ``a < b``, within the same blocking
key (``block_col``) whose unit-cost edit distance is <= ``max_dist``,
with the exact distance.  Distance is measured over UTF-8 BYTES, because
that is what DuckDB's ``levenshtein`` measures — the two engines agree by
construction on ASCII and on any byte-level definition elsewhere.

Scale shape: ONE shuffle (``groupby(block_col)``).  Within a block the
candidate set is pruned by two *necessary* conditions before the O(L^2)
verify — length difference <= d, and bag-of-characters L1 distance <= 2d
(one substitution moves two counts; one indel moves one) — so NO true
pair is ever dropped and oracle parity is exact.  The verify is a
pair-vectorized Wagner–Fischer DP: python loops run over the <=
``prefix_len``^2 cell grid, numpy vectors run across ALL candidate pairs
at once; memory is two (pairs, L+1) rows, never a 3-D tensum.  Candidate
L1 scoring streams in fixed-size pair chunks, so a hot block costs time,
not memory.  Blocks are quadratic by contract (like
``ngram_jaccard_pairs``, the documented oracle for the LSH family): at
production scale run ``minhash_lsh_pairs`` first and use this as the
exact verifier within LSH buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

__all__ = ["damerau_levenshtein_pairs", "edit_distance_pairs",
           "jaro_winkler_pairs", "jaro_winkler_scores",
           "levenshtein_pairs"]

_CHUNK = 65536  # candidate pairs scored per L1 slab


def _codes(strings: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(m, width) uint16 UTF-8 BYTE matrix (padded with 256 — a value no
    byte takes) + byte lengths.  Byte-level, not codepoint-level, because
    DuckDB's ``levenshtein`` measures UTF-8 bytes — the oracle contract."""
    m = len(strings)
    enc = [s.encode("utf-8") for s in strings]
    width = max((len(b) for b in enc), default=0)
    out = np.full((m, width), 256, np.uint16)
    lens = np.zeros(m, np.int64)
    for i, b in enumerate(enc):
        c = np.frombuffer(b, np.uint8)
        lens[i] = len(c)
        out[i, :len(c)] = c
    return out, lens


def levenshtein_pairs(codes: np.ndarray, lens: np.ndarray,
                      ia: np.ndarray, ib: np.ndarray) -> np.ndarray:
    """Exact unit-cost edit distance for each candidate pair, vectorized
    across pairs (loops only over the character grid)."""
    a, b = codes[ia], codes[ib]
    la, lb = lens[ia], lens[ib]
    p = len(ia)
    lamax = int(la.max()) if p else 0
    lbmax = int(lb.max()) if p else 0
    out = np.where(la == 0, lb, 0).astype(np.int64)
    prev = np.broadcast_to(np.arange(lbmax + 1, dtype=np.int64),
                           (p, lbmax + 1)).copy()
    for i in range(1, lamax + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = a[:, i - 1]
        for j in range(1, lbmax + 1):
            cost = (ai != b[:, j - 1]).astype(np.int64)
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + cost)
        done = la == i
        if done.any():
            out[done] = cur[done, lb[done]]
        prev = cur
    return out


def damerau_levenshtein_pairs(codes: np.ndarray, lens: np.ndarray,
                              ia: np.ndarray, ib: np.ndarray) -> np.ndarray:
    """TRUE Damerau-Levenshtein (alphabet-tracked, unrestricted
    transpositions — ``CA -> ABC`` costs 2, not OSA's 3) for each
    candidate pair, matching DuckDB's ``damerau_levenshtein`` over UTF-8
    bytes (fuzz-verified incl. multibyte).  Vectorized across pairs: the
    python loops cover only the character grid; the per-pair
    ``last-seen-row`` alphabet table and ``last-match-column`` scalar of
    the textbook algorithm become a (pairs, 257) gather table and a
    (pairs,) vector.  Needs the FULL (pairs, L1+2, L2+2) DP tensor (the
    transposition term reads arbitrary earlier rows), so callers slab
    candidates — ``_DL_CHUNK`` pairs is ~40 MB at width 24."""
    p = len(ia)
    if not p:
        return np.empty(0, np.int64)
    a, b = codes[ia], codes[ib]
    la, lb = lens[ia], lens[ib]
    l1m, l2m = int(la.max()), int(lb.max())
    rows = np.arange(p)
    maxd = (la + lb).astype(np.int32)     # the textbook INF guard row/col
    d = np.zeros((p, l1m + 2, l2m + 2), np.int32)
    d[:, 0, 0] = maxd
    for i in range(l1m + 1):
        d[:, i + 1, 0] = maxd
        d[:, i + 1, 1] = i
    for j in range(l2m + 1):
        d[:, 0, j + 1] = maxd
        d[:, 1, j + 1] = j
    da = np.zeros((p, 257), np.int32)     # last row each byte appeared at
    for i in range(1, l1m + 1):
        db = np.zeros(p, np.int32)        # last matching column this row
        ai = a[:, i - 1].astype(np.intp)  # pad byte 256 never equals a
        for j in range(1, l2m + 1):       # real byte, so out-of-range
            bj = b[:, j - 1].astype(np.intp)  # rows can't pollute da/db
            k = da[rows, bj]
            l = db
            eq = ai == bj
            cost = np.where(eq, 0, 1).astype(np.int32)
            trans = d[rows, k, l] + (i - k - 1) + 1 + (j - l - 1)
            db = np.where(eq, j, db)
            d[:, i + 1, j + 1] = np.minimum(
                np.minimum(d[:, i, j] + cost, d[:, i + 1, j] + 1),
                np.minimum(d[:, i, j + 1] + 1, trans))
        da[rows, ai] = i
    return d[rows, la + 1, lb + 1].astype(np.int64)


_DL_CHUNK = 16384  # DL verify slab (full DP tensor per slab, see above)


def edit_distance_pairs(docs: rd.Dataset, *, key_col: str = "doc_id",
                        text_col: str = "text", block_col: str = "lang",
                        prefix_len: int = 24, max_dist: int = 3,
                        variant: str = "levenshtein") -> rd.Dataset:
    """Pairs ``(id_a, id_b, dist)`` with ``dist <= max_dist`` over
    ``text[:prefix_len]``, blocked by ``block_col`` (see module doc).

    ``variant="damerau"`` swaps the verify kernel for the true
    Damerau-Levenshtein; BOTH prefilters remain loss-free for it (a
    transposition changes neither length nor the byte bag, so
    ``|len diff| <= d`` and ``bag-L1 <= 2d`` are still necessary)."""

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            key_col: batch[key_col],
            block_col: batch[block_col],
            "s": pc.utf8_slice_codeunits(batch[text_col], 0, prefix_len),
        })

    def per_block(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[(key_col, "ascending")])
        g = group.take(order)
        ids = g[key_col].to_numpy()
        strings = g["s"].to_pylist()
        m = len(strings)
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "dist": pa.array([], pa.int64())})
        if m < 2:
            return empty
        codes, lens = _codes(strings)
        # bag-of-bytes over the block's own alphabet (small dense matrix)
        alphabet, inv = np.unique(codes.ravel(), return_inverse=True)
        bags = np.zeros((m, len(alphabet)), np.int16)
        rows = np.repeat(np.arange(m), codes.shape[1] or 1)[:inv.size]
        np.add.at(bags, (rows, inv.ravel()), 1)
        if alphabet.size and alphabet[-1] == 256:  # drop the pad column
            bags[:, -1] = 0
        ia_all, ib_all = np.triu_indices(m, k=1)
        keep_len = np.abs(lens[ia_all] - lens[ib_all]) <= max_dist
        ia_all, ib_all = ia_all[keep_len], ib_all[keep_len]
        # L1 bag prefilter in fixed-size slabs (necessary condition <= 2d)
        cand_a, cand_b = [], []
        for at in range(0, len(ia_all), _CHUNK):
            ia = ia_all[at:at + _CHUNK]
            ib = ib_all[at:at + _CHUNK]
            l1 = np.abs(bags[ia].astype(np.int32)
                        - bags[ib].astype(np.int32)).sum(axis=1)
            ok = l1 <= 2 * max_dist
            cand_a.append(ia[ok])
            cand_b.append(ib[ok])
        ia = np.concatenate(cand_a) if cand_a else np.empty(0, np.int64)
        ib = np.concatenate(cand_b) if cand_b else np.empty(0, np.int64)
        if not len(ia):
            return empty
        if variant == "damerau":
            dist = np.concatenate([
                damerau_levenshtein_pairs(codes, lens,
                                          ia[at:at + _DL_CHUNK],
                                          ib[at:at + _DL_CHUNK])
                for at in range(0, len(ia), _DL_CHUNK)])
        else:
            dist = levenshtein_pairs(codes, lens, ia, ib)
        hit = dist <= max_dist
        return pa.table({
            "id_a": pa.array(ids[ia[hit]], pa.int64()),
            "id_b": pa.array(ids[ib[hit]], pa.int64()),
            "dist": pa.array(dist[hit], pa.int64()),
        })

    return (docs.map_batches(prep, batch_format="pyarrow")
            .groupby(block_col).map_groups(per_block,
                                           batch_format="pyarrow"))


def jaro_winkler_scores(codes: np.ndarray, lens: np.ndarray,
                        ia: np.ndarray, ib: np.ndarray) -> np.ndarray:
    """Jaro-Winkler similarity for each candidate pair, bit-identical to
    DuckDB's ``jaro_winkler_similarity`` (verified on 5000 random pairs:
    same UTF-8-BYTE alphabet, same match window ``max(l1,l2)//2 - 1``,
    same transposition count, same boost ``j + prefix*0.1*(1-j)`` for
    ``j > 0.7`` with prefix capped at 4, and the same two edge rules —
    either side empty -> 0.0, byte-equal non-empty -> 1.0 even when the
    length-1 window is empty).  Vectorized ACROSS pairs: python loops run
    only over the <= width character grid; all per-pair state (match
    flags, windows, matched-subsequence extraction) is numpy."""
    p = len(ia)
    if not p:
        return np.empty(0, np.float64)
    a, b = codes[ia], codes[ib]
    la, lb = lens[ia], lens[ib]
    width = codes.shape[1]
    if width == 0:
        return np.zeros(p, np.float64)
    md = np.maximum(la, lb) // 2 - 1          # match window half-width
    jpos = np.arange(width)
    m1 = np.zeros((p, width), bool)
    m2 = np.zeros((p, width), bool)
    for i in range(int(la.max())):
        active = la > i
        valid = ((jpos >= (i - md)[:, None])
                 & (jpos < np.minimum(i + md + 1, lb)[:, None]))
        cand = valid & ~m2 & (b == a[:, i][:, None]) & active[:, None]
        hit = cand.any(axis=1)
        j = cand.argmax(axis=1)               # FIRST unmatched in-window
        m2[hit, j[hit]] = True
        m1[hit, i] = True
    matches = m1.sum(axis=1)
    # transpositions: compact each side's matched bytes in order, compare
    mx = int(matches.max()) if p else 0
    t = np.zeros(p, np.int64)
    if mx:
        ms1 = np.zeros((p, mx), np.uint16)
        ms2 = np.zeros((p, mx), np.uint16)
        r1, c1 = np.nonzero(m1)
        ms1[r1, (np.cumsum(m1, axis=1) - 1)[r1, c1]] = a[r1, c1]
        r2, c2 = np.nonzero(m2)
        ms2[r2, (np.cumsum(m2, axis=1) - 1)[r2, c2]] = b[r2, c2]
        diff = (ms1 != ms2) & (np.arange(mx) < matches[:, None])
        t = diff.sum(axis=1) // 2
    mf = matches.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = (mf / la + mf / lb + (mf - t) / mf) / 3.0
    jaro = np.where((matches == 0) | (la == 0) | (lb == 0), 0.0, jaro)
    upto = min(4, width)
    eqp = ((a[:, :upto] == b[:, :upto])
           & (np.arange(upto) < np.minimum(la, lb)[:, None]))
    pref = np.cumprod(eqp, axis=1).sum(axis=1)
    jw = np.where(jaro > 0.7,
                  jaro + (pref * 0.1) * (1.0 - jaro), jaro)
    equal = (la == lb) & (a == b).all(axis=1)  # pads are 256 both sides
    return np.where(equal & (la > 0), 1.0, jw)


def jaro_winkler_pairs(docs: rd.Dataset, *, key_col: str = "doc_id",
                       text_col: str = "text", block_col: str = "lang",
                       prefix_len: int = 20,
                       threshold_micro: int = 900000) -> rd.Dataset:
    """Fuzzy self-join: pairs ``(id_a < id_b, jw_micro)`` with
    ``floor(jaro_winkler * 1e6) >= threshold_micro`` over
    ``text[:prefix_len]`` within the same ``block_col`` group.

    The score is exported as the INTEGER ``jw_micro = floor(jw * 1e6)``
    (both engines floor the same bit-identical double, so parity is
    exact with no float hash surface).  Like ``edit_distance_pairs``,
    blocks are quadratic by contract — the oracle/verifier role for the
    LSH family; the vectorized scorer streams candidate pairs in
    fixed-size slabs so a hot block costs time, not memory."""

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            key_col: batch[key_col],
            block_col: batch[block_col],
            "s": pc.utf8_slice_codeunits(batch[text_col], 0, prefix_len),
        })

    def per_block(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[(key_col, "ascending")])
        g = group.take(order)
        ids = g[key_col].to_numpy()
        strings = g["s"].to_pylist()
        m = len(strings)
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "jw_micro": pa.array([], pa.int64())})
        if m < 2:
            return empty
        codes, lens = _codes(strings)
        ia_all, ib_all = np.triu_indices(m, k=1)
        out_a, out_b, out_s = [], [], []
        for at in range(0, len(ia_all), _CHUNK):
            ia = ia_all[at:at + _CHUNK]
            ib = ib_all[at:at + _CHUNK]
            jw = jaro_winkler_scores(codes, lens, ia, ib)
            micro = np.floor(jw * 1e6).astype(np.int64)
            hit = micro >= threshold_micro
            out_a.append(ia[hit])
            out_b.append(ib[hit])
            out_s.append(micro[hit])
        ia = np.concatenate(out_a)
        ib = np.concatenate(out_b)
        if not len(ia):
            return empty
        return pa.table({
            "id_a": pa.array(ids[ia], pa.int64()),
            "id_b": pa.array(ids[ib], pa.int64()),
            "jw_micro": pa.array(np.concatenate(out_s), pa.int64()),
        })

    return (docs.map_batches(prep, batch_format="pyarrow")
            .groupby(block_col).map_groups(per_block,
                                           batch_format="pyarrow"))
