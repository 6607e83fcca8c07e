"""Deterministic, split-stable hashing kernels.

Python's builtin ``hash`` is salted per process (PYTHONHASHSEED), so nothing
here may use it: partition routing and dedup keys must be identical across
workers, runs and cluster sizes (the checkpoint/resume contract keys
manifests by these hashes).

Vectorized over numpy where the call sites are hot (per-batch columns).
"""

from __future__ import annotations

import hashlib

import numpy as np

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


# Polynomial rolling hash over the raw UTF-8 bytes, finished with a
# splitmix64 mixer — fully vectorized in numpy over the Arrow string
# buffer (offsets + contiguous data), no per-row Python.  Replaced the
# round-1 per-row blake2b loop, which sat on the flagship build's routing
# path (stages/extract.py) and every dedup family; hash VALUES changed,
# so the routing version rides in the build config hash ("hashv") and a
# committed index with a different config hash is rebuilt, not resumed.

_POLY_P = np.uint64(0x9E3779B97F4A7C15)  # odd golden-ratio multiplier
_SM1 = np.uint64(0xBF58476D1CE4E5B9)
_SM2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(z: np.ndarray) -> np.ndarray:
    z = (z + _POLY_P).astype(np.uint64)
    z ^= z >> np.uint64(30)
    z *= _SM1
    z ^= z >> np.uint64(27)
    z *= _SM2
    z ^= z >> np.uint64(31)
    return z


_POW_CACHE = np.array([1], np.uint64)


def _powers(n: int) -> np.ndarray:
    """[P^0, P^1, ..., P^(n-1)] mod 2^64 (cached, grown on demand)."""
    global _POW_CACHE
    if _POW_CACHE.size < n:
        grow = max(n, 2 * _POW_CACHE.size, 256)
        out = np.empty(grow, np.uint64)
        out[0] = 1
        np.multiply.accumulate(np.full(grow - 1, _POLY_P, np.uint64),
                               out=out[1:])
        _POW_CACHE = out
    return _POW_CACHE


def _flat_utf8(strings) -> tuple[np.ndarray, np.ndarray]:
    """(flat byte array in row order, per-row lengths) for list[str] or an
    Arrow string column — the Arrow path is zero-copy on the data buffer."""
    import pyarrow as pa

    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if not isinstance(strings, pa.Array):
        strings = pa.array(list(strings), pa.string())
    if pa.types.is_large_string(strings.type):
        off_dtype: type = np.int64
    else:
        if not pa.types.is_string(strings.type):
            strings = strings.cast(pa.string())
        off_dtype = np.int32
    bufs = strings.buffers()
    off = np.frombuffer(bufs[1], dtype=off_dtype)[
        strings.offset: strings.offset + len(strings) + 1].astype(np.int64)
    lens = np.diff(off)
    if bufs[2] is None or lens.sum() == 0:
        return np.empty(0, np.uint8), lens
    data = np.frombuffer(bufs[2], dtype=np.uint8)[off[0]: off[-1]]
    return data, lens


def stable_hash_array(strings, seed: int = 0) -> np.ndarray:
    """64-bit stable hashes for strings -> uint64 array (vectorized).

    Accepts a list/iterable of ``str`` or a pyarrow (Chunked)Array; identical
    values either way.  Deterministic across processes, runs and cluster
    sizes (no PYTHONHASHSEED dependence) — the split-stability contract the
    partition router and resume manifests key on.
    """
    data, lens = _flat_utf8(strings)
    n = lens.size
    if n == 0:
        return np.empty(0, np.uint64)
    # 1-element array: numpy warns on scalar uint64 overflow, arrays wrap
    seed64 = _splitmix64(np.array([seed & 0xFFFFFFFFFFFFFFFF], np.uint64))[0]
    H = np.zeros(n, np.uint64)
    if data.size:
        P = _powers(int(lens.max()))
        # exponent of each byte = (bytes remaining after it in its row)
        ends = np.cumsum(lens)
        exp = np.repeat(ends, lens) - 1 - np.arange(data.size, dtype=np.int64)
        terms = (data.astype(np.uint64) + np.uint64(1)) * P[exp]
        nz = lens > 0
        idx = np.zeros(int(nz.sum()), np.int64)
        np.cumsum(lens[nz][:-1], out=idx[1:])
        H[nz] = np.add.reduceat(terms, idx) if idx.size else terms.sum(dtype=np.uint64)
    return _splitmix64(H ^ (lens.astype(np.uint64) * _POLY_P) ^ seed64)


def stable_hash_str(s: str, seed: int = 0) -> int:
    """Scalar twin of :func:`stable_hash_array` (identical values)."""
    return int(stable_hash_array([s], seed)[0])


def md5_hex_array(strings) -> list[str]:
    """md5 hexdigests (matches DuckDB ``md5()`` for the dedup oracle)."""
    return [hashlib.md5(s.encode("utf-8")).hexdigest() for s in strings]


# --- multiply-shift hash family over 64-bit token hashes -------------------
# h_i(x) = (a_i * x + b_i) mod 2^64 — universal enough for MinHash banding;
# parameters derived deterministically from the seed.

def _hash_params(num: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 2**62, size=num, dtype=np.int64).astype(np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.randint(0, 2**62, size=num, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signature(token_hashes: np.ndarray, num_perm: int = 64, seed: int = 7) -> np.ndarray:
    """MinHash signature (uint64[num_perm]) of a set of 64-bit token hashes."""
    a, b = _hash_params(num_perm, seed)
    if token_hashes.size == 0:
        return np.full(num_perm, _MASK64, dtype=np.uint64)
    x = token_hashes.astype(np.uint64)[:, None]
    return (x * a[None, :] + b[None, :]).min(axis=0)


def simhash(token_hashes: np.ndarray, weights: np.ndarray | None = None) -> int:
    """64-bit SimHash of weighted token hashes."""
    if token_hashes.size == 0:
        return 0
    bits = ((token_hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    w = np.ones(token_hashes.size, np.int64) if weights is None else np.asarray(weights, np.int64)
    acc = ((bits * 2 - 1) * w[:, None]).sum(axis=0)
    sig = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            sig |= np.uint64(1) << np.uint64(i)
    return int(sig)


_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def hamming64(a: np.ndarray, b: int) -> np.ndarray:
    """Popcount of a^b for a uint64 array vs a scalar (vectorized)."""
    x = a.astype(np.uint64) ^ np.uint64(b)
    cnt = np.zeros(x.shape, np.int64)
    for _ in range(8):
        cnt += _POPCNT8[(x & np.uint64(0xFF)).astype(np.intp)]
        x = x >> np.uint64(8)
    return cnt


def rolling_fingerprint(text: str, window: int = 8, base: int = 257, mod: int = (1 << 61) - 1) -> int:
    """Deterministic document fingerprint: XOR of Rabin-Karp rolling hashes
    over byte windows — stable under identical content, cheap to compute."""
    data = text.encode("utf-8")
    if len(data) < window:
        return stable_hash_str(text)
    h = 0
    power = pow(base, window - 1, mod)
    acc = 0
    for i, byte in enumerate(data):
        if i >= window:
            h ^= acc
            acc = (acc - data[i - window] * power) % mod
        acc = (acc * base + byte) % mod
    h ^= acc
    return h


# --- HyperLogLog (dense, 2^p registers) ------------------------------------
# Distributed approximate distinct count: each map_batches task folds its
# batch into a register array (partial aggregate), registers merge by
# element-wise max — associative/commutative, so any tree or sequential
# merge order gives the identical sketch.

HLL_P = 12  # 4096 registers, ~1.6% standard error


def hll_fold(token_hashes: np.ndarray, registers: np.ndarray | None = None,
             p: int = HLL_P) -> np.ndarray:
    """Fold 64-bit hashes into an HLL register array (uint8[2^p])."""
    m = 1 << p
    if registers is None:
        registers = np.zeros(m, np.uint8)
    if token_hashes.size == 0:
        return registers
    h = token_hashes.astype(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | (np.uint64(1) << np.uint64(p - 1))
    # rank = leading zeros of the remaining bits + 1, via bit twiddling
    lz = np.full(h.size, 1, np.uint8)
    cur = rest.copy()
    mask_hi = np.uint64(0x8000000000000000)
    for _ in range(64 - p + 1):
        top = (cur & mask_hi) != 0
        done = top
        if done.all():
            break
        lz[~done] += 1
        cur = cur << np.uint64(1)
        cur[done] = mask_hi  # freeze finished lanes
    np.maximum.at(registers, idx, lz)
    return registers


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(registers: np.ndarray) -> float:
    """Standard HLL estimator with small-range (linear counting) correction."""
    m = registers.size
    alpha = 0.7213 / (1.0 + 1.079 / m)
    inv = np.ldexp(1.0, -registers.astype(np.int64))
    est = alpha * m * m / inv.sum()
    zeros = int((registers == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


# --------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005)
# --------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1 << 14  # 16384 counters/row -> eps ~ e/16384 ~ 1.7e-4 of N


def cms_indices(item_hashes: np.ndarray, depth: int = CMS_DEPTH,
                width: int = CMS_WIDTH) -> np.ndarray:
    """(depth, n) row-local counter indices for each item — the j-th hash is
    ``splitmix64(h + j*POLY_P) % width`` (independent-enough rows from one
    base hash, the standard h1+j*h2 construction)."""
    offs = (np.arange(depth, dtype=np.uint64) * _POLY_P)[:, None]
    return (_splitmix64(item_hashes[None, :] + offs) %
            np.uint64(width)).astype(np.int64)


def cms_fold(item_hashes: np.ndarray, counts: np.ndarray | None = None,
             depth: int = CMS_DEPTH, width: int = CMS_WIDTH,
             weights: np.ndarray | None = None) -> np.ndarray:
    """Fold items into a (depth, width) int64 counter array (created when
    ``counts`` is None).  Merge of two sketches = element-wise sum."""
    if counts is None:
        counts = np.zeros((depth, width), np.int64)
    if item_hashes.size:
        idx = cms_indices(item_hashes, depth, width)
        w = np.ones(item_hashes.size, np.int64) if weights is None else weights
        for j in range(depth):
            np.add.at(counts[j], idx[j], w)
    return counts


def cms_query(counts: np.ndarray, item_hashes: np.ndarray) -> np.ndarray:
    """Point estimates (min over rows) — overestimates, never under."""
    depth, width = counts.shape
    if not item_hashes.size:
        return np.empty(0, np.int64)
    idx = cms_indices(item_hashes, depth, width)
    ests = counts[np.arange(depth)[:, None], idx]
    return ests.min(axis=0)
