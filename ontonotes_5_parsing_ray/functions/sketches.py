"""Mergeable sketches for approximate distributed aggregates.

HyperLogLog is THE 100 TB count-distinct tool: exact distinct counting
needs a shuffle that moves every distinct value once (implemented in
``queries.events_unique_users_by_type``), while an HLL register array is a
few KB per group, merges by elementwise max (commutative, associative,
idempotent — safe under task re-execution), and answers within
~1.04/sqrt(m).

Pure-kernel module: numpy only, no Ray imports, deterministic (value
hashing via the fixed-key siphash in :mod:`functions.hashing`), so the
same sketch built on the driver, in a test, or in a distributed partial is
byte-identical.
"""

from __future__ import annotations

import numpy as np

from .hashing import hash64_vec

# 2^P registers. P=12 -> 4096 bytes per sketch, relative error
# 1.04/sqrt(4096) ~= 1.6% — the classic storage/accuracy sweet spot.
HLL_P = 12
HLL_M = 1 << HLL_P
# bias constant alpha_m for m >= 128 (Flajolet et al. 2007)
_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def hll_new() -> np.ndarray:
    """Empty register array (uint8[m])."""
    return np.zeros(HLL_M, dtype=np.uint8)


def hll_hashes_md5(values) -> np.ndarray:
    """64-bit md5 value hashes (uint64) for an HLL fold that has an EXACT
    SQL twin: ``md5_number_upper(CAST(v AS VARCHAR))`` in DuckDB equals
    ``token_hash64_md5(str(v))``. Dedupe first — duplicates can't change
    registers, and the md5 loop is per-DISTINCT-value."""
    from .hashing import token_hash64_md5

    uniq = np.unique(np.asarray(values))
    return np.fromiter((token_hash64_md5(str(v)) for v in uniq),
                       dtype=np.uint64, count=len(uniq))


def hll_add(registers: np.ndarray, values) -> np.ndarray:
    """Fold a batch of values into ``registers`` in place (vectorized):
    register index = top P hash bits, rank = leading-zero count of the
    remaining 64-P bits + 1."""
    if len(values) == 0:
        return registers
    return hll_add_hashes(registers, hash64_vec(values))


def hll_add_hashes(registers: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Fold precomputed uint64 value hashes into ``registers`` in place —
    the hash-agnostic core of :func:`hll_add` (siphash default; pass
    :func:`hll_hashes_md5` output when the sketch must be SQL-replayable)."""
    if len(h) == 0:
        return registers
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = h << np.uint64(HLL_P)  # low 64-P bits shifted to the top
    # rank = position of the first 1-bit in `rest` (1-based), capped
    rank = np.ones(len(h), dtype=np.uint8)
    mask = np.uint64(1) << np.uint64(63)
    live = rest.copy()
    # vectorized leading-zero count: 64-P iterations max, each a cheap
    # bitwise pass over the batch (numpy has no clz kernel)
    for _ in range(64 - HLL_P):
        zero_top = (live & mask) == 0
        undecided = zero_top & (live != 0)
        rank[undecided] += 1
        live = np.where(undecided, live << np.uint64(1), np.uint64(0))
    rank[rest == 0] = np.uint8(64 - HLL_P + 1)
    np.maximum.at(registers, idx, rank)
    return registers


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Union of two sketches: elementwise max (idempotent)."""
    return np.maximum(a, b)


def hll_estimate(registers: np.ndarray) -> float:
    """Cardinality estimate with the standard small-range (linear
    counting) correction."""
    m = float(HLL_M)
    est = _ALPHA * m * m / float(np.sum(np.exp2(-registers.astype(np.float64))))
    zeros = int(np.count_nonzero(registers == 0))
    if est <= 2.5 * m and zeros:
        return m * np.log(m / zeros)
    return est


# ---------------------------------------------------------------------------
# Bloom filter: the semi-join prefilter for key sets too big to broadcast
# exactly. Mergeable by bitwise OR (same partial/merge contract as HLL);
# NO false negatives by construction, so "bloom prefilter -> exact verify"
# compositions stay exact while the fact stream shrinks by ~(1 - fpr).
# ---------------------------------------------------------------------------

_BLOOM_H2_KEY = "5c3a91e07bd24f68"


def bloom_new(m_bits: int = 1 << 23) -> np.ndarray:
    """Empty filter (uint8[m_bits/8]); default 1 MiB."""
    return np.zeros(m_bits >> 3, dtype=np.uint8)


def _bloom_idx(values, m_bits: int, n_hashes: int) -> np.ndarray:
    """(n, k) bit indices via double hashing h1 + i*h2 (Kirsch-Mitzenmacher)."""
    import pandas as pd

    h1 = hash64_vec(values)
    h2 = pd.util.hash_array(
        np.asarray(values, dtype=object), hash_key=_BLOOM_H2_KEY,
        categorize=False) | np.uint64(1)   # odd -> full-period stride
    i = np.arange(n_hashes, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m_bits))


def bloom_add(bits: np.ndarray, values, n_hashes: int = 7) -> np.ndarray:
    """Fold values into the filter in place (vectorized)."""
    if len(values) == 0:
        return bits
    idx = _bloom_idx(values, len(bits) << 3, n_hashes).ravel()
    np.bitwise_or.at(bits, (idx >> np.uint64(3)).astype(np.int64),
                     np.left_shift(np.uint8(1),
                                   (idx & np.uint64(7)).astype(np.uint8)))
    return bits


def bloom_contains(bits: np.ndarray, values, n_hashes: int = 7) -> np.ndarray:
    """Vectorized membership mask (true = maybe present; false = DEFINITELY
    absent)."""
    if len(values) == 0:
        return np.zeros(0, dtype=bool)
    idx = _bloom_idx(values, len(bits) << 3, n_hashes)
    byte = bits[(idx >> np.uint64(3)).astype(np.int64)]
    hit = (byte >> (idx & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
    return hit.all(axis=1)


# ---------------------------------------------------------------------------
# Count-Min sketch: approximate frequencies / heavy hitters in fixed
# memory. Mergeable by elementwise SUM; one-sided error (estimates never
# undercount). Completes the sketch family: HLL (distinct), Bloom
# (membership), CMS (frequency).
# ---------------------------------------------------------------------------

CMS_D = 4           # rows (error probability ~ e^-D)
CMS_W = 1 << 14     # counters per row (overcount ~ total/W per item)
_CMS_KEYS = ["a1b2c3d4e5f60718", "0123456789abcdef",
             "fedcba9876543210", "1122334455667788"]


def cms_new() -> np.ndarray:
    """Empty (D, W) int64 counter matrix (~512 KB)."""
    return np.zeros((CMS_D, CMS_W), dtype=np.int64)


def _cms_idx(values) -> np.ndarray:
    """(D, n) counter indices — one fixed-key siphash per row."""
    import pandas as pd

    arr = np.asarray(values, dtype=object)
    return np.stack([
        (pd.util.hash_array(arr, hash_key=k, categorize=False)
         % np.uint64(CMS_W)).astype(np.int64)
        for k in _CMS_KEYS
    ])


def _cms_idx_md5(values) -> np.ndarray:
    """(D, n) counter indices from md5 row hashes — the SQL-replayable
    variant (DuckDB: ``md5_number_upper(d || ':' || token) % W``). Per-row
    md5 loops over DISTINCT values only — callers pre-count."""
    from .hashing import token_hash64_md5

    arr = np.asarray(values, dtype=object)
    return np.stack([
        np.fromiter((token_hash64_md5(f"{d}:{v}") % CMS_W for v in arr),
                    dtype=np.int64, count=len(arr))
        for d in range(CMS_D)
    ])


def cms_add(cms: np.ndarray, values, counts=None,
            md5: bool = False) -> np.ndarray:
    """Fold values (optionally pre-counted) into the sketch in place."""
    if len(values) == 0:
        return cms
    idx = _cms_idx_md5(values) if md5 else _cms_idx(values)
    c = (np.ones(len(idx[0]), dtype=np.int64) if counts is None
         else np.asarray(counts, dtype=np.int64))
    for d in range(CMS_D):
        np.add.at(cms[d], idx[d], c)
    return cms


def cms_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a + b


def cms_query(cms: np.ndarray, values, md5: bool = False) -> np.ndarray:
    """Estimated counts (never below the true count)."""
    if len(values) == 0:
        return np.zeros(0, dtype=np.int64)
    idx = _cms_idx_md5(values) if md5 else _cms_idx(values)
    return np.min(
        np.stack([cms[d][idx[d]] for d in range(CMS_D)]), axis=0)
