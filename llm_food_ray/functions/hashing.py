"""Content hashing + similarity sketches (deterministic, stdlib+numpy).

- sha256 content hash mirrors the reference (llm_food/app.py:456,488).
- MinHash / SimHash / shingle helpers back the dedup stages
  (``stages/dedup.py``) — standard public constructions (Broder '97
  minwise hashing; Charikar '02 simhash), seeded deterministically.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

MERSENNE_PRIME = (1 << 61) - 1
_MAX_HASH = (1 << 32) - 1


def sha256_hex(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


def md5_hex(text: str) -> str:
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def stable_hash64(text: str) -> int:
    """First 8 bytes of md5 as unsigned 64-bit int (portable, matches
    DuckDB's md5 for oracle cross-checks on the hex prefix)."""
    return struct.unpack(">Q", hashlib.md5(text.encode("utf-8")).digest()[:8])[0]


def word_shingles(text: str, k: int = 3) -> list[str]:
    toks = text.split()
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]


_FNV_PRIME = np.uint64(1099511628211)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized (public-domain avalanche)."""
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Unique 60-bit shingle hashes (sorted) for minhash/jaccard.

    Hot path: one crc32 per token (C speed) + a vectorized polynomial
    combine over the k-window, NOT a Python md5 per shingle — at 10^5+
    docs the per-shingle hashlib calls dominate the whole dedup stage.
    60-bit width makes in-pair collisions (which would skew exact-Jaccard
    verification vs a string-set oracle) negligible (~1e-14 per pair)."""
    import zlib

    toks = text.split()
    if not toks:
        return np.empty(0, dtype=np.uint64)
    th = _mix64(
        np.fromiter((zlib.crc32(t.encode("utf-8")) for t in toks),
                    dtype=np.uint64, count=len(toks)) + _GOLDEN
    )
    n = len(th)
    if n < k:
        h = np.uint64(0)
        for v in th:
            h = _mix64(h * _FNV_PRIME + v)
        arr = np.array([h], dtype=np.uint64)
    else:
        m = n - k + 1
        acc = np.zeros(m, dtype=np.uint64)
        for j in range(k):
            acc = acc * _FNV_PRIME + th[j:j + m]
        arr = _mix64(acc)
    return np.unique(arr >> np.uint64(4))   # 60-bit (< Mersenne prime 2^61-1)


def window_fps(text: str, w: int = 8) -> np.ndarray:
    """POSITIONAL 64-bit window fingerprints for duplicate-span
    detection: output[i] is the fingerprint of words i..i+w-1 (0-based;
    whitespace split), NOT uniqued — unlike ``shingle_hashes``, position
    is the payload here.  Texts shorter than ``w`` words yield an empty
    array (no window fits; a shorter-text fallback would break the
    "exactly w words" duplicate semantics the SQL oracle checks).

    This is the REFERENCE definition (per-doc, md5 token hash matching
    ``stages/lm.py:_TokenHasher``) of the fingerprint the vectorized
    batch path in ``stages/dupspans.py:_batch_windows`` computes via
    one dictionary-encode per batch — the two are pinned equal by
    pytest.  Collision posture: a 64-bit alias between two DIFFERENT
    window strings would mark a false duplicate span; expected alias
    count is ~n_windows²/2⁶⁵ (negligible at bench scale).  The 100-TB
    dial is a second independent-base combine (128-bit pair), the same
    widening ``stages/dedup.py:_fingerprint128`` applies to keys."""
    toks = text.split()
    n = len(toks)
    if n < w:
        return np.empty(0, dtype=np.uint64)
    th = np.fromiter((stable_hash64(t) for t in toks),
                     dtype=np.uint64, count=n)
    m = n - w + 1
    acc = np.zeros(m, dtype=np.uint64)
    for j in range(w):
        acc = acc * _FNV_PRIME + th[j:j + m]
    return _mix64(acc)


class MinHasher:
    """num_perm universal-hash minhash ((a*x + b) mod p, p = 2^61-1), fixed
    seed → identical signatures across workers/runs.  a is drawn < 2^31 so
    a*x (x masked to 32 bits) + b stays below 2^64 — no silent uint64
    wraparound inside the modular hash."""

    def __init__(self, num_perm: int = 128, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.num_perm = num_perm
        self.a = rng.randint(1, 2**31, size=num_perm).astype(np.uint64)
        self.b = rng.randint(0, MERSENNE_PRIME, size=num_perm, dtype=np.uint64)

    def signature(self, hashes: np.ndarray) -> np.ndarray:
        if hashes.size == 0:
            return np.full(self.num_perm, _MAX_HASH, dtype=np.uint64)
        x = hashes & np.uint64(_MAX_HASH)   # 32-bit inputs keep a*x+b < 2^64
        # (num_perm, n) — vectorized over both permutations and shingles
        vals = (np.outer(self.a, x) + self.b[:, None]) % MERSENNE_PRIME & _MAX_HASH
        return vals.min(axis=1).astype(np.uint64)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 0.0


_BIT_SHIFTS = np.arange(64, dtype=np.uint64)
_BIT_WEIGHTS = (np.uint64(1) << _BIT_SHIFTS)


def simhash64(text: str) -> int:
    """64-bit simhash over word features (Charikar '02): sum of +/-1 per
    bit weighted by term frequency, threshold at 0.  Bit accumulation is
    one (terms, 64) matrix reduction, not a per-term loop."""
    toks = text.split()
    if not toks:
        return 0
    freq: dict[str, int] = {}
    for t in toks:
        freq[t] = freq.get(t, 0) + 1
    hashes = np.fromiter((stable_hash64(t) for t in freq), dtype=np.uint64,
                         count=len(freq))
    weights = np.fromiter(freq.values(), dtype=np.int64, count=len(freq))
    bits = ((hashes[:, None] >> _BIT_SHIFTS[None, :]) & np.uint64(1)
            ).astype(np.int64)
    acc = ((2 * bits - 1) * weights[:, None]).sum(axis=0)
    return int(_BIT_WEIGHTS[acc > 0].sum())


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def winnow_fingerprint(text: str, k: int = 5, window: int = 4) -> list[int]:
    """Winnowing document fingerprint (Schleimer et al. '03): rolling set
    of k-gram hash minima over a sliding window; returns the sorted unique
    selected hashes."""
    hashes = [stable_hash64(s) & _MAX_HASH for s in word_shingles(text, k)]
    if not hashes:
        return []
    if len(hashes) <= window:
        return sorted({min(hashes)})
    picked: set[int] = set()
    for i in range(len(hashes) - window + 1):
        picked.add(min(hashes[i:i + window]))
    return sorted(picked)
