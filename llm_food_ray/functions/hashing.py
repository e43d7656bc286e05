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


def winnow_rows(texts, k: int = 5, window: int = 4):
    """Vectorized :func:`winnow_fingerprint` over a whole Arrow string
    column: → (int64 doc index per fingerprint, uint64 fingerprint),
    each doc's set identical to ``winnow_fingerprint(t, k, window)``
    (pytest-pinned element-for-element).

    The per-occurrence work (whitespace split, k-token shingle strings,
    sliding-window minima, per-doc dedup) runs in Arrow/numpy kernels;
    the only Python loop is md5 over the batch's DISTINCT shingles
    (boilerplate-heavy corpora repeat shingles — the reason winnowing
    works at all)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lists = pc.utf8_split_whitespace(
        pc.fill_null(texts.cast(pa.string()), ""))
    raw_lens = (pc.list_value_length(lists)
                .to_numpy(zero_copy_only=False).astype(np.int64))
    flat = pc.list_flatten(lists)
    nonempty = pc.not_equal(flat, "")
    cum0 = np.r_[0, np.cumsum(
        nonempty.to_numpy(zero_copy_only=False).astype(np.int64))]
    ends0 = np.cumsum(raw_lens)
    lens = cum0[ends0] - cum0[ends0 - raw_lens]   # tokens per doc
    toks = flat.filter(nonempty)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    n_tok = len(toks)
    empty = (np.empty(0, np.int64), np.empty(0, np.uint64))
    if n_tok == 0:
        return empty
    doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    starts_doc = np.r_[0, np.cumsum(lens)[:-1]]

    # shingle strings: k-shifted element-wise join for full windows;
    # short docs (1 <= len < k) contribute ONE whole-doc shingle
    sh_parts: list = []          # (doc ids, shingle Array) pieces
    if n_tok >= k:
        ok = doc_of[:n_tok - k + 1] == doc_of[k - 1:]
        pos = np.flatnonzero(ok)
    else:
        pos = np.empty(0, np.int64)
    if len(pos):
        cols = [pc.take(toks, pa.array(pos + j)) for j in range(k)]
        full = pc.binary_join_element_wise(*cols, " ")
        sh_parts.append((doc_of[pos], full))
    short = np.flatnonzero((lens > 0) & (lens < k))
    if len(short):
        off = np.empty(len(short) + 1, np.int64)
        off[0] = 0
        np.cumsum(lens[short], out=off[1:])
        vals = pc.take(toks, pa.array(
            np.concatenate([np.arange(starts_doc[d], starts_doc[d]
                                      + lens[d]) for d in short])))
        la = pa.ListArray.from_arrays(pa.array(off, pa.int32()),
                                      vals.combine_chunks()
                                      if isinstance(vals, pa.ChunkedArray)
                                      else vals)
        sh_parts.append((short.astype(np.int64), pc.binary_join(la, " ")))
    if not sh_parts:
        return empty
    sh_doc = np.concatenate([p[0] for p in sh_parts])
    sh_arr = pa.concat_arrays(
        [(p[1].combine_chunks() if isinstance(p[1], pa.ChunkedArray)
          else p[1]).cast(pa.string()) for p in sh_parts])
    # md5 once per DISTINCT shingle
    enc = sh_arr.dictionary_encode()
    hd = np.fromiter((stable_hash64(s) for s in
                      enc.dictionary.to_pylist()),
                     np.uint64, len(enc.dictionary)) & np.uint64(_MAX_HASH)
    h = hd[enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)]

    # order within doc = window start order (full windows are emitted
    # in ascending pos; short-doc singletons are order-free)
    order = np.argsort(sh_doc, kind="stable")
    sh_doc = sh_doc[order]
    h = h[order]
    ns = np.bincount(sh_doc, minlength=len(lens))      # shingles per doc
    d_start = np.r_[0, np.cumsum(ns)[:-1]]

    picked_doc: list = []
    picked_fp: list = []
    # docs with ns <= window pick their single global min; reduceat
    # segments must cover EVERY non-empty doc so each min stays inside
    # its own doc, then the small ones are selected
    present = np.flatnonzero(ns > 0)
    if len(present):
        mins_all = np.minimum.reduceat(h, d_start[present])
        sel = ns[present] <= window
        if sel.any():
            picked_doc.append(present[sel].astype(np.int64))
            picked_fp.append(mins_all[sel])
    # docs with ns > window: sliding-window minima over the flat array,
    # valid where the window stays inside one doc
    if len(h) >= window:
        sw = np.lib.stride_tricks.sliding_window_view(h, window)
        valid = sh_doc[:len(h) - window + 1] == sh_doc[window - 1:]
        vpos = np.flatnonzero(valid)
        if len(vpos):
            picked_doc.append(sh_doc[vpos])
            picked_fp.append(sw[vpos].min(axis=1))
    if not picked_doc:
        return empty
    pd_ = np.concatenate(picked_doc)
    pf = np.concatenate(picked_fp)
    # per-doc dedup (winnowing returns the SET)
    o2 = np.lexsort((pf, pd_))
    pd_, pf = pd_[o2], pf[o2]
    keep = np.r_[True, (pd_[1:] != pd_[:-1]) | (pf[1:] != pf[:-1])]
    return pd_[keep], pf[keep]


def gram_rows(texts, k: int = 2):
    """Vectorized DISTINCT k-gram fingerprints over a whole Arrow
    string column → (int64 doc index, int64 fp) where fp =
    ``stable_hash64(space-joined gram) >> 7`` (57-bit, the fp-space
    join idiom with the exact SQL twin
    ``(('0x' || substr(md5(g), 1, 16))::UBIGINT >> 7)::BIGINT``).

    Docs with fewer than ``k`` tokens emit NOTHING — the SQL
    full-window rule (``WHERE len(ws) >= k``), unlike winnow_rows'
    whole-doc fallback.  Same Arrow split + k-shifted element-wise
    join machinery as winnow_rows; md5 runs once per distinct batch
    gram."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lists = pc.utf8_split_whitespace(
        pc.fill_null(texts.cast(pa.string()), ""))
    raw_lens = (pc.list_value_length(lists)
                .to_numpy(zero_copy_only=False).astype(np.int64))
    flat = pc.list_flatten(lists)
    nonempty = pc.not_equal(flat, "")
    cum0 = np.r_[0, np.cumsum(
        nonempty.to_numpy(zero_copy_only=False).astype(np.int64))]
    ends0 = np.cumsum(raw_lens)
    lens = cum0[ends0] - cum0[ends0 - raw_lens]
    toks = flat.filter(nonempty)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    n_tok = len(toks)
    empty = (np.empty(0, np.int64), np.empty(0, np.int64))
    if n_tok < k:
        return empty
    doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    ok = doc_of[:n_tok - k + 1] == doc_of[k - 1:]
    pos = np.flatnonzero(ok)
    if not len(pos):
        return empty
    cols = [pc.take(toks, pa.array(pos + j)) for j in range(k)]
    grams = (pc.binary_join_element_wise(*cols, " ") if k > 1
             else cols[0])
    if isinstance(grams, pa.ChunkedArray):
        grams = grams.combine_chunks()
    enc = grams.dictionary_encode()
    hd = np.fromiter((stable_hash64(s) >> 7 for s in
                      enc.dictionary.to_pylist()),
                     np.int64, len(enc.dictionary))
    h = hd[enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)]
    d = doc_of[pos]
    o2 = np.lexsort((h, d))
    d, h = d[o2], h[o2]
    keep = np.r_[True, (d[1:] != d[:-1]) | (h[1:] != h[:-1])]
    return d[keep], h[keep]


def winnow_min_per_doc(texts, k: int = 5, window: int = 4) -> np.ndarray:
    """Per-doc MIN winnowing fingerprint (0 for empty docs) — the
    cheap whole-document fingerprint column, vectorized via
    :func:`winnow_rows`."""
    di, fp = winnow_rows(texts, k=k, window=window)
    n = len(texts)
    sentinel = np.uint64(0xFFFFFFFFFFFFFFFF)
    out = np.full(n, sentinel, np.uint64)
    np.minimum.at(out, di, fp)
    out[out == sentinel] = 0
    return out


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
