"""Fuzzy string self-join: all pairs within Levenshtein distance 1.

The deletion-neighborhood (SymSpell) signature scheme turns an edit-
distance join into an equi-join: every string emits the 64-bit hash of
itself and of each single-character-deletion variant, and two strings
within edit distance ≤ 1 are GUARANTEED to share at least one signature
(substitution at i → both i-deletions equal; insertion/deletion → the
shorter string equals one deletion of the longer; equality → all
signatures shared).  Candidates therefore fall out of one signature-
keyed exchange — no quadratic all-pairs, no length-window scans — and
an exact verify pass removes hash-collision and same-signature-but-
distance-2 false positives, so the result is EXACT, never approximate.

Scale shape: |s|+1 signature rows of 8 bytes ride the exchange per
string (the operator is for SHORT keys — names, titles, normalized
URLs, product codes; ``max_len`` guards against someone feeding it
documents).  Pair emission runs inside hash(sig)-coarse buckets with
the sorted run-length numpy pass (``num_buckets`` Python group calls
total); candidate pairs dedup through one distinct groupby before the
verify, so each pair is checked once however many signatures it shares.
The verify touches only CANDIDATES (already near-duplicates), which is
the asymptotically small set — the classic filter-verify join posture.
"""

from __future__ import annotations

import pyarrow as pa


def _lev_le1(a: str, b: str) -> int:
    """Exact Levenshtein distance capped at 2 for |len(a)-len(b)| <= 1:
    returns 0, 1, or 2 (2 meaning "> 1", rejected).  O(len) two-pointer
    sweeps — never the full DP matrix."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == lb:
        # substitution only: one mismatched position allowed
        n = sum(1 for x, y in zip(a, b) if x != y)
        return n if n <= 1 else 2
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # b is one char longer: skip exactly one char of b
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return 1 if a[i:] == b[i + 1:] else 2


def editdist_pairs(ds, key_column: str, value_column: str, *,
                   max_len: int = 128, num_buckets: int = 64):
    """→ Dataset ``(a, b, dist)``: unordered pairs of rows (keys
    ``a < b``) whose ``value_column`` strings are within Levenshtein
    distance 1, with the exact distance (0 for equal strings).  Rows
    whose value exceeds ``max_len`` chars are dropped (loudly wrong
    input for a short-string join — at 128 chars each row already
    ships 129 signatures).

    PRECONDITION: ``key_column`` uniquely identifies its value — the
    candidate dedup aggregates values with Max under that functional
    dependence, so duplicate keys carrying DIFFERENT strings would
    verify (value_a, value_b) combinations that never co-occurred
    (wrong dist, or a silently dropped true pair).  Dedup keys first
    (e.g. ``dedup_exact``) if the table can violate this."""
    import numpy as np
    import pyarrow.compute as pc

    from ray.data.aggregate import Max

    from ..functions.hashing import stable_hash64

    def signatures(b: pa.Table) -> pa.Table:
        keys = b.column(key_column).to_pylist()
        vals = b.column(value_column).to_pylist()
        sig, k_out, v_out = [], [], []
        mask = (1 << 63) - 1  # md5-derived hash is u64; store as int64
        for k, v in zip(keys, vals):
            if v is None or len(v) > max_len:
                continue
            sig.append(stable_hash64(v) & mask)
            k_out.append(k)
            v_out.append(v)
            for i in range(len(v)):
                sig.append(stable_hash64(v[:i] + v[i + 1:]) & mask)
                k_out.append(k)
                v_out.append(v)
        return pa.table({
            "sig": pa.array(sig, pa.int64()),
            "k": pa.array(k_out),
            "v": pa.array(v_out, pa.string()),
        })

    sigs = ds.map_batches(signatures, batch_format="pyarrow")

    def bucket(b: pa.Table) -> pa.Table:
        s = b.column("sig").to_numpy(zero_copy_only=False).astype(np.uint64)
        pb = ((s * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(48)) \
            % np.uint64(num_buckets)
        return b.append_column("__pb", pa.array(pb.astype(np.int64)))

    def emit_pairs(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[("sig", "ascending"),
                                              ("k", "ascending")])
        g = g.take(order)
        s = g.column("sig").to_numpy(zero_copy_only=False)
        k = g.column("k").to_numpy(zero_copy_only=False)
        v = g.column("v")
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        starts = np.flatnonzero(np.concatenate([[True], s[1:] != s[:-1]]))
        ends = np.concatenate([starts[1:], [len(s)]])
        ia_all, ib_all = [], []
        for st, en in zip(starts, ends):
            m = en - st
            if m < 2:
                continue
            ia, ib = np.triu_indices(m, 1)
            ia_all.append(st + ia)
            ib_all.append(st + ib)
        if not ia_all:
            return pa.table({"ka": pa.array([], g.schema.field("k").type),
                             "kb": pa.array([], g.schema.field("k").type),
                             "va": pa.array([], pa.string()),
                             "vb": pa.array([], pa.string())})
        ia = np.concatenate(ia_all)
        ib = np.concatenate(ib_all)
        ka, kb = k[ia], k[ib]
        # a string may emit the same signature twice (deleting either
        # of two equal adjacent chars) — self-pairs carry no signal
        keep = ka != kb
        ia, ib, ka, kb = ia[keep], ib[keep], ka[keep], kb[keep]
        flip = ka > kb
        ia2 = np.where(flip, ib, ia)
        ib2 = np.where(flip, ia, ib)
        va = v.take(pa.array(ia2))
        vb = v.take(pa.array(ib2))
        return pa.table({"ka": pa.array(np.minimum(ka, kb)),
                         "kb": pa.array(np.maximum(ka, kb)),
                         "va": va, "vb": vb})

    # each pair appears once per shared signature — one distinct-pair
    # groupby dedups before the verify (the value columns are
    # functionally dependent on the keys, so Max just carries them)
    cands = (sigs.map_batches(bucket, batch_format="pyarrow")
                 .groupby("__pb")
                 .map_groups(emit_pairs, batch_format="pyarrow")
                 .groupby(["ka", "kb"])
                 .aggregate(Max("va", alias_name="va"),
                            Max("vb", alias_name="vb")))

    def verify(b: pa.Table) -> pa.Table:
        va = b.column("va").to_pylist()
        vb = b.column("vb").to_pylist()
        dist = np.fromiter((_lev_le1(x, y) for x, y in zip(va, vb)),
                           np.int64, len(va))
        ok = dist <= 1
        t = pa.table({"a": b.column("ka"), "b": b.column("kb"),
                      "dist": pa.array(dist, pa.int64())})
        return t.filter(pa.array(ok))

    return cands.map_batches(verify, batch_format="pyarrow")
