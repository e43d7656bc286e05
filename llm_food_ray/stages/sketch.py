"""Mergeable cardinality sketches: HyperLogLog distinct counting.

Exact ``COUNT(DISTINCT)`` (``textstats.grouped_count_distinct``) ships
one exchange row per distinct (key, value) pair — at 100 TB a
trillion-row exchange for a telemetry number.  The HLL sketch replaces
it with a FIXED 2^p bytes per (group, block): each batch folds its
values into max-of-rho registers locally, the merge is an elementwise
byte max over blocks-bounded rows, and the estimate reads off the merged
registers.  Exchange volume: groups × blocks × 4 KiB, independent of
both corpus size and cardinality.

Everything is deterministic and engine-reproducible — the hash is the
md5-prefix ``stable_hash64`` (replicable as DuckDB
``('0x' || substr(md5(v), 1, 16))::UBIGINT``), rho is integer bit
arithmetic, and the estimator is the standard Flajolet et al. 2007
alpha_m correction with the small-range linear-counting branch, rounded
to 6 decimals so summation-order ulps cancel — so unlike most sketches
this one has a FULL value-level SQL oracle, not just a tolerance test.

No reference analogue; brief-scope ("a novel sketch") training-data
operator.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def _alpha(m: int) -> float:
    # Flajolet et al. 2007 bias constant (m >= 128 branch)
    return 0.7213 / (1.0 + 1.079 / m)


def _registers_for(values, p: int) -> np.ndarray:
    """Max-rho register array (2^p int8) for a list of value strings."""
    from ..functions.hashing import stable_hash64

    m = 1 << p
    regs = np.zeros(m, np.int8)
    if not len(values):
        return regs
    h = np.fromiter((stable_hash64(v) for v in values), np.uint64,
                    len(values))
    bucket = (h >> np.uint64(64 - p)).astype(np.int64)
    rem = (h & np.uint64((1 << (64 - p)) - 1)).astype(np.int64)
    # bit_length via frexp — exact because rem < 2^52 < 2^53
    bl = np.frexp(rem.astype(np.float64))[1]
    rho = np.where(rem > 0, (64 - p) + 1 - bl, (64 - p) + 1).astype(np.int8)
    np.maximum.at(regs, bucket, rho)
    return regs


def _estimate(regs: np.ndarray, p: int, digits: int = 6) -> float:
    m = 1 << p
    s = float(np.sum(np.power(2.0, -regs.astype(np.float64))))
    e = _alpha(m) * m * m / s
    zeros = int(np.count_nonzero(regs == 0))
    if e <= 2.5 * m and zeros > 0:
        e = m * math.log(m / zeros)
    return round(e, digits)


def _fold_registers(ds, value_column: str, p: int) -> np.ndarray:
    """Merged register array for one dataset's value column: per-batch
    distinct fold → one 2^p-byte row per block → elementwise max on the
    driver (blocks-bounded, 4 KiB each)."""
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([value_column]).group_by([value_column]).aggregate([])
        vals = [str(v) for v in t.column(value_column).to_pylist()]
        return pa.table({"regs": pa.array([_registers_for(vals, p).tobytes()],
                                          pa.binary())})

    regs = np.zeros(m, np.int8)
    for b in (ds.map_batches(partial, batch_format="pyarrow")
                .iter_batches(batch_size=None, batch_format="pyarrow")):
        for raw in b.column("regs").to_pylist():
            np.maximum(regs, np.frombuffer(raw, np.int8), out=regs)
    return regs


def hll_overlap(ds_a, ds_b, value_column: str, *, p: int = 12):
    """Approximate set overlap between two corpora's value columns via
    HLL inclusion–exclusion: ``|A∩B| ≈ |A| + |B| − |A∪B|``, where the
    union sketch is the elementwise max of the two register arrays —
    the MERGEABILITY property that makes the sketch composable across
    snapshots without re-reading either (the crawl-churn telemetry
    question "how much of snapshot B is new?" answered from two 4 KiB
    sketches).

    Returns a one-row table (n_a, n_b, n_union, n_overlap), each a
    deterministic round-6 HLL estimate — value-checkable against a SQL
    replica like :func:`hll_count_distinct`.  Scale shape: two
    independent streaming folds, blocks-bounded 4 KiB exchange rows,
    nothing else."""
    ra = _fold_registers(ds_a, value_column, p)
    rb = _fold_registers(ds_b, value_column, p)
    ea = _estimate(ra, p)
    eb = _estimate(rb, p)
    eu = _estimate(np.maximum(ra, rb), p)
    return pa.table({
        "n_a": pa.array([ea], pa.float64()),
        "n_b": pa.array([eb], pa.float64()),
        "n_union": pa.array([eu], pa.float64()),
        "n_overlap": pa.array([round(ea + eb - eu, 6)], pa.float64()),
    })


def hll_count_distinct(ds, key_column: str, value_column: str, *,
                       p: int = 12, name: str = "approx_distinct",
                       num_buckets: int = 64):
    """Approximate ``COUNT(DISTINCT value)`` per key via a 2^p-register
    HLL — one (group, registers) row per (group, block) on the
    exchange, elementwise-max merge, deterministic estimate (standard
    error ≈ 1.04/sqrt(2^p) ≈ 1.6% at the default p=12).

    Scale shape: the per-batch fold hashes only the batch's DISTINCT
    (key, value) pairs (Arrow group_by first), register rows ride as
    opaque 4 KiB binary, and the merge exchange groups by
    hash(key)-coarse bucket — ``num_buckets`` Python group calls TOTAL,
    independent of key cardinality (a per-host report is millions of
    keys; one ``map_groups`` table per key would be the
    group-per-key anti-pattern).  Inside a bucket the sorted register
    rows collapse per key with one ``np.maximum.reduceat`` and the
    estimates read off a single vectorized pass over the merged
    (keys × 2^p) matrix; only the rare linear-counting rows keep the
    scalar ``math.log`` so the estimate stays bit-identical to
    :func:`_estimate` (and to the SQL oracle twin)."""
    import pyarrow.compute as pc

    from ..functions.hashing import stable_hash64

    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        t = (batch.select([key_column, value_column])
             .group_by([key_column, value_column]).aggregate([]))
        keys = t.column(key_column).to_pylist()
        vals = [str(v) for v in t.column(value_column).to_pylist()]
        out_k, out_r = [], []
        by_key: dict = {}
        for k, v in zip(keys, vals):
            by_key.setdefault(k, []).append(v)
        for k, vs in by_key.items():
            out_k.append(k)
            out_r.append(_registers_for(vs, p).tobytes())
        # type the key column explicitly — pa.array([]) on an empty
        # batch would infer null and clash with sibling blocks' schema
        ktype = batch.schema.field(key_column).type
        pb = pa.array([stable_hash64(str(k)) % num_buckets for k in out_k],
                      pa.int32())
        return pa.table({key_column: pa.array(out_k, ktype),
                         "regs": pa.array(out_r, pa.binary()),
                         "__pb": pb})

    def merge_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({key_column: pa.array([], pa.string()),
                             name: pa.array([], pa.float64())})
        order = pc.sort_indices(t, sort_keys=[(key_column, "ascending")])
        t = t.take(order)
        k = t.column(key_column)
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        if t.num_rows == 1:
            heads = np.array([0], np.int64)
        else:
            ne = pc.fill_null(
                pc.not_equal(k.slice(1), k.slice(0, len(k) - 1)), True)
            heads = np.flatnonzero(
                np.r_[True, ne.to_numpy(zero_copy_only=False)])
        stack = np.frombuffer(
            b"".join(t.column("regs").to_pylist()), np.int8
        ).reshape(t.num_rows, m)
        regs = np.maximum.reduceat(stack, heads, axis=0)
        # vectorized estimate: one 2^-x pass over the merged matrix;
        # rows on the small-range branch redo the scalar math.log path
        # of _estimate so values stay bit-identical to the 1-key merge
        s = np.power(2.0, -regs.astype(np.float64)).sum(axis=1)
        e = _alpha(m) * m * m / s
        zeros = np.count_nonzero(regs == 0, axis=1)
        # scalar round(): np.round's scale-rint can drift a last-decimal
        # ulp from Python/DuckDB round, and the oracle is value-level
        out = np.fromiter((round(float(x), 6) for x in e), np.float64,
                          len(e))
        for i in np.flatnonzero((e <= 2.5 * m) & (zeros > 0)):
            out[i] = round(m * math.log(m / int(zeros[i])), 6)
        return pa.table({key_column: k.take(pa.array(heads)),
                         name: pa.array(out, pa.float64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("__pb")
              .map_groups(merge_bucket, batch_format="pyarrow"))
