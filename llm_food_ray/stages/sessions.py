"""Sessionization — the ordered-window-per-key primitive over an event
stream: a user's events split into sessions wherever the gap to the
previous event exceeds a threshold.

Scale shape: ONE exchange keyed on a coarse hash bucket of the user id
(sessionization inherently co-locates each user's events), then a fully
vectorized per-bucket sweep — lexsort by (user, ts, event_id), gap flags
via shifted comparisons, per-user session indices via two cumsums.  No
per-user Python groups (millions of small user groups would pay per-group
overhead — the same reason the dedup family buckets coarsely).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _ts_i64_us(arr):
    """Chunk-combined int64 MICROSECONDS view of a timestamp column,
    normalizing the tick unit first (``from_pandas`` yields ns, parquet
    us) so every second-denominated threshold in this module means
    seconds regardless of input resolution.  ns → us truncates
    sub-microsecond ticks (``safe=False``) — this family's thresholds
    are whole seconds, so the truncation is inert."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_timestamp(arr.type) and arr.type.unit != "us":
        arr = arr.cast(pa.timestamp("us"), safe=False)
    return arr.cast(pa.int64()).to_numpy()


def sessionize(ds, user_column: str = "user_id", ts_column: str = "ts",
               id_column: str = "event_id", *, gap_seconds: int = 1800,
               num_buckets: int = 64):
    """→ Dataset (id, user, ts, session_idx): ``session_idx`` is 0-based
    per user in (ts, id) order; a new session starts when the gap to the
    user's previous event is STRICTLY greater than ``gap_seconds``.
    Deterministic under same-timestamp ties (id breaks them)."""
    from ..stages.dedup import _u64_col

    Cu = np.uint64(num_buckets)

    def add_bucket(batch: pa.Table) -> pa.Table:
        u = _u64_col(batch, user_column)
        return batch.append_column(
            "__ub", pa.array((u % Cu).astype(np.int32)))

    def per_bucket(t: pa.Table) -> pa.Table:
        users = _u64_col(t, user_column)
        ids = _u64_col(t, id_column)
        ts_col_arr = t.column(ts_column)
        if isinstance(ts_col_arr, pa.ChunkedArray):
            ts_col_arr = ts_col_arr.combine_chunks()
        # timestamp[us] → int64 microseconds (zero-copy view)
        ts_us = _ts_i64_us(ts_col_arr)
        order = np.lexsort((ids, ts_us, users))
        u = users[order]
        s = ts_us[order]
        gap_us = np.int64(gap_seconds) * 1_000_000
        new_user = np.r_[True, u[1:] != u[:-1]]
        big_gap = np.r_[True, (s[1:] - s[:-1]) > gap_us]
        new_session = new_user | big_gap
        # per-user 0-based session index: global cumsum of session starts
        # minus the cumsum value at each user's first row
        sess_global = np.cumsum(new_session)
        user_base = np.maximum.accumulate(np.where(new_user, sess_global, 0))
        session_idx = (sess_global - user_base).astype(np.int64)
        idx = pa.array(order)
        return pa.table({
            id_column: t.column(id_column).combine_chunks().take(idx)
            if isinstance(t.column(id_column), pa.ChunkedArray)
            else t.column(id_column).take(idx),
            user_column: t.column(user_column).combine_chunks().take(idx)
            if isinstance(t.column(user_column), pa.ChunkedArray)
            else t.column(user_column).take(idx),
            ts_column: ts_col_arr.take(idx),
            "session_idx": pa.array(session_idx),
        })

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
              .groupby("__ub")
              .map_groups(per_bucket, batch_format="pyarrow"))


def asof_last_match(ds, user_column: str = "user_id", ts_column: str = "ts",
                    id_column: str = "event_id",
                    match_column: str = "event_type",
                    match_value: str = "purchase", *,
                    out_column: str = "last_match_ts",
                    num_buckets: int = 64):
    """As-of (fill-forward) self-join: for every event, the timestamp of
    the same user's most recent matching event at-or-before it (in
    (ts, id) order, inclusive of the event itself) — the per-key ordered
    carry-forward that a plain equi-join cannot express.

    Same scale shape as :func:`sessionize`: ONE coarse user-bucketed
    exchange, then a per-bucket vectorized sweep (lexsort + a grouped
    cummax in pandas' C kernels).  NULL until the user's first match."""
    from ..stages.dedup import _u64_col

    Cu = np.uint64(num_buckets)

    def add_bucket(batch: pa.Table) -> pa.Table:
        u = _u64_col(batch, user_column)
        return batch.append_column(
            "__ub", pa.array((u % Cu).astype(np.int32)))

    def per_bucket(t: pa.Table) -> pa.Table:
        import pandas as pd

        users = _u64_col(t, user_column)
        ids = _u64_col(t, id_column)
        ts_arr = t.column(ts_column)
        if isinstance(ts_arr, pa.ChunkedArray):
            ts_arr = ts_arr.combine_chunks()
        ts_us = _ts_i64_us(ts_arr)
        mcol = t.column(match_column)
        if isinstance(mcol, pa.ChunkedArray):
            mcol = mcol.combine_chunks()
        import pyarrow.compute as pc

        is_match = pc.equal(mcol, match_value).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ts_us, users))
        u = users[order]
        s = ts_us[order]
        m = is_match[order]
        # sentinel below every real timestamp; grouped integer cummax is
        # the carry-forward (NaN-based cummax would not fill, pandas
        # leaves NaN rows NaN)
        vals = np.where(m, s, np.int64(-1))
        filled = (pd.Series(vals).groupby(pd.Series(u)).cummax()
                  .to_numpy().astype(np.int64))
        out_ts = pa.array(filled, pa.int64()).cast(pa.timestamp("us"))
        out_ts = pa.compute.if_else(
            pa.array(filled < 0), pa.nulls(len(filled), pa.timestamp("us")),
            out_ts)
        idx = pa.array(order)

        def take(name):
            c = t.column(name)
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            return c.take(idx)

        return pa.table({
            id_column: take(id_column),
            user_column: take(user_column),
            ts_column: ts_arr.take(idx),
            out_column: out_ts,
        })

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
              .groupby("__ub")
              .map_groups(per_bucket, batch_format="pyarrow"))

def running_totals(ds, user_column: str = "user_id", ts_column: str = "ts",
                   id_column: str = "event_id", value_column: str = "value",
                   *, num_buckets: int = 64):
    """Per-key cumulative window — the ``SUM(v) OVER (PARTITION BY user
    ORDER BY ts, id ROWS UNBOUNDED PRECEDING)`` / ``row_number()``
    analogue over an event stream.

    → Dataset (id, user, ts, row_idx, run_cents): ``row_idx`` is the
    1-based position of the event within its user's (ts, id) order and
    ``run_cents`` the running sum of ``round(value * 100)``.

    Integer-exact by construction: the value is scaled to cents (round
    half away from zero, matching SQL ``round()`` for the non-negative
    amounts this targets) BEFORE accumulating, so the running sum is an
    int64 segmented cumsum with no float summation-order divergence vs
    the SQL window the oracle runs.

    Scale shape: same as :func:`sessionize` — ONE coarse user-bucketed
    exchange (a cumulative window inherently co-locates each user's
    events), then a fully vectorized per-bucket sweep: lexsort by
    (user, ts, id), one global cumsum, per-user bases peeled off via a
    forward-filled segment-start index.  No per-user Python groups.
    """
    from ..stages.dedup import _u64_col

    Cu = np.uint64(num_buckets)

    def add_bucket(batch: pa.Table) -> pa.Table:
        u = _u64_col(batch, user_column)
        return batch.append_column(
            "__ub", pa.array((u % Cu).astype(np.int32)))

    def per_bucket(t: pa.Table) -> pa.Table:
        users = _u64_col(t, user_column)
        ids = _u64_col(t, id_column)
        ts_arr = t.column(ts_column)
        if isinstance(ts_arr, pa.ChunkedArray):
            ts_arr = ts_arr.combine_chunks()
        ts_us = _ts_i64_us(ts_arr)
        vcol = t.column(value_column)
        if isinstance(vcol, pa.ChunkedArray):
            vcol = vcol.combine_chunks()
        v = vcol.to_numpy(zero_copy_only=False).astype(np.float64)

        order = np.lexsort((ids, ts_us, users))
        u = users[order]
        cents = np.floor(v[order] * 100.0 + 0.5).astype(np.int64)
        n = len(u)
        new_user = np.r_[True, u[1:] != u[:-1]]
        # index of each row's segment start, forward-filled
        start = np.maximum.accumulate(
            np.where(new_user, np.arange(n, dtype=np.int64), 0))
        cs = np.cumsum(cents)
        base = cs[start] - cents[start]          # exclusive prefix at start
        run_cents = cs - base
        row_idx = np.arange(n, dtype=np.int64) - start + 1
        idx = pa.array(order)

        def take(name):
            c = t.column(name)
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            return c.take(idx)

        return pa.table({
            id_column: take(id_column),
            user_column: take(user_column),
            ts_column: ts_arr.take(idx),
            "row_idx": pa.array(row_idx),
            "run_cents": pa.array(run_cents),
        })

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
              .groupby("__ub")
              .map_groups(per_bucket, batch_format="pyarrow"))


def rolling_sums(ds, user_column: str = "user_id", ts_column: str = "ts",
                 id_column: str = "event_id", value_column: str = "value",
                 *, window_rows: int = 5, num_buckets: int = 64):
    """Per-key trailing fixed-size window — the ``SUM(v) OVER
    (PARTITION BY user ORDER BY ts, id ROWS BETWEEN k-1 PRECEDING AND
    CURRENT ROW)`` analogue, the anomaly/recency signal the cumulative
    :func:`running_totals` can't express (old events never age out of
    a cumulative sum).

    → Dataset (id, user, ts, roll_cents, n_window): ``roll_cents`` the
    sum of ``round(value * 100)`` over the trailing ``window_rows``
    events of the same user (inclusive), ``n_window`` how many rows the
    window actually held (< k near each user's start).

    Integer-exact like running_totals: cents first, then the rolling
    sum is TWO reads of one int64 cumsum — ``cs[i] − pre[lo]`` with
    ``lo = max(segment_start, i−k+1)`` — so no float summation-order
    divergence vs the SQL window frame.

    Scale shape: ONE coarse hash(user) exchange (windows are per-user
    local), then a fully vectorized per-bucket sweep — lexsort, one
    cumsum, numpy index arithmetic for the frame bounds.  No per-user
    Python groups; bucket memory is bucket-rows-bounded.
    """
    if window_rows < 1:
        raise ValueError("window_rows must be >= 1")
    from ..stages.dedup import _u64_col

    Cu = np.uint64(num_buckets)
    k = int(window_rows)

    def add_bucket(batch: pa.Table) -> pa.Table:
        u = _u64_col(batch, user_column)
        return batch.append_column(
            "__ub", pa.array((u % Cu).astype(np.int32)))

    def per_bucket(t: pa.Table) -> pa.Table:
        users = _u64_col(t, user_column)
        ids = _u64_col(t, id_column)
        ts_arr = t.column(ts_column)
        if isinstance(ts_arr, pa.ChunkedArray):
            ts_arr = ts_arr.combine_chunks()
        ts_us = _ts_i64_us(ts_arr)
        vcol = t.column(value_column)
        if isinstance(vcol, pa.ChunkedArray):
            vcol = vcol.combine_chunks()
        v = vcol.to_numpy(zero_copy_only=False).astype(np.float64)

        order = np.lexsort((ids, ts_us, users))
        u = users[order]
        cents = np.floor(v[order] * 100.0 + 0.5).astype(np.int64)
        n = len(u)
        new_user = np.r_[True, u[1:] != u[:-1]]
        start = np.maximum.accumulate(
            np.where(new_user, np.arange(n, dtype=np.int64), 0))
        cs = np.cumsum(cents)
        pre = cs - cents                         # exclusive prefix at i
        idxs = np.arange(n, dtype=np.int64)
        lo = np.maximum(start, idxs - (k - 1))
        roll_cents = cs - pre[lo]
        n_window = idxs - lo + 1
        idx = pa.array(order)

        def take(name):
            c = t.column(name)
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            return c.take(idx)

        return pa.table({
            id_column: take(id_column),
            user_column: take(user_column),
            ts_column: ts_arr.take(idx),
            "roll_cents": pa.array(roll_cents),
            "n_window": pa.array(n_window),
        })

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
              .groupby("__ub")
              .map_groups(per_bucket, batch_format="pyarrow"))


def rolling_time_sums(ds, user_column: str = "user_id",
                      ts_column: str = "ts", id_column: str = "event_id",
                      value_column: str = "value", *,
                      window_seconds: int = 3600, num_buckets: int = 64):
    """Per-key trailing TIME window — the ``SUM(v) OVER (PARTITION BY
    user ORDER BY ts RANGE BETWEEN INTERVAL w PRECEDING AND CURRENT
    ROW)`` analogue, completing the window-frame family (cumulative
    :func:`running_totals`, count-frame :func:`rolling_sums`, and this
    time-frame).  SQL RANGE semantics: the frame holds every event of
    the user with ``ts ∈ [ts_i − w, ts_i]`` INCLUDING later-id peers at
    exactly ``ts_i`` (peers share the frame).

    → Dataset (id, user, ts, roll_cents, n_window).

    Scale shape: ONE coarse hash(user) exchange, then a vectorized
    per-bucket sweep with NO per-user loop even for the time bound:
    the frame's upper edge is the end of the (user, ts) tie-run
    (run-length arithmetic); the lower edge comes from a union-merge —
    concatenate (user, ts−w) query rows with the data rows, one
    lexsort, and the exclusive running data-count at each query
    position IS the global lower index (the as-of join trick).  Frame
    sums are two reads of the per-user int64 cents cumsum."""
    if window_seconds < 0:
        raise ValueError("window_seconds must be >= 0")
    from ..stages.dedup import _u64_col

    Cu = np.uint64(num_buckets)
    # _ts_i64_us normalizes every input resolution to microseconds
    w_ticks = np.int64(int(window_seconds) * 1_000_000)

    def add_bucket(batch: pa.Table) -> pa.Table:
        u = _u64_col(batch, user_column)
        return batch.append_column(
            "__ub", pa.array((u % Cu).astype(np.int32)))

    def per_bucket(t: pa.Table) -> pa.Table:
        users = _u64_col(t, user_column)
        ids = _u64_col(t, id_column)
        ts_arr = t.column(ts_column)
        if isinstance(ts_arr, pa.ChunkedArray):
            ts_arr = ts_arr.combine_chunks()
        ts_us = _ts_i64_us(ts_arr)
        vcol = t.column(value_column)
        if isinstance(vcol, pa.ChunkedArray):
            vcol = vcol.combine_chunks()
        v = vcol.to_numpy(zero_copy_only=False).astype(np.float64)

        order = np.lexsort((ids, ts_us, users))
        u = users[order]
        ts_s = ts_us[order]
        cents = np.floor(v[order] * 100.0 + 0.5).astype(np.int64)
        n = len(u)
        idxs = np.arange(n, dtype=np.int64)
        new_user = np.r_[True, u[1:] != u[:-1]]
        start = np.maximum.accumulate(np.where(new_user, idxs, 0))
        cs = np.cumsum(cents)
        base = cs[start] - cents[start]
        cs_user = cs - base                      # inclusive per-user cumsum
        pre_user = cs_user - cents               # exclusive per-user cumsum

        # upper edge: end of the (user, ts) tie-run (RANGE peers)
        new_run = new_user | np.r_[True, ts_s[1:] != ts_s[:-1]]
        run_id = np.cumsum(new_run) - 1
        run_starts = idxs[new_run]
        run_ends = np.r_[run_starts[1:], n] - 1
        hi = run_ends[run_id]

        # lower edge: union-merge of (user, ts - w) queries with the
        # data rows; queries sort before equal-ts data (is_data key),
        # so the exclusive data-count at a query position is the first
        # global index with (user, ts) >= (user_i, ts_i - w)
        q_ts = ts_s - w_ticks
        u2 = np.concatenate([u, u])
        t2 = np.concatenate([q_ts, ts_s])
        is_data = np.concatenate([np.zeros(n, np.int64),
                                  np.ones(n, np.int64)])
        order2 = np.lexsort((is_data, t2, u2))
        csd = np.cumsum(is_data[order2])
        excl = csd - is_data[order2]
        lo = np.empty(n, dtype=np.int64)
        qpos = np.nonzero(is_data[order2] == 0)[0]
        lo[order2[qpos]] = excl[qpos]            # query j sits at index j

        roll_cents = cs_user[hi] - pre_user[lo]
        n_window = hi - lo + 1
        idx = pa.array(order)

        def take(name):
            c = t.column(name)
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            return c.take(idx)

        return pa.table({
            id_column: take(id_column),
            user_column: take(user_column),
            ts_column: ts_arr.take(idx),
            "roll_cents": pa.array(roll_cents),
            "n_window": pa.array(n_window),
        })

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
              .groupby("__ub")
              .map_groups(per_bucket, batch_format="pyarrow"))


def range_join_nearby(ds, key_column: str = "o_custkey",
                      ts_column: str = "o_orderdate",
                      id_column: str = "o_orderkey",
                      value_column: str = "o_totalprice", *,
                      window_days: int = 90, num_buckets: int = 64):
    """Equi-key + interval range join (self): for every row, the count
    and cents-sum of OTHER rows sharing its key whose timestamp falls in
    [t − window, t + window] — the band/range-join shape (``ON a.k = b.k
    AND b.t BETWEEN a.t − w AND a.t + w``) that a plain hash join cannot
    express without a quadratic per-key expansion.

    → Dataset (id, n_nearby, nearby_cents), one row per input row
    (LEFT-join semantics: rows with no in-window neighbor get 0/0).

    Scale shape: ONE coarse key-bucketed exchange co-locates each key's
    rows, then a fully vectorized per-bucket sweep — lexsort by
    (key, t), dense-rank the keys, pack (rank, t) into one int64
    composite (rank stride = time span + 2·window + 2, so a key's
    window can never bleed into a neighboring rank block), and answer
    ALL rows' windows with two global ``np.searchsorted`` calls plus an
    exclusive prefix-sum read-off for the value.  No per-key Python
    groups, no pair materialization — output stays one row per input
    regardless of window density.
    """
    from ..stages.dedup import _u64_col

    Cu = np.uint64(num_buckets)
    w_us = np.int64(window_days) * 86_400 * 1_000_000

    def add_bucket(batch: pa.Table) -> pa.Table:
        k = _u64_col(batch, key_column)
        return batch.append_column(
            "__ub", pa.array((k % Cu).astype(np.int32)))

    def per_bucket(t: pa.Table) -> pa.Table:
        keys = _u64_col(t, key_column)
        ts_arr = t.column(ts_column)
        if isinstance(ts_arr, pa.ChunkedArray):
            ts_arr = ts_arr.combine_chunks()
        # normalize to µs first — the window is in µs, and pandas-born
        # inputs arrive as timestamp[ns]
        ts_us = ts_arr.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        vcol = t.column(value_column)
        if isinstance(vcol, pa.ChunkedArray):
            vcol = vcol.combine_chunks()
        v = vcol.to_numpy(zero_copy_only=False).astype(np.float64)

        order = np.lexsort((ts_us, keys))
        k = keys[order]
        t_rel = ts_us[order] - (ts_us.min() if len(ts_us) else 0)
        cents = np.floor(v[order] * 100.0 + 0.5).astype(np.int64)
        n = len(k)
        new_key = np.r_[True, k[1:] != k[:-1]] if n else np.zeros(0, bool)
        rank = np.cumsum(new_key).astype(np.int64) - 1
        span = np.int64((t_rel.max() if n else 0) + 2 * w_us + 2)
        n_ranks = np.int64(rank[-1] + 1 if n else 0)
        if n and n_ranks > np.iinfo(np.int64).max // span:
            # 100-TB dial: at extreme keys-per-bucket × time-span products
            # raise num_buckets (more, smaller buckets) instead of losing
            # exactness to a coarser time resolution.
            raise ValueError(
                "range_join_nearby: rank x span composite would overflow "
                "int64; increase num_buckets")
        comp = rank * span + t_rel
        lo = np.searchsorted(comp, comp - w_us, side="left")
        hi = np.searchsorted(comp, comp + w_us, side="right")
        psum = np.concatenate([np.zeros(1, np.int64), np.cumsum(cents)])
        n_nearby = (hi - lo - 1).astype(np.int64)      # minus self
        nearby_cents = psum[hi] - psum[lo] - cents
        idx = pa.array(order)
        idc = t.column(id_column)
        if isinstance(idc, pa.ChunkedArray):
            idc = idc.combine_chunks()
        return pa.table({
            id_column: idc.take(idx),
            "n_nearby": pa.array(n_nearby),
            "nearby_cents": pa.array(nearby_cents),
        })

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
              .groupby("__ub")
              .map_groups(per_bucket, batch_format="pyarrow"))

def event_transitions(ds, user_column: str = "user_id",
                      ts_column: str = "ts",
                      id_column: str = "event_id",
                      type_column: str = "event_type", *,
                      num_buckets: int = 64, digits: int = 6):
    """First-order Markov transition table over per-user event streams:
    ``(src, dst, n, p)`` where ``n`` counts consecutive (ts, id)-ordered
    event-type pairs WITHIN a user and ``p = n / Σ_dst n`` row-
    normalizes per source type — the behavioral fingerprint a funnel /
    anomaly / bot-detection pipeline consumes.

    Exactness: counts are integers; ``p`` is one division of identical
    int64s snapped half-away-from-zero to ``digits`` (the repo's
    floor(x·1e6 + .5) rule, matching SQL round()).

    Scale shape: ONE hash(user) coarse exchange (the sessionize
    posture — a user's events must co-locate), in-bucket lexsort +
    shifted-compare emits per-bucket (src, dst) Arrow count partials,
    one types²-sized ``groupby.sum``, and the row-normalize runs inside
    hash(src) buckets so no engine-wide gather of the type vocabulary
    is ever needed."""
    from ..functions.hashing import stable_hash64
    from ..stages.dedup import _u64_col

    Cu = np.uint64(num_buckets)

    def add_bucket(batch: pa.Table) -> pa.Table:
        u = _u64_col(batch, user_column)
        return batch.append_column(
            "__ub", pa.array((u % Cu).astype(np.int32)))

    def per_bucket(t: pa.Table) -> pa.Table:
        users = _u64_col(t, user_column)
        ids = _u64_col(t, id_column)
        ts_arr = t.column(ts_column)
        if isinstance(ts_arr, pa.ChunkedArray):
            ts_arr = ts_arr.combine_chunks()
        ts_us = _ts_i64_us(ts_arr)
        et = t.column(type_column)
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        order = np.lexsort((ids, ts_us, users))
        u = users[order]
        same = u[1:] == u[:-1]
        idx = pa.array(order)
        et_s = et.take(idx)
        src = et_s.slice(0, len(et_s) - 1).filter(pa.array(same))
        dst = et_s.slice(1).filter(pa.array(same))
        g = (pa.table({"src": src, "dst": dst})
               .group_by(["src", "dst"]).aggregate([("dst", "count")]))
        return g.rename_columns(["src", "dst", "pn"])

    from ray.data.aggregate import Sum

    merged = (ds.map_batches(add_bucket, batch_format="pyarrow")
                .groupby("__ub")
                .map_groups(per_bucket, batch_format="pyarrow")
                .groupby(["src", "dst"])
                .aggregate(Sum("pn", alias_name="n")))

    def src_bucket(b: pa.Table) -> pa.Table:
        hs = [stable_hash64(str(v)) % num_buckets
              for v in b.column("src").to_pylist()]
        return b.append_column("__sb", pa.array(hs, pa.int64()))

    scale = 10 ** digits

    def normalize(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[("src", "ascending"),
                                              ("dst", "ascending")])
        g = g.take(order)
        s = g.column("src")
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        n = g.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        ne = pc.fill_null(pc.not_equal(s.slice(1), s.slice(0, len(s) - 1)),
                          True)
        new_run = np.r_[True, ne.to_numpy(zero_copy_only=False)]
        starts = np.flatnonzero(new_run)
        totals = np.add.reduceat(n, starts)
        tot_per_row = np.repeat(totals, np.diff(np.r_[starts, len(n)]))
        p = np.floor(n.astype(np.float64) * scale / tot_per_row
                     + 0.5) / scale
        return pa.table({"src": s, "dst": g.column("dst"),
                         "n": pa.array(n),
                         "p": pa.array(p, pa.float64())})

    return (merged.map_batches(src_bucket, batch_format="pyarrow")
                  .groupby("__sb")
                  .map_groups(normalize, batch_format="pyarrow"))


def funnel_counts(ds, steps: list[str], user_column: str = "user_id",
                  ts_column: str = "ts", id_column: str = "event_id",
                  type_column: str = "event_type", *,
                  num_buckets: int = 64):
    """Ordered-funnel analysis: ``(step_index, step, n_users)`` — how
    many users performed ``steps[0]``, then ``steps[1]`` STRICTLY
    later, then ``steps[2]`` strictly later than that, … (first-
    occurrence semantics: each stage binds to the EARLIEST qualifying
    timestamp, which maximizes downstream matches).  The conversion
    funnel every product-analytics pipeline runs, here as a single
    user-keyed exchange.

    Scale shape: hash(user) coarse buckets co-locate each user's
    events (the sessionize posture); inside a bucket each funnel stage
    is one vectorized pass (per-user minimum over qualifying rows via
    sort + reduceat) — stages are a Python loop over ``len(steps)``,
    never over users or rows.  Integer-exact (counts only)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    from ..stages.dedup import _u64_col

    from ray.data.aggregate import Sum

    Cu = np.uint64(num_buckets)

    def add_bucket(batch: pa.Table) -> pa.Table:
        u = _u64_col(batch, user_column)
        return batch.append_column(
            "__ub", pa.array((u % Cu).astype(np.int32)))

    def per_bucket(t: pa.Table) -> pa.Table:
        users = _u64_col(t, user_column)
        ts_arr = t.column(ts_column)
        if isinstance(ts_arr, pa.ChunkedArray):
            ts_arr = ts_arr.combine_chunks()
        ts_us = _ts_i64_us(ts_arr)
        et = t.column(type_column)
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        if t.num_rows == 0:
            return pa.table({"step_index": pa.array([], pa.int64()),
                             "step": pa.array([], pa.string()),
                             "pn": pa.array([], pa.int64())})
        order = np.lexsort((ts_us, users))
        u, s = users[order], ts_us[order]
        et_np = np.asarray(et.take(pa.array(order)).to_pylist(), object)
        first = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        bounds = np.r_[first, len(u)]
        counts = np.diff(bounds)
        lo, hi = np.iinfo(np.int64).min, np.iinfo(np.int64).max
        # per-user reached-so-far timestamp (-inf start); each stage is
        # one vectorized pass: qualifying rows → sentinel-min reduceat
        reach = np.full(len(first), lo, np.int64)
        alive = np.ones(len(first), bool)
        out_idx, out_n = [], []
        for si, step in enumerate(steps):
            q = ((et_np == step) & (s > np.repeat(reach, counts))
                 & np.repeat(alive, counts))
            vals = np.where(q, s, hi)
            mins = np.minimum.reduceat(vals, bounds[:-1])
            alive = alive & (mins != hi)
            reach = np.where(alive, mins, reach)
            out_idx.append(si)
            out_n.append(int(alive.sum()))
        return pa.table({"step_index": pa.array(out_idx, pa.int64()),
                         "step": pa.array(list(steps), pa.string()),
                         "pn": pa.array(out_n, pa.int64())})

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
              .groupby("__ub")
              .map_groups(per_bucket, batch_format="pyarrow")
              .groupby(["step_index", "step"])
              .aggregate(Sum("pn", alias_name="n_users")))

def cohort_retention(ds, user_column: str = "user_id",
                     ts_column: str = "ts", *,
                     week_seconds: int = 604_800):
    """Weekly cohort-retention matrix: ``(cohort_week, week_offset,
    n_users)`` — users grouped by the epoch week of their FIRST event,
    counted once per later week they were active in.  The classic
    retention triangle every growth/engagement pipeline produces;
    weeks are absolute epoch buckets (``floor(epoch_seconds / 604800)``)
    so the bucketing is reproducible across engines and runs.

    Scale shape: (1) per-batch (user, min-ts) Arrow partials → one
    users-keyed ``groupby.min`` gives each user's cohort week; (2)
    per-batch DISTINCT (user, week) partials → one groupby dedups
    activity; (3) one users-keyed hash join attaches the cohort, and
    the final exchange is cohorts×offsets-sized.  Integer-exact."""
    from ray.data.aggregate import Count, Min

    from .joins import _join_partitions, _nonempty_blocks, safe_join

    import ray.data as rd

    week_us = np.int64(week_seconds) * 1_000_000

    def week_col(b: pa.Table) -> np.ndarray:
        ts_arr = b.column(ts_column)
        if isinstance(ts_arr, pa.ChunkedArray):
            ts_arr = ts_arr.combine_chunks()
        return _ts_i64_us(ts_arr) // week_us

    def first_partial(b: pa.Table) -> pa.Table:
        t = pa.table({user_column: b.column(user_column),
                      "w": pa.array(week_col(b), pa.int64())})
        g = t.group_by([user_column]).aggregate([("w", "min")])
        return g.rename_columns([user_column, "pw"])

    cohort = (ds.map_batches(first_partial, batch_format="pyarrow")
                .groupby(user_column)
                .aggregate(Min("pw", alias_name="cw"))).materialize()
    cohort = _nonempty_blocks(cohort)
    empty = pa.table({"cohort_week": pa.array([], pa.int64()),
                      "week_offset": pa.array([], pa.int64()),
                      "n_users": pa.array([], pa.int64())})
    if cohort is None:
        return rd.from_arrow(empty)

    def active_partial(b: pa.Table) -> pa.Table:
        t = pa.table({user_column: b.column(user_column),
                      "w": pa.array(week_col(b), pa.int64())})
        return t.group_by([user_column, "w"]).aggregate([])

    active = (ds.map_batches(active_partial, batch_format="pyarrow")
                .groupby([user_column, "w"]).count()
                .map_batches(lambda b: b.select([user_column, "w"]),
                             batch_format="pyarrow")).materialize()
    active = _nonempty_blocks(active)
    if active is None:
        return rd.from_arrow(empty)

    joined = safe_join(active, cohort, "inner", 16, on=(user_column,))
    if joined is None:
        return rd.from_arrow(empty)

    def offsets(b: pa.Table) -> pa.Table:
        w = b.column("w").to_numpy(zero_copy_only=False)
        cw = b.column("cw").to_numpy(zero_copy_only=False)
        return pa.table({"cohort_week": pa.array(cw, pa.int64()),
                         "week_offset": pa.array(w - cw, pa.int64())})

    return (joined.map_batches(offsets, batch_format="pyarrow")
                  .groupby(["cohort_week", "week_offset"])
                  .aggregate(Count(alias_name="n_users")))

def burst_scores(ds, type_column: str = "event_type",
                 ts_column: str = "ts", *, bucket_seconds: int = 3600,
                 num_buckets: int = 64, digits: int = 6):
    """Kleinberg-lite burst detection: ``(type, bucket, n, z)`` — every
    observed (event-type, time-bucket) cell scored by how many
    population standard deviations its count sits from ITS TYPE's mean
    over observed cells:

        z = (n·k − Σn) / sqrt(k·Σn² − (Σn)²)

    (k = the type's observed-cell count).  The spike/anomaly signal a
    crawl-health or abuse pipeline thresholds; all cells are emitted so
    the caller picks the cutoff.  Degenerate types (one cell or zero
    variance) get NULL z.

    Exactness: cell counts and the three moments are exact int64, so
    both engines evaluate the same float expression on the same
    integers (the grouped_corr rule).  Scale shape: per-batch
    (type, bucket) Arrow count partials → one cells-sized
    ``groupby.sum`` → hash(type)-coarse buckets where moments and z are
    one sorted run-length reduceat pass — no second exchange, no join,
    nothing type- or cell-shaped on the driver."""
    from ray.data.aggregate import Sum

    from ..functions.hashing import stable_hash64

    bucket_us = np.int64(bucket_seconds) * 1_000_000

    def cell_partial(b: pa.Table) -> pa.Table:
        ts_arr = b.column(ts_column)
        if isinstance(ts_arr, pa.ChunkedArray):
            ts_arr = ts_arr.combine_chunks()
        hour = _ts_i64_us(ts_arr) // bucket_us
        t = pa.table({"type": b.column(type_column),
                      "bucket": pa.array(hour, pa.int64())})
        g = t.group_by(["type", "bucket"]).aggregate(
            [("bucket", "count")])
        return g.rename_columns(["type", "bucket", "pn"])

    cells = (ds.map_batches(cell_partial, batch_format="pyarrow")
               .groupby(["type", "bucket"])
               .aggregate(Sum("pn", alias_name="n")))

    def type_bucket(b: pa.Table) -> pa.Table:
        hs = [stable_hash64(str(v)) % num_buckets
              for v in b.column("type").to_pylist()]
        return b.append_column("__tb", pa.array(hs, pa.int64()))

    def score(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[("type", "ascending"),
                                              ("bucket", "ascending")])
        g = g.take(order)
        ty = g.column("type")
        if isinstance(ty, pa.ChunkedArray):
            ty = ty.combine_chunks()
        n = g.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        ne = pc.fill_null(pc.not_equal(ty.slice(1),
                                       ty.slice(0, len(ty) - 1)), True)
        new_run = np.r_[True, ne.to_numpy(zero_copy_only=False)]
        starts = np.flatnonzero(new_run)
        runlen = np.diff(np.r_[starts, len(n)])
        k = np.repeat(runlen, runlen).astype(np.int64)
        s1 = np.repeat(np.add.reduceat(n, starts), runlen)
        s2 = np.repeat(np.add.reduceat(n * n, starts), runlen)
        var_num = (k * s2 - s1 * s1).astype(np.float64)
        ok = var_num > 0
        z = np.divide((n * k - s1).astype(np.float64), np.sqrt(var_num),
                      out=np.full(len(n), np.nan), where=ok)
        vals = [round(float(v), digits) if m else None
                for v, m in zip(z, ok)]
        return pa.table({"type": ty, "bucket": g.column("bucket"),
                         "n": pa.array(n),
                         "z": pa.array(vals, pa.float64())})

    return (cells.map_batches(type_bucket, batch_format="pyarrow")
                 .groupby("__tb")
                 .map_groups(score, batch_format="pyarrow"))

def active_users(ds, user_column: str = "user_id",
                 ts_column: str = "ts", *, window_days: int = 7,
                 digits: int = 6):
    """Engagement analytics: per observed day ``(day, dau, wau,
    stickiness)`` — exact distinct daily actives, exact distinct
    actives over the trailing ``window_days`` window, and the
    DAU/WAU stickiness ratio.  Days are absolute epoch-day buckets.

    The trailing-window distinct count uses the COVER expansion: each
    distinct (user, day) activity row covers days d…d+W−1, so one
    ``window_days``× row expansion + a second distinct collapses the
    window into a plain groupby — no per-day window scan, no
    distinct-in-window kernel (which neither engine vectorizes), and
    the exchange is bounded by W × activity cells.  Counts are exact
    int64; stickiness is the half-away 1e-``digits`` snap of one
    division of identical ints."""
    from ray.data.aggregate import Sum

    from .joins import _join_partitions, _nonempty_blocks, safe_join

    import ray.data as rd

    day_us = np.int64(86_400) * 1_000_000

    def activity_partial(b: pa.Table) -> pa.Table:
        ts_arr = b.column(ts_column)
        if isinstance(ts_arr, pa.ChunkedArray):
            ts_arr = ts_arr.combine_chunks()
        day = _ts_i64_us(ts_arr) // day_us
        t = pa.table({user_column: b.column(user_column),
                      "day": pa.array(day, pa.int64())})
        return t.group_by([user_column, "day"]).aggregate([])

    activity = (ds.map_batches(activity_partial, batch_format="pyarrow")
                  .groupby([user_column, "day"]).count()
                  .map_batches(lambda b: b.select([user_column, "day"]),
                               batch_format="pyarrow")).materialize()
    activity = _nonempty_blocks(activity)
    empty = pa.table({"day": pa.array([], pa.int64()),
                      "dau": pa.array([], pa.int64()),
                      "wau": pa.array([], pa.int64()),
                      "stickiness": pa.array([], pa.float64())})
    if activity is None:
        return rd.from_arrow(empty)

    def dau_partial(b: pa.Table) -> pa.Table:
        g = (b.select(["day"]).group_by(["day"])
              .aggregate([("day", "count")]))
        return g.rename_columns(["day", "pn"])

    dau = (activity.map_batches(dau_partial, batch_format="pyarrow")
                   .groupby("day")
                   .aggregate(Sum("pn", alias_name="dau"))).materialize()
    dau = _nonempty_blocks(dau)
    if dau is None:
        return rd.from_arrow(empty)

    def cover(b: pa.Table) -> pa.Table:
        u = b.column(user_column)
        if isinstance(u, pa.ChunkedArray):
            u = u.combine_chunks()
        d = b.column("day").to_numpy(zero_copy_only=False)
        n = len(d)
        idx = np.repeat(np.arange(n), window_days)
        dd = d[idx] + np.tile(np.arange(window_days), n)
        t = pa.table({user_column: u.take(pa.array(idx)),
                      "day": pa.array(dd, pa.int64())})
        return t.group_by([user_column, "day"]).aggregate([])

    wau = (activity.map_batches(cover, batch_format="pyarrow")
                   .groupby([user_column, "day"]).count()
                   .map_batches(dau_partial, batch_format="pyarrow")
                   .groupby("day")
                   .aggregate(Sum("pn", alias_name="wau"))).materialize()
    wau = _nonempty_blocks(wau)
    if wau is None:
        return rd.from_arrow(empty)

    joined = safe_join(dau, wau.map_batches(
        lambda b: b.rename_columns(["w_day", "wau"]),
        batch_format="pyarrow"), "inner", 16,
        on=("day",), right_on=("w_day",))
    if joined is None:
        return rd.from_arrow(empty)

    scale = 10 ** digits

    def finish(b: pa.Table) -> pa.Table:
        da = b.column("dau").to_numpy(zero_copy_only=False)
        wa = b.column("wau").to_numpy(zero_copy_only=False)
        st = np.floor(da.astype(np.float64) * scale / wa + 0.5) / scale
        return pa.table({"day": b.column("day"),
                         "dau": pa.array(da, pa.int64()),
                         "wau": pa.array(wa, pa.int64()),
                         "stickiness": pa.array(st, pa.float64())})

    return joined.map_batches(finish, batch_format="pyarrow")

def session_durations(ds, user_column: str = "user_id",
                      ts_column: str = "ts",
                      id_column: str = "event_id", *,
                      gap_seconds: int = 1800, num_buckets: int = 64):
    """Gaps-and-islands rollup: per user ``(n_sessions,
    total_active_us, longest_us)`` over the :func:`sessionize` islands
    (durations = last−first event of each session, microseconds) —
    the engagement-time report sitting on top of the session splitter.

    Scale shape: sessionize's single user-keyed exchange, then
    per-batch (user, session, min, max) Arrow partials → one
    cells-sized ``groupby`` (Min/Max) → a users-sized Count/Sum/Max
    rollup.  Integer-exact (µs)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    sess = sessionize(ds, user_column, ts_column, id_column,
                      gap_seconds=gap_seconds, num_buckets=num_buckets)

    def span_partial(b: pa.Table) -> pa.Table:
        ts_arr = b.column(ts_column)
        if isinstance(ts_arr, pa.ChunkedArray):
            ts_arr = ts_arr.combine_chunks()
        us = pa.array(_ts_i64_us(ts_arr), pa.int64())
        t = pa.table({user_column: b.column(user_column),
                      "session_idx": b.column("session_idx"),
                      "lo": us, "hi": us})
        g = t.group_by([user_column, "session_idx"]).aggregate(
            [("lo", "min"), ("hi", "max")])
        return g.rename_columns([user_column, "session_idx",
                                 "lo", "hi"])

    spans = (sess.map_batches(span_partial, batch_format="pyarrow")
                 .groupby([user_column, "session_idx"])
                 .aggregate(Min("lo", alias_name="lo"),
                            Max("hi", alias_name="hi")))

    def dur(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        d = pc.subtract(b.column("hi"), b.column("lo"))
        return pa.table({user_column: b.column(user_column),
                         "dur": d})

    return (spans.map_batches(dur, batch_format="pyarrow")
                 .groupby(user_column)
                 .aggregate(Count(alias_name="n_sessions"),
                            Sum("dur", alias_name="total_active_us"),
                            Max("dur", alias_name="longest_us")))


def flatten_json_props(ds, props_column: str = "props", *,
                       fields: dict, keep_props: bool = False):
    """Typed extraction of FLAT JSON property bags into real columns —
    the event-stream ETL step that turns ``{"plan": "pro", "n": 3}``
    strings into queryable ``plan``/``n`` columns.  ``fields`` maps
    field name → ``"int64" | "float64" | "string"``; absent or
    non-matching fields yield NULL.

    Contract (documented, not silent): flat objects only — no nested
    braces, string values without escaped quotes.  Under that contract
    the per-field Arrow RE2 ``extract_regex`` kernel agrees exactly
    with a JSON parser (the DuckDB twin uses ``json_extract``), and
    the whole op stays a vectorized zero-exchange streaming map — a
    per-row ``json.loads`` costs ~20× more on the hot path.
    """
    types = {"int64": pa.int64(), "float64": pa.float64(),
             "string": pa.string()}
    for f, t in fields.items():
        if t not in types:
            raise ValueError(f"unsupported field type {t!r} for {f!r}")

    def flatten(b: pa.Table) -> pa.Table:
        col = pc.fill_null(b.column(props_column).combine_chunks()
                           if isinstance(b.column(props_column),
                                         pa.ChunkedArray)
                           else b.column(props_column), "")
        out = {c: b.column(c) for c in b.column_names
               if keep_props or c != props_column}
        for f, t in fields.items():
            if t == "string":
                pat = f'"{f}"\\s*:\\s*"(?P<v>[^"]*)"'
            else:
                pat = f'"{f}"\\s*:\\s*(?P<v>-?[0-9][0-9.eE+-]*)'
            m = pc.extract_regex(col, pat)
            vals = pc.struct_field(m, "v")
            out[f] = pc.cast(vals, types[t])
        return pa.table(out)

    return ds.map_batches(flatten, batch_format="pyarrow")
