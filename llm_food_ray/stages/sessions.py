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
        ts_us = ts_col_arr.cast(pa.int64()).to_numpy()
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
        ts_us = ts_arr.cast(pa.int64()).to_numpy()
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
