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
