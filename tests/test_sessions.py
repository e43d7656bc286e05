"""Sessionization gap-rule semantics."""

import datetime as dt

import pyarrow as pa


def test_sessionize_gaps(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.sessions import sessionize

    t0 = dt.datetime(2024, 1, 1)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = {
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "user_id": pa.array([7, 7, 7, 9, 9, 7], pa.int64()),
        # user 7: 0, 10, 50 (gap 40 > 30 → new session), 200 (new)
        # user 9: 0, 31 (gap 31 > 30 → new session)
        "ts": pa.array([ts(0), ts(10), ts(50), ts(0), ts(31), ts(200)],
                       pa.timestamp("us")),
    }
    out = (sessionize(rd.from_arrow(pa.table(rows)), gap_seconds=1800)
           .to_pandas().set_index("event_id"))
    assert list(out.loc[[1, 2, 3, 6], "session_idx"]) == [0, 0, 1, 2]
    assert list(out.loc[[4, 5], "session_idx"]) == [0, 1]


def test_sessionize_exact_gap_not_split(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.sessions import sessionize

    t0 = dt.datetime(2024, 1, 1)
    rows = {
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([1, 1], pa.int64()),
        "ts": pa.array([t0, t0 + dt.timedelta(seconds=1800)],
                       pa.timestamp("us")),
    }
    out = (sessionize(rd.from_arrow(pa.table(rows)), gap_seconds=1800)
           .to_pandas())
    # gap == threshold → same session (strictly-greater rule)
    assert list(out["session_idx"]) == [0, 0]


def test_asof_last_match(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.sessions import asof_last_match

    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    rows = {
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "ts": pa.array([ts(0), ts(5), ts(9), ts(0), ts(1)], pa.timestamp("us")),
        "event_type": pa.array(["view", "purchase", "view", "view", "view"]),
    }
    out = (asof_last_match(rd.from_arrow(pa.table(rows)))
           .to_pandas().set_index("event_id"))
    assert out.loc[1, "last_match_ts"] is None or str(out.loc[1, "last_match_ts"]) == "NaT"
    assert out.loc[2, "last_match_ts"] == ts(5)     # inclusive of itself
    assert out.loc[3, "last_match_ts"] == ts(5)     # carried forward
    assert str(out.loc[4, "last_match_ts"]) == "NaT"  # user 2: no purchase
