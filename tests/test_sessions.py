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


def test_running_totals_brute_force(ray_session):
    """Randomized differential vs a per-user pandas cumsum, with
    duplicate timestamps (id tiebreak) and many single-event users."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from llm_food_ray.stages.sessions import running_totals

    rng = np.random.default_rng(7)
    n = 3000
    t0 = dt.datetime(2024, 1, 1)
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 200, n).astype(np.int64),
        "ts": [t0 + dt.timedelta(seconds=int(s))
               for s in rng.integers(0, 500, n)],   # heavy ts ties
        "value": np.round(rng.uniform(0.01, 400.0, n), 2),
    })
    out = (running_totals(rd.from_pandas(df), "user_id", "ts", "event_id",
                          "value")
           .to_pandas().sort_values("event_id").reset_index(drop=True))

    ref = df.sort_values(["user_id", "ts", "event_id"]).copy()
    ref["cents"] = np.floor(ref["value"].to_numpy() * 100.0 + 0.5).astype(
        np.int64)
    ref["run_cents"] = ref.groupby("user_id")["cents"].cumsum()
    ref["row_idx"] = ref.groupby("user_id").cumcount() + 1
    ref = ref.sort_values("event_id").reset_index(drop=True)
    assert (out["run_cents"].to_numpy() == ref["run_cents"].to_numpy()).all()
    assert (out["row_idx"].to_numpy() == ref["row_idx"].to_numpy()).all()
    assert (out["user_id"].to_numpy() == ref["user_id"].to_numpy()).all()


def test_range_join_nearby_brute_force(ray_session):
    """Randomized differential vs an O(n²) per-key window scan; checks
    inclusive boundaries, self-exclusion and zero-neighbor rows."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from llm_food_ray.stages.sessions import range_join_nearby

    rng = np.random.default_rng(11)
    n = 1200
    t0 = dt.datetime(2020, 1, 1)
    w_days = 30
    df = pd.DataFrame({
        "o_orderkey": np.arange(n, dtype=np.int64),
        "o_custkey": rng.integers(0, 150, n).astype(np.int64),
        # day-resolution dates so exact ±w boundaries occur often
        "o_orderdate": [t0 + dt.timedelta(days=int(d))
                        for d in rng.integers(0, 400, n)],
        "o_totalprice": np.round(rng.uniform(1.0, 9000.0, n), 2),
    })
    out = (range_join_nearby(rd.from_pandas(df), "o_custkey", "o_orderdate",
                             "o_orderkey", "o_totalprice",
                             window_days=w_days)
           .to_pandas().sort_values("o_orderkey").reset_index(drop=True))
    assert len(out) == n

    cents = np.floor(df["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(
        np.int64)
    ts = df["o_orderdate"].astype("int64").to_numpy()  # ns
    keys = df["o_custkey"].to_numpy()
    w_ns = np.int64(w_days) * 86_400 * 1_000_000_000
    exp_n = np.zeros(n, np.int64)
    exp_s = np.zeros(n, np.int64)
    for i in range(n):
        m = ((keys == keys[i]) & (np.abs(ts - ts[i]) <= w_ns))
        m[i] = False
        exp_n[i] = m.sum()
        exp_s[i] = cents[m].sum()
    assert (out["n_nearby"].to_numpy() == exp_n).all()
    assert (out["nearby_cents"].to_numpy() == exp_s).all()
    assert (exp_n == 0).any()          # zero-neighbor rows exercised
