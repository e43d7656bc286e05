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


def test_rolling_sums_brute_force(ray_session):
    """Randomized differential vs pandas groupby.rolling(k, min_periods=1)
    on cents, with heavy ts ties (id tiebreak), many short users (< k
    events) and k=4; n_window must shrink at each user's start."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from llm_food_ray.stages.sessions import rolling_sums

    rng = np.random.default_rng(13)
    n = 3000
    t0 = dt.datetime(2024, 1, 1)
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 400, n).astype(np.int64),
        "ts": [t0 + dt.timedelta(seconds=int(s))
               for s in rng.integers(0, 300, n)],   # heavy ts ties
        "value": np.round(rng.uniform(0.01, 400.0, n), 2),
    })
    out = (rolling_sums(rd.from_pandas(df), "user_id", "ts", "event_id",
                        "value", window_rows=4)
           .to_pandas().sort_values("event_id").reset_index(drop=True))

    ref = df.sort_values(["user_id", "ts", "event_id"]).copy()
    ref["cents"] = np.floor(ref["value"].to_numpy() * 100.0 + 0.5).astype(
        np.int64)
    g = ref.groupby("user_id")["cents"]
    ref["roll_cents"] = g.rolling(4, min_periods=1).sum().reset_index(
        level=0, drop=True).astype(np.int64)
    ref["n_window"] = np.minimum(ref.groupby("user_id").cumcount() + 1, 4)
    ref = ref.sort_values("event_id").reset_index(drop=True)
    assert (out["roll_cents"].to_numpy()
            == ref["roll_cents"].to_numpy()).all()
    assert (out["n_window"].to_numpy() == ref["n_window"].to_numpy()).all()
    assert (out["user_id"].to_numpy() == ref["user_id"].to_numpy()).all()

    import pytest

    with pytest.raises(ValueError):
        rolling_sums(rd.from_pandas(df), window_rows=0)


def test_rolling_time_sums_brute_force(ray_session):
    """Randomized differential vs a brute per-row scan implementing SQL
    RANGE semantics directly (same-user rows with ts in [ts-w, ts],
    INCLUDING later-id peers at exactly ts), with heavy ts ties and a
    window that spans several events."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from llm_food_ray.stages.sessions import rolling_time_sums

    rng = np.random.default_rng(17)
    n = 800
    t0 = dt.datetime(2024, 1, 1)
    secs = rng.integers(0, 120, n)               # heavy ties, dense stream
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 50, n).astype(np.int64),
        "ts": [t0 + dt.timedelta(seconds=int(s)) for s in secs],
        "value": np.round(rng.uniform(0.01, 400.0, n), 2),
    })
    out = (rolling_time_sums(rd.from_pandas(df), "user_id", "ts",
                             "event_id", "value", window_seconds=30)
           .to_pandas().sort_values("event_id").reset_index(drop=True))

    cents = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    uu = df["user_id"].to_numpy()
    ss = secs.astype(np.int64)
    exp_sum = np.empty(n, np.int64)
    exp_cnt = np.empty(n, np.int64)
    for i in range(n):
        m = (uu == uu[i]) & (ss >= ss[i] - 30) & (ss <= ss[i])
        exp_sum[i] = cents[m].sum()
        exp_cnt[i] = int(m.sum())
    assert (out["roll_cents"].to_numpy() == exp_sum).all()
    assert (out["n_window"].to_numpy() == exp_cnt).all()

    # window_seconds=0 keeps exactly the equal-ts peer run
    out0 = (rolling_time_sums(rd.from_pandas(df), "user_id", "ts",
                              "event_id", "value", window_seconds=0)
            .to_pandas().sort_values("event_id").reset_index(drop=True))
    for i in range(0, n, 97):
        m = (uu == uu[i]) & (ss == ss[i])
        assert out0.loc[i, "roll_cents"] == cents[m].sum()

    import pytest

    with pytest.raises(ValueError):
        rolling_time_sums(rd.from_pandas(df), window_seconds=-1)


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


def test_event_transitions_hand_stream(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.sessions import event_transitions

    # user 1: a b a b  |  user 2: b b  — cross-user pairs must NOT
    # appear; same-ts rows order by event_id
    rows = [
        {"event_id": 1, "ts": 100, "user_id": 1, "event_type": "a"},
        {"event_id": 2, "ts": 200, "user_id": 1, "event_type": "b"},
        {"event_id": 3, "ts": 300, "user_id": 1, "event_type": "a"},
        {"event_id": 4, "ts": 300, "user_id": 1, "event_type": "b"},
        {"event_id": 5, "ts": 150, "user_id": 2, "event_type": "b"},
        {"event_id": 6, "ts": 160, "user_id": 2, "event_type": "b"},
    ]
    import pyarrow as pa

    ds = dataset_from_items(rows).map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("ts"), "ts",
            b.column("ts").cast(pa.timestamp("us"))),
        batch_format="pyarrow")
    out = (event_transitions(ds, num_buckets=4).to_pandas()
           .set_index(["src", "dst"]))
    assert out.loc[("a", "b"), "n"] == 2
    assert out.loc[("b", "a"), "n"] == 1
    assert out.loc[("b", "b"), "n"] == 1
    assert out.loc[("a", "b"), "p"] == 1.0
    assert out.loc[("b", "a"), "p"] == 0.5
    assert len(out) == 3


def test_funnel_strict_order_and_first_occurrence(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.sessions import funnel_counts

    import pyarrow as pa

    # u1 converts fully; u2 clicked BEFORE viewing (click must not
    # count — strictly later); u3 views only.  u2's later click at
    # ts=50 rescues stage 2 but there is no purchase after it.
    rows = [
        {"event_id": 1, "ts": 10, "user_id": 1, "event_type": "view"},
        {"event_id": 2, "ts": 20, "user_id": 1, "event_type": "click"},
        {"event_id": 3, "ts": 30, "user_id": 1, "event_type": "buy"},
        {"event_id": 4, "ts": 5, "user_id": 2, "event_type": "click"},
        {"event_id": 5, "ts": 7, "user_id": 2, "event_type": "view"},
        {"event_id": 6, "ts": 50, "user_id": 2, "event_type": "click"},
        {"event_id": 7, "ts": 6, "user_id": 2, "event_type": "buy"},
        {"event_id": 8, "ts": 40, "user_id": 3, "event_type": "view"},
    ]
    ds = dataset_from_items(rows).map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("ts"), "ts",
            b.column("ts").cast(pa.timestamp("us"))),
        batch_format="pyarrow")
    out = (funnel_counts(ds, ["view", "click", "buy"], num_buckets=4)
           .to_pandas().set_index("step_index"))
    assert out.loc[0, "n_users"] == 3   # u1 u2 u3 viewed
    assert out.loc[1, "n_users"] == 2   # u1 (20>10), u2 (50>7)
    assert out.loc[2, "n_users"] == 1   # only u1; u2's buy was at 6
    assert list(out["step"]) == ["view", "click", "buy"]


def test_cohort_retention_multi_cohort(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.sessions import cohort_retention

    import pyarrow as pa

    W = 604_800 * 1_000_000  # one week in microseconds
    rows = [
        # u1: first week 0, active weeks 0, 1, 3
        {"user_id": 1, "ts": 10}, {"user_id": 1, "ts": W + 5},
        {"user_id": 1, "ts": 3 * W + 5}, {"user_id": 1, "ts": 15},
        # u2: first week 1, active weeks 1, 2
        {"user_id": 2, "ts": W + 7}, {"user_id": 2, "ts": 2 * W + 7},
        # u3: first week 0 only
        {"user_id": 3, "ts": 20},
    ]
    ds = dataset_from_items(rows).map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("ts"), "ts",
            b.column("ts").cast(pa.timestamp("us"))),
        batch_format="pyarrow")
    out = (cohort_retention(ds).to_pandas()
           .set_index(["cohort_week", "week_offset"])["n_users"]
           .to_dict())
    assert out == {(0, 0): 2, (0, 1): 1, (0, 3): 1,
                   (1, 0): 1, (1, 1): 1}


def test_burst_scores_hand_counts(ray_session):
    import math

    import pandas as pd

    from helpers import dataset_from_items

    from llm_food_ray.stages.sessions import burst_scores

    import pyarrow as pa

    H = 3600 * 1_000_000
    # type 'a': hourly counts 1, 1, 4 (hour 2 bursts);
    # type 'b': a single cell -> zero variance -> NULL z
    rows = ([{"event_type": "a", "ts": 0 * H + i} for i in range(1)]
            + [{"event_type": "a", "ts": 1 * H + i} for i in range(1)]
            + [{"event_type": "a", "ts": 2 * H + i} for i in range(4)]
            + [{"event_type": "b", "ts": 5 * H}])
    ds = dataset_from_items(rows).map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("ts"), "ts",
            b.column("ts").cast(pa.timestamp("us"))),
        batch_format="pyarrow")
    out = (burst_scores(ds, num_buckets=4).to_pandas()
           .set_index(["type", "bucket"]))
    # k=3, s1=6, s2=18: z = (n*3 - 6)/sqrt(3*18 - 36) = (3n-6)/sqrt(18)
    z4 = round((4 * 3 - 6) / math.sqrt(18), 6)
    z1 = round((1 * 3 - 6) / math.sqrt(18), 6)
    assert out.loc[("a", 2), "z"] == z4
    assert out.loc[("a", 0), "z"] == z1
    assert out.loc[("a", 1), "z"] == z1
    assert pd.isna(out.loc[("b", 5), "z"])
    assert int(out.loc[("a", 2), "n"]) == 4


def test_active_users_window_cover(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.sessions import active_users

    import pyarrow as pa

    D = 86_400 * 1_000_000
    # u1 active day 0 and 2; u2 active day 2 (twice — distinct);
    # u3 active day 10 (outside u1/u2's 7-day reach)
    rows = [{"user_id": 1, "ts": 0}, {"user_id": 1, "ts": 2 * D + 5},
            {"user_id": 2, "ts": 2 * D}, {"user_id": 2, "ts": 2 * D + 9},
            {"user_id": 3, "ts": 10 * D}]
    ds = dataset_from_items(rows).map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("ts"), "ts",
            b.column("ts").cast(pa.timestamp("us"))),
        batch_format="pyarrow")
    out = (active_users(ds, window_days=7).to_pandas()
           .set_index("day").sort_index())
    # observed days: 0, 2, 10
    assert out.loc[0, "dau"] == 1 and out.loc[0, "wau"] == 1
    assert out.loc[2, "dau"] == 2   # u1 + u2
    assert out.loc[2, "wau"] == 2   # u1 (covers from day 0), u2
    assert out.loc[10, "dau"] == 1 and out.loc[10, "wau"] == 1
    assert out.loc[2, "stickiness"] == 1.0
    assert len(out) == 3


def test_session_durations_islands(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.sessions import session_durations

    import pyarrow as pa

    M = 60 * 1_000_000
    # u1: session A = events at 0, 10min (dur 10min); gap > 30min;
    # session B = single event at 60min (dur 0)
    rows = [{"event_id": 1, "ts": 0, "user_id": 1},
            {"event_id": 2, "ts": 10 * M, "user_id": 1},
            {"event_id": 3, "ts": 60 * M, "user_id": 1},
            {"event_id": 4, "ts": 5 * M, "user_id": 2}]
    ds = dataset_from_items(rows).map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("ts"), "ts",
            b.column("ts").cast(pa.timestamp("us"))),
        batch_format="pyarrow")
    out = (session_durations(ds, num_buckets=4).to_pandas()
           .set_index("user_id"))
    assert int(out.loc[1, "n_sessions"]) == 2
    assert int(out.loc[1, "total_active_us"]) == 10 * M
    assert int(out.loc[1, "longest_us"]) == 10 * M
    assert int(out.loc[2, "n_sessions"]) == 1
    assert int(out.loc[2, "total_active_us"]) == 0


def test_flatten_json_props_types_and_nulls(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.sessions import flatten_json_props

    rows = [
        {"id": 1, "props": '{"plan": "pro", "n": 3, "r": 1.5}'},
        {"id": 2, "props": '{"n": -7}'},          # plan/r absent → NULL
        {"id": 3, "props": ""},                    # empty → all NULL
        {"id": 4, "props": '{"plan": "", "n": 0, "r": -2.25}'},
    ]
    out = (flatten_json_props(
        dataset_from_items(rows), "props",
        fields={"plan": "string", "n": "int64", "r": "float64"})
        .to_pandas().set_index("id"))
    assert out.loc[1, "plan"] == "pro" and out.loc[1, "n"] == 3
    assert out.loc[1, "r"] == 1.5
    assert out.loc[2, "n"] == -7
    import pandas as pd
    assert pd.isna(out.loc[2, "plan"]) and pd.isna(out.loc[2, "r"])
    assert pd.isna(out.loc[3, "n"])
    assert out.loc[4, "plan"] == "" and out.loc[4, "r"] == -2.25
    assert "props" not in out.columns


def test_flatten_json_props_bad_type_raises(ray_session):
    import pytest
    from helpers import dataset_from_items

    from llm_food_ray.stages.sessions import flatten_json_props

    with pytest.raises(ValueError):
        flatten_json_props(dataset_from_items([{"props": "{}"}]),
                           "props", fields={"x": "bool"})
