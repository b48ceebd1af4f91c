"""Event-time as-of / range joins vs the DuckDB oracle, plus constructed
edge cases (duplicate timestamps, unmatched left rows, window boundaries)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from searchenginepp_ray.pipelines.events import asof_join, range_join
from searchenginepp_ray.pipelines.oracle_sql import asof_join_sql, range_join_sql


def _oracle(sf_dir, sql):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    return con.sql(sql).df()


def test_asof_join_matches_oracle(ray_session, sf_dir):
    got = (
        asof_join(sf_dir).to_pandas()
        .sort_values("event_id").reset_index(drop=True)
    )
    want = (
        _oracle(sf_dir, asof_join_sql())
        .sort_values("event_id").reset_index(drop=True)
    )
    assert (got["matched_event_id"] == -1).sum() > 0  # unmatched rows exercised
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_range_join_matches_oracle(ray_session, sf_dir):
    keys = ["event_id", "matched_event_id"]
    got = (
        range_join(sf_dir).to_pandas()
        .sort_values(keys).reset_index(drop=True)
    )
    want = (
        _oracle(sf_dir, range_join_sql())
        .sort_values(keys).reset_index(drop=True)
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


@pytest.fixture()
def edge_dir(tmp_path):
    us = 1_000_000
    base = 1_700_000_000 * us

    def ev(eid, t_us, user, typ):
        return {"event_id": eid, "ts": t_us, "user_id": user,
                "event_type": typ, "value": 1.0, "props": "{}"}

    rows = [
        # user 1: two clicks at the SAME timestamp before a purchase —
        # tie must break to the larger click event_id
        ev(10, base, 1, "click"),
        ev(11, base, 1, "click"),
        ev(12, base + us, 1, "purchase"),
        # user 1: click exactly AT the purchase ts (allow_exact_matches)
        ev(13, base + 10 * us, 1, "click"),
        ev(14, base + 10 * us, 1, "purchase"),
        # user 2: purchase with NO prior click (click is after)
        ev(20, base + 5 * us, 2, "purchase"),
        ev(21, base + 6 * us, 2, "click"),
        # user 3: click exactly window_s before the purchase (inclusive
        # lower bound) and one just outside
        ev(30, base, 3, "click"),
        ev(31, base - us, 3, "click"),
        ev(32, base + 7 * us, 3, "purchase"),
    ]
    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    return str(tmp_path)


def test_asof_join_edge_cases(ray_session, edge_dir):
    got = (
        asof_join(edge_dir).to_pandas()
        .sort_values("event_id").reset_index(drop=True)
    )
    m = dict(zip(got["event_id"], got["matched_event_id"]))
    assert m[12] == 11          # same-ts tie -> larger click id
    assert m[14] == 13          # exact-ts match allowed
    assert m[20] == -1          # no prior click -> unmatched sentinel
    assert m[32] == 30          # most recent of the two prior clicks
    want = (
        _oracle(edge_dir, asof_join_sql())
        .sort_values("event_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_range_join_window_boundaries(ray_session, edge_dir):
    # window of 7 seconds: for purchase 32 (ts base+7s), click 30 (ts base)
    # sits exactly ON the lower bound (inclusive); click 31 (base-1s) is out
    got = (
        range_join(edge_dir, window_s=7).to_pandas()
        .sort_values(["event_id", "matched_event_id"]).reset_index(drop=True)
    )
    pairs = set(zip(got["event_id"], got["matched_event_id"]))
    assert (32, 30) in pairs and (32, 31) not in pairs
    assert (14, 13) in pairs    # exact-ts upper bound inclusive
    assert (20, 21) not in pairs  # right event after left never matches
    want = (
        _oracle(edge_dir, range_join_sql(window_s=7))
        .sort_values(["event_id", "matched_event_id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_top_events_per_user_matches_oracle(ray_session, sf_dir):
    from searchenginepp_ray.pipelines.events import top_events_per_user
    from searchenginepp_ray.pipelines.oracle_sql import top_events_per_user_sql

    keys = ["user_id", "rnk"]
    got = (
        top_events_per_user(sf_dir).to_pandas()
        .sort_values(keys).reset_index(drop=True)
    )
    want = (
        _oracle(sf_dir, top_events_per_user_sql())
        .sort_values(keys).reset_index(drop=True)
    )
    assert got["rnk"].max() == 2 and len(got) > 0
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_value_quantiles_matches_oracle(ray_session, sf_dir):
    from searchenginepp_ray.pipelines.events import value_quantiles
    from searchenginepp_ray.pipelines.oracle_sql import value_quantiles_sql

    got = (
        value_quantiles(sf_dir).to_pandas()
        .sort_values("event_type").reset_index(drop=True)
    )
    want = (
        _oracle(sf_dir, value_quantiles_sql())
        .sort_values("event_type").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_value_quantiles_interpolation_exact(ray_session, tmp_path):
    # constructed histogram with known quantile_cont answers: values
    # [1.00 x3, 2.00 x1] -> p50 over (1,1,1,2): pos 1.5 -> 1.0;
    # (0.5,0.9,0.99): p90 pos 2.7 -> 1.7; p99 pos 2.97 -> 1.97
    df = pd.DataFrame(
        {"event_id": range(4), "ts": pd.to_datetime([0, 1, 2, 3], unit="s"),
         "user_id": [1, 1, 2, 2], "event_type": ["a"] * 4,
         "value": [1.0, 1.0, 1.0, 2.0], "props": ["{}"] * 4}
    )
    df["ts"] = df["ts"].astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    from searchenginepp_ray.pipelines.events import value_quantiles

    got = value_quantiles(str(tmp_path)).to_pandas()
    row = got.iloc[0]
    assert row["n_events"] == 4
    assert row["p50"] == 1.0
    assert abs(row["p90"] - 1.7) < 1e-9
    assert abs(row["p99"] - 1.97) < 1e-9


def test_global_value_rank_matches_oracle(ray_session, sf_dir):
    from searchenginepp_ray.pipelines.events import global_value_rank
    from searchenginepp_ray.pipelines.oracle_sql import global_value_rank_sql

    got = (
        global_value_rank(sf_dir).to_pandas()
        .sort_values("event_id").reset_index(drop=True)
    )
    want = (
        _oracle(sf_dir, global_value_rank_sql())
        .sort_values("event_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_global_value_rank_tie_semantics(ray_session, tmp_path):
    # constructed tie-heavy table: RANK semantics (ties share the rank,
    # next rank skips) and the top value ranks 1
    from searchenginepp_ray.pipelines.events import global_value_rank

    vals = [5.0, 5.0, 3.25, 3.25, 3.25, 1.5, 0.0, 0.0]
    t = pa.table({
        "event_id": pa.array(range(len(vals)), pa.int64()),
        "ts": pa.array([1_000_000 * i for i in range(len(vals))],
                       pa.timestamp("us")),
        "user_id": pa.array([1] * len(vals), pa.int64()),
        "event_type": pa.array(["x"] * len(vals)),
        "value": pa.array(vals, pa.float64()),
    })
    d = tmp_path / "rk"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))
    out = (global_value_rank(str(d)).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    assert list(out["rnk"]) == [1, 1, 3, 3, 3, 6, 7, 7]


def test_event_outliers_planted_anomaly(ray_session, tmp_path):
    """Tight cluster + one planted spike: only the spike is flagged and
    its z matches the closed-form value."""
    import numpy as np

    n = 50
    vals = [10.0] * n + [10.02] * n + [1000.0]   # spike
    df = pd.DataFrame({
        "event_id": range(len(vals)),
        "ts": pd.to_datetime(range(len(vals)), unit="s").astype("datetime64[us]"),
        "user_id": [1] * len(vals),
        "event_type": ["a"] * len(vals),
        "value": vals,
        "props": ["{}"] * len(vals),
    })
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    from searchenginepp_ray.pipelines.events import event_outliers

    got = event_outliers(str(tmp_path)).to_pandas()
    assert got["event_id"].tolist() == [100]
    cents = np.rint(np.array(vals) * 100).astype(np.int64)
    mean = cents.sum() / len(cents)
    sd = np.sqrt((cents * cents).sum() / len(cents) - mean * mean)
    want_z = np.floor((cents[-1] - mean) / sd * 1e6 + 0.5) / 1e6
    assert got["z"].iloc[0] == want_z


def test_event_weekday_pivot_counts(ray_session, tmp_path):
    # 2026-08-17 is a Monday (ISO dow 1)
    ts = pd.to_datetime([
        "2026-08-17 01:00", "2026-08-17 02:00",        # Mon x2 type a
        "2026-08-23 01:00",                            # Sun type a
        "2026-08-18 01:00",                            # Tue type b
    ]).astype("datetime64[us]")
    df = pd.DataFrame({
        "event_id": range(4), "ts": ts, "user_id": [1] * 4,
        "event_type": ["a", "a", "a", "b"],
        "value": [1.0] * 4, "props": ["{}"] * 4,
    })
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    from searchenginepp_ray.pipelines.events import event_weekday_pivot

    got = event_weekday_pivot(str(tmp_path)).set_index("event_type")
    assert got.loc["a", "dow1"] == 2
    assert got.loc["a", "dow7"] == 1
    assert got.loc["a", "dow2"] == 0
    assert got.loc["b", "dow2"] == 1
    assert int(got.sum().sum()) == 4


def test_funnel_analysis_matches_naive(ray_session, tmp_path):
    """Constructed event log: strict-order chains, out-of-order decoys,
    step-skippers, and ties — vs a sequential earliest-completion
    reference."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from searchenginepp_ray.pipelines.events import funnel_analysis

    rng = np.random.RandomState(23)
    rows = []
    eid = 0
    for user in range(40):
        for _ in range(rng.randint(0, 12)):
            rows.append((eid, rng.randint(0, 1000),
                         user, rng.choice(["view", "click", "purchase",
                                           "error"])))
            eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "ts_s", "user_id",
                                     "event_type"])
    path = str(tmp_path / "events.parquet")
    pq.write_table(pa.table({
        "event_id": pa.array(df["event_id"], pa.int64()),
        "ts": pa.array(pd.to_datetime(df["ts_s"], unit="s")),
        "user_id": pa.array(df["user_id"], pa.int64()),
        "event_type": pa.array(df["event_type"], pa.string()),
        "value": pa.array(np.zeros(len(df))),
        "props": pa.array([""] * len(df)),
    }), path, row_group_size=37)

    got = funnel_analysis(str(tmp_path)).sort_values("step") \
        .reset_index(drop=True)

    steps = ["view", "click", "purchase"]
    counts = [0, 0, 0]
    for user, g in df.groupby("user_id"):
        prev = -1
        for i, s in enumerate(steps):
            cand = g[(g["event_type"] == s) & (g["ts_s"] > prev)]
            if len(cand) == 0:
                break
            prev = cand["ts_s"].min()
            counts[i] += 1
    want = pd.DataFrame({"step": [1, 2, 3], "event_type": steps,
                         "n_users": counts})
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert counts[0] >= counts[1] >= counts[2]  # funnel monotonicity


def test_cohort_retention_constructed(ray_session, tmp_path):
    """Hand-checkable cohorts: week-0 cohort of 3 users (one returns in
    weeks 1 and 2, one only week 2, one never), week-1 cohort of 1."""
    import numpy as np
    import pyarrow.parquet as pq

    from searchenginepp_ray.pipelines.events import cohort_retention

    W = 7 * 86400
    rows = [  # (user, epoch_s)
        (1, 0), (1, W + 5), (1, 2 * W + 5), (1, 2 * W + 9),
        (2, 10), (2, 2 * W),
        (3, 20),
        (4, W + 1), (4, 3 * W),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts_s"])
    path = str(tmp_path / "events.parquet")
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(df)), pa.int64()),
        "ts": pa.array(pd.to_datetime(df["ts_s"], unit="s")),
        "user_id": pa.array(df["user_id"], pa.int64()),
        "event_type": pa.array(["view"] * len(df)),
        "value": pa.array(np.zeros(len(df))),
        "props": pa.array([""] * len(df)),
    }), path, row_group_size=3)
    got = (cohort_retention(str(tmp_path)).to_pandas()
           .sort_values(["cohort_week", "week_offset"])
           .reset_index(drop=True))
    want = pd.DataFrame({
        "cohort_week": [0, 0, 0, 1, 1],
        "week_offset": [0, 1, 2, 0, 2],
        "n_users": [3, 1, 2, 1, 1],
    })
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_event_props_stats_matches_pandas(ray_session, sf_dir):
    import json

    import pandas as pd

    from searchenginepp_ray.pipelines.events import event_props_stats

    got = (event_props_stats(sf_dir).to_pandas()
           .sort_values("event_type").reset_index(drop=True))
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "props"])
    ev["k"] = [json.loads(p)["k"] for p in ev["props"]]
    want = ev.groupby("event_type", as_index=False).agg(
        n_events=("k", "size"), k_sum=("k", "sum"),
        k_min=("k", "min"), k_max=("k", "max"))
    want = want.sort_values("event_type").reset_index(drop=True)
    for c in ("n_events", "k_sum", "k_min", "k_max"):
        assert got[c].tolist() == want[c].tolist()
    avg_err = (got["k_avg"] - want["k_sum"] / want["n_events"]).abs().max()
    assert avg_err < 1e-6


def test_event_transitions_constructed(ray_session, tmp_path):
    """Hand-checkable Markov transitions: tie timestamps order by
    event_id, per-user streams never mix, probabilities normalize per
    prev_type on the 6 dp grid; the DuckDB oracle agrees."""
    from searchenginepp_ray.pipelines.events import event_transitions
    from searchenginepp_ray.pipelines.oracle_sql import event_transitions_sql

    us = 1_000_000
    base = 1_700_000_000 * us
    rows = [
        # user 1: view -> click -> click -> purchase; the two middle
        # clicks share a timestamp (order falls back to event_id)
        (1, base, 1, "view"), (2, base + us, 1, "click"),
        (3, base + us, 1, "click"), (4, base + 2 * us, 1, "purchase"),
        # user 2: view -> view (no cross-user pair with user 1's tail)
        (10, base, 2, "view"), (11, base + us, 2, "view"),
        # user 3: single event -> contributes no transition
        (20, base, 3, "click"),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    df["value"] = 1.0
    df["props"] = "{}"
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")

    got = (event_transitions(str(tmp_path)).to_pandas()
           .sort_values(["prev_type", "next_type"]).reset_index(drop=True))
    want_pairs = {("view", "click"): 1, ("click", "click"): 1,
                  ("click", "purchase"): 1, ("view", "view"): 1}
    assert dict(zip(zip(got["prev_type"], got["next_type"]), got["n"])) \
        == want_pairs
    probs = dict(zip(zip(got["prev_type"], got["next_type"]), got["prob"]))
    assert probs[("view", "click")] == 0.5 and probs[("view", "view")] == 0.5
    assert probs[("click", "click")] == 0.5
    want = (_oracle(str(tmp_path), event_transitions_sql())
            .sort_values(["prev_type", "next_type"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)
