"""Relational operators: shuffle_join vs a global pandas merge, and the
two TPC-H-shaped pipelines vs DuckDB over the real side tables."""

import duckdb
import numpy as np
import pandas as pd
import ray.data

from searchenginepp_ray.pipelines.relational import (
    nation_revenue,
    pricing_summary,
    shuffle_join,
)


def test_shuffle_join_equals_pandas_merge(ray_session):
    rng = np.random.default_rng(11)
    # skewed keys, keys missing from each side, duplicate keys both sides
    left = pd.DataFrame(
        {"lk": rng.choice(200, 5000, p=None), "lv": rng.random(5000),
         "ltag": rng.choice(["a", "b"], 5000)}
    )
    right = pd.DataFrame(
        {"rk": np.concatenate([rng.choice(150, 3000), np.array([0] * 500)]),
         "rv": rng.integers(0, 9, 3500)}
    )
    got = (
        shuffle_join(
            ray.data.from_pandas(left).repartition(6),
            ray.data.from_pandas(right).repartition(4),
            "lk", "rk", ["lv", "ltag"], ["rv"],
        )
        .to_pandas()
        .sort_values(["lk", "lv", "rv"])
        .reset_index(drop=True)
    )
    want = (
        left.merge(right, left_on="lk", right_on="rk")
        .drop(columns=["rk"])
        .sort_values(["lk", "lv", "rv"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def _duck(sf_dir):
    con = duckdb.connect()
    for t in ["orders", "customer", "nation", "lineitem"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def test_nation_revenue_matches_duckdb(ray_session, sf_dir):
    from searchenginepp_ray.pipelines.oracle_sql import nation_revenue_sql

    got = (
        nation_revenue(sf_dir).to_pandas()
        .sort_values("n_name").reset_index(drop=True)
    )
    con = _duck(sf_dir)
    want = (
        con.sql(nation_revenue_sql()).df()
        .sort_values("n_name").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_pricing_summary_matches_duckdb(ray_session, sf_dir):
    from searchenginepp_ray.pipelines.oracle_sql import pricing_summary_sql

    keys = ["l_returnflag", "l_linestatus"]
    got = (
        pricing_summary(sf_dir).to_pandas()
        .sort_values(keys).reset_index(drop=True)
    )
    con = _duck(sf_dir)
    want = (
        con.sql(pricing_summary_sql()).df()
        .sort_values(keys).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_shuffle_join_string_keys(ray_session):
    left = pd.DataFrame({"lk": ["a", "b", "b", "c"], "lv": [1, 2, 3, 4]})
    right = pd.DataFrame({"rk": ["b", "c", "c", "x"], "rv": [10, 20, 30, 40]})
    got = (
        shuffle_join(
            ray.data.from_pandas(left).repartition(2),
            ray.data.from_pandas(right).repartition(2),
            "lk", "rk", ["lv"], ["rv"],
        )
        .to_pandas()
        .sort_values(["lk", "lv", "rv"]).reset_index(drop=True)
    )
    want = (
        left.merge(right, left_on="lk", right_on="rk").drop(columns=["rk"])
        .sort_values(["lk", "lv", "rv"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_order_rollup_levels_consistent(ray_session, sf_dir):
    from searchenginepp_ray.pipelines.relational import order_rollup

    out = order_rollup(sf_dir)
    fine = out[out["o_orderstatus"].notna()]
    lvl1 = out[out["o_orderstatus"].isna() & out["o_orderpriority"].notna()]
    total = out[out["o_orderpriority"].isna()]
    assert len(total) == 1
    assert total["total_cents"].iloc[0] == fine["total_cents"].sum()
    assert total["n_orders"].iloc[0] == fine["n_orders"].sum()
    g = fine.groupby("o_orderpriority")["total_cents"].sum()
    for prio, row in lvl1.set_index("o_orderpriority").iterrows():
        assert row["total_cents"] == g[prio]


def test_top_orders_by_revenue_rank_invariants(ray_session):
    from searchenginepp_ray.pipelines.relational import top_orders_by_revenue

    df = top_orders_by_revenue("/root/testdata/sf0.001", k=10)
    assert list(df["rank"]) == list(range(1, len(df) + 1))
    # revenue non-increasing; equal-revenue neighbors ordered by orderkey
    rev = df["revenue"].to_numpy()
    assert (rev[:-1] >= rev[1:]).all()
    ok = df["o_orderkey"].to_numpy()
    same = rev[:-1] == rev[1:]
    assert (ok[:-1][same] < ok[1:][same]).all()
