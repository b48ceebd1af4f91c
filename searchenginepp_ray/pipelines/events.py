"""Stream-shaped operators over the ``events`` table
(event_id, ts, user_id, event_type, value, props).

Ray Data has no event-time windows; these implement the standard
batch-engine equivalents (tumbling windows = group by floor(ts/size);
sessionization = per-key sorted gap analysis inside ``map_groups``),
with the ordering assumption stated per function.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def events_ds(sf_dir: str, columns=None) -> ray.data.Dataset:
    from .text_stats import _read_blocks

    path = f"{sf_dir}/events.parquet"
    return ray.data.read_parquet(
        path, columns=columns,
        override_num_blocks=_read_blocks(path, target_rows=20_000),
    )


def windowed_agg(sf_dir: str, window_s: int = 3600):
    """Tumbling-window aggregate per event_type: count, sum(value),
    min/max value per (event_type, window_start). Assumes nothing about
    input order — the window key is computed per row."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # map-side combiner: per-batch pre-aggregation shrinks the shuffle
        # from one row per event to one row per (type, window) per batch
        epoch = df["ts"].astype("int64") // 1_000_000  # µs → s
        df = df[["event_type", "value"]].copy()
        df["window_start"] = (epoch // window_s) * window_s
        g = df.groupby(["event_type", "window_start"])["value"]
        out = g.agg(["count", "sum", "min", "max"]).reset_index()
        return out.rename(columns={"count": "n_part", "sum": "sum_part",
                                   "min": "min_part", "max": "max_part"})

    agg = (
        events_ds(sf_dir, ["ts", "event_type", "value"])
        .map_batches(partial, batch_format="pandas")
        .groupby(["event_type", "window_start"])
        .aggregate(
            Sum("n_part", alias_name="n_events"),
            Sum("sum_part", alias_name="value_sum"),
            Min("min_part", alias_name="value_min"),
            Max("max_part", alias_name="value_max"),
        )
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["n_events"] = df["n_events"].astype("int64")
        return df

    return agg.map_batches(finish, batch_format="pandas")


def sessionize(sf_dir: str, gap_s: int = 1800):
    """Per-user session count + longest session length (events within
    ``gap_s`` seconds of the previous event share a session). Ordering is
    established inside each group (sort by ts), so input order is free —
    the partitioning assumption is only that one user's events fit one
    group."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(g["ts"].astype("int64").to_numpy()) // 1_000_000
        gaps = np.diff(ts)
        new_session = np.concatenate(([True], gaps > gap_s))
        session_ids = np.cumsum(new_session)
        sizes = np.bincount(session_ids)[1:]
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "n_events": [len(ts)],
                "n_sessions": [int(session_ids[-1])],
                "max_session_events": [int(sizes.max())],
            }
        )

    return (
        events_ds(sf_dir, ["user_id", "ts"])
        .groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
    )


def event_type_stats(sf_dir: str):
    """Plain grouped aggregate: per event_type count + value stats
    (rounded for oracle comparability)."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_type")["value"].agg(["count", "sum"]).reset_index()
        return g.rename(columns={"count": "n_part", "sum": "sum_part"})

    agg = (
        events_ds(sf_dir, ["event_type", "value"])
        .map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .aggregate(
            Sum("n_part", alias_name="n"),
            Sum("sum_part", alias_name="value_sum"),
        )
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["value_sum"] = df["value_sum"].round(4)
        return df

    return agg.map_batches(finish, batch_format="pandas")
