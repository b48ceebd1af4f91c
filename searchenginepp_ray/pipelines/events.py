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
from ray.data.aggregate import Sum


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

    from .agg import hash_groupby_sum

    return hash_groupby_sum(
        events_ds(sf_dir, ["ts", "event_type", "value"])
        .map_batches(partial, batch_format="pandas"),
        ["event_type", "window_start"],
        {"n_events": ("n_part", "sum"), "value_sum": ("sum_part", "sum"),
         "value_min": ("min_part", "min"), "value_max": ("max_part", "max")},
    )


def sliding_window_agg(sf_dir: str, window_s: int = 3600, slide_s: int = 900):
    """SLIDING-window aggregate per event_type: each event lands in every
    window of length ``window_s`` whose start is a multiple of
    ``slide_s`` and covers it (window_s/slide_s windows per event).
    Expansion + pre-aggregation happen map-side per batch, so the shuffle
    carries (type, window) partials, not the expanded events."""
    import numpy as np

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        epoch = (df["ts"].astype("int64") // 1_000_000).to_numpy()
        k_hi = epoch // slide_s
        k_lo = (epoch - window_s) // slide_s + 1
        counts = (k_hi - k_lo + 1).astype(np.int64)
        total = int(counts.sum())
        ends = np.cumsum(counts)
        offs = np.arange(total, dtype=np.int64) - np.repeat(ends - counts, counts)
        k = np.repeat(k_lo, counts) + offs
        out = pd.DataFrame(
            {
                "event_type": df["event_type"].to_numpy().repeat(counts),
                "window_start": k * slide_s,
                "value": df["value"].to_numpy().repeat(counts),
            }
        )
        g = out.groupby(["event_type", "window_start"])["value"]
        res = g.agg(["count", "sum"]).reset_index()
        return res.rename(columns={"count": "n_part", "sum": "sum_part"})

    from .agg import hash_groupby_apply

    def agg_fn(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["event_type", "window_start"], as_index=False,
                       sort=False).agg(
            n_events=("n_part", "sum"), value_sum=("sum_part", "sum"))
        g["value_sum"] = g["value_sum"].round(4)
        return g

    return hash_groupby_apply(
        events_ds(sf_dir, ["ts", "event_type", "value"])
        .map_batches(partial, batch_format="pandas"),
        ["event_type", "window_start"], agg_fn,
    )


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
