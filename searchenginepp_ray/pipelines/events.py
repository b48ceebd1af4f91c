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
    established inside each partition (sort by user, ts), so input order
    is free — the partitioning assumption is only that one user's events
    land in one hash partition (guaranteed by the partition key).

    Scale shape: ONE vectorized pass per hash partition (sort → boundary
    flags → ``cumsum``/``bincount``/``reduceat``), not one Python call per
    user — per-user ``map_groups`` pays ~1 ms/group, which a user count
    that scales with the data cannot afford."""

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype=df["user_id"].dtype),
                 "n_events": pd.Series([], dtype=np.int64),
                 "n_sessions": pd.Series([], dtype=np.int64),
                 "max_session_events": pd.Series([], dtype=np.int64)}
            )
        df = df.sort_values(["user_id", "ts"], kind="stable")
        user = df["user_id"].to_numpy()
        ts = df["ts"].astype("int64").to_numpy() // 1_000_000  # µs → s
        n = len(user)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = user[1:] != user[:-1]
        gap_break = np.empty(n, dtype=bool)
        gap_break[0] = False
        gap_break[1:] = (ts[1:] - ts[:-1]) > gap_s
        new_sess = new_user | gap_break
        sess_id = np.cumsum(new_sess) - 1          # global session index
        sizes = np.bincount(sess_id)               # events per session
        user_starts = np.flatnonzero(new_user)     # first row of each user
        first_sess = sess_id[user_starts]          # sessions are user-contiguous
        n_sessions = np.diff(np.append(first_sess, sess_id[-1] + 1))
        max_sess = np.maximum.reduceat(sizes, first_sess)
        n_events = np.diff(np.append(user_starts, n))
        return pd.DataFrame(
            {
                "user_id": user[user_starts],
                "n_events": n_events.astype(np.int64),
                "n_sessions": n_sessions.astype(np.int64),
                "max_session_events": max_sess.astype(np.int64),
            }
        )

    from .agg import hash_groupby_apply

    return hash_groupby_apply(
        events_ds(sf_dir, ["user_id", "ts"]), ["user_id"], per_partition
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
