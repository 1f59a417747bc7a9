"""Windowed event analytics — the batch reformulation of the reference's
streaming windows (SURVEY §2.9: docformat buckets records by timestamp
truncated to ``gather_minute`` and flushes per window,
logto_hdfs_collector.go:276-307). Two operators:

- ``windowed_aggregate`` — tumbling-window rollup per (window, event_type):
  the A2/A3 combiner pattern applied to analytics — partial aggregation
  inside ``map_batches`` (one row per (window, type) per block), then a
  small ``groupby`` merge, so the wide exchange moves per-window partials,
  never events.
- ``sessionize`` — per-user session splitting by inactivity gap (the
  streaming-session analog): groupby(user) + vectorized timestamp diffs
  inside each group. The shuffle key is user_id; group payload is one
  user's events.

Both are integer-exact (counts; value sums fixed-pointed by the caller) so
they sit under the DuckDB oracle gate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_US_PER_HOUR = 3_600_000_000


def windowed_aggregate(ds: ray.data.Dataset, *, window_hours: int = 24,
                       ts_col: str = "ts", type_col: str = "event_type",
                       value_col: str = "value") -> ray.data.Dataset:
    """(window_start, event_type, n_events, n_users_partialdistinct...) ->
    final rows (window_start, event_type, n_events, value_sum).

    Partial-aggregates per block before the shuffle; distinct-user counts
    need the raw user set and are NOT computed here (see ``events_pv`` for
    exact uv via groupby) — this operator is the high-throughput rollup.
    """
    win_us = np.int64(window_hours * _US_PER_HOUR)

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        ts = t[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        ts_us = ts.astype(np.int64)
        win = (ts_us // win_us) * win_us
        df = pd.DataFrame({
            "window_us": win,
            "event_type": t[type_col].to_pylist(),
            "n": 1,
            "v": t[value_col].to_numpy(zero_copy_only=False),
        })
        g = df.groupby(["window_us", "event_type"], sort=True).agg(
            n_events=("n", "sum"), value_sum=("v", "sum"))
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(g: pa.Table) -> pa.Table:
        n = int(pc.sum(g["n_events"]).as_py())
        v = float(pc.sum(g["value_sum"]).as_py())
        return pa.table({
            "window_us": g["window_us"][:1],
            "event_type": g["event_type"][:1],
            "n_events": pa.array([n], type=pa.int64()),
            "value_sum": pa.array([v], type=pa.float64()),
        })

    return partials.groupby(["window_us", "event_type"]).map_groups(
        merge, batch_format="pyarrow")


def sessionize(ds: ray.data.Dataset, *, gap_minutes: int = 30,
               ts_col: str = "ts", user_col: str = "user_id") -> ray.data.Dataset:
    """Per-user sessionization: a session ends after ``gap_minutes`` of
    inactivity. Returns one row per user: (user_id, n_events, n_sessions,
    max_session_events)."""
    gap_us = np.int64(gap_minutes * 60_000_000)

    def per_user(g: pa.Table) -> pa.Table:
        ts = np.sort(g[ts_col].to_numpy(zero_copy_only=False)
                     .astype("datetime64[us]").astype(np.int64))
        if len(ts) == 0:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "n_events": pa.array([], type=pa.int64()),
                             "n_sessions": pa.array([], type=pa.int64()),
                             "max_session_events": pa.array([], type=pa.int64())})
        new_session = np.concatenate([[True], np.diff(ts) > gap_us])
        sid = np.cumsum(new_session)
        counts = np.bincount(sid)[1:]
        return pa.table({
            "user_id": pa.array([g[user_col][0].as_py()], type=pa.int64()),
            "n_events": pa.array([len(ts)], type=pa.int64()),
            "n_sessions": pa.array([int(sid[-1])], type=pa.int64()),
            "max_session_events": pa.array([int(counts.max())], type=pa.int64()),
        })

    return ds.groupby(user_col).map_groups(per_user, batch_format="pyarrow")
