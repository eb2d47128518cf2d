"""Stream-shaped windowed operators over an ordered, partitioned log.

Ray Data has no event-time windows; the engine expresses them as
``groupby(key).map_groups(fn)`` where ``fn`` orders the group by
timestamp and folds the window logic (the documented pattern for
stream-shaped workloads — partitioning assumption: one key's events
fit in one group task; salt hot keys into (key, ts-bucket) sub-groups
and merge when they don't).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

THIRTY_MIN_US = 30 * 60 * 1_000_000


def session_stats(events_ds, gap_us: int = THIRTY_MIN_US):
    """Per-user session windows: a new session starts when the gap to
    the previous event exceeds ``gap_us``.

    → Dataset(user_id, n_sessions, n_events, max_session_events).
    Ties in ts are harmless (gap 0 never splits).  Shuffle key:
    ``user_id``.
    """

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64))
        gaps = np.diff(ts)
        new_session = np.concatenate([[True], gaps > gap_us])
        sess_id = np.cumsum(new_session)
        _, counts = np.unique(sess_id, return_counts=True)
        return pd.DataFrame({
            "user_id": [g["user_id"].iloc[0]],
            "n_sessions": np.array([int(new_session.sum())], dtype=np.int64),
            "n_events": np.array([len(ts)], dtype=np.int64),
            "max_session_events": np.array([int(counts.max())], dtype=np.int64),
        })

    return events_ds.groupby("user_id").map_groups(fold, batch_format="pandas")


def tumbling_window(events_ds, size_us: int, value_col: str = "value"):
    """Tumbling event-time windows: (user_id, window_id) → count/sum.
    Pure hash aggregation (no per-group ordering needed) — the cheap
    path; kept beside :func:`session_stats` to document the tradeoff."""
    import pyarrow as pa
    from ray.data.aggregate import Count, Sum

    def bucket(b: pa.Table) -> pa.Table:
        us = b.column("ts").cast(pa.int64())
        win = pa.array(np.asarray(us) // size_us, pa.int64())
        return pa.table({"user_id": b.column("user_id"),
                         "window_id": win,
                         value_col: b.column(value_col)})

    return (events_ds.map_batches(bucket, batch_format="pyarrow")
            .groupby(["user_id", "window_id"])
            .aggregate(Count(alias_name="n_events"),
                       Sum(value_col, alias_name="sum_value")))
