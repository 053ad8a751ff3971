"""Event-table pipelines: tumbling windows, per-key argmax, sessions.

Each returns a lazy Dataset; SQL oracles alongside (DuckDB-ready).
"""

from __future__ import annotations

from ..functions.arrow import arrow_out
from ..stages.windows import (
    argmax_finalize,
    argmax_partial_batch,
    sessionize_group,
    tumbling_finalize,
    tumbling_partial_batch,
)


def _events(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def events_tumbling(sf_dir: str):
    ev = _events(sf_dir, ["event_type", "ts", "value"])
    partials = ev.map_batches(arrow_out(tumbling_partial_batch), batch_format="pandas")
    return tumbling_finalize(partials)


TUMBLING_SQL = """
SELECT event_type, date_trunc('hour', ts) AS window_start, COUNT(*) AS n,
       SUM(CAST(round(value*100) AS BIGINT))/100.0 AS sum_value
FROM events GROUP BY event_type, date_trunc('hour', ts)
"""


def events_argmax(sf_dir: str):
    ev = _events(sf_dir, ["user_id", "event_id", "ts", "event_type", "value"])
    partials = ev.map_batches(arrow_out(argmax_partial_batch), batch_format="pandas")
    return argmax_finalize(partials)


ARGMAX_SQL = """
SELECT user_id, event_id, ts, event_type, value FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) = 1
"""


def events_sessionize(sf_dir: str):
    ev = _events(sf_dir, ["user_id", "event_id", "ts"])
    from ..stages.shuffle import bucketed_group_map
    from ..stages.windows import sessionize_bucket

    return bucketed_group_map(ev, ["user_id"], sessionize_bucket)


SESSIONIZE_SQL = """
WITH x AS (
  SELECT user_id, event_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
  FROM events
), s AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_ord
  FROM x
)
SELECT user_id, CAST(session_ord AS BIGINT) AS session_ord,
       COUNT(*) AS n_events, MIN(ts) AS session_start, MAX(ts) AS session_end
FROM s GROUP BY user_id, session_ord
"""


def events_sliding(sf_dir: str):
    """Sliding window: 1-hour windows hopping every 30 min — each event
    belongs to exactly two windows (explode inside the combiner, then the
    standard two-phase aggregate)."""
    import numpy as np
    import pandas as pd

    from ..stages.shuffle import bucketed_group_map

    ev = _events(sf_dir, ["event_type", "ts", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        # a 1h window starting on a 30-min boundary contains ts iff its
        # start is floor30(ts) or floor30(ts) - 30min
        half = b["ts"].dt.floor("30min")
        frames = []
        for start in (half - pd.Timedelta(minutes=30), half):
            frames.append(
                pd.DataFrame(
                    {
                        "event_type": b["event_type"],
                        "window_start": start,
                        "value_c": np.rint(b["value"].to_numpy() * 100).astype("int64"),
                    }
                )
            )
        x = pd.concat(frames, ignore_index=True)
        return (
            x.groupby(["event_type", "window_start"], sort=False)
            .agg(n=("value_c", "size"), sum_value_c=("value_c", "sum"))
            .reset_index()
        )

    from ..functions.arrow import arrow_out

    partials = ev.map_batches(arrow_out(partial), batch_format="pandas")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby(["event_type", "window_start"], sort=False)
            .agg(n=("n", "sum"), sum_value_c=("sum_value_c", "sum"))
            .reset_index()
        )
        out["sum_value"] = out["sum_value_c"] / 100.0
        return out[["event_type", "window_start", "n", "sum_value"]]

    return bucketed_group_map(partials, ["event_type", "window_start"], combine)


SLIDING_SQL = """
WITH halves AS (
  SELECT event_type, value, time_bucket(INTERVAL 30 MINUTE, ts) AS half
  FROM events
), exploded AS (
  SELECT event_type, value, half - INTERVAL 30 MINUTE AS window_start FROM halves
  UNION ALL
  SELECT event_type, value, half AS window_start FROM halves
)
SELECT event_type, window_start, COUNT(*) AS n,
       SUM(CAST(round(value*100) AS BIGINT))/100.0 AS sum_value
FROM exploded GROUP BY event_type, window_start
"""
