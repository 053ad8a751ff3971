"""Event-stream-shaped operators: tumbling windows, sessionization,
per-key argmax dedup.

Ray Data has no event-time windowing; per the engine's streaming contract
(SURVEY §2.11 — the reference is strictly batch) windows are expressed as
key-partitioned group operations: assign the window in a vectorized
``map_batches``, then aggregate — a shuffle on (key, window) with batch-
local partial aggregation so hot keys move as partials, not rows.

``argmax_per_key`` is the distributed form of the reference's max-prob
dedup D2 (``clean_and_save.py:1081-1082``: sort desc, keep first): batch-
local argmax combiner → per-key final argmax, no global sort.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def assign_tumbling_batch(
    batch: pd.DataFrame, *, ts_col: str = "ts", window: str = "h"
) -> pd.DataFrame:
    """Vectorized window assignment: adds ``window_start``."""
    batch = batch.copy()
    batch["window_start"] = batch[ts_col].dt.floor(window)
    return batch


def tumbling_partial_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Partial per-(event_type, window) combine inside the batch.

    ``sum_value_c`` carries an exactly-scaled integer sum (values have 2
    decimals) so the final double is bit-identical to the SQL oracle
    regardless of summation order.
    """
    b = assign_tumbling_batch(batch)
    b["value_c"] = np.rint(b["value"] * 100).astype("int64")
    out = (
        b.groupby(["event_type", "window_start"], sort=False)
        .agg(n=("value_c", "size"), sum_value_c=("value_c", "sum"))
        .reset_index()
    )
    return out


def tumbling_finalize(partials):
    """partials Dataset → final (event_type, window_start, n, sum_value).

    Final combine via the coarse-bucket shuffle (stages/shuffle.py): all
    rows of a (event_type, window) key land in one bucket; the in-bucket
    combine is one vectorized pandas groupby."""
    from .shuffle import bucketed_group_map

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby(["event_type", "window_start"], sort=False)
            .agg(n=("n", "sum"), sum_value_c=("sum_value_c", "sum"))
            .reset_index()
        )
        out["sum_value"] = out["sum_value_c"] / 100.0
        return out[["event_type", "window_start", "n", "sum_value"]]

    return bucketed_group_map(partials, ["event_type", "window_start"], combine)


ARGMAX_TIEBREAK = ["value", "event_id"]  # max value, then min event_id


def argmax_partial_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Keep the best event per user within the batch (combiner)."""
    return (
        batch.sort_values(
            ["user_id", "value", "event_id"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        .drop_duplicates("user_id", keep="first")
        .reset_index(drop=True)
    )


def argmax_finalize(partials):
    """partials → one row per user_id (final argmax, same tiebreak).

    Coarse-bucket shuffle: the per-bucket combine is the same vectorized
    sort + drop_duplicates as the batch combiner — no per-user Python."""
    from .shuffle import bucketed_group_map

    return bucketed_group_map(partials, ["user_id"], argmax_partial_batch)


SESSION_GAP_MIN = 30


def sessionize_group(group: pd.DataFrame) -> pd.DataFrame:
    """Per-user sessionization: a new session starts when the gap from the
    previous event exceeds 30 minutes.  Runs inside
    ``groupby(user_id).map_groups`` — the group is one user's full history
    (PARTITIONING ASSUMPTION: key = user_id; within-group sort by ts).

    Returns one row per session: user_id, session_ord, n_events,
    session_start, session_end.
    """
    g = group.sort_values(["ts", "event_id"], kind="mergesort")
    gap = g["ts"].diff() > pd.Timedelta(minutes=SESSION_GAP_MIN)
    session_ord = gap.cumsum().astype("int64")
    out = (
        g.assign(session_ord=session_ord)
        .groupby("session_ord", sort=True)
        .agg(
            user_id=("user_id", "first"),
            n_events=("event_id", "size"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
        )
        .reset_index()
    )
    return out[["user_id", "session_ord", "n_events", "session_start", "session_end"]]


def sessionize_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
    """Vectorized multi-user sessionization over one coarse bucket: one
    global sort by (user, ts, event_id), boundary masks, then a single
    grouped aggregate — identical semantics to :func:`sessionize_group`
    per user, no per-user Python."""
    g = bucket.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    new_user = g["user_id"].ne(g["user_id"].shift())
    gap = g["ts"].diff() > pd.Timedelta(minutes=SESSION_GAP_MIN)
    new_sess = new_user | gap
    sess_global = new_sess.cumsum()
    first = sess_global.groupby(g["user_id"].to_numpy()).transform("min")
    out = (
        g.assign(session_ord=(sess_global - first).astype("int64"))
        .groupby(["user_id", "session_ord"], sort=False)
        .agg(
            n_events=("event_id", "size"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
        )
        .reset_index()
    )
    return out[["user_id", "session_ord", "n_events", "session_start", "session_end"]]
