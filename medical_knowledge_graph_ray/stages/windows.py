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


# -- as-of join (event-time point lookup) -------------------------------------

def asof_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
    """Vectorized multi-user as-of join over one coarse user bucket.

    Rows arrive tagged ``side`` ('L' = probe events, 'R' = reference
    events); every L row is matched to the LATEST R row of the same user
    with ``r.ts <= l.ts`` (backward as-of, exact-ts matches allowed).
    ``pd.merge_asof(by=...)`` does the per-user alignment in one pass over
    the two ts-sorted frames — no per-user Python.  Ties on r.ts resolve
    to the max event_id (sort by (ts, event_id) puts it last; merge_asof
    takes the last positional among equal keys), matching the SQL
    oracle's GROUP BY (user, ts) -> max(event_id) reference side.
    Unmatched L rows drop (inner as-of).
    """
    left = bucket[bucket["side"] == "L"].sort_values(["ts", "event_id"],
                                                     kind="mergesort")
    right = (
        bucket[bucket["side"] == "R"]
        .sort_values(["ts", "event_id"], kind="mergesort")
        .rename(columns={"event_id": "ref_event_id", "ts": "ref_ts"})
    )
    # derive the empty frame's timestamp dtype from the incoming bucket: a
    # caller with datetime64[ns] events must not get [us]-typed empty
    # buckets next to [ns]-typed populated ones
    ts_dtype = bucket["ts"].dtype if len(bucket.columns) else "datetime64[us]"
    empty = pd.DataFrame(
        {"event_id": pd.array([], "int64"), "user_id": pd.array([], "int64"),
         "ts": pd.Series([], dtype=ts_dtype),
         "ref_event_id": pd.array([], "int64"),
         "ref_ts": pd.Series([], dtype=ts_dtype),
         "wait_us": pd.array([], "int64")}
    )
    if not len(left) or not len(right):
        return empty
    m = pd.merge_asof(
        left[["event_id", "user_id", "ts"]],
        right[["ref_event_id", "user_id", "ref_ts"]],
        left_on="ts", right_on="ref_ts", by="user_id",
        direction="backward", allow_exact_matches=True,
    )
    m = m[m["ref_event_id"].notna()]
    if not len(m):
        return empty
    m = m.astype({"ref_event_id": "int64"})
    # integer floor-division of the timedelta — exact at any magnitude
    m["wait_us"] = ((m["ts"] - m["ref_ts"]) // pd.Timedelta(microseconds=1)).astype("int64")
    return m[["event_id", "user_id", "ts", "ref_event_id", "ref_ts", "wait_us"]]


# -- per-key running (cumulative) aggregate -----------------------------------

def running_sum_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
    """Per-user event-time running sum over one coarse bucket: sort by
    (user, ts, event_id), cumulative-sum exact int cents per user
    (vectorized ``groupby().cumsum()``), divide once at emission — the
    engine's standard float-exactness contract."""
    g = bucket.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    cents = np.rint(g["value"].to_numpy() * 100).astype("int64")
    run = pd.Series(cents).groupby(g["user_id"].to_numpy()).cumsum()
    out = g[["event_id", "user_id", "ts"]].copy()
    out["running_sum"] = run.to_numpy() / 100.0
    return out


# -- interval (range) self-join -----------------------------------------------

RANGE_JOIN_WINDOW_US = 2 * 3600 * 10**6  # pair events <= 2h apart


def range_join_bucket(bucket: pd.DataFrame, window_us: int = RANGE_JOIN_WINDOW_US) -> pd.DataFrame:
    """All same-user event pairs (a, b) with ``a.ts < b.ts <= a.ts + W``
    — an inequality-predicate join no equi-join shuffle can express.

    Fully vectorized over every user in the bucket: sort by (user, ts,
    id), lift each user's timestamps onto a disjoint segment of one
    global monotone axis (segment offsets spaced > range + W, so a
    window query can never cross users), then ONE ``np.searchsorted``
    per side finds every row's half-open partner range; ragged-range
    arithmetic emits the pairs without a Python loop.  Strictly-equal
    timestamps never pair (matches the SQL ``b.ts > a.ts``).
    """
    empty = pd.DataFrame(
        {"a_event_id": pd.array([], "int64"), "b_event_id": pd.array([], "int64"),
         "user_id": pd.array([], "int64"), "gap_us": pd.array([], "int64")}
    )
    if len(bucket) < 2:
        return empty
    g = bucket.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    tsi = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    uid = g["user_id"].to_numpy()
    eid = g["event_id"].to_numpy().astype("int64")
    rel = tsi - tsi.min()
    big = int(rel.max()) + int(window_us) + 1
    seg = np.concatenate([[0], np.cumsum(uid[1:] != uid[:-1])]).astype("int64")
    if seg[-1] + 1 > (2**62) // big:
        raise OverflowError(
            "range_join_bucket: users-per-bucket x time-span overflows the "
            "monotone axis — raise num_buckets or narrow the window"
        )
    skey = seg * big + rel
    lb = np.searchsorted(skey, skey, side="right")          # first ts strictly after a's
    ub = np.searchsorted(skey, skey + window_us, side="right")  # last within window
    counts = ub - lb
    total = int(counts.sum())
    if not total:
        return empty
    a_idx = np.repeat(np.arange(len(skey)), counts)
    b_idx = (
        np.arange(total)
        - np.repeat(np.cumsum(counts) - counts, counts)
        + np.repeat(lb, counts)
    )
    return pd.DataFrame(
        {
            "a_event_id": eid[a_idx],
            "b_event_id": eid[b_idx],
            "user_id": uid[a_idx].astype("int64"),
            "gap_us": tsi[b_idx] - tsi[a_idx],
        }
    )
