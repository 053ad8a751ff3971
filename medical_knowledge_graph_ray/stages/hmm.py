"""HMM Viterbi decoding over per-user event-type sequences.

The sequence-labeling serving primitive (session-intent decoding): a
fixed 2-state HMM with INTEGER log-scores (micro-nat constants — all
dp arithmetic is exact int64, so the decode is bit-identical at any
parallelism) is decoded per user with the classic Viterbi recursion.

Distributed shape: one user-bucketed exchange
(``stages/shuffle.py:bucketed_group_map``); inside a bucket the dp
sweep vectorizes ACROSS USERS per time step (rows sort by (user, ts,
event_id); step ``s`` updates every user whose sequence reaches
position ``s`` at once), so the Python-level loop is bounded by the
LONGEST user sequence in the bucket, never by row count.  Ties take
the LOWER state index (deterministic argmax), mirrored in the dense
reference; ``tests/test_hmm.py`` pins distributed ≡ dense per-user
decode and parallelism invariance.

Reference analogue: the reference's sequence taggers emit per-token
BIO states from trained models (``EnsemblePredict_all.py``); this is
the same decode shape over behavioural event streams.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# 2 states: 0 = casual, 1 = engaged.  Integer log-scores (micro-nat
# constants; magnitudes are small so int64 dp sums never overflow).
HMM_STATES = 2
HMM_INIT = np.array([0, -2_000_000], dtype=np.int64)
HMM_TRANS = np.array(
    [[-100_000, -3_000_000],
     [-3_000_000, -100_000]], dtype=np.int64
)
_EMIT = {
    "view":     (-1_000_000, -3_000_000),
    "click":    (-2_000_000, -2_000_000),
    "purchase": (-8_000_000, -1_000_000),
    "signup":   (-6_000_000, -2_000_000),
    "error":    (-3_000_000, -3_000_000),
}
_EMIT_DEFAULT = (-4_000_000, -4_000_000)


def _emit_scores(event_types: np.ndarray) -> np.ndarray:
    """(n, 2) int64 emission scores for a vector of type strings."""
    out = np.empty((len(event_types), HMM_STATES), dtype=np.int64)
    out[:, 0] = _EMIT_DEFAULT[0]
    out[:, 1] = _EMIT_DEFAULT[1]
    for t, (e0, e1) in _EMIT.items():
        m = event_types == t
        out[m, 0] = e0
        out[m, 1] = e1
    return out


def viterbi_dense(event_types: list[str]) -> list[int]:
    """Single-sequence reference decode (plain loops; test pin)."""
    n = len(event_types)
    if n == 0:
        return []
    emit = _emit_scores(np.asarray(event_types, dtype=object))
    dp = [[0] * HMM_STATES for _ in range(n)]
    bp = [[0] * HMM_STATES for _ in range(n)]
    for s in range(HMM_STATES):
        dp[0][s] = int(HMM_INIT[s] + emit[0, s])
    for i in range(1, n):
        for s in range(HMM_STATES):
            best, arg = None, 0
            for p in range(HMM_STATES):
                v = dp[i - 1][p] + int(HMM_TRANS[p, s])
                if best is None or v > best:  # strict > keeps lowest p on tie
                    best, arg = v, p
            dp[i][s] = best + int(emit[i, s])
            bp[i][s] = arg
    state = 0 if dp[n - 1][0] >= dp[n - 1][1] else 1
    path = [state]
    for i in range(n - 1, 0, -1):
        state = bp[i][state]
        path.append(state)
    return path[::-1]


def _viterbi_sweep(g: pd.DataFrame):
    """Shared forward dp sweep, vectorized across users per time step.
    Returns (sorted frame, user array, new_user mask, pos, dp, bp,
    last-row mask) — the raw material for both the full decode and the
    per-user score summary."""
    s = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    u = s["user_id"].to_numpy()
    new_user = np.empty(len(u), dtype=bool)
    new_user[0] = True
    new_user[1:] = u[1:] != u[:-1]
    # position of each row inside its user's sequence
    idx = np.arange(len(u), dtype=np.int64)
    start = np.maximum.accumulate(np.where(new_user, idx, 0))
    pos = idx - start
    emit = _emit_scores(s["event_type"].to_numpy())

    n = len(u)
    dp = np.zeros((n, HMM_STATES), dtype=np.int64)
    bp = np.zeros((n, HMM_STATES), dtype=np.int8)
    first = new_user
    dp[first] = HMM_INIT[None, :] + emit[first]
    maxlen = int(pos.max()) + 1
    for step in range(1, maxlen):
        cur = pos == step  # rows at position `step` (one per live user)
        if not cur.any():
            break
        prev_dp = dp[np.flatnonzero(cur) - 1]  # (m, S) — predecessor rows
        # cand[p, s] = prev_dp[:, p] + TRANS[p, s]  → (m, P, S)
        cand = prev_dp[:, :, None] + HMM_TRANS[None, :, :]
        arg = np.argmax(cand, axis=1)  # first max → lowest p on ties
        best = np.take_along_axis(cand, arg[:, None, :], axis=1)[:, 0, :]
        dp[cur] = best + emit[cur]
        bp[cur] = arg.astype(np.int8)

    last = np.empty(len(u), dtype=bool)
    last[:-1] = new_user[1:]
    last[-1] = True
    return s, u, new_user, pos, dp, bp, last, maxlen


def viterbi_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """Decode every user sequence in the bucket, vectorized across users
    per time step.  Expects columns (user_id, ts, event_id, event_type);
    returns (event_id, user_id, pos, state)."""
    if not len(g):
        return pd.DataFrame(
            {"event_id": pd.array([], "int64"),
             "user_id": pd.array([], "int64"),
             "pos": pd.array([], "int64"),
             "state": pd.array([], "int64")}
        )
    s, u, new_user, pos, dp, bp, last, maxlen = _viterbi_sweep(g)
    n = len(u)

    # backtrace: walk positions from each user's last row down to 0
    state = np.zeros(n, dtype=np.int8)
    # final state per user: argmax with lowest-index tie-break
    state[last] = (dp[last, 1] > dp[last, 0]).astype(np.int8)
    # backtrace per STEP (descending): rows at position `step` already
    # hold their final state (set at init for last rows, or by the
    # previous iteration) and push the backpointer onto their
    # predecessor row — vectorized over users like the forward sweep
    for step in range(maxlen - 1, 0, -1):
        cur = pos == step
        if not cur.any():
            continue
        rows = np.flatnonzero(cur)
        state[rows - 1] = bp[rows, state[rows]]
    return pd.DataFrame(
        {"event_id": pd.array(s["event_id"].to_numpy(), "int64"),
         "user_id": pd.array(u, "int64"),
         "pos": pd.array(pos, "int64"),
         "state": pd.array(state.astype("int64"), "int64")}
    )


def viterbi_scores_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """Per-user Viterbi summary: sequence length, final best score
    (micro-nats, exact int64) and the argmax final state (ties → state
    0, mirrored by ``dp0 >= dp1`` in the SQL oracle).  No backtrace —
    this is the SQL-expressible face of the decoder (recursive-CTE
    oracle in ``pipelines/events.py:HMM_SCORE_SQL``)."""
    if not len(g):
        return pd.DataFrame(
            {"user_id": pd.array([], "int64"),
             "n_events": pd.array([], "int64"),
             "score_micro": pd.array([], "int64"),
             "state": pd.array([], "int64")}
        )
    s, u, new_user, pos, dp, bp, last, maxlen = _viterbi_sweep(g)
    li = np.flatnonzero(last)
    return pd.DataFrame(
        {"user_id": pd.array(u[li], "int64"),
         "n_events": pd.array(pos[li] + 1, "int64"),
         "score_micro": pd.array(dp[li].max(axis=1), "int64"),
         "state": pd.array((dp[li, 1] > dp[li, 0]).astype("int64"), "int64")}
    )
