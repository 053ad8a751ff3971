"""Exact distributed discrete quantiles by iterative histogram narrowing.

The classic scale problem: an exact percentile needs a global order
statistic, and a global ``sort`` of the column is a full-range shuffle of
the entire dataset just to read back a handful of values.  This module
computes EXACT ``quantile_disc`` answers (DuckDB semantics: the value at
1-based rank ``max(1, ceil(q·n))``) with **no shuffle and no driver-side
data**: repeated cheap scans, each exchanging only a tiny histogram.

Algorithm (values pre-mapped to int64, e.g. cents):

1. one partial-aggregate pass for (n, min, max);
2. every target quantile starts with interval [min, max] and residual
   rank k; each round, one ``map_batches`` pass counts, per target, how
   many rows fall into each of B equal sub-bins of that target's current
   interval (vectorized ``np.bincount``); the driver folds the tiny
   per-batch histograms, walks the cumulative counts to the bin holding
   the residual rank, and shrinks the interval to that bin;
3. when every interval has width 1, its lower bound IS the answer
   (discrete quantiles of an integer domain).

Rounds needed: ``ceil(log_B(max-min))`` — 2 scans for cent-priced values
up to ~$10M at B=4096.  Exchange per round is O(#blocks · #targets · B)
histogram rows (pre-summed per batch), independent of data size; worker
memory is O(B) per target.  This is the quantile analogue of the engine's
two-phase aggregates: heavy scan, feather-weight exchange.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..functions.arrow import arrow_out

N_BINS = 4096


def _stats_pass(ints_ds):
    """(n, min, max) via per-batch partials + tiny driver fold."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b["v"].to_numpy()
        if not len(v):
            return pd.DataFrame(
                {"n": pd.array([], "int64"), "lo": pd.array([], "int64"),
                 "hi": pd.array([], "int64")}
            )
        return pd.DataFrame(
            {"n": [len(v)], "lo": [int(v.min())], "hi": [int(v.max())]}
        )

    p = ints_ds.map_batches(arrow_out(partial), batch_format="pandas").to_pandas()
    if not len(p) or p["n"].sum() == 0:
        raise ValueError("quantile over an empty dataset")
    lo, hi = int(p["lo"].min()), int(p["hi"].max())
    if hi - lo > 2**62:
        # (v - lo) in the histogram kernel is evaluated in numpy int64
        # and would wrap for ranges wider than 2^63
        raise ValueError(
            "quantiles_disc_int: value range exceeds 2^62 — shift/scale "
            "the column into a narrower int64 domain first"
        )
    return int(p["n"].sum()), lo, hi


def quantiles_disc_int(ints_ds, qs: list[float]) -> pd.DataFrame:
    """Exact discrete quantiles of the int64 column ``v`` of ``ints_ds``.

    Returns a DataFrame (q float64, value int64) — one row per requested
    quantile, DuckDB ``quantile_disc`` semantics (rank uses the same IEEE
    double product ``q·n`` DuckDB computes, so edge cases agree).
    """
    n, g_lo, g_hi = _stats_pass(ints_ds)
    # per-target state: inclusive interval [lo, hi] + residual 1-based rank
    state = [
        {"q": q, "lo": g_lo, "hi": g_hi, "rank": max(1, math.ceil(q * n))}
        for q in qs
    ]

    while any(s["hi"] > s["lo"] for s in state):
        live = [s for s in state if s["hi"] > s["lo"]]
        # freeze a copy for closure capture (the pass must not see later
        # driver-side mutation — Ray may serialize the fn lazily)
        intervals = [(i, s["lo"], s["hi"]) for i, s in enumerate(state)
                     if s["hi"] > s["lo"]]

        def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
            v = b["v"].to_numpy()
            tgt, bins, counts = [], [], []
            for i, lo, hi in intervals:
                # fixed integer bin step — exact (no float drift);
                # ranges wider than 2^62 are rejected in _stats_pass
                step = -(-(hi - lo + 1) // N_BINS)
                m = v[(v >= lo) & (v <= hi)]
                if not len(m):
                    continue
                idx = (m - lo) // step
                c = np.bincount(idx, minlength=N_BINS)
                nz = np.nonzero(c)[0]
                tgt.append(np.full(len(nz), i, np.int64))
                bins.append(nz.astype(np.int64))
                counts.append(c[nz].astype(np.int64))
            if not tgt:
                return pd.DataFrame(
                    {"tgt": pd.array([], "int64"), "bin": pd.array([], "int64"),
                     "cnt": pd.array([], "int64")}
                )
            return pd.DataFrame(
                {"tgt": np.concatenate(tgt), "bin": np.concatenate(bins),
                 "cnt": np.concatenate(counts)}
            )

        hist = (
            ints_ds.map_batches(arrow_out(hist_partial), batch_format="pandas")
            .to_pandas()
            .groupby(["tgt", "bin"], sort=True)["cnt"].sum()
        )
        for s, (i, lo, hi) in zip(live, intervals):
            step = -(-(hi - lo + 1) // N_BINS)
            sub = hist.loc[i] if i in hist.index.get_level_values(0) else None
            if sub is None:
                raise RuntimeError("histogram lost rows — interval invariant broken")
            cum = sub.cumsum()
            pos = int(np.searchsorted(cum.to_numpy(), s["rank"]))
            b = int(cum.index[pos])
            before = int(cum.iloc[pos - 1]) if pos else 0
            s["rank"] -= before
            # bin b covers the ints [lo + b·step, min(hi, lo + (b+1)·step − 1)]
            s["lo"] = lo + b * step
            s["hi"] = min(hi, lo + (b + 1) * step - 1)

    return pd.DataFrame(
        {"q": np.asarray([s["q"] for s in state], np.float64),
         "value": np.asarray([s["lo"] for s in state], np.int64)}
    )
