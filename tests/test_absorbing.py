"""Absorbing-Markov expected-steps gates: hand-chain closed form, the
defining identity (I−Q)t = 1, dangling-state handling, and the
distributed census ≡ pandas census."""

import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

from medical_knowledge_graph_ray.pipelines.events import (  # noqa: E402
    absorbing_expected_steps,
)


def test_hand_chain_closed_form():
    # a --0.5--> purchase, a --0.5--> a : t = 1/0.5 = 2 (geometric)
    census = pd.DataFrame(
        {"event_type": ["a", "a"], "next_type": ["purchase", "a"],
         "n": [5, 5]}
    )
    out = absorbing_expected_steps(census)
    assert list(out["event_type"]) == ["a"]
    assert out["expected_steps"].iloc[0] == pytest.approx(2.0, abs=1e-9)


def test_two_state_chain():
    # b always -> a; a -> purchase w.p. 1 ⇒ t(a)=1, t(b)=2
    census = pd.DataFrame(
        {"event_type": ["a", "b"], "next_type": ["purchase", "a"],
         "n": [3, 7]}
    )
    out = absorbing_expected_steps(census).set_index("event_type")
    assert out.loc["a", "expected_steps"] == pytest.approx(1.0)
    assert out.loc["b", "expected_steps"] == pytest.approx(2.0)


def test_identity_holds_on_real_census(ray_session):
    from medical_knowledge_graph_ray.pipelines.events import events_absorbing

    out = events_absorbing("/root/testdata/sf0.001")
    # rebuild Q from the raw data and check (I−Q)t = 1
    ev = pd.read_parquet(
        "/root/testdata/sf0.001/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    ).sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    u = ev["user_id"].to_numpy()
    et = ev["event_type"].to_numpy()
    same = u[:-1] == u[1:]
    census = (
        pd.DataFrame({"event_type": et[:-1][same], "next_type": et[1:][same]})
        .groupby(["event_type", "next_type"], sort=True)
        .size().rename("n").reset_index()
    )
    local = absorbing_expected_steps(census)
    pd.testing.assert_frame_equal(out, local)

    transient = list(local["event_type"])
    idx = {t: i for i, t in enumerate(transient)}
    k = len(transient)
    q = np.zeros((k, k))
    outn = local.set_index("event_type")["n_out"]
    for t, nx, n in zip(census["event_type"], census["next_type"], census["n"]):
        if t in idx and nx in idx:
            q[idx[t], idx[nx]] = n / outn[t]
    t_vec = local["expected_steps"].to_numpy()
    resid = (np.eye(k) - q) @ t_vec - 1.0
    assert np.abs(resid).max() < 1e-5  # 6-dp rounding of t bounds this


def test_dangling_state_is_nan():
    # c has no outgoing transitions at all (appears only as a target)
    census = pd.DataFrame(
        {"event_type": ["a", "a"], "next_type": ["purchase", "c"],
         "n": [1, 1]}
    )
    out = absorbing_expected_steps(census).set_index("event_type")
    assert np.isnan(out.loc["c", "expected_steps"])
    assert out.loc["c", "n_out"] == 0


def test_markov_attribution_hand_chain_and_invariance(ray_session, tmp_path):
    """Removal-effect attribution: a hand-built two-channel corpus where
    every conversion flows through channel A gives A all the credit;
    shares normalize to ~1; the result is invariant to event-table
    partitioning."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from medical_knowledge_graph_ray.pipelines.events import (
        events_markov_attribution,
    )

    root = str(tmp_path)
    # users 0..9: view_a -> purchase (converts THROUGH a)
    # users 10..19: view_b -> end (never converts)
    uids, ts, types = [], [], []
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    for u in range(10):
        uids += [u, u]
        ts += [t0 + np.timedelta64(u * 100, "s"),
               t0 + np.timedelta64(u * 100 + 10, "s")]
        types += ["view_a", "purchase"]
    for u in range(10, 20):
        uids.append(u)
        ts.append(t0 + np.timedelta64(u * 100, "s"))
        types.append("view_b")
    tbl = pa.table({
        "event_id": pa.array(np.arange(len(uids)), pa.int64()),
        "user_id": pa.array(uids, pa.int64()),
        "ts": pa.array(ts),
        "event_type": pa.array(types),
        "value": pa.array(np.ones(len(uids))),
    })
    pq.write_table(tbl, f"{root}/events.parquet")

    out = events_markov_attribution(root)
    d = dict(zip(out["channel"], out["share_micro"]))
    assert d["view_a"] == 1_000_000       # all credit through a
    assert d.get("view_b", 0) == 0
    assert out["share_micro"].sum() in (1_000_000,)

    # invariance: same table written as 4 shuffled row groups
    root2 = str(tmp_path / "p2")
    import os
    os.makedirs(root2, exist_ok=True)
    perm = np.random.RandomState(3).permutation(len(uids))
    pq.write_table(tbl.take(pa.array(perm)), f"{root2}/events.parquet",
                   row_group_size=8)
    out2 = events_markov_attribution(root2)
    pd.testing.assert_frame_equal(out, out2)
