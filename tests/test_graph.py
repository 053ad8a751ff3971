"""PageRank (stages/graph.py) + entity co-occurrence tests."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from medical_knowledge_graph_ray.stages.graph import pagerank, pagerank_power

SF = "/root/testdata/sf0.001"


def _random_edges(seed: int = 7, n_nodes: int = 120, n_edges: int = 500):
    rng = np.random.RandomState(seed)
    e = pd.DataFrame(
        {
            "src": rng.randint(0, n_nodes, n_edges),
            "dst": rng.randint(0, n_nodes, n_edges),
            "w": rng.randint(1, 5, n_edges).astype(float),
        }
    )
    return e[e.src != e.dst].reset_index(drop=True)


@pytest.mark.parametrize("symmetric", [False, True])
def test_pagerank_bsp_matches_power(ray_session, symmetric):
    import ray.data as rd

    e = _random_edges()
    got = (
        pagerank(
            rd.from_pandas(e), "src", "dst", "w",
            iters=6, num_buckets=8, symmetric=symmetric, mode="bsp",
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    exp = (
        pagerank_power(e, "src", "dst", "w", iters=6, symmetric=symmetric)
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert (got["node"].to_numpy() == exp["node"].to_numpy()).all()
    assert np.abs(got["rank"].to_numpy() - exp["rank"].to_numpy()).max() < 1e-9


def test_pagerank_parallelism_invariance(ray_session):
    import ray.data as rd

    e = _random_edges(seed=11)
    outs = []
    for nb in (2, 8):
        outs.append(
            pagerank(rd.from_pandas(e), "src", "dst", "w", iters=4,
                     num_buckets=nb, symmetric=False, mode="bsp")
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
    assert (outs[0]["node"].to_numpy() == outs[1]["node"].to_numpy()).all()
    assert np.abs(
        outs[0]["rank"].to_numpy() - outs[1]["rank"].to_numpy()
    ).max() < 1e-9


def test_pagerank_is_a_distribution_with_dangling(ray_session):
    """Directed chain with a sink: dangling mass must be redistributed,
    keeping Σrank = 1 exactly (up to float summation)."""
    import ray.data as rd

    e = pd.DataFrame({"src": [1, 2, 3, 4], "dst": [2, 3, 4, 5]})
    got = pagerank(
        rd.from_pandas(e), iters=10, num_buckets=2, mode="bsp"
    ).to_pandas()
    assert abs(got["rank"].sum() - 1.0) < 1e-9
    exp = pagerank_power(e, iters=10)
    m = got.sort_values("node")["rank"].to_numpy()
    assert np.abs(m - exp.sort_values("node")["rank"].to_numpy()).max() < 1e-12


def test_pagerank_auto_dense_equals_bsp(ray_session):
    """The adaptive finalizer (mode='auto' under the edge bound) must
    agree with the forced BSP path to 1e-9 — same contract either way."""
    import ray.data as rd

    e = _random_edges(seed=3)
    a = (
        pagerank(rd.from_pandas(e), "src", "dst", "w", iters=5,
                 symmetric=True, mode="auto")
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    b = (
        pagerank(rd.from_pandas(e), "src", "dst", "w", iters=5,
                 symmetric=True, mode="bsp")
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    assert (a["node"].to_numpy() == b["node"].to_numpy()).all()
    assert np.abs(a["rank"].to_numpy() - b["rank"].to_numpy()).max() < 1e-9


def test_pagerank_empty_edges(ray_session):
    import pyarrow as pa
    import ray.data as rd

    empty = rd.from_arrow(
        pa.table({"src": pa.array([], pa.int64()),
                  "dst": pa.array([], pa.int64())})
    )
    out = pagerank(empty)
    # Ray 2.49 `to_pandas()` drops schema on zero-block datasets, so the
    # contract is asserted on the Dataset itself.
    assert out.schema().names == ["node", "rank"]
    assert out.count() == 0


def test_cooccur_batch_matches_naive():
    """doc_cooccur_batch ≡ brute-force pair expansion of the kernel's
    per-doc counts (including the n_docs / w_total aggregation)."""
    from itertools import combinations

    from medical_knowledge_graph_ray.pipelines.docs_kg import (
        _KERNEL,
        doc_cooccur_batch,
    )

    texts = [
        "the server cluster and the database cluster share a network switch",
        "machine learning model training on the server",
        "database index and query planner tuning guide",
        "no relevant terms at all here",
    ]
    b = pd.DataFrame(
        {"doc_id": range(len(texts)), "source": "s", "text": texts}
    )
    got = (
        doc_cooccur_batch(b)
        .sort_values(["term_a", "term_b"])
        .reset_index(drop=True)
    )
    agg: dict[tuple[str, str], list[int]] = {}
    for counts in _KERNEL.counts(texts):
        for ta, tb in combinations(sorted(counts), 2):
            cur = agg.setdefault((ta, tb), [0, 0])
            cur[0] += 1
            cur[1] += counts[ta] * counts[tb]
    assert len(got) == len(agg)
    for _, row in got.iterrows():
        n_docs, w_total = agg[(row["term_a"], row["term_b"])]
        assert (row["n_docs"], row["w_total"]) == (n_docs, w_total)


def test_entity_salience_is_ranked_distribution(ray_session):
    from medical_knowledge_graph_ray.ontology import WEBTEXT_GAZETTEER
    from medical_knowledge_graph_ray.pipelines.docs_kg import kg_entity_salience

    out = kg_entity_salience(SF)
    assert set(out["term"]) <= set(WEBTEXT_GAZETTEER)
    assert abs(out["rank"].sum() - 1.0) < 1e-3  # 6-dp rounding slack
    assert (out["rank"].to_numpy()[:-1] >= out["rank"].to_numpy()[1:]).all()


# -- k-hop neighborhood --------------------------------------------------------

def test_k_hop_dense_hand_case():
    from medical_knowledge_graph_ray.stages.graph import k_hop_dense

    # 1-2-3-4-5 chain plus a 2-6 spur; BFS from 2 with k=2
    e = pd.DataFrame({"src": [1, 2, 3, 4, 2], "dst": [2, 3, 4, 5, 6]})
    got = k_hop_dense(e, "src", "dst", [2], k=2)
    assert got == {2: 0, 1: 1, 3: 1, 6: 1, 4: 2}


def test_k_hop_frontier_matches_dense(ray_session):
    import ray.data as rd

    from medical_knowledge_graph_ray.stages.graph import (
        k_hop_dense,
        k_hop_frontier,
    )

    e = _random_edges(seed=5, n_nodes=200, n_edges=260)
    seeds = [0, 1]
    for k in (1, 2, 4):
        dense = k_hop_dense(e, "src", "dst", seeds, k=k)
        dist = k_hop_frontier(rd.from_pandas(e), "src", "dst", seeds, k=k)
        assert dist == dense


def test_kg_khop_frontier_mode_matches_dense(ray_session):
    from medical_knowledge_graph_ray.pipelines.docs_kg import kg_khop

    dense = kg_khop(SF, k=3)
    frontier = kg_khop(SF, k=3, mode="frontier")
    pd.testing.assert_frame_equal(dense, frontier)
    assert (dense["hop"] == 0).sum() == 1  # exactly one seed row


# -- triangle census ----------------------------------------------------------

def _random_undirected(seed: int = 11, n_nodes: int = 60, n_edges: int = 260):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, n_nodes, n_edges)
    b = rng.randint(0, n_nodes, n_edges)
    e = pd.DataFrame({"src": np.minimum(a, b), "dst": np.maximum(a, b)})
    e = e[e.src != e.dst].drop_duplicates().reset_index(drop=True)
    return e


@pytest.mark.parametrize("nb", [1, 16])
def test_triangle_counts_matches_dense(ray_session, nb):
    """Distributed degree-oriented wedge semi-join ≡ dense A³/2 — at two
    bucket counts (parallelism invariance)."""
    import ray.data as rd

    from medical_knowledge_graph_ray.stages.graph import (
        triangle_counts,
        triangle_counts_dense,
    )

    e = _random_undirected()
    got = (
        triangle_counts(
            rd.from_pandas(e), node_type=__import__("pyarrow").int64(),
            num_buckets=nb,
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    exp = (
        triangle_counts_dense(e, "src", "dst")
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert exp["triangles"].sum() > 30  # non-trivial instance
    pd.testing.assert_frame_equal(
        got.astype({"node": "int64"}), exp.astype({"node": "int64"})
    )


def test_triangle_counts_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from medical_knowledge_graph_ray.stages.graph import triangle_counts

    e = pd.DataFrame({"src": pd.array([], "int64"), "dst": pd.array([], "int64")})
    out = triangle_counts(rd.from_pandas(e), node_type=pa.int64())
    assert out.count() == 0


def test_anomaly_isqrt_inequality_exact():
    """events_anomaly's vectorized row test |d| > isqrt(R) must equal the
    exact bignum comparison d² > R, including at perfect squares."""
    import math

    rng = np.random.RandomState(3)
    ds = rng.randint(-10**9, 10**9, 2000).astype(object)
    rs = [int(abs(r)) for r in rng.randint(0, 10**18, 1000)]
    rs += [int(d) * int(d) for d in ds[:500]]  # exact-square boundaries
    for d, r in zip(ds, rs):
        exact = int(d) * int(d) > r
        via_isqrt = abs(int(d)) > math.isqrt(r)
        assert exact == via_isqrt


def _kcore_brute(edges, k):
    """Independent reference: repeatedly drop min-degree node (one at a
    time — a DIFFERENT peeling order than the shell-at-a-time paths,
    exercising confluence)."""
    import collections

    adj = collections.defaultdict(set)
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    return {n: len(ns) for n, ns in adj.items() if ns}


def test_kcore_bsp_equals_dense_and_brute(ray_session):
    import hashlib

    import pandas as pd
    import ray.data as rd

    from medical_knowledge_graph_ray.stages.graph import (
        k_core_dense, k_core_nodes)

    def h(i):
        return int(hashlib.md5(f"kc|{i}".encode()).hexdigest()[:8], 16)

    edges = [(h(i) % 37, h(i + 1000) % 37) for i in range(160)]
    edges = [(s, d) for s, d in edges if s != d]
    df = pd.DataFrame({"src": [e[0] for e in edges],
                       "dst": [e[1] for e in edges]}).drop_duplicates()
    # distinct undirected pairs, one orientation each
    df = df[df["src"] < df["dst"]]
    brute = _kcore_brute(list(zip(df["src"], df["dst"])), 3)

    for nparts in (1, 7):
        ds = rd.from_pandas(df).repartition(nparts)
        for mode in ("bsp", "dense"):
            out = k_core_nodes(ds, 3, mode=mode)
            got = dict(zip(out["node"], out["core_deg"]))
            assert got == brute, (mode, nparts)


def test_kcore_triangle_with_tail(ray_session):
    import pandas as pd
    import ray.data as rd

    from medical_knowledge_graph_ray.stages.graph import k_core_nodes

    df = pd.DataFrame({"src": [1, 2, 3, 3], "dst": [2, 3, 1, 4]})
    out = k_core_nodes(rd.from_pandas(df), 2, mode="bsp")
    assert dict(zip(out["node"], out["core_deg"])) == {1: 2, 2: 2, 3: 2}
    out0 = k_core_nodes(rd.from_pandas(df), 5, mode="bsp")
    assert len(out0) == 0


def test_lpa_bsp_equals_dense_and_hand_case(ray_session):
    """LPA: BSP path ≡ dense path exactly (same deterministic
    semantics), and two cliques joined by one bridge edge resolve to
    two communities."""
    import ray.data as rd

    from medical_knowledge_graph_ray.stages.graph import (
        lpa_communities,
        lpa_dense,
    )

    # two 4-cliques bridged by one edge
    def clique(names):
        return [(a, b) for i, a in enumerate(names) for b in names[i + 1:]]

    e = clique(["a1", "a2", "a3", "a4"]) + clique(["b1", "b2", "b3", "b4"])
    e.append(("a1", "b1"))
    edges = pd.DataFrame({"src": [x for x, _ in e],
                          "dst": [y for _, y in e]})
    ds = rd.from_pandas(edges).repartition(3)

    dense = lpa_dense(
        pd.DataFrame({"u": pd.concat([edges["src"], edges["dst"]]),
                      "v": pd.concat([edges["dst"], edges["src"]])}),
        rounds=10,
    )
    bsp = lpa_communities(ds, rounds=10, mode="bsp", num_buckets=3)
    auto = lpa_communities(ds, rounds=10)
    pd.testing.assert_frame_equal(bsp.reset_index(drop=True), dense)
    pd.testing.assert_frame_equal(auto.reset_index(drop=True), dense)

    lab = dict(zip(dense["node"], dense["community"]))
    a = {lab[n] for n in ["a1", "a2", "a3", "a4"]}
    b = {lab[n] for n in ["b1", "b2", "b3", "b4"]}
    assert len(a) == 1 and len(b) == 1 and a != b


# -- HITS ------------------------------------------------------------------


def test_hits_bsp_matches_power(ray_session):
    import ray.data as rd

    from medical_knowledge_graph_ray.stages.graph import hits, hits_power

    e = _random_edges(seed=19)
    got = (
        hits(rd.from_pandas(e), "src", "dst", "w",
             iters=5, num_buckets=8, mode="bsp")
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    exp = (
        hits_power(e, "src", "dst", "w", iters=5)
        .sort_values("node").reset_index(drop=True)
    )
    assert np.array_equal(got["node"].to_numpy(), exp["node"].to_numpy())
    assert np.allclose(got["hub"], exp["hub"], atol=1e-9)
    assert np.allclose(got["authority"], exp["authority"], atol=1e-9)


def test_hits_star_graph_authority(ray_session):
    """All spokes point at the center: center = sole authority, spokes
    share all hub mass, center hub = 0 (no out-edges)."""
    from medical_knowledge_graph_ray.stages.graph import hits_power

    e = pd.DataFrame({"src": [1, 2, 3, 4], "dst": [0, 0, 0, 0]})
    r = hits_power(e, iters=10).set_index("node")
    assert abs(r.loc[0, "authority"] - 1.0) < 1e-12
    assert r.loc[0, "hub"] == 0.0
    for s in (1, 2, 3, 4):
        assert abs(r.loc[s, "hub"] - 0.25) < 1e-12
        assert r.loc[s, "authority"] == 0.0


def test_hits_bucket_invariance(ray_session):
    import ray.data as rd

    from medical_knowledge_graph_ray.stages.graph import hits

    e = _random_edges(seed=23, n_nodes=60, n_edges=200)
    a = (hits(rd.from_pandas(e), "src", "dst", "w",
              iters=4, num_buckets=4, mode="bsp")
         .to_pandas().sort_values("node").reset_index(drop=True))
    b = (hits(rd.from_pandas(e), "src", "dst", "w",
              iters=4, num_buckets=16, mode="bsp")
         .to_pandas().sort_values("node").reset_index(drop=True))
    assert np.allclose(a["hub"], b["hub"], atol=1e-9)
    assert np.allclose(a["authority"], b["authority"], atol=1e-9)


def test_kg_hits_runs_and_is_normalized(ray_session):
    from medical_knowledge_graph_ray.pipelines.docs_kg import kg_hits

    r = kg_hits(SF, iters=8)
    assert len(r) > 0
    assert {"kind", "name", "hub", "authority"} <= set(r.columns)
    # L1 normalization: each score vector sums to ~1 (6dp rounding slack)
    assert abs(r["hub"].sum() - 1.0) < 1e-3
    assert abs(r["authority"].sum() - 1.0) < 1e-3
    # bipartite: sources are pure hubs, terms pure authorities
    assert (r.loc[r["kind"] == "source", "authority"] == 0).all()
    assert (r.loc[r["kind"] == "term", "hub"] == 0).all()


# -- betweenness centrality -------------------------------------------------


def _slow_brandes(u, v):
    from collections import defaultdict, deque

    edges = set()
    for a, b in zip(u, v):
        if a != b:
            edges.add((a, b))
            edges.add((b, a))
    nbr = defaultdict(list)
    for a, b in sorted(edges):
        nbr[a].append(b)
    bc = defaultdict(float)
    for s in sorted(nbr):
        S, P = [], defaultdict(list)
        sig, d = defaultdict(float), {s: 0}
        sig[s] = 1
        Q = deque([s])
        while Q:
            x = Q.popleft()
            S.append(x)
            for w in nbr[x]:
                if w not in d:
                    d[w] = d[x] + 1
                    Q.append(w)
                if d[w] == d[x] + 1:
                    sig[w] += sig[x]
                    P[w].append(x)
        delta = defaultdict(float)
        while S:
            w = S.pop()
            for x in P[w]:
                delta[x] += sig[x] / sig[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return {n: bc[n] / 2 for n in sorted(nbr)}


def test_betweenness_dense_hand_cases():
    from medical_knowledge_graph_ray.stages.graph import betweenness_dense

    # P4 path: middle nodes lie on 2 endpoint pairs each
    r = betweenness_dense(pd.DataFrame({"u": [1, 2, 3], "v": [2, 3, 4]}))
    got = dict(zip(r["node"], r["bc_micro"] / 2e6))
    assert got == {1: 0.0, 2: 2.0, 3: 2.0, 4: 0.0}
    # star: center on all (n-1)(n-2)/2 pairs
    r = betweenness_dense(
        pd.DataFrame({"u": [0] * 5, "v": [1, 2, 3, 4, 5]}))
    assert dict(zip(r["node"], r["bc_micro"] / 2e6))[0] == 10.0


def test_betweenness_dense_matches_slow_reference():
    from medical_knowledge_graph_ray.stages.graph import betweenness_dense

    rng = np.random.RandomState(11)
    u = rng.randint(0, 30, 90)
    v = rng.randint(0, 30, 90)
    got = betweenness_dense(pd.DataFrame({"u": u, "v": v}))
    gm = dict(zip(got["node"], got["bc_micro"] / 2e6))
    want = _slow_brandes(u, v)
    assert set(gm) == set(want)
    for n in want:
        assert abs(gm[n] - want[n]) < 1e-4, n


def test_betweenness_distributed_equals_dense_and_invariant(ray_session):
    import ray.data as rd

    from medical_knowledge_graph_ray.stages.graph import (betweenness,
                                                          betweenness_dense)

    rng = np.random.RandomState(5)
    df = pd.DataFrame({"src": rng.randint(0, 40, 150).astype("int64"),
                       "dst": rng.randint(0, 40, 150).astype("int64")})
    dense = betweenness_dense(df, "src", "dst").set_index("node")["bc_micro"]
    dense = dense[dense != 0]
    a = betweenness(rd.from_pandas(df), pivot_batch=4,
                    num_buckets=4).to_pandas()
    b = betweenness(rd.from_pandas(df), pivot_batch=17,
                    num_buckets=9).to_pandas()
    for got in (a, b):  # exact integer fold ⇒ bit-identical
        g = got.set_index("node")["bc_micro"].sort_index()
        assert g.equals(dense.sort_index())


def test_betweenness_pivot_sampling_is_stable_subset(ray_session):
    import ray.data as rd

    from medical_knowledge_graph_ray.stages.graph import (betweenness,
                                                          betweenness_dense)
    from medical_knowledge_graph_ray.functions.hashing import \
        md5_int_vec_prefixed

    rng = np.random.RandomState(9)
    df = pd.DataFrame({"src": rng.randint(0, 25, 80).astype("int64"),
                       "dst": rng.randint(0, 25, 80).astype("int64")})
    got = betweenness(rd.from_pandas(df), n_pivots=6,
                      pivot_batch=2).to_pandas()
    # pin the estimator: dense restricted to the SAME md5-stable pivots
    nodes = np.unique(np.concatenate([df["src"], df["dst"]]))
    h = md5_int_vec_prefixed("bc-pivot|", nodes, bits=64)
    piv = nodes[np.sort(np.argsort(h, kind="stable")[:6])]
    want = betweenness_dense(df, "src", "dst", pivots=piv)
    want = want[want["bc_micro"] != 0]
    g = got.set_index("node")["bc_micro"].sort_index()
    w = want.set_index("node")["bc_micro"].sort_index()
    assert g.equals(w)


# -- weighted SSSP ------------------------------------------------------------


def test_sssp_hand_case_and_unreachable(ray_session):
    import ray.data as rd

    from medical_knowledge_graph_ray.stages.graph import sssp

    # 0-1 heavy direct edge vs cheap 0-2-1 detour; 5-6 disconnected
    df = pd.DataFrame({"src": [0, 0, 2, 5], "dst": [1, 2, 1, 6],
                       "w": [5.0, 1.0, 1.0, 1.0]})
    got = sssp(rd.from_pandas(df), weight_col="w", source=0, mode="dense")
    m = dict(zip(got["node"], got["dist_micro"]))
    assert m == {0: 0, 1: 2_000_000, 2: 1_000_000}  # detour wins; 5,6 absent


def test_sssp_bsp_equals_dijkstra_bit_exact(ray_session):
    import ray.data as rd

    from medical_knowledge_graph_ray.stages.graph import sssp

    rng = np.random.RandomState(13)
    df = pd.DataFrame({"src": rng.randint(0, 50, 200).astype("int64"),
                       "dst": rng.randint(0, 50, 200).astype("int64"),
                       "w": rng.uniform(0.1, 3.0, 200)})
    dense = sssp(rd.from_pandas(df), weight_col="w", source=int(df["src"][0]),
                 mode="dense")
    bsp1 = sssp(rd.from_pandas(df), weight_col="w", source=int(df["src"][0]),
                mode="bsp", num_buckets=4)
    bsp2 = sssp(rd.from_pandas(df), weight_col="w", source=int(df["src"][0]),
                mode="bsp", num_buckets=11)
    for got in (bsp1, bsp2):
        assert got.equals(dense)


def test_sssp_rejects_negative_weights(ray_session):
    import ray.data as rd

    from medical_knowledge_graph_ray.stages.graph import sssp

    df = pd.DataFrame({"src": [0], "dst": [1], "w": [-1.0]})
    with pytest.raises(Exception):
        sssp(rd.from_pandas(df), weight_col="w", source=0, mode="dense")


def test_msf_hand_case(ray_session):
    import ray.data as rd

    from medical_knowledge_graph_ray.stages.graph import msf

    # square with a cheap diagonal: MSF = the three cheapest non-cyclic
    df = pd.DataFrame({"src": [0, 1, 2, 3, 0],
                       "dst": [1, 2, 3, 0, 2],
                       "w":   [1.0, 4.0, 2.0, 3.0, 1.5]})
    got = msf(rd.from_pandas(df), weight_col="w", mode="dense")
    assert [tuple(r) for r in got[["u", "v"]].to_numpy()] == \
        [(0, 1), (0, 2), (2, 3)]
    assert got["w_micro"].tolist() == [1_000_000, 1_500_000, 2_000_000]


def test_msf_bsp_equals_kruskal_bit_exact(ray_session):
    import ray.data as rd

    from medical_knowledge_graph_ray.stages.graph import msf

    rng = np.random.RandomState(7)
    df = pd.DataFrame({"src": rng.randint(0, 60, 300).astype("int64"),
                       "dst": rng.randint(0, 60, 300).astype("int64"),
                       # repeated weights on purpose: the (w, u, v)
                       # composite must keep the forest unique
                       "w": rng.randint(1, 6, 300).astype("float64")})
    dense = msf(rd.from_pandas(df), weight_col="w", mode="dense")
    bsp1 = msf(rd.from_pandas(df), weight_col="w", mode="bsp", num_buckets=4)
    bsp2 = msf(rd.from_pandas(df), weight_col="w", mode="bsp", num_buckets=11)
    assert len(dense) > 0
    for got in (bsp1, bsp2):
        assert got.equals(dense)


def test_msf_negative_weights_and_forest(ray_session):
    import ray.data as rd

    from medical_knowledge_graph_ray.stages.graph import msf

    # two disconnected components -> a forest, negative weights allowed
    df = pd.DataFrame({"src": [0, 1, 10, 11],
                       "dst": [1, 2, 11, 12],
                       "w": [-5.0, -1.0, -2.0, -3.0]})
    dense = msf(rd.from_pandas(df), weight_col="w", mode="dense")
    bsp = msf(rd.from_pandas(df), weight_col="w", mode="bsp", num_buckets=3)
    assert bsp.equals(dense)
    assert len(dense) == 4  # both components fully spanned


def test_kg_mst_is_spanning_and_max_evidence(ray_session):
    from medical_knowledge_graph_ray.pipelines.docs_kg import (
        doc_cooccurrence, kg_mst)

    sf = "/root/testdata/sf0.001"
    got = kg_mst(sf)
    edges = doc_cooccurrence(sf).to_pandas()
    terms = set(edges["term_a"]) | set(edges["term_b"])
    # a spanning forest of a connected co-occurrence graph: |V|-1 edges
    touched = set(got["term_a"]) | set(got["term_b"])
    assert touched == terms
    assert len(got) <= len(terms) - 1
    # every kept edge's evidence appears in the source graph
    key = {(a, b): n for a, b, n in zip(
        edges["term_a"], edges["term_b"], edges["n_docs"])}
    key.update({(b, a): n for (a, b), n in list(key.items())})
    assert all(key[(a, b)] == n for a, b, n in
               zip(got["term_a"], got["term_b"], got["n_docs"]))
