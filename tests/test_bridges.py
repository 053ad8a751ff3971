"""Bridge-detection gates: Tarjan ≡ brute edge-removal, hand graphs,
and the distributed fragile-links query's parity + invariance."""

import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

from medical_knowledge_graph_ray.stages.graph import bridge_edges  # noqa: E402


def _brute_bridges(g: pd.DataFrame) -> list[tuple[int, int]]:
    def ncomp(edges, nodes):
        p = {n: n for n in nodes}

        def f(x):
            while p[x] != x:
                p[x] = p[p[x]]
                x = p[x]
            return x

        for u, v in edges:
            ru, rv = f(u), f(v)
            if ru != rv:
                p[max(ru, rv)] = min(ru, rv)
        return len({f(n) for n in nodes})

    nodes = set(g.a) | set(g.b)
    base = ncomp(list(zip(g.a, g.b)), nodes)
    out = set()
    for i in range(len(g)):
        e = [(u, v) for j, (u, v) in enumerate(zip(g.a, g.b)) if j != i]
        if ncomp(e, nodes) > base:
            out.add((min(g.a[i], g.b[i]), max(g.a[i], g.b[i])))
    return sorted(out)


CASES = [
    pd.DataFrame({"a": [1, 2, 3, 4, 5], "b": [2, 3, 4, 5, 3]}),   # tail + cycle
    pd.DataFrame({"a": [1, 2, 3], "b": [2, 3, 1]}),               # pure cycle
    pd.DataFrame({"a": [1, 3], "b": [2, 4]}),                     # two components
    pd.DataFrame({"a": [1, 2, 2, 4, 5, 6, 6], "b": [2, 3, 4, 5, 2, 7, 1]}),
    pd.DataFrame({"a": [1], "b": [2]}),                            # single edge
]


@pytest.mark.parametrize("g", CASES)
def test_tarjan_matches_brute(g):
    got = bridge_edges(g).apply(tuple, axis=1).tolist()
    assert got == _brute_bridges(g)


def test_edge_order_invariance():
    g = CASES[3]
    base = bridge_edges(g)
    perm = bridge_edges(g.iloc[::-1].reset_index(drop=True))
    pd.testing.assert_frame_equal(base, perm)


def test_fragile_links_query(ray_session):
    from medical_knowledge_graph_ray.pipelines.docs import docs_fragile_links
    from medical_knowledge_graph_ray.stages.dedup import simhash_batch

    got = docs_fragile_links("/root/testdata/sf0.001")
    assert len(got) > 0  # the testdata near-dup graph has chain structure

    # brute reference on the same pairs, whole-graph
    docs = pd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    fps = simhash_batch(docs)
    ids = fps["doc_id"].to_numpy()
    sh = fps["simhash"].to_numpy().astype(np.uint64)
    dif = sh[:, None] ^ sh[None, :]
    ham = np.zeros_like(dif, dtype=np.int64)
    x = dif.copy()
    while x.any():
        ham += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    ii, jj = np.nonzero(np.triu(ham <= 3, k=1))
    g = pd.DataFrame({"a": ids[ii], "b": ids[jj]})
    want = _brute_bridges(g)
    assert sorted(zip(got["doc_a"], got["doc_b"])) == want
