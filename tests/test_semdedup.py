"""SemDeDup gates: distributed result ≡ dense brute force under the
same centroids, parallelism invariance, threshold edge."""

import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


def _dense_removed(threshold):
    import ray.data as rd

    from medical_knowledge_graph_ray.pipelines.docs import (
        KMEANS_ITERS, KMEANS_K,
    )
    from medical_knowledge_graph_ray.stages.clustering import kmeans_fit

    emb = rd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    cent = kmeans_fit(emb, k=KMEANS_K, iters=KMEANS_ITERS)
    df = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    m = (m / np.linalg.norm(m, axis=1, keepdims=True)).astype(np.float32)
    ids = df["vec_id"].to_numpy().astype("int64")
    cluster = (m @ cent.T).argmax(axis=1)

    parent = {int(i): int(i) for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for c in np.unique(cluster):
        sub = np.nonzero(cluster == c)[0]
        if len(sub) < 2:
            continue
        sims = m[sub] @ m[sub].T
        ai, bi = np.nonzero(np.triu(sims >= threshold, 1))
        for a, b in zip(ids[sub[ai]], ids[sub[bi]]):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                lo, hi = min(ra, rb), max(ra, rb)
                parent[hi] = lo
    rows = [(int(i), find(int(i))) for i in ids if find(int(i)) != int(i)]
    return sorted(rows)


@pytest.fixture(scope="module")
def brute(ray_session):
    from medical_knowledge_graph_ray.pipelines.docs import SEMDEDUP_T

    return _dense_removed(SEMDEDUP_T)


def test_semdedup_matches_dense_brute_force(ray_session, brute):
    from medical_knowledge_graph_ray.pipelines.docs import embed_semdedup

    got = embed_semdedup(SF_DIR)
    assert list(map(tuple, got[["vec_id", "comp"]].to_numpy())) == brute
    assert len(got) > 0  # the chosen threshold is non-trivial on testdata


def test_semdedup_parallelism_invariant(ray_session, brute):
    import ray.data as rd

    from medical_knowledge_graph_ray.pipelines.docs import semdedup_removed

    emb = rd.read_parquet(f"{SF_DIR}/embeddings.parquet").repartition(7)
    got = semdedup_removed(emb).to_pandas().sort_values("vec_id")
    assert list(map(tuple, got[["vec_id", "comp"]].to_numpy())) == brute


def test_semdedup_impossible_threshold_removes_nothing(ray_session):
    import ray.data as rd

    from medical_knowledge_graph_ray.pipelines.docs import semdedup_removed

    emb = rd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    out = semdedup_removed(emb, threshold=1.01).to_pandas()
    assert len(out) == 0


def test_dsir_weights_favor_target_and_are_invariant(ray_session):
    """DSIR gates: target-language docs score higher on average, the
    acceptance rule is monotone in logw for a fixed doc hash, and the
    result is identical at any parallelism."""
    import numpy as np

    import __ray_entry__ as em

    df = em.queries()["docs_dsir"](SF_DIR).to_pandas()
    assert set(df.columns) == {"doc_id", "lang", "logw", "keep"}
    tgt = df[df["lang"] == "zh"]["logw"].mean()
    other = df[df["lang"] != "zh"]["logw"].mean()
    assert tgt > other, (tgt, other)
    # the max-logw doc is always accepted (u < exp(0) = 1 for u in [0,1))
    assert bool(df.loc[df["logw"].idxmax(), "keep"])
    assert 0 < df["keep"].sum() < len(df)

    from medical_knowledge_graph_ray.pipelines.docs import docs_dsir

    again = docs_dsir(SF_DIR).to_pandas()
    pd.testing.assert_frame_equal(
        df.sort_values("doc_id").reset_index(drop=True),
        again.sort_values("doc_id").reset_index(drop=True),
    )
