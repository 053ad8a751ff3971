"""Distributed spherical k-means (stages/clustering.py).

No SQL oracle exists for an iterative fit; these gates pin the contracts
the query relies on instead: bit-identical centroids at any parallelism
(exact int64 fixed-point partials), distributed ≡ dense driver path,
monotone improvement over the init, and degenerate-input safety.
"""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _emb(blocks=None):
    import ray.data as rd

    kw = {"override_num_blocks": blocks} if blocks else {}
    return rd.read_parquet(f"{SF}/embeddings.parquet", **kw)


def test_fit_parallelism_invariant(ray_session):
    from medical_knowledge_graph_ray.stages.clustering import kmeans_fit

    c1 = kmeans_fit(_emb(1), k=6, iters=4, mode="distributed")
    c7 = kmeans_fit(_emb(7), k=6, iters=4, mode="distributed")
    assert np.array_equal(c1, c7)


def test_distributed_equals_dense(ray_session):
    from medical_knowledge_graph_ray.stages.clustering import kmeans_fit

    cd = kmeans_fit(_emb(), k=6, iters=4, mode="distributed")
    cn = kmeans_fit(_emb(), k=6, iters=4, mode="dense")
    assert np.array_equal(cd, cn)


def test_fit_improves_over_init(ray_session):
    from medical_knowledge_graph_ray.stages.clustering import (
        kmeans_assign, kmeans_fit, kmeans_init,
    )

    init = kmeans_init(_emb(), 10)
    fit = kmeans_fit(_emb(), k=10, iters=8)
    sim0 = kmeans_assign(_emb(), init).to_pandas()["sim_ppm"].mean()
    sim1 = kmeans_assign(_emb(), fit).to_pandas()["sim_ppm"].mean()
    # measured: 0.204 -> 0.290 mean cosine on the sf0.001 table
    assert sim1 > sim0 + 50_000  # ≥ +0.05 cosine in ppm units


def test_assign_covers_every_row_once(ray_session):
    from medical_knowledge_graph_ray.stages.clustering import (
        kmeans_assign, kmeans_fit,
    )

    cent = kmeans_fit(_emb(), k=5, iters=3)
    a = kmeans_assign(_emb(), cent).to_pandas()
    src = _emb().to_pandas()
    assert sorted(a["vec_id"]) == sorted(src["vec_id"])
    assert a["cluster"].between(0, 4).all()
    assert a["sim_ppm"].between(-1_000_000, 1_000_000).all()


def test_degenerate_more_clusters_than_rows(ray_session):
    import ray.data as rd

    from medical_knowledge_graph_ray.stages.clustering import (
        kmeans_assign, kmeans_fit,
    )

    rows = _emb().to_pandas().head(5)
    tiny = rd.from_pandas(rows)
    cent = kmeans_fit(tiny, k=8, iters=2, mode="dense")
    assert cent.shape == (8, 64)
    assert np.isfinite(cent).all()
    a = kmeans_assign(tiny, cent).to_pandas()
    assert len(a) == 5


def test_query_census_shape(ray_session):
    from medical_knowledge_graph_ray.pipelines.docs import embed_kmeans

    out = embed_kmeans(SF)
    assert list(out.columns) == ["cluster", "n", "avg_sim"]
    assert out["n"].sum() == 500
    assert (out["avg_sim"] > 0).all()


def test_pca_parallelism_invariant(ray_session):
    """Exact int64 sufficient statistics + Python big-int combine ⇒ the
    eigh input matrix is bit-identical at any block count, so the full
    output frame is too."""
    from medical_knowledge_graph_ray.stages.clustering import pca_fit

    p1 = pca_fit(_emb(1), n_components=4)
    p9 = pca_fit(_emb(9), n_components=4)
    pd.testing.assert_frame_equal(p1, p9)


def test_pca_matches_dense(ray_session):
    """Distributed PCA equals a dense single-machine PCA on the same
    fixed-point-quantized data, bit for bit (same covariance ints →
    same eigh → same sign convention)."""
    import pyarrow.parquet as pq

    from medical_knowledge_graph_ray.stages.clustering import FP_SCALE, pca_fit

    got = pca_fit(_emb(5), n_components=4)
    X = np.array(
        pq.read_table(f"{SF}/embeddings.parquet")["embedding"].to_pylist(),
        dtype="float64",
    )
    q = np.rint(X * FP_SCALE).astype("int64")
    n = len(q)
    C = q.T.astype(object) @ q.astype(object)
    s = q.sum(axis=0).astype(object)
    cov = (
        C.astype(float) / n
        - np.outer(s.astype(float), s.astype(float)) / float(n) ** 2
    ) / float(FP_SCALE) ** 2
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:4]
    for comp, k in enumerate(order):
        vec = v[:, k]
        piv = int(np.argmax(np.abs(vec)))
        if vec[piv] < 0:
            vec = -vec
        lo = got[got.component == comp].sort_values("dim")["loading"].to_numpy()
        assert np.array_equal(lo, vec)
    # explained-variance shares are sane and ordered
    evr = got.groupby("component")["evr_bp"].first()
    assert (evr.diff().dropna() <= 0).all() and (evr > 0).all()


# -- DBSCAN ------------------------------------------------------------------

def _planted_blobs(n_per=30, k=3, d=16, noise=5):
    rng = np.random.RandomState(11)
    centers = rng.normal(0, 1, (k, d)) * 4
    rows = []
    for c in range(k):
        rows.append(centers[c] + rng.normal(0, 0.05, (n_per, d)))
    rows.append(rng.normal(0, 1, (noise, d)) * 4)  # isolated noise
    mat = np.vstack(rows)
    ids = np.arange(len(mat), dtype="int64") * 7 + 3  # non-contiguous ids
    return mat, ids


def _emb_ds(mat, ids):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame(
        {"vec_id": ids, "embedding": [r.astype("float32") for r in mat]}))


def test_dbscan_matches_dense_on_planted_blobs(ray_session):
    from medical_knowledge_graph_ray.stages.clustering import (
        dbscan, dbscan_dense)

    mat, ids = _planted_blobs()
    dense = dbscan_dense(mat, ids, eps_cos=0.95, min_pts=4)
    got = dbscan(_emb_ds(mat, ids), eps_cos=0.95, min_pts=4, n_chunks=3)
    assert got.equals(dense)
    # three planted blobs recovered as clusters, noise stays -1
    clusters = dense[dense["cluster"] >= 0]["cluster"].nunique()
    assert clusters == 3
    assert (dense["cluster"].to_numpy()[-5:] == -1).all()


def test_dbscan_parallelism_invariance_and_real_table(ray_session):
    from medical_knowledge_graph_ray.pipelines.docs import (
        DBSCAN_EPS_COS, DBSCAN_MIN_PTS, _embeddings)
    from medical_knowledge_graph_ray.stages.clustering import (
        dbscan, dbscan_dense, _to_matrix)

    sf = "/root/testdata/sf0.001"
    df = pd.read_parquet(f"{sf}/embeddings.parquet")
    dense = dbscan_dense(_to_matrix(df["embedding"]),
                         df["vec_id"].to_numpy("int64"),
                         eps_cos=DBSCAN_EPS_COS, min_pts=DBSCAN_MIN_PTS)
    a = dbscan(_embeddings(sf), eps_cos=DBSCAN_EPS_COS,
               min_pts=DBSCAN_MIN_PTS, n_chunks=4, num_buckets=8)
    b = dbscan(_embeddings(sf), eps_cos=DBSCAN_EPS_COS,
               min_pts=DBSCAN_MIN_PTS, n_chunks=7, num_buckets=16)
    assert a.equals(dense) and b.equals(dense)
    assert (dense["is_core"] == 1).any()  # non-trivial at these params


def test_dbscan_border_attaches_to_min_cluster(ray_session):
    from medical_knowledge_graph_ray.stages.clustering import dbscan_dense

    # two 4-point arcs on the unit circle + one border point midway,
    # within eps of exactly ONE core from EACH arc (so it is not a core
    # itself): the deterministic rule picks the MIN cluster label
    def pt(deg):
        r = np.deg2rad(deg)
        return [np.cos(r), np.sin(r), 0.0, 0.0]

    eps = np.cos(np.deg2rad(10.0)) - 1e-9
    arc1 = [pt(d) for d in (0, 3, 6, 9)]       # mutually adjacent → cores
    arc2 = [pt(d) for d in (28, 31, 34, 37)]   # mutually adjacent → cores
    border = [pt(18.5)]                        # 9.5° to 9° and to 28° only
    mat = np.array(arc1 + arc2 + border)
    ids = np.arange(len(mat), dtype="int64")
    out = dbscan_dense(mat, ids, eps_cos=eps, min_pts=4)
    b = out[out["vec_id"] == ids[-1]].iloc[0]
    assert out[out["vec_id"] < 8]["cluster"].nunique() == 2  # two clusters
    assert b["is_core"] == 0 and b["cluster"] == out["cluster"].min()
