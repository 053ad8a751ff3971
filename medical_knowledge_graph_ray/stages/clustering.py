"""Distributed spherical k-means over an embedding column.

The reference has no clustering stage — this is one of the
beyond-reference LLM-data operators (semantic bucketing of a corpus for
dedup, mixture curation, or IVF index builds).  Built Ray-Data-first:
every Lloyd iteration is ONE streaming pass over the dataset — centroids
broadcast via ``ray.put``, per-batch partial sums computed in EXACT int64
fixed point (``rint(unit_vec · 10^6)`` per element), a k×(dim+2)-bounded
``groupby.aggregate(Sum...)`` exchange, and a driver-side centroid update
on the k-row result.  The fixed-point contract makes the fit
BIT-IDENTICAL at any parallelism or batch boundary (float partial sums
would vary with block splits); ``mode='dense'`` runs the same math in one
driver-side numpy pass and is pinned ≡ to the distributed path by tests.

Scale shape: per iteration the exchange carries ≤ k rows per input batch
(the batch-local combiner IS the groupby payload), so the shuffle is
O(num_batches · k), never O(rows); ``iters`` full scans are the textbook
k-means cost — bound it and feed a raw column-pruned read (each pass
re-executes the input plan).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.arrow import arrow_out

FP_SCALE = 1_000_000
_SEED = 777
_STRIDE_MIX = np.uint64(0x9E3779B97F4A7C15)


def _unit(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return mat / norms


def _to_matrix(col) -> np.ndarray:
    return np.asarray([np.asarray(v, np.float64) for v in col], np.float64)


def _sum_cols(dim: int) -> list[str]:
    return [f"s{j}" for j in range(dim)]


def kmeans_init(
    embeddings, k: int, *, vec_col: str = "embedding", id_col: str = "vec_id",
    train_limit: int = 4096,
) -> np.ndarray:
    """Deterministic seed centroids: stride-hash sample on the id (the IVF
    idiom — content-stable regardless of block arrival order), driver-side
    sort, seeded choice of k distinct rows."""
    n_total = embeddings.count()
    stride = max(1, n_total // train_limit)

    def _stride_sample(b: pd.DataFrame) -> pd.DataFrame:
        ids = b[id_col].to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            keep = ((ids * _STRIDE_MIX) >> np.uint64(33)) % np.uint64(stride) == 0
        return b.loc[keep, [id_col, vec_col]]

    sample = (
        embeddings.map_batches(_stride_sample, batch_format="pandas")
        .to_pandas().sort_values(id_col)
    )
    mat = _unit(_to_matrix(sample[vec_col]))
    rng = np.random.RandomState(_SEED)
    pick = rng.choice(len(mat), size=min(k, len(mat)), replace=False)
    cent = mat[pick]
    if len(cent) < k:  # degenerate tiny input: pad by repeating rows
        cent = cent[np.arange(k) % len(cent)]
    return cent


def _iterate_partials(cent: np.ndarray):
    """Batch fn: assign rows to the broadcast centroids, emit per-cluster
    exact int64 partial sums (count + fixed-point unit-vector sums)."""
    k, dim = cent.shape
    scols = _sum_cols(dim)

    def partial(b: pd.DataFrame, *, _cent=cent) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {"cluster": pd.array([], "int32"),
                 "n": pd.array([], "int64"),
                 **{c: pd.array([], "int64") for c in scols}}
            )
        unit = _unit(_to_matrix(b.iloc[:, 0]))
        cluster = (unit @ _cent.T).argmax(axis=1).astype("int32")
        fp = np.rint(unit * FP_SCALE).astype("int64")
        df = pd.DataFrame(fp, columns=scols)
        df.insert(0, "cluster", cluster)
        df.insert(1, "n", np.int64(1))
        return df.groupby("cluster", sort=False).sum().reset_index()

    return partial


def _update(cent: np.ndarray, agg: pd.DataFrame) -> np.ndarray:
    """Driver-side centroid update from the k-row aggregate; clusters that
    received no rows keep their previous centroid."""
    k, dim = cent.shape
    out = cent.copy()
    scols = _sum_cols(dim)
    idx = agg["cluster"].to_numpy().astype(int)
    n = agg["n"].to_numpy().astype(np.float64)
    sums = agg[scols].to_numpy().astype(np.float64)
    mean = sums / (FP_SCALE * n[:, None])
    out[idx] = _unit(mean)
    return out


DENSE_CELL_BUDGET = 4_000_000  # rows × dim under which dense fits in one task


def kmeans_fit(
    embeddings, k: int = 10, iters: int = 8, *,
    vec_col: str = "embedding", id_col: str = "vec_id",
    mode: str = "auto",
) -> np.ndarray:
    """Lloyd's spherical k-means; returns (k, dim) unit centroids.

    ``mode='distributed'`` streams every iteration (one pass each);
    ``mode='dense'`` materializes the (bounded) vector column driver-side
    and runs the identical fixed-point math in numpy; ``'auto'`` picks
    dense when rows × dim fits the budget — the adaptive-finalizer
    posture used by the graph ops (each streamed iteration costs a full
    execution startup, pure overhead for a matrix that fits in one heap).
    Both paths produce BIT-IDENTICAL centroids (pinned by tests)."""
    import ray

    from ray.data.aggregate import Sum

    cent = kmeans_init(embeddings, k, vec_col=vec_col, id_col=id_col)
    dim = cent.shape[1]
    scols = _sum_cols(dim)

    if mode == "auto":
        # count() is metadata-only for a raw Parquet read (the intended
        # input); the fit is dominated by iters × execution startup when
        # the matrix fits in one worker heap
        mode = "dense" if embeddings.count() * dim <= DENSE_CELL_BUDGET \
            else "distributed"

    if mode == "dense":
        mat = _to_matrix(embeddings.to_pandas()[vec_col])
        for _ in range(iters):
            b = pd.DataFrame({vec_col: list(mat)})
            agg = _iterate_partials(cent)(b[[vec_col]])
            cent = _update(cent, agg)
        return cent

    proj = embeddings.select_columns([vec_col])
    for _ in range(iters):
        partial = _iterate_partials(cent)
        agg = (
            proj.map_batches(arrow_out(partial), batch_format="pandas")
            .groupby("cluster")
            .aggregate(
                Sum("n", alias_name="n"),
                *[Sum(c, alias_name=c) for c in scols],
            )
            .to_pandas()  # ≤ k rows — bounded artifact
        )
        cent = _update(cent, agg)
    return cent


def kmeans_assign(
    embeddings, cent: np.ndarray, *,
    vec_col: str = "embedding", id_col: str = "vec_id",
):
    """Final assignment pass: Dataset of (id, cluster, sim) — sim is the
    cosine to the assigned centroid in exact ppm (int64), the engine's
    float-parity idiom for downstream aggregation."""
    import ray

    cent_ref = ray.put(cent)

    class Assign:
        def __init__(self):
            self.cent = None

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            if self.cent is None:
                self.cent = ray.get(cent_ref)
            if not len(b):
                return pd.DataFrame(
                    {id_col: pd.array([], "int64"),
                     "cluster": pd.array([], "int32"),
                     "sim_ppm": pd.array([], "int64")}
                )
            unit = _unit(_to_matrix(b[vec_col]))
            sims = unit @ self.cent.T
            cluster = sims.argmax(axis=1)
            best = sims[np.arange(len(sims)), cluster]
            return pd.DataFrame(
                {
                    id_col: b[id_col].to_numpy().astype("int64"),
                    "cluster": cluster.astype("int32"),
                    "sim_ppm": np.rint(best * FP_SCALE).astype("int64"),
                }
            )

    return embeddings.map_batches(
        arrow_out(Assign()), batch_format="pandas"
    )


# -- distributed PCA (exact-integer sufficient statistics) ---------------------


def pca_fit(ds, n_components: int = 4, *, embedding_col: str = "embedding"):
    """Distributed PCA over an embedding column — the textbook
    sufficient-statistics shape: ONE streaming pass emits per-batch
    exact int64 partials (n, Σq, upper-triangle Σqqᵀ of the fixed-point
    quantized vectors q = rint(x·10⁶)), the driver combines them with
    Python big-int sums (no overflow ceiling, no float drift), builds
    the covariance from exact integers, and runs the d×d
    eigendecomposition locally.  Deterministic at ANY parallelism: the
    partials are associative integers, ``eigh`` sees a bit-identical
    matrix, and the sign convention (largest-|loading| entry positive,
    first-index tie-break) pins the eigenvector gauge.

    At 100 TB the exchange is #batches × d(d+1)/2 int64 rows — the
    data never concentrates; d×d work is driver-side and O(d³).
    Returns a tall frame (component, dim, loading, eigval, evr_bp)."""
    import numpy as np
    import pandas as pd

    from ..functions.arrow import arrow_out

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({"n": pd.array([], "int64")})
        x = _to_matrix(b[embedding_col]).astype("float64")
        q = np.rint(x * FP_SCALE).astype("int64")
        d = q.shape[1]
        r, c = np.triu_indices(d)
        cov = (q.T @ q)[r, c]  # exact: |q|≤~1e6 ⇒ per-batch < 2^63
        row = {"n": np.int64(len(q))}
        for j in range(d):
            row[f"s{j}"] = q[:, j].sum()
        for idx, (i, j) in enumerate(zip(r, c)):
            row[f"c{i}_{j}"] = cov[idx]
        return pd.DataFrame([row])

    parts = ds.map_batches(
        arrow_out(partial), batch_format="pandas", batch_size=4096
    ).to_pandas()  # bounded: one row per batch
    parts = parts.dropna().astype("object")
    n = int(sum(int(v) for v in parts["n"]))
    d = sum(1 for c in parts.columns if c.startswith("s"))
    s = np.array(
        [sum(int(v) for v in parts[f"s{j}"]) for j in range(d)], dtype=object
    )
    r, c = np.triu_indices(d)
    C = np.zeros((d, d), dtype=object)
    for i, j in zip(r, c):
        v = sum(int(x) for x in parts[f"c{i}_{j}"])
        C[i, j] = v
        C[j, i] = v
    # covariance from exact ints: (C/n − ssᵀ/n²) / SCALE²  (float64 once)
    scale2 = float(FP_SCALE) ** 2
    Cf = C.astype("float64")
    sf = s.astype("float64")
    cov = (Cf / n - np.outer(sf, sf) / (float(n) ** 2)) / scale2
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:n_components]
    tot = float(w.sum())
    rows = []
    for comp, k in enumerate(order):
        vec = v[:, k]
        pivot = int(np.argmax(np.abs(vec)))
        if vec[pivot] < 0:
            vec = -vec
        for dim in range(d):
            rows.append(
                {"component": comp, "dim": dim,
                 "loading": float(vec[dim]),
                 "eigval": float(w[k]),
                 "evr_bp": int(np.floor(w[k] / tot * 10000 + 0.5))}
            )
    out = pd.DataFrame(rows)
    for col in ("component", "dim", "evr_bp"):
        out[col] = out[col].astype("int64")
    return out
