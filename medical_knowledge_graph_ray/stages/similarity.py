"""Similarity search over an embedding column (list<float>).

* **Brute-force cosine top-k** (baseline): the query matrix is tiny and
  broadcast (plain closure capture — Ray ships it once per task
  serialization, or ``ray.put`` for many queries); each batch computes a
  vectorized numpy matmul and emits only its batch-local top-k partials,
  so the final exchange sorts k·#batches rows, never the corpus.
* **LSH-bucketed variant** (scale path): deterministic random-hyperplane
  signatures bucket vectors; queries probe only their own bucket(s) —
  the all-to-all disappears at the cost of recall (documented).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _to_matrix(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


class BruteForceTopK:
    """Stateless-per-batch cosine scorer emitting batch-local top-k.

    Query normalization happens once in ``__init__`` (actor-pool or plain
    task reuse); sims are rounded to 6 dp at emission so results match the
    DuckDB oracle bit-for-bit after its own rounding.
    """

    def __init__(self, query: np.ndarray, k: int = 10):
        q = np.asarray(query, dtype=np.float64)
        self.q = q / np.linalg.norm(q)
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mat = _to_matrix(batch["embedding"])
        norms = np.linalg.norm(mat, axis=1)
        sims = (mat @ self.q) / np.where(norms == 0, 1.0, norms)
        sims = np.round(sims, 6)
        order = np.lexsort((batch["vec_id"].to_numpy(), -sims))[: self.k]
        # Arrow out: this partial feeds a global sort (see functions/arrow.py)
        import pyarrow as pa

        return pa.table(
            {
                "vec_id": pa.array(batch["vec_id"].to_numpy()[order]),
                "sim": pa.array(sims[order], pa.float64()),
            }
        )


def knn_cosine(embeddings, query: np.ndarray, k: int = 10):
    """embeddings Dataset → top-k (vec_id, sim), deterministic tiebreak on
    vec_id.  Partial top-k per batch → tiny global sort → limit."""
    partials = embeddings.map_batches(
        BruteForceTopK(query, k), batch_format="pandas", batch_size=4096
    )
    return partials.sort(["sim", "vec_id"], descending=[True, False]).limit(k)


# -- LSH (random hyperplanes) -------------------------------------------------

# bucket-count knob: 2^N_PLANES buckets. Sized for corpus density — too
# many planes → singleton buckets and zero recall; production would raise
# this with corpus size and multi-probe neighboring buckets.
N_PLANES = 6


def _planes(dim: int) -> np.ndarray:
    rng = np.random.RandomState(2024)
    return rng.standard_normal((N_PLANES, dim))


def lsh_signature_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Add a 16-bit hyperplane-sign bucket id per vector."""
    mat = _to_matrix(batch["embedding"])
    planes = _planes(mat.shape[1])
    bits = (mat @ planes.T) > 0
    bucket = bits @ (1 << np.arange(N_PLANES, dtype=np.int64))
    return pd.DataFrame({"vec_id": batch["vec_id"], "bucket": bucket})


def knn_cosine_lsh(embeddings, query: np.ndarray, k: int = 10):
    """Scale path: probe only the query's LSH bucket, then brute-force
    inside it.  Recall < 1 by design; the bucketed shuffle replaces the
    full scan."""
    q = np.asarray(query, dtype=np.float64)

    def _sig_and_keep(batch: pd.DataFrame) -> pd.DataFrame:
        mat = _to_matrix(batch["embedding"])
        planes = _planes(mat.shape[1])
        qb = int(((q @ planes.T) > 0) @ (1 << np.arange(N_PLANES, dtype=np.int64)))
        bits = (mat @ planes.T) > 0
        bucket = bits @ (1 << np.arange(N_PLANES, dtype=np.int64))
        return batch[bucket == qb]

    candidates = embeddings.map_batches(_sig_and_keep, batch_format="pandas")
    return knn_cosine(candidates, query, k)


# -- IVF (inverted-file) variant ---------------------------------------------

IVF_CENTROIDS = 16
IVF_ITERS = 8


def train_ivf_centroids(sample: np.ndarray, n_centroids: int = IVF_CENTROIDS) -> np.ndarray:
    """Deterministic spherical k-means on a (small) training sample.

    Seeded init + fixed Lloyd iterations — same centroids on every run at
    any parallelism.  The sample is driver-side (a bounded `limit()` of
    the corpus); at real scale the sample IS the broadcast side while
    assignment streams."""
    rng = np.random.RandomState(777)
    unit = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    centroids = unit[rng.choice(len(unit), size=n_centroids, replace=False)]
    for _ in range(IVF_ITERS):
        assign = (unit @ centroids.T).argmax(axis=1)
        for c in range(n_centroids):
            members = unit[assign == c]
            if len(members):
                v = members.sum(axis=0)
                centroids[c] = v / np.linalg.norm(v)
    return centroids


def knn_cosine_ivf(
    embeddings,
    query: np.ndarray,
    k: int = 10,
    *,
    nprobe: int = 4,
    train_limit: int = 4096,
):
    """IVF scale path: train centroids on a bounded sample, probe only the
    query's ``nprobe`` nearest cells, brute-force inside them.

    Replaces the all-rows scan with a ~nprobe/n_centroids fraction of the
    corpus; recall < 1 by design (measured against `knn_cosine`, the
    exact baseline)."""
    import ray

    sample = embeddings.limit(train_limit).to_pandas()
    mat = _to_matrix(sample["embedding"])
    centroids = train_ivf_centroids(mat)
    q = np.asarray(query, np.float64)
    qc = (centroids @ (q / np.linalg.norm(q))).argsort()[::-1][:nprobe]
    probe = frozenset(int(c) for c in qc)
    cent_ref = ray.put(centroids)

    class CellFilter:
        def __init__(self):
            self.centroids = None

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            if self.centroids is None:
                self.centroids = ray.get(cent_ref)
            m = _to_matrix(b["embedding"])
            unit = m / np.linalg.norm(m, axis=1, keepdims=True)
            assign = (unit @ self.centroids.T).argmax(axis=1)
            return b[np.isin(assign, list(probe))]

    candidates = embeddings.map_batches(CellFilter(), batch_format="pandas")
    return knn_cosine(candidates, query, k)
