"""Bloom-filter semi-join: broadcast a BITMAP instead of a key set.

The engine's broadcast semi-join (J6, q3's ``isin`` mask) ships the
filter side's exact key set — fine while the set is MBs, wrong at 100 TB
when the filter side has billions of keys.  The partitioned semi join
(``joins.py how='semi'``) handles that but exchanges BOTH sides.  The
Bloom chain is the standard middle path: a fixed-size bitmap (built with
one pass over the filter side, OR-mergeable across batches) broadcasts
at constant cost and prefilters the probe side VECTORIZED; the few false
positives are then removed by an exact partitioned semi join whose
inputs are already tiny.  Result is EXACT (oracle: plain ``EXISTS``) —
the sketch only saves work, never changes the answer.

Hashing: two splitmix64-style avalanche mixers (vectorized uint64
numpy, platform-stable) drive ``k`` double-hashed probes.  The engine's
md5 convention exists for SAMPLING fairness contracts; a Bloom filter
needs only a fixed deterministic mixer because the verify pass corrects
any hash pathology.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.arrow import arrow_out

_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def _mix(x: np.ndarray, seed: int) -> np.ndarray:
    """splitmix64 finalizer, vectorized; uint64 in → uint64 out."""
    z = x.astype(np.uint64) + np.uint64(seed)
    z = (z ^ (z >> np.uint64(30))) * _M1
    z = (z ^ (z >> np.uint64(27))) * _M2
    return z ^ (z >> np.uint64(31))


def _positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing h1 + i·h2 (mod m)."""
    h1 = _mix(keys, 0x243F6A88)
    h2 = _mix(keys, 0x85A308D3) | np.uint64(1)  # odd → full-period stride
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


def bloom_words(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """Bitmap as uint64 words (OR-mergeable) with all keys inserted."""
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    pos = _positions(keys, m_bits, k).ravel()
    np.bitwise_or.at(words, pos // 64, np.uint64(1) << (pos % 64).astype(np.uint64))
    return words


def bloom_contains(words: np.ndarray, keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """Vectorized membership test; True may be a false positive."""
    pos = _positions(keys, m_bits, k)
    bits = (words[pos // 64] >> (pos % 64).astype(np.uint64)) & np.uint64(1)
    return bits.all(axis=1)


def bloom_semi_join(
    probe,
    filter_keys,
    key: str,
    *,
    probe_schema,
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
    num_buckets: int = 16,
):
    """EXACT semi join of ``probe`` against ``filter_keys`` (a Dataset
    with the single int64 column ``key``): Bloom prefilter → partitioned
    exact semi join of the surviving candidates.

    One pass builds per-batch bitmap partials (one 8·m/64-byte row per
    batch) that OR-fold driver-side — a bounded artifact at this m; use
    a tree reduce for GB-scale bitmaps.  ``probe_schema`` (pyarrow) is
    required because the candidate side feeds a chained join
    (the ds.schema() re-execution trap)."""
    import pyarrow as pa
    import ray

    from .joins import hash_join

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        w = bloom_words(b[key].to_numpy("int64"), m_bits, k_hashes)
        return pd.DataFrame({"words": [w.tobytes()]})

    # consumed twice (bitmap fold + exact-join right side): pin the blocks
    # once so the upstream key-derivation plan doesn't re-execute
    filter_keys = filter_keys.materialize()
    parts = filter_keys.map_batches(
        arrow_out(partial), batch_format="pandas"
    ).to_pandas()  # ≤ #batches rows of m/8 bytes
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    for buf in parts["words"]:
        words |= np.frombuffer(buf, dtype=np.uint64)
    words_ref = ray.put(words)

    def prefilter(b: pd.DataFrame) -> pd.DataFrame:
        w = ray.get(words_ref)
        return b[bloom_contains(w, b[key].to_numpy("int64"), m_bits, k_hashes)]

    candidates = probe.map_batches(arrow_out(prefilter), batch_format="pandas")
    return hash_join(
        candidates, filter_keys, on=[key], how="semi",
        num_buckets=num_buckets,
        left_schema=probe_schema,
        right_schema=pa.schema([(key, pa.int64())]),
    )
