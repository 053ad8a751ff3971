"""Deduplication family: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Large-scale training-data operators (driver brief).  Shapes:

* **exact** — md5 content fingerprint (vectorized) → batch-local combiner
  (min doc_id + count per fp) → per-fp final agg.  Hash-partitioned
  shuffle moves one partial row per (fp, batch): duplicate-heavy corpora
  shrink before the exchange.  Reference analogue: D1 exact dedup
  (``generation.py:157-159``, ``clean_and_save.py:912``).
* **MinHash+LSH** — word-shingle → k minhashes (universal hashing over
  md5-derived 64-bit shingle ids) → band signature rows → groupby
  (band_id, band_hash) buckets → same-bucket candidate pairs with
  signature-estimated Jaccard.  All-pairs work happens only inside LSH
  buckets (bounded), never globally.
* **SimHash** — 64-bit sign-of-weighted-sum fingerprint per doc; near-dup
  candidates share fingerprints within a small Hamming radius (bucketed by
  fingerprint bands like MinHash).
* **n-gram Jaccard** — exact pairwise Jaccard *within candidate groups
  only* (here: same ``source``), via ``groupby.map_groups``; documented
  partitioning assumption: candidate pairs never cross groups.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

_MERSENNE = (1 << 61) - 1


def _shingle_ids(text: str, n: int = 3) -> np.ndarray:
    """Word n-gram shingles → stable 64-bit ids (md5-derived)."""
    toks = text.split(" ")
    if len(toks) < n:
        grams = [" ".join(toks)]
    else:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    return np.array(
        [
            int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "big")
            for g in set(grams)
        ],
        dtype=np.uint64,
    )


def _minhash_params(k: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic universal-hash coefficients (seeded, shared by every
    worker — pure function, nothing to broadcast)."""
    rng = np.random.RandomState(1337)
    a = rng.randint(1, _MERSENNE, size=k, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=k, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signature(text: str, k: int = 64) -> np.ndarray:
    """k-wide MinHash signature of the doc's shingle set."""
    ids = _shingle_ids(text)
    a, b = _MINHASH_A_B
    if len(ids) == 0:
        return np.zeros(k, dtype=np.uint64)
    # (k, n) universal hashes mod Mersenne prime, min over shingles
    hashed = (a[:, None] * ids[None, :] + b[:, None]) % _MERSENNE
    return hashed.min(axis=1)


_MINHASH_A_B = _minhash_params(64)

N_BANDS, ROWS_PER_BAND = 16, 4  # 64 = 16 × 4


def minhash_bands_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """documents batch → (band_id, band_hash, doc_id, signature) rows.

    One row per (doc, band); ``band_hash`` is the md5 of the band's
    signature slice.  The full signature travels along for the estimate
    stage (64×8 bytes/doc — cheap vs re-reading text).
    """
    out_band, out_hash, out_doc, out_sig = [], [], [], []
    for did, text in zip(batch["doc_id"], batch["text"].astype(str)):
        sig = minhash_signature(text)
        sig_bytes = sig.tobytes()
        for band in range(N_BANDS):
            sl = sig[band * ROWS_PER_BAND : (band + 1) * ROWS_PER_BAND]
            out_band.append(band)
            out_hash.append(hashlib.md5(sl.tobytes()).hexdigest()[:16])
            out_doc.append(did)
            out_sig.append(sig_bytes)
    return pd.DataFrame(
        {
            "band_id": pd.array(out_band, dtype="int32"),
            "band_hash": out_hash,
            "doc_id": pd.array(out_doc, dtype="int64"),
            "signature": out_sig,
        }
    )


def minhash_bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """One LSH bucket → candidate pairs with signature-estimated Jaccard.

    Runs in ``groupby(band_id, band_hash).map_groups``; bucket sizes are
    bounded by LSH design, so the within-bucket O(m²) is safe.
    """
    g = group.drop_duplicates("doc_id").sort_values("doc_id")
    if len(g) < 2:
        return pd.DataFrame(
            {"doc_a": pd.array([], "int64"), "doc_b": pd.array([], "int64"),
             "est_jaccard": pd.array([], "float64")}
        )
    docs = g["doc_id"].to_numpy()
    sigs = np.stack(
        [np.frombuffer(s, dtype=np.uint64) for s in g["signature"]]
    )
    rows_a, rows_b, est = [], [], []
    for i in range(len(docs)):
        agree = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
        for j, e in enumerate(agree):
            rows_a.append(int(docs[i]))
            rows_b.append(int(docs[i + 1 + j]))
            est.append(float(e))
    return pd.DataFrame(
        {"doc_a": pd.array(rows_a, "int64"), "doc_b": pd.array(rows_b, "int64"),
         "est_jaccard": pd.array(est, "float64")}
    )


def minhash_dedup_pairs(docs, threshold: float = 0.7):
    """documents Dataset → near-duplicate candidate pairs Dataset.

    pipeline: bands explode → bucket groupby → in-bucket pairs →
    global pair dedup (a pair can surface from several bands).
    """
    bands = docs.map_batches(minhash_bands_batch, batch_format="pandas")
    pairs = bands.groupby(["band_id", "band_hash"]).map_groups(
        minhash_bucket_pairs, batch_format="pandas"
    )

    def _thresh(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["est_jaccard"] >= threshold]

    pairs = pairs.map_batches(_thresh, batch_format="pandas")
    dedup = pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )
    return dedup


def fingerprint_cluster_partial(batch: pd.DataFrame) -> pd.DataFrame:
    """Exact-dedup combiner: per md5 fingerprint keep (min doc_id, count)
    within the batch; the final per-fp agg runs over these partials."""
    fp = [
        hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch["text"].astype(str)
    ]
    return (
        pd.DataFrame({"fp": fp, "doc_id": batch["doc_id"]})
        .groupby("fp", sort=False)
        .agg(canonical_id=("doc_id", "min"), cluster_size=("doc_id", "size"))
        .reset_index()
    )


# -- SimHash ------------------------------------------------------------------

def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (md5-derived bit vectors)."""
    acc = np.zeros(64, dtype=np.int64)
    for tok in set(text.split(" ")):
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    fp = np.uint64(0)
    for i in np.flatnonzero(acc > 0):
        fp |= np.uint64(1) << np.uint64(i)
    return int(fp)


def simhash_batch(batch: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "simhash": pd.array(
                [simhash64(t) for t in batch["text"].astype(str)], "uint64"
            ),
        }
    )


# -- n-gram Jaccard (exact, within candidate group) --------------------------

def ngram_jaccard_group(group: pd.DataFrame, threshold: float = 0.3) -> pd.DataFrame:
    """Exact pairwise word-3-gram Jaccard within one candidate group."""
    g = group.sort_values("doc_id")
    ids = g["doc_id"].to_numpy()
    sets = [set(_shingle_ids(t).tolist()) for t in g["text"].astype(str)]
    rows = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            inter = len(sets[i] & sets[j])
            union = len(sets[i] | sets[j])
            jac = inter / union if union else 0.0
            if jac >= threshold:
                rows.append((int(ids[i]), int(ids[j]), jac))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"]).astype(
        {"doc_a": "int64", "doc_b": "int64", "jaccard": "float64"}
    )
