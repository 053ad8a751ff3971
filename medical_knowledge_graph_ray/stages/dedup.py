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


_TOKEN_HASH_CACHE: dict[str, int] = {}
_MIX = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9], np.uint64)


def _token_hashes(tokens: list[str]) -> np.ndarray:
    """Per-token stable 64-bit md5 hashes, memoized per worker (token
    vocabularies repeat heavily; the cache is bounded below)."""
    cache = _TOKEN_HASH_CACHE
    if len(cache) > 1_000_000:
        cache.clear()
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        h = cache.get(t)
        if h is None:
            h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
            cache[t] = h
        out[i] = h
    return out


def _shingle_ids(text: str, n: int = 3) -> np.ndarray:
    """Word n-gram shingles → stable 64-bit ids.

    Vectorized: per-token md5 (memoized) combined across the n-gram window
    with multiply-xor mixing (wraparound uint64) — no per-shingle string
    allocation or md5 call.
    """
    toks = text.split(" ")
    h = _token_hashes(toks)
    if len(h) < n:
        # no full n-gram exists: empty shingle set (matches the SQL oracle,
        # whose QUALIFY lead(tok, n-1) IS NOT NULL yields zero trigrams)
        return np.empty(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        ids = (h[: -n + 1] * _MIX[0]) ^ (h[1 : -n + 2] * _MIX[1]) ^ (h[2:] * _MIX[2])
    return np.unique(ids)


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
    texts = batch["text"].astype(str).tolist()
    n_docs = len(texts)
    if n_docs == 0:
        return pd.DataFrame(
            {"band_id": pd.array([], "int32"), "band_hash": pd.array([], "uint64"),
             "doc_id": pd.array([], "int64"), "signature": []}
        )
    shingle_counts = [len(_shingle_ids(t)) for t in texts]
    keep = [i for i, c in enumerate(shingle_counts) if c > 0]
    if not keep:
        return pd.DataFrame(
            {"band_id": pd.array([], "int32"), "band_hash": pd.array([], "uint64"),
             "doc_id": pd.array([], "int64"), "signature": []}
        )
    texts = [texts[i] for i in keep]
    n_docs = len(texts)
    sigs = np.stack([minhash_signature(t) for t in texts])  # (n, 64)
    # vectorized band hashing: mix each 4-wide slice with prime weights
    weights = (_MIX[0] * np.arange(1, ROWS_PER_BAND + 1, dtype=np.uint64)) | np.uint64(1)
    with np.errstate(over="ignore"):
        band_hash = (sigs.reshape(n_docs, N_BANDS, ROWS_PER_BAND) * weights).sum(
            axis=2, dtype=np.uint64
        )
    doc_ids = batch["doc_id"].to_numpy()[keep]
    sig_bytes = [s.tobytes() for s in sigs]
    return pd.DataFrame(
        {
            "band_id": pd.array(np.tile(np.arange(N_BANDS, dtype=np.int32), n_docs)),
            "band_hash": pd.array(band_hash.reshape(-1), dtype="uint64"),
            "doc_id": pd.array(np.repeat(doc_ids, N_BANDS), dtype="int64"),
            "signature": [sig_bytes[i] for i in np.repeat(np.arange(n_docs), N_BANDS)],
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


def lsh_bucket_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
    """Coarse-bucket pair emitter: detect colliding (band_id, band_hash)
    keys vectorized (value_counts), run the O(m²) pair logic only inside
    true collision buckets (rare by LSH design)."""
    key = bucket["band_hash"].to_numpy(dtype="uint64") ^ (
        bucket["band_id"].to_numpy(dtype="uint64") * np.uint64(0x9E3779B97F4A7C15)
    )
    bucket = bucket.assign(_k=key)
    sizes = bucket["_k"].value_counts()
    hot = sizes.index[sizes >= 2]
    frames = [
        minhash_bucket_pairs(sub)
        for _, sub in bucket[bucket["_k"].isin(hot)].groupby("_k", sort=False)
    ]
    if not frames:
        return minhash_bucket_pairs(bucket.iloc[:0])
    return pd.concat(frames, ignore_index=True)


def minhash_dedup_pairs(docs, threshold: float = 0.7, *, dedup_pairs: bool = True):
    """documents Dataset → near-duplicate candidate pairs Dataset.

    pipeline: bands explode → coarse-bucket shuffle on the band key →
    in-bucket collision pairs → coarse-bucket pair dedup (a pair can
    surface from several bands; keep one row).  ``dedup_pairs=False``
    skips the final dedup exchange for callers that fold it into their
    own finalizer (``minhash_verified_pairs``'s dense path).
    """
    from ..functions.arrow import arrow_out
    from .shuffle import bucketed_group_map

    bands = docs.map_batches(arrow_out(minhash_bands_batch), batch_format="pandas")
    pairs = bucketed_group_map(
        bands, ["band_id", "band_hash"], lsh_bucket_pairs, num_buckets=64
    )

    def _thresh(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["est_jaccard"] >= threshold]

    pairs = pairs.map_batches(arrow_out(_thresh), batch_format="pandas")
    if not dedup_pairs:
        return pairs
    return bucketed_group_map(
        pairs,
        ["doc_a", "doc_b"],
        lambda g: g.drop_duplicates(["doc_a", "doc_b"]),
        num_buckets=16,
    )


def minhash_verified_pairs(
    docs,
    threshold: float = 0.5,
    *,
    mode: str = "auto",
    pair_bound: int = 500_000,
):
    """The production dedup chain: MinHash-LSH candidate mining → EXACT
    n-gram-Jaccard verification of just the candidates.

    This is the scale-correct composition the two halves exist for: LSH
    bounds the pair space (collision buckets only — never all-pairs),
    and the exact verifier runs O(#candidates), not O(N²).  Candidate
    pairs rejoin the document texts through the engine's partitioned
    hash join (both sides large; the text column never broadcasts), then
    one vectorized shingle-set comparison per candidate pair.

    ADAPTIVE FINALIZER (``mode='auto'``): the candidate set is
    materialized once anyway, so when it is ≤ ``pair_bound`` rows the
    two verification joins collapse to one broadcast-filtered scan
    (collect the involved docs' shingle-id arrays — a bounded artifact)
    plus a driver-side exact-Jaccard pass over the pairs; identical
    output to the join path (pinned by test).  ``mode='join'`` forces
    the partitioned-join path — the posture for corpora whose collision
    set outgrows the driver.

    Recall < 1 by LSH design (a true pair missing from every band's
    buckets is never verified) — measured in
    ``tests/test_operators.py::test_minhash_verified_recall``.
    """
    import pyarrow as pa
    import ray
    import ray.data as rd

    from ..functions.arrow import arrow_out
    from .joins import hash_join

    # raw collision rows (a pair can surface from several bands) — the
    # dedup exchange folds into each path's own finalizer
    raw = minhash_dedup_pairs(docs, threshold=0.0, dedup_pairs=False).materialize()
    n_pairs = raw.count()  # metadata-only: materialized; ≥ distinct pairs

    if mode != "join" and n_pairs <= pair_bound:
        pairs = raw.to_pandas().drop_duplicates(["doc_a", "doc_b"])
        out_empty = pd.DataFrame(
            {"doc_a": pd.array([], "int64"), "doc_b": pd.array([], "int64"),
             "jaccard": pd.array([], "float64")}
        )
        if not n_pairs:
            return rd.from_pandas(out_empty)
        ids_ref = ray.put(
            frozenset(pairs["doc_a"].tolist()) | frozenset(pairs["doc_b"].tolist())
        )

        def shingles_of(b: pd.DataFrame) -> pd.DataFrame:
            sub = b[b["doc_id"].isin(ray.get(ids_ref))]
            return pd.DataFrame(
                {"doc_id": pd.array(sub["doc_id"].to_numpy(), "int64"),
                 "sh": [_shingle_ids(t).tobytes() for t in sub["text"].astype(str)]}
            )

        sh = docs.map_batches(
            arrow_out(shingles_of), batch_format="pandas"
        ).to_pandas()  # ≤ 2·pair_bound rows of uint64 arrays
        smap = {
            int(i): np.frombuffer(s, np.uint64)
            for i, s in zip(sh["doc_id"], sh["sh"])
        }
        rows = []
        for a, b_ in zip(pairs["doc_a"].tolist(), pairs["doc_b"].tolist()):
            sa, sb = smap[int(a)], smap[int(b_)]
            # _shingle_ids returns sorted-unique ids
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            jac = inter / union if union else 0.0
            if jac >= threshold:
                rows.append((int(a), int(b_), jac))
        if not rows:
            return rd.from_pandas(out_empty)
        return rd.from_pandas(
            pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"]).astype(
                {"doc_a": "int64", "doc_b": "int64", "jaccard": "float64"}
            )
        )

    from .shuffle import bucketed_group_map

    def _project(b: pd.DataFrame) -> pd.DataFrame:
        return b[["doc_a", "doc_b"]]

    cands = bucketed_group_map(
        raw.map_batches(arrow_out(_project), batch_format="pandas"),
        ["doc_a", "doc_b"],
        lambda g: g.drop_duplicates(["doc_a", "doc_b"]),
        num_buckets=16,
    )

    texts = docs.map_batches(
        arrow_out(lambda b: b[["doc_id", "text"]]), batch_format="pandas"
    )
    pair_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])

    with_a = hash_join(
        cands,
        texts.map_batches(
            arrow_out(lambda b: b.rename(columns={"doc_id": "doc_a", "text": "text_a"})),
            batch_format="pandas",
        ),
        on=["doc_a"],
        num_buckets=16,
        left_schema=pair_schema,
        right_schema=pa.schema([("doc_a", pa.int64()), ("text_a", pa.string())]),
    )
    with_both = hash_join(
        with_a,
        texts.map_batches(
            arrow_out(lambda b: b.rename(columns={"doc_id": "doc_b", "text": "text_b"})),
            batch_format="pandas",
        ),
        on=["doc_b"],
        num_buckets=16,
        left_schema=pa.schema(
            [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("text_a", pa.string())]
        ),
        right_schema=pa.schema([("doc_b", pa.int64()), ("text_b", pa.string())]),
    )

    def verify(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for r in b.itertuples():
            sa = set(_shingle_ids(str(r.text_a)).tolist())
            sb = set(_shingle_ids(str(r.text_b)).tolist())
            union = len(sa | sb)
            jac = len(sa & sb) / union if union else 0.0
            if jac >= threshold:
                rows.append((int(r.doc_a), int(r.doc_b), jac))
        return pd.DataFrame(
            rows, columns=["doc_a", "doc_b", "jaccard"]
        ).astype({"doc_a": "int64", "doc_b": "int64", "jaccard": "float64"})

    return with_both.map_batches(arrow_out(verify), batch_format="pandas")


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

_BIT_SHIFTS = np.arange(64, dtype=np.uint64)


def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (md5-derived bit vectors).

    Vectorized through the memoized per-token hashes (`_token_hashes`) +
    one (n_tokens, 64) bit unpack and column sum — bit-exact with the
    original per-token Python loop (and the SQL oracle) but ~an order of
    magnitude faster on repeat-heavy corpora."""
    toks = list(set(text.split(" ")))
    if not toks:
        return 0
    h = _token_hashes(toks)  # (n,) uint64, md5[:8] big-endian
    bits = ((h[:, None] >> _BIT_SHIFTS[None, :]) & np.uint64(1)).astype(np.int64)
    acc = (2 * bits - 1).sum(axis=0)
    fp = ((acc > 0).astype(np.uint64) << _BIT_SHIFTS).sum(dtype=np.uint64)
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


# -- banded-Hamming near-dup over 64-bit fingerprints --------------------------

HAMMING_BANDS = 4  # 4 × 16-bit bands over a 64-bit fingerprint


def banded_hamming_pairs(
    ds,
    *,
    id_col: str,
    hash_col: str,
    out_a: str,
    out_b: str,
    max_hamming: int = 3,
    num_buckets: int = 32,
):
    """Near-dup pairs by fingerprint Hamming distance — EXACT for the
    given radius: with the 64-bit hash split into ``HAMMING_BANDS``
    16-bit bands, any pair within Hamming ≤ HAMMING_BANDS−1 must agree
    on at least one whole band (pigeonhole).  Shared by the SimHash text
    path and the dHash media path.  Shape: band explode → bucketed
    collision detection (value_counts hot-key prefilter, per-group
    Python only on true collisions) → vectorized popcount verify → pair
    dedup (a pair can collide in several bands)."""
    from ..functions.arrow import arrow_out
    from .shuffle import bucketed_group_map

    if max_hamming >= HAMMING_BANDS:
        raise ValueError(
            f"banding guarantees exactness only for radius < {HAMMING_BANDS}"
        )

    def bands(b: pd.DataFrame) -> pd.DataFrame:
        h = b[hash_col].to_numpy(dtype="uint64")
        frames = []
        for band in range(HAMMING_BANDS):
            frames.append(
                pd.DataFrame(
                    {"band_id": np.int32(band),
                     "band_val": (h >> np.uint64(16 * band)) & np.uint64(0xFFFF),
                     "_id": b[id_col].to_numpy(),
                     "_h": h}
                )
            )
        return pd.concat(frames, ignore_index=True)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        key = g["band_val"].to_numpy(dtype="uint64") ^ (
            g["band_id"].to_numpy(dtype="uint64") * np.uint64(0x9E3779B97F4A7C15)
        )
        g = g.assign(_k=key)
        sizes = g["_k"].value_counts()
        g = g[g["_k"].isin(sizes.index[sizes >= 2])]
        rows_a, rows_b, dists = [], [], []
        for _k, sub in g.groupby("_k", sort=False):
            sub = sub.drop_duplicates("_id").sort_values("_id")
            if len(sub) < 2:
                continue
            ids = sub["_id"].to_numpy()
            ph = sub["_h"].to_numpy(dtype="uint64")
            for i in range(len(ids)):
                x = ph[i + 1:] ^ ph[i]
                d = np.unpackbits(
                    x.view(np.uint8).reshape(len(x), 8), axis=1
                ).sum(axis=1)
                for j in np.flatnonzero(d <= max_hamming):
                    rows_a.append(ids[i])
                    rows_b.append(ids[i + 1 + j])
                    dists.append(int(d[j]))
        id_dtype = g["_id"].dtype  # typed empties must match non-empty blocks
        return pd.DataFrame(
            {out_a: pd.array(rows_a, dtype=id_dtype),
             out_b: pd.array(rows_b, dtype=id_dtype),
             "hamming": pd.array(dists, "int32")}
        )

    banded = ds.map_batches(arrow_out(bands), batch_format="pandas")
    pairs = bucketed_group_map(
        banded, ["band_id", "band_val"], bucket_pairs, num_buckets=num_buckets
    )
    return bucketed_group_map(
        pairs, [out_a, out_b],
        lambda g: g.drop_duplicates([out_a, out_b]),
        num_buckets=8,
    )


def simhash_neardup_pairs(docs, max_hamming: int = 3):
    """Text near-dup pairs by SimHash Hamming distance ≤ ``max_hamming``
    (exact by pigeonhole banding; bit-exact SQL oracle via DuckDB
    ``bit_count(xor(...))`` over the same md5-derived fingerprints)."""
    from ..functions.arrow import arrow_out

    fps = docs.map_batches(arrow_out(simhash_batch), batch_format="pandas")
    return banded_hamming_pairs(
        fps, id_col="doc_id", hash_col="simhash",
        out_a="doc_a", out_b="doc_b", max_hamming=max_hamming,
    )


def prefix_jaccard_pairs(
    gram_sets,
    *,
    threshold_permille: int = 500,
    num_buckets: int | None = None,
):
    """EXACT set-similarity self-join with PREFIX FILTERING — all pairs
    of documents whose distinct-gram Jaccard ≥ ``threshold_permille``/1000
    (PPJoin family: Chaudhuri et al. SSJoin ICDE'06, Xiao et al. PPJoin
    WWW'08; distributed plan per Vernica et al. SIGMOD'10).

    Input: a Dataset of (doc_id int64, h uint64) DISTINCT gram-hash rows
    (one row per document × distinct gram).  Output: (doc_a, doc_b,
    inter, uni) int64 — exact intersection/union sizes, doc_a < doc_b,
    threshold tested as the INTEGER compare ``inter·1000 ≥ t‰·uni`` (no
    float on either engine).

    Why it scales where all-pairs can't: under the global gram order
    (df asc, hash asc — rarest first), Jaccard ≥ t forces any qualifying
    pair to SHARE a gram inside each side's first ``|x| − ⌈t·|x|⌉ + 1``
    grams (the prefix lemma).  Only prefix grams fan out as join keys, so
    candidate groups are keyed by the RAREST grams — frequency-ordered
    prefixes make hot-gram groups structurally impossible unless the
    corpus truly is one near-dup cluster.

    ONE lazy chain of exactly three corpus exchanges plus a pair-sized
    distinct — no document-frequency side table, no join, no
    materialize:

    1. bucket by gram hash: every row of a gram lands in one bucket, so
       the in-bucket group size IS the global df — the census ANNOTATES
       in place instead of being a separate aggregate joined back;
    2. bucket by doc: order each doc's grams by (df, h), cut the prefix,
       attach the doc's full sorted gram set as ONE bytes payload (the
       set crosses the next exchange once per PREFIX gram, ~(1−t)·|x|
       copies — the Vernica trade: replicate sets a bounded factor
       instead of shipping candidate pairs back for a verify join);
    3. bucket by prefix gram → in-group length-filtered pair verify
       (sorted-array intersection, exact);
    4. tiny distinct on (doc_a, doc_b) (a pair may meet under several
       shared prefix grams).
    """
    from ..functions.arrow import arrow_out
    from ..stages.shuffle import bucketed_group_map

    t_pm = int(threshold_permille)

    def df_annotate(g: pd.DataFrame) -> pd.DataFrame:
        df = g.groupby("h", sort=False)["h"].transform("size")
        return pd.DataFrame(
            {"doc_id": g["doc_id"].astype("int64"),
             "h": pd.array(g["h"], "uint64"),
             "df": df.astype("int64")}
        )

    annotated = bucketed_group_map(
        gram_sets, ["h"], df_annotate, num_buckets=num_buckets
    )

    def prefix_emit(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(["doc_id", "df", "h"], kind="mergesort")
        sz = s.groupby("doc_id", sort=False)["h"].transform("size").to_numpy()
        rank = s.groupby("doc_id", sort=False).cumcount().to_numpy()
        # p = sz − ⌈t·sz⌉ + 1, all-integer ceil
        p = sz - (t_pm * sz + 999) // 1000 + 1
        pref = s.loc[rank < p]
        sets: dict[int, bytes] = {}
        for did, grp in s.groupby("doc_id", sort=False):
            sets[did] = np.sort(grp["h"].to_numpy()).tobytes()
        return pd.DataFrame(
            {"ph": pd.array(pref["h"], "uint64"),
             "doc_id": pref["doc_id"].astype("int64"),
             "sz": pd.array(sz[rank < p], "int64"),
             "set": pd.array(
                 [sets[d] for d in pref["doc_id"]], dtype=object)}
        )

    prefixed = bucketed_group_map(
        annotated, ["doc_id"], prefix_emit, num_buckets=num_buckets
    )

    def verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_i, out_u = [], [], [], []
        for _, grp in g.groupby("ph", sort=False):
            if len(grp) < 2:
                continue
            grp = grp.sort_values("doc_id", kind="mergesort")
            ids = grp["doc_id"].to_numpy()
            szs = grp["sz"].to_numpy()
            raw = grp["set"].tolist()
            arrs = [np.frombuffer(r, dtype=np.uint64) for r in raw]
            for i in range(len(ids) - 1):
                for j in range(i + 1, len(ids)):
                    if ids[i] == ids[j]:
                        continue
                    lo, hi = (int(szs[i]), int(szs[j]))
                    if lo > hi:
                        lo, hi = hi, lo
                    if lo * 1000 < t_pm * hi:  # length filter
                        continue
                    inter = int(np.intersect1d(
                        arrs[i], arrs[j], assume_unique=True
                    ).size)
                    uni = int(szs[i]) + int(szs[j]) - inter
                    if inter * 1000 >= t_pm * uni:
                        out_a.append(int(ids[i]))
                        out_b.append(int(ids[j]))
                        out_i.append(inter)
                        out_u.append(uni)
        return pd.DataFrame(
            {"doc_a": pd.array(out_a, "int64"),
             "doc_b": pd.array(out_b, "int64"),
             "inter": pd.array(out_i, "int64"),
             "uni": pd.array(out_u, "int64")}
        )

    pairs = bucketed_group_map(
        prefixed, ["ph"], verify_bucket, num_buckets=num_buckets
    )
    return bucketed_group_map(
        pairs, ["doc_a", "doc_b"],
        lambda g: g.drop_duplicates(["doc_a", "doc_b"]),
        num_buckets=8,
    )



def prefix_containment_pairs(
    gram_sets,
    *,
    threshold_permille: int = 800,
    num_buckets: int | None = None,
):
    """EXACT set-CONTAINMENT self-join with prefix filtering: all ORDERED
    pairs (sub, sup) with |sub ∩ sup| ≥ t·|sub| — the near-superset
    detector (quote/extension/boilerplate-wrapper dedup), asymmetric
    where :func:`prefix_jaccard_pairs` is symmetric.

    Same input contract as the Jaccard join, with the ASYMMETRIC prefix
    lemma: if |A∩B| ≥ t·|A| then A's first |A| − ⌈t·|A|⌉ + 1 grams
    (global df-asc order) must hit B, while B has NO prefix obligation —
    so B is indexed under ALL its grams but as BARE rows (no payload).
    Replicated payload is ONLY the subset side's sorted set, once per
    PREFIX gram (the same bounded ×(1−t) Vernica trade the Jaccard join
    makes; a first cut that shipped every doc's set once per gram
    measured 14.6 s at sf0.1 vs ~6 s for this shape).  Verification
    happens one exchange later: candidate pairs (carrying the sub set)
    re-key by the SUPERSET doc and meet its set row — each sup set
    crosses the exchange exactly once per corpus, each sub set once per
    candidate pair.  ONE lazy chain of four bucketed exchanges; the
    (sub, sup) dedup is free because every copy of a pair keys to the
    same sup bucket.  Threshold tested as the integer compare
    ``inter·1000 ≥ t‰·|sub|`` — no floats."""
    from ..functions.arrow import arrow_out
    from ..stages.shuffle import bucketed_group_map

    t_pm = int(threshold_permille)
    GOLD = np.uint64(0x9E3779B97F4A7C15)

    def df_annotate(g: pd.DataFrame) -> pd.DataFrame:
        df = g.groupby("h", sort=False)["h"].transform("size")
        return pd.DataFrame(
            {"doc_id": g["doc_id"].astype("int64"),
             "h": pd.array(g["h"], "uint64"),
             "df": df.astype("int64")}
        )

    annotated = bucketed_group_map(
        gram_sets, ["h"], df_annotate, num_buckets=num_buckets
    )

    def _rows(ph, key, a, b, sz, kind, sets) -> pd.DataFrame:
        return pd.DataFrame(
            {"ph": pd.array(ph, "uint64"),
             "key": pd.array(key, "int64"),
             "a": pd.array(a, "int64"),
             "b": pd.array(b, "int64"),
             "sz": pd.array(sz, "int64"),
             "kind": pd.array(kind, "int8"),
             "set": pd.array(sets, dtype=object)}
        )

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(["doc_id", "df", "h"], kind="mergesort")
        sz = s.groupby("doc_id", sort=False)["h"].transform("size").to_numpy()
        rank = s.groupby("doc_id", sort=False).cumcount().to_numpy()
        p = sz - (t_pm * sz + 999) // 1000 + 1
        probe = rank < p
        sets: dict[int, bytes] = {}
        for did, grp in s.groupby("doc_id", sort=False):
            sets[did] = np.sort(grp["h"].to_numpy()).tobytes()
        did_all = s["doc_id"].to_numpy("int64")
        h_all = s["h"].to_numpy("uint64")
        z = np.zeros(len(s), dtype="int64")
        # index rows: EVERY gram, bare
        idx = _rows(h_all, z, did_all, z, z, np.ones(len(s), "int8"),
                    [b""] * len(s))
        # probe rows: prefix grams, carrying the sub's sorted set
        pdid = did_all[probe]
        prb = _rows(h_all[probe], np.zeros(len(pdid), "int64"), pdid,
                    np.zeros(len(pdid), "int64"), sz[probe],
                    np.zeros(len(pdid), "int8"),
                    [sets[d] for d in pdid])
        # set rows: once per doc, keyed by the doc, spread over ph
        uids = np.array(sorted(sets), dtype="int64")
        with np.errstate(over="ignore"):
            spread = uids.astype("uint64") * GOLD
        srw = _rows(spread, uids, uids, np.zeros(len(uids), "int64"),
                    [len(sets[d]) // 8 for d in uids],
                    np.full(len(uids), 2, "int8"),
                    [sets[d] for d in uids])
        return pd.concat([idx, prb, srw], ignore_index=True)

    prefixed = bucketed_group_map(
        annotated, ["doc_id"], emit, num_buckets=num_buckets
    )

    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        # one vectorized probe⋈member expansion per coarse bucket — a
        # per-probe Python loop here measured as the stage's bottleneck
        passthrough = g[g["kind"] == 2]
        probes = g[g["kind"] == 0].drop_duplicates(["ph", "a"])
        if not len(probes):
            return passthrough
        members = (g.loc[g["kind"] == 1, ["ph", "a"]].drop_duplicates()
                   .rename(columns={"a": "sup"}))
        m = probes.merge(members, on="ph")
        m = m[m["a"] != m["sup"]].drop_duplicates(["a", "sup"])
        if not len(m):
            return passthrough
        cand = _rows(
            np.zeros(len(m), "uint64"), m["sup"].to_numpy("int64"),
            m["a"].to_numpy("int64"), m["sup"].to_numpy("int64"),
            m["sz"].to_numpy("int64"), np.full(len(m), 3, "int8"),
            m["set"].tolist())
        return pd.concat([passthrough, cand], ignore_index=True)

    paired = bucketed_group_map(
        prefixed, ["ph"], candidates, num_buckets=num_buckets
    )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        setmap = dict(zip(g.loc[g["kind"] == 2, "a"].to_numpy("int64"),
                          g.loc[g["kind"] == 2, "set"].tolist()))
        pairs = g[g["kind"] == 3].drop_duplicates(["a", "b"])
        out_s, out_p, out_i, out_z = [], [], [], []
        for sub, sup, szv, st in zip(pairs["a"].to_numpy("int64"),
                                     pairs["b"].to_numpy("int64"),
                                     pairs["sz"].to_numpy("int64"),
                                     pairs["set"].tolist()):
            raw = setmap.get(int(sup))
            if raw is None:
                continue
            inter = int(np.intersect1d(
                np.frombuffer(st, dtype=np.uint64),
                np.frombuffer(raw, dtype=np.uint64),
                assume_unique=True).size)
            if inter * 1000 >= t_pm * int(szv):
                out_s.append(int(sub))
                out_p.append(int(sup))
                out_i.append(inter)
                out_z.append(int(szv))
        return pd.DataFrame(
            {"doc_sub": pd.array(out_s, "int64"),
             "doc_sup": pd.array(out_p, "int64"),
             "inter": pd.array(out_i, "int64"),
             "sz_sub": pd.array(out_z, "int64")}
        )

    return bucketed_group_map(
        paired, ["key"], verify, num_buckets=num_buckets
    )
