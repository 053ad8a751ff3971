"""Inverted-index build + boolean-AND search serving.

The text-retrieval sibling of the persisted PQ index
(``similarity.py:build_pq_index``): the corpus is tokenized ONCE into a
token-bucketed Parquet postings index, and every later query reads ONLY
the buckets its terms hash to (file-level pruning) with a ``token IN
terms`` row-group filter inside them (postings are written
token-sorted, so Parquet min/max stats prune within the bucket too).

Reference analogue: the gazetteer scan answers "which entities are in
this doc"; the inverted index answers the transposed serving question
"which docs contain these terms" without a corpus scan per query —
S7-style build-once/serve-many.

Scale shape: the build is one vectorized explode (distinct (token,
doc_id) per batch — the map-side combiner) + ONE bucketed exchange on
the md5 token bucket; postings files never co-reside in memory.  The
serve path's exchange is bounded by the SMALLEST term's posting list
(the AND census only counts rows that survived the token filter).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

N_SEARCH_BUCKETS = 32
_INDEX_VERSION = "v1"


def _fingerprint() -> str:
    return f"inverted_index|{_INDEX_VERSION}|buckets={N_SEARCH_BUCKETS}"


def _explode_tokens(b: pd.DataFrame) -> pd.DataFrame:
    """documents batch → DISTINCT (token, doc_id, bucket) rows.

    Vectorized split + repeat; the per-batch ``drop_duplicates`` is the
    map-side combiner (a token repeated in one doc exchanges once)."""
    from ..functions.hashing import stable_bucket_vec

    if not len(b):
        return pd.DataFrame(
            {"token": pd.array([], "str"), "doc_id": pd.array([], "int64"),
             "bucket": pd.array([], "int32")}
        )
    toks = b["text"].astype(str).str.split(" ")
    counts = toks.str.len().to_numpy()
    flat = np.concatenate(toks.to_numpy())
    doc = np.repeat(b["doc_id"].to_numpy().astype("int64"), counts)
    df = pd.DataFrame({"token": flat, "doc_id": doc}).drop_duplicates()
    df = df[df["token"] != ""]
    return pd.DataFrame(
        {"token": pd.array(df["token"].to_numpy(), "str"),
         "doc_id": pd.array(df["doc_id"].to_numpy(), "int64"),
         "bucket": pd.array(
             stable_bucket_vec(df["token"].to_numpy(), N_SEARCH_BUCKETS), "int32"
         )}
    )


def build_inverted_index(docs, out_dir: str, *, resume: bool = True) -> dict:
    """Materialize the postings index: one token-sorted Parquet file per
    md5 token bucket + an auditable manifest.  Rebuilds are manifest-keyed
    no-ops (``resume=True``)."""
    from ..functions.arrow import arrow_out

    manifest_path = os.path.join(out_dir, "_MANIFEST.json")
    if resume and os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            m = json.load(fh)
        if m.get("fingerprint") == _fingerprint():
            return m

    os.makedirs(out_dir, exist_ok=True)

    def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.parquet as pq

        if not len(g):
            return pd.DataFrame(
                {"bucket": pd.array([], "int32"), "rows": pd.array([], "int64")}
            )
        bucket = int(g["bucket"].iloc[0])
        part = g.sort_values(["token", "doc_id"], kind="mergesort")[
            ["token", "doc_id"]
        ]
        pq.write_table(
            pa.Table.from_pandas(part, preserve_index=False),
            os.path.join(out_dir, f"bucket={bucket:04d}.parquet"),
            row_group_size=8192,  # token-sorted → min/max stats prune IN terms
        )
        return pd.DataFrame(
            {"bucket": pd.array([bucket], "int32"),
             "rows": pd.array([len(part)], "int64")}
        )

    postings = docs.map_batches(arrow_out(_explode_tokens), batch_format="pandas")
    written = (
        postings.groupby("bucket")
        .map_groups(arrow_out(write_bucket), batch_format="pandas")
        .to_pandas()  # ≤ N_SEARCH_BUCKETS rows
    )
    m = {
        "fingerprint": _fingerprint(),
        "rows": int(written["rows"].sum()),
        "buckets": [
            {"bucket": int(r.bucket), "rows": int(r.rows)}
            for r in written.itertuples()
        ],
    }
    with open(manifest_path, "w") as fh:
        json.dump(m, fh, indent=1)
    return m


def search_and(index_dir: str, terms: list[str]) -> pd.DataFrame:
    """Boolean-AND serve: doc_ids containing EVERY term.

    Reads only the buckets the terms hash to, filters ``token IN terms``
    at the scan, and counts distinct terms per doc through one bucketed
    exchange — the exchange payload is bounded by the posting lists of
    the query terms, never the index."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ..functions.arrow import arrow_out
    from ..functions.hashing import stable_bucket_vec
    from .shuffle import bucketed_group_map

    terms = sorted(set(terms))
    k = len(terms)
    if k == 0:
        return pd.DataFrame({"doc_id": pd.array([], "int64")})
    buckets = sorted(set(stable_bucket_vec(np.array(terms), N_SEARCH_BUCKETS)))
    files = [
        f
        for b in buckets
        if os.path.exists(f := os.path.join(index_dir, f"bucket={int(b):04d}.parquet"))
    ]
    if not files:
        return pd.DataFrame({"doc_id": pd.array([], "int64")})
    postings = rd.read_parquet(
        files, columns=["token", "doc_id"],
        filter=pc.field("token").isin(terms),
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        # postings are distinct (token, doc) by construction → count rows
        c = b.groupby("doc_id", sort=False).size()
        return pd.DataFrame(
            {"doc_id": pd.array(c.index, "int64"),
             "n": pd.array(c.to_numpy(), "int64")}
        )

    def and_filter(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("doc_id", sort=False)["n"].sum()
        hit = s[s == k]
        return pd.DataFrame({"doc_id": pd.array(hit.index, "int64")})

    out = bucketed_group_map(
        postings.map_batches(arrow_out(partial), batch_format="pandas"),
        ["doc_id"], and_filter, num_buckets=8,
    ).to_pandas()  # bounded by the smallest term's posting list
    if "doc_id" not in out.columns:  # Ray 2.49: zero-block to_pandas drops schema
        return pd.DataFrame({"doc_id": pd.array([], "int64")})
    return out.sort_values("doc_id").reset_index(drop=True)
