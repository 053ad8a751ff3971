"""Keyed upsert table — mutable state on immutable Parquet.

The Delta/Hudi-style primitive the rest of the engine's sinks don't
need but a production pipeline does: a table addressed by a unique key
that absorbs UPSERT batches (and deletions) without rewriting the whole
table.  This is the "shared mutable index" case: Ray Data has no
mutable dataset, so mutability lives in the STORAGE LAYOUT —

* rows live in ``N_UPSERT_BUCKETS`` files bucketed by the md5 of the
  key (the same stable bucketing the search index and shard sinks use),
  so a key's row is always in exactly one known file;
* an upsert batch buckets its rows the same way, and ONLY the touched
  buckets are rewritten — one Ray task per touched bucket merges
  old + new vectorized (updates win; within a batch the LAST row per
  key wins, matching SQL ``MERGE`` semantics for ordered sources);
* writes are temp+rename with a version-stamped manifest carrying the
  md5 fingerprint of the applied batch — RE-applying the same batch is
  a manifest-keyed no-op, so a crashed-and-retried apply is idempotent.

Reads are plain ``read_parquet`` over the directory (plus key-pruned
point lookups via the bucket function).
"""

from __future__ import annotations
from medical_knowledge_graph_ray.functions.arrow import read_parquet_clean

import json
import os

import numpy as np
import pandas as pd

N_UPSERT_BUCKETS = 32
APPLIED_FP_WINDOW = 256  # retries land close to the original apply


def _bucket_of(keys) -> np.ndarray:
    from ..functions.hashing import stable_bucket_vec

    return stable_bucket_vec(
        np.asarray(keys).astype(str), N_UPSERT_BUCKETS
    ).astype("int64")


def _manifest_path(table_dir: str) -> str:
    return os.path.join(table_dir, "_MANIFEST.json")


def _bucket_file(table_dir: str, b: int) -> str:
    return os.path.join(table_dir, f"bucket={b:04d}.parquet")


def init_keyed_table(table_dir: str, key: str) -> dict:
    """Create an empty keyed table (directory + manifest)."""
    os.makedirs(table_dir, exist_ok=True)
    m = {"key": key, "version": 0, "applied": [], "rows": 0,
         "buckets": N_UPSERT_BUCKETS}
    with open(_manifest_path(table_dir), "w") as fh:
        json.dump(m, fh, indent=1)
    return m


def upsert(
    table_dir: str, batch: pd.DataFrame, *, delete_keys: list | None = None
) -> dict:
    """Apply one upsert batch (+ optional deletions) atomically-enough:
    only touched buckets rewrite; same-batch re-application is a no-op.

    Within ``batch``, the LAST row per key wins (ordered-source MERGE
    semantics).  Returns the updated manifest."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    with open(_manifest_path(table_dir)) as fh:
        m = json.load(fh)
    key = m["key"]
    delete_keys = list(delete_keys or [])

    # fingerprint covers column names + dtypes, not just row values —
    # identical values under renamed/retyped columns must NOT be skipped
    schema_sig = json.dumps([[c, str(batch.dtypes[c])] for c in batch.columns])
    fp = hashlib.md5(
        schema_sig.encode()
        + pd.util.hash_pandas_object(batch, index=False).to_numpy().tobytes()
        + json.dumps(sorted(map(str, delete_keys))).encode()
    ).hexdigest()
    if fp in m["applied"]:
        return m  # idempotent re-apply

    # last-row-per-key wins within the batch
    batch = batch.drop_duplicates(subset=[key], keep="last")
    batch = batch[~batch[key].isin(delete_keys)]
    up_bucket = _bucket_of(batch[key])
    del_bucket = _bucket_of(delete_keys) if delete_keys else np.array([], "int64")
    touched = sorted(set(up_bucket.tolist()) | set(del_bucket.tolist()))

    batch_ref = ray.put((batch, up_bucket, set(map(str, delete_keys))))

    @ray.remote
    def merge_bucket(b: int) -> tuple[int, int]:
        up, ub, dels = ray.get(batch_ref)
        new = up[ub == b]
        path = _bucket_file(table_dir, b)
        if os.path.exists(path):
            old = pq.read_table(path).to_pandas()
            old = old[~old[key].astype(str).isin(dels)]
            old = old[~old[key].isin(new[key])]
            merged = pd.concat([old, new], ignore_index=True)
        else:
            merged = new
        merged = merged.sort_values(key, kind="mergesort").reset_index(drop=True)
        tmp = path + ".tmp"
        pq.write_table(pa.Table.from_pandas(merged, preserve_index=False).replace_schema_metadata(None), tmp)
        os.replace(tmp, path)
        return b, len(merged)

    results = ray.get([merge_bucket.remote(b) for b in touched])

    # refresh row census: touched buckets from the merge, others from the
    # (cheap) parquet metadata
    rows = 0
    merged_rows = dict(results)
    for b in range(N_UPSERT_BUCKETS):
        if b in merged_rows:
            rows += merged_rows[b]
        elif os.path.exists(_bucket_file(table_dir, b)):
            rows += pq.read_metadata(_bucket_file(table_dir, b)).num_rows
    m["version"] += 1
    # keep the applied-fingerprint window bounded: idempotency only needs
    # to catch retries of RECENT batches, not the table's full history
    m["applied"] = (m["applied"] + [fp])[-APPLIED_FP_WINDOW:]
    m["rows"] = int(rows)
    with open(_manifest_path(table_dir), "w") as fh:
        json.dump(m, fh, indent=1)
    return m


def read_keyed_table(table_dir: str):
    """Full-table Dataset (empty tables read as an empty Dataset)."""
    import ray.data as rd

    files = [
        os.path.join(table_dir, f)
        for f in sorted(os.listdir(table_dir))
        if f.endswith(".parquet")
    ]
    if not files:
        return rd.from_items([])
    return read_parquet_clean(files)


def lookup(table_dir: str, keys: list) -> pd.DataFrame:
    """Key-pruned point lookup: reads ONLY the buckets the keys hash to,
    with the key filter pushed into the (key-sorted) files."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    with open(_manifest_path(table_dir)) as fh:
        key = json.load(fh)["key"]
    out = []
    for b in sorted(set(_bucket_of(keys).tolist())):
        path = _bucket_file(table_dir, b)
        if not os.path.exists(path):
            continue
        t = pq.read_table(path, filters=pc.field(key).isin(keys))
        if t.num_rows:
            out.append(t.to_pandas())
    if not out:
        return pd.DataFrame()
    return pd.concat(out, ignore_index=True).sort_values(key).reset_index(drop=True)
