"""Checkpointed stage outputs + per-partition lineage manifests.

The reference's de-facto checkpoint mechanism is "each script writes
JSON/CSV, the next script re-reads" (SURVEY §3.3) with no partial-stage
resume.  This engine formalizes it (north_rule resumability requirement):

* a stage output is a **directory of Parquet part files** written via a
  temp-dir + atomic rename, never a single giant file;
* a ``_MANIFEST.json`` records the stage name, config fingerprint, total
  rows and a per-file (partition) row-count + byte-size lineage table,
  read back from the Parquet footers (no extra data pass);
* resume = ``stage_complete()`` → skip the stage and ``read_stage()`` the
  checkpoint instead of recomputing.
"""

from __future__ import annotations

import json
import os
import shutil

MANIFEST = "_MANIFEST.json"


def stage_complete(out_dir: str, fingerprint: str | None = None) -> bool:
    """True iff a finished checkpoint exists (and matches fingerprint)."""
    path = os.path.join(out_dir, MANIFEST)
    if not os.path.exists(path):
        return False
    if fingerprint is None:
        return True
    try:
        with open(path) as f:
            return json.load(f).get("fingerprint") == fingerprint
    except (json.JSONDecodeError, OSError):
        return False


def write_stage(
    ds, out_dir: str, stage: str, fingerprint: str = "", *, force: bool = False
) -> dict:
    """Write ``ds`` as a checkpointed Parquet stage with lineage manifest.

    Returns the manifest dict.  Idempotent: a complete checkpoint with the
    same fingerprint is left untouched unless ``force`` is set.
    """
    import pyarrow.parquet as pq

    if not force and stage_complete(out_dir, fingerprint or None):
        with open(os.path.join(out_dir, MANIFEST)) as f:
            return json.load(f)

    tmp = out_dir.rstrip("/") + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    # Concurrent write_parquet calls race on fsspec's http module import
    # (ray's _is_http_filesystem catches ModuleNotFoundError but a thread
    # importing a partially-initialized module gets a bare ImportError;
    # failed imports are never cached, so every call re-races).  The race
    # hits before any data is written — retry with backoff is safe.
    import time as _time

    for attempt in range(3):
        try:
            ds.write_parquet(tmp)
            break
        except ImportError:
            if attempt == 2:
                raise
            _time.sleep(0.2 * (attempt + 1))

    partitions = []
    total_rows = 0
    for name in sorted(os.listdir(tmp)):
        if not name.endswith(".parquet"):
            continue
        fpath = os.path.join(tmp, name)
        meta = pq.read_metadata(fpath)
        partitions.append(
            {
                "file": name,
                "rows": meta.num_rows,
                "bytes": os.path.getsize(fpath),
                "row_groups": meta.num_row_groups,
            }
        )
        total_rows += meta.num_rows

    manifest = {
        "stage": stage,
        "fingerprint": fingerprint,
        "rows": total_rows,
        "num_partitions": len(partitions),
        "partitions": partitions,
    }
    with open(os.path.join(tmp, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp, out_dir)
    return manifest


def read_stage(out_dir: str, columns: list[str] | None = None):
    """Re-open a checkpointed stage as a Dataset (resume path).

    Walks shard subdirectories (``shard_NNNN/``) as well as flat stage
    directories.
    """
    import ray.data as rd

    files = []
    for root, _dirs, names in sorted(os.walk(out_dir)):
        for n in sorted(names):
            if n.endswith(".parquet"):
                files.append(os.path.join(root, n))
    return rd.read_parquet(files, columns=columns)
