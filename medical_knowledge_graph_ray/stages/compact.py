"""Parquet small-file compaction — storage-maintenance operator.

Every long-running ingest (the engine's own resumable shard sinks
included) accretes small files; at 100 TB the "small-file problem"
dominates read planning (one task per tiny file) and metadata load.
``compact_parquet`` bin-packs input files into ~target-size outputs:

* planning is METADATA-ONLY on the driver (file list + sizes — never
  rows) with first-fit-decreasing, the same packing kernel contract as
  the sequence packer;
* each bin is one Ray task that streams its files through
  ``pyarrow.parquet`` and writes ONE output — no exchange, no
  whole-dataset materialization, bins run fully parallel;
* output names are content-addressed (md5 of the bin's file list), so
  re-running is idempotent and the manifest-keyed resume skips
  everything when the input set is unchanged.

Rows are preserved exactly (same multiset; per-file order within each
bin is concatenation order — Parquet consumers must not rely on
inter-file order anyway, same contract as the engine's shard sinks).
"""

from __future__ import annotations

import json
import os


def _plan_bins(files: list[tuple[str, int]], target_bytes: int):
    """First-fit-decreasing by size; oversize files become singletons."""
    bins: list[tuple[list[str], int]] = []
    for path, size in sorted(files, key=lambda fs: (-fs[1], fs[0])):
        for i, (members, used) in enumerate(bins):
            if used + size <= target_bytes:
                members.append(path)
                bins[i] = (members, used + size)
                break
        else:
            bins.append(([path], size))
    return [members for members, _used in bins]


def compact_parquet(
    in_dir: str, out_dir: str, *, target_mb: int = 128, resume: bool = True
) -> dict:
    """Compact every ``*.parquet`` under ``in_dir`` (recursive) into
    ~``target_mb`` outputs in ``out_dir``.  Returns the manifest."""
    import hashlib

    import ray

    files = []
    for root, _dirs, names in os.walk(in_dir):
        for n in sorted(names):
            if n.endswith(".parquet"):
                p = os.path.join(root, n)
                files.append((p, os.path.getsize(p)))
    if not files:
        raise FileNotFoundError(f"no parquet files under {in_dir}")

    fp = hashlib.md5(
        json.dumps([(p, s) for p, s in sorted(files)]).encode()
    ).hexdigest()
    manifest_path = os.path.join(out_dir, "_MANIFEST.json")
    if resume and os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            m = json.load(fh)
        if m.get("input_fingerprint") == fp:
            return m

    os.makedirs(out_dir, exist_ok=True)
    bins = _plan_bins(files, target_mb * 1024 * 1024)

    @ray.remote
    def write_bin(paths: list[str]) -> tuple[str, int, int]:
        import pyarrow.parquet as pq

        digest = hashlib.md5("\n".join(paths).encode()).hexdigest()[:16]
        name = f"part-{digest}.parquet"
        out_path = os.path.join(out_dir, name)
        # stream row groups through a ParquetWriter — a 128 MB-target bin
        # can decompress to several× that on wide string tables, so never
        # hold the whole bin in memory at once
        schema = pq.read_schema(paths[0])
        rows = 0
        writer = pq.ParquetWriter(out_path, schema)
        try:
            for p in paths:
                f = pq.ParquetFile(p)
                for rg in range(f.num_row_groups):
                    t = f.read_row_group(rg).cast(schema)
                    writer.write_table(t)
                    rows += t.num_rows
        finally:
            writer.close()
        return name, rows, os.path.getsize(out_path)

    results = ray.get([write_bin.remote(b) for b in bins])
    m = {
        "input_fingerprint": fp,
        "input_files": len(files),
        "output_files": len(results),
        "rows": int(sum(r for _n, r, _b in results)),
        "bytes": int(sum(b for _n, _r, b in results)),
        "outputs": [
            {"file": n, "rows": r, "bytes": b} for n, r, b in sorted(results)
        ],
    }
    with open(manifest_path, "w") as fh:
        json.dump(m, fh, indent=1)
    return m
