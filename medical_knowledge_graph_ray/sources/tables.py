"""Format-dispatching table reader (S2 source family).

The reference ingests CSV corpora (``pre_labeling.py`` pandas
``read_csv`` loops) and JSON artifacts; this engine standardizes its
testdata on Parquet but keeps the SAME logical reader for all three
formats so a reference user can point existing CSV/JSON exports at any
pipeline unchanged.

Scale notes: Parquet is the only format with real column pruning and
row-group predicate pushdown — ``columns=``/``filter=`` reach the file
for Parquet; for CSV Ray prunes AFTER parse (a projection is appended);
for JSON-lines both are post-read.  The reader surfaces that difference
instead of hiding it: pass ``filter=`` with CSV/JSON and it raises,
because silently scanning everything is the 100-TB mistake.
"""

from __future__ import annotations
from medical_knowledge_graph_ray.functions.arrow import read_parquet_clean


def read_table(path: str, *, columns=None, filter=None):
    """``ray.data`` read of ``path`` dispatched on extension
    (.parquet / .csv / .json|.jsonl), with column pruning everywhere
    and predicate pushdown where the format supports it."""
    import ray.data as rd

    low = path.lower()
    if low.endswith(".parquet") or low.endswith(".pq"):
        return read_parquet_clean(path, columns=columns, filter=filter)
    if filter is not None:
        raise ValueError(
            "row-filter pushdown is Parquet-only; filter CSV/JSON reads "
            "with an explicit map_batches mask so the full-scan cost is "
            "visible in the pipeline"
        )
    if low.endswith(".csv"):
        ds = rd.read_csv(path)
    elif low.endswith(".json") or low.endswith(".jsonl"):
        ds = rd.read_json(path)
    else:
        raise ValueError(f"unsupported table format: {path}")
    if columns is not None:
        ds = ds.select_columns(list(columns))
    return ds


def write_jsonl(ds, out_dir: str) -> dict:
    """Sharded JSON-lines sink (S6 sink breadth) — the delivery format
    LLM training stacks actually consume.  One ``.jsonl`` file per block
    (resumable shard granularity, never one giant file), written through
    Ray's streaming datasink with a tiny driver-side manifest of
    (file, rows) afterwards so downstream loaders can audit the export
    without re-reading it.  Round-trips through ``read_table`` (tested).
    """
    import json
    import os

    import ray.data as rd  # noqa: F401 (documents the Dataset contract)

    os.makedirs(out_dir, exist_ok=True)
    ds.write_json(out_dir)
    files = sorted(
        f for f in os.listdir(out_dir) if f.endswith((".json", ".jsonl"))
    )
    manifest = {"files": [], "rows": 0}
    for f in files:
        with open(os.path.join(out_dir, f)) as fh:
            n = sum(1 for _ in fh)
        manifest["files"].append({"file": f, "rows": n})
        manifest["rows"] += n
    with open(os.path.join(out_dir, "_MANIFEST.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    return manifest


def write_csv(ds, out_dir: str) -> dict:
    """Sharded CSV sink (S6 sink breadth — the interchange format BI /
    spreadsheet consumers ask for): one ``.csv`` file per block through
    Ray's streaming datasink, plus the same auditable driver-side
    (file, rows) ``_MANIFEST.json`` as ``write_jsonl``.  Round-trips
    through ``read_table`` (tested)."""
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    ds.write_csv(out_dir)
    files = sorted(f for f in os.listdir(out_dir) if f.endswith(".csv"))
    manifest = {"files": [], "rows": 0}
    for f in files:
        with open(os.path.join(out_dir, f)) as fh:
            n = max(0, sum(1 for _ in fh) - 1)  # header line per shard
        manifest["files"].append({"file": f, "rows": n})
        manifest["rows"] += n
    with open(os.path.join(out_dir, "_MANIFEST.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    return manifest


def read_export(out_dir: str, *, columns=None, audit: bool = False):
    """Reader for the sharded export directories ``write_jsonl`` /
    ``write_csv`` produce: resolves the shard list FROM the
    ``_MANIFEST.json`` (never a blind glob — a partial/failed export
    surfaces as missing files instead of silently reading fewer rows),
    dispatches on the shard extension, and with ``audit=True`` verifies
    the materialized row count against the manifest before returning.

    Scale note: the file list is metadata; the read itself streams
    shard-per-task exactly like any Ray Data read.  ``columns`` prunes
    post-parse (JSON/CSV have no real pushdown — same contract as
    ``read_table``)."""
    import json
    import os

    import ray.data as rd

    with open(os.path.join(out_dir, "_MANIFEST.json")) as fh:
        manifest = json.load(fh)
    files = [os.path.join(out_dir, f["file"]) for f in manifest["files"]]
    missing = [f for f in files if not os.path.exists(f)]
    if missing:
        raise FileNotFoundError(
            f"export manifest lists {len(missing)} missing shard(s), "
            f"first: {missing[0]}"
        )
    if not files:
        raise ValueError(f"empty export manifest in {out_dir}")
    if files[0].endswith((".json", ".jsonl")):
        ds = rd.read_json(files)
    elif files[0].endswith(".csv"):
        ds = rd.read_csv(files)
    else:
        raise ValueError(f"unsupported export shard format: {files[0]}")
    if columns is not None:
        ds = ds.select_columns(list(columns))
    if audit:
        n = ds.count()
        if n != manifest["rows"]:
            raise ValueError(
                f"export row-count mismatch: manifest says "
                f"{manifest['rows']}, shards hold {n}"
            )
    return ds


def read_parquet_evolved(paths, *, columns=None):
    """Read a Parquet directory whose shards were written under
    EVOLVING schemas — the lake-ingestion reality (a column added last
    month is absent from old shards; an id column was widened
    int32→int64 halfway through) that a plain ``read_parquet`` answers
    with a unification error or silently inconsistent blocks.

    Resolution rules (Iceberg/Delta's by-name evolution semantics):
    the unified schema is the FIELD-NAME UNION across shards in
    first-seen order; conflicting types resolve by Arrow numeric
    widening (int32→int64, float32→float64, int→float); columns a
    shard lacks read as typed nulls.

    Shape: one metadata-only footer pass driver-side groups shards by
    exact physical schema; each group is ONE pruned read branch
    (column pruning still pushes down per group), a vectorized
    per-batch cast aligns every block to the unified schema, and the
    branches union — block schemas are identical by construction, so
    every downstream shuffle sees one Arrow schema."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..functions.arrow import arrow_out, read_parquet_clean

    if isinstance(paths, str):
        if os.path.isdir(paths):
            paths = [os.path.join(paths, f) for f in sorted(os.listdir(paths))
                     if f.endswith(".parquet")]
        else:
            paths = [paths]

    def _widen(a: pa.DataType, b: pa.DataType) -> pa.DataType:
        if a.equals(b):
            return a
        order = {pa.int32(): 0, pa.int64(): 1,
                 pa.float32(): 2, pa.float64(): 3}
        if a in order and b in order:
            return max(a, b, key=lambda t: order[t])
        raise TypeError(f"unreconcilable shard types: {a} vs {b}")

    groups: dict[tuple, list[str]] = {}
    unified: dict[str, pa.DataType] = {}
    for p in paths:
        sch = pq.read_schema(p)
        key = tuple((f.name, str(f.type)) for f in sch)
        groups.setdefault(key, []).append(p)
        for f in sch:
            unified[f.name] = (_widen(unified[f.name], f.type)
                               if f.name in unified else f.type)
    if columns is not None:
        unified = {c: unified[c] for c in columns}
    target = pa.schema([pa.field(n, t, nullable=True)
                        for n, t in unified.items()])

    def align(t: pa.Table) -> pa.Table:
        cols = []
        for f in target:
            if f.name in t.column_names:
                cols.append(t.column(f.name).cast(f.type))
            else:
                cols.append(pa.nulls(len(t), type=f.type))
        return pa.Table.from_arrays(cols, schema=target)

    branches = []
    for key, files in groups.items():
        have = {n for n, _ in key}
        want = [c for c in target.names if c in have]
        branches.append(
            read_parquet_clean(sorted(files), columns=want or None)
            .map_batches(align, batch_format="pyarrow"))
    ds = branches[0]
    for b in branches[1:]:
        ds = ds.union(b)
    return ds
