"""Arrow-block hygiene helpers.

Ray Data stores a ``map_batches`` result in whatever format the function
returned.  Pandas-format blocks make every downstream all-to-all (groupby
/ sort / repartition) PATHOLOGICALLY slow in this Ray version (measured
~25 s vs ~1 s for an identical 30 k-row / 13 k-group aggregate — the
sort-shuffle path falls back to per-row Python over pandas blocks).

Rule of thumb enforced across this engine: *a stage whose output feeds a
shuffle must emit Arrow*.  ``arrow_out`` wraps a pandas-in/pandas-out
batch function so the batch still enjoys pandas ergonomics inside, but
the block stored in the object store is a zero-copy Arrow table.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
import pyarrow as pa


def arrow_out(fn: Callable[..., pd.DataFrame]) -> Callable[..., pa.Table]:
    """Wrap a pandas-returning batch fn (or callable instance) to emit an
    Arrow table block."""

    def wrapper(batch, *args, **kwargs):
        out = fn(batch, *args, **kwargs)
        if isinstance(out, pa.Table):
            return out
        # drop the b'pandas' schema metadata: Ray's schema-dedup cache
        # can't hash it ("Failed to hash the schemas" warning spam) and
        # it bloats every block's schema for no reader benefit
        return pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata(None)

    wrapper.__name__ = getattr(fn, "__name__", type(fn).__name__)
    return wrapper


def _first_parquet_file(path) -> str | None:
    """First .parquet file under ``path`` (file / flat dir / list)."""
    import os

    if isinstance(path, (list, tuple)):
        path = path[0] if path else None
    if path is None:
        return None
    path = str(path)
    if os.path.isdir(path):
        for root, dirs, names in os.walk(path):
            if any("=" in d for d in dirs):
                return None  # hive-partitioned: path-derived columns
            for n in sorted(names):
                if n.endswith((".parquet", ".pq")):
                    return os.path.join(root, n)
        return None
    return path


def read_parquet_clean(path, *, columns=None, filter=None, **kwargs):
    """``ray.data.read_parquet`` with an explicit METADATA-FREE schema.

    Parquet written through pandas carries ``b'pandas'`` schema metadata;
    a ``pa.Schema`` with metadata is UNHASHABLE, so Ray's fragment-schema
    dedup logs ``Failed to hash the schemas (for deduplication)`` from
    every read task, burying real warnings in bench/driver logs.  Reading
    the footer once driver-side (metadata-only) and passing the pruned,
    metadata-free schema explicitly silences the spam and skips the
    per-fragment schema unification.  Falls back to a plain read for
    filtered reads (the filter binds against the pruned schema and would
    miss columns excluded from ``columns``), hive-partitioned directories
    (path-derived columns aren't in the footer), or unreadable footers."""
    import ray.data as rd

    schema = None
    f = _first_parquet_file(path) if filter is None else None
    if f is not None:
        try:
            import pyarrow.parquet as pq

            full = pq.read_schema(f)
            names = list(columns) if columns is not None else list(full.names)
            schema = pa.schema(
                [
                    pa.field(n, full.field(n).type, full.field(n).nullable)
                    for n in names
                ]
            )
        except Exception:
            schema = None
    return rd.read_parquet(
        path, columns=columns, filter=filter, schema=schema, **kwargs
    )
