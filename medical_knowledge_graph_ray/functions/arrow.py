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


def _filter_fields(filt, schema) -> list | None:
    """Column names a pyarrow dataset filter Expression references, or
    ``None`` when undeterminable.  Public-API probe: ``to_substrait``
    raises iff a referenced field is missing from the given schema, so
    dropping one field at a time reveals the reference set (driver-side,
    O(#columns) tries on a footer schema — microseconds)."""
    try:
        filt.to_substrait(schema)
    except Exception:
        return None  # unsupported expression (or partition column) — fall back
    used = []
    for name in schema.names:
        rest = pa.schema([f for f in schema if f.name != name])
        try:
            filt.to_substrait(rest)
        except Exception:
            used.append(name)
    return used


def read_parquet_clean(path, *, columns=None, filter=None, **kwargs):
    """``ray.data.read_parquet`` with an explicit METADATA-FREE schema.

    Parquet written through pandas carries ``b'pandas'`` schema metadata;
    a ``pa.Schema`` with metadata is UNHASHABLE, so Ray's fragment-schema
    dedup logs ``Failed to hash the schemas (for deduplication)`` from
    every read task, burying real warnings in bench/driver logs.  Reading
    the footer once driver-side (metadata-only) and passing the pruned,
    metadata-free schema explicitly silences the spam and skips the
    per-fragment schema unification.

    FILTERED reads: the filter must bind against the scan schema while
    Ray validates output blocks against it post-projection, so the scan
    requests ``columns ∪ filter-columns`` (discovered via the
    ``_filter_fields`` substrait probe) with a schema pruned to exactly
    that, and a trailing ``select_columns`` drops the filter-only
    columns (they are decoded anyway to evaluate the predicate — the
    projection is zero-copy).  Falls back to a plain read when the
    probe can't resolve the filter (partition-column filters on hive
    directories, exotic expressions) or the footer is unreadable."""
    import ray.data as rd

    f = _first_parquet_file(path)
    full = None
    if f is not None:
        try:
            import pyarrow.parquet as pq

            raw = pq.read_schema(f)
            full = pa.schema(
                [pa.field(fl.name, fl.type, fl.nullable) for fl in raw]
            )
        except Exception:
            full = None
    if full is None:
        return rd.read_parquet(path, columns=columns, filter=filter, **kwargs)

    req = list(columns) if columns is not None else list(full.names)
    if filter is None:
        schema = pa.schema([full.field(n) for n in req])
        return rd.read_parquet(
            path, columns=columns, filter=filter, schema=schema, **kwargs
        )

    ff = _filter_fields(filter, full)
    if ff is None:
        return rd.read_parquet(path, columns=columns, filter=filter, **kwargs)
    read_cols = req + [c for c in ff if c not in req]
    schema = pa.schema([full.field(n) for n in read_cols])
    ds = rd.read_parquet(
        path, columns=read_cols, filter=filter, schema=schema, **kwargs
    )
    return ds.select_columns(req) if read_cols != req else ds
