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
