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


def read_table(path: str, *, columns=None, filter=None):
    """``ray.data`` read of ``path`` dispatched on extension
    (.parquet / .csv / .json|.jsonl), with column pruning everywhere
    and predicate pushdown where the format supports it."""
    import ray.data as rd

    low = path.lower()
    if low.endswith(".parquet") or low.endswith(".pq"):
        return rd.read_parquet(path, columns=columns, filter=filter)
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
