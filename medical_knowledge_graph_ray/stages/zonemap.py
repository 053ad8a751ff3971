"""Persisted zone-map (min/max) secondary index for Parquet datasets.

The storage-layer pruning primitive: Parquet row-group stats already
prune WITHIN a file the scan opens, but at data-lake scale (millions of
shard files) every query still pays one footer open per file just to
discover "nothing here".  A zone map is that discovery turned into a
build-once / serve-many artifact: one metadata-only pass records each
(file, row_group)'s [min, max] for a chosen column; every later range
scan consults the (tiny, bounded) zone table and opens ONLY intersecting
files — the I/O contract `docs_search_indexed` gives tokens, applied to
numeric/temporal ranges.

Scale shape: the build is a Ray task pool over the file list reading
FOOTERS only (never data pages); the zone table is
O(files × row_groups) rows of scalars — a driver-side artifact by
design (it is the thing that must be small; at 100 TB it is ~1 row per
128 MB row group).  Serving composes with the engine's pruned reads:
surviving files go through `read_parquet_clean` with the row filter
still pushed down, so within-file row-group pruning stacks on top.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

from ..functions.arrow import arrow_out, read_parquet_clean

ZONEMAP_VERSION = "v1"


def _file_zones(paths: list, col: str) -> pd.DataFrame:
    import pyarrow.parquet as pq

    rows = []
    for p in paths:
        md = pq.ParquetFile(p).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        ci = names[col]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                # stats withheld: the zone must stay conservative
                rows.append((p, rg, None, None,
                             md.row_group(rg).num_rows))
            else:
                rows.append((p, rg, st.min, st.max,
                             md.row_group(rg).num_rows))
    return pd.DataFrame(rows, columns=["path", "row_group", "vmin", "vmax",
                                       "n_rows"])


def build_zonemap(files: list, col: str, out_dir: str | None = None,
                  *, tasks: int = 16) -> pd.DataFrame:
    """Metadata-only zone-map build over a Parquet file list (one Ray
    task per file slice; footers only).  Optionally persists the zone
    table + manifest under ``out_dir`` for build-once/serve-many."""
    import ray

    files = sorted(files)
    slices = [files[i::tasks] for i in range(min(tasks, len(files)))]

    @ray.remote
    def scan(paths):
        return _file_zones(paths, col)

    zones = pd.concat(ray.get([scan.remote(s) for s in slices if s]),
                      ignore_index=True)
    zones = zones.sort_values(["path", "row_group"]).reset_index(drop=True)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        zones.to_parquet(os.path.join(out_dir, "zones.parquet"))
        with open(os.path.join(out_dir, "_MANIFEST.json"), "w") as fh:
            json.dump({"version": ZONEMAP_VERSION, "col": col,
                       "n_files": int(zones["path"].nunique()),
                       "n_zones": int(len(zones))}, fh)
    return zones


def load_zonemap(out_dir: str) -> pd.DataFrame:
    return pd.read_parquet(os.path.join(out_dir, "zones.parquet"))


def pruned_range_read(zones: pd.DataFrame, col: str, lo, hi,
                      columns: list | None = None):
    """Range scan ``lo <= col <= hi`` over a zone-mapped dataset: opens
    ONLY files whose zones intersect (zones with withheld stats stay in
    — conservative, never wrong).  Returns (dataset, n_files_selected,
    n_files_total); the row filter is still pushed into the scan, so
    the read is exact, and surviving files' other row groups prune via
    their own Parquet stats."""
    import pyarrow.compute as pc

    blind = zones["vmin"].isna() | zones["vmax"].isna()
    hit = blind | ((zones["vmax"] >= lo) & (zones["vmin"] <= hi))
    files = sorted(zones.loc[hit, "path"].unique())
    n_total = int(zones["path"].nunique())
    if not files:
        return None, 0, n_total
    flt = (pc.field(col) >= lo) & (pc.field(col) <= hi)
    ds = read_parquet_clean(files, columns=columns, filter=flt)
    return ds, len(files), n_total
