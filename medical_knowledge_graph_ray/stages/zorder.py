"""Z-order (Morton) multi-column clustering + rectangle-pruned scans.

The multi-dimensional extension of the zone-map index family
(`stages/zonemap.py` = 1-D ranges, `stages/bitmap.py` = categorical
predicates): interleaving the bits of two key columns gives ONE sort
key whose contiguous ranges are spatially local in BOTH columns, so a
z-clustered Parquet layout lets a 2-D rectangle predicate
``x BETWEEN .. AND y BETWEEN ..`` prune whole files through ordinary
per-file [min, max] z stats — the Delta/Iceberg ``OPTIMIZE ZORDER BY``
storage idiom rebuilt on the engine's own zone map.

Two pieces:

* ``morton2`` — vectorized numpy bit-interleave (x takes the even bits,
  y the odd bits; 32 bits per coordinate → one int64 code).
* ``z_ranges_for_rect`` — the query-side quadtree decomposition of an
  axis-aligned rectangle into few contiguous z ranges (the
  BIGMIN/LITMAX role).  Cells fully inside the rectangle emit their
  exact z span; when the range budget runs out, intersecting cells emit
  their full span — a conservative SUPERSET, which is always correct
  here because ranges only decide which files to OPEN; the pushed-down
  row filter re-checks the rectangle exactly.

Scale shape: the decomposition is a driver-side O(max_ranges) walk; the
layout build is one streaming pass with task-side writes; serving is
metadata-only pruning + a pruned exact read.  Nothing data-sized ever
reaches the driver.
"""

from __future__ import annotations

import numpy as np

# bit-spreading magic constants: x -> x with 0s interleaved (even bits)
_MASKS = (
    (16, np.uint64(0x0000FFFF0000FFFF)),
    (8, np.uint64(0x00FF00FF00FF00FF)),
    (4, np.uint64(0x0F0F0F0F0F0F0F0F)),
    (2, np.uint64(0x3333333333333333)),
    (1, np.uint64(0x5555555555555555)),
)


def _spread(x: np.ndarray) -> np.ndarray:
    x = x.astype("uint64") & np.uint64(0xFFFFFFFF)
    for shift, mask in _MASKS:
        x = (x | (x << np.uint64(shift))) & mask
    return x


def morton2(x, y) -> np.ndarray:
    """Interleaved Morton code of two non-negative integer arrays
    (x -> even bits, y -> odd bits).  32 bits per coordinate; the code
    stays < 2^63 so it travels as plain int64."""
    x = np.asarray(x)
    y = np.asarray(y)
    return (_spread(x) | (_spread(y) << np.uint64(1))).astype("int64")


def _cell_box(zprefix: int, level: int, bits: int):
    """Bounding box (xlo, xhi, ylo, yhi) and z span (zlo, zhi) of the
    quadtree cell whose Morton PREFIX (top ``level`` bit-pairs) is
    ``zprefix``.  ``bits`` = bits per coordinate."""
    rem = bits - level
    zlo = zprefix << (2 * rem)
    zhi = zlo + (1 << (2 * rem)) - 1
    # de-interleave the prefix into coordinate prefixes
    x = y = 0
    for i in range(level):
        pair = (zprefix >> (2 * (level - 1 - i))) & 3
        x = (x << 1) | (pair & 1)
        y = (y << 1) | (pair >> 1)
    xlo = x << rem
    ylo = y << rem
    side = (1 << rem) - 1
    return xlo, xlo + side, ylo, ylo + side, zlo, zhi


def z_ranges_for_rect(
    xlo: int, xhi: int, ylo: int, yhi: int, *, bits: int, max_ranges: int = 64
) -> list[tuple[int, int]]:
    """Decompose the rectangle ``[xlo,xhi] x [ylo,yhi]`` into merged
    contiguous z ranges that COVER every point of the rectangle (and,
    within the ``max_ranges`` budget, little else).  Breadth-first
    quadtree descent: contained cells emit exactly, disjoint cells
    drop, intersecting cells split — or emit whole when the budget is
    reached (conservative, never wrong)."""
    frontier = [(0, 0)]  # (zprefix, level)
    out: list[tuple[int, int]] = []
    while frontier:
        nxt: list[tuple[int, int]] = []
        for zprefix, level in frontier:
            cx0, cx1, cy0, cy1, zl, zh = _cell_box(zprefix, level, bits)
            if cx1 < xlo or cx0 > xhi or cy1 < ylo or cy0 > yhi:
                continue
            if cx0 >= xlo and cx1 <= xhi and cy0 >= ylo and cy1 <= yhi:
                out.append((zl, zh))
            elif level == bits:
                out.append((zl, zh))
            else:
                nxt.extend((zprefix * 4 + q, level + 1) for q in range(4))
        if len(out) + len(nxt) >= max_ranges:
            # budget: emit every still-open intersecting cell whole
            for zprefix, level in nxt:
                cx0, cx1, cy0, cy1, zl, zh = _cell_box(zprefix, level, bits)
                if cx1 < xlo or cx0 > xhi or cy1 < ylo or cy0 > yhi:
                    continue
                out.append((zl, zh))
            break
        frontier = nxt
    out.sort()
    merged: list[tuple[int, int]] = []
    for lo, hi in out:
        if merged and lo <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
        else:
            merged.append((lo, hi))
    return merged


def prune_files_by_ranges(zones, ranges: list[tuple[int, int]]) -> list[str]:
    """Files whose [vmin, vmax] z zone intersects ANY query range
    (files with withheld stats stay in — conservative)."""
    import pandas as pd

    blind = zones["vmin"].isna() | zones["vmax"].isna()
    hit = blind.to_numpy().copy()
    vmin = pd.to_numeric(zones["vmin"], errors="coerce").to_numpy("float64")
    vmax = pd.to_numeric(zones["vmax"], errors="coerce").to_numpy("float64")
    for lo, hi in ranges:
        hit |= (vmax >= lo) & (vmin <= hi)
    return sorted(zones.loc[hit, "path"].unique())
