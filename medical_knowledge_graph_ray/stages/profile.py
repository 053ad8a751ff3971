"""ANALYZE-style distributed column profiling.

One pass per table computes, for every profiled column: row count, null
count, EXACT distinct count, typed min/max and (for strings) total byte
length — the catalog statistics a query planner or data-quality gate
feeds on (reference intent: the ad-hoc per-table sanity counts scattered
through ``structurize_files.py``'s load steps, promoted to a first-class
operator).

Distributed shape — everything rides ONE bucketed exchange:

1. per-batch combiner: each column collapses to its batch-local value
   census ``(tbl, col, v_str, v_num, cnt)`` — the exchange carries
   distinct-values-per-batch rows, never the table;
2. all tables UNION into a single hash exchange on ``(tbl, col, v_str)``
   (values of a column co-locate, so per-bucket distinct counts are
   globally disjoint and SUM to the exact distinct);
3. per-bucket partials are ≤ buckets × #columns rows — the driver
   finalize is bounded combine, not data.

Exactness contracts:
- ``v_str`` is an injective canonical string per value (float repr is
  shortest-roundtrip; timestamps use epoch-µs), so distinct-on-string ≡
  distinct-on-value;
- string min/max compare by codepoint ≡ DuckDB's binary collation
  (UTF-8 byte order preserves codepoint order);
- numeric min/max are never arithmetic — the oracle's
  ``CAST(MIN(col) AS DOUBLE)`` and Python's ``float()`` round the same
  integer the same way (both round-to-nearest), timestamps via
  ``epoch_us``;
- parquet float NULLs arrive in pandas as NaN, so NaN ≡ NULL here (the
  honest reading for parquet-sourced data; documented divergence from
  SQL engines that store NaN as a value).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.arrow import arrow_out

NULL_SENTINEL = "\x00∅"  # never occurs in real column data


def _tall_batch(b: pd.DataFrame, tbl: str, kinds: dict[str, str]) -> pd.DataFrame:
    """Batch-local value census per profiled column (the combiner)."""
    frames = []
    for col, kind in kinds.items():
        s = b[col]
        mask = s.isna().to_numpy()
        if kind == "ts":
            iv = s.to_numpy().astype("datetime64[us]").view("int64")
            v_str = pd.Series(iv.astype(str), index=s.index)
            v_num = pd.Series(iv.astype("float64"), index=s.index)
            v_num = v_num.where(~mask)
        elif kind == "num":
            v_str = s.astype(str)  # shortest-roundtrip repr: injective
            v_num = s.astype("float64")
        else:  # str
            v_str = s.astype(str)
            v_num = pd.Series(np.nan, index=s.index, dtype="float64")
        if mask.any():
            v_str = v_str.where(~mask, NULL_SENTINEL)
        cen = (
            pd.DataFrame({"v_str": v_str, "v_num": v_num})
            .groupby("v_str", sort=False, dropna=False)
            .agg(v_num=("v_num", "first"), cnt=("v_num", "size"))
            .reset_index()
        )
        cen.insert(0, "tbl", tbl)
        cen.insert(1, "col", col)
        frames.append(cen)
    out = pd.concat(frames, ignore_index=True)
    out["cnt"] = out["cnt"].astype("int64")
    out["v_num"] = out["v_num"].astype("float64")
    return out


def profile_datasets(specs: list[tuple[str, "object", dict[str, str]]]) -> pd.DataFrame:
    """Profile every ``(tbl, dataset, {col: kind})`` spec; kinds are
    ``num`` / ``str`` / ``ts``.  Returns one row per (tbl, col)."""
    from .shuffle import bucketed_group_map

    all_kinds = {(tbl, c): k for tbl, _ds, kinds in specs for c, k in kinds.items()}

    tall = None
    for tbl, ds, kinds in specs:
        t = ds.map_batches(
            arrow_out(lambda b, _t=tbl, _k=kinds: _tall_batch(b, _t, _k)),
            batch_format="pandas",
        )
        tall = t if tall is None else tall.union(t)

    def bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (tbl, col), sub in g.groupby(["tbl", "col"], sort=False):
            kind = all_kinds[(tbl, col)]
            # a value may arrive once per upstream batch — re-sum
            sub = (
                sub.groupby("v_str", sort=False)
                .agg(v_num=("v_num", "first"), cnt=("cnt", "sum"))
                .reset_index()
            )
            nm = sub["v_str"] == NULL_SENTINEL
            nn = sub[~nm]
            row = {
                "tbl": tbl, "col": col,
                "n_rows": int(sub["cnt"].sum()),
                "n_null": int(sub.loc[nm, "cnt"].sum()),
                "n_distinct": int(len(nn)),
                "min_num": np.nan, "max_num": np.nan,
                "min_str": None, "max_str": None, "sum_len": 0,
            }
            if len(nn):
                if kind == "str":
                    row["min_str"] = nn["v_str"].min()
                    row["max_str"] = nn["v_str"].max()
                    row["sum_len"] = int(
                        (nn["v_str"].str.len() * nn["cnt"]).sum()
                    )
                else:
                    row["min_num"] = float(nn["v_num"].min())
                    row["max_num"] = float(nn["v_num"].max())
            rows.append(row)
        cols = ["tbl", "col", "n_rows", "n_null", "n_distinct",
                "min_num", "max_num", "min_str", "max_str", "sum_len"]
        out = pd.DataFrame(rows, columns=cols)
        out["sum_len"] = out["sum_len"].astype("int64")
        for c in ("n_rows", "n_null", "n_distinct"):
            out[c] = out[c].astype("int64")
        return out

    partials = bucketed_group_map(tall, ["tbl", "col", "v_str"], bucket_stats)
    p = partials.to_pandas()  # bounded: buckets × #columns rows

    rows = []
    for (tbl, col), sub in p.groupby(["tbl", "col"], sort=False):
        kind = all_kinds[(tbl, col)]
        strs = sub["min_str"].dropna()
        strs_mx = sub["max_str"].dropna()
        rows.append(
            {"tbl": tbl, "col": col,
             "n_rows": int(sub["n_rows"].sum()),
             "n_null": int(sub["n_null"].sum()),
             "n_distinct": int(sub["n_distinct"].sum()),
             "min_num": float(sub["min_num"].min())
                 if kind != "str" and sub["min_num"].notna().any() else np.nan,
             "max_num": float(sub["max_num"].max())
                 if kind != "str" and sub["max_num"].notna().any() else np.nan,
             "min_str": strs.min() if len(strs) else None,
             "max_str": strs_mx.max() if len(strs_mx) else None,
             "sum_len": int(sub["sum_len"].sum())}
        )
    cols = ["tbl", "col", "n_rows", "n_null", "n_distinct",
            "min_num", "max_num", "min_str", "max_str", "sum_len"]
    out = pd.DataFrame(rows, columns=cols).sort_values(
        ["tbl", "col"], kind="mergesort"
    ).reset_index(drop=True)
    for c in ("n_rows", "n_null", "n_distinct", "sum_len"):
        out[c] = out[c].astype("int64")
    out["min_num"] = out["min_num"].astype("float64")
    out["max_num"] = out["max_num"].astype("float64")
    return out


TOTAL_SENTINEL = "\x00TOTAL"


def skew_report(specs: list[tuple[str, "object", list[str]]], top_n: int = 5) -> pd.DataFrame:
    """Heavy-key diagnostics over join/group key columns — the mining
    pass that feeds ``hash_join(skew=...)``: per (table, column) the
    ``top_n`` hottest values with exact counts and their integer
    basis-point share of the table.  ``specs`` = (tbl, dataset, [cols]).

    Shape: per-batch ``value_counts`` combiner → all columns of all
    tables share ONE hash exchange on (tbl, col, value); per-bucket
    top-n candidates are value-disjoint so their union provably contains
    the global top-n; each bucket also emits one Σcnt marker row per
    (tbl, col) so the global total (the share denominator) needs no
    second pass.  Values travel as canonical strings (``str(int)`` ≡
    ``CAST(x AS VARCHAR)``), shares as ``cnt·10⁴ // total`` — exact
    integer division on both engines."""
    from .shuffle import bucketed_group_map

    tall = None
    for tbl, ds, cols in specs:
        def _census(b: pd.DataFrame, _t=tbl, _cols=tuple(cols)) -> pd.DataFrame:
            frames = []
            for c in _cols:
                vc = b[c].dropna().astype(str).value_counts()
                frames.append(pd.DataFrame(
                    {"tbl": _t, "col": c,
                     "value": pd.array(vc.index.to_numpy(dtype=object), "str"),
                     "cnt": pd.array(vc.to_numpy(), "int64")}
                ))
            return pd.concat(frames, ignore_index=True)

        t = ds.map_batches(arrow_out(_census), batch_format="pandas")
        tall = t if tall is None else tall.union(t)

    def bucket_top(g: pd.DataFrame) -> pd.DataFrame:
        m = (
            g.groupby(["tbl", "col", "value"], sort=False)["cnt"]
            .sum().reset_index()
        )
        top = (
            m.sort_values(["tbl", "col", "cnt", "value"],
                          ascending=[True, True, False, True],
                          kind="mergesort")
            .groupby(["tbl", "col"], sort=False).head(top_n)
        )
        totals = (
            m.groupby(["tbl", "col"], sort=False)["cnt"].sum().reset_index()
        )
        totals["value"] = TOTAL_SENTINEL
        out = pd.concat([top, totals[top.columns]], ignore_index=True)
        out["cnt"] = out["cnt"].astype("int64")
        return out

    p = bucketed_group_map(tall, ["tbl", "col", "value"], bucket_top).to_pandas()
    is_tot = p["value"] == TOTAL_SENTINEL
    totals = (
        p[is_tot].groupby(["tbl", "col"])["cnt"].sum().to_dict()
    )
    rows = []
    for (tbl, col), sub in p[~is_tot].groupby(["tbl", "col"], sort=False):
        total = int(totals[(tbl, col)])
        sub = sub.sort_values(
            ["cnt", "value"], ascending=[False, True], kind="mergesort"
        ).head(top_n)
        for i, r in enumerate(sub.itertuples(index=False), 1):
            rows.append(
                {"tbl": tbl, "col": col, "value": r.value,
                 "cnt": int(r.cnt),
                 "share_bp": int(r.cnt) * 10000 // total,
                 "rank": i}
            )
    cols_out = ["tbl", "col", "value", "cnt", "share_bp", "rank"]
    out = pd.DataFrame(rows, columns=cols_out).sort_values(
        ["tbl", "col", "rank"], kind="mergesort"
    ).reset_index(drop=True)
    for c in ("cnt", "share_bp", "rank"):
        out[c] = out[c].astype("int64")
    return out


def skew_report_sql(specs: list[tuple[str, list[str]]], top_n: int = 5) -> str:
    """Mirrored oracle: one ranked GROUP BY arm per (table, column)."""
    arms = []
    for tbl, cols in specs:
        for c in cols:
            arms.append(f"""
SELECT tbl, col, value, cnt, share_bp,
       CAST(row_number() OVER (ORDER BY cnt DESC, value) AS BIGINT) AS rank
FROM (
  SELECT '{tbl}' AS tbl, '{c}' AS col, CAST({c} AS VARCHAR) AS value,
         COUNT(*) AS cnt,
         CAST(COUNT(*) * 10000 //
              (SELECT COUNT(*) FROM {tbl} WHERE {c} IS NOT NULL)
              AS BIGINT) AS share_bp
  FROM {tbl} WHERE {c} IS NOT NULL GROUP BY {c}
  ORDER BY cnt DESC, value LIMIT {top_n}
)""")
    return " UNION ALL ".join(arms)


def profile_sql(specs: list[tuple[str, dict[str, str]]]) -> str:
    """The mirrored DuckDB oracle: one UNION ALL arm per column."""
    arms = []
    for tbl, kinds in specs:
        for col, kind in kinds.items():
            if kind == "str":
                num = "CAST(NULL AS DOUBLE)"
                mn, mx = f"MIN({col})", f"MAX({col})"
                sl = f"CAST(COALESCE(SUM(length({col})), 0) AS BIGINT)"
                arm_num = f"{num} AS min_num, {num} AS max_num"
            else:
                expr = f"epoch_us({{m}}({col}))" if kind == "ts" else f"{{m}}({col})"
                arm_num = (
                    f"CAST({expr.format(m='MIN')} AS DOUBLE) AS min_num, "
                    f"CAST({expr.format(m='MAX')} AS DOUBLE) AS max_num"
                )
                mn = mx = "CAST(NULL AS VARCHAR)"
                sl = "CAST(0 AS BIGINT)"
            arms.append(
                f"SELECT '{tbl}' AS tbl, '{col}' AS col, "
                f"COUNT(*) AS n_rows, COUNT(*) - COUNT({col}) AS n_null, "
                f"COUNT(DISTINCT {col}) AS n_distinct, {arm_num}, "
                f"{mn} AS min_str, {mx} AS max_str, {sl} AS sum_len "
                f"FROM {tbl}"
            )
    return " UNION ALL ".join(arms)
