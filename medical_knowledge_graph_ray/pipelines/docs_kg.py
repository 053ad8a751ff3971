"""KG construction over the driver's ``documents`` table (SQL-oracled).

The flagship pipeline runs over the synthetic page corpus (input_hint
shape); this variant runs the same operator family over the driver's
``documents.parquet`` so the DuckDB correctness harness can verify it
line-by-line: gazetteer mention extraction → (source, mentions, term)
edge aggregation → node aggregation.

**Matching semantics (shared with the SQL oracle):** priority-ordered
sequential matching — multi-word terms are matched-and-masked first in
(length desc, lexicographic) order, then single-word terms are counted on
the masked text with word boundaries.  This mirrors the reference's
fixed-pass-order pattern matching (``words_combiner`` applies each pattern
list in a fixed order, ``utils.py:343-381``) and is exactly reproducible
in SQL as a ``regexp_replace`` chain — unlike leftmost-longest automaton
semantics, which SQL cannot express.
"""

from __future__ import annotations

import re

import pandas as pd

from ..functions.arrow import arrow_out
from ..ontology import WEBTEXT_GAZETTEER

MULTI_TERMS: list[str] = sorted(
    (t for t in WEBTEXT_GAZETTEER if " " in t), key=lambda t: (-len(t), t)
)
SINGLE_TERMS: list[str] = sorted(t for t in WEBTEXT_GAZETTEER if " " not in t)

_MULTI_RES = [re.compile(rf"\b{re.escape(t)}\b") for t in MULTI_TERMS]
_SINGLE_RES = {t: re.compile(rf"\b{re.escape(t)}\b") for t in SINGLE_TERMS}


def doc_mentions_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """documents batch → (doc_id, source, term, ent_type, n_occ) rows.

    Fully vectorized: one ``str.count`` + ``str.replace`` pass per
    gazetteer term over the whole batch column.
    """
    work = batch["text"].astype(str)
    counts: dict[str, pd.Series] = {}
    for i, (term, rex) in enumerate(zip(MULTI_TERMS, _MULTI_RES)):
        counts[term] = work.str.count(rex)
        work = work.str.replace(rex, f"«{i}»", regex=True)
    for term, rex in _SINGLE_RES.items():
        counts[term] = work.str.count(rex)

    frames = []
    for term, cnt in counts.items():
        mask = cnt > 0
        if not mask.any():
            continue
        frames.append(
            pd.DataFrame(
                {
                    "doc_id": batch.loc[mask, "doc_id"].to_numpy(),
                    "source": batch.loc[mask, "source"].to_numpy(),
                    "term": term,
                    "ent_type": WEBTEXT_GAZETTEER[term],
                    "n_occ": cnt[mask].astype("int64").to_numpy(),
                }
            )
        )
    if not frames:
        return pd.DataFrame(
            {
                "doc_id": pd.array([], "int64"), "source": pd.array([], "str"),
                "term": pd.array([], "str"), "ent_type": pd.array([], "str"),
                "n_occ": pd.array([], "int64"),
            }
        )
    return pd.concat(frames, ignore_index=True)


def doc_mentions(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    return docs.map_batches(arrow_out(doc_mentions_batch), batch_format="pandas")


def doc_edges(sf_dir: str):
    """(source —mentions→ term) edges: two-phase aggregate over mentions."""
    from ray.data.aggregate import Sum

    mentions = doc_mentions(sf_dir)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.groupby(["source", "term", "ent_type"], sort=False)
            .agg(n_docs=("doc_id", "size"), n_occ_total=("n_occ", "sum"))
            .reset_index()
        )

    return (
        mentions.map_batches(arrow_out(partial), batch_format="pandas")
        .groupby(["source", "term", "ent_type"])
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_occ_total", alias_name="n_occ_total"),
        )
    )


def doc_nodes(sf_dir: str):
    """term-level node table: in how many docs / how often each entity
    surface occurs (A5/A6 distinct+census analogue)."""
    from ray.data.aggregate import Sum

    mentions = doc_mentions(sf_dir)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.groupby(["term", "ent_type"], sort=False)
            .agg(n_docs=("doc_id", "size"), n_occ_total=("n_occ", "sum"))
            .reset_index()
        )

    return (
        mentions.map_batches(arrow_out(partial), batch_format="pandas")
        .groupby(["term", "ent_type"])
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_occ_total", alias_name="n_occ_total"),
        )
    )


# -- DuckDB oracle SQL (generated from the same gazetteer) -------------------

def _masked_text_expr() -> str:
    expr = "text"
    for i, term in enumerate(MULTI_TERMS):
        expr = f"regexp_replace({expr}, '\\b{term}\\b', '«{i}»', 'g')"
    return expr


def mentions_sql() -> str:
    mask = _masked_text_expr()
    selects = []
    for i, term in enumerate(MULTI_TERMS):
        selects.append(
            f"SELECT doc_id, source, '{term}' AS term, "
            f"'{WEBTEXT_GAZETTEER[term]}' AS ent_type, "
            f"len(regexp_extract_all(t, '«{i}»')) AS n_occ FROM w"
        )
    for term in SINGLE_TERMS:
        selects.append(
            f"SELECT doc_id, source, '{term}', '{WEBTEXT_GAZETTEER[term]}', "
            f"len(regexp_extract_all(t, '\\b{term}\\b')) FROM w"
        )
    union = "\nUNION ALL\n".join(selects)
    return (
        f"WITH w AS (SELECT doc_id, source, {mask} AS t FROM documents),\n"
        f"m AS (\n{union}\n)\n"
        f"SELECT doc_id, source, term, ent_type, CAST(n_occ AS BIGINT) AS n_occ "
        f"FROM m WHERE n_occ > 0"
    )


def edges_sql() -> str:
    return (
        f"WITH mentions AS ({mentions_sql()})\n"
        "SELECT source, term, ent_type, COUNT(*) AS n_docs, "
        "CAST(SUM(n_occ) AS BIGINT) AS n_occ_total FROM mentions GROUP BY source, term, ent_type"
    )


def nodes_sql() -> str:
    return (
        f"WITH mentions AS ({mentions_sql()})\n"
        "SELECT term, ent_type, COUNT(*) AS n_docs, "
        "CAST(SUM(n_occ) AS BIGINT) AS n_occ_total FROM mentions GROUP BY term, ent_type"
    )
