"""Approximate string matching: deletion-banded edit-distance join.

Typo-candidate mining — corpus tokens within Levenshtein distance ``d``
of a dictionary term — is a data-cleaning staple (the reference's
gazetteer matching is exact only; ``utils.py`` pattern lists catch
listed variants, never unlisted typos).  The naive form is an all-pairs
vocabulary × dictionary cross join; the scale-correct form is SymSpell
banding: if ``lev(a, b) ≤ d`` then deleting the edited positions gives
a COMMON string reachable by ≤ d deletions from each side — so tokens
and terms that share a ≤ d-deletion variant form a candidate SUPERSET
(each edit op removes ≥ 1 char from one side's alignment), verified by
an exact Levenshtein pass over the (tiny) candidate set.  Exchange
cost: distinct (token, variant) pairs per batch, never the cross
product.
"""

from __future__ import annotations

from itertools import combinations


def deletion_variants(s: str, d: int) -> set[str]:
    """All strings reachable from ``s`` by deleting ≤ d characters."""
    out = {s}
    n = len(s)
    for k in range(1, min(d, n) + 1):
        for idxs in combinations(range(n), k):
            drop = set(idxs)
            out.add("".join(ch for i, ch in enumerate(s) if i not in drop))
    return out


def levenshtein(a: str, b: str) -> int:
    """Plain Levenshtein (insert/delete/substitute, unit costs) — must
    match DuckDB's ``levenshtein`` exactly (the oracle contract)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def fuzzy_match_terms(docs, terms: list[str], *, max_d: int = 2):
    """Dataset of ``(token, term, dist)``: corpus tokens within
    ``max_d`` edits of a dictionary term (token ≠ term).

    Distributed shape: per-batch DISTINCT tokens explode into their
    deletion variants and probe a BROADCAST variant→terms index (the
    dictionary side is gazetteer-bounded; for a large dictionary the
    probe becomes a partitioned join on the variant key — same banding,
    two-sided); candidate (token, term) pairs dedupe through one tiny
    bucketed exchange, then the exact Levenshtein verify runs once per
    DISTINCT candidate — never per occurrence, never all-pairs."""
    import pandas as pd
    import ray

    from ..functions.arrow import arrow_out
    from .shuffle import bucketed_group_map

    index: dict[str, list[str]] = {}
    for t in terms:
        for v in deletion_variants(t, max_d):
            index.setdefault(v, []).append(t)
    index_ref = ray.put(index)

    def candidates(b: pd.DataFrame) -> pd.DataFrame:
        idx = ray.get(index_ref)
        toks, cand_terms = [], []
        seen: set[str] = set()
        for text in b["text"].astype(str):
            seen.update(text.split(" "))
        for tok in seen:
            hit: set[str] = set()
            for v in deletion_variants(tok, max_d):
                hit.update(idx.get(v, ()))
            hit.discard(tok)
            for term in hit:
                toks.append(tok)
                cand_terms.append(term)
        return pd.DataFrame(
            {"token": pd.array(toks, "str"),
             "term": pd.array(cand_terms, "str")}
        )

    cand = docs.map_batches(arrow_out(candidates), batch_format="pandas")

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        u = g.drop_duplicates(["token", "term"])
        dist = [levenshtein(a, b) for a, b in zip(u["token"], u["term"])]
        u = u.assign(dist=pd.array(dist, "int64"))
        return u[u["dist"] <= max_d]

    return bucketed_group_map(cand, ["token", "term"], verify, num_buckets=4)
