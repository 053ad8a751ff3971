"""Single-process straight-line oracle for the P/R ≥ 0.95 parity gate.

SURVEY §5 target strategy / §7.4 hard part 1: the reference's model ``.pkl``
weights are missing, so parity is defined against a deterministic
single-process implementation of the cited semantics.  This oracle runs the
same per-record pure functions as the distributed pipeline but composed as
one sequential loop — no Ray, no batching, no shuffles — so the e2e test
verifies that the Ray orchestration (batch explosion, actor pooling,
batch-local dedup, two-phase aggregation, content-hash ids) changes
nothing about the result set at any parallelism.
"""

from __future__ import annotations

import pandas as pd

from ..sources.pages import pages_table
from ..stages.canonicalize import node_id, normalize_surface
from ..stages.extract import extract_html
from ..stages.ner import EnsembleNER
from ..stages.sentences import split_document
from ..stages.triples import strip_boundaries


def oracle_triples(n_pages: int) -> pd.DataFrame:
    """pages[0..n) → triple DataFrame, sequentially."""
    pages = pages_table(n_pages)
    ner = EnsembleNER()
    rows = []
    for url, html, lang in zip(
        pages["url"].to_pylist(),
        pages["html"].to_pylist(),
        pages["lang"].to_pylist(),
    ):
        if lang != "zh":
            continue
        text = extract_html(html)
        for sent_ord, (sentence, head, head_type, paragraph) in enumerate(
            split_document(text)
        ):
            mentions = []
            for (model, ent, ety, s, e, p1, _p2, _p3, _p4, _k) in ner._sentence_mentions(
                sentence
            ):
                ent2, s2, e2 = strip_boundaries(ent, s, e)
                if len(ent2) >= 2:
                    mentions.append((model, ent2, ety, s2, e2, p1))
            # D2 max-prob dedup, deterministic tiebreak on model name
            best: dict[tuple, tuple] = {}
            for m in sorted(mentions, key=lambda r: (-r[5], r[0])):
                key = (m[1], m[2], m[3])
                if key not in best:
                    best[key] = m
            for model, ent, ety, s, e, p in best.values():
                rows.append(
                    (head, head_type, paragraph, ent, ety, p, url, sent_ord)
                )
    return pd.DataFrame(
        rows,
        columns=[
            "subj", "subj_type", "pred", "obj", "obj_type", "prob", "url", "sent_ord",
        ],
    )


def oracle_nodes(triples: pd.DataFrame) -> pd.DataFrame:
    ends = pd.concat(
        [
            triples[["subj", "subj_type", "prob"]].rename(
                columns={"subj": "surface", "subj_type": "type"}
            ),
            triples[["obj", "obj_type", "prob"]].rename(
                columns={"obj": "surface", "obj_type": "type"}
            ),
        ],
        ignore_index=True,
    )
    ends["canonical_name"] = ends["surface"].map(normalize_surface)
    out = (
        ends.groupby(["canonical_name", "type"], sort=False)
        .agg(n_mentions=("surface", "size"), prob_max=("prob", "max"))
        .reset_index()
    )
    out["node_id"] = [
        node_id(n, t) for n, t in zip(out["canonical_name"], out["type"])
    ]
    return out[["node_id", "canonical_name", "type", "n_mentions", "prob_max"]]


def oracle_edges(triples: pd.DataFrame) -> pd.DataFrame:
    df = triples.copy()
    df["subj_id"] = [node_id(s, t) for s, t in zip(df["subj"], df["subj_type"])]
    df["obj_id"] = [node_id(o, t) for o, t in zip(df["obj"], df["obj_type"])]
    out = (
        df.groupby(["subj_id", "pred", "obj_id"], sort=False)
        .agg(weight=("prob", "max"), n_evidence=("prob", "size"))
        .reset_index()
        .sort_values("subj_id", kind="mergesort")
        .reset_index(drop=True)
    )
    return out[["subj_id", "pred", "obj_id", "weight", "n_evidence"]]
