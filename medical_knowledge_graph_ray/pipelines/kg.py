"""Flagship KG-construction pipeline (pages → nodes/edges Parquet).

The Ray-Data-first re-expression of the reference's end-to-end flow
(``structurize_files.py`` → ``pre_labeling.py`` → ``EnsemblePredict_all.py``
→ ``clean_and_save.py``; SURVEY §3, §7.1)::

    read_parquet(pages: url, warc_ts, html, text, lang)        # prune: url/html/lang only
     → map_batches(extract_text)        stateless               # byte-identical text per url
     → map_batches(split_sentences)     stateless, explode
     → map_batches(EnsembleNER, actor pool)                     # members + dict + voting resident per actor
     → map_batches(clean → dedup → triples)  stateless, batch-local D2
     → checkpoint triples (Parquet + lineage manifest)
     → nodes:  partial combine → groupby(node key) agg          # shuffle #1 (tiny: partials only)
     → edges:  partial combine → groupby(s,p,o) agg → sort(subj)# shuffle #2 + range sort

Branching note: nodes and edges both derive from triples; the triple set is
**checkpointed to Parquet** first so the expensive NER stage runs exactly
once and both aggregations re-read the (much smaller) checkpoint — this is
also the resume point (state/manifests.py).
"""

from __future__ import annotations

import os

import pyarrow.compute as pc

from ..sources.pages import generate_pages
from ..stages.canonicalize import (
    finalize_edges,
    finalize_nodes,
    partial_edges_batch,
    partial_nodes_batch,
)
from ..stages.extract import extract_text_batch
from ..stages.ner import EnsembleNER
from ..stages.sentences import split_batch
from ..stages.triples import (
    clean_mentions_batch,
    dedup_mentions_batch,
    emit_triples_batch,
)
from ..state.manifests import read_stage, stage_complete, write_stage

# corpus size per scale-factor dir name (deterministic synthetic corpus;
# sf0.001 ≈ driver smoke, sf0.01 ≈ correctness, sf0.1 ≈ bench).  The bench
# corpus is sized so per-batch compute dominates the fixed per-run costs
# (~11 s: 3 execution startups + actor-pool spin-up + checkpoint write) —
# at 50 k pages those constants capped two-scale efficiency at ~0.5.
PAGES_PER_SF = {"sf0.001": 500, "sf0.01": 20_000, "sf0.1": 200_000}


def _default_concurrency() -> int:
    """Fixed actor-pool size = cluster CPUs minus headroom for the read /
    write task operators.  A pool that reserves every CPU deadlocks the
    streaming executor (upstream tasks can never run); an autoscaling pool
    ramps up too slowly for short jobs — measured 10.4 s (autoscale 1→32)
    vs 5.5 s (fixed 28) for the identical sf0.1 flagship run."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(2, cpus - 4)


def pages_dataset(corpus_dir: str):
    """Open the page corpus reading ONLY the pipeline's columns (the
    ground-truth ``text`` column stays on disk — it is the oracle, not an
    input)."""
    import ray.data as rd

    return rd.read_parquet(
        corpus_dir,
        columns=["url", "html", "lang"],
        filter=pc.equal(pc.field("lang"), "zh"),
    )


def corpus_for_sf(sf_dir: str, root: str = "/tmp/mkg_corpus") -> str:
    """Materialize (once) the deterministic page corpus sized for a
    testdata scale-factor dir; returns the corpus directory."""
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    n = PAGES_PER_SF.get(sf_name, 500)
    out = os.path.join(root, sf_name)
    return generate_pages(n, out)


class MentionStage:
    """ONE actor pool for the whole per-sentence path: ensemble NER → O14
    boundary strip → E4/E5 rule merging → D2 max-prob dedup → O15
    confidence cleansing → triple emission (implicit + taboo).

    Everything after the NER call is batch-local by construction (all
    mentions of a sentence live in the emitting batch), so chaining the
    stages inside one actor removes five object-store round-trips per
    batch AND avoids multiple actor pools contending for CPUs (two pools
    on a small node can deadlock the streaming executor waiting for
    actors that can never start).
    """

    def __init__(self, gazetteer: dict[str, str] | None = None):
        from ..stages.ner import EnsembleNER
        from ..stages.rules_stage import RulesMerge

        self.ner = EnsembleNER(gazetteer)
        self.rules = RulesMerge(gazetteer)

    def __call__(self, batch):
        import pandas as pd
        import pyarrow as pa

        from ..stages.cleansing import confidence_rules_batch

        m = self.ner(batch)
        m = clean_mentions_batch(m)
        mdf = m.to_pandas()
        new = self.rules.augment(batch.to_pandas(), mdf)
        if len(new):
            mdf = pd.concat([mdf, new], ignore_index=True)
        m = pa.Table.from_pandas(mdf, schema=m.schema, preserve_index=False)
        m = dedup_mentions_batch(m)
        m = confidence_rules_batch(m)
        return emit_triples_batch(m)


def triples_dataset(pages, *, ner_concurrency=None, ner_batch_size: int = 512):
    """pages Dataset → lazy triples Dataset (no checkpoint).

    Stage order mirrors the reference lifecycle (SURVEY §3.3): extract →
    split → [MentionStage actor pool: NER + strip + rules + dedup +
    cleansing + triples].
    """
    conc = ner_concurrency or _default_concurrency()
    text = pages.map_batches(extract_text_batch, batch_format="pyarrow")
    text = text.select_columns(["url", "text"])
    sents = text.map_batches(split_batch, batch_format="pyarrow")
    return sents.map_batches(
        MentionStage,
        batch_format="pyarrow",
        batch_size=ner_batch_size,
        concurrency=conc,
        num_cpus=1,
    )


def run_kg(
    corpus_dir: str,
    out_root: str,
    *,
    ner_concurrency=None,
    resume: bool = True,
) -> dict:
    """Full run with checkpoints: triples → nodes + edges Parquet.

    Returns {"triples": manifest, "nodes": manifest, "edges": manifest}.
    Resumable: a completed triples checkpoint is reused (fingerprinted by
    the corpus dir), and each output table is written atomically.
    """
    fp = f"corpus={os.path.abspath(corpus_dir)}"
    tri_dir = os.path.join(out_root, "triples")
    manifests: dict[str, dict] = {}

    if not (resume and stage_complete(tri_dir, fp)):
        tri = triples_dataset(pages_dataset(corpus_dir), ner_concurrency=ner_concurrency)
        manifests["triples"] = write_stage(tri, tri_dir, "triples", fp)
    else:
        import json

        with open(os.path.join(tri_dir, "_MANIFEST.json")) as f:
            manifests["triples"] = json.load(f)

    # nodes and edges are independent scans of the triples checkpoint;
    # measured: overlapping the two executions CONTENDS (29 s overlapped
    # vs ~6 s + ~11 s sequential at 200 k pages — both want the full CPU
    # set), so run them back-to-back.  Large combine batches maximize
    # batch-local dedup before the key shuffle.
    nodes = finalize_nodes(
        read_stage(tri_dir).map_batches(
            partial_nodes_batch, batch_format="pyarrow", batch_size=65536
        )
    )
    manifests["nodes"] = write_stage(
        nodes, os.path.join(out_root, "nodes"), "nodes", fp
    )
    edges = finalize_edges(
        read_stage(tri_dir).map_batches(
            partial_edges_batch, batch_format="pyarrow", batch_size=65536
        )
    )
    manifests["edges"] = write_stage(
        edges, os.path.join(out_root, "edges"), "edges", fp
    )
    return manifests
