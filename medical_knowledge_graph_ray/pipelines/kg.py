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
# sf0.001 ≈ driver smoke, sf0.01 ≈ correctness, sf0.1 ≈ bench)
PAGES_PER_SF = {"sf0.001": 500, "sf0.01": 5_000, "sf0.1": 50_000}


def _default_concurrency() -> tuple[int, int]:
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return (1, max(2, cpus))


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


def triples_dataset(pages, *, ner_concurrency=None, ner_batch_size: int = 512):
    """pages Dataset → lazy triples Dataset (no checkpoint)."""
    conc = ner_concurrency or _default_concurrency()
    text = pages.map_batches(extract_text_batch, batch_format="pyarrow")
    text = text.select_columns(["url", "text"])
    sents = text.map_batches(split_batch, batch_format="pyarrow")
    mentions = sents.map_batches(
        EnsembleNER,
        batch_format="pyarrow",
        batch_size=ner_batch_size,
        concurrency=conc,
        num_cpus=1,
    )
    cleaned = mentions.map_batches(clean_mentions_batch, batch_format="pyarrow")
    deduped = cleaned.map_batches(dedup_mentions_batch, batch_format="pyarrow")
    return deduped.map_batches(emit_triples_batch, batch_format="pyarrow")


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

    tri_ck = read_stage(tri_dir)
    nodes = finalize_nodes(
        tri_ck.map_batches(partial_nodes_batch, batch_format="pyarrow")
    )
    manifests["nodes"] = write_stage(
        nodes, os.path.join(out_root, "nodes"), "nodes", fp
    )

    tri_ck2 = read_stage(tri_dir)
    edges = finalize_edges(
        tri_ck2.map_batches(partial_edges_batch, batch_format="pyarrow")
    )
    manifests["edges"] = write_stage(
        edges, os.path.join(out_root, "edges"), "edges", fp
    )
    return manifests
