"""Parallelism-invariance: the triple set must be identical at any batch
size / concurrency / block structure (SURVEY §4 Ordering — the whole point
of content-stable keys and batch-local semantics)."""

import pandas as pd
import pytest


def _triples(corpus, batch_size, concurrency, blocks=None):
    from medical_knowledge_graph_ray.pipelines.kg import pages_dataset, triples_dataset

    pages = pages_dataset(corpus)
    if blocks:
        pages = pages.repartition(blocks)
    ds = triples_dataset(pages, ner_concurrency=concurrency, ner_batch_size=batch_size)
    df = ds.to_pandas()
    return (
        df.sort_values(["url", "sent_ord", "pred", "obj", "obj_type"], kind="mergesort")
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def small_corpus(ray_session, tmp_path_factory):
    from medical_knowledge_graph_ray.sources.pages import generate_pages

    root = tmp_path_factory.mktemp("inv")
    return generate_pages(80, str(root / "pages"))


def test_triples_invariant_to_batching(small_corpus):
    base = _triples(small_corpus, 512, 2)
    tiny_batches = _triples(small_corpus, 16, 2)
    pd.testing.assert_frame_equal(base, tiny_batches)


def test_triples_invariant_to_concurrency_and_blocks(small_corpus):
    base = _triples(small_corpus, 512, 2)
    other = _triples(small_corpus, 128, 3, blocks=7)
    pd.testing.assert_frame_equal(base, other)


def test_ner_eval_invariant_to_batching(small_corpus):
    """The MUC count aggregation is associative: identical evaluation at
    any batch size / block structure."""
    from medical_knowledge_graph_ray.pipelines.kg import sentences_dataset
    from medical_knowledge_graph_ray.stages.muc_eval import ner_eval_dataset

    def run(batch_size, blocks=None):
        sents = sentences_dataset(small_corpus)
        if blocks:
            sents = sents.repartition(blocks)
        df = ner_eval_dataset(sents, batch_size=batch_size).to_pandas()
        return df.sort_values(["model", "ent_type", "schema"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(run(2048), run(64, blocks=5))


def test_fused_finalize_invariant_to_buckets_and_matches_unfused(
    small_corpus, tmp_path_factory
):
    """finalize_graph_write must emit VALUE-identical nodes/edges tables
    at any bucket count, equal to the unfused graph_tables path — and the
    edges table must read globally sorted by subj_id straight off the
    range-ordered part files (north_rule, no sort operator)."""
    import os

    from medical_knowledge_graph_ray.pipelines.kg import pages_dataset, triples_dataset
    from medical_knowledge_graph_ray.stages.canonicalize import (
        finalize_graph_write,
        graph_tables,
    )

    tri = triples_dataset(pages_dataset(small_corpus), ner_concurrency=2)
    want_nodes, want_edges = graph_tables(tri)
    want_n = want_nodes.to_pandas().sort_values("node_id").reset_index(drop=True)
    want_e = (
        want_edges.to_pandas()
        .sort_values(["subj_id", "pred", "obj_id"])
        .reset_index(drop=True)
    )
    for nb in (3, 16):
        root = str(tmp_path_factory.mktemp(f"fused{nb}"))
        nd, ed = os.path.join(root, "nodes"), os.path.join(root, "edges")
        m_nodes, m_edges = finalize_graph_write(
            tri, nd, ed, f"test-fp-{nb}", num_buckets=nb
        )
        got_n = pd.read_parquet(nd)
        got_e = pd.read_parquet(ed)
        assert m_nodes["rows"] == len(got_n) and m_edges["rows"] == len(got_e)
        assert list(got_e["subj_id"]) == sorted(got_e["subj_id"])
        pd.testing.assert_frame_equal(
            got_n.sort_values("node_id").reset_index(drop=True), want_n
        )
        pd.testing.assert_frame_equal(got_e, want_e)
