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
