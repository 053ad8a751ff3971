"""BPE tokenizer-training gates: the textbook example, parallelism
invariance of the census→merge chain, and the encode serving path."""

import sys

import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


def test_merges_match_sennrich_example():
    """The classic learn-BPE walkthrough corpus: {low:5, lower:2,
    newest:6, widest:3}.  First merges are the ('e','s')→('es','t')→
    ('est','</w>') chain (count 9), then the 'low' prefix (count 7)."""
    from medical_knowledge_graph_ray.stages.bpe import bpe_merges_from_census

    census = pd.DataFrame(
        {"word": ["low", "lower", "newest", "widest"], "n": [5, 2, 6, 3]}
    )
    merges = bpe_merges_from_census(census, 5)
    assert merges[:4] == [
        ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"),
    ]
    assert merges[4] == ("lo", "w")


def test_ties_break_lexicographically():
    """Equal-count pairs must merge in lexicographic order — the census
    is exact, so this makes the whole merge list deterministic."""
    from medical_knowledge_graph_ray.stages.bpe import bpe_merges_from_census

    census = pd.DataFrame({"word": ["ab", "cd"], "n": [3, 3]})
    merges = bpe_merges_from_census(census, 2)
    # pairs: (a,b)=3, (b,</w>)=3, (c,d)=3, (d,</w>)=3 → (a,b) first
    assert merges[0] == ("a", "b")


def test_census_and_merges_parallelism_invariant(ray_session):
    """Same corpus through 1 block vs 7 blocks → identical census AND
    identical merge table."""
    import ray.data as rd

    from medical_knowledge_graph_ray.stages.bpe import (
        bpe_merges_from_census,
        word_census,
    )

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["text"])
    a = word_census(rd.from_pandas(docs), top_k=500)
    b = word_census(rd.from_pandas(docs).repartition(7), top_k=500,
                    num_buckets=5)
    pd.testing.assert_frame_equal(a, b)
    assert bpe_merges_from_census(a, 64) == bpe_merges_from_census(b, 64)


def test_encode_word_greedy_rank_order():
    from medical_knowledge_graph_ray.stages.bpe import (
        bpe_merges_from_census,
        encode_word,
    )

    census = pd.DataFrame(
        {"word": ["low", "lower", "newest", "widest"], "n": [5, 2, 6, 3]}
    )
    merges = bpe_merges_from_census(census, 10)
    rank_of = {p: i for i, p in enumerate(merges)}
    # 'newest' fully learned → collapses into few symbols; a novel word
    # reuses learned subwords ('est</w>')
    assert "est</w>" in encode_word("tallest", rank_of)
    assert encode_word("newest", rank_of)[-1].endswith("</w>")


def test_docs_bpe_queries(ray_session):
    """End-to-end: vocabulary trains over the corpus; the encode pass
    yields one bounded count per doc, ≤ the whitespace+chars bound and
    ≥ the word count (a word is ≥ 1 token)."""
    from medical_knowledge_graph_ray.pipelines.docs import (
        docs_bpe_encoded,
        docs_bpe_vocab,
    )

    vocab = docs_bpe_vocab(SF_DIR)
    assert len(vocab) > 0 and vocab["rank"].is_monotonic_increasing
    enc = docs_bpe_encoded(SF_DIR).to_pandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"])
    merged = enc.merge(docs, on="doc_id")
    n_words = merged["text"].astype(str).str.split(" ").map(
        lambda ws: sum(1 for w in ws if w)
    )
    n_chars = merged["text"].astype(str).str.replace(" ", "", regex=False).str.len()
    assert (merged["n_bpe_tokens"] >= n_words).all()
    assert (merged["n_bpe_tokens"] <= n_chars + n_words).all()
