"""Negative-sampling gates: validity (never a true edge / self-loop),
slot completeness, determinism, and parallelism invariance."""

import numpy as np
import pandas as pd
import pytest


def _toy_edges():
    import ray.data as rd

    # path graph over 6 nodes + one chord: sparse enough that every
    # slot can fill from the 6-node vocabulary
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
             ("e", "f"), ("a", "d")]
    df = pd.DataFrame(pairs, columns=["term_a", "term_b"]).astype("str")
    return rd.from_pandas(df), {tuple(sorted(p)) for p in pairs}


def test_negatives_valid_and_complete(ray_session):
    from medical_knowledge_graph_ray.stages.negsample import (
        negative_samples,
    )

    edges, truth = _toy_edges()
    vocab = list("abcdef")
    out = negative_samples(edges, vocab, k=3, attempts=16,
                           num_buckets=4).to_pandas()
    # validity: no emitted negative is a true (undirected) edge or self
    for _, r in out.iterrows():
        assert r["term_neg"] != r["term_a"]
        assert tuple(sorted((r["term_a"], r["term_neg"]))) not in truth
    # completeness: every (edge, slot) filled exactly once
    key = out.groupby(["term_a", "term_b"])["j"].agg(["count", "nunique"])
    assert (key["count"] == 3).all() and (key["nunique"] == 3).all()
    assert len(key) == 6


def test_negatives_deterministic_and_invariant(ray_session):
    import ray.data as rd

    from medical_knowledge_graph_ray.stages.negsample import (
        negative_samples,
    )

    edges, _ = _toy_edges()
    vocab = list("abcdef")

    def run(ds, buckets):
        return (negative_samples(ds, vocab, k=2, attempts=16,
                                 num_buckets=buckets)
                .to_pandas()
                .sort_values(["term_a", "term_b", "j"])
                .reset_index(drop=True))

    a = run(edges, 4)
    b = run(edges, 7)  # different exchange shape
    pd.testing.assert_frame_equal(a, b)
    # re-blocked input (different batch boundaries)
    df = pd.concat([edges.to_pandas()], ignore_index=True)
    reblocked = rd.from_pandas(df).repartition(5)
    c = run(reblocked, 4)
    pd.testing.assert_frame_equal(a, c)


def test_negatives_drop_when_graph_complete(ray_session):
    """On a COMPLETE graph over the vocabulary no corruption can ever
    survive — every slot must drop, not loop or emit a true edge."""
    import itertools

    import ray.data as rd

    from medical_knowledge_graph_ray.stages.negsample import (
        negative_samples,
    )

    vocab = list("abcd")
    pairs = list(itertools.combinations(vocab, 2))
    df = pd.DataFrame(pairs, columns=["term_a", "term_b"]).astype("str")
    out = negative_samples(rd.from_pandas(df), vocab, k=2, attempts=8,
                           num_buckets=4).to_pandas()
    assert len(out) == 0
