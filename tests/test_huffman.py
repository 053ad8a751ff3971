"""Huffman census gates: optimality (vs the algorithm-independent cost
fold), Kraft equality, the Shannon [H, H+1) bound, determinism, and the
distributed query's agreement with a local census."""

import math
import sys
from fractions import Fraction

import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

from medical_knowledge_graph_ray.functions.coding import (  # noqa: E402
    huffman_lengths,
    huffman_total_cost,
)

CASES = [
    [40, 30, 15, 10, 5],
    [1, 1, 1, 1],
    [5, 5, 5, 5, 5, 5, 5],          # all ties — determinism matters
    [100],
    [7, 3],
    list(range(1, 40)),
    [2**i for i in range(12)],       # degenerate deep tree
]


@pytest.mark.parametrize("w", CASES)
def test_optimal_cost_and_kraft(w):
    L = huffman_lengths(w)
    assert sum(a * b for a, b in zip(w, L)) == huffman_total_cost(w)
    if len(w) >= 2:  # a full binary tree saturates Kraft exactly
        assert sum(Fraction(1, 2 ** l) for l in L) == 1
    else:  # single symbol: one conventional bit, Kraft 1/2
        assert L == [1]


@pytest.mark.parametrize("w", CASES)
def test_shannon_bound(w):
    if len(w) < 2:
        return
    L = huffman_lengths(w)
    tot = sum(w)
    e_len = sum(a * b for a, b in zip(w, L)) / tot
    h = -sum(x / tot * math.log2(x / tot) for x in w)
    assert h - 1e-9 <= e_len < h + 1 + 1e-9


def test_deterministic_under_ties():
    w = [5, 5, 5, 5, 5, 5]
    assert huffman_lengths(w) == huffman_lengths(list(w))
    # equal weights, n=6: lengths must be a valid optimal profile
    L = huffman_lengths(w)
    assert sorted(L) == [2, 2, 3, 3, 3, 3]


def test_query_matches_local_census(ray_session):
    import numpy as np

    from medical_knowledge_graph_ray.pipelines.docs import (
        HUFFMAN_V,
        docs_huffman,
    )

    got = docs_huffman("/root/testdata/sf0.001")
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    toks = pd.Series(
        np.concatenate([t.split(" ") for t in docs["text"].astype(str)])
    )
    c = toks.value_counts()
    cen = (
        c.rename_axis("token").reset_index(name="n")
        .sort_values(["n", "token"], ascending=[False, True], kind="mergesort")
        .head(HUFFMAN_V)
    )
    assert list(got["token"][: len(cen)]) == list(cen["token"])
    assert list(got["n_occ"][: len(cen)]) == list(cen["n"])
    L = huffman_lengths([int(x) for x in got["n_occ"]])
    assert list(got["code_len"]) == L
