"""Deterministic canonical Huffman code-length assignment.

The information-theory census primitive behind compression-aware
storage planning (expected code length vs the entropy lower bound).
Reference analogue: none in the reference repo — this is one of the
beyond-reference analytics operators.

Determinism contract: symbols enter ranked (weight DESC, symbol ASC);
the merge heap orders by (weight, min-rank-in-subtree), so equal-weight
ties always merge the subtree containing the highest-frequency symbol
first — one unique tree at any input order, pinned by tests.
"""

from __future__ import annotations

import heapq


def huffman_lengths(weights: list[int]) -> list[int]:
    """Code length per symbol for positive integer ``weights`` (already
    in rank order: weight DESC expected but not required).  n=1 → [1]
    (a single symbol still needs one bit)."""
    n = len(weights)
    if n == 0:
        return []
    if n == 1:
        return [1]
    # heap items: (weight, min_rank, leaf_ranks) — merging collects leaves
    heap: list[tuple[int, int, list[int]]] = [
        (int(w), i, [i]) for i, w in enumerate(weights)
    ]
    heapq.heapify(heap)
    depth = [0] * n
    while len(heap) > 1:
        w1, r1, l1 = heapq.heappop(heap)
        w2, r2, l2 = heapq.heappop(heap)
        for i in l1 + l2:
            depth[i] += 1
        heapq.heappush(heap, (w1 + w2, min(r1, r2), l1 + l2))
    return depth


def huffman_total_cost(weights: list[int]) -> int:
    """Σ weight·code_len — the optimal prefix-code cost (any correct
    Huffman yields this; used as the algorithm-independent test pin)."""
    if len(weights) <= 1:
        return sum(weights) * 1 if weights else 0
    heap = [int(w) for w in weights]
    heapq.heapify(heap)
    cost = 0
    while len(heap) > 1:
        a, b = heapq.heappop(heap), heapq.heappop(heap)
        cost += a + b
        heapq.heappush(heap, a + b)
    return cost
