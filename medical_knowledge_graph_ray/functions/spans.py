"""Char-level tag-sequence ↔ span utilities.

The reference round-trips entities between span lists and per-char BIO tag
sequences constantly (O11 ``predict_processing``, O12 ``get_positions`` at
``EnsemblePredict_all.py:162-222``, O13 ``post_processing``).  Two
conventions coexist there — inclusive span ends in ``EnsemblePredict_all``
vs exclusive in ``multi_ner_prediction`` (SURVEY §7.4 off-by-one
minefield).  This engine fixes **[start, end) exclusive** everywhere.

A key reference behavior preserved here: the union ensemble stores only the
entity *type* per char and re-BIOs with ``post_processing`` (adjacent
same-type entities merge into one span).  ``runs()`` implements exactly
that per-char-type → merged-run decode.
"""

from __future__ import annotations

import numpy as np

__all__ = ["runs", "fill_spans"]


def runs(type_ids: np.ndarray) -> list[tuple[int, int, int]]:
    """Decode contiguous non-zero runs of equal value → [(start, end, tid)].

    Semantics match ``get_positions`` applied after ``post_processing``
    (``EnsemblePredict_all.py:98-109, 162-222``): adjacent chars with the
    same type belong to one entity; 0 means O.
    """
    n = len(type_ids)
    if n == 0:
        return []
    boundaries = np.flatnonzero(np.diff(type_ids) != 0) + 1
    starts = np.concatenate(([0], boundaries))
    ends = np.concatenate((boundaries, [n]))
    out = []
    for s, e in zip(starts.tolist(), ends.tolist()):
        tid = int(type_ids[s])
        if tid != 0:
            out.append((s, e, tid))
    return out


def fill_spans(
    length: int,
    spans: list[tuple[int, int, int, float]],
    base_prob: float = 0.5,
) -> tuple[np.ndarray, np.ndarray]:
    """Span list [(start, end, tid, prob)] → (type_id array, char-prob array).

    Inverse of :func:`runs`; the char-prob array is the analogue of the
    reference's per-char CRF ``path_probs`` (``multi_source_ner.py:803-844``
    output contract) with ``base_prob`` on O chars.
    """
    tids = np.zeros(length, dtype=np.int16)
    probs = np.full(length, base_prob, dtype=np.float64)
    for s, e, tid, p in spans:
        tids[s:e] = tid
        probs[s:e] = p
    return tids, probs
