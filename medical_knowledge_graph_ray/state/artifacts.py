"""Broadcast sidecar artifacts: ensemble members, weights, eval matrix.

The reference loads ``model_weights.json`` (``{model: {etype: weight}}``)
and ``eval_dic.json`` (per-model per-type [strict, partial, exact, type]
precisions) and keeps 4-5 BiLSTM-CRF models resident
(``EnsemblePredict_all.py:436-462``).  Those model ``.pkl`` files are
missing from the snapshot (SURVEY §0 gaps), so the ensemble members here
are **deterministic gazetteer-perturbation scorers**: each member covers a
seeded subset of the gazetteer with seeded per-term confidences and (for
member "c") seeded boundary jitter — giving the voting logic real
variance while keeping an exact single-process oracle possible.

Everything is a pure function of (member name, term) via md5 — identical
on every worker at every parallelism, so these artifacts can be rebuilt in
each actor's ``__init__`` instead of being shipped; only the gazetteer
itself is passed (small dict, broadcast once via the actor constructor
arg, i.e. Ray serializes it into the actor definition a single time).
"""

from __future__ import annotations

from ..functions.hashing import stable_unit
from ..ontology import ESSENTIAL_TYPES

MODEL_NAMES: tuple[str, ...] = ("a", "b", "c")

# fraction of gazetteer terms each ensemble member recognizes
MODEL_COVERAGE: dict[str, float] = {"a": 0.92, "b": 0.82, "c": 0.72}

# member "c" shortens 1-in-5 of its term matches by one trailing char,
# exercising union-boundary voting and the partial/exact metric split
JITTER_MODEL = "c"

# dictionary (full-gazetteer) mentions join the mention table outside the
# vote, as in the reference's STEP2 dictionary re-match
# (clean_and_save.py:455-510); fixed calibrated probs:
DICT_PROBS: tuple[float, float, float, float] = (0.95, 0.97, 0.96, 0.97)

METRICS = ("strict", "partial", "exact", "type")


def member_covers(model: str, term: str) -> bool:
    """Does ensemble member ``model`` recognize ``term``? (deterministic)"""
    return stable_unit("cov", model, term) < MODEL_COVERAGE[model]


def member_prob(model: str, term: str) -> float:
    """Per-(member, term) char confidence in [0.60, 0.99)."""
    return 0.60 + 0.39 * stable_unit("prob", model, term)


def member_jitter(model: str, term: str) -> int:
    """Chars to trim from the match end (0 or 1) for this member/term."""
    if model == JITTER_MODEL and len(term) > 2:
        return 1 if stable_unit("jit", model, term) < 0.2 else 0
    return 0


def eval_matrix() -> dict[str, dict[str, list[float]]]:
    """{model: {etype: [strict, partial, exact, type] precision}} in
    [0.70, 0.98) — the analogue of ``eval_dic.json``
    (``multi_ner_prediction.py:595-606``)."""
    return {
        m: {
            t: [0.70 + 0.28 * stable_unit("eval", m, t, k) for k in METRICS]
            for t in ESSENTIAL_TYPES
        }
        for m in MODEL_NAMES
    }


def model_weights(ev: dict[str, dict[str, list[float]]] | None = None) -> dict[str, dict[str, float]]:
    """Per-type strict-precision-normalized vote weights (A4 semantics,
    ``multi_ner_prediction.py:139-159``): w_m(t) = strict_m(t) / Σ_m strict_m(t)."""
    ev = ev or eval_matrix()
    out: dict[str, dict[str, float]] = {m: {} for m in MODEL_NAMES}
    for t in ESSENTIAL_TYPES:
        total = sum(ev[m][t][0] for m in MODEL_NAMES)
        for m in MODEL_NAMES:
            out[m][t] = ev[m][t][0] / total
    return out
