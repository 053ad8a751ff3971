"""Ensemble NER stage: multi-member scoring + union-then-vote merging.

Re-expresses the reference's full-corpus ensemble labeling
(``EnsemblePredict_all.py``) as ONE Ray Data actor-pool stage: all ensemble
members are resident in a single actor (the reference holds 4-5 models in
one process, ``EnsemblePredict_all.py:436-441``), each sentence batch visits
one actor, and the actor emits exploded mention rows.

Semantics mirrored (see SURVEY §2.10):

* **union ensemble (V2)** — start from member "a"'s per-char labels; fill O
  chars with any other member's label; char prob = max
  (``EnsemblePredict_all.py:290-315``);
* **union+vote / ensemble_strong (V3, the shipped strategy)** — decode the
  union into spans (adjacent same-type chars merge, ``post_processing``
  semantics); a member *supports* a span if any of its non-O chars falls
  inside the span boundaries (``get_word_ind``, ``:155-160, 344-352``);
  keep spans supported by ≥ 2 distinct members (``:358-360``);
* **confidence calibration (V4/A7)** — entity char-prob mean ``x3`` times
  ``max(prec) + (1 - max(prec)) · k / (2·M)`` over the k supporting
  members' eval-matrix precisions (``:526-552``); single-member mentions
  use ``x3 · precision`` (``:523-526``);
* **dictionary mentions** — the full-gazetteer longest-match pass of STEP2
  (``clean_and_save.py:455-510``) emits rows under model "dictionary" with
  fixed calibrated probs.

The per-(url, sent_ord) mention set is emitted complete within one batch —
downstream max-prob dedup (D2) is therefore batch-local and needs **no
shuffle** (partitioning assumption documented in ``triples.py``).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..functions.spans import fill_spans, runs
from ..ontology import ESSENTIAL_TYPES, MEDICAL_GAZETTEER
from ..state.artifacts import (
    DICT_PROBS,
    MODEL_NAMES,
    eval_matrix,
    member_covers,
    member_jitter,
    member_prob,
)

TYPE_LIST: tuple[str, ...] = tuple(ESSENTIAL_TYPES)
_TID: dict[str, int] = {t: i + 1 for i, t in enumerate(TYPE_LIST)}

BASE_CHAR_PROB = 0.5  # O-char path prob analogue

MENTION_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("sent_ord", pa.int32()),
        ("sentence", pa.string()),
        ("head_entity", pa.string()),
        ("head_type", pa.string()),
        ("paragraph", pa.string()),
        ("model", pa.string()),
        ("ent_name", pa.string()),
        ("ent_type", pa.string()),
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("prob_strict", pa.float64()),
        ("prob_partial", pa.float64()),
        ("prob_exact", pa.float64()),
        ("prob_type", pa.float64()),
        ("n_models", pa.int8()),
    ]
)


class GazetteerMatcher:
    """Longest-match-first, non-overlapping surface matcher.

    Equivalent to the reference's length-desc-sorted dictionary scan
    (``utils.py:61-62`` longest-match preference) but executed by the C
    regex engine: alternation ordered longest-first makes ``finditer``
    prefer the longest surface at each position.
    """

    def __init__(self, terms: dict[str, str]):
        self.types = dict(terms)
        ordered = sorted(terms, key=lambda t: (-len(t), t))
        self._re = re.compile("|".join(re.escape(t) for t in ordered)) if ordered else None

    def find(self, sentence: str) -> list[tuple[int, int, str]]:
        """[(start, end, surface)] — [start, end) exclusive offsets."""
        if self._re is None:
            return []
        return [(m.start(), m.end(), m.group(0)) for m in self._re.finditer(sentence)]


class _Member:
    """One deterministic ensemble member (stand-in for a BiLSTM-CRF model;
    output contract mirrors ``multi_source_ner.py:803-844``: spans with
    per-char probabilities)."""

    def __init__(self, name: str, gazetteer: dict[str, str]):
        self.name = name
        covered = {t: ty for t, ty in gazetteer.items() if member_covers(name, t)}
        self.matcher = GazetteerMatcher(covered)
        self.prob = {t: member_prob(name, t) for t in covered}
        self.jitter = {t: member_jitter(name, t) for t in covered}

    def spans(self, sentence: str) -> list[tuple[int, int, int, float]]:
        """[(start, end, type_id, char_prob)]"""
        out = []
        for s, e, surf in self.matcher.find(sentence):
            e -= self.jitter[surf]
            tid = _TID[self.matcher.types[surf]]
            out.append((s, e, tid, self.prob[surf]))
        return out


class EnsembleNER:
    """Actor-pool ``map_batches`` stage: sentence rows → mention rows.

    All members + the full dictionary + the eval matrix are built once per
    actor in ``__init__`` (M2/M3/M4 state, SURVEY §2.3); ``__call__`` does
    per-batch work only.
    """

    def __init__(self, gazetteer: dict[str, str] | None = None):
        gaz = gazetteer or MEDICAL_GAZETTEER
        self.members = [_Member(m, gaz) for m in MODEL_NAMES]
        self.dictionary = GazetteerMatcher(gaz)
        self.eval = eval_matrix()
        self.num_models = len(self.members)

    # -- per-sentence ensemble ------------------------------------------------
    def _sentence_mentions(
        self, sentence: str
    ) -> list[tuple[str, str, str, int, int, float, float, float, float, int]]:
        """[(model, ent_name, ent_type, start, end, p_strict, p_partial,
        p_exact, p_type, n_models)]"""
        L = len(sentence)
        out = []
        member_spans = {m.name: m.spans(sentence) for m in self.members}
        member_tids: dict[str, np.ndarray] = {}
        prob_combined = np.full(L, BASE_CHAR_PROB, dtype=np.float64)

        # single-member mentions + char arrays
        for m in self.members:
            spans = member_spans[m.name]
            tids, probs = fill_spans(L, spans, BASE_CHAR_PROB)
            member_tids[m.name] = tids
            nz = tids != 0
            np.maximum(prob_combined, np.where(nz, probs, 0.0), out=prob_combined)
            ev = self.eval[m.name]
            for s, e, tid, p in spans:
                ety = TYPE_LIST[tid - 1]
                pr = ev[ety]
                out.append(
                    (m.name, sentence[s:e], ety, s, e,
                     p * pr[0], p * pr[1], p * pr[2], p * pr[3], 1)
                )

        # union (V2): member "a" base, fill O chars from the others
        union = member_tids["a"].copy()
        for m in self.members[1:]:
            fill = (union == 0) & (member_tids[m.name] != 0)
            union[fill] = member_tids[m.name][fill]

        # strong (V3): decode union runs, count distinct supporting members
        for s, e, tid in runs(union):
            support = [
                m.name
                for m in self.members
                if bool((member_tids[m.name][s:e] != 0).any())
            ]
            k = len(support)
            if k < 2:
                continue
            ety = TYPE_LIST[tid - 1]
            x3 = float(prob_combined[s:e].mean())
            ps = []
            for mi in range(4):
                c = [self.eval[m][ety][mi] for m in support]
                cmax = max(c)
                ps.append(x3 * (cmax + (1.0 - cmax) * k / (2 * self.num_models)))
            out.append(("ensemble_strong", sentence[s:e], ety, s, e, *ps, k))

        # dictionary pass (STEP2 analogue)
        for s, e, surf in self.dictionary.find(sentence):
            out.append(
                ("dictionary", surf, self.dictionary.types[surf], s, e,
                 *DICT_PROBS, 1)
            )
        return out

    # -- per-batch ------------------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        sents = batch.column("sentence").to_pylist()
        carry = {
            name: batch.column(name).to_pylist()
            for name in ("url", "sent_ord", "head_entity", "head_type", "paragraph")
        }
        cols: dict[str, list] = {name: [] for name in MENTION_SCHEMA.names}
        for i, sentence in enumerate(sents):
            for (model, ent, ety, s, e, p1, p2, p3, p4, k) in self._sentence_mentions(
                sentence
            ):
                cols["url"].append(carry["url"][i])
                cols["sent_ord"].append(carry["sent_ord"][i])
                cols["sentence"].append(sentence)
                cols["head_entity"].append(carry["head_entity"][i])
                cols["head_type"].append(carry["head_type"][i])
                cols["paragraph"].append(carry["paragraph"][i])
                cols["model"].append(model)
                cols["ent_name"].append(ent)
                cols["ent_type"].append(ety)
                cols["start"].append(s)
                cols["end"].append(e)
                cols["prob_strict"].append(p1)
                cols["prob_partial"].append(p2)
                cols["prob_exact"].append(p3)
                cols["prob_type"].append(p4)
                cols["n_models"].append(k)
        return pa.table(cols, schema=MENTION_SCHEMA)
