"""Deterministic tokenizer with char offsets (O7 analogue).

The reference uses jieba with a loaded user dictionary
(``pre_labeling.py:68, 88-96``), producing ``seg`` entries
``[word, pos_flag, [start, end]]`` with running char offsets.  jieba is
neither available nor deterministic enough here, so the engine tokenizes
with the gazetteer automaton + simple surface classes:

* gazetteer longest-match spans → one token tagged with the entity type;
* runs of digits/latin → one token tagged ``m``;
* punctuation chars → one ``x`` token each;
* any other maximal run between the above → one ``n`` token.

Offsets are [start, end) exclusive (engine-wide convention).  Tokens
partition the sentence exactly (property-tested).
"""

from __future__ import annotations

import re

from ..ontology import MEDICAL_GAZETTEER
from .ner import GazetteerMatcher

_NUM_RE = re.compile(r"[0-9A-Za-z]+")
_PUNCT = set(",，：:、【】[]-.。&*！=；;()（）？?!！ \t")

Token = list  # [word, tag, start, end] — mutable on purpose (merge rules)


class Tokenizer:
    """Stateful (automaton built once) — actor-pool friendly (M1).

    ``hmm_params`` (optional, from ``stages/segment.py:
    train_hmm_segmenter``) turns on jieba-HMM-style OOV segmentation:
    a non-entity CJK run is split into words by the BMES Viterbi decode
    instead of staying one fat ``n`` token.  Opt-in — the default
    tokenization (and every golden e2e artifact) is unchanged."""

    def __init__(self, gazetteer: dict[str, str] | None = None,
                 hmm_params: dict | None = None):
        self.matcher = GazetteerMatcher(gazetteer or MEDICAL_GAZETTEER)
        self.hmm = hmm_params

    def _emit_n(self, text: str, base: int, out: list[Token]) -> None:
        if self.hmm is None:
            out.append([text, "n", base, base + len(text)])
            return
        from .segment import viterbi_segment

        pos = base
        for w in viterbi_segment(self.hmm, text):
            out.append([w, "n", pos, pos + len(w)])
            pos += len(w)

    def _classify_run(self, text: str, base: int, out: list[Token]) -> None:
        """Split a non-entity run into m/x/n tokens."""
        i = 0
        n = len(text)
        while i < n:
            ch = text[i]
            if ch in _PUNCT:
                out.append([ch, "x", base + i, base + i + 1])
                i += 1
                continue
            m = _NUM_RE.match(text, i)
            if m:
                out.append([m.group(0), "m", base + m.start(), base + m.end()])
                i = m.end()
                continue
            j = i
            while j < n and text[j] not in _PUNCT and not _NUM_RE.match(text, j):
                j += 1
            self._emit_n(text[i:j], base + i, out)
            i = j

    def tokenize(self, sentence: str) -> list[Token]:
        out: list[Token] = []
        pos = 0
        for s, e, surf in self.matcher.find(sentence):
            if s > pos:
                self._classify_run(sentence[pos:s], pos, out)
            out.append([surf, self.matcher.types[surf], s, e])
            pos = e
        if pos < len(sentence):
            self._classify_run(sentence[pos:], pos, out)
        return out
