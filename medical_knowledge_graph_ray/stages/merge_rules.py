"""Entity-merge rule family E1-E7 — the reference's signature transforms.

Pure per-sentence span-list rewrites (SURVEY §2.9); all sentence-local, no
shuffle.  Semantics follow the shipped ``clean_and_save.py`` variants:

* **E1 words_combiner** (``clean_and_save.py:65-111``): for each tag
  pattern, find the FIRST occurrence as a contiguous subsequence of seg
  tags; concatenate the words; veto if len ≥ 12 or the surface contains
  、 , : or is not a substring of the sentence; replace the covered tokens
  with one token tagged by the pattern's last element.
* **E2 words_combiner_fuzzy** (``:177-235``): auto-generate patterns
  ``[pt, center]`` and ``[pt, t, center]`` for every non-excluded middle
  tag, then E1.
* **E3 suffix_combiner** (``:266-296``): token tagged in ``desiredlist``
  followed by a token whose WORD is in the suffix lexicon → merge the pair
  with the suffix's target type.
* **E4 merge_nerseg** (``:113-174``): fold ensemble NER spans into seg —
  skip spans containing 、；，;, skip if an identical boundary exists, and
  if a span of len > 2 aligns with token start/end boundaries replace the
  covered tokens (same single-token boundary with different type → the
  dictionary wins and the span is discarded).
* **E5 round_1 / round_2** (``:237-262``): the exact fixed composition of
  fuzzy, combiner and suffix passes.

Two deliberate divergences from the reference, both documented:
1. the reference computes the merged span's start as the END of the
   PREVIOUS token (``start = seg[pos-1][2][1]``), which wraps around at
   pos 0 and drifts when tokens were deleted; this engine uses the start
   of the first merged token (offsets always partition the sentence —
   property-tested);
2. the reference's 3-token merge deletes ``pos+1`` twice (the second
   ``del`` always raises and is swallowed, ``clean_and_save.py:96-103``),
   leaving a stale trailing token; this engine removes every covered
   token.
"""

from __future__ import annotations

from ..ontology import (
    ALL_TAGS,
    ESSENTIAL_TYPES,
    EXL_TAGS,
    SUFFIX_DICT,
)
from .tokenize import Token

_VETO_CHARS = ("、", ",", ":")
MAX_MERGED_LEN = 12

# single-char tag alphabet for C-speed subsequence search
_TAG_CHAR = {t: chr(ord("A") + i) for i, t in enumerate(ALL_TAGS)}


def _tag_string(seg: list[Token]) -> str:
    return "".join(_TAG_CHAR.get(t[1], "z") for t in seg)


def _veto(combined: str, sentence: str) -> bool:
    return (
        len(combined) >= MAX_MERGED_LEN
        or any(c in combined for c in _VETO_CHARS)
        or combined not in sentence
    )


def _encode(patterns: list[list[str]]) -> tuple:
    """Pre-encode tag patterns to ((tag_char_string, result_tag)…, plus
    the pass-level first/last char sets for whole-pass skipping)."""
    enc = [
        ("".join(_TAG_CHAR.get(t, "z") for t in p), p[-1]) for p in patterns
    ]
    firsts = frozenset(pat[0] for pat, _ in enc)
    lasts = frozenset(pat[-1] for pat, _ in enc)
    return (enc, firsts, lasts)


def _combine_encoded(
    seg: list[Token], sentence: str, encoded: tuple
) -> list[Token]:
    """E1 core over pre-encoded patterns; the tag string is rebuilt only
    after a successful merge.  Whole passes are skipped with two set
    intersections when none of their start/end tags occur at all;
    individual patterns with two set probes (~60 patterns/pass, most
    impossible)."""
    enc, firsts, lasts = encoded
    tags = _tag_string(seg)
    present = set(tags)
    if present.isdisjoint(firsts) or present.isdisjoint(lasts):
        return seg
    for pat, result_tag in enc:
        if pat[0] not in present or pat[-1] not in present:
            continue
        pos = tags.find(pat)
        if pos < 0:
            continue
        covered = seg[pos : pos + len(pat)]
        combined = "".join(t[0] for t in covered)
        if _veto(combined, sentence):
            continue
        start = covered[0][2]
        seg[pos : pos + len(pat)] = [
            [combined, result_tag, start, start + len(combined)]
        ]
        tags = _tag_string(seg)
        present = set(tags)
    return seg


def words_combiner(seg: list[Token], sentence: str, patterns: list[list[str]]) -> list[Token]:
    """E1: first-occurrence pattern merges, fixed pattern order."""
    return _combine_encoded(seg, sentence, _encode(patterns))


def fuzzy_patterns(pre_types: list[str], centertype: str) -> list[list[str]]:
    """E2 pattern generator (mirrors clean_and_save.py:179-186)."""
    out = []
    for pt in pre_types:
        out.append([pt, centertype])
        for t in ALL_TAGS:
            if t in EXL_TAGS:
                continue
            out.append([pt, t, centertype])
    return out


def words_combiner_fuzzy(
    seg: list[Token], sentence: str, pre_types: list[str], centertype: str
) -> list[Token]:
    return words_combiner(seg, sentence, fuzzy_patterns(pre_types, centertype))


def suffix_combiner(
    seg: list[Token],
    sentence: str,
    suffix_words: set[str],
    desiredlist: tuple[str, ...],
    suffixtype: str,
) -> list[Token]:
    """E3: left-to-right scan; entity token + suffix word → merged token."""
    out: list[Token] = []
    i = 0
    while i < len(seg):
        if (
            i + 1 < len(seg)
            and seg[i][1] in desiredlist
            and seg[i + 1][0] in suffix_words
        ):
            combined = seg[i][0] + seg[i + 1][0]
            if not _veto(combined, sentence):
                start = seg[i][2]
                out.append([combined, suffixtype, start, start + len(combined)])
                i += 2
                continue
        out.append(seg[i])
        i += 1
    return out


def merge_nerseg(
    seg: list[Token], ensemble: list[tuple[str, str, int, int]]
) -> list[Token]:
    """E4: fold ensemble spans (surface, type, start, end) into seg."""
    for surf, ety, ner_s, ner_e in ensemble:
        if ety not in ESSENTIAL_TYPES:
            continue
        if any(c in surf for c in ("、", "；", "，", ";")):
            continue
        bounds = [(t[2], t[3]) for t in seg if t[1] in ESSENTIAL_TYPES]
        if (ner_s, ner_e) in bounds:
            continue
        if len(surf) <= 2:
            continue
        seg0 = [t[2] for t in seg]
        seg1 = [t[3] for t in seg]
        if ner_s in seg0 and ner_e in seg1:
            m0 = seg0.index(ner_s)
            m1 = seg1.index(ner_e)
            if m0 == m1:
                continue  # same token, different type: dictionary wins
            seg[m0 : m1 + 1] = [[surf, ety, ner_s, ner_e]]
    return seg


_SUFFIX_BY_TYPE: dict[str, set[str]] = {}
for _w, _t in SUFFIX_DICT.items():
    _SUFFIX_BY_TYPE.setdefault(_t, set()).add(_w)
ALL_SUFFIX_WORDS: frozenset[str] = frozenset(SUFFIX_DICT)


# pre-encoded fixed pass sequences (round_1: 5 fuzzy + 2 combiner;
# round_2: 5 suffix + 1 combiner + 2 fuzzy) — built once at import
_R1_PASSES: list[list[tuple[str, str]]] = [
    _encode(fuzzy_patterns(["SYM", "ORG", "DIS", "BFL", "OGN"], "DIS")),
    _encode(fuzzy_patterns(["SYM", "ORG", "DIS", "BFL", "OGN"], "SYM")),
    _encode(fuzzy_patterns(["SYM", "ORG", "DIS", "OBJ", "DRU"], "SUR")),
    _encode(fuzzy_patterns(["ORG", "DIS", "BFL"], "TES")),
    _encode(fuzzy_patterns(["ORG", "DRU", "OBJ"], "EQM")),
    _encode([["SUR", "DRU"], ["ORG", "SUR"], ["DIS", "SUR"], ["TES", "SUR"]]),
    _encode([["SUR", "SUR"], ["ORG", "SUR"], ["DIS", "SUR"], ["TES", "SUR"]]),
]

_R2_COMBINER = _encode([["SUR", "SUR"], ["ORG", "SUR"], ["DIS", "SUR"]])
_R2_FUZZY = [
    _encode(fuzzy_patterns(["ORG", "DIS", "DRU", "OBJ", "BFL"], "TES")),
    _encode(fuzzy_patterns(["SYM", "ORG", "DIS", "OBJ", "DRU"], "SUR")),
]


def round_1(seg: list[Token], sentence: str) -> list[Token]:
    """E5 (clean_and_save.py:237-247): 5 fuzzy passes + 2 combiner passes."""
    for encoded in _R1_PASSES:
        seg = _combine_encoded(seg, sentence, encoded)
    return seg


def round_2(seg: list[Token], sentence: str) -> list[Token]:
    """E5 (clean_and_save.py:249-262): 5 suffix passes + 1 combiner + 2 fuzzy."""
    seg = suffix_combiner(seg, sentence, _SUFFIX_BY_TYPE.get("SYM", set()),
                          ("DIS", "SYM", "BFL", "ORG"), "SYM")
    seg = suffix_combiner(seg, sentence, _SUFFIX_BY_TYPE.get("DIS", set()),
                          ("DIS", "SYM", "BFL", "ORG"), "DIS")
    seg = suffix_combiner(seg, sentence, _SUFFIX_BY_TYPE.get("EQM", set()),
                          ("SUR", "TES", "BFL", "EQM"), "EQM")
    seg = suffix_combiner(seg, sentence, _SUFFIX_BY_TYPE.get("TES", set()),
                          ("SUR", "TES", "ORG", "DIS", "SYM", "BFL"), "TES")
    seg = suffix_combiner(seg, sentence, _SUFFIX_BY_TYPE.get("SUR", set()),
                          ("SUR", "TES", "ORG", "DIS", "SYM", "BFL"), "SUR")
    seg = _combine_encoded(seg, sentence, _R2_COMBINER)
    for encoded in _R2_FUZZY:
        seg = _combine_encoded(seg, sentence, encoded)
    return seg


def rules_applicable(seg: list[Token]) -> bool:
    """Cheap prefilter: every E1/E2 pattern needs two essential-type tags
    within distance ≤ 2; E3 needs an essential tag directly followed by a
    suffix word.  A sentence failing both can fire no rule at all."""
    ent_pos = [i for i, t in enumerate(seg) if t[1] in ESSENTIAL_TYPES]
    for a, b in zip(ent_pos, ent_pos[1:]):
        if b - a <= 2:
            return True
    for i in ent_pos:
        if i + 1 < len(seg) and seg[i + 1][0] in ALL_SUFFIX_WORDS:
            return True
    return False


def apply_rounds(
    seg: list[Token],
    sentence: str,
    ensemble: list[tuple[str, str, int, int]],
) -> list[Token]:
    """E4 then round_1 + round_2 (the full STEP4/5 sequence)."""
    seg = merge_nerseg(seg, ensemble)
    if not rules_applicable(seg):
        return seg
    seg = round_1(seg, sentence)
    seg = round_2(seg, sentence)
    return seg
