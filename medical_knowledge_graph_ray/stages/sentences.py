"""Document → sentence-record explosion.

Mirrors the reference's sentence unit of work (``pre_labeling.py:4-16``):
each sentence row carries its *head entity* (``entity1`` — what the page is
about) and its *paragraph* (the section/relation key).  Splitting follows
the reference's O6 splitter — ``re.split('[。?？!！\\t ;；]', p)`` with the
clinical/manual ``;；`` extension — and drops fragments of length ≤ 3
(``pre_labeling.py:84-87``).

The reference's global enumeration counter ``ind`` (``generation.py:
293-294``) is replaced by the content-stable key ``(url, sent_ord)`` so
results are identical at any parallelism (SURVEY §4 Ordering).

Stateless flat-map: one Arrow batch of page rows in → more sentence rows
out.  ``head_type`` is assigned per the reference's head-entity typing O17
(``EnsemblePredict_all.py:397-414``) via the broadcast gazetteer.
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..ontology import MEDICAL_GAZETTEER

# O6 splitter, zh flavor: sentence terminators + tab/space + semicolons.
_SENT_SPLIT_RE = re.compile(r"[。?？!！\t ;；]")
_HEADING_RE = re.compile(r"^【(.+)】$")

# -- O2 title-extractor cascade (get_disease2 structurize_files.py:39-67;
# get_treatment2 :302-326) ----------------------------------------------------
_CHAPTER_RE = re.compile(r"^第.{1,3}部分|^第.{1,3}章.*|^第.{1,3}节|^第.{1,3}篇.*")
_CN_NUMS = "一二三四五六七八九十"
_ENUM_DUN_RE = re.compile(".*[" + _CN_NUMS + "]、")
_ENUM_PAREN_RE = re.compile(".*[" + _CN_NUMS + r"][)）]")

# exclusion-list veto (the reference's `exclusions`, applied at the end of
# both extractors): structural headings that are never head entities
HEAD_EXCLUSIONS: frozenset[str] = frozenset(
    {"概述", "前言", "目录", "附录", "参考文献", "诊疗流程"}
)

# dictionary-scan fallback list, longest-first so embedded shorter surfaces
# can't shadow the full entity (the reference iterates its length-desc
# sorted `dis` list, utils.py:61-62)
_HEAD_SCAN: tuple[str, ...] = tuple(
    sorted(MEDICAL_GAZETTEER, key=lambda t: (-len(t), t))
)


def extract_head(title: str) -> str | None:
    """Title line → head entity via the reference's regex cascade:

    1. chapter heading ``第…篇/章/节/部分`` → text after the marker;
    2. ``一、``-style enumeration → text after the first ``、``;
    3. ``一)``-style enumeration → text after the first ``)``;
    4. fallback: first gazetteer surface (longest-first) contained in the
       title;
    then the exclusion-list veto.  ``None`` when nothing survives."""
    head: str | None = None
    if _CHAPTER_RE.match(title):
        for marker in ("篇", "章", "节", "部分"):
            if marker in title:
                head = title.split(marker, 1)[1].strip()
                break
    elif _ENUM_DUN_RE.match(title):
        head = title.split("、", 1)[1].strip()
    elif _ENUM_PAREN_RE.match(title):
        head = re.split(r"[)）]", title, maxsplit=1)[1].strip()
    else:
        for term in _HEAD_SCAN:
            if term in title:
                head = term
                break
    if head in HEAD_EXCLUSIONS:
        return None
    return head or None

MIN_SENT_LEN = 4  # keep len >= 4, i.e. drop len <= 3 fragments

SENTENCE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("sent_ord", pa.int32()),
        ("sentence", pa.string()),
        ("head_entity", pa.string()),
        ("head_type", pa.string()),
        ("paragraph", pa.string()),
    ]
)


def split_document(text: str) -> list[tuple[str, str, str, str]]:
    """One extracted document → [(sentence, head, head_type, paragraph)].

    Line 1 is the title/head entity; ``【…】`` lines switch the active
    paragraph; all other lines are sentence-split.
    """
    lines = text.split("\n")
    if not lines:
        return []
    title = lines[0].strip()
    # O2 cascade; a page must have SOME head in this per-page data model,
    # so a title the cascade rejects (or vetoes) falls back to the raw
    # line — the reference's book model instead just doesn't open a new
    # section (change(), structurize_files.py:69-79), a luxury a
    # page-per-row pipeline doesn't have (documented divergence)
    head = extract_head(title) or title
    head_type = MEDICAL_GAZETTEER.get(head, "DIS")
    paragraph = "clinical"  # default section, overwritten by first heading
    out: list[tuple[str, str, str, str]] = []
    for line in lines[1:]:
        m = _HEADING_RE.match(line.strip())
        if m:
            paragraph = m.group(1)
            continue
        for frag in _SENT_SPLIT_RE.split(line):
            frag = frag.strip()
            if len(frag) < MIN_SENT_LEN:
                continue
            out.append((frag, head, head_type, paragraph))
    return out


def split_batch(batch: pa.Table) -> pa.Table:
    """Arrow page batch (url, text) → sentence-record batch (explode)."""
    urls = batch.column("url").to_pylist()
    texts = batch.column("text").to_pylist()
    o_url, o_ord, o_sent, o_head, o_htype, o_par = [], [], [], [], [], []
    for url, text in zip(urls, texts):
        for ord_, (sent, head, htype, par) in enumerate(split_document(text or "")):
            o_url.append(url)
            o_ord.append(ord_)
            o_sent.append(sent)
            o_head.append(head)
            o_htype.append(htype)
            o_par.append(par)
    return pa.table(
        {
            "url": pa.array(o_url, pa.string()),
            "sent_ord": pa.array(o_ord, pa.int32()),
            "sentence": pa.array(o_sent, pa.string()),
            "head_entity": pa.array(o_head, pa.string()),
            "head_type": pa.array(o_htype, pa.string()),
            "paragraph": pa.array(o_par, pa.string()),
        },
        schema=SENTENCE_SCHEMA,
    )
