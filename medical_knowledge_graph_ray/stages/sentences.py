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
    head = lines[0].strip()
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
