"""NER training-data path: BIO encode/export/parse + deterministic splits.

Reference analogues:

* **O10 BIO encoder** (``get_BI_word``, ``generation.py:64-98``): one char
  per line, ``char\\tB-TYPE`` / ``char\\tI-TYPE`` / ``char\\tO``, blank line
  between sentences.
* **S4 BIO writer** (``generation.py:433-460``): train/val/test files.
* **S5 BIO parser** (``multi_ner_prediction.py:329-355``): line-based,
  blank line = sentence boundary, tab-or-space split.
* **R6 split** (``generation.py:446-455``): the reference splits by
  positional index ``i%80==0`` → val, ``i%90==0`` → test — order-dependent
  and parallelism-hostile (SURVEY §4 Ordering).  This engine derives the
  split from a stable content hash of ``(url, sent_ord)`` with the same
  marginal rates (1/80 val, 1/90 test, rest train).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..functions.hashing import md5_int


def bio_encode(sentence: str, spans: list[tuple[int, int, str]]) -> str:
    """O10: sentence + [start, end) typed spans → char-per-line BIO block."""
    tags = ["O"] * len(sentence)
    for s, e, ety in spans:
        for i in range(s, min(e, len(sentence))):
            tags[i] = ("B-" if i == s else "I-") + ety
    return "\n".join(f"{ch}\t{tag}" for ch, tag in zip(sentence, tags))


def bio_decode(block: str) -> tuple[str, list[tuple[int, int, str]]]:
    """S5: one BIO block → (sentence, spans).  Tab or space separated;
    B- starts a span, I- extends, anything else closes."""
    chars: list[str] = []
    spans: list[tuple[int, int, str]] = []
    cur_start, cur_type = -1, None
    for line in block.splitlines():
        if not line.strip():
            continue
        parts = line.split("\t") if "\t" in line else line.rsplit(" ", 1)
        ch, tag = (parts[0], parts[1]) if len(parts) == 2 else (parts[0], "O")
        i = len(chars)
        chars.append(ch)
        if tag.startswith("B-"):
            if cur_type is not None:
                spans.append((cur_start, i, cur_type))
            cur_start, cur_type = i, tag[2:]
        elif tag.startswith("I-") and cur_type == tag[2:]:
            pass
        else:
            if cur_type is not None:
                spans.append((cur_start, i, cur_type))
            cur_start, cur_type = -1, None
    if cur_type is not None:
        spans.append((cur_start, len(chars), cur_type))
    return "".join(chars), spans


def split_of(url: str, sent_ord: int) -> str:
    """R6: content-stable train/val/test assignment (1/80 val, 1/90 test)."""
    h = md5_int(f"split|{url}|{sent_ord}", bits=32)
    if h % 80 == 0:
        return "val"
    if h % 90 == 0:
        return "test"
    return "train"


def bio_export_batch(batch: pa.Table) -> pa.Table:
    """Deduped mention batch → one BIO block row per sentence with its
    split assignment: (url, sent_ord, split, bio).  Dictionary + ensemble
    mentions define the spans (training labels), mirroring the reference's
    dict+model pre-labeling."""
    df = batch.to_pandas()
    rows = []
    for (url, ordn), grp in df.groupby(["url", "sent_ord"], sort=False):
        sentence = grp["sentence"].iloc[0]
        spans = [
            (int(r.start), int(r.end), r.ent_type)
            for r in grp.itertuples()
            if r.model in ("dictionary", "ensemble_strong")
        ]
        # earlier (longer-first) spans win on overlap: sort by start, -len
        spans.sort(key=lambda x: (x[0], -(x[1] - x[0])))
        taken: list[tuple[int, int, str]] = []
        occupied = [False] * len(sentence)
        for s, e, ety in spans:
            if any(occupied[s:e]):
                continue
            for i in range(s, min(e, len(sentence))):
                occupied[i] = True
            taken.append((s, e, ety))
        rows.append(
            (url, int(ordn), split_of(url, int(ordn)), bio_encode(sentence, taken))
        )
    out = pd.DataFrame(rows, columns=["url", "sent_ord", "split", "bio"])
    return pa.Table.from_pandas(out, preserve_index=False)


def write_bio_corpus(mentions_ds, out_dir: str) -> None:
    """S4: write split-partitioned BIO Parquet (url-keyed, resumable) —
    one directory per split so training jobs read only their slice."""
    encoded = mentions_ds.map_batches(
        bio_export_batch, batch_format="pyarrow"
    ).materialize()  # one execution; the BIO table is small vs its inputs
    for split in ("train", "val", "test"):
        part = encoded.filter(expr=f"split == '{split}'")
        part.write_parquet(f"{out_dir}/{split}")
