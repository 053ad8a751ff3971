"""HTML → text extraction (trafilatura-style, dependency-free).

Per-row invariant (BASELINE.json input_hint): **byte-identical extracted
text per url** versus the corpus ground-truth ``text`` column.

Extraction contract (documented, deterministic):

* drop subtrees of ``script / style / nav / footer / aside / noscript``;
* emit the text content of content-bearing elements ``h1..h6, p, li``
  in document order, inner markup stripped, HTML entities unescaped;
* join blocks with a single ``\\n``.

This replaces the reference's OCR-line section cutter (the analogue of
``structurize_files.py:546-597``: raw lines → title + section blocks); here
headings survive as their own blocks (``【relation】`` lines) which the
sentence stage consumes as section markers.

Stateless ``map_batches`` stage — compiled regexes at module import, Arrow
in / Arrow out, no Python-object rows.
"""

from __future__ import annotations

import html as _html
import re

import pyarrow as pa

# subtree killers (non-greedy, DOTALL); boilerplate containers
_DROP_RE = re.compile(
    rb"<(script|style|nav|footer|aside|noscript)\b.*?</\1\s*>",
    re.DOTALL | re.IGNORECASE,
)
# content-bearing blocks, document order
_BLOCK_RE = re.compile(
    rb"<(h[1-6]|p|li)\b[^>]*>(.*?)</\1\s*>",
    re.DOTALL | re.IGNORECASE,
)
_TAG_RE = re.compile(rb"<[^>]+>")


def extract_html(raw: bytes) -> str:
    """Extract display text from one HTML byte string (pure function)."""
    cleaned = _DROP_RE.sub(b"", raw)
    blocks = []
    for _tag, body in _BLOCK_RE.findall(cleaned):
        body = _TAG_RE.sub(b"", body)
        blocks.append(_html.unescape(body.decode("utf-8", errors="replace")))
    return "\n".join(blocks)


def extract_text_batch(
    batch: pa.Table, *, html_col: str = "html", out_col: str = "text"
) -> pa.Table:
    """Arrow batch transform: add/replace ``out_col`` with extracted text.

    Keeps all other columns; drops the heavy ``html`` column afterwards is
    the caller's choice (the flagship pipeline selects it away immediately
    so HTML bytes never travel past this stage).
    """
    htmls = batch.column(html_col)
    texts = pa.array(
        [extract_html(h) if h is not None else "" for h in htmls.to_pylist()],
        pa.large_string(),
    )
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    return batch.append_column(out_col, texts)
