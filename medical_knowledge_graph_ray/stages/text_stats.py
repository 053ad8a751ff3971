"""Text-analysis operators over a document table: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

These are the large-scale training-data-pipeline operators the engine adds
beyond the reference's own set (driver brief), expressed as vectorized
``map_batches`` transforms.  Tokenization is single-space split (matching
``string_split(text, ' ')`` in the DuckDB oracle); all derived doubles come
from a single division of exactly-computed integers so Ray and SQL agree
bit-for-bit.

Reference analogues: prefix/suffix histograms + census (A2/A3,
``utils.py:108-116``), sentence-length gating (``pre_labeling.py:86-87``).
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
import pyarrow as pa

from ..ontology import EN_STOPWORDS

LANG_STOPWORD_THRESHOLD = 0.05


def doc_stats_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """documents batch → (doc_id, n_tokens, n_chars_actual, n_stopwords,
    stopword_ratio, avg_token_len).  Vectorized pandas str ops."""
    text = batch["text"].astype(str)
    tokens = text.str.split(" ")
    n_tokens = tokens.str.len().astype("int64")
    n_chars = text.str.len().astype("int64")
    n_stop = tokens.map(lambda ts: sum(t in EN_STOPWORDS for t in ts)).astype("int64")
    # single-space-joined text: sum(len(tok)) == n_chars - (n_tokens - 1)
    sum_tok_len = n_chars - (n_tokens - 1)
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": n_tokens,
            "n_chars_actual": n_chars,
            "n_stopwords": n_stop,
            "stopword_ratio": n_stop / n_tokens,
            "avg_token_len": sum_tok_len / n_tokens,
        }
    )


def lang_id_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Stopword-ratio language heuristic: 'en' iff the English-stopword
    token share ≥ threshold (documented, SQL-expressible contract)."""
    stats = doc_stats_batch(batch)
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "lang_declared": batch["lang"],
            "stopword_ratio": stats["stopword_ratio"],
            "lang_pred": (stats["stopword_ratio"] >= LANG_STOPWORD_THRESHOLD).map(
                {True: "en", False: "other"}
            ),
        }
    )


def fingerprint_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """md5 content fingerprint per document (exact-dedup key; the md5 is
    the cross-engine-stable replacement for Python's salted hash)."""
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "fp": [
                hashlib.md5(t.encode("utf-8")).hexdigest()
                for t in batch["text"].astype(str)
            ],
        }
    )


def quality_score_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Composite quality score in [0,1]: rewards mid-length docs and real
    word diversity (training-data filtering heuristic).

    score = min(n_tokens, 200)/200 * distinct_token_ratio
    """
    text = batch["text"].astype(str)
    tokens = text.str.split(" ")
    n_tokens = tokens.str.len().astype("int64")
    n_distinct = tokens.map(lambda ts: len(set(ts))).astype("int64")
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": n_tokens,
            "n_distinct": n_distinct,
            "quality": n_tokens.clip(upper=200) / 200 * (n_distinct / n_tokens),
        }
    )


# GPT-2-style pre-tokenizer, ASCII form: contraction suffixes, letter
# runs, digit runs, non-alnum punctuation runs — each optionally
# preceded by one space.  Both Python `re` and DuckDB's RE2 use
# leftmost-first alternation, so match COUNTS agree between the engine
# and the SQL oracle.  (The real GPT-2 regex uses \p{L}/\p{N}; the
# ASCII classes are the portable form both engines share.)
BPE_TOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+"
)


def bpe_token_count_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """documents batch → (doc_id, n_ws_tokens, n_bpe_tokens): whitespace
    token count next to the BPE-ish pre-tokenizer match count — the
    LM-budget estimator (subword counts track compute/context cost far
    better than whitespace counts).  ``str.count`` runs the compiled
    regex at C level; no per-row Python."""
    text = batch["text"].astype(str)
    return pd.DataFrame(
        {
            "doc_id": pd.array(batch["doc_id"].to_numpy(), "int64"),
            "n_ws_tokens": text.str.split(" ").str.len().astype("int64"),
            "n_bpe_tokens": text.str.count(BPE_TOKEN_PATTERN).astype("int64"),
        }
    )


def token_explode_batch(batch: pd.DataFrame) -> pa.Table:
    """Explode documents into (doc_id, pos, token) rows — the base for
    token-frequency aggregates (A5 distinct-surface analogue)."""
    doc_ids, poss, toks = [], [], []
    for did, text in zip(batch["doc_id"], batch["text"].astype(str)):
        for i, t in enumerate(text.split(" ")):
            doc_ids.append(did)
            poss.append(i)
            toks.append(t)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "pos": pa.array(poss, pa.int32()),
            "token": pa.array(toks, pa.string()),
        }
    )


def compress_ratio_batch(b: "pd.DataFrame") -> "pd.DataFrame":
    """Per-doc zlib compression ratio — the entropy-proxy quality signal
    (CCNet-family: boilerplate/templated text compresses far below
    natural prose; random noise barely compresses).  DEFLATE is
    deterministic for a fixed level, so the ratio is content-stable.
    The per-row zlib call is inherent (a per-document codec, like the
    multimodal decoders) — C-level and CPU-bound, sized for an actor
    pool, never a vectorization miss."""
    import zlib

    import numpy as np
    import pandas as pd

    texts = b["text"].astype(str)
    raw = texts.str.encode("utf-8").map(len).to_numpy("int64")
    comp = np.fromiter(
        (len(zlib.compress(t.encode("utf-8"), 6)) for t in texts),
        dtype="int64", count=len(texts))
    return pd.DataFrame(
        {"doc_id": b["doc_id"].astype("int64"),
         "n_bytes": pd.array(raw, "int64"),
         "n_compressed": pd.array(comp, "int64"),
         "ratio_bp": pd.array(
             np.where(raw > 0, comp * 10_000 // np.maximum(raw, 1), 0)
             .astype("int64"), "int64")}
    )


_ALPHA_RE = re.compile(r"[a-zA-Z]")


def gopher_rules_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Gopher-style quality-rule census per document (Rae et al. 2021,
    word-level subset that applies to single-line corpora): word-count
    bounds, mean-word-length bounds, alphabetic-word share, stopword
    floor, and symbol-word ceiling.  Every rule compares EXACT integers
    (mean bounds as ``3n ≤ Σlen ≤ 10n`` etc.), so the pass flag is
    float-free and bit-stable across engines."""
    text = batch["text"].astype(str)
    tokens = text.str.split(" ")
    n = tokens.str.len().astype("int64")
    sum_len = (text.str.len().astype("int64") - (n - 1)).astype("int64")
    n_alpha = tokens.map(
        lambda ts: sum(1 for t in ts if _ALPHA_RE.search(t))
    ).astype("int64")
    n_stop = tokens.map(
        lambda ts: sum(t in EN_STOPWORDS for t in ts)
    ).astype("int64")
    n_sym = tokens.map(
        lambda ts: sum(1 for t in ts if "#" in t or "..." in t)
    ).astype("int64")
    passes = (
        (n >= 50) & (n <= 100_000)
        & (sum_len >= 3 * n) & (sum_len <= 10 * n)
        & (5 * n_alpha >= 4 * n)
        & (n_stop >= 2)
        & (10 * n_sym <= n)
    )
    return pd.DataFrame(
        {"doc_id": batch["doc_id"].astype("int64"),
         "n_words": n, "sum_word_len": sum_len,
         "n_alpha_words": n_alpha, "n_stopwords": n_stop,
         "n_symbol_words": n_sym, "passes": passes.astype(bool)}
    )
