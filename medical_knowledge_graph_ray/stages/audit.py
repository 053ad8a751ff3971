"""Explicit row-level error accounting (dead-letter auditing).

The reference swallows row errors silently (bare ``except: continue`` at
``multi_ner_prediction.py:69-74``, ``EnsemblePredict_all.py:555-560`` —
SURVEY §4 stragglers row).  This engine makes failure modes explicit: the
extraction audit classifies every page instead of letting broken rows
vanish, and the per-status aggregate is the pipeline's data-quality
dashboard.

Statuses:
* ``ok``             — extraction produced blocks and ≥ 1 usable sentence
* ``non_target_lang``— filtered by the lang gate (not an error; counted)
* ``empty_html``     — null/empty payload
* ``no_blocks``      — HTML parsed but no content-bearing elements
* ``no_sentences``   — blocks found but every fragment below min length
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from .extract import extract_html
from .sentences import split_document

AUDIT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("status", pa.string()),
        ("n_blocks", pa.int32()),
        ("n_sentences", pa.int32()),
    ]
)


def audit_batch(batch: pa.Table) -> pa.Table:
    """Page batch (url, html, lang) → one audit row per page."""
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    langs = batch.column("lang").to_pylist()
    rows = []
    for url, html, lang in zip(urls, htmls, langs):
        if lang != "zh":
            rows.append((url, "non_target_lang", 0, 0))
            continue
        if not html:
            rows.append((url, "empty_html", 0, 0))
            continue
        text = extract_html(html)
        n_blocks = text.count("\n") + 1 if text else 0
        if not text:
            rows.append((url, "no_blocks", 0, 0))
            continue
        n_sent = len(split_document(text))
        status = "ok" if n_sent else "no_sentences"
        rows.append((url, status, n_blocks, n_sent))
    df = pd.DataFrame(rows, columns=["url", "status", "n_blocks", "n_sentences"])
    return pa.Table.from_pandas(df, schema=AUDIT_SCHEMA, preserve_index=False).replace_schema_metadata(None)


def extraction_audit(corpus_dir: str):
    """Corpus → per-status page counts (the dead-letter census)."""
    import ray.data as rd

    from ..functions.arrow import arrow_out, read_parquet_clean
    from .shuffle import bucketed_group_map

    pages = read_parquet_clean(corpus_dir, columns=["url", "html", "lang"])
    audited = pages.map_batches(audit_batch, batch_format="pyarrow")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.groupby("status", sort=False)
            .agg(n_pages=("url", "size"), n_sentences=("n_sentences", "sum"))
            .reset_index()
        )

    partials = audited.map_batches(arrow_out(partial), batch_format="pandas")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby("status", sort=False)
            .agg(n_pages=("n_pages", "sum"), n_sentences=("n_sentences", "sum"))
            .reset_index()
        )

    return bucketed_group_map(partials, ["status"], combine, num_buckets=4)


def dead_letters(corpus_dir: str):
    """The non-ok page rows themselves (url + reason) — written alongside
    outputs so every dropped page is traceable (no silent drops)."""
    from ..functions.arrow import read_parquet_clean

    pages = read_parquet_clean(corpus_dir, columns=["url", "html", "lang"])
    audited = pages.map_batches(audit_batch, batch_format="pyarrow")
    return audited.filter(expr="status != 'ok'")
