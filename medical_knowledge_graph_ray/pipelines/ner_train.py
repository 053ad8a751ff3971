"""NER model-training pipeline: distributed batch-perceptron rounds over
the dictionary-labeled page corpus (the reference's training loop,
``multi_source_ner.py:46-75,331-342``, as data-parallel BSP — see
``stages/perceptron.py`` for the exact-integer contract).

One featurize pass materializes a bounded position table (content-stable
1-in-4 train sample + the full val split); each round is one broadcast +
one sparse-gradient exchange; evaluation re-reads only the val slice.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def train_positions_dataset(corpus_dir: str):
    """pages → materialized (role, f0..f4, tag, sent, pos) positions."""
    from .kg import sentences_dataset
    from ..stages.perceptron import featurize_sentences_batch

    sents = sentences_dataset(corpus_dir)
    return sents.map_batches(
        featurize_sentences_batch, batch_format="pyarrow"
    ).materialize()  # bounded: sampled train + val positions only


def ner_train_fit(
    corpus_dir: str, *, rounds: int = 6, eval_every_round: bool = False
):
    """Train ``rounds`` BSP rounds — returns (learning-curve table,
    final weight matrix).  Held-out metrics are computed for the FINAL
    weights by default (each eval is its own bucketed execution;
    per-round evals are a test/debug luxury, ``eval_every_round=True``)
    — the per-round mistake counts already trace convergence for free."""
    from ..stages.perceptron import eval_tagger, train_rounds

    feats = train_positions_dataset(corpus_dir)
    train = feats.filter(expr="role == 0")
    val = feats.filter(expr="role == 1")

    rows, W = [], None
    for r, mistakes, W in train_rounds(train, rounds=rounds):
        if eval_every_round or r == rounds - 1:
            m = eval_tagger(val, W)
        else:
            m = {"token_acc": np.nan, "span_p": np.nan,
                 "span_r": np.nan, "span_f1": np.nan}
        rows.append(
            {"round": r, "train_mistakes": mistakes,
             "val_token_acc": m["token_acc"], "val_span_p": m["span_p"],
             "val_span_r": m["span_r"], "val_span_f1": m["span_f1"]}
        )
    out = pd.DataFrame(rows)
    for c in ("round", "train_mistakes"):
        out[c] = out[c].astype("int64")
    return out, W


def ner_train_corpus(
    corpus_dir: str, *, rounds: int = 6, eval_every_round: bool = False
) -> pd.DataFrame:
    """Learning-curve table only (the driver-query face of
    ``ner_train_fit``)."""
    curve, _W = ner_train_fit(
        corpus_dir, rounds=rounds, eval_every_round=eval_every_round
    )
    return curve


def ner_train_pages(sf_dir: str, *, rounds: int = 6) -> pd.DataFrame:
    """Driver query: learning curve over the sf-scaled page corpus."""
    from .kg import corpus_for_sf

    return ner_train_corpus(corpus_for_sf(sf_dir), rounds=rounds)
