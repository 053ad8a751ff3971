"""Distributed BPE tokenizer TRAINING (byte-pair-encoding vocabulary
learning) — the tokenizer-side sibling of the perceptron trainer: the
reference ships a fixed tokenizer + dictionaries (``pre_labeling.py``
jieba userdict; SURVEY §2.3 M1), a modern LLM-data pipeline trains its
own subword vocabulary from the corpus.

Scale shape (the Sennrich et al. 2016 word-census formulation): BPE
merge learning only needs the corpus's WORD FREQUENCY table, never the
corpus itself —

1. one distributed census pass: per-batch ``value_counts`` partials
   (map-side combiner) → one word-bucketed exchange summing totals →
   per-bucket top-k, so the driver collects ≤ buckets × top_k rows;
2. merge learning runs driver-side on that bounded artifact with an
   incrementally-maintained pair index (only words containing the
   merged pair are touched per round — the classic learn-BPE loop);
3. encoding ships the merge ranks (a small broadcast dict) back into a
   ``map_batches`` stage that encodes each DISTINCT word of a batch
   once (dictionary-encode, then gather).

Determinism: the census is an exact integer sum (parallelism-invariant);
ties in pair counts break on the lexicographic pair, so the merge list
is identical at any parallelism and any batch size (pytest-pinned).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.arrow import arrow_out

END = "</w>"  # end-of-word marker (Sennrich convention)


def word_census(docs_ds, *, top_k: int = 65536, num_buckets: int = 16) -> pd.DataFrame:
    """(word, n) for the corpus's ``top_k`` most frequent whitespace
    words — count desc, word asc (total order).  Driver collection is
    bounded by ``num_buckets × top_k``."""
    from .shuffle import bucketed_group_map

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {"word": pd.array([], "str"), "n": pd.array([], "int64")}
            )
        words = b["text"].astype(str).str.split(" ").explode()
        words = words[words != ""]
        vc = words.value_counts()
        return pd.DataFrame(
            {"word": pd.array(vc.index, "str"),
             "n": pd.array(vc.to_numpy(), "int64")}
        )

    def topk_bucket(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("word", sort=False)["n"].sum().reset_index()
        tot = tot.sort_values(["n", "word"], ascending=[False, True],
                              kind="mergesort").head(top_k)
        return pd.DataFrame(
            {"word": pd.array(tot["word"].to_numpy(), "str"),
             "n": pd.array(tot["n"].to_numpy(), "int64")}
        )

    parts = docs_ds.map_batches(arrow_out(partial), batch_format="pandas")
    folded = bucketed_group_map(
        parts, ["word"], topk_bucket, num_buckets=num_buckets
    ).to_pandas()  # ≤ num_buckets × top_k rows
    if "word" not in folded.columns:  # zero-block to_pandas schema drop
        return pd.DataFrame({"word": pd.array([], "str"),
                             "n": pd.array([], "int64")})
    return (
        folded.sort_values(["n", "word"], ascending=[False, True],
                           kind="mergesort")
        .head(top_k).reset_index(drop=True)
    )


def bpe_merges_from_census(
    census: pd.DataFrame, n_merges: int
) -> list[tuple[str, str]]:
    """Classic learn-BPE over a (word, n) table: repeatedly merge the
    most frequent adjacent symbol pair (ties → lexicographically
    smallest pair).  Incremental pair index: each round touches only
    the words containing the chosen pair."""
    words: list[list[str]] = [
        list(w) + [END] for w in census["word"].astype(str)
    ]
    counts = census["n"].astype("int64").tolist()

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, syms in enumerate(words):
        c = counts[wi]
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
            pair_words.setdefault((a, b), set()).add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        # max count, then lexicographically smallest pair — total order
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] <= 0:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for wi in list(pair_words.get(best, ())):
            syms = words[wi]
            c = counts[wi]
            # remove the word's old pair contributions
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] -= c
                if pair_counts[(a, b)] <= 0:
                    pair_counts.pop((a, b), None)
                ws = pair_words.get((a, b))
                if ws is not None:
                    ws.discard(wi)
                    if not ws:
                        pair_words.pop((a, b), None)
            # apply the merge left-to-right
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = out
            # re-add the new contributions
            for a, b in zip(out, out[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
                pair_words.setdefault((a, b), set()).add(wi)
    return merges


def train_bpe(
    docs_ds, *, n_merges: int = 256, top_k_words: int = 65536
) -> pd.DataFrame:
    """Census → merge list as a (rank, left, right, merged) table."""
    census = word_census(docs_ds, top_k=top_k_words)
    merges = bpe_merges_from_census(census, n_merges)
    return pd.DataFrame(
        {"rank": pd.array(np.arange(len(merges)), "int64"),
         "left": pd.array([a for a, _ in merges], "str"),
         "right": pd.array([b for _, b in merges], "str"),
         "merged": pd.array([a + b for a, b in merges], "str")}
    )


def encode_word(word: str, rank_of: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first BPE encode of one word (the standard
    apply-BPE order: always merge the earliest-learned pair present)."""
    syms = list(word) + [END]
    while len(syms) > 1:
        ranked = [
            (rank_of[(a, b)], i)
            for i, (a, b) in enumerate(zip(syms, syms[1:]))
            if (a, b) in rank_of
        ]
        if not ranked:
            break
        _r, i = min(ranked)
        syms = syms[:i] + [syms[i] + syms[i + 1]] + syms[i + 2:]
    return syms


class BpeEncoder:
    """Actor/task ``map_batches`` stage: text → BPE token count per doc
    (the serving face of the trained vocabulary).  Each DISTINCT word of
    a batch is encoded once (dictionary-encode + gather); the merge
    table is tiny and ships in the constructor."""

    def __init__(self, merges: pd.DataFrame):
        self.rank_of = {
            (r.left, r.right): int(r.rank) for r in merges.itertuples()
        }
        self._cache: dict[str, int] = {}

    def _tokens_of(self, word: str) -> int:
        n = self._cache.get(word)
        if n is None:
            n = len(encode_word(word, self.rank_of))
            self._cache[word] = n
        return n

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        words = b["text"].astype(str).str.split(" ")
        counts = [
            int(sum(self._tokens_of(w) for w in ws if w)) for ws in words
        ]
        return pd.DataFrame(
            {"doc_id": pd.array(b["doc_id"].to_numpy(), "int64"),
             "n_bpe_tokens": pd.array(counts, "int64")}
        )
