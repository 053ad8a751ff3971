"""Property-based tests (hypothesis) for the invariants SURVEY §7.4 calls
out: offsets always partition the sentence, span/BIO round-trips, boundary
strip idempotence, run-length decode/encode inverses, split determinism."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from medical_knowledge_graph_ray.functions.spans import fill_spans, runs
from medical_knowledge_graph_ray.stages.bio import bio_decode, bio_encode
from medical_knowledge_graph_ray.stages.ner import EnsembleNER
from medical_knowledge_graph_ray.stages.tokenize import Tokenizer
from medical_knowledge_graph_ray.stages.triples import strip_boundaries

_ZH = st.sampled_from(list("患者出现发热咳嗽心脏手术、。，：检查012ab "))
_SENT = st.text(alphabet=_ZH, min_size=0, max_size=40)

_TOK = Tokenizer()
_NER = EnsembleNER()


@given(_SENT)
@settings(max_examples=200, deadline=None)
def test_tokenizer_partitions_any_sentence(sent):
    seg = _TOK.tokenize(sent)
    pos = 0
    for word, _tag, s, e in seg:
        assert s == pos and e > s and sent[s:e] == word
        pos = e
    assert pos == len(sent)


@given(_SENT)
@settings(max_examples=200, deadline=None)
def test_ner_mentions_are_substrings(sent):
    for (model, ent, _ety, s, e, *_rest) in _NER._sentence_mentions(sent):
        assert 0 <= s < e <= len(sent)
        # jittered member spans keep ent == sentence slice
        assert sent[s:e] == ent


@given(_SENT)
@settings(max_examples=100, deadline=None)
def test_vote_spans_well_formed(sent):
    for surface, ety, s, e, prob in _NER.vote_spans(sent):
        assert sent[s:e] == surface and 0 < prob <= 1.0
        assert len(ety) == 3


@given(st.lists(st.tuples(st.integers(0, 30), st.integers(1, 5),
                          st.integers(1, 10), st.floats(0.1, 1.0)),
                max_size=6))
@settings(max_examples=200, deadline=None)
def test_runs_fill_roundtrip(raw_spans):
    # build non-overlapping spans
    spans, pos = [], 0
    for off, ln, tid, p in raw_spans:
        s = pos + off
        spans.append((s, s + ln, tid, round(p, 6)))
        pos = s + ln + 1  # gap guarantees no adjacency merge
    L = (spans[-1][1] + 2) if spans else 5
    tids, _probs = fill_spans(L, spans)
    assert runs(tids) == [(s, e, t) for s, e, t, _ in spans]


@given(_SENT, st.integers(0, 5))
@settings(max_examples=200, deadline=None)
def test_strip_boundaries_idempotent(sent, start):
    out1 = strip_boundaries(sent, start, start + len(sent))
    out2 = strip_boundaries(*out1)
    assert out1 == out2
    surface, s, e = out1
    assert e - s == len(surface)


@given(st.lists(st.tuples(st.integers(0, 3), st.integers(1, 4),
                          st.sampled_from(["DIS", "SYM", "DRU"])), max_size=4))
@settings(max_examples=200, deadline=None)
def test_bio_roundtrip_property(raw):
    spans, pos = [], 0
    for off, ln, ety in raw:
        s = pos + off + 1  # gap ≥1 so decode can't merge adjacents... B- restarts anyway
        spans.append((s, s + ln, ety))
        pos = s + ln
    L = (spans[-1][1] + 1) if spans else 4
    sentence = "字" * L
    block = bio_encode(sentence, spans)
    got_sentence, got_spans = bio_decode(block)
    assert got_sentence == sentence and got_spans == spans


@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", blacklist_categories=("Cs",)
            ),
            max_size=200,
        ),
        max_size=40,
    )
)
@settings(max_examples=60, deadline=None)
def test_md5_int_vec_matches_hashlib(strs):
    """The numpy-vectorized MD5 is bit-exact vs hashlib across arbitrary
    UTF-8 strings and lengths spanning multiple 512-bit blocks."""
    import pyarrow as pa

    from medical_knowledge_graph_ray.functions.hashing import md5_int, md5_int_vec

    for bits in (32, 64):
        got = md5_int_vec(pa.array(strs, pa.string()), bits=bits)
        want = np.array([md5_int(s, bits) for s in strs], dtype=np.uint64)
        assert (got == want).all()


def test_md5_int_vec_block_boundaries_and_slices():
    """Deterministic edge lengths around the 1→2 and 2→3 block boundaries
    (55/56, 119/120 message bytes) plus sliced/chunked Arrow inputs."""
    import pyarrow as pa

    from medical_knowledge_graph_ray.functions.hashing import (
        md5_int,
        md5_int_vec,
        stable_bucket,
        stable_bucket_vec,
    )

    strs = ["x" * n for n in (0, 1, 54, 55, 56, 63, 64, 65, 118, 119, 120, 300)]
    strs += ["雪梨酱油汤圆" * n for n in range(6)]
    want = np.array([md5_int(s, 32) for s in strs], dtype=np.uint64)
    assert (md5_int_vec(strs) == want).all()
    arr = pa.chunked_array([pa.array(strs[:5]), pa.array(strs[5:])])
    assert (md5_int_vec(arr) == want).all()
    sliced = pa.array(strs).slice(3, 7)
    assert (md5_int_vec(sliced) == want[3:10]).all()
    assert (
        stable_bucket_vec(strs, 7) == np.array([stable_bucket(s, 7) for s in strs])
    ).all()


def test_split_heldout_mask_matches_scalar():
    import pyarrow as pa

    from medical_knowledge_graph_ray.stages.bio import split_heldout_mask, split_of

    urls = [f"https://medwiki.example.org/wiki/page_{i:05d}" for i in range(3000)]
    ords = [i % 37 for i in range(3000)]
    got = split_heldout_mask(pa.array(urls), pa.array(ords, pa.int64()))
    want = np.array([split_of(u, o) != "train" for u, o in zip(urls, ords)])
    assert (got == want).all()
    assert want.any()  # the corpus slice actually exercises both branches
