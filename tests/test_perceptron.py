"""Distributed batch-perceptron trainer gates: convergence on the
silver-labeled corpus, exact parallelism invariance of the weight
trajectory, featurizer boundary semantics, and span-eval counting."""

import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="module")
def corpus(ray_session, tmp_path_factory):
    from medical_knowledge_graph_ray.sources.pages import generate_pages

    root = tmp_path_factory.mktemp("ptrain")
    return generate_pages(300, str(root / "pages"))


@pytest.fixture(scope="module")
def positions(corpus):
    from medical_knowledge_graph_ray.pipelines.ner_train import (
        train_positions_dataset,
    )

    return train_positions_dataset(corpus)


def test_training_converges_and_beats_baseline(positions):
    from medical_knowledge_graph_ray.stages.perceptron import (
        eval_tagger, train_rounds,
    )

    train = positions.filter(expr="role == 0")
    val = positions.filter(expr="role == 1")
    hist, W = [], None
    for _r, mistakes, W in train_rounds(train, rounds=4):
        hist.append(mistakes)
    # convergence: the batch perceptron's mistake count collapses
    assert hist[-1] < hist[0] / 4, hist
    m = eval_tagger(val, W)
    # baseline = predict-all-O token accuracy on the val slice
    val_df = val.to_pandas()
    base = float((val_df["tag"].to_numpy() == 0).mean())
    assert m["token_acc"] > base + 0.05, (m, base)
    assert m["token_acc"] > 0.9, m
    assert m["span_f1"] > 0.4, m


def test_weight_trajectory_parallelism_invariant(positions):
    from medical_knowledge_graph_ray.stages.perceptron import train_rounds

    train = positions.filter(expr="role == 0")
    runs = []
    for ds in (train, train.repartition(7)):
        hist, W = [], None
        for _r, mistakes, W in train_rounds(ds, rounds=2):
            hist.append(mistakes)
        runs.append((hist, W.copy()))
    assert runs[0][0] == runs[1][0]
    assert np.array_equal(runs[0][1], runs[1][1])


def test_feature_ids_mask_sentence_boundaries():
    from medical_knowledge_graph_ray.stages.perceptron import _feature_ids

    codes = np.array([65, 66, 65, 66], dtype=np.uint32)  # "AB" + "AB"
    sent = np.array([1, 1, 2, 2], dtype=np.int64)
    ids = _feature_ids(codes, sent)
    # same char, same in-sentence position → identical feature rows
    assert np.array_equal(ids[0], ids[2])
    assert np.array_equal(ids[1], ids[3])
    # a sentence's last char must not see the next sentence's first char
    one = _feature_ids(np.array([65, 66], np.uint32), np.array([1, 1], np.int64))
    assert np.array_equal(ids[1], one[1])


def test_eval_bucket_counts_exact_spans(ray_session):
    import ray

    from medical_knowledge_graph_ray.stages.perceptron import (
        DIM, _EvalBucket, n_tags,
    )

    T = n_tags()
    # one sentence "xAAx": gold span B,I of type 0 at [1,3)
    g = pd.DataFrame(
        {"f0": [0, 1, 2, 3], "f1": [99] * 4, "f2": [99] * 4,
         "f3": [99] * 4, "f4": [99] * 4,  # 99 = an untouched weight row
         "tag": np.array([0, 1, 2, 0], np.int8),
         "sent": np.array([9, 9, 9, 9], np.int64),
         "pos": np.array([0, 1, 2, 3], np.int32)}
    )
    # weights that reproduce gold exactly: W[f0=i, gold_tag] high
    W = np.zeros((DIM, T), dtype=np.int32)
    for i, t in enumerate([0, 1, 2, 0]):
        W[i, t] = 5
    out = _EvalBucket(ray.put(W))(g)
    assert int(out["correct"].iloc[0]) == 4
    assert int(out["tp"].iloc[0]) == 1
    assert int(out["n_pred"].iloc[0]) == 1 and int(out["n_gold"].iloc[0]) == 1
    # now a wrong prediction on the span start → span missed, not matched
    W[1, 1] = 0
    out2 = _EvalBucket(ray.put(W))(g)
    assert int(out2["tp"].iloc[0]) == 0


def test_ner_train_query_schema(ray_session):
    import __ray_entry__ as em

    df = em.queries()["ner_train"]("/root/testdata/sf0.001")
    assert list(df.columns) == [
        "round", "train_mistakes", "val_token_acc", "val_span_p",
        "val_span_r", "val_span_f1",
    ]
    assert len(df) == 6
    assert df["train_mistakes"].iloc[-1] < df["train_mistakes"].iloc[0]
    assert df["val_token_acc"].iloc[-1] > 0.9


def test_save_load_roundtrip_and_cli_train(ray_session, corpus, tmp_path):
    from medical_knowledge_graph_ray.__main__ import main
    from medical_knowledge_graph_ray.stages.perceptron import (
        load_tagger, save_tagger,
    )

    W = np.zeros((1 << 17, 21), dtype=np.int32)
    W[5, 3], W[100, 0], W[77, 20] = 7, -2, 1
    save_tagger(W, str(tmp_path / "m"))
    assert np.array_equal(load_tagger(str(tmp_path / "m")), W)

    out = str(tmp_path / "model")
    rc = main(["train", "--corpus", corpus, "--out", out, "--rounds", "2"])
    assert rc == 0
    W2 = load_tagger(out)
    assert (W2 != 0).any()
    curve = pd.read_parquet(f"{out}/learning_curve.parquet")
    assert len(curve) == 2
    assert curve["train_mistakes"].iloc[1] < curve["train_mistakes"].iloc[0]


def test_predict_sentences_recovers_gazetteer_spans(positions, corpus):
    """Serve path: the trained tagger's ad-hoc predictions recover most
    gazetteer spans on fresh sentences (train→serve loop closed)."""
    from medical_knowledge_graph_ray.ontology import MEDICAL_GAZETTEER
    from medical_knowledge_graph_ray.stages.ner import GazetteerMatcher
    from medical_knowledge_graph_ray.stages.perceptron import (
        predict_sentences, train_rounds,
    )

    train = positions.filter(expr="role == 0")
    W = None
    for _r, _m, W in train_rounds(train, rounds=4):
        pass
    matcher = GazetteerMatcher(MEDICAL_GAZETTEER)
    sents = ["儿童慎用阿司匹林", "适用于肝硬化的治疗", "孕妇禁用阿莫西林"]
    preds = predict_sentences(W, sents)
    assert predict_sentences(W, [""]) == [[]]
    # char-majority recovery: a gold span counts as recovered when more
    # than half its chars carry the right predicted type (the greedy
    # local-feature tagger can fray span edges; type identity is the
    # serve-path contract being exercised here)
    tp = total = 0
    for s, p in zip(sents, preds):
        char_type = {}
        for st, en, ty in p:
            for i in range(st, en):
                char_type[i] = ty
        for st, en, surf in matcher.find(s):
            total += 1
            ty = matcher.types[surf]
            hit = sum(char_type.get(i) == ty for i in range(st, en))
            tp += hit * 2 > (en - st)
    assert total > 0
    assert tp / total >= 0.8, (tp, total, preds)
