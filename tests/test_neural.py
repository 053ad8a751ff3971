"""Neural-member closure gates: the numpy neural tagger
(``stages/neural.py``) as a real voting member of the flagship ensemble
— the reference's CNN-BiLSTM-CRF role (``multi_source_ner.py:140-372``).

Pinned:
* BSP training is BIT-IDENTICAL at any parallelism (per-position int64
  gradient quantization);
* train→eval→configure loop is checkpointed;
* batch path ≡ per-sentence path with the neural member resident;
* the member contributes real calibrated-probability mentions;
* e2e triple P/R of the neural-ensemble graph vs the default graph
  ≥ 0.95 (the VERDICT done-bar; exact-span corroboration gate).
"""

import glob
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")

N_PAGES = 150
ROUNDS = 80


@pytest.fixture(scope="module")
def corpus(ray_session, tmp_path_factory):
    from medical_knowledge_graph_ray.sources.pages import generate_pages

    return generate_pages(
        N_PAGES, str(tmp_path_factory.mktemp("neural_corpus"))
    )


@pytest.fixture(scope="module")
def model_dir(corpus, tmp_path_factory):
    from medical_knowledge_graph_ray.pipelines.ner_train import (
        ensure_neural_tagger,
    )

    root = str(tmp_path_factory.mktemp("models"))
    return ensure_neural_tagger(corpus, model_root=root, rounds=ROUNDS)


def _triples(root: str) -> pd.DataFrame:
    fs = sorted(glob.glob(f"{root}/triples/shard_*/*.parquet"))
    return pd.concat([pd.read_parquet(f) for f in fs], ignore_index=True)


def _tri_key_set(df: pd.DataFrame) -> set:
    return set(
        map(tuple, df[["subj", "pred", "obj", "url", "sent_ord"]]
            .itertuples(index=False))
    )


def test_neural_training_parallelism_invariant(corpus):
    """The whole parameter trajectory is bit-identical whether the
    position table is one block or many (per-position quantization +
    exact int64 folds)."""
    from medical_knowledge_graph_ray.pipelines.ner_train import (
        train_positions_dataset,
    )
    from medical_knowledge_graph_ray.stages.neural import train_neural

    pos = train_positions_dataset(corpus).filter(expr="role == 0")
    one = pos.repartition(1).materialize()
    many = pos.repartition(7).materialize()

    pa_ = pb_ = None
    for _r, _l, pa_ in train_neural(one, rounds=4):
        pass
    for _r, _l, pb_ in train_neural(many, rounds=4):
        pass
    for k in ("E", "b1", "W2", "b2"):
        assert np.array_equal(pa_[k], pb_[k]), k


def test_ensure_neural_tagger_checkpoints(corpus, model_dir):
    import json
    import os
    import time

    from medical_knowledge_graph_ray.pipelines.ner_train import (
        ensure_neural_tagger,
    )

    t0 = time.perf_counter()
    again = ensure_neural_tagger(
        corpus, model_root=os.path.dirname(model_dir), rounds=ROUNDS
    )
    assert again == model_dir
    assert time.perf_counter() - t0 < 0.5
    with open(os.path.join(model_dir, "neural.json")) as fh:
        meta = json.load(fh)
    assert meta["arch"].startswith("sum-embed")
    assert meta["final_eval"]["span_f1"] > 0.5  # genuinely learned


def test_neural_member_batch_equals_per_sentence(model_dir):
    from medical_knowledge_graph_ray.stages.neural import load_neural
    from medical_knowledge_graph_ray.stages.ner import EnsembleNER

    ner = EnsembleNER(neural_params=load_neural(model_dir))
    assert ner.members[-1].name == "neural" and ner.num_models == 4
    sents = [
        "患者出现发热和咳嗽",
        "可使用阿司匹林治疗",
        "见上",
        "慢性心力衰竭患者慎用",
        "主要表现为胸痛、呼吸困难及水肿",
        "首选二甲双胍联合胰岛素",
    ]
    batch = pa.table(
        {
            "url": [f"u{i}" for i in range(len(sents))],
            "sent_ord": pa.array(range(len(sents)), pa.int32()),
            "sentence": sents,
            "head_entity": ["糖尿病"] * len(sents),
            "head_type": ["DIS"] * len(sents),
            "paragraph": ["clinical"] * len(sents),
        }
    )
    got = ner(batch).to_pandas()
    want = []
    for i, s in enumerate(sents):
        for (model, ent, ety, st, en, p1, p2, p3, p4, k) in \
                ner._sentence_mentions(s):
            want.append((f"u{i}", i, model, ent, ety, st, en,
                         round(p1, 9), round(p2, 9), round(p3, 9),
                         round(p4, 9), k))
    got_rows = [
        (r.url, r.sent_ord, r.model, r.ent_name, r.ent_type, r.start, r.end,
         round(r.prob_strict, 9), round(r.prob_partial, 9),
         round(r.prob_exact, 9), round(r.prob_type, 9), r.n_models)
        for r in got.itertuples()
    ]
    assert sorted(got_rows) == sorted(want)


def test_neural_member_contributes_with_real_probs(corpus, model_dir):
    """The neural member emits corroborated mentions whose probabilities
    are REAL softmax scores (not a constant), and raises strong-span
    support."""
    from medical_knowledge_graph_ray.config import EngineConfig
    from medical_knowledge_graph_ray.pipelines.kg import (
        MentionStage,
        sentences_dataset,
    )

    stage = MentionStage(config=EngineConfig(neural_model_dir=model_dir))
    sents = sentences_dataset(corpus).limit(400).to_pandas()
    batch = pa.Table.from_pandas(sents, preserve_index=False)
    mentions = stage.ner(batch).to_pandas()
    neural = mentions[mentions["model"] == "neural"]
    assert len(neural) > 0
    # calibrated per-span probabilities vary (a constant would collapse
    # to one distinct value like the perceptron's 0.80)
    assert neural["prob_strict"].nunique() > 3
    strong = mentions[mentions["model"] == "ensemble_strong"]
    assert int(strong["n_models"].max()) >= 3


def test_neural_flagship_pr_vs_default_oracle(corpus, model_dir, tmp_path):
    """THE done-bar: e2e triple P/R of the neural-ensemble graph vs the
    default-ensemble graph ≥ 0.95."""
    from medical_knowledge_graph_ray.pipelines.kg import run_kg
    from medical_knowledge_graph_ray.pipelines.ner_train import (
        neural_kg_config,
    )

    cfg = neural_kg_config(corpus, rounds=ROUNDS)
    assert cfg.neural_model_dir
    run_kg(corpus, str(tmp_path / "neural"), n_shards=2, config=cfg)
    run_kg(corpus, str(tmp_path / "default"), n_shards=2)
    a = _tri_key_set(_triples(str(tmp_path / "neural")))
    b = _tri_key_set(_triples(str(tmp_path / "default")))
    inter = len(a & b)
    p, r = inter / len(a), inter / len(b)
    assert p >= 0.95 and r >= 0.95, (p, r)
