"""MUC-style evaluator: hand-scored scenarios, aggregation exactness,
derived eval-matrix / weight wiring."""

import numpy as np
import pandas as pd

from medical_knowledge_graph_ray.stages.muc_eval import (
    COUNT_COLS,
    MucEvalStage,
    eval_matrix_from,
    finalize_eval,
    muc_counts,
    precision_recall,
    sentence_count_rows,
    weights_from_eval,
)


def test_scenario_i_exact_match():
    ev = muc_counts([("DIS", 0, 3)], [("DIS", 0, 3)])
    for s in ("strict", "exact", "partial", "ent_type"):
        assert ev[s]["correct"] == 1
        assert sum(ev[s].values()) == 1


def test_scenario_iv_boundary_match_wrong_type():
    ev = muc_counts([("DIS", 0, 3)], [("SYM", 0, 3)])
    assert ev["strict"]["incorrect"] == 1
    assert ev["ent_type"]["incorrect"] == 1
    assert ev["exact"]["correct"] == 1
    assert ev["partial"]["correct"] == 1
    # the gold was consumed: nothing is missed
    assert all(ev[s]["missed"] == 0 for s in ev)


def test_scenario_v_overlap_same_type_half_credit():
    ev = muc_counts([("DIS", 0, 4)], [("DIS", 1, 5)])
    assert ev["strict"]["incorrect"] == 1
    assert ev["exact"]["incorrect"] == 1
    assert ev["partial"]["partial"] == 1
    assert ev["ent_type"]["correct"] == 1
    p, r = precision_recall(ev["partial"], "partial")
    assert p == 0.5 and r == 0.5
    p, r = precision_recall(ev["strict"], "strict")
    assert p == 0.0 and r == 0.0


def test_scenario_vi_overlap_wrong_type():
    ev = muc_counts([("DIS", 0, 4)], [("SYM", 2, 6)])
    assert ev["partial"]["partial"] == 1
    assert ev["ent_type"]["incorrect"] == 1
    assert ev["strict"]["incorrect"] == 1


def test_spurious_and_missed():
    ev = muc_counts([("DIS", 0, 3)], [("SYM", 10, 12)])
    for s in ev:
        assert ev[s]["spurious"] == 1
        assert ev[s]["missed"] == 1


def test_single_char_entities_can_overlap():
    """Documented divergence from the published package's range() quirk:
    [2,3) genuinely overlaps [2,4)."""
    ev = muc_counts([("DIS", 2, 4)], [("DIS", 2, 3)])
    assert ev["partial"]["partial"] == 1
    assert ev["partial"]["spurious"] == 0


def test_mixed_sentence_hand_scored():
    gold = [("DIS", 0, 3), ("SYM", 5, 8), ("DRU", 10, 14)]
    pred = [("DIS", 0, 3), ("SYM", 6, 9), ("TES", 20, 22)]
    ev = muc_counts(gold, pred)
    # DIS exact; SYM overlap same type; TES spurious; DRU missed
    assert ev["strict"] == {
        "correct": 1, "incorrect": 1, "partial": 0, "missed": 1, "spurious": 1
    }
    p, r = precision_recall(ev["strict"], "strict")
    assert p == 1 / 3 and r == 1 / 3
    p, r = precision_recall(ev["ent_type"], "ent_type")
    assert p == 2 / 3 and r == 2 / 3


def test_per_type_rows_restrict_both_sides():
    gold = [("DIS", 0, 3), ("SYM", 5, 8)]
    rows = sentence_count_rows(gold, {"m": [("DIS", 0, 3)]}, ("DIS", "SYM"))
    df = pd.DataFrame(rows, columns=["model", "ent_type", "schema", *COUNT_COLS])
    dis = df[(df.ent_type == "DIS") & (df.schema == "strict")].iloc[0]
    assert dis.correct == 1 and dis.missed == 0 and dis.spurious == 0
    sym = df[(df.ent_type == "SYM") & (df.schema == "strict")].iloc[0]
    assert sym.correct == 0 and sym.missed == 1
    # absent types emit no rows at all
    assert set(df.ent_type) == {"all", "DIS", "SYM"}


def test_counts_are_associative_across_sentences():
    """Summing per-sentence counts == evaluating the union — the property
    the distributed two-phase aggregation relies on."""
    s1 = (
        [("DIS", 0, 3)],
        {"m": [("DIS", 0, 3)]},
    )
    s2 = (
        [("SYM", 2, 5)],
        {"m": [("SYM", 3, 6)]},
    )
    rows = []
    for gold, preds in (s1, s2):
        rows.extend(sentence_count_rows(gold, preds, ("DIS", "SYM")))
    df = (
        pd.DataFrame(rows, columns=["model", "ent_type", "schema", *COUNT_COLS])
        .groupby(["model", "ent_type", "schema"], sort=False)[COUNT_COLS]
        .sum()
        .reset_index()
    )
    strict_all = df[(df.ent_type == "all") & (df.schema == "strict")].iloc[0]
    assert strict_all.correct == 1 and strict_all.incorrect == 1
    fin = finalize_eval(df)
    row = fin[(fin.ent_type == "all") & (fin.schema == "partial")].iloc[0]
    assert row.precision == 0.75  # (1 + 0.5·1) / 2


def test_eval_matrix_and_weights_from_eval():
    df = pd.DataFrame(
        [
            ("a", "DIS", "strict", 3, 1, 0, 0, 0),
            ("a", "DIS", "exact", 3, 1, 0, 0, 0),
            ("a", "DIS", "partial", 3, 0, 1, 0, 0),
            ("a", "DIS", "ent_type", 4, 0, 0, 0, 0),
            ("b", "DIS", "strict", 1, 3, 0, 0, 0),
            ("b", "DIS", "exact", 1, 3, 0, 0, 0),
            ("b", "DIS", "partial", 1, 0, 3, 0, 0),
            ("b", "DIS", "ent_type", 2, 2, 0, 0, 0),
        ],
        columns=["model", "ent_type", "schema", *COUNT_COLS],
    )
    fin = finalize_eval(df)
    mat = eval_matrix_from(fin)
    assert mat["a"]["DIS"] == [0.75, 0.875, 0.75, 1.0]
    w = weights_from_eval(fin)
    assert abs(w["a"]["DIS"] - 0.75) < 1e-9
    assert abs(w["a"]["DIS"] + w["b"]["DIS"] - 1.0) < 1e-9


def test_stage_batch_matches_manual_sum():
    """The actor-stage combiner equals per-sentence scoring + sum."""
    stage = MucEvalStage()
    sents = ["患者出现发热和头痛", "适用于糖尿病的治疗"]
    batch = pd.DataFrame({"sentence": sents})
    got = (
        stage(batch)
        .to_pandas()
        .groupby(["model", "ent_type", "schema"], sort=False)[COUNT_COLS]
        .sum()
        .reset_index()
        .sort_values(["model", "ent_type", "schema"])
        .reset_index(drop=True)
    )
    rows = []
    for s in sents:
        gold, preds = stage._sentence_spans(s)
        rows.extend(sentence_count_rows(gold, preds, stage.types))
    want = (
        pd.DataFrame(rows, columns=["model", "ent_type", "schema", *COUNT_COLS])
        .groupby(["model", "ent_type", "schema"], sort=False)[COUNT_COLS]
        .sum()
        .reset_index()
        .sort_values(["model", "ent_type", "schema"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # models evaluated = members + ensemble_strong, never the gold dictionary
    assert set(got.model) <= {"a", "b", "c", "ensemble_strong"}
    assert "dictionary" not in set(got.model)


def test_derived_matrix_feeds_ensemble(ray_session):
    """End wiring: eval over a corpus slice → matrix → EnsembleNER accepts
    it and produces calibrated mentions (prob = char_prob × precision)."""
    from medical_knowledge_graph_ray.stages.ner import EnsembleNER

    stage = MucEvalStage()
    sents = [
        "患者出现发热和头痛",
        "适用于糖尿病的治疗",
        "可使用阿司匹林治疗",
        "必要时行胃镜检查",
    ]
    rows = []
    for s in sents:
        gold, preds = stage._sentence_spans(s)
        rows.extend(sentence_count_rows(gold, preds, stage.types))
    df = (
        pd.DataFrame(rows, columns=["model", "ent_type", "schema", *COUNT_COLS])
        .groupby(["model", "ent_type", "schema"], sort=False)[COUNT_COLS]
        .sum()
        .reset_index()
    )
    mat = eval_matrix_from(finalize_eval(df))
    ner = EnsembleNER(eval_override=mat)
    import pyarrow as pa

    out = ner(pa.table({
        "url": ["u"], "sent_ord": pa.array([0], pa.int32()),
        "sentence": ["患者出现发热和头痛"], "head_entity": ["糖尿病"],
        "head_type": ["DIS"], "paragraph": ["clinical"],
    })).to_pandas()
    assert len(out) > 0
    # calibration must use the DERIVED precision: for every single-member
    # mention, prob_strict == member char prob × derived strict precision
    from medical_knowledge_graph_ray.state.artifacts import member_prob

    checked = 0
    for r in out[out.model.isin(["a", "b", "c"])].itertuples():
        want = member_prob(r.model, r.ent_name) * ner.eval[r.model][r.ent_type][0]
        assert np.isclose(r.prob_strict, want)
        checked += 1
    assert checked > 0
