"""Merge rules E1-E7, tokenizer O7, cleansing O15, taboo O16 unit tests."""

import pandas as pd

from medical_knowledge_graph_ray.stages.cleansing import (
    classify_taboo,
    confidence_rules_df,
    taboo_group,
)
from medical_knowledge_graph_ray.stages.merge_rules import (
    merge_nerseg,
    round_2,
    rules_applicable,
    suffix_combiner,
    words_combiner,
)
from medical_knowledge_graph_ray.stages.rules_stage import RulesMerge, merged_prob
from medical_knowledge_graph_ray.stages.tokenize import Tokenizer


def test_tokenizer_partitions_sentence():
    tok = Tokenizer()
    for sent in ("患者出现发热和咳嗽", "行胸部CT检查123", "首选二甲双胍联合胰岛素。"):
        seg = tok.tokenize(sent)
        # offsets exactly partition the sentence
        pos = 0
        for word, _tag, s, e in seg:
            assert s == pos and sent[s:e] == word
            pos = e
        assert pos == len(sent)


def test_tokenizer_tags():
    tok = Tokenizer({"心电图": "TES"})
    seg = tok.tokenize("行心电图2次。")
    assert [(t[0], t[1]) for t in seg] == [
        ("行", "n"), ("心电图", "TES"), ("2", "m"), ("次", "n"), ("。", "x"),
    ]


def test_words_combiner_first_occurrence():
    sentence = "心脏胃大部切除术是常规术式"
    seg = [
        ["心脏", "ORG", 0, 2],
        ["胃大部切除术", "SUR", 2, 8],
        ["是常规术式", "n", 8, 13],
    ]
    out = words_combiner(seg, sentence, [["ORG", "SUR"]])
    assert out[0] == ["心脏胃大部切除术", "SUR", 0, 8]
    assert len(out) == 2


def test_words_combiner_vetoes():
    # 、 in combined surface → veto
    sentence = "心脏、手术"
    seg = [["心脏、", "ORG", 0, 3], ["手术", "SUR", 3, 5]]
    out = words_combiner(seg, sentence, [["ORG", "SUR"]])
    assert len(out) == 2  # unchanged


def test_suffix_combiner():
    sentence = "行肝脏检查即可"
    seg = [
        ["行", "n", 0, 1],
        ["肝脏", "ORG", 1, 3],
        ["检查", "n", 3, 5],
        ["即可", "n", 5, 7],
    ]
    out = suffix_combiner(seg, sentence, {"检查"}, ("ORG", "DIS"), "TES")
    assert ["肝脏检查", "TES", 1, 5] in out
    assert len(out) == 3


def test_merge_nerseg_boundary_alignment():
    seg = [["急性", "n", 0, 2], ["胰腺", "ORG", 2, 4], ["炎", "n", 4, 5]]
    out = merge_nerseg(seg, [("急性胰腺炎", "DIS", 0, 5)])
    assert out == [["急性胰腺炎", "DIS", 0, 5]]


def test_merge_nerseg_dictionary_wins_same_token():
    seg = [["心电图", "TES", 0, 3]]
    out = merge_nerseg(seg, [("心电图", "SUR", 0, 3)])
    assert out == [["心电图", "TES", 0, 3]]  # discarded: same boundary


def test_round2_suffix_to_tes():
    tok = Tokenizer({"肝脏": "ORG", "造影": "n"})
    sentence = "行肝脏造影评估"
    seg = tok.tokenize(sentence)
    out = round_2(seg, sentence)
    assert any(t[0] == "肝脏造影" and t[1] == "TES" for t in out)


def test_rules_applicable_prefilter():
    assert rules_applicable([["a", "ORG", 0, 1], ["b", "SUR", 1, 2]])
    assert not rules_applicable([["a", "ORG", 0, 1], ["x", "n", 1, 2],
                                 ["y", "n", 2, 3], ["b", "SUR", 3, 4]])
    assert rules_applicable([["肝脏", "ORG", 0, 2], ["检查", "n", 2, 4]])


def test_rules_merge_process_sentence():
    rm = RulesMerge()
    sentence = "心脏胃大部切除术是常规术式"
    mentions = [
        ("dictionary", "心脏", "ORG", 0, 2, 0.95),
        ("dictionary", "胃大部切除术", "SUR", 2, 8, 0.95),
    ]
    out = rm.process_sentence(sentence, mentions)
    assert ("心脏胃大部切除术", "SUR", 0, 8, min(0.95 + 0.5, 0.98)) in out


def test_merged_prob():
    assert merged_prob([]) == 0.75
    assert merged_prob([0.4, 0.6]) == 1.0 if False else merged_prob([0.4, 0.6]) == min(0.5 + 0.5, 0.98)


def test_confidence_rules_two_char_reduction():
    df = pd.DataFrame(
        {
            "model": ["a"], "ent_name": ["发热"], "ent_type": ["SYM"],
            "start": [0], "end": [2],
            "prob_strict": [0.9], "prob_partial": [0.9],
            "prob_exact": [0.9], "prob_type": [0.9],
        }
    )
    out = confidence_rules_df(df)
    assert abs(out.iloc[0]["prob_strict"] - 0.3) < 1e-12


def test_confidence_rules_trailing_xing():
    df = pd.DataFrame(
        {
            "model": ["a"], "ent_name": ["阻塞性"], "ent_type": ["DIS"],
            "start": [0], "end": [3],
            "prob_strict": [0.8], "prob_partial": [0.8],
            "prob_exact": [0.8], "prob_type": [0.8],
        }
    )
    out = confidence_rules_df(df)
    assert abs(out.iloc[0]["prob_strict"] - 0.4) < 1e-12


def test_confidence_rules_unbalanced_emits_copy():
    df = pd.DataFrame(
        {
            "model": ["a"], "ent_name": ["心力衰竭或"], "ent_type": ["DIS"],
            "start": [0], "end": [5],
            "prob_strict": [0.9], "prob_partial": [0.9],
            "prob_exact": [0.9], "prob_type": [0.9],
        }
    )
    out = confidence_rules_df(df)
    assert len(out) == 2
    copy = out.iloc[1]
    assert copy["ent_name"] == "心力衰竭" and copy["model"] == "a_cleaned"
    assert abs(copy["prob_strict"] - (0.3 + 0.35)) < 1e-12


def test_taboo_classification_priority():
    assert classify_taboo("孕妇禁用阿司匹林") == "禁用人群"
    assert classify_taboo("儿童慎用布洛芬") == "慎用人群"
    assert classify_taboo("老人使用地高辛需减量") == "慎用人群"  # 调整用量 remap
    assert classify_taboo("正常使用即可") is None
    assert taboo_group("孕妇禁用阿司匹林") == "孕妇"
    # prohibited overrides notrecommended
    assert classify_taboo("不宜久用，孕妇禁用") == "禁用人群"
