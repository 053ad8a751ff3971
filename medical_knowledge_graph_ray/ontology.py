"""Ontology, gazetteers and relation vocabulary.

Mirrors the reference's fixed code→name ontology (``config.yaml:54-114``):
ten *essential* entity types (DIS, BFL, EQM, SUR, SYM, TES, ORG, DRU, OGN,
OBJ) participate in ensemble voting; everything else is dropped by the
``if etype not in types: continue`` guard (``EnsemblePredict_all.py:264-266``).

The reference's dictionaries directory is stripped from the snapshot
(``.MISSING_LARGE_BLOBS``), so this engine ships two deterministic synthetic
gazetteers:

* ``MEDICAL_GAZETTEER`` — Chinese medical surface forms for the flagship
  web-page pipeline (the ``input_hint`` corpus), with controlled
  prefix/suffix overlap (e.g. 心力衰竭 / 慢性心力衰竭) to exercise
  longest-match and boundary-merge rules.
* ``WEBTEXT_GAZETTEER`` — multi-word query-engine terms matching the
  driver's ``documents.parquet`` vocabulary, used by the SQL-oracled
  document KG queries.
"""

from __future__ import annotations

# Essential entity types (config.yaml:54-64). Voting only counts these.
ESSENTIAL_TYPES: dict[str, str] = {
    "DIS": "疾病",
    "BFL": "体液",
    "EQM": "设备",
    "SUR": "手术",
    "SYM": "症状",
    "TES": "检查",
    "ORG": "器官",
    "DRU": "药品",
    "OGN": "微生物",
    "OBJ": "物体",
}

# Non-essential entity types (config.yaml:65-78 RE_nonessential): NER
# models predict them, but the `if etype not in types: continue` guard
# (EnsemblePredict_all.py:264-266) keeps them out of voting / the KG —
# they exist solely for the TRAINING-DATA path, where spans of the six
# OVERLAY_TYPES override seg tags on exact boundary match (E6,
# generation.py:216-238).
NONESSENTIAL_TYPES: dict[str, str] = {
    "DEG": "程度词",
    "FW": "频率词",
    "DUR": "时间段",
    "TP": "时间点",
    "TES_N": "检查",  # the reference re-keys TES in its non-essential map
    "CL": "条件词",
    "PSB": "可能性词",
    "PT": "既往信息词",
    "AT": "否认词",
    "O": "非关键词",
    "NBP": "待处理",
    "BRS": "血亲情况",
    "SPS": "配偶状况",
}

# the subset E6 overlays onto seg tokens (generation.py:217)
OVERLAY_TYPES: tuple[str, ...] = ("FW", "DEG", "AT", "DUR", "PSB", "PT")

# jieba 2-letter userdict flags for the overlay types (config.yaml:80-97
# jieba_inverted): the tokenizer tags these words lowercase; E6 upgrades
# them to the uppercase NER type on exact boundary match.
NONESSENTIAL_JIEBA: dict[str, str] = {
    "FW": "fw", "DEG": "dg", "DUR": "dr", "AT": "at", "PT": "pt", "PSB": "pb",
}

# deterministic stand-in for the models' non-essential predictions (the
# .pkl models are missing from the snapshot, SURVEY §0)
NONESSENTIAL_GAZETTEER: dict[str, str] = {
    "反复": "FW", "偶尔": "FW", "经常": "FW", "频繁": "FW",
    "明显": "DEG", "轻度": "DEG", "重度": "DEG", "严重": "DEG",
    "无": "AT", "未见": "AT", "否认": "AT",
    "长期": "DUR", "数天": "DUR", "数周": "DUR",
    "可能": "PSB", "疑似": "PSB",
    "既往": "PT", "病史": "PT",
}

# E7 problematic-entity removal (generation.py:349-350): tokens ending in
# these words are tagged 'rm' and excluded from training data.
NONTEST_WORDS: tuple[str, ...] = (
    "快速", "化学", "基因", "病理", "其他", "未知", "游离", "运动",
)

# Relation vocabulary = the reference's paragraph keys (structurize_files.py:
# 608-628 keyword→field pairs; pre_labeling.py taboo relations 313-376).
RELATIONS: tuple[str, ...] = (
    "indications",
    "contraindiction",
    "clinical",
    "treatment",
    "complication",
    "TABOO",
)

# External-ontology class IDs per entity type (config.yaml:100-114
# ontology_mapping — OMAHA terminology classes).  Node rows carry the
# mapped id so KG consumers can link out; types without an external
# class (webtext gazetteer types, overlay types) map to ''.
ONTOLOGY_MAPPING: dict[str, str] = {
    "DIS": "omahaT018",
    "SYM": "omahaT001",
    "BFL": "omahaT005",
    "DEG": "omahaT028",
    "FW": "omahaT044",
    "TES": "omahaT065",
    "ORG": "omahaT010",
    "OGN": "omahaT011",
    "SUR": "omahaT002",
    "DRU": "omahaT004",
    "OBJ": "omahaT005",
    "DUR": "omahaT054",
    "EQM": "omahaT033",
}

# -- Chinese medical gazetteer (flagship pages corpus) ------------------------
# Controlled overlap pairs: 心力衰竭/慢性心力衰竭, 糖尿病/2型糖尿病,
# 胃炎/慢性胃炎, 阑尾切除术/腹腔镜阑尾切除术 exercise longest-match.
MEDICAL_GAZETTEER: dict[str, str] = {
    # diseases
    "心力衰竭": "DIS", "慢性心力衰竭": "DIS", "糖尿病": "DIS", "2型糖尿病": "DIS",
    "高血压": "DIS", "胃炎": "DIS", "慢性胃炎": "DIS", "肺炎": "DIS",
    "冠心病": "DIS", "心肌梗死": "DIS", "脑梗死": "DIS", "肝硬化": "DIS",
    "肾功能不全": "DIS", "支气管哮喘": "DIS", "消化性溃疡": "DIS", "心律失常": "DIS",
    "贫血": "DIS", "甲状腺功能亢进": "DIS", "急性胰腺炎": "DIS", "胆囊结石": "DIS",
    # symptoms
    "发热": "SYM", "咳嗽": "SYM", "胸痛": "SYM", "呼吸困难": "SYM",
    "腹痛": "SYM", "恶心": "SYM", "呕吐": "SYM", "头晕": "SYM",
    "乏力": "SYM", "水肿": "SYM", "心悸": "SYM", "黄疸": "SYM",
    # drugs
    "阿司匹林": "DRU", "美托洛尔": "DRU", "二甲双胍": "DRU", "胰岛素": "DRU",
    "呋塞米": "DRU", "阿莫西林": "DRU", "奥美拉唑": "DRU", "硝酸甘油": "DRU",
    "地高辛": "DRU", "华法林": "DRU", "泼尼松": "DRU", "布洛芬": "DRU",
    # surgeries
    "阑尾切除术": "SUR", "腹腔镜阑尾切除术": "SUR", "冠状动脉搭桥术": "SUR",
    "胆囊切除术": "SUR", "胃大部切除术": "SUR", "心脏瓣膜置换术": "SUR",
    # tests
    "心电图": "TES", "血常规": "TES", "肝功能检查": "TES", "胸部CT": "TES",
    "血糖测定": "TES", "冠状动脉造影": "TES", "胃镜检查": "TES", "尿常规": "TES",
    # organs
    "心脏": "ORG", "肝脏": "ORG", "肾脏": "ORG", "胃": "ORG",
    "肺": "ORG", "胰腺": "ORG", "胆囊": "ORG",
    # body fluids
    "血液": "BFL", "尿液": "BFL", "胸腔积液": "BFL",
    # equipment
    "呼吸机": "EQM", "心脏起搏器": "EQM", "血液透析机": "EQM",
    # organisms
    "肺炎链球菌": "OGN", "幽门螺杆菌": "OGN", "大肠杆菌": "OGN",
    # objects — 耐药基因 ends with a NONTEST word, exercising the E7
    # problematic-entity removal in the training-data path
    "耐药基因": "OBJ",
}

# Head-entity pool: pages are "about" one of these (disease/drug/surgery
# pages, mirroring the reference's c/d/m corpora head entities).
HEAD_ENTITY_TYPES: tuple[str, ...] = ("DIS", "DRU", "SUR")

# -- Webtext gazetteer (driver documents.parquet vocabulary) ------------------
# Multi-word terms listed BEFORE their single-word suffixes; matching is
# longest-match-first (dictionary sorted by length desc, utils.py:61-62).
WEBTEXT_GAZETTEER: dict[str, str] = {
    "hash join": "OPR",
    "merge join": "OPR",
    "sort merge": "OPR",
    "table scan": "OPR",
    "index scan": "OPR",
    "window agg": "OPR",
    "join": "OPR",
    "scan": "OPR",
    "filter": "OPR",
    "agg": "OPR",
    "sort": "OPR",
    "window": "OPR",
    "merge": "OPR",
    "spark": "SYS",
    "table": "OBJ",
    "column": "OBJ",
    "row": "OBJ",
    "partition": "OBJ",
    "customer": "ENT",
    "order": "ENT",
    "part": "ENT",
    # absent from the driver corpus by construction — the D4 unseen-term
    # set difference (generation.py:195-200) has something to find
    "checkpoint": "OPR",
    "vacuum": "OPR",
}

# English stopwords for the language-ID / quality-score stages.
EN_STOPWORDS: frozenset[str] = frozenset(
    {"the", "a", "an", "and", "of", "to", "in", "is", "it", "on", "for"}
)

# -- suffix dictionary (analogue of dictionaries/2022_suffix.json, consumed
# at generation.py:247-253 / clean_and_save.py:249-253): suffix word → the
# entity type a merged token becomes.
SUFFIX_DICT: dict[str, str] = {
    "检查": "TES", "造影": "TES", "测定": "TES",
    "切除术": "SUR", "置换术": "SUR", "搭桥术": "SUR",
    "痛": "SYM", "肿大": "SYM",
    "炎": "DIS", "衰竭": "DIS",
    "仪": "EQM", "机": "EQM",
}

# -- taboo relation keyword lists (pre_labeling.py:326-353): priority order
# caution < notrecommended < prohibited — a later list overrides earlier
# matches.  调整用量 is remapped to 慎用人群 in the final table
# (pre_labeling.py:376).
TABOO_CAUTION: tuple[str, ...] = ("致", "易发", "指导", "减量", "调整", "较小", "减少", "酌", "注意", "低剂")
TABOO_NOTRECOMMENDED: tuple[str, ...] = ("不宜", "慎")
TABOO_PROHIBITED: tuple[str, ...] = ("禁用", "禁止", "忌")
TABOO_GROUPS: tuple[str, ...] = (
    "孕妇", "哺乳", "儿童", "老人", "妊娠", "新生儿", "婴儿", "幼儿", "小儿"
)

# -- tokenizer tag alphabet: essential type codes + n(oun-ish run),
# m(number), x(punctuation).  Fuzzy merge patterns iterate over ALL_TAGS
# minus EXL_TAGS as the allowed middle tag (clean_and_save.py:179-186).
NONENTITY_TAGS: tuple[str, ...] = ("n", "m", "x")
ALL_TAGS: tuple[str, ...] = tuple(ESSENTIAL_TYPES) + NONENTITY_TAGS
EXL_TAGS: tuple[str, ...] = ("x",)  # punctuation can't sit inside a merge
