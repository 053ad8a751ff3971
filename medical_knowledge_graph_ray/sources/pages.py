"""Deterministic synthetic Common-Crawl-style web-page corpus.

Produces the exact ``input_hint`` table shape::

    url:string, warc_ts:timestamp[us], html:binary, text:large_string, lang:string

``text`` is the ground-truth extraction target: the HTML wraps it with
boilerplate (nav / script / style / ads / footer) that the extractor must
strip, and the extraction invariant is **byte-identical text per url**
(BASELINE.json input_hint).

Generation is a pure function of the page index → embarrassingly parallel
(``ray.data.range(n).map_batches(pages_batch)``) and reproducible at any
parallelism.  Content design mirrors the reference corpora: every page is
"about" one head entity (the reference's ``entity1``, ``pre_labeling.py:
189-204``), sections are keyed by relation headings (the reference's
``paragraph`` columns, ``structurize_files.py:608-628``), and sentences
embed gazetteer surface forms at known offsets.  ~20 % of pages share a
few *hot* head entities to exercise salted canonicalization (SURVEY §4
skew note).
"""

from __future__ import annotations

import html as _html
import random

import numpy as np
import pyarrow as pa

from ..ontology import MEDICAL_GAZETTEER, HEAD_ENTITY_TYPES, RELATIONS

SEED = 42
WARC_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in micros

_BY_TYPE: dict[str, list[str]] = {}
for _s, _t in MEDICAL_GAZETTEER.items():
    _BY_TYPE.setdefault(_t, []).append(_s)
for _v in _BY_TYPE.values():
    _v.sort()

HEAD_POOL: list[str] = sorted(
    s for s, t in MEDICAL_GAZETTEER.items() if t in HEAD_ENTITY_TYPES
)
# hot head entities: ~20% of pages concentrate on these three
HOT_HEADS: tuple[str, ...] = ("糖尿病", "高血压", "阿司匹林")

CORPUS_VERSION = 4  # bump to invalidate cached corpora under /tmp

# title-line decorations (O2): ~30% of pages wrap their head entity in a
# chapter heading / enumeration / prose title the extractor cascade must
# strip; the head entity is then NOT the raw title line.
_CN_NUM = ("一", "二", "三", "四", "五", "六", "七", "八", "九", "十")


def _decorate_title(rng: random.Random, head: str) -> str:
    r = rng.random()
    if r < 0.70:
        return head
    cn = rng.choice(_CN_NUM)
    if r < 0.80:
        return f"第{cn}章{head}"
    if r < 0.85:
        return f"第{cn}节{head}"
    if r < 0.92:
        return f"{cn}、{head}"
    if r < 0.97:
        return f"{cn}){head}"
    return f"关于{head}的诊疗指南"  # dictionary-scan fallback arm

# relation → sentence templates with per-slot entity types; templates
# exercise 、-joined runs, bracketed aliases, boundary punctuation,
# entity-free noise, suffix merges (ORG+造影/肿大, E3) and adjacent-entity
# merges (ORG SUR, E1/E2).
_TEMPLATES: dict[str, tuple[tuple[str, tuple[str, ...]], ...]] = {
    "clinical": (
        ("患者出现{0}和{1}", ("SYM", "SYM")),
        ("主要表现为{0}、{1}及{2}", ("SYM", "SYM", "SYM")),
        ("查体可见{0}", ("SYM",)),
        ("病程中常伴有{0}", ("BFL",)),
        ("严重时出现{0}，需密切观察", ("SYM",)),
        ("{0}肿大提示病情进展", ("ORG",)),  # E3: ORG + 肿大 → SYM
        # non-essential words exercising the E6 overlay (FW/DEG/AT/PT/PSB)
        ("患者反复出现{0}", ("SYM",)),
        ("无明显{0}，未见{1}", ("SYM", "SYM")),
        ("既往有{0}病史", ("DIS",)),
        ("疑似{0}，可能进展", ("DIS",)),
        ("样本中检出{0}", ("OBJ",)),  # 耐药基因 → E7 rm in training data
    ),
    "indications": (
        ("适用于{0}的治疗", ("DIS",)),
        ("用于{0}合并{1}者", ("DIS", "SYM")),
        ("对{0}及{1}均有效", ("DIS", "DIS")),
    ),
    "contraindiction": (
        ("对{0}过敏者禁用", ("DIS",)),
        ("{0}患者慎用", ("DIS",)),
        ("合并{0}者不宜使用", ("SYM",)),
    ),
    "treatment": (
        ("可使用{0}治疗", ("DRU",)),
        ("长期服用{0}需监测", ("DRU",)),  # DUR word for the E6 overlay
        ("首选{0}联合{1}", ("DRU", "DRU")),
        ("建议行{0}明确诊断", ("TES",)),
        ("必要时行{0}", ("SUR",)),
        ("{0}(常用)可缓解症状", ("DRU",)),
        ("行{0}造影评估病变", ("ORG",)),  # E3: ORG + 造影 → TES
        ("{0}{1}是常规术式", ("ORG", "SUR")),  # E1: [ORG, SUR] merge
    ),
    "complication": (
        ("可并发{0}或{1}", ("DIS", "DIS")),
        ("晚期可出现{0}", ("SYM",)),
    ),
    "TABOO": (
        ("孕妇禁用{0}", ("DRU",)),
        ("儿童慎用{0}", ("DRU",)),
        ("老人使用{0}需减量", ("DRU",)),
    ),
}

_NOISE_SENTENCES = ("随访观察即可", "具体用法详见说明书", "收缩压>140mmHg时复诊")
_EN_FILLER = (
    "This page is a stub",
    "See the references below",
    "Content pending medical review",
)


def _page_content(idx: int) -> tuple[str, str, str, list[str]]:
    """(head_entity, lang, text, html_blocks) for page ``idx`` — pure."""
    rng = random.Random(f"mkgpage|{SEED}|{idx}")
    lang = "en" if rng.random() < 0.05 else "zh"
    if lang == "en":
        head = f"Stub {idx}"
        sents = rng.sample(_EN_FILLER, k=2)
        blocks = [head, "【clinical】", ". ".join(sents) + "."]
        return head, lang, "\n".join(blocks), blocks

    head = (
        rng.choice(HOT_HEADS) if rng.random() < 0.20 else rng.choice(HEAD_POOL)
    )
    n_sections = rng.randint(2, 4)
    rels = rng.sample(RELATIONS, k=n_sections)
    blocks: list[str] = [_decorate_title(rng, head)]
    for rel in rels:
        templates = _TEMPLATES[rel]
        sents = []
        for _ in range(rng.randint(1, 4)):
            tmpl, slot_types = rng.choice(templates)
            ents = [rng.choice(_BY_TYPE[tp]) for tp in slot_types]
            sents.append(tmpl.format(*ents))
        if rng.random() < 0.15:
            sents.append(rng.choice(_NOISE_SENTENCES))
        if rng.random() < 0.05:
            sents.append("见上")  # len<=3 → sentence splitter must drop it
        blocks.append(f"【{rel}】")
        blocks.append("。".join(sents) + "。")
    return head, lang, "\n".join(blocks), blocks


def _render_html(idx: int, head: str, blocks: list[str]) -> bytes:
    """Wrap the content blocks in boilerplate HTML the extractor must strip."""
    esc = _html.escape
    parts = [
        "<html><head><title>", esc(head), " - 医学百科</title>",
        '<meta charset="utf-8"><script>var _q=[];_q.push(["t",',
        str(idx),
        ']);</script><style>body{margin:0;font:14px sans}nav a{color:#06c}</style></head>',
        '<body><nav><a href="/">首页</a><a href="/list">目录</a><a href="/about">关于</a></nav>',
        '<div class="ad">推广内容：点击了解更多优惠信息</div>',
        "<h1>", esc(blocks[0]), "</h1>",
    ]
    for i in range(1, len(blocks), 2):
        parts.append("<h2>")
        parts.append(esc(blocks[i]))
        parts.append("</h2><p>")
        parts.append(esc(blocks[i + 1]))
        parts.append("</p>")
    parts.append(
        '<footer><span>版权所有 © 2024 医学百科</span>'
        '<script>trackPage();</script></footer></body></html>'
    )
    return "".join(parts).encode("utf-8")


def pages_batch(batch: dict) -> pa.Table:
    """``ray.data.range(n)`` batch (column ``id``) → input_hint page table."""
    ids = np.asarray(batch["id"], dtype=np.int64)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for idx in ids.tolist():
        head, lang, text, blocks = _page_content(idx)
        urls.append(f"https://med{idx % 997:03d}.example.org/wiki/{idx:08d}")
        tss.append(WARC_EPOCH_US + idx * 1_000_000)
        htmls.append(_render_html(idx, head, blocks))
        texts.append(text)
        langs.append(lang)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.large_string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def generate_pages(
    n_pages: int, out_dir: str, *, overwrite: bool = False, num_files: int | None = None
) -> str:
    """Materialize the synthetic corpus as partitioned Parquet (idempotent).

    Uses Ray Data so generation itself scales out; a ``_SUCCESS`` marker
    makes re-runs skip completed corpora (resumable-output convention).
    """
    import os

    import ray.data as rd

    marker = os.path.join(out_dir, "_SUCCESS")
    stamp = (
        f"n_pages={n_pages}\nseed={SEED}\nversion={CORPUS_VERSION}\n"
        f"files={num_files or 'auto'}\n"
    )
    if os.path.exists(marker) and not overwrite:
        with open(marker) as f:
            if f.read() == stamp:
                return out_dir
    # stale version, overwrite, or a partial write from a crashed run
    # (files but no marker) — always start from an empty directory so a
    # rerun can never append a duplicate set of part files
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    blocks = num_files if num_files else max(1, n_pages // 4096)
    ds = rd.range(n_pages, override_num_blocks=blocks)
    # batch == block so map_batches can't fuse blocks (one output file each)
    ds = ds.map_batches(
        pages_batch,
        batch_format="pyarrow",
        batch_size=min(2048, max(1, -(-n_pages // blocks))),
    )
    ds.write_parquet(out_dir)
    with open(marker, "w") as f:
        f.write(stamp)
    return out_dir


def pages_table(n_pages: int) -> pa.Table:
    """Small in-process corpus for unit tests (no Ray)."""
    return pages_batch({"id": np.arange(n_pages, dtype=np.int64)})
