"""Extraction + sentence-split unit tests (no Ray needed)."""

from medical_knowledge_graph_ray.sources.pages import pages_table
from medical_knowledge_graph_ray.stages.extract import extract_html, extract_text_batch
from medical_knowledge_graph_ray.stages.sentences import split_document


def test_extract_byte_identical_per_url():
    """input_hint invariant: extracted text == ground-truth text, every page."""
    t = pages_table(300)
    for html, text in zip(t["html"].to_pylist(), t["text"].to_pylist()):
        assert extract_html(html) == text


def test_extract_strips_boilerplate():
    raw = (
        b"<html><head><script>evil()</script><style>a{}</style></head>"
        b"<body><nav><a href='/'>home</a></nav><h1>Title</h1>"
        b"<p>Body &amp; more</p><footer>c</footer></body></html>"
    )
    assert extract_html(raw) == "Title\nBody & more"


def test_extract_batch_replaces_text_column():
    t = pages_table(8)
    out = extract_text_batch(t)
    assert out["text"].to_pylist() == t["text"].to_pylist()
    assert out.num_rows == 8


def test_split_document_basic():
    text = "糖尿病\n【clinical】\n患者出现发热和咳嗽。见上。查体可见水肿。"
    rows = split_document(text)
    sents = [r[0] for r in rows]
    assert sents == ["患者出现发热和咳嗽", "查体可见水肿"]  # len<=3 dropped
    assert all(r[1] == "糖尿病" and r[2] == "DIS" and r[3] == "clinical" for r in rows)


def test_split_document_paragraph_switches():
    text = "高血压\n【treatment】\n可使用呋塞米治疗。\n【TABOO】\n孕妇禁用阿司匹林。"
    rows = split_document(text)
    assert [(r[0], r[3]) for r in rows] == [
        ("可使用呋塞米治疗", "treatment"),
        ("孕妇禁用阿司匹林", "TABOO"),
    ]


def test_split_document_semicolon_and_space():
    text = "胃炎\n【clinical】\n患者出现腹痛；伴有恶心 病程中常伴有乏力。"
    sents = [r[0] for r in split_document(text)]
    assert sents == ["患者出现腹痛", "伴有恶心", "病程中常伴有乏力"]


def test_extract_head_cascade_arms():
    """O2 cascade (structurize_files.py:39-67, 302-326): every arm."""
    from medical_knowledge_graph_ray.stages.sentences import extract_head

    assert extract_head("第三章糖尿病") == "糖尿病"
    assert extract_head("第十节高血压") == "高血压"
    assert extract_head("第一部分肺炎") == "肺炎"
    assert extract_head("三、慢性胃炎") == "慢性胃炎"
    assert extract_head("七)心律失常") == "心律失常"
    assert extract_head("关于阿司匹林的诊疗指南") == "阿司匹林"  # dict scan
    # longest-first scan: the full overlapping surface wins
    assert extract_head("关于慢性心力衰竭的指南") == "慢性心力衰竭"
    # exclusion veto
    assert extract_head("一、概述") is None
    assert extract_head("第一章概述") is None
    # nothing matches
    assert extract_head("Stub 42") is None


def test_split_document_head_not_line_one():
    from medical_knowledge_graph_ray.stages.sentences import split_document

    text = "第二章糖尿病\n【clinical】\n患者出现发热和头痛。"
    rows = split_document(text)
    assert rows and rows[0][1] == "糖尿病" and rows[0][2] == "DIS"
    # veto falls back to the raw title line (per-page model needs a head)
    rows = split_document("一、概述\n【clinical】\n患者出现发热和头痛。")
    assert rows and rows[0][1] == "一、概述"


def test_corpus_contains_decorated_titles():
    from medical_knowledge_graph_ray.sources.pages import pages_table
    from medical_knowledge_graph_ray.stages.sentences import extract_head

    t = pages_table(300)
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    decorated = plain = 0
    for text, lang in zip(texts, langs):
        if lang != "zh":
            continue
        title = text.split("\n", 1)[0]
        if title.startswith("第") or "、" in title or ")" in title or title.startswith("关于"):
            decorated += 1
            assert extract_head(title) is not None
        else:
            plain += 1
    assert decorated > 20 and plain > 100
