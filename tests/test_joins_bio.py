"""Hash join (J2), BIO round-trip (S4/S5/O10), split (R6), multimodal tests."""

import numpy as np
import pandas as pd
import pytest

from medical_knowledge_graph_ray.stages.bio import (
    bio_decode,
    bio_encode,
    split_of,
)


def test_bio_roundtrip():
    sentence = "患者出现发热和咳嗽"
    spans = [(4, 6, "SYM"), (7, 9, "SYM")]
    block = bio_encode(sentence, spans)
    lines = block.splitlines()
    assert lines[4] == "发\tB-SYM" and lines[5] == "热\tI-SYM"
    got_sentence, got_spans = bio_decode(block)
    assert got_sentence == sentence and got_spans == spans


def test_bio_decode_space_separated():
    block = "发 B-SYM\n热 I-SYM\n。 O"
    sent, spans = bio_decode(block)
    assert sent == "发热。" and spans == [(0, 2, "SYM")]


def test_bio_adjacent_entities_kept_separate():
    block = bio_encode("发热咳嗽", [(0, 2, "SYM"), (2, 4, "SYM")])
    _, spans = bio_decode(block)
    assert spans == [(0, 2, "SYM"), (2, 4, "SYM")]  # B- restarts the span


def test_split_deterministic_and_rates():
    splits = [split_of(f"u{i}", i % 7) for i in range(20_000)]
    assert splits == [split_of(f"u{i}", i % 7) for i in range(20_000)]
    rates = pd.Series(splits).value_counts(normalize=True)
    assert 0.9 < rates["train"] < 0.99
    assert 0.005 < rates["val"] < 0.025
    assert 0.004 < rates["test"] < 0.022


def test_hash_join_matches_pandas(ray_session):
    import ray.data as rd

    from medical_knowledge_graph_ray.stages.joins import hash_join

    rng = np.random.RandomState(3)
    left = pd.DataFrame({"k": rng.randint(0, 50, 300), "a": np.arange(300)})
    right = pd.DataFrame({"k": rng.randint(0, 50, 200), "b": np.arange(200) * 2})
    got = (
        hash_join(rd.from_pandas(left), rd.from_pandas(right), on=["k"], num_buckets=8)
        .to_pandas()
        .sort_values(["k", "a", "b"])
        .reset_index(drop=True)
    )
    want = (
        left.merge(right, on=["k"], how="inner")
        .sort_values(["k", "a", "b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["k", "a", "b"]].astype("int64"), want[["k", "a", "b"]].astype("int64")
    )


def test_hash_join_left(ray_session):
    import ray.data as rd

    from medical_knowledge_graph_ray.stages.joins import hash_join

    left = pd.DataFrame({"k": [1, 2, 3], "a": [10, 20, 30]})
    right = pd.DataFrame({"k": [1, 1], "b": [7, 8]})
    got = (
        hash_join(rd.from_pandas(left), rd.from_pandas(right), on=["k"], how="left")
        .to_pandas()
        .sort_values(["k", "b"])
        .reset_index(drop=True)
    )
    assert len(got) == 4  # k=1 twice, k=2/3 null-extended
    assert got[got["k"] == 2]["b"].isna().all()


def test_media_feature_plumbing(ray_session):
    from medical_knowledge_graph_ray.stages.multimodal import (
        MediaFeatureExtractor,
        media_features,
        synth_media_batch,
    )

    t = synth_media_batch({"id": np.arange(12)})
    assert t.num_rows == 12
    fx = MediaFeatureExtractor()
    out = fx(t)
    assert "payload" not in out.column_names and "features" in out.column_names
    feats = out["features"].to_pylist()
    assert all(len(f) == 16 and abs(sum(f) - 1.0) < 1e-5 for f in feats)
    with pytest.raises(ValueError):
        fx._decode_stub(b"")

    ds = media_features(48, concurrency=2)
    df = ds.to_pandas()
    assert len(df) == 48 and set(df["kind"]) == {"image", "audio", "video"}


def test_extraction_audit_statuses(ray_session):
    import pyarrow as pa

    from medical_knowledge_graph_ray.sources.pages import pages_table
    from medical_knowledge_graph_ray.stages.audit import audit_batch

    t = pages_table(60)
    out = audit_batch(t).to_pandas()
    assert len(out) == 60
    assert (out["status"] == "ok").sum() > 0
    assert (out["status"] == "non_target_lang").sum() >= 0
    # corrupted rows are classified, never dropped
    bad = pa.table(
        {
            "url": ["u1", "u2", "u3"],
            "html": [b"", b"<html><body><script>x</script></body></html>",
                     "<html><body><p>见上</p></body></html>".encode("utf-8")],
            "lang": ["zh", "zh", "zh"],
        }
    )
    audited = audit_batch(bad).to_pandas()
    assert list(audited["status"]) == ["empty_html", "no_blocks", "no_sentences"]
