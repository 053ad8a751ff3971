"""Compaction gates: content preservation, file-count reduction,
idempotent content-addressed outputs, resume no-op, FFD planning."""

import os
import sys
import time

import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="module")
def small_files(ray_session, tmp_path_factory):
    import ray.data as rd

    d = str(tmp_path_factory.mktemp("many") / "in")
    df = pd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "lang"],
    )
    rd.from_pandas(df).repartition(40).write_parquet(d)
    return d, df


def test_compact_preserves_rows_and_reduces_files(small_files, tmp_path):
    from medical_knowledge_graph_ray.stages.compact import compact_parquet

    in_dir, df = small_files
    out = str(tmp_path / "out")
    m = compact_parquet(in_dir, out, target_mb=1)
    assert m["input_files"] >= 40
    assert m["output_files"] < m["input_files"]
    assert m["rows"] == len(df)
    got = pd.read_parquet(out).sort_values("doc_id").reset_index(drop=True)
    want = df.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_compact_resume_and_idempotent_names(small_files, tmp_path):
    from medical_knowledge_graph_ray.stages.compact import compact_parquet

    in_dir, _df = small_files
    out1, out2 = str(tmp_path / "o1"), str(tmp_path / "o2")
    m1 = compact_parquet(in_dir, out1, target_mb=1)
    t0 = time.perf_counter()
    m1b = compact_parquet(in_dir, out1, target_mb=1)
    assert time.perf_counter() - t0 < 0.5  # manifest read only
    assert m1b == m1
    m2 = compact_parquet(in_dir, out2, target_mb=1)
    assert [o["file"] for o in m1["outputs"]] == [o["file"] for o in m2["outputs"]]


def test_ffd_planning_respects_target_and_singletons():
    from medical_knowledge_graph_ray.stages.compact import _plan_bins

    files = [("a", 90), ("b", 60), ("c", 40), ("d", 30), ("e", 200)]
    bins = _plan_bins(files, 100)
    # the oversize file is a singleton; every other bin fits the target
    assert ["e"] in bins
    sizes = dict(files)
    for members in bins:
        if members != ["e"]:
            assert sum(sizes[x] for x in members) <= 100
    assert sorted(x for b in bins for x in b) == ["a", "b", "c", "d", "e"]
