"""Composed LLM-prep flagship (pipelines/docs_prep.py): contracts of the
curate → decontaminate → split → pack → stats chain. The component
operators are individually SQL-oracled; these gates pin the COMPOSITION —
membership, split hygiene, pack budgets, exactly-once, resume."""

import shutil

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
OUT = "/tmp/mkg_test_docs_prep"


@pytest.fixture(scope="module")
def prep(ray_session):
    from medical_knowledge_graph_ray.pipelines.docs_prep import run_docs_prep

    shutil.rmtree(OUT, ignore_errors=True)
    manifests = run_docs_prep(SF, OUT)
    kept = pd.read_parquet(f"{OUT}/kept")
    packs = pd.read_parquet(f"{OUT}/packs")
    stats = pd.read_parquet(f"{OUT}/stats")
    return manifests, kept, packs, stats


def test_kept_is_curation_minus_contamination(prep, ray_session):
    from medical_knowledge_graph_ray.pipelines.docs import (
        docs_curation_neardup, docs_decontaminate,
    )

    _, kept, _, _ = prep
    survivors = set(docs_curation_neardup(SF).to_pandas()["doc_id"])
    flagged = docs_decontaminate(SF).to_pandas()
    bad = set(flagged.loc[flagged["n_hits"] > 0, "doc_id"])
    assert set(kept["doc_id"]) == survivors - bad


def test_split_matches_oracled_rule(prep, ray_session):
    from medical_knowledge_graph_ray.functions.hashing import md5_int

    _, kept, _, _ = prep
    for did, split in zip(kept["doc_id"], kept["split"]):
        h = md5_int(f"split|{did}", bits=32)
        want = "val" if h % 80 == 0 else ("test" if h % 90 == 0 else "train")
        assert split == want


def test_packs_exactly_once_and_budget(prep):
    from medical_knowledge_graph_ray.pipelines.docs import PACK_BUDGET

    _, kept, packs, _ = prep
    # every kept doc appears in exactly one pack slot
    assert sorted(packs["doc_id"]) == sorted(kept["doc_id"])
    # budget holds for every non-oversize pack; oversize packs are
    # singletons
    per_pack = packs.groupby("pack_id").agg(
        tokens=("n_tokens", "sum"), n=("doc_id", "size"),
        oversize=("oversize", "any"),
    )
    ok = per_pack["oversize"] | (per_pack["tokens"] <= PACK_BUDGET)
    assert ok.all()
    assert (per_pack.loc[per_pack["oversize"], "n"] == 1).all()
    # positions within a pack are 0..n-1
    pos_ok = packs.groupby("pack_id")["pos"].agg(
        lambda s: sorted(s) == list(range(len(s)))
    )
    assert pos_ok.all()


def test_packs_never_cross_splits(prep):
    _, kept, packs, _ = prep
    split_of = dict(zip(kept["doc_id"], kept["split"]))
    got = packs.assign(doc_split=packs["doc_id"].map(split_of))
    assert (got["doc_split"] == got["split"]).all()
    assert (packs.groupby("pack_id")["split"].nunique() == 1).all()


def test_stats_consistent(prep):
    _, kept, packs, stats = prep
    want_docs = kept.groupby("split").size()
    want_packs = packs.groupby("split")["pack_id"].nunique()
    for _, row in stats.iterrows():
        assert row["n_docs"] == want_docs[row["split"]]
        assert row["n_packs"] == want_packs[row["split"]]
    assert stats["n_tokens"].sum() == kept["n_tokens"].sum()


def test_sequences_materialize_the_packs(prep):
    _, kept, packs, _ = prep
    seqs = pd.read_parquet(f"{OUT}/sequences")
    per_pack = packs.groupby(["pack_id", "split"]).agg(
        n_docs=("doc_id", "size"), n_tokens=("n_tokens", "sum")
    ).reset_index()
    assert sorted(seqs["pack_id"]) == sorted(per_pack["pack_id"])
    m = seqs.merge(per_pack, on=["pack_id", "split"], suffixes=("", "_want"))
    assert len(m) == len(seqs)
    assert (m["n_docs"] == m["n_docs_want"]).all()
    assert (m["n_tokens"] == m["n_tokens_want"]).all()
    # the assembled text really carries that many whitespace tokens
    assert (
        seqs["text"].str.count(" ").astype("int64") + 1 == seqs["n_tokens"]
    ).all()


def test_resume_skips_everything(prep, ray_session):
    import time

    from medical_knowledge_graph_ray.pipelines.docs_prep import run_docs_prep

    manifests, _, _, _ = prep
    t0 = time.perf_counter()
    again = run_docs_prep(SF, OUT)
    assert time.perf_counter() - t0 < 1.0  # manifest reads only
    assert again == manifests


def test_partial_resume_rebuilds_only_downstream(prep, ray_session):
    from medical_knowledge_graph_ray.pipelines.docs_prep import run_docs_prep

    manifests, _, packs, _ = prep
    shutil.rmtree(f"{OUT}/packs")
    shutil.rmtree(f"{OUT}/sequences")
    shutil.rmtree(f"{OUT}/stats")
    again = run_docs_prep(SF, OUT)
    assert again["kept"] == manifests["kept"]  # untouched checkpoint
    re_packs = pd.read_parquet(f"{OUT}/packs")
    key = ["pack_id", "pos"]
    assert (
        re_packs.sort_values(key).reset_index(drop=True)
        .equals(packs.sort_values(key).reset_index(drop=True))
    )


def test_audit_green(prep):
    from medical_knowledge_graph_ray.state.manifests import audit_run

    assert audit_run(OUT)["ok"]
