"""Inverted-index gates: serve ≡ brute membership, manifest-keyed
resume, bucket pruning, and vocabulary-miss semantics."""

import json
import os
import sys
import time

import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    import ray.data as rd

    from medical_knowledge_graph_ray.stages.search import build_inverted_index

    d = str(tmp_path_factory.mktemp("idx"))
    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    build_inverted_index(docs, d)
    return d


def _brute(terms):
    df = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    keep = df["text"].map(lambda t: set(terms) <= set(str(t).split(" ")))
    return sorted(df.loc[keep, "doc_id"].astype("int64"))


def test_search_matches_brute_membership(index_dir):
    from medical_knowledge_graph_ray.stages.search import search_and

    for terms in (["dup"], ["spark", "vector"], ["dup", "spark", "vector"]):
        got = search_and(index_dir, terms)["doc_id"].tolist()
        assert got == _brute(terms), terms


def test_rebuild_is_manifest_keyed_noop(index_dir, ray_session):
    import ray.data as rd

    from medical_knowledge_graph_ray.stages.search import build_inverted_index

    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    t0 = time.perf_counter()
    m = build_inverted_index(docs, index_dir)
    assert time.perf_counter() - t0 < 0.5  # manifest read only
    assert m["rows"] > 0 and m["buckets"]


def test_serve_reads_only_term_buckets(index_dir):
    import numpy as np

    from medical_knowledge_graph_ray.functions.hashing import stable_bucket_vec
    from medical_knowledge_graph_ray.stages.search import N_SEARCH_BUCKETS

    with open(os.path.join(index_dir, "_MANIFEST.json")) as fh:
        m = json.load(fh)
    # every bucket file exists; a 1-term query's candidate file set is
    # exactly its hash bucket
    b = int(stable_bucket_vec(np.array(["dup"]), N_SEARCH_BUCKETS)[0])
    assert any(e["bucket"] == b for e in m["buckets"])
    assert len(m["buckets"]) <= N_SEARCH_BUCKETS


def test_unknown_term_and_empty_query(index_dir):
    from medical_knowledge_graph_ray.stages.search import search_and

    assert len(search_and(index_dir, ["zzz_not_a_token"])) == 0
    assert len(search_and(index_dir, ["dup", "zzz_not_a_token"])) == 0
    assert len(search_and(index_dir, [])) == 0


def test_search_ranked_bm25_brute_parity(index_dir):
    import math

    import numpy as np

    from medical_knowledge_graph_ray.stages.search import (
        BM25_B, BM25_K1, search_ranked,
    )

    terms = ["dup", "spark", "vector"]
    got = search_ranked(index_dir, terms, k=10)
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    toks = docs["text"].astype(str).str.split(" ")
    n_docs = len(docs)
    dl = toks.str.len().to_numpy().astype("float64")
    avgdl = float(dl.sum()) / n_docs
    rows = {}
    df_map = {
        t: int(sum(t in set(tk) for tk in toks)) for t in terms
    }
    for i, tk in enumerate(toks):
        s = 0.0
        for t in sorted(terms):
            tf = float(tk.count(t))
            if tf == 0:
                continue
            d = df_map[t]
            idf = math.log((n_docs - d + 0.5) / (d + 0.5) + 1)
            w = idf * tf * (BM25_K1 + 1) / (
                tf + BM25_K1 * (1 - BM25_B + BM25_B * dl[i] / avgdl)
            )
            s += np.round(w, 6)
        if s > 0:
            rows[int(docs["doc_id"].iloc[i])] = round(float(np.round(s, 6)), 6)
    want = sorted(rows.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got["doc_id"].tolist() == [d for d, _ in want]
    assert got["score"].to_numpy() == pytest.approx(
        [s for _, s in want], abs=1e-9
    )


def test_merge_indexes_equals_full_build(ray_session, tmp_path):
    """merge(build(A), build(B)) ≡ build(A ∪ B) exactly — manifests,
    per-bucket files, and BM25 serving all agree."""
    import ray.data as rd

    from medical_knowledge_graph_ray.stages.search import (
        build_inverted_index, merge_indexes, search_ranked,
    )

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    a, b = docs[docs["doc_id"] % 2 == 0], docs[docs["doc_id"] % 2 == 1]
    da, db, dm, dfull = (str(tmp_path / x) for x in ("a", "b", "m", "full"))
    build_inverted_index(rd.from_pandas(a), da)
    build_inverted_index(rd.from_pandas(b), db)
    merged = merge_indexes([da, db], dm)
    full = build_inverted_index(rd.from_pandas(docs), dfull)
    assert merged["rows"] == full["rows"]
    assert merged["total_tf"] == full["total_tf"]
    assert merged["n_docs"] == full["n_docs"]
    for e in full["buckets"]:
        fm = pd.read_parquet(f"{dm}/bucket={e['bucket']:04d}.parquet")
        ff = pd.read_parquet(f"{dfull}/bucket={e['bucket']:04d}.parquet")
        pd.testing.assert_frame_equal(
            fm.reset_index(drop=True), ff.reset_index(drop=True)
        )
    terms = ["dup", "spark", "vector"]
    pd.testing.assert_frame_equal(
        search_ranked(dm, terms), search_ranked(dfull, terms)
    )


def test_phrase_search_adjacency_and_repeats(ray_session, tmp_path):
    import ray.data as rd

    from medical_knowledge_graph_ray.stages.search import (
        build_inverted_index, search_phrase,
    )

    docs = pd.DataFrame(
        {"doc_id": pd.array([1, 2, 3, 4], "int64"),
         "text": ["a b c", "b a c", "x batch batch y", "batch x batch"]}
    )
    d = str(tmp_path / "pidx")
    build_inverted_index(rd.from_pandas(docs), d)
    assert search_phrase(d, ["a", "b"])["doc_id"].tolist() == [1]
    assert search_phrase(d, ["b", "a"])["doc_id"].tolist() == [2]
    assert search_phrase(d, ["a", "b", "c"])["doc_id"].tolist() == [1]
    # repeated phrase token: same posting list at two offsets
    assert search_phrase(d, ["batch", "batch"])["doc_id"].tolist() == [3]
    assert search_phrase(d, ["a", "z"])["doc_id"].tolist() == []
    assert search_phrase(d, [])["doc_id"].tolist() == []


def test_phrase_search_matches_like_oracle(index_dir):
    from medical_knowledge_graph_ray.stages.search import search_phrase

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    want = sorted(
        int(r.doc_id)
        for r in docs.itertuples()
        if " spark window " in f" {r.text} "
    )
    got = search_phrase(index_dir, ["spark", "window"])["doc_id"].tolist()
    assert got == want and len(want) > 0


def test_serve_collects_bounded_rows_on_common_token(index_dir):
    """Distributed top-k: the driver must collect ≤ serve-buckets×k rows
    even when a query term matches a large fraction of the corpus — the
    truncation happens inside the doc buckets, not driver-side."""
    from medical_knowledge_graph_ray.stages.search import (
        LAST_SERVE_COLLECTED,
        N_SERVE_BUCKETS,
        search_and,
        search_phrase,
        search_ranked,
    )

    # most common token of the corpus = the worst-case posting list
    df = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["text"])
    common = (
        df["text"].str.split(" ").explode().value_counts().index[0]
    )
    n_match = int(
        df["text"].map(lambda t: common in set(str(t).split(" "))).sum()
    )
    k = 10
    assert n_match > N_SERVE_BUCKETS * k  # the bound must actually bite

    top = search_ranked(index_dir, [common], k=k)
    assert len(top) == k
    assert LAST_SERVE_COLLECTED["ranked"] <= N_SERVE_BUCKETS * k

    full = search_and(index_dir, [common])
    lim = search_and(index_dir, [common], limit=k)
    assert LAST_SERVE_COLLECTED["and"] <= N_SERVE_BUCKETS * k
    # limited result = globally smallest k matches of the full set
    assert lim["doc_id"].tolist() == full["doc_id"].head(k).tolist()

    pfull = search_phrase(index_dir, [common])
    plim = search_phrase(index_dir, [common], limit=k)
    assert LAST_SERVE_COLLECTED["phrase"] <= N_SERVE_BUCKETS * k
    assert plim["doc_id"].tolist() == pfull["doc_id"].head(k).tolist()


def test_lm_and_rrf_serve(index_dir):
    """LM leg: brute-force query-likelihood parity + the ≤ buckets×k
    collection bound; RRF: pure-integer fusion of the two legs' ranks."""
    import math

    import numpy as np

    from medical_knowledge_graph_ray.stages.search import (
        LAST_SERVE_COLLECTED,
        LM_MU,
        N_SERVE_BUCKETS,
        RRF_K0,
        search_lm,
        search_ranked,
        search_rrf,
    )

    terms = ["dup", "spark", "vector"]
    k = 10
    got = search_lm(index_dir, terms, k=k)
    assert LAST_SERVE_COLLECTED["lm"] <= N_SERVE_BUCKETS * k

    # brute-force reference on the raw corpus
    df = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"])
    toks = df["text"].str.split(" ")
    dl = toks.map(len).to_numpy("int64")
    total_tf = float(dl.sum())
    ctf = {t: int(toks.map(lambda ws: ws.count(t)).sum()) for t in terms}
    scores = {}
    for i, ws in enumerate(toks):
        tfs = {t: ws.count(t) for t in terms}
        if not any(tfs.values()):
            continue
        s = 0.0
        for t in sorted(set(terms)):
            arg = (tfs[t] + LM_MU * float(ctf[t]) / total_tf) / (dl[i] + LM_MU)
            s += round(math.log(arg), 6)
        scores[int(df["doc_id"].iloc[i])] = round(s, 6)
    ref = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert list(zip(got["doc_id"], got["score"])) == ref

    # RRF = integer fusion of the two legs' deterministic ranks
    bm = search_ranked(index_dir, terms, k=20)
    lm = search_lm(index_dir, terms, k=20)
    fused = {}
    for leg in (bm, lm):
        for r, d in enumerate(leg["doc_id"], start=1):
            fused[int(d)] = fused.get(int(d), 0) + 1_000_000 // (RRF_K0 + r)
    ref_rrf = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    got_rrf = search_rrf(index_dir, terms, k=k, n_cand=20)
    assert list(zip(got_rrf["doc_id"], got_rrf["rrf_micro"])) == ref_rrf
