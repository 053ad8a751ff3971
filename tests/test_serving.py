"""Serving deployment: the long-lived actor answers the reference app
contract and can never diverge from the in-process library calls
(online ≡ offline, through the actor boundary)."""

import numpy as np
import pandas as pd
import pytest
import ray

from medical_knowledge_graph_ray.serving import ModelServer, deploy
from medical_knowledge_graph_ray.stages.ner import EnsembleNER

_GAZ = {"心内膜炎": "DIS", "心肌病": "DIS", "血压计": "EQM", "感染": "SYM"}
_SENT = "感染性心内膜炎患者用血压计测量,心肌病待查。"


def test_actor_predict_matches_library(ray_session):
    """deploy() → named actor; actor.predict ≡ in-process ModelServer
    ≡ raw EnsembleNER, and the response is the reference's indexed
    [surface, type, type_name, position, prob] record shape."""
    server = deploy("t_serve_a", gazetteer=_GAZ)
    got = ray.get(server.predict.remote({"sentence": _SENT}))

    local = ModelServer(gazetteer=_GAZ).predict({"sentence": _SENT})
    assert got == local

    raw = EnsembleNER(_GAZ).predict_sentences([_SENT])[0]["mentions"]
    ens = [m for m in raw if m["model"] == "ensemble_strong"]
    assert len(got) == len(ens) > 0
    for i, m in enumerate(ens):
        surface, etype, tname, pos, prob = got[str(i)]
        assert surface == m["ent_name"] == _SENT[pos[0]: pos[1]]
        assert etype == m["ent_type"]
        assert isinstance(tname, str) and tname
        assert prob == m["prob"]


def test_actor_is_long_lived_and_idempotent(ray_session):
    """A second deploy of the same name returns the SAME running actor
    (request counter keeps counting), and predict_batch passes the full
    S8 member records through."""
    s1 = deploy("t_serve_b", gazetteer=_GAZ)
    ray.get(s1.predict.remote({"sentence": _SENT}))
    s2 = deploy("t_serve_b", gazetteer=_GAZ)
    ray.get(s2.predict.remote({"sentence": _SENT}))
    h = ray.get(s2.health.remote())
    assert h["ok"] and h["n_requests"] == 2

    batch = ray.get(s2.predict_batch.remote([_SENT]))
    assert batch == EnsembleNER(_GAZ).predict_sentences([_SENT])
    models = {m["model"] for m in batch[0]["mentions"]}
    assert "dictionary" in models and "ensemble_strong" in models


def test_actor_search_serve_matches_direct(ray_session, tmp_path):
    """The actor's search endpoint over a persisted index returns the
    same records as the direct serve calls."""
    from medical_knowledge_graph_ray.stages.search import (
        build_inverted_index, search_ranked,
    )

    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": np.arange(8, dtype="int64"),
        "text": [
            "hash join beats merge join",
            "table scan then filter",
            "index scan with filter",
            "merge join on sorted runs",
            "window agg after sort",
            "hash join with bloom filter",
            "scan filter join",
            "sort merge join spill",
        ],
    }))
    idx = str(tmp_path / "idx")
    build_inverted_index(docs, idx)

    server = deploy("t_serve_c", gazetteer=_GAZ, index_dir=idx)
    got = ray.get(server.search.remote(
        {"q": ["join", "filter"], "mode": "ranked", "k": 5}))
    want = search_ranked(idx, ["join", "filter"], k=5).to_dict(
        orient="records")
    assert got == want

    got_and = ray.get(server.search.remote({"q": ["join"], "mode": "and"}))
    assert {r["doc_id"] for r in got_and} == {0, 3, 5, 6, 7}


def test_server_without_index_rejects_search(ray_session):
    with pytest.raises(ValueError):
        ModelServer(gazetteer=_GAZ).search({"q": ["x"], "mode": "and"})
