"""Flagship KG-construction pipeline (pages → nodes/edges Parquet).

The Ray-Data-first re-expression of the reference's end-to-end flow
(``structurize_files.py`` → ``pre_labeling.py`` → ``EnsemblePredict_all.py``
→ ``clean_and_save.py``; SURVEY §3, §7.1)::

    read_parquet(pages: url, warc_ts, html, text, lang)        # prune: url/html/lang only
     → map_batches(extract_text)        stateless               # byte-identical text per url
     → map_batches(split_sentences)     stateless, explode
     → map_batches(EnsembleNER, actor pool)                     # members + dict + voting resident per actor
     → map_batches(clean → dedup → triples)  stateless, batch-local D2
     → checkpoint triples (Parquet + lineage manifest)
     → nodes:  partial combine → groupby(node key) agg          # shuffle #1 (tiny: partials only)
     → edges:  partial combine → groupby(s,p,o) agg → sort(subj)# shuffle #2 + range sort

Branching note: nodes and edges both derive from triples; the triple set is
**checkpointed to Parquet** first so the expensive NER stage runs exactly
once and both aggregations re-read the (much smaller) checkpoint — this is
also the resume point (state/manifests.py).
"""

from __future__ import annotations

import os

import pyarrow.compute as pc

from ..functions.arrow import read_parquet_clean
from ..sources.pages import generate_pages
from ..stages.canonicalize import (
    finalize_edges,
    finalize_nodes,
    partial_edges_batch,
    partial_nodes_batch,
)
from ..stages.extract import extract_text_batch
from ..stages.ner import EnsembleNER
from ..stages.sentences import split_batch
from ..stages.triples import (
    clean_mentions_batch,
    dedup_mentions_batch,
    emit_triples_batch,
)
from ..state.manifests import read_stage, stage_complete, write_stage

# corpus size per scale-factor dir name (deterministic synthetic corpus;
# sf0.001 ≈ driver smoke, sf0.01 ≈ correctness, sf0.1 ≈ bench).  The bench
# corpus is sized so per-batch compute dominates the fixed per-run costs
# (~11 s: 3 execution startups + actor-pool spin-up + checkpoint write) —
# at 50 k pages those constants capped two-scale efficiency at ~0.5.
PAGES_PER_SF = {"sf0.001": 500, "sf0.01": 20_000, "sf0.1": 400_000}


def _default_concurrency() -> int:
    """Fixed actor-pool size = cluster CPUs minus headroom for the read /
    write task operators.  A pool that reserves every CPU deadlocks the
    streaming executor (upstream tasks can never run) — MEASURED at 2
    CPUs, where the old ``max(2, cpus-4)`` floor took both cores and the
    read task backpressured forever — so the size is additionally capped
    at ``cpus - 1`` (≥1 CPU always free for the task operators).  An
    autoscaling pool ramps up too slowly for short jobs — measured
    10.4 s (autoscale 1→32) vs 5.5 s (fixed 28) for the identical sf0.1
    flagship run."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(1, min(cpus - 1, max(2, cpus - 4)))


def pages_dataset(corpus_dir: str):
    """Open the page corpus reading ONLY the pipeline's columns (the
    ground-truth ``text`` column stays on disk — it is the oracle, not an
    input)."""
    import ray.data as rd

    return read_parquet_clean(
        corpus_dir,
        columns=["url", "html", "lang"],
        filter=pc.equal(pc.field("lang"), "zh"),
    )


def corpus_for_sf(sf_dir: str, root: str = "/tmp/mkg_corpus") -> str:
    """Materialize (once) the deterministic page corpus sized for a
    testdata scale-factor dir; returns the corpus directory."""
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    n = PAGES_PER_SF.get(sf_name, 500)
    out = os.path.join(root, sf_name)
    return generate_pages(n, out)


class MentionStage:
    """ONE actor pool for the whole per-sentence path: ensemble NER → O14
    boundary strip → E4/E5 rule merging → D2 max-prob dedup → O15
    confidence cleansing → triple emission (implicit + taboo).

    Everything after the NER call is batch-local by construction (all
    mentions of a sentence live in the emitting batch), so chaining the
    stages inside one actor removes five object-store round-trips per
    batch AND avoids multiple actor pools contending for CPUs (two pools
    on a small node can deadlock the streaming executor waiting for
    actors that can never start).
    """

    def __init__(self, gazetteer: dict[str, str] | None = None, config=None):
        from ..config import EngineConfig
        from ..stages.ner import EnsembleNER
        from ..stages.rules_stage import RulesMerge

        cfg = config or EngineConfig()
        gaz = gazetteer if gazetteer is not None else cfg.gazetteer
        # ner_on=False (reference switch): dictionary-only labeling
        members = cfg.prediction_models if cfg.ner_on else ()
        # trained tagger as a voting member (M2): each actor loads the
        # sparse weight artifact once in __init__ (shared-FS path, same
        # visibility requirement as run_kg's sinks)
        trained_w = None
        if cfg.trained_model_dir and cfg.ner_on:
            from ..stages.perceptron import load_tagger

            trained_w = load_tagger(cfg.trained_model_dir)
        neural_p = None
        if cfg.neural_model_dir and cfg.ner_on:
            from ..stages.neural import load_neural

            neural_p = load_neural(cfg.neural_model_dir)
        self.ner = EnsembleNER(
            gaz, members=members,
            eval_override=cfg.eval_override,
            trained_weights=trained_w,
            neural_params=neural_p,
        )
        self.rules = RulesMerge(gaz) if cfg.merging else None

    def __call__(self, batch):
        import pandas as pd
        import pyarrow as pa

        from ..stages.cleansing import confidence_rules_df
        from ..stages.triples import (
            TRIPLE_SCHEMA,
            clean_mentions_df,
            dedup_mentions_df,
            emit_triples_df,
        )

        # ONE arrow→pandas conversion after NER, ONE pandas→arrow at the
        # end — the intermediate stages chain on the same DataFrame
        m = self.ner(batch)
        mdf = clean_mentions_df(m.to_pandas())
        if self.rules is not None:
            new = self.rules.augment(batch.to_pandas(), mdf)
            if len(new):
                mdf = pd.concat([mdf, new], ignore_index=True)
        mdf = dedup_mentions_df(mdf)
        mdf = confidence_rules_df(mdf)
        out = emit_triples_df(mdf)
        return pa.Table.from_pandas(out, schema=TRIPLE_SCHEMA, preserve_index=False).replace_schema_metadata(None)


def triples_dataset(
    pages, *, ner_concurrency=None, ner_batch_size: int | None = None,
    sentence_tee=None, config=None,
):
    """pages Dataset → lazy triples Dataset (no checkpoint).

    Stage order mirrors the reference lifecycle (SURVEY §3.3): extract →
    split → [MentionStage actor pool: NER + strip + rules + dedup +
    cleansing + triples].

    ``sentence_tee``: optional pass-through ``pa.Table → pa.Table``
    inserted after the split — run_kg uses it to write the source_info
    lineage table from the SAME execution (a separate extract+split pass
    cost a whole extra execution's fixed overhead).

    ``config``: an ``EngineConfig`` (gazetteer override, ensemble member
    registry, ner_on / merging switches, tuning — SURVEY §2.12)."""
    conc = ner_concurrency or (
        config.ner_concurrency if config and config.ner_concurrency else None
    ) or _default_concurrency()
    # explicit arg > config knob > default (the arg default must be None
    # or the config knob is dead)
    batch_size = ner_batch_size or (
        config.ner_batch_size if config and config.ner_batch_size else None
    ) or 512
    text = pages.map_batches(extract_text_batch, batch_format="pyarrow")
    text = text.select_columns(["url", "text"])
    sents = text.map_batches(split_batch, batch_format="pyarrow")
    if sentence_tee is not None:
        sents = sents.map_batches(sentence_tee, batch_format="pyarrow")
    # GPU-aware scorer pool: a per-actor GPU reservation (no-op when the
    # config leaves it None — this CPU sandbox — but on a GPU cluster the
    # pool schedules onto GPU nodes exactly like the reference's
    # model.cuda() path, multi_source_ner.py:819-825)
    gpu_kw = (
        {"num_gpus": config.ner_num_gpus}
        if config is not None and config.ner_num_gpus
        else {}
    )
    return sents.map_batches(
        MentionStage,
        fn_constructor_kwargs={"config": config} if config is not None else None,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=conc,
        num_cpus=1,
        **gpu_kw,
    )


def sentences_dataset(corpus_dir: str):
    """pages → (url, sent_ord, sentence, …) rows (the shared prefix of the
    flagship, BIO-export and evaluation pipelines)."""
    pages = pages_dataset(corpus_dir)
    text = pages.map_batches(extract_text_batch, batch_format="pyarrow")
    return text.select_columns(["url", "text"]).map_batches(
        split_batch, batch_format="pyarrow"
    )


def source_info_dataset(corpus_dir: str):
    """Sentence-lineage table (``source_info``, ``clean_and_save.py:
    561-597``): one row per sentence with its head entity,
    section/paragraph and provenance, globally sorted by the
    content-stable key — the R1 ``sort_values("ind")`` analogue.  The
    reference's integer ``ind`` becomes (url, sent_ord); ``corpus``
    becomes the page language (the c/m/d/kd source label has no analogue
    in a single web-page table)."""
    sents = sentences_dataset(corpus_dir)
    return sents.sort(["url", "sent_ord"])


def write_source_info(corpus_dir: str, out_root: str, *, resume: bool = True) -> dict:
    """STANDALONE source_info writer (own extract+split pass).

    ``run_kg`` does NOT use this: it tees the sentence stream out of the
    triples execution (``sentence_tee``), which costs no extra pipeline
    pass; use this form to (re)build the lineage table without running
    the full KG.  The materialized table is sorted WITHIN each file, not
    globally: a global sort is a full-table range shuffle of the largest
    intermediate (measured +17 s of the sf0.1 flagship for zero
    analytical gain — any reader wanting global order range-merges the
    sorted files, and `source_info_dataset` still offers the globally
    sorted R1 form as a query)."""
    import shutil

    import pyarrow as pa

    def _sort_block(t: pa.Table) -> pa.Table:
        return t.sort_by([("url", "ascending"), ("sent_ord", "ascending")])

    # the two writers use different layouts (flat part files here,
    # shard_NNNN/ dirs in run_kg's tee) — remove the OTHER layout's
    # remnants so a mixed directory can never double-count sentences
    target = os.path.join(out_root, "source_info")
    if os.path.isdir(target):
        for name in os.listdir(target):
            if name.startswith("shard_"):
                shutil.rmtree(os.path.join(target, name), ignore_errors=True)

    fp = f"corpus={_corpus_fingerprint(corpus_dir)}|source_info"
    return write_stage(
        sentences_dataset(corpus_dir).map_batches(
            _sort_block, batch_format="pyarrow"
        ),
        os.path.join(out_root, "source_info"),
        "source_info",
        fp,
        force=not resume,
    )


def ner_eval_pages(sf_dir: str, *, heldout_only: bool = True):
    """MUC evaluation over the sf-scaled page corpus (driver query)."""
    return ner_eval_corpus(corpus_for_sf(sf_dir), heldout_only=heldout_only)


def ner_eval_corpus(
    corpus_dir: str, *, heldout_only: bool = True,
    trained_model_dir: str | None = None,
    neural_model_dir: str | None = None,
):
    """MUC-style evaluation table over a page corpus: every ensemble
    member + ensemble_strong scored against the gazetteer gold span set —
    the reference's quality gate as a first-class distributed operator
    (``multi_ner_prediction.py:75-84, 595-606``).

    ``heldout_only`` (default): evaluate the content-stable val+test
    splits (~2.3% of sentences) — the reference evaluates held-out test
    sets, never the training corpus (``generation.py:446-455``,
    ``clean_and_save.py:763-768``); pass False for a full-corpus audit."""
    import pyarrow as pa

    from ..stages.bio import split_heldout_mask
    from ..stages.muc_eval import ner_eval_dataset

    sents = sentences_dataset(corpus_dir)
    if heldout_only:
        def keep_heldout(t: pa.Table) -> pa.Table:
            # vectorized split decision (identical md5 contract as
            # split_of) — the per-row loop here was the most expensive
            # single stage of BENCH_r02 (11.8 s ner_eval wall)
            mask = split_heldout_mask(t.column("url"), t.column("sent_ord"))
            return t.filter(pa.array(mask))

        sents = sents.map_batches(keep_heldout, batch_format="pyarrow")
    return (
        ner_eval_dataset(sents, trained_model_dir=trained_model_dir,
                         neural_model_dir=neural_model_dir)
        .sort_values(["model", "ent_type", "schema"])
        .reset_index(drop=True)
    )


def derived_eval_artifacts(sf_dir: str):
    """(eval_matrix, vote_weights) COMPUTED from the labeled corpus — the
    ``eval_dic.json`` / ``model_weights.json`` production path
    (``multi_ner_prediction.py:139-159, 609-610``), replacing the
    hash-fabricated stand-ins.  The evaluated table is tiny
    (#models × types × schemas); collecting it driver-side is the
    broadcast-artifact pattern, not a materialization."""
    from ..stages.muc_eval import eval_matrix_from, weights_from_eval

    eval_df = ner_eval_pages(sf_dir)
    return eval_matrix_from(eval_df), weights_from_eval(eval_df)


def _corpus_fingerprint(corpus_dir: str) -> str:
    """Content-aware corpus identity: abspath + sorted (file, size) digest
    (+ the generator stamp when present).  Path-only fingerprints returned
    stale checkpoints after a corpus was regenerated in place."""
    import hashlib

    parts = [os.path.abspath(corpus_dir)]
    for name in sorted(os.listdir(corpus_dir)):
        p = os.path.join(corpus_dir, name)
        if name.endswith(".parquet"):
            parts.append(f"{name}:{os.path.getsize(p)}")
        elif name == "_SUCCESS":
            with open(p) as fh:
                parts.append(fh.read())
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:16]


def _config_fingerprint(config) -> str:
    """Semantic config digest — a different gazetteer / member registry /
    switch set must invalidate the triple checkpoints (tuning fields are
    excluded: they don't change results)."""
    import hashlib

    if config is None:
        return "default"
    ev = config.eval_override
    # trained model identity = CONTENT (weights file digest), not path —
    # retraining into the same directory must invalidate checkpoints
    trained_sig = None
    if config.trained_model_dir:
        wpath = os.path.join(config.trained_model_dir, "weights.parquet")
        trained_sig = f"{wpath}:{os.path.getsize(wpath)}:{int(os.path.getmtime(wpath))}"
    neural_sig = None
    if getattr(config, "neural_model_dir", None):
        npath = os.path.join(config.neural_model_dir, "neural.npz")
        neural_sig = f"{npath}:{os.path.getsize(npath)}:{int(os.path.getmtime(npath))}"
    sem = (
        sorted((config.gazetteer or {}).items()) if config.gazetteer else None,
        config.prediction_models,
        config.ner_on,
        config.merging,
        trained_sig,
        neural_sig,
        # eval_override changes every mention's confidence → results
        sorted((m, sorted(v.items())) for m, v in ev.items()) if ev else None,
    )
    if sem == (None, None, True, True, None, None, None):  # semantically default
        return "default"  # (a tuning-only config must NOT invalidate)
    return hashlib.md5(repr(sem).encode()).hexdigest()[:12]


def merge_graph_runs(
    out_roots: list[str], merged_out: str, *, resume: bool = True
) -> dict:
    """Incremental KG maintenance: nodes + edges re-finalized from the
    UNION of several runs' triples checkpoints.

    The 100-TB corpus-append story: a new crawl slice goes through
    ``run_kg`` against its OWN ``out_root`` (extraction + NER run only on
    the delta pages), then this merge rebuilds the graph tables from all
    triples checkpoints — which are orders of magnitude smaller than the
    page corpora, and the canonicalization half of the pipeline is the
    cheap half.  Because node/edge aggregation is associative
    (sum/max/count over content-hash keys), ``merge(run(A), run(B)) ≡
    run(A ∪ B)`` EXACTLY — pinned by ``test_merge_graph_runs_equals_
    single_run``.  No reference analogue (the reference recomputes from
    scratch, clean_and_save.py end-to-end); this is the operational gap
    a production graph needs closed.

    Returns {"nodes": manifest, "edges": manifest} under ``merged_out``.
    """
    import hashlib
    import json

    # merged fingerprint = digest of every input shard manifest's
    # fingerprint (any input change invalidates the merge)
    parts = []
    for root in sorted(out_roots):
        tri_dir = os.path.join(root, "triples")
        for name in sorted(os.listdir(tri_dir)):
            mpath = os.path.join(tri_dir, name, "_MANIFEST.json")
            if name.startswith("shard_") and os.path.exists(mpath):
                with open(mpath) as f:
                    m = json.load(f)
                parts.append(f"{m['fingerprint']}|rows={m['rows']}")
    fp = "merge|" + hashlib.md5("\n".join(parts).encode()).hexdigest()[:16]

    from ..stages.canonicalize import finalize_graph_write

    nodes_dir = os.path.join(merged_out, "nodes")
    edges_dir = os.path.join(merged_out, "edges")
    manifests: dict[str, dict] = {}
    if (
        resume
        and stage_complete(nodes_dir, fp)
        and stage_complete(edges_dir, fp)
    ):
        for stage_name, d in (("nodes", nodes_dir), ("edges", edges_dir)):
            with open(os.path.join(d, "_MANIFEST.json")) as f:
                manifests[stage_name] = json.load(f)
        return manifests

    tri = None
    for root in out_roots:
        ds = read_stage(os.path.join(root, "triples"))
        tri = ds if tri is None else tri.union(ds)
    m_nodes, m_edges = finalize_graph_write(tri, nodes_dir, edges_dir, fp)
    manifests["nodes"] = m_nodes
    manifests["edges"] = m_edges
    return manifests


def run_kg(
    corpus_dir: str,
    out_root: str,
    *,
    ner_concurrency=None,
    resume: bool = True,
    n_shards: int = 8,
    config=None,
) -> dict:
    """Full run with checkpoints: url-hash-sharded triples → nodes + edges.

    Returns {"triples": manifest, "nodes": manifest, "edges": manifest}.

    **Partition-level resumability (north_rule):** triples are partitioned
    into ``n_shards`` deterministic url-hash buckets, each landing in
    ``triples/shard_NNNN/`` with its own lineage manifest.  A rerun skips
    complete shards: the input is re-scanned but every page whose bucket
    is already done is filtered out right after the read, so only the
    missing shards pay extraction/NER/rules compute.  All incomplete
    shards run in ONE streaming execution (one actor pool, one fixed
    cost) and split at the sink via ``partition_cols`` — per-shard
    executions would pay pool startup per shard (~2.6 s each, measured).

    Tradeoff vs input-file-group shards: resume re-reads the (cheap,
    column-pruned) input once; choose file-group sharding instead when
    input re-read dominates compute.

    MULTI-NODE REQUIREMENT: ``out_root`` (and the corpus) must live on
    storage visible to every worker (shared FS / object store) — the
    task-side shard writer writes from worker processes and the driver
    assembles manifests from the same paths.  True of any distributed
    file sink; single-node /tmp is only valid in this sandbox.
    """
    import json
    import shutil

    from ..functions.hashing import stable_bucket_vec

    fp_base = (
        f"corpus={_corpus_fingerprint(corpus_dir)}|shards={n_shards}"
        f"|cfg={_config_fingerprint(config)}"
    )
    tri_dir = os.path.join(out_root, "triples")
    si_dir = os.path.join(out_root, "source_info")
    os.makedirs(tri_dir, exist_ok=True)
    os.makedirs(si_dir, exist_ok=True)
    manifests: dict[str, dict] = {}

    def _sdir(i: int) -> str:
        return os.path.join(tri_dir, f"shard_{i:04d}")

    def _fp(i: int) -> str:
        return f"{fp_base}|shard={i}"

    def _si_sdir(i: int) -> str:
        return os.path.join(si_dir, f"shard_{i:04d}")

    def _fp_si(i: int) -> str:
        return f"{fp_base}|source_info|shard={i}"

    def _slice_digest(part) -> str:
        """Block-unique deterministic name component: digest over EVERY
        (url, sent_ord) in the slice via the vectorized pandas row hash
        (order-insensitive uint64 sum) — retries of the same block stay
        idempotent, but two distinct blocks can never collide (first-row
        + row-count collided in principle, silently dropping rows); a
        per-row Python md5 loop here cost ~15 s at 5.6M triples."""
        import hashlib as _hl

        import numpy as np
        import pandas as _pd

        rh = _pd.util.hash_pandas_object(
            _pd.DataFrame(
                {"u": part.column("url").to_pandas(),
                 "o": part.column("sent_ord").to_pandas()}
            ),
            index=False,
        ).to_numpy()
        return _hl.md5(
            f"{part.num_rows}|{int(rh.sum(dtype=np.uint64))}".encode()
        ).hexdigest()[:16]

    def _shards_of(t):
        """Vectorized url→shard routing: dictionary-encode so each DISTINCT
        url is md5-hashed once (a block holds many rows per url), then
        gather.  Replaces a per-row Python loop on the flagship's widest
        stream (the same trap as the old shard_write filename loop)."""
        import numpy as np
        import pyarrow.compute as pc

        d = pc.dictionary_encode(t.column("url").combine_chunks())
        shard_u = stable_bucket_vec(d.dictionary, n_shards).astype(np.int32)
        return shard_u[np.asarray(d.indices)]

    # independent per-stage resume state; one execution covers the union
    # of whatever is missing (asymmetric resumes re-compute a completed
    # stage's slices but never re-WRITE them)
    tri_inc = [
        i for i in range(n_shards) if not (resume and stage_complete(_sdir(i), _fp(i)))
    ]
    si_inc = [
        i for i in range(n_shards)
        if not (resume and stage_complete(_si_sdir(i), _fp_si(i)))
    ]
    incomplete = sorted(set(tri_inc) | set(si_inc))
    if incomplete:
        pages = pages_dataset(corpus_dir)
        todo = frozenset(incomplete)
        if len(incomplete) < n_shards:
            import pyarrow as pa

            def keep_incomplete(t: pa.Table) -> pa.Table:
                import numpy as np
                import pyarrow.compute as pc

                d = pc.dictionary_encode(t.column("url").combine_chunks())
                bucket_u = stable_bucket_vec(d.dictionary, n_shards)
                mask = np.isin(bucket_u, list(todo))[np.asarray(d.indices)]
                return t.filter(pa.array(mask))

            pages = pages.map_batches(keep_incomplete, batch_format="pyarrow")

        tmp = tri_dir + ".partial"
        si_tmp = si_dir + ".partial"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(si_tmp, ignore_errors=True)
        for i in tri_inc:
            os.makedirs(os.path.join(tmp, f"shard_id={i:04d}"), exist_ok=True)
        for i in si_inc:
            os.makedirs(os.path.join(si_tmp, f"shard_id={i:04d}"), exist_ok=True)
        si_todo = frozenset(si_inc)
        tri_todo = frozenset(tri_inc)

        def sentence_tee(t):
            """Pass-through task-side sink for source_info: writes each
            incomplete shard's sentence slice (sorted within the file)
            from the SAME execution that feeds the NER stage — the
            lineage table costs no extra pipeline pass."""
            import pyarrow as pa
            import pyarrow.parquet as _pq

            shard = _shards_of(t)
            import numpy as np

            for i in np.unique(shard).tolist():
                if i not in si_todo:
                    continue
                part = t.filter(pa.array(shard == i)).sort_by(
                    [("url", "ascending"), ("sent_ord", "ascending")]
                )
                fname = "part-" + _slice_digest(part) + ".parquet"
                _pq.write_table(part, os.path.join(si_tmp, f"shard_id={i:04d}", fname))
            return t

        def shard_write(t):
            """Task-side triples sink: split the block by url-hash shard
            and write each slice as its own parquet file (Ray's
            partition_cols datasink was measured ~45 s at 8 CPUs for the
            same data — a direct pyarrow write is essentially free).
            Emits one lineage row per written file."""
            import numpy as np
            import pyarrow as pa
            import pyarrow.parquet as _pq

            shard = _shards_of(t)
            rows = []
            for i in np.unique(shard).tolist():
                if i not in tri_todo:
                    continue
                part = t.filter(pa.array(shard == i))
                fname = "part-" + _slice_digest(part) + ".parquet"
                fpath = os.path.join(tmp, f"shard_id={i:04d}", fname)
                _pq.write_table(part, fpath)
                rows.append((i, fname, part.num_rows, os.path.getsize(fpath)))
            return pa.table(
                {
                    "shard": pa.array([r[0] for r in rows], pa.int32()),
                    "file": pa.array([r[1] for r in rows], pa.string()),
                    "rows": pa.array([r[2] for r in rows], pa.int64()),
                    "bytes": pa.array([r[3] for r in rows], pa.int64()),
                }
            )

        if tri_inc:
            tri = triples_dataset(
                pages, ner_concurrency=ner_concurrency,
                ner_batch_size=(
                    config.ner_batch_size
                    if config and config.ner_batch_size else 2048
                ),
                sentence_tee=sentence_tee if si_inc else None, config=config,
            )
            tri.map_batches(shard_write, batch_format="pyarrow").count()
        else:
            # source_info-only rebuild: the lineage table needs just the
            # CHEAP extract+split prefix — never the NER actor pool
            text = pages.map_batches(extract_text_batch, batch_format="pyarrow")
            sents = text.select_columns(["url", "text"]).map_batches(
                split_batch, batch_format="pyarrow"
            )
            sents.map_batches(sentence_tee, batch_format="pyarrow").count()
        import pyarrow.parquet as pq

        def _assemble(tmp_root, dst_fn, fp_fn, stage_name, inc):
            for i in inc:
                src = os.path.join(tmp_root, f"shard_id={i:04d}")
                dst = dst_fn(i)
                shutil.rmtree(dst, ignore_errors=True)
                if os.path.exists(src):
                    os.replace(src, dst)
                else:
                    os.makedirs(dst, exist_ok=True)  # empty shard
                partitions, total = [], 0
                for name in sorted(os.listdir(dst)):
                    if not name.endswith(".parquet"):
                        continue
                    meta = pq.read_metadata(os.path.join(dst, name))
                    partitions.append(
                        {"file": name, "rows": meta.num_rows,
                         "bytes": os.path.getsize(os.path.join(dst, name)),
                         "row_groups": meta.num_row_groups}
                    )
                    total += meta.num_rows
                with open(os.path.join(dst, "_MANIFEST.json"), "w") as f:
                    json.dump(
                        {
                            "stage": f"{stage_name}/shard_{i:04d}",
                            "fingerprint": fp_fn(i),
                            "rows": total,
                            "num_partitions": len(partitions),
                            "partitions": partitions,
                            "input": {"corpus": os.path.abspath(corpus_dir),
                                      "url_hash_bucket": i, "n_shards": n_shards},
                        },
                        f, indent=1,
                    )

        _assemble(tmp, _sdir, _fp, "triples", tri_inc)
        _assemble(si_tmp, _si_sdir, _fp_si, "source_info", si_inc)
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(si_tmp, ignore_errors=True)

    # prune stale shard dirs from an earlier run with a LARGER n_shards:
    # read_stage walks every shard_* directory, so leftovers would be
    # silently double-counted into nodes/edges while the triples manifest
    # only sums shards 0..n-1
    for stage_dir in (tri_dir, si_dir):
        for name in sorted(os.listdir(stage_dir)):
            if name.startswith("shard_"):
                try:
                    idx = int(name.split("_", 1)[1])
                except ValueError:
                    continue
                if idx >= n_shards:
                    shutil.rmtree(os.path.join(stage_dir, name), ignore_errors=True)
    # a prior STANDALONE write_source_info left flat part files /
    # manifest next to the shard dirs — remove them (mixed layouts would
    # double-count every sentence on read)
    for name in sorted(os.listdir(si_dir)):
        if name.endswith(".parquet") or name == "_MANIFEST.json":
            os.remove(os.path.join(si_dir, name))

    for stage_name, sdir_fn in (("triples", _sdir), ("source_info", _si_sdir)):
        shard_manifests = []
        for i in range(n_shards):
            with open(os.path.join(sdir_fn(i), "_MANIFEST.json")) as f:
                shard_manifests.append(json.load(f))
        manifests[stage_name] = {
            "stage": stage_name,
            "rows": sum(m["rows"] for m in shard_manifests),
            "num_partitions": sum(m["num_partitions"] for m in shard_manifests),
            "shards": shard_manifests,
        }

    # nodes and edges derive from ONE scan of the triples checkpoint AND
    # finalize in ONE streaming execution
    # (stages/canonicalize.py:finalize_graph_write): both partial kinds
    # combine in a single bucketed pass, nodes write task-side inside
    # it, and edges flow on into the subj sort + checkpointed write —
    # the previous three back-to-back executions were ~7 s of pure
    # fixed cost at sf0.1, <0.5 s of it the checkpoint scan.
    from ..stages.canonicalize import finalize_graph_write

    nodes_dir = os.path.join(out_root, "nodes")
    edges_dir = os.path.join(out_root, "edges")
    if (
        resume
        and stage_complete(nodes_dir, fp_base)
        and stage_complete(edges_dir, fp_base)
    ):
        # no-op resume: the fused finalize would otherwise scan the full
        # triples checkpoint before noticing nothing is missing
        for stage_name, d in (("nodes", nodes_dir), ("edges", edges_dir)):
            with open(os.path.join(d, "_MANIFEST.json")) as f:
                manifests[stage_name] = json.load(f)
    else:
        m_nodes, m_edges = finalize_graph_write(
            read_stage(tri_dir), nodes_dir, edges_dir, fp_base
        )
        manifests["nodes"] = m_nodes
        manifests["edges"] = m_edges
    return manifests


def active_learning_seeds(sf_dir: str, n: int = 200):
    """Uncertainty-sampled annotation seeds: the ``n`` sentences whose
    ensemble votes disagree most — the data-side of the reference's
    active-learning loop (``multi_source_ner.py:854-858`` seeds retraining
    with ``random.sample``, which is order-dependent; top-disagreement
    selection is deterministic AND targets annotation where the ensemble
    is least sure, the standard uncertainty-sampling upgrade).

    Disagreement per sentence, from the mention stream alone (no span
    join): member span instances that failed to form a majority span
    (``orphans = n_member_rows − Σ support``) plus each majority span's
    dissent ``(M − k)``, normalized by the sentence's member instance
    count.  Unanimous sentences score 0; a sentence whose members all
    disagree scores ~1.

    Shape: one EnsembleNER actor-pool pass → vectorized per-batch
    (url, sent_ord) partials → global top-n through grouped_topn's
    combiner (the exchange carries ≤ n rows per batch, never the
    corpus)."""
    import numpy as np
    import pandas as pd

    from ..functions.arrow import arrow_out, read_parquet_clean
    from ..stages.ner import MODEL_NAMES
    from ..stages.shuffle import grouped_topn

    corpus = corpus_for_sf(sf_dir)
    sents = sentences_dataset(corpus)
    mentions = sents.map_batches(
        EnsembleNER, batch_format="pyarrow", batch_size=1024,
        concurrency=_default_concurrency(), num_cpus=1,
    )
    M = len(MODEL_NAMES)
    member_set = frozenset(MODEL_NAMES)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {"url": pd.array([], "str"), "sent_ord": pd.array([], "int64"),
                 "disagreement": pd.array([], "float64"),
                 "_all": pd.array([], "int8")}
            )
        is_member = b["model"].isin(member_set).to_numpy()
        is_strong = (b["model"] == "ensemble_strong").to_numpy()
        g = pd.DataFrame(
            {"url": b["url"], "sent_ord": b["sent_ord"],
             "n_member": is_member.astype("int64"),
             "support": np.where(is_strong, b["n_models"], 0).astype("int64"),
             "dissent": np.where(is_strong, M - b["n_models"], 0).astype("int64")}
        ).groupby(["url", "sent_ord"], sort=False).sum().reset_index()
        orphans = np.maximum(g["n_member"] - g["support"], 0)
        score = (orphans + g["dissent"]) / np.maximum(g["n_member"], 1)
        return pd.DataFrame(
            {"url": g["url"].astype(str),
             "sent_ord": pd.array(g["sent_ord"], "int64"),
             "disagreement": pd.array(np.round(score, 6), "float64"),
             "_all": pd.array(np.zeros(len(g), dtype="int8"), "int8")}
        )

    partials = mentions.map_batches(arrow_out(partial), batch_format="pandas")
    top = grouped_topn(
        partials, ["_all"], "disagreement", n,
        descending=True, tiebreak="url", num_buckets=1,
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        out = b.sort_values(
            ["disagreement", "url", "sent_ord"], ascending=[False, True, True],
            kind="mergesort",
        )
        return out[["url", "sent_ord", "disagreement"]]

    return top.map_batches(arrow_out(finish), batch_format="pandas")
