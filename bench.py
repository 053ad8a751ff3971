"""Benchmark harness.

Plain run: executes the headline flagship KG pipeline + the operator
pipelines over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) under
``ray.init(num_cpus=$RAY_GRAFT_CPUS or 32)`` and prints ONE JSON line.

``--scaling``: runs the headline pipeline twice in fresh processes
(num_cpus=8 then 32) on the same input and reports both throughputs plus
the scaling efficiency (north_rule two-cluster-size evidence).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _consume(result) -> int:
    """Execute a lazy result and return its row count."""
    import pandas as pd

    if isinstance(result, pd.DataFrame):
        return len(result)
    return result.count()


def run_queries() -> tuple[dict[str, float], dict[str, int]]:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as em

    names = [
        "kg_doc_mentions", "kg_doc_edges",
        "q1_pricing", "q3_top_orders", "q5_region_revenue",
        "events_tumbling", "events_argmax", "events_sessionize",
        "docs_stats", "docs_quality", "dedup_exact",
        "minhash_verified_pairs", "knn_cosine", "embed_norms",
        "embed_neardup_pairs", "ner_eval",
        "events_asof", "orders_topn_per_cust", "lineitem_quantiles",
        "docs_tfidf_top", "events_range_join",
        # round-3 additions: decontamination, per-source quota, and the
        # repaired near-dup curation chain (components + left join)
        "docs_decontaminate", "docs_source_quota", "docs_curation_neardup",
        # round-3 graph/census family: co-occurrence mining + entity
        # salience (dense finalizer), global n-gram heavy hitters, and
        # the distributed BSP PageRank over the near-dup doc graph
        "kg_cooccurrence", "kg_entity_salience",
        "docs_ngram_topk", "docs_pagerank", "kg_khop",
        # late round-3 additions: q18 HAVING join chain, exact 3-sigma
        # anomalies, triangle census, chunk-level dedup + reconstruction,
        # neighborhood Jaccard, conversion funnel
        "q18_big_orders", "events_anomaly", "kg_triangles",
        "docs_chunk_dedup", "kg_jaccard_neighbors", "events_conversion",
        # sketch/prefilter chains + exact-size sampling
        "orders_bloom_semi", "docs_frequent_tokens", "docs_bottomk_sample",
        "lineitem_winsorize",
        # composed LLM-prep flagship (curate -> decontaminate -> split ->
        # pack -> checkpointed stages; always a fresh run — the query
        # clears its scratch root)
        "docs_llm_prep",
        # closing-session additions: returned-customer join chain, PII
        # scrub, integrity audit, multi-query ANN, k-means census
        "q10_returned_customers", "docs_redact", "tables_integrity",
        "knn_cosine_multi", "embed_kmeans",
        # round-3 continuation: TPC-H remainder shapes, the persisted
        # inverted-index search, and the window extremum pair
        "q4_order_priority", "q8_market_share", "q13_custdist",
        "q17_small_qty_revenue", "q21_waiting_suppliers",
        "part_cheapest_supplier", "docs_search_indexed", "events_first_last",
        # BM25/phrase serve over the cached index, PPMI scoring, SemDeDup
        "docs_search_ranked", "docs_search_phrase", "kg_ppmi",
        "embed_semdedup",
        # round-4: the trained-ensemble flagship loop (train → held-out
        # eval → derived eval matrix → full KG run; 45 s cold at sf0.1,
        # ~6 s on checkpoint resume — model + graph keyed by corpus
        # fingerprint under /tmp)
        "kg_flagship_trained",
        # round-4 continuation: duplicated-span removal (full-token
        # exchange), winnow sketch + its pair join, exact-moment OLS,
        # per-user entropy, robust MAD census
        "docs_dupspans", "docs_winnow_pairs", "lineitem_regression",
        "events_entropy", "lineitem_mad", "docs_jaccard_prefix",
        "events_dense_rank", "docs_curation_report", "events_funnel3",
        # round-4 third sitting: oracled MinHash-LSH + incremental
        # cross-corpus dedup, column profiler (27 cols / 1 exchange),
        # PMI collocations, Spearman, skew diagnostics, feature hashing,
        # time-decay scoring, chi-square, YoY, distributed PCA
        "docs_minhash_pairs", "docs_crossdedup", "tables_profile",
        "docs_collocations", "lineitem_spearman", "tables_skew_report",
        "docs_feature_hashing", "events_decay", "events_chisq",
        "orders_yoy", "embed_pca", "docs_minhash_clusters",
        "customers_rfm",
        # round-4 fourth sitting: link prediction + clustering coeff,
        # SCD2, per-user quantiles, Pareto classes, co-purchase CF,
        # radius search, keyness, bigram LM, cohorts, centroids, k-core
        "kg_adamic_adar", "kg_clustering_coeff", "events_scd2",
        "events_user_quantiles", "orders_abc", "parts_copurchase_sim",
        "knn_range", "docs_odds_ratio", "docs_bigram_lm",
        "orders_cohorts", "embed_label_centroids", "kg_kcore",
        # fourth-sitting later additions: attribution, sweep line, HHI,
        # rolling median, assortativity, t-test/KS, Zipf, kNN graph,
        # journeys, LSH eval, autocorr, RAKE, Benford, pct change
        "events_last_touch", "orders_open_by_day", "supplier_hhi",
        "events_rolling_median", "events_interarrival", "kg_assortativity",
        "events_ttest", "docs_zipf", "events_ks_test", "events_top_paths",
        "embed_knn_graph", "events_pct_change", "docs_minhash_eval",
        "events_daily_autocorr", "docs_rake", "lineitem_benford",
        "events_bursts", "embed_label_affinity", "parts_assoc_rules",
        "lineitem_weighted_median", "supplier_gini", "events_streaks",
        "nations_trade_matrix", "orders_trend", "docs_length_percentiles",
        "docs_length_mad", "events_gap_histogram", "events_type_jaccard", "events_hourly_profile", "docs_heaps", "docs_source_js", "events_dau_mau", "events_cusum", "docs_search_rrf", "docs_es_sample", "docs_sources_overlap", "kg_lpa", "docs_ttr", "events_type_kmv", "lineitem_zonemap_scan", "events_mannwhitney", "events_geomean", "docs_compress_ratio",
        # fifth sitting: survival, inequality decomposition, Gopher rules,
        # HITS, MMR, SNM windows, correlation matrix, runs test, FK
        # discovery, Markov fixpoint, seasonal decomposition, exactly-once
        # micro-batch fold, containment join, bitmap index, trigram
        # mining, betweenness, weighted SSSP
        "events_kaplan_meier", "supplier_theil", "docs_gopher_rules",
        "kg_hits", "embed_mmr", "docs_snm_pairs", "lineitem_corr_matrix",
        "orders_runs_test", "tables_fk_discovery",
        "events_markov_stationary", "orders_seasonal_decompose",
        "events_streaming_tumbling", "docs_containment_pairs",
        "lineitem_bitmap_counts", "events_path_trigrams",
        "kg_betweenness", "kg_distances", "events_anova",
        "tables_fd_discovery",
        # sixth sitting
        "lineitem_zorder_scan", "orders_snapshot_diff",
        "docs_readability", "nation_rev_ivm", "kg_negative_samples",
        "sales_hierarchy_share", "events_mutual_info", "docs_simpson",
        "orders_theilsen", "tables_key_discovery",
        # round-4 close-out: density clustering, spanning backbone, CEP,
        # deterministic walk corpus, Neyman stratified sampling
        "embed_dbscan", "kg_mst", "events_cep", "kg_walks",
        "lineitem_neyman",
        # round-4 final sitting: attribution, sequence decoding, JL
        # projection, backtest, modularity, WOE, apportionment, sweep
        "events_linear_attrib", "events_hmm_score", "embed_rproj",
        "orders_backtest", "kg_label_modularity", "orders_woe",
        "orders_apportion", "events_peak_concurrency",
        "customers_kanon", "customers_clv", "embed_triplets",
        "events_wilson", "docs_huffman",
        "docs_leakage_safe_split", "docs_search_snippets",
        "kg_harmonic", "events_absorbing", "docs_fragile_links",
        "events_bounce_rate", "events_cuped", "docs_corpus_report",
        "lineitem_selfjoin_size", "tables_storage_audit",
        # round-5: ontology-linked node census, Pareto skyline, higher
        # moments, Sankey flows, EWMA smoothing
        "kg_nodes_ontology", "lineitem_skyline", "lineitem_moments",
        "events_sankey", "events_ewma", "supplier_value_share",
        "embed_quantize", "nation_rev_ivm_bilateral",
        "events_runlengths", "orders_weekly_iso", "embed_topk_dims",
        "customers_ldiversity", "docs_script_mix", "events_fano",
        "kg_eccentricity", "events_cooccur_window", "supplier_lead_time",
        "events_active_time", "orders_lineitem_mergejoin", "events_did",
        "events_queue_wait", "lineitem_kendall", "embed_drift",
        "docs_vocab_drift",
    ]
    qs = em.queries()
    times: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in names:
        t0 = time.perf_counter()
        rows[name] = _consume(qs[name](SF_DIR))
        times[name] = round(time.perf_counter() - t0, 3)
    return times, rows


def run_flagship() -> dict:
    """Headline: pages corpus → triples/nodes/edges Parquet (fresh run).

    ``MKG_BENCH_PAGES`` overrides the corpus size (used by --scaling to
    amortize the ~11 s fixed per-run cost — three execution startups +
    actor-pool spin-up — which at 400k pages is ~half the 32-CPU wall and
    turns host noise into efficiency noise)."""
    from medical_knowledge_graph_ray.pipelines.kg import PAGES_PER_SF, corpus_for_sf, run_kg
    from medical_knowledge_graph_ray.sources.pages import generate_pages

    sf_name = os.path.basename(os.path.normpath(SF_DIR))
    n_override = os.environ.get("MKG_BENCH_PAGES")
    if n_override:
        n_pages = int(n_override)
        # cached; generation excluded from timing
        corpus = generate_pages(n_pages, f"/tmp/mkg_corpus/pages_{n_pages}")
    else:
        corpus = corpus_for_sf(SF_DIR)  # cached; generation excluded from timing
        n_pages = PAGES_PER_SF.get(sf_name, 500)

    # warm the corpus page cache (untimed) — a cold first scan of the
    # ~350 MB pages directory was measured to double the flagship wall
    for root, _dirs, files in os.walk(corpus):
        for f in files:
            if f.endswith(".parquet"):
                with open(os.path.join(root, f), "rb") as fh:
                    fh.read()

    # min-of-2 (default): the first run in a fresh process pays one-time
    # import/compile/actor-spinup noise the steady state doesn't (53.6 s
    # vs 25.6 s measured back-to-back in one session during round 3).
    # --scaling sets MKG_FLAGSHIP_RUNS=1 — it already min-of-Ns whole
    # subprocesses per leg.
    n_runs = int(os.environ.get("MKG_FLAGSHIP_RUNS", "2"))
    walls = []
    manifests = None
    for _attempt in range(n_runs):
        out_root = f"/tmp/mkg_bench_out/{sf_name}"
        shutil.rmtree(out_root, ignore_errors=True)
        t0 = time.perf_counter()
        manifests = run_kg(corpus, out_root, resume=False)
        walls.append(time.perf_counter() - t0)
    wall = min(walls)
    n_triples = manifests["triples"]["rows"]
    return {
        "kg_flagship_sec": round(wall, 3),
        "kg_flagship_runs_sec": [round(w, 3) for w in walls],
        "n_pages": n_pages,
        "n_triples": n_triples,
        "docs_per_sec": round(n_pages / wall, 1),
        "triples_per_sec": round(n_triples / wall, 1),
    }


def main_bench() -> dict:
    import ray

    if not ray.is_initialized():
        # log_to_driver=False: worker log forwarding writes to the
        # driver's STDOUT asynchronously and once leaked an operator-name
        # fragment ahead of the one-line JSON contract
        ray.init(
            address="local", num_cpus=NUM_CPUS, include_dashboard=False,
            logging_level="ERROR", log_to_driver=False,
        )
    import logging

    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.preserve_order = False
    # Ray 2.49's sort-based aggregate emits an internal column-less
    # sentinel block for empty reduce partitions, tripping a cosmetic
    # "different schema" warning even when every user block is typed
    # (ours are — see the typed-empty-partial tests); keep the bench log
    # to real errors.
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    # warm the OS page cache (untimed)
    for t in ("lineitem", "documents", "events", "embeddings", "orders", "customer"):
        with open(f"{SF_DIR}/{t}.parquet", "rb") as f:
            f.read()

    flagship = run_flagship()
    qtimes, _rows = ({}, {}) if os.environ.get("GRAFT_FLAGSHIP_ONLY") else run_queries()

    out = {
        "metric": "kg_flagship_sec",
        "value": flagship["kg_flagship_sec"],
        "unit": "sec",
        "queries": {**qtimes, "kg_flagship": flagship["kg_flagship_sec"]},
        "sf": os.path.basename(os.path.normpath(SF_DIR)),
        "num_cpus": NUM_CPUS,
        "flagship_runs_sec": flagship.get("kg_flagship_runs_sec"),
        "docs_per_sec": flagship["docs_per_sec"],
        "triples_per_sec": flagship["triples_per_sec"],
        "n_triples": flagship["n_triples"],
        "n_pages": flagship["n_pages"],
    }
    ray.shutdown()
    return out


def _spin(d: float) -> int:
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < d:
        for _ in range(10000):
            n += 1
    return n


def _host_envelope(lo: int, hi: int, dur: float = 2.0) -> float:
    """How much more raw compute the HOST actually yields from lo to hi
    parallel processes right now (pure-CPU spin, no Ray).  On a shared
    box with CPU steal this is < hi/lo — e.g. measured 3.01x for 8->32
    during round 3 — and bounds the best achievable raw scaling
    efficiency at envelope/(hi/lo); report it so the engine's efficiency
    can be read against what the hardware offered during the run."""
    import multiprocessing as mp

    rates = {}
    for procs in (lo, hi):
        with mp.Pool(procs) as p:
            t0 = time.perf_counter()
            total = sum(p.map(_spin, [dur] * procs))
            rates[procs] = total / (time.perf_counter() - t0)
    return rates[hi] / rates[lo]


def scaling() -> dict:
    # Amortize the ~11 s fixed per-run cost (three execution startups +
    # actor-pool spin-up + checkpoint write): after the round-3 kernel
    # vectorizations the 32-CPU leg of the 400k-page corpus is >50%
    # fixed cost, which caps the measurable ratio regardless of how well
    # the engine scales.  800k pages keeps both legs compute-dominated
    # (cached corpus; generation excluded from timing).
    scaling_pages = os.environ.get("MKG_SCALING_PAGES", "800000")

    def run(ncpu: int) -> dict:
        # flagship only — same job, same input, two parallelism levels
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_FLAGSHIP_ONLY="1",
            MKG_FLAGSHIP_RUNS="1",
            MKG_BENCH_PAGES=scaling_pages,
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    envelope = _host_envelope(lo, hi)
    # min-of-N per leg: co-tenant noise only ever ADDS wall time, so the
    # minimum is the noise-robust estimator of each leg's true cost
    # (observed same-code efficiency swings 0.68-0.83 from noise alone)
    repeats = int(os.environ.get("MKG_SCALING_REPEATS", "2"))
    runs_lo = [run(lo) for _ in range(repeats)]
    runs_hi = [run(hi) for _ in range(repeats)]
    r_lo = min(runs_lo, key=lambda r: r["value"])
    r_hi = min(runs_hi, key=lambda r: r["value"])
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "sf": r_lo["sf"],
        "cpus_lo": lo, "cpus_hi": hi,
        "sec_lo": t_lo, "sec_hi": t_hi,
        "docs_per_sec_lo": r_lo["docs_per_sec"],
        "docs_per_sec_hi": r_hi["docs_per_sec"],
        "triples_per_sec_lo": r_lo["triples_per_sec"],
        "triples_per_sec_hi": r_hi["triples_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "host_cpu_envelope": round(envelope, 3),
        "efficiency_vs_host": round((t_lo / t_hi) / envelope, 3),
        "n_pages": r_lo.get("n_pages"),
        "repeats": repeats,
        "sec_lo_all": [r["value"] for r in runs_lo],
        "sec_hi_all": [r["value"] for r in runs_hi],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(scaling()))
    else:
        print(json.dumps(main_bench()))
