"""Entity canonicalization + graph materialization (nodes / edges).

The reference normalizes surfaces by stripping bracketed aliases and
whitespace (``structurize_files.py:769-799``, O8) and assigns ids by
enumeration (``head_id='h{:08d}'`` per group index,
``clean_and_save.py:1174-1180``) — order-dependent and unusable under
parallelism.  Here every id is a deterministic content hash of the
normalized ``(surface, type)`` key (SURVEY §4 Ordering).

**Skew design (north_rule):** hot entities (common drugs/diseases recur
across a large share of pages) would hot-spot a naive
``groupby(key).map_groups``.  Both aggregations therefore run **two-phase**:

1. *partial* — inside ``map_batches``, combine per batch to ≤ 1 row per key
   per batch (the classic combiner; a key appearing in 1e6 rows leaves each
   batch as a single partial row, so the shuffle moves O(#batches) not
   O(#rows) for hot keys);
2. *final* — a small ``groupby`` over the partials with associative
   aggregates (Sum / Max).

This removes the need for explicit key salting for count/max aggregates
while remaining deterministic; the partial rows are the "salted" shards.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa

from ..functions.hashing import stable_id

_BRACKET_RE = re.compile(r"[\(\[（【].*?[\)\]）】]")

NODE_SCHEMA = pa.schema(
    [
        ("node_id", pa.string()),
        ("canonical_name", pa.string()),
        ("type", pa.string()),
        ("ontology_id", pa.string()),
        ("n_mentions", pa.int64()),
        ("prob_max", pa.float64()),
    ]
)


def ontology_ids(types: pd.Series) -> pd.Series:
    """External-ontology class id per node type (config.yaml:100-114):
    derived from ``type`` at finalize time — it never rides an exchange."""
    from ..ontology import ONTOLOGY_MAPPING

    return types.map(ONTOLOGY_MAPPING).fillna("").astype(str)

EDGE_SCHEMA = pa.schema(
    [
        ("subj_id", pa.string()),
        ("pred", pa.string()),
        ("obj_id", pa.string()),
        ("weight", pa.float64()),
        ("n_evidence", pa.int64()),
    ]
)


def normalize_surface(s: str) -> str:
    """O8 normalizer: drop bracketed aliases, trim, casefold."""
    return _BRACKET_RE.sub("", s).strip().casefold()


def node_id(surface: str, etype: str) -> str:
    """Deterministic node id = md5(normalized surface, type)."""
    return stable_id(normalize_surface(surface), etype, prefix="n")


def _normalize_series(s: pd.Series) -> pd.Series:
    return (
        s.str.replace(_BRACKET_RE, "", regex=True).str.strip().str.casefold()
    )


# per-worker id memo: canonical keys are low-cardinality (gazetteer +
# rule-merged variants), so md5 runs once per distinct key per worker
# instead of once per row (2 md5 calls × millions of rows otherwise)
_ID_CACHE: dict[tuple[str, str], str] = {}


def _ids_for(norm: pd.Series, etype: pd.Series) -> pd.Series:
    cache = _ID_CACHE
    if len(cache) > 2_000_000:
        cache.clear()
    out = []
    for key in zip(norm, etype):
        nid = cache.get(key)
        if nid is None:
            nid = stable_id(key[0], key[1], prefix="n")
            cache[key] = nid
        out.append(nid)
    return pd.Series(out, index=norm.index, dtype="object")


def partial_nodes_batch(batch: pa.Table) -> pa.Table:
    """Triple batch → partial node rows (both endpoints), combined per key."""
    part = _partial_nodes_df(batch.to_pandas())
    return pa.Table.from_pandas(part, schema=NODE_SCHEMA, preserve_index=False).replace_schema_metadata(None)


def _partial_nodes_df(df: pd.DataFrame) -> pd.DataFrame:
    ends = pd.concat(
        [
            df[["subj", "subj_type", "prob"]].rename(
                columns={"subj": "surface", "subj_type": "type"}
            ),
            df[["obj", "obj_type", "prob"]].rename(
                columns={"obj": "surface", "obj_type": "type"}
            ),
        ],
        ignore_index=True,
    )
    ends["canonical_name"] = _normalize_series(ends["surface"].astype(str))
    part = (
        ends.groupby(["canonical_name", "type"], sort=False)
        .agg(n_mentions=("surface", "size"), prob_max=("prob", "max"))
        .reset_index()
    )
    part["node_id"] = _ids_for(part["canonical_name"], part["type"])
    return part[["node_id", "canonical_name", "type", "n_mentions", "prob_max"]]


def partial_edges_batch(batch: pa.Table) -> pa.Table:
    """Triple batch → partial edge rows, combined per (subj, pred, obj)."""
    part = _partial_edges_df(batch.to_pandas())
    return pa.Table.from_pandas(part, schema=EDGE_SCHEMA, preserve_index=False).replace_schema_metadata(None)


def _partial_edges_df(df: pd.DataFrame) -> pd.DataFrame:
    df = df.assign(
        _sn=_normalize_series(df["subj"].astype(str)),
        _on=_normalize_series(df["obj"].astype(str)),
    )
    df["subj_id"] = _ids_for(df["_sn"], df["subj_type"])
    df["obj_id"] = _ids_for(df["_on"], df["obj_type"])
    return (
        df.groupby(["subj_id", "pred", "obj_id"], sort=False)
        .agg(weight=("prob", "max"), n_evidence=("prob", "size"))
        .reset_index()
    )


# -- fused single-scan graph materialization ----------------------------------
#
# nodes and edges both derive from the triples checkpoint; scanning it
# twice doubles checkpoint I/O (the dominant cost once the checkpoint is
# large).  The fused path emits BOTH partial kinds from ONE scan into a
# superset schema, materializes the (much smaller, spillable) partials,
# and runs each finalize over the in-memory partials.

GRAPH_PARTIAL_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),           # 'n' | 'e'
        ("a", pa.string()),              # node_id | subj_id
        ("b", pa.string()),              # type | pred
        ("c", pa.string()),              # '' | obj_id
        ("name", pa.string()),           # canonical_name | ''
        ("n", pa.int64()),               # n_mentions | n_evidence
        ("p", pa.float64()),             # prob_max | weight
    ]
)


def partial_graph_batch(batch: pa.Table) -> pa.Table:
    """Triple batch → node AND edge partials in one pass (superset rows;
    ONE arrow→pandas conversion shared by both partial kinds)."""
    df = batch.to_pandas()
    nodes = _partial_nodes_df(df)
    edges = _partial_edges_df(df)
    both = pd.concat(
        [
            pd.DataFrame(
                {"kind": "n", "a": nodes["node_id"], "b": nodes["type"],
                 "c": "", "name": nodes["canonical_name"],
                 "n": nodes["n_mentions"], "p": nodes["prob_max"]}
            ),
            pd.DataFrame(
                {"kind": "e", "a": edges["subj_id"], "b": edges["pred"],
                 "c": edges["obj_id"], "name": "",
                 "n": edges["n_evidence"], "p": edges["weight"]}
            ),
        ],
        ignore_index=True,
    )
    return pa.Table.from_pandas(both, schema=GRAPH_PARTIAL_SCHEMA, preserve_index=False).replace_schema_metadata(None)


def _kind_slice(partials, kind: str, rename: dict[str, str], drop: list[str]):
    def fn(t: pa.Table) -> pa.Table:
        t = t.filter(pa.compute.equal(t.column("kind"), kind))
        t = t.drop_columns(["kind"] + drop)
        return t.rename_columns([rename.get(c, c) for c in t.column_names])

    return partials.map_batches(fn, batch_format="pyarrow")


def graph_tables(triples):
    """triples Dataset → (nodes Dataset, edges Dataset) off ONE input scan.

    The superset partials are materialized (object-store resident,
    spillable; they are the post-combiner rows — orders of magnitude
    smaller than the triples) so the two finalize branches don't
    re-execute the scan."""
    parts = triples.map_batches(
        partial_graph_batch, batch_format="pyarrow", batch_size=65536
    ).materialize()
    return graph_tables_from_partials(parts)


def graph_tables_from_partials(parts):
    """(superset partials Dataset) → (nodes, edges): the finalize half of
    ``graph_tables`` for callers holding pre-combined partials — either
    just materialized (``graph_tables``) or teed out of the triples
    execution and checkpointed (``run_kg``'s graph_partials fast path,
    which skips re-scanning the full triples checkpoint).  Partials are
    associative (Sum/Max per key), so ANY batch partitioning of the same
    triples multiset finalizes to identical tables."""
    node_parts = _kind_slice(
        parts, "n",
        {"a": "node_id", "b": "type", "name": "canonical_name",
         "n": "n_mentions", "p": "prob_max"},
        drop=["c"],
    )
    edge_parts = _kind_slice(
        parts, "e",
        {"a": "subj_id", "b": "pred", "c": "obj_id",
         "n": "n_evidence", "p": "weight"},
        drop=["name"],
    )
    return finalize_nodes(node_parts), finalize_edges(edge_parts)


def _hex2_code(s: pd.Series) -> "np.ndarray":
    """Vectorized value of hex chars [1:3) of each id (ids are
    '<prefix-char>' + 16 lowercase hex — md5-uniform, so the code is
    uniform over [0, 256))."""
    import numpy as np

    raw = np.asarray(s.to_numpy(), dtype="U3").view("uint32").reshape(-1, 3)
    c = raw[:, 1:3].astype("uint32")
    digit = c - 48 - (c >= 97) * 39  # '0'-'9' → 0-9, 'a'-'f' → 10-15
    return (digit[:, 0] * 16 + digit[:, 1]).astype("int32")


def finalize_graph_write(
    triples,
    nodes_dir: str,
    edges_dir: str,
    fingerprint: str,
    *,
    num_buckets: int = 32,
) -> tuple[dict, dict]:
    """nodes + edges finalize AND checkpointed write in ONE streaming
    execution with ONE shuffle.

    The unfused path (two per-kind bucketed combines + a global edge
    sort + two checkpoint writes) ran three back-to-back executions and
    three AllToAll exchanges — measured ~7 s of finalize wall at sf0.1
    of which <2 s was the triples scan and ~1.4 s the combiner compute:
    the rest was exchange/startup fixed cost.  Fused design:

    * ONE bucketed exchange serves both tables: partials are
      RANGE-bucketed on the md5-uniform id prefix (``_hex2_code`` of
      column ``a`` — node_id for node partials, subj_id for edge
      partials), so bucket order IS global id order.
    * Each bucket task combines both kinds (n=Sum, p=Max per key —
      identical aggregates to ``finalize_nodes``/``finalize_edges``),
      sorts within the bucket, and writes one nodes file and one edges
      file task-side (``part-<bucket>.parquet``; rewrite-idempotent).
      Range-ordered filenames + within-file sort ⇒ the edges table
      reads globally sorted by subj_id (north_rule) with NO sort
      operator; ties additionally ordered by (pred, obj_id), making
      file bytes parallelism-invariant.
    * The execution is driven by counting the tiny per-bucket lineage
      frames; manifests for both stages are assembled driver-side.

    Output tables are value-identical to the unfused ``graph_tables``
    path (associativity; pinned by the e2e golden tests).  Both stages
    are force-written: entering the finalize at all means at least one
    is missing, and deterministic content makes a rewrite
    value-identical.  Skew note: a hot entity is ONE key in one bucket,
    but its partials are pre-combined to ≤1 row per upstream batch, so
    no bucket can be overloaded by entity popularity."""
    import json
    import os
    import shutil

    import numpy as np
    import pyarrow.parquet as pq

    from ..functions.arrow import arrow_out
    from ..state.manifests import MANIFEST

    tmp = {
        "nodes": nodes_dir.rstrip("/") + ".fused.tmp",
        "edges": edges_dir.rstrip("/") + ".fused.tmp",
    }
    for d in tmp.values():
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)

    parts = triples.map_batches(
        partial_graph_batch, batch_format="pyarrow", batch_size=65536
    )

    def _assign(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_bucket"] = (
            (_hex2_code(b["a"]) * num_buckets) // 256
            if len(b)
            else np.empty(0, "int32")
        )
        return b

    def _write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {"table": pd.array([], "str"),
                 "bucket": pd.array([], "int32"),
                 "rows": pd.array([], "int64")}
            )
        bucket = int(g["_bucket"].iloc[0])
        m = (
            g.groupby(["kind", "a", "b", "c", "name"], sort=False)
            .agg(n=("n", "sum"), p=("p", "max"))
            .reset_index()
        )
        out = []
        nodes = m[m["kind"] == "n"].sort_values("a", kind="mergesort")
        if len(nodes):
            nt = pd.DataFrame(
                {
                    "node_id": nodes["a"].to_numpy(),
                    "canonical_name": nodes["name"].to_numpy(),
                    "type": nodes["b"].to_numpy(),
                    "ontology_id": ontology_ids(nodes["b"]).to_numpy(),
                    "n_mentions": nodes["n"].to_numpy("int64"),
                    "prob_max": nodes["p"].to_numpy("float64"),
                }
            )
            pq.write_table(
                pa.Table.from_pandas(nt, schema=NODE_SCHEMA, preserve_index=False).replace_schema_metadata(None),
                os.path.join(tmp["nodes"], f"part-{bucket:04d}.parquet"),
            )
            out.append(("nodes", bucket, len(nt)))
        edges = m[m["kind"] == "e"].sort_values(
            ["a", "b", "c"], kind="mergesort"
        )
        if len(edges):
            et = pd.DataFrame(
                {
                    "subj_id": edges["a"].to_numpy(),
                    "pred": edges["b"].to_numpy(),
                    "obj_id": edges["c"].to_numpy(),
                    "weight": edges["p"].to_numpy("float64"),
                    "n_evidence": edges["n"].to_numpy("int64"),
                }
            )
            pq.write_table(
                pa.Table.from_pandas(et, schema=EDGE_SCHEMA, preserve_index=False).replace_schema_metadata(None),
                os.path.join(tmp["edges"], f"part-{bucket:04d}.parquet"),
            )
            out.append(("edges", bucket, len(et)))
        return pd.DataFrame(
            {"table": pd.array([t for t, _, _ in out], "str"),
             "bucket": pd.array([b_ for _, b_, _ in out], "int32"),
             "rows": pd.array([r for _, _, r in out], "int64")}
        )

    (
        parts.map_batches(arrow_out(_assign), batch_format="pandas")
        .groupby("_bucket")
        .map_groups(arrow_out(_write_bucket), batch_format="pandas")
        .count()
    )

    results = {}
    for stage_name, final_dir in (("nodes", nodes_dir), ("edges", edges_dir)):
        shutil.rmtree(final_dir, ignore_errors=True)
        os.replace(tmp[stage_name], final_dir)
        partitions, total = [], 0
        for name in sorted(os.listdir(final_dir)):
            if not name.endswith(".parquet"):
                continue
            meta = pq.read_metadata(os.path.join(final_dir, name))
            partitions.append(
                {"file": name, "rows": meta.num_rows,
                 "bytes": os.path.getsize(os.path.join(final_dir, name)),
                 "row_groups": meta.num_row_groups}
            )
            total += meta.num_rows
        manifest = {
            "stage": stage_name,
            "fingerprint": fingerprint,
            "rows": total,
            "num_partitions": len(partitions),
            "partitions": partitions,
        }
        with open(os.path.join(final_dir, MANIFEST), "w") as f:
            json.dump(manifest, f, indent=1)
        results[stage_name] = manifest
    return results["nodes"], results["edges"]


def finalize_nodes(partials):
    """partial-node Dataset → final node Dataset.

    Coarse-bucket shuffle + one vectorized pandas groupby per bucket
    (stages/shuffle.py) — hot entities arrive pre-combined (≤ 1 row per
    key per upstream batch), so no key can dominate a bucket."""
    from .shuffle import bucketed_group_map

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby(["node_id", "canonical_name", "type"], sort=False)
            .agg(n_mentions=("n_mentions", "sum"), prob_max=("prob_max", "max"))
            .reset_index()
        )
        out.insert(3, "ontology_id", ontology_ids(out["type"]))
        return out

    return bucketed_group_map(partials, ["node_id"], combine, num_buckets=32)


def finalize_edges(partials):
    """partial-edge Dataset → final edge Dataset, sorted by subject
    (north_rule: edge table sorted by subj)."""
    from .shuffle import bucketed_group_map

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby(["subj_id", "pred", "obj_id"], sort=False)
            .agg(weight=("weight", "max"), n_evidence=("n_evidence", "sum"))
            .reset_index()
        )

    agg = bucketed_group_map(partials, ["subj_id", "pred", "obj_id"], combine, num_buckets=32)
    return agg.sort("subj_id")
