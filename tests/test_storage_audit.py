"""Storage audit ≡ DuckDB parquet_metadata, table by table."""

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def test_matches_duckdb_parquet_metadata():
    from medical_knowledge_graph_ray.pipelines.relational import (
        tables_storage_audit,
    )

    got = tables_storage_audit(SF)
    con = duckdb.connect()
    for t in got["table"].unique():
        want = con.execute(f"""
            SELECT replace(path_in_schema, ', ', '.') AS column,
                   CAST(SUM(num_values) AS BIGINT) AS n_values,
                   CAST(SUM(total_compressed_size) AS BIGINT) AS compressed_bytes,
                   CAST(SUM(total_uncompressed_size) AS BIGINT) AS uncompressed_bytes
            FROM parquet_metadata('{SF}/{t}.parquet')
            GROUP BY 1 ORDER BY 1
        """).df()
        sub = (
            got[got["table"] == t]
            .drop(columns=["table", "ratio_bp"])
            .reset_index(drop=True)
        )
        sub["column"] = sub["column"].astype(object)
        pd.testing.assert_frame_equal(sub, want)
        r = got[got["table"] == t]
        assert (
            (r["uncompressed_bytes"] * 10_000) // r["compressed_bytes"]
            == r["ratio_bp"]
        ).all()
