"""Metadata-only row counts on the parquet-dir catalog and their use as
the knn_join sizing hint (no count() scan for a level decision)."""

from __future__ import annotations

from fairy_core_spark.sources.tables import ParquetDirCatalog, parquet_row_count


def test_snapshot_carries_rows_and_row_count_matches(spark, tmp_path):
    cat = ParquetDirCatalog(str(tmp_path))
    df = spark.range(0, 1234).selectExpr("id", "id % 7 AS grp")
    snap = cat.write(df, "t1", partition_by=["grp"])
    assert snap["rows"] == 1234
    assert cat.row_count("t1") == 1234
    assert parquet_row_count(str(tmp_path / "t1" / "data")) == 1234


def test_row_count_falls_back_to_footers_for_old_snapshots(spark, tmp_path):
    import json
    import os

    cat = ParquetDirCatalog(str(tmp_path))
    cat.write(spark.range(0, 321), "t2")
    # simulate a pre-rows snapshot
    p = os.path.join(str(tmp_path), "t2", "_snapshot.json")
    snap = json.load(open(p))
    snap.pop("rows")
    json.dump(snap, open(p, "w"))
    assert cat.row_count("t2") == 321


def test_knn_n_points_hint_matches_default(spark):
    import pandas as pd

    from fairy_core_spark.spatial.ops import knn_join

    pdf = pd.DataFrame(
        {
            "id": [f"p{i}" for i in range(200)],
            "lat": [(i * 37 % 1200) / 10.0 - 60.0 for i in range(200)],
            "lon": [(i * 91 % 3600) / 10.0 - 180.0 for i in range(200)],
        }
    )
    points = spark.createDataFrame(pdf)
    qdf = spark.createDataFrame(
        pdf.iloc[:10].rename(columns={"id": "query_id"})
    )
    base = knn_join(points, qdf, k=3, id_col="id", query_id_col="query_id")
    hinted = knn_join(points, qdf, k=3, id_col="id", query_id_col="query_id", n_points=200)
    b = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in base.collect()}
    h = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in hinted.collect()}
    assert b == h and len(b) == 30
