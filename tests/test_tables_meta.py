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


def test_versioned_catalog_time_travel_and_rollback(spark, tmp_path):
    """Snapshot log: commits append immutable versions; time travel reads
    any logged snapshot; rollback is a NEW commit over the old data dir
    (history preserved); base-class consumers see the current entry."""
    import pytest

    from fairy_core_spark.sources.tables import VersionedParquetDirCatalog

    cat = VersionedParquetDirCatalog(str(tmp_path))
    v1 = spark.range(0, 10).selectExpr("id", "id * 2 AS v")
    v2 = spark.range(0, 4).selectExpr("id", "id * 3 AS v")

    s1 = cat.write(v1, "t")
    s2 = cat.write(v2, "t")
    assert (s1["snapshot_id"], s2["snapshot_id"]) == ("commit-0", "commit-1")
    assert cat.snapshot("t")["snapshot_id"] == "commit-1"  # base-class view
    assert cat.row_count("t") == 4

    # current read = v2; time travel = v1
    assert cat.read(spark, "t").count() == 4
    old = cat.read(spark, "t", snapshot_id="commit-0")
    assert old.count() == 10
    assert {r["v"] for r in old.collect()} == {i * 2 for i in range(10)}

    # rollback appends commit-2 pointing at v1's data; history intact
    s3 = cat.rollback("t", "commit-0")
    assert s3["snapshot_id"] == "commit-2" and s3["rows"] == 10
    assert cat.read(spark, "t").count() == 10
    assert [e["snapshot_id"] for e in cat.history("t")] == [
        "commit-0", "commit-1", "commit-2",
    ]
    assert cat.history("t")[-1]["rolled_back_to"] == "commit-0"
    # the intermediate snapshot stays readable (snapshot isolation)
    assert cat.read(spark, "t", snapshot_id="commit-1").count() == 4
    # per-snapshot manifests differ
    assert cat.files("t", "commit-0") == cat.files("t", "commit-2")
    assert cat.files("t", "commit-1") != cat.files("t", "commit-0")

    with pytest.raises(KeyError, match="not in log"):
        cat.read(spark, "t", snapshot_id="commit-9")
    with pytest.raises(ValueError, match="overwrite"):
        cat.write(v1, "t", mode="append")
    with pytest.raises(FileNotFoundError):
        cat.read(spark, "missing")
