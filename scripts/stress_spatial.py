"""Stress the spatial family at web-scale-ish point counts
(BENCH/STRESS.md companion): deterministic synthetic points (10% in 3
hotspot clusters for skew realism), broadcast PIP join, S2 encode, tile
rollup, and grid kNN.

Usage: python scripts/stress_spatial.py [n_points] [n_queries]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from fairy_core_spark.session import get_spark  # noqa: E402


def synth_points(spark, n: int):
    """lat/lon from integer arithmetic; 10% remapped into 3 tight hotspots."""
    base = spark.range(n).select(F.col("id").alias("pid"))
    lat = ((F.col("pid") * 7919) % 120000) / 1000.0 - 60.0
    lon = ((F.col("pid") * 104729) % 360000) / 1000.0 - 180.0
    hot = F.col("pid") % 10 == 7
    hot_idx = (F.col("pid") % 3).cast("int")
    hot_lat = F.element_at(F.array(F.lit(40.71), F.lit(51.51), F.lit(35.68)), hot_idx + 1)
    hot_lon = F.element_at(F.array(F.lit(-74.01), F.lit(-0.13), F.lit(139.69)), hot_idx + 1)
    jit_lat = ((F.col("pid") * 31) % 2000) / 10000.0 - 0.1
    jit_lon = ((F.col("pid") * 37) % 2000) / 10000.0 - 0.1
    return base.select(
        "pid",
        F.when(hot, hot_lat + jit_lat).otherwise(lat).alias("lat"),
        F.when(hot, hot_lon + jit_lon).otherwise(lon).alias("lon"),
    )


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
    spark = get_spark(app_name="stress-spatial")
    spark.sparkContext.setLogLevel("ERROR")
    pts = synth_points(spark, n).repartition(64).cache()
    pts.count()

    from fairy_core_spark.datagen.images import polygons_pdf
    from fairy_core_spark.spatial.ops import (
        knn_join,
        spatial_join_broadcast,
        spatial_join_cells,
        with_cell,
    )

    results = {}

    def run(name, mk, runs=2):
        best = float("inf")
        for _ in range(runs):
            t0 = time.monotonic()
            force(mk())
            best = min(best, time.monotonic() - t0)
        results[name] = {"sec": round(best, 2), "points_per_sec": round(n / best)}
        print(name, results[name])

    polys = polygons_pdf(100)
    run("cell_encode_l12", lambda: with_cell(pts, level=12))
    run(
        "tile_rollup_l7",
        lambda: with_cell(pts, level=7, out="tile")
        .groupBy("tile")
        .agg(F.count(F.lit(1)).alias("n"), F.avg("lat"), F.avg("lon")),
    )
    run(
        "pip_join_broadcast",
        lambda: spatial_join_broadcast(
            pts.withColumn("pid", F.col("pid").cast("string")), polys, id_col="pid"
        ),
    )

    run("hex7_encode_r7", lambda: with_cell(pts, level=7, scheme="hex7"))
    run(
        "hex7_pip_join_cells",
        lambda: spatial_join_cells(
            pts.withColumn("pid", F.col("pid").cast("string")), polys,
            id_col="pid", level=3, scheme="hex7",
        ),
    )

    from fairy_core_spark.spatial.ops import s2_pyramid

    run(
        "s2_pyramid_l12_8_4",
        lambda: s2_pyramid(
            with_cell(pts, level=12, out="cell"), cell_col="cell",
            levels=(12, 8, 4),
        )
        .groupBy("res", "cell")
        .agg(F.count(F.lit(1)).alias("n"), F.avg("lat"), F.avg("lon")),
    )

    queries = pts.where(F.col("pid") % (n // n_q) == 0).withColumnRenamed(
        "pid", "query_id"
    ).cache()
    nq = queries.count()
    best, n_res = float("inf"), 0
    for _ in range(2):  # best-of-2, consistent with the other rows
        t0 = time.monotonic()
        got = knn_join(
            pts.withColumnRenamed("pid", "id"), queries, k=5,
            id_col="id", query_id_col="query_id",
        )
        n_res = got.count()
        best = min(best, time.monotonic() - t0)
    results["knn_k5"] = {
        "sec": round(best, 2),
        "n_queries": nq,
        "result_rows": n_res,
        "queries_per_sec": round(nq / best),
    }
    print("knn_k5", results["knn_k5"])

    # --- round-5 bounded-radius ops: map matching + isolation audit ---
    from fairy_core_spark.spatial.ops import isolated_points, snap_points_to_segments

    # road-scale (short) segments — the broadcast seg-tile design targets
    # roads, not continent-length lines; 5000 segments ~0.1-0.4 deg long
    n_segs = 5_000
    segs = spark.range(1, n_segs + 1).select(
        F.col("id").alias("seg_id"),
        (((F.col("id") * 7919) % 120000) / 1000.0 - 60.0).alias("lat0"),
        (((F.col("id") * 104729) % 360000) / 1000.0 - 180.0).alias("lon0"),
    ).select(
        "seg_id", "lat0", "lon0",
        (F.col("lat0") + ((F.col("seg_id") % 8) + 1) / 20.0).alias("lat1"),
        (F.col("lon0") + ((F.col("seg_id") % 5) + 1) / 20.0).alias("lon1"),
    ).select(
        "seg_id", "lat0", "lon0", "lat1", "lon1",
        F.round(F.col("lon0") * 1000).cast("long").alias("ax"),
        F.round(F.col("lat0") * 1000).cast("long").alias("ay"),
        F.round(F.col("lon1") * 1000).cast("long").alias("bx"),
        F.round(F.col("lat1") * 1000).cast("long").alias("by"),
    ).cache()
    segs.count()
    pts_i = pts.select(
        F.col("pid").alias("point_id"), "lat", "lon",
        F.round(F.col("lon") * 1000).cast("long").alias("px"),
        F.round(F.col("lat") * 1000).cast("long").alias("py"),
    ).cache()
    pts_i.count()
    run("map_match_z8", lambda: snap_points_to_segments(pts_i, segs, 8))
    run(
        "isolated_points_z9_cap64",
        lambda: isolated_points(pts_i, 9, max_per_tile=64),
    )

    print(json.dumps({"n_points": n, "results": results}, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
