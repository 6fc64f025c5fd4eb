"""Stress the trajectory/clustering/webmercator family at web-scale-ish
row counts (BENCH/STRESS.md companion): 2M timestamped events across
200k entities with planted hot entities (skew realism), zoom-12 quadkey
encode + pyramid, per-entity path stats, dwell episodes over coarse
tile regions, daily OD flows, and grid spatial clustering.

Usage: python scripts/stress_trajectory.py [n_events] [n_entities]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from fairy_core_spark.session import get_spark  # noqa: E402


def synth_events(spark, n: int, n_entities: int):
    """Deterministic event stream: integer-hash positions, minute-spaced
    timestamps; entities hash-assigned, except 2% of rows remapped onto
    ONE hot entity (the fleet-telemetry whale every real feed has)."""
    base = spark.range(n).select(F.col("id").alias("eid"))
    ent = (F.col("eid") * 2654435761) % n_entities
    hot = F.col("eid") % 50 == 13
    return base.select(
        "eid",
        F.when(hot, F.lit(0)).otherwise(ent).cast("long").alias("entity_id"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("eid") * 60).alias("ts"),
        (((F.col("eid") * 7919) % 120000) / 1000.0 - 60.0).alias("lat"),
        (((F.col("eid") * 104729) % 360000) / 1000.0 - 180.0).alias("lon"),
    )


def force(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn, n, out):
    t0 = time.monotonic()
    fn()
    dt = time.monotonic() - t0
    out[label] = {"sec": round(dt, 2), "rows_per_sec": int(n / dt)}
    print(f"{label}: {dt:.2f}s  ({int(n / dt):,} rows/s)")


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_entities = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    spark = get_spark(app_name="stress-trajectory")
    spark.sparkContext.setLogLevel("ERROR")

    from fairy_core_spark.spatial.ops import cluster_cells, with_cell
    from fairy_core_spark.spatial.trajectory import (
        colocation_pairs,
        dwell_episodes,
        od_matrix,
        path_stats,
    )
    from fairy_core_spark.spatial.webmercator import pyramid, with_tiles

    ev = synth_events(spark, n, n_entities).repartition(64).cache()
    ev.count()
    out: dict = {"n_events": n, "n_entities": n_entities}

    timed(
        "webmercator_encode_z12",
        lambda: force(with_tiles(ev, zoom=12)),
        n,
        out,
    )
    timed(
        "quadkey_pyramid_z12_8_4",
        lambda: force(
            pyramid(with_tiles(ev, zoom=12).select("quadkey"), zooms=(12, 8, 4))
            .groupBy("res", "cell")
            .count()
        ),
        n,
        out,
    )
    timed(
        "path_stats",
        lambda: force(path_stats(ev, entity_col="entity_id", tiebreak_col="eid")),
        n,
        out,
    )
    regions = with_tiles(ev, zoom=5, quadkey=True).select(
        "entity_id", "ts", "eid", F.col("quadkey").alias("region")
    )
    timed(
        "dwell_episodes_z5",
        lambda: force(
            dwell_episodes(regions, entity_col="entity_id", tiebreak_col="eid")
        ),
        n,
        out,
    )
    trips = with_tiles(ev, zoom=6).withColumn("day", F.to_date("ts"))
    timed(
        "od_matrix_z6_daily",
        lambda: force(
            od_matrix(
                trips,
                entity_col="entity_id",
                bucket_col="day",
                tiebreak_col="eid",
            )
        ),
        n,
        out,
    )
    coloc_in = with_tiles(ev, zoom=9, quadkey=True).withColumn(
        "day", F.to_date("ts")
    ).select("entity_id", "day", "quadkey")
    timed(
        "colocation_pairs_z9_daily_cap100",
        lambda: force(
            colocation_pairs(
                coloc_in,
                entity_col="entity_id",
                loc_col="quadkey",
                bucket_col="day",
                min_shared=2,
                max_entities_per_key=100,
            )
        ),
        n,
        out,
    )
    tiled = with_cell(ev, level=3, out="cell", scheme="hex7")
    timed(
        "cluster_cells_hex7_l3",
        lambda: force(cluster_cells(tiled, min_points=2, max_iters=60)),
        n,
        out,
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
