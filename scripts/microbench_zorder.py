"""Cell-encode microbench: native Z-order/geohash Column bit math vs the
Arrow pandas_udf S2 encode, same 2M synthetic points, local[32], noop
sink, best of 3. Shows what staying JVM-side buys a pure projection.

Usage: PYTHONPATH=. python scripts/microbench_zorder.py [n_points]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from fairy_core_spark.session import get_spark
from fairy_core_spark.spatial.ops import with_cell
from fairy_core_spark.spatial.zorder import geohash_col, morton_code


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark(app_name="zorder-bench", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    pts = spark.range(n).select(
        F.col("id").alias("point_id"),
        (((F.col("id") * 7919) % 120000) / 1000.0 - 60.0).alias("lat"),
        (((F.col("id") * 104729) % 360000) / 1000.0 - 180.0).alias("lon"),
    )

    def bench(label, df):
        best = float("inf")
        for _ in range(3):
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        print(f"| {label} | {best:.2f} | {n / best:,.0f} |")
        return best

    print("| encode | best (s) | pts/sec |")
    print("|---|---|---|")
    bench("Z-order morton (native bit math)",
          pts.withColumn("z", morton_code(F.col("lat"), F.col("lon"))))
    bench("geohash-8 (native, from morton)",
          pts.withColumn("gh", geohash_col(F.col("lat"), F.col("lon"), 8)))
    bench("S2 level-12 (Arrow pandas_udf numpy)", with_cell(pts, level=12))
    bench("hex7 res-7 (Arrow pandas_udf numpy)",
          with_cell(pts, level=7, scheme="hex7"))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
