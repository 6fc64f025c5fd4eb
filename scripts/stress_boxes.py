"""Stress the detection-box family at web-scale-ish counts
(BENCH/STRESS.md companion): deterministic synthetic boxes (per-image
clusters with planted near-duplicates), exact-integer IoU dedup
(pairs -> connected components -> keeper) and greedy NMS.

Usage: python scripts/stress_boxes.py [n_images] [boxes_per_image]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from fairy_core_spark.session import get_spark  # noqa: E402


def synth_boxes(spark, n_images: int, per_image: int):
    """Deterministic boxes: each image gets per_image boxes in two
    spatial clusters with small jitters (near-dups) plus far offsets —
    the dup-density shape of multi-source detection labels."""
    n = n_images * per_image
    base = spark.range(n).select(F.col("id").alias("box_id"))
    img = F.floor(F.col("box_id") / per_image).cast("long")
    b = (F.col("box_id") % per_image).cast("long")
    bx = (img * 37) % 800
    by = (img * 91) % 600
    w = 40 + img % 80
    h = 30 + img % 60
    # half the boxes jitter around the base corner, half around +300
    dx = F.when(b % 2 == 0, b) .otherwise(300 + b)
    dy = F.when(b % 2 == 0, b * 2 % 7).otherwise(300 + (b * 3) % 5)
    return base.select(
        "box_id",
        img.alias("image_id"),
        (b % 97).alias("score"),
        (bx + dx).alias("x0"),
        (by + dy).alias("y0"),
        (bx + dx + w + b % 3).alias("x1"),
        (by + dy + h).alias("y1"),
    )


def main() -> int:
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    per_image = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    spark = get_spark(app_name="stress-boxes", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    from fairy_core_spark.operators.boxes import iou_dedup_groups, nms_boxes

    boxes = synth_boxes(spark, n_images, per_image)
    boxes.write.mode("overwrite").parquet("/tmp/stress_boxes")
    df = spark.read.parquet("/tmp/stress_boxes")
    n = df.count()

    t0 = time.time()
    dedup = iou_dedup_groups(df, iou_num=1, iou_den=2)
    n_members = dedup.count()
    n_keep = dedup.where(F.col("is_keeper") == 1).count()
    t_dedup = time.time() - t0

    t0 = time.time()
    dedup_g = iou_dedup_groups(df, iou_num=1, iou_den=2, method="global")
    ng_members = dedup_g.count()
    ng_keep = dedup_g.where(F.col("is_keeper") == 1).count()
    t_dedup_g = time.time() - t0
    assert (ng_members, ng_keep) == (n_members, n_keep)

    t0 = time.time()
    kept = nms_boxes(df, iou_num=1, iou_den=2)
    n_nms = kept.count()
    t_nms = time.time() - t0

    print(json.dumps({
        "n_boxes": n,
        "n_images": n_images,
        "dedup_members": n_members,
        "dedup_groups": n_keep,
        "dedup_sec": round(t_dedup, 2),
        "dedup_boxes_per_sec": round(n / t_dedup),
        "dedup_global_sec": round(t_dedup_g, 2),
        "nms_kept": n_nms,
        "nms_sec": round(t_nms, 2),
        "nms_boxes_per_sec": round(n / t_nms),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
