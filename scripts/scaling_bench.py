"""Scaling-efficiency evidence (BASELINE.md protocol): run the identical
image pipeline at local[8] and local[32] on the same input, >=1 warm-up +
N timed runs each, median throughput, efficiency = T(32) / (4 x T(8)).

Each configuration runs in a fresh subprocess (own JVM) so executor-thread
count is the only variable. Writes BENCH/BASELINE.md.

Usage: python scripts/scaling_bench.py [n_images] [runs]
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import json, sys, time, tempfile, shutil
sys.path.insert(0, {repo!r})
from fairy_core_spark.session import get_spark
from fairy_core_spark.datagen.images import geo_df, images_df, polygons_pdf
from fairy_core_spark.operators.images import with_image_checks
from fairy_core_spark.spatial.ops import spatial_join_broadcast, tile_aggregates, with_cell
from pyspark.sql import functions as F

cpus = {cpus}
n_images = {n_images}
runs = {runs}

spark = get_spark(app_name=f"scaling-{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=2 * cpus)
spark.sparkContext.setLogLevel("ERROR")

tmp = tempfile.mkdtemp(prefix="fairy_scale_")
try:
    # input materialized once, identical bytes for every run (gen excluded)
    images_df(spark, n_images, partitions=4 * cpus).write.mode("overwrite").parquet(tmp + "/images")
    geo_df(spark, n_images, partitions=4 * cpus).write.mode("overwrite").parquet(tmp + "/geo")
    images = spark.read.parquet(tmp + "/images")
    geo = spark.read.parquet(tmp + "/geo")
    polys = polygons_pdf(100)

    def pipeline():
        checked = with_image_checks(images)
        valid = checked.where(F.col("decode_ok") & F.col("dims_ok") & F.col("caption_ok"))
        encoded = with_cell(valid.join(geo, "image_id"), "lat", "lon", 12, out="tile_id")
        encoded = encoded.persist()  # two consumers; decode pass runs once
        pip = spatial_join_broadcast(encoded.select("image_id", "lat", "lon"), polys)
        prefix = F.shiftrightunsigned(F.col("tile_id"), 64 - 12)
        tiled = encoded.withColumn("tile_prefix", prefix).repartition(2 * cpus, "tile_prefix")
        tiles = tile_aggregates(tiled)
        pip.write.format("noop").mode("overwrite").save()
        tiles.write.format("noop").mode("overwrite").save()
        encoded.unpersist()

    pipeline()  # warm-up, discarded
    times = []
    for _ in range(runs):
        t0 = time.monotonic()
        pipeline()
        times.append(time.monotonic() - t0)
    print("RESULT " + json.dumps({{"cpus": cpus, "times": times}}))
finally:
    shutil.rmtree(tmp, ignore_errors=True)
"""


def run_config(cpus: int, n_images: int, runs: int) -> dict:
    code = CHILD.format(repo=str(REPO), cpus=cpus, n_images=n_images, runs=runs)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3000
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from cpus={cpus}: {out.stdout[-500:]} {out.stderr[-2000:]}")


def main() -> int:
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    r8 = run_config(8, n_images, runs)
    r32 = run_config(32, n_images, runs)
    t8 = statistics.median(r8["times"])
    t32 = statistics.median(r32["times"])
    thr8 = n_images / t8
    thr32 = n_images / t32
    eff = thr32 / (4 * thr8)

    md = f"""# BENCH/BASELINE — scaling-efficiency evidence

Protocol (BASELINE.md): identical validate->S2-encode->spatial-join->tile
pipeline, identical pre-materialized parquet input ({n_images:,} synthetic
images), fresh JVM per configuration, 1 warm-up discarded, {runs} timed
runs, median reported. The only variable is `--master local[8]` vs
`local[32]` (the sandbox stand-in for N- vs 4N-executor clusters).

| config | times (s) | median (s) | images/sec |
|---|---|---|---|
| local[8]  | {', '.join(f'{t:.2f}' for t in r8['times'])} | {t8:.2f} | {thr8:,.0f} |
| local[32] | {', '.join(f'{t:.2f}' for t in r32['times'])} | {t32:.2f} | {thr32:,.0f} |

**Scaling efficiency = T(32) / (4 x T(8)) = {thr32:,.0f} / (4 x {thr8:,.0f}) = {eff:.3f}**
(north-rule target >= 0.8)

Notes
- Throughput counts input image rows through the full pipeline
  (validate -> encode -> broadcast PIP join -> tile rollup), generation
  excluded, per BASELINE.md bench rules.
- The pipeline is shuffle-light by design: validation and encoding are
  projections; the PIP join broadcasts the polygon index (zero shuffle);
  the only shuffles are the image<->geo join and the explicit cell-prefix
  repartition before tiling.
"""
    out_path = REPO / "BENCH" / "BASELINE.md"
    out_path.parent.mkdir(exist_ok=True)
    out_path.write_text(md)
    print(md)
    print(json.dumps({"t8": t8, "t32": t32, "images_per_sec_8": thr8,
                      "images_per_sec_32": thr32, "efficiency": eff}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
