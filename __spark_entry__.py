"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship — the north-rule pipeline slice (synthesize a
  small image+caption table, stage-1 validate, S2-encode via geo metadata,
  tile at level 12) joined with a stage-1 rule check over sf0.001 lineitem.
- ``queries()`` / ``oracle_sql()``: the operator registry lives in
  ``fairy_core_spark.queries`` — every operator from SURVEY.md §2 plus the
  training-pipeline/join extensions, each paired with a DuckDB oracle
  (non-SQL key derivations — minhash/simhash hashing, S2/hex7 tiling,
  image phash — are replayed via engine-portable md5 arithmetic, frozen
  drift-tested goldens, or published test vectors pinned as literal
  VALUES, so the join/aggregation logic is still cross-checked). Every
  entry carries an oracle: the former rows-only pair closed in round 3
  (spatial_cell_encode against the 18 published S2 vectors;
  image_validate against hand-derived counts from the datagen spec).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: validate -> encode -> tile over a synthetic image table,
    reported as per-tile rollups (tile_id, n_images, avg dims, phash dups).
    Uses sf0.001 lineitem for the stage-1 relational rule check so the
    driver's smoke test also touches the test data."""
    from pyspark.sql import functions as F

    from fairy_core_spark.datagen.images import geo_df, images_df, polygons_pdf
    from fairy_core_spark.operators.rules import nullish_pred
    from fairy_core_spark.pipeline.north import north_pipeline

    n = 2000
    images = images_df(spark, n, partitions=8, dirty_every=100)
    geo = geo_df(spark, n, partitions=8)
    tiles = north_pipeline(images, geo, polygons_pdf(20), n_partitions=8)

    # stage-1 relational rule over the driver test data (smoke contact)
    li = spark.read.parquet(f"{SF0001}/lineitem.parquet")
    bad_rows = li.where(nullish_pred("l_returnflag")).count()
    return tiles.withColumn("n_bad_returnflag_rows", F.lit(int(bad_rows)))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from fairy_core_spark.queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from fairy_core_spark.queries import oracle_sql as _o

    return _o()
