"""Minimal spark-submit job proving the --py-files deployment contract:
imports fairy_core_spark ONLY from the shipped zip (the repo dir is not on
sys.path when launched via spark-submit from another cwd), runs one rule
aggregate + one S2 encode, prints a single OK line.

    spark-submit --py-files dist/fairy_core_spark.zip scripts/submit_demo.py
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    spark = SparkSession.builder.appName("fairy-submit-demo").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import fairy_core_spark  # resolved from the --py-files zip
    from fairy_core_spark.operators.rules import nullish_pred
    from fairy_core_spark.spatial.ops import with_cell

    df = spark.createDataFrame(
        [("a", 10.0, 20.0), ("", 48.85, 2.35), (None, -33.86, 151.21)],
        "name string, lat double, lon double",
    )
    n_bad = df.where(nullish_pred("name")).count()
    cells = with_cell(df, level=7).select("cell").distinct().count()
    print(f"SUBMIT_OK src={fairy_core_spark.__file__} n_bad={n_bad} cells={cells}")
    spark.stop()


if __name__ == "__main__":
    main()
