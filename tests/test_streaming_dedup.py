"""Streaming exact-dedup tests: output equals batch keep-first within the
watermark horizon, and content hashing keeps documents out of state."""

from __future__ import annotations

from pyspark.sql import functions as F

from fairy_core_spark.streaming.dedup import (
    streaming_dedup_content,
    streaming_dedup_keys,
)


def _planted_dup_frame(spark, n=500, dup_every=5):
    # every dup_every-th row repeats the previous row's doc_id/text,
    # seconds apart (well inside the watermark)
    return spark.range(n).select(
        F.when(F.col("id") % dup_every == 0, F.col("id") - 1)
        .otherwise(F.col("id"))
        .alias("doc_id"),
        F.concat(
            F.lit("text-"),
            (
                F.when(F.col("id") % dup_every == 0, F.col("id") - 1).otherwise(
                    F.col("id")
                )
            ).cast("string"),
        ).alias("text"),
        (F.lit("2026-01-01 00:00:00").cast("timestamp") + F.make_interval(
            secs=F.col("id").cast("double")
        )).alias("ts"),
    )


def _run_stream(spark, tmp_path, fn, name):
    src = tmp_path / f"src_{name}"
    batch = _planted_dup_frame(spark)
    batch.write.parquet(str(src))
    stream = spark.readStream.schema(batch.schema).format("parquet").load(str(src))
    out = fn(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def test_streaming_dedup_keys_matches_distinct(spark, tmp_path):
    got = _run_stream(
        spark,
        tmp_path,
        lambda s: streaming_dedup_keys(s, ["doc_id"], watermark="1 hour"),
        "dedup_keys",
    )
    batch = _planted_dup_frame(spark)
    n_distinct = batch.select("doc_id").distinct().count()
    assert got.count() == n_distinct
    assert got.select("doc_id").distinct().count() == n_distinct
    # 500 rows, ids 0..499; id%5==0 repeats the previous id -> 100 such
    # rows, but id=0 maps to doc_id=-1 which duplicates nothing -> 99
    assert batch.count() - got.count() == 99


def test_streaming_dedup_content_hashes_state_key(spark, tmp_path):
    got = _run_stream(
        spark,
        tmp_path,
        lambda s: streaming_dedup_content(s, "text", watermark="1 hour"),
        "dedup_content",
    )
    batch = _planted_dup_frame(spark)
    assert got.count() == batch.select("text").distinct().count()
    # the state/dedup key is the 32-hex md5, present on the output rows
    row = got.first()
    assert len(row.content_hash) == 32
    int(row.content_hash, 16)  # valid hex
