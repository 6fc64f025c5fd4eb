"""Microbench: round-2 vectorized text kernels vs the round-1 baselines
(the two Python inner loops flagged in the round-1 review).

- doc_fingerprint: closed-form Horner (shared cumprod power table +
  vectorized multiply-accumulate) vs per-byte Python loop. Outputs must be
  IDENTICAL (same hash definition).
- simhash: native explode + 64 plain bit sums + count (md5 token hash) vs
  the old per-token per-byte FNV pandas_udf. Hash function changed by
  design (md5 is DuckDB-replayable), so only throughput is compared.

Usage: python scripts/microbench_text.py [n_docs]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import LongType  # noqa: E402

from fairy_core_spark.session import get_spark  # noqa: E402


def old_doc_fingerprint(col_name: str = "text", out_name: str = "fingerprint"):
    """round-1 baseline: per-byte Python Horner loop (operators/text.py@r1)."""
    B = np.uint64(1000003)
    MASK = np.uint64(0xFFFFFFFFFFFFFFFF)

    @F.pandas_udf(LongType())
    def _fp(s: pd.Series) -> pd.Series:
        np.seterr(over="ignore")
        out = np.zeros(len(s), dtype=np.uint64)
        for i, txt in enumerate(s):
            if txt is None:
                continue
            b = np.frombuffer(txt.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
            h = np.uint64(1469598103934665603)
            for chunk in np.array_split(b, max(1, len(b) // 4096)):
                for v in chunk:
                    h = ((h * B) + v) & MASK
            out[i] = h
        return pd.Series(out.astype(np.int64))

    return _fp(F.col(col_name)).alias(out_name)


def old_simhash64(col_name: str, out_name: str = "simhash"):
    """round-1 baseline: per-token per-byte FNV (operators/dedup.py@r1)."""
    FNV_OFF = np.uint64(14695981039346656037)
    FNV_PRIME = np.uint64(1099511628211)
    MASK = np.uint64(0xFFFFFFFFFFFFFFFF)

    def _fnv(tok: str) -> np.uint64:
        h = FNV_OFF
        for byte in tok.encode("utf-8"):
            h = ((h ^ np.uint64(byte)) * FNV_PRIME) & MASK
        return h

    @F.pandas_udf(LongType())
    def _simhash(s: pd.Series) -> pd.Series:
        np.seterr(over="ignore")
        out = np.zeros(len(s), dtype=np.int64)
        for i, txt in enumerate(s):
            if not txt:
                continue
            toks = txt.split()
            if not toks:
                continue
            hs = np.fromiter((_fnv(t) for t in toks), dtype=np.uint64, count=len(toks))
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
            acc = (2 * bits - 1).sum(axis=0)
            v = np.uint64(0)
            for k in np.nonzero(acc > 0)[0]:
                v |= np.uint64(1) << np.uint64(k)
            out[i] = np.int64(v.astype(np.int64))
        return pd.Series(out)

    return _simhash(F.col(col_name)).alias(out_name)


def timed(label: str, fn, runs: int = 3) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    print(f"{label}: best {best:.2f}s of {runs}")
    return best


def make_docs(spark, n: int, n_tokens: int):
    words = ["alpha", "bravo", "charlie", "delta", "the", "of", "and", "osprey",
             "granite", "meadow", "tundra", "verdant", "rivulet", "saffron"]
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[F.element_at(F.array(*[F.lit(w) for w in words]),
                           ((F.col("id") * (i + 7) + i) % len(words) + 1).cast("int"))
              for i in range(n_tokens)],
        ).alias("text"),
    ).cache()
    df.count()
    return df


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark(app_name="microbench-text")
    spark.sparkContext.setLogLevel("ERROR")

    docs = make_docs(spark, n, 40)

    from fairy_core_spark.operators.dedup import simhash_df
    from fairy_core_spark.operators.text import doc_fingerprint

    # identical outputs check for fingerprint (hash definition unchanged)
    sample = docs.limit(2000)
    new_fp = {r["doc_id"]: r["fingerprint"] for r in sample.select("doc_id", doc_fingerprint()).collect()}
    old_fp = {r["doc_id"]: r["fingerprint"] for r in sample.select("doc_id", old_doc_fingerprint()).collect()}
    assert new_fp == old_fp, "fingerprint outputs diverged!"
    print(f"fingerprint outputs identical on {len(new_fp)} docs")

    # each timed run rebuilds the DataFrame: re-collecting one instance
    # would silently reuse its shuffle outputs. At this corpus size the
    # one-off Catalyst analysis of the 65-column aggregate is noise.
    t_new_fp = timed("fingerprint NEW (vectorized horner)",
                     lambda: docs.select(doc_fingerprint()).agg(F.sum(F.col("fingerprint") % 1000003)).collect())
    t_old_fp = timed("fingerprint OLD (per-byte python)",
                     lambda: docs.select(old_doc_fingerprint()).agg(F.sum(F.col("fingerprint") % 1000003)).collect())
    print(f"fingerprint speedup: {t_old_fp / t_new_fp:.1f}x")

    t_new_sh = timed("simhash NEW (native md5 sums)",
                     lambda: simhash_df(docs, "text", "doc_id").agg(F.sum(F.col("simhash") % 1000003)).collect())
    t_old_sh = timed("simhash OLD (python FNV udf)",
                     lambda: docs.select("doc_id", old_simhash64("text")).agg(F.sum(F.col("simhash") % 1000003)).collect())
    print(f"simhash speedup: {t_old_sh / t_new_sh:.1f}x")

    # KB-size docs (the 100 TB-corpus shape): the per-byte loops scale with
    # doc length, the vectorized/native kernels barely do
    docs_l = make_docs(spark, max(n // 5, 1000), 800)
    t1 = timed("long-doc fingerprint NEW",
               lambda: docs_l.select(doc_fingerprint()).agg(F.sum(F.col("fingerprint") % 1000003)).collect())
    t2 = timed("long-doc fingerprint OLD",
               lambda: docs_l.select(old_doc_fingerprint()).agg(F.sum(F.col("fingerprint") % 1000003)).collect())
    print(f"long-doc fingerprint speedup: {t2 / t1:.1f}x")
    t3 = timed("long-doc simhash NEW",
               lambda: simhash_df(docs_l, "text", "doc_id").agg(F.sum(F.col("simhash") % 1000003)).collect())
    t4 = timed("long-doc simhash OLD",
               lambda: docs_l.select("doc_id", old_simhash64("text")).agg(F.sum(F.col("simhash") % 1000003)).collect())
    print(f"long-doc simhash speedup: {t4 / t3:.1f}x")


if __name__ == "__main__":
    main()
