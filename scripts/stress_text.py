"""Stress the text/dedup family at 10-50x the sf0.1 document count to
validate the scale story empirically (BENCH/STRESS.md): synthesize N docs
distributed (spark.range + native exprs, no driver data), run each
operator end-to-end, report wall time + docs/sec.

Usage: python scripts/stress_text.py [n_docs]   (default 5_000_000)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from fairy_core_spark.session import get_spark  # noqa: E402

WORDS = [
    "alpha", "bravo", "charlie", "delta", "the", "of", "and", "osprey",
    "granite", "meadow", "tundra", "verdant", "rivulet", "saffron",
    "harbor", "lantern", "quarry", "spark", "shuffle", "partition",
]


def synth_docs(spark, n: int, n_tokens: int = 60, n_vocab: int | None = None):
    # ~15% of docs are near-duplicates of a neighbor (id-1) to give the
    # dedup families real work
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 7 == 3, F.col("id") - 1).otherwise(F.col("id")).alias("seed"),
        (F.col("id") % 97).alias("source"),
    )
    # per-position word index via xxhash64(seed, i): distinct seeds yield
    # distinct texts (a plain linear formula repeats with period len(WORDS)
    # and collapses the corpus into ~20 giant duplicate groups, which blows
    # up any pairwise operator and benchmarks nothing real)
    #
    # n_vocab=None keeps the 20-word list (every doc-pair lands at Jaccard
    # ~0.92 — a DENSE corpus where the pairwise output is ~all block pairs);
    # n_vocab=K synthesizes w<idx> tokens over a K-word space — a REALISTIC
    # corpus where unrelated docs share almost nothing and candidate
    # pruning (prefix filtering) is the whole game.
    if n_vocab is None:
        word = lambda i: F.element_at(  # noqa: E731
            F.array(*[F.lit(w) for w in WORDS]),
            (F.pmod(F.xxhash64(F.col("seed"), F.lit(i)), F.lit(len(WORDS))) + 1).cast("int"),
        )
    else:
        word = lambda i: F.concat(  # noqa: E731
            F.lit("w"), F.pmod(F.xxhash64(F.col("seed"), F.lit(i)), F.lit(n_vocab))
        )
    text = F.concat_ws(" ", *[word(i) for i in range(n_tokens)])
    return base.select("doc_id", "source", text.alias("text"))


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    spark = get_spark(app_name="stress-text")
    spark.sparkContext.setLogLevel("ERROR")
    docs = synth_docs(spark, n).repartition(64).cache()
    docs.count()

    from fairy_core_spark.operators.dedup import (
        exact_dup_groups,
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
        simhash_df,
    )
    from fairy_core_spark.operators.text import doc_fingerprint, text_features_df, with_text_features

    results = {}

    def run(name, mk, runs=2):
        best = float("inf")
        for _ in range(runs):
            t0 = time.monotonic()
            force(mk())
            best = min(best, time.monotonic() - t0)
        results[name] = {"sec": round(best, 2), "docs_per_sec": round(n / best)}
        print(name, results[name])

    run("text_features_df (scale path)", lambda: text_features_df(docs))
    if n <= 500_000:  # columnwise HOF form: interpreted lambdas, ~10x slower
        run("with_text_features (columnwise)", lambda: with_text_features(docs))
    run("doc_fingerprint", lambda: docs.select("doc_id", doc_fingerprint()))
    run("dedup_exact", lambda: exact_dup_groups(docs, "text", "doc_id"))
    from fairy_core_spark.operators.dedup import duplicated_spans

    run("duplicated_spans (w=8)", lambda: duplicated_spans(docs, window=8))
    run("simhash", lambda: simhash_df(docs, "text", "doc_id"))
    run("minhash_lsh", lambda: minhash_lsh_candidates(docs, "text", "doc_id"))

    # planted hot bucket: 20k byte-identical docs share every LSH band ->
    # one bucket would emit ~2x10^8 clique pairs. The hot_bucket_cap guard
    # must keep the run bounded (star pairs, linear in bucket width) — this
    # is the 100 TB degenerate-boilerplate scenario.
    n_hot = min(20_000, max(n // 50, 1_000))
    hot = spark.range(n_hot).selectExpr(
        "id + 1000000000 AS doc_id", "'identical boilerplate body text' AS text"
    )
    poisoned = docs.select("doc_id", "text").unionByName(hot).repartition(64).cache()
    poisoned.count()
    t0 = time.monotonic()
    capped_pairs = minhash_lsh_candidates(
        poisoned, "text", "doc_id", hot_bucket_cap=256
    )
    n_pairs = capped_pairs.count()
    dt = time.monotonic() - t0
    bound = (n_hot - 1) * 2 + 400_000  # star rows (pre-distinct x bands) + organic residue
    results["minhash_lsh hot-bucket (cap=256)"] = {
        "sec": round(dt, 2),
        "pairs": n_pairs,
        "bounded": n_pairs <= bound,
    }
    print("minhash_lsh hot-bucket (cap=256)", results["minhash_lsh hot-bucket (cap=256)"])
    poisoned.unpersist()
    # pairwise family needs a fine block key to bound the pair blow-up:
    # ~100 docs/block -> ~5k pairs/block, realistic for a post-LSH refine.
    # The 20-word corpus is DENSE (every pair is a true >=0.5 dup — the run
    # measures emitting ~all block pairs, so candidate pruning can't help;
    # prefilter='none' keeps it comparable with the r2/r3 numbers).
    fine = docs.withColumn("blk", F.pmod(F.col("doc_id"), F.lit(20011)))
    run("ngram_jaccard dense corpus (hashed tokens, no prefilter)",
        lambda: ngram_jaccard_pairs(fine, "text", "doc_id", "blk", 0.5, prefilter="none"))
    run("ngram_jaccard dense corpus (string tokens)",
        lambda: ngram_jaccard_pairs(fine, "text", "doc_id", "blk", 0.5,
                                    hash_tokens=False, prefilter="none"))

    # realistic corpus: 50k-word vocab -> unrelated docs share ~0 tokens,
    # only the planted neighbor dups are true pairs. SAME fine blocking as
    # the dense run (same candidate-pair volume), so the naive baseline is
    # directly comparable to the dense 87s figure — this is where the
    # exact PPJoin-style prefix filter earns its keep vs the O(block^2)
    # verify.
    wide = (
        synth_docs(spark, n, n_vocab=50_000)
        .withColumn("blk", F.pmod(F.col("doc_id"), F.lit(20011)))
        .repartition(64)
        .cache()
    )
    wide.count()
    run("ngram_jaccard realistic corpus (prefix filter)",
        lambda: ngram_jaccard_pairs(wide, "text", "doc_id", "blk", 0.5))
    run("ngram_jaccard realistic corpus (naive block join)",
        lambda: ngram_jaccard_pairs(wide, "text", "doc_id", "blk", 0.5, prefilter="none"))

    print(json.dumps({"n_docs": n, "results": results}, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
