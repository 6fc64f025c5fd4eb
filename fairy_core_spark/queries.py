"""Driver-contract query registry: every SQL-expressible operator from
SURVEY.md §2 (plus the training-data-pipeline ops) as a (Spark callable,
DuckDB oracle SQL) pair over the /root/testdata star schema.

Contract rules honored here:
- every computed column aliased identically in Spark and SQL;
- money aggregates go through DECIMAL(18,2) sums (exact in both engines)
  and surface as DOUBLE (identical IEEE value both sides);
- float similarity/quality scores are rounded before ranking/output;
- rankings always carry a deterministic integer tie-break;
- spatial/image/LSH ops that SQL can't express are registered without an
  oracle (driver records rows-only checks).

The lat/lon synth used by spatial queries is pure integer arithmetic on
keys — byte-identical in Spark and DuckDB:
    lat = ((k * 7919)   % 120000) / 1000.0 - 60.0
    lon = ((k * 104729) % 360000) / 1000.0 - 180.0
Rectangle "polygons" use offset bounds (x.xxx55) so no synthesized point
ever lands exactly on a boundary (ray-cast vs BETWEEN edge semantics).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fairy_core_spark.operators.dedup import (
    exact_dup_groups,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash64,
)
from fairy_core_spark.operators.rules import (
    enum_pred,
    non_empty_trimmed_pred,
    nullish_pred,
    range_pred,
    url_invalid_pred,
)
from fairy_core_spark.operators.similarity import cosine_topk_bruteforce, ivf_topk
from fairy_core_spark.operators.text import (
    lang_id,
    quality_score,
    token_count,
)

QueryFn = Callable[[SparkSession, str], DataFrame]
_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def _q(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if sql is not None:
            _ORACLES[name] = sql
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------- rules


@_q(
    "rule_required_nullish",
    """
    SELECT
      CAST(SUM(CASE WHEN c_name IS NULL OR TRIM(CAST(c_name AS VARCHAR)) = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_name,
      CAST(SUM(CASE WHEN c_mktsegment IS NULL OR TRIM(CAST(c_mktsegment AS VARCHAR)) = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_segment,
      COUNT(*) AS n_rows
    FROM customer
    """,
)
def rule_required_nullish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """reference `required` cell test (rulepack_runner.py:601-636) as a
    fused aggregate over customer."""
    df = _t(spark, sf_dir, "customer")
    cnt = lambda p: F.sum(F.when(p, 1).otherwise(0)).cast("long")  # noqa: E731
    return df.agg(
        cnt(nullish_pred("c_name")).alias("n_bad_name"),
        cnt(nullish_pred("c_mktsegment")).alias("n_bad_segment"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@_q(
    "rule_unique_keep_first",
    """
    SELECT o_custkey AS key, COUNT(*) - 1 AS n_flagged
    FROM orders GROUP BY o_custkey HAVING COUNT(*) > 1
    """,
)
def rule_unique_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`unique` keep-first semantics (rulepack_runner.py:392-421): flagged
    rows per duplicated key = count - 1."""
    df = _t(spark, sf_dir, "orders")
    return (
        df.groupBy(F.col("o_custkey").alias("key"))
        .agg((F.count(F.lit(1)) - 1).alias("n_flagged"))
        .where(F.col("n_flagged") > 0)
    )


@_q(
    "rule_dup_rows_composite",
    """
    SELECT l_orderkey AS k1, l_partkey AS k2, COUNT(*) AS n
    FROM lineitem GROUP BY 1, 2 HAVING COUNT(*) > 1
    """,
)
def rule_dup_rows_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`no_duplicate_rows` over a composite key (rulepack_runner.py:359-389)."""
    df = _t(spark, sf_dir, "lineitem")
    return (
        df.groupBy(F.col("l_orderkey").alias("k1"), F.col("l_partkey").alias("k2"))
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
    )


@_q(
    "rule_enum_violations",
    """
    SELECT event_type AS bad_value, COUNT(*) AS n
    FROM events
    WHERE event_type IS NULL
       OR lower(trim(event_type)) NOT IN ('click','view','purchase','signup')
    GROUP BY 1
    """,
)
def rule_enum_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`enum` with normalize {trim, casefold} (rulepack_runner.py:424-471);
    NULL counts as violation."""
    df = _t(spark, sf_dir, "events")
    pred = enum_pred(
        "event_type",
        ["click", "view", "purchase", "signup"],
        {"trim": True, "casefold": True},
    )
    return (
        df.where(pred)
        .groupBy(F.col("event_type").alias("bad_value"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_q(
    "rule_range_violations",
    """
    SELECT l_discount AS bad_value, COUNT(*) AS n
    FROM lineitem
    WHERE l_discount IS NULL OR l_discount < 0.0 OR l_discount > 0.08
    GROUP BY 1
    """,
)
def rule_range_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`range` inclusive bounds; null/non-numeric violates
    (rulepack_runner.py:474-519)."""
    df = _t(spark, sf_dir, "lineitem")
    return (
        df.where(range_pred("l_discount", 0.0, 0.08, True))
        .groupBy(F.col("l_discount").alias("bad_value"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_q(
    "rule_fk_clean",
    """
    SELECT DISTINCT l_partkey AS missing_value
    FROM lineitem
    WHERE l_partkey IS NOT NULL
      AND l_partkey NOT IN (SELECT p_partkey FROM part WHERE p_partkey IS NOT NULL)
    """,
)
def rule_fk_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`foreign_key` distinct-missing-values semantics
    (rulepack_runner.py:525-568); clean pair -> empty result."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    lv = li.select(F.col("l_partkey").alias("missing_value")).where(
        F.col("missing_value").isNotNull()
    ).distinct()
    rv = part.select(F.col("p_partkey").alias("missing_value")).where(
        F.col("missing_value").isNotNull()
    ).distinct()
    return lv.join(rv, "missing_value", "left_anti")


@_q(
    "rule_fk_orphans",
    """
    SELECT DISTINCT user_id AS missing_value
    FROM events
    WHERE user_id IS NOT NULL
      AND user_id NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey IS NOT NULL)
    """,
)
def rule_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """same anti-join with a deliberately mismatched pair -> real misses."""
    ev = _t(spark, sf_dir, "events")
    sup = _t(spark, sf_dir, "supplier")
    lv = ev.select(F.col("user_id").alias("missing_value")).where(
        F.col("missing_value").isNotNull()
    ).distinct()
    rv = sup.select(F.col("s_suppkey").alias("missing_value")).where(
        F.col("missing_value").isNotNull()
    ).distinct()
    return lv.join(rv, "missing_value", "left_anti")


@_q(
    "rule_regex_fullmatch",
    """
    SELECT
      CAST(SUM(CASE WHEN NOT regexp_full_match(c_name, 'Customer#[0-9]{9}') THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_format,
      CAST(SUM(CASE WHEN regexp_matches(c_name, '#000') THEN 1 ELSE 0 END) AS BIGINT) AS n_forbidden,
      COUNT(*) AS n_rows
    FROM customer
    """,
)
def rule_regex_fullmatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`regex` both modes (rulepack_runner.py:728-823): not_matches =
    anchored fullmatch, matches = search-anywhere."""
    df = _t(spark, sf_dir, "customer")
    c = F.col("c_name").cast("string")
    not_full = ~c.rlike(r"^(?:Customer#[0-9]{9})$")
    forbidden = c.rlike(r"#000")
    cnt = lambda p: F.sum(F.when(p, 1).otherwise(0)).cast("long")  # noqa: E731
    return df.agg(
        cnt(not_full).alias("n_bad_format"),
        cnt(forbidden).alias("n_forbidden"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@_q(
    "rule_url_classes",
    """
    WITH u AS (
      SELECT p_partkey % 4 AS url_class,
             CASE p_partkey % 4
               WHEN 0 THEN 'www.example.com/' || p_brand
               WHEN 1 THEN 'https://example.com/part/' || CAST(p_partkey AS VARCHAR)
               WHEN 2 THEN 'ftp://files.example.com/' || CAST(p_partkey AS VARCHAR)
               ELSE ''
             END AS url
      FROM part
    )
    SELECT url_class,
           -- reference _url_syntax_ok semantics (rulepack_runner.py:639-660)
           -- evaluated per class: www.-> https:// prefix valid; https valid;
           -- ftp scheme not allowed; empty has no scheme
           CAST(SUM(CASE WHEN url_class IN (0, 1) THEN 0 ELSE 1 END) AS BIGINT) AS n_invalid,
           COUNT(*) AS n
    FROM u GROUP BY url_class
    """,
)
def rule_url_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`url` operator driven over four synthesized URL classes; the oracle
    pins each class's expected validity under the reference semantics."""
    df = _t(spark, sf_dir, "part")
    url = (
        F.when(F.col("p_partkey") % 4 == 0, F.concat(F.lit("www.example.com/"), F.col("p_brand")))
        .when(
            F.col("p_partkey") % 4 == 1,
            F.concat(F.lit("https://example.com/part/"), F.col("p_partkey").cast("string")),
        )
        .when(
            F.col("p_partkey") % 4 == 2,
            F.concat(F.lit("ftp://files.example.com/"), F.col("p_partkey").cast("string")),
        )
        .otherwise(F.lit(""))
    )
    tagged = df.select((F.col("p_partkey") % 4).alias("url_class"), url.alias("url"))
    inv = url_invalid_pred("url", ["http", "https"])
    return tagged.groupBy("url_class").agg(
        F.sum(F.when(inv, 1).otherwise(0)).cast("long").alias("n_invalid"),
        F.count(F.lit(1)).alias("n"),
    )


@_q(
    "rule_non_empty_trimmed",
    """
    SELECT
      CAST(SUM(CASE WHEN text IS NULL OR LENGTH(TRIM(text)) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_blank_text,
      CAST(SUM(CASE WHEN props IS NULL OR LENGTH(TRIM(props)) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_blank_props
    FROM documents, events
    WHERE doc_id = event_id % 500
    """,
)
def rule_non_empty_trimmed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`non_empty_trimmed` (rulepack_runner.py:699-725) across a join of two
    tables (also exercises the equi-join path)."""
    docs = _t(spark, sf_dir, "documents")
    ev = _t(spark, sf_dir, "events")
    joined = docs.join(ev, docs["doc_id"] == ev["event_id"] % 500)
    cnt = lambda p: F.sum(F.when(p, 1).otherwise(0)).cast("long")  # noqa: E731
    return joined.agg(
        cnt(non_empty_trimmed_pred("text")).alias("n_blank_text"),
        cnt(non_empty_trimmed_pred("props")).alias("n_blank_props"),
    )


@_q(
    "rule_dates_iso8601",
    """
    SELECT
      CAST(SUM(CASE WHEN NOT regexp_full_match(strftime(o_orderdate, '%Y-%m-%d'), '\\d{4}-\\d{2}-\\d{2}')
               THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_dates,
      COUNT(*) AS n_rows
    FROM orders
    """,
)
def rule_dates_iso8601(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEO preflight dates_are_iso8601 (rna.py:275-308) over stringified
    order dates."""
    df = _t(spark, sf_dir, "orders")
    s = F.date_format("o_orderdate", "yyyy-MM-dd")
    bad = ~s.rlike(r"^\d{4}-\d{2}-\d{2}$")
    return df.agg(
        F.sum(F.when(bad, 1).otherwise(0)).cast("long").alias("n_bad_dates"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@_q(
    "preflight_id_crosscheck",
    """
    SELECT
      (SELECT COUNT(*) FROM lineitem WHERE l_suppkey IS NULL) AS n_blank,
      (SELECT COUNT(DISTINCT l_suppkey) FROM lineitem
        WHERE l_suppkey IS NOT NULL
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier)) AS n_unknown
    """,
)
def preflight_id_crosscheck(spark: SparkSession, sf_dir: str) -> DataFrame:
    """id_crosscheck two-finding shape (rna.py:160-211): blank ids and ids
    unknown to the reference table."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    n_blank = li.where(F.col("l_suppkey").isNull()).count()
    unknown = (
        li.select("l_suppkey").where(F.col("l_suppkey").isNotNull()).distinct()
        .join(sup.select(F.col("s_suppkey").alias("l_suppkey")), "l_suppkey", "left_anti")
        .count()
    )
    return spark.createDataFrame([(n_blank, unknown)], "n_blank bigint, n_unknown bigint")


@_q(
    "preflight_paired_complete",
    """
    SELECT user_id
    FROM events
    GROUP BY user_id
    HAVING MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) = 1
       AND MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 0
    """,
)
def preflight_paired_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """paired_end_complete shape (rna.py:214-272): groups having R1 without
    R2 (here: click without purchase)."""
    df = _t(spark, sf_dir, "events")
    has = lambda v: F.max(F.when(F.col("event_type") == v, 1).otherwise(0))  # noqa: E731
    return (
        df.groupBy("user_id")
        .agg(has("click").alias("h1"), has("purchase").alias("h2"))
        .where((F.col("h1") == 1) & (F.col("h2") == 0))
        .select("user_id")
    )


@_q(
    "preflight_grouped_any",
    """
    SELECT user_id
    FROM events
    GROUP BY user_id
    HAVING MAX(CASE WHEN event_type IN ('view','click','purchase') THEN 1 ELSE 0 END) = 0
    """,
)
def preflight_grouped_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    """at_least_one_nonempty_per_row recast per-group (rna.py:122-157):
    users with no engagement event at all."""
    df = _t(spark, sf_dir, "events")
    hit = F.max(
        F.when(F.col("event_type").isin("view", "click", "purchase"), 1).otherwise(0)
    )
    return df.groupBy("user_id").agg(hit.alias("h")).where(F.col("h") == 0).select("user_id")


# ---------------------------------------------------------------- analytics


@_q(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2025-06-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape; money through exact DECIMAL sums surfaced as DOUBLE
    (bit-identical across engines)."""
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2025-06-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * disc).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@_q(
    "q3_top_revenue_orders",
    """
    SELECT o_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem
    WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
      AND c_mktsegment = 'BUILDING'
    GROUP BY o_orderkey
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: broadcast the filtered dimension, shuffle only the
    fact aggregation; deterministic LIMIT via (revenue, key) tie-break."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(18,2)")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("o_orderkey")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@_q(
    "window_topk_per_type",
    """
    SELECT event_type, event_id, value, rnk FROM (
      SELECT event_type, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rnk
      FROM events
    ) WHERE rnk <= 3
    """,
)
def window_topk_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        df.select("event_type", "event_id", "value", F.row_number().over(w).alias("rnk"))
        .where(F.col("rnk") <= 3)
    )


@_q(
    "sessionize_users",
    """
    SELECT user_id, COUNT(*) AS n_events,
           CAST(1 + SUM(CASE WHEN gap_s > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
    FROM (
      SELECT user_id,
             EXTRACT(EPOCH FROM ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_s
      FROM events
    )
    GROUP BY user_id
    """,
)
def sessionize_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sessionization via lag + gap>30min cumsum (guide 'Common OLAP
    patterns'); one shuffle on user_id shared by window and groupBy."""
    df = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # TIMESTAMP_NTZ -> epoch seconds (exact microsecond multiples both engines)
    epoch = F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1000000.0)
    gap = epoch - F.lag(epoch).over(w)
    return (
        df.select("user_id", gap.alias("gap_s"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (1 + F.sum(F.when(F.col("gap_s") > 1800, 1).otherwise(0))).alias("n_sessions"),
        )
    )


@_q(
    "agg_segment_rollup",
    """
    SELECT c_mktsegment, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
           MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def agg_segment_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "customer")
    return df.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("sum_bal"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
    )


# ------------------------------------------------------ text / dedup / ANN


@_q(
    "text_token_count",
    """
    SELECT doc_id,
           CASE WHEN TRIM(text) = '' THEN 0
                ELSE len(regexp_split_to_array(TRIM(text), '\\s+')) END AS n_tokens
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "documents")
    return df.select("doc_id", token_count(F.col("text")).alias("n_tokens"))


@_q(
    "text_quality",
    """
    WITH f AS (
      SELECT doc_id,
        CASE WHEN TRIM(text)='' THEN 0
             ELSE len(regexp_split_to_array(TRIM(text), '\\s+')) END AS n_tok,
        LENGTH(text) AS n_chr,
        LENGTH(text) - LENGTH(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS n_punct,
        len(list_filter(regexp_split_to_array(lower(TRIM(text)), '\\s+'),
                        t -> t IN ('the','and','of','to','a'))) AS n_stop
      FROM documents
    )
    SELECT doc_id,
      ROUND(
        0.5 * LEAST(n_tok / 64.0, 1.0)
        + 0.3 * (1.0 - LEAST(CASE WHEN n_chr = 0 THEN 0.0 ELSE CAST(n_punct AS DOUBLE) / n_chr END * 4.0, 1.0))
        + 0.2 * LEAST(CASE WHEN n_tok = 0 THEN 0.0 ELSE CAST(n_stop AS DOUBLE) / n_tok END * 5.0, 1.0)
      , 6) AS quality
    FROM f
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "documents")
    return df.select("doc_id", quality_score(F.col("text")).alias("quality"))


@_q(
    "text_langid",
    """
    WITH hits AS (
      SELECT doc_id, regexp_split_to_array(lower(TRIM(text)), '\\s+') AS toks FROM documents
    ), scored AS (
      SELECT doc_id,
        len(list_filter(toks, t -> t IN ('der','die','und','das','ist'))) AS h_de,
        len(list_filter(toks, t -> t IN ('the','and','of','to','a'))) AS h_en,
        len(list_filter(toks, t -> t IN ('el','la','de','que','y'))) AS h_es,
        len(list_filter(toks, t -> t IN ('le','la','et','les','des'))) AS h_fr
      FROM hits
    )
    SELECT lang_pred, COUNT(*) AS n FROM (
      SELECT doc_id,
        CASE WHEN GREATEST(h_de, h_en, h_es, h_fr) <= 0 THEN 'und'
             WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
             WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
             WHEN h_es >= h_fr THEN 'es'
             ELSE 'fr' END AS lang_pred
      FROM scored
    ) GROUP BY lang_pred
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stopword-argmax language id; ties resolve to the lexicographically
    first code in both engines."""
    df = _t(spark, sf_dir, "documents")
    return (
        df.select(lang_id(F.col("text")).alias("lang_pred"))
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_q(
    "dedup_exact",
    """
    SELECT md5(text) AS content_hash, COUNT(*) AS n, MIN(doc_id) AS keeper_id
    FROM documents GROUP BY 1 HAVING COUNT(*) > 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "documents")
    return exact_dup_groups(df, "text", "doc_id").select(
        "content_hash", "n", F.col("keeper_id").cast("long").alias("keeper_id")
    )


@_q(
    "dedup_ngram_jaccard",
    """
    WITH t AS (
      SELECT doc_id, source,
             list_distinct(regexp_split_to_array(TRIM(text), '\\s+')) AS toks
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                 / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))), 6) AS jaccard
    FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
          / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.5
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(df, "text", "doc_id", "source", threshold=0.5)


@_q("dedup_minhash_lsh")  # no SQL oracle: xxhash64 signatures (rows-only)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "documents")
    return minhash_lsh_candidates(df, "text", "doc_id", num_perm=16, n_bands=4)


@_q("dedup_simhash")  # no SQL oracle: FNV/udf hashing (rows-only)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "documents")
    return df.select("doc_id", simhash64("text"))


@_q(
    "ann_cosine_topk",
    """
    SELECT query_id, neighbor_id, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY ROUND(list_cosine_similarity(q.embedding, c.embedding), 6) DESC,
                        c.vec_id
             ) AS rank
      FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND q.vec_id <> c.vec_id
    ) WHERE rank <= 5
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """brute-force cosine top-k baseline; ranking on 6dp-rounded similarity
    with neighbor-id tie-break (deterministic across engines)."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    return cosine_topk_bruteforce(emb, q, k=5).select("query_id", "neighbor_id", "rank")


@_q("ann_ivf_topk")  # no SQL oracle: sampled centroids (rows-only)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    return ivf_topk(emb, q, k=5, n_centroids=16, n_probe=4).select(
        "query_id", "neighbor_id", "rank"
    )


# ---------------------------------------------------------------- spatial

_RECTS = [
    # (polygon_id, lat0, lat1, lon0, lon1) — bounds offset from the 0.001
    # synthesis grid so no point lies exactly on an edge
    (f"rect{i:02d}",
     -59.99955 + (i % 4) * 30.0,
     -59.99955 + (i % 4) * 30.0 + 22.0003,
     -179.99955 + (i // 4) * 120.0,
     -179.99955 + (i // 4) * 120.0 + 90.0007)
    for i in range(12)
]


def _synth_points(df: DataFrame, key: str) -> DataFrame:
    lat = ((F.col(key) * 7919) % 120000) / 1000.0 - 60.0
    lon = ((F.col(key) * 104729) % 360000) / 1000.0 - 180.0
    return df.select(F.col(key).alias("point_id"), lat.alias("lat"), lon.alias("lon"))


def _synth_points_sql(table: str, key: str) -> str:
    return (
        f"SELECT {key} AS point_id, (({key} * 7919) % 120000) / 1000.0 - 60.0 AS lat, "
        f"(({key} * 104729) % 360000) / 1000.0 - 180.0 AS lon FROM {table}"
    )


def _rects_pdf() -> pd.DataFrame:
    rows = []
    for pid, lat0, lat1, lon0, lon1 in _RECTS:
        ring = [
            {"lat": lat0, "lon": lon0},
            {"lat": lat0, "lon": lon1},
            {"lat": lat1, "lon": lon1},
            {"lat": lat1, "lon": lon0},
            {"lat": lat0, "lon": lon0},
        ]
        rows.append({"polygon_id": pid, "ring": ring})
    return pd.DataFrame(rows)


def _rects_values_sql() -> str:
    vals = ", ".join(
        f"('{pid}', {lat0!r}, {lat1!r}, {lon0!r}, {lon1!r})"
        for pid, lat0, lat1, lon0, lon1 in _RECTS
    )
    return f"(VALUES {vals}) AS rects(polygon_id, lat0, lat1, lon0, lon1)"


@_q(
    "spatial_pip_join",
    f"""
    WITH pts AS ({_synth_points_sql('customer', 'c_custkey')})
    SELECT point_id, polygon_id
    FROM pts JOIN {_rects_values_sql()}
      ON lat > lat0 AND lat < lat1 AND lon > lon0 AND lon < lon1
    """,
)
def spatial_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """point-in-polygon via the engine's broadcast R-tree ray-cast join;
    the oracle reduces to BETWEENs because the fixture polygons are
    rectangles — the engine runs the fully general PIP machinery."""
    from fairy_core_spark.spatial.ops import spatial_join_broadcast

    pts = _synth_points(_t(spark, sf_dir, "customer"), "c_custkey")
    return spatial_join_broadcast(
        pts.withColumn("point_id", F.col("point_id").cast("string")),
        _rects_pdf(),
        id_col="point_id",
    ).select(F.col("point_id").cast("long").alias("point_id"), "polygon_id")


@_q(
    "spatial_knn",
    f"""
    WITH pts AS ({_synth_points_sql('customer', 'c_custkey')}),
    q AS (SELECT * FROM pts WHERE point_id < 15),
    scored AS (
      SELECT q.point_id AS query_id, p.point_id AS neighbor_id,
        2 * 6371000.0 * ASIN(SQRT(
          POW(SIN(RADIANS(p.lat - q.lat) / 2), 2)
          + COS(RADIANS(q.lat)) * COS(RADIANS(p.lat))
            * POW(SIN(RADIANS(p.lon - q.lon) / 2), 2)
        )) AS d
      FROM q JOIN pts p ON p.point_id <> q.point_id
    )
    SELECT query_id, neighbor_id, rank FROM (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 3
    """,
)
def spatial_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grid-partitioned kNN with cell-ring expansion vs the oracle's
    brute-force haversine window."""
    from fairy_core_spark.spatial.ops import knn_join

    pts = _synth_points(_t(spark, sf_dir, "customer"), "c_custkey")
    queries = pts.where(F.col("point_id") < 15).withColumnRenamed("point_id", "query_id")
    got = knn_join(
        pts.withColumnRenamed("point_id", "id"),  # self-match dropped below
        queries,
        k=4,  # fetch one extra, drop self, re-rank to 3
        id_col="id",
        query_id_col="query_id",
    )
    no_self = got.where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.asc("distance_m"), F.asc("neighbor_id"))
    return (
        no_self.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "rank")
    )


@_q("spatial_cell_encode")  # no SQL oracle: S2 index (rows-only)
def spatial_cell_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fairy_core_spark.spatial.ops import with_cell

    pts = _synth_points(_t(spark, sf_dir, "customer"), "c_custkey")
    return with_cell(pts, level=12).select("point_id", "cell")


@_q("spatial_tile_rollup")  # no SQL oracle: S2 tiling (rows-only)
def spatial_tile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fairy_core_spark.spatial.ops import with_cell

    pts = _synth_points(_t(spark, sf_dir, "customer"), "c_custkey")
    tiled = with_cell(pts, level=4, out="tile_id")
    return tiled.groupBy("tile_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.avg("lat"), 6).alias("avg_lat"),
        F.round(F.avg("lon"), 6).alias("avg_lon"),
    )


# ----------------------------------------------------------- image (rows-only)


@_q("image_validate")  # no SQL oracle: binary decode UDFs (rows-only)
def image_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stage-1 image validation counts over a synthesized dirty table
    (decode sanity, dim mismatch, caption null, phash integrity)."""
    from fairy_core_spark.operators.images import decode_sanity_report
    from fairy_core_spark.datagen.images import images_df

    imgs = images_df(spark, 1000, dirty_every=50)
    return decode_sanity_report(imgs)


@_q("image_phash_dups")  # no SQL oracle: engine phash (rows-only)
def image_phash_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fairy_core_spark.operators.dedup import phash_exact_dups
    from fairy_core_spark.datagen.images import images_df

    imgs = images_df(spark, 3000)
    return phash_exact_dups(imgs)


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
