"""Text-analysis operators for large-scale training-data pipelines.

All hot-path logic is native Column expressions (JVM-side, whole-stage
codegen); the only Python is the documented fingerprint UDF (Arrow-batched
numpy). Designed for 100 TB document tables: every operator is a pure
row-wise projection or a map-side-combinable aggregate — no shuffle unless
the caller groups.

Operators: tokenization/token counts, quality scoring (length/punct/
stopword ratios), n-gram-free language ID (stopword-hit argmax), rolling-
hash document fingerprinting.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"\s+"

# tiny per-language stopword marker sets (deterministic heuristic; the
# operator contract is exact reproducibility, not linguistic accuracy)
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "a"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ist"),
}


def tokens(col: Column) -> Column:
    """Whitespace tokens (split on \\s+ after trim). NOTE: an empty /
    all-whitespace input yields [''] (Spark split semantics), not [] —
    callers that must treat blank docs as token-free filter '' out
    (ngram_jaccard_pairs) or gate on trim != '' (token_count)."""
    return F.split(F.trim(col), TOKEN_SPLIT_RE)


def token_count(col: Column) -> Column:
    return F.when(F.trim(col) == "", F.lit(0)).otherwise(F.size(tokens(col)))


def char_count(col: Column) -> Column:
    return F.length(col)


# every char the punct counter keeps OUT: ASCII alphanumerics + the Java
# regex \s set [ \t\n\x0B\f\r] — semantically identical to stripping
# [^A-Za-z0-9\s], but translate() is a native char-map lookup and measured
# 36x faster than regexp_replace on this exact expression (2.1s vs 76.4s
# per 2M x 360-char docs), which made the regex the hidden bottleneck of
# the whole feature pass
_NON_PUNCT_CHARS = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789 \t\n\r\f\x0b"
)


def punct_count(col: Column) -> Column:
    """count of characters outside [A-Za-z0-9\\s]."""
    return F.length(F.translate(col, _NON_PUNCT_CHARS, ""))


def punct_ratio(col: Column) -> Column:
    """fraction of characters that are not [A-Za-z0-9 whitespace]."""
    n = F.length(col)
    return F.when(n == 0, F.lit(0.0)).otherwise(punct_count(col) / n)


def stopword_ratio(col: Column, stopwords: tuple[str, ...] = LANG_MARKERS["en"]) -> Column:
    """fraction of tokens that are stopwords (case-insensitive)."""
    toks = F.transform(tokens(col), lambda t: F.lower(t))
    hits = F.size(F.filter(toks, lambda t: t.isin(list(stopwords))))
    n = token_count(col)
    return F.when(n == 0, F.lit(0.0)).otherwise(hits / n)


def quality_score(col: Column) -> Column:
    """Deterministic [0,1] quality heuristic: rewards moderate length,
    penalizes punctuation soup and stopword-free keyword mash. The exact
    formula is the contract (oracle-replicated in SQL)."""
    n_tok = token_count(col)
    len_term = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(col) * 4.0, F.lit(1.0))
    stop_term = F.least(stopword_ratio(col) * 5.0, F.lit(1.0))
    return F.round((0.5 * len_term + 0.3 * punct_term + 0.2 * stop_term), 6)


def lang_id(col: Column) -> Column:
    """Stopword-hit argmax over LANG_MARKERS; ties and zero hits -> 'und'.
    Deterministic tie-break: higher count wins, then lexicographic language
    code. Pure Column expr (a struct-max trick: max of (count, -ord) pairs)."""
    toks = F.transform(tokens(col), lambda t: F.lower(t))
    codes = sorted(LANG_MARKERS)

    def _marker_test(markers):
        # closure factory: HOF lambdas must take exactly one parameter
        return lambda t: t.isin(markers)

    scored = []
    for i, code in enumerate(codes):
        hits = F.size(F.filter(toks, _marker_test(list(LANG_MARKERS[code]))))
        # rank descends with code order so array_max's struct comparison
        # (hits, then rank) resolves ties to the lexicographically first code
        rank = len(codes) - 1 - i
        scored.append(
            F.struct(hits.alias("hits"), F.lit(rank).alias("rank"), F.lit(code).alias("code"))
        )
    best = F.array_max(F.array(*scored))
    return F.when(best["hits"] <= 0, F.lit("und")).otherwise(best["code"])


def doc_fingerprint(col_name: str = "text", out_name: str = "fingerprint"):
    """64-bit polynomial rolling hash of the raw text (winnowing-style
    document fingerprint) as an Arrow pandas_udf. Python is unavoidable
    here (no 64-bit overflow-wrapping polynomial hash in Spark SQL), so it
    is vectorized: one numpy pass per batch, no per-row Python."""
    from pyspark.sql.types import LongType

    B = np.uint64(1000003)
    MASK = np.uint64(0xFFFFFFFFFFFFFFFF)

    SEED = np.uint64(1469598103934665603)

    @F.pandas_udf(LongType())
    def _fp(s: pd.Series) -> pd.Series:
        # errstate, not seterr: executors reuse Python workers, and a global
        # seterr would silence overflow for every OTHER numpy UDF that later
        # runs in this worker (image hashes, geometry kernels)
        with np.errstate(over="ignore"):  # uint64 wrap IS the hash definition
            return _fp_batch(s)

    def _fp_batch(s: pd.Series) -> pd.Series:
        out = np.zeros(len(s), dtype=np.uint64)
        # Horner closed form: h = seed*B^n + sum(v_i * B^(n-1-i)) mod 2^64.
        # One shared power table per batch (cumprod wraps mod 2^64), then a
        # vectorized multiply-accumulate per doc — no per-byte Python. This
        # replaced a scalar loop that was the round-1 throughput bottleneck.
        texts = [None if t is None else t.encode("utf-8") for t in s]
        max_n = max((len(t) for t in texts if t is not None), default=0)
        pows = np.ones(max_n + 1, dtype=np.uint64)
        if max_n:
            np.cumprod(np.full(max_n, B, dtype=np.uint64), out=pows[1:])
        for i, raw in enumerate(texts):
            if raw is None:
                # NULL text behaves exactly like empty text — the module-wide
                # convention (with_text_features); 0 would collide with any
                # real doc whose rolling hash lands on 0
                out[i] = SEED
                continue
            v = np.frombuffer(raw, dtype=np.uint8).astype(np.uint64)
            n = len(v)
            if n == 0:
                out[i] = SEED
                continue
            h = SEED * pows[n] + (v * pows[n - 1 :: -1]).sum(dtype=np.uint64)
            out[i] = h & MASK
        return pd.Series(out.astype(np.int64))

    return _fp(F.col(col_name)).alias(out_name)


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Columnwise feature projection — correct everywhere, but the token
    statistics run as higher-order-function lambdas, which Catalyst
    evaluates INTERPRETED (measured ~12k docs/s at 60 tokens/doc). For
    whole-corpus feature passes use ``text_features_df`` (explode +
    codegen aggregate, ~10x)."""
    # NULL text behaves exactly like empty text (0 tokens, empty-doc
    # quality, 'und') — without the coalesce the null propagates through
    # some features but not others (F.least skips nulls), yielding
    # quality=0.7/lang='de' nonsense for null docs
    c = F.coalesce(F.col(text_col), F.lit(""))
    return df.select(
        "*",
        token_count(c).alias("n_tokens"),
        char_count(c).alias("n_chars_computed"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        F.round(stopword_ratio(c), 6).alias("stopword_ratio"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_pred"),
    )


def text_features_df(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Same features as ``with_text_features`` (minus the passthrough
    columns), computed on the scale path: char-level expressions once per
    doc, token statistics via one explode + one fully-codegen groupBy
    (map-side combined — the shuffle carries 7 longs per doc per
    partition), ratios/quality/lang assembled natively from the aggregates.
    No higher-order functions anywhere; output equality with the
    columnwise form is pinned by tests (including NULL text, which both
    forms treat as empty).

    Precondition: ``id_col`` values are unique and non-null — this form is
    keyed by id (one output row per id), unlike the row-preserving
    columnwise projection; duplicate ids would merge their token stats."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.when(F.trim(c) == "", F.array().cast("array<string>")).otherwise(tokens(c))
    base = df.select(
        F.col(id_col).alias("id"),
        F.length(c).alias("n_chr"),
        punct_count(c).alias("n_punct"),
        toks.alias("toks"),
    )
    ex = base.select(
        "id", "n_chr", "n_punct", F.explode_outer("toks").alias("tok")
    ).select("id", "n_chr", "n_punct", F.lower(F.col("tok")).alias("t"))
    codes = sorted(LANG_MARKERS)
    hit = lambda ms: F.sum(F.when(F.col("t").isin(list(ms)), 1).otherwise(0))  # noqa: E731
    g = ex.groupBy("id", "n_chr", "n_punct").agg(
        F.count("t").alias("n_tok"),
        hit(LANG_MARKERS["en"]).alias("n_stop"),
        *[hit(LANG_MARKERS[code]).alias(f"h_{code}") for code in codes],
    )
    n_tok = F.col("n_tok")
    p_ratio = F.when(F.col("n_chr") == 0, F.lit(0.0)).otherwise(
        (F.col("n_punct")) / F.col("n_chr")
    )
    s_ratio = F.when(n_tok == 0, F.lit(0.0)).otherwise(F.col("n_stop") / n_tok)
    quality = F.round(
        0.5 * F.least(n_tok / F.lit(64.0), F.lit(1.0))
        + 0.3 * (F.lit(1.0) - F.least(p_ratio * 4.0, F.lit(1.0)))
        + 0.2 * F.least(s_ratio * 5.0, F.lit(1.0)),
        6,
    )
    scored = [
        F.struct(
            F.col(f"h_{code}").alias("hits"),
            F.lit(len(codes) - 1 - i).alias("rank"),
            F.lit(code).alias("code"),
        )
        for i, code in enumerate(codes)
    ]
    best = F.array_max(F.array(*scored))
    lang = F.when(best["hits"] <= 0, F.lit("und")).otherwise(best["code"])
    return g.select(
        F.col("id").alias(id_col),
        n_tok.cast("int").alias("n_tokens"),
        F.col("n_chr").alias("n_chars_computed"),
        F.round(p_ratio, 6).alias("punct_ratio"),
        F.round(s_ratio, 6).alias("stopword_ratio"),
        quality.alias("quality"),
        lang.alias("lang_pred"),
    )


# --- PII redaction (training-data scrubbing) -----------------------------

# Pattern order is part of the contract: each class counts on the text as
# left by the previous redaction (an email's digits can't double-count as
# a phone). Patterns stay inside the Java-regex / RE2 common subset so the
# DuckDB oracle replays them verbatim (no lookaround, no backrefs).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("phone", r"\+\d[\d -]{7,}\d"),
)


def redact_pii(df: DataFrame, text_col: str = "text", out_col: str = "redacted") -> DataFrame:
    """Scrub emails / IPv4s / phone numbers from a text column, appending
    per-class match counts and the redacted text (class tokens like
    ``<email>``). Pure native regexp_count/regexp_replace — zero Python,
    whole-stage codegen; at 100 TB this is a projection, no shuffle."""
    cur = F.col(text_col)
    out = df
    for name, pat in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}", F.coalesce(F.regexp_count(cur, F.lit(pat)), F.lit(0)).cast("long")
        )
        cur = F.regexp_replace(cur, pat, f"<{name}>")
    return out.withColumn(out_col, cur)


# --- URL canonicalization (web-corpus keying) ----------------------------


def url_domain(col: Column) -> Column:
    """Lowercased host of a URL (no userinfo, no port). Empty string when
    no host. For the production quota/dedup key use
    :func:`registered_domain` on top of this — ``sub.example.com`` and
    ``example.com`` must share a key."""
    host = F.regexp_extract(col, r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)", 1)
    return F.lower(host)


def registered_domain(host: Column) -> Column:
    """PSL registered domain of a lowercased host Column: longest matching
    public suffix (data/public_suffixes.py, trimmed PSL snapshot shipped as
    data) plus one label; PSL default rule (suffix = last label -> last two
    labels) when no multi-label suffix matches; hosts with no dot (or equal
    to a suffix) pass through. Pure native ops — label slicing + literal
    IN-set probes compiled per suffix length, zero Python. This is the
    web-corpus grouping key: per-domain quotas on the full host would count
    every *.blogspot.com blog as one domain's traffic split into millions,
    and every wiki subdomain as separate domains."""
    from fairy_core_spark.data.public_suffixes import suffixes_by_labels

    # FQDN form: a trailing dot is legal in URLs ('example.com.') and the
    # reference registered_domain_py rstrips it; without this the empty
    # last label defeats every suffix probe and the default rule returns
    # 'com.' — collapsing all trailing-dot hosts of a TLD into one key
    host = F.regexp_replace(host, r"\.+$", "")
    labels = F.split(host, r"\.")
    n = F.size(labels)

    def tail(cnt: int) -> Column:  # last `cnt` labels, start clamped to 1
        # (slice start 0 raises; under-long hosts are rejected by the n
        # guards, the clamp only keeps the dead branch evaluable)
        return F.array_join(
            F.slice(labels, F.greatest(n - cnt + 1, F.lit(1)), F.lit(cnt)), "."
        )

    # longest match wins: the when-chain is evaluated FIRST-match-first in
    # Spark, so the largest label count must be the FIRST .when added
    # (wrapping earlier probes as otherwise() would invert precedence to
    # shortest-match — the bug a nested suffix pair like edu.au /
    # act.edu.au exposes)
    out = None
    for k, sufs in suffixes_by_labels().items():  # descending label count
        cond = (n >= k + 1) & tail(k).isin(sufs)
        out = F.when(cond, tail(k + 1)) if out is None else out.when(cond, tail(k + 1))
    default = F.when(n >= 2, tail(2)).otherwise(host)
    return default if out is None else out.otherwise(default)


def registered_domain_sql(host_expr: str) -> str:
    """DuckDB replay of :func:`registered_domain` (same suffix snapshot,
    same longest-match-then-+1-label arithmetic) for oracle parity."""
    from fairy_core_spark.data.public_suffixes import suffixes_by_labels

    host_expr = f"regexp_replace(({host_expr}), '\\.+$', '')"  # FQDN dot
    e = f"str_split(({host_expr}), '.')"
    # same precedence as the Column chain: one CASE whose WHEN clauses run
    # longest-suffix-first (SQL CASE is first-match-first)
    whens = []
    for k, sufs in suffixes_by_labels().items():  # descending label count
        lits = ", ".join(f"'{s}'" for s in sufs)
        whens.append(
            f"WHEN len({e}) >= {k + 1} AND array_to_string({e}[-{k}:], '.') "
            f"IN ({lits}) THEN array_to_string({e}[-{k + 1}:], '.')"
        )
    whens.append(f"WHEN len({e}) >= 2 THEN array_to_string({e}[-2:], '.')")
    return "CASE " + " ".join(whens) + f" ELSE ({host_expr}) END"


def canonical_url(col: Column) -> Column:
    """Deterministic URL canonicalization for dedup/quota keying. The
    exact step list is the contract (replayed verbatim by the DuckDB
    oracle; regexes in the Java/RE2 common subset):

    1. strip the fragment;
    2. lowercase the scheme://authority prefix (path/query case kept);
    3. drop default ports (http:80, https:443);
    4. drop ``utm_*`` tracking params, sort the rest byte-wise, and drop
       the '?' when nothing survives.
    """
    u = F.regexp_replace(col, r"#.*$", "")
    head = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    rest = F.substr(u, F.length(head) + F.lit(1))
    head = F.lower(head)
    head = F.regexp_replace(head, r"^(https://[^/?#]*):443$", r"$1")
    head = F.regexp_replace(head, r"^(http://[^/?#]*):80$", r"$1")
    path = F.regexp_extract(rest, r"^[^?]*", 0)
    query = F.regexp_extract(rest, r"^[^?]*\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.startswith("utm_"),
    )
    q2 = F.array_join(F.array_sort(params), "&")
    return F.concat(
        head, path, F.when(q2 != "", F.concat(F.lit("?"), q2)).otherwise(F.lit(""))
    )


def token_rarity(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc corpus-frequency profile of its tokens: (id, n_tokens,
    sum_token_freq, min_token_freq) — the integer-exact form of unigram
    surprisal ranking (low min/mean corpus frequency = rare vocabulary;
    high = boilerplate), a standard quality/diversity signal that avoids
    float logs entirely so the DuckDB oracle matches bit-for-bit. Empty
    docs are dropped (no tokens to profile).

    Scale: explode -> global token counts (vocab-sized, map-side combined)
    -> equi-join back (vocab frame is small next to the corpus; AQE
    broadcasts it) -> per-doc agg. The doc text never shuffles — only
    (id, token) pairs."""
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__tok")
    ).where(F.col("__tok") != "")
    freq = toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__freq"))
    return (
        toks.join(freq, "__tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("__freq").alias("sum_token_freq"),
            F.min("__freq").alias("min_token_freq"),
        )
    )


def tfidf_topk(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-document top-k characteristic terms by an integer-exact
    tf-idf ordering — the keyword-extraction / topic-tagging staple of
    corpus curation (cluster labeling, dedup explanation, search-index
    seeding).

    The ranking key is ``score = (tf * scale * N) div doc_freq`` —
    tf times a quantized linear idf. Linear ``N/df`` orders terms the
    same way as log idf does *per fixed tf* and keeps every value
    int64-exact, so rankings never smear across engines; ``scale``
    controls the idf quantization (ties inside one quantum fall back to
    the deterministic ``term ASC`` order). Int64 bound: ``tf * scale *
    N`` must fit — at web scale pass a smaller ``scale`` (the ordering
    only needs N/df resolution, not 6 digits).

    Output: ``(id, term, tf, doc_freq, score, rk)`` with ``rk`` the
    1-based rank inside the document, ``rk <= k``.

    Plan (the 100 TB story): explode -> one (doc, term) map-side
    combined groupBy; doc_freq = one groupBy over that frame (carries
    (term, count) only); the join back is vocab-sized (AQE broadcasts
    when small); the final rank window partitions by document, so the
    top-k limit plans as WindowGroupLimit — partial top-k before the
    exchange. Document text never shuffles; the wire carries terms and
    ints.
    """
    if k <= 0 or scale <= 0:
        raise ValueError("k and scale must be positive")
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    ).where(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    doc_freq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("doc_freq")
    )
    n_docs = df.agg(F.count(F.lit(1)).cast("long").alias("_nd"))
    scored = (
        tf.join(doc_freq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            "tf",
            "doc_freq",
            F.expr(f"(tf * CAST({scale} AS BIGINT) * _nd) div doc_freq").alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return scored.withColumn("rk", F.row_number().over(w).cast("long")).where(
        F.col("rk") <= k
    )
