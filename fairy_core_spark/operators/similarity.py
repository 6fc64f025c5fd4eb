"""Similarity search over embedding columns (array<float>).

- ``cosine_topk_bruteforce``: exact top-k neighbors for a query set via
  broadcast query-side cross join + window rank. The correctness baseline;
  at scale use it only for small query sets (queries broadcast, one pass
  over the corpus, no corpus shuffle).
- ``ivf_topk``: the scale path — corpus bucketed by nearest of C coarse
  centroids (IVF); queries probe ``n_probe`` nearest centroid buckets, an
  equi-join on bucket id replaces the cross join. Exactness degrades
  gracefully with n_probe (recall tested against the brute-force oracle).

Cosine math is native Column expressions (zip_with + aggregate, JVM-side);
similarities are rounded before ranking so ordering is reproducible across
engines (driver's DuckDB oracle comparison).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    """Guarded cosine as a double Column: 0.0 when either norm is zero.
    An all-zero embedding (padding row, failed embedder output) must never
    crash the job (ANSI division throws on /0) nor rank as anyone's
    near-dup/neighbor — and zero vectors deterministically collide in
    every sign bucket, so the LSH paths WILL generate such pairs."""
    denom = _norm(a) * _norm(b)
    return F.when(denom > 0, _dot(a, b) / denom).otherwise(F.lit(0.0))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    round_dp: int = 6,
) -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, cosine, rank), self-matches
    excluded. Query side is broadcast; ranking ties broken by neighbor id."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    cos = F.round(cosine_col(F.col("qvec"), F.col("cvec")), round_dp)
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def train_centroids(corpus: DataFrame, vec_col: str, n_centroids: int, seed: int = 11,
                    iters: int = 3) -> np.ndarray:
    """Tiny driver-side k-means on a bounded sample (Lloyd iterations in
    numpy). The sample is capped — at 10^12 rows this still reads one
    sampled pass, never the full corpus onto the driver.

    Sampling is a real Bernoulli fraction sized from a count pass (a
    fraction-1.0 `.sample().limit()` is a no-op that takes the first
    partitions — on clustered/sorted input that yields locality-correlated
    centroids and IVF recall collapses at scale)."""
    target = max(2000, 50 * n_centroids)
    n = corpus.count()
    frac = min(1.0, (1.5 * target) / max(n, 1))  # oversample slightly
    # collect the WHOLE Bernoulli sample (~1.5x target, bounded) and
    # subsample driver-side: a .limit(target) here would be satisfied from
    # the first partitions and re-introduce the locality bias the fraction
    # sampling exists to remove
    sample = (
        corpus.select(vec_col)
        .sample(withReplacement=False, fraction=frac, seed=seed)
        .collect()
    )
    x = np.array([r[0] for r in sample], dtype=np.float64)
    rng0 = np.random.default_rng(seed)
    if len(x) > target:
        x = x[rng0.choice(len(x), target, replace=False)]
    if len(x) < n_centroids:  # degenerate tiny corpus: take everything
        x = np.array([r[0] for r in corpus.select(vec_col).limit(target).collect()],
                     dtype=np.float64)
    if len(x) == 0:
        raise ValueError("train_centroids: empty corpus")
    # a corpus smaller than n_centroids degrades to one centroid per row
    # instead of crashing rng.choice(replace=False)
    n_centroids = min(n_centroids, len(x))
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), n_centroids, replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(n_centroids):
            pts = x[assign == j]
            if len(pts):
                cent[j] = pts.mean(axis=0)
    return cent


def _nearest_buckets_expr(vec: Column, centroids: np.ndarray, n: int) -> Column:
    """array of the n nearest centroid indices (native exprs: per-centroid
    squared distance, sort the (dist, idx) struct array, slice)."""
    structs = []
    for j, c in enumerate(centroids):
        dist = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(v)) for v in c]),
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        structs.append(F.struct(dist.alias("d"), F.lit(j).alias("idx")))
    ordered = F.array_sort(F.array(*structs))
    return F.transform(F.slice(ordered, 1, n), lambda s: s["idx"])


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    round_dp: int = 6,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF-bucketed ANN: corpus assigned to its nearest centroid bucket
    (one pass), queries explode to n_probe buckets, equi-join on bucket.
    The join is shuffle-partitioned by bucket id — hot buckets split by AQE."""
    cent = centroids if centroids is not None else train_centroids(corpus, vec_col, n_centroids)
    c_bucket = _nearest_buckets_expr(F.col(vec_col), cent, 1)[0]
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"), c_bucket.alias("bucket")
    )
    q_buckets = _nearest_buckets_expr(F.col(vec_col), cent, n_probe)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(q_buckets).alias("bucket"),
    )
    cos = F.round(
        cosine_col(F.col("qvec"), F.col("cvec")),
        round_dp,
    )
    scored = (
        c.join(q, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .distinct()  # a neighbor can appear via multiple probes
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cell_vector_sums(
    df: DataFrame,
    cell_col: str = "cell",
    vec_col: str = "embedding",
    dims: int | None = None,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-cell embedding centroid SUMS — the tile-level vector summary a
    retrieval/clustering layer wants over a spatially indexed corpus
    (coarse per-tile semantic signatures, per-region drift monitoring).
    One row per (cell, pos): ``sum_q`` = sum of floor(value * scale) as
    int64 and ``n`` = components summed (= vectors in the cell when no
    component is NaN/NULL — see inline note); centroid = sum_q / (scale*n),
    computed by the CONSUMER so this operator stays exact-integer —
    associative, aggregation-order-proof, replayed bit-for-bit by any
    SQL engine (the same fixed-point discipline as trajectory's
    int-meter hops). ``dims`` slices to the first N dimensions
    (None = full vector).

    Scale shape: posexplode then ONE map-side-combined groupBy on
    (cell, pos) — the wire carries per-partition partial sums, dims x
    cells rows total, never the vectors themselves. floor(float32 ->
    double * scale) is exact IEEE both engines; values must stay within
    +-2^52/scale for the int64 sum (any normalized embedding is)."""
    if dims is not None and dims < 1:
        raise ValueError(f"dims must be >= 1 or None, got {dims}")
    vec = F.col(vec_col) if dims is None else F.slice(F.col(vec_col), 1, dims)
    e = df.select(F.col(cell_col), F.posexplode(vec).alias("pos", "val"))
    v = F.col("val").cast("double")
    # non-finite components quantize to NULL EXPLICITLY (cast of NaN/inf
    # to long is config-dependent — measured NaN -> 0 here, which would
    # silently pull the centroid toward zero), and n pairs with the sum:
    # count(q), NOT count(*), so a skipped component is excluded from
    # BOTH sum_q and n. For finite corpora n = vectors in the cell.
    finite = (~F.isnan(v)) & (v > float("-inf")) & (v < float("inf"))
    q = F.when(finite, F.floor(v * F.lit(float(scale))).cast("long"))
    return e.groupBy(cell_col, "pos").agg(
        F.sum(q).alias("sum_q"), F.count(q).alias("n")
    )
