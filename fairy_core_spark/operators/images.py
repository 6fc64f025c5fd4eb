"""Image stage-1 validation operators (north-rule: "rules-based checks
(schema, nullability, pixel-decode sanity, phash dedup) run as vectorized
Arrow UDFs over an Iceberg table of image+caption pairs").

One ``mapInPandas`` pass decodes each batch once and emits every per-image
check flag; report shaping reuses the engine's severity/summary semantics.
The per-row invariant from BASELINE.json:input_hint — decoded-pixel
allclose (PSNR >= 40 dB for lossy formats) + caption equality — is enforced
by ``psnr_ok`` (against a deterministic re-synthesis of the source pixels)
and the caption rules.

Scale: the decode pass is a pure projection (no shuffle); violation counts
aggregate map-side. At 10^12 images the only knobs are Arrow batch size and
input split size.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fairy_core_spark.functions.image_codec import (
    LOSSY_FMTS,
    PSNR_LOSSY_MIN_DB,
    decode_image,
)
from fairy_core_spark.functions.phash import phash64_stack


def make_pixels_reference(image_id: str, w: int, h: int) -> np.ndarray:
    """Default PSNR reference: the engine's deterministic synthesizer
    (identity-checked in ``with_image_checks`` to take the batched path)."""
    from fairy_core_spark.datagen.images import make_pixels

    return make_pixels(image_id, w, h)

CHECK_COLUMNS = [
    "decode_ok",  # bytes decode under the declared fmt
    "dims_ok",  # decoded dims == (w, h)
    "range_ok",  # uint8 payload in [0, 255] and 3 channels
    "caption_ok",  # caption non-null, non-blank
    "phash_ok",  # stored phash == recomputed phash of decoded pixels
    "psnr_ok",  # lossy fmt: decode-vs-source PSNR >= 40dB (lossless: exact)
]

_CHECKS_SCHEMA = ", ".join(f"{c} boolean" for c in CHECK_COLUMNS)


def with_image_checks(
    images: DataFrame, reference_pixels=None, keep_bytes: bool = False
) -> DataFrame:
    """images + boolean check columns, one Arrow decode pass.

    ``reference_pixels``: callable(image_id, w, h) -> ndarray used for the
    PSNR-vs-source invariant. Defaults to the engine's deterministic
    synthesizer (matching the fixture generator); pass None-returning fn
    when no source reference exists (psnr_ok then equals decode_ok).

    ``keep_bytes=False`` (default) drops the pixel payload from the output:
    the blobs must cross into Python for decoding, but serializing them
    back out and shuffling them through downstream joins is pure waste —
    validation consumers key on image_id + flags.
    """
    if reference_pixels is None:
        reference_pixels = make_pixels_reference
    from fairy_core_spark.datagen.images import make_pixels_stack

    out_fields = [f for f in images.schema.fields if keep_bytes or f.name != "bytes"]
    out_names = [f.name for f in out_fields]
    in_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in out_fields)
    out_schema = f"{in_schema}, {_CHECKS_SCHEMA}"

    def _src_id(image_id: str) -> str:
        # dedup fixture rows (i%1000==999) reference the prior id
        try:
            idx = int(image_id[3:])
            if idx % 1000 == 999 and idx > 0:
                return f"img{idx - 1:010d}"
        except ValueError:
            pass
        return image_id

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            flags = {c: np.zeros(n, dtype=bool) for c in CHECK_COLUMNS}
            caps = pdf["caption"]
            flags["caption_ok"][:] = (caps.notna() & (caps.astype(str).str.strip() != "")).to_numpy()
            ids = pdf["image_id"].tolist()
            blobs = pdf["bytes"].tolist()
            ws = pdf["w"].to_numpy()
            hs = pdf["h"].to_numpy()
            fmts = pdf["fmt"].tolist()
            phashes = pdf["phash"].to_numpy(np.int64)
            # codec loop: per-image zlib/header parsing only — the math
            # (phash DCT, reference synthesis, PSNR) is batched below with
            # one numpy pass per (h, w) size group.
            pixels: list[np.ndarray | None] = [None] * n
            for i in range(n):
                try:
                    pixels[i] = decode_image(blobs[i], fmts[i])
                except Exception:
                    pass  # all pixel checks stay False
            groups: dict[tuple[int, int], list[int]] = {}
            for i, px in enumerate(pixels):
                if px is None:
                    continue
                flags["decode_ok"][i] = True
                flags["range_ok"][i] = px.ndim == 3 and px.shape[2] == 3 and px.dtype == np.uint8
                if px.shape[0] == hs[i] and px.shape[1] == ws[i]:
                    flags["dims_ok"][i] = True
                    groups.setdefault((int(hs[i]), int(ws[i])), []).append(i)
            for (h, w), idx_list in groups.items():
                idxs = np.asarray(idx_list)
                stack = np.stack([pixels[i] for i in idx_list])
                flags["phash_ok"][idxs] = phash64_stack(stack) == phashes[idxs]
                refs = np.zeros_like(stack)
                have_ref = np.ones(len(idx_list), dtype=bool)
                bad_ref = np.zeros(len(idx_list), dtype=bool)
                if reference_pixels is make_pixels_reference:
                    refs = make_pixels_stack([_src_id(ids[i]) for i in idx_list], w, h)
                else:
                    for j, i in enumerate(idx_list):
                        r = reference_pixels(_src_id(ids[i]), w, h)
                        if r is None:
                            have_ref[j] = False  # no reference: pass by default
                        elif r.shape != stack[j].shape:
                            # wrong-shaped reference: per-row psnr_ok=False
                            # (scalar-path semantics), never a task-wide raise
                            have_ref[j] = False
                            bad_ref[j] = True
                        else:
                            refs[j] = r
                # float32 diff: exact for uint8 deltas (|d| <= 255), 8x less
                # memory traffic than int64 — this loop is bandwidth-bound
                diff = refs.astype(np.float32) - stack.astype(np.float32)
                mse = np.square(diff, out=diff).reshape(len(idx_list), -1).mean(axis=1, dtype=np.float64)
                lossy = np.array([fmts[i] in LOSSY_FMTS for i in idx_list])
                with np.errstate(divide="ignore", invalid="ignore"):
                    psnr = 10.0 * np.log10(255.0**2 / np.where(mse > 0, mse, np.nan))
                psnr = np.where(mse == 0, np.inf, psnr)
                ok = np.where(lossy, psnr >= PSNR_LOSSY_MIN_DB, mse == 0)
                flags["psnr_ok"][idxs] = np.where(have_ref, ok, ~bad_ref)
            out = pdf[out_names].copy()
            for c in CHECK_COLUMNS:
                out[c] = flags[c]
            yield out

    return images.mapInPandas(run, schema=out_schema)


def decode_sanity_report(images: DataFrame) -> DataFrame:
    """long-form violation counts per image rule: (rule_id, violations,
    rows). Feeds the standard report shaping (severity fail for decode/
    dims/phash, warn for caption), mirroring §2.2 evidence tallies."""
    checked = with_image_checks(images)
    aggs = [F.count(F.lit(1)).alias("rows")] + [
        F.sum(F.when(~F.col(c), 1).otherwise(0)).cast("long").alias(c) for c in CHECK_COLUMNS
    ]
    wide = checked.agg(*aggs)
    pairs = ", ".join(f"'image.{c}', `{c}`" for c in CHECK_COLUMNS)
    return wide.select(
        "rows",
        F.expr(f"stack({len(CHECK_COLUMNS)}, {pairs}) as (rule_id, violations)"),
    ).select("rule_id", "violations", "rows")


# ---------------------------------------------------------------- metadata
# corpus filters over the (image_id, w, h, fmt, caption) columns only — the
# cheap pre-decode stage a 10^12-image pipeline runs BEFORE paying for any
# pixel work (reference analog: the rulepack's enum/range/required cell
# tests, rulepack_runner.py:601-694, applied to the north-rule image table).

META_FILTER_REASONS = ("caption_missing", "bad_fmt", "bad_aspect", "too_small")


def caption_body(col=None):
    """Column: the caption text with the generator's ``caption for <id>: ``
    prefix stripped — the free-text body an image-caption dedup keys on.
    Limit-2 split so a body containing the separator later is untouched;
    ``F.get`` (not ``getItem``) so a caption with no separator yields NULL
    instead of an ANSI array-index error."""
    c = F.col("caption") if col is None else col
    return F.get(F.split(c, ": ", 2), 1)


def image_meta_filter(
    images: DataFrame,
    *,
    min_side: int = 48,
    aspect_num: int = 3,
    aspect_den: int = 2,
    min_caption_tokens: int = 3,
    allowed_fmts: tuple[str, ...] = ("ppm", "png", "qnt"),
) -> DataFrame:
    """images + ``reject_reason`` (NULL = kept), metadata columns only.

    First-match-wins reason order (META_FILTER_REASONS): missing/short
    caption, disallowed fmt, aspect ratio strictly above aspect_num/
    aspect_den (integer cross-multiply — no float compare anywhere, so the
    DuckDB oracle replays it exactly), short side below ``min_side``.

    Scale: pure Column projection — no UDF, no shuffle, no bytes touched;
    Catalyst prunes the binary column out of the scan entirely when the
    caller selects metadata columns downstream.
    """
    cap = F.col("caption")
    # coalesce: a NULL body (no prefix separator) must read as 0 tokens in
    # BOTH ANSI (size(NULL)=NULL) and legacy (-1) modes
    n_tokens = F.coalesce(F.size(F.split(F.trim(caption_body()), r"\s+")), F.lit(0))
    w, h = F.col("w"), F.col("h")
    lo, hi = F.least(w, h), F.greatest(w, h)
    reason = (
        F.when(
            cap.isNull() | (F.trim(cap) == "") | (n_tokens < min_caption_tokens),
            "caption_missing",
        )
        .when(~F.col("fmt").isin(*allowed_fmts), "bad_fmt")
        .when(hi * aspect_den > lo * aspect_num, "bad_aspect")
        .when(lo < min_side, "too_small")
    )
    return images.withColumn("reject_reason", reason)


def caption_exact_dups(images: DataFrame) -> DataFrame:
    """Image-caption pairs sharing an identical caption BODY: (caption_body,
    n, keeper_id). The text twin of phash_exact_dups — web corpora carry
    many images re-posted with the same alt-text, and caption-level dedup
    is a standard pre-training cleanup. Keep-first keeper (min image_id)
    mirrors the reference's unique rule (rulepack_runner.py:694-719).

    Scale: shuffle carries (body, id) only — never bytes; bodies are short
    strings, so the groupBy is a plain hash agg with map-side combine.
    """
    return (
        images.where(F.col("caption").isNotNull())
        .select(caption_body().alias("caption_body"), "image_id")
        .where(F.col("caption_body").isNotNull())
        .groupBy("caption_body")
        .agg(F.count("*").alias("n"), F.min("image_id").alias("keeper_id"))
        .where(F.col("n") > 1)
    )


def caption_phash_consistency(images: DataFrame) -> DataFrame:
    """Cross-modal duplicate-consistency audit over the image+caption
    payload — the curation signal neither single-modality dedup sees:

    - ``kind='phash'`` rows: exact-pixel dup groups (same phash, n>1)
      with ``n_distinct_other`` = distinct caption BODIES in the group.
      >1 means the same image circulates under disagreeing captions
      (attribution noise / caption spam — pick one before training).
    - ``kind='caption'`` rows: caption-body dup groups with
      ``n_distinct_other`` = distinct phashes. >1 means boilerplate
      alt-text pasted onto different images (low-information captions).

    ``is_consistent`` = 1 iff the group agrees on the other modality.
    Key is stringified (phash via decimal cast) so both sides union
    into one frame.

    Scale: two map-side-combined groupBys over (8-byte phash, short
    body) pairs — bytes never shuffle, nothing quadratic; the
    count(DISTINCT) plans as the standard two-stage expand."""
    base = (
        images.where(F.col("caption").isNotNull())
        .select("phash", caption_body().alias("body"))
        .where(F.col("body").isNotNull())
    )
    def side(key_col: str, other_col: str, kind: str) -> DataFrame:
        return (
            base.groupBy(key_col)
            .agg(
                F.count(F.lit(1)).alias("n_members"),
                F.countDistinct(F.col(other_col)).alias("n_distinct_other"),
            )
            .where(F.col("n_members") > 1)
            .select(
                F.lit(kind).alias("kind"),
                F.col(key_col).cast("string").alias("key"),
                "n_members",
                "n_distinct_other",
                (F.col("n_distinct_other") == 1).cast("long").alias("is_consistent"),
            )
        )

    return side("phash", "body", "phash").unionByName(side("body", "phash", "caption"))


PIXEL_STATS_SCHEMA = (
    "image_id string, n_px long, px_sum long, px_sqsum long,"
    " px_min int, px_max int"
)


def image_pixel_stats(images: DataFrame) -> DataFrame:
    """(image_id, n_px, px_sum, px_sqsum, px_min, px_max) in ONE Arrow
    decode pass — integer-exact moments over every channel value, the
    inputs to the standard low-information filters (near-solid: px_max -
    px_min small; low-variance: n*sqsum - sum^2 below threshold — both
    pure integer predicates downstream, no UDF). Undecodable rows are
    dropped (the validate stage owns reporting them). px_sqsum stays far
    inside int64 (64x64x3 x 255^2 ~ 8e8)."""
    from fairy_core_spark.functions.image_codec import decode_image

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("image_id", "n_px", "px_sum", "px_sqsum", "px_min", "px_max")}
            for iid, blob, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    px = decode_image(bytes(blob), fmt)
                except Exception:
                    continue
                v = px.astype(np.int64)
                out["image_id"].append(iid)
                out["n_px"].append(int(v.size))
                out["px_sum"].append(int(v.sum()))
                out["px_sqsum"].append(int((v * v).sum()))
                out["px_min"].append(int(v.min()))
                out["px_max"].append(int(v.max()))
            yield pd.DataFrame(out)

    return images.mapInPandas(run, schema=PIXEL_STATS_SCHEMA)


def flag_low_information(
    stats: DataFrame, max_range: int = 8, var_numerator_per_px: int = 25
) -> DataFrame:
    """stats + info_flag: 'near_solid' when the full value range is within
    ``max_range``; 'low_variance' when sqsum/n - (sum/n)^2 <
    ``var_numerator_per_px`` (variance in squared-value units); NULL
    otherwise. The variance test divides FIRST (decimal(38,6) mean) —
    the n*sqsum - sum^2 integer form overflows int64 past ~1.2e7 channel
    values (a 2000x2000 image), which at 10^12-image scale is routine."""
    rng = F.col("px_max") - F.col("px_min")
    n = F.col("n_px").cast("decimal(38,6)")
    mean = F.col("px_sum").cast("decimal(38,6)") / n
    var = F.col("px_sqsum").cast("decimal(38,6)") / n - mean * mean
    flag = (
        F.when(rng <= max_range, "near_solid")
        .when(var < F.lit(int(var_numerator_per_px)), "low_variance")
    )
    return stats.withColumn("info_flag", flag)


def ar_bucket_batches(
    df: DataFrame,
    *,
    ratios: list[tuple[int, int]] | None = None,
    batch_size: int = 16,
    n_shards: int = 64,
    id_col: str = "image_id",
    w_col: str = "w",
    h_col: str = "h",
    salt: str = "",
) -> DataFrame:
    """Aspect-ratio bucketing + deterministic batch assignment — the
    standard pre-training step for image models trained at multiple
    aspect ratios: every image snaps to the nearest target ratio, then
    images inside one bucket are packed into fixed-size batches so a
    batch never mixes shapes. Incomplete trailing batches are dropped
    (the usual convention; dropped mass is bounded by
    buckets*shards*(batch_size-1)).

    Nearest-ratio choice is EXACT integer math: for candidate ``n/d``
    the distance to ``w/h`` is ``|w*d - n*h| / (h*d)``; multiplying by
    the shared ``lcm(all d) / d`` puts every candidate over one common
    denominator, so the argmin is an int64 comparison — no floats, no
    cross-engine smearing. Ties go to the earliest ratio in the list.

    Batch identity is content-stable and partition-invariant: shard =
    md5(salt||id) % n_shards, rank within (bucket, shard) by ascending
    md5 — the same engine-portable hash discipline as the sampling
    family (operators/sampling.py). Batches form within (bucket,
    shard), NOT globally per bucket: a global per-bucket rank would
    funnel the corpus through len(ratios) window partitions, while the
    sharded form keeps the one window shuffle uniformly spread (pick
    n_shards ~ cluster parallelism; re-running with the same salt and
    shard count reproduces every batch bit-for-bit on any layout).

    Output: one row per image that landed in a complete batch —
    ``(id, w, h, bucket, ratio_n, ratio_d, shard, rk, batch_id)`` with
    ``bucket`` the ratio-list index and ``rk`` the 1-based rank inside
    the (bucket, shard) stream.
    """
    from math import lcm

    from pyspark.sql import Window

    from fairy_core_spark.operators.sampling import _md5_60_col, _salted_key

    if ratios is None:
        ratios = [(1, 1), (4, 3), (3, 4), (16, 9), (9, 16)]
    if batch_size <= 0 or n_shards <= 0:
        raise ValueError("batch_size and n_shards must be positive")
    common = lcm(*[d for _, d in ratios])
    w = F.col(w_col).cast("long")
    h = F.col(h_col).cast("long")
    scores = [
        (F.abs(w * F.lit(d) - F.lit(n) * h) * F.lit(common // d)).alias(f"_s{i}")
        for i, (n, d) in enumerate(ratios)
    ]
    scored = df.select(F.col(id_col), w.alias(w_col), h.alias(h_col), *scores)
    score_cols = [F.col(f"_s{i}") for i in range(len(ratios))]
    best = F.least(*score_cols) if len(score_cols) >= 2 else score_cols[0]
    bucket = F.lit(len(ratios) - 1)
    for i in range(len(ratios) - 2, -1, -1):
        bucket = F.when(F.col(f"_s{i}") == best, i).otherwise(bucket)
    hashed = _md5_60_col(_salted_key(F.col(id_col), salt))
    assigned = scored.select(
        id_col,
        w_col,
        h_col,
        bucket.cast("int").alias("bucket"),
        (hashed % n_shards).cast("int").alias("shard"),
        hashed.alias("_h"),
    )
    part = Window.partitionBy("bucket", "shard")
    order = part.orderBy(F.col("_h").asc(), F.col(id_col).asc())
    ratio_n = F.element_at(
        F.array(*[F.lit(n) for n, _ in ratios]), F.col("bucket") + 1
    )
    ratio_d = F.element_at(
        F.array(*[F.lit(d) for _, d in ratios]), F.col("bucket") + 1
    )
    return (
        assigned.withColumn("rk", F.row_number().over(order).cast("long"))
        .withColumn("_n", F.count(F.lit(1)).over(part))
        .where(F.col("rk") <= (F.col("_n") - F.col("_n") % batch_size))
        .select(
            id_col,
            w_col,
            h_col,
            "bucket",
            ratio_n.cast("long").alias("ratio_n"),
            ratio_d.cast("long").alias("ratio_d"),
            "shard",
            "rk",
            ((F.col("rk") - 1) / batch_size).cast("long").alias("batch_id"),
        )
    )


DIHEDRAL_KEYS_SCHEMA = "image_id string, dkey long"


def rotation_invariant_keys(images: DataFrame) -> DataFrame:
    """(image_id, dkey): the dihedral-min perceptual key
    (functions/phash.phash64_dihedral_min) per decodable image in ONE
    Arrow decode pass — the rotation/mirror-blind dedup key (re-uploads
    that rotate or flip the frame defeat plain phash grouping; the orbit
    minimum does not). Undecodable rows are dropped (the validate stage
    owns reporting them). Pure projection: no shuffle at any scale; 8
    DCTs per image ride the decode pass the pipeline already pays."""
    from fairy_core_spark.functions.image_codec import decode_image
    from fairy_core_spark.functions.phash import phash64_dihedral_min

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, keys = [], []
            for iid, blob, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    px = decode_image(bytes(blob), fmt)
                except Exception:
                    continue
                ids.append(iid)
                keys.append(phash64_dihedral_min(px))
            yield pd.DataFrame({"image_id": ids, "dkey": pd.array(keys, dtype="int64")})

    return images.mapInPandas(run, schema=DIHEDRAL_KEYS_SCHEMA)


CHANNEL_STATS_SCHEMA = "image_id string, sum_r long, sum_g long, sum_b long"


def channel_stats(images: DataFrame) -> DataFrame:
    """(image_id, sum_r, sum_g, sum_b): exact integer per-channel value
    sums in one Arrow decode pass — the inputs to color-cast detection
    (a scanner with a failing sensor reddens everything; a dominant
    channel far above its siblings flags it) and white-balance audits.
    Undecodable rows drop (the validate stage owns them)."""
    from fairy_core_spark.functions.image_codec import decode_image

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("image_id", "sum_r", "sum_g", "sum_b")}
            for iid, blob, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    px = decode_image(bytes(blob), fmt)
                except Exception:
                    continue
                v = px.astype(np.int64)
                out["image_id"].append(iid)
                out["sum_r"].append(int(v[..., 0].sum()))
                out["sum_g"].append(int(v[..., 1].sum()))
                out["sum_b"].append(int(v[..., 2].sum()))
            yield pd.DataFrame(out)

    return images.mapInPandas(run, schema=CHANNEL_STATS_SCHEMA)
