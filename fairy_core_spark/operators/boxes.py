"""Bounding-box operators for detection-label pipelines.

A 10^12-image training corpus with object-detection labels carries many
boxes per image, and the standard curation steps — duplicate-annotation
removal, label-merge across annotation sources — reduce to the same
shape as the text/image dedup families: pair detection, connected
components, quality-ranked disposition. This module implements that
family over integer pixel boxes with EXACT integer IoU arithmetic
(no floats anywhere), so results are bit-identical across engines and
partitionings.

Box convention: half-open integer rectangles ``[x0, x1) x [y0, y1)``
with ``x1 > x0`` and ``y1 > y0`` (pixel coordinates). Intersection /
union / IoU are exact int64; an IoU threshold is the rational
``num/den`` and the comparison ``inter * den >= num * union`` never
divides.

Reference lineage: the keep/drop disposition mirrors fairy-core's
keep-first duplicate semantics (reference
src/fairy/validation/rulepack_runner.py:392-421) upgraded to
quality-aware keeper choice, exactly like
:func:`fairy_core_spark.operators.dedup.phash_dup_keeper` does for
whole images.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["iou_pair_edges", "iou_dedup_groups", "nms_boxes"]

_COORDS = ("x0", "y0", "x1", "y1")


def _area(prefix: str) -> Column:
    return (F.col(f"{prefix}.x1") - F.col(f"{prefix}.x0")) * (
        F.col(f"{prefix}.y1") - F.col(f"{prefix}.y0")
    )


def iou_pair_edges(
    boxes: DataFrame,
    *,
    id_col: str = "box_id",
    image_col: str = "image_id",
    iou_num: int = 1,
    iou_den: int = 2,
    max_boxes_per_image: int = 1024,
) -> DataFrame:
    """Pairs of boxes in the SAME image with IoU >= iou_num/iou_den.

    Returns ``(id_a, id_b)`` with ``id_a < id_b`` — the edge list the
    dedup family's connected components consume.

    Plan (the 100 TB story): the candidate join is an equi-join on
    ``image_col`` — boxes only ever pair within their image, so the
    shuffle key is the image id and the join is linear in images, never
    all-pairs across the corpus. Per-image width is bounded by
    construction of detector output (hundreds of boxes), and
    ``max_boxes_per_image`` is the EXPLICIT hot-key guard (same
    contract as trajectory.colocation_pairs): images wider than the cap
    are excluded from pairing entirely — deterministic and disclosed,
    not a quadratic blow-up hoped away. IoU is exact integer math in
    whole-stage codegen; no Python, no floats.

    IoU threshold semantics: ``inter > 0 AND inter * den >= num *
    union`` over int64. Callers must keep ``den * area`` within int64
    (pixel coords up to ~10^6 with den <= 100 are safe).
    """
    if iou_num <= 0 or iou_den <= 0:
        raise ValueError("iou threshold must be a positive rational num/den")
    cols = [id_col, image_col, *_COORDS]
    b = boxes.select(*cols)
    if max_boxes_per_image is not None:
        w = Window.partitionBy(image_col)
        b = (
            b.withColumn("_n_img", F.count(F.lit(1)).over(w))
            .where(F.col("_n_img") <= F.lit(max_boxes_per_image))
            .drop("_n_img")
        )
    a = b.alias("a")
    c = b.alias("b")
    inter_w = F.least(F.col("a.x1"), F.col("b.x1")) - F.greatest(
        F.col("a.x0"), F.col("b.x0")
    )
    inter_h = F.least(F.col("a.y1"), F.col("b.y1")) - F.greatest(
        F.col("a.y0"), F.col("b.y0")
    )
    inter = inter_w * inter_h
    union = _area("a") + _area("b") - inter
    return (
        a.join(
            c,
            (F.col(f"a.{image_col}") == F.col(f"b.{image_col}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .where(
            (inter_w > 0)
            & (inter_h > 0)
            & (inter * F.lit(iou_den) >= F.lit(iou_num) * union)
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
    )


def iou_dedup_groups(
    boxes: DataFrame,
    *,
    id_col: str = "box_id",
    image_col: str = "image_id",
    iou_num: int = 1,
    iou_den: int = 2,
    max_boxes_per_image: int = 1024,
    method: str = "local",
) -> DataFrame:
    """Duplicate-annotation disposition for detection labels.

    Within each connected component of the IoU>=threshold pair graph
    (per image), KEEP the largest-area box (ties broken by min id),
    DROP the rest — the label-merge step after unioning annotation
    sources, and the geometric twin of
    :func:`~fairy_core_spark.operators.dedup.phash_dup_keeper`.

    Output: one row per box in a duplicate group —
    ``(box_id, image_id, group_id, keeper_id, is_keeper)`` with
    ``group_id`` = min box id in the component and ``is_keeper`` an
    integer 0/1. Singletons are absent by design; the drop list is
    ``is_keeper = 0``.

    Plan: IoU edges never cross images, so the component graph is
    partitioned by construction — the default ``method='local'`` runs
    ONE shuffle on the image id and solves pairs + union-find + keeper
    for many images per Arrow batch (exact-integer IoU in numpy int64;
    no iterative CC rounds, no per-image grouped-map overhead — see
    ``_iou_dedup_local``; interleaved A/B at 2M boxes / 200k images:
    7.1s vs 23.5s global, 3.3x). ``method='global'``
    keeps the shared pipeline shape (codegen IoU equi-join ->
    pointer-jumping connected components -> keeper windows) — results
    are identical (parity-tested); use it when box edges are later
    unioned with cross-image signals (e.g. phash) into one component
    pass. Both honor ``max_boxes_per_image`` identically: wider images
    are excluded from pairing entirely.
    """
    if method == "local":
        return _iou_dedup_local(
            boxes,
            id_col=id_col,
            image_col=image_col,
            iou_num=iou_num,
            iou_den=iou_den,
            max_boxes_per_image=max_boxes_per_image,
        )
    if method != "global":
        raise ValueError(f"method must be 'local' or 'global', got {method!r}")
    from fairy_core_spark.operators.dedup import connected_components

    pairs = iou_pair_edges(
        boxes,
        id_col=id_col,
        image_col=image_col,
        iou_num=iou_num,
        iou_den=iou_den,
        max_boxes_per_image=max_boxes_per_image,
    )
    members = connected_components(pairs).withColumnRenamed("doc_id", id_col)
    area = (F.col("x1") - F.col("x0")) * (F.col("y1") - F.col("y0"))
    ranked = members.join(
        boxes.select(id_col, image_col, area.cast("long").alias("_px")), id_col
    )
    by_group = Window.partitionBy("group_id")
    order = by_group.orderBy(F.col("_px").desc(), F.col(id_col).asc())
    return (
        ranked.withColumn("rk", F.row_number().over(order))
        .withColumn(
            "keeper_id",
            F.max(F.when(F.col("rk") == 1, F.col(id_col))).over(by_group),
        )
        .select(
            id_col,
            image_col,
            "group_id",
            "keeper_id",
            (F.col("rk") == 1).cast("long").alias("is_keeper"),
        )
    )


def _iou_dedup_local(
    boxes: DataFrame,
    *,
    id_col: str,
    image_col: str,
    iou_num: int,
    iou_den: int,
    max_boxes_per_image: int,
) -> DataFrame:
    """One shuffle on the image id, then pairs + union-find + keeper
    solved inside Arrow batches holding MANY images each.

    The graph never crosses images, so no distributed CC rounds are
    needed — but per-image ``applyInPandas`` would pay the grouped-map
    overhead once per image (ruinous at 10 boxes/image). Instead:
    repartition by image, sort within partitions so each image's rows
    are contiguous, and stream ``mapInPandas`` batches through a
    vectorized kernel, carrying the (possibly incomplete) trailing
    image over to the next batch. Pair tests are numpy int64 per image
    segment; root resolution is vectorized pointer jumping; group-id /
    keeper / size filters are lexsort + reduceat — no per-row or
    per-group pandas calls anywhere.
    """
    import numpy as np
    import pandas as pd

    if iou_num <= 0 or iou_den <= 0:
        raise ValueError("iou threshold must be a positive rational num/den")
    idt = boxes.schema[id_col].dataType.simpleString()
    imt = boxes.schema[image_col].dataType.simpleString()
    out_schema = (
        f"`{id_col}` {idt}, `{image_col}` {imt}, group_id {idt}, "
        f"keeper_id {idt}, is_keeper long"
    )
    num, den = int(iou_num), int(iou_den)
    cap = None if max_boxes_per_image is None else int(max_boxes_per_image)

    def _solve(pdf: pd.DataFrame) -> pd.DataFrame:
        """Disposition for a chunk of COMPLETE images (rows contiguous
        per image)."""
        n = len(pdf)
        img = pdf[image_col].to_numpy()
        ids = pdf[id_col].to_numpy()
        x0 = pdf["x0"].to_numpy(dtype="int64")
        y0 = pdf["y0"].to_numpy(dtype="int64")
        x1 = pdf["x1"].to_numpy(dtype="int64")
        y1 = pdf["y1"].to_numpy(dtype="int64")
        area = (x1 - x0) * (y1 - y0)
        cut = np.flatnonzero(img[1:] != img[:-1]) + 1
        starts = np.concatenate(([0], cut))
        ends = np.concatenate((cut, [n]))
        parent = np.arange(n)

        def find(i: int) -> int:
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for s, e in zip(starts, ends):
            if e - s < 2 or (cap is not None and e - s > cap):
                continue  # capped images excluded from pairing entirely
            for i in range(s, e - 1):
                iw = np.minimum(x1[i + 1 : e], x1[i]) - np.maximum(
                    x0[i + 1 : e], x0[i]
                )
                ih = np.minimum(y1[i + 1 : e], y1[i]) - np.maximum(
                    y0[i + 1 : e], y0[i]
                )
                pos = (iw > 0) & (ih > 0)
                inter = np.where(pos, iw * ih, 0)
                union = area[i + 1 : e] + area[i] - inter
                hits = np.flatnonzero(pos & (inter * den >= num * union))
                if not hits.size:
                    continue
                ri = find(i)
                for j in hits:
                    rj = find(i + 1 + int(j))
                    if ri != rj:
                        if rj < ri:
                            ri, rj = rj, ri
                        parent[rj] = ri
        while True:  # vectorized pointer jumping to full compression
            pp = parent[parent]
            if np.array_equal(pp, parent):
                break
            parent = pp
        order = np.lexsort((ids, -area, parent))
        r_sorted = parent[order]
        seg = np.flatnonzero(
            np.concatenate(([True], r_sorted[1:] != r_sorted[:-1]))
        )
        sizes = np.diff(np.concatenate((seg, [n])))
        seg_idx = np.cumsum(
            np.concatenate(([0], (r_sorted[1:] != r_sorted[:-1]).astype(np.int64)))
        )
        ids_sorted = ids[order]
        keeper = ids_sorted[seg][seg_idx]  # first of segment = max area, min id
        gid = np.minimum.reduceat(ids_sorted, seg)[seg_idx]
        sel = sizes[seg_idx] >= 2  # singletons (incl. capped images) drop
        ids_out = ids_sorted[sel]
        kp_out = keeper[sel]
        return pd.DataFrame(
            {
                id_col: ids_out,
                image_col: img[order][sel],
                "group_id": gid[sel],
                "keeper_id": kp_out,
                "is_keeper": (ids_out == kp_out).astype("int64"),
            }
        )

    def _run(batches):
        carry = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat((carry, pdf), ignore_index=True)
            if not len(pdf):
                continue
            img = pdf[image_col].to_numpy()
            nz = np.flatnonzero(img != img[-1])
            tail_start = int(nz[-1]) + 1 if nz.size else 0
            carry = pdf.iloc[tail_start:].reset_index(drop=True)
            if tail_start:
                yield _solve(pdf.iloc[:tail_start])
        if carry is not None and len(carry):
            yield _solve(carry)

    return (
        boxes.select(id_col, image_col, *_COORDS)
        .repartition(image_col)
        .sortWithinPartitions(image_col, id_col)
        .mapInPandas(_run, out_schema)
    )


def nms_boxes(
    boxes: DataFrame,
    *,
    id_col: str = "box_id",
    image_col: str = "image_id",
    score_col: str = "score",
    iou_num: int = 1,
    iou_den: int = 2,
    max_boxes_per_image: int = 4096,
) -> DataFrame:
    """Non-maximum suppression — the standard post-detector cleanup:
    within each image, walk boxes in descending score order and drop
    any box whose IoU with an already-kept box meets the threshold.

    Greedy order is fully deterministic: (score DESC, id ASC) — equal
    scores never flap across partitionings or engines. The IoU test is
    the same exact-integer comparison as :func:`iou_pair_edges`
    (``inter * den >= num * union``, int64, never divides), evaluated
    in numpy inside the per-image batch.

    Output: the KEPT boxes only — ``(box_id, image_id, score, keep_rank)``
    with ``keep_rank`` the 1-based order in which the box was accepted.

    Plan (the 100 TB story): greediness is inherently sequential per
    image, so this is a grouped-map ``applyInPandas`` keyed on the image
    id — one shuffle, Arrow-batched, images independent (parallelism =
    image count), and the per-image loop is O(n_kept * n) vectorized
    suppression, never cross-image. ``max_boxes_per_image`` bounds the
    worst case: wider images keep only their ``max_boxes_per_image``
    highest-score boxes as NMS input (detector outputs are bounded in
    practice; the truncation is deterministic and disclosed).
    """
    import numpy as np
    import pandas as pd

    if iou_num <= 0 or iou_den <= 0:
        raise ValueError("iou threshold must be a positive rational num/den")
    if max_boxes_per_image < 1:
        raise ValueError("max_boxes_per_image must be >= 1")
    ent = boxes.schema[image_col].dataType.simpleString()
    idt = boxes.schema[id_col].dataType.simpleString()
    sct = boxes.schema[score_col].dataType.simpleString()
    out_schema = (
        f"`{id_col}` {idt}, `{image_col}` {ent}, `{score_col}` {sct}, "
        "keep_rank long"
    )
    num, den, cap = int(iou_num), int(iou_den), int(max_boxes_per_image)

    def _nms(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [score_col, id_col], ascending=[False, True], kind="mergesort"
        ).head(cap)
        x0 = pdf["x0"].to_numpy(dtype="int64")
        y0 = pdf["y0"].to_numpy(dtype="int64")
        x1 = pdf["x1"].to_numpy(dtype="int64")
        y1 = pdf["y1"].to_numpy(dtype="int64")
        area = (x1 - x0) * (y1 - y0)
        n = len(pdf)
        kept: list[int] = []
        for i in range(n):
            if kept:
                k = np.asarray(kept)
                iw = np.minimum(x1[k], x1[i]) - np.maximum(x0[k], x0[i])
                ih = np.minimum(y1[k], y1[i]) - np.maximum(y0[k], y0[i])
                inter = np.where((iw > 0) & (ih > 0), iw * ih, 0)
                union = area[k] + area[i] - inter
                if bool(((inter > 0) & (inter * den >= num * union)).any()):
                    continue
            kept.append(i)
        out = pdf.iloc[kept][[id_col, image_col, score_col]].copy()
        out["keep_rank"] = np.arange(1, len(kept) + 1, dtype="int64")
        return out

    return (
        boxes.select(id_col, image_col, score_col, "x0", "y0", "x1", "y1")
        .groupBy(image_col)
        .applyInPandas(_nms, out_schema)
    )
