"""Detection-box IoU dedup tests: exact pair set vs an O(n^2) integer
brute force on random boxes, threshold boundary exactness, the hot-image
cap, and keeper disposition determinism."""

from __future__ import annotations

import numpy as np
import pytest

from fairy_core_spark.operators.boxes import iou_dedup_groups, iou_pair_edges

SCHEMA = "box_id long, image_id long, x0 long, y0 long, x1 long, y1 long"


def _rand_boxes(rng, n_images, per_image):
    rows = []
    bid = 0
    for img in range(n_images):
        for _ in range(per_image):
            x0 = int(rng.integers(0, 900))
            y0 = int(rng.integers(0, 700))
            w = int(rng.integers(8, 160))
            h = int(rng.integers(8, 140))
            rows.append((bid, img, x0, y0, x0 + w, y0 + h))
            bid += 1
    return rows


def _brute_pairs(rows, num, den):
    out = set()
    for i, (ai, aimg, ax0, ay0, ax1, ay1) in enumerate(rows):
        for bi, bimg, bx0, by0, bx1, by1 in rows[i + 1 :]:
            if aimg != bimg:
                continue
            iw = min(ax1, bx1) - max(ax0, bx0)
            ih = min(ay1, by1) - max(ay0, by0)
            if iw <= 0 or ih <= 0:
                continue
            inter = iw * ih
            union = (ax1 - ax0) * (ay1 - ay0) + (bx1 - bx0) * (by1 - by0) - inter
            if inter * den >= num * union:
                out.add((min(ai, bi), max(ai, bi)))
    return out


def test_pairs_match_bruteforce(spark):
    rng = np.random.default_rng(53)
    rows = _rand_boxes(rng, 40, 12)
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        (r.id_a, r.id_b)
        for r in iou_pair_edges(df, iou_num=3, iou_den=10).collect()
    }
    assert got == _brute_pairs(rows, 3, 10)
    assert got  # non-vacuous: random boxes at IoU>=0.3 do produce pairs


def test_threshold_boundary_is_exact(spark):
    # inter=50, areas 100/100 -> union=150, IoU = 1/3 exactly.
    rows = [
        (0, 7, 0, 0, 10, 10),
        (1, 7, 5, 0, 15, 10),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    assert iou_pair_edges(df, iou_num=1, iou_den=3).count() == 1
    # one integer tighter than 1/3 -> excluded, no float smearing
    assert iou_pair_edges(df, iou_num=51, iou_den=150).count() == 0


def test_cross_image_boxes_never_pair(spark):
    rows = [(0, 1, 0, 0, 10, 10), (1, 2, 0, 0, 10, 10)]
    df = spark.createDataFrame(rows, SCHEMA)
    assert iou_pair_edges(df, iou_num=1, iou_den=2).count() == 0


def test_hot_image_cap_excludes_wide_images(spark):
    rows = [(i, 5, 0, 0, 10, 10) for i in range(6)]  # 6 identical boxes
    rows += [(10, 6, 0, 0, 10, 10), (11, 6, 1, 0, 11, 10)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        (r.id_a, r.id_b)
        for r in iou_pair_edges(
            df, iou_num=1, iou_den=2, max_boxes_per_image=4
        ).collect()
    }
    assert got == {(10, 11)}  # image 5 excluded by the cap, image 6 kept


def test_keeper_is_largest_then_min_id(spark):
    rows = [
        (3, 1, 0, 0, 10, 10),     # area 100
        (4, 1, 1, 0, 11, 10),     # area 100, overlaps 3 heavily
        (5, 1, 0, 0, 12, 10),     # area 120 -> keeper
        (9, 2, 0, 0, 10, 10),     # image 2: equal areas -> min id keeps
        (8, 2, 0, 1, 10, 11),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {
        r.box_id: (r.group_id, r.keeper_id, r.is_keeper)
        for r in iou_dedup_groups(df, iou_num=1, iou_den=2).collect()
    }
    assert out == {
        3: (3, 5, 0),
        4: (3, 5, 0),
        5: (3, 5, 1),
        8: (8, 8, 1),
        9: (8, 8, 0),
    }


def test_singletons_absent(spark):
    rows = [(0, 1, 0, 0, 10, 10), (1, 1, 500, 500, 510, 510)]
    df = spark.createDataFrame(rows, SCHEMA)
    assert iou_dedup_groups(df).count() == 0


def test_invalid_threshold_rejected(spark):
    df = spark.createDataFrame([(0, 1, 0, 0, 1, 1)], SCHEMA)
    import pytest

    with pytest.raises(ValueError):
        iou_pair_edges(df, iou_num=0, iou_den=2)


# ---------------------------------------------------------------- NMS

NMS_SCHEMA = (
    "box_id long, image_id long, score long, x0 long, y0 long, x1 long, y1 long"
)


def _brute_nms(rows, num, den, cap=4096):
    by_img: dict[int, list] = {}
    for r in rows:
        by_img.setdefault(r[1], []).append(r)
    out = []
    for img, boxes in by_img.items():
        boxes = sorted(boxes, key=lambda r: (-r[2], r[0]))[:cap]
        kept = []
        for b in boxes:
            ok = True
            for k in kept:
                iw = min(b[5], k[5]) - max(b[3], k[3])
                ih = min(b[6], k[6]) - max(b[4], k[4])
                if iw > 0 and ih > 0:
                    inter = iw * ih
                    union = ((b[5] - b[3]) * (b[6] - b[4])
                             + (k[5] - k[3]) * (k[6] - k[4]) - inter)
                    if inter * den >= num * union:
                        ok = False
                        break
            if ok:
                kept.append(b)
        out += [(k[0], img, k[2], i + 1) for i, k in enumerate(kept)]
    return sorted(out)


def _rand_scored_boxes(rng, n_images, per_image):
    rows = []
    bid = 0
    for img in range(n_images):
        for _ in range(per_image):
            x0 = int(rng.integers(0, 400))
            y0 = int(rng.integers(0, 300))
            rows.append((bid, img, int(rng.integers(0, 50)), x0, y0,
                         x0 + int(rng.integers(20, 120)),
                         y0 + int(rng.integers(20, 100))))
            bid += 1
    return rows


def test_nms_matches_bruteforce(spark):
    from fairy_core_spark.operators.boxes import nms_boxes

    rng = np.random.default_rng(61)
    rows = _rand_scored_boxes(rng, 30, 15)
    got = sorted(
        (r.box_id, r.image_id, r.score, r.keep_rank)
        for r in nms_boxes(
            spark.createDataFrame(rows, NMS_SCHEMA), iou_num=3, iou_den=10
        ).collect()
    )
    assert got == _brute_nms(rows, 3, 10)
    # non-vacuous: suppression actually happened somewhere
    assert len(got) < len(rows)


def test_nms_equal_scores_break_by_id(spark):
    from fairy_core_spark.operators.boxes import nms_boxes

    rows = [  # identical overlapping boxes, equal score -> min id survives
        (7, 1, 10, 0, 0, 20, 20),
        (3, 1, 10, 1, 1, 21, 21),
    ]
    out = nms_boxes(spark.createDataFrame(rows, NMS_SCHEMA)).collect()
    assert [(r.box_id, r.keep_rank) for r in out] == [(3, 1)]


def test_nms_cap_truncates_lowest_scores(spark):
    from fairy_core_spark.operators.boxes import nms_boxes

    # disjoint boxes, scores 0..9; cap=4 keeps the 4 best only
    rows = [(i, 1, i, i * 100, 0, i * 100 + 10, 10) for i in range(10)]
    out = nms_boxes(
        spark.createDataFrame(rows, NMS_SCHEMA), max_boxes_per_image=4
    ).collect()
    assert sorted(r.box_id for r in out) == [6, 7, 8, 9]


def test_nms_invalid_params(spark):
    from fairy_core_spark.operators.boxes import nms_boxes

    df = spark.createDataFrame([(0, 1, 1, 0, 0, 1, 1)], NMS_SCHEMA)
    with pytest.raises(ValueError):
        nms_boxes(df, iou_den=0)
    with pytest.raises(ValueError):
        nms_boxes(df, max_boxes_per_image=0)


def test_local_and_global_methods_agree(spark):
    rng = np.random.default_rng(103)
    rows = _rand_boxes(rng, 50, 12)
    df = spark.createDataFrame(rows, SCHEMA)
    key = lambda recs: sorted(
        (r.box_id, r.image_id, r.group_id, r.keeper_id, r.is_keeper) for r in recs
    )
    a = key(iou_dedup_groups(df, iou_num=3, iou_den=10, method="local").collect())
    b = key(iou_dedup_groups(df, iou_num=3, iou_den=10, method="global").collect())
    assert a == b and a


def test_local_method_honors_cap(spark):
    rows = [(i, 5, 0, 0, 10, 10) for i in range(6)]
    rows += [(10, 6, 0, 0, 10, 10), (11, 6, 1, 0, 11, 10)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = iou_dedup_groups(df, max_boxes_per_image=4, method="local").collect()
    assert {r.image_id for r in out} == {6}


def test_unknown_method_rejected(spark):
    df = spark.createDataFrame([(0, 1, 0, 0, 1, 1)], SCHEMA)
    with pytest.raises(ValueError, match="method"):
        iou_dedup_groups(df, method="nope")


def test_local_method_survives_tiny_arrow_batches(spark):
    # Force images to straddle Arrow batch boundaries so the carry
    # path in _iou_dedup_local._run is exercised (7-row batches vs
    # 12-box images), and compare against the global path.
    rng = np.random.default_rng(211)
    rows = _rand_boxes(rng, 60, 12)
    df = spark.createDataFrame(rows, SCHEMA)
    key = lambda recs: sorted(
        (r.box_id, r.image_id, r.group_id, r.keeper_id, r.is_keeper) for r in recs
    )
    want = key(iou_dedup_groups(df, iou_num=3, iou_den=10, method="global").collect())
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        got = key(
            iou_dedup_groups(df, iou_num=3, iou_den=10, method="local").collect()
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    assert got == want and got
