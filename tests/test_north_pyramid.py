"""north_pipeline(pyramid_levels=...): the finest pyramid level equals the
default one-level rollup exactly, coarser levels equal re-aggregating the
finest by parent, and the default path is untouched."""

from __future__ import annotations

from pyspark.sql import functions as F

from fairy_core_spark.datagen.images import geo_df, images_df, polygons_pdf
from fairy_core_spark.pipeline.north import north_pipeline

N = 400
LEVEL = 7


def test_pyramid_pipeline_matches_one_level_and_parents(spark):
    imgs = images_df(spark, N, partitions=4)
    geo = geo_df(spark, N, partitions=4)
    polys = polygons_pdf(10)

    flat = north_pipeline(imgs, geo, polys, level=LEVEL, n_partitions=4).collect()
    pyr = north_pipeline(
        imgs, geo, polys, level=LEVEL, n_partitions=4, pyramid_levels=(LEVEL, 4)
    ).collect()

    flat_map = {r["tile_id"]: r for r in flat}
    fine = {r["cell"]: r for r in pyr if r["res"] == LEVEL}
    assert set(fine) == set(flat_map)
    for c, r in fine.items():
        f = flat_map[c]
        assert (
            r["n_images"], r["avg_w"], r["avg_h"], r["n_phash_dups"], r["n_pip_matches"]
        ) == (
            f["n_images"], f["avg_w"], f["avg_h"], f["n_phash_dups"], f["n_pip_matches"]
        )

    # coarse level: image counts re-aggregate exactly by s2 parent
    from fairy_core_spark.spatial import s2
    import numpy as np

    coarse = {r["cell"]: r["n_images"] for r in pyr if r["res"] == 4}
    agg: dict[int, int] = {}
    for c, r in fine.items():
        p = int(s2.parent(np.array([c], dtype=np.int64), 4)[0])
        agg[p] = agg.get(p, 0) + r["n_images"]
    assert coarse == agg

    # bad levels fail loudly
    import pytest

    with pytest.raises(ValueError):
        north_pipeline(imgs, geo, polys, level=LEVEL, pyramid_levels=(12, 4))
