"""Compacted-cover column + ancestor-chain probe join: exact vs brute force."""

import numpy as np

from rasteret_spark import grid
from rasteret_spark.operators import cellcover


def test_cover_column_is_compacted_and_equivalent(spark, images_pdf):
    df = spark.createDataFrame(images_pdf[["image_id", "xmin", "ymin", "xmax", "ymax"]])
    covered = cellcover.with_compacted_cover(df, res=9).toPandas()
    for _, r in covered.iterrows():
        cells = np.asarray(r["cells"], dtype=np.int64)
        # compaction is a fixed point
        assert sorted(grid.compact(cells)) == sorted(cells)
        # uncompacting reproduces the raw cover exactly
        raw = grid.cover_bbox(r["xmin"], r["ymin"], r["xmax"], r["ymax"], 9)
        assert sorted(grid.uncompact(cells, 9)) == sorted(raw)


def test_point_probe_join_matches_bruteforce(spark, images_pdf, points_pdf):
    img = cellcover.with_compacted_cover(
        spark.createDataFrame(images_pdf[["image_id", "xmin", "ymin", "xmax", "ymax"]]),
        res=9,
    )
    pts = spark.createDataFrame(points_pdf)
    j = cellcover.point_probe_join(pts, img, res=9, min_res=0)
    # candidate pairs: each at most once (compaction guarantees no dup match)
    pairs = j.select("point_index", "image_id").toPandas()
    assert len(pairs) == len(set(map(tuple, pairs.itertuples(index=False))))
    # exact containment after the native filter equals brute force
    exact = j.filter(
        (j.x >= j.xmin) & (j.x <= j.xmax) & (j.y >= j.ymin) & (j.y <= j.ymax)
    ).select("point_index", "image_id")
    got = set(map(tuple, exact.toPandas().itertuples(index=False)))
    want = set()
    for _, p in points_pdf.iterrows():
        for _, im in images_pdf.iterrows():
            if im["xmin"] <= p["x"] <= im["xmax"] and im["ymin"] <= p["y"] <= im["ymax"]:
                want.add((p["point_index"], im["image_id"]))
    assert got == want
