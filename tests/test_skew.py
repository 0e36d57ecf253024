"""Skew tools: adaptive cell split must be pair-exact vs the plain join."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from rasteret_spark.operators import skew, spatial_join as sj


def _skewed_points(n=3000):
    rng = np.random.default_rng(9)
    # 80% of points in one tiny hot area, rest uniform
    hot_n = int(n * 0.8)
    return pd.DataFrame(
        {
            "point_index": np.arange(n),
            "x": np.concatenate(
                [rng.normal(13.4, 0.02, hot_n), rng.uniform(-170, 170, n - hot_n)]
            ),
            "y": np.concatenate(
                [rng.normal(52.5, 0.02, hot_n), rng.uniform(-80, 80, n - hot_n)]
            ),
        }
    )


def _boxes(m=150):
    rng = np.random.default_rng(10)
    cx = np.concatenate([rng.normal(13.4, 0.1, m // 2), rng.uniform(-170, 170, m - m // 2)])
    cy = np.concatenate([rng.normal(52.5, 0.1, m // 2), rng.uniform(-80, 80, m - m // 2)])
    half = rng.uniform(0.01, 0.3, m)
    return pd.DataFrame(
        {
            "image_id": [f"im{i}" for i in range(m)],
            "img_xmin": cx - half,
            "img_ymin": cy - half,
            "img_xmax": cx + half,
            "img_ymax": cy + half,
        }
    )


def test_adaptive_split_matches_plain_join(spark):
    pts = spark.createDataFrame(_skewed_points())
    imgs = spark.createDataFrame(_boxes())
    plain = sj.point_in_bbox_join(pts, imgs, res=7).select("point_index", "image_id")
    adaptive = skew.point_in_bbox_join_adaptive(
        pts, imgs, res=7, hot_threshold=500
    ).select("point_index", "image_id")
    p = set(map(tuple, plain.collect()))
    a = set(map(tuple, adaptive.collect()))
    assert len(a) == adaptive.count()  # no duplicate pairs
    assert a == p
    # the hot set must actually be non-empty for this fixture
    pc = pts.withColumn("cell", sj.cell_of_point_col(F.col("x"), F.col("y"), 7))
    assert len(skew.hot_keys(pc, "cell", 500)) >= 1


def test_salted_agg_matches_plain(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"k": ["a"] * 500 + ["b"] * 5, "v": [str(i) for i in range(505)]})
    )
    got = {
        r["k"]: sorted(r["v_list"])
        for r in skew.salted_agg(df, "k", "v", salts=8).collect()
    }
    assert got["a"] == sorted(str(i) for i in range(500))
    assert got["b"] == sorted(str(i) for i in range(500, 505))
