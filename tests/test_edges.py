"""Edge cases: cached-meta decode path, empty inputs, lossy-nodata behavior."""

import pandas as pd
from pyspark.sql import functions as F

from rasteret_spark.operators import decode, enrich, sampling, spatial_join as sj


def test_zonal_with_cached_meta_equals_reparse(spark, images_pdf, aois_pdf):
    """zonal_stats consuming the enrichment meta struct must produce exactly
    the same rows as the header-reparse path."""
    img_light = spark.createDataFrame(
        images_pdf[["image_id", "xmin", "ymin", "xmax", "ymax"]].rename(
            columns={c: f"img_{c}" for c in ["xmin", "ymin", "xmax", "ymax"]}
        )
    )
    images = spark.createDataFrame(images_pdf[["image_id", "bytes", "caption"]])
    enriched = enrich.enrich_headers(images)
    aoi = spark.createDataFrame(
        aois_pdf.rename(
            columns={
                **{c: f"aoi_{c}" for c in ["xmin", "ymin", "xmax", "ymax"]},
                "geometry": "aoi_geometry",
            }
        )
    )
    pairs = (
        sj.refine_rect_polygon(sj.bbox_join(img_light, aoi, res=7))
        .filter(F.col("intersects"))
        .select("image_id", "aoi_id", "aoi_geometry",
                "aoi_xmin", "aoi_ymin", "aoi_xmax", "aoi_ymax")
    )
    a = decode.zonal_stats(pairs, images).toPandas()
    b = decode.zonal_stats(pairs, enriched).toPandas()
    key = ["image_id", "aoi_id"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_empty_candidates_through_sampling_and_zonal(spark, images_pdf):
    images = spark.createDataFrame(images_pdf[["image_id", "bytes", "caption"]])
    empty_cands = spark.createDataFrame(
        [], "point_index bigint, x double, y double, image_id string"
    )
    assert sampling.sample_points(empty_cands, images, max_ring=2).count() == 0
    empty_pairs = spark.createDataFrame(
        [],
        "image_id string, aoi_id string, aoi_geometry binary, "
        "aoi_xmin double, aoi_ymin double, aoi_xmax double, aoi_ymax double",
    )
    assert decode.zonal_stats(empty_pairs, images).count() == 0
