"""Checkpointed end-to-end pipelines: the flagship flows under the lineage
runner, resumable at partition granularity (north-rule requirement).

``resumable_zonal`` buckets the image table by image_id hash, runs the full
cell-join -> refine -> decode -> zonal chain per remaining bucket, and
commits per-partition outputs + log rows through ``lineage.checkpointed_run``
— a killed job re-processes only unlogged buckets, and re-processing a
bucket is idempotent (dynamic partition overwrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812

from rasteret_spark.operators import decode, spatial_join as sj
from rasteret_spark.plans import lineage


def resumable_zonal(
    spark: SparkSession,
    images: DataFrame,
    aois: DataFrame,
    out_dir: str,
    res: int = 7,
    n_parts: int = 32,
) -> DataFrame:
    """images: (image_id, bytes, caption, img_xmin..ymax);
    aois: (aoi_id, aoi_geometry, aoi_xmin..ymax).  Returns the full zonal
    output, computing only buckets missing from the checkpoint log."""

    def transform(bucketed_images: DataFrame) -> DataFrame:
        img_light = bucketed_images.select(
            "image_id", "part_id", "img_xmin", "img_ymin", "img_xmax", "img_ymax"
        )
        cands = sj.bbox_join(img_light, aois, res=res)
        pairs = (
            sj.refine_rect_polygon(cands)
            .filter(F.col("intersects"))
            .select("image_id", "aoi_id", "aoi_geometry",
                    "aoi_xmin", "aoi_ymin", "aoi_xmax", "aoi_ymax")
        )
        z = decode.zonal_stats(
            pairs, bucketed_images.select("image_id", "bytes", "caption")
        )
        # re-attach the bucket id for the partitioned write
        part = bucketed_images.select("image_id", "part_id")
        return z.join(part, "image_id")

    return lineage.checkpointed_run(
        spark, images, transform, out_dir, key_col="image_id",
        stage="zonal", n_parts=n_parts, params={"res": res},
    )


def resumable_sample(
    spark: SparkSession,
    images: DataFrame,
    points: DataFrame,
    out_dir: str,
    max_ring: int = 0,
    neighborhood: int = 0,
    res: int = 8,
    n_parts: int = 32,
) -> DataFrame:
    """Checkpointed point-sampling: the zonal pipeline's sibling for the
    R7 sampler path.  images: (image_id, bytes, img_xmin..ymax);
    points: (point_index, x, y).  Buckets by image_id — a bucket's images
    candidate-join against ALL points (points are the small broadcastable
    side), sample, and commit; a killed job re-runs only unlogged buckets.
    (No persist on points/aois: ``checkpointed_run`` invokes the transform
    in exactly one write job, so a cache would be pure overhead and would
    leak executor storage on the caller's DataFrame.)"""
    from rasteret_spark.operators import sampling

    def transform(bucketed_images: DataFrame) -> DataFrame:
        img_light = bucketed_images.select(
            "image_id", "part_id", "img_xmin", "img_ymin", "img_xmax", "img_ymax"
        )
        cands = sj.point_in_bbox_join(points, img_light, res=res).select(
            "point_index", "x", "y", "image_id"
        )
        s = sampling.sample_points(
            cands, bucketed_images.select("image_id", "bytes"),
            max_ring=max_ring, neighborhood=neighborhood,
        )
        part = bucketed_images.select("image_id", "part_id")
        return s.join(part, "image_id")

    return lineage.checkpointed_run(
        spark, images, transform, out_dir, key_col="image_id",
        stage="sample", n_parts=n_parts,
        params={"max_ring": max_ring, "neighborhood": neighborhood, "res": res},
    )
