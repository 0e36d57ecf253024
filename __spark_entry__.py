"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json). Fill these in
as you implement operators from SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: point-sample pipeline end-to-end on sf0.001.

    events(sf0.001) -> deterministic probe points around the densest image
    hot-spot -> header-cache enrichment -> cell-cover point-in-image join ->
    per-image tile-dedup decode + ring-fallback sampling -> metadata join-back.
    Exercises decode + cell join + tile assignment (the headline metric path).
    """
    from pyspark.sql import functions as F

    from rasteret_spark.operators import sampling, spatial_join as sj
    from rasteret_spark.sources import synthetic as syn

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    points = events.select(
        F.col("event_id").alias("point_index"),
        (F.lit(13.4) + ((F.col("user_id") % 101) - 50) * 0.002).alias("x"),
        (F.lit(52.5) + ((F.col("event_id") % 101) - 50) * 0.002).alias("y"),
        F.col("event_type").alias("station_id"),
    )
    images = spark.createDataFrame(syn.images_table(150).to_pandas()).select(
        "image_id", "bytes", "caption", "datetime",
        F.col("xmin").alias("img_xmin"), F.col("ymin").alias("img_ymin"),
        F.col("xmax").alias("img_xmax"), F.col("ymax").alias("img_ymax"),
    )
    cands = sj.point_in_bbox_join(points, images, res=8)
    samples = sampling.sample_points(cands, max_ring=4)
    meta = images.select("image_id", "caption", "datetime")
    return (
        samples.join(F.broadcast(meta), "image_id")
        .join(points.select("point_index", "station_id"), "point_index")
        .select(
            "point_index", "image_id", "station_id", "caption",
            "px_col", "px_row", "value", "valid", "ring_steps",
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Alias every computed/aggregate column so names match ``oracle_sql``.
    """
    return {}


def oracle_sql() -> dict[str, str]:
    """For each key in ``queries()``, equivalent ANSI SQL runnable by
    DuckDB on the same parquet tables (pre-registered views: region
    nation customer supplier part orders lineitem events documents
    embeddings). Omit for non-SQL-expressible ops → driver records a
    weaker rows-only check.
    """
    return {}
