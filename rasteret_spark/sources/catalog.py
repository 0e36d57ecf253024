"""Iceberg-style partitioned catalog: write/load the image table.

Mirrors the reference's export/load contract: zstd parquet partitioned by
``year``/``month`` with schema validation on load (rasteret
`src/rasteret/core/collection.py:1552-1688` export, `904-1011` from_parquet
contract checks).  Real Iceberg needs jars absent from this image, so the
layout is hive-partitioned parquet with the same pruning semantics — Spark
prunes partitions from the directory structure, row groups from parquet
stats, and columns from the projection (all visible in `.explain`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812

REQUIRED_COLUMNS = ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
GEO_COLUMNS = ("datetime", "epsg", "transform", "geometry", "xmin", "ymin", "xmax", "ymax")


def write_images(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Partitioned sink (S10): year/month hive layout, zstd compression."""
    if "year" not in df.columns:
        df = df.withColumn("year", F.year("datetime")).withColumn(
            "month", F.month("datetime")
        )
    (
        df.write.mode(mode)
        .option("compression", "zstd")
        .partitionBy("year", "month")
        .parquet(path)
    )


def load_images(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    column_map: dict[str, str] | None = None,
    validate: bool = True,
) -> DataFrame:
    """Contract-validated load (S2) with optional column aliasing
    (rasteret's ``column_map``, `src/rasteret/ingest/parquet_record_table.py:138-160`)."""
    df = spark.read.parquet(path)
    if column_map:
        for src, dst in column_map.items():
            df = df.withColumnRenamed(src, dst)
    if validate:
        missing = [c for c in REQUIRED_COLUMNS if c not in df.columns]
        if missing:
            raise ValueError(
                f"image table at {path} missing required columns {missing}; "
                f"present: {df.columns}"
            )
    if columns:
        df = df.select(*columns)
    return df
