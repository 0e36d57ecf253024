"""Streaming operators (memory-sink smoke) + partitioned catalog contract."""

import os

import pytest
from pyspark.sql import functions as F

from rasteret_spark.sources import catalog
from rasteret_spark.streaming import events as stream_ev

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """File-stream sources need a directory, not a single file."""
    import shutil

    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF}/events.parquet", d / "part-0.parquet")
    return str(d)


def test_windowed_counts_stream_matches_batch(spark, events_dir):
    s = stream_ev.read_events_stream(spark, events_dir)
    agg = stream_ev.windowed_counts(s, window="1 hour")
    stream_ev.run_to_memory(agg, "win_counts")
    got = spark.sql("SELECT * FROM win_counts").toPandas()

    batch = spark.read.parquet(f"{SF}/events.parquet")
    want = (
        batch.groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 1000).cast("bigint")).alias("sum_v1000"),
        )
        .toPandas()
    )
    # append mode only emits windows the 2h watermark has passed: windows
    # ending within 2h of the max event time are (correctly) withheld
    import pandas as pd

    max_ts = batch.agg(F.max("ts")).first()[0]
    cutoff = pd.Timestamp(max_ts) - pd.Timedelta(hours=3)
    w = want[want["window_start"] <= cutoff]
    g = got[got["window_start"] <= cutoff]
    assert 0 < len(want) - len(got) <= 4, "watermark should withhold only the tail"
    g = g.sort_values(["window_start", "event_type"]).reset_index(drop=True)
    w = w.sort_values(["window_start", "event_type"]).reset_index(drop=True)
    assert len(g) == len(w)
    assert (g["n"].to_numpy() == w["n"].to_numpy()).all()
    assert (g["sum_v1000"].to_numpy() == w["sum_v1000"].to_numpy()).all()


def test_session_windows_stream(spark, events_dir):
    s = stream_ev.read_events_stream(spark, events_dir)
    sess = stream_ev.session_windows(s, gap="30 minutes")
    stream_ev.run_to_memory(sess, "sessions")
    got = spark.sql("SELECT * FROM sessions").toPandas()
    assert len(got) > 0
    assert (got["n_events"] >= 1).all()
    assert (got["session_end"] > got["session_start"]).all()
    # every user's events are covered
    n_users = spark.read.parquet(f"{SF}/events.parquet").select("user_id").distinct().count()
    assert got["user_id"].nunique() == n_users


def test_catalog_roundtrip_partition_pruning(spark, tmp_path, images_pdf):
    df = spark.createDataFrame(images_pdf)
    path = str(tmp_path / "img_catalog")
    catalog.write_images(df, path)
    # hive layout exists
    years = [d for d in os.listdir(path) if d.startswith("year=")]
    assert len(years) >= 1
    months = [d for d in os.listdir(os.path.join(path, years[0])) if d.startswith("month=")]
    assert len(months) >= 2

    back = catalog.load_images(spark, path)
    assert back.count() == len(images_pdf)

    # partition pruning is visible in the physical plan
    pruned = back.filter(F.col("year") == int(years[0].split("=")[1]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or pruned.count() < len(images_pdf)

    # contract validation fires
    bad = df.drop("phash")
    catalog.write_images(bad, str(tmp_path / "bad"))
    with pytest.raises(ValueError, match="phash"):
        catalog.load_images(spark, str(tmp_path / "bad"))

    # column_map aliases a foreign schema onto the contract
    renamed = df.withColumnRenamed("image_id", "scene_id")
    catalog.write_images(renamed, str(tmp_path / "foreign"))
    ok = catalog.load_images(
        spark, str(tmp_path / "foreign"), column_map={"scene_id": "image_id"}
    )
    assert "image_id" in ok.columns


def test_geoparquet_export_stamps_geo_metadata(spark, images_pdf, tmp_path):
    import json

    import pyarrow.parquet as pq

    from rasteret_spark.sources import catalog as cat

    p = str(tmp_path / "geo_out")
    df = spark.createDataFrame(
        images_pdf[["image_id", "geometry", "xmin", "ymin", "xmax", "ymax"]]
    )
    cat.write_images_geoparquet(df, p)
    files = [f for f in os.listdir(p) if f.endswith(".parquet")]
    assert files
    total = 0
    for f in files:
        meta = pq.read_schema(os.path.join(p, f)).metadata
        assert b"geo" in meta
        geo = json.loads(meta[b"geo"])
        assert geo["primary_column"] == "geometry"
        assert geo["columns"]["geometry"]["encoding"] == "WKB"
        assert geo["columns"]["geometry"]["bbox"][0] <= images_pdf["xmin"].min()
        total += pq.read_metadata(os.path.join(p, f)).num_rows
    assert total == len(images_pdf)
    # still loadable by Spark as a plain parquet dataset
    assert spark.read.parquet(p).count() == len(images_pdf)


def test_most_common_epsg_mode_with_tiebreak(spark):
    from rasteret_spark.operators.raster_mosaic import most_common_epsg

    df = spark.createDataFrame(
        [(4326,), (4326,), (32633,), (32633,), (32610,)], ["epsg"]
    )
    # tie 4326 vs 32633 -> deterministic smallest wins
    assert most_common_epsg(df) == 4326
