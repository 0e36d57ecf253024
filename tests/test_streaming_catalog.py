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


def test_stateful_user_stats_cross_batch_matches_sequential_oracle(
    spark, tmp_path
):
    """applyInPandasWithState operator: per-user running count/sum/EWMA held
    in group state across TWO file micro-batches must equal a sequential
    fold over all events in ts order — the arbitrary-state recurrence the
    built-in window aggregations cannot express."""
    import os
    import time

    import numpy as np
    import pandas as pd

    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("user_id") < 40)
        .toPandas()
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    assert len(ev) > 50
    # split by time so arrival order == event-time order (EWMA well-defined)
    cut = ev["ts"].quantile(0.5)
    d = tmp_path / "stream"
    d.mkdir()
    now = time.time()
    for i, part in enumerate([ev[ev["ts"] <= cut], ev[ev["ts"] > cut]]):
        p = str(d / f"b{i}.parquet")
        spark.createDataFrame(part).coalesce(1).write.mode("overwrite").parquet(
            str(d / f"_w{i}")
        )
        import glob
        import shutil

        shutil.copy(glob.glob(str(d / f"_w{i}" / "*.parquet"))[0], p)
        os.utime(p, (now + 10 * i, now + 10 * i))
        shutil.rmtree(str(d / f"_w{i}"))

    # maxFilesPerTrigger=1 -> two genuine micro-batches, state carried across
    s = stream_ev.read_events_stream(spark, str(d), max_files_per_trigger=1)
    out = stream_ev.stateful_user_stats(s, alpha=0.3)
    stream_ev.run_to_memory(out, "user_stats", mode="update")
    got = spark.sql("SELECT * FROM user_stats").toPandas()
    # last update per user = the row with the highest running count
    final = got.sort_values("n").groupby("user_id").last()

    alpha = 0.3
    for uid, g in ev.groupby("user_id"):
        e = None
        for v in g.sort_values(["ts", "event_id"])["value"].astype(float):
            e = v if e is None else alpha * v + (1 - alpha) * e
        row = final.loc[uid]
        assert int(row["n"]) == len(g)
        np.testing.assert_allclose(row["sum_v"], g["value"].sum(), rtol=1e-12)
        np.testing.assert_allclose(row["ewma"], e, rtol=1e-12)
    # state genuinely crossed batches: users in both halves got two updates
    both = set(ev[ev["ts"] <= cut]["user_id"]) & set(ev[ev["ts"] > cut]["user_id"])
    assert both, "fixture must have users spanning both batches"
    counts = got.groupby("user_id").size()
    assert all(counts[u] == 2 for u in both)


def test_stateful_user_stats_null_values_do_not_poison(spark, tmp_path):
    """A NULL value counts toward n but is excluded from sum/EWMA — one bad
    event must not NaN the user's state forever."""
    import math

    import pandas as pd

    rows = pd.DataFrame([
        {"event_id": 1, "ts": pd.Timestamp("2024-01-01 00:00"), "user_id": 7,
         "event_type": "a", "value": 2.0, "props": ""},
        {"event_id": 2, "ts": pd.Timestamp("2024-01-01 01:00"), "user_id": 7,
         "event_type": "a", "value": None, "props": ""},
        {"event_id": 3, "ts": pd.Timestamp("2024-01-01 02:00"), "user_id": 7,
         "event_type": "a", "value": 4.0, "props": ""},
    ])
    d = str(tmp_path / "ev")
    spark.createDataFrame(rows, stream_ev.EVENTS_SCHEMA).coalesce(1).write.parquet(d)
    out = stream_ev.stateful_user_stats(
        stream_ev.read_events_stream(spark, d), alpha=0.5
    )
    stream_ev.run_to_memory(out, "null_stats", mode="update")
    got = spark.sql("SELECT * FROM null_stats").toPandas().iloc[0]
    assert int(got["n"]) == 3
    assert got["sum_v"] == 6.0 and not math.isnan(got["sum_v"])
    # fold over non-null values only: e = 0.5*4 + 0.5*2 = 3
    assert got["ewma"] == 3.0


def test_stateful_user_stats_deterministic_across_arrow_chunks(spark, tmp_path):
    """A group larger than the Arrow chunk size arrives as SEVERAL pandas
    chunks in arbitrary order — the fold must still follow global
    (ts, event_id) order (the chunks are concatenated before one sort)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(3)
    n = 400
    rows = pd.DataFrame({
        "event_id": np.arange(n),
        "ts": pd.Timestamp("2024-01-01") + pd.to_timedelta(
            rng.permutation(n), unit="m"
        ),
        "user_id": 1,
        "event_type": "a",
        "value": rng.normal(size=n).round(3),
        "props": "",
    })
    d = str(tmp_path / "ev")
    spark.createDataFrame(rows, stream_ev.EVENTS_SCHEMA).coalesce(1).write.parquet(d)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    try:
        out = stream_ev.stateful_user_stats(
            stream_ev.read_events_stream(spark, d), alpha=0.25
        )
        stream_ev.run_to_memory(out, "chunk_stats", mode="update")
        got = spark.sql("SELECT * FROM chunk_stats").toPandas().iloc[0]
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    e = None
    for v in rows.sort_values(["ts", "event_id"])["value"].astype(float):
        e = v if e is None else 0.25 * v + 0.75 * e
    assert int(got["n"]) == n
    np.testing.assert_allclose(got["ewma"], e, rtol=1e-12)


def test_incremental_read_since_snapshot(spark, tmp_path, images_pdf):
    """Iceberg-style incremental consumption over the hive layout: snapshot
    the file manifest, append, and read_since returns EXACTLY the appended
    rows (parity vs full-rebuild anti-join), at a scan planned over only
    the new files."""
    from rasteret_spark.sources import synthetic as syn

    path = str(tmp_path / "cat")
    manifest = str(tmp_path / "snap.manifest")
    df0 = spark.createDataFrame(images_pdf)
    catalog.write_images(df0, path)

    # before any snapshot: everything is "new"
    assert catalog.read_since(spark, path, None).count() == len(images_pdf)
    n_files = catalog.snapshot_catalog(spark, path, manifest)
    assert n_files >= 1
    # nothing appended yet: empty, with the table schema
    empty = catalog.read_since(spark, path, manifest)
    assert empty.count() == 0
    assert set(catalog.load_images(spark, path).columns) == set(empty.columns)

    appended = syn.images_table(10, start=len(images_pdf)).to_pandas()
    appended["transform"] = appended["transform"].map(list)
    catalog.write_images(
        spark.createDataFrame(appended, schema=df0.schema), path, mode="append"
    )

    inc = catalog.read_since(spark, path, manifest)
    got_ids = sorted(r["image_id"] for r in inc.select("image_id").collect())
    assert got_ids == sorted(appended["image_id"])
    # parity vs full-rebuild: full minus snapshot rows == incremental rows
    full_ids = {r["image_id"] for r in
                catalog.load_images(spark, path).select("image_id").collect()}
    assert full_ids == set(images_pdf["image_id"]) | set(got_ids)
    # partition columns survive the file-list scan (basePath)
    assert {"year", "month"} <= set(inc.columns)
    assert inc.filter(F.col("year").isNull()).count() == 0

    # advancing the snapshot converges to empty again
    catalog.snapshot_catalog(spark, path, manifest)
    assert catalog.read_since(spark, path, manifest).count() == 0
