"""Chip-server API: grid/stride/random request math vs a driver-side oracle,
t-step slicing, and end-to-end chip completeness (TorchGeo-adapter parity,
`/root/reference/src/rasteret/integrations/torchgeo.py:997-1236`)."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from rasteret_spark.operators import chips as ch


def _grid_oracle(bbox, size, xres, yres, stride):
    xmin, ymin, xmax, ymax = bbox
    cw, chh = size * xres, size * yres
    sx, sy = stride * xres, stride * yres
    n_x = max(math.ceil(((xmax - xmin) - cw) / sx) + 1, 1)
    n_y = max(math.ceil(((ymax - ymin) - chh) / sy) + 1, 1)
    out = []
    for j in range(n_y):
        for i in range(n_x):
            x0 = min(xmin + i * sx, max(xmax - cw, xmin))
            y1 = max(ymax - j * sy, min(ymin + chh, ymax))
            out.append((round(x0, 12), round(y1, 12)))
    return out


@pytest.mark.parametrize(
    "bbox,size,stride",
    [
        ((0.0, 0.0, 1.0, 1.0), 32, 32),    # exact-fit tiling
        ((0.0, 0.0, 1.0, 0.5), 32, 20),    # overlapping windows
        ((0.0, 0.0, 0.07, 0.07), 32, 32),  # non-fit: last chip clamps to edge
        ((0.0, 0.0, 0.01, 0.01), 32, 32),  # bbox smaller than one chip
    ],
)
def test_grid_requests_match_oracle(spark, bbox, size, stride):
    xres = 0.001
    got = (
        ch.chip_requests(spark, bbox, size, xres, stride=stride)
        .orderBy("chip_id")
        .toPandas()
    )
    want = _grid_oracle(bbox, size, xres, xres, stride)
    assert len(got) == len(want)
    for (x0, y1), (_, r) in zip(want, got.iterrows()):
        assert abs(r["chip_xmin"] - x0) < 1e-9
        assert abs(r["chip_ymax"] - y1) < 1e-9
        assert r["chip_w"] == size and r["chip_h"] == size
    # every chip stays inside the bbox (clamped, never overhanging)
    assert (got["chip_xmin"] >= bbox[0] - 1e-9).all()
    assert (got["chip_xmin"] + size * xres <= bbox[2] + size * xres + 1e-9).all()


def test_grid_default_stride_is_nonoverlapping(spark):
    got = ch.chip_requests(spark, (0.0, 0.0, 0.128, 0.128), 32, 0.001).toPandas()
    assert len(got) == 16  # 4x4 at stride=size
    xs = sorted(got["chip_xmin"].unique())
    assert np.allclose(np.diff(xs), 0.032)


def test_random_requests_deterministic_and_in_bounds(spark):
    bbox = (10.0, 40.0, 11.0, 41.0)
    a = ch.chip_requests(spark, bbox, 64, 0.001, random_n=50, seed=7).toPandas()
    b = ch.chip_requests(spark, bbox, 64, 0.001, random_n=50, seed=7).toPandas()
    c = ch.chip_requests(spark, bbox, 64, 0.001, random_n=50, seed=8).toPandas()
    pd.testing.assert_frame_equal(a, b)  # same seed, same chips
    assert not a["chip_xmin"].equals(c["chip_xmin"])  # seed actually matters
    assert len(a) == 50
    assert (a["chip_xmin"] >= 10.0).all()
    assert (a["chip_xmin"] + 64 * 0.001 <= 11.0 + 1e-9).all()
    assert (a["chip_ymax"] <= 41.0).all()
    assert (a["chip_ymax"] - 64 * 0.001 >= 40.0 - 1e-9).all()


def test_chip_requests_rejects_bad_input(spark):
    with pytest.raises(ValueError, match="degenerate bbox"):
        ch.chip_requests(spark, (1.0, 0.0, 0.0, 1.0), 32, 0.001)
    with pytest.raises(ValueError, match="stride"):
        ch.chip_requests(spark, (0.0, 0.0, 1.0, 1.0), 32, 0.001, stride=0)


def test_slice_time_steps_interval_and_step(spark):
    ts = pd.date_range("2024-01-01", periods=7, freq="D")
    cands = spark.createDataFrame(
        pd.DataFrame(
            {
                "chip_id": ["c0"] * 7,
                "image_id": [f"i{k}" for k in range(7)],
                "datetime": ts,
            }
        )
    )
    got = ch.slice_time_steps(cands, t_step=3).toPandas()
    assert sorted(got["image_id"]) == ["i0", "i3", "i6"]  # iloc[::3]
    got2 = ch.slice_time_steps(
        cands, t_start=ts[1], t_end=ts[5], t_step=2
    ).toPandas()
    # filter to i1..i5 first, THEN step: keep i1, i3, i5
    assert sorted(got2["image_id"]) == ["i1", "i3", "i5"]


def test_chip_serve_end_to_end_completeness(spark, images_pdf):
    """Chips from a query bbox; per chip the served image set must equal the
    driver oracle's bbox-overlap + t-interval + step selection (up to the
    depth cap), and t_index must follow datetime order."""
    bbox = (13.35, 52.448, 13.452, 52.55)
    chips_df = ch.chip_requests(spark, bbox, 32, 0.001, stride=35)
    img_light = spark.createDataFrame(
        images_pdf[["image_id", "datetime", "xmin", "ymin", "xmax", "ymax"]].rename(
            columns={c: f"img_{c}" for c in ["xmin", "ymin", "xmax", "ymax"]}
        )
    )
    payload = spark.createDataFrame(images_pdf[["image_id", "datetime", "bytes"]])
    t0 = images_pdf["datetime"].quantile(0.2)
    t1 = images_pdf["datetime"].quantile(0.9)
    got = ch.chip_serve(
        chips_df, img_light, payload, t_start=t0, t_end=t1, t_step=2, bands=(0,)
    ).toPandas()
    assert len(got) > 0
    assert (got["status"] == "ok").all()
    chips_pdf = chips_df.toPandas()
    dt_of = dict(zip(images_pdf["image_id"], images_pdf["datetime"]))
    for _, chip in chips_pdf.iterrows():
        cxmax = chip["chip_xmin"] + chip["chip_w"] * chip["chip_xres"]
        cymin = chip["chip_ymax"] - chip["chip_h"] * chip["chip_yres"]
        inside = images_pdf[
            (images_pdf["xmax"] >= chip["chip_xmin"]) & (images_pdf["xmin"] <= cxmax)
            & (images_pdf["ymax"] >= cymin) & (images_pdf["ymin"] <= chip["chip_ymax"])
            & (images_pdf["datetime"] >= t0) & (images_pdf["datetime"] <= t1)
        ].sort_values(["datetime", "image_id"])
        want = list(inside["image_id"])[::2]  # step slice after the filter
        assert len(want) <= 32, "fixture must stay under the depth cap here"
        g = got[got["chip_id"] == chip["chip_id"]].sort_values("t_index")
        assert list(g["image_id"]) == want
        dts = [dt_of[i] for i in g["image_id"]]
        assert dts == sorted(dts)
        assert all(len(v) == 32 * 32 for v in g["values"])
