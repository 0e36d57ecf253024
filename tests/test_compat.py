"""Compat layer: the xarray-surface shim and the torch map-style dataset.

Parity targets: the reference hands results to users as xarray objects
(`src/rasteret/core/raster_accessor.py:1328-1477`) and as a TorchGeo
dataset (`src/rasteret/integrations/torchgeo.py:292-299`).  Neither
library is in this container, so assemble.to_xarray falls back to
rasteret_spark.compat.xarraylike (same core surface) and ChipDataset
implements torch's duck-typed map-style protocol over a staged cache.
"""

import numpy as np
import pandas as pd
import pytest

from rasteret_spark.compat.torchdata import ChipDataset
from rasteret_spark.compat.xarraylike import DataArray, Dataset
from rasteret_spark.operators import assemble


# --- xarraylike ----------------------------------------------------------------
def _da():
    vals = np.arange(24, dtype=np.float64).reshape(2, 3, 4)
    return DataArray(
        vals, ("time", "y", "x"),
        coords={"time": np.array([10, 20]),
                "y": np.array([50.0, 49.0, 48.0]),   # descending, like rasters
                "x": np.array([1.0, 2.0, 3.0, 4.0])},
        attrs={"epsg": 4326},
    )


def test_dataarray_basic_surface():
    da = _da()
    assert da.shape == (2, 3, 4) and da.dims == ("time", "y", "x")
    assert da.attrs["epsg"] == 4326
    assert np.array_equal(np.asarray(da), da.values)


def test_isel_drops_scalar_dims_and_slices_coords():
    da = _da()
    s = da.isel(time=1)
    assert s.dims == ("y", "x") and s.shape == (3, 4)
    assert np.array_equal(s.values, da.values[1])
    s2 = da.isel(y=slice(0, 2), x=2)
    assert s2.dims == ("time", "y")
    assert np.array_equal(s2.coords["y"], [50.0, 49.0])


def test_sel_exact_nearest_and_range():
    da = _da()
    assert np.array_equal(da.sel(time=20).values, da.values[1])
    with pytest.raises(KeyError):
        da.sel(time=15)
    assert np.array_equal(da.sel(time=14, method="nearest").values, da.values[0])
    # slice over a DESCENDING coord
    sub = da.sel(y=slice(49.5, 48.0))
    assert np.array_equal(sub.coords["y"], [49.0, 48.0])
    near = da.sel(x=2.4, method="nearest")
    assert np.array_equal(near.values, da.values[:, :, 1])


def test_sel_one_sided_slices_follow_coord_order():
    """Real xarray keeps slice semantics in COORD order: on a descending
    coord, slice(None, 0) keeps the leading (larger) values."""
    da = DataArray(np.arange(4.0), ("y",), coords={"y": np.array([90.0, 60.0, 0.0, -90.0])})
    assert np.array_equal(da.sel(y=slice(None, 0)).coords["y"], [90.0, 60.0, 0.0])
    assert np.array_equal(da.sel(y=slice(60, None)).coords["y"], [60.0, 0.0, -90.0])
    asc = DataArray(np.arange(4.0), ("x",), coords={"x": np.array([0.0, 1.0, 2.0, 3.0])})
    assert np.array_equal(asc.sel(x=slice(None, 1.5)).coords["x"], [0.0, 1.0])
    assert np.array_equal(asc.sel(x=slice(2, None)).coords["x"], [2.0, 3.0])


def test_sel_nearest_on_datetime_object_coords():
    import datetime as dtm

    times = [dtm.datetime(2024, 1, 1), dtm.datetime(2024, 2, 1), dtm.datetime(2024, 3, 1)]
    da = DataArray(np.array([1.0, 2.0, 3.0]), ("time",),
                   coords={"time": np.array(times, dtype=object)})
    got = da.sel(time=dtm.datetime(2024, 2, 10), method="nearest")
    assert float(got) == 2.0
    got2 = da.sel(time=np.datetime64("2024-02-25"), method="nearest")
    assert float(got2) == 3.0


def test_reductions_and_arithmetic():
    da = _da()
    m = da.mean(dim="time")
    assert m.dims == ("y", "x")
    assert np.allclose(m.values, da.values.mean(axis=0))
    ndvi_ish = (da - 1.0) / (da + 1.0)
    assert np.allclose(ndvi_ish.values, (da.values - 1) / (da.values + 1))
    tot = (da + da).sum()
    assert tot == pytest.approx(2 * da.values.sum())
    other = DataArray(np.ones((2, 3, 4)), ("t2", "y", "x"))
    with pytest.raises(ValueError, match="different dims"):
        da + other


def test_dataset_container():
    da = _da()
    ds = Dataset({"red": da, "nir": da + 1}, attrs={"title": "t"})
    assert set(ds.keys()) == {"red", "nir"}
    assert "red" in ds and ds["nir"].values[0, 0, 0] == 1.0


def test_to_xarray_falls_back_to_shim():
    attrs = {"transform": (0.25, 0.0, 10.0, 0.0, -0.25, 50.0),
             "epsg": 4326, "crs_wkt": None, "chip_id": "c-1",
             "width": 4, "height": 3}
    tensor = np.arange(12, dtype=np.float32).reshape(3, 4)
    da = assemble.to_xarray(tensor, attrs)
    # whichever backend, the surface is identical
    assert tuple(da.dims) == ("y", "x")
    assert da.attrs["epsg"] == 4326
    assert np.array_equal(np.asarray(da), tensor)
    # y coords start at 49.875 (pixel centers below ymax=50, yres 0.25)
    assert float(da.sel(y=49.9, x=10.15, method="nearest")) == float(tensor[0, 0])
    got = da.sel(y=slice(50.0, 49.6))
    assert got.values.shape[0] >= 1


# --- torch map-style dataset ------------------------------------------------------
def _stack_rows():
    rows = []
    for t, (img, dt) in enumerate([("i1", "2024-01-01"), ("i2", "2024-02-01"),
                                   ("i3", "2024-03-01")]):
        for band in (0, 1):
            rows.append({
                "chip_id": "c-x", "t_index": t, "band": band,
                "image_id": img, "datetime": dt, "status": "ok",
                "chip_w": 4, "chip_h": 4,
                "chip_xmin": 0.0, "chip_ymax": 1.0,
                "chip_xres": 0.25, "chip_yres": 0.25,
                "grid_epsg": 4326,
                "values": [float(t * 100 + band * 10 + k) for k in range(16)],
                "capped": False,
            })
    return rows


def test_chip_dataset_stage_and_random_access(spark, tmp_path):
    rows = []
    for chip in ("c-a", "c-b", "c-c"):
        for r in _stack_rows():
            rows.append({**r, "chip_id": chip, "image_id": f"{chip}/{r['image_id']}"})
    df = spark.createDataFrame(pd.DataFrame(rows))
    ds = ChipDataset.stage(df, str(tmp_path / "chips"))
    assert len(ds) == 3
    assert ds.chip_ids == ["c-a", "c-b", "c-c"]  # deterministic order
    # random access out of order, like a shuffling DataLoader sampler
    for i in (2, 0, 1):
        sample = ds[i]
        assert sample["chip_id"] == ds.chip_ids[i]
        assert sample["image"].shape == (3, 2, 4, 4)
        assert sample["image"].dtype == np.float32
    # values match the streaming surface exactly
    (batch,) = list(assemble.chip_batches(df, batch_size=8))
    for i, (tensor, attrs) in enumerate(batch):
        assert np.allclose(ds[i]["image"], tensor.astype(np.float32))
        meta = ds.attrs(i)
        assert meta["chip_id"] == attrs["chip_id"]
        assert meta["epsg"] == attrs["epsg"]
        assert meta["times"] == [str(t) for t in attrs["times"]]
    with pytest.raises(IndexError):
        ds[3]


def test_chip_dataset_from_cache_reopens(spark, tmp_path):
    df = spark.createDataFrame(pd.DataFrame(_stack_rows()))
    staged = ChipDataset.stage(df, str(tmp_path / "c2"))
    reopened = ChipDataset.from_cache(str(tmp_path / "c2"))
    assert reopened.chip_ids == staged.chip_ids
    assert np.array_equal(reopened[0]["image"], staged[0]["image"])


def test_collection_to_torch_dataset_end_to_end(spark, tmp_path):
    """Facade drive: synthetic images -> Collection -> staged dataset ->
    random access -> to_xarray over a staged chip plane."""
    import rasteret_spark.sources.synthetic as syn
    from rasteret_spark.collection import Collection

    tbl = syn.images_table(12)
    coll = Collection(spark, spark.createDataFrame(tbl.to_pandas()))
    im = tbl.to_pandas().iloc[0]
    bbox = (float(im.xmin), float(im.ymin), float(im.xmax), float(im.ymax))
    ds = coll.to_torch_dataset(str(tmp_path / "tds"), bbox=bbox, size=16,
                               xres=(bbox[2] - bbox[0]) / 16, bands=(0,))
    assert len(ds) >= 1
    s0 = ds[0]
    assert s0["image"].ndim == 4 and s0["image"].shape[2:] == (16, 16)
    meta = ds.attrs(0)
    da = assemble.to_xarray(
        s0["image"][0, 0],
        {**meta, "transform": tuple(meta["transform"]), "width": 16, "height": 16})
    assert da.shape == (16, 16) and tuple(da.dims) == ("y", "x")
    assert np.isfinite(np.nanmean(np.asarray(da)))


def test_chip_dataset_works_with_a_dataloader_style_consumer(spark, tmp_path):
    """Emulate exactly what torch's map-style DataLoader does: len(), a
    shuffled sampler over range(len), __getitem__ per index, default-
    collate-style stacking of same-shaped arrays."""
    rows = []
    for chip in ("c-a", "c-b", "c-c", "c-d"):
        for r in _stack_rows():
            rows.append({**r, "chip_id": chip})
    df = spark.createDataFrame(pd.DataFrame(rows))
    ds = ChipDataset.stage(df, str(tmp_path / "c3"))
    rng = np.random.RandomState(0)
    order = rng.permutation(len(ds))
    batches = [order[i:i + 2] for i in range(0, len(order), 2)]
    seen = set()
    for idxs in batches:
        samples = [ds[int(i)] for i in idxs]
        stacked = np.stack([s["image"] for s in samples])  # default_collate
        assert stacked.shape == (len(idxs), 3, 2, 4, 4)
        seen.update(s["chip_id"] for s in samples)
    assert seen == {"c-a", "c-b", "c-c", "c-d"}