"""Temporal gap-fill kernel + distributed operator."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F  # noqa: N812

from rasteret_spark.operators.timeseries import fill_time_series, gap_fill


def _per_pixel_mirror(vals: np.ndarray, tsec: np.ndarray) -> np.ndarray:
    """Bisect-style per-pixel reference (same math as the truth module)."""
    T, P = vals.shape
    out = vals.copy()
    for p in range(P):
        vi = [k for k in range(T) if not np.isnan(vals[k, p])]
        for k in range(T):
            if not np.isnan(vals[k, p]):
                continue
            prev = max((j for j in vi if j < k), default=None)
            nxt = min((j for j in vi if j > k), default=None)
            if prev is not None and nxt is not None:
                tp, tn, tk = tsec[prev], tsec[nxt], tsec[k]
                vp, vn = vals[prev, p], vals[nxt, p]
                out[k, p] = vp if tn == tp else vp + (tk - tp) / (tn - tp) * (vn - vp)
            elif nxt is not None:
                out[k, p] = vals[nxt, p]
            elif prev is not None:
                out[k, p] = vals[prev, p]
    return out


def test_fill_matches_per_pixel_mirror_random():
    rng = np.random.default_rng(3)
    vals = rng.normal(size=(7, 40))
    vals[rng.random(vals.shape) < 0.4] = np.nan
    vals[:, 0] = np.nan  # an all-gap pixel stays NaN
    tsec = np.sort(rng.uniform(0, 1e6, size=7))
    got, fixed = fill_time_series(vals, tsec)
    want = _per_pixel_mirror(vals, tsec)
    assert np.array_equal(got, want, equal_nan=True)
    assert np.isnan(got[:, 0]).all()
    # valid inputs pass through bit-unchanged
    m = ~np.isnan(vals)
    assert np.array_equal(got[m], vals[m])
    assert fixed.sum() == (np.isnan(vals).sum() - 7)  # all but the dead pixel


def test_fill_edges_and_coincident_times():
    vals = np.array(
        [[np.nan, 10.0], [2.0, np.nan], [np.nan, 30.0], [4.0, np.nan]]
    )
    tsec = np.array([0.0, 100.0, 100.0, 300.0])  # t1 == t2 (coincident)
    got, fixed = fill_time_series(vals, tsec)
    assert got[0, 0] == 2.0           # leading edge copies next valid
    assert got[3, 1] == 30.0          # trailing edge copies prev valid
    assert got[2, 0] == 2.0           # d == 0 -> earlier sample
    # interior interp for pixel 1 at t=100 between (0, 10.0) and (100->?),
    # next valid is t=100 (row 2, 30.0): w = 1 -> 30.0
    assert got[1, 1] == 10.0 + (100.0 - 0.0) / (100.0 - 0.0) * (30.0 - 10.0)
    assert fixed[np.isnan(vals)].all()  # every gap had a neighbour
    assert not fixed[~np.isnan(vals)].any()  # valid samples never marked


def test_gap_fill_passes_quarantine_rows_through(spark):
    """A values=null row (corrupt-blob time slot) passes through unfilled;
    live rows in the same group still fill, and the CHIP_STACK ``filled``
    invariant is recomputed on output."""
    base = pd.Timestamp("2023-01-01")
    rows = [
        {"chip_id": "c", "band": 0, "t_index": 0, "image_id": "a",
         "datetime": base, "filled": 1, "values": [1.0, None]},
        {"chip_id": "c", "band": 0, "t_index": 1, "image_id": "b",
         "datetime": base + pd.Timedelta(days=1), "filled": 0, "values": None},
        {"chip_id": "c", "band": 0, "t_index": 2, "image_id": "c",
         "datetime": base + pd.Timedelta(days=2), "filled": 2,
         "values": [3.0, 4.0]},
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows),
        schema="chip_id string, band int, t_index int, image_id string, "
               "datetime timestamp, filled long, values array<double>",
    )
    out = gap_fill(df).toPandas().sort_values("t_index").reset_index(drop=True)
    assert out.loc[1, "values"] is None or (
        isinstance(out.loc[1, "values"], float) and np.isnan(out.loc[1, "values"])
    )
    assert pd.isna(out.loc[1, "n_missing"]) and out.loc[1, "n_filled"] == 0
    # pixel 1 at t0 fills from its only valid neighbour (t2's 4.0)
    assert out.loc[0, "values"][1] == 4.0
    # filled recomputed to match the filled values
    assert out.loc[0, "filled"] == 2 and out.loc[2, "filled"] == 2


def test_gap_fill_distributed(spark):
    rows = []
    base = pd.Timestamp("2023-01-01")
    series = {  # per timestep: pixel arrays with planned gaps
        0: [1.0, None, None],
        1: [None, 20.0, None],
        2: [3.0, None, None],
    }
    for k, vals in series.items():
        rows.append(
            {
                "chip_id": "c-1",
                "band": 0,
                "t_index": k,
                "image_id": f"img-{k}",
                "datetime": base + pd.Timedelta(days=k),
                "values": vals,
            }
        )
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = gap_fill(df).toPandas().sort_values("t_index").reset_index(drop=True)
    # pixel 0: valid at t0/t2, gap at t1 -> midpoint 2.0
    assert out.loc[1, "values"][0] == 2.0
    # pixel 1: valid only at t1 -> edges copy 20.0
    assert out.loc[0, "values"][1] == 20.0
    assert out.loc[2, "values"][1] == 20.0
    # pixel 2: never valid -> stays null everywhere (NaN after toPandas)
    assert all(np.isnan(float(out.loc[k, "values"][2])) for k in range(3))
    assert list(out["n_missing"]) == [2, 2, 2]
    # one fillable gap per timestep (the other gap is the dead pixel)
    assert list(out["n_filled"]) == [1, 1, 1]
    # row order / partitioning invariance
    out2 = (
        gap_fill(df.repartition(3).sortWithinPartitions(F.desc("t_index")))
        .toPandas().sort_values("t_index").reset_index(drop=True)
    )
    assert out2.equals(out)
