"""Dataset-wide per-band normalization stats: numpy parity, null
semantics, single-shuffle plan, and the bit-exact deterministic mode."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from rasteret_spark.operators import band_math as bm


def _rows():
    rng = np.random.default_rng(7)
    rows = []
    for j in range(17):
        for band in (0, 1):
            vals = rng.uniform(-50, 4000, size=96).round(3).tolist()
            # plant nulls
            for k in range(j % 5):
                vals[(j * 7 + k * 11) % len(vals)] = None
            rows.append(
                {"chip_id": f"gbs-{j:03d}", "band": band, "values": vals}
            )
    # a band-2 group that is entirely null
    rows.append({"chip_id": "gbs-000", "band": 2, "values": [None] * 8})
    # a NULL values ARRAY (quarantined decode shape) — must be ignored,
    # not poison the band's sums / counts
    rows.append({"chip_id": "gbs-dead", "band": 0, "values": None})
    return rows


@pytest.fixture(scope="module")
def stats_input(spark):
    df = spark.createDataFrame(
        pd.DataFrame(_rows()),
        schema="chip_id string, band int, values array<double>",
    )
    df.persist().count()
    return df


def test_matches_numpy(spark, stats_input):
    got = {r["band"]: r for r in bm.global_band_stats(stats_input).collect()}
    rows = _rows()
    for band in (0, 1):
        g = [r for r in rows if r["band"] == band and r["values"] is not None]
        flat = np.array(
            [v for r in g for v in r["values"] if v is not None], dtype="float64"
        )
        n_px = sum(len(r["values"]) for r in g)
        r = got[band]
        assert r["n_chips"] == len(g)
        assert r["n_px"] == n_px
        assert r["n_valid"] == flat.size
        assert r["mean"] == pytest.approx(flat.mean(), rel=1e-12)
        assert r["std"] == pytest.approx(flat.std(), rel=1e-9)
        assert r["vmin"] == flat.min() and r["vmax"] == flat.max()
    empty = got[2]
    assert empty["n_valid"] == 0 and empty["n_px"] == 8
    assert empty["mean"] is None and empty["std"] is None
    assert empty["vmin"] is None and empty["vmax"] is None


def test_deterministic_mode_is_bit_stable(spark, stats_input):
    a = bm.global_band_stats(stats_input, deterministic=True).collect()
    b = bm.global_band_stats(
        stats_input.repartition(13), deterministic=True
    ).collect()
    for ra, rb in zip(a, b):
        assert ra == rb  # bit equality, floats included
    # and it agrees with the scalable path to float tolerance
    c = {r["band"]: r for r in bm.global_band_stats(stats_input).collect()}
    for ra in a:
        rc = c[ra["band"]]
        for fcol in ("mean", "std", "vmin", "vmax"):
            if ra[fcol] is None:
                assert rc[fcol] is None
            else:
                assert math.isclose(ra[fcol], rc[fcol], rel_tol=1e-12)


def test_grouping_and_plan(spark, stats_input):
    # extra group col: per-split constants from the same pass
    with_split = stats_input.withColumn(
        "split", F.when(F.xxhash64("chip_id") % 2 == 0, "train").otherwise("val")
    )
    out = bm.global_band_stats(with_split, group_cols=("band", "split")).collect()
    assert {(r["band"], r["split"]) for r in out} >= {(0, "train"), (0, "val")}
    # totals across splits == ungrouped totals
    tot = {r["band"]: r for r in bm.global_band_stats(stats_input).collect()}
    for band in (0, 1):
        parts = [r for r in out if r["band"] == band]
        assert sum(r["n_valid"] for r in parts) == tot[band]["n_valid"]
    # single shuffle: exactly one Exchange in the plan (plus the final sort)
    plan = bm.global_band_stats(stats_input)._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_missing_columns_raise(spark, stats_input):
    with pytest.raises(ValueError, match="missing"):
        bm.global_band_stats(stats_input.drop("band"))
    with pytest.raises(ValueError, match="chip_id"):
        bm.global_band_stats(
            stats_input.drop("chip_id"), deterministic=True
        )
