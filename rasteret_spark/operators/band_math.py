"""Distributed band math over per-band pixel rows (NDVI-family indices).

The reference's flagship user workflow is band arithmetic on assembled
arrays — ``ndvi = (ds["B5"] - ds["B4"]) / (ds["B5"] + ds["B4"])`` on the
driver after ``get_xarray()`` (`examples/landsat_xarray.py:58`,
`notebooks/01_quickstart.ipynb`).  At 100 TB the index must be computed
WHERE the pixels are: these operators take the engine's per-band rows
(MOSAIC_SCHEMA / CHIP_STACK_SCHEMA shape: one row per chip x band with
``values array<double>``) and evaluate the index JVM-side with
``zip_with`` / ``aggregate`` — no Python UDF, no driver collect, and
exactly ONE shuffle (the band pivot groupBy; pixel arrays are shuffled
once, already decoded and chip-sized).

Null semantics: unfilled mosaic pixels are SQL nulls and propagate
through the arithmetic (null in either band -> null index pixel), and a
zero denominator yields null rather than an IEEE Inf/NaN — the
distributed analogue of xarray's NaN propagation.  Per-chip summary
stats (filled/mean/min/max) come from the same expressions so downstream
filters (e.g. "chips with mean NDVI > 0.3") never touch the arrays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F  # noqa: N812

GRID_COLS = ("chip_xmin", "chip_ymax", "chip_xres", "chip_yres",
             "chip_w", "chip_h", "grid_epsg")


def pivot_bands(
    per_band: DataFrame,
    value_col: str = "values",
    key_cols: tuple[str, ...] = ("chip_id",),
    carry_cols: tuple[str, ...] = GRID_COLS,
) -> DataFrame:
    """One row per chip with a ``bands map<int, array<double>>`` column.

    Single groupBy on the chip key — the only shuffle in any index
    computation; georeferencing columns ride along via ``first`` (they are
    constant within a chip by construction)."""
    aggs = [
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct(F.col("band"), F.col(value_col))))
        ).alias("bands")
    ]
    aggs += [F.first(c).alias(c) for c in carry_cols if c in per_band.columns]
    return per_band.groupBy(*key_cols).agg(*aggs)


def _nd_expr(a: Column, b: Column) -> Column:
    # (a-b)/(a+b), null where the denominator is 0 (or either input null)
    return F.zip_with(
        a, b, lambda x, y: (x - y) / F.nullif(x + y, F.lit(0.0))
    )


def _ratio_expr(a: Column, b: Column) -> Column:
    return F.zip_with(a, b, lambda x, y: x / F.nullif(y, F.lit(0.0)))


def _stats(col_name: str) -> list[Column]:
    vals = F.filter(F.col(col_name), lambda v: v.isNotNull())
    n = F.size(vals)
    mean = F.when(
        n > 0,
        F.aggregate(vals, F.lit(0.0), lambda acc, v: acc + v) / n,
    )
    return [
        n.alias(f"{col_name}_filled"),
        mean.alias(f"{col_name}_mean"),
        F.array_min(vals).alias(f"{col_name}_min"),
        F.array_max(vals).alias(f"{col_name}_max"),
    ]


def _apply_index(
    per_band: DataFrame,
    band_a: int,
    band_b: int,
    expr_fn,
    out_col: str,
    key_cols: tuple[str, ...],
    with_stats: bool,
) -> DataFrame:
    p = pivot_bands(per_band, key_cols=key_cols)
    idx = expr_fn(
        F.try_element_at("bands", F.lit(band_a)),
        F.try_element_at("bands", F.lit(band_b)),
    ).alias(out_col)
    carry = [c for c in p.columns if c != "bands"]
    out = p.select(*carry, idx)
    if with_stats:
        out = out.select("*", *_stats(out_col))
    return out


def normalized_difference(
    per_band: DataFrame,
    band_a: int,
    band_b: int,
    out_col: str = "nd",
    key_cols: tuple[str, ...] = ("chip_id",),
    with_stats: bool = True,
) -> DataFrame:
    """``(band_a - band_b) / (band_a + band_b)`` per pixel, per chip —
    NDVI/NDWI/NDSI-family.  Input: per-band rows (``chip_id, band,
    values`` + grid cols).  Output: one row per chip with the index array
    and (optionally) filled/mean/min/max summary columns."""
    return _apply_index(
        per_band, band_a, band_b, _nd_expr, out_col, key_cols, with_stats
    )


def band_ratio(
    per_band: DataFrame,
    band_a: int,
    band_b: int,
    out_col: str = "ratio",
    key_cols: tuple[str, ...] = ("chip_id",),
    with_stats: bool = True,
) -> DataFrame:
    """``band_a / band_b`` per pixel (simple-ratio indices)."""
    return _apply_index(
        per_band, band_a, band_b, _ratio_expr, out_col, key_cols, with_stats
    )


def linear_combination(
    per_band: DataFrame,
    weights: dict[int, float],
    bias: float = 0.0,
    out_col: str = "lc",
    key_cols: tuple[str, ...] = ("chip_id",),
    with_stats: bool = True,
) -> DataFrame:
    """``sum_i w_i * band_i + bias`` per pixel (tasseled-cap-style
    transforms).  Null in ANY weighted band nulls the output pixel."""
    if not weights:
        raise ValueError("weights must name at least one band")
    items = sorted(weights.items())
    p = pivot_bands(per_band, key_cols=key_cols)
    b0, w0 = items[0]
    acc = F.transform(
        F.try_element_at("bands", F.lit(b0)),
        lambda v: v * F.lit(w0) + F.lit(bias),
    )

    def _add_band(weight: float):
        # bind the weight via closure (a default arg would change the
        # lambda's arity, which PySpark introspects for HOFs)
        return lambda s, v: s + v * F.lit(weight)

    for b, w in items[1:]:
        acc = F.zip_with(acc, F.try_element_at("bands", F.lit(b)), _add_band(w))
    carry = [c for c in p.columns if c != "bands"]
    out = p.select(*carry, acc.alias(out_col))
    if with_stats:
        out = out.select("*", *_stats(out_col))
    return out


def temporal_composite(
    stack: DataFrame,
    stat: str = "median",
    value_col: str = "values",
    key_cols: tuple[str, ...] = ("chip_id", "band"),
    carry_cols: tuple[str, ...] = GRID_COLS,
    out_col: str = "composite",
) -> DataFrame:
    """Per-pixel reduction ACROSS TIME over chip-stack rows — the
    cloud-free-composite primitive (monthly median NDVI, max-value
    composites).  Input: CHIP_STACK-shaped rows (one row per chip x
    timestep x band, ``values array<double>``); output: one row per
    (chip, band) with the composited array plus ``n_t`` (timesteps seen).

    ``stat``: ``median`` (lower-interpolated to the mean of the two middle
    values on even counts, numpy semantics), ``mean``, ``min``, ``max`` or
    ``count`` (valid observations per pixel — data-density maps).  Null
    pixels are skipped per pixel, NOT per timestep: a pixel cloudy at t0
    still composites from t1..tn.  Pure Catalyst (nested higher-order
    functions), one shuffle, no Python."""
    if stat not in ("median", "mean", "min", "max", "count"):
        raise ValueError(f"unknown stat {stat!r}")
    g = stack.groupBy(*key_cols).agg(
        F.collect_list(value_col).alias("_t"),
        *[F.first(c).alias(c) for c in carry_cols
          if c in stack.columns and c not in key_cols],
    )

    def reduce_pixel(i: Column) -> Column:
        vals = F.filter(
            F.transform(F.col("_t"), lambda arr: F.get(arr, i)),
            lambda v: v.isNotNull(),
        )
        n = F.size(vals)
        if stat == "count":
            return n.cast("double")
        if stat == "min":
            return F.array_min(vals)
        if stat == "max":
            return F.array_max(vals)
        if stat == "mean":
            return F.when(
                n > 0, F.aggregate(vals, F.lit(0.0), lambda a, v: a + v) / n
            )
        s = F.array_sort(vals)
        lo = F.get(s, ((n - 1) / 2).cast("int"))
        hi = F.get(s, (n / 2).cast("int"))
        return F.when(n > 0, (lo + hi) / 2)

    n_px = F.size(F.get("_t", 0))
    # sequence(0, -1) would DESCEND, so empty pixel arrays need the guard
    comp = F.when(
        n_px > 0, F.transform(F.sequence(F.lit(0), n_px - 1), reduce_pixel)
    ).otherwise(F.expr("array()").cast("array<double>"))
    carry = [c for c in g.columns if c != "_t"]
    return g.select(
        *carry,
        F.size("_t").alias("n_t"),
        F.when(F.size("_t") > 0, comp).alias(out_col),
    )


def threshold_mask(
    indexed: DataFrame,
    index_col: str,
    lo: float | None = None,
    hi: float | None = None,
    out_col: str = "mask",
) -> DataFrame:
    """Boolean per-pixel mask ``lo <= v <= hi`` (null pixels -> null) plus a
    ``<out_col>_count`` of true pixels — e.g. "vegetated pixels per chip"."""
    if lo is None and hi is None:
        raise ValueError("need lo and/or hi")

    def pred(v: Column) -> Column:
        c = F.lit(True)
        if lo is not None:
            c = c & (v >= F.lit(lo))
        if hi is not None:
            c = c & (v <= F.lit(hi))
        return F.when(v.isNotNull(), c)

    # two projections so the predicate transform evaluates ONCE (Catalyst
    # does not CSE higher-order lambdas); the count reads the mask column
    masked = indexed.select(
        "*", F.transform(F.col(index_col), pred).alias(out_col)
    )
    return masked.select(
        "*",
        F.size(F.filter(F.col(out_col), lambda b: b)).alias(f"{out_col}_count"),
    )
