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


def _pixel_stat(tcol: Column, i: Column, stat: str) -> Column:
    """Reduce pixel ``i`` across a collected list of value arrays: the
    statistic over the valid observations at that slot (null if none;
    ``count`` is the valid-observation count as double)."""
    vals = F.filter(
        F.transform(tcol, lambda arr: F.get(arr, i)),
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


def _stat_matrix(mat, stat: str):
    """Per-slot statistic across a (T, N) float64 matrix with NaN nulls —
    the vectorized mirror of ``_pixel_stat`` (same fold order / sort
    semantics).  Returns a length-N float64 array with NaN where no valid
    observation exists."""
    import numpy as np

    from rasteret_spark.operators.arrow_kernels import total_order_key

    T, N = mat.shape
    valid = ~np.isnan(mat)
    n = valid.sum(axis=0)
    if stat == "count":
        return n.astype(np.float64)
    if T == 0:
        return np.full(N, np.nan)
    if stat == "mean":
        acc = np.zeros(N)
        for t in range(T):  # sequential fold in collected order
            acc = np.where(valid[t], acc + np.where(valid[t], mat[t], 0.0), acc)
        with np.errstate(invalid="ignore", divide="ignore"):
            return np.where(n > 0, acc / n, np.nan)
    # order statistics: total-order sort per slot, invalid keys after valid
    keys = np.where(valid, total_order_key(np.where(valid, mat, 0.0)),
                    np.uint64(0xFFFFFFFFFFFFFFFF))
    order = np.argsort(keys, axis=0, kind="stable")
    svals = np.take_along_axis(mat, order, axis=0)
    cols = np.arange(N)
    if stat == "min":
        return np.where(n > 0, svals[np.zeros(N, dtype=int), cols], np.nan)
    if stat == "max":
        return np.where(n > 0, svals[np.maximum(n - 1, 0), cols], np.nan)
    # median: ((n-1)/2, n/2) with the Catalyst int-division truncation
    lo = svals[np.maximum((n - 1) // 2, 0), cols]
    hi = svals[np.maximum(n // 2, 0), cols]
    return np.where(n > 0, (lo + hi) / 2, np.nan)


def _group_matrix(arrs) -> "tuple":
    """List of per-timestep pixel arrays (None entries allowed) -> (T, N)
    float64 matrix in list order + N (0 when undeterminable)."""
    import numpy as np

    rows = [None if a is None else np.asarray(a, dtype=np.float64) for a in arrs]
    n_px = next((r.size for r in rows if r is not None), 0)
    mat = np.full((len(rows), n_px), np.nan)
    for t, r in enumerate(rows):
        if r is None:
            continue  # null array: every slot null (get(null, i) -> null)
        if r.size >= n_px:
            mat[t] = r[:n_px]
        else:  # short array: slots past its end are null
            mat[t, : r.size] = r
    return mat, n_px


def temporal_composite(
    stack: DataFrame,
    stat: str = "median",
    value_col: str = "values",
    key_cols: tuple[str, ...] = ("chip_id", "band"),
    carry_cols: tuple[str, ...] = GRID_COLS,
    out_col: str = "composite",
    impl: str = "arrow",
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
    carry = [c for c in g.columns if c != "_t"]
    if impl == "arrow":
        # same single-shuffle plan; the per-pixel reduction runs as one
        # vectorized numpy pass per group row instead of interpreted
        # Catalyst lambdas (bit-identical: see _stat_matrix)
        import pandas as pd

        from rasteret_spark.operators.arrow_kernels import _out_schema
        from rasteret_spark.operators.util import nanlist

        schema = _out_schema(
            g.drop("_t"), [("n_t", "int"), (out_col, "array<double>")]
        )

        def run(batches):
            import numpy as np

            for pdf in batches:
                n_t, comps = [], []
                for arrs in pdf["_t"]:
                    n_t.append(len(arrs))
                    mat, n_px = _group_matrix(arrs)
                    if len(arrs) == 0:
                        comps.append(None)
                    elif n_px == 0:
                        comps.append([])
                    else:
                        comps.append(nanlist(_stat_matrix(mat, stat)))
                out = pdf.drop(columns=["_t"])
                out["n_t"] = pd.array(n_t, dtype="int32")
                out[out_col] = comps
                yield out

        return g.mapInPandas(run, schema=schema)

    def reduce_pixel(i: Column) -> Column:
        return _pixel_stat(F.col("_t"), i, stat)

    n_px = F.size(F.get("_t", 0))
    # sequence(0, -1) would DESCEND, so empty pixel arrays need the guard
    comp = F.when(
        n_px > 0, F.transform(F.sequence(F.lit(0), n_px - 1), reduce_pixel)
    ).otherwise(F.expr("array()").cast("array<double>"))
    return g.select(
        *carry,
        F.size("_t").alias("n_t"),
        F.when(F.size("_t") > 0, comp).alias(out_col),
    )


def change_detect(
    stack: DataFrame,
    split_ts,
    stat: str = "median",
    threshold: float | None = None,
    value_col: str = "values",
    time_col: str = "datetime",
    key_cols: tuple[str, ...] = ("chip_id", "band"),
    carry_cols: tuple[str, ...] = GRID_COLS,
    out_col: str = "delta",
    impl: str = "arrow",
) -> DataFrame:
    """Two-epoch per-pixel change detection over chip-stack rows: composite
    the timesteps BEFORE ``split_ts`` and the timesteps AT/AFTER it with the
    same statistic, and emit ``after - before`` per pixel — the
    deforestation/new-construction screen (median-vs-median deltas are
    robust to single cloudy scenes).

    Input: CHIP_STACK-shaped rows.  Output: one row per ``key_cols`` with
    ``n_before``/``n_after`` (timesteps per epoch), the ``out_col`` delta
    array (null where either epoch has no valid observation for that
    pixel), ``<out_col>_valid``, and — when ``threshold`` is given —
    ``<out_col>_changed`` (pixels with ``|delta| > threshold``).

    ONE shuffle: both epochs aggregate in the same groupBy via conditional
    collect_lists (no self-join of composites), and the per-pixel reduction
    is pure Catalyst (`_pixel_stat`), so the plan has no Python nodes.
    ``stat="count"`` deltas observation DENSITY (data-coverage drift)."""
    if stat not in ("median", "mean", "min", "max", "count"):
        raise ValueError(f"unknown stat {stat!r}")
    for c in (value_col, time_col):
        if c not in stack.columns:
            raise ValueError(f"change_detect needs column {c!r}")
    split = F.lit(split_ts).cast("timestamp")
    g = stack.groupBy(*key_cols).agg(
        F.collect_list(
            F.when(F.col(time_col) < split, F.col(value_col))
        ).alias("_a"),
        F.collect_list(
            F.when(F.col(time_col) >= split, F.col(value_col))
        ).alias("_b"),
        *[F.first(c).alias(c) for c in carry_cols
          if c in stack.columns and c not in key_cols],
    )

    if impl == "arrow":
        import pandas as pd

        from rasteret_spark.operators.arrow_kernels import _out_schema
        from rasteret_spark.operators.util import nanlist

        extra = [("n_before", "int"), ("n_after", "int"),
                 (out_col, "array<double>"), (f"{out_col}_valid", "int")]
        if threshold is not None:
            extra.append((f"{out_col}_changed", "int"))
        schema = _out_schema(g.drop("_a", "_b"), extra)
        thr = None if threshold is None else float(threshold)

        def run(batches):
            import numpy as np

            for pdf in batches:
                cols: dict[str, list] = {n: [] for n, _ in extra}
                for arrs_a, arrs_b in zip(pdf["_a"], pdf["_b"]):
                    cols["n_before"].append(len(arrs_a))
                    cols["n_after"].append(len(arrs_b))
                    first = next(
                        (np.asarray(a) for a in list(arrs_a) + list(arrs_b)
                         if a is not None),
                        None,
                    )
                    n_px = 0 if first is None else first.size
                    if n_px <= 0:
                        cols[out_col].append([])
                        cols[f"{out_col}_valid"].append(0)
                        if thr is not None:
                            cols[f"{out_col}_changed"].append(0)
                        continue
                    mat_a, _ = _group_matrix(list(arrs_a)[: len(arrs_a)])
                    mat_b, _ = _group_matrix(list(arrs_b)[: len(arrs_b)])
                    # both matrices sized by the SHARED n_px (first array of
                    # either epoch), mirroring get(arr, i) null semantics
                    def sized(mat):
                        out = np.full((mat.shape[0], n_px), np.nan)
                        m = min(mat.shape[1], n_px)
                        out[:, :m] = mat[:, :m]
                        return out

                    delta = _stat_matrix(sized(mat_b), stat) - _stat_matrix(
                        sized(mat_a), stat
                    )
                    cols[out_col].append(nanlist(delta))
                    fin = ~np.isnan(delta)
                    cols[f"{out_col}_valid"].append(int(fin.sum()))
                    if thr is not None:
                        with np.errstate(invalid="ignore"):
                            cols[f"{out_col}_changed"].append(
                                int((np.abs(delta[fin]) > thr).sum())
                            )
                out = pdf.drop(columns=["_a", "_b"])
                for n, t in extra:
                    out[n] = (
                        pd.array(cols[n], dtype="int32")
                        if t == "int"
                        else cols[n]
                    )
                yield out

        return g.mapInPandas(run, schema=schema)

    def px(i: Column) -> Column:
        return _pixel_stat(F.col("_b"), i, stat) - _pixel_stat(
            F.col("_a"), i, stat
        )

    # pixel count from whichever epoch has rows (arrays are chip-sized)
    n_px = F.size(F.coalesce(F.get("_a", 0), F.get("_b", 0)))
    delta = F.when(
        n_px > 0, F.transform(F.sequence(F.lit(0), n_px - 1), px)
    ).otherwise(F.expr("array()").cast("array<double>"))
    carry = [c for c in g.columns if c not in ("_a", "_b")]
    out = g.select(
        *carry,
        F.size("_a").alias("n_before"),
        F.size("_b").alias("n_after"),
        delta.alias(out_col),
    )
    # separate projection so the delta transform evaluates once (Catalyst
    # does not collapse projects that would duplicate a non-cheap expr)
    stats = [
        F.size(
            F.filter(F.col(out_col), lambda v: v.isNotNull())
        ).alias(f"{out_col}_valid"),
    ]
    if threshold is not None:
        stats.append(
            F.size(
                F.filter(
                    F.col(out_col),
                    lambda v: F.abs(v) > F.lit(float(threshold)),
                )
            ).alias(f"{out_col}_changed")
        )
    return out.select("*", *stats)


def temporal_trend(
    stack: DataFrame,
    value_col: str = "values",
    time_col: str = "datetime",
    key_cols: tuple[str, ...] = ("chip_id", "band"),
    tie_cols: tuple[str, ...] = ("image_id",),
    carry_cols: tuple[str, ...] = GRID_COLS,
    per_seconds: float = 86400.0,
    impl: str = "arrow",
) -> DataFrame:
    """Per-pixel least-squares temporal trend over chip-stack rows: for
    every pixel, the OLS slope and intercept of ``value ~ time`` across the
    valid observations — the greening/browning/drift screen (NDVI trend,
    sensor drift detection).  Time is measured in units of ``per_seconds``
    (default days) from the group's FIRST timestep, so intercepts are the
    fitted value at the earliest observation.

    Output: one row per ``key_cols`` with ``n_t`` (collected timesteps),
    a ``slope`` array (null where fewer than two distinct-time valid
    observations exist) and an ``intercept`` array (null exactly where
    slope is).

    ONE shuffle (the groupBy); the per-pixel fold is a pure Catalyst
    ``aggregate`` over a DETERMINISTICALLY ordered observation array —
    ``array_sort`` on (time, tie_cols, values) structs — so float sums are
    reproducible and independent oracles can mirror them bit-exactly."""
    for c in (value_col, time_col):
        if c not in stack.columns:
            raise ValueError(f"temporal_trend needs column {c!r}")
    ties = [c for c in tie_cols if c in stack.columns]
    obs = F.array_sort(
        F.collect_list(
            F.when(
                F.col(value_col).isNotNull(),
                F.struct(
                    F.col(time_col).alias("t"),
                    *[F.col(c).alias(f"_k{j}") for j, c in enumerate(ties)],
                    F.col(value_col).alias("v"),
                ),
            )
        )
    )
    g = stack.groupBy(*key_cols).agg(
        obs.alias("_obs"),
        *[F.first(c).alias(c) for c in carry_cols
          if c in stack.columns and c not in key_cols],
    )
    if impl == "arrow":
        import pandas as pd

        from rasteret_spark.operators.arrow_kernels import _out_schema
        from rasteret_spark.operators.util import nanlist

        schema = _out_schema(
            g.drop("_obs"),
            [("n_t", "int"), ("slope", "array<double>"),
             ("intercept", "array<double>")],
        )
        per_s = float(per_seconds)

        def _ts_seconds(ts) -> float:
            # mirror Catalyst cast(timestamp as double): whole microseconds
            # divided by 1e6 as ONE double division
            return (pd.Timestamp(ts).value // 1000) / 1000000.0

        def run(batches):
            import numpy as np

            for pdf in batches:
                n_t, slopes, intercepts = [], [], []
                for obs in pdf["_obs"]:
                    n_t.append(len(obs))
                    if len(obs) == 0:
                        slopes.append(None)
                        intercepts.append(None)
                        continue
                    first_v = obs[0]["v"]
                    n_px = 0 if first_v is None else len(first_v)
                    mat, _ = _group_matrix([e["v"] for e in obs])
                    if mat.shape[1] != n_px:  # first v null: every get null
                        mat = np.full((len(obs), n_px), np.nan)
                    t0 = _ts_seconds(obs[0]["t"])
                    tdays = np.array(
                        [(_ts_seconds(e["t"]) - t0) / per_s for e in obs]
                    )
                    n = np.zeros(n_px); st = np.zeros(n_px)
                    sv = np.zeros(n_px); stt = np.zeros(n_px)
                    stv = np.zeros(n_px)
                    for k in range(len(obs)):  # time-major fold, T order
                        v = mat[k]
                        ok = ~np.isnan(v)
                        t = tdays[k]
                        n = np.where(ok, n + 1.0, n)
                        st = np.where(ok, st + t, st)
                        sv = np.where(ok, sv + np.where(ok, v, 0.0), sv)
                        stt = np.where(ok, stt + t * t, stt)
                        stv = np.where(ok, stv + t * np.where(ok, v, 0.0), stv)
                    den = n * stt - st * st
                    with np.errstate(invalid="ignore", divide="ignore"):
                        slope = np.where(
                            den != 0.0, (n * stv - st * sv) / den, np.nan
                        )
                        intercept = (sv - slope * st) / n
                    slopes.append(nanlist(slope))
                    intercepts.append(nanlist(intercept))
                out = pdf.drop(columns=["_obs"])
                out["n_t"] = pd.array(n_t, dtype="int32")
                out["slope"] = slopes
                out["intercept"] = intercepts
                yield out

        return g.mapInPandas(run, schema=schema)

    first = F.try_element_at(F.col("_obs"), F.lit(1))
    t0 = first["t"].cast("double")
    zero = F.lit(0.0)
    # empty groups (every values array null) have no first element; clamp
    # so array_repeat never sees a null/negative count
    n_px = F.greatest(
        F.lit(0), F.coalesce(F.size(first["v"]), F.lit(0))
    )

    # time-major folds: five array accumulators updated once per timestep
    # with a vectorized zip_with — per pixel the add sequence is identical
    # to a per-pixel loop (same T order), so sums stay bit-reproducible,
    # but Catalyst never allocates a per-pixel struct accumulator
    def fold(update) -> Column:
        return F.aggregate(
            F.col("_obs"),
            F.array_repeat(zero, n_px),
            lambda acc, e: F.zip_with(
                acc, e["v"], lambda a, v: update(
                    a, v, (e["t"].cast("double") - t0)
                    / F.lit(float(per_seconds)),
                )
            ),
        )

    def valid_add(term):
        return lambda a, v, t: F.when(v.isNotNull(), a + term(v, t)).otherwise(a)

    sums = {
        "n": fold(valid_add(lambda v, t: F.lit(1.0))),
        "st": fold(valid_add(lambda v, t: t)),
        "sv": fold(valid_add(lambda v, t: v)),
        "stt": fold(valid_add(lambda v, t: t * t)),
        "stv": fold(valid_add(lambda v, t: t * v)),
    }
    carry = [c for c in g.columns if c != "_obs"]
    folded = g.select(
        *carry,
        F.size("_obs").alias("n_t"),
        *[e.alias(f"_{k}") for k, e in sums.items()],
    )
    i = F.sequence(F.lit(0), F.size("_n") - 1)

    def at(col: str, j: Column) -> Column:
        return F.get(F.col(col), j)

    def fit(j: Column) -> Column:
        n, st, sv = at("_n", j), at("_st", j), at("_sv", j)
        stt, stv = at("_stt", j), at("_stv", j)
        den = n * stt - st * st
        slope = F.when(den != zero, (n * stv - st * sv) / den)
        return F.struct(
            slope.alias("m"), ((sv - slope * st) / n).alias("b")
        )

    fits = F.when(F.col("n_t") > 0, F.transform(i, fit))
    return folded.select(
        *carry, "n_t", fits.alias("_fit")
    ).select(
        *carry, "n_t",
        F.transform("_fit", lambda s: s["m"]).alias("slope"),
        F.transform("_fit", lambda s: s["b"]).alias("intercept"),
    )


def chip_stats(
    per_band: DataFrame,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75),
    value_col: str = "values",
    impl: str = "arrow",
) -> DataFrame:
    """Per-chip radiometric QA: exact linear-interpolated quantiles, value
    range, null fraction and saturated-pixel count over one chip band's
    pixel array — the chip-quality screen (drop cloudy/flat/clipped chips
    before they reach a training set).

    ZERO shuffles: every statistic is a Catalyst expression over the row's
    own array (sort + index math), so the pass pipelines into whatever
    produced the rows.  Quantiles use the linear-interpolation convention
    ``v[lo] + (v[hi] - v[lo]) * (p*(n-1) - lo)`` over the ascending valid
    pixels — numpy's default — emitted as ``q25`` for p=0.25 etc.;
    ``at_max_px`` counts pixels equal to the chip maximum (saturation /
    clipping indicator); ``null_frac`` is nodata coverage."""
    if value_col not in per_band.columns:
        raise ValueError(f"chip_stats needs column {value_col!r}")
    for p in probs:
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"quantile prob {p} outside [0, 1]")
    if impl == "arrow":
        import math

        import pandas as pd

        from rasteret_spark.operators.arrow_kernels import (
            _out_schema,
            sort_doubles,
        )

        qnames = [f"q{int(round(p * 100)):02d}" for p in probs]
        extra = (
            [("n_valid", "int"), ("null_frac", "double"), ("vmin", "double"),
             ("vmax", "double"), ("at_max_px", "int")]
            + [(qn, "double") for qn in qnames]
        )
        schema = _out_schema(per_band, extra)
        pvals = [float(p) for p in probs]

        def run(batches):
            import numpy as np

            for pdf in batches:
                cols: dict[str, list] = {n: [] for n, _ in extra}
                for cell in pdf[value_col]:
                    if cell is None or (
                        isinstance(cell, float) and np.isnan(cell)
                    ):
                        for n_, _t in extra:
                            cols[n_].append(None)
                        continue
                    arr = np.asarray(cell, dtype=np.float64)
                    s = sort_doubles(arr[~np.isnan(arr)])
                    n = int(s.size)
                    n_px = int(arr.size)
                    cols["n_valid"].append(n)
                    cols["null_frac"].append(
                        float(n_px - n) / float(n_px) if n_px > 0 else None
                    )
                    cols["vmin"].append(float(s[0]) if n else None)
                    vmax = float(s[-1]) if n else None
                    cols["vmax"].append(vmax)
                    if vmax is None:
                        cols["at_max_px"].append(0)
                    else:
                        with np.errstate(invalid="ignore"):
                            cols["at_max_px"].append(int((arr == vmax).sum()))
                    for p, qn in zip(pvals, qnames):
                        if n == 0:
                            cols[qn].append(None)
                            continue
                        idx = p * float(n - 1)
                        lo = int(math.floor(idx))
                        hi = int(math.ceil(idx))
                        vlo, vhi = float(s[lo]), float(s[hi])
                        cols[qn].append(vlo + (vhi - vlo) * (idx - float(lo)))
                out = pdf.copy()
                for n_, t in extra:
                    out[n_] = (
                        pd.array(cols[n_], dtype="Int32")
                        if t == "int"
                        else cols[n_]
                    )
                yield out

        return per_band.mapInPandas(run, schema=schema)
    # stage the sorted valid pixels ONCE: Catalyst does not CSE
    # lambda-bearing expressions, so inlining the sort into every statistic
    # re-sorts per output column — and re-sorts PER ELEMENT inside the
    # at_max_px filter lambda (O(N^2 log N) per chip).  A separate
    # projection pins a single sort per row; CollapseProject keeps it
    # (non-cheap expression, many references).
    sorted_col = "_cs_sorted"
    staged = per_band.select(
        "*",
        F.array_sort(
            F.filter(F.col(value_col), lambda v: v.isNotNull())
        ).alias(sorted_col),
    )
    vals = F.col(sorted_col)
    n = F.size(vals)
    n_px = F.size(F.col(value_col))
    vmax = F.try_element_at(vals, F.lit(-1))
    cols = [
        n.alias("n_valid"),
        F.when(
            n_px > 0, (n_px - n).cast("double") / n_px.cast("double")
        ).alias("null_frac"),
        F.try_element_at(vals, F.lit(1)).alias("vmin"),
        vmax.alias("vmax"),
        F.size(
            F.filter(F.col(value_col), lambda v: v == vmax)
        ).alias("at_max_px"),
    ]
    for p in probs:
        idx = F.lit(float(p)) * (n - 1).cast("double")
        lo = F.floor(idx).cast("int")
        hi = F.ceil(idx).cast("int")
        vlo = F.get(vals, lo)
        vhi = F.get(vals, hi)
        q = F.when(n > 0, vlo + (vhi - vlo) * (idx - lo.cast("double")))
        cols.append(q.alias(f"q{int(round(p * 100)):02d}"))
    return staged.select("*", *cols).drop(sorted_col)


def qa_mask(
    per_band: DataFrame,
    data_band: int = 0,
    qa_band: int = 1,
    bit: int = 1,
    key_cols: tuple[str, ...] = ("chip_id",),
    out_col: str = "masked",
) -> DataFrame:
    """Bitmask QA screening — the Landsat/Sentinel cloud-mask workflow
    (QA_PIXEL / SCL band interpreted bit-wise, flagged pixels nulled out of
    the data band before any statistic or training chip is cut).  The
    reference reads QA bands as ordinary assets and leaves masking to
    driver-side xarray (`examples/landsat_xarray.py`); at 100 TB the mask
    must be applied WHERE the pixels are.

    Takes per-band pixel rows (one row per chip x band), pivots once on the
    chip key (the ONLY shuffle), decodes ``bit`` of the integer-coded QA
    pixels (``floor`` -> int64 -> shift/AND, matching numpy's arithmetic
    shift for negatives) and nulls every data pixel whose QA pixel is
    flagged OR missing.  Adds:

    - ``qa_flag   array<boolean>`` — true where the bit is set (null where
      the QA pixel itself is nodata),
    - ``<out_col> array<double>``  — the data band with flagged/unknown
      pixels nulled,
    - ``qa_valid`` / ``qa_flagged`` / ``kept_px`` counts.

    Pure Catalyst after the pivot: no Python nodes, no second shuffle."""
    if not 0 <= bit <= 62:
        raise ValueError(f"qa bit {bit} outside [0, 62]")
    p = pivot_bands(per_band, key_cols=key_cols)
    data = F.try_element_at("bands", F.lit(data_band))
    qa = F.try_element_at("bands", F.lit(qa_band))
    flag = F.transform(
        qa,
        lambda v: F.when(
            v.isNotNull(),
            F.shiftright(F.floor(v).cast("long"), bit).bitwiseAND(F.lit(1))
            == F.lit(1),
        ),
    )
    carry = [c for c in p.columns if c != "bands"]
    # keep a pixel only when its QA pixel is PRESENT and NOT flagged: an
    # unknown QA pixel is treated as flagged (conservative, the convention
    # cloud-optimized pipelines use).  m == False is null-safe here because
    # a null m makes the whole condition null -> when() yields null.
    staged = p.select(
        *carry,
        flag.alias("qa_flag"),
        F.zip_with(
            data,
            flag,
            lambda v, m: F.when(m == F.lit(False), v),
        ).alias(out_col),
    )
    # second projection so the qa_flag/masked lambdas evaluate once
    # (Catalyst does not CSE higher-order lambdas)
    return staged.select(
        "*",
        F.size(
            F.filter(F.col("qa_flag"), lambda b: b.isNotNull())
        ).alias("qa_valid"),
        F.size(F.filter(F.col("qa_flag"), lambda b: b)).alias("qa_flagged"),
        F.size(
            F.filter(F.col(out_col), lambda v: v.isNotNull())
        ).alias("kept_px"),
    )


def stretch(
    per_band: DataFrame,
    p_lo: float = 0.02,
    p_hi: float = 0.98,
    value_col: str = "values",
    out_col: str = "stretched",
) -> DataFrame:
    """Robust percentile contrast stretch — the training-chip normalization
    step (clip at the p2/p98 pixel quantiles, rescale to [0, 1]) that every
    EO ML pipeline applies before tensors leave the loader; the reference
    leaves it to torchvision transforms driver-side
    (`src/rasteret/integrations/torchgeo.py:292-299`).

    ZERO shuffles: the quantile cut points use the same linear-interpolation
    expression tree as :func:`chip_stats` over the row's own sorted valid
    pixels, and the rescale is ``clamp((v - lo) / (hi - lo), 0, 1)`` per
    pixel (``hi == lo`` -> flat chip -> 0.0).  Adds ``cut_lo`` / ``cut_hi``,
    the stretched array, and ``clip_lo_px`` / ``clip_hi_px`` counts so a
    QA filter can drop chips that clipped too much signal."""
    if not 0.0 <= p_lo <= p_hi <= 1.0:
        raise ValueError(f"need 0 <= p_lo <= p_hi <= 1, got {p_lo}, {p_hi}")

    def _quant(vals: Column, n: Column, p: float) -> Column:
        idx = F.lit(float(p)) * (n - 1).cast("double")
        lo = F.floor(idx).cast("int")
        vlo = F.get(vals, lo)
        vhi = F.get(vals, F.ceil(idx).cast("int"))
        return F.when(n > 0, vlo + (vhi - vlo) * (idx - lo.cast("double")))

    sorted_alias = f"_{out_col}_sorted"
    staged = per_band.select(
        "*",
        F.array_sort(
            F.filter(F.col(value_col), lambda v: v.isNotNull())
        ).alias(sorted_alias),
    )
    n = F.size(F.col(sorted_alias))
    cut = staged.select(
        "*",
        _quant(F.col(sorted_alias), n, p_lo).alias("cut_lo"),
        _quant(F.col(sorted_alias), n, p_hi).alias("cut_hi"),
    ).drop(sorted_alias)
    lo_c, hi_c = F.col("cut_lo"), F.col("cut_hi")
    scaled = F.transform(
        F.col(value_col),
        lambda v: F.when(
            v.isNotNull(),
            F.when(
                hi_c > lo_c,
                F.least(
                    F.greatest((v - lo_c) / (hi_c - lo_c), F.lit(0.0)),
                    F.lit(1.0),
                ),
            ).otherwise(F.lit(0.0)),
        ),
    )
    out = cut.select("*", scaled.alias(out_col))
    return out.select(
        "*",
        F.size(
            F.filter(F.col(value_col), lambda v: v < lo_c)
        ).alias("clip_lo_px"),
        F.size(
            F.filter(F.col(value_col), lambda v: v > hi_c)
        ).alias("clip_hi_px"),
    )


def chip_histogram(
    per_band: DataFrame,
    lo: float,
    hi: float,
    n_bins: int = 8,
    value_col: str = "values",
    prefix: str = "h",
) -> DataFrame:
    """Per-chip fixed-bin histogram as a ZERO-shuffle Catalyst projection —
    the distribution fingerprint used for dataset balance reports, domain
    -shift detection between acquisition batches, and histogram-matching
    prep.  Bin k (columns ``<prefix>0 .. <prefix>{n_bins-1}``) counts valid
    pixels with ``clamp(floor((v - lo) / width), 0, n_bins - 1) == k`` —
    out-of-range pixels land in the edge bins so every valid pixel is
    counted exactly once (the numpy.histogram edge convention for clipped
    data)."""
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    if not 1 <= n_bins <= 64:
        raise ValueError(f"n_bins {n_bins} outside [1, 64]")
    width = (hi - lo) / float(n_bins)

    def _bin(v: Column) -> Column:
        raw = F.floor((v - F.lit(float(lo))) / F.lit(width))
        return F.least(
            F.greatest(raw, F.lit(0).cast("long")),
            F.lit(n_bins - 1).cast("long"),
        )

    def _count_bin(k: int) -> Column:
        # closure factory, NOT a default-arg lambda: pyspark dispatches the
        # (x, i) two-argument lambda form by arity, so `lambda v, k=k` would
        # silently receive the array INDEX as k
        return F.size(
            F.filter(
                F.col(value_col),
                lambda v: v.isNotNull() & (_bin(v) == F.lit(k)),
            )
        )

    cols = [_count_bin(k).alias(f"{prefix}{k}") for k in range(n_bins)]
    return per_band.select("*", *cols)


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



def global_band_stats(
    per_band: DataFrame,
    value_col: str = "values",
    group_cols: tuple[str, ...] = ("band",),
    deterministic: bool = False,
    order_col: str = "chip_id",
) -> DataFrame:
    """Dataset-wide per-band pixel statistics — the normalization constants
    (mean/std per channel) every training config bakes in, plus range and
    coverage, over ANY per-band pixel rows (mosaic/chip-stack/composite
    shaped: ``values array<double>``).

    Scale shape: each row folds to a handful of scalars JVM-side
    (``aggregate`` sum / sum-of-squares over the valid pixels — no Python,
    no explode), then ONE tiny shuffle of per-partition partials (Catalyst
    map-side combine on the groupBy) carries O(groups) rows to the final
    agg.  100 TB of pixels reduce to bytes before anything moves.

    ``std`` is the population standard deviation computed from
    sum/sum-of-squares in float64; null (not 0) when a band has no valid
    pixels.  Extra ``group_cols`` (e.g. ``("band", "split")``) give
    per-split constants from the same single pass.

    ``deterministic=True`` makes the float results BIT-exact across runs
    and partitionings: the per-group partials fold in ``order_col`` order
    (array_sort over collected structs) instead of Spark's
    partition-arrival order, at the cost of collecting O(rows-per-group)
    partial structs into one row — use for oracle comparisons and
    reproducibility audits; the default partial-sum path is the 100 TB
    shape (results then differ only in the last float bits)."""
    missing = [c for c in (*group_cols, value_col) if c not in per_band.columns]
    if deterministic and order_col not in per_band.columns:
        missing.append(order_col)
    if missing:
        raise ValueError(f"global_band_stats input missing columns {missing}")
    # a NULL values array (e.g. a quarantined decode in CHIP_STACK rows)
    # would poison the whole group's sums (NULL partials; NULL-propagating
    # deterministic fold) — such rows carry no pixels, so drop them here
    # rather than making every caller remember to
    per_band = per_band.filter(F.col(value_col).isNotNull())
    valid = F.filter(F.col(value_col), lambda v: v.isNotNull())
    staged = per_band.select(
        *group_cols,
        *([order_col] if deterministic else []),
        F.size(F.col(value_col)).cast("long").alias("_n_px"),
        F.size(valid).cast("long").alias("_n_valid"),
        F.aggregate(
            valid, F.lit(0.0), lambda acc, v: acc + v
        ).alias("_s"),
        F.aggregate(
            valid, F.lit(0.0), lambda acc, v: acc + v * v
        ).alias("_ss"),
        F.array_min(valid).alias("_vmin"),
        F.array_max(valid).alias("_vmax"),
    )
    n = F.sum("_n_valid")
    if deterministic:
        # fold partials in order_col order — integer/min/max aggs are
        # order-free already; only the float sums need the pinned order
        parts = F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(order_col).alias("k"),
                    F.col("_s").alias("s"),
                    F.col("_ss").alias("ss"),
                )
            )
        )
        s = F.aggregate(parts, F.lit(0.0), lambda acc, x: acc + x["s"])
        ss = F.aggregate(parts, F.lit(0.0), lambda acc, x: acc + x["ss"])
    else:
        s = F.sum("_s")
        ss = F.sum("_ss")
    mean = s / n
    # clamp tiny negative float residue of SS/N - mean^2 before the sqrt
    var = F.greatest(ss / n - mean * mean, F.lit(0.0))
    return (
        staged.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_chips"),
            F.sum("_n_px").alias("n_px"),
            n.alias("n_valid"),
            F.when(n > 0, mean).alias("mean"),
            F.when(n > 0, F.sqrt(var)).alias("std"),
            F.min("_vmin").alias("vmin"),
            F.max("_vmax").alias("vmax"),
        )
        .orderBy(*group_cols)
    )
