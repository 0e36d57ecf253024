"""As-of / latest-per-key selection — metadata-only winner dedup.

Spark form of rasteret's ``match="latest"`` path
(`src/rasteret/core/point_sampling.py:350-514`): pick the newest record per
key using metadata ONLY, **before** any pixel decode, so the expensive UDF
stage runs on winners alone.  Catalyst will not reorder across an opaque UDF,
so authoring this stage first is the plan-shape guarantee the reference gets
from its phase ordering.

Both operators are pure built-in window/join plans — no Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F  # noqa: N812


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str = "datetime",
    tie_break: str | None = None,
) -> DataFrame:
    """Keep the newest row per key (deterministic tie-break for run-to-run
    stable output — the explicit-ordering requirement called out in
    SURVEY.md §7 'hard parts')."""
    order = [F.col(order_col).desc()]
    if tie_break:
        order.append(F.col(tie_break).asc())
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    right_cols: Sequence[str] | None = None,
    tie_break: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` (backward) or earliest with ``>=`` (forward),
    per ``key`` — left rows with no match keep nulls (left-join semantics).

    Union-merge plan (NOT an equi-join + range filter): tag both sides, union
    on (key, ts), and take ``last(right_payload, ignorenulls)`` over a
    rows-between-unbounded-preceding window per key ordered by ts.  Exactly
    ONE shuffle on ``key`` and |L|+|R| intermediate rows — a hot key with
    many left and right rows never materializes the |L|x|R| pair explosion
    the naive range-join plan produces (the reference's J3 winner-selection-
    before-expansion insight, `src/rasteret/core/point_sampling.py:350-514`).

    Ordering rule: right rows sort BEFORE left rows at equal ts (inclusive
    <=/>=); among right rows at the same ts the one with the greatest
    ``tie_break`` wins for backward (smallest for forward) — deterministic
    when ``tie_break`` is a right-side unique column.

    NULL timestamps never participate in a match (the range-predicate
    semantics ``right_ts <= left_ts`` is NULL-excluding on both sides):
    right rows with NULL ``right_ts`` are filtered before the union — they
    would otherwise sort first under Spark's NULLS FIRST and leak their
    payload into left rows with no genuine match — and left rows with NULL
    ``left_ts`` are kept but explicitly unmatched in both directions.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction}")
    payload_cols = list(
        right_cols
        if right_cols is not None
        else [c for c in right.columns if c not in (key, right_ts)]
    )
    clash = [c for c in payload_cols if c in left.columns]
    if clash:
        raise ValueError(
            f"right_cols {clash} collide with left columns — alias them first"
        )
    rsel = (
        right.select(
            F.col(key).alias(key),
            # try_cast: malformed values become NULL (filtered below) in ANSI
            # and non-ANSI mode alike, instead of failing the stage
            F.col(right_ts).try_cast(left.schema[left_ts].dataType).alias("_ts"),
            F.struct(*[F.col(c) for c in payload_cols]).alias("_payload"),
            F.lit(0).alias("_side"),  # right sorts before left at equal ts
            (F.col(tie_break) if tie_break else F.lit(0)).alias("_tie"),
        )
        # filter AFTER the cast: a right_ts that is non-NULL but casts to
        # NULL (unparseable string -> timestamp) must also be excluded, or
        # it sorts NULLS FIRST and leaks its payload into unmatched rows
        .filter(F.col("_ts").isNotNull())
    )
    lsel = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("_ts"),
        F.lit(None).cast(rsel.schema["_payload"].dataType).alias("_payload"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rsel.schema["_tie"].dataType).alias("_tie"),
    )
    missing = [
        F.lit(None).cast(left.schema[c].dataType).alias(c)
        for c in left.columns
        if c != key
    ]
    rsel = rsel.select(key, *missing, "_ts", "_payload", "_side", "_tie")

    if direction == "backward":
        order = [F.col("_ts").asc(), F.col("_side").asc(), F.col("_tie").asc()]
    else:  # forward: flip time so "last right at or before" = earliest at/after
        order = [F.col("_ts").desc(), F.col("_side").asc(), F.col("_tie").desc()]
    w = (
        Window.partitionBy(F.col(key))
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = lsel.unionByName(rsel).withColumn(
        "_match",
        # NULL left_ts rows are explicitly unmatched (forward's desc order
        # would otherwise sort them AFTER all right rows and hand them the
        # window's last payload)
        F.when(
            F.col("_ts").isNull(), F.lit(None).cast(rsel.schema["_payload"].dataType)
        ).otherwise(F.last(F.col("_payload"), ignorenulls=True).over(w)),
    )
    out = merged.filter(F.col("_side") == 1)
    for c in payload_cols:
        out = out.withColumn(c, F.col("_match")[c])
    return out.drop("_ts", "_payload", "_side", "_tie", "_match")
