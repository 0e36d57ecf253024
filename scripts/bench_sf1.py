#!/usr/bin/env python
"""sf1 stretch battery: run the SQL-oracle query set at 10x the sf0.1 rows.

Builds /tmp/sf1_scaled once by unioning 10 key-shifted copies of each sf0.1
fact table (FK consistency preserved: every copy shifts customer/order/part/
supplier/event/doc/vec keys by the same copy stride, so join cardinalities
scale linearly instead of exploding).  Dimension tables (region, nation) are
shared.  Then times every query from ``__spark_entry__.queries()`` that has
a SQL oracle (the relational battery) at BOTH sf0.1 and the scaled sf1, and
reports per-query walls + the wall ratio — the evidence that the relational
side scales like the raster side (which is already pinned by the 32k/40k
image points in BENCH/BASELINE.md).

Usage:  python scripts/bench_sf1.py [--copies 10]   (run ALONE, no other
Spark jobs — co-tenant contention poisons walls; external-cores evidence is
attached per query the same way bench.py does it).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1_scaled"

# per-table: columns shifted by copy_index * stride(entity), stride = the
# next power of ten above the entity's max key in the OWNING table, so
# shifted keys are disjoint across copies and FK pairs stay aligned.
ENTITY_OWNER = {
    "customer": ("customer", "c_custkey"),
    "supplier": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "orders": ("orders", "o_orderkey"),
    "events": ("events", "event_id"),
    "users": ("events", "user_id"),
    "documents": ("documents", "doc_id"),
    "embeddings": ("embeddings", "vec_id"),
}
KEY_COLS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders", "l_partkey": "part", "l_suppkey": "supplier"
    },
    "events": {"event_id": "events", "user_id": "users"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
DIMS = ["region", "nation"]


def build_scaled(spark, copies: int) -> None:
    from pyspark.sql import functions as F  # noqa: N812

    marker = os.path.join(DST, "_DONE")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == str(copies):
                return
        import shutil  # stale scale factor: rebuild, never mislabel ratios

        shutil.rmtree(DST)
    strides: dict[str, int] = {}
    for entity, (table, col) in ENTITY_OWNER.items():
        m = (
            spark.read.parquet(f"{SRC}/{table}.parquet")
            .agg(F.max(F.col(col)))
            .first()[0]
            or 0
        )
        s = 1
        while s <= m:
            s *= 10
        strides[entity] = s
    for table in DIMS:
        spark.read.parquet(f"{SRC}/{table}.parquet").write.mode("overwrite").parquet(
            f"{DST}/{table}.parquet"
        )
    for table, cols in KEY_COLS.items():
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        parts = []
        for i in range(copies):
            c = df
            for col, base in cols.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * strides[base]))
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(f"{DST}/{table}.parquet")
    with open(os.path.join(DST, "_DONE"), "w") as f:
        f.write(str(copies))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    from rasteret_spark.session import get_spark

    import __spark_entry__ as E

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(app="bench-sf1", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    build_scaled(spark, args.copies)
    build_s = time.time() - t0

    import benchguard

    # image-table queries ignore sf_dir — the registry declares them next to
    # the queries themselves (E.SF_INDEPENDENT_QUERIES), so a new image
    # query can't silently re-enter the ratio battery with a trivial 1.0
    oracle_names = sorted(set(E.oracle_sql().keys()) - E.SF_INDEPENDENT_QUERIES)
    qmap = E.queries()
    results: dict[str, dict] = {}
    rep_log: dict[str, list] = {}
    n_contended = 0
    for name in oracle_names:
        fn = qmap[name]
        row: dict[str, float] = {}
        for label, sf_dir in [("sf0_1", SRC), ("sf1", DST)]:
            df = fn(spark, sf_dir)
            best, _, contended = benchguard.timed_min(
                lambda d=df: d.write.format("noop").mode("overwrite").save(),
                f"{name}@{label}", rep_log, repeats=args.repeats,
            )
            n_contended += contended
            row[label] = round(best, 3)
        row["ratio"] = round(row["sf1"] / max(row["sf0_1"], 1e-9), 2)
        results[name] = row
        print(f"{name:38s} sf0.1={row['sf0_1']:7.3f}s  sf1={row['sf1']:7.3f}s  "
              f"x{row['ratio']}", flush=True)

    ratios = [r["ratio"] for r in results.values()]
    out = {
        "copies": args.copies,
        "build_s": round(build_s, 1),
        "n_queries": len(results),
        "max_ratio": max(ratios),
        "median_ratio": sorted(ratios)[len(ratios) // 2],
        "contended_reps": n_contended,
        "queries": results,
        "reps": rep_log,  # [wall_s, external_cores] evidence per query@sf
    }
    with open("BENCH/sf1_battery.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ["copies", "n_queries", "max_ratio", "median_ratio"]}))


if __name__ == "__main__":
    main()
