"""Generate a scaled copy of the fixture tables for data-bound benching.

The driver ships sf0.1 at most; local bench numbers there are
overhead-bound (flat sf0.001 -> sf0.1 curve, see BASELINE.md). This tool
replicates sf0.1 K times with key offsets so every foreign key stays
consistent within its copy (joins scale linearly, no cross-copy fanout)
and row counts grow K-fold — enough to make the suite data-bound.

Dimension tables (region, nation) are NOT scaled, matching TPC-H's fixed
dims. All *key columns shift by copy_index * STRIDE; everything else is
replicated verbatim (identical embedding payloads are fine for bench:
the scans, shuffles and aggregations still process K times the bytes).

Usage: python tools/make_scaled_data.py [--k 10] [--src /root/testdata/sf0.1]
       [--dst .localdata/sf1]
Scale points in use: --k 10 --dst .localdata/sf1 (bench.py's embedded
second point) and --k 50 --dst .localdata/sf5 (the opt-in
SPARK_GRAFT_INCLUDE_SF5 point; curve recorded in BASELINE.md).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

STRIDE = 10_000_000  # larger than any base key space

# table -> key columns to offset per copy
OFFSETS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ("region", "nation")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=".localdata/sf1")
    ap.add_argument("--files", type=int, default=32,
                    help="output files per table (parallel scan granularity)")
    args = ap.parse_args()

    from keystone_spark import get_session
    from keystone_spark.sources.tables import load_table

    spark = get_session("make_scaled_data")
    os.makedirs(args.dst, exist_ok=True)

    for t in DIMS:
        load_table(spark, t, args.src).write.mode("overwrite").parquet(
            os.path.join(args.dst, f"{t}.parquet")
        )
        print(f"{t}: copied (dim)")

    for t, keys in OFFSETS.items():
        base = load_table(spark, t, args.src)
        copies = []
        for i in range(args.k):
            c = base
            for k in keys:
                c = c.withColumn(k, (F.col(k) + F.lit(i * STRIDE)).cast("long"))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.repartition(args.files).write.mode("overwrite").parquet(
            os.path.join(args.dst, f"{t}.parquet")
        )
        n = spark.read.parquet(os.path.join(args.dst, f"{t}.parquet")).count()
        print(f"{t}: {n} rows ({args.k}x)")


if __name__ == "__main__":
    main()
