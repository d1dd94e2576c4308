"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with the ``noop`` sink (ADVICE r1: ``count()``
lets Catalyst prune output-only projections — e.g. a final ``round()``
above an aggregate — so it under-measures; the noop write forces every
output column through the full plan with no driver-side row transfer). A
warmup pass primes the JVM/codegen caches; reported value is the best of 2
timed iterations (steady-state, matches how a long-running cluster
behaves).

Second scale point (VERDICT r3 #7): when ``.localdata/sf1`` exists
(build: ``python tools/make_scaled_data.py``), the same suite also runs
there and lands in the SAME JSON line under ``sf1_value``/``sf1_queries``
— the one-line contract the driver parses stays intact while data-bound
regressions become driver-visible instead of living only in BASELINE.md.
Primary metric/value stay $SPARK_GRAFT_SF_DIR-based for baseline
comparability. Opt out with SPARK_GRAFT_SKIP_SF1=1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    # (name, queries() key) — mirror of BASELINE.md Part B
    ("b1_filtered_agg", "group_agg"),
    ("b2_star_join", "multi_join"),
    ("b3_topk_window", "topk_per_group"),
    ("b4_rollup", "rollup"),
    ("b5_anti_join", "anti_join"),
    ("b6_token_topk", "token_counts"),
    ("b7_scaler_moments", "scaler_moments"),
    ("b8_confusion", "confusion_matrix"),
    ("b9_dedup", "dedup_exact"),
    ("b10_cosine_topk", "cosine_topk"),
    ("b11_event_window", "event_hourly_window"),
    ("b12_sessionization", "sessionization"),
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry_mod
    from keystone_spark import get_session

    spark = get_session("keystone_spark_bench")
    qs = entry_mod.queries()

    def run(df) -> None:
        # noop datasource: full plan incl. every output column, zero sink IO
        df.write.format("noop").mode("overwrite").save()

    def run_suite(d: str) -> dict[str, float]:
        timings: dict[str, float] = {}
        for name, key in BENCH_QUERIES:
            fn = qs[key]
            run(fn(spark, d))  # warmup (plan + codegen + file listing)
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                run(fn(spark, d))
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 4)
        return timings

    timings = run_suite(sf_dir)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "bench_suite_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }

    sf1_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           ".localdata", "sf1")
    if os.path.isdir(sf1_dir) and not os.environ.get("SPARK_GRAFT_SKIP_SF1"):
        sf1 = run_suite(sf1_dir)
        result["sf1_value"] = round(sum(sf1.values()), 4)
        result["sf1_queries"] = sf1
    print(json.dumps(result))


if __name__ == "__main__":
    main()
