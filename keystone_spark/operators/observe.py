"""Observed metrics: data-quality counters that ride the action.

``df.observe`` computes aggregate expressions DURING an action as
accumulator-style metrics — no second scan, no extra shuffle, which is
the only affordable way to count nulls/violations on a 100 TB ingest
(a separate ``df.where(bad).count()`` would re-read the input). The
codec kernels' quarantine accumulator (operators/multimodal.py) is the
Python-worker form of the same idea; this is the declarative
Catalyst-native form, usable on any plan.

Batch: ``Observation`` handles get collected after the first action.
Streaming: metrics surface per micro-batch in the query progress
(``observedMetrics``); ``run_observed_available_now`` drains a stream
and returns them merged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation, Window
from pyspark.sql import functions as F


def quality_checks(
    df: DataFrame, null_cols: list[str] | None = None
) -> list[Column]:
    """Default check set: row count + per-column null counts (the
    ingest-health basics). Extend with any aggregate Column."""
    cols = null_cols if null_cols is not None else df.columns
    exprs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        exprs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"n_null_{c}")
        )
    return exprs


def observe_quality(
    df: DataFrame,
    checks: list[Column] | None = None,
    null_cols: list[str] | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach quality metrics to a BATCH plan. Returns (df, observation);
    read ``observation.get`` after the first action on the returned df —
    the metrics were computed by that same action."""
    obs = Observation()
    exprs = checks if checks is not None else quality_checks(df, null_cols)
    return df.observe(obs, *exprs), obs


def run_observed_available_now(
    stream_df: DataFrame,
    out_table: str,
    checks: list[Column],
    name: str = "quality",
    output_mode: str = "append",
) -> dict:
    """Drain a STREAM (Trigger.AvailableNow -> memory sink) with observed
    metrics attached; returns the summed per-micro-batch metrics (counts
    are additive across batches). The streaming twin of
    ``observe_quality`` — same expressions, surfaced through
    ``StreamingQueryProgress.observedMetrics`` instead of an Observation
    handle."""
    import tempfile

    observed = stream_df.observe(name, *checks)
    # recentProgress is a ring buffer capped by numRecentProgressUpdates
    # (default 100): a drain producing more micro-batches would silently
    # drop early batches' metrics. Raise it for this run (set/restore —
    # no lasting session mutation); 100k batches bounds any AvailableNow
    # drain this helper is for, and the cap is documented here rather
    # than hidden.
    spark = stream_df.sparkSession
    _key = "spark.sql.streaming.numRecentProgressUpdates"
    _old = spark.conf.get(_key, None)
    spark.conf.set(_key, "100000")
    try:
        with tempfile.TemporaryDirectory() as ckpt:
            q = (
                observed.writeStream.format("memory")
                .queryName(out_table)
                .outputMode(output_mode)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            progresses = list(q.recentProgress)
    finally:
        if _old is None:
            spark.conf.unset(_key)
        else:
            spark.conf.set(_key, _old)
    total: dict = {}
    for prog in progresses:
        m = (prog.get("observedMetrics") or {}).get(name)
        if not m:
            continue
        for k, v in m.asDict().items():
            total[k] = total.get(k, 0) + (v or 0)
    return total


def constraint_checks(
    df: DataFrame,
    not_null: list[str] | None = None,
    unique: list[list[str]] | None = None,
    ranges: dict | None = None,
    foreign_keys: list[tuple] | None = None,
) -> DataFrame:
    """Deequ/dbt-style declarative constraint validation, returned as one
    (check, violations) report DataFrame — the CI gate a 100 TB ingest
    runs before publishing a partition.

    - ``not_null``: columns that must never be NULL (counted in ONE scan
      via conditional aggregates — no per-check pass).
    - ``unique``: key lists that must be distinct (count - countDistinct,
      map-side-combinable; NULL-containing keys are counted by the
      grouped fallback exactly).
    - ``ranges``: {col: (lo, hi)} closed-interval bounds.
    - ``foreign_keys``: (fk_col, dim_df, pk_col) triples — orphans found
      with a LEFT ANTI join (broadcast when the dim is small, exactly
      the scan-side shape of the star-schema integrity check).

    All single-table checks fold into one aggregation over one scan;
    each FK adds one anti-join count. Violations == 0 for every row is
    the pass condition; the report stays a tiny driver-safe table.
    """
    aggs = []
    for c in not_null or []:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"not_null:{c}")
        )
    for c, (lo, hi) in (ranges or {}).items():
        aggs.append(
            F.sum(
                (~F.col(c).between(lo, hi)).cast("long")
            ).alias(f"range:{c}")
        )
    rows = []
    spark = df.sparkSession
    if aggs:
        r = df.agg(*aggs).first()
        rows += [(k, int(r[k] or 0)) for k in r.asDict()]
    for keys in unique or []:
        dup = (
            df.groupBy(*keys)
            .agg(F.count("*").alias("__n"))
            .where(F.col("__n") > 1)
            .agg(F.coalesce(F.sum(F.col("__n") - 1), F.lit(0)))
            .first()[0]
        )
        rows.append((f"unique:{','.join(keys)}", int(dup)))
    for fk_col, dim_df, pk_col in foreign_keys or []:
        orphans = (
            df.select(F.col(fk_col).alias(pk_col))
            .where(F.col(pk_col).isNotNull())
            .join(dim_df.select(pk_col).distinct(), pk_col, "left_anti")
            .count()
        )
        rows.append((f"fk:{fk_col}->{pk_col}", int(orphans)))
    return spark.createDataFrame(rows, "check string, violations long")


def key_skew_profile(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
) -> DataFrame:
    """Join/agg-key skew diagnostics — the profiling pass you run BEFORE
    deciding whether a 100-TB join needs salting or AQE skew splitting.
    Returns the ``top_k`` heaviest keys, one row each: ``(rank, key,
    cnt, share, cum_share, skew)`` where ``share`` = key rows / total
    rows, ``cum_share`` = running share of the head, and ``skew`` = key
    rows / mean group size (a skew of 40 means one reducer gets 40x the
    average partition's work under hash partitioning).

    Plan shape: one map-side-combinable count agg to |keys| rows, a
    single-row (total, n_keys) aggregate broadcast back, and a bounded
    top-k sort (TakeOrdered, no global sort). The window runs over the
    ``top_k`` surviving rows only."""
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count("*").alias("cnt")
    )
    totals = counts.agg(
        F.sum("cnt").alias("__total"), F.count("*").alias("__nkeys")
    )
    top = counts.orderBy(F.desc("cnt"), F.asc("key")).limit(top_k)
    w = Window.orderBy(F.desc("cnt"), F.asc("key"))
    return (
        top.crossJoin(F.broadcast(totals))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn(
            "cum",
            F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .select(
            "rank",
            "key",
            "cnt",
            F.round(F.col("cnt") / F.col("__total"), 6).alias("share"),
            F.round(F.col("cum") / F.col("__total"), 6).alias("cum_share"),
            F.round(
                F.col("cnt") / (F.col("__total") / F.col("__nkeys")), 6
            ).alias("skew"),
        )
    )


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    group_col: str,
    value_col: str,
    n_bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index per group between a reference and a
    current sample — the standard model/data-drift monitor
    (PSI = sum_bins (p_cur - p_ref) * ln(p_cur / p_ref), bins = the
    REFERENCE distribution's exact ``n_bins``-quantile edges; > 0.1 is
    the conventional "investigate" line, > 0.25 "shifted"). Returns one
    row per group: ``(group_col, n_ref, n_cur, psi, drifted)``.

    Scale shape: quantile edges are one exact-percentile agg over ref
    (swap to percentile_approx for extreme group counts), broadcast back
    as a tiny per-group array; bin assignment is a codegen array-filter
    count; the bin histograms are map-side-combinable count aggs over a
    |groups| x n_bins key space. Zero-count bins are floored at ``eps``
    inside the log so PSI stays finite — the floor is part of the
    metric's definition here and mirrored by the oracle."""
    pcts = [i / n_bins for i in range(1, n_bins)]
    edges = ref.groupBy(group_col).agg(
        F.percentile(F.col(value_col), pcts).alias("__bs")
    )

    def binned(df: DataFrame, name: str) -> DataFrame:
        b = df.join(F.broadcast(edges), group_col).withColumn(
            "__bin",
            F.size(F.filter("__bs", lambda e: F.col(value_col) > e)),
        )
        return b.groupBy(group_col, "__bin").agg(
            F.count("*").alias(f"__n_{name}")
        )

    bins = (
        edges.select(
            group_col,
            F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("__bin"),
        )
        .join(binned(ref, "ref"), [group_col, "__bin"], "left")
        .join(binned(cur, "cur"), [group_col, "__bin"], "left")
        .select(
            group_col,
            F.coalesce("__n_ref", F.lit(0)).alias("__r"),
            F.coalesce("__n_cur", F.lit(0)).alias("__c"),
        )
    )
    totals = bins.groupBy(group_col).agg(
        F.sum("__r").cast("long").alias("n_ref"),
        F.sum("__c").cast("long").alias("n_cur"),
    )
    pr = F.greatest(F.col("__r") / F.col("n_ref"), F.lit(eps))
    pc = F.greatest(F.col("__c") / F.col("n_cur"), F.lit(eps))
    out = (
        bins.join(F.broadcast(totals), group_col)
        .withColumn("__term", (pc - pr) * (F.log(pc) - F.log(pr)))
        .groupBy(group_col)
        .agg(
            F.first("n_ref").alias("n_ref"),
            F.first("n_cur").alias("n_cur"),
            F.round(F.sum("__term"), 6).alias("psi"),
        )
        .withColumn("drifted", F.col("psi") > 0.1)
    )
    return out
