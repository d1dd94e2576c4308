"""Relational operators beyond a bare join/groupBy call.

KeystoneML has no relational layer (SURVEY.md §2.3/§2.7: no joins, no sorts,
no set ops) — this module is the §2.11 extension surface the fixtures
require, expressed so Catalyst/AQE keep every optimization opportunity:

- top-k per group: window rank + filter (AQE handles skewed groups).
- as-of join: range-join + per-left-row rank, or broadcast when the right
  side is a small dimension.
- salted join: explicit skew mitigation for hot keys when AQE's runtime
  skew split is unavailable (e.g. pre-3.0 clusters or non-sort-merge plans).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rk",
) -> DataFrame:
    """Top-k rows per group via ROW_NUMBER + filter.

    The relational generalization of KeystoneML's ``TopKClassifier``
    (reference: ``nodes/util/TopKClassifier.scala``) from array-rank to
    group-rank. One shuffle on the partition keys; rank+filter happens
    map-side within each sorted partition.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= k)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    on: Sequence[str] = (),
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """As-of join: each left row picks the nearest right row at-or-before
    (backward) / at-or-after (forward) its timestamp, optionally within a
    tolerance and matching equi-keys.

    Implementation: non-equi range join + per-left-row rank-1. With equi
    keys the join shuffles on those keys (hash join) and the range predicate
    is a post-filter; without keys Spark falls back to broadcast-nested-loop
    — acceptable only when one side is small, which is the typical
    "align events to reference points" shape.
    """
    lts, rts = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = [F.col(f"l.{k}") == F.col(f"r.{k}") for k in on]
    if direction == "backward":
        cond.append(rts <= lts)
        if tolerance_seconds is not None:
            cond.append(
                rts >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {tolerance_seconds} SECONDS")
            )
        order = [rts.desc()]
    elif direction == "forward":
        cond.append(rts >= lts)
        if tolerance_seconds is not None:
            cond.append(
                rts <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {tolerance_seconds} SECONDS")
            )
        order = [rts.asc()]
    else:
        raise ValueError(f"direction must be backward|forward, got {direction}")

    # Row identity for the rank-1 window: a synthetic monotonic id, NOT the
    # left columns — partitioning by value-identity would collapse duplicate
    # left rows into one output row (silent row loss). The id is assigned
    # before the join, map-side, with no shuffle.
    l = left.withColumn("__asof_lid", F.monotonically_increasing_id()).alias("l")
    r = right.alias("r")
    full_cond = cond[0]
    for c in cond[1:]:
        full_cond = full_cond & c
    joined = l.join(r, on=full_cond, how="left")

    left_cols = [F.col(f"l.{c}") for c in left.columns]
    right_cols = [
        F.col(f"r.{c}").alias(c + suffix if c in left.columns else c)
        for c in right.columns
    ]
    w = Window.partitionBy(F.col("l.__asof_lid")).orderBy(*order)
    return (
        joined.withColumn("__asof_rn", F.row_number().over(w))
        .where(F.col("__asof_rn") == 1)
        .select(*left_cols, *right_cols)
    )


def asof_join_merge(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    direction: str = "backward",
) -> DataFrame:
    """Merge-based as-of join — the 100 TB formulation.

    Union both sides tagged, sort within each key partition by timestamp,
    and carry the latest right-side values forward with
    ``last(..., ignorenulls)`` over a running frame: ONE shuffle on the
    equi-keys, zero join fan-out, no nested-loop fallback — unlike the
    range-join form, cost is O(n log n) per key regardless of how many
    right rows precede each left row.

    Right rows order before left rows at equal timestamps, so the match is
    at-or-before (backward) / at-or-after (forward, implemented by negating
    the sort). Returns the left rows plus ``value_cols`` from the matched
    right row (null when no match).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")

    lcols = left.columns
    l2 = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"__v_{v}")
          for v in value_cols],
    )
    r2 = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          if c not in on else F.col(c) for c in lcols],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.col(v).alias(f"__v_{v}") for v in value_cols],
    )
    u = l2.unionByName(r2)
    sort_ts = F.col("__ts") if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(sort_ts, "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *lcols, "__is_left",
        *[F.last(f"__v_{v}", ignorenulls=True).over(w).alias(v) for v in value_cols],
    )
    return carried.where(F.col("__is_left") == 1).drop("__is_left")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-mitigated equi-join: salt the (large, skewed) left side's key,
    explode the (smaller) right side across all salt buckets.

    Prefer AQE's skew-join; this is the explicit fallback and a building
    block for deliberate hot-key handling at 100 TB.
    """
    salted_l = left.withColumn("__salt", (F.rand(seed=7) * salt_buckets).cast("int"))
    salted_r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_l.join(salted_r, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def range_join(
    left: DataFrame,
    right: DataFrame,
    condition: Column,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Theta/range join on an arbitrary non-equi condition.

    Spark plans this as broadcast-nested-loop when one side fits in memory
    (force with ``broadcast_right``) else cartesian+filter. Include at least
    one equi-conjunct in ``condition`` whenever the data model allows — that
    upgrades the plan to a hash join with a range post-filter.
    """
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=condition, how=how)


def interpolate_linear(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    out_col: str = "v_interp",
) -> DataFrame:
    """Linear interpolation of NULL gaps in a per-key ordered series —
    the resampling companion to LOCF gap-fill: each missing point gets
    the time-weighted blend of its nearest observed neighbors (LOCF when
    there is no later observation, NOCB when there is no earlier one).

    Pure window algebra: last(IGNORE NULLS) over the preceding frame and
    first(IGNORE NULLS) over the following frame share one partition+sort,
    so the whole thing is a single shuffle on the keys with O(1) running
    state per task — no UDF, no per-key collect, safe at 100 TB key
    cardinality. ``order_col`` must be numeric (epoch seconds etc.) so
    the blend weight is well-defined.
    """
    v, o = F.col(value_col), F.col(order_col)
    obs_o = F.when(v.isNotNull(), o)
    back = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    pv = F.last(v, ignorenulls=True).over(back)
    po = F.last(obs_o, ignorenulls=True).over(back)
    nv = F.first(v, ignorenulls=True).over(fwd)
    no = F.first(obs_o, ignorenulls=True).over(fwd)
    interp = (
        F.when(v.isNotNull(), v)
        .when(pv.isNull(), nv)
        .when(nv.isNull(), pv)
        .otherwise(pv + (nv - pv) * (o - po) / (no - po))
    )
    return df.withColumn(out_col, interp)


def binned_range_join(
    left: DataFrame,
    right: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_size: float,
    extra_equi: Sequence[str] = (),
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join as a HASH join (the range-join bin
    optimization): a plain ``p BETWEEN lo AND hi`` condition gives Spark
    nothing to hash on, so it plans broadcast-nested-loop or cartesian —
    quadratic at scale. Bucketing fixes it: the point side keys on
    ``floor(p / bin_size)``, the interval side explodes to every bin its
    interval overlaps, and the equi-join on the bin (plus any
    ``extra_equi`` keys) replaces the loop; the exact BETWEEN predicate
    re-filters after the hash match.

    Each (point, interval) pair meets in exactly ONE bin (the point's),
    so no dedup is needed. Cost knob: interval-side fanout is
    ``len/bin_size + 1`` rows per interval — pick ``bin_size`` near the
    typical interval length so fanout stays O(1). This is the manual
    form of the bin-based range join Databricks ships natively; on open
    Spark it is the difference between a shuffle join and an O(n*m)
    nested loop at 100 TB.
    """
    lb = left.withColumn(
        "__bin", F.floor(F.col(point_col) / F.lit(bin_size)).cast("long")
    )
    rb = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bin_size)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(bin_size)).cast("long"),
            )
        ),
    )
    on = ["__bin", *extra_equi]
    joined = lb.join(rb, on, how)
    return joined.where(
        (F.col(point_col) >= F.col(lo_col))
        & (F.col(point_col) <= F.col(hi_col))
    ).drop("__bin")


def session_paths(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    type_col: str = "event_type",
    gap_minutes: int = 30,
    max_events: int = 20,
    top_k: int = 15,
    sep: str = ">",
) -> DataFrame:
    """Top-k most frequent session paths (clickstream mining): gap-based
    sessionization (lag + running-sum, same construction as the b12
    bench query), then each session becomes the ordered string of its
    first ``max_events`` event types and paths are ranked by session
    count. Returns ``(rank, path, n_sessions)``.

    Scale: the heavy stages are per-user windows (one shuffle on
    ``user_col``) and a path-count hash agg (map-side combinable; path
    cardinality << session count because real traffic concentrates on
    few paths). Per-session state is the collected event list, bounded
    by session length — the ``max_events`` slice caps the PATH, and gap
    sessionization caps sessions in any human-generated stream; a
    sensor-style unbounded key would cap with a per-session row_number
    filter before the collect. Final top-k is a bounded sort."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    sess = (
        events.select(
            user_col, ts_col, tiebreak_col, type_col,
            F.when(
                F.lag(ts_col).over(w).isNull()
                | (
                    F.col(ts_col)
                    > F.lag(ts_col).over(w)
                    + F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")
                ),
                1,
            ).otherwise(0).alias("__new"),
        )
        .withColumn(
            "__sid",
            F.sum("__new").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    paths = (
        sess.groupBy(user_col, "__sid")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(ts_col, tiebreak_col, type_col))
            ).alias("__evs")
        )
        .select(
            F.concat_ws(
                sep,
                F.transform(
                    F.slice("__evs", 1, max_events),
                    lambda e: e[type_col],
                ),
            ).alias("path")
        )
    )
    counts = paths.groupBy("path").agg(
        F.count("*").cast("long").alias("n_sessions")
    )
    top = counts.orderBy(F.desc("n_sessions"), F.asc("path")).limit(top_k)
    wr = Window.orderBy(F.desc("n_sessions"), F.asc("path"))
    return top.select(
        F.row_number().over(wr).cast("long").alias("rank"),
        "path",
        "n_sessions",
    )


def ordered_funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strictly-ordered funnel: a user completes step k only with an
    event of that type STRICTLY AFTER their step-(k-1) completion time
    (the sequential definition — min-ts-per-step alone would count a
    purchase that preceded the click). Returns one row per step:
    ``(step_idx, step, n_users, conv_rate)``; conv_rate is vs the
    previous step (1.0 for step 0).

    Plan shape: one user-keyed conditional min-agg per step over the
    step-filtered scan, each carrying the previous completion time
    through an equi-join on the (shrinking) converted-user set — k aggs
    + k joins, all on ``user_col``; the per-step counts are single-row
    aggregates cross-joined into the k-row report, so no window touches
    data. Second-precision timestamps (unix_timestamp) keep the strict
    ordering engine-portable."""
    t = F.unix_timestamp(F.col(ts_col))
    base = events.where(F.col(type_col).isin(list(steps))).select(
        F.col(user_col).alias("__u"), t.alias("__t"), F.col(type_col).alias("__e")
    )
    stages = []
    cur = (
        base.where(F.col("__e") == steps[0])
        .groupBy("__u")
        .agg(F.min("__t").alias("__prev"))
    )
    stages.append(cur)
    for s in steps[1:]:
        cur = (
            base.where(F.col("__e") == s)
            .join(cur.select("__u", "__prev"), "__u")
            .where(F.col("__t") > F.col("__prev"))
            .groupBy("__u")
            .agg(F.min("__t").alias("__prev"))
        )
        stages.append(cur)
    counts = [st.agg(F.count("*").alias("__n")) for st in stages]
    rows = None
    for i, (s, cnt) in enumerate(zip(steps, counts)):
        if i == 0:
            row = cnt.select(
                F.lit(i).cast("long").alias("step_idx"),
                F.lit(s).alias("step"),
                F.col("__n").cast("long").alias("n_users"),
                F.lit(1.0).alias("conv_rate"),
            )
        else:
            prev = counts[i - 1].select(F.col("__n").alias("__p"))
            row = cnt.crossJoin(prev).select(
                F.lit(i).cast("long").alias("step_idx"),
                F.lit(s).alias("step"),
                F.col("__n").cast("long").alias("n_users"),
                F.round(
                    F.col("__n") / F.greatest("__p", F.lit(1)), 6
                ).alias("conv_rate"),
            )
        rows = row if rows is None else rows.unionByName(row)
    return rows
