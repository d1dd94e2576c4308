"""Behavioral tests for keystone_spark.operators.relational."""

from pyspark.sql import functions as F

from keystone_spark.operators.relational import (
    top_k_per_group,
    asof_join,
    salted_join,
    range_join,
)


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 3), ("a", 2), ("b", 9), ("b", 8)], "g string, v int"
    )
    out = top_k_per_group(df, ["g"], [F.col("v").desc()], k=2)
    got = {(r.g, r.v, r.rk) for r in out.collect()}
    assert got == {("a", 3, 1), ("a", 2, 2), ("b", 9, 1), ("b", 8, 2)}


def test_asof_join_backward(spark):
    left = spark.createDataFrame(
        [(1, "u", 100), (2, "u", 205), (3, "v", 50)], "id int, k string, t long"
    ).select("id", "k", F.timestamp_seconds("t").alias("ts"))
    right = spark.createDataFrame(
        [("u", 90, 1.0), ("u", 200, 2.0), ("v", 60, 3.0)], "k string, t long, px double"
    ).select("k", F.timestamp_seconds("t").alias("ts"), "px")
    out = asof_join(left, right, "ts", "ts", on=["k"], direction="backward")
    got = {(r.id, r.px) for r in out.collect()}
    assert got == {(1, 1.0), (2, 2.0), (3, None)}


def test_asof_join_forward_with_tolerance(spark):
    left = spark.createDataFrame([(1, 100)], "id int, t long").select(
        "id", F.timestamp_seconds("t").alias("ts")
    )
    right = spark.createDataFrame([(150, 9.0), (500, 1.0)], "t long, px double").select(
        F.timestamp_seconds("t").alias("ts"), "px"
    )
    out = asof_join(left, right, "ts", "ts", direction="forward", tolerance_seconds=60)
    assert [r.px for r in out.collect()] == [9.0]


def test_asof_join_preserves_duplicate_left_rows(spark):
    """Two byte-identical left rows must each produce an output row in BOTH
    the range-join form (rank identity = synthetic row id, not row values)
    and the merge form."""
    from keystone_spark.operators.relational import asof_join_merge

    left = spark.createDataFrame(
        [("u", 100), ("u", 100), ("u", 205)], "k string, t long"
    ).select("k", F.timestamp_seconds("t").alias("ts"))
    right = spark.createDataFrame(
        [("u", 90, 1.0), ("u", 200, 2.0)], "k string, t long, px double"
    ).select("k", F.timestamp_seconds("t").alias("ts"), "px")

    out = asof_join(left, right, "ts", "ts", on=["k"], direction="backward")
    assert sorted(r.px for r in out.collect()) == [1.0, 1.0, 2.0]

    merged = asof_join_merge(
        left, right.withColumnRenamed("ts", "r_ts"),
        on=["k"], left_ts="ts", right_ts="r_ts", value_cols=["px"],
    )
    assert sorted(r.px for r in merged.collect()) == [1.0, 1.0, 2.0]


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_quantity")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey", "o_totalprice")
    plain = li.join(o, li.l_orderkey == o.o_orderkey).count()
    salted = salted_join(
        li.withColumnRenamed("l_orderkey", "k"),
        o.withColumnRenamed("o_orderkey", "k"),
        on="k",
        salt_buckets=4,
    ).count()
    assert plain == salted


def test_range_join(spark):
    a = spark.createDataFrame([(1, 10), (2, 20)], "id int, v int")
    b = spark.createDataFrame([(5, 15)], "lo int, hi int")
    out = range_join(a, b, (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi")),
                     broadcast_right=True)
    assert [r.id for r in out.collect()] == [1]


def test_asof_join_merge_matches_range_form(spark, sf_dir):
    """The merge formulation must agree with the range-join+max reduction
    on the events fixture (most recent signup at-or-before each error)."""
    from pyspark.sql import functions as F

    from keystone_spark.operators.relational import asof_join_merge
    from keystone_spark.sources import load_table

    e = load_table(spark, "events", sf_dir)
    err = e.where(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    sig = e.where(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("s_ts"), F.col("ts").alias("sig_ts")
    )
    merged = asof_join_merge(
        err, sig, on=["user_id"], left_ts="ts", right_ts="s_ts",
        value_cols=["sig_ts"],
    ).select("event_id", F.unix_timestamp("sig_ts").alias("signup_ts"))

    j = err.join(
        sig.withColumnRenamed("user_id", "s_user"),
        (F.col("user_id") == F.col("s_user")) & (F.col("s_ts") <= F.col("ts")),
        "left",
    ).groupBy("event_id").agg(F.unix_timestamp(F.max("s_ts")).alias("signup_ts"))

    a = sorted(tuple(r) for r in merged.collect())
    b = sorted(tuple(r) for r in j.collect())
    assert a == b


def test_asof_join_merge_single_shuffle(spark, sf_dir):
    """Plan audit: exactly one exchange (the window's key partition), no
    join operator at all."""
    from pyspark.sql import functions as F

    from keystone_spark.operators.relational import asof_join_merge
    from keystone_spark.sources import load_table

    e = load_table(spark, "events", sf_dir)
    err = e.where(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    sig = e.where(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("s_ts"), F.col("value").alias("v")
    )
    out = asof_join_merge(err, sig, ["user_id"], "ts", "s_ts", ["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_salted_join_balances_skewed_key(spark):
    """VERDICT r3 #8 skew stress: one hot key owns ~30% of the left side.
    The salted join must (a) return exactly the naive join's rows and
    (b) spread the hot key's rows across shuffle partitions instead of
    concentrating them in one task — the property that keeps a 100 TB
    join from stalling on a single straggler."""
    from keystone_spark.operators.relational import salted_join

    n = 200_000
    left = spark.range(n).select(
        F.when(F.col("id") % 10 < 3, F.lit(0))
        .otherwise(F.col("id") % 1000)
        .alias("user_id"),
        (F.col("id") * 2).alias("value"),
    )
    dim = spark.range(1000).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("seg_"), (F.col("id") % 7).cast("string")).alias("seg"),
    )

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_coalesce = spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.enabled"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # AQE would coalesce these fixture-sized shuffles into ONE partition,
    # hiding the distribution this test measures; at real scale partitions
    # exceed the advisory size and stay split, so disable coalescing here.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        naive = left.join(dim, "user_id")
        salted = salted_join(left, dim, "user_id", salt_buckets=8)

        def pid_counts(df):
            return {
                r.pid: r.cnt
                for r in df.withColumn("pid", F.spark_partition_id())
                .groupBy("pid")
                .agg(F.count("*").alias("cnt"))
                .collect()
            }

        naive_max = max(pid_counts(naive).values())
        salted_max = max(pid_counts(salted).values())
        # hot key = 30% of rows -> naive has one ~38%-of-rows partition
        assert naive_max > 0.30 * n
        # salting spreads it: worst partition well under half the naive one
        assert salted_max < 0.6 * naive_max, (naive_max, salted_max)

        # and the result is EXACTLY the naive join
        agg = lambda df: sorted(
            tuple(r)
            for r in df.groupBy("user_id", "seg")
            .agg(F.count("*").alias("c"), F.sum("value").alias("s"))
            .collect()
        )
        assert agg(salted) == agg(naive)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", old_coalesce
        )


def test_interpolate_linear_hand_case(spark):
    """NULL gaps get the time-weighted blend; leading/trailing gaps fall
    back to NOCB/LOCF; observed points pass through untouched."""
    from keystone_spark.operators.relational import interpolate_linear

    rows = [
        ("a", 0, None), ("a", 10, 1.0), ("a", 20, None), ("a", 30, None),
        ("a", 40, 4.0), ("a", 50, None),
        ("b", 0, 7.0),
    ]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    out = {(r.k, r.t): r.v_interp
           for r in interpolate_linear(df, ["k"], "t", "v").collect()}
    assert out[("a", 0)] == 1.0            # NOCB
    assert out[("a", 10)] == 1.0           # observed
    assert abs(out[("a", 20)] - 2.0) < 1e-12  # 1 + (4-1)*(10/30)
    assert abs(out[("a", 30)] - 3.0) < 1e-12
    assert out[("a", 50)] == 4.0           # LOCF
    assert out[("b", 0)] == 7.0


def test_interpolate_linear_single_shuffle(spark):
    from keystone_spark.operators.relational import interpolate_linear

    df = spark.range(100).selectExpr(
        "id % 5 AS k", "id AS t",
        "CASE WHEN id % 3 = 0 THEN CAST(id AS DOUBLE) END AS v",
    )
    plan = interpolate_linear(df, ["k"], "t", "v")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1  # both windows share one shuffle


def test_binned_range_join_equals_naive(spark):
    """Bin-bucketed range join must equal the naive BETWEEN join for
    arbitrary bin sizes (pair meets in exactly one bin: no dups/misses),
    including intervals spanning many bins and empty bands."""
    pts = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([0, 1, 5, 49, 50, 99, 1000])],
        ["pid", "p"],
    )
    iv = spark.createDataFrame(
        [(0, 0.0, 10.0), (1, 4.0, 60.0), (2, 90.0, 95.0), (3, 200.0, 900.0)],
        ["iid", "lo", "hi"],
    )
    from keystone_spark.operators.relational import binned_range_join

    naive = {(r.pid, r.iid) for r in pts.join(
        iv, (F.col("p") >= F.col("lo")) & (F.col("p") <= F.col("hi"))
    ).collect()}
    for bin_size in (1.0, 7.0, 50.0, 1000.0):
        got = {(r.pid, r.iid) for r in binned_range_join(
            pts, iv, "p", "lo", "hi", bin_size).collect()}
        assert got == naive, bin_size


def test_session_paths_hand_case(spark):
    """Gap sessionization + ordered path strings + frequency ranking on a
    hand-built stream (r7 clickstream mining)."""
    from datetime import datetime, timedelta

    from keystone_spark.operators.relational import session_paths

    t0 = datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    # user 1: two sessions split by a 40-min gap: A>B then C
    rows += [(1, 1, t0, "A"), (2, 1, t0 + timedelta(minutes=5), "B"),
             (3, 1, t0 + timedelta(minutes=45), "C")]
    # user 2: one session A>B (same path as user 1's first)
    rows += [(4, 2, t0, "A"), (5, 2, t0 + timedelta(minutes=1), "B")]
    # user 3: same-timestamp tie broken by event_id: A(6) then B(7)
    rows += [(7, 3, t0, "B"), (6, 3, t0, "A")]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = session_paths(df, gap_minutes=30, max_events=20, top_k=10).collect()
    got = [(r.rank, r.path, r.n_sessions) for r in sorted(out)]
    assert got == [(1, "A>B", 3), (2, "C", 1)]


def test_session_paths_caps_path_length(spark):
    """max_events truncates the PATH, not the session membership."""
    from datetime import datetime, timedelta

    from keystone_spark.operators.relational import session_paths

    t0 = datetime(2024, 1, 1)
    rows = [(i, 1, t0 + timedelta(minutes=i), f"E{i}") for i in range(6)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = session_paths(df, gap_minutes=30, max_events=3, top_k=5).collect()
    assert [(r.path, r.n_sessions) for r in out] == [("E0>E1>E2", 1)]


def test_ordered_funnel_strict_ordering(spark):
    """A user whose purchase precedes the click does NOT complete the
    funnel; step counts and conversion rates are exact."""
    from datetime import datetime, timedelta

    from keystone_spark.operators.relational import ordered_funnel

    t0 = datetime(2024, 1, 1, 12, 0, 0)
    m = timedelta(minutes=1)
    rows = []
    # u1: full ordered funnel
    rows += [(1, t0, "view"), (1, t0 + m, "click"), (1, t0 + 2 * m, "purchase")]
    # u2: purchase BEFORE click -> stops at click
    rows += [(2, t0, "view"), (2, t0 + 2 * m, "click"), (2, t0 + m, "purchase")]
    # u3: view only
    rows += [(3, t0, "view")]
    # u4: click/purchase but never viewed -> not even step 0
    rows += [(4, t0, "click"), (4, t0 + m, "purchase")]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    out = {r.step_idx: r for r in
           ordered_funnel(df, ["view", "click", "purchase"]).collect()}
    assert out[0].n_users == 3 and out[0].conv_rate == 1.0
    assert out[1].n_users == 2 and out[1].conv_rate == round(2 / 3, 6)
    assert out[2].n_users == 1 and out[2].conv_rate == 0.5
