"""Observed metrics: batch Observation + streaming observedMetrics must
both report the quality counters computed by the SAME action that
produced the output (no second scan)."""

import pyspark.sql.functions as F

from keystone_spark.operators.observe import (
    observe_quality,
    quality_checks,
    run_observed_available_now,
)
from keystone_spark.sources import load_table


def test_batch_observation_counts_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None), (5, None)],
        "id long, v string",
    )
    observed, obs = observe_quality(df)
    assert observed.count() == 5  # the action that computes the metrics
    got = obs.get
    assert got["n_rows"] == 5
    assert got["n_null_id"] == 0
    assert got["n_null_v"] == 3


def test_batch_observation_custom_checks(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    observed, obs = observe_quality(
        li,
        checks=[
            F.count(F.lit(1)).alias("n_rows"),
            F.sum((F.col("l_quantity") <= 0).cast("long")).alias("n_bad_qty"),
            F.sum(
                ((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).cast(
                    "long"
                )
            ).alias("n_bad_discount"),
        ],
    )
    n = observed.count()
    got = obs.get
    assert got["n_rows"] == n
    assert got["n_bad_qty"] == 0 and got["n_bad_discount"] == 0


def test_streaming_observed_metrics_match_batch(spark, sf_dir):
    from keystone_spark.streaming.windows import read_events_stream

    events = load_table(spark, "events", sf_dir)
    n = events.count()
    checks = [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("user_id").isNull().cast("long")).alias("n_null_user"),
    ]
    stream_in = read_events_stream(spark, f"{sf_dir}/events.parquet")
    got = run_observed_available_now(stream_in, "observe_out", checks)
    assert got["n_rows"] == n
    assert got["n_null_user"] == 0
    assert spark.sql("SELECT count(*) FROM observe_out").first()[0] == n


def test_quality_checks_shape(spark):
    df = spark.createDataFrame([(1, 2.0)], "a long, b double")
    exprs = quality_checks(df)
    assert len(exprs) == 3  # n_rows + one null counter per column


def test_constraint_checks_counts_each_violation_class(spark):
    from keystone_spark.operators.observe import constraint_checks

    df = spark.createDataFrame(
        [
            (1, 10, 5.0), (2, None, 5.0), (3, 10, -1.0),
            (4, 99, 5.0),          # orphan fk
            (1, 10, 5.0), (1, 10, 5.0),  # key 1 x3 -> 2 extras
        ],
        "k long, fk long, v double",
    )
    dim = spark.createDataFrame([(10,), (11,)], ["pk"])
    out = {r["check"]: r.violations for r in constraint_checks(
        df,
        not_null=["fk"],
        unique=[["k"]],
        ranges={"v": (0.0, 100.0)},
        foreign_keys=[("fk", dim, "pk")],
    ).collect()}
    assert out == {
        "not_null:fk": 1,
        "unique:k": 2,
        "range:v": 1,
        "fk:fk->pk": 1,
    }


def test_constraint_checks_clean_table_all_zero(spark):
    from keystone_spark.operators.observe import constraint_checks

    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double")
    out = constraint_checks(df, not_null=["v"], unique=[["k"]],
                            ranges={"v": (0.0, 10.0)})
    assert all(r.violations == 0 for r in out.collect())


def test_key_skew_profile_hand_case(spark):
    """Exact counts/shares/skew on a hand-built skewed key column."""
    from keystone_spark.operators.observe import key_skew_profile

    # key 'a' x 6, 'b' x 3, 'c' x 1 -> total 10, 3 keys, mean group 10/3
    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, ["k"])
    out = key_skew_profile(df, "k", top_k=2).orderBy("rank").collect()
    assert [(r.rank, r.key, r.cnt) for r in out] == [(1, "a", 6), (2, "b", 3)]
    assert out[0].share == 0.6 and out[1].share == 0.3
    assert out[0].cum_share == 0.6 and out[1].cum_share == 0.9
    assert out[0].skew == round(6 / (10 / 3), 6)
    # ties rank deterministically by key string
    df2 = spark.createDataFrame([("x",), ("y",), ("x",), ("y",)], ["k"])
    out2 = key_skew_profile(df2, "k", top_k=2).orderBy("rank").collect()
    assert [(r.rank, r.key) for r in out2] == [(1, "x"), (2, "y")]


def test_psi_drift_detects_shift(spark):
    """A mean-shifted group drifts (psi >> 0.1); an identically
    distributed group does not; bins come from the REFERENCE deciles."""
    import numpy as np

    from keystone_spark.operators.observe import psi_drift

    rng = np.random.default_rng(3)
    stable_ref = [("stable", float(v)) for v in rng.normal(0, 1, 400)]
    stable_cur = [("stable", float(v)) for v in rng.normal(0, 1, 400)]
    shift_ref = [("shift", float(v)) for v in rng.normal(0, 1, 400)]
    shift_cur = [("shift", float(v)) for v in rng.normal(3, 1, 400)]
    ref = spark.createDataFrame(stable_ref + shift_ref, "g string, v double")
    cur = spark.createDataFrame(stable_cur + shift_cur, "g string, v double")
    out = {r.g: r for r in psi_drift(ref, cur, "g", "v").collect()}
    assert out["shift"].drifted and out["shift"].psi > 1.0
    assert not out["stable"].drifted and out["stable"].psi < 0.1
    assert out["shift"].n_ref == 400 and out["shift"].n_cur == 400
