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
