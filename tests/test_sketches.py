"""Count-Min heavy hitters: exactness at ample width, the one-sided
overestimate guarantee under adversarial (tiny) width, and merge
correctness across partitions."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from keystone_spark.operators.sketches import count_min_topk


@pytest.fixture(scope="module")
def words_df(spark):
    # zipf-ish corpus with a known exact answer, spread over partitions
    words = []
    for i, (w, n) in enumerate(
        [("alpha", 400), ("beta", 300), ("gamma", 200), ("delta", 100),
         ("eps", 50), ("zeta", 25), ("eta", 12), ("theta", 6)]
    ):
        words += [w] * n
    extra = [f"rare_{i}" for i in range(200)]
    df = spark.createDataFrame(
        [(w,) for w in words + extra], "w string"
    ).repartition(8)
    return df


def test_topk_exact_at_ample_width(words_df):
    got = count_min_topk(words_df, "w", k=5)
    assert got == [
        ("alpha", 400), ("beta", 300), ("gamma", 200), ("delta", 100),
        ("eps", 50),
    ]


def test_overestimate_only_at_tiny_width(words_df):
    """CMS never undercounts: with width 8 collisions are guaranteed, but
    every estimate must still be >= the true count, and the top hitter
    must survive (its estimate dominates)."""
    truth = Counter(
        r["w"] for r in words_df.collect()
    )
    got = dict(count_min_topk(words_df, "w", k=50, width=8))
    for key, est in got.items():
        assert est >= truth[key], (key, est, truth[key])
    assert max(got, key=lambda k: (got[k], k == "alpha")) == "alpha"


def test_merge_matches_single_partition(words_df):
    """Sketch merge is exact: 8-partition treeReduce result equals the
    1-partition result (same width/depth/seedless hashing)."""
    many = count_min_topk(words_df, "w", k=8)
    one = count_min_topk(words_df.coalesce(1), "w", k=8)
    assert many == one


def test_nulls_ignored(spark):
    df = spark.createDataFrame(
        [("x",), (None,), ("x",), (None,), ("y",)], "w string"
    )
    assert count_min_topk(df, "w", k=2) == [("x", 2), ("y", 1)]


def test_high_cardinality_capped_union(spark):
    """5000 distinct keys across 8 partitions: every merge's candidate
    union exceeds cpp (k=5 -> cpp=20), so the cap path is exercised —
    and the true heavy hitters must still come out exactly."""
    rows = [("heavy_a",)] * 500 + [("heavy_b",)] * 300 + [("heavy_c",)] * 100
    rows += [(f"tail_{i:05d}",) for i in range(5000)]
    df = spark.createDataFrame(rows, "w string").repartition(8)
    got = count_min_topk(df, "w", k=3)
    assert got == [("heavy_a", 500), ("heavy_b", 300), ("heavy_c", 100)]


def test_key_hash_matches_scalar_fnv():
    """The byte-matrix vectorized FNV-1a must be bit-identical to the
    textbook per-byte scalar loop, including empty and multibyte utf-8."""
    import numpy as np
    import pandas as pd

    from keystone_spark.operators.sketches import _key_hash

    def scalar(v: str) -> int:
        h = 0xCBF29CE484222325
        for b in str(v).encode("utf-8"):
            h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h

    keys = ["", "a", "alpha", "héllo wörld", "数据", "x" * 257, "0", "tail_00042"]
    got = _key_hash(pd.Series(keys))
    want = np.array([scalar(k) for k in keys], dtype=np.uint64)
    assert (got == want).all()


def test_kmv_exact_when_unsaturated(spark):
    from keystone_spark.operators.sketches import kmv_build

    df = spark.createDataFrame(
        [(i % 37,) for i in range(500)] + [(None,)], "v long"
    ).repartition(8)
    sk = kmv_build(df, "v", k=1024)
    assert not sk.saturated
    assert sk.estimate() == 37.0  # exact below k; nulls ignored


def test_kmv_saturated_error_bound(spark):
    """Saturated regime: (k-1)/theta estimate within ~4/sqrt(k) relative
    error of the true 20k distinct values (deterministic hashes)."""
    from keystone_spark.operators.sketches import kmv_build

    n = 20000
    df = spark.range(n).withColumnRenamed("id", "v").repartition(8)
    sk = kmv_build(df, "v", k=512)
    assert sk.saturated
    rel = abs(sk.estimate() - n) / n
    assert rel < 4 / (512 ** 0.5), rel


def test_kmv_union_and_intersection(spark):
    """A = 0..999, B = 500..1499: union 1500, intersection 500 — both
    exact when unsaturated; union commutes; merge across partitions
    equals the single-partition build."""
    from keystone_spark.operators.sketches import kmv_build

    a_df = spark.range(0, 1000).withColumnRenamed("id", "v").repartition(6)
    b_df = spark.range(500, 1500).withColumnRenamed("id", "v").repartition(6)
    a, b = kmv_build(a_df, "v", k=4096), kmv_build(b_df, "v", k=4096)
    assert a.union(b).estimate() == 1500.0
    assert b.union(a).estimate() == 1500.0
    assert a.intersect_estimate(b) == 500.0

    one = kmv_build(a_df.coalesce(1), "v", k=4096)
    assert (one.hashes == a.hashes).all()


def test_kmv_intersection_saturated_estimate(spark):
    """Saturated intersection: |A∩B| estimate stays within 15% with
    k=1024 on a 5k-element overlap of two 10k sets."""
    from keystone_spark.operators.sketches import kmv_build

    a_df = spark.range(0, 10000).withColumnRenamed("id", "v")
    b_df = spark.range(5000, 15000).withColumnRenamed("id", "v")
    a, b = kmv_build(a_df, "v", k=1024), kmv_build(b_df, "v", k=1024)
    est = a.intersect_estimate(b)
    assert abs(est - 5000) / 5000 < 0.15, est
