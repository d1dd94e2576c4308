"""Property-based tests (hypothesis) for the Column-function layer.

The reference uses seeded-random suites (SURVEY §5.2); these go further on
the pure-expression functions where invariants are crisp. Examples are
kept small (max_examples=10, one-row DataFrames) so each property costs
~seconds, not minutes.
"""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

words = st.lists(
    st.text(alphabet="abcdefghijklmnop", min_size=1, max_size=8),
    min_size=0,
    max_size=12,
)


@SETTINGS
@given(toks=words, n=st.integers(1, 4))
def test_word_ngram_count_property(spark, toks, n):
    from keystone_spark.functions.text import word_ngrams

    df = spark.createDataFrame([(toks,)], "t array<string>")
    got = df.select(F.size(word_ngrams("t", n)).alias("c")).first().c
    assert got == max(0, len(toks) - n + 1)


@SETTINGS
@given(toks=words.filter(lambda t: len(t) > 0))
def test_simhash_is_order_invariant(spark, toks):
    """Bit votes sum over tokens — permuting the token array must not
    change the signature."""
    from keystone_spark.functions.text import simhash64

    rev = list(reversed(toks))
    df = spark.createDataFrame([(toks, rev)], "a array<string>, b array<string>")
    row = df.select(
        simhash64(F.col("a")).alias("sa"), simhash64(F.col("b")).alias("sb")
    ).first()
    assert row.sa == row.sb


@SETTINGS
@given(
    xs=st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, width=32), min_size=1, max_size=16
    )
)
def test_sparsify_densify_roundtrip_property(spark, xs):
    from keystone_spark.operators.stats import Densify, Sparsify

    xs = [float(np.float32(x)) for x in xs]
    df = spark.createDataFrame([(0, xs)], "id int, features array<double>")
    back = Densify(len(xs), "sparse", "dense")(Sparsify("features")(df))
    assert back.first().dense == xs


@SETTINGS
@given(
    xs=st.lists(st.floats(-100, 100, allow_nan=False, width=32), min_size=1, max_size=16)
)
def test_rectifier_is_nonnegative_and_identity_on_positive(spark, xs):
    from keystone_spark.operators.stats import LinearRectifier

    xs = [float(np.float32(x)) for x in xs]
    df = spark.createDataFrame([(0, xs)], "id int, features array<double>")
    out = LinearRectifier("features", "r", alpha=0.0)(df).first().r
    assert all(v >= 0 for v in out)
    assert out == [max(x, 0.0) for x in xs]
