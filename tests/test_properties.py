"""Property-based tests (hypothesis) for the Column-function layer.

The reference uses seeded-random suites (SURVEY §5.2); these go further on
the pure-expression functions where invariants are crisp. Examples are
kept small (max_examples=10, one-row DataFrames) so each property costs
~seconds, not minutes.
"""

import numpy as np
import pytest
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


# --- codec round-trip properties (pure numpy, no Spark session) ---

_img_shapes = st.tuples(
    st.integers(1, 24), st.integers(1, 24), st.sampled_from([1, 3, 4])
)


@settings(max_examples=25, deadline=None)
@given(shape=_img_shapes, seed=st.integers(0, 2**31 - 1))
def test_png_roundtrip_property(shape, seed):
    """Any uint8 image round-trips PNG bit-exactly (lossless codec)."""
    from keystone_spark.functions.codecs import decode_png, encode_png

    h, w, c = shape
    img = np.random.default_rng(seed).integers(0, 256, size=(h, w, c),
                                               dtype=np.uint8)
    back = decode_png(encode_png(img))
    assert back.shape == (h, w, c)
    assert np.array_equal((back * 255).round().astype(np.uint8), img)


@settings(max_examples=15, deadline=None)
@given(
    n=st.integers(1, 2000),
    sr=st.sampled_from([8000, 16000, 44100]),
    ch=st.sampled_from([1, 2]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, sr, ch, seed):
    """Any PCM clip round-trips WAV within 16-bit quantization."""
    from keystone_spark.functions.codecs import decode_wav, encode_wav

    pcm = np.random.default_rng(seed).uniform(-1, 1, size=n)
    sr2, back = decode_wav(encode_wav(pcm, sr, n_channels=ch))
    assert sr2 == sr and len(back) == n
    assert np.allclose(back, pcm, atol=2.0 / 32767)


@settings(max_examples=10, deadline=None)
@given(
    shape=st.tuples(st.integers(1, 20), st.integers(1, 20)),
    c=st.sampled_from([1, 3]),
    sub=st.sampled_from(["444", "420"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_roundtrip_property(shape, c, sub, seed):
    """Any image survives JPEG at q=95 with bounded loss: shape and range
    preserved, PSNR above a floor even for pure noise (the worst case)."""
    from keystone_spark.functions.codecs import decode_jpeg, encode_jpeg

    if c == 1 and sub == "420":
        sub = "444"  # grayscale has no chroma to subsample
    h, w = shape
    img = np.random.default_rng(seed).random((h, w, c))
    back = decode_jpeg(encode_jpeg(img, quality=95, subsample=sub))
    assert back.shape == (h, w, c if c == 3 else 1)
    assert back.min() >= 0.0 and back.max() <= 1.0
    if sub == "444":
        mse = np.mean((back[:, :, : img.shape[2]] - img) ** 2)
        assert 10 * np.log10(1.0 / max(mse, 1e-12)) > 30


@SETTINGS
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    c=st.sampled_from([1, 3]),
    q=st.sampled_from([45, 90]),
    sub=st.sampled_from(["444", "420"]),
    seed=st.integers(0, 2**16),
)
def test_progressive_jpeg_equals_baseline_property(h, w, c, q, sub, seed):
    """For ANY image/quality/subsampling, decode(progressive encode) must
    be bit-identical to decode(baseline encode) — successive
    approximation reconstructs the shared quantized coefficients
    losslessly."""
    from keystone_spark.functions.codecs import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(seed)
    img = rng.random((h, w)) if c == 1 else rng.random((h, w, c))
    base = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=q, subsample=sub))
    assert np.array_equal(base, prog)


@SETTINGS
@given(
    vals=st.lists(st.integers(-1000, 1000), min_size=0, max_size=300),
    k=st.sampled_from([16, 64]),
)
def test_kmv_exactness_property(vals, k):
    """Below saturation the KMV estimate equals the exact distinct count;
    at/above saturation it never exceeds the hash-space bound and the
    sketch keeps exactly k hashes."""
    import pandas as pd

    from keystone_spark.operators.sketches import KmvSketch

    # driver-side build through the same hashing contract (xxhash64 of
    # str) is overkill here; the estimator properties are pure-numpy
    hs = np.unique(
        np.fromiter(
            (hash(("kmv", v)) & 0xFFFFFFFFFFFFFFFF for v in set(vals)),
            dtype=np.uint64,
            count=len(set(vals)),
        )
    )
    sk = KmvSketch(k, hs[:k])
    n = len(set(vals))
    if n < k:
        assert sk.estimate() == float(len(hs[:k]))
    else:
        assert sk.saturated and len(sk.hashes) == k
        assert sk.estimate() > 0


@SETTINGS
@given(
    docs=st.lists(
        st.lists(
            st.text(alphabet="abc ", min_size=1, max_size=6).map(str.strip),
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_line_dedup_identity_below_threshold(spark, docs):
    """With max_docs >= corpus size no line can be removed: line_dedup
    must reproduce every document byte-for-byte (order preserved), for
    arbitrary line content including empties and duplicates in-doc."""
    from keystone_spark.operators.curation import line_dedup

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r.clean_text
           for r in line_dedup(df, max_docs=len(docs)).collect()}
    assert out == dict(rows)


@SETTINGS
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(
            lambda p: p[0] != p[1]
        ),
        min_size=0,
        max_size=10,
    )
)
@pytest.mark.slow
def test_semantic_clusters_vs_union_find(spark, pairs):
    """Distributed connected components + singleton spine must equal a
    driver-side union-find over the same edges."""
    from keystone_spark.operators.dedup import semantic_clusters

    ids = list(range(16))
    parent = list(range(16))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: min(j for j in ids if find(j) == find(i)) for i in ids}

    pdf = spark.createDataFrame(pairs or [(0, 0)], ["i", "j"])
    if not pairs:
        pdf = pdf.where("i <> j")  # empty edge set
    ids_df = spark.createDataFrame([(i,) for i in ids], ["vec_id"])
    got = {r.vec_id: r.cluster_id
           for r in semantic_clusters(pdf, ids_df).collect()}
    assert got == want


@SETTINGS
@given(
    base=st.dictionaries(st.integers(0, 9), st.integers(0, 99),
                         min_size=0, max_size=6),
    changes=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 99),
                  st.sampled_from(["U", "D", "I"])),
        min_size=0, max_size=12,
    ),
)
def test_apply_changes_matches_dict_fold(spark, base, changes):
    """MERGE fold == a sequential dict fold for arbitrary changelogs:
    latest change per key wins (seq = position), deletes remove, any
    other op upserts."""
    from keystone_spark.operators.curation import apply_changes

    base_df = spark.createDataFrame(
        [(k, v) for k, v in base.items()] or [(None, None)],
        "k int, v int",
    )
    if not base:
        base_df = base_df.where("k IS NOT NULL")
    ch_df = spark.createDataFrame(
        [(k, v, op, i) for i, (k, v, op) in enumerate(changes)]
        or [(None, None, None, None)],
        "k int, v int, op string, seq int",
    )
    if not changes:
        ch_df = ch_df.where("k IS NOT NULL")

    want = dict(base)
    for k, v, op in changes:  # in seq order
        if op == "D":
            want.pop(k, None)
        else:
            want[k] = v
    got = {r.k: r.v
           for r in apply_changes(base_df, ch_df, ["k"], seq_col="seq")
           .collect()}
    assert got == want


@SETTINGS
@given(
    old=st.dictionaries(st.integers(0, 7),
                        st.one_of(st.none(), st.integers(0, 3)),
                        min_size=0, max_size=6),
    new=st.dictionaries(st.integers(0, 7),
                        st.one_of(st.none(), st.integers(0, 3)),
                        min_size=0, max_size=6),
)
def test_diff_apply_roundtrip_property(spark, old, new):
    """diff -> apply reproduces the target snapshot for arbitrary pairs."""
    from keystone_spark.operators.curation import apply_changes, diff_snapshots

    def mk(d):
        df = spark.createDataFrame(
            [(k, v) for k, v in d.items()] or [(None, None)], "k int, v int"
        )
        return df.where("k IS NOT NULL") if not d else df

    diff = diff_snapshots(mk(old), mk(new), ["k"])
    got = {r.k: r.v for r in apply_changes(mk(old), diff, ["k"]).collect()}
    assert got == new
