"""Unit tests for keystone_spark.functions — numpy oracles, seeded inputs
(the reference's test style: Stats.aboutEq numeric-tolerance checks,
see SURVEY.md §5)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from keystone_spark.functions.vector import dot, l2_norm, cosine_similarity, scale_shift
from keystone_spark.functions.text import (
    tokens,
    word_ngrams,
    char_shingles,
    token_count,
    simhash64,
    hamming64,
    rolling_fingerprint,
)

RNG = np.random.default_rng(42)


@pytest.fixture(scope="module")
def vec_df(spark):
    a = RNG.normal(size=(16, 8)).tolist()
    b = RNG.normal(size=(16, 8)).tolist()
    return spark.createDataFrame(
        [(i, a[i], b[i]) for i in range(16)], "id int, a array<double>, b array<double>"
    ), np.array(a), np.array(b)


def test_dot_and_norms(vec_df):
    df, a, b = vec_df
    rows = df.select("id", dot("a", "b").alias("d"), l2_norm("a").alias("n")).collect()
    for r in rows:
        assert math.isclose(r.d, float(a[r.id] @ b[r.id]), rel_tol=1e-9)
        assert math.isclose(r.n, float(np.linalg.norm(a[r.id])), rel_tol=1e-9)


def test_cosine(vec_df):
    df, a, b = vec_df
    rows = df.select("id", cosine_similarity("a", "b").alias("c")).collect()
    for r in rows:
        exp = float(a[r.id] @ b[r.id] / (np.linalg.norm(a[r.id]) * np.linalg.norm(b[r.id])))
        assert math.isclose(r.c, exp, rel_tol=1e-9)


def test_cosine_zero_norm(spark):
    df = spark.createDataFrame([([0.0, 0.0], [1.0, 2.0])], "a array<double>, b array<double>")
    assert df.select(cosine_similarity("a", "b").alias("c")).first().c is None


def test_scale_shift(vec_df):
    df, a, _ = vec_df
    r = df.orderBy("id").select(scale_shift("a", 2.0, 1.0).alias("s")).first()
    np.testing.assert_allclose(np.array(r.s), a[0] * 2.0 + 1.0, rtol=1e-12)


def test_tokens_and_ngrams(spark):
    df = spark.createDataFrame([("  The quick brown fox, jumps!  ",)], "t string")
    r = df.select(
        tokens("t").alias("toks"),
        word_ngrams(tokens("t"), 2).alias("bi"),
        token_count("t").alias("tc"),
    ).first()
    assert r.toks == ["the", "quick", "brown", "fox", "jumps"]
    assert r.bi == ["the quick", "quick brown", "brown fox", "fox jumps"]
    assert r.tc == 5


def test_ngrams_short_input(spark):
    df = spark.createDataFrame([(["a"],)], "toks array<string>")
    assert df.select(word_ngrams("toks", 3).alias("g")).first().g == []


def test_char_shingles(spark):
    df = spark.createDataFrame([("abcdef",)], "t string")
    r = df.select(char_shingles("t", 4).alias("s")).first()
    assert r.s == ["abcd", "bcde", "cdef"]


def test_simhash_properties(spark):
    base = "the quick brown fox jumps over the lazy dog " * 4
    near = base.replace("lazy", "sleepy")
    far = "completely different words entirely unrelated content here " * 4
    df = spark.createDataFrame([(0, base), (1, near), (2, far)], "id int, t string")
    h = df.select("id", simhash64(tokens("t")).alias("h")).orderBy("id").collect()
    d_near = bin(h[0].h ^ h[1].h).count("1")
    d_far = bin(h[0].h ^ h[2].h).count("1")
    assert d_near < d_far, (d_near, d_far)
    # deterministic + consistent with the hamming64 column fn
    r = (
        spark.createDataFrame([(h[0].h, h[1].h)], "a long, b long")
        .select(hamming64("a", "b").alias("d"))
        .first()
    )
    assert r.d == d_near


def test_rolling_fingerprint_shift_invariance(spark):
    doc = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    shifted = "PREFIX " + doc  # winnowing min-hash usually survives a prefix edit
    df = spark.createDataFrame([(0, doc), (1, doc), (2, "x y")], "id int, t string")
    rows = df.select("id", rolling_fingerprint(tokens("t"), 4).alias("f")).collect()
    fs = {r.id: r.f for r in rows}
    assert fs[0] == fs[1]          # deterministic
    assert fs[2] is not None       # short-doc fallback works


def test_redact_pii_and_count(spark):
    from keystone_spark.functions.text import pii_count, redact_pii
    from pyspark.sql import functions as F

    rows = [
        (1, "mail a.b-c_9@sub.example.org now"),
        (2, "call 555-123-4567 or 555.123.4567"),
        (3, "host 192.168.0.1 up"),
        (4, "clean text, no pii at all"),
        # phone digits must not double-count as an IP once redacted
        (5, "x 555-123-4567 at 10.0.0.7"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {
        r.id: (r.red, r.n)
        for r in df.select(
            "id",
            redact_pii("t").alias("red"),
            pii_count("t").alias("n"),
        ).collect()
    }
    assert got[1] == ("mail [EMAIL] now", 1)
    assert got[2] == ("call [PHONE] or [PHONE]", 2)
    assert got[3] == ("host [IP] up", 1)
    assert got[4] == ("clean text, no pii at all", 0)
    assert got[5] == ("x [PHONE] at [IP]", 2)


def test_repetition_signals_known_values(spark):
    from keystone_spark.functions.text import repetition_signals
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "x y z w"), (3, "q")], "id long, t string"
    )
    sig = repetition_signals(F.split("t", " "))
    got = {r.id: r.s.asDict() for r in df.select("id", sig.alias("s")).collect()}
    # "a b a b a": 5 tokens, 2 distinct, bigrams [ab,ba,ab,ba] -> top 2/4
    assert got[1]["n_tokens"] == 5
    assert abs(got[1]["distinct_ratio"] - 0.4) < 1e-9
    assert got[1]["top_bigram_count"] == 2
    assert abs(got[1]["top_bigram_frac"] - 0.5) < 1e-9
    # all-distinct doc: ratio 1.0, every bigram unique
    assert got[2]["distinct_ratio"] == 1.0 and got[2]["top_bigram_count"] == 1
    # single token: no bigrams -> count 0, frac null
    assert got[3]["top_bigram_count"] == 0 and got[3]["top_bigram_frac"] is None


def test_redact_pii_is_codegen_only(spark):
    """The scrub pass must stay JVM-side: no BatchEvalPython stage."""
    from keystone_spark.functions.text import redact_pii

    df = spark.range(10).select(F.concat(F.lit("u@x.io "), F.col("id").cast("string")).alias("t"))
    plan = df.select(redact_pii("t")). _jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_gopher_rules_each_rule_fires(spark):
    from keystone_spark.functions.text import gopher_rules

    docs = spark.createDataFrame(
        [
            (0, "the cat and the dog sat on a mat with his toys they are "
                "happy for it was a good day in the sun and all was well"),
            (1, "word " * 3),                       # too few words
            (2, "the a " + "# " * 50 + "cat dog"),  # symbol spam
            (3, "- a\n- b\n- c\nthe cat"),          # bullet lines
            (4, "the cat...\nand dog...\nthe end"), # ellipsis lines
            (5, "the a " + "12345678901234567890 " * 30),  # digits
        ],
        ["doc_id", "text"],
    )
    g = gopher_rules(
        "text", min_words=10, max_bullet_line_frac=0.5,
        max_ellipsis_line_frac=0.3, min_stop_hits=2,
    )
    out = {r.doc_id: r for r in docs.select("doc_id", g.alias("g"))
           .select("doc_id", "g.*").collect()}
    assert out[0].passes
    assert not out[1].ok_words
    assert not out[2].ok_symbol
    assert not out[3].ok_bullet
    assert not out[4].ok_ellipsis
    assert not out[5].ok_alpha and not out[5].ok_mean_len
    assert not any(out[i].passes for i in range(1, 6))


def test_hashed_tf_map_matches_exploded_counts(spark):
    """The explode-free map form must agree with naive per-token
    counting, collisions included; buckets stay in [0, dim)."""
    from collections import Counter

    from keystone_spark.functions.text import hash_bucket, hashed_tf, tokens

    df = spark.createDataFrame(
        [(0, "the cat and the dog and the cat")], ["doc_id", "text"]
    ).withColumn("toks", tokens("text"))
    m = df.select(hashed_tf("toks", 16).alias("m")).first().m
    per_tok = df.select(F.explode("toks").alias("t")).select(
        hash_bucket("t", 16).alias("b")
    ).collect()
    want = Counter(r.b for r in per_tok)
    assert m == dict(want)
    assert all(0 <= b < 16 for b in m)


def test_canonicalize_url_variants(spark):
    """Every noisy variant of the same logical URL canonicalizes to one
    string; distinct logical URLs stay distinct (r7 web-dedup op)."""
    from keystone_spark.functions.text import canonicalize_url

    cases = [
        # (input, expected canonical)
        ("https://WWW.Example.COM/a/b?q=1", "https://www.example.com/a/b?q=1"),
        ("https://www.example.com/a/b/?q=1", "https://www.example.com/a/b?q=1"),
        ("https://www.example.com/a/b?q=1#frag", "https://www.example.com/a/b?q=1"),
        ("https://www.example.com/a/b?q=1&utm_source=x", "https://www.example.com/a/b?q=1"),
        ("https://www.example.com/a/b?utm_campaign=y&q=1", "https://www.example.com/a/b?q=1"),
        ("https://www.example.com/a/b?utm_source=x&utm_medium=z", "https://www.example.com/a/b"),
        ("https://www.example.com/a/b?ref=abc&fbclid=123", "https://www.example.com/a/b"),
        ("HTTPS://Host.Org/Path/", "https://host.org/Path"),  # path case KEPT
        ("https://host.org/", "https://host.org"),
        ("https://host.org/x?gclid=9&q=2&ref=r", "https://host.org/x?q=2"),
        # ADVICE r7: param-name match must anchor to a ?/& separator —
        # "href"/"pref" contain "ref" but are NOT tracking params
        ("https://host.org/x?href=abc", "https://host.org/x?href=abc"),
        ("https://host.org/x?a=1&pref=keep&ref=drop",
         "https://host.org/x?a=1&pref=keep"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)],
                               ["i", "url"])
    got = {r.i: r.c for r in
           df.select("i", canonicalize_url("url").alias("c")).collect()}
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, f"{u!r}: {got[i]!r} != {want!r}"
