"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps operator names (SURVEY.md §2 rows) to Spark DataFrame
builders; ``oracle_sql()`` gives the DuckDB-dialect equivalent run against
the same parquet fixtures. Column names and types are aligned pairwise
(driver hashes values after sorting columns by name).

Determinism rules (FIXTURES.md §3): unique-key final ORDER BY, ROUND(x, 6)
on float outputs, timestamps emitted as DATE or epoch-second BIGINT,
integer computed columns cast to BIGINT on the Spark side (DuckDB's
COUNT/ROW_NUMBER/LEN are all BIGINT).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from keystone_spark.sources import load_table
from keystone_spark.operators.relational import top_k_per_group


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# ---------------------------------------------------------------------------
# relational surface (SURVEY §2.11)
# ---------------------------------------------------------------------------

def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan + filter + project; predicates/column-prune push into parquet."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where((F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
                 & (F.col("l_quantity") > 25))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("net"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


def q_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregation, partial+final (Tungsten)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("l_quantity"), 6).alias("sq"),
            F.round(F.avg("l_extendedprice"), 6).alias("ap"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_multi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way star join; region/nation are broadcast by Catalyst (tiny dims)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count("*").alias("n_orders"),
             F.round(F.sum("o_totalprice"), 6).alias("rev"))
        .orderBy("r_name", "n_name")
    )


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — TopKClassifier generalized to groups."""
    o = _t(spark, sf_dir, "orders")
    out = top_k_per_group(
        o, ["o_custkey"], [F.col("o_totalprice").desc(), F.col("o_orderkey")], k=3
    )
    return (
        out.select("o_custkey", "o_orderkey", F.col("rk").cast("long").alias("rk"))
        .orderBy("o_custkey", "rk")
    )


def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 6).alias("run"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_extendedprice"), 6).alias("s"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(),
                 F.col("l_linestatus").asc_nulls_first())
    )


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(),
                 F.col("l_linestatus").asc_nulls_first())
    )


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT + EXCEPT, tagged and unioned into one deterministic result."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    pos = c.where(F.col("c_acctbal") > 0).select("c_custkey")
    inter = pos.intersect(o).select(F.lit("i").alias("op"), "c_custkey")
    exc = pos.exceptAll(o).distinct().select(F.lit("e").alias("op"), "c_custkey")
    return inter.unionByName(exc).orderBy("op", "c_custkey")


def q_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return (
        p.where(F.col("p_name").like("%a%"))
        .select(
            "p_partkey",
            F.upper(F.substring("p_name", 1, 5)).alias("u"),
            F.length("p_name").cast("long").alias("l"),
            F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("t"),
        )
        .orderBy("p_partkey")
    )


def q_date_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("m"))
        .agg(F.count("*").alias("c"))
        .orderBy("m")
    )


def q_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("d"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# events: time windows, JSON, sessionization, as-of (SURVEY §2.9/§2.11)
# ---------------------------------------------------------------------------

def q_event_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h window agg (batch form of the streaming window)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("c"), F.round(F.sum("value"), 6).alias("v"))
        .select(
            F.unix_timestamp(F.col("win.start")).alias("w"),
            "event_type", "c", "v",
        )
        .orderBy("w", "event_type")
    )


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .orderBy("event_id")
    )


def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min) via lag + cumulative session ids —
    the batch-equivalent of session_window (streaming path in
    keystone_spark.streaming)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "user_id", "event_id", "ts", F.lag("ts").over(w).alias("prev")
    ).withColumn(
        "new_sess",
        F.when(
            F.col("prev").isNull()
            | (F.col("ts") > F.col("prev") + F.expr("INTERVAL 30 MINUTES")),
            1,
        ).otherwise(0),
    )
    sess = gaps.withColumn(
        "sid", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy("user_id", "sid")
        .agg(
            F.count("*").alias("n"),
            F.unix_timestamp(F.min("ts")).alias("t0"),
            F.unix_timestamp(F.max("ts")).alias("t1"),
        )
        .select("user_id", F.col("sid").cast("long").alias("sid"), "n", "t0", "t1")
        .orderBy("user_id", "sid")
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of: for each 'error' event, the most recent 'signup' of the same
    user at-or-before it — merge formulation (union + running last over the
    user partition): one shuffle, no join fan-out
    (operators/relational.asof_join_merge)."""
    from keystone_spark.operators.relational import asof_join_merge

    e = _t(spark, sf_dir, "events")
    err = e.where(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    sig = e.where(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("s_ts"), F.col("ts").alias("sig_ts")
    )
    return (
        asof_join_merge(err, sig, on=["user_id"], left_ts="ts",
                        right_ts="s_ts", value_cols=["sig_ts"])
        .select("event_id", F.unix_timestamp("sig_ts").alias("signup_ts"))
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# text / NLP (SURVEY §2.2, §2.4; LLM-data text analysis)
# ---------------------------------------------------------------------------

def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TermFrequency / NGramsCounts analogue: corpus token counts, top-50."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "tok")
        .limit(50)
    )


def q_word_freq_encoder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordFrequencyEncoder / CommonSparseFeatures(k): rank-indexed top-100
    vocabulary (reference: nodes/nlp/WordFrequencyEncoder.scala,
    nodes/misc/CommonSparseFeatures.scala)."""
    d = _t(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    # limit-first (TakeOrderedAndProject): the top-100 are selected with a
    # partition-local top-k + tiny final merge, and only those 100 rows see
    # the rank window. The previous shape ranked the FULL vocabulary through
    # one unpartitioned window task — a driver-killer at 100 TB (VERDICT r1).
    top = counts.orderBy(F.col("c").desc(), "tok").limit(100)
    w = Window.orderBy(F.col("c").desc(), "tok")
    return (
        top.select("tok", "c", (F.row_number().over(w) - 1).cast("long").alias("idx"))
        .orderBy("idx")
    )


def q_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram counts (NGramsFeaturizer + NGramsCounts), top-50."""
    from keystone_spark.functions.text import word_ngrams

    d = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    return (
        d.select(F.explode(word_ngrams(toks, 2)).alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "g")
        .limit(50)
    )


def q_tf_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form smoothed IDF over the corpus, top-50 by document freq."""
    d = _t(spark, sf_dir, "documents")
    n_docs = d.count()
    df_tab = (
        d.select("doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("df"))
    )
    return (
        df_tab.select(
            "tok",
            "df",
            F.round(F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)) + 1.0, 6).alias("idf"),
        )
        .orderBy(F.col("df").desc(), "tok")
        .limit(50)
    )


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-quality signals per document (LLM-pipeline quality scoring)."""
    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    n_chars = F.length(t)
    n_tokens = F.size(F.filter(F.split(F.trim(t), " "), lambda x: x != ""))
    digits = F.length(F.regexp_replace(t, "[^0-9]", ""))
    return (
        d.select(
            "doc_id",
            n_chars.cast("long").alias("n_chars"),
            n_tokens.cast("long").alias("n_tokens"),
            F.round(digits / F.greatest(n_chars, F.lit(1)), 6).alias("digit_ratio"),
            F.round(n_chars / F.greatest(n_tokens, F.lit(1)).cast("double"), 6).alias("avg_tok_len"),
        )
        .orderBy("doc_id")
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup (dropDuplicates) + group count — documents table."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("lang", "source", "text")
        .dropDuplicates()
        .groupBy("lang", "source")
        .agg(F.count("*").alias("c"))
        .orderBy("lang", "source")
    )


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate scoring: pairwise token-set Jaccard via an
    inverted-index self-join (the scalable formulation — no N^2 cross join;
    at 100 TB you'd additionally LSH-bucket first, see operators/dedup.py).
    Restricted to doc_id < 40 for a deterministic, oracle-checkable result.
    """
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 40)
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    ).where(F.col("tok") != "")
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = toks.alias("a")
    b = toks.alias("b")
    inter = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("i"), F.col("b.doc_id").alias("j"))
        .agg(F.count("*").alias("c"))
    )
    na = sizes.select(F.col("doc_id").alias("i"), F.col("n").alias("ni"))
    nb = sizes.select(F.col("doc_id").alias("j"), F.col("n").alias("nj"))
    return (
        inter.join(na, "i").join(nb, "j")
        .select(
            "i", "j",
            F.round(F.col("c") / (F.col("ni") + F.col("nj") - F.col("c")), 6).alias("jac"),
        )
        .where(F.col("jac") >= 0.1)
        .orderBy("i", "j")
    )


# ---------------------------------------------------------------------------
# vectors / embeddings (SURVEY §2.4 StandardScaler, §2.11 similarity)
# ---------------------------------------------------------------------------

def q_scaler_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StandardScaler fit as SQL: per-dimension mean/std (first 8 dims).
    Reference: nodes/stats/StandardScaler.scala (treeAggregate moments) —
    here posexplode + hash agg gives the same partial+final shape."""
    e = _t(spark, sf_dir, "embeddings")
    return (
        e.select(F.posexplode("embedding").alias("i", "x"))
        .where(F.col("i") < 8)
        .groupBy("i")
        .agg(
            F.round(F.avg("x"), 6).alias("m"),
            F.round(F.stddev_samp("x"), 6).alias("s"),
        )
        .select(F.col("i").cast("long").alias("i"), "m", "s")
        .orderBy("i")
    )


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for 10 probe vectors. Arrow-batched gemm with
    map-side top-k pruning (operators/similarity.cosine_topk) — the
    KeystoneML rowsToMatrix+BLAS trick, Spark-first."""
    from keystone_spark.operators.similarity import cosine_topk

    e = _t(spark, sf_dir, "embeddings")
    probes = e.where(F.col("vec_id") < 10)
    out = cosine_topk(e, probes, k=10)
    return (
        out.select("probe", "vec_id", F.round("cos", 6).alias("cos"), "rk")
        .orderBy("probe", "rk")
    )


def q_one_hot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClassLabelIndicators: int label -> ±1 indicator for class 3
    (reference: nodes/util/ClassLabelIndicators.scala)."""
    e = _t(spark, sf_dir, "embeddings")
    return (
        e.select(
            "vec_id",
            F.when(F.col("label") == 3, 1.0).otherwise(-1.0).alias("y3"),
        )
        .orderBy("vec_id")
    )


def q_multiclass_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full per-class precision/recall/F1 as SQL (reference:
    evaluation/MulticlassClassifierEvaluator.scala) over the deterministic
    pred = vec_id % 10 rule."""
    from keystone_spark.operators.evaluation import multiclass_metrics

    e = _t(spark, sf_dir, "embeddings")
    preds = e.select("label", (F.col("vec_id") % 10).cast("long").alias("pred"))
    return multiclass_metrics(preds).select(
        F.col("cls").cast("long").alias("cls"), "support", "precision", "recall", "f1"
    ).orderBy("cls")


def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window (30-min gap) per user, batch path of the
    streaming operator (keystone_spark.streaming.session_window_agg)."""
    from keystone_spark.streaming.windows import session_window_agg

    e = _t(spark, sf_dir, "events")
    out = session_window_agg(e, gap="30 minutes", keys=("user_id",))
    return (
        out.select("user_id", "s_start", "n", F.round("sum_value", 6).alias("v"))
        .orderBy("user_id", "s_start")
    )


def q_standard_scaler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StandardScaler fit + transform (reference:
    nodes/stats/StandardScaler.scala): z-scores of the first 4 dims."""
    from keystone_spark.operators.stats import StandardScaler

    e = _t(spark, sf_dir, "embeddings")
    model = StandardScaler("embedding", "scaled")._fit(e)
    return (
        model(e)
        .select("vec_id", F.posexplode("scaled").alias("i", "z"))
        .where(F.col("i") < 4)
        .select("vec_id", F.col("i").cast("long").alias("i"), F.round("z", 6).alias("z"))
        .orderBy("vec_id", "i")
    )


_LM_SEED = 1234


def _lm_weights(dim: int = 64, k: int = 3):
    import numpy as np

    rng = np.random.default_rng(_LM_SEED)
    return rng.uniform(-1, 1, size=(dim, k)).round(4)


def q_linear_mapper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LinearMapper apply x->xW (reference: nodes/learning/LinearMapper.scala)
    as an Arrow-batched gemm; W is seeded and mirrored into the oracle SQL."""
    from keystone_spark.operators.learning import LinearMapper

    e = _t(spark, sf_dir, "embeddings")
    W = _lm_weights()
    scored = LinearMapper(W, in_col="embedding", out_col="scores")(e)
    return (
        scored.select("vec_id", F.posexplode("scores").alias("j", "s"))
        .select("vec_id", F.col("j").cast("long").alias("j"), F.round("s", 6).alias("s"))
        .orderBy("vec_id", "j")
    )


def _lm_oracle_sql() -> str:
    W = _lm_weights()
    values = ",".join(
        f"({i},{j},{W[i, j]!r})" for i in range(W.shape[0]) for j in range(W.shape[1])
    )
    return f"""
        WITH w(i, j, v) AS (VALUES {values}),
        ex AS (
            SELECT vec_id, i, CAST(list_extract(embedding, i + 1) AS DOUBLE) AS x
            FROM embeddings CROSS JOIN range(0, 64) r(i))
        SELECT ex.vec_id, CAST(w.j AS BIGINT) AS j, ROUND(SUM(ex.x * w.v), 6) AS s
        FROM ex JOIN w ON ex.i = w.i
        GROUP BY ex.vec_id, w.j ORDER BY ex.vec_id, w.j
    """


def q_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dedup over documents (keep-first policy).

    Driver-checkable exact oracle (VERDICT r1 #1): the final answer is the
    *verified* dedup set — LSH only generates candidates; survivors are
    decided by exact shingle-set Jaccard >= 0.8 — so DuckDB reproduces it
    with all-pairs shingle Jaccard (inverted-index form). LSH recall at this
    threshold is deterministic given the seed and was verified 1.0 against
    the oracle (fixture pairs sit at jac>=0.8 vs next-closest <0.4 — wide
    margin; banding catch prob per true pair > 1 - 3e-4)."""
    from keystone_spark.operators.dedup import minhash_dedup

    d = _t(spark, sf_dir, "documents")
    out = minhash_dedup(d, n_hashes=64, n_bands=16, threshold=0.8)
    final = out.select("doc_id").orderBy("doc_id")
    # carry the persist contract across the projection — the attribute
    # lives on the Python object, not the plan (ADVICE r7; without it the
    # bench release loop finds nothing and the drop-set cache leaks)
    final._keystone_caches = list(getattr(out, "_keystone_caches", []))
    return final


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: transitive closure of the verified jaccard>=0.8
    pair graph via distributed connected components (large-star/small-star,
    operators/graph.py) — {A~B, B~C} clusters A,B,C together even when A~C
    alone misses the threshold. cluster_id = min doc_id in the component.

    Exact oracle: membership is decided by exact-Jaccard verified pairs
    (LSH recall 1.0 at this config/scale, same argument as minhash_dedup),
    and DuckDB reproduces the closure with a recursive CTE over the
    all-pairs shingle-Jaccard graph."""
    from keystone_spark.operators.dedup import dedup_clusters

    d = _t(spark, sf_dir, "documents")
    out = dedup_clusters(d, n_hashes=64, n_bands=16, threshold=0.8)
    return out.select("doc_id", "cluster_id").orderBy("doc_id")


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs, exact-verified (VERDICT r1 #1).

    Candidates come from clique-combined SimHash banding: 16 4-bit
    segments, band keys = within-clique segment PAIRS (3 cliques -> 35
    bands of 8-bit keys, operators/dedup.clique_band_segments).
    Pigeonhole: a pair within Hamming 12 has >= 4 fully-agreeing
    segments, two of which share a clique, so recall through the
    hamming<=12 prefilter is STRUCTURAL at any scale point whose bucket
    occupancy stays under the cap. Fixture near-dups measure hamming <=
    12 at sf0.1. Survivors are decided by exact shingle Jaccard >= 0.8
    (same verify kernel as minhash_dedup), which DuckDB reproduces
    exactly — the signature itself never decides membership, so the
    xxhash64 bit voting needs no SQL twin.

    SCALE POSITION (r9, VERDICT r8 #3): a 64-bit signature at hamming
    <= 12 admits only constant (<= 8-bit) band keys under structural
    recall, so uncapped occupancy grows with CORPUS size and the band
    self-join with its square — r8's uncapped clique config measured
    758 s at sf5 (250k docs). The fix is structural, not a cap tune:
    operators/dedup.simhash_verified_pairs collapses exact-duplicate
    content FIRST (one min-agg), runs banding + verify over DISTINCT
    texts only, and fans verified pairs back over the duplicate
    families — work scales with distinct content (sf5: 5k distinct
    texts -> ~20 docs/bucket, no cap hit, FULL recall), and the
    remaining HAMMING_BUCKET_CAP=256 truncation guard only engages
    when distinct content itself saturates a bucket. Measured sf5
    (250k docs, warm workers): 758 s (r8) -> 234 s (truncation alone)
    -> 17.1 s (collapse-first, judge-measured on the shipped r9 tree
    with the THP fix + shingle binding; r10's committed sf5 gate
    snapshot pins the current median), vs r7's 71 s — and r7's number
    came with its cap dropping every oversized family wholesale, where
    this output is complete."""
    from keystone_spark.operators.dedup import simhash_verified_pairs

    d = _t(spark, sf_dir, "documents")
    out = simhash_verified_pairs(
        d, n_bands=16, max_hamming=12, band_cliques=3, threshold=0.8
    )
    final = out.orderBy("i", "j")
    final._keystone_caches = list(getattr(out, "_keystone_caches", []))
    return final


def q_lsh_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN: random-hyperplane LSH buckets + exact rerank.

    Correctness configuration (VERDICT r1 #1): 128 bits / 64 bands gives
    recall 1.0 at this scale (verified against the exact kernel), so the
    result equals exact cosine top-k and the DuckDB brute-force oracle
    checks it hash-exactly. Production tuning uses fewer bands per bit
    (sparser candidates); that recall/cost curve is pinned in
    tests/test_dedup_similarity.py rather than here."""
    from keystone_spark.operators.similarity import lsh_bucket_topk

    e = _t(spark, sf_dir, "embeddings")
    probes = e.where(F.col("vec_id") < 10)
    out = lsh_bucket_topk(e, probes, k=10, n_bits=128, n_bands=64)
    return out.select("probe", "vec_id", F.round("cos", 6).alias("cos"), "rk").orderBy(
        "probe", "rk"
    )


def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMeans fit invariants (reference: nodes/learning/KMeansPlusPlus.scala).

    The iterative fit is not SQL-expressible, so the declared result is the
    set of invariants a correct k-means must satisfy — exactly k non-empty
    clusters partitioning all N rows, and within-cluster SSE (vs cluster
    means) well below the global SSE — stated by the oracle as aggregates
    over the same table (VERDICT r1 #1). Exact centroid/assignment behavior
    is pinned in tests/test_learning.py."""
    from keystone_spark.operators.learning import KMeansEstimator

    e = _t(spark, sf_dir, "embeddings").where(F.col("embedding").isNotNull())
    ed = e.withColumn("features", F.col("embedding").cast("array<double>"))
    model = KMeansEstimator(k=10, seed=42).fit(ed)
    a = model(ed).select("cluster", "features")
    ex = a.select("cluster", F.posexplode("features").alias("i", "v"))
    within = (
        ex.groupBy("cluster", "i")
        .agg(
            (F.sum(F.col("v") * F.col("v")) - F.sum("v") * F.sum("v") / F.count("*")).alias("sse")
        )
        .agg(F.sum("sse").alias("within_sse"))
    )
    glob = (
        ex.groupBy("i")
        .agg(
            (F.sum(F.col("v") * F.col("v")) - F.sum("v") * F.sum("v") / F.count("*")).alias("sse")
        )
        .agg(F.sum("sse").alias("global_sse"))
    )
    summ = a.groupBy("cluster").agg(F.count("*").alias("n")).agg(
        F.count_distinct("cluster").cast("long").alias("n_clusters"),
        F.sum("n").cast("long").alias("total"),
        (F.min("n") >= 1).alias("nonempty_ok"),
    )
    return summ.crossJoin(within).crossJoin(glob).select(
        "n_clusters",
        "total",
        "nonempty_ok",
        # fixture embeddings are weakly clustered: measured within/global
        # ratio is 0.91-0.94 across SFs (deterministic, seeded); 0.97 still
        # separates a real fit from no-op assignment (ratio ~1.0)
        (F.col("within_sse") < 0.97 * F.col("global_sse")).alias("sse_reduced_ok"),
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary payload -> decode -> per-channel
    mean/std features, driver-checkable (VERDICT r1 #1).

    The payload path (text -> UTF-8 binary -> bytes on the Python side) is
    checked hash-exactly via octet_length + sha256 of the binary column —
    DuckDB computes the same digest — and the decoded-feature path is
    checked by invariants (6 features per image, channel means in [0,1],
    stds under the uniform bound). Pixel-exact decode equality is pinned in
    tests/test_multimodal.py."""
    from keystone_spark.operators.multimodal import decode_images, image_features

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    media = d.select("doc_id", F.encode("text", "UTF-8").alias("content"))
    imgs = decode_images(media, height=8, width=8, channels=3)
    out = image_features(imgs)
    means = F.slice("img_features", 1, 3)
    stds = F.slice("img_features", 4, 3)
    return out.select(
        "doc_id",
        F.octet_length("content").cast("long").alias("n_bytes"),
        F.substring(F.sha2("content", 256), 1, 8).alias("sha8"),
        F.size("img_features").cast("long").alias("feat_len"),
        (
            F.forall(means, lambda x: (x >= 0.0) & (x <= 1.0))
            & F.forall(stds, lambda x: (x >= 0.0) & (x <= 0.6))
        ).alias("bounds_ok"),
    ).orderBy("doc_id")


def q_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MulticlassClassifierEvaluator core: confusion counts as SQL over a
    deterministic prediction rule (reference:
    evaluation/MulticlassClassifierEvaluator.scala)."""
    e = _t(spark, sf_dir, "embeddings")
    return (
        e.select("label", (F.col("vec_id") % 10).cast("long").alias("pred"))
        .groupBy("label", "pred")
        .agg(F.count("*").alias("c"))
        .orderBy("label", "pred")
    )


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join with an equi conjunct (user_id) so Catalyst plans a
    hash join + range post-filter, not a nested loop: events within 5 min
    after each signup, per signup."""
    from keystone_spark.operators.relational import range_join

    e = _t(spark, sf_dir, "events")
    sig = e.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("sig_id"), F.col("user_id").alias("s_user"),
        F.col("ts").alias("s_ts"),
    )
    cond = (
        (F.col("user_id") == F.col("s_user"))
        & (F.col("ts") > F.col("s_ts"))
        & (F.col("ts") <= F.col("s_ts") + F.expr("INTERVAL 5 MINUTES"))
    )
    j = range_join(e, sig, cond)
    return (
        j.groupBy("sig_id").agg(F.count("*").alias("n")).orderBy("sig_id")
    )


def q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window fns: lag / lead / first_value / ntile per customer."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.lag("o_totalprice").over(w), 6).alias("prev_p"),
            F.round(F.lead("o_totalprice").over(w), 6).alias("next_p"),
            F.round(F.first("o_totalprice").over(w), 6).alias("first_p"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


def q_math_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return (
        li.where(F.col("l_linenumber") == 1)
        .select(
            "l_orderkey",
            F.floor(q).cast("long").alias("fl"),
            F.ceil(q).cast("long").alias("ce"),
            F.round(F.abs(q - 25), 6).alias("ab"),
            F.round(F.pow(q, 2), 6).alias("p2"),
            F.round(F.exp(q / 50.0), 6).alias("ex"),
            F.round(F.log(q + 1.0), 6).alias("ln"),
            F.round(F.sqrt(q), 6).alias("sq"),
            F.signum(q - 25).cast("double").alias("sg"),
        )
        .orderBy("l_orderkey")
    )


def q_array_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface over embeddings: size/slice/sort/reverse-max/avg via
    higher-order aggregate."""
    e = _t(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return (
        e.where(F.col("vec_id") < 200)
        .select(
            "vec_id",
            F.size(emb).cast("long").alias("d"),
            F.round(emb[0].cast("double"), 6).alias("h"),
            F.round(F.array_max(emb).cast("double"), 6).alias("mx"),
            F.round(F.element_at(F.array_sort(emb), 1).cast("double"), 6).alias("mn"),
            F.round(
                F.aggregate(emb, F.lit(0.0), lambda a, x: a + x.cast("double"))
                / F.size(emb),
                6,
            ).alias("avg"),
        )
        .orderBy("vec_id")
    )


def q_string_fns2(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.lpad("p_brand", 12, "*").alias("lp"),
            F.levenshtein("p_type", F.lit("STANDARD")).cast("long").alias("lv"),
            F.reverse(F.col("p_brand")).alias("rv"),
            F.regexp_extract("p_name", "([a-z]+)", 1).alias("rx"),
            F.concat_ws("|", "p_brand", "p_type").alias("cw"),
        )
        .orderBy("p_partkey")
    )


def q_date_fns2(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return (
        o.select(
            "o_orderkey",
            F.year(d).cast("long").alias("y"),
            F.month(d).cast("long").alias("m"),
            F.dayofmonth(d).cast("long").alias("dom"),
            F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus3m"),
            F.datediff(d, F.lit("1995-01-01").cast("date")).cast("long").alias("dd"),
        )
        .orderBy("o_orderkey")
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (SQL-only surface in Spark)."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS c,
               ROUND(SUM(l_quantity), 6) AS sq
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """
    )


def q_term_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TermFrequency node (sqrt weighting) exploded to rows (reference:
    nodes/misc/TermFrequency.scala)."""
    from keystone_spark.operators.nlp import TermFrequency, Tokenizer

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    toks = Tokenizer("text", "tokens")(d)
    tf = TermFrequency("tokens", "tf", weight="sqrt")(toks)
    return (
        tf.select("doc_id", F.explode("tf").alias("tok", "w"))
        .select("doc_id", "tok", F.round("w", 6).alias("w"))
        .orderBy("doc_id", "tok")
    )


def q_stupid_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid Backoff LM scores for the 100 most frequent observed bigrams
    (reference: nodes/nlp/StupidBackoffEstimator.scala). Observed bigrams
    resolve at the top level: S = c(w1 w2)/c(w1) — SQL-checkable."""
    from keystone_spark.operators.nlp import StupidBackoffEstimator, Tokenizer

    d = _t(spark, sf_dir, "documents")
    toks = Tokenizer("text", "tokens")(d)
    model = StupidBackoffEstimator(n=2, alpha=0.4)._fit(toks)
    scored = model.score_ngrams(2)
    return (
        scored.select("g", "cnt", F.round("score", 6).alias("s"))
        .orderBy(F.col("cnt").desc(), "g")
        .limit(100)
    )


def q_mean_avg_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mAP evaluator (reference: evaluation/MeanAveragePrecisionEvaluator
    .scala): AP per class with deterministic score/relevance derivation."""
    from keystone_spark.operators.evaluation import mean_average_precision

    e = _t(spark, sf_dir, "embeddings")
    scored = e.select(
        F.col("label").alias("cls"),
        F.col("embedding")[0].cast("double").alias("score"),
        (F.col("vec_id") % 2).cast("int").alias("relevant"),
        "vec_id",
    )
    out = mean_average_precision(scored, tiebreak_col="vec_id")
    return out.select(F.col("cls").cast("long").alias("cls"), "ap").orderBy("cls")


def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed window: per customer, orders (count + revenue) in the
    30 days ending at each order — value-based frame, not row-based."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, 0)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.count("*").over(w).alias("n_30d"),
            F.round(F.sum("o_totalprice").over(w), 6).alias("rev_30d"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per group (linear interpolation — matches
    quantile_cont); the approximate scale path is percentile_approx
    (t-digest sketch), same call shape."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias("p90"),
            F.round(F.expr("percentile(l_quantity, 0.25)"), 6).alias("q25"),
        )
        .orderBy("l_returnflag")
    )


def q_event_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (2h window, 1h slide) over events — each event lands
    in exactly 2 windows; F.window handles the assignment natively."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("c"), F.round(F.sum("value"), 6).alias("v"))
        .select(
            F.unix_timestamp("win.start").alias("w"),
            "event_type", "c", "v",
        )
        .orderBy("w", "event_type")
    )


def q_map_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map/JSON surface: from_json -> map<string,string>, map_keys /
    element access — events.props JSON column."""
    e = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return (
        e.select(
            "event_id",
            F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("keys"),
            F.size(m).cast("long").alias("n_keys"),
            F.element_at(m, "k").cast("bigint").alias("k_val"),
        )
        .orderBy("event_id")
    )


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) vs exact: emits the exact count and a
    within-2% flag, so the oracle pins both correctness of the exact path
    and the approx sketch's error bound (the sketch itself is
    engine-specific, so its raw value can't hash-match across engines)."""
    l = _t(spark, sf_dir, "lineitem")
    agg = l.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", 0.01).alias("approx"),
    )
    return agg.select(
        F.col("exact").cast("long").alias("exact"),
        (
            F.abs(F.col("approx") - F.col("exact")) / F.col("exact") <= 0.02
        ).cast("int").alias("within_2pct"),
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID (LLM-pipeline): per-language stopword-hit
    fractions + CJK char ratio, argmax label (functions/text.language_scores
    — all codegen expressions, no UDF)."""
    from keystone_spark.functions.text import language_scores

    d = _t(spark, sf_dir, "documents")
    s = language_scores("text")
    en, es, cjk = s.getField("en"), s.getField("es"), s.getField("cjk")
    pred = (
        F.when((en >= es) & (en >= cjk), "en")
        .when(es >= cjk, "es")
        .otherwise("cjk")
    )
    return d.select(
        "doc_id",
        F.round(en, 6).alias("en"),
        F.round(es, 6).alias("es"),
        F.round(cjk, 6).alias("cjk"),
        pred.alias("lang_pred"),
    ).orderBy("doc_id")


def q_binary_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BinaryClassifierEvaluator (reference: evaluation/
    BinaryClassifierEvaluator.scala) scoring the English-detector from
    q_lang_id against the documents.lang labels — one conditional-count
    aggregation pass."""
    from keystone_spark.functions.text import language_scores
    from keystone_spark.operators.evaluation import binary_metrics

    d = _t(spark, sf_dir, "documents")
    en = language_scores("text").getField("en")
    scored = d.select(
        (F.col("lang") == "en").cast("int").alias("label"),
        (en > 0.15).cast("int").alias("pred"),
    )
    return binary_metrics(scored)


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos >= 0.3) over a bounded id range.
    Exact pairwise on the subset is the oracle-checkable form; the scale
    path for unbounded inputs is lsh_bucket_topk / ivf_topk (approximate
    candidate pruning, same rerank kernel)."""
    from keystone_spark.functions.vector import cosine_similarity

    e = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    a = e.select(F.col("vec_id").alias("i"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("j"), F.col("embedding").alias("vb"))
    cos = cosine_similarity(
        F.col("va").cast("array<double>"), F.col("vb").cast("array<double>")
    )
    return (
        a.join(F.broadcast(b), F.col("i") < F.col("j"))
        .select("i", "j", F.round(cos, 6).alias("cos"))
        .where(F.col("cos") >= 0.3)
        .orderBy("i", "j")
    )


_SQ8_INDEX_CACHE: dict = {}


def q_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-bit scalar-quantized flat search (r14,
    operators/similarity.Sq8Index — FAISS IndexScalarQuantizer QT_8bit
    parity): the persisted corpus is one uint8 per dimension (4x
    smaller than float32 on the broad scan), search dequantizes per
    Arrow batch with map-side top-(refine*k) pruning, and the bounded
    candidate union is re-ranked exactly against the raw table.
    VALUE-hashed against the plain exact-top-k SQL: at every tested sf
    the quantized candidate pass recovers the exact result set, so the
    oracle is equality with the full-precision answer — the strongest
    claim an approximate index can make."""
    import tempfile

    from keystone_spark.operators.similarity import Sq8Index

    e = _t(spark, sf_dir, "embeddings")
    probes = e.where(F.col("vec_id") < 10)
    key = (id(spark._jsparkSession) if hasattr(spark, "_jsparkSession")
           else id(spark), sf_dir)
    path = _SQ8_INDEX_CACHE.get(key)
    if path is None:
        path = tempfile.mkdtemp(prefix="sq8_index_")
        Sq8Index.build(e).save(path)
        _SQ8_INDEX_CACHE[key] = path
    idx = Sq8Index.load(spark, path)
    out = idx.search(e, probes, k=10, refine=4)
    return (
        out.select("probe", "vec_id", F.round("cos", 6).alias("cos"), "rk")
        .orderBy("probe", "rk")
    )


def q_group_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-group neighbor search (r14,
    operators/similarity.grouped_cosine_topk): exact top-5 cosine
    restricted to the probe's OWN label group — the per-language /
    per-source shape where neighbors must never cross the group
    boundary; each probe carries its own constraint (vs. the single
    global predicate of filtered ANN). One scan, per-probe group mask
    ahead of the gemm; the group filter pushes to the scan (partition
    pruning when the table is partitioned by the group column).
    Value-hashed."""
    from keystone_spark.operators.similarity import grouped_cosine_topk

    e = _t(spark, sf_dir, "embeddings")
    probes = e.where(F.col("vec_id") < 6)
    out = grouped_cosine_topk(e, probes, "label", k=5)
    return (
        out.select("probe", "vec_id", F.round("cos", 6).alias("cos"), "rk")
        .orderBy("probe", "rk")
    )


def q_ivfpq_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered ANN on the PQ family (r14 — the IvfPqIndex half of
    ivf_filtered_topk): the predicate lands on the cell-pruned CODES
    scan before ADC candidate selection, so the whole refine*k pool is
    predicate-clean and the exact re-rank returns a FULL k of
    predicate-satisfying neighbors. Invariant oracle (n=10, dense
    ranks, filter_ok, recall@10 >= 0.5 vs the exact kernel over the
    predicate-filtered corpus — 0.8 at the hash-checked sf0.01)."""
    import tempfile

    from keystone_spark.operators.similarity import IvfPqIndex, cosine_topk

    e = _t(spark, sf_dir, "embeddings")
    probes = e.where(F.col("vec_id") < 3)
    pred = F.col("label") % 3 == 0
    key = (id(spark._jsparkSession) if hasattr(spark, "_jsparkSession")
           else id(spark), sf_dir)
    path = _IVFPQ_INDEX_CACHE.get(key)
    if path is None:
        path = tempfile.mkdtemp(prefix="ivfpq_index_")
        IvfPqIndex.build(e, n_cells=16, m=16, ks=32).save(path)
        _IVFPQ_INDEX_CACHE[key] = path
    idx = IvfPqIndex.load(spark, path)
    out = idx.search(e, probes, k=10, n_probe_cells=8, refine=8,
                     predicate=pred, metadata=e)
    exact = cosine_topk(e.where(pred), probes, k=10)
    hits = (
        out.select("probe", "vec_id")
        .join(exact.select("probe", "vec_id"), ["probe", "vec_id"])
        .groupBy("probe")
        .agg(F.count("*").alias("hits"))
    )
    labels = e.select("vec_id", "label")
    per = (
        out.join(labels, "vec_id")
        .groupBy("probe")
        .agg(
            F.count("*").cast("long").alias("n"),
            ((F.min("rk") == 1) & (F.max("rk") == 10)
             & (F.count_distinct("rk") == 10)).alias("ranks_ok"),
            (F.sum(F.when(F.col("label") % 3 == 0, 0).otherwise(1)) == 0
             ).alias("filter_ok"),
        )
    )
    return (
        per.join(hits, "probe", "left")
        .select(
            "probe", "n", "ranks_ok", "filter_ok",
            (F.coalesce(F.col("hits"), F.lit(0)) >= 5).alias("recall_ok"),
        )
        .orderBy("probe")
    )


def q_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-greedy selection under a global token budget (r14,
    operators/curation.token_budget_select): fill a 12k-token budget
    with the highest-quality docs (quality = tokens/chars density,
    integer-exact token counts), prefix semantics. The operator's 100 TB
    shape: uniform quality buckets + per-bucket totals (two narrow
    aggs), whole buckets kept map-side, and ONLY the one budget-
    straddling bucket pays an ordered cumulative window — never a
    global unpartitioned sort. Value-hashed against DuckDB's global
    running-sum prefix."""
    from keystone_spark.operators.curation import token_budget_select

    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("toks"),
        (F.size(F.split("text", " ")) * F.lit(1.0)
         / F.col("n_chars")).alias("quality"),
    )
    out = token_budget_select(scored, budget=12000, n_buckets=32)
    return (
        out.select("doc_id", "toks", F.round("quality", 6).alias("quality"))
        .orderBy("doc_id")
    )


def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversity re-rank (r14, operators/similarity.mmr_rerank):
    per probe (vec_id < 3), greedily pick 4 of the exact top-8 cosine
    candidates maximizing 0.7*rel - 0.3*max_sim_to_selected — the
    retrieval de-dup step between ANN candidate generation and an LLM
    context window. Candidate generation is the distributed gemm
    kernel; the greedy loop runs per-probe over the bounded candidate
    set in applyInPandas. Value-hashed: the DuckDB oracle UNROLLS the
    4-step greedy recurrence as chained CTEs (argmax per step via
    window rank, ties by id) — same selection, independently derived."""
    from keystone_spark.operators.similarity import mmr_rerank

    e = _t(spark, sf_dir, "embeddings")
    probes = e.where(F.col("vec_id") < 3)
    out = mmr_rerank(e, probes, k=4, candidates=8, lam=0.7)
    return out.orderBy("probe", "mmr_rank")


def q_embedding_decontamination(spark: SparkSession, sf_dir: str
                                ) -> DataFrame:
    """Embedding-space train/eval leakage sweep (r14,
    operators/similarity.embedding_decontamination): max train-corpus
    cosine per benchmark vector (bench = vec_id % 11 == 0, train = the
    rest), flagged at >= 0.45 — the semantic complement of the n-gram
    `contamination` query (paraphrased leakage shares no 4-grams but
    sits next to its source in embedding space). One training-corpus
    scan with map-side top-1 pruning; the bench side rides the Arrow
    kernel as the probe matrix. Value-hashed: (vec_id, max_cos,
    contaminated) vs the DuckDB exact max over the cross product."""
    from keystone_spark.operators.similarity import embedding_decontamination

    e = _t(spark, sf_dir, "embeddings")
    bench = e.where(F.col("vec_id") % 11 == 0)
    train = e.where(F.col("vec_id") % 11 != 0)
    out = embedding_decontamination(train, bench, threshold=0.45)
    return out.orderBy("vec_id")


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style document fingerprint: min hash over every 8-token
    shingle (shift-invariant content fingerprint; functions/text
    .rolling_fingerprint is the xxhash64 production form — md5 here so the
    DuckDB oracle can reproduce the exact values). Dedup view: each doc
    mapped to its fingerprint-group representative. The per-gram md5
    pass is the heavy kernel — re-spread a single-split fixture scan so
    it parallelizes (no-op on real multi-split corpora)."""
    from keystone_spark.functions.text import tokens, word_ngrams
    from keystone_spark.sources import ensure_parallelism

    d = ensure_parallelism(_t(spark, sf_dir, "documents"))
    toks = tokens("text")
    grams = word_ngrams(toks, 8)
    fp = F.when(
        F.size(grams) > 0,
        F.array_min(F.transform(grams, lambda g: F.md5(F.encode(g, "UTF-8")))),
    ).otherwise(F.md5(F.encode(F.concat_ws(" ", toks), "UTF-8")))
    with_fp = d.select("doc_id", fp.alias("fp"))
    rep = F.min("doc_id").over(Window.partitionBy("fp"))
    return (
        with_fp.select(
            "doc_id", "fp", rep.alias("rep"),
            (F.col("doc_id") != rep).cast("int").alias("is_dup"),
        )
        .orderBy("doc_id")
    )


def q_augmented_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AugmentedExamplesEvaluator (reference: evaluation/
    AugmentedExamplesEvaluator.scala): average score vectors over augmented
    copies of a source, then argmax — sources synthesized as vec_id % 100,
    scores as the first 4 embedding dims."""
    from keystone_spark.operators.evaluation import augmented_examples_eval

    e = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    df = e.select(
        (F.col("vec_id") % 100).alias("sid"),
        F.col("label").cast("long").alias("label"),
        F.slice(F.col("embedding").cast("array<double>"), 1, 4).alias("scores"),
    )
    out = augmented_examples_eval(df, "sid", "scores", "label")
    m = F.col("avg_scores")
    return out.select(
        "sid", "label", "pred",
        *[F.round(F.element_at(m, i + 1), 6).alias(f"m{i}") for i in range(4)],
    ).orderBy("sid", "label")


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate nearest neighbors: k-means cell pruning + exact
    rerank within probed cells (operators/similarity.ivf_topk).

    Approximate by construction (cell pruning deliberately skips part of
    the space), so the declared result is the per-probe invariant set
    (VERDICT r1 #1): k results with dense ranks 1..k, and recall@10 vs the
    exact kernel >= 0.5 — computed in Spark against cosine_topk, stated by
    the oracle as literals per probe. The measured per-probe recall at this
    config is 0.6-0.9 and deterministic (seeded centroids); the recall/cost
    curve is pinned in tests/test_dedup_similarity.py."""
    from keystone_spark.operators.similarity import cosine_topk, ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    probes = e.where(F.col("vec_id") < 10)
    out = ivf_topk(e, probes, k=10, n_cells=16, n_probe_cells=8)
    exact = cosine_topk(e, probes, k=10)
    hits = (
        out.select("probe", "vec_id")
        .join(exact.select("probe", "vec_id"), ["probe", "vec_id"])
        .groupBy("probe")
        .agg(F.count("*").alias("hits"))
    )
    per = out.groupBy("probe").agg(
        F.count("*").cast("long").alias("n"),
        ((F.min("rk") == 1) & (F.max("rk") == 10) & (F.count_distinct("rk") == 10)).alias(
            "ranks_ok"
        ),
    )
    return (
        per.join(hits, "probe", "left")
        .select(
            "probe",
            "n",
            "ranks_ok",
            (F.coalesce(F.col("hits"), F.lit(0)) >= 5).alias("recall_ok"),
        )
        .orderBy("probe")
    )


_IVF_INDEX_CACHE: dict = {}


def q_ivf_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production IVF path: fit-once IvfIndex persisted PARTITIONED BY
    cell, reloaded, searched with partition pruning — each search scans
    only the probed cells' files (operators/similarity.IvfIndex). Same
    per-probe invariant oracle as ivf_topk (ranks 1..k dense + recall@10
    vs the exact kernel >= 0.5); same seed/params, so the search result
    is identical to the pure-function form — what's different (and what
    this query pins) is the SCAN: the plan must carry a cell partition
    filter, asserted here so a pruning regression fails the query, not
    just a pytest."""
    import tempfile

    from keystone_spark.operators.similarity import IvfIndex, cosine_topk

    e = _t(spark, sf_dir, "embeddings")
    # 3 probes x 6 cells: the probed-cell union is a STRICT subset of the
    # 16 cells (12 at sf0.01), so the partition filter below prunes real
    # files, not vacuously all of them; min recall@10 at this config is
    # 6/10 (seeded, deterministic).
    probes = e.where(F.col("vec_id") < 3)
    key = (id(spark._jsparkSession) if hasattr(spark, "_jsparkSession")
           else id(spark), sf_dir)
    path = _IVF_INDEX_CACHE.get(key)
    if path is None:
        path = tempfile.mkdtemp(prefix="ivf_index_")
        IvfIndex.build(e, n_cells=16).save(path)
        _IVF_INDEX_CACHE[key] = path
    idx = IvfIndex.load(spark, path)
    out = idx.search(probes, k=10, n_probe_cells=6)

    import re

    plan = out._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[[^\]]*cell#\d+ (?:INSET|IN) \(?([^\])]*)", plan)
    if not m:
        raise AssertionError(
            "IvfIndex search scan lost its cell partition filter:\n" + plan[:2000]
        )
    n_cells_scanned = len(m.group(1).split(","))
    if not 0 < n_cells_scanned < 16:
        raise AssertionError(
            f"IvfIndex partition filter is vacuous ({n_cells_scanned} of 16 "
            "cells scanned):\n" + plan[:2000]
        )

    exact = cosine_topk(e, probes, k=10)
    hits = (
        out.select("probe", "vec_id")
        .join(exact.select("probe", "vec_id"), ["probe", "vec_id"])
        .groupBy("probe")
        .agg(F.count("*").alias("hits"))
    )
    per = out.groupBy("probe").agg(
        F.count("*").cast("long").alias("n"),
        ((F.min("rk") == 1) & (F.max("rk") == 10) & (F.count_distinct("rk") == 10)).alias(
            "ranks_ok"
        ),
    )
    return (
        per.join(hits, "probe", "left")
        .select(
            "probe",
            "n",
            "ranks_ok",
            (F.coalesce(F.col("hits"), F.lit(0)) >= 5).alias("recall_ok"),
        )
        .orderBy("probe")
    )


def q_ivf_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED ANN (r14, VERDICT r13 #2): top-k neighbors SUBJECT TO a
    metadata predicate (here ``label % 3 = 0`` over the embeddings
    table — the ``lang='en' AND quality > t`` shape of a training-data
    pipeline), pushed INTO the cell-pruned index scan before the
    per-cell top-k kernel (FAISS pre-filtered-search parity). The
    push-down is the point: post-filtering k unconstrained results
    under-returns whenever fewer than k of them satisfy the predicate
    (pinned by test_dedup_similarity's under-return fixture); here
    every probe must come back with a FULL k=10 — asserted as the
    ``n`` invariant — because the filter ran before the kernel.

    Declared result (the ivf_delete_topk invariant shape, driver-hash
    -checked): per probe k=10 rows, dense ranks, ``filter_ok`` (every
    returned neighbor satisfies the predicate), recall@10 >= 0.5
    against the exact kernel over the PREDICATE-FILTERED corpus (at
    sf0.01, this config reads 0.8; the floor is calibrated for the
    hash-checked sf — sf0.001's 500-vector corpus reads 0.6).
    In-query assert: the cell partition filter survives the added
    semi-join and stays non-vacuous (14 of 16 cells at 3 probes x 8)."""
    import tempfile

    from keystone_spark.operators.similarity import IvfIndex, cosine_topk

    e = _t(spark, sf_dir, "embeddings")
    probes = e.where(F.col("vec_id") < 3)
    pred = F.col("label") % 3 == 0
    # same build as q_ivf_index_topk -> shared cache key: one persisted
    # index serves both the unfiltered and the filtered search query
    key = (id(spark._jsparkSession) if hasattr(spark, "_jsparkSession")
           else id(spark), sf_dir)
    path = _IVF_INDEX_CACHE.get(key)
    if path is None:
        path = tempfile.mkdtemp(prefix="ivf_index_")
        IvfIndex.build(e, n_cells=16).save(path)
        _IVF_INDEX_CACHE[key] = path
    idx = IvfIndex.load(spark, path)
    out = idx.search(probes, k=10, n_probe_cells=8,
                     predicate=pred, metadata=e)

    import re

    plan = out._jdf.queryExecution().executedPlan().toString()
    m = re.search(
        r"PartitionFilters: \[[^\]]*cell#\d+ (?:INSET|IN) \(?([^\])]*)",
        plan,
    )
    if not m:
        raise AssertionError(
            "filtered IvfIndex search lost its cell partition filter "
            "(the predicate semi-join must not defeat pruning):\n"
            + plan[:2000]
        )
    n_cells_scanned = len(m.group(1).split(","))
    if not 0 < n_cells_scanned < 16:
        raise AssertionError(
            f"filtered partition filter is vacuous ({n_cells_scanned} "
            "of 16 cells scanned):\n" + plan[:2000]
        )

    # exact ground truth over the predicate-filtered corpus — recall
    # against THIS (not the unfiltered truth) is what filtered ANN owes
    exact = cosine_topk(e.where(pred), probes, k=10)
    hits = (
        out.select("probe", "vec_id")
        .join(exact.select("probe", "vec_id"), ["probe", "vec_id"])
        .groupBy("probe")
        .agg(F.count("*").alias("hits"))
    )
    labels = e.select("vec_id", "label")
    per = (
        out.join(labels, "vec_id")
        .groupBy("probe")
        .agg(
            F.count("*").cast("long").alias("n"),
            ((F.min("rk") == 1) & (F.max("rk") == 10)
             & (F.count_distinct("rk") == 10)).alias("ranks_ok"),
            (F.sum(F.when(F.col("label") % 3 == 0, 0).otherwise(1)) == 0
             ).alias("filter_ok"),
        )
    )
    return (
        per.join(hits, "probe", "left")
        .select(
            "probe",
            "n",
            "ranks_ok",
            "filter_ok",
            (F.coalesce(F.col("hits"), F.lit(0)) >= 5).alias("recall_ok"),
        )
        .orderBy("probe")
    )


def q_cosine_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact filtered similarity search, value-hashed (r14): brute-force
    cosine top-10 per probe over the PREDICATE-FILTERED corpus
    (``label % 3 = 0``) — the exact-baseline half of filtered ANN
    (q_ivf_filtered_topk is the index half). The predicate is a plain
    Catalyst filter under the Arrow gemm kernel, so it pushes to the
    parquet scan; the oracle recomputes the same filtered top-k in
    DuckDB and the driver hashes actual (probe, vec_id, cos, rk)
    rows — no invariant indirection on this path."""
    from keystone_spark.operators.similarity import cosine_topk

    e = _t(spark, sf_dir, "embeddings")
    probes = e.where(F.col("vec_id") < 10)
    out = cosine_topk(e.where(F.col("label") % 3 == 0), probes, k=10)
    return (
        out.select("probe", "vec_id", F.round("cos", 6).alias("cos"), "rk")
        .orderBy("probe", "rk")
    )


def q_ivf_delete_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-index TAKEDOWN path (VERDICT r10 #2, r11): the persisted
    IvfIndex gets ``delete(vec_id % 7 == 2)`` and is searched BEFORE
    any compact — the live code path here is the tombstone anti-join
    on the cell-pruned scan, i.e. a deleted embedding stops being
    served immediately while its rows still exist on disk. The
    declared result is the per-probe invariant set (same shape as
    ivf_index_topk): k results with dense ranks 1..k, recall@10 >= 0.5
    against the exact kernel over the SURVIVING corpus, and
    ``no_deleted`` — no tombstoned id is ever served (the takedown
    contract itself, hash-checked by the driver). The cell partition
    filter is asserted on the executed plan so the anti-join cannot
    silently defeat pruning."""
    import tempfile

    from keystone_spark.operators.similarity import IvfIndex, cosine_topk

    e = _t(spark, sf_dir, "embeddings")
    probes = e.where(F.col("vec_id") < 3)
    deleted = F.col("vec_id") % 7 == 2
    key = ("ivfdel", id(spark._jsparkSession)
           if hasattr(spark, "_jsparkSession") else id(spark), sf_dir)
    path = _IVF_INDEX_CACHE.get(key)
    if path is None:
        path = tempfile.mkdtemp(prefix="ivf_del_")
        IvfIndex.build(e, n_cells=16).save(path)
        stats = IvfIndex.delete(
            spark, path, e.where(deleted).select("vec_id")
        )
        if stats["tombstones_added"] <= 0:
            raise AssertionError(f"ivf delete did not land: {stats}")
        _IVF_INDEX_CACHE[key] = path
    idx = IvfIndex.load(spark, path)
    out = idx.search(probes, k=10, n_probe_cells=6)

    import re

    plan = out._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[[^\]]*cell#\d+ (?:INSET|IN) \(?([^\])]*)", plan)
    if not m:
        raise AssertionError(
            "IvfIndex delete-path search lost its cell partition "
            "filter:\n" + plan[:2000]
        )
    n_cells_scanned = len(m.group(1).split(","))
    if not 0 < n_cells_scanned < 16:
        raise AssertionError(
            f"IvfIndex partition filter is vacuous ({n_cells_scanned} "
            "of 16 cells scanned):\n" + plan[:2000]
        )

    exact = cosine_topk(e.where(~deleted), probes, k=10)
    hits = (
        out.select("probe", "vec_id")
        .join(exact.select("probe", "vec_id"), ["probe", "vec_id"])
        .groupBy("probe")
        .agg(F.count("*").alias("hits"))
    )
    per = out.groupBy("probe").agg(
        F.count("*").cast("long").alias("n"),
        ((F.min("rk") == 1) & (F.max("rk") == 10) & (F.count_distinct("rk") == 10)).alias(
            "ranks_ok"
        ),
        (F.sum(F.when(deleted, 1).otherwise(0)) == 0).alias("no_deleted"),
    )
    return (
        per.join(hits, "probe", "left")
        .select(
            "probe",
            "n",
            "ranks_ok",
            (F.coalesce(F.col("hits"), F.lit(0)) >= 5).alias("recall_ok"),
            "no_deleted",
        )
        .orderBy("probe")
    )


def q_ivf_retrain_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-index RETRAIN path (VERDICT r11 #4, r12): the persisted
    IvfIndex lives under a versioned root with a ``_LATEST`` pointer;
    after ``delete(vec_id % 7 == 3)`` it is RETRAINED into a new
    snapshot — coarse quantizer re-fit on a hash-ordered sample of the
    LIVE corpus, every live vector re-assigned, tombstones physically
    purged (a retrain is also a compact), one atomic pointer flip.
    The search then resolves the pointer to the retrained snapshot.
    Declared result: the per-probe invariant set (ivf_delete_topk's
    shape): k results with dense ranks 1..k, recall@10 >= 0.5 against
    the exact kernel over the SURVIVING corpus, and ``no_deleted`` —
    hash-checked by the driver at every sf it samples. In-query
    asserts: the pointer flipped, load resolved the new snapshot, the
    purge left no tombstone file, and the cell partition filter
    survives on the retrained layout."""
    import tempfile

    from keystone_spark.fsutil import (
        fs_exists,
        read_latest_pointer,
        write_latest_pointer,
    )
    from keystone_spark.operators.similarity import IvfIndex, cosine_topk

    e = _t(spark, sf_dir, "embeddings")
    probes = e.where(F.col("vec_id") < 3)
    deleted = F.col("vec_id") % 7 == 3
    key = ("ivfrt", id(spark._jsparkSession)
           if hasattr(spark, "_jsparkSession") else id(spark), sf_dir)
    root = _IVF_INDEX_CACHE.get(key)
    if root is None:
        root = tempfile.mkdtemp(prefix="ivf_retrain_")
        IvfIndex.build(e, n_cells=16).save(f"{root}/v0")
        write_latest_pointer(spark, root, "v0")
        stats = IvfIndex.delete(
            spark, root, e.where(deleted).select("vec_id")
        )
        if stats["tombstones_added"] <= 0:
            raise AssertionError(f"ivf delete did not land: {stats}")
        rstats = IvfIndex.retrain(spark, root, f"{root}/v1")
        if rstats["pointer_version"] <= 1 or rstats["n_cells"] != 16:
            raise AssertionError(f"retrain did not land: {rstats}")
        _IVF_INDEX_CACHE[key] = root
    if read_latest_pointer(spark, root) != "v1":
        raise AssertionError(
            "retrain did not flip the _LATEST pointer: "
            f"{read_latest_pointer(spark, root)!r}"
        )
    idx = IvfIndex.load(spark, root)
    if idx.path.rstrip("/") != f"{root}/v1":
        raise AssertionError(f"reader did not resolve the pointer: {idx.path}")
    if fs_exists(spark, f"{root}/v1/tombstones"):
        raise AssertionError("retrain did not purge the tombstones")
    out = idx.search(probes, k=10, n_probe_cells=6)

    import re

    plan = out._jdf.queryExecution().executedPlan().toString()
    m = re.search(
        r"PartitionFilters: \[[^\]]*cell#\d+ (?:INSET|IN) \(?([^\])]*)",
        plan,
    )
    if not m:
        raise AssertionError(
            "retrained IvfIndex search lost its cell partition "
            "filter:\n" + plan[:2000]
        )
    n_cells_scanned = len(m.group(1).split(","))
    if not 0 < n_cells_scanned < 16:
        raise AssertionError(
            f"retrained partition filter is vacuous ({n_cells_scanned} "
            "of 16 cells scanned):\n" + plan[:2000]
        )

    exact = cosine_topk(e.where(~deleted), probes, k=10)
    hits = (
        out.select("probe", "vec_id")
        .join(exact.select("probe", "vec_id"), ["probe", "vec_id"])
        .groupBy("probe")
        .agg(F.count("*").alias("hits"))
    )
    per = out.groupBy("probe").agg(
        F.count("*").cast("long").alias("n"),
        ((F.min("rk") == 1) & (F.max("rk") == 10)
         & (F.count_distinct("rk") == 10)).alias("ranks_ok"),
        (F.sum(F.when(deleted, 1).otherwise(0)) == 0).alias("no_deleted"),
    )
    return (
        per.join(hits, "probe", "left")
        .select(
            "probe",
            "n",
            "ranks_ok",
            (F.coalesce(F.col("hits"), F.lit(0)) >= 5).alias("recall_ok"),
            "no_deleted",
        )
        .orderBy("probe")
    )


def q_ivf_stream_autoretrain_topk(spark: SparkSession, sf_dir: str
                                  ) -> DataFrame:
    """The CLOSED drift loop, driver-hash-checked (r13, VERDICT r12
    "what's missing" #2): the persisted IvfIndex is built on the even
    half of the embeddings, takes a delete, then the odd half arrives
    through the STREAMING ingest fold (``stream_vector_ingest`` —
    foreachBatch, idempotent ``skip_existing_ids`` adds) with
    ``retrain_if_skewed`` armed; the fold itself watches each add's
    ``max_cell_share`` drift signal and fires the quantizer retrain —
    sample the live corpus hash-ordered, re-assign every live vector,
    purge tombstones, publish via one ``_LATEST`` pointer flip — with
    NO operator in the loop. The search then resolves the pointer to
    the fold-published snapshot. Declared result: the per-probe
    invariant set (ivf_delete_topk's shape) — k results with dense
    ranks 1..k, recall@10 >= 0.5 against the exact kernel over the
    surviving union (floor calibrated for sf >= 0.01 — a 16-cell IVF
    over sf0.001's ~100 vectors is degenerate and one probe reads 4/10
    there), and ``no_deleted``. In-query asserts: the fold
    (not a manual call) flipped the pointer to its auto-named
    ``retrain_e{epoch}`` snapshot, the purge landed, every streamed id
    is served exactly once, and the cell partition filter survives on
    the retrained layout."""
    import tempfile

    from keystone_spark.fsutil import (
        fs_exists,
        read_latest_pointer,
        write_latest_pointer,
    )
    from keystone_spark.operators.similarity import IvfIndex, cosine_topk

    e = _t(spark, sf_dir, "embeddings")
    probes = e.where(F.col("vec_id") < 3)
    even = F.col("vec_id") % 2 == 0
    deleted = even & (F.col("vec_id") % 7 == 5)
    key = ("ivfstream", id(spark._jsparkSession)
           if hasattr(spark, "_jsparkSession") else id(spark), sf_dir)
    root = _IVF_INDEX_CACHE.get(key)
    if root is None:
        root = tempfile.mkdtemp(prefix="ivf_stream_")
        IvfIndex.build(e.where(even), n_cells=16).save(f"{root}/v0")
        write_latest_pointer(spark, root, "v0")
        stats = IvfIndex.delete(
            spark, root, e.where(deleted).select("vec_id")
        )
        if stats["tombstones_added"] <= 0:
            raise AssertionError(f"ivf delete did not land: {stats}")
        # the odd half streams in as one micro-batch; threshold 0 means
        # the whole-index occupancy gate (r14 semantics — the fold
        # reads the stats manifest the add just refreshed) always
        # crosses, so the retrain fires on this epoch (the drift
        # SEMANTICS — fire only under real index-level skew, rate
        # limited — are pinned by test_index_lifecycle_r13/r14; this
        # query pins the driver-checkable LOOP: signal -> retrain ->
        # pointer flip -> correct pointer-resolved search)
        from keystone_spark.streaming.windows import stream_vector_ingest

        src = tempfile.mkdtemp(prefix="ivf_stream_src_")
        e.where(~even).select("vec_id", "embedding").coalesce(1) \
            .write.mode("overwrite").parquet(f"{src}/b0")
        # schema from the written file, not a hand-typed string: the
        # corpus stores array<float>, and a double-declared stream
        # would append an unmergeable parquet file (add() also casts
        # to the stored schema as the product-level guard)
        stream = spark.readStream.schema(
            spark.read.parquet(f"{src}/b0").schema
        ).parquet(f"{src}/*")
        stream_vector_ingest(stream, root, family="ivf",
                             retrain_if_skewed=0.0)
        _IVF_INDEX_CACHE[key] = root
    ptr = read_latest_pointer(spark, root)
    if not (ptr or "").startswith("retrain_e"):
        raise AssertionError(
            f"the ingest fold did not auto-retrain: pointer={ptr!r}"
        )
    idx = IvfIndex.load(spark, root)
    if idx.path.rstrip("/") != f"{root}/{ptr}":
        raise AssertionError(f"reader did not resolve the pointer: {idx.path}")
    if fs_exists(spark, f"{root}/{ptr}/tombstones"):
        raise AssertionError("the fold's retrain did not purge tombstones")
    # every live id exactly once in the retrained snapshot (zero
    # lost/duplicated through the stream + retrain)
    n_live = e.where(~deleted).count()
    n_idx = idx.indexed.count()
    dup = idx.indexed.groupBy("vec_id").count().where("count > 1").count()
    if n_idx != n_live or dup:
        raise AssertionError(
            f"retrained corpus {n_idx} != live {n_live} (dups={dup})"
        )
    # 8 of 16 cells: the half-corpus build + full-corpus retrain sits a
    # touch below the full-corpus-build queries' recall at 6 cells, and
    # the probe union still leaves 2 cells pruned (non-vacuous filter)
    out = idx.search(probes, k=10, n_probe_cells=8)

    import re

    plan = out._jdf.queryExecution().executedPlan().toString()
    m = re.search(
        r"PartitionFilters: \[[^\]]*cell#\d+ (?:INSET|IN) \(?([^\])]*)",
        plan,
    )
    if not m:
        raise AssertionError(
            "auto-retrained IvfIndex search lost its cell partition "
            "filter:\n" + plan[:2000]
        )
    n_cells_scanned = len(m.group(1).split(","))
    if not 0 < n_cells_scanned < 16:
        raise AssertionError(
            f"auto-retrained partition filter is vacuous "
            f"({n_cells_scanned} of 16 cells scanned):\n" + plan[:2000]
        )

    exact = cosine_topk(e.where(~deleted), probes, k=10)
    hits = (
        out.select("probe", "vec_id")
        .join(exact.select("probe", "vec_id"), ["probe", "vec_id"])
        .groupBy("probe")
        .agg(F.count("*").alias("hits"))
    )
    per = out.groupBy("probe").agg(
        F.count("*").cast("long").alias("n"),
        ((F.min("rk") == 1) & (F.max("rk") == 10)
         & (F.count_distinct("rk") == 10)).alias("ranks_ok"),
        (F.sum(F.when(deleted, 1).otherwise(0)) == 0).alias("no_deleted"),
    )
    return (
        per.join(hits, "probe", "left")
        .select(
            "probe",
            "n",
            "ranks_ok",
            (F.coalesce(F.col("hits"), F.lit(0)) >= 5).alias("recall_ok"),
            "no_deleted",
        )
        .orderBy("probe")
    )


def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS subquery (TPC-H Q4 shape): orders in 1996-H1 with at least one
    heavy lineitem, counted by priority — decorrelated to a left-semi join
    (the plan Catalyst produces for EXISTS; no per-row subquery execution)."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("date"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("c"))
        .orderBy("o_orderpriority")
    )


def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17 shape): revenue of below-20%%-of-
    average-quantity lineitems for one brand. Decorrelated: per-part avg as a
    separate agg, joined back (one shuffle; the per-part agg output is tiny
    so AQE broadcasts it at runtime)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    thresh = li.groupBy("l_partkey").agg(
        (0.2 * F.avg("l_quantity")).alias("thresh")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(thresh, "l_partkey")
        .where(F.col("l_quantity") < F.col("thresh"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 6).alias("avg_yearly"))
    )


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 undelivered orders by revenue for one segment.
    Filters push to all three scans; customer dim broadcasts."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1996-06-01").cast("date")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1996-06-01").cast("date")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (confusion matrix in wide form): label rows x pred columns.
    Explicit pivot values avoid the extra distinct-collect job at scale."""
    e = _t(spark, sf_dir, "embeddings")
    piv = (
        e.select("label", (F.col("vec_id") % 10).alias("pred"))
        .groupBy("label")
        .pivot("pred", list(range(10)))
        .count()
        .na.fill(0)
    )
    return piv.select(
        "label", *[F.col(str(i)).cast("long").alias(f"p{i}") for i in range(10)]
    ).orderBy("label")


def q_covar_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment aggregates: sample covariance / correlation / variance
    per group (one pass, partial+final co-moment merge)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("cov"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("r"),
            F.round(F.var_samp("l_quantity"), 6).alias("vq"),
        )
        .orderBy("l_returnflag")
    )


def q_window_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function window surface: percent_rank / cume_dist / rank /
    dense_rank per customer ordered by order value."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.percent_rank().over(w), 6).alias("pr"),
            F.round(F.cume_dist().over(w), 6).alias("cd"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (TPC-H Q8 market-share shape): one nation's
    share of total order value per year — sum(CASE WHEN ...) / sum(...)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    is_target = F.when(F.col("n_name") == "BRAZIL", F.col("o_totalprice")).otherwise(0.0)
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("y"))
        .agg(
            F.round(F.sum(is_target) / F.sum("o_totalprice"), 6).alias("share"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("y")
    )


def q_revenue_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure predicate + single-row agg; every filter pushes
    to the parquet scan (no shuffle before the partial agg)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 6).alias("revenue"),
            F.count("*").alias("n"),
        )
    )


def q_array_fns2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array surface #2: zip_with product against the reversed
    vector folded with aggregate, plus argmax position."""
    e = _t(spark, sf_dir, "embeddings")
    emb = F.col("embedding").cast("array<double>")
    rdot = F.aggregate(
        F.zip_with(emb, F.reverse(emb), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        e.where(F.col("vec_id") < 100)
        .select(
            "vec_id",
            F.round(rdot, 6).alias("rdot"),
            F.array_position(F.col("embedding"), F.array_max(F.col("embedding")))
            .cast("long")
            .alias("argmax1"),
        )
        .orderBy("vec_id")
    )


def q_regr_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group simple linear regression as SQL aggregates (regr_slope /
    regr_intercept / regr_r2) — the closed-form twin of
    operators/learning.grouped_least_squares (applyInPandas multi-feature
    path, tested vs numpy)."""
    li = _t(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.regr_slope(y, x), 6).alias("slope"),
            F.round(F.regr_intercept(y, x), 6).alias("icept"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


def q_token_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing (LLM shard prep): greedy in-order fill
    per language as one window cumsum (operators/curation.pack_sequences)."""
    from keystone_spark.functions.text import token_count
    from keystone_spark.operators.curation import pack_sequences

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", token_count("text").cast("long").alias("toks")
    )
    out = pack_sequences(
        d, "toks", budget=2048, partition_cols=["lang"], order_cols=["doc_id"]
    )
    return out.select("doc_id", "lang", "toks", "pack_id").orderBy("doc_id")


def q_token_packing_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE budget-respecting sequence packing (ADVICE r1): greedy in-order
    fill that closes a pack when the next doc would overflow — no pack
    exceeds the budget except single oversized docs. Sequential per group
    -> applyInPandas per language; the DuckDB oracle replays the same
    recurrence as a recursive CTE."""
    from keystone_spark.functions.text import token_count
    from keystone_spark.operators.curation import pack_sequences_greedy

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", token_count("text").cast("long").alias("toks")
    )
    out = pack_sequences_greedy(
        d, "toks", budget=2048, partition_cols=["lang"], order_cols=["doc_id"]
    )
    return out.select("doc_id", "lang", "toks", "pack_id").orderBy("doc_id")


def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (t-digest-style sketch, mergeable across
    partitions) pinned against the exact percentile with a 1%%-relative
    flag — same contract shape as approx_distinct: the oracle hashes the
    exact value plus the bound check, since sketch internals are
    engine-specific."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_p50"),
        F.expr("percentile_approx(l_extendedprice, 0.5, 1000)").alias("approx_p50"),
    )
    return (
        agg.select(
            "l_returnflag",
            F.round("exact_p50", 6).alias("exact_p50"),
            (
                F.abs(F.col("approx_p50") - F.col("exact_p50"))
                / F.col("exact_p50")
                <= 0.01
            ).cast("int").alias("within_1pct"),
        )
        .orderBy("l_returnflag")
    )


def q_null_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling scalar surface: nullif / coalesce / greatest / least /
    CASE bucketing."""
    c = _t(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return (
        c.select(
            "c_custkey",
            F.round(F.coalesce(F.nullif(bal, F.lit(0.0)), F.lit(-1.0)), 6).alias("bal"),
            F.round(F.greatest(bal, F.lit(100.0)), 6).alias("g"),
            F.round(F.least(bal, F.lit(100.0)), 6).alias("l"),
            F.when(bal < 0, "neg").when(bal < 1000, "low").otherwise("high").alias("bucket"),
        )
        .orderBy("c_custkey")
    )


def q_grouped_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS fit via applyInPandas (grouped-map Arrow kernel,
    operators/learning.grouped_least_squares) — single-feature case, so the
    DuckDB oracle is the closed-form regr_slope/regr_intercept: an exact
    SQL cross-check of the Python kernel."""
    from keystone_spark.operators.learning import grouped_least_squares

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"),
    )
    out = grouped_least_squares(li, ["l_returnflag"], ["x"], "y")
    return (
        out.select(
            "l_returnflag",
            F.round(F.element_at("coef", 1), 6).alias("slope"),
            F.round("intercept", 6).alias("icept"),
            F.col("n"),
        )
        .orderBy("l_returnflag")
    )


def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer in a quarter,
    3 joins + agg + top-20. Date/returnflag predicates push to the scans;
    nation broadcasts; customer rides the orders shuffle key."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("date"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percent of one month's revenue from PROMO parts —
    join + conditional-aggregation ratio, single output row."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_pct")
        )
    )


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the maximum quarterly
    revenue — agg, then a max scalar subquery decorrelated to a 1-row
    broadcast join back onto the agg (revenue rounded to 6 before the
    compare so both engines select on identical values)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    s = _t(spark, sf_dir, "supplier")
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == mx.mx)
        .join(s, rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of total revenue per order year
    — multi-join + conditional-agg ratio per group."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("n_name") == "NATION_3", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers with orders totalling > 250 units —
    GROUP BY ... HAVING on the fact table, then join back to orders +
    customer dims, top-20 by order value."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 250)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("l_orderkey").alias("o_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


def q_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of brand/size/quantity clause
    triples — the disjunctive-predicate join Catalyst must not turn into a
    cross product (stays a hash join on partkey with the OR as a post-join
    filter + partial pushdown of common conjuncts)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return j.where(cond).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
        ).alias("revenue")
    )


def q_argmin_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (argmin join-back): the cheapest part(s) per brand —
    per-group MIN then equality join back on the min value. Exact-equality
    on the double is safe here because MIN selects an existing element (no
    arithmetic), unlike SUM/AVG thresholds."""
    p = _t(spark, sf_dir, "part")
    mn = p.groupBy(F.col("p_brand").alias("b")).agg(
        F.min("p_retailprice").alias("min_price")
    )
    return (
        p.join(
            F.broadcast(mn),
            (p.p_brand == mn.b) & (p.p_retailprice == mn.min_price),
        )
        .select("p_brand", "p_partkey", "p_name", "p_retailprice")
        .orderBy("p_brand", "p_partkey")
    )


def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no RECENT
    order — global scalar-subquery threshold (1-row broadcast cross join)
    + anti join (filter pushed into the anti side's scan) + per-nation
    rollup. ('No order ever' is vacuous in these fixtures — every
    customer has at least one order.)"""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("date")
    )
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 6).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue from orders where the customer and the
    supplier share a nation, for one region/year. The c_nationkey ==
    s_nationkey equality rides the join, nation+region broadcast, date
    range pushes to the orders scan."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


def q_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by direction
    and ship year — the supplier-nation x customer-nation pair filter is a
    disjunction over the two directions, evaluated after both broadcast
    nation joins; years derive from the pushed-down shipdate range."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("cn_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year over a
    part-name predicate; supply cost is proxied as 60%% of p_retailprice
    (fixtures carry no partsupp table). Part filter prunes before its
    broadcast; the big joins shuffle on orderkey."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        0.6
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 6).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def q_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: fixtures carry no shipmode/commitdate):
    lines shipped >90 days after order date, grouped by line status with
    conditional counts of high- vs low-priority orders. The lateness
    predicate is a join-side expression; priority CASE counts aggregate
    map-side."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(
            F.col("l_shipdate").cast("date")
            > F.date_add(F.col("o_orderdate").cast("date"), 90)
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def q_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts
    INCLUDING zero-order customers — left outer join (with the priority
    predicate on the join's right side, not a post-filter), then a
    double aggregation."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted to shipdate lateness): suppliers whose
    line was the ONLY late line of a multi-supplier finalized order.

    The literal SQL is an EXISTS + NOT-EXISTS pair of lineitem self-joins
    (three scans, three orderkey shuffles; the oracle keeps that form).
    Spark-first rewrite: ONE pass — pre-aggregate per (order, supplier),
    then a window over the order partition counts suppliers and
    late-suppliers, and the filter `late > 0 AND n_supp > 1 AND
    n_late_supp = 1` selects the waiting supplier's late-line count.
    Two shuffles total (orderkey, then supplier), lineitem scanned once."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    per_supp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.sum(
                (
                    F.col("l_shipdate").cast("date")
                    > F.date_add(F.col("o_orderdate").cast("date"), 100)
                ).cast("long")
            ).alias("n_late")
        )
    )
    w = Window.partitionBy("l_orderkey")
    waiting = (
        per_supp.select(
            "l_orderkey",
            "l_suppkey",
            "n_late",
            F.count("*").over(w).alias("n_supp"),
            F.sum((F.col("n_late") > 0).cast("long")).over(w).alias("n_late_supp"),
        )
        .where(
            (F.col("n_late") > 0)
            & (F.col("n_supp") > 1)
            & (F.col("n_late_supp") == 1)
        )
    )
    return (
        waiting.join(s, waiting.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_late").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


def q_window_nav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window navigation with IGNORE NULLS: running first/last/nth
    non-null and previous non-null per user — the gap-filling /
    last-observation-carried-forward primitives (one shuffle + one sort,
    all four expressions share the same Window)."""
    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    sp = e.withColumn("v", F.when(F.col("value") > 34.0, F.col("value")))
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        sp.select(
            "event_id",
            F.round(F.first("v", ignorenulls=True).over(wf), 6).alias("first_v"),
            F.round(F.last("v", ignorenulls=True).over(wf), 6).alias("last_v"),
            F.round(F.nth_value("v", 2, ignoreNulls=True).over(wf), 6).alias(
                "second_v"
            ),
            F.round(
                F.expr(
                    "lag(v) IGNORE NULLS OVER "
                    "(PARTITION BY user_id ORDER BY ts, event_id)"
                ),
                6,
            ).alias("prev_v"),
        )
        .orderBy("event_id")
    )


def q_collect_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted collect aggregation: per returnflag, the distinct
    linestatus values as one canonical comma-joined string (collect_set
    is unordered by contract — array_sort makes it deterministic and
    hash-comparable against DuckDB's ORDER BY'd string_agg)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.concat_ws(
                ",", F.array_sort(F.collect_set("l_linestatus"))
            ).alias("statuses"),
            F.count("*").alias("c"),
        )
        .orderBy("l_returnflag")
    )


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide -> long reshaping via the native UNPIVOT operator (Expand
    node: each input row fans out JVM-side, no shuffle at all until the
    final sort) over part's numeric attributes."""
    p = _t(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.col("p_size").cast("double").alias("size"),
            F.col("p_retailprice").cast("double").alias("retailprice"),
        )
        .unpivot("p_partkey", ["size", "retailprice"], "attr", "val")
        .where(F.col("p_partkey") < 200)
        .orderBy("p_partkey", "attr")
    )


def q_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (SURVEY §2.10 extension surface: table-valued function
    lifted into SQL) splitting documents into numbered sentences via
    LATERAL join.

    The UDTF is the EXTENSION demo — row-at-a-time Python, the slow path
    by design; the same semantics compile to codegen as
    posexplode(split(...)), which is what a hot path should use (and what
    the DuckDB oracle mirrors). Input is predicate-bounded, and the split
    logic lives in the UDTF class, exercising registration + lateral
    correlation end-to-end."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="pos int, sentence string")
    class SplitSentences:
        def eval(self, text: str):
            if text is None:
                return
            for i, raw in enumerate(text.split(".")):
                s = raw.strip()
                if s:
                    yield i, s

    spark.udtf.register("split_sentences", SplitSentences)
    d = _t(spark, sf_dir, "documents")
    d.where(F.col("doc_id") < 40).select("doc_id", "text").createOrReplaceTempView(
        "__udtf_docs"
    )
    return spark.sql(
        """
        SELECT doc_id, s.pos, s.sentence
        FROM __udtf_docs, LATERAL split_sentences(text) AS s
        ORDER BY doc_id, s.pos
        """
    )


def q_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-range histogram via width_bucket — the one-shuffle binned
    aggregation pattern (bucket expression is codegen; counts combine
    map-side)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            F.width_bucket(F.col("o_totalprice"), F.lit(0.0), F.lit(600000.0), F.lit(12))
            .cast("long")
            .alias("bucket"),
            "o_totalprice",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 6).alias("total"),
        )
        .orderBy("bucket")
    )


def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: per-user hourly grid (sequence + explode —
    rows fan out JVM-side, no driver loop) left-joined with observed
    hourly means, then last-observation-carried-forward via
    last(IGNORE NULLS) over an unbounded-preceding frame. State per task
    is one running value per user partition — the 100 TB-safe
    formulation of resampling."""
    e = _t(spark, sf_dir, "events").where(
        (F.col("ts") >= F.lit("2024-01-01 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-02 00:00:00").cast("timestamp"))
        & (F.col("user_id") < 10)
    )
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.round(F.avg("value"), 6).alias("v"))
    grid = (
        e.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    F.lit("2024-01-01 00:00:00").cast("timestamp"),
                    F.lit("2024-01-01 23:00:00").cast("timestamp"),
                    F.expr("interval 1 hour"),
                )
            ).alias("h"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "h"], "left")
        .select(
            "user_id",
            F.unix_timestamp("h").alias("h"),
            F.last("v", ignorenulls=True).over(w).alias("v_filled"),
        )
        .orderBy("user_id", "h")
    )


def q_ohlc_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series OHLC rollup per user-hour via min_by/max_by ordered on
    ts — open/close resolve in the SAME single hash aggregation as
    high/low (no window pass, one shuffle; the classic financial-bar
    query). ts is unique in the fixtures so the ordering key is atomic
    and the agg stays a HashAggregate; with tie-prone timestamps you'd
    key on struct(ts, event_id) and accept the SortAggregate fallback."""
    e = _t(spark, sf_dir, "events")
    key = F.col("ts")
    return (
        e.groupBy(
            "user_id", F.date_trunc("hour", F.col("ts")).alias("hh")
        )
        .agg(
            F.round(F.min_by("value", key), 6).alias("open"),
            F.round(F.max("value"), 6).alias("high"),
            F.round(F.min("value"), 6).alias("low"),
            F.round(F.max_by("value", key), 6).alias("close"),
            F.count("*").alias("n"),
        )
        .select(
            "user_id",
            F.unix_timestamp("hh").alias("h"),
            "open", "high", "low", "close", "n",
        )
        .orderBy("user_id", "h")
    )


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel (view -> click -> purchase): each stage is
    the per-user earliest qualifying event STRICTLY AFTER the prior
    stage's time. Three shuffles on user_id, each stage a
    filter+join+min-agg — joins stay equi on user_id (no inequality-join
    blowup; the time condition is a post-join filter on tiny per-user
    rows)."""
    e = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("vt"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ct"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("ct"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_click")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase")))
    )


def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 fuzzy join over customer names via the FastSS
    deletion-neighborhood band join (operators/dedup.edit_distance_pairs)
    — candidates only from shared deletion variants (complete for
    dist<=1), exact levenshtein verify. The DuckDB oracle brute-forces
    all pairs on the same bounded subset."""
    from keystone_spark.operators.dedup import edit_distance_pairs

    c = _t(spark, sf_dir, "customer").where(F.col("c_custkey") < 400)
    return edit_distance_pairs(c, "c_custkey", "c_name").orderBy("i", "j")


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy hitters over the token stream (mergeable-sketch
    aggregation, operators/sketches.py): map-side partial sketches +
    bounded candidate sets, depth-2 treeReduce merge, point-query the
    merged sketch — raw keys never shuffle. At this width/vocab the CMS
    estimate is collision-free, so the result hash-matches the exact
    top-20 SQL oracle; the eps*N overestimate bound under adversarial
    width is pinned in tests/test_sketches.py."""
    from keystone_spark.operators.sketches import count_min_topk

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok")
    ).where(F.col("tok") != "")
    top = count_min_topk(toks, "tok", k=20)
    return spark.createDataFrame(
        [(t, int(c)) for t, c in top], "tok string, est long"
    ).orderBy(F.col("est").desc(), "tok")


# ---------------------------------------------------------------------------
# contract
# ---------------------------------------------------------------------------

def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/similarity.pq_topk): ADC over
    m uint8 codes per vector (16x memory compression at m=16 on the
    64-dim fixture) generates refine*k candidates, exact re-rank picks
    the final top-k. Same per-probe invariant oracle as ivf_topk: k
    dense-ranked results + recall@10 vs the exact kernel >= 0.5 —
    measured min recall at this config is 9/10 (seeded codebooks,
    deterministic)."""
    from keystone_spark.operators.similarity import cosine_topk, pq_topk

    e = _t(spark, sf_dir, "embeddings")
    probes = e.where(F.col("vec_id") < 10)
    out = pq_topk(e, probes, k=10, m=16, ks=32, refine=8)
    exact = cosine_topk(e, probes, k=10)
    hits = (
        out.select("probe", "vec_id")
        .join(exact.select("probe", "vec_id"), ["probe", "vec_id"])
        .groupBy("probe")
        .agg(F.count("*").alias("hits"))
    )
    per = out.groupBy("probe").agg(
        F.count("*").cast("long").alias("n"),
        ((F.min("rk") == 1) & (F.max("rk") == 10) & (F.count_distinct("rk") == 10)).alias(
            "ranks_ok"
        ),
    )
    return (
        per.join(hits, "probe", "left")
        .select(
            "probe",
            "n",
            "ranks_ok",
            (F.coalesce(F.col("hits"), F.lit(0)) >= 5).alias("recall_ok"),
        )
        .orderBy("probe")
    )


def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 (slowly-changing-dimension type 2) snapshot built from an
    event log: collapse consecutive same-state rows to change points
    (lag filter), then each change point's validity interval is
    [ts, next-change ts) via lead — the lakehouse dimension-history
    builder. Both windows share one user_id partitioning, so the whole
    construction is a single shuffle; the open interval's valid_to is
    NULL (current row)."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ch = e.withColumn("prev", F.lag("event_type").over(w)).where(
        F.col("prev").isNull() | (F.col("prev") != F.col("event_type"))
    )
    return (
        ch.withColumn("valid_to_ts", F.lead("ts").over(w))
        .select(
            "user_id",
            "event_type",
            F.unix_timestamp("ts").alias("valid_from"),
            F.unix_timestamp("valid_to_ts").alias("valid_to"),
        )
        .orderBy("user_id", "valid_from")
    )


def q_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source document sample
    (operators/curation.reservoir_per_key): md5-priority hash sampling —
    k smallest hash priorities per key = uniform without replacement,
    reproducible across runs/sharding, one WindowGroupLimit-pruned
    shuffle. The oracle replays the identical md5 ranking in DuckDB, so
    the EXACT sampled rows hash-match."""
    from keystone_spark.operators.curation import reservoir_per_key

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    out = reservoir_per_key(d, ["source"], k=5, id_cols=["doc_id"])
    return out.select("source", "doc_id", "lang").orderBy("source", "doc_id")


def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path for semi-structured JSON: parse_json ONCE
    into the binary variant encoding, then typed variant_get extraction
    + aggregation — at 100 TB this beats get_json_object re-parsing the
    string per extraction (the `json_extract` query keeps the classic
    form for comparison). Grouped stats of the extracted value per
    event_type."""
    e = _t(spark, sf_dir, "events")
    v = e.select(
        "event_type",
        F.try_variant_get(F.parse_json("props"), "$.k", "long").alias("k"),
    )
    return (
        v.groupBy("event_type")
        .agg(
            F.count("k").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


_IVFPQ_INDEX_CACHE: dict = {}


def q_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ production ANN (operators/similarity.IvfPqIndex): persisted
    cell-partitioned PQ codes (16x smaller than raw vectors) + pruned
    scan + ADC + exact re-rank against the base table — the FAISS-IVFPQ-
    with-refine recipe, Spark-first. Same per-probe invariant oracle as
    ivf_topk/pq_topk; recall_ok threshold 5/10 vs the exact kernel."""
    import tempfile

    from keystone_spark.operators.similarity import IvfPqIndex, cosine_topk

    e = _t(spark, sf_dir, "embeddings")
    probes = e.where(F.col("vec_id") < 10)
    key = (id(spark._jsparkSession) if hasattr(spark, "_jsparkSession")
           else id(spark), sf_dir)
    path = _IVFPQ_INDEX_CACHE.get(key)
    if path is None:
        path = tempfile.mkdtemp(prefix="ivfpq_index_")
        IvfPqIndex.build(e, n_cells=16, m=16, ks=32).save(path)
        _IVFPQ_INDEX_CACHE[key] = path
    idx = IvfPqIndex.load(spark, path)
    out = idx.search(e, probes, k=10, n_probe_cells=8, refine=8)
    exact = cosine_topk(e, probes, k=10)
    hits = (
        out.select("probe", "vec_id")
        .join(exact.select("probe", "vec_id"), ["probe", "vec_id"])
        .groupBy("probe")
        .agg(F.count("*").alias("hits"))
    )
    per = out.groupBy("probe").agg(
        F.count("*").cast("long").alias("n"),
        ((F.min("rk") == 1) & (F.max("rk") == 10) & (F.count_distinct("rk") == 10)).alias(
            "ranks_ok"
        ),
    )
    return (
        per.join(hits, "probe", "left")
        .select(
            "probe",
            "n",
            "ranks_ok",
            (F.coalesce(F.col("hits"), F.lit(0)) >= 5).alias("recall_ok"),
        )
        .orderBy("probe")
    )


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV/theta-sketch distinct counting with set algebra
    (operators/sketches.KmvSketch): distributed build (xxhash64 JVM-side,
    per-partition k-min partials, treeReduce merge), then union and
    intersection estimates — the operations HLL cannot do. At fixture
    cardinality (150 users << k=4096) every sketch is unsaturated, so
    estimates are EXACT and hash-match COUNT(DISTINCT)/INTERSECT oracles;
    the saturated-regime error bound is pytest-pinned
    (tests/test_sketches.py)."""
    from keystone_spark.operators.sketches import kmv_build

    e = _t(spark, sf_dir, "events")
    users = kmv_build(e, "user_id")
    clicks = kmv_build(e.where(F.col("event_type") == "click"), "user_id")
    purch = kmv_build(e.where(F.col("event_type") == "purchase"), "user_id")
    return spark.createDataFrame(
        [(
            int(users.estimate()),
            int(clicks.union(purch).estimate()),
            int(round(clicks.intersect_estimate(purch))),
        )],
        "n_users long, n_click_or_purchase long, n_click_and_purchase long",
    )


def q_funnel_completions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user funnel completion times via the streaming_funnel
    operator's batch path (streaming/windows.py — the stateful streaming
    twin advances the same greedy stages per micro-batch; equivalence is
    pinned in tests/test_streaming.py). Each stage is the earliest
    qualifying event strictly after the prior stage."""
    from keystone_spark.streaming.windows import streaming_funnel

    e = _t(spark, sf_dir, "events")
    return streaming_funnel(e).orderBy("user_id")


def q_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted: fixtures carry no partsupp, so lineitem
    shipment value stands in for supplycost*availqty): per-part value of
    shipments from one hemisphere's suppliers, keeping parts whose value
    exceeds 1.6x the per-part average — the group-agg + global
    scalar-subquery HAVING skeleton. The 100-row supplier subset
    broadcasts into the lineitem join; the scalar threshold is a 1-row
    broadcast cross join, never a per-row subquery."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier").where(F.col("s_nationkey") < 12)
    v = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "val"
            )
        )
    )
    thr = v.agg((F.avg("val") * 1.6).alias("thr"))
    return (
        v.crossJoin(F.broadcast(thr))
        .where(F.col("val") > F.col("thr"))
        .select("l_partkey", F.round("val", 6).alias("val"))
        .orderBy(F.col("val").desc(), "l_partkey")
    )


def q_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (lineitem as the partsupp stand-in): distinct
    supplier count per surviving (brand, type, size) after excluding one
    brand, one type class, large sizes, and 'complaint' suppliers
    (negative balance) — the NOT IN subquery decorrelated to a left-anti
    join. part filter broadcasts; countDistinct is partial+final."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "ECONOMY")
        & (F.col("p_size") < 30)
    )
    bad = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


def q_excess_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted): suppliers who shipped an outsized share
    of red parts in one year — the nested-subquery chain: partkey IN
    (name-filtered parts) as a broadcast semi join, per-supplier quantity
    agg, HAVING above 1.15x the average supplier's volume (broadcast
    scalar), then the surviving keys semi-join back to supplier with a
    broadcast nation lookup for names."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    red = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").startswith("red "))
        .select("p_partkey")
    )
    qty = (
        li.join(F.broadcast(red), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("sq"))
    )
    thr = qty.agg((F.avg("sq") * 1.15).alias("thr"))
    hot = qty.crossJoin(F.broadcast(thr)).where(F.col("sq") > F.col("thr"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        s.join(hot, s.s_suppkey == hot.l_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "s_suppkey", "s_name", "n_name", F.round("sq", 6).alias("ship_qty")
        )
        .orderBy("s_suppkey")
    )


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-curation PII scrub (functions/text.redact_pii): email/phone/IP
    patterns replaced by typed tags in one codegen regexp_replace chain —
    a map-only scan at 100 TB, no shuffle, no Python. The fixture corpus
    carries no PII, so the query deterministically injects one email,
    phone and IPv4 per doc (derived from doc_id) before scrubbing; the
    oracle replays the identical injection + chain, so the full redacted
    string AND the per-doc match count hash-check."""
    from keystone_spark.functions.text import pii_count, redact_pii

    d = _t(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-012-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" ip 10.0."), (F.col("doc_id") % 256).cast("string"),
            F.lit(".7"),
        ).alias("text"),
    )
    return aug.select(
        "doc_id",
        redact_pii(F.col("text")).alias("redacted"),
        pii_count(F.col("text")).cast("long").alias("n_pii"),
    ).orderBy("doc_id")


def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals
    (functions/text.repetition_signals): distinct-token ratio + most
    frequent bigram share per document. The signal struct is
    materialized ONCE in its own projection and fields are extracted
    from the COLUMN — higher-order expressions re-evaluate per
    reference, so calling the signal per output field multiplies the
    whole bigram pass by four (the bench_registry catch). Still one
    map-only scan at 100 TB; no per-doc shuffle (the one exchange
    below re-spreads a single-split fixture scan; no-op on real
    multi-split corpora)."""
    from keystone_spark.functions.text import repetition_signals
    from keystone_spark.sources import ensure_parallelism

    d = ensure_parallelism(_t(spark, sf_dir, "documents"))
    sig = d.select(
        "doc_id",
        repetition_signals(F.split(F.col("text"), " ")).alias("__sig"),
    )
    return sig.select(
        "doc_id",
        F.col("__sig.n_tokens").alias("n_tokens"),
        F.round(F.col("__sig.distinct_ratio"), 6).alias("distinct_ratio"),
        F.col("__sig.top_bigram_count").alias("top_bigram_count"),
        F.round(F.col("__sig.top_bigram_frac"), 6).alias("top_bigram_frac"),
    ).orderBy("doc_id")


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination scan
    (operators/curation.contamination_check): docs sharing any word
    4-gram with the benchmark subset (doc_id % 97 == 0). Docs explode to
    distinct xxhash64 gram hashes (8 bytes through the shuffle, not the
    gram string); the tiny benchmark side broadcasts, so the check is one
    corpus scan + map-side semi filter at 100 TB. The oracle joins on the
    literal gram strings — identical result unless xxhash64 collides."""
    from keystone_spark.operators.curation import contamination_check

    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return contamination_check(
        d.where(F.col("doc_id") % 97 != 0),
        d.where(F.col("doc_id") % 97 == 0),
        n=4,
        token_expr=toks,
    ).orderBy("doc_id")


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-line removal (operators/curation.line_dedup — the
    RefinedWeb/Falcon boilerplate pass): deterministic boilerplate
    headers/footers are injected per doc (so the check is non-vacuous),
    then every line occurring in > 4 distinct docs is dropped and docs
    reassemble from surviving lines in order. One map-side-combinable
    line-frequency agg + broadcast anti join + per-doc reassembly —
    no all-pairs anything at 100 TB."""
    from keystone_spark.operators.curation import line_dedup

    d = _t(spark, sf_dir, "documents")
    boiler = F.element_at(
        F.array(
            F.lit("subscribe to our newsletter"),
            F.lit("accept all cookies"),
            F.lit("copyright 2026 example corp"),
            F.lit("all rights reserved"),
        ),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    footer = F.element_at(
        F.array(
            F.lit("home about contact"),
            F.lit("follow us on social"),
            F.lit("terms of service apply"),
        ),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    aug = d.select(
        "doc_id", F.concat_ws("\n", boiler, F.col("text"), footer).alias("text")
    )
    return line_dedup(aug, max_docs=4).orderBy("doc_id")


def q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span profile (operators/curation.duplicate_spans
    — ExactSubstr dedup, Lee et al. 2022, as a bucketed hash join
    instead of a suffix array): every 8-token span shared verbatim by
    >= 2 distinct docs, rolled up per doc as boilerplate counts and
    fraction. Spans dedupe in-array (no distinct shuffle), travel as
    52-bit md5 longs the oracle replays exactly, and the whole corpus
    profile is two map-side-combinable aggs + one co-partitioned semi
    join — nothing all-pairs, full doc spine preserved. The fixture
    scan is re-spread (single-file split) so the span kernel
    parallelizes; no-op on a real multi-split corpus."""
    from keystone_spark.operators.curation import duplicate_spans
    from keystone_spark.sources import ensure_parallelism

    d = ensure_parallelism(_t(spark, sf_dir, "documents"))
    return duplicate_spans(d, span_tokens=8, min_docs=2).orderBy("doc_id")


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance-resampling weights (operators/curation.
    dsir_logweights — Xie et al. 2023): score every English doc by its
    log importance ratio toward the non-English "target domain" under
    hashed-unigram bag models (256 md5 buckets, add-1 smoothing). Both
    corpora reduce to <= 256 bucket-count rows, the smoothed log-ratio
    table broadcasts onto the exploded raw tokens, and the per-doc sum
    is map-side-combinable — two scans of the corpus, nothing else
    scales with it. The data-selection primitive for curating a 100-TB
    crawl toward a quality domain."""
    from keystone_spark.operators.curation import dsir_logweights
    from keystone_spark.sources import ensure_parallelism

    d = ensure_parallelism(_t(spark, sf_dir, "documents"))
    raw = d.where(F.col("lang") == "en")
    tgt = d.where(F.col("lang") != "en")
    return dsir_logweights(raw, tgt, dim=256).orderBy("doc_id")


def q_top_boilerplate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The operational output of span dedup: WHICH verbatim 8-token
    spans to strip — top 20 by distinct-doc count (ties broken on the
    span text). Same in-array-distinct explode as duplicate_spans but
    grouping the raw span STRING (the remediation list must be
    human-readable); one map-side-combinable count agg + a bounded
    top-k sort. The 100-TB form caps the agg with the same bucket-cap
    reasoning as the LSH joins — here the output IS the oversized
    buckets, so no cap is wanted."""
    from keystone_spark.functions.text import tokens, word_ngrams
    from keystone_spark.sources import ensure_parallelism

    d = ensure_parallelism(_t(spark, sf_dir, "documents"))
    spans = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(word_ngrams(tokens(F.col("text")), 8))
        ).alias("span"),
    )
    return (
        spans.groupBy("span")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .where(F.col("n_docs") >= 2)
        .orderBy(F.col("n_docs").desc(), "span")
        .limit(20)
    )


def q_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RESAMPLING step DSIR exists for: per-source top-5 English
    docs by importance weight toward the non-English target domain
    (deterministic top-k per key — the Gumbel-noise variant swaps the
    order column; ties broken on doc_id). dsir_logweights' broadcast
    ratio join feeds one per-source window that prunes map-side
    (WindowGroupLimit) — selection shuffles each doc once. Ranking
    orders on round(logw, 6): exact-duplicate docs have float-identical
    weights whose cross-engine summation-order spread (~1e-16) would
    otherwise flip the doc_id tiebreak."""
    from keystone_spark.operators.curation import dsir_logweights
    from keystone_spark.sources import ensure_parallelism

    d = ensure_parallelism(_t(spark, sf_dir, "documents"))
    raw = d.where(F.col("lang") == "en")
    tgt = d.where(F.col("lang") != "en")
    w = dsir_logweights(raw, tgt, dim=256)
    joined = raw.select("doc_id", "source").join(w, "doc_id")
    win = Window.partitionBy("source").orderBy(
        F.round("logw", 6).desc(), F.col("doc_id")
    )
    return (
        joined.withColumn("rk", F.row_number().over(win))
        .where(F.col("rk") <= 5)
        .select("source", "rk", "doc_id", "logw")
        .orderBy("source", "rk")
    )


def q_strip_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr REMOVAL (operators/curation.strip_duplicate_spans —
    the second half of Lee et al. 2022; duplicate_spans detects, this
    deletes): an 8-token boilerplate header is injected per doc
    (doc_id % 3 picks one of three, so the strip is non-vacuous at any
    SF), every token covered by a span shared across >= 2 docs is
    removed, and docs reassemble from surviving tokens in order. The
    full cleaned text hash-checks against the oracle — reassembly
    exactness, not just counts."""
    from keystone_spark.operators.curation import strip_duplicate_spans
    from keystone_spark.sources import ensure_parallelism

    d = ensure_parallelism(_t(spark, sf_dir, "documents"))
    header = F.element_at(
        F.array(
            F.lit("please subscribe to our newsletter for daily updates"),
            F.lit("copyright notice all rights reserved by example corp"),
            F.lit("click here to accept all cookies and continue"),
        ),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    aug = d.select(
        "doc_id", F.concat_ws(" ", header, F.col("text")).alias("text")
    )
    return strip_duplicate_spans(aug, span_tokens=8, min_docs=2).orderBy(
        "doc_id"
    )


def q_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE (operators/curation.apply_changes — Delta/Iceberg MERGE
    INTO semantics on raw parquet): a synthesized changelog of updates
    (key % 97: +1000 price at seq 2, with a DECOY delete at seq 1 that
    latest-wins must discard), deletes (% 101), and inserts (% 103,
    shifted keys) folds onto the orders snapshot. The changelog
    broadcast-anti-joins the snapshot: one base scan, map-side filter,
    metadata-only union."""
    from keystone_spark.operators.curation import apply_changes

    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    k = F.col("o_orderkey")
    decoy = base.where(k % 97 == 0).withColumn("op", F.lit("D")).withColumn(
        "seq", F.lit(1)
    )
    upd = (
        base.where(k % 97 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1000.0))
        .withColumn("op", F.lit("U"))
        .withColumn("seq", F.lit(2))
    )
    dele = (
        base.where((k % 101 == 0) & (k % 97 != 0))
        .withColumn("op", F.lit("D"))
        .withColumn("seq", F.lit(2))
    )
    ins = (
        base.where(k % 103 == 0)
        .withColumn("o_orderkey", k + F.lit(10_000_000))
        .withColumn("op", F.lit("I"))
        .withColumn("seq", F.lit(1))
    )
    changes = decoy.unionByName(upd).unionByName(dele).unionByName(ins)
    out = apply_changes(base, changes, ["o_orderkey"], seq_col="seq")
    return out.select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.round("o_totalprice", 6).alias("price"),
    ).orderBy("o_orderkey")


def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style LM filter signal (operators/nlp
    .bigram_logprob_score): bigram stupid-backoff counts fit on the even
    half of the corpus, every doc scored by mean log P(w_i | w_{i-1}) —
    the odd half exercises the backoff path (unseen bigrams). Count fits
    are map-side-combinable aggs; the vocab-bounded model tables
    broadcast back onto the exploded doc bigrams."""
    from keystone_spark.operators.nlp import bigram_logprob_score

    d = _t(spark, sf_dir, "documents")
    out = bigram_logprob_score(d, fit_docs=d.where(F.col("doc_id") % 2 == 0))
    return out.select(
        "doc_id", "n_bigrams", F.round("lm_score", 6).alias("lm_score")
    ).orderBy("doc_id")


def q_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup labeling (operators/dedup.semantic_clusters): cosine
    >= 0.3 near-dup pairs over the bounded id range (the
    embedding_neardup pair kernel) become connected components
    (large-star/small-star), every vec gets (cluster_id, is_rep) with
    the min-id representative kept — the semantic-dedup KEEP/DROP
    labeling. Component labels broadcast back onto the id spine; at
    100 TB the pair generator swaps to simhash/LSH candidates, the
    labeling stays identical."""
    from keystone_spark.functions.vector import cosine_similarity
    from keystone_spark.operators.dedup import semantic_clusters

    e = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    a = e.select(F.col("vec_id").alias("i"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("j"), F.col("embedding").alias("vb"))
    cos = cosine_similarity(
        F.col("va").cast("array<double>"), F.col("vb").cast("array<double>")
    )
    pairs = (
        a.join(F.broadcast(b), F.col("i") < F.col("j"))
        .select("i", "j", F.round(cos, 6).alias("cos"))
        .where(F.col("cos") >= 0.3)
    )
    return semantic_clusters(pairs, e.select("vec_id")).orderBy("vec_id")


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText quality-rule bundle (functions/text
    .gopher_rules): word-count band, mean-word-length band,
    symbol-to-word ratio, bullet/ellipsis line fractions, alpha-word
    ratio, min distinct stopwords — per-rule booleans + the conjunction,
    all one codegen map-only scan. Deterministic symbol spam / bullet /
    ellipsis injections make every rule decide both ways."""
    from keystone_spark.functions.text import gopher_rules

    d = _t(spark, sf_dir, "documents")
    aug = F.concat(
        F.when(F.col("doc_id") % 11 == 0,
               F.lit("- bullet item\n- second bullet\n")).otherwise(F.lit("")),
        F.col("text"),
        F.when(F.col("doc_id") % 7 == 0,
               F.lit(" # # # # # # # #")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 13 == 0,
               F.lit("\nto be continued...")).otherwise(F.lit("")),
        # digit spam: 40 x 30-char numeric tokens push mean_word_len over
        # 10 AND alpha_ratio under 0.8 so both rules decide both ways
        F.when(F.col("doc_id") % 17 == 0,
               F.repeat(F.lit(" 123456789012345678901234567890"), 40))
        .otherwise(F.lit("")),
    )
    g = gopher_rules(
        aug, min_words=50, max_bullet_line_frac=0.5,
        max_ellipsis_line_frac=0.1,
    )
    return d.select("doc_id", g.alias("g")).select("doc_id", "g.*").orderBy(
        "doc_id"
    )


def q_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real BPE tokenization (operators/bpe.BpeTokenizer): merge table
    fit as one word-frequency agg + driver loop over the vocab-bounded
    dictionary, applied as an Arrow-batched pandas_udf with per-batch
    word memoization. The fit itself is iterative (not SQL) — the oracle
    checks n_words exactly and the Spark side proves the subword
    invariants: concatenation conserves every character and the subword
    count is within [n_words, n_chars + n_words]."""
    from keystone_spark.functions.text import tokens
    from keystone_spark.operators.bpe import BpeTokenizer

    d = _t(spark, sf_dir, "documents")
    df = d.select("doc_id", tokens("text").alias("toks"))
    bpe = BpeTokenizer(num_merges=100).fit(df, "toks")
    out = df.withColumn("sub", bpe.encode_column("toks"))
    n_words = F.size("toks")
    n_sub = F.size("sub")
    chars = F.aggregate(
        F.transform("toks", lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    conserved = (
        F.replace(F.concat_ws("", "sub"), F.lit("</w>"), F.lit(""))
        == F.concat_ws("", "toks")
    )
    bounded = (n_sub >= n_words) & (n_sub.cast("long") <= chars + n_words)
    return out.select(
        "doc_id",
        n_words.cast("int").alias("n_words"),
        conserved.alias("conserved"),
        bounded.alias("bounded"),
    ).orderBy("doc_id")


def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group statistics: exact p01/p99 fences per event_type
    (interpolated percentile — matches quantile_cont), values clipped to
    the fences, then mean/std of the winsorized column plus clip counts.
    The fence table is group-cardinality-bounded -> broadcast back; two
    scans, no sort of the full data. The outlier-robust cousin of the
    StandardScaler moments fit (SURVEY §2.4)."""
    e = _t(spark, sf_dir, "events")
    fences = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.01)).alias("p01"),
        F.percentile("value", F.lit(0.99)).alias("p99"),
    )
    j = e.join(F.broadcast(fences), "event_type")
    clipped = F.least(F.greatest(F.col("value"), F.col("p01")), F.col("p99"))
    return (
        j.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("value") < F.col("p01")).cast("long")).alias("n_low"),
            F.sum((F.col("value") > F.col("p99")).cast("long")).alias("n_high"),
            F.round(F.avg(clipped), 6).alias("w_mean"),
            F.round(F.stddev_samp(clipped), 6).alias("w_std"),
        )
        .orderBy("event_type")
    )


def q_url_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing surface (web-curation staple): deterministic URLs
    synthesized per doc, parse_url extracts HOST/PATH/QUERY-param
    JVM-side, then per-host rollup. The oracle re-derives the same parts
    with anchored regexes — identical for well-formed URLs."""
    d = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/"),
        F.col("lang"), F.lit("/doc-"), F.col("doc_id"),
        F.lit("?ref="), F.col("lang"),
        F.lit("&p="), F.col("doc_id") % 7,
    )
    parts = d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("ref")).alias("ref"),
    )
    return (
        parts.groupBy("host")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("path").alias("n_paths"),
            F.countDistinct("ref").alias("n_refs"),
        )
        .orderBy("host")
    )


def q_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per user over a bounded
    20-row trailing window (time-series smoothing / spike detection
    input): one shuffle on user_id, bounded window state, the weighted
    sum folded with a higher-order array aggregate — no UDF, no
    unbounded recursion (the bounded frame keeps pow() well-conditioned
    and memory per key O(window))."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, 0)
    )
    arr = F.collect_list("value").over(w)
    n = F.size(arr)
    decay = 0.7
    num = F.aggregate(
        F.zip_with(
            arr,
            F.sequence(F.lit(1), n),
            lambda x, i: x * F.pow(F.lit(decay), (n - i).cast("double")),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    den = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.pow(F.lit(decay), (n - i).cast("double")),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    # two-step select: aliasing the rounded value in the same projection
    # as the window would be a lateral-alias reference into the frame
    smoothed = e.where(F.col("user_id") < 200).select(
        "user_id", "event_id", "value", F.round(num / den, 6).alias("ewma")
    )
    return smoothed.select(
        "user_id", "event_id", F.round("value", 6).alias("value"), "ewma"
    ).orderBy("user_id", "event_id")


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 retrieval (operators/nlp.bm25_search): queries are the
    first 5 tokens of every doc_id % 100 == 0 doc; postings + doc-length
    + idf tables from one tokenize/explode pass each; tiny query side
    broadcasts so scoring touches only matched postings. Oracle replays
    the exact Lucene-form formula in SQL."""
    from keystone_spark.functions.text import tokens
    from keystone_spark.operators.nlp import bm25_search

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    qs = d.where(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("query_id"), F.slice("toks", 1, 5).alias("q_toks")
    )
    out = bm25_search(d, qs, k=10)
    return out.select(
        "query_id", "doc_id", F.round("score", 6).alias("score"), "rk"
    ).orderBy("query_id", "rk")


_BM25_INDEX_CACHE: dict = {}


def _bm25_index_path(sf_dir: str, variant: str) -> str:
    """Deterministic, overwrite-semantics index location (VERDICT r9
    #5): ``.localdata/indexes/`` under the repo (gitignored), keyed by
    the sf_dir — repeated harness sessions overwrite one directory
    instead of littering /tmp with per-session mkdtemps."""
    import os

    tag = sf_dir.strip("/").replace("/", "_")
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        ".localdata", "indexes")
    os.makedirs(root, exist_ok=True)
    return os.path.join(root, f"{variant}_{tag}")


def q_bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production BM25 path (VERDICT r8 #5, r10 raw-count layout):
    build-once Bm25Index storing exact counts (tf, dl per posting; df
    deltas; N/sum_dl in the manifest), persisted partitioned by term
    hash bucket, reloaded, searched. The search plan is scan matched
    buckets (postings AND df deltas both bucket-pruned) -> co-partition
    by doc -> broadcast-join query terms carrying derived idf -> sum
    the codegen weight expression with NO exchange
    (HashPartitioning(doc) satisfies the (query, doc) clustering) ->
    map-side-pruned top-k: no corpus-wide aggregation and no
    pair-scale shuffle anywhere in it. Measured at sf1 (500
    stop-word-dense queries x 50k docs = 89M scored postings): ~5 s vs
    ~6.6 s for bm25_search — the gap is the rebuild's corpus-wide
    df/idf/avgdl aggregations, which at 100 TB are the whole corpus
    scan the stored index exists to skip. Same queries, formula, and
    tie-break as bm25_search, so the result is identical and shares
    its exact SQL oracle. The tbucket partition filter is asserted on
    the executed plan — a pruning regression fails the query itself."""
    from keystone_spark.functions.text import tokens
    from keystone_spark.operators.nlp import Bm25Index

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    key = (id(spark._jsparkSession) if hasattr(spark, "_jsparkSession")
           else id(spark), sf_dir)
    path = _BM25_INDEX_CACHE.get(key)
    if path is None:
        path = _bm25_index_path(sf_dir, "bm25")
        Bm25Index.build(d, k1=1.2, b=0.75, n_term_buckets=64).save(path)
        _BM25_INDEX_CACHE[key] = path
    idx = Bm25Index.load(spark, path)
    qs = d.where(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("query_id"), F.slice("toks", 1, 5).alias("q_toks")
    )
    out = idx.search(qs, k=10, k1=1.2, b=0.75)

    import re

    plan = out._jdf.queryExecution().executedPlan().toString()
    m = re.search(
        r"PartitionFilters: \[[^\]]*tbucket#\d+ (?:INSET|IN) \(?([^\])]*)",
        plan,
    )
    if not m:
        raise AssertionError(
            "Bm25Index search scan lost its tbucket partition filter:\n"
            + plan[:2000]
        )
    n_scanned = len(m.group(1).split(","))
    if not 0 < n_scanned < 64:
        raise AssertionError(
            f"Bm25Index partition filter is vacuous ({n_scanned} of 64 "
            "term buckets scanned):\n" + plan[:2000]
        )
    return out.select(
        "query_id", "doc_id", F.round("score", 6).alias("score"), "rk"
    ).orderBy("query_id", "rk")


def q_bm25_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index MAINTENANCE path (VERDICT r9 #1): the Bm25Index is built on
    HALF the corpus (doc_id % 2 == 0) and the other half is APPENDED
    with ``Bm25Index.add`` — postings and df deltas land in the
    bucket-partitioned tables, one generation row carries the batch's
    (n_docs, sum_dl) deltas, and NOTHING corpus-scale is re-aggregated.
    The search then runs over the stored counts exactly as
    bm25_indexed does. Because the v2 layout stores exact counts
    (associative under append), the result is HASH-IDENTICAL to an
    index built from scratch over the union — so this query shares
    bm25_search's full-corpus SQL oracle, and the driver's hash compare
    IS the add==rebuild identity check, at every sf it samples."""
    from keystone_spark.functions.text import tokens
    from keystone_spark.operators.nlp import Bm25Index

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    key = ("bm25inc", id(spark._jsparkSession)
           if hasattr(spark, "_jsparkSession") else id(spark), sf_dir)
    path = _BM25_INDEX_CACHE.get(key)
    if path is None:
        path = _bm25_index_path(sf_dir, "bm25inc")
        Bm25Index.build(
            d.where(F.col("doc_id") % 2 == 0), k1=1.2, b=0.75,
            n_term_buckets=64,
        ).save(path)
        stats = Bm25Index.add(
            spark, path, d.where(F.col("doc_id") % 2 != 0)
        )
        if stats["generation"] != 1 or stats["batch_docs"] <= 0:
            raise AssertionError(f"bm25 append did not land: {stats}")
        _BM25_INDEX_CACHE[key] = path
    idx = Bm25Index.load(spark, path)
    qs = d.where(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("query_id"), F.slice("toks", 1, 5).alias("q_toks")
    )
    out = idx.search(qs, k=10)
    return out.select(
        "query_id", "doc_id", F.round("score", 6).alias("score"), "rk"
    ).orderBy("query_id", "rk")


def q_bm25_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING lexical-index ingest, driver-hash-checked (r13): the
    Bm25Index is built on half the corpus (doc_id % 2 == 0) and the
    other half arrives through ``streaming.stream_bm25_ingest`` — the
    foreachBatch production fold, two micro-batches, idempotent
    ``skip_existing_ids`` adds wrapped in the r13
    ``retry_contention`` contention-retry, with the fold's own
    ``compact_every_n`` compaction exercised mid-stream. Because the
    raw-count layout is associative under append and compact re-derives
    exact survivor stats, a search afterwards is HASH-IDENTICAL to an
    index built from scratch over the union — so this query shares
    bm25_search's full-corpus SQL oracle, and the driver's hash compare
    is the stream==rebuild identity at every sf it samples (upgrading
    the fold's oracle class from behavioral-pytest to DuckDB hash).
    In-query asserts: both halves landed exactly once (n_docs) and the
    post-compact tbucket partition pruning survives."""
    import tempfile

    from keystone_spark.functions.text import tokens
    from keystone_spark.operators.nlp import Bm25Index
    from keystone_spark.streaming.windows import stream_bm25_ingest

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    key = ("bm25stream", id(spark._jsparkSession)
           if hasattr(spark, "_jsparkSession") else id(spark), sf_dir)
    path = _BM25_INDEX_CACHE.get(key)
    if path is None:
        path = _bm25_index_path(sf_dir, "bm25stream")
        Bm25Index.build(
            d.where(F.col("doc_id") % 2 == 0), k1=1.2, b=0.75,
            n_term_buckets=64,
        ).save(path)
        src = tempfile.mkdtemp(prefix="bm25_stream_src_")
        odd = d.where(F.col("doc_id") % 2 != 0)
        # two micro-batches by id parity-of-half (maxFilesPerTrigger=1)
        odd.where(F.col("doc_id") % 4 == 1).coalesce(1).write.mode(
            "overwrite").parquet(f"{src}/b0")
        odd.where(F.col("doc_id") % 4 == 3).coalesce(1).write.mode(
            "overwrite").parquet(f"{src}/b1")
        stream = (
            spark.readStream.schema(spark.read.parquet(f"{src}/b0").schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        stream_bm25_ingest(stream, path, compact_every_n=2)
        _BM25_INDEX_CACHE[key] = path
    idx = Bm25Index.load(spark, path)
    n_all = d.count()
    if idx.params["n_docs"] != n_all:
        raise AssertionError(
            f"stream ingest lost/duplicated docs: index n_docs "
            f"{idx.params['n_docs']} != corpus {n_all}"
        )
    qs = d.where(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("query_id"), F.slice("toks", 1, 5).alias("q_toks")
    )
    out = idx.search(qs, k=10)

    import re

    plan = out._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[[^\]]*tbucket#\d+ (?:INSET|IN)", plan)
    if not m:
        raise AssertionError(
            "post-compact streamed Bm25Index search lost its tbucket "
            "partition filter:\n" + plan[:2000]
        )
    return out.select(
        "query_id", "doc_id", F.round("score", 6).alias("score"), "rk"
    ).orderBy("query_id", "rk")


def q_bm25_delete_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index delete+compact path (VERDICT r10 #1/#2, r11): the
    full-corpus Bm25Index gets ``delete(doc_id % 10 == 3)`` then
    ``compact`` — tombstoned postings physically purged, df re-derived
    from survivors, (N, sum_dl) snapped to exact survivor values, one
    term-sorted file per bucket — and is then searched exactly as
    bm25_indexed is. The delete+compact == survivor-rebuild identity
    (pytest-pinned since r10) becomes DRIVER-hash-checked here: the
    oracle is bm25_search's full SQL evaluated over the surviving
    documents only, so any stale-stat leak, unpurged posting, or
    resurrected doc breaks the hash at every sf the driver samples.
    The query set (doc_id % 100 == 0) is disjoint from the deleted set
    (those ids are % 10 == 0), so queries search a corpus they
    survive in. tbucket partition pruning is re-asserted on the
    POST-compact layout."""
    from keystone_spark.functions.text import tokens
    from keystone_spark.operators.nlp import Bm25Index

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    key = ("bm25del", id(spark._jsparkSession)
           if hasattr(spark, "_jsparkSession") else id(spark), sf_dir)
    path = _BM25_INDEX_CACHE.get(key)
    if path is None:
        path = _bm25_index_path(sf_dir, "bm25del")
        Bm25Index.build(d, k1=1.2, b=0.75, n_term_buckets=64).save(path)
        stats = Bm25Index.delete(
            spark, path, d.where(F.col("doc_id") % 10 == 3).select("doc_id")
        )
        if stats["tombstones_added"] <= 0:
            raise AssertionError(f"bm25 delete did not land: {stats}")
        Bm25Index.compact(spark, path)
        _BM25_INDEX_CACHE[key] = path
    idx = Bm25Index.load(spark, path)
    if idx.params["incomplete_generations"]:
        raise AssertionError(
            "compact left orphan generations: "
            f"{idx.params['incomplete_generations']}"
        )
    qs = d.where(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("query_id"), F.slice("toks", 1, 5).alias("q_toks")
    )
    out = idx.search(qs, k=10, k1=1.2, b=0.75)

    import re

    plan = out._jdf.queryExecution().executedPlan().toString()
    m = re.search(
        r"PartitionFilters: \[[^\]]*tbucket#\d+ (?:INSET|IN) \(?([^\])]*)",
        plan,
    )
    if not m:
        raise AssertionError(
            "post-compact Bm25Index search lost its tbucket partition "
            "filter:\n" + plan[:2000]
        )
    n_scanned = len(m.group(1).split(","))
    if not 0 < n_scanned < 64:
        raise AssertionError(
            f"post-compact partition filter is vacuous ({n_scanned} of "
            "64 term buckets scanned):\n" + plan[:2000]
        )
    return out.select(
        "query_id", "doc_id", F.round("score", 6).alias("score"), "rk"
    ).orderBy("query_id", "rk")


def q_bm25_pointer_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Object-store-safe compaction path (VERDICT r11 #3, r12): the
    index lives under a versioned ROOT — snapshots ``{root}/v0``,
    ``{root}/v1`` with an atomic ``_LATEST`` pointer naming the
    current one. Build on half the corpus at v0, publish the pointer,
    APPEND the other half and DELETE (doc_id % 10 == 7) through the
    ROOT (mutations resolve the pointer and serialize under the r12
    write-lock), then ``compact(dest=v1)``: the purged rewrite lands
    as a FRESH index at v1 and the commit is ONE pointer flip — no
    rename of live data, which is the only atomic shape an object
    store offers (in-place stage-and-swap relies on atomic directory
    rename, local/HDFS only). Search through the root then serves the
    purged v1 snapshot; the oracle is bm25_search's full SQL over the
    SURVIVING documents, so a stale pointer, an unpurged posting, a
    mutation landed in the orphaned snapshot, or stale stats all break
    the driver's hash. tbucket partition pruning is asserted on the
    NEW snapshot's layout."""
    from keystone_spark.fsutil import fs_delete, read_latest_pointer
    from keystone_spark.fsutil import write_latest_pointer
    from keystone_spark.functions.text import tokens
    from keystone_spark.operators.nlp import Bm25Index

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    key = ("bm25ptr", id(spark._jsparkSession)
           if hasattr(spark, "_jsparkSession") else id(spark), sf_dir)
    root = _BM25_INDEX_CACHE.get(key)
    if root is None:
        root = _bm25_index_path(sf_dir, "bm25ptr")
        fs_delete(spark, root)  # stale root (old pointer) from a
        # previous harness session must not redirect the fresh build
        Bm25Index.build(
            d.where(F.col("doc_id") % 2 == 0), k1=1.2, b=0.75,
            n_term_buckets=64,
        ).save(f"{root}/v0")
        write_latest_pointer(spark, root, "v0")
        stats = Bm25Index.add(
            spark, root, d.where(F.col("doc_id") % 2 != 0)
        )
        if stats["generation"] != 1 or stats["batch_docs"] <= 0:
            raise AssertionError(f"bm25 append did not land: {stats}")
        dstats = Bm25Index.delete(
            spark, root, d.where(F.col("doc_id") % 10 == 7).select("doc_id")
        )
        if dstats["tombstones_added"] <= 0:
            raise AssertionError(f"bm25 delete did not land: {dstats}")
        cstats = Bm25Index.compact(spark, root, dest=f"{root}/v1")
        if cstats["dest"] != f"{root}/v1":
            raise AssertionError(f"dest compact did not land: {cstats}")
        _BM25_INDEX_CACHE[key] = root
    if read_latest_pointer(spark, root) != "v1":
        raise AssertionError(
            "dest compact did not flip the _LATEST pointer: "
            f"{read_latest_pointer(spark, root)!r}"
        )
    idx = Bm25Index.load(spark, root)
    if idx.path.rstrip("/") != f"{root}/v1":
        raise AssertionError(
            f"reader did not resolve the pointer: {idx.path}"
        )
    if idx.params["incomplete_generations"]:
        raise AssertionError(
            "dest compact left orphan generations: "
            f"{idx.params['incomplete_generations']}"
        )
    qs = d.where(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("query_id"), F.slice("toks", 1, 5).alias("q_toks")
    )
    out = idx.search(qs, k=10, k1=1.2, b=0.75)

    import re

    plan = out._jdf.queryExecution().executedPlan().toString()
    m = re.search(
        r"PartitionFilters: \[[^\]]*tbucket#\d+ (?:INSET|IN) \(?([^\])]*)",
        plan,
    )
    if not m:
        raise AssertionError(
            "pointer-resolved Bm25Index search lost its tbucket "
            "partition filter:\n" + plan[:2000]
        )
    n_scanned = len(m.group(1).split(","))
    if not 0 < n_scanned < 64:
        raise AssertionError(
            f"post-dest-compact partition filter is vacuous "
            f"({n_scanned} of 64 term buckets scanned):\n" + plan[:2000]
        )
    return out.select(
        "query_id", "doc_id", F.round("score", 6).alias("score"), "rk"
    ).orderBy("query_id", "rk")


def q_gap_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over the gap_fill grid (operators/relational
    .interpolate_linear): missing hourly points get the time-weighted
    blend of nearest observed neighbors (LOCF/NOCB at the edges). Both
    direction windows share one user_id shuffle + sort."""
    from keystone_spark.operators.relational import interpolate_linear

    e = _t(spark, sf_dir, "events").where(
        (F.col("ts") >= F.lit("2024-01-01 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-02 00:00:00").cast("timestamp"))
        & (F.col("user_id") < 10)
    )
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.round(F.avg("value"), 6).alias("v"))
    grid = (
        e.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    F.lit("2024-01-01 00:00:00").cast("timestamp"),
                    F.lit("2024-01-01 23:00:00").cast("timestamp"),
                    F.expr("interval 1 hour"),
                )
            ).alias("h"),
        )
    )
    joined = grid.join(hourly, ["user_id", "h"], "left").select(
        "user_id", F.unix_timestamp("h").alias("h"), "v"
    )
    out = interpolate_linear(joined, ["user_id"], "h", "v")
    return out.select(
        "user_id", "h", F.round("v_interp", 6).alias("v_interp")
    ).orderBy("user_id", "h")


def q_pagerank_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality (operators/graph.pagerank) over the symmetric
    cosine >= 0.3 near-dup graph on the bounded id range: power
    iteration with dangling-mass redistribution, localCheckpoint-bounded
    lineage. The iteration is not SQL-expressible — the oracle pins the
    conservation invariants (all nodes labeled, ranks sum to 1, all
    positive), and pytest checks exact values against numpy on a known
    graph."""
    from keystone_spark.functions.vector import cosine_similarity
    from keystone_spark.operators.graph import pagerank

    e = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    a = e.select(F.col("vec_id").alias("i"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("j"), F.col("embedding").alias("vb"))
    cos = cosine_similarity(
        F.col("va").cast("array<double>"), F.col("vb").cast("array<double>")
    )
    pairs = (
        a.join(F.broadcast(b), F.col("i") < F.col("j"))
        .select("i", "j", F.round(cos, 6).alias("cos"))
        .where(F.col("cos") >= 0.3)
    )
    sym = pairs.select("i", "j").unionByName(
        pairs.select(F.col("j").alias("i"), F.col("i").alias("j"))
    )
    ranks = pagerank(sym, nodes=e.select("vec_id"), max_iter=20)
    return ranks.agg(
        F.count("*").cast("long").alias("n_nodes"),
        (F.abs(F.sum("rank") - 1.0) < 1e-9).alias("sum_ok"),
        (F.min("rank") > 0.0).alias("all_pos"),
    )


def q_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup dedup via perceptual hash (VERDICT r5 #4): the
    LAION-style multimodal pipeline — operators/multimodal.phash64
    (grayscale -> 32² area resize -> 2-D DCT -> median-bit signature)
    feeding operators/dedup.hash64_candidates (banded 64-bit LSH: a pair
    within Hamming n_bands-1 must share an exact band, so the all-pairs
    product becomes a band equi-join + bit_count verify).

    Fixture: one deterministic 16x16 synthetic grayscale image per
    doc_id < 40 (pixel k = ((id*2654435761 + k*40503) mod 256) / 255 —
    pure codegen expressions, no binary payloads), plus a PLANTED 2x
    nearest-neighbor upscale twin (img_id = id + 10000) for every even
    id. pHash's scale-aligned center sampling maps the 2x copy onto the
    same source pixels, so each planted pair hashes identically
    (Hamming 0) and the banded join must recover ALL of them — the
    banded-recovery invariant the oracle pins (the pagerank_ranks
    pattern: the DCT itself is not SQL-expressible, the recovery
    contract is). Pixel-exact pHash values are pinned in
    tests/test_multimodal.py."""
    from keystone_spark.operators.dedup import hash64_candidates
    from keystone_spark.operators.multimodal import phash64

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 40).select(
        "doc_id"
    )

    def val(idc, kc):
        return ((idc * F.lit(2654435761) + kc * F.lit(40503)) % 256) / 255.0

    def img(h, w, data):
        return F.struct(
            F.lit(h).alias("height"),
            F.lit(w).alias("width"),
            F.lit(1).alias("n_channels"),
            data.alias("data"),
        )

    base = d.select(
        F.col("doc_id").alias("img_id"),
        img(
            16, 16,
            F.transform(
                F.sequence(F.lit(0), F.lit(255)),
                lambda k: val(F.col("doc_id"), k).cast("float"),
            ),
        ).alias("image"),
    )
    # 2x upscale: target (y, x) reads source (y//2, x//2)
    twin = d.where(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") + 10000).alias("img_id"),
        img(
            32, 32,
            F.transform(
                F.sequence(F.lit(0), F.lit(1023)),
                lambda k: val(
                    F.col("doc_id"),
                    F.floor(F.floor(k / 32) / 2) * 16
                    + F.floor((k % 32) / 2),
                ).cast("float"),
            ),
        ).alias("image"),
    )
    hashed = phash64(
        base.unionByName(twin), image_col="image", out_col="phash"
    )
    cands = hash64_candidates(
        hashed, "img_id", "phash", n_bands=4, max_hamming=3
    )
    planted = cands.where(F.col("j") == F.col("i") + 10000)
    n_img = hashed.agg(F.count("*").cast("long").alias("n_images"))
    expected = d.where(F.col("doc_id") % 2 == 0).agg(
        F.count("*").cast("long").alias("n_planted")
    )
    rec = planted.agg(
        F.count("*").cast("long").alias("n_recovered"),
        F.coalesce(F.max("hamming"), F.lit(-1)).cast("long").alias("__mh"),
    )
    out = (
        n_img.crossJoin(F.broadcast(expected))
        .crossJoin(F.broadcast(rec))
        .select(
            "n_images",
            "n_planted",
            "n_recovered",
            (F.col("n_recovered") == F.col("n_planted")).alias("recovered_ok"),
            (F.col("__mh") == 0).alias("planted_exact"),
        )
    )
    # propagate hash64_candidates' persist contract through the aggregate
    # (ADVICE r7 medium): without this the bench/verify release loop finds
    # nothing and the persisted signature table leaks on every run
    out._keystone_caches = list(getattr(cands, "_keystone_caches", []))
    return out


def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over per-user event-type baskets:
    support / confidence / lift for every ordered type pair — the
    A-priori 2-itemset pass as pure joins/aggs. Baskets are distinct
    (user, type) rows (one dedup shuffle); pair counts come from a
    self-join on user_id (bounded fanout: |types|^2 per user, here <=
    25); item counts broadcast back onto the pair table. At 100 TB the
    same shape holds because the per-basket item set, not the corpus,
    bounds the join fanout."""
    e = _t(spark, sf_dir, "events")
    baskets = e.select("user_id", "event_type").distinct()
    n_users = baskets.select("user_id").distinct().count()
    item = baskets.groupBy("event_type").agg(F.count("*").alias("cnt"))
    a = baskets.select("user_id", F.col("event_type").alias("ante"))
    b = baskets.select("user_id", F.col("event_type").alias("cons"))
    pairs = (
        a.join(b, "user_id")
        .where(F.col("ante") != F.col("cons"))
        .groupBy("ante", "cons")
        .agg(F.count("*").alias("both"))
    )
    ia = F.broadcast(item.select(F.col("event_type").alias("ante"),
                                 F.col("cnt").alias("n_a")))
    ic = F.broadcast(item.select(F.col("event_type").alias("cons"),
                                 F.col("cnt").alias("n_c")))
    nu = float(n_users)
    return (
        pairs.join(ia, "ante").join(ic, "cons")
        .select(
            "ante", "cons",
            F.round(F.col("both") / F.lit(nu), 6).alias("support"),
            F.round(F.col("both") / F.col("n_a"), 6).alias("confidence"),
            F.round(
                (F.col("both") / F.lit(nu))
                / ((F.col("n_a") / F.lit(nu)) * (F.col("n_c") / F.lit(nu))),
                6,
            ).alias("lift"),
        )
        .orderBy("ante", "cons")
    )


def q_binned_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bin-bucketed range join (operators/relational.binned_range_join):
    order totalprice points against 60 overlapping price bands — the
    equi-join on floor(price/bin) + exploded band bins replaces the
    nested loop Spark would otherwise plan for a bare BETWEEN (pinned:
    no BNLJ/cartesian in test_plan_quality). Band membership counts per
    band; oracle uses the naive BETWEEN join (same semantics)."""
    from keystone_spark.operators.relational import binned_range_join

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    bands = spark.range(60).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 5000.0).alias("lo"),
        (F.col("id") * 5000.0 + 12000.0).alias("hi"),
    )
    j = binned_range_join(o, bands, "o_totalprice", "lo", "hi", 5000.0)
    return (
        j.groupBy("band_id")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
        )
        .orderBy("band_id")
    )


def q_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL distinct sketches (Spark 4 datasketches surface):
    one sketch per event_type, merged with hll_union_agg to a global
    estimate — the re-aggregatable distinct-count lifecycle (build
    per-partition/per-day sketches once, merge any rollup later without
    rescanning 100 TB). Per-type estimates must be exact at this
    cardinality; the merged estimate is pinned within 5% of exact
    (boolean, oracle-checkable)."""
    e = _t(spark, sf_dir, "events")
    sk = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact"),
    )
    per_type = sk.select(
        "event_type",
        F.hll_sketch_estimate("sk").alias("est"),
        "exact",
    )
    merged = sk.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("m_est")
    ).first()
    total_exact = e.select("user_id").distinct().count()
    ok = abs(merged["m_est"] - total_exact) <= 0.05 * total_exact
    return (
        per_type.select(
            "event_type",
            F.col("exact").cast("long").alias("exact"),
            (F.abs(F.col("est") - F.col("exact"))
             <= 0.05 * F.col("exact")).alias("est_within_5pct"),
            F.lit(bool(ok)).alias("merged_within_5pct"),
        )
        .orderBy("event_type")
    )


def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate (operators/observe
    .constraint_checks) over orders with PLANTED violations (nulled
    custkeys, duplicated keys, out-of-range prices, orphan FK rows) so
    every check reports a non-zero, oracle-checkable count: not-null +
    range fold into one scan, uniqueness is one grouped agg, FK orphans
    one broadcast anti join."""
    from keystone_spark.operators.observe import constraint_checks

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    planted = o.unionByName(
        o.where(F.col("o_orderkey") % 500 == 0)  # duplicate keys
    ).withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 97 == 0, F.lit(None))
        .otherwise(F.col("o_custkey")),
    ).withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 101 == 0, F.lit(-5.0))
        .otherwise(F.col("o_totalprice")),
    ).withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 103 == 0, F.col("o_custkey") + 9_000_000)
        .otherwise(F.col("o_custkey")),  # orphan FKs
    )
    cust = _t(spark, sf_dir, "customer")
    out = constraint_checks(
        planted,
        not_null=["o_custkey"],
        unique=[["o_orderkey"]],
        ranges={"o_totalprice": (0.0, 1e9)},
        foreign_keys=[("o_custkey", cust, "c_custkey")],
    )
    return out.orderBy("check")


def q_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dimension-as-of-fact-time lookup: events join their user's
    SCD2 interval valid at the event's timestamp (the lakehouse temporal
    join). The equi user_id key makes it a plain hash join with a range
    post-filter — the shape that scales; per-(user, state) event counts
    keep the output bounded."""
    e = _t(spark, sf_dir, "events").where(F.col("user_id") < 100).select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("t"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    ch = e.withColumn("prev", F.lag("event_type").over(w)).where(
        F.col("prev").isNull() | (F.col("prev") != F.col("event_type"))
    )
    dim = ch.withColumn("valid_to", F.lead("t").over(w)).select(
        "user_id", F.col("event_type").alias("state"),
        F.col("t").alias("valid_from"), "valid_to",
    )
    facts = e.select("user_id", "t")
    j = facts.join(dim, "user_id").where(
        (F.col("t") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("t") < F.col("valid_to")))
    )
    return (
        j.groupBy("user_id", "state")
        .agg(F.count("*").alias("n"))
        .orderBy("user_id", "state")
    )


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count on the cosine >= 0.3 near-dup graph: with edges
    canonicalized i < j, triangles are triples a<b<c with all three
    edges present — two equi-joins, no enumeration of non-edges. (At
    scale, orient each edge from its lower-degree endpoint first so the
    join fanout is bounded by arboricity — the standard MR triangle
    recipe; the canonical-id orientation here is its fixture-scale
    form.) Exact SQL twin."""
    from keystone_spark.functions.vector import cosine_similarity

    e = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    a = e.select(F.col("vec_id").alias("i"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("j"), F.col("embedding").alias("vb"))
    cos = cosine_similarity(
        F.col("va").cast("array<double>"), F.col("vb").cast("array<double>")
    )
    edges = (
        a.join(F.broadcast(b), F.col("i") < F.col("j"))
        .select("i", "j", F.round(cos, 6).alias("cos"))
        .where(F.col("cos") >= 0.3)
        .select("i", "j")
    )
    ab = edges.select(F.col("i").alias("a"), F.col("j").alias("b"))
    bc = edges.select(F.col("i").alias("b"), F.col("j").alias("c"))
    ac = edges.select(F.col("i").alias("a"), F.col("j").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])
    return tri.agg(F.count("*").cast("long").alias("n_triangles"))


def q_equidepth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) histogram of order totalprice: every
    bucket holds the same row count, bucket edges adapt to the
    distribution — the histogram a cost-based optimizer keeps. Exact
    NTILE(10) semantics WITHOUT the single-partition global sort
    (VERDICT r5 #6): operators/stats.ranked_series produces the exact
    global rank via two-phase distributed ranking (range repartition +
    broadcast prefix offsets), and ntile_from_rank recovers ANSI NTILE
    in pure integer math — row-for-row equal to
    NTILE(10) OVER (ORDER BY ...), parallel at any cardinality. The
    sketch-boundary twin (operators/stats.approx_equidepth_hist) stays
    the cheaper one-pass option when ~0.1% bucket-mass error is fine."""
    from keystone_spark.operators.stats import ntile_from_rank, ranked_series

    o = _t(spark, sf_dir, "orders")
    ranked, n, _ = ranked_series(
        o.select(F.col("o_totalprice").alias("p"), "o_orderkey"),
        [F.col("p").asc(), F.col("o_orderkey").asc()],
        rank_col="__r",
    )
    return (
        ranked.select("p", ntile_from_rank("__r", n, 10).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("p"), 6).alias("lo"),
            F.round(F.max("p"), 6).alias("hi"),
        )
        .orderBy("bucket")
    )


def q_hashed_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (functions/text.hash_bucket — the HashingTF
    trick): per-doc bucket counts in a fixed 256-dim space, exact
    collisions included. md5-derived buckets so the oracle replays the
    IDENTICAL assignment; one explode + count shuffle here (the map
    form in functions/text.hashed_tf is explode-free)."""
    from keystone_spark.functions.text import hash_bucket, tokens

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return (
        d.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .select("doc_id", hash_bucket("tok", 256).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("tf"))
        .orderBy("doc_id", "bucket")
    )


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sample without replacement
    (operators/curation.weighted_sample_per_key — Efraimidis-Spirakis
    priorities on md5-derived uniforms): 5 docs per source, weighted by
    n_chars, the EXACT selection replayed by the SQL twin. Longer docs
    survive more often — the quality-weighted corpus subsample."""
    from keystone_spark.operators.curation import weighted_sample_per_key

    d = _t(spark, sf_dir, "documents").select(
        "source", "doc_id", "lang", "n_chars"
    )
    out = weighted_sample_per_key(
        d, ["source"], 5, "n_chars", id_cols=["doc_id"]
    )
    return out.select("source", "doc_id", "lang").orderBy("source", "doc_id")


def q_jaccard_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result set as ngram_jaccard_pairs, computed through the
    PPJoin prefix filter (operators/dedup.prefix_jaccard_pairs): rare
    tokens only in the candidate index, exact verify from full arrays —
    the shuffle-pruned formulation that replaces the full inverted index
    at scale. The oracle is the naive inverted-index SQL: identical
    answers prove the filter is lossless."""
    from keystone_spark.operators.dedup import prefix_jaccard_pairs

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 40)
    return prefix_jaccard_pairs(d, threshold=0.1).orderBy("i", "j")


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort retention: users grouped by first-activity week,
    counted per subsequent activity week offset — two hash aggs and one
    broadcast-able join of the per-user cohort table back onto events;
    the whole analysis shuffles on user_id once."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    )
    first = e.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    j = e.join(first, "user_id")
    return (
        j.groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort"),
            F.floor(
                F.datediff(F.col("wk"), F.col("cohort")) / 7
            ).cast("long").alias("week_n"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("cohort", "week_n")
    )


def q_anomaly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 3-sigma anomaly detection per event_type: each event
    compared to the mean/std of the PRECEDING 50 events of its type
    (leakage-free trailing frame); returns only the flagged rows.
    One shuffle on event_type, bounded window state."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-50, -1)
    )
    mu = F.avg("value").over(w)
    sd = F.stddev_samp("value").over(w)
    n = F.count("value").over(w)
    flagged = e.select(
        "event_type", "event_id", F.round("value", 6).alias("value"),
        F.round(mu, 6).alias("mu"),
        ((F.abs(F.col("value") - mu) > 3 * sd) & (n >= 20)).alias("is_anom"),
    )
    return flagged.where("is_anom").select(
        "event_type", "event_id", "value", "mu"
    ).orderBy("event_type", "event_id")


def q_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: every purchase credited to the FIRST
    event type its user ever emitted (the acquisition channel proxy) —
    one window min-struct per user broadcast back, purchases counted per
    channel."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first = (
        e.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("user_id", F.col("event_type").alias("channel"))
    )
    purchases = e.where(F.col("event_type") == "purchase")
    return (
        purchases.join(first, "user_id")
        .groupBy("channel")
        .agg(
            F.count("*").alias("purchases"),
            F.round(F.sum("value"), 6).alias("revenue"),
        )
        .orderBy("channel")
    )


def q_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-aware (leave-one-out) target encoding with additive
    smoothing — the classic categorical feature for tabular models:
    each row's category encoded by the mean label of OTHER rows in its
    category, shrunk toward the global mean by m pseudo-observations.
    Pure window algebra: per-category sum/count windows minus self, one
    shuffle. Label synthesized deterministically (price > global
    median-ish constant)."""
    o = _t(spark, sf_dir, "orders")
    label = (F.col("o_totalprice") > 150000.0).cast("double")
    w = Window.partitionBy("o_orderpriority")
    m = 10.0
    g = o.select(
        "o_orderkey", "o_orderpriority", label.alias("y")
    )
    gsum = F.sum("y").over(w)
    gcnt = F.count("y").over(w)
    # global mean as a broadcast 1-row cross join — NOT an empty-partition
    # window, which would move every row to a single partition
    gm_df = g.agg((F.sum("y") / F.count("y")).alias("__gm"))
    g = g.crossJoin(F.broadcast(gm_df))
    loo = (gsum - F.col("y") + F.lit(m) * F.col("__gm")) / (gcnt - 1 + m)
    return (
        g.select(
            "o_orderkey", "o_orderpriority",
            F.round(loo, 6).alias("te"),
        )
        .where(F.col("o_orderkey") < 3000)
        .orderBy("o_orderkey")
    )


def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-to-uniform quantile normalization per event_type (the
    distribution-free feature transform): percent_rank maps each value
    to [0,1] within its group — one shuffle, no UDF. Low-cardinality
    partitions (5 types here) mean one task per type at scale; for a
    100 TB version swap the exact rank for approx-percentile boundary
    interpolation (see operators/stats.approx_equidepth_hist)."""
    e = _t(spark, sf_dir, "events").where(F.col("user_id") < 300)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        e.select(
            "event_type", "event_id",
            F.round(F.percent_rank().over(w), 6).alias("q"),
        )
        .orderBy("event_type", "event_id")
    )


def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling median over a trailing 21-row frame per event_type
    (robust smoothing): median of the collected frame array — bounded
    state per row, one shuffle; the approx-percentile sketch replaces
    the exact array at unbounded frame sizes."""
    e = _t(spark, sf_dir, "events").where(F.col("user_id") < 200)
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, 0)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    med = F.when(
        n % 2 == 1, F.element_at(arr, ((n + 1) / 2).cast("int"))
    ).otherwise(
        (
            F.element_at(arr, (n / 2).cast("int"))
            + F.element_at(arr, (n / 2 + 1).cast("int"))
        ) / 2.0
    )
    return (
        e.select(
            "event_type", "event_id", F.round(med, 6).alias("rmed")
        )
        .orderBy("event_type", "event_id")
    )


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (operators/curation.diff_snapshots — the inverse of
    apply_changes): orders vs a deterministically perturbed copy; the
    emitted changelog must contain EXACTLY the planted churn (updates at
    % 97, deletes at % 101, inserts at shifted % 103 keys) and nothing
    else — changelog size proportional to churn, not table. One
    full-outer join on the key with null-safe change detection."""
    from keystone_spark.operators.curation import diff_snapshots

    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    k = F.col("o_orderkey")
    new = (
        base.withColumn(
            "o_totalprice",
            F.when(k % 97 == 0, F.col("o_totalprice") + 1000.0)
            .otherwise(F.col("o_totalprice")),
        )
        .where(~((k % 101 == 0) & (k % 97 != 0)))
        .unionByName(
            base.where(k % 103 == 0).withColumn(
                "o_orderkey", k + F.lit(10_000_000)
            )
        )
    )
    d = diff_snapshots(base, new, ["o_orderkey"])
    return d.select(
        "o_orderkey", "op", "o_orderstatus",
        F.round("o_totalprice", 6).alias("price"),
    ).orderBy("o_orderkey")


def q_twap_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average price/value per (event_type, hour) over
    irregularly-spaced events — each observation weighted by its holding
    time (until the next event of the type, capped at the hour
    boundary). The finance/IoT aggregation a plain AVG gets wrong when
    sampling is bursty. One lead window + one hash agg, single
    event_type shuffle."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    t = F.unix_timestamp("ts")
    nxt = F.lead(t).over(w)
    hour_end = F.unix_timestamp(F.date_trunc("hour", F.col("ts"))) + 3600
    weight = F.least(F.coalesce(nxt, hour_end), hour_end) - t
    base = e.select(
        "event_type",
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("h"),
        "value",
        weight.alias("w"),
    ).where(F.col("w") > 0)
    return (
        base.groupBy("event_type", "h")
        .agg(
            F.round(F.sum(F.col("value") * F.col("w")) / F.sum("w"), 6)
            .alias("twap"),
            F.count("*").alias("n"),
        )
        .where(F.col("h") < 1704153600)  # bound output: first ~2 days
        .orderBy("event_type", "h")
    )


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiling (the dbt/Deequ profile report): per
    column, row count, null count, distinct count, min/max as strings —
    ALL columns folded into a single aggregation over one scan, then
    unpivoted; no per-column job storm."""
    o = _t(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"]
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
    r = o.agg(*aggs)
    rows = []
    for c in cols:
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__n").alias("n"),
                F.col(f"{c}__nulls").alias("nulls"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_s"),
                F.col(f"{c}__max").alias("max_s"),
            )
        )
    return (
        r.select(F.explode(F.array(*rows)).alias("p"))
        .select("p.*")
        .orderBy("column")
    )


def q_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per user, seconds from FIRST view
    to FIRST subsequent purchase; aggregated to count/avg/median
    (exact percentile) — the latency companion to the funnel count.
    Two min-aggs + one join, one user_id shuffle."""
    e = _t(spark, sf_dir, "events")
    t = F.unix_timestamp("ts")
    views = e.where(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min(t).alias("t_view")
    )
    buys = e.where(F.col("event_type") == "purchase").groupBy("user_id").agg(
        F.min(t).alias("t_buy")
    )
    lat = (
        views.join(buys, "user_id")
        .where(F.col("t_buy") >= F.col("t_view"))
        .select((F.col("t_buy") - F.col("t_view")).alias("lat"))
    )
    return lat.agg(
        F.count("*").alias("n_converted"),
        F.round(F.avg("lat"), 6).alias("avg_s"),
        F.round(F.percentile("lat", F.lit(0.5)), 6).alias("median_s"),
    )


def q_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (Pareto report): customers ranked by spend,
    cumulative revenue share at each decile — 'the top 10% of customers
    drive X% of revenue'. Scale shape: the fact scan stays a hash agg;
    the decile comes from operators/stats.ranked_series (two-phase
    distributed global rank — range repartition + broadcast prefix
    offsets, NO single-partition window) + ntile_from_rank integer math,
    exactly equal to NTILE(10) OVER (ORDER BY ...) but parallel at any
    customer cardinality."""
    from keystone_spark.operators.stats import ntile_from_rank, ranked_series

    o = _t(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("s"))
    ranked, n, tots = ranked_series(
        spend,
        [F.col("s").desc(), F.col("o_custkey")],
        cumsum={"s": "__cum"},
        rank_col="__r",
    )
    return (
        ranked.select("s", ntile_from_rank("__r", n, 10).alias("decile"))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("s") / F.lit(float(tots["s"])), 6)
            .alias("rev_share"),
        )
        .orderBy("decile")
    )


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    (prev_type -> type) counts and conditional probabilities — the
    behavioral-model fit (next-action prediction baseline). One lag
    window + one hash agg, single user_id shuffle."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.withColumn("prev", F.lag("event_type").over(w))
        .where(F.col("prev").isNotNull())
        .groupBy("prev", "event_type")
        .agg(F.count("*").alias("n"))
    )
    tot = Window.partitionBy("prev")
    return (
        pairs.select(
            "prev", "event_type", "n",
            F.round(F.col("n") / F.sum("n").over(tot), 6).alias("p"),
        )
        .orderBy("prev", "event_type")
    )


def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-level summary on gap-based sessionization (30-min gap):
    total sessions, mean/median events per session, mean duration —
    the rollup layer over the same lag+cumsum session ids the
    sessionization query builds; one user_id shuffle then
    session-cardinality aggs."""
    e = _t(spark, sf_dir, "events")
    t = F.unix_timestamp("ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = t - F.lag(t).over(w)
    new_s = (gap.isNull() | (gap > 1800)).cast("long")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sess = e.select(
        "user_id", t.alias("t"),
        F.sum(new_s).over(run).alias("s_id"),
    )
    per = sess.groupBy("user_id", "s_id").agg(
        F.count("*").alias("n_ev"),
        (F.max("t") - F.min("t")).alias("dur"),
    )
    return per.agg(
        F.count("*").alias("n_sessions"),
        F.round(F.avg("n_ev"), 6).alias("avg_events"),
        F.round(F.percentile("n_ev", F.lit(0.5)), 6).alias("median_events"),
        F.round(F.avg("dur"), 6).alias("avg_dur_s"),
    )


def q_label_coherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space label coherence: per-label centroid (per-dim
    mean via posexplode + hash agg — label-cardinality-bounded table),
    then each vector's cosine to its OWN label centroid, averaged per
    label. The embedding-quality / clustering-sanity metric: low
    coherence flags mislabeled or entangled classes. Centroids
    broadcast back; per-vec cosine is a (label, dim) join + agg —
    no pairwise anything."""
    e = _t(spark, sf_dir, "embeddings")
    dims = e.select(
        "vec_id", "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("i", "x"),
    )
    cent = dims.groupBy("label", "i").agg(F.avg("x").alias("c"))
    j = dims.join(F.broadcast(cent), ["label", "i"])
    per_vec = j.groupBy("vec_id", "label").agg(
        (
            F.sum(F.col("x") * F.col("c"))
            / (F.sqrt(F.sum(F.col("x") * F.col("x")))
               * F.sqrt(F.sum(F.col("c") * F.col("c"))))
        ).alias("cos")
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.avg("cos"), 6).alias("avg_coherence"),
        )
        .orderBy("label")
    )


def q_cross_source_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus forensics: exact-duplicate pairs counted by (source,
    source) — which feeds copy from each other, the contamination
    matrix that decides dedup ordering and source trust. Self-join on
    the normalized-text hash (only duplicate groups join — the equi key
    IS the content), canonical source ordering via least/greatest. The
    fixture has no exact cross-source copies, so a deterministic
    'mirror' feed (every doc_id % 50 == 0 doc republished under a
    mirror source) is planted to make the matrix non-vacuous."""
    base = _t(spark, sf_dir, "documents")
    mirrored = base.unionByName(
        base.where(F.col("doc_id") % 50 == 0)
        .withColumn("doc_id", F.col("doc_id") + 100_000)
        .withColumn("source", F.concat(F.lit("mirror-"), F.col("source")))
    )
    d = mirrored.select(
        "doc_id", "source", F.md5(F.lower(F.trim("text"))).alias("h")
    )
    a, b = d.alias("a"), d.alias("b")
    pairs = a.join(
        b,
        (F.col("a.h") == F.col("b.h"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.least(F.col("a.source"), F.col("b.source")).alias("src_a"),
        F.greatest(F.col("a.source"), F.col("b.source")).alias("src_b"),
    )
    return (
        pairs.groupBy("src_a", "src_b")
        .agg(F.count("*").alias("n_dup_pairs"))
        .orderBy("src_a", "src_b")
    )


def q_supplier_reliability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier on-time ranking by the Wilson score lower bound (z=1.96)
    — the statistically sound way to rank proportions with unequal
    sample sizes (a 3/3 supplier must NOT outrank a 97/100 one, which a
    raw rate does). One hash agg over lineitem + closed-form math;
    top-20 by the bound. On-time = shipped within 30 days of the order
    date (the fixture carries l_shipdate + o_orderdate)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"])
    agg = j.groupBy("l_suppkey").agg(
        F.count("*").alias("n"),
        F.sum(
            (F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) <= 30)
            .cast("long")
        ).alias("on_time"),
    )
    z = 1.959963984540054
    p = F.col("on_time") / F.col("n")
    n = F.col("n").cast("double")
    wilson = (
        p + z * z / (2 * n)
        - z * F.sqrt((p * (1 - p) + z * z / (4 * n)) / n)
    ) / (1 + z * z / n)
    return (
        agg.select(
            "l_suppkey", "n", "on_time",
            F.round(p, 6).alias("rate"),
            F.round(wilson, 6).alias("wilson_lb"),
        )
        .orderBy(F.col("wilson_lb").desc(), "l_suppkey")
        .limit(20)
    )


def q_monthly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level windowing: revenue aggregated to months, then
    month-over-month and year-over-year deltas via lag(1)/lag(12) over
    the AGGREGATED series — the window runs over the month-cardinality
    table (hundreds of rows), never the fact scan."""
    o = _t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_format(F.date_trunc("month", F.col("o_orderdate")),
                      "yyyy-MM-dd").alias("month")
    ).agg(F.round(F.sum("o_totalprice"), 6).alias("rev"))
    w = Window.orderBy("month")
    return (
        monthly.select(
            "month", "rev",
            F.round(F.col("rev") - F.lag("rev", 1).over(w), 6).alias("mom"),
            F.round(F.col("rev") - F.lag("rev", 12).over(w), 6).alias("yoy"),
        )
        .orderBy("month")
    )


def q_abc_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts ranked by revenue, cumulative
    share cut at 80% (A) / 95% (B) / rest (C) — the Pareto workhorse.
    Scale shape: the cumulative share comes from operators/stats
    .ranked_series (two-phase distributed cumsum — range repartition +
    broadcast per-partition prefix offsets, NO single-partition window),
    so the part series parallelizes at any cardinality. Offset addition
    reassociates the double sum (~1e-15 relative vs a sequential fold);
    both sides therefore quantize cum_share to 9 decimals before the
    0.80/0.95 cuts, so a knife-edge part classifies identically here
    and in the oracle (ADVICE r5)."""
    from keystone_spark.operators.stats import ranked_series

    li = _t(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .alias("rev")
    )
    rk, _n, tots = ranked_series(
        per_part,
        [F.col("rev").desc(), F.col("l_partkey")],
        cumsum={"rev": "__cum"},
        rank_col="__r",
    )
    ranked = rk.select(
        "rev",
        F.round(F.col("__cum") / F.lit(float(tots["rev"])), 9)
        .alias("cum_share"),
    )
    cls = (
        F.when(F.col("cum_share") <= 0.80, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
    )
    return (
        ranked.groupBy(cls.alias("abc"))
        .agg(
            F.count("*").alias("n_parts"),
            F.round(F.sum("rev"), 6).alias("class_rev"),
        )
        .orderBy("abc")
    )


def q_repeat_purchase_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase curve: average order value by the customer's
    order SEQUENCE number (1st, 2nd, ... order) — the LTV-shape input.
    One row_number window per customer + one hash agg; capped at the
    first 10 orders for a bounded, skew-free output."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        F.row_number().over(w).cast("long").alias("order_seq"),
        "o_totalprice",
    ).where(F.col("order_seq") <= 10)
    return (
        seq.groupBy("order_seq")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.avg("o_totalprice"), 6).alias("avg_value"),
        )
        .orderBy("order_seq")
    )


def q_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday x hour activity heatmap over the event stream (the ops
    dashboard staple): one hash agg on two extracted date parts.
    Spark dayofweek is 1=Sunday; emitted as 0-based to match DuckDB's
    0=Sunday convention."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            (F.dayofweek("ts") - 1).cast("long").alias("dow"),
            F.hour("ts").cast("long").alias("hr"),
        )
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 6).alias("v"))
        .orderBy("dow", "hr")
    )


def q_chi_square_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test for order priority x status: observed
    crosstab, expected = row_tot * col_tot / N, chi2 = sum((O-E)^2/E) —
    one crosstab agg plus broadcast marginal joins, closed-form math.
    Emits the statistic and degrees of freedom; the dependence-screening
    primitive for categorical features."""
    o = _t(spark, sf_dir, "orders")
    obs = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("obs")
    )
    row_t = obs.groupBy("o_orderpriority").agg(F.sum("obs").alias("rt"))
    col_t = obs.groupBy("o_orderstatus").agg(F.sum("obs").alias("ct"))
    n_df = obs.agg(F.sum("obs").alias("nn"))
    j = (
        obs.join(F.broadcast(row_t), "o_orderpriority")
        .join(F.broadcast(col_t), "o_orderstatus")
        .crossJoin(F.broadcast(n_df))
    )
    e = F.col("rt") * F.col("ct") / F.col("nn")
    cells = j.select(((F.col("obs") - e) ** 2 / e).alias("cell"))
    r = F.lit(5)  # priorities
    c = F.lit(3)  # statuses
    return cells.agg(
        F.round(F.sum("cell"), 6).alias("chi2"),
        ((r - 1) * (c - 1)).cast("long").alias("dof"),
    )


def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the token distribution — the
    lexical-diversity quality signal (low entropy = repetitive spam).
    Computed from run lengths over the SORTED token array in one O(n)
    aggregate pass (H = log2(n) - (1/n) * sum(run * log2(run)); each
    step adds the incremental delta (r+1)log2(r+1) - r*log2(r), so no
    per-run finalization is needed). The naive per-distinct-token
    count (transform(distinct, t -> size(filter(toks, ...)))) is
    O(distinct * n) interpreted per doc — quadratic on boilerplate
    docs (the bench_registry catch, same class as repetition_signals).
    No explode, no shuffle beyond the output sort."""
    from keystone_spark.functions.text import tokens

    d = _t(spark, sf_dir, "documents")
    toks = tokens("text")
    n = F.size(toks)
    srt = F.array_sort(toks)
    run_sum = F.aggregate(
        srt,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0.0).alias("s"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            (
                acc["s"]
                + F.when(
                    x == acc["prev"],
                    (acc["run"] + 1) * F.log2(acc["run"] + 1)
                    - acc["run"] * F.log2(acc["run"]),
                ).otherwise(F.lit(0.0))
            ).alias("s"),
        ),
        lambda acc: acc["s"],
    )
    ent = F.log2(n.cast("double")) - run_sum / n.cast("double")
    return (
        d.select(
            "doc_id",
            n.cast("long").alias("n_tokens"),
            F.round(ent, 6).alias("entropy"),
        )
        .where(F.col("n_tokens") > 0)
        .orderBy("doc_id")
    )


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer recency (days since last order,
    vs corpus max date), frequency, monetary; each scored into NTILE(5)
    quintiles and combined into the classic 3-digit segment code; output
    is the segment size histogram. Scale shape: each quintile comes from
    operators/stats.ranked_series + ntile_from_rank (two-phase
    distributed rank, NO single-partition window) — three parallel range
    shuffles over the customer series instead of three global-sort
    funnels; results equal NTILE(5) OVER (ORDER BY ...) exactly."""
    from keystone_spark.operators.stats import ntile_from_rank, ranked_series

    o = _t(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_d"),
        F.count("*").alias("freq"),
        F.sum("o_totalprice").alias("money"),
    )
    maxd = per.agg(F.max("last_d").alias("maxd"))
    per = per.crossJoin(F.broadcast(maxd)).withColumn(
        "recency", F.datediff("maxd", "last_d")
    )
    n = None
    for key, order in [
        ("r", [F.col("recency").asc(), F.col("o_custkey")]),
        ("f", [F.col("freq").desc(), F.col("o_custkey")]),
        ("m", [F.col("money").desc(), F.col("o_custkey")]),
    ]:
        per, n, _ = ranked_series(per, order, rank_col="__rk")
        per = per.withColumn(
            f"__q_{key}", ntile_from_rank("__rk", n, 5)
        ).drop("__rk")
    seg = per.select(
        (F.col("__q_r") * 100 + F.col("__q_f") * 10 + F.col("__q_m"))
        .cast("long")
        .alias("segment")
    )
    return (
        seg.groupBy("segment")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("segment")
    )


def q_brand_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration (Herfindahl-Hirschman) index per part type
    prefix: sum of squared brand revenue shares — the concentration
    screen. Revenue agg on the fact side; shares and HHI over the
    (type, brand)-bounded table."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select(
        "p_partkey", F.substring("p_type", 1, 8).alias("ptype"), "p_brand"
    )
    rev = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("ptype", "p_brand")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("rev"))
    )
    tot = Window.partitionBy("ptype")
    share = rev.select(
        "ptype", (F.col("rev") / F.sum("rev").over(tot)).alias("s")
    )
    return (
        share.groupBy("ptype")
        .agg(
            F.count("*").alias("n_brands"),
            F.round(F.sum(F.col("s") * F.col("s")), 6).alias("hhi"),
        )
        .orderBy("ptype")
    )


def q_group_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group mode: most frequent l_quantity per returnflag
    (count + rank, deterministic tie-break on the value) — the
    categorical summary statistic mode() hides a two-level agg behind."""
    li = _t(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("n").desc(), F.col("l_quantity")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "l_returnflag",
            F.round("l_quantity", 6).alias("mode_qty"),
            "n",
        )
        .orderBy("l_returnflag")
    )


def q_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap distribution per event_type (arrival-process
    characterization: burstiness, rate drift): one lag window for the
    gaps, one hash agg for count/mean/std/exact-p90. Single event_type
    shuffle."""
    e = _t(spark, sf_dir, "events")
    t = F.unix_timestamp("ts")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = (
        e.select("event_type", (t - F.lag(t).over(w)).alias("gap"))
        .where(F.col("gap").isNotNull())
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("*").alias("n_gaps"),
            F.round(F.avg("gap"), 6).alias("mean_s"),
            F.round(F.stddev_samp("gap"), 6).alias("std_s"),
            F.round(F.percentile("gap", F.lit(0.9)), 6).alias("p90_s"),
        )
        .orderBy("event_type")
    )


def q_twoway_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-way effects decomposition (ANOVA-style) of extendedprice over
    returnflag x linestatus: each cell mean split into grand mean + row
    effect + column effect + interaction residual. One crosstab agg plus
    broadcast marginal-mean joins — the factor-screening summary."""
    li = _t(spark, sf_dir, "lineitem")
    cell = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.avg("l_extendedprice").alias("cm"), F.count("*").alias("n")
    )
    row_m = li.groupBy("l_returnflag").agg(
        F.avg("l_extendedprice").alias("rm")
    )
    col_m = li.groupBy("l_linestatus").agg(
        F.avg("l_extendedprice").alias("colm")
    )
    grand = li.agg(F.avg("l_extendedprice").alias("gm"))
    j = (
        cell.join(F.broadcast(row_m), "l_returnflag")
        .join(F.broadcast(col_m), "l_linestatus")
        .crossJoin(F.broadcast(grand))
    )
    return (
        j.select(
            "l_returnflag", "l_linestatus", "n",
            F.round("cm", 6).alias("cell_mean"),
            F.round(F.col("rm") - F.col("gm"), 6).alias("row_effect"),
            F.round(F.col("colm") - F.col("gm"), 6).alias("col_effect"),
            F.round(
                F.col("cm") - F.col("rm") - F.col("colm") + F.col("gm"), 6
            ).alias("interaction"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_value_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of event values per type (memory in the
    process: near 0 = independent arrivals, high = trending): one lag
    window then corr() — single event_type shuffle."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    pairs = e.select(
        "event_type", "value", F.lag("value").over(w).alias("prev")
    ).where(F.col("prev").isNotNull())
    return (
        pairs.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.corr("value", "prev"), 6).alias("acf1"),
        )
        .orderBy("event_type")
    )


def q_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change detection per event_type: running sum of deviations
    from the type mean; the maximum |CUSUM| and where it peaks locate
    the strongest level shift. Type mean broadcast back (no
    empty-partition window); running sum + argmax per type — the
    classic drift screen."""
    e = _t(spark, sf_dir, "events")
    means = e.groupBy("event_type").agg(F.avg("value").alias("mu"))
    j = e.join(F.broadcast(means), "event_type")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cus = F.sum(F.col("value") - F.col("mu")).over(w)
    scored = j.select(
        "event_type", "event_id",
        F.abs(cus).alias("abs_cusum"),
    )
    top = Window.partitionBy("event_type").orderBy(
        F.col("abs_cusum").desc(), F.col("event_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(top))
        .where(F.col("rk") == 1)
        .select(
            "event_type",
            F.round("abs_cusum", 6).alias("max_abs_cusum"),
            F.col("event_id").alias("at_event"),
        )
        .orderBy("event_type")
    )


def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth: distinct vocabulary size after the
    first N documents, for a ladder of N — computed WITHOUT any
    cumulative distinct: each token reduces to its FIRST document
    (min doc_id, one hash agg), then each threshold counts tokens whose
    first occurrence is within it (tiny threshold table cross join).
    The corpus-statistics curve that sizes tokenizer vocabularies."""
    from keystone_spark.functions.text import tokens

    d = _t(spark, sf_dir, "documents")
    first = (
        d.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    thresholds = spark.range(1, 6).select(
        (F.col("id") * 100).alias("n_docs")
    )
    return (
        first.crossJoin(F.broadcast(thresholds))
        .where(F.col("first_doc") < F.col("n_docs"))
        .groupBy("n_docs")
        .agg(F.count("*").alias("vocab"))
        .orderBy("n_docs")
    )


def q_zipf_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency diagnostics: log-log regression slope and R²
    over the top-100 token frequencies (natural text ~ -1; synthetic or
    templated corpora deviate — a corpus-health fingerprint). Token
    counts are one hash agg; the rank window and regression run over the
    100-row top slice only."""
    from keystone_spark.functions.text import tokens

    d = _t(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("f"))
        .orderBy(F.col("f").desc(), "tok")
        .limit(100)
    )
    w = Window.orderBy(F.col("f").desc(), "tok")
    ranked = freq.select(
        F.log(F.row_number().over(w).cast("double")).alias("lr"),
        F.log(F.col("f").cast("double")).alias("lf"),
    )
    return ranked.agg(
        F.count("*").cast("long").alias("n_terms"),
        F.round(F.regr_slope("lf", "lr"), 6).alias("slope"),
        F.round(F.regr_r2("lf", "lr"), 6).alias("r2"),
    )


def q_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-order cadence (the churn-model input): days between a
    customer's consecutive orders, summarized to count/mean/exact-median
    — one lag window over per-customer order sequences + one agg."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        o.select(
            F.datediff(
                F.col("o_orderdate"), F.lag("o_orderdate").over(w)
            ).alias("gap")
        )
        .where(F.col("gap").isNotNull())
    )
    return gaps.agg(
        F.count("*").alias("n_gaps"),
        F.round(F.avg("gap"), 6).alias("mean_days"),
        F.round(F.percentile("gap", F.lit(0.5)), 6).alias("median_days"),
    )


def q_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication pressure per source: share of docs whose winnowing
    fingerprint (min md5 over 8-token shingles — the doc_fingerprint
    kernel) collides with another doc anywhere in the corpus. The
    dedup-ordering signal: high-dup sources get deduped first. The
    per-gram md5 fingerprint kernel is the cost: the fixture's
    single-split scan is re-spread first (no-op on multi-split
    corpora), and the per-fingerprint count comes from a WINDOW over
    fp — a groupBy + join-back would evaluate the whole kernel once
    per join side (expressions re-evaluate per reference), doubling
    the scan."""
    from keystone_spark.functions.text import tokens, word_ngrams
    from keystone_spark.sources import ensure_parallelism

    d = ensure_parallelism(_t(spark, sf_dir, "documents"))
    toks = tokens("text")
    grams = word_ngrams(toks, 8)
    fp = F.when(
        F.size(grams) > 0,
        F.array_min(F.transform(grams, lambda g: F.md5(F.encode(g, "UTF-8")))),
    ).otherwise(F.md5(F.encode(F.concat_ws(" ", toks), "UTF-8")))
    with_fp = d.select("doc_id", "source", fp.alias("fp"))
    j = with_fp.withColumn(
        "nfp", F.count("*").over(Window.partitionBy("fp"))
    )
    return (
        j.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("nfp") > 1).cast("long")).alias("n_dup"),
            F.round(
                F.sum((F.col("nfp") > 1).cast("long")) / F.count("*"), 6
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# round 7: incremental near-dedup, RAG chunking, URL canonicalization,
# clickstream path mining, mixture weights, skew profiling, robust outliers
# ---------------------------------------------------------------------------

def q_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dedup: new-batch docs (doc_id % 4 == 0) matched
    against the existing corpus (the rest) through the banded MinHash
    index — the production shape where 100 TB of history is signed once
    and each nightly increment joins the stored band buckets instead of
    re-deduping the world (operators/dedup.neardup_against_corpus;
    the parquet-index variant build_minhash_index/match_minhash_index is
    pytest-covered with a band-partition-pruning plan pin).

    Exact oracle: LSH only generates candidates; the answer is decided
    by exact shingle Jaccard >= 0.8, and fixture cross-pairs sit at
    >= 0.97 vs next-closest < 0.35 (measured), so banded recall is
    deterministically 1.0 at this config — same argument as
    minhash_dedup."""
    from keystone_spark.operators.dedup import neardup_against_corpus
    from keystone_spark.sources import ensure_parallelism

    d = ensure_parallelism(_t(spark, sf_dir, "documents"))
    corpus = d.where(F.col("doc_id") % 4 != 0)
    batch = d.where(F.col("doc_id") % 4 == 0)
    out = neardup_against_corpus(
        corpus, batch, n_hashes=64, n_bands=16, threshold=0.8
    )
    final = out.orderBy("doc_id")
    # carry the persist contract across the sort (ADVICE r7 — the
    # attribute lives on the Python object, not the plan)
    final._keystone_caches = list(getattr(out, "_keystone_caches", []))
    return final


def q_incremental_index_add(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index MAINTENANCE for the near-dedup path (VERDICT r9 #1): the
    MinHash index is built on the LOW-ID half of the corpus, the
    high-id half is APPENDED with add_to_minhash_index (sign only the
    genuinely new content, append band rows / sigs / content keys —
    no corpus re-signing), and the probe batch (doc_id % 4 == 0) is
    matched against the stored index. Under the monotone-ingest
    contract (append ids > stored ids; the split below guarantees it)
    every stored representative stays its family's global min-id
    tie-break winner, so the result is IDENTICAL to matching against
    an index built from scratch — this query therefore shares
    incremental_neardup's full SQL oracle, and the driver's hash
    compare IS the add==rebuild identity check. The streaming twin
    (streaming/windows.stream_neardup_against_index with
    update_index=True) folds the same call per micro-batch."""
    from keystone_spark.operators.dedup import (
        add_to_minhash_index,
        build_minhash_index,
        match_minhash_index,
    )
    from keystone_spark.sources import ensure_parallelism

    d = ensure_parallelism(_t(spark, sf_dir, "documents"))
    corpus = d.where(F.col("doc_id") % 4 != 0)
    batch = d.where(F.col("doc_id") % 4 == 0)
    key = ("mh_inc", id(spark._jsparkSession)
           if hasattr(spark, "_jsparkSession") else id(spark), sf_dir)
    path = _BM25_INDEX_CACHE.get(key)
    if path is None:
        path = _bm25_index_path(sf_dir, "minhash_inc")
        mid = corpus.agg(F.max("doc_id")).first()[0] // 2
        build_minhash_index(
            corpus.where(F.col("doc_id") <= mid), path,
            n_hashes=64, n_bands=16,
        )
        stats = add_to_minhash_index(
            spark, path, corpus.where(F.col("doc_id") > mid)
        )
        # new_content may be 0 legitimately (the sf1/sf5 scaled
        # fixtures replicate sf0.1 texts verbatim, so the high-id
        # half adds no distinct content — a re-crawl-shaped batch);
        # the add==rebuild identity is what the SQL oracle checks
        if stats["batch_docs"] <= 0:
            raise AssertionError(f"minhash append saw no batch: {stats}")
        _BM25_INDEX_CACHE[key] = path
    out = match_minhash_index(
        spark, path, batch, corpus, n_hashes=64, n_bands=16, threshold=0.8
    )
    final = out.orderBy("doc_id")
    final._keystone_caches = list(getattr(out, "_keystone_caches", []))
    return final


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG chunking: 64-token windows, stride 48 (16-token overlap),
    redundant tails dropped (operators/curation.chunk_documents). A
    map-only codegen scan — the feeder stage for embedding a 100-TB
    corpus, where chunk explosion must not shuffle."""
    from keystone_spark.operators.curation import chunk_documents
    from keystone_spark.sources import ensure_parallelism

    d = ensure_parallelism(_t(spark, sf_dir, "documents"))
    return chunk_documents(d, chunk_tokens=64, stride=48).orderBy(
        "doc_id", "chunk_id"
    )


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization dedup (functions/text.canonicalize_url):
    deterministic noisy variants per doc (host case, tracking params,
    trailing slash, fragments) collapse to one canonical URL; keep the
    lowest doc_id per canonical key. The oracle constructs the expected
    canonical form DIRECTLY (independent twin), so it checks the
    regexp chain's semantics, not its implementation."""
    from keystone_spark.functions.text import canonicalize_url

    d = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("WWW.Example.COM"))
        .otherwise(F.lit("www.example.com")),
        F.lit("/"), F.col("lang"), F.lit("/page-"), F.col("doc_id") % 40,
        F.when(F.col("doc_id") % 4 == 1, F.lit("/")).otherwise(F.lit("")),
        F.lit("?q="), F.col("doc_id") % 3,
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit("&utm_source=s"), F.col("doc_id") % 7),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    return (
        d.select("doc_id", canonicalize_url(url).alias("canon_url"))
        .groupBy("canon_url")
        .agg(
            F.count("*").cast("long").alias("n_variants"),
            F.min("doc_id").alias("keeper"),
        )
        .orderBy("canon_url")
    )


def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus-mixing weights (operators/curation.
    source_mixture_weights, DoReMi-lite): weight ∝ sqrt(token mass) x
    quality rate, normalized. One agg to |sources| rows + a single-row
    total broadcast — nothing after the scan scales with the corpus."""
    from keystone_spark.operators.curation import source_mixture_weights
    from keystone_spark.sources import ensure_parallelism

    d = ensure_parallelism(_t(spark, sf_dir, "documents"))
    return source_mixture_weights(d).orderBy("source")


def q_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics on events.user_id (operators/observe.
    key_skew_profile): top-10 heaviest keys with share / cumulative
    share / skew-vs-mean — the profiling pass that decides salting or
    AQE skew-split before a 100-TB join."""
    from keystone_spark.operators.observe import key_skew_profile

    e = _t(spark, sf_dir, "events")
    return key_skew_profile(e, "user_id", top_k=10).orderBy("rank")


def q_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 session paths (operators/relational.session_paths):
    30-min gap sessionization, each session rendered as its ordered
    event-type string (first 20 events), ranked by session count. The
    path-count agg is map-side combinable; top-k is a bounded sort."""
    from keystone_spark.operators.relational import session_paths

    e = _t(spark, sf_dir, "events")
    return session_paths(e).orderBy("rank")


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier profile on events.value (operators/
    stats.mad_outlier_stats): MAD-scaled fences (k=3 robust z), exact
    interpolated medians, group tables broadcast back onto the scan."""
    from keystone_spark.operators.stats import mad_outlier_stats

    e = _t(spark, sf_dir, "events")
    return mad_outlier_stats(e, "event_type", "value").orderBy("event_type")


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index drift monitor (operators/observe.
    psi_drift) between the even- and odd-event_id halves of each
    event_type's value distribution: exact reference-decile edges,
    codegen bin assignment, map-side-combinable histograms, eps-floored
    log terms. The production guard that pages before a shifted feature
    burns a training run."""
    from keystone_spark.operators.observe import psi_drift

    e = _t(spark, sf_dir, "events")
    ref = e.where(F.col("event_id") % 2 == 0)
    cur = e.where(F.col("event_id") % 2 == 1)
    return psi_drift(ref, cur, "event_type", "value").orderBy("event_type")


def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fit health (operators/curation.oov_rate): vocabulary =
    top-500 tokens of the English docs; per-source out-of-vocabulary
    occurrence share over the whole corpus. High-OOV sources are where
    a tokenizer trained on the reference mix will shatter text into
    bytes."""
    from keystone_spark.operators.curation import oov_rate
    from keystone_spark.sources import ensure_parallelism

    d = ensure_parallelism(_t(spark, sf_dir, "documents"))
    return oov_rate(
        d.where(F.col("lang") == "en"), d, vocab_k=500
    ).orderBy("source")


def q_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-dedup savings accounting (operators/curation.
    dedup_savings): docs/tokens removable by keep-lowest-id content
    dedup — the report a curation run publishes next to its output."""
    from keystone_spark.operators.curation import dedup_savings
    from keystone_spark.sources import ensure_parallelism

    d = ensure_parallelism(_t(spark, sf_dir, "documents"))
    return dedup_savings(d).orderBy("source")


def q_ordered_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered 3-step funnel view -> click -> purchase
    (operators/relational.ordered_funnel): each step must occur strictly
    after the user's previous-step completion. k user-keyed conditional
    min-aggs; the report rows are single-row aggregates cross-joined, so
    nothing data-sized is windowed or sorted."""
    from keystone_spark.operators.relational import ordered_funnel

    e = _t(spark, sf_dir, "events")
    return ordered_funnel(e, ["view", "click", "purchase"]).orderBy("step_idx")


def q_source_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-distribution cosine over top-2000 unigram
    probabilities (operators/curation.source_unigram_similarity) — the
    mixing diagnostic for which sources duplicate each other at the
    distribution level."""
    from keystone_spark.operators.curation import source_unigram_similarity
    from keystone_spark.sources import ensure_parallelism

    d = ensure_parallelism(_t(spark, sf_dir, "documents"))
    return source_unigram_similarity(d, vocab_k=2000).orderBy(
        "source_a", "source_b"
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_multi_join(spark, "/root/testdata/sf0.001")


# r12 driver-window rotation (VERDICT r11 #7): the driver samples the
# FIRST 50 registry entries each round. This round leads with (a) the
# two NEW r12 declared queries — bm25_pointer_compact (object-store-
# safe dest-compaction + _LATEST pointer flip, full survivor-corpus
# SQL oracle) and ivf_retrain_topk (quantizer retrain + purge +
# pointer-resolved search, invariant oracle) — and (b) the two queries
# most directly REWIRED by the Bm25Index v4 format (per-doc membership
# table: add's skip set, compact's exact purge accounting):
# bm25_incremental and bm25_delete_compact. The rest of the window is
# the cohort least recently driver-sampled, oldest first: the five
# r2-window members, the three r3 ones, the sixteen r4 statistics/
# events queries, the ten r5 ones, and the twelve r6 curation queries
# — 46 stale members in-window; pii_redact (r7) and collect_agg (r8)
# spill to positions 51-52 and lead the r13 rotation. 48 of this
# 50-query window are NOT in the r11 window (computed from
# CORRECTNESS_r02..r11.json last-sampled rounds). queries() applies
# this order ON TOP of the historical dict below, so round-history
# comments stay put; the full set stays CI-gated at full width via
# tests/test_oracle_full.py regardless of order. Update
# tests/test_entry_contract.py's pin when changing this.
_R12_HEAD = [
    # NEW r12: dest-compaction + pointer flip, and the retrain path,
    # both driver-hash-checked
    "bm25_pointer_compact",
    "ivf_retrain_topk",
    # rewired by the v4 per-doc membership table
    "bm25_incremental",
    "bm25_delete_compact",
    # stale cohort, least recently sampled first: r2
    "term_frequency", "stupid_backoff", "mean_avg_precision",
    "window_range_frame", "percentiles",
    # r3
    "fuzzy_name_pairs", "heavy_hitters", "funnel",
    # r4
    "jaccard_prefix_pairs", "supplier_reliability", "cross_source_dups",
    "label_coherence", "event_transitions", "session_stats",
    "funnel_latency", "twap_hourly", "table_profile", "snapshot_diff",
    "target_encoding", "quantile_normalize", "rolling_median",
    "retention_cohorts", "anomaly_flags", "first_touch",
    # r5
    "weighted_sample", "hashed_tf", "scd2_lookup", "triangle_count",
    "dq_checks", "hll_union", "binned_range", "assoc_rules",
    "pagerank_ranks", "gap_interpolate",
    # r6
    "repetition_signals", "contamination", "line_dedup", "cdc_upsert",
    "lm_score", "gopher_rules", "bm25_search", "url_stats",
    "ewma_smooth", "winsorized_stats", "bpe_tokens", "semantic_clusters",
    # r7 (position 50)
    "pii_redact",
    # r8 — spills to position 51, leads the r13 rotation
    "collect_agg",
]

# r13 driver-window rotation (VERDICT r12 #8): leads with the one NEW
# r13 declared query — ivf_stream_autoretrain_topk (the closed drift
# loop: streaming ingest fold watches the max_cell_share signal and
# fires the quantizer retrain itself; invariant oracle) — then the
# cohort least recently driver-sampled, oldest first: pii_redact (last
# sampled r7), collect_agg (r8), and the 47 r9-window members
# (computed from CORRECTNESS_r02..r12.json last-sampled rounds). 49 of
# this 50-query window are NOT in the r12 window. Update
# tests/test_entry_contract.py's pin when changing this.
_R13_HEAD = [
    # NEW r13: the fold-triggered retrain loop and the streaming BM25
    # ingest fold (oracle class upgraded to DuckDB hash), both
    # driver-hash-checked
    "ivf_stream_autoretrain_topk",
    "bm25_stream_ingest",
    # stale cohort, least recently sampled first: r7, r8
    "pii_redact", "collect_agg",
    # r9 cohort (47)
    "phash_neardup", "ordered_funnel", "source_similarity", "psi_drift",
    "oov_rate", "dedup_savings", "doc_chunks", "url_dedup",
    "mixture_weights", "key_skew_profile", "top_paths", "mad_outliers",
    "duplicate_spans", "dsir_weights", "top_boilerplate_spans",
    "dsir_resample", "strip_spans", "equidepth_hist",
    "revenue_concentration", "doc_fingerprint", "minhash_dedup",
    "dedup_clusters", "monthly_trend", "abc_classes",
    "repeat_purchase_curve", "activity_heatmap", "chi_square_test",
    "token_entropy", "rfm_segments", "brand_hhi", "group_mode",
    "interarrival_stats", "twoway_effects", "value_autocorr",
    "cusum_drift", "vocab_growth", "zipf_curve", "order_gaps",
    "dup_rate_by_source", "gap_fill", "udtf_sentences", "nation_trade",
    "nation_profit", "late_shipments", "order_distribution",
    "waiting_suppliers", "window_nav",
]


_R14_HEAD = [
    # NEW r14: filtered ANN (predicate pushed into the cell-pruned
    # scan, invariant oracle), its exact value-hashed baseline, MMR
    # diversity re-rank, and embedding-space decontamination
    "ivf_filtered_topk",
    "cosine_filtered_topk",
    "mmr_rerank",
    "embedding_decontamination",
    "sq8_topk",
    "group_cosine_topk",
    "ivfpq_filtered_topk",
    "token_budget_select",
    # window_nav spilled to position 51 in r13 (the r13 head comment
    # flagged it to lead this rotation); then the stalest cohort —
    # every query last sampled in the r10 window (45), then the r11
    # head's first two. ZERO overlap with the r13 window.
    "window_nav",
    "approx_distinct", "approx_percentile", "argmin_part", "array_fns2",
    "augmented_eval", "binary_metrics", "conditional_agg", "covar_corr",
    "disjunctive_pred", "embedding_neardup", "event_sliding_window",
    "excess_shipments", "exists_subquery", "funnel_completions",
    "grouped_ols", "histogram_bins", "idle_customers",
    "important_stock", "ivf_topk", "kmv_distinct", "lang_id",
    "large_orders", "local_supplier_volume", "map_fns", "market_share",
    "null_fns", "ohlc_rollup", "pivot_counts", "pq_topk",
    "promo_revenue", "regr_fns", "reservoir_sample", "returned_items",
    "revenue_predicate", "scalar_subquery", "scd2_intervals",
    "shipping_priority", "simhash_pairs", "supplier_part_counts",
    "token_packing", "token_packing_greedy",
]


# r15 driver-window rotation (continuing the freshness-maximizing
# pattern; no NEW queries this round — r15 is the second OPTIMIZATION
# round). The four r10 stragglers the r14 head comment flagged lead
# (top_supplier, unpivot_long, variant_json, window_pct — last sampled
# r10), then the cohort last sampled in the r11 window, in that
# window's own order (48 members; computed from
# CORRECTNESS_r02..r14.json last-sampled rounds). 4 + 46 fill the
# window; date_fns2 and grouping_sets (the two r11 members left out)
# stay the stalest cohort and lead the r16 rotation. ZERO overlap with the r14 window. Update
# tests/test_entry_contract.py's pin when changing this.
_R15_HEAD = [
    # r10 stragglers (flagged by the r14 head comment)
    "top_supplier", "unpivot_long", "variant_json", "window_pct",
    # r11 cohort (46 of 48, r11-window order)
    "ivf_delete_topk", "bm25_indexed", "incremental_index_add",
    "incremental_neardup", "ivf_index_topk", "ivfpq_topk",
    "filter_project", "group_agg", "multi_join", "semi_join",
    "anti_join", "topk_per_group", "window_running_sum", "rollup",
    "cube", "set_ops", "string_fns", "date_fns", "distinct_count",
    "event_hourly_window", "json_extract", "sessionization",
    "asof_join", "token_counts", "word_freq_encoder", "ngram_counts",
    "tf_idf", "doc_quality", "dedup_exact", "ngram_jaccard_pairs",
    "scaler_moments", "cosine_topk", "one_hot_labels",
    "confusion_matrix", "multiclass_metrics", "session_window",
    "standard_scaler", "linear_mapper", "lsh_cosine_topk",
    "kmeans_clusters", "multimodal_features", "range_join",
    "window_analytics", "math_fns", "array_fns", "string_fns2",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER MATTERS: the driver's CORRECTNESS check samples the FIRST 50
    # entries. Rounds 1-4 have cumulatively driver-verified 150/167
    # queries; round 5 rotates the 17 never-driver-sampled statistics
    # queries (monthly_trend..dup_rate_by_source, added after r4's window
    # closed) into positions 1-17 so a green window makes driver coverage
    # 167/167 (the full set stays CI-gated via tests/test_oracle_full.py
    # and tools/verify_oracle.py either way).
    base = {
        # --- r6 head rotation: queries REWIRED this round whose prior
        # driver verification predates the change (equidepth_hist ->
        # ranked_series; revenue_concentration cum_share quantization
        # context; doc_fingerprint re-spread; the three dedup queries ride
        # the new filter-before-distinct candidates + size-prefiltered
        # jaccard_verify). Sampling them in the r6 window re-verifies the
        # changed code paths; everything stays CI-gated at full width via
        # tests/test_oracle_full.py regardless of order. The two NEW
        # r6 queries (ExactSubstr span dedup, DSIR importance weights)
        # lead so the next driver window samples them first. ---
        # --- r9 head rotation: bm25_indexed is NEW this round (build-
        # once BM25 postings index, VERDICT r8 #5); simhash_pairs was
        # STRUCTURALLY REWIRED (exact-content collapse-first,
        # simhash_verified_pairs) and phash_neardup/minhash_dedup/
        # dedup_clusters ride the r9 truncation + cache-ownership
        # changes, so they lead the window for driver re-verification.
        # Everything stays CI-gated at full width via
        # tests/test_oracle_full.py regardless of order. ---
        "bm25_incremental": q_bm25_incremental,
        "bm25_stream_ingest": q_bm25_stream_ingest,  # NEW r13
        "bm25_delete_compact": q_bm25_delete_compact,
        "bm25_pointer_compact": q_bm25_pointer_compact,
        "ivf_delete_topk": q_ivf_delete_topk,
        "ivf_retrain_topk": q_ivf_retrain_topk,
        # NEW r14: filtered ANN (predicate pushed into the cell-pruned
        # scan) + its exact value-hashed baseline
        "ivf_filtered_topk": q_ivf_filtered_topk,
        "cosine_filtered_topk": q_cosine_filtered_topk,
        "embedding_decontamination": q_embedding_decontamination,
        "mmr_rerank": q_mmr_rerank,
        "sq8_topk": q_sq8_topk,
        "token_budget_select": q_token_budget_select,
        "group_cosine_topk": q_group_cosine_topk,
        "ivfpq_filtered_topk": q_ivfpq_filtered_topk,
        # NEW r13: fold-triggered auto-retrain (closed drift loop)
        "ivf_stream_autoretrain_topk": q_ivf_stream_autoretrain_topk,
        "incremental_index_add": q_incremental_index_add,
        "bm25_indexed": q_bm25_indexed,
        "simhash_pairs": q_simhash_pairs,
        "phash_neardup": q_phash_neardup,
        # --- r7 head rotation: the seven NEW round-7 queries lead so the
        # driver's 50-query window samples them first; the r6 block after
        # them was verified in the r6 window and stays CI-gated at full
        # width via tests/test_oracle_full.py. ---
        "incremental_neardup": q_incremental_neardup,
        "ordered_funnel": q_ordered_funnel,
        "source_similarity": q_source_similarity,
        "psi_drift": q_psi_drift,
        "oov_rate": q_oov_rate,
        "dedup_savings": q_dedup_savings,
        "doc_chunks": q_doc_chunks,
        "url_dedup": q_url_dedup,
        "mixture_weights": q_mixture_weights,
        "key_skew_profile": q_key_skew_profile,
        "top_paths": q_top_paths,
        "mad_outliers": q_mad_outliers,
        "duplicate_spans": q_duplicate_spans,
        "dsir_weights": q_dsir_weights,
        "top_boilerplate_spans": q_top_boilerplate_spans,
        "dsir_resample": q_dsir_resample,
        "strip_spans": q_strip_spans,
        "equidepth_hist": q_equidepth_hist,
        "revenue_concentration": q_revenue_concentration,
        "doc_fingerprint": q_doc_fingerprint,
        "minhash_dedup": q_minhash_dedup,
        "dedup_clusters": q_dedup_clusters,
        "monthly_trend": q_monthly_trend,
        "abc_classes": q_abc_classes,
        "repeat_purchase_curve": q_repeat_purchase_curve,
        "activity_heatmap": q_activity_heatmap,
        "chi_square_test": q_chi_square_test,
        "token_entropy": q_token_entropy,
        "rfm_segments": q_rfm_segments,
        "brand_hhi": q_brand_hhi,
        "group_mode": q_group_mode,
        "interarrival_stats": q_interarrival_stats,
        "twoway_effects": q_twoway_effects,
        "value_autocorr": q_value_autocorr,
        "cusum_drift": q_cusum_drift,
        "vocab_growth": q_vocab_growth,
        "zipf_curve": q_zipf_curve,
        "order_gaps": q_order_gaps,
        "dup_rate_by_source": q_dup_rate_by_source,
        # --- driver-verified in earlier rounds ---
        "gap_fill": q_gap_fill,
        "udtf_sentences": q_udtf_sentences,
        "nation_trade": q_nation_trade,
        "nation_profit": q_nation_profit,
        "late_shipments": q_late_shipments,
        "order_distribution": q_order_distribution,
        "waiting_suppliers": q_waiting_suppliers,
        "window_nav": q_window_nav,
        "collect_agg": q_collect_agg,
        # --- new in round 4 (LLM-curation text ops) ---
        "pii_redact": q_pii_redact,
        "repetition_signals": q_repetition_signals,
        "contamination": q_contamination,
        "line_dedup": q_line_dedup,
        "cdc_upsert": q_cdc_upsert,
        "lm_score": q_lm_score,
        "semantic_clusters": q_semantic_clusters,
        "gopher_rules": q_gopher_rules,
        "bpe_tokens": q_bpe_tokens,
        "winsorized_stats": q_winsorized_stats,
        "url_stats": q_url_stats,
        "ewma_smooth": q_ewma_smooth,
        "bm25_search": q_bm25_search,
        "gap_interpolate": q_gap_interpolate,
        "pagerank_ranks": q_pagerank_ranks,
        "assoc_rules": q_assoc_rules,
        "binned_range": q_binned_range,
        "hll_union": q_hll_union,
        "dq_checks": q_dq_checks,
        "scd2_lookup": q_scd2_lookup,
        "triangle_count": q_triangle_count,
        "hashed_tf": q_hashed_tf,
        "weighted_sample": q_weighted_sample,
        "jaccard_prefix_pairs": q_jaccard_prefix_pairs,
        "retention_cohorts": q_retention_cohorts,
        "anomaly_flags": q_anomaly_flags,
        "first_touch": q_first_touch,
        "target_encoding": q_target_encoding,
        "quantile_normalize": q_quantile_normalize,
        "rolling_median": q_rolling_median,
        "snapshot_diff": q_snapshot_diff,
        "twap_hourly": q_twap_hourly,
        "table_profile": q_table_profile,
        "funnel_latency": q_funnel_latency,
        "event_transitions": q_event_transitions,
        "session_stats": q_session_stats,
        "label_coherence": q_label_coherence,
        "cross_source_dups": q_cross_source_dups,
        "supplier_reliability": q_supplier_reliability,
        "event_sliding_window": q_event_sliding_window,
        "map_fns": q_map_fns,
        "approx_distinct": q_approx_distinct,
        "lang_id": q_lang_id,
        "binary_metrics": q_binary_metrics,
        "embedding_neardup": q_embedding_neardup,
        "augmented_eval": q_augmented_eval,
        "ivf_topk": q_ivf_topk,
        "ivf_index_topk": q_ivf_index_topk,
        "important_stock": q_important_stock,
        "supplier_part_counts": q_supplier_part_counts,
        "excess_shipments": q_excess_shipments,
        "funnel_completions": q_funnel_completions,
        "pq_topk": q_pq_topk,
        "kmv_distinct": q_kmv_distinct,
        "variant_json": q_variant_json,
        "ivfpq_topk": q_ivfpq_topk,
        "reservoir_sample": q_reservoir_sample,
        "scd2_intervals": q_scd2_intervals,
        "exists_subquery": q_exists_subquery,
        "scalar_subquery": q_scalar_subquery,
        "shipping_priority": q_shipping_priority,
        "pivot_counts": q_pivot,
        "covar_corr": q_covar_corr,
        "window_pct": q_window_pct,
        "conditional_agg": q_conditional_agg,
        "revenue_predicate": q_revenue_predicate,
        "array_fns2": q_array_fns2,
        "regr_fns": q_regr_fns,
        "token_packing": q_token_packing,
        "token_packing_greedy": q_token_packing_greedy,
        "approx_percentile": q_approx_percentile,
        "null_fns": q_null_fns,
        "grouped_ols": q_grouped_ols,
        "returned_items": q_returned_items,
        "promo_revenue": q_promo_revenue,
        "top_supplier": q_top_supplier,
        "market_share": q_market_share,
        "large_orders": q_large_orders,
        "disjunctive_pred": q_disjunctive_pred,
        "argmin_part": q_argmin_part,
        "idle_customers": q_idle_customers,
        "local_supplier_volume": q_local_supplier_volume,
        "unpivot_long": q_unpivot,
        "histogram_bins": q_histogram_bins,
        "ohlc_rollup": q_ohlc_rollup,
        "heavy_hitters": q_heavy_hitters,
        "fuzzy_name_pairs": q_fuzzy_name_pairs,
        "funnel": q_funnel,
        # --- driver-verified in rounds 1-2 (now past the 50-entry window) ---
        "filter_project": q_filter_project,
        "group_agg": q_group_agg,
        "multi_join": q_multi_join,
        "semi_join": q_semi_join,
        "anti_join": q_anti_join,
        "topk_per_group": q_topk_per_group,
        "window_running_sum": q_window_running_sum,
        "rollup": q_rollup,
        "cube": q_cube,
        "set_ops": q_set_ops,
        "string_fns": q_string_fns,
        "date_fns": q_date_fns,
        "distinct_count": q_distinct_count,
        "event_hourly_window": q_event_hourly,
        "json_extract": q_json_extract,
        "sessionization": q_sessionization,
        "asof_join": q_asof_join,
        "token_counts": q_token_counts,
        "word_freq_encoder": q_word_freq_encoder,
        "ngram_counts": q_ngram_counts,
        "tf_idf": q_tf_idf,
        "doc_quality": q_doc_quality,
        "dedup_exact": q_dedup_exact,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "scaler_moments": q_scaler_moments,
        "cosine_topk": q_cosine_topk,
        "one_hot_labels": q_one_hot,
        "confusion_matrix": q_confusion_matrix,
        "multiclass_metrics": q_multiclass_metrics,
        "session_window": q_session_window,
        "standard_scaler": q_standard_scaler,
        "linear_mapper": q_linear_mapper,
        "lsh_cosine_topk": q_lsh_cosine_topk,
        "kmeans_clusters": q_kmeans_clusters,
        "multimodal_features": q_multimodal_features,
        "range_join": q_range_join,
        "window_analytics": q_window_analytics,
        "math_fns": q_math_fns,
        "array_fns": q_array_fns,
        "string_fns2": q_string_fns2,
        "date_fns2": q_date_fns2,
        "grouping_sets": q_grouping_sets,
        "term_frequency": q_term_frequency,
        "stupid_backoff": q_stupid_backoff,
        "mean_avg_precision": q_mean_avg_precision,
        "window_range_frame": q_window_range_frame,
        "percentiles": q_percentiles,
    }
    # rotate the r15 head to the front (comment above _R15_HEAD); the
    # second splat only UPDATES values for head keys, so order is
    # head-first then historical order for the rest (_R12/_R13/_R14_HEAD
    # kept above as round history)
    return {**{k: base[k] for k in _R15_HEAD}, **base}


def _oracle_sql_literals() -> dict[str, str]:
    return {
        # --- round 7 ---
        "ordered_funnel": """
            WITH s0 AS (
                SELECT user_id,
                       MIN(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS prev
                FROM events WHERE event_type = 'view' GROUP BY user_id),
            s1 AS (
                SELECT e.user_id,
                       MIN(CAST(FLOOR(epoch(e.ts)) AS BIGINT)) AS prev
                FROM events e JOIN s0 USING (user_id)
                WHERE e.event_type = 'click'
                  AND CAST(FLOOR(epoch(e.ts)) AS BIGINT) > s0.prev
                GROUP BY e.user_id),
            s2 AS (
                SELECT e.user_id,
                       MIN(CAST(FLOOR(epoch(e.ts)) AS BIGINT)) AS prev
                FROM events e JOIN s1 USING (user_id)
                WHERE e.event_type = 'purchase'
                  AND CAST(FLOOR(epoch(e.ts)) AS BIGINT) > s1.prev
                GROUP BY e.user_id),
            c0 AS (SELECT COUNT(*) AS n FROM s0),
            c1 AS (SELECT COUNT(*) AS n FROM s1),
            c2 AS (SELECT COUNT(*) AS n FROM s2)
            SELECT CAST(0 AS BIGINT) AS step_idx, 'view' AS step,
                   CAST(n AS BIGINT) AS n_users, 1.0 AS conv_rate FROM c0
            UNION ALL
            SELECT CAST(1 AS BIGINT), 'click', CAST(c1.n AS BIGINT),
                   ROUND(c1.n * 1.0 / GREATEST(c0.n, 1), 6)
            FROM c1 CROSS JOIN c0
            UNION ALL
            SELECT CAST(2 AS BIGINT), 'purchase', CAST(c2.n AS BIGINT),
                   ROUND(c2.n * 1.0 / GREATEST(c1.n, 1), 6)
            FROM c2 CROSS JOIN c1
            ORDER BY step_idx
        """,
        "source_similarity": """
            WITH tok AS (
                SELECT source AS src,
                       UNNEST(list_filter(string_split_regex(
                           lower(trim(text)), '[^\\p{L}\\p{N}'']+'),
                       x -> x <> '')) AS tok
                FROM documents WHERE text IS NOT NULL),
            counts AS (
                SELECT src, tok, COUNT(*) AS n FROM tok GROUP BY 1, 2),
            vocab AS (
                SELECT tok FROM (
                    SELECT tok, SUM(n) AS g,
                           ROW_NUMBER() OVER (ORDER BY SUM(n) DESC, tok) AS rk
                    FROM counts GROUP BY tok)
                WHERE rk <= 2000),
            sub AS (SELECT c.* FROM counts c JOIN vocab USING (tok)),
            totals AS (SELECT src, SUM(n) AS tot FROM sub GROUP BY src),
            probs AS (
                SELECT s.src, s.tok, s.n * 1.0 / t.tot AS p
                FROM sub s JOIN totals t USING (src)),
            norms AS (
                SELECT src, sqrt(SUM(p * p)) AS nrm FROM probs GROUP BY src),
            dots AS (
                SELECT a.src AS source_a, b.src AS source_b,
                       SUM(a.p * b.p) AS dot
                FROM probs a JOIN probs b
                ON a.tok = b.tok AND a.src < b.src
                GROUP BY 1, 2)
            SELECT d.source_a, d.source_b,
                   ROUND(d.dot / (na.nrm * nb.nrm), 6) AS cosine
            FROM dots d
            JOIN norms na ON na.src = d.source_a
            JOIN norms nb ON nb.src = d.source_b
            ORDER BY d.source_a, d.source_b
        """,
        "psi_drift": """
            WITH ref AS (SELECT event_type, value FROM events
                         WHERE event_id % 2 = 0),
            cur AS (SELECT event_type, value FROM events
                    WHERE event_id % 2 = 1),
            edges AS (
                SELECT event_type,
                       quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5,
                                             0.6, 0.7, 0.8, 0.9]) AS bs
                FROM ref GROUP BY event_type),
            rbin AS (
                SELECT r.event_type,
                       len(list_filter(e.bs, b -> r.value > b)) AS bin,
                       COUNT(*) AS nr
                FROM ref r JOIN edges e ON r.event_type = e.event_type
                GROUP BY 1, 2),
            cbin AS (
                SELECT c.event_type,
                       len(list_filter(e.bs, b -> c.value > b)) AS bin,
                       COUNT(*) AS nc
                FROM cur c JOIN edges e ON c.event_type = e.event_type
                GROUP BY 1, 2),
            dense AS (
                SELECT e.event_type, UNNEST(range(0, 10)) AS bin
                FROM edges e),
            hist AS (
                SELECT d.event_type, d.bin,
                       COALESCE(nr, 0) AS nr, COALESCE(nc, 0) AS nc
                FROM dense d
                LEFT JOIN rbin r ON d.event_type = r.event_type AND d.bin = r.bin
                LEFT JOIN cbin c ON d.event_type = c.event_type AND d.bin = c.bin),
            tot AS (
                SELECT event_type,
                       CAST(SUM(nr) AS BIGINT) AS n_ref,
                       CAST(SUM(nc) AS BIGINT) AS n_cur
                FROM hist GROUP BY event_type)
            SELECT h.event_type, ANY_VALUE(t.n_ref) AS n_ref,
                   ANY_VALUE(t.n_cur) AS n_cur,
                   ROUND(SUM(
                       (GREATEST(nc * 1.0 / t.n_cur, 1e-6)
                        - GREATEST(nr * 1.0 / t.n_ref, 1e-6))
                       * (ln(GREATEST(nc * 1.0 / t.n_cur, 1e-6))
                          - ln(GREATEST(nr * 1.0 / t.n_ref, 1e-6)))
                   ), 6) AS psi,
                   ROUND(SUM(
                       (GREATEST(nc * 1.0 / t.n_cur, 1e-6)
                        - GREATEST(nr * 1.0 / t.n_ref, 1e-6))
                       * (ln(GREATEST(nc * 1.0 / t.n_cur, 1e-6))
                          - ln(GREATEST(nr * 1.0 / t.n_ref, 1e-6)))
                   ), 6) > 0.1 AS drifted
            FROM hist h JOIN tot t ON h.event_type = t.event_type
            GROUP BY h.event_type ORDER BY h.event_type
        """,
        "oov_rate": """
            WITH tok AS (
                SELECT source, UNNEST(list_filter(string_split_regex(
                           lower(trim(text)), '[^\\p{L}\\p{N}'']+'),
                       x -> x <> '')) AS tok
                FROM documents WHERE text IS NOT NULL),
            rtok AS (
                SELECT UNNEST(list_filter(string_split_regex(
                           lower(trim(text)), '[^\\p{L}\\p{N}'']+'),
                       x -> x <> '')) AS tok
                FROM documents WHERE text IS NOT NULL AND lang = 'en'),
            vocab AS (
                SELECT tok FROM (
                    SELECT tok, COUNT(*) AS n,
                           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS rk
                    FROM rtok GROUP BY tok)
                WHERE rk <= 500)
            SELECT t.source,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
                   ROUND(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) * 1.0
                         / COUNT(*), 6) AS oov_rate
            FROM tok t LEFT JOIN vocab v ON t.tok = v.tok
            GROUP BY t.source ORDER BY t.source
        """,
        "dedup_savings": """
            WITH base AS (
                SELECT source, doc_id, hash(text) AS ck, text IS NULL AS isn,
                       CASE WHEN text IS NULL THEN 0
                            ELSE len(list_filter(string_split_regex(
                                 lower(trim(text)), '[^\\p{L}\\p{N}'']+'),
                                 x -> x <> '')) END AS ntok,
                       CASE WHEN text IS NULL THEN NULL
                            ELSE MIN(doc_id) OVER (PARTITION BY
                                 CASE WHEN text IS NULL THEN NULL ELSE text END)
                       END AS keeper
                FROM documents)
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CASE WHEN NOT isn AND doc_id <> keeper
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
                   CAST(SUM(ntok) AS BIGINT) AS n_tokens,
                   CAST(SUM(CASE WHEN NOT isn AND doc_id <> keeper
                            THEN ntok ELSE 0 END) AS BIGINT) AS n_dup_tokens,
                   ROUND(SUM(CASE WHEN NOT isn AND doc_id <> keeper
                             THEN ntok ELSE 0 END) * 1.0
                         / GREATEST(SUM(ntok), 1), 6) AS savings_rate
            FROM base GROUP BY source ORDER BY source
        """,
        "incremental_neardup": """
            WITH sh AS (
                SELECT doc_id, CASE WHEN length(lower(trim(text))) >= 5
                    THEN list_distinct([substr(lower(trim(text)), i, 5)
                                        FOR i IN range(1, length(lower(trim(text))) - 3)])
                    ELSE [lower(trim(text))] END AS s
                FROM documents WHERE text IS NOT NULL),
            ex AS (SELECT doc_id, UNNEST(s) AS g FROM sh),
            sizes AS (SELECT doc_id, len(s) AS n FROM sh),
            inter AS (
                SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS c
                FROM ex a JOIN ex b
                ON a.g = b.g AND a.doc_id % 4 = 0 AND b.doc_id % 4 <> 0
                GROUP BY 1, 2),
            jac AS (
                SELECT i, j, ROUND(c * 1.0 / (na.n + nb.n - c), 6) AS jac
                FROM inter
                JOIN sizes na ON na.doc_id = i
                JOIN sizes nb ON nb.doc_id = j
                WHERE c * 1.0 / (na.n + nb.n - c) >= 0.8),
            best AS (
                SELECT i AS doc_id, j AS dup_of, jac,
                       ROW_NUMBER() OVER (PARTITION BY i
                                          ORDER BY jac DESC, j) AS rn
                FROM jac)
            SELECT doc_id, dup_of, jac FROM best WHERE rn = 1
            ORDER BY doc_id
        """,
        "doc_chunks": """
            WITH tok AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(trim(text)),
                                   '[^\\p{L}\\p{N}'']+'), x -> x <> '') AS t
                FROM documents WHERE text IS NOT NULL),
            base AS (SELECT doc_id, t, len(t) AS n FROM tok WHERE len(t) > 0),
            starts AS (
                SELECT doc_id, t, n, UNNEST(range(0, n, 48)) AS s FROM base),
            keep AS (SELECT * FROM starts WHERE s = 0 OR s - 48 + 64 < n)
            SELECT doc_id,
                   CAST(s // 48 AS BIGINT) AS chunk_id,
                   CAST(LEAST(64, n - s) AS BIGINT) AS n_tokens,
                   array_to_string(t[CAST(s + 1 AS BIGINT):CAST(s + 64 AS BIGINT)], ' ') AS chunk_text
            FROM keep ORDER BY doc_id, chunk_id
        """,
        # independent twin: the oracle CONSTRUCTS the canonical form the
        # regexp chain is specified to produce (lowercased host, no
        # tracking params / fragment / trailing slash), so it checks the
        # chain's semantics end-to-end rather than replaying it.
        "url_dedup": """
            SELECT canon_url, COUNT(*) AS n_variants,
                   MIN(doc_id) AS keeper
            FROM (
                SELECT doc_id,
                       'https://www.example.com/' || lang || '/page-'
                       || (doc_id % 40) || '?q=' || (doc_id % 3) AS canon_url
                FROM documents)
            GROUP BY canon_url ORDER BY canon_url
        """,
        "mixture_weights": """
            WITH tok AS (
                SELECT source,
                       CASE WHEN text IS NULL THEN NULL
                            ELSE list_filter(string_split_regex(lower(trim(text)),
                                 '[^\\p{L}\\p{N}'']+'), x -> x <> '') END AS t
                FROM documents),
            feats AS (
                SELECT source,
                       CASE WHEN t IS NULL THEN 0 ELSE len(t) END AS n,
                       CASE WHEN t IS NULL OR len(t) = 0 THEN 0.0
                            ELSE len(list_distinct(t)) * 1.0 / len(t) END AS dr
                FROM tok),
            per AS (
                SELECT source, COUNT(*) AS n_docs,
                       CAST(SUM(n) AS BIGINT) AS n_tokens,
                       AVG(CASE WHEN n BETWEEN 10 AND 5000 AND dr >= 0.3
                                THEN 1 ELSE 0 END) AS qr
                FROM feats GROUP BY source),
            tot AS (SELECT SUM(pow(n_tokens, 0.5) * qr) AS t FROM per)
            SELECT source, n_docs, n_tokens,
                   ROUND(qr, 6) AS quality_rate,
                   ROUND(pow(n_tokens, 0.5) * qr / t, 6) AS weight
            FROM per CROSS JOIN tot ORDER BY source
        """,
        "key_skew_profile": """
            WITH c AS (
                SELECT CAST(user_id AS VARCHAR) AS key, COUNT(*) AS cnt
                FROM events GROUP BY 1),
            t AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total,
                         COUNT(*) AS nkeys FROM c),
            r AS (
                SELECT key, cnt,
                       ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS rank,
                       CAST(SUM(cnt) OVER (ORDER BY cnt DESC, key
                            ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum
                FROM c)
            SELECT rank, key, cnt,
                   ROUND(cnt / total, 6) AS share,
                   ROUND(cum / total, 6) AS cum_share,
                   ROUND(cnt / (total / nkeys), 6) AS skew
            FROM r CROSS JOIN t WHERE rank <= 10 ORDER BY rank
        """,
        "top_paths": """
            WITH g AS (
                SELECT user_id, event_id, ts, event_type,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_sess
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (
                SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
                FROM g),
            p AS (
                SELECT user_id, sid,
                       array_to_string(
                           (list(event_type ORDER BY ts, event_id))[1:20],
                           '>') AS path
                FROM s GROUP BY user_id, sid),
            c AS (SELECT path, COUNT(*) AS n_sessions FROM p GROUP BY path),
            r AS (
                SELECT path, n_sessions,
                       ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path) AS rank
                FROM c)
            SELECT rank, path, n_sessions FROM r WHERE rank <= 15
            ORDER BY rank
        """,
        "mad_outliers": """
            WITH med AS (
                SELECT event_type, median(value) AS med
                FROM events GROUP BY event_type),
            dev AS (
                SELECT e.event_type, e.value, m.med,
                       abs(e.value - m.med) AS adev
                FROM events e JOIN med m ON e.event_type = m.event_type),
            mad AS (
                SELECT event_type, median(adev) AS mad
                FROM dev GROUP BY event_type)
            SELECT d.event_type,
                   CAST(COUNT(d.value) AS BIGINT) AS n,
                   ROUND(ANY_VALUE(d.med), 6) AS med,
                   ROUND(ANY_VALUE(m.mad), 6) AS mad,
                   CAST(SUM(CASE WHEN d.adev > 3.0 * 1.4826 * m.mad
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
                   ROUND(AVG(CASE WHEN d.adev > 3.0 * 1.4826 * m.mad
                                  THEN 1 ELSE 0 END), 6) AS outlier_frac
            FROM dev d JOIN mad m ON d.event_type = m.event_type
            GROUP BY d.event_type ORDER BY d.event_type
        """,
        "filter_project": """
            SELECT l_orderkey, l_linenumber,
                   ROUND(l_extendedprice * (1 - l_discount), 6) AS net
            FROM lineitem
            WHERE l_shipdate >= DATE '1997-01-01' AND l_quantity > 25
            ORDER BY l_orderkey, l_linenumber
        """,
        "group_agg": """
            SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
                   ROUND(SUM(l_quantity), 6) AS sq,
                   ROUND(AVG(l_extendedprice), 6) AS ap
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "multi_join": """
            SELECT r_name, n_name, COUNT(*) AS n_orders,
                   ROUND(SUM(o_totalprice), 6) AS rev
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name ORDER BY r_name, n_name
        """,
        "semi_join": """
            SELECT c_custkey FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders)
            ORDER BY c_custkey
        """,
        "anti_join": """
            SELECT c_custkey FROM customer
            WHERE c_custkey NOT IN
                  (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
            ORDER BY c_custkey
        """,
        "topk_per_group": """
            SELECT o_custkey, o_orderkey, rk FROM (
                SELECT o_custkey, o_orderkey,
                       ROW_NUMBER() OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey) AS rk
                FROM orders) t
            WHERE rk <= 3 ORDER BY o_custkey, rk
        """,
        "window_running_sum": """
            SELECT o_custkey, o_orderkey,
                   ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS run
            FROM orders ORDER BY o_custkey, o_orderkey
        """,
        "rollup": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_extendedprice), 6) AS s
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
            ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """,
        "cube": """
            SELECT l_returnflag, l_linestatus, COUNT(*) AS c
            FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
            ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """,
        "set_ops": """
            SELECT 'i' AS op, c_custkey FROM (
                SELECT c_custkey FROM customer WHERE c_acctbal > 0
                INTERSECT SELECT o_custkey FROM orders)
            UNION ALL
            SELECT 'e' AS op, c_custkey FROM (
                SELECT c_custkey FROM customer WHERE c_acctbal > 0
                EXCEPT SELECT o_custkey FROM orders)
            ORDER BY op, c_custkey
        """,
        "string_fns": """
            SELECT p_partkey, UPPER(SUBSTRING(p_name, 1, 5)) AS u,
                   LENGTH(p_name) AS l, REPLACE(p_type, ' ', '_') AS t
            FROM part WHERE p_name LIKE '%a%' ORDER BY p_partkey
        """,
        "date_fns": """
            SELECT strftime(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS m,
                   COUNT(*) AS c
            FROM orders GROUP BY 1 ORDER BY 1
        """,
        "distinct_count": """
            SELECT COUNT(DISTINCT l_partkey) AS d, COUNT(*) AS n FROM lineitem
        """,
        "event_hourly_window": """
            SELECT CAST(extract(epoch FROM DATE_TRUNC('hour', ts)) AS BIGINT) AS w,
                   event_type, COUNT(*) AS c, ROUND(SUM(value), 6) AS v
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "json_extract": """
            SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events ORDER BY event_id
        """,
        "sessionization": """
            WITH g AS (
                SELECT user_id, event_id, ts,
                       LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
                FROM events),
            s AS (
                SELECT user_id, ts,
                       SUM(CASE WHEN prev IS NULL
                                OR ts > prev + INTERVAL 30 MINUTE
                           THEN 1 ELSE 0 END)
                           OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                FROM g)
            SELECT user_id, CAST(sid AS BIGINT) AS sid, COUNT(*) AS n,
                   CAST(extract(epoch FROM DATE_TRUNC('second', MIN(ts))) AS BIGINT) AS t0,
                   CAST(extract(epoch FROM DATE_TRUNC('second', MAX(ts))) AS BIGINT) AS t1
            FROM s GROUP BY user_id, sid ORDER BY user_id, sid
        """,
        "asof_join": """
            SELECT e.event_id,
                   CAST(extract(epoch FROM DATE_TRUNC('second', MAX(s.ts))) AS BIGINT) AS signup_ts
            FROM events e
            LEFT JOIN events s
              ON s.user_id = e.user_id AND s.event_type = 'signup' AND s.ts <= e.ts
            WHERE e.event_type = 'error'
            GROUP BY e.event_id ORDER BY e.event_id
        """,
        "token_counts": """
            SELECT tok, COUNT(*) AS c FROM (
                SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents) t
            WHERE tok <> '' GROUP BY tok ORDER BY c DESC, tok LIMIT 50
        """,
        "word_freq_encoder": """
            SELECT tok, c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) - 1 AS idx
            FROM (
                SELECT tok, COUNT(*) AS c FROM (
                    SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents) t
                WHERE tok <> '' GROUP BY tok) cc
            QUALIFY idx < 100 ORDER BY idx
        """,
        "ngram_counts": """
            SELECT g, COUNT(*) AS c FROM (
                SELECT toks[i] || ' ' || toks[i + 1] AS g FROM (
                    SELECT list_filter(string_split(text, ' '), x -> x <> '') AS toks
                    FROM documents) d
                CROSS JOIN LATERAL (
                    SELECT UNNEST(range(1, GREATEST(len(toks), 1))) AS i) r
            ) t GROUP BY g ORDER BY c DESC, g LIMIT 50
        """,
        "tf_idf": """
            WITH n AS (SELECT COUNT(*) AS nd FROM documents),
            dfs AS (
                SELECT tok, COUNT(*) AS df FROM (
                    SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS tok
                    FROM documents) t
                WHERE tok <> '' GROUP BY tok)
            SELECT tok, df, ROUND(LN((nd + 1.0) / (df + 1.0)) + 1.0, 6) AS idf
            FROM dfs, n ORDER BY df DESC, tok LIMIT 50
        """,
        "doc_quality": """
            SELECT doc_id,
                   LENGTH(text) AS n_chars,
                   len(list_filter(string_split(TRIM(text), ' '), x -> x <> '')) AS n_tokens,
                   ROUND(LENGTH(regexp_replace(text, '[^0-9]', '', 'g'))
                         / GREATEST(LENGTH(text), 1), 6) AS digit_ratio,
                   ROUND(LENGTH(text) / CAST(GREATEST(
                         len(list_filter(string_split(TRIM(text), ' '), x -> x <> '')), 1)
                         AS DOUBLE), 6) AS avg_tok_len
            FROM documents ORDER BY doc_id
        """,
        "dedup_exact": """
            SELECT lang, source, COUNT(*) AS c FROM (
                SELECT DISTINCT lang, source, text FROM documents) t
            GROUP BY lang, source ORDER BY lang, source
        """,
        "ngram_jaccard_pairs": """
            WITH toks AS (
                SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS tok
                FROM documents WHERE doc_id < 40),
            tk AS (SELECT * FROM toks WHERE tok <> ''),
            sizes AS (SELECT doc_id, COUNT(*) AS n FROM tk GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS c
                FROM tk a JOIN tk b ON a.tok = b.tok AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
            SELECT i, j, ROUND(c / (na.n + nb.n - c), 6) AS jac
            FROM inter
            JOIN sizes na ON na.doc_id = i
            JOIN sizes nb ON nb.doc_id = j
            WHERE c / (na.n + nb.n - c) >= 0.1
            ORDER BY i, j
        """,
        # identical naive-inverted-index twin: proves prefix filter lossless
        "jaccard_prefix_pairs": """
            WITH toks AS (
                SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS tok
                FROM documents WHERE doc_id < 40),
            tk AS (SELECT * FROM toks WHERE tok <> ''),
            sizes AS (SELECT doc_id, COUNT(*) AS n FROM tk GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS c
                FROM tk a JOIN tk b ON a.tok = b.tok AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
            SELECT i, j, ROUND(c / (na.n + nb.n - c), 6) AS jac
            FROM inter
            JOIN sizes na ON na.doc_id = i
            JOIN sizes nb ON nb.doc_id = j
            WHERE c / (na.n + nb.n - c) >= 0.1
            ORDER BY i, j
        """,
        "scaler_moments": """
            SELECT i, ROUND(AVG(list_extract(embedding, i + 1)), 6) AS m,
                   ROUND(STDDEV_SAMP(list_extract(embedding, i + 1)), 6) AS s
            FROM embeddings CROSS JOIN range(0, 8) r(i)
            GROUP BY i ORDER BY i
        """,
        "cosine_topk": """
            SELECT probe, vec_id, cos, rk FROM (
                SELECT p.vec_id AS probe, e.vec_id AS vec_id,
                       ROUND(list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
                                                    CAST(e.embedding AS DOUBLE[])), 6) AS cos,
                       ROW_NUMBER() OVER (PARTITION BY p.vec_id
                           ORDER BY list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
                                                           CAST(e.embedding AS DOUBLE[])) DESC,
                                    e.vec_id) AS rk
                FROM embeddings p
                JOIN embeddings e ON e.vec_id <> p.vec_id
                WHERE p.vec_id < 10) t
            WHERE rk <= 10 ORDER BY probe, rk
        """,
        "one_hot_labels": """
            SELECT vec_id,
                   CAST(CASE WHEN label = 3 THEN 1.0 ELSE -1.0 END AS DOUBLE) AS y3
            FROM embeddings ORDER BY vec_id
        """,
        "confusion_matrix": """
            SELECT label, vec_id % 10 AS pred, COUNT(*) AS c
            FROM embeddings GROUP BY label, pred ORDER BY label, pred
        """,
        "multiclass_metrics": """
            WITH preds AS (SELECT label, vec_id % 10 AS pred FROM embeddings),
            cls AS (SELECT DISTINCT label AS cls FROM preds
                    UNION SELECT DISTINCT pred FROM preds),
            tp AS (SELECT label AS cls, COUNT(*) AS tp FROM preds
                   WHERE label = pred GROUP BY 1),
            pt AS (SELECT pred AS cls, COUNT(*) AS pred_n FROM preds GROUP BY 1),
            lt AS (SELECT label AS cls, COUNT(*) AS true_n FROM preds GROUP BY 1),
            m AS (
                SELECT c.cls,
                       COALESCE(lt.true_n, 0) AS support,
                       CASE WHEN COALESCE(pt.pred_n, 0) > 0
                            THEN COALESCE(tp.tp, 0) * 1.0 / pt.pred_n
                            ELSE 0.0 END AS p,
                       CASE WHEN COALESCE(lt.true_n, 0) > 0
                            THEN COALESCE(tp.tp, 0) * 1.0 / lt.true_n
                            ELSE 0.0 END AS r
                FROM cls c
                LEFT JOIN tp USING (cls) LEFT JOIN pt USING (cls)
                LEFT JOIN lt USING (cls))
            SELECT CAST(cls AS BIGINT) AS cls, support,
                   ROUND(p, 6) AS precision, ROUND(r, 6) AS recall,
                   ROUND(CASE WHEN p + r > 0 THEN 2 * p * r / (p + r)
                              ELSE 0.0 END, 6) AS f1
            FROM m ORDER BY cls
        """,
        "session_window": """
            WITH g AS (
                SELECT user_id, event_id, ts, value,
                       LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
                FROM events),
            s AS (
                SELECT user_id, ts, value,
                       SUM(CASE WHEN prev IS NULL
                                OR ts >= prev + INTERVAL 30 MINUTE
                           THEN 1 ELSE 0 END)
                           OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                FROM g)
            SELECT user_id,
                   CAST(extract(epoch FROM DATE_TRUNC('second', MIN(ts))) AS BIGINT) AS s_start,
                   COUNT(*) AS n, ROUND(SUM(value), 6) AS v
            FROM s GROUP BY user_id, sid ORDER BY user_id, s_start
        """,
        "standard_scaler": """
            WITH ex AS (
                SELECT vec_id, i, CAST(list_extract(embedding, i + 1) AS DOUBLE) AS x
                FROM embeddings CROSS JOIN range(0, 4) r(i)),
            mo AS (SELECT i, AVG(x) AS m, STDDEV_SAMP(x) AS s FROM ex GROUP BY i)
            SELECT ex.vec_id, ex.i, ROUND((ex.x - mo.m) / mo.s, 6) AS z
            FROM ex JOIN mo USING (i) ORDER BY ex.vec_id, ex.i
        """,
        "linear_mapper": _lm_oracle_sql(),
        "range_join": """
            SELECT s.event_id AS sig_id, COUNT(*) AS n
            FROM events e
            JOIN events s
              ON e.user_id = s.user_id AND s.event_type = 'signup'
             AND e.ts > s.ts AND e.ts <= s.ts + INTERVAL 5 MINUTE
            GROUP BY 1 ORDER BY 1
        """,
        "window_analytics": """
            SELECT o_custkey, o_orderkey,
                   ROUND(LAG(o_totalprice) OVER w, 6) AS prev_p,
                   ROUND(LEAD(o_totalprice) OVER w, 6) AS next_p,
                   ROUND(FIRST_VALUE(o_totalprice) OVER w, 6) AS first_p,
                   CAST(NTILE(4) OVER w AS BIGINT) AS quartile
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
            ORDER BY o_custkey, o_orderkey
        """,
        "math_fns": """
            SELECT l_orderkey,
                   CAST(FLOOR(l_quantity) AS BIGINT) AS fl,
                   CAST(CEIL(l_quantity) AS BIGINT) AS ce,
                   ROUND(ABS(l_quantity - 25), 6) AS ab,
                   ROUND(POW(l_quantity, 2), 6) AS p2,
                   ROUND(EXP(l_quantity / 50.0), 6) AS ex,
                   ROUND(LN(l_quantity + 1.0), 6) AS ln,
                   ROUND(SQRT(l_quantity), 6) AS sq,
                   CAST(SIGN(l_quantity - 25) AS DOUBLE) AS sg
            FROM lineitem WHERE l_linenumber = 1 ORDER BY l_orderkey
        """,
        "array_fns": """
            SELECT vec_id,
                   CAST(len(embedding) AS BIGINT) AS d,
                   ROUND(CAST(embedding[1] AS DOUBLE), 6) AS h,
                   ROUND(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 6) AS mx,
                   ROUND(CAST(list_aggregate(embedding, 'min') AS DOUBLE), 6) AS mn,
                   ROUND(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum')
                         / len(embedding), 6) AS avg
            FROM embeddings WHERE vec_id < 200 ORDER BY vec_id
        """,
        "string_fns2": """
            SELECT p_partkey,
                   LPAD(p_brand, 12, '*') AS lp,
                   CAST(levenshtein(p_type, 'STANDARD') AS BIGINT) AS lv,
                   REVERSE(p_brand) AS rv,
                   regexp_extract(p_name, '([a-z]+)', 1) AS rx,
                   concat_ws('|', p_brand, p_type) AS cw
            FROM part ORDER BY p_partkey
        """,
        "date_fns2": """
            SELECT o_orderkey,
                   CAST(year(o_orderdate) AS BIGINT) AS y,
                   CAST(month(o_orderdate) AS BIGINT) AS m,
                   CAST(day(o_orderdate) AS BIGINT) AS dom,
                   strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
                   CAST(date_diff('day', DATE '1995-01-01',
                                  CAST(o_orderdate AS DATE)) AS BIGINT) AS dd
            FROM orders ORDER BY o_orderkey
        """,
        "grouping_sets": """
            SELECT l_returnflag, l_linestatus, COUNT(*) AS c,
                   ROUND(SUM(l_quantity), 6) AS sq
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
            ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """,
        "term_frequency": """
            SELECT doc_id, tok, ROUND(SQRT(COUNT(*)), 6) AS w FROM (
                SELECT doc_id,
                       UNNEST(list_filter(
                           string_split_regex(lower(trim(text)), '[^\\p{L}\\p{N}'']+'),
                           x -> x <> '')) AS tok
                FROM documents WHERE doc_id < 100) t
            GROUP BY doc_id, tok ORDER BY doc_id, tok
        """,
        "stupid_backoff": """
            WITH toks AS (
                SELECT list_filter(
                    string_split_regex(lower(trim(text)), '[^\\p{L}\\p{N}'']+'),
                    x -> x <> '') AS t
                FROM documents),
            unic AS (
                SELECT w, COUNT(*) AS c FROM (SELECT UNNEST(t) AS w FROM toks) u
                GROUP BY w),
            bi AS (
                SELECT t[i] || ' ' || t[i + 1] AS g, t[i] AS w1
                FROM toks CROSS JOIN LATERAL (
                    SELECT UNNEST(range(1, GREATEST(len(t), 1))) AS i) r),
            bic AS (SELECT g, w1, COUNT(*) AS cnt FROM bi GROUP BY g, w1)
            SELECT g, cnt, ROUND(cnt * 1.0 / u.c, 6) AS s
            FROM bic JOIN unic u ON bic.w1 = u.w
            ORDER BY cnt DESC, g LIMIT 100
        """,
        "mean_avg_precision": """
            WITH s AS (
                SELECT label AS cls, CAST(embedding[1] AS DOUBLE) AS score,
                       vec_id % 2 AS rel, vec_id
                FROM embeddings),
            r AS (
                SELECT cls, rel,
                       ROW_NUMBER() OVER (PARTITION BY cls ORDER BY score DESC, vec_id) AS rk,
                       SUM(rel) OVER (PARTITION BY cls ORDER BY score DESC, vec_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                FROM s)
            SELECT CAST(cls AS BIGINT) AS cls, ROUND(AVG(cum * 1.0 / rk), 6) AS ap
            FROM r WHERE rel = 1 GROUP BY cls ORDER BY cls
        """,
        "window_range_frame": """
            SELECT o_custkey, o_orderkey,
                   COUNT(*) OVER w AS n_30d,
                   ROUND(SUM(o_totalprice) OVER w, 6) AS rev_30d
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey
                         ORDER BY CAST(extract(epoch FROM o_orderdate) AS BIGINT)
                         RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
            ORDER BY o_custkey, o_orderkey
        """,
        "percentiles": """
            SELECT l_returnflag,
                   ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
                   ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
                   ROUND(quantile_cont(l_quantity, 0.25), 6) AS q25
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "event_sliding_window": """
            WITH w AS (
                SELECT CAST(extract(epoch FROM DATE_TRUNC('hour', ts)) AS BIGINT)
                           - 3600 * off AS w,
                       event_type, value
                FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS off) o)
            SELECT w, event_type, COUNT(*) AS c, ROUND(SUM(value), 6) AS v
            FROM w GROUP BY w, event_type ORDER BY w, event_type
        """,
        "map_fns": """
            SELECT event_id,
                   array_to_string(list_sort(json_keys(props)), ',') AS keys,
                   CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
            FROM events ORDER BY event_id
        """,
        "approx_distinct": """
            SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact,
                   1 AS within_2pct
            FROM lineitem
        """,
        "lang_id": """
            WITH toks AS (
                SELECT doc_id, list_filter(
                    string_split_regex(lower(trim(text)), '[^\\p{L}\\p{N}'']+'),
                    x -> x <> '') AS t, text
                FROM documents),
            sc AS (
                SELECT doc_id,
                    len(list_filter(t, x -> list_contains(
                        ['the','of','and','a','to','in','is','you','that','it',
                         'he','was','for','on','are','as','with','his','they','i'], x)))
                        * 1.0 / GREATEST(len(t), 1) AS en,
                    len(list_filter(t, x -> list_contains(
                        ['de','la','que','el','en','y','a','los','del','se',
                         'las','por','un','para','con','no','una','su'], x)))
                        * 1.0 / GREATEST(len(t), 1) AS es,
                    LENGTH(regexp_replace(text,
                        '[^\\x{4E00}-\\x{9FFF}\\x{3040}-\\x{30FF}\\x{AC00}-\\x{D7AF}]',
                        '', 'g')) * 1.0 / GREATEST(LENGTH(text), 1) AS cjk
                FROM toks)
            SELECT doc_id, ROUND(en, 6) AS en, ROUND(es, 6) AS es,
                   ROUND(cjk, 6) AS cjk,
                   CASE WHEN en >= es AND en >= cjk THEN 'en'
                        WHEN es >= cjk THEN 'es' ELSE 'cjk' END AS lang_pred
            FROM sc ORDER BY doc_id
        """,
        "binary_metrics": """
            WITH toks AS (
                SELECT lang, list_filter(
                    string_split_regex(lower(trim(text)), '[^\\p{L}\\p{N}'']+'),
                    x -> x <> '') AS t
                FROM documents),
            p AS (
                SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label,
                       CASE WHEN len(list_filter(t, x -> list_contains(
                            ['the','of','and','a','to','in','is','you','that','it',
                             'he','was','for','on','are','as','with','his','they','i'], x)))
                            * 1.0 / GREATEST(len(t), 1) > 0.15
                            THEN 1 ELSE 0 END AS pred
                FROM toks),
            agg AS (
                SELECT CAST(SUM(CASE WHEN label = 1 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                       CAST(SUM(CASE WHEN label = 0 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                       CAST(SUM(CASE WHEN label = 0 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
                       CAST(SUM(CASE WHEN label = 1 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn
                FROM p)
            SELECT tp, fp, tn, fn,
                   ROUND((tp + tn) * 1.0 / (tp + fp + tn + fn), 6) AS accuracy,
                   ROUND(CASE WHEN tp + fp > 0 THEN tp * 1.0 / (tp + fp) ELSE 0.0 END, 6) AS precision,
                   ROUND(CASE WHEN tp + fn > 0 THEN tp * 1.0 / (tp + fn) ELSE 0.0 END, 6) AS recall,
                   ROUND(CASE WHEN tp * 1.0 / GREATEST(tp + fp, 1)
                                 + tp * 1.0 / GREATEST(tp + fn, 1) > 0
                         THEN 2.0 * (tp * 1.0 / (tp + fp)) * (tp * 1.0 / (tp + fn))
                              / (tp * 1.0 / (tp + fp) + tp * 1.0 / (tp + fn))
                         ELSE 0.0 END, 6) AS f1
            FROM agg
        """,
        "embedding_neardup": """
            SELECT a.vec_id AS i, b.vec_id AS j,
                   ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[])), 6) AS cos
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE a.vec_id < 200 AND b.vec_id < 200
              AND ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                               CAST(b.embedding AS DOUBLE[])), 6) >= 0.3
            ORDER BY i, j
        """,
        "doc_fingerprint": """
            WITH toks AS (
                SELECT doc_id, list_filter(
                    string_split_regex(lower(trim(text)), '[^\\p{L}\\p{N}'']+'),
                    x -> x <> '') AS t
                FROM documents),
            fps AS (
                SELECT doc_id,
                    CASE WHEN len(t) >= 8 THEN
                        list_min([md5(array_to_string(t[i:i+7], ' '))
                                  for i in range(1, len(t) - 6)])
                    ELSE md5(array_to_string(t, ' ')) END AS fp
                FROM toks)
            SELECT doc_id, fp, MIN(doc_id) OVER (PARTITION BY fp) AS rep,
                   CAST(doc_id <> MIN(doc_id) OVER (PARTITION BY fp) AS INT) AS is_dup
            FROM fps ORDER BY doc_id
        """,
        "augmented_eval": """
            WITH src AS (
                SELECT vec_id % 100 AS sid, CAST(label AS BIGINT) AS label,
                       CAST(embedding[1:4] AS DOUBLE[]) AS scores
                FROM embeddings WHERE vec_id < 200),
            per_dim AS (
                SELECT sid, label, i, AVG(scores[i + 1]) AS a
                FROM src CROSS JOIN range(0, 4) r(i)
                GROUP BY sid, label, i),
            m AS (
                SELECT sid, label, list(a ORDER BY i) AS avg_scores
                FROM per_dim GROUP BY sid, label)
            SELECT sid, label,
                   CAST(list_position(avg_scores, list_max(avg_scores)) - 1 AS BIGINT) AS pred,
                   ROUND(avg_scores[1], 6) AS m0, ROUND(avg_scores[2], 6) AS m1,
                   ROUND(avg_scores[3], 6) AS m2, ROUND(avg_scores[4], 6) AS m3
            FROM m ORDER BY sid, label
        """,
        "exists_subquery": """
            SELECT o_orderpriority, COUNT(*) AS c FROM orders o
            WHERE o_orderdate >= DATE '1996-01-01'
              AND o_orderdate < DATE '1996-07-01'
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_quantity > 45)
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "scalar_subquery": """
            SELECT ROUND(SUM(l_extendedprice) / 7.0, 6) AS avg_yearly
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            WHERE p.p_brand = 'Brand#23'
              AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                                  FROM lineitem l2
                                  WHERE l2.l_partkey = l.l_partkey)
        """,
        "shipping_priority": """
            SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 6) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < DATE '1996-06-01'
              AND l_shipdate > DATE '1996-06-01'
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue DESC, l_orderkey LIMIT 10
        """,
        "pivot_counts": """
            SELECT label,
                   COUNT(*) FILTER (WHERE pred = 0) AS p0,
                   COUNT(*) FILTER (WHERE pred = 1) AS p1,
                   COUNT(*) FILTER (WHERE pred = 2) AS p2,
                   COUNT(*) FILTER (WHERE pred = 3) AS p3,
                   COUNT(*) FILTER (WHERE pred = 4) AS p4,
                   COUNT(*) FILTER (WHERE pred = 5) AS p5,
                   COUNT(*) FILTER (WHERE pred = 6) AS p6,
                   COUNT(*) FILTER (WHERE pred = 7) AS p7,
                   COUNT(*) FILTER (WHERE pred = 8) AS p8,
                   COUNT(*) FILTER (WHERE pred = 9) AS p9
            FROM (SELECT label, vec_id % 10 AS pred FROM embeddings) t
            GROUP BY label ORDER BY label
        """,
        "covar_corr": """
            SELECT l_returnflag,
                   ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 2) AS cov,
                   ROUND(CORR(l_quantity, l_extendedprice), 6) AS r,
                   ROUND(VAR_SAMP(l_quantity), 6) AS vq
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "window_pct": """
            SELECT o_custkey, o_orderkey,
                   ROUND(PERCENT_RANK() OVER w, 6) AS pr,
                   ROUND(CUME_DIST() OVER w, 6) AS cd,
                   RANK() OVER w AS rnk,
                   DENSE_RANK() OVER w AS drnk
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice)
            ORDER BY o_custkey, o_orderkey
        """,
        "conditional_agg": """
            SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
                   ROUND(SUM(CASE WHEN n_name = 'BRAZIL'
                                  THEN o_totalprice ELSE 0.0 END)
                         / SUM(o_totalprice), 6) AS share,
                   COUNT(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY y ORDER BY y
        """,
        "revenue_predicate": """
            SELECT ROUND(SUM(l_extendedprice * l_discount), 6) AS revenue,
                   COUNT(*) AS n
            FROM lineitem
            WHERE l_shipdate >= DATE '1996-01-01'
              AND l_shipdate < DATE '1997-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24
        """,
        "array_fns2": """
            WITH ex AS (
                SELECT vec_id,
                       CAST(list_extract(embedding, i + 1) AS DOUBLE) AS x,
                       CAST(list_extract(embedding, 64 - i) AS DOUBLE) AS y
                FROM embeddings CROSS JOIN range(0, 64) r(i)
                WHERE vec_id < 100)
            SELECT e.vec_id,
                   ROUND((SELECT SUM(x * y) FROM ex WHERE ex.vec_id = e.vec_id), 6) AS rdot,
                   CAST(list_position(e.embedding, list_max(e.embedding)) AS BIGINT) AS argmax1
            FROM embeddings e WHERE e.vec_id < 100 ORDER BY e.vec_id
        """,
        "regr_fns": """
            SELECT l_returnflag,
                   ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
                   ROUND(regr_intercept(l_extendedprice, l_quantity), 6) AS icept,
                   ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
                   COUNT(*) AS n
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "token_packing": """
            WITH toks AS (
                SELECT doc_id, lang,
                       CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                            ELSE len(regexp_split_to_array(TRIM(text), '\\s+'))
                       END AS toks
                FROM documents),
            runs AS (
                SELECT doc_id, lang, toks,
                       SUM(toks) OVER (PARTITION BY lang ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
                FROM toks)
            SELECT doc_id, lang, CAST(toks AS BIGINT) AS toks,
                   CAST(FLOOR((run - toks) / 2048.0) AS BIGINT) AS pack_id
            FROM runs ORDER BY doc_id
        """,
        "approx_percentile": """
            SELECT l_returnflag,
                   ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS exact_p50,
                   1 AS within_1pct
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "null_fns": """
            SELECT c_custkey,
                   ROUND(COALESCE(NULLIF(c_acctbal, 0.0), -1.0), 6) AS bal,
                   ROUND(GREATEST(c_acctbal, 100.0), 6) AS g,
                   ROUND(LEAST(c_acctbal, 100.0), 6) AS l,
                   CASE WHEN c_acctbal < 0 THEN 'neg'
                        WHEN c_acctbal < 1000 THEN 'low'
                        ELSE 'high' END AS bucket
            FROM customer ORDER BY c_custkey
        """,
        "grouped_ols": """
            SELECT l_returnflag,
                   ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
                   ROUND(regr_intercept(l_extendedprice, l_quantity), 6) AS icept,
                   COUNT(*) AS n
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        # exact all-pairs 5-char-shingle Jaccard dedup (inverted-index form,
        # no N^2 list intersects): drop any doc with an earlier doc at
        # jac >= 0.8 — the verified decision minhash LSH reproduces.
        "minhash_dedup": """
            WITH sh AS (
                SELECT doc_id, CASE WHEN length(lower(trim(text))) >= 5
                    THEN list_distinct([substr(lower(trim(text)), i, 5)
                                        FOR i IN range(1, length(lower(trim(text))) - 3)])
                    ELSE [lower(trim(text))] END AS s
                FROM documents),
            ex AS (SELECT doc_id, UNNEST(s) AS g FROM sh),
            sizes AS (SELECT doc_id, len(s) AS n FROM sh),
            inter AS (
                SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS c
                FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
            dup AS (
                SELECT DISTINCT j FROM inter
                JOIN sizes na ON na.doc_id = i
                JOIN sizes nb ON nb.doc_id = j
                WHERE c * 1.0 / (na.n + nb.n - c) >= 0.8)
            SELECT doc_id FROM documents
            WHERE doc_id NOT IN (SELECT j FROM dup) ORDER BY doc_id
        """,
        # transitive closure of the exact jaccard>=0.8 pair graph via a
        # recursive CTE; cluster_id = min reachable doc_id.
        "dedup_clusters": """
            WITH RECURSIVE sh AS (
                SELECT doc_id, CASE WHEN length(lower(trim(text))) >= 5
                    THEN list_distinct([substr(lower(trim(text)), i, 5)
                                        FOR i IN range(1, length(lower(trim(text))) - 3)])
                    ELSE [lower(trim(text))] END AS s
                FROM documents),
            ex AS (SELECT doc_id, UNNEST(s) AS g FROM sh),
            sizes AS (SELECT doc_id, len(s) AS n FROM sh),
            inter AS (
                SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS c
                FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
            pairs AS (
                SELECT i, j FROM inter
                JOIN sizes na ON na.doc_id = i
                JOIN sizes nb ON nb.doc_id = j
                WHERE c * 1.0 / (na.n + nb.n - c) >= 0.8),
            sym AS (SELECT i AS a, j AS b FROM pairs
                    UNION SELECT j, i FROM pairs),
            reach(a, b) AS (
                SELECT a, b FROM sym
                UNION
                SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a)
            SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
            FROM reach GROUP BY a ORDER BY doc_id
        """,
        # exact shingle-Jaccard pairs >= 0.8 — the verified pairs the
        # simhash band join must recover (hamming <= 7 is structural).
        "simhash_pairs": """
            WITH sh AS (
                SELECT doc_id, CASE WHEN length(lower(trim(text))) >= 5
                    THEN list_distinct([substr(lower(trim(text)), i, 5)
                                        FOR i IN range(1, length(lower(trim(text))) - 3)])
                    ELSE [lower(trim(text))] END AS s
                FROM documents),
            ex AS (SELECT doc_id, UNNEST(s) AS g FROM sh),
            sizes AS (SELECT doc_id, len(s) AS n FROM sh),
            inter AS (
                SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS c
                FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
            SELECT i, j, ROUND(c * 1.0 / (na.n + nb.n - c), 6) AS jac
            FROM inter
            JOIN sizes na ON na.doc_id = i
            JOIN sizes nb ON nb.doc_id = j
            WHERE c * 1.0 / (na.n + nb.n - c) >= 0.8
            ORDER BY i, j
        """,
        # LSH config has recall 1.0 at this scale -> equals exact top-k.
        "lsh_cosine_topk": """
            SELECT probe, vec_id, cos, rk FROM (
                SELECT p.vec_id AS probe, e.vec_id AS vec_id,
                       ROUND(list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
                                                    CAST(e.embedding AS DOUBLE[])), 6) AS cos,
                       ROW_NUMBER() OVER (PARTITION BY p.vec_id
                           ORDER BY list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
                                                           CAST(e.embedding AS DOUBLE[])) DESC,
                                    e.vec_id) AS rk
                FROM embeddings p
                JOIN embeddings e ON e.vec_id <> p.vec_id
                WHERE p.vec_id < 10) t
            WHERE rk <= 10 ORDER BY probe, rk
        """,
        # k-means invariants: k non-empty clusters partition all rows and
        # genuinely reduce SSE; the fit itself is iterative (not SQL).
        "kmeans_clusters": """
            SELECT CAST(10 AS BIGINT) AS n_clusters,
                   COUNT(*) AS total,
                   TRUE AS nonempty_ok,
                   TRUE AS sse_reduced_ok
            FROM embeddings WHERE embedding IS NOT NULL
        """,
        # per-probe IVF invariants: 10 dense-ranked results, recall@10 vs
        # the exact kernel >= 0.5 (measured 0.6-0.9, deterministic seed).
        "ivf_topk": """
            SELECT CAST(vec_id AS BIGINT) AS probe,
                   CAST(10 AS BIGINT) AS n,
                   TRUE AS ranks_ok,
                   TRUE AS recall_ok
            FROM embeddings WHERE vec_id < 10 ORDER BY probe
        """,
        # PQ ANN: same per-probe invariants as ivf_topk (min recall 9/10
        # measured at m=16 ks=32 refine=8, deterministic seed)
        "pq_topk": """
            SELECT CAST(vec_id AS BIGINT) AS probe,
                   CAST(10 AS BIGINT) AS n,
                   TRUE AS ranks_ok,
                   TRUE AS recall_ok
            FROM embeddings WHERE vec_id < 10 ORDER BY probe
        """,
        # SCD2 history: change points + lead validity intervals
        "scd2_intervals": """
            WITH ordered AS (
                SELECT user_id, event_type, ts, event_id,
                       LAG(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS prev
                FROM events),
            ch AS (
                SELECT * FROM ordered
                WHERE prev IS NULL OR prev <> event_type)
            SELECT user_id, event_type,
                   CAST(floor(epoch(ts)) AS BIGINT) AS valid_from,
                   CAST(floor(epoch(LEAD(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ))) AS BIGINT) AS valid_to
            FROM ch ORDER BY user_id, valid_from
        """,
        # identical PII injection + regexp chain; counts taken on the
        # progressively redacted text exactly like pii_count
        "pii_redact": r"""
            WITH aug AS (
                SELECT doc_id,
                       text || ' contact user' || CAST(doc_id AS VARCHAR)
                            || '@example.com or 555-012-'
                            || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                            || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                            || '.7' AS text
                FROM documents),
            s1 AS (
                SELECT doc_id,
                       regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                           '[EMAIL]', 'g') AS t1,
                       len(regexp_extract_all(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                           AS c1
                FROM aug),
            s2 AS (
                SELECT doc_id,
                       regexp_replace(t1,
                           '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b',
                           '[PHONE]', 'g') AS t2,
                       c1 + len(regexp_extract_all(t1,
                           '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b')) AS c2
                FROM s1)
            SELECT doc_id,
                   regexp_replace(t2,
                       '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
                       '[IP]', 'g') AS redacted,
                   CAST(c2 + len(regexp_extract_all(t2,
                       '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
                       AS BIGINT) AS n_pii
            FROM s2 ORDER BY doc_id
        """,
        # same split + bigram construction + list-lambda mode
        "repetition_signals": """
            WITH t AS (
                SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
            g AS (
                SELECT doc_id, tk,
                       CASE WHEN len(tk) >= 2 THEN list_transform(
                                range(1, len(tk)),
                                i -> tk[i] || ' ' || tk[i+1])
                            ELSE [] END AS g2
                FROM t),
            m AS (
                SELECT doc_id, tk, g2,
                       coalesce(list_max(list_transform(
                           list_distinct(g2),
                           x -> len(list_filter(g2, y -> y = x)))), 0) AS top
                FROM g)
            SELECT doc_id,
                   CAST(len(tk) AS BIGINT) AS n_tokens,
                   ROUND(CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk), 6)
                       AS distinct_ratio,
                   CAST(top AS BIGINT) AS top_bigram_count,
                   CASE WHEN len(g2) > 0
                        THEN ROUND(CAST(top AS DOUBLE) / len(g2), 6)
                        END AS top_bigram_frac
            FROM m ORDER BY doc_id
        """,
        # gram-string join == gram-hash semi join (xxhash64 collision-free
        # at fixture scale)
        "contamination": """
            WITH t AS (
                SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
            g AS (
                SELECT doc_id,
                       UNNEST(list_distinct(CASE WHEN len(tk) >= 4
                           THEN list_transform(range(1, len(tk) - 2),
                               i -> tk[i] || ' ' || tk[i+1] || ' '
                                    || tk[i+2] || ' ' || tk[i+3])
                           ELSE [] END)) AS gram
                FROM t),
            b AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0)
            SELECT DISTINCT g.doc_id FROM g JOIN b USING (gram)
            WHERE g.doc_id % 97 <> 0 ORDER BY doc_id
        """,
        # same tokenization + md5 span keys; count(*) over the per-doc
        # DISTINCT span list = distinct-doc count, as on the Spark side
        "duplicate_spans": """
            WITH toks AS (
                SELECT doc_id, list_filter(
                    string_split_regex(lower(trim(text)),
                                       '[^\\p{L}\\p{N}'']+'),
                    x -> x <> '') AS t
                FROM documents),
            keyed AS (
                SELECT doc_id, list_distinct(
                    CASE WHEN len(t) >= 8 THEN
                        list_transform(range(1, len(t) - 8 + 2),
                            i -> CAST(('0x' || substr(md5(
                                array_to_string(list_slice(t, i, i + 7), ' ')
                            ), 1, 13)) AS BIGINT))
                    ELSE [] END) AS ks
                FROM toks),
            spans AS (SELECT doc_id, UNNEST(ks) AS span FROM keyed),
            shared AS (
                SELECT span FROM spans GROUP BY span HAVING COUNT(*) >= 2),
            dupc AS (
                SELECT doc_id, COUNT(*) AS n_dup
                FROM spans WHERE span IN (SELECT span FROM shared)
                GROUP BY doc_id),
            spine AS (SELECT doc_id, len(ks) AS n_spans FROM keyed)
            SELECT s.doc_id, CAST(s.n_spans AS BIGINT) AS n_spans,
                   CAST(COALESCE(d.n_dup, 0) AS BIGINT) AS n_dup_spans,
                   CASE WHEN s.n_spans > 0
                        THEN CAST(COALESCE(d.n_dup, 0) AS DOUBLE)
                             / s.n_spans END AS dup_frac
            FROM spine s LEFT JOIN dupc d USING (doc_id)
            ORDER BY s.doc_id
        """,
        # raw span strings this time (the remediation list), same
        # tokenization + per-doc distinct; top-20 by doc count
        "top_boilerplate_spans": """
            WITH toks AS (
                SELECT doc_id, list_filter(
                    string_split_regex(lower(trim(text)),
                                       '[^\\p{L}\\p{N}'']+'),
                    x -> x <> '') AS t
                FROM documents),
            spans AS (
                SELECT doc_id, UNNEST(list_distinct(
                    CASE WHEN len(t) >= 8 THEN
                        list_transform(range(1, len(t) - 8 + 2),
                            i -> array_to_string(list_slice(t, i, i + 7), ' '))
                    ELSE [] END)) AS span
                FROM toks)
            SELECT span, COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
            FROM spans GROUP BY span HAVING COUNT(*) >= 2
            ORDER BY n_docs DESC, span LIMIT 20
        """,
        # dsir_weights' ratio model + per-source row_number top-5
        "dsir_resample": """
            WITH rawd AS (
                SELECT doc_id, source, text FROM documents
                WHERE lang = 'en'),
            tgtd AS (
                SELECT doc_id, text FROM documents WHERE lang <> 'en'),
            rtok AS (
                SELECT doc_id,
                       CAST(('0x' || substr(md5(UNNEST(list_filter(
                           string_split_regex(lower(trim(text)),
                                              '[^\\p{L}\\p{N}'']+'),
                           x -> x <> ''))), 1, 13)) AS BIGINT) % 256 AS b
                FROM rawd),
            ttok AS (
                SELECT CAST(('0x' || substr(md5(UNNEST(list_filter(
                           string_split_regex(lower(trim(text)),
                                              '[^\\p{L}\\p{N}'']+'),
                           x -> x <> ''))), 1, 13)) AS BIGINT) % 256 AS b
                FROM tgtd),
            tc AS (SELECT b, COUNT(*) AS tc FROM ttok GROUP BY b),
            sc AS (SELECT b, COUNT(*) AS sc FROM rtok GROUP BY b),
            counts AS (
                SELECT COALESCE(tc.b, sc.b) AS b,
                       COALESCE(tc, 0) AS tc, COALESCE(sc, 0) AS sc
                FROM tc FULL OUTER JOIN sc ON tc.b = sc.b),
            tot AS (SELECT SUM(tc) AS tt, SUM(sc) AS st FROM counts),
            ratio AS (
                SELECT b, ln((tc + 1) / (tt + 256.0))
                          - ln((sc + 1) / (st + 256.0)) AS lr
                FROM counts CROSS JOIN tot),
            per_doc AS (
                SELECT doc_id, SUM(lr) AS logw
                FROM rtok JOIN ratio USING (b) GROUP BY doc_id),
            scored AS (
                SELECT r.source, r.doc_id,
                       COALESCE(p.logw, 0.0) AS logw
                FROM rawd r LEFT JOIN per_doc p USING (doc_id)),
            ranked AS (
                SELECT source, doc_id, logw,
                       ROW_NUMBER() OVER (
                           PARTITION BY source
                           ORDER BY round(logw, 6) DESC, doc_id) AS rk
                FROM scored)
            SELECT source, CAST(rk AS INT) AS rk, doc_id, logw
            FROM ranked WHERE rk <= 5 ORDER BY source, rk
        """,
        # same header injection + tokenization + md5 span keys; covered
        # positions anti-joined, text reassembled by ordered string_agg
        "strip_spans": """
            WITH aug AS (
                SELECT doc_id,
                    ['please subscribe to our newsletter for daily updates',
                     'copyright notice all rights reserved by example corp',
                     'click here to accept all cookies and continue']
                        [CAST(doc_id % 3 AS INT) + 1]
                    || ' ' || text AS text
                FROM documents),
            toks AS (
                SELECT doc_id, list_filter(
                    string_split_regex(lower(trim(text)),
                                       '[^\\p{L}\\p{N}'']+'),
                    x -> x <> '') AS t
                FROM aug),
            pos0 AS (
                SELECT doc_id, UNNEST(range(1, len(t) + 1)) AS i, t
                FROM toks),
            pos AS (
                SELECT doc_id, i - 1 AS p, t[i] AS tok FROM pos0),
            sp0 AS (
                SELECT doc_id,
                       UNNEST(CASE WHEN len(t) >= 8
                              THEN range(1, len(t) - 8 + 2)
                              ELSE [] END) AS i,
                       t
                FROM toks),
            spans AS (
                SELECT doc_id, i - 1 AS p,
                       CAST(('0x' || substr(md5(
                           array_to_string(list_slice(t, i, i + 7), ' ')
                       ), 1, 13)) AS BIGINT) AS k
                FROM sp0),
            shared AS (
                SELECT k FROM (SELECT DISTINCT doc_id, k FROM spans)
                GROUP BY k HAVING COUNT(*) >= 2),
            cov0 AS (
                SELECT doc_id, UNNEST(range(p, p + 8)) AS cp
                FROM spans WHERE k IN (SELECT k FROM shared)),
            covered AS (SELECT DISTINCT doc_id, cp FROM cov0),
            kept AS (
                SELECT pos.doc_id, pos.p, pos.tok
                FROM pos LEFT JOIN covered
                  ON pos.doc_id = covered.doc_id AND pos.p = covered.cp
                WHERE covered.cp IS NULL),
            reb AS (
                SELECT doc_id,
                       string_agg(tok, ' ' ORDER BY p) AS clean_text,
                       COUNT(*) AS nkept
                FROM kept GROUP BY doc_id),
            spine AS (SELECT doc_id, len(t) AS ntok FROM toks)
            SELECT s.doc_id,
                   COALESCE(r.clean_text, '') AS clean_text,
                   CAST(s.ntok - COALESCE(r.nkept, 0) AS BIGINT)
                       AS n_tokens_removed
            FROM spine s LEFT JOIN reb r USING (doc_id)
            ORDER BY s.doc_id
        """,
        # same md5 hash buckets, add-1 smoothing, ln ratio sum per doc
        "dsir_weights": """
            WITH rawd AS (
                SELECT doc_id, text FROM documents WHERE lang = 'en'),
            tgtd AS (
                SELECT doc_id, text FROM documents WHERE lang <> 'en'),
            rtok AS (
                SELECT doc_id,
                       CAST(('0x' || substr(md5(UNNEST(list_filter(
                           string_split_regex(lower(trim(text)),
                                              '[^\\p{L}\\p{N}'']+'),
                           x -> x <> ''))), 1, 13)) AS BIGINT) % 256 AS b
                FROM rawd),
            ttok AS (
                SELECT CAST(('0x' || substr(md5(UNNEST(list_filter(
                           string_split_regex(lower(trim(text)),
                                              '[^\\p{L}\\p{N}'']+'),
                           x -> x <> ''))), 1, 13)) AS BIGINT) % 256 AS b
                FROM tgtd),
            tc AS (SELECT b, COUNT(*) AS tc FROM ttok GROUP BY b),
            sc AS (SELECT b, COUNT(*) AS sc FROM rtok GROUP BY b),
            counts AS (
                SELECT COALESCE(tc.b, sc.b) AS b,
                       COALESCE(tc, 0) AS tc, COALESCE(sc, 0) AS sc
                FROM tc FULL OUTER JOIN sc ON tc.b = sc.b),
            tot AS (SELECT SUM(tc) AS tt, SUM(sc) AS st FROM counts),
            ratio AS (
                SELECT b, ln((tc + 1) / (tt + 256.0))
                          - ln((sc + 1) / (st + 256.0)) AS lr
                FROM counts CROSS JOIN tot),
            per_doc AS (
                SELECT doc_id, SUM(lr) AS logw
                FROM rtok JOIN ratio USING (b) GROUP BY doc_id)
            SELECT r.doc_id, COALESCE(p.logw, 0.0) AS logw
            FROM rawd r LEFT JOIN per_doc p USING (doc_id)
            ORDER BY r.doc_id
        """,
        # same boilerplate injection; lines in > 4 distinct docs removed
        "line_dedup": """
            WITH aug AS (
                SELECT doc_id,
                    ['subscribe to our newsletter','accept all cookies',
                     'copyright 2026 example corp','all rights reserved']
                        [CAST(doc_id % 4 AS INT) + 1]
                    || chr(10) || text || chr(10) ||
                    ['home about contact','follow us on social',
                     'terms of service apply'][CAST(doc_id % 3 AS INT) + 1]
                    AS t
                FROM documents),
            ls AS (SELECT doc_id, string_split(t, chr(10)) AS l FROM aug),
            lines AS (
                SELECT doc_id,
                       UNNEST([{'pos': i, 'line': l[i]}
                               FOR i IN range(1, len(l) + 1)],
                              recursive := true)
                FROM ls),
            common AS (
                SELECT line FROM lines
                GROUP BY line HAVING COUNT(DISTINCT doc_id) > 4),
            kept AS (
                SELECT * FROM lines
                WHERE line NOT IN (SELECT line FROM common)),
            rebuilt AS (
                SELECT doc_id,
                       string_agg(line, chr(10) ORDER BY pos) AS clean_text
                FROM kept GROUP BY doc_id)
            SELECT d.doc_id, COALESCE(r.clean_text, '') AS clean_text
            FROM documents d LEFT JOIN rebuilt r USING (doc_id)
            ORDER BY d.doc_id
        """,
        # MERGE INTO fold: latest change per key wins (the seq-1 decoy
        # delete on % 97 keys must lose to the seq-2 update)
        "cdc_upsert": """
            WITH base AS (
                SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
                FROM orders),
            upd AS (
                SELECT o_orderkey, o_custkey, o_orderstatus,
                       o_totalprice + 1000.0 AS o_totalprice
                FROM base WHERE o_orderkey % 97 = 0),
            del_keys AS (
                SELECT o_orderkey FROM base
                WHERE o_orderkey % 101 = 0 AND o_orderkey % 97 <> 0),
            ins AS (
                SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey,
                       o_orderstatus, o_totalprice
                FROM base WHERE o_orderkey % 103 = 0),
            touched AS (
                SELECT o_orderkey FROM upd
                UNION SELECT o_orderkey FROM del_keys
                UNION SELECT o_orderkey FROM ins),
            merged AS (
                SELECT * FROM base
                WHERE o_orderkey NOT IN (SELECT o_orderkey FROM touched)
                UNION ALL SELECT * FROM upd
                UNION ALL SELECT * FROM ins)
            SELECT o_orderkey, o_custkey, o_orderstatus,
                   ROUND(o_totalprice, 6) AS price
            FROM merged ORDER BY o_orderkey
        """,
        # bigram stupid-backoff fit on the even half, scored over all docs
        "lm_score": """
            WITH toks AS (
                SELECT doc_id, list_filter(
                    string_split_regex(lower(trim(text)), '[^\\p{L}\\p{N}'']+'),
                    x -> x <> '') AS t
                FROM documents),
            fit AS (SELECT * FROM toks WHERE doc_id % 2 = 0),
            fit_uni AS (SELECT UNNEST(t) AS w FROM fit),
            c1 AS (SELECT w, COUNT(*) AS c1 FROM fit_uni GROUP BY w),
            n AS (SELECT COUNT(*) AS n FROM fit_uni),
            fit_bi AS (
                SELECT UNNEST([{'w1': t[i], 'w2': t[i+1]}
                               FOR i IN range(1, len(t))],
                              recursive := true)
                FROM fit),
            c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM fit_bi GROUP BY 1, 2),
            doc_bi AS (
                SELECT doc_id,
                       UNNEST([{'w1': t[i], 'w2': t[i+1]}
                               FOR i IN range(1, len(t))],
                              recursive := true)
                FROM toks),
            scored AS (
                SELECT doc_id,
                       CASE WHEN c2.c2 IS NOT NULL
                            THEN ln(c2.c2 * 1.0 / c1a.c1)
                            ELSE ln(0.4 * COALESCE(c1b.c1, 1.0) / n.n)
                       END AS lp
                FROM doc_bi
                LEFT JOIN c2 ON c2.w1 = doc_bi.w1 AND c2.w2 = doc_bi.w2
                LEFT JOIN c1 c1a ON c1a.w = doc_bi.w1
                LEFT JOIN c1 c1b ON c1b.w = doc_bi.w2
                CROSS JOIN n),
            agg AS (
                SELECT doc_id, COUNT(*) AS n_bigrams,
                       ROUND(AVG(lp), 6) AS lm_score
                FROM scored GROUP BY doc_id)
            SELECT d.doc_id, COALESCE(a.n_bigrams, 0) AS n_bigrams,
                   a.lm_score
            FROM documents d LEFT JOIN agg a USING (doc_id)
            ORDER BY d.doc_id
        """,
        # same injections; every rule and the conjunction re-derived
        "gopher_rules": """
            WITH aug AS (
                SELECT doc_id,
                    CASE WHEN doc_id % 11 = 0
                         THEN '- bullet item' || chr(10)
                              || '- second bullet' || chr(10)
                         ELSE '' END
                    || text
                    || CASE WHEN doc_id % 7 = 0
                            THEN ' # # # # # # # #' ELSE '' END
                    || CASE WHEN doc_id % 13 = 0
                            THEN chr(10) || 'to be continued...'
                            ELSE '' END
                    || CASE WHEN doc_id % 17 = 0
                            THEN repeat(' 123456789012345678901234567890', 40)
                            ELSE '' END AS t
                FROM documents),
            feat AS (
                SELECT doc_id, t,
                    list_filter(string_split_regex(lower(trim(t)),
                        '[^\\p{L}\\p{N}'']+'), x -> x <> '') AS tk,
                    string_split(t, chr(10)) AS ls
                FROM aug),
            sig AS (
                SELECT doc_id,
                    len(tk) AS n_words,
                    list_sum(list_transform(tk, x -> length(x))) * 1.0
                        / GREATEST(len(tk), 1) AS mean_word_len,
                    ((length(t) - length(replace(t, '#', ''))) +
                     (length(t) - length(replace(t, '...', ''))) / 3 +
                     (length(t) - length(replace(t, chr(8230), ''))))
                        * 1.0 / GREATEST(len(tk), 1) AS symbol_ratio,
                    len(list_filter(ls, l ->
                        starts_with(trim(l), '-') OR starts_with(trim(l), '*')
                        OR starts_with(trim(l), chr(8226)))) * 1.0
                        / GREATEST(len(ls), 1) AS bullet_frac,
                    len(list_filter(ls, l ->
                        ends_with(rtrim(l), '...')
                        OR ends_with(rtrim(l), chr(8230)))) * 1.0
                        / GREATEST(len(ls), 1) AS ellipsis_frac,
                    len(list_filter(tk, x -> regexp_matches(x, '\\p{L}')))
                        * 1.0 / GREATEST(len(tk), 1) AS alpha_ratio,
                    len(list_intersect(list_distinct(tk),
                        ['the','of','and','a','to','in','is','you','that',
                         'it','he','was','for','on','are','as','with','his',
                         'they','i'])) AS stop_hits
                FROM feat),
            rules AS (
                SELECT doc_id, n_words,
                    ROUND(mean_word_len, 6) AS mean_word_len,
                    ROUND(symbol_ratio, 6) AS symbol_ratio,
                    ROUND(bullet_frac, 6) AS bullet_frac,
                    ROUND(ellipsis_frac, 6) AS ellipsis_frac,
                    ROUND(alpha_ratio, 6) AS alpha_ratio,
                    stop_hits,
                    n_words >= 50 AND n_words <= 100000 AS ok_words,
                    mean_word_len >= 3.0 AND mean_word_len <= 10.0
                        AS ok_mean_len,
                    symbol_ratio <= 0.1 AS ok_symbol,
                    bullet_frac <= 0.5 AS ok_bullet,
                    ellipsis_frac <= 0.1 AS ok_ellipsis,
                    alpha_ratio >= 0.8 AS ok_alpha,
                    stop_hits >= 2 AS ok_stop
                FROM sig)
            SELECT doc_id, CAST(n_words AS INT) AS n_words, mean_word_len,
                   symbol_ratio, bullet_frac, ellipsis_frac, alpha_ratio,
                   CAST(stop_hits AS INT) AS stop_hits,
                   ok_words, ok_mean_len, ok_symbol, ok_bullet, ok_ellipsis,
                   ok_alpha, ok_stop,
                   ok_words AND ok_mean_len AND ok_symbol AND ok_bullet
                       AND ok_ellipsis AND ok_alpha AND ok_stop AS passes
            FROM rules ORDER BY doc_id
        """,
        "order_gaps": """
            WITH g AS (
                SELECT date_diff('day',
                                 LAG(o_orderdate) OVER (
                                     PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey),
                                 o_orderdate) AS gap
                FROM orders)
            SELECT COUNT(*) AS n_gaps,
                   ROUND(AVG(gap), 6) AS mean_days,
                   ROUND(quantile_cont(gap, 0.5), 6) AS median_days
            FROM g WHERE gap IS NOT NULL
        """,
        # same winnowing fingerprint as doc_fingerprint, per-source rollup
        "dup_rate_by_source": """
            WITH toks AS (
                SELECT doc_id, source, list_filter(
                    string_split_regex(lower(trim(text)), '[^\\p{L}\\p{N}'']+'),
                    x -> x <> '') AS t
                FROM documents),
            fps AS (
                SELECT doc_id, source,
                    CASE WHEN len(t) >= 8 THEN
                        list_min([md5(array_to_string(t[i:i+7], ' '))
                                  for i in range(1, len(t) - 6)])
                    ELSE md5(array_to_string(t, ' ')) END AS fp
                FROM toks),
            fpn AS (SELECT fp, COUNT(*) AS nfp FROM fps GROUP BY fp)
            SELECT source, COUNT(*) AS n_docs,
                   CAST(SUM(CAST(nfp > 1 AS BIGINT)) AS BIGINT) AS n_dup,
                   ROUND(SUM(CAST(nfp > 1 AS BIGINT)) * 1.0 / COUNT(*), 6)
                       AS dup_rate
            FROM fps JOIN fpn USING (fp)
            GROUP BY source ORDER BY source
        """,
        "zipf_curve": """
            WITH freq AS (
                SELECT tok, COUNT(*) AS f FROM (
                    SELECT UNNEST(list_filter(
                        string_split_regex(lower(trim(text)),
                                           '[^\\p{L}\\p{N}'']+'),
                        x -> x <> '')) AS tok
                    FROM documents)
                GROUP BY tok ORDER BY f DESC, tok LIMIT 100),
            ranked AS (
                SELECT ln(CAST(ROW_NUMBER() OVER (ORDER BY f DESC, tok)
                               AS DOUBLE)) AS lr,
                       ln(CAST(f AS DOUBLE)) AS lf
                FROM freq)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
                   ROUND(regr_slope(lf, lr), 6) AS slope,
                   ROUND(regr_r2(lf, lr), 6) AS r2
            FROM ranked
        """,
        "cusum_drift": """
            WITH m AS (
                SELECT event_type, AVG(value) AS mu
                FROM events GROUP BY event_type),
            c AS (
                SELECT e.event_type, e.event_id,
                       ABS(SUM(e.value - m.mu) OVER (
                           PARTITION BY e.event_type
                           ORDER BY e.ts, e.event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       )) AS abs_cusum
                FROM events e JOIN m USING (event_type)),
            r AS (
                SELECT event_type, event_id, abs_cusum,
                       ROW_NUMBER() OVER (
                           PARTITION BY event_type
                           ORDER BY abs_cusum DESC, event_id) AS rk
                FROM c)
            SELECT event_type, ROUND(abs_cusum, 6) AS max_abs_cusum,
                   event_id AS at_event
            FROM r WHERE rk = 1 ORDER BY event_type
        """,
        # first-occurrence reduction replaces cumulative distinct
        "vocab_growth": """
            WITH toks AS (
                SELECT doc_id, UNNEST(list_filter(
                    string_split_regex(lower(trim(text)), '[^\\p{L}\\p{N}'']+'),
                    x -> x <> '')) AS tok
                FROM documents),
            first AS (
                SELECT tok, MIN(doc_id) AS first_doc
                FROM toks GROUP BY tok),
            th AS (SELECT i * 100 AS n_docs FROM range(1, 6) t(i))
            SELECT n_docs, COUNT(*) AS vocab
            FROM first CROSS JOIN th
            WHERE first_doc < n_docs
            GROUP BY n_docs ORDER BY n_docs
        """,
        "twoway_effects": """
            WITH cell AS (
                SELECT l_returnflag, l_linestatus,
                       AVG(l_extendedprice) AS cm, COUNT(*) AS n
                FROM lineitem GROUP BY 1, 2),
            rm AS (SELECT l_returnflag, AVG(l_extendedprice) AS rm
                   FROM lineitem GROUP BY 1),
            colm AS (SELECT l_linestatus, AVG(l_extendedprice) AS colm
                     FROM lineitem GROUP BY 1),
            gm AS (SELECT AVG(l_extendedprice) AS gm FROM lineitem)
            SELECT l_returnflag, l_linestatus, n,
                   ROUND(cm, 6) AS cell_mean,
                   ROUND(rm.rm - gm.gm, 6) AS row_effect,
                   ROUND(colm.colm - gm.gm, 6) AS col_effect,
                   ROUND(cm - rm.rm - colm.colm + gm.gm, 6) AS interaction
            FROM cell
            JOIN rm USING (l_returnflag)
            JOIN colm USING (l_linestatus)
            CROSS JOIN gm
            ORDER BY l_returnflag, l_linestatus
        """,
        "value_autocorr": """
            WITH p AS (
                SELECT event_type, value,
                       LAG(value) OVER (
                           PARTITION BY event_type ORDER BY ts, event_id
                       ) AS prev
                FROM events)
            SELECT event_type, COUNT(*) AS n,
                   ROUND(corr(value, prev), 6) AS acf1
            FROM p WHERE prev IS NOT NULL
            GROUP BY event_type ORDER BY event_type
        """,
        "interarrival_stats": """
            WITH g AS (
                SELECT event_type,
                       CAST(FLOOR(epoch(ts)) AS BIGINT)
                       - LAG(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER (
                           PARTITION BY event_type ORDER BY ts, event_id
                       ) AS gap
                FROM events)
            SELECT event_type, COUNT(*) AS n_gaps,
                   ROUND(AVG(gap), 6) AS mean_s,
                   ROUND(STDDEV_SAMP(gap), 6) AS std_s,
                   ROUND(quantile_cont(gap, 0.9), 6) AS p90_s
            FROM g WHERE gap IS NOT NULL
            GROUP BY event_type ORDER BY event_type
        """,
        # same quintile codes, same deterministic tie-breaks
        "rfm_segments": """
            WITH per AS (
                SELECT o_custkey, MAX(o_orderdate) AS last_d,
                       COUNT(*) AS freq, SUM(o_totalprice) AS money
                FROM orders GROUP BY o_custkey),
            rec AS (
                SELECT o_custkey, freq, money,
                       date_diff('day', last_d,
                                 (SELECT MAX(last_d) FROM per)) AS recency
                FROM per),
            scored AS (
                SELECT CAST(
                       NTILE(5) OVER (ORDER BY recency ASC, o_custkey) * 100
                       + NTILE(5) OVER (ORDER BY freq DESC, o_custkey) * 10
                       + NTILE(5) OVER (ORDER BY money DESC, o_custkey)
                       AS BIGINT) AS segment
                FROM rec)
            SELECT segment, COUNT(*) AS n_customers
            FROM scored GROUP BY segment ORDER BY segment
        """,
        "brand_hhi": """
            WITH rev AS (
                SELECT substr(p_type, 1, 8) AS ptype, p_brand,
                       SUM(l_extendedprice * (1 - l_discount)) AS rev
                FROM lineitem JOIN part ON l_partkey = p_partkey
                GROUP BY 1, 2),
            share AS (
                SELECT ptype,
                       rev / SUM(rev) OVER (PARTITION BY ptype) AS s
                FROM rev)
            SELECT ptype, COUNT(*) AS n_brands,
                   ROUND(SUM(s * s), 6) AS hhi
            FROM share GROUP BY ptype ORDER BY ptype
        """,
        "group_mode": """
            WITH counts AS (
                SELECT l_returnflag, l_quantity, COUNT(*) AS n
                FROM lineitem GROUP BY 1, 2),
            ranked AS (
                SELECT l_returnflag, l_quantity, n,
                       ROW_NUMBER() OVER (
                           PARTITION BY l_returnflag
                           ORDER BY n DESC, l_quantity) AS rk
                FROM counts)
            SELECT l_returnflag, ROUND(l_quantity, 6) AS mode_qty, n
            FROM ranked WHERE rk = 1 ORDER BY l_returnflag
        """,
        "activity_heatmap": """
            SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
                   CAST(hour(ts) AS BIGINT) AS hr,
                   COUNT(*) AS n, ROUND(SUM(value), 6) AS v
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # same crosstab + marginals + closed-form statistic
        "chi_square_test": """
            WITH obs AS (
                SELECT o_orderpriority, o_orderstatus, COUNT(*) AS obs
                FROM orders GROUP BY 1, 2),
            rt AS (SELECT o_orderpriority, SUM(obs) AS rt
                   FROM obs GROUP BY 1),
            ct AS (SELECT o_orderstatus, SUM(obs) AS ct
                   FROM obs GROUP BY 1),
            nn AS (SELECT SUM(obs) AS nn FROM obs),
            cells AS (
                SELECT POWER(obs - rt.rt * ct.ct / nn.nn, 2)
                       / (rt.rt * ct.ct / nn.nn) AS cell
                FROM obs
                JOIN rt USING (o_orderpriority)
                JOIN ct USING (o_orderstatus)
                CROSS JOIN nn)
            SELECT ROUND(SUM(cell), 6) AS chi2,
                   CAST(8 AS BIGINT) AS dof
            FROM cells
        """,
        # same p*log2(p) fold over distinct tokens
        "token_entropy": """
            WITH toks AS (
                SELECT doc_id, list_filter(
                    string_split_regex(lower(trim(text)), '[^\\p{L}\\p{N}'']+'),
                    x -> x <> '') AS t
                FROM documents),
            e AS (
                SELECT doc_id, len(t) AS n_tokens,
                       -list_sum(list_transform(list_distinct(t),
                           u -> (len(list_filter(t, x -> x = u)) * 1.0
                                 / len(t))
                                * log2(len(list_filter(t, x -> x = u)) * 1.0
                                       / len(t)))) AS ent
                FROM toks WHERE len(t) > 0)
            SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                   ROUND(ent, 6) AS entropy
            FROM e ORDER BY doc_id
        """,
        # same cumsum over the part-aggregated series, same cuts
        "abc_classes": """
            WITH per_part AS (
                SELECT l_partkey,
                       SUM(l_extendedprice * (1 - l_discount)) AS rev
                FROM lineitem GROUP BY l_partkey),
            ranked AS (
                SELECT rev,
                       ROUND(SUM(rev) OVER (
                           ORDER BY rev DESC, l_partkey
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       / (SELECT SUM(rev) FROM per_part), 9) AS cum_share
                FROM per_part)
            SELECT CASE WHEN cum_share <= 0.80 THEN 'A'
                        WHEN cum_share <= 0.95 THEN 'B'
                        ELSE 'C' END AS abc,
                   COUNT(*) AS n_parts,
                   ROUND(SUM(rev), 6) AS class_rev
            FROM ranked GROUP BY 1 ORDER BY 1
        """,
        "repeat_purchase_curve": """
            WITH seq AS (
                SELECT CAST(ROW_NUMBER() OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey) AS BIGINT)
                           AS order_seq,
                       o_totalprice
                FROM orders)
            SELECT order_seq, COUNT(*) AS n_orders,
                   ROUND(AVG(o_totalprice), 6) AS avg_value
            FROM seq WHERE order_seq <= 10
            GROUP BY order_seq ORDER BY order_seq
        """,
        # lag over the aggregated month series, never the fact scan
        "monthly_trend": """
            WITH monthly AS (
                SELECT strftime(date_trunc('month', o_orderdate),
                                '%Y-%m-%d') AS month,
                       ROUND(SUM(o_totalprice), 6) AS rev
                FROM orders GROUP BY 1)
            SELECT month, rev,
                   ROUND(rev - LAG(rev, 1) OVER (ORDER BY month), 6) AS mom,
                   ROUND(rev - LAG(rev, 12) OVER (ORDER BY month), 6) AS yoy
            FROM monthly ORDER BY month
        """,
        # identical closed-form Wilson bound, same z constant
        "supplier_reliability": """
            WITH agg AS (
                SELECT l_suppkey, COUNT(*) AS n,
                       CAST(SUM(CAST(
                           date_diff('day', o_orderdate, l_shipdate) <= 30
                           AS BIGINT)) AS BIGINT) AS on_time
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                GROUP BY l_suppkey),
            sc AS (
                SELECT l_suppkey, n, on_time,
                       on_time * 1.0 / n AS p,
                       1.959963984540054 AS z
                FROM agg)
            SELECT l_suppkey, n, on_time,
                   ROUND(p, 6) AS rate,
                   ROUND((p + z*z/(2*n)
                          - z * SQRT((p*(1-p) + z*z/(4*n)) / n))
                         / (1 + z*z/n), 6) AS wilson_lb
            FROM sc
            ORDER BY wilson_lb DESC, l_suppkey LIMIT 20
        """,
        "cross_source_dups": """
            WITH m AS (
                SELECT doc_id, source, text FROM documents
                UNION ALL
                SELECT doc_id + 100000, 'mirror-' || source, text
                FROM documents WHERE doc_id % 50 = 0),
            d AS (
                SELECT doc_id, source, md5(lower(trim(text))) AS h
                FROM m)
            SELECT LEAST(a.source, b.source) AS src_a,
                   GREATEST(a.source, b.source) AS src_b,
                   COUNT(*) AS n_dup_pairs
            FROM d a JOIN d b
              ON a.h = b.h AND a.doc_id < b.doc_id
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # identical centroid + cosine algebra on (label, dim) rows
        "label_coherence": """
            WITH dims AS (
                SELECT vec_id, label, i - 1 AS i,
                       CAST(embedding[i] AS DOUBLE) AS x
                FROM embeddings, range(1, 65) r(i)),
            cent AS (
                SELECT label, i, AVG(x) AS c FROM dims GROUP BY 1, 2),
            per_vec AS (
                SELECT d.vec_id, d.label,
                       SUM(d.x * c.c)
                       / (SQRT(SUM(d.x * d.x)) * SQRT(SUM(c.c * c.c)))
                           AS cos
                FROM dims d JOIN cent c ON d.label = c.label AND d.i = c.i
                GROUP BY 1, 2)
            SELECT label, COUNT(*) AS n_vecs,
                   ROUND(AVG(cos), 6) AS avg_coherence
            FROM per_vec GROUP BY label ORDER BY label
        """,
        "event_transitions": """
            WITH pairs AS (
                SELECT LAG(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS prev,
                       event_type
                FROM events),
            c AS (
                SELECT prev, event_type, COUNT(*) AS n
                FROM pairs WHERE prev IS NOT NULL
                GROUP BY 1, 2)
            SELECT prev, event_type, n,
                   ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY prev), 6) AS p
            FROM c ORDER BY prev, event_type
        """,
        # same 30-min gap sessionization then session-level aggs
        "session_stats": """
            WITH t AS (
                SELECT user_id,
                       CAST(FLOOR(epoch(ts)) AS BIGINT) AS t,
                       ts, event_id
                FROM events),
            g AS (
                SELECT user_id, t, ts, event_id,
                       CASE WHEN t - LAG(t) OVER w IS NULL
                                 OR t - LAG(t) OVER w > 1800
                            THEN 1 ELSE 0 END AS new_s
                FROM t
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (
                SELECT user_id, t,
                       SUM(new_s) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS s_id
                FROM g),
            per AS (
                SELECT user_id, s_id, COUNT(*) AS n_ev,
                       MAX(t) - MIN(t) AS dur
                FROM s GROUP BY 1, 2)
            SELECT COUNT(*) AS n_sessions,
                   ROUND(AVG(n_ev), 6) AS avg_events,
                   ROUND(quantile_cont(n_ev, 0.5), 6) AS median_events,
                   ROUND(AVG(dur), 6) AS avg_dur_s
            FROM per
        """,
        "funnel_latency": """
            WITH v AS (
                SELECT user_id,
                       MIN(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS t_view
                FROM events WHERE event_type = 'view' GROUP BY user_id),
            b AS (
                SELECT user_id,
                       MIN(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS t_buy
                FROM events WHERE event_type = 'purchase' GROUP BY user_id),
            lat AS (
                SELECT t_buy - t_view AS lat
                FROM v JOIN b USING (user_id) WHERE t_buy >= t_view)
            SELECT COUNT(*) AS n_converted,
                   ROUND(AVG(lat), 6) AS avg_s,
                   ROUND(quantile_cont(lat, 0.5), 6) AS median_s
            FROM lat
        """,
        # same deciles (NTILE over spend desc, custkey tie-break)
        "revenue_concentration": """
            WITH spend AS (
                SELECT o_custkey, SUM(o_totalprice) AS s
                FROM orders GROUP BY o_custkey),
            ranked AS (
                SELECT s,
                       CAST(NTILE(10) OVER (ORDER BY s DESC, o_custkey)
                            AS BIGINT) AS decile,
                       SUM(s) OVER () AS tot
                FROM spend)
            SELECT decile, COUNT(*) AS n_customers,
                   ROUND(SUM(s) / ANY_VALUE(tot), 6) AS rev_share
            FROM ranked GROUP BY decile ORDER BY decile
        """,
        # same lead/cap weighting on truncated epoch seconds
        "twap_hourly": """
            WITH b AS (
                SELECT event_type,
                       CAST(FLOOR(epoch(date_trunc('hour', ts))) AS BIGINT) AS h,
                       value,
                       LEAST(
                           COALESCE(
                               LEAD(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER (
                                   PARTITION BY event_type
                                   ORDER BY ts, event_id),
                               CAST(FLOOR(epoch(date_trunc('hour', ts))) AS BIGINT)
                                   + 3600),
                           CAST(FLOOR(epoch(date_trunc('hour', ts))) AS BIGINT)
                               + 3600)
                       - CAST(FLOOR(epoch(ts)) AS BIGINT) AS w
                FROM events)
            SELECT event_type, h,
                   ROUND(SUM(value * w) / SUM(w), 6) AS twap,
                   COUNT(*) AS n
            FROM b WHERE w > 0 AND h < 1704153600
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # one UNION ALL row per column, same string casts
        "table_profile": """
            SELECT * FROM (
                SELECT 'o_orderkey' AS "column", COUNT(*) AS n,
                       CAST(SUM(CAST(o_orderkey IS NULL AS BIGINT)) AS BIGINT)
                           AS nulls,
                       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT)
                           AS n_distinct,
                       MIN(CAST(o_orderkey AS VARCHAR)) AS min_s,
                       MAX(CAST(o_orderkey AS VARCHAR)) AS max_s
                FROM orders
                UNION ALL
                SELECT 'o_custkey', COUNT(*),
                       CAST(SUM(CAST(o_custkey IS NULL AS BIGINT)) AS BIGINT),
                       CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
                       MIN(CAST(o_custkey AS VARCHAR)),
                       MAX(CAST(o_custkey AS VARCHAR))
                FROM orders
                UNION ALL
                SELECT 'o_totalprice', COUNT(*),
                       CAST(SUM(CAST(o_totalprice IS NULL AS BIGINT))
                            AS BIGINT),
                       CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
                       MIN(CAST(o_totalprice AS VARCHAR)),
                       MAX(CAST(o_totalprice AS VARCHAR))
                FROM orders
                UNION ALL
                SELECT 'o_orderstatus', COUNT(*),
                       CAST(SUM(CAST(o_orderstatus IS NULL AS BIGINT))
                            AS BIGINT),
                       CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
                       MIN(o_orderstatus), MAX(o_orderstatus)
                FROM orders
            ) ORDER BY "column"
        """,
        # planted churn re-derived as direct SQL op rows
        "snapshot_diff": """
            WITH base AS (
                SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders)
            SELECT * FROM (
                SELECT o_orderkey, 'U' AS op, o_orderstatus,
                       ROUND(o_totalprice + 1000.0, 6) AS price
                FROM base WHERE o_orderkey % 97 = 0
                UNION ALL
                SELECT o_orderkey, 'D', o_orderstatus,
                       ROUND(o_totalprice, 6)
                FROM base
                WHERE o_orderkey % 101 = 0 AND o_orderkey % 97 <> 0
                UNION ALL
                SELECT o_orderkey + 10000000, 'I', o_orderstatus,
                       ROUND(o_totalprice, 6)
                FROM base WHERE o_orderkey % 103 = 0
            ) ORDER BY o_orderkey
        """,
        # LOO mean + additive smoothing replayed with the same windows
        "target_encoding": """
            WITH g AS (
                SELECT o_orderkey, o_orderpriority,
                       CAST(o_totalprice > 150000.0 AS DOUBLE) AS y
                FROM orders),
            s AS (
                SELECT o_orderkey, o_orderpriority, y,
                       SUM(y) OVER (PARTITION BY o_orderpriority) AS gs,
                       COUNT(y) OVER (PARTITION BY o_orderpriority) AS gc,
                       SUM(y) OVER () / COUNT(y) OVER () AS gm
                FROM g)
            SELECT o_orderkey, o_orderpriority,
                   ROUND((gs - y + 10.0 * gm) / (gc - 1 + 10.0), 6) AS te
            FROM s WHERE o_orderkey < 3000 ORDER BY o_orderkey
        """,
        "quantile_normalize": """
            SELECT event_type, event_id,
                   ROUND(PERCENT_RANK() OVER (
                       PARTITION BY event_type
                       ORDER BY value, event_id), 6) AS q
            FROM events WHERE user_id < 300
            ORDER BY event_type, event_id
        """,
        # same 21-row trailing frame; DuckDB medians the frame list
        "rolling_median": """
            WITH f AS (
                SELECT event_type, event_id,
                       list_sort(list(value) OVER (
                           PARTITION BY event_type ORDER BY ts, event_id
                           ROWS BETWEEN 20 PRECEDING AND CURRENT ROW)) AS l
                FROM events WHERE user_id < 200)
            SELECT event_type, event_id,
                   ROUND(CASE WHEN len(l) % 2 = 1
                              THEN l[(len(l) + 1) // 2]
                              ELSE (l[len(l) // 2] + l[len(l) // 2 + 1]) / 2.0
                         END, 6) AS rmed
            FROM f ORDER BY event_type, event_id
        """,
        # both engines truncate weeks to Monday
        "retention_cohorts": """
            WITH e AS (
                SELECT user_id, date_trunc('week', ts) AS wk FROM events),
            first AS (
                SELECT user_id, MIN(wk) AS cohort FROM e GROUP BY user_id)
            SELECT strftime(cohort, '%Y-%m-%d') AS cohort,
                   CAST(FLOOR(date_diff('day', cohort, wk) / 7.0) AS BIGINT)
                       AS week_n,
                   CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS active_users
            FROM e JOIN first ON e.user_id = first.user_id
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # trailing 50-row frame, same leakage-free bounds
        "anomaly_flags": """
            WITH s AS (
                SELECT event_type, event_id, value,
                       AVG(value) OVER w AS mu,
                       STDDEV_SAMP(value) OVER w AS sd,
                       COUNT(value) OVER w AS n
                FROM events
                WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                             ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING))
            SELECT event_type, event_id, ROUND(value, 6) AS value,
                   ROUND(mu, 6) AS mu
            FROM s
            WHERE ABS(value - mu) > 3 * sd AND n >= 20
            ORDER BY event_type, event_id
        """,
        "first_touch": """
            WITH ranked AS (
                SELECT user_id, event_type,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS rn
                FROM events),
            first AS (
                SELECT user_id, event_type AS channel
                FROM ranked WHERE rn = 1)
            SELECT channel, COUNT(*) AS purchases,
                   ROUND(SUM(e.value), 6) AS revenue
            FROM events e JOIN first USING (user_id)
            WHERE e.event_type = 'purchase'
            GROUP BY channel ORDER BY channel
        """,
        # identical md5 uniforms -> identical E-S priorities -> same rows
        "weighted_sample": """
            WITH pri AS (
                SELECT source, doc_id, lang,
                       pow(
                           (CAST(('0x' || substr(md5(
                                chr(31) || CAST(doc_id AS VARCHAR)), 1, 13))
                               AS BIGINT) + 0.5) / 4503599627370496.0,
                           1.0 / n_chars) AS p
                FROM documents),
            ranked AS (
                SELECT source, doc_id, lang,
                       ROW_NUMBER() OVER (
                           PARTITION BY source
                           ORDER BY p DESC, doc_id) AS rk
                FROM pri)
            SELECT source, doc_id, lang FROM ranked
            WHERE rk <= 5 ORDER BY source, doc_id
        """,
        # identical md5 bucket assignment -> identical collisions
        "hashed_tf": """
            WITH toks AS (
                SELECT doc_id, UNNEST(list_filter(
                    string_split_regex(lower(trim(text)), '[^\\p{L}\\p{N}'']+'),
                    x -> x <> '')) AS tok
                FROM documents WHERE doc_id < 100)
            SELECT doc_id,
                   CAST(('0x' || substr(md5(tok), 1, 13)) AS BIGINT) % 256
                       AS bucket,
                   COUNT(*) AS tf
            FROM toks GROUP BY 1, 2 ORDER BY doc_id, bucket
        """,
        # temporal join: same interval build + point-in-interval filter
        "scd2_lookup": """
            WITH ev AS (
                SELECT user_id, event_type,
                       CAST(epoch(ts) AS BIGINT) AS t, event_id
                FROM events WHERE user_id < 100),
            ch AS (
                SELECT * FROM (
                    SELECT user_id, event_type, t,
                           LAG(event_type) OVER (
                               PARTITION BY user_id ORDER BY t, event_id
                           ) AS prev,
                           event_id
                    FROM ev)
                WHERE prev IS NULL OR prev <> event_type),
            dim AS (
                SELECT user_id, event_type AS state, t AS valid_from,
                       LEAD(t) OVER (
                           PARTITION BY user_id ORDER BY t, event_id
                       ) AS valid_to
                FROM ch)
            SELECT f.user_id, d.state, COUNT(*) AS n
            FROM ev f JOIN dim d ON f.user_id = d.user_id
            WHERE f.t >= d.valid_from
              AND (d.valid_to IS NULL OR f.t < d.valid_to)
            GROUP BY f.user_id, d.state
            ORDER BY f.user_id, d.state
        """,
        # a<b<c canonical triple join == exact triangle count
        "triangle_count": """
            WITH e AS (
                SELECT a.vec_id AS i, b.vec_id AS j
                FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
                WHERE a.vec_id < 200 AND b.vec_id < 200
                  AND ROUND(list_cosine_similarity(
                        CAST(a.embedding AS DOUBLE[]),
                        CAST(b.embedding AS DOUBLE[])), 6) >= 0.3)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
            FROM e ab
            JOIN e bc ON ab.j = bc.i
            JOIN e ac ON ac.i = ab.i AND ac.j = bc.j
        """,
        # NTILE with the same deterministic tie-break
        "equidepth_hist": """
            SELECT bucket, COUNT(*) AS n,
                   ROUND(MIN(p), 6) AS lo, ROUND(MAX(p), 6) AS hi
            FROM (
                SELECT o_totalprice AS p,
                       NTILE(10) OVER (
                           ORDER BY o_totalprice, o_orderkey) AS bucket
                FROM orders)
            GROUP BY bucket ORDER BY bucket
        """,
        # same planting; each check re-derived as plain SQL counts
        "dq_checks": """
            WITH base AS (
                SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
            planted0 AS (
                SELECT * FROM base
                UNION ALL
                SELECT * FROM base WHERE o_orderkey % 500 = 0),
            planted AS (
                SELECT o_orderkey,
                       CASE WHEN o_orderkey % 97 = 0 THEN NULL
                            WHEN o_orderkey % 103 = 0
                                THEN o_custkey + 9000000
                            ELSE o_custkey END AS o_custkey,
                       CASE WHEN o_orderkey % 101 = 0 THEN -5.0
                            ELSE o_totalprice END AS o_totalprice
                FROM planted0)
            SELECT * FROM (
                SELECT 'fk:o_custkey->c_custkey' AS "check",
                       COUNT(*) AS violations
                FROM planted
                WHERE o_custkey IS NOT NULL
                  AND o_custkey NOT IN (SELECT c_custkey FROM customer)
                UNION ALL
                SELECT 'not_null:o_custkey', COUNT(*)
                FROM planted WHERE o_custkey IS NULL
                UNION ALL
                SELECT 'range:o_totalprice', COUNT(*)
                FROM planted
                WHERE o_totalprice NOT BETWEEN 0.0 AND 1e9
                UNION ALL
                SELECT 'unique:o_orderkey',
                       CAST(COALESCE(SUM(n - 1), 0) AS BIGINT)
                FROM (SELECT o_orderkey, COUNT(*) AS n
                      FROM planted GROUP BY o_orderkey) g
                WHERE n > 1
            ) ORDER BY "check"
        """,
        # exact distincts from SQL; sketch accuracy pinned as booleans
        "hll_union": """
            SELECT event_type,
                   COUNT(DISTINCT user_id) AS exact,
                   TRUE AS est_within_5pct,
                   TRUE AS merged_within_5pct
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        # naive BETWEEN join — same semantics as the binned equi-join
        "binned_range": """
            WITH bands AS (
                SELECT i AS band_id, i * 5000.0 AS lo,
                       i * 5000.0 + 12000.0 AS hi
                FROM range(0, 60) t(i))
            SELECT band_id, COUNT(*) AS n,
                   ROUND(AVG(o_totalprice), 6) AS avg_price
            FROM orders JOIN bands
              ON o_totalprice >= lo AND o_totalprice <= hi
            GROUP BY band_id ORDER BY band_id
        """,
        # a-priori 2-itemset pass: identical counting in SQL
        "assoc_rules": """
            WITH baskets AS (
                SELECT DISTINCT user_id, event_type FROM events),
            nu AS (SELECT COUNT(DISTINCT user_id) AS n FROM baskets),
            item AS (
                SELECT event_type, COUNT(*) AS cnt
                FROM baskets GROUP BY event_type),
            pairs AS (
                SELECT a.event_type AS ante, b.event_type AS cons,
                       COUNT(*) AS nb
                FROM baskets a JOIN baskets b USING (user_id)
                WHERE a.event_type <> b.event_type
                GROUP BY 1, 2)
            SELECT ante, cons,
                   ROUND(nb * 1.0 / nu.n, 6) AS support,
                   ROUND(nb * 1.0 / ia.cnt, 6) AS confidence,
                   ROUND((nb * 1.0 / nu.n)
                         / ((ia.cnt * 1.0 / nu.n) * (ic.cnt * 1.0 / nu.n)),
                         6) AS lift
            FROM pairs
            JOIN item ia ON ia.event_type = ante
            JOIN item ic ON ic.event_type = cons
            CROSS JOIN nu
            ORDER BY ante, cons
        """,
        # iterative power method (not SQL): conservation invariants only;
        # exact values pinned vs numpy in tests/test_graph.py
        "pagerank_ranks": """
            SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
                   TRUE AS sum_ok, TRUE AS all_pos
            FROM embeddings WHERE vec_id < 200
        """,
        # banded-recovery invariant (pagerank pattern): the DCT is not
        # SQL-expressible; the contract — every planted 2x-upscale twin
        # hashes identically and MUST be recovered by the band join —
        # is, via the fixture's data-derived counts
        "phash_neardup": """
            WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 40),
                 ev AS (SELECT CAST(COUNT(*) AS BIGINT) AS ne
                        FROM ids WHERE doc_id % 2 = 0)
            SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ids) + ne
                       AS n_images,
                   ne AS n_planted, ne AS n_recovered,
                   TRUE AS recovered_ok, TRUE AS planted_exact
            FROM ev
        """,
        # same grid as gap_fill; linear blend of nearest observed points
        "gap_interpolate": """
            WITH ev AS (
                SELECT user_id, ts, value FROM events
                WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
                  AND ts < TIMESTAMP '2024-01-02 00:00:00'
                  AND user_id < 10),
            hourly AS (
                SELECT user_id, date_trunc('hour', ts) AS h,
                       ROUND(AVG(value), 6) AS v
                FROM ev GROUP BY 1, 2),
            grid AS (
                SELECT user_id,
                       UNNEST(generate_series(
                           TIMESTAMP '2024-01-01 00:00:00',
                           TIMESTAMP '2024-01-01 23:00:00',
                           INTERVAL 1 HOUR)) AS h
                FROM (SELECT DISTINCT user_id FROM ev)),
            joined AS (
                SELECT g.user_id, CAST(epoch(g.h) AS BIGINT) AS h, hr.v
                FROM grid g
                LEFT JOIN hourly hr ON g.user_id = hr.user_id AND g.h = hr.h),
            ctx AS (
                SELECT user_id, h, v,
                    LAST_VALUE(v IGNORE NULLS) OVER (
                        PARTITION BY user_id ORDER BY h
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS pv,
                    LAST_VALUE(CASE WHEN v IS NOT NULL THEN h END
                               IGNORE NULLS) OVER (
                        PARTITION BY user_id ORDER BY h
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS po,
                    FIRST_VALUE(v IGNORE NULLS) OVER (
                        PARTITION BY user_id ORDER BY h
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                        AS nv,
                    FIRST_VALUE(CASE WHEN v IS NOT NULL THEN h END
                                IGNORE NULLS) OVER (
                        PARTITION BY user_id ORDER BY h
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                        AS no
                FROM joined)
            SELECT user_id, h,
                   ROUND(CASE WHEN v IS NOT NULL THEN v
                              WHEN pv IS NULL THEN nv
                              WHEN nv IS NULL THEN pv
                              ELSE pv + (nv - pv) * (h - po) / (no - po)
                         END, 6) AS v_interp
            FROM ctx ORDER BY user_id, h
        """,
        # exact Lucene-form BM25 replay over the same tokenization
        "bm25_search": """
            WITH toks AS (
                SELECT doc_id, list_filter(
                    string_split_regex(lower(trim(text)), '[^\\p{L}\\p{N}'']+'),
                    x -> x <> '') AS t
                FROM documents),
            n AS (SELECT COUNT(*) AS n FROM toks),
            dl AS (SELECT doc_id, len(t) AS dl FROM toks),
            a AS (SELECT AVG(dl) AS avgdl FROM dl),
            tfs AS (
                SELECT doc_id, UNNEST(t) AS term FROM toks),
            tf AS (
                SELECT doc_id, term, COUNT(*) AS tf
                FROM tfs GROUP BY 1, 2),
            idf AS (
                SELECT term,
                       ln(1 + (n.n - COUNT(DISTINCT doc_id) + 0.5)
                              / (COUNT(DISTINCT doc_id) + 0.5)) AS idf
                FROM tf CROSS JOIN n GROUP BY term, n.n),
            qt AS (
                SELECT doc_id AS query_id, UNNEST(list_distinct(t[1:5])) AS term
                FROM toks WHERE doc_id % 100 = 0),
            scored AS (
                SELECT qt.query_id, tf.doc_id,
                       SUM(idf.idf * (tf.tf * 2.2)
                           / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / a.avgdl)))
                           AS score
                FROM qt
                JOIN tf USING (term)
                JOIN idf USING (term)
                JOIN dl ON dl.doc_id = tf.doc_id
                CROSS JOIN a
                GROUP BY 1, 2),
            ranked AS (
                SELECT query_id, doc_id, score,
                       ROW_NUMBER() OVER (
                           PARTITION BY query_id
                           ORDER BY score DESC, doc_id) AS rk
                FROM scored)
            SELECT query_id, doc_id, ROUND(score, 6) AS score,
                   CAST(rk AS INT) AS rk
            FROM ranked WHERE rk <= 10 ORDER BY query_id, rk
        """,
        # anchored regex parts == parse_url for well-formed URLs
        "url_stats": """
            WITH u AS (
                SELECT doc_id,
                    'https://' || source || '.example.com/' || lang
                    || '/doc-' || doc_id || '?ref=' || lang
                    || '&p=' || CAST(doc_id % 7 AS VARCHAR) AS url
                FROM documents),
            parts AS (
                SELECT doc_id,
                    regexp_extract(url, 'https?://([^/?#]+)', 1) AS host,
                    regexp_extract(url, 'https?://[^/?#]+([^?#]*)', 1) AS path,
                    regexp_extract(url, '[?&]ref=([^&#]*)', 1) AS ref
                FROM u)
            SELECT host, COUNT(*) AS n,
                   COUNT(DISTINCT path) AS n_paths,
                   COUNT(DISTINCT ref) AS n_refs
            FROM parts GROUP BY host ORDER BY host
        """,
        # bounded-window weighted fold: same 20-row EWMA, list window twin
        "ewma_smooth": """
            WITH arrs AS (
                SELECT user_id, event_id, value,
                       list(value) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 19 PRECEDING AND CURRENT ROW
                       ) AS l
                FROM events WHERE user_id < 200)
            SELECT user_id, event_id, ROUND(value, 6) AS value,
                   ROUND(
                       list_sum([l[i] * pow(0.7, len(l) - i)
                                 FOR i IN range(1, len(l) + 1)])
                       / list_sum([pow(0.7, len(l) - i)
                                   FOR i IN range(1, len(l) + 1)]), 6)
                       AS ewma
            FROM arrs ORDER BY user_id, event_id
        """,
        # Spark percentile() interpolates like quantile_cont
        "winsorized_stats": """
            WITH fences AS (
                SELECT event_type,
                       quantile_cont(value, 0.01) AS p01,
                       quantile_cont(value, 0.99) AS p99
                FROM events GROUP BY event_type)
            SELECT e.event_type, COUNT(*) AS n,
                   CAST(SUM(CAST(e.value < f.p01 AS BIGINT)) AS BIGINT)
                       AS n_low,
                   CAST(SUM(CAST(e.value > f.p99 AS BIGINT)) AS BIGINT)
                       AS n_high,
                   ROUND(AVG(LEAST(GREATEST(e.value, f.p01), f.p99)), 6)
                       AS w_mean,
                   ROUND(STDDEV_SAMP(LEAST(GREATEST(e.value, f.p01), f.p99)), 6)
                       AS w_std
            FROM events e JOIN fences f USING (event_type)
            GROUP BY e.event_type ORDER BY e.event_type
        """,
        # BPE fit is iterative (not SQL): n_words checked exactly, the
        # subword invariants are proven Spark-side and pinned TRUE here
        "bpe_tokens": """
            WITH toks AS (
                SELECT doc_id, list_filter(
                    string_split_regex(lower(trim(text)), '[^\\p{L}\\p{N}'']+'),
                    x -> x <> '') AS t
                FROM documents)
            SELECT doc_id, CAST(len(t) AS INT) AS n_words,
                   TRUE AS conserved, TRUE AS bounded
            FROM toks ORDER BY doc_id
        """,
        # connected components of the rounded-cos >= 0.3 pair graph;
        # singletons label themselves; representative = cluster min id
        "semantic_clusters": """
            WITH RECURSIVE pairs AS (
                SELECT a.vec_id AS i, b.vec_id AS j
                FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
                WHERE a.vec_id < 200 AND b.vec_id < 200
                  AND ROUND(list_cosine_similarity(
                        CAST(a.embedding AS DOUBLE[]),
                        CAST(b.embedding AS DOUBLE[])), 6) >= 0.3),
            sym AS (SELECT i AS a, j AS b FROM pairs
                    UNION SELECT j, i FROM pairs),
            reach(a, b) AS (
                SELECT a, b FROM sym
                UNION
                SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
            comp AS (
                SELECT a AS vec_id, LEAST(a, MIN(b)) AS cluster_id
                FROM reach GROUP BY a)
            SELECT e.vec_id,
                   COALESCE(c.cluster_id, e.vec_id) AS cluster_id,
                   CAST(COALESCE(c.cluster_id, e.vec_id) = e.vec_id AS INT)
                       AS is_rep
            FROM embeddings e LEFT JOIN comp c USING (vec_id)
            WHERE e.vec_id < 200 ORDER BY e.vec_id
        """,
        # identical md5 priority ranking -> the exact sample reproduces
        "reservoir_sample": """
            WITH ranked AS (
                SELECT source, doc_id, lang,
                       ROW_NUMBER() OVER (
                           PARTITION BY source
                           ORDER BY md5(chr(31) || CAST(doc_id AS VARCHAR)),
                                    doc_id
                       ) AS rs
                FROM documents)
            SELECT source, doc_id, lang FROM ranked
            WHERE rs <= 5 ORDER BY source, doc_id
        """,
        # VARIANT extraction == classic JSON extraction semantics
        "variant_json": """
            SELECT event_type,
                   COUNT(CAST(props::JSON ->> 'k' AS BIGINT)) AS n,
                   CAST(SUM(CAST(props::JSON ->> 'k' AS BIGINT)) AS BIGINT)
                       AS sum_k,
                   MIN(CAST(props::JSON ->> 'k' AS BIGINT)) AS min_k,
                   MAX(CAST(props::JSON ->> 'k' AS BIGINT)) AS max_k
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        # IVF-PQ: same per-probe invariants as ivf_topk/pq_topk
        "ivfpq_topk": """
            SELECT CAST(vec_id AS BIGINT) AS probe,
                   CAST(10 AS BIGINT) AS n,
                   TRUE AS ranks_ok,
                   TRUE AS recall_ok
            FROM embeddings WHERE vec_id < 10 ORDER BY probe
        """,
        # KMV sketch at unsaturated cardinality = exact distinct/set algebra
        "kmv_distinct": """
            SELECT
              (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users,
              (SELECT COUNT(DISTINCT user_id) FROM events
               WHERE event_type IN ('click', 'purchase'))
                  AS n_click_or_purchase,
              (SELECT COUNT(*) FROM (
                  SELECT DISTINCT user_id FROM events
                  WHERE event_type = 'click'
                  INTERSECT
                  SELECT DISTINCT user_id FROM events
                  WHERE event_type = 'purchase') t)
                  AS n_click_and_purchase
        """,
        # per-user funnel completions: stage-wise min-after-prior chain
        "funnel_completions": """
            WITH v AS (
                SELECT user_id, MIN(ts) AS vt FROM events
                WHERE event_type = 'view' GROUP BY user_id),
            c AS (
                SELECT e.user_id, MIN(ts) AS ct FROM events e
                JOIN v ON e.user_id = v.user_id
                WHERE event_type = 'click' AND ts > vt GROUP BY e.user_id),
            p AS (
                SELECT e.user_id, MIN(ts) AS pt FROM events e
                JOIN c ON e.user_id = c.user_id
                WHERE event_type = 'purchase' AND ts > ct GROUP BY e.user_id)
            SELECT user_id, CAST(floor(epoch(pt)) AS BIGINT) AS completed_ts
            FROM p ORDER BY user_id
        """,
        # TPC-H Q11 shape: per-part shipment value with a scalar-subquery
        # HAVING (lineitem stands in for partsupp; see query docstring)
        "important_stock": """
            WITH v AS (
                SELECT l_partkey,
                       SUM(l_extendedprice * (1 - l_discount)) AS val
                FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                WHERE s_nationkey < 12
                GROUP BY l_partkey)
            SELECT l_partkey, ROUND(val, 6) AS val FROM v
            WHERE val > 1.6 * (SELECT AVG(val) FROM v)
            ORDER BY val DESC, l_partkey
        """,
        # TPC-H Q16 shape: distinct-supplier counts with NOT IN exclusion
        "supplier_part_counts": """
            SELECT p_brand, p_type, p_size,
                   COUNT(DISTINCT l_suppkey) AS supplier_cnt
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#1' AND p_type <> 'ECONOMY'
              AND p_size < 30
              AND l_suppkey NOT IN (
                  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
            GROUP BY p_brand, p_type, p_size
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """,
        # TPC-H Q20 shape: nested IN chain + relative-volume HAVING
        "excess_shipments": """
            WITH qty AS (
                SELECT l_suppkey, SUM(l_quantity) AS sq
                FROM lineitem
                WHERE l_shipdate >= DATE '1997-01-01'
                  AND l_shipdate < DATE '1998-01-01'
                  AND l_partkey IN (
                      SELECT p_partkey FROM part WHERE p_name LIKE 'red %')
                GROUP BY l_suppkey)
            SELECT s_suppkey, s_name, n_name, ROUND(sq, 6) AS ship_qty
            FROM supplier
            JOIN qty ON s_suppkey = l_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE sq > 1.15 * (SELECT AVG(sq) FROM qty)
            ORDER BY s_suppkey
        """,
        # same invariant shape as ivf_topk at the pruned-search config
        # (3 probes, 6/16 probed cells — the query also asserts the cell
        # partition filter is present AND non-vacuous inside Spark)
        "ivf_index_topk": """
            SELECT CAST(vec_id AS BIGINT) AS probe,
                   CAST(10 AS BIGINT) AS n,
                   TRUE AS ranks_ok,
                   TRUE AS recall_ok
            FROM embeddings WHERE vec_id < 3 ORDER BY probe
        """,
        "ivf_delete_topk": """
            SELECT CAST(vec_id AS BIGINT) AS probe,
                   CAST(10 AS BIGINT) AS n,
                   TRUE AS ranks_ok,
                   TRUE AS recall_ok,
                   TRUE AS no_deleted
            FROM embeddings WHERE vec_id < 3 ORDER BY probe
        """,
        # filtered ANN invariant set: the pushed-down predicate must
        # return a FULL k per probe (n=10 — post-filtering could not),
        # only predicate-satisfying neighbors, recall vs the exact
        # FILTERED kernel
        "ivf_filtered_topk": """
            SELECT CAST(vec_id AS BIGINT) AS probe,
                   CAST(10 AS BIGINT) AS n,
                   TRUE AS ranks_ok,
                   TRUE AS filter_ok,
                   TRUE AS recall_ok
            FROM embeddings WHERE vec_id < 3 ORDER BY probe
        """,
        # budget prefix replayed as one global running sum (the engine
        # side does it bucket-wise to avoid the unpartitioned window)
        "token_budget_select": """
            WITH d AS (
                SELECT doc_id,
                       CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
                       len(string_split(text, ' ')) * 1.0 / n_chars AS quality
                FROM documents),
            c AS (
                SELECT *, SUM(toks) OVER (ORDER BY quality DESC, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                FROM d)
            SELECT doc_id, toks, ROUND(quality, 6) AS quality
            FROM c WHERE cum <= 12000 ORDER BY doc_id
        """,
        # SQ8 quantized search recovers the EXACT answer after re-rank:
        # the oracle is the plain full-precision top-k
        "sq8_topk": """
            SELECT probe, vec_id, cos, rk FROM (
                SELECT p.vec_id AS probe, e.vec_id AS vec_id,
                       ROUND(list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
                                                    CAST(e.embedding AS DOUBLE[])), 6) AS cos,
                       ROW_NUMBER() OVER (PARTITION BY p.vec_id
                           ORDER BY list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
                                                           CAST(e.embedding AS DOUBLE[])) DESC,
                                    e.vec_id) AS rk
                FROM embeddings p
                JOIN embeddings e ON e.vec_id <> p.vec_id
                WHERE p.vec_id < 10) t
            WHERE rk <= 10 ORDER BY probe, rk
        """,
        # within-group top-k: the join carries the per-probe group bound
        "group_cosine_topk": """
            SELECT probe, vec_id, cos, rk FROM (
                SELECT p.vec_id AS probe, e.vec_id AS vec_id,
                       ROUND(list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
                                                    CAST(e.embedding AS DOUBLE[])), 6) AS cos,
                       ROW_NUMBER() OVER (PARTITION BY p.vec_id
                           ORDER BY list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
                                                           CAST(e.embedding AS DOUBLE[])) DESC,
                                    e.vec_id) AS rk
                FROM embeddings p
                JOIN embeddings e ON e.vec_id <> p.vec_id
                                 AND e.label = p.label
                WHERE p.vec_id < 6) t
            WHERE rk <= 5 ORDER BY probe, rk
        """,
        # PQ-family filtered ANN invariant set (see ivf_filtered_topk)
        "ivfpq_filtered_topk": """
            SELECT CAST(vec_id AS BIGINT) AS probe,
                   CAST(10 AS BIGINT) AS n,
                   TRUE AS ranks_ok,
                   TRUE AS filter_ok,
                   TRUE AS recall_ok
            FROM embeddings WHERE vec_id < 3 ORDER BY probe
        """,
        # MMR greedy selection replayed as UNROLLED chained CTEs: cand =
        # exact top-8 per probe; s1 = argmax rel; each later step scores
        # the un-chosen candidates 0.7*rel - 0.3*max(sim to chosen) and
        # takes the per-probe window argmax (ties by id) — the same
        # recurrence mmr_rerank's per-probe numpy loop runs
        "mmr_rerank": """
            WITH cand AS (
                SELECT probe, vec_id, cos, emb FROM (
                    SELECT p.vec_id AS probe, e.vec_id AS vec_id,
                           list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
                                                  CAST(e.embedding AS DOUBLE[])) AS cos,
                           CAST(e.embedding AS DOUBLE[]) AS emb,
                           ROW_NUMBER() OVER (PARTITION BY p.vec_id
                               ORDER BY list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
                                                               CAST(e.embedding AS DOUBLE[])) DESC,
                                        e.vec_id) AS rk
                    FROM embeddings p
                    JOIN embeddings e ON e.vec_id <> p.vec_id
                    WHERE p.vec_id < 3) t
                WHERE rk <= 8),
            sim AS (
                SELECT a.probe, a.vec_id AS i, b.vec_id AS j,
                       list_cosine_similarity(a.emb, b.emb) AS s
                FROM cand a JOIN cand b
                  ON a.probe = b.probe AND a.vec_id <> b.vec_id),
            s1 AS (
                SELECT probe, vec_id FROM (
                    SELECT probe, vec_id,
                           ROW_NUMBER() OVER (PARTITION BY probe
                               ORDER BY cos DESC, vec_id) AS rn
                    FROM cand) WHERE rn = 1),
            ch1 AS (SELECT * FROM s1),
            st2 AS (
                SELECT c.probe, c.vec_id,
                       0.7 * MIN(c.cos) - 0.3 * MAX(s.s) AS score
                FROM cand c
                JOIN sim s ON s.probe = c.probe AND s.i = c.vec_id
                JOIN ch1 ON ch1.probe = s.probe AND ch1.vec_id = s.j
                WHERE NOT EXISTS (SELECT 1 FROM ch1 x
                                  WHERE x.probe = c.probe
                                    AND x.vec_id = c.vec_id)
                GROUP BY c.probe, c.vec_id),
            s2 AS (
                SELECT probe, vec_id FROM (
                    SELECT probe, vec_id,
                           ROW_NUMBER() OVER (PARTITION BY probe
                               ORDER BY score DESC, vec_id) AS rn
                    FROM st2) WHERE rn = 1),
            ch2 AS (SELECT * FROM ch1 UNION ALL SELECT * FROM s2),
            st3 AS (
                SELECT c.probe, c.vec_id,
                       0.7 * MIN(c.cos) - 0.3 * MAX(s.s) AS score
                FROM cand c
                JOIN sim s ON s.probe = c.probe AND s.i = c.vec_id
                JOIN ch2 ON ch2.probe = s.probe AND ch2.vec_id = s.j
                WHERE NOT EXISTS (SELECT 1 FROM ch2 x
                                  WHERE x.probe = c.probe
                                    AND x.vec_id = c.vec_id)
                GROUP BY c.probe, c.vec_id),
            s3 AS (
                SELECT probe, vec_id FROM (
                    SELECT probe, vec_id,
                           ROW_NUMBER() OVER (PARTITION BY probe
                               ORDER BY score DESC, vec_id) AS rn
                    FROM st3) WHERE rn = 1),
            ch3 AS (SELECT * FROM ch2 UNION ALL SELECT * FROM s3),
            st4 AS (
                SELECT c.probe, c.vec_id,
                       0.7 * MIN(c.cos) - 0.3 * MAX(s.s) AS score
                FROM cand c
                JOIN sim s ON s.probe = c.probe AND s.i = c.vec_id
                JOIN ch3 ON ch3.probe = s.probe AND ch3.vec_id = s.j
                WHERE NOT EXISTS (SELECT 1 FROM ch3 x
                                  WHERE x.probe = c.probe
                                    AND x.vec_id = c.vec_id)
                GROUP BY c.probe, c.vec_id),
            s4 AS (
                SELECT probe, vec_id FROM (
                    SELECT probe, vec_id,
                           ROW_NUMBER() OVER (PARTITION BY probe
                               ORDER BY score DESC, vec_id) AS rn
                    FROM st4) WHERE rn = 1),
            ranked AS (
                SELECT probe, vec_id, 1 AS mmr_rank FROM s1
                UNION ALL SELECT probe, vec_id, 2 FROM s2
                UNION ALL SELECT probe, vec_id, 3 FROM s3
                UNION ALL SELECT probe, vec_id, 4 FROM s4)
            SELECT CAST(probe AS BIGINT) AS probe,
                   CAST(vec_id AS BIGINT) AS vec_id,
                   CAST(mmr_rank AS BIGINT) AS mmr_rank
            FROM ranked ORDER BY probe, mmr_rank
        """,
        # embedding-space leakage sweep: exact max-cos per bench vector
        "embedding_decontamination": """
            SELECT b.vec_id,
                   ROUND(MAX(list_cosine_similarity(CAST(b.embedding AS DOUBLE[]),
                                                    CAST(t.embedding AS DOUBLE[]))), 6) AS max_cos,
                   MAX(list_cosine_similarity(CAST(b.embedding AS DOUBLE[]),
                                              CAST(t.embedding AS DOUBLE[]))) >= 0.45 AS contaminated
            FROM embeddings b
            JOIN embeddings t ON t.vec_id % 11 <> 0
            WHERE b.vec_id % 11 = 0
            GROUP BY b.vec_id ORDER BY b.vec_id
        """,
        # exact filtered top-k: value-hashed actual neighbor rows
        "cosine_filtered_topk": """
            SELECT probe, vec_id, cos, rk FROM (
                SELECT p.vec_id AS probe, e.vec_id AS vec_id,
                       ROUND(list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
                                                    CAST(e.embedding AS DOUBLE[])), 6) AS cos,
                       ROW_NUMBER() OVER (PARTITION BY p.vec_id
                           ORDER BY list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
                                                           CAST(e.embedding AS DOUBLE[])) DESC,
                                    e.vec_id) AS rk
                FROM embeddings p
                JOIN embeddings e ON e.vec_id <> p.vec_id
                                 AND e.label % 3 = 0
                WHERE p.vec_id < 10) t
            WHERE rk <= 10 ORDER BY probe, rk
        """,
        # greedy packing replayed exactly: the per-group sequential
        # recurrence (close pack on overflow) as a recursive CTE — one
        # working row per language per iteration.
        "token_packing_greedy": """
            WITH RECURSIVE toks AS (
                SELECT doc_id, lang,
                       CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                            ELSE len(regexp_split_to_array(TRIM(text), '\\s+'))
                       END AS toks,
                       ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
                FROM documents),
            rec AS (
                SELECT doc_id, lang, toks, rn, CAST(0 AS BIGINT) AS pack_id,
                       toks AS acc
                FROM toks WHERE rn = 1
                UNION ALL
                SELECT t.doc_id, t.lang, t.toks, t.rn,
                       CASE WHEN r.acc > 0 AND r.acc + t.toks > 2048
                            THEN r.pack_id + 1 ELSE r.pack_id END,
                       CASE WHEN r.acc > 0 AND r.acc + t.toks > 2048
                            THEN t.toks ELSE r.acc + t.toks END
                FROM rec r JOIN toks t ON t.lang = r.lang AND t.rn = r.rn + 1)
            SELECT doc_id, lang, CAST(toks AS BIGINT) AS toks,
                   CAST(pack_id AS BIGINT) AS pack_id
            FROM rec ORDER BY doc_id
        """,
        # binary-payload path checked hash-exactly (octet_length + sha256 of
        # the UTF-8 payload); decoded-feature path by invariants.
        "multimodal_features": """
            SELECT doc_id,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   substr(sha256(text), 1, 8) AS sha8,
                   CAST(6 AS BIGINT) AS feat_len,
                   TRUE AS bounds_ok
            FROM documents WHERE doc_id < 50 ORDER BY doc_id
        """,
        "fuzzy_name_pairs": """
            SELECT a.c_custkey AS i, b.c_custkey AS j,
                   CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
            FROM customer a
            JOIN customer b ON a.c_custkey < b.c_custkey
            WHERE a.c_custkey < 400 AND b.c_custkey < 400
              AND levenshtein(a.c_name, b.c_name) <= 1
            ORDER BY i, j
        """,
        "heavy_hitters": """
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS est FROM (
                SELECT UNNEST(string_split_regex(lower(text), '\\s+')) AS tok
                FROM documents)
            WHERE tok <> ''
            GROUP BY tok ORDER BY est DESC, tok LIMIT 20
        """,
        "ohlc_rollup": """
            WITH x AS (
                SELECT user_id, date_trunc('hour', ts) AS hh, value,
                       FIRST_VALUE(value) OVER (
                           PARTITION BY user_id, date_trunc('hour', ts)
                           ORDER BY ts) AS o,
                       FIRST_VALUE(value) OVER (
                           PARTITION BY user_id, date_trunc('hour', ts)
                           ORDER BY ts DESC) AS c
                FROM events)
            SELECT user_id, CAST(epoch(hh) AS BIGINT) AS h,
                   ROUND(MIN(o), 6) AS open,
                   ROUND(MAX(value), 6) AS high,
                   ROUND(MIN(value), 6) AS low,
                   ROUND(MIN(c), 6) AS close,
                   COUNT(*) AS n
            FROM x GROUP BY user_id, hh ORDER BY user_id, h
        """,
        "funnel": """
            WITH v AS (
                SELECT user_id, MIN(ts) AS vt FROM events
                WHERE event_type = 'view' GROUP BY user_id),
            c AS (
                SELECT e.user_id, MIN(e.ts) AS ct FROM events e
                JOIN v ON e.user_id = v.user_id
                WHERE e.event_type = 'click' AND e.ts > v.vt
                GROUP BY e.user_id),
            p AS (
                SELECT e.user_id, MIN(e.ts) AS pt FROM events e
                JOIN c ON e.user_id = c.user_id
                WHERE e.event_type = 'purchase' AND e.ts > c.ct
                GROUP BY e.user_id)
            SELECT (SELECT COUNT(*) FROM v) AS n_view,
                   (SELECT COUNT(*) FROM c) AS n_click,
                   (SELECT COUNT(*) FROM p) AS n_purchase
        """,
        "histogram_bins": """
            SELECT bucket, COUNT(*) AS n, ROUND(SUM(o_totalprice), 6) AS total
            FROM (
                SELECT LEAST(GREATEST(
                           CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) + 1,
                           0), 13) AS bucket,
                       o_totalprice
                FROM orders)
            GROUP BY bucket ORDER BY bucket
        """,
        "gap_fill": """
            WITH ev AS (
                SELECT user_id, ts, value FROM events
                WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
                  AND ts < TIMESTAMP '2024-01-02 00:00:00'
                  AND user_id < 10),
            hourly AS (
                SELECT user_id, date_trunc('hour', ts) AS h,
                       ROUND(AVG(value), 6) AS v
                FROM ev GROUP BY 1, 2),
            grid AS (
                SELECT user_id,
                       UNNEST(generate_series(
                           TIMESTAMP '2024-01-01 00:00:00',
                           TIMESTAMP '2024-01-01 23:00:00',
                           INTERVAL 1 HOUR)) AS h
                FROM (SELECT DISTINCT user_id FROM ev))
            SELECT g.user_id, CAST(epoch(g.h) AS BIGINT) AS h,
                   LAST_VALUE(hr.v IGNORE NULLS) OVER (
                       PARTITION BY g.user_id ORDER BY g.h
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS v_filled
            FROM grid g
            LEFT JOIN hourly hr ON g.user_id = hr.user_id AND g.h = hr.h
            ORDER BY g.user_id, h
        """,
        "unpivot_long": """
            SELECT p_partkey, attr, val FROM (
                SELECT p_partkey, 'size' AS attr,
                       CAST(p_size AS DOUBLE) AS val FROM part
                UNION ALL
                SELECT p_partkey, 'retailprice' AS attr,
                       CAST(p_retailprice AS DOUBLE) AS val FROM part)
            WHERE p_partkey < 200
            ORDER BY p_partkey, attr
        """,
        "udtf_sentences": """
            WITH d AS (
                SELECT doc_id, string_split(text, '.') AS parts
                FROM documents WHERE doc_id < 40),
            e AS (
                SELECT doc_id,
                       UNNEST(range(1, len(parts) + 1)) AS i,
                       parts
                FROM d)
            SELECT doc_id, CAST(i - 1 AS INT) AS pos,
                   trim(parts[CAST(i AS INT)]) AS sentence
            FROM e
            WHERE trim(parts[CAST(i AS INT)]) <> ''
            ORDER BY doc_id, pos
        """,
        "local_supplier_volume": """
            SELECT n_name,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 6) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
                         AND c_nationkey = s_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= DATE '1996-01-01'
              AND o_orderdate < DATE '1997-01-01'
            GROUP BY n_name
            ORDER BY revenue DESC, n_name
        """,
        "nation_trade": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS BIGINT) AS l_year,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 6) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE l_shipdate >= DATE '1996-01-01'
              AND l_shipdate < DATE '1998-01-01'
              AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            GROUP BY 1, 2, 3
            ORDER BY supp_nation, cust_nation, l_year
        """,
        "nation_profit": """
            SELECT n_name AS nation,
                   CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)
                             - 0.6 * p_retailprice * l_quantity), 6)
                   AS sum_profit
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE p_type = 'PROMO'
            GROUP BY 1, 2
            ORDER BY nation, o_year DESC
        """,
        "late_shipments": """
            SELECT l_linestatus,
                   CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE CAST(l_shipdate AS DATE)
                  > CAST(o_orderdate AS DATE) + INTERVAL 90 DAY
            GROUP BY l_linestatus
            ORDER BY l_linestatus
        """,
        "order_distribution": """
            SELECT c_count, COUNT(*) AS custdist
            FROM (
                SELECT c_custkey, COUNT(o_orderkey) AS c_count
                FROM customer
                LEFT JOIN orders ON c_custkey = o_custkey
                                AND o_orderpriority <> '1-URGENT'
                GROUP BY c_custkey)
            GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC
        """,
        "waiting_suppliers": """
            WITH lo AS (
                SELECT l_orderkey, l_suppkey,
                       CAST(l_shipdate AS DATE)
                       > CAST(o_orderdate AS DATE) + INTERVAL 100 DAY AS late
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                WHERE o_orderstatus = 'F')
            SELECT s_name, COUNT(*) AS numwait
            FROM lo l1 JOIN supplier ON l1.l_suppkey = s_suppkey
            WHERE l1.late
              AND EXISTS (SELECT 1 FROM lo l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (SELECT 1 FROM lo l3
                              WHERE l3.l_orderkey = l1.l_orderkey
                                AND l3.l_suppkey <> l1.l_suppkey
                                AND l3.late)
            GROUP BY s_name
            ORDER BY numwait DESC, s_name LIMIT 20
        """,
        "returned_items": """
            SELECT c_custkey, c_name, n_name,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 6) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= DATE '1995-10-01'
              AND o_orderdate < DATE '1996-01-01'
            GROUP BY c_custkey, c_name, n_name
            ORDER BY revenue DESC, c_custkey LIMIT 20
        """,
        "promo_revenue": """
            SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                     THEN l_extendedprice * (1 - l_discount)
                                     ELSE 0.0 END)
                         / SUM(l_extendedprice * (1 - l_discount)), 6)
                   AS promo_pct
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= DATE '1996-03-01'
              AND l_shipdate < DATE '1996-04-01'
        """,
        "top_supplier": """
            WITH rev AS (
                SELECT l_suppkey,
                       ROUND(SUM(l_extendedprice * (1 - l_discount)), 6)
                       AS total_revenue
                FROM lineitem
                WHERE l_shipdate >= DATE '1996-01-01'
                  AND l_shipdate < DATE '1996-04-01'
                GROUP BY l_suppkey)
            SELECT s_suppkey, s_name, total_revenue
            FROM rev JOIN supplier ON l_suppkey = s_suppkey
            WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
            ORDER BY s_suppkey
        """,
        "market_share": """
            SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
                   ROUND(SUM(CASE WHEN n_name = 'NATION_3'
                             THEN l_extendedprice * (1 - l_discount)
                             ELSE 0.0 END)
                         / SUM(l_extendedprice * (1 - l_discount)), 6)
                   AS mkt_share
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY o_year ORDER BY o_year
        """,
        "large_orders": """
            WITH big AS (
                SELECT l_orderkey, SUM(l_quantity) AS sum_qty
                FROM lineitem GROUP BY l_orderkey
                HAVING SUM(l_quantity) > 250)
            SELECT c_custkey, c_name, big.l_orderkey AS o_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
                   o_totalprice, sum_qty
            FROM big
            JOIN orders ON big.l_orderkey = orders.o_orderkey
            JOIN customer ON o_custkey = c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
        """,
        "disjunctive_pred": """
            SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 6)
                   AS revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 20 AND 30)
        """,
        "argmin_part": """
            WITH mn AS (
                SELECT p_brand AS b, MIN(p_retailprice) AS min_price
                FROM part GROUP BY p_brand)
            SELECT p_brand, p_partkey, p_name, p_retailprice
            FROM part JOIN mn ON p_brand = b AND p_retailprice = min_price
            ORDER BY p_brand, p_partkey
        """,
        "idle_customers": """
            SELECT c_nationkey, COUNT(*) AS numcust,
                   ROUND(SUM(c_acctbal), 6) AS totacctbal
            FROM customer
            WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                               WHERE c_acctbal > 0)
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderdate >= DATE '1999-01-01')
            GROUP BY c_nationkey ORDER BY c_nationkey
        """,
        "window_nav": """
            WITH sp AS (
                SELECT event_id, user_id, ts,
                       CASE WHEN value > 34.0 THEN value END AS v
                FROM events)
            SELECT event_id,
                   ROUND(first_value(v IGNORE NULLS) OVER wf, 6) AS first_v,
                   ROUND(last_value(v IGNORE NULLS) OVER wf, 6) AS last_v,
                   ROUND(nth_value(v, 2 IGNORE NULLS) OVER wf, 6) AS second_v,
                   ROUND(lag(v IGNORE NULLS) OVER wo, 6) AS prev_v
            FROM sp
            WINDOW wf AS (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   wo AS (PARTITION BY user_id ORDER BY ts, event_id)
            ORDER BY event_id
        """,
        "collect_agg": """
            SELECT l_returnflag,
                   string_agg(DISTINCT l_linestatus, ','
                              ORDER BY l_linestatus) AS statuses,
                   COUNT(*) AS c
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
    }


def oracle_sql() -> dict[str, str]:
    """Literal oracles plus code-level aliases: a query DECLARED
    result-identical to another shares its SQL verbatim — bm25_indexed
    precomputes the same weights bm25_search derives at query time
    (same formula, corpus, queries, tie-break), so its oracle IS
    bm25_search's, and aliasing in code keeps the two strings from
    drifting apart."""
    d = _oracle_sql_literals()
    d["bm25_indexed"] = d["bm25_search"]
    # bm25_incremental = build on half + add the rest; the v2 raw-count
    # layout makes append exact, so the full-corpus oracle applies and
    # the driver's hash compare IS the add==rebuild identity check
    d["bm25_incremental"] = d["bm25_search"]
    # bm25_stream_ingest (r13) = build on half + the rest through the
    # STREAMING fold (idempotent adds + in-fold compact); associative
    # counts + exact-survivor compact keep the full-corpus oracle, so
    # the driver hash compare is the stream==rebuild identity
    d["bm25_stream_ingest"] = d["bm25_search"]
    # incremental_index_add = build on the low-id half + append the
    # rest; monotone-ingest ids keep every stored rep the min-id
    # tie-break winner, so the full-corpus incremental oracle applies
    d["incremental_index_add"] = d["incremental_neardup"]
    # bm25_delete_compact = delete(doc_id % 10 == 3) + compact, which
    # re-derives EXACT survivor stats — so the oracle is bm25_search's
    # SQL over the surviving documents only, derived from the same
    # literal so the two cannot drift
    assert d["bm25_search"].count("FROM documents)") == 1
    d["bm25_delete_compact"] = d["bm25_search"].replace(
        "FROM documents)", "FROM documents WHERE doc_id % 10 <> 3)")
    # bm25_pointer_compact = append + delete(doc_id % 10 == 7) +
    # compact(dest) + _LATEST pointer flip; the dest rewrite re-derives
    # EXACT survivor stats like the in-place compact, so the oracle is
    # the same survivor-corpus form with the 7-residue delete set
    d["bm25_pointer_compact"] = d["bm25_search"].replace(
        "FROM documents)", "FROM documents WHERE doc_id % 10 <> 7)")
    # ivf_retrain_topk declares the same invariant set as
    # ivf_delete_topk (k results, dense ranks, recall floor vs the
    # exact kernel over survivors, no deleted id served) — computed by
    # the Spark query over the RETRAINED pointer-resolved snapshot
    d["ivf_retrain_topk"] = d["ivf_delete_topk"]
    # ivf_stream_autoretrain_topk (r13): same invariant set again,
    # computed over the snapshot the STREAMING fold's auto-retrain
    # published (delete -> stream-ingest -> fold fires retrain ->
    # pointer-resolved search over the surviving union)
    d["ivf_stream_autoretrain_topk"] = d["ivf_delete_topk"]
    return d
