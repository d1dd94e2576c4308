"""LLM training-data curation over the documents fixture — the north-star
pipeline: exact dedup -> MinHash near-dedup -> quality filter ->
language ID -> token accounting. Every stage is a DataFrame->DataFrame
operator from the engine; nothing collects to the driver except the final
summary row.

Run:  python -m keystone_spark.apps.curate_corpus [--sf-dir DIR]
Prints one JSON line of corpus accounting (docs in/out per stage, tokens).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import functions as F


def curate(spark, sf_dir: str, jaccard_threshold: float = 0.8,
           min_tokens: int = 5, max_digit_ratio: float = 0.3) -> dict:
    from keystone_spark.functions.text import (
        bpe_ish_token_count,
        language_scores,
        quality_features,
        token_count,
    )
    from keystone_spark.operators.dedup import exact_dedup, minhash_dedup
    from keystone_spark.sources import load_table

    docs = load_table(spark, "documents", sf_dir)
    n0 = docs.count()

    # 1. exact dedup on normalized text
    exact = exact_dedup(
        docs.withColumn("__norm", F.lower(F.trim("text"))), ["__norm"]
    ).drop("__norm")
    n1 = exact.count()

    # 2. MinHash near-dedup (keep-first policy)
    near = minhash_dedup(exact, threshold=jaccard_threshold)
    n2 = near.count()

    # 3. quality filter: enough tokens, not digit-soup
    q = quality_features("text")
    filtered = (
        near.withColumn("__q", q)
        .where(
            (F.col("__q.n_tokens") >= min_tokens)
            & (F.col("__q.digit_ratio") <= max_digit_ratio)
        )
        .drop("__q")
    )
    n3 = filtered.count()

    # 4. language ID + token accounting, one aggregation pass
    s = language_scores("text")
    en, es, cjk = s.getField("en"), s.getField("es"), s.getField("cjk")
    pred = (
        F.when((en >= es) & (en >= cjk), "en").when(es >= cjk, "es").otherwise("cjk")
    )
    summary = (
        filtered.select(
            pred.alias("lang_pred"),
            token_count("text").alias("ws_toks"),
            bpe_ish_token_count("text").alias("bpe_toks"),
        )
        .agg(
            F.count("*").alias("docs"),
            F.sum("ws_toks").alias("ws_tokens"),
            F.sum("bpe_toks").alias("bpe_tokens"),
            F.count_distinct("lang_pred").alias("langs_seen"),
        )
        .first()
    )
    return {
        "app": "curate_corpus",
        "docs_in": n0,
        "after_exact_dedup": n1,
        "after_near_dedup": n2,
        "after_quality_filter": n3,
        "ws_tokens": int(summary.ws_tokens),
        "bpe_tokens": int(summary.bpe_tokens),
        "langs_seen": int(summary.langs_seen),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from keystone_spark import get_session

    spark = get_session("curate_corpus_app")
    print(json.dumps(curate(spark, args.sf_dir)))


if __name__ == "__main__":
    main()
