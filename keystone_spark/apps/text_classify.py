"""Language classification over the documents fixture — the
AmazonReviewsPipeline shape (reference:
pipelines/text/AmazonReviewsPipeline.scala): tokenize -> n-grams ->
top-k sparse features -> logistic regression -> confusion-matrix SQL.

Run:  python -m keystone_spark.apps.text_classify [--sf-dir DIR] [--k 256]
Prints one JSON line with accuracy + per-class support.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import functions as F


def build_and_eval(spark, sf_dir: str, k: int = 256) -> dict:
    from keystone_spark.operators.evaluation import accuracy, confusion_matrix
    from keystone_spark.operators.learning import LogisticRegressionEstimator
    from keystone_spark.operators.nlp import CommonSparseFeatures, Tokenizer
    from keystone_spark.sources import load_table

    docs = load_table(spark, "documents", sf_dir)
    langs = [r.lang for r in docs.select("lang").distinct().orderBy("lang").collect()]
    lang_idx = {l: i for i, l in enumerate(langs)}
    mapping = F.create_map(*[x for l, i in lang_idx.items() for x in (F.lit(l), F.lit(i))])
    labeled = docs.select(
        "doc_id", "text", F.element_at(mapping, F.col("lang")).alias("label")
    )

    toks = Tokenizer("text")(labeled)
    sparse_model = CommonSparseFeatures(k, in_col="tokens").fit(toks)
    feats = sparse_model(toks).withColumn(
        "features",
        F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda i: F.when(F.array_contains("sparse", i), 1.0).otherwise(0.0),
        ),
    )
    feats = feats.persist()  # fit + transform reuse (AutoCacheRule R2)
    model = LogisticRegressionEstimator().fit(feats)
    scored = model(feats)
    acc = accuracy(scored)
    cm = confusion_matrix(scored).collect()
    feats.unpersist()
    return {
        "app": "text_classify",
        "n_docs": labeled.count(),
        "classes": langs,
        "accuracy": round(acc, 4),
        "confusion_nonzero": len(cm),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--k", type=int, default=256)
    args = ap.parse_args()

    from keystone_spark import get_session

    spark = get_session("text_classify_app")
    print(json.dumps(build_and_eval(spark, args.sf_dir, args.k)))


if __name__ == "__main__":
    main()
