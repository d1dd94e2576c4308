"""Corpus-curation operators for training-data pipelines: token-budget
sequence packing, stratified sampling, weighted source mixing.

These extend the reference surface per the project north star (SURVEY §2.11
— LLM-data ops); none exist in amplab/keystone. All are declarative
window/sample compositions — no Python in the data path — so they scale as
ordinary Spark shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    partition_cols: list[str] | None = None,
    order_cols: list[str] | None = None,
    out_col: str = "pack_id",
) -> DataFrame:
    """Assign documents to fixed token-budget packs (greedy in-order fill):
    pack_id = floor((running_sum(tokens) - tokens) / budget) within each
    partition. Documents longer than the budget get a pack of their own
    (they start at a fresh boundary for every doc that follows).

    This is sequence packing for LLM pretraining shards done as ONE window
    cumsum — no driver loop, no UDF; partition_cols (e.g. source/lang)
    bound window state so each group packs independently and in parallel.
    The greedy-in-order policy is deterministic given order_cols.
    """
    parts = partition_cols or []
    order = order_cols or []
    w = Window.partitionBy(*parts).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    run = F.sum(F.col(token_col)).over(w)
    return df.withColumn(
        out_col,
        F.floor((run - F.col(token_col)) / F.lit(budget)).cast("long"),
    )


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sampling (df.sampleBy): deterministic given
    seed, no shuffle (map-side filter)."""
    return df.sampleBy(strata_col, fractions, seed=seed)


def sample_mixture(
    sources: dict[str, DataFrame], weights: dict[str, float], seed: int = 42
) -> DataFrame:
    """Weighted mixture of corpora: per-source Bernoulli sample at the
    given rate, tagged with its source name, unioned. Rates > 1.0 mean
    oversampling via withReplacement (duplication is intentional for
    up-weighting small high-quality sources). Union is metadata-only;
    the samples are map-side filters — nothing shuffles."""
    out = None
    for name, df in sources.items():
        w = float(weights.get(name, 1.0))
        part = (
            df.sample(withReplacement=True, fraction=w, seed=seed)
            if w > 1.0
            else df.sample(fraction=w, seed=seed)
        )
        part = part.withColumn("mix_source", F.lit(name))
        out = part if out is None else out.unionByName(part)
    return out
