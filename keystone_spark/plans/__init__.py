from keystone_spark.plans.pipeline import (
    Transformer,
    ColumnTransformer,
    Estimator,
    LabelEstimator,
    Pipeline,
    FittedPipeline,
    gather,
    Identity,
    Cacher,
)
from keystone_spark.plans.optimizer import choose_solver, auto_cache_plan

__all__ = [
    "Transformer",
    "ColumnTransformer",
    "Estimator",
    "LabelEstimator",
    "Pipeline",
    "FittedPipeline",
    "gather",
    "Identity",
    "Cacher",
    "choose_solver",
    "auto_cache_plan",
]
