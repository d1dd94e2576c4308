"""Image classification app — the RandomPatchCifar shape (reference:
pipelines/images/cifar/RandomPatchCifar.scala): sample random patches from
training images, ZCA-whiten them, use the whitened patches as convolution
filters, then symmetric-rectify -> pool -> vectorize -> one-hot least
squares -> argmax -> evaluate.

The container ships no image codecs and the fixtures no CIFAR binaries, so
the app synthesizes a deterministic labeled image table (class encoded in
which half of the image is bright — the e2e-test generator, SURVEY §5.4
smoke-test pattern); swap ``synth_images`` for
``sources.loaders.binary_records`` + ``multimodal.decode_images`` to run on
real CIFAR records.

Run:  python -m keystone_spark.apps.image_classify [--n 200] [--filters 6]
Prints one JSON line with accuracy and the filter-bank shape.
"""

from __future__ import annotations

import argparse
import json

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SEED = 7


def synth_images(spark: SparkSession, n: int = 200, h: int = 12, w: int = 12) -> DataFrame:
    """Deterministic 2-class image table in the engine's image-struct
    schema (SURVEY §1: ImageSchema-style struct)."""
    rng = np.random.default_rng(_SEED)
    labels = rng.integers(0, 2, size=n)
    rows = []
    for i in range(n):
        img = rng.random((h, w, 1)) * 0.2
        if labels[i] == 1:
            img[:, : w // 2] += 1.0
        else:
            img[:, w // 2 :] += 1.0
        rows.append(
            (i, int(labels[i]),
             {"height": h, "width": w, "n_channels": 1,
              "data": img.astype(np.float32).ravel().tolist()})
        )
    return spark.createDataFrame(
        rows,
        "id int, label int, "
        "image struct<height:int,width:int,n_channels:int,data:array<float>>",
    )


def learn_filter_bank(
    df: DataFrame, patch_size: int, n_filters: int, sample_n: int = 64
) -> np.ndarray:
    """RandomPatcher -> flatten -> ZCA whiten -> take n_filters whitened
    patches as the convolution filter bank (the RandomPatchCifar trick:
    data-derived filters, no gradient training)."""
    from keystone_spark.operators.images import RandomPatcher
    from keystone_spark.operators.learning import ZCAWhitener
    from keystone_spark.operators.stats import ImageVectorizer

    sample = df.orderBy("id").limit(sample_n)
    patched = RandomPatcher(patch_size, n_patches=2, seed=_SEED, key_col="id")(
        sample, "image", "patches"
    )
    flat = ImageVectorizer("patch", "pvec")(
        patched.select("id", F.posexplode("patches").alias("pi", "patch"))
    )
    zca = ZCAWhitener("pvec", "white", eps=0.1)._fit(flat)
    white = zca(flat).orderBy("id", "pi").limit(n_filters).select("white").collect()
    return np.asarray([r[0] for r in white], dtype=np.float64)


def sift_fv_features(
    spark: SparkSession, df: DataFrame, k: int = 2, n_angles: int = 4
) -> DataFrame:
    """SIFT -> GMM -> FisherVector featurization (the ImageNetSiftLcsFV
    shape — reference: pipelines/images/imagenet/ImageNetSiftLcsFV.scala):
    dense-SIFT descriptors per image, a diagonal GMM fit on the pooled
    descriptors, then the improved-FV encoding as features."""
    from keystone_spark.operators.images import fisher_vector, sift_extract
    from keystone_spark.operators.learning import GaussianMixtureEstimator

    # small synth images: tight bins so the 4x4 descriptor grid fits
    sifted = sift_extract(df, "image", "sift", step=4, bin_size=2,
                          n_angles=n_angles)
    flat = sifted.select(F.explode("sift").alias("desc"))
    gmm = GaussianMixtureEstimator(k, in_col="desc", seed=_SEED)._fit(flat)
    gs = gmm.model.gaussiansDF.collect()
    means = np.array([r.mean.toArray() for r in gs])
    covs = np.maximum(np.array([np.diag(r.cov.toArray().reshape(len(r.mean), -1))
                                for r in gs]), 1e-4)
    fv = fisher_vector(sifted, gmm.weights, means, covs,
                       desc_col="sift", out_col="features")
    return fv


def build_and_eval(
    spark: SparkSession, n: int = 200, n_filters: int = 6,
    featurizer: str = "patches",
) -> dict:
    from keystone_spark.operators.evaluation import accuracy
    from keystone_spark.operators.images import Convolver, Pooler
    from keystone_spark.operators.learning import LeastSquaresEstimator
    from keystone_spark.operators.stats import (
        ClassLabelIndicators,
        ImageVectorizer,
        MaxClassifier,
        SymmetricRectifier,
    )

    df = synth_images(spark, n)
    if featurizer == "sift":
        feats = sift_fv_features(spark, df)
        filters = np.zeros((0, 0))
    else:
        p = 3
        filters = learn_filter_bank(df, p, n_filters)
        feats = Convolver(filters, p, p, 1)(df, "image", "conv")
        feats = Pooler(stride=5, pool="sum")(feats, "conv", "pooled")
        feats = ImageVectorizer("pooled", "features")(feats)
        feats = SymmetricRectifier("features")(feats)
    feats = ClassLabelIndicators(2)(feats)
    model = LeastSquaresEstimator("features", "y", reg_param=1e-6).fit(feats)
    scored = MaxClassifier("scores", "pred")(model(feats))
    return {
        "n_images": n,
        "featurizer": featurizer,
        "filter_bank": list(np.shape(filters)),
        "accuracy": round(accuracy(scored), 4),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--filters", type=int, default=6)
    ap.add_argument("--featurizer", choices=["patches", "sift"],
                    default="patches")
    args = ap.parse_args()

    from keystone_spark import get_session

    spark = get_session("image_classify")
    print(json.dumps(build_and_eval(spark, args.n, args.filters,
                                    featurizer=args.featurizer)))


if __name__ == "__main__":
    main()
