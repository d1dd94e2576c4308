"""Loader tests over temp files (reference: loaders suites)."""

import json
import os

import pytest

from keystone_spark.sources.loaders import (
    binary_records,
    csv_vectors,
    json_reviews,
    labeled_text_dirs,
)


def test_csv_vectors(spark, tmp_path):
    p = tmp_path / "v.csv"
    p.write_text("1.0,2.0,3.0\n4.0,5.0,6.0\n")
    df = csv_vectors(spark, str(p))
    feats = sorted(r.features for r in df.collect())
    assert feats == [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]


def test_json_reviews(spark, tmp_path):
    p = tmp_path / "r.json"
    lines = [
        {"reviewText": "great product", "overall": 5.0},
        {"reviewText": "terrible", "overall": 1.0},
    ]
    p.write_text("\n".join(json.dumps(x) for x in lines))
    out = {r.text: r.label for r in json_reviews(spark, str(p)).collect()}
    assert out == {"great product": 1, "terrible": 0}


def test_labeled_text_dirs(spark, tmp_path):
    for cls, texts in {"sports": ["goal", "match"], "tech": ["cpu"]}.items():
        d = tmp_path / "corpus" / cls
        d.mkdir(parents=True)
        for i, t in enumerate(texts):
            (d / f"{i}.txt").write_text(t)
    df = labeled_text_dirs(spark, str(tmp_path / "corpus" / "*"))
    rows = {(r.text, r.class_name) for r in df.collect()}
    assert ("goal", "sports") in rows and ("cpu", "tech") in rows
    idx = {r.class_name: r.label_idx for r in df.collect()}
    assert idx["sports"] == 0  # most frequent class gets index 0


def test_binary_records(spark, tmp_path):
    p = tmp_path / "data.bin"
    p.write_bytes(bytes(range(12)))
    df = binary_records(spark, str(p), record_bytes=4)
    recs = {r.record_idx: bytes(r.record) for r in df.collect()}
    assert len(recs) == 3
    assert recs[1] == bytes([4, 5, 6, 7])


def test_sink_roundtrip_parquet_csv_json(spark, tmp_path):
    """§2.11 sinks: parquet/csv/json write -> read round-trip."""
    import pyspark.sql.functions as F

    df = spark.range(10).select("id", (F.col("id") * 2).alias("v"))
    expect = [(i, 2 * i) for i in range(10)]
    for fmt in ("parquet", "csv", "json"):
        path = str(tmp_path / fmt)
        w = df.write.mode("overwrite")
        if fmt == "csv":
            w = w.option("header", True)
        getattr(w, fmt)(path)
        r = spark.read
        if fmt == "csv":
            r = r.option("header", True).option("inferSchema", True)
        back = getattr(r, fmt)(path)
        assert sorted((x.id, x.v) for x in back.collect()) == expect
