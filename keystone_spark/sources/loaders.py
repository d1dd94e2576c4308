"""Dataset loaders beyond the parquet fixtures (reference:
src/main/scala/loaders/).

Each reference loader becomes a declarative ``spark.read`` + normalization,
so format decoding stays in the JVM data source (with pushdown) and only
the domain mapping is ours.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def csv_vectors(
    spark: SparkSession,
    path: str,
    delimiter: str = ",",
    header: bool = False,
) -> DataFrame:
    """CSV of numbers -> (row_id, features array<double>)
    (reference: loaders/CsvDataLoader.scala: split + toDouble per line).

    Reads every column as double via schema inference, then packs into one
    array column; monotonically_increasing_id gives a stable per-row id
    (unique, not dense — dense ids at 100 TB would force a global sort).
    """
    df = (
        spark.read.option("delimiter", delimiter)
        .option("header", str(header).lower())
        .option("inferSchema", "true")
        .csv(path)
    )
    arr = F.array(*[F.col(c).cast("double") for c in df.columns])
    return df.select(
        F.monotonically_increasing_id().alias("row_id"), arr.alias("features")
    )


def json_reviews(
    spark: SparkSession,
    path: str,
    text_field: str = "reviewText",
    rating_field: str = "overall",
    threshold: float = 3.5,
) -> DataFrame:
    """JSON reviews -> (text, label) with binary label from the star rating
    (reference: loaders/AmazonReviewsDataLoader.scala — keystone's one real
    SQL touchpoint)."""
    df = spark.read.json(path)
    return df.select(
        F.col(text_field).alias("text"),
        F.when(F.col(rating_field) >= threshold, 1).otherwise(0).alias("label"),
    )


def labeled_text_dirs(spark: SparkSession, root_glob: str) -> DataFrame:
    """Directory-per-class text corpus -> (text, class_name, label_idx)
    (reference: loaders/NewsgroupsDataLoader.scala — class = dir name).

    Label comes from input_file_name(), so adding classes is just adding
    directories; the id mapping is frequency-ranked for stability.
    """
    df = spark.read.text(root_glob).select(
        F.col("value").alias("text"),
        F.regexp_extract(F.input_file_name(), r".*/([^/]+)/[^/]+$", 1).alias(
            "class_name"
        ),
    )
    classes = (
        df.groupBy("class_name").count().orderBy(F.col("count").desc(), "class_name")
    )
    from pyspark.sql import Window

    idx = classes.select(
        "class_name",
        (F.row_number().over(Window.orderBy(F.col("count").desc(), "class_name")) - 1
         ).alias("label_idx"),
    )
    return df.join(F.broadcast(idx), "class_name").select(
        "text", "class_name", "label_idx"
    )


def binary_records(
    spark: SparkSession, path: str, record_bytes: int
) -> DataFrame:
    """Fixed-width binary record files -> (file, record_idx, record bytes)
    (reference: loaders/CifarLoader.scala — 1B label + 3072B pixels records).

    Spark's binaryFile source reads whole files; records are split in an
    Arrow pass. For CIFAR-shaped data, follow with a decode that slices
    label/pixels from each record.
    """
    import pandas as pd
    from typing import Iterator
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    schema = StructType(
        [
            StructField("path", StringType()),
            StructField("record_idx", LongType()),
            StructField("record", BinaryType()),
        ]
    )

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                blob = bytes(r["content"])
                for i in range(len(blob) // record_bytes):
                    rows.append(
                        (r["path"], i, blob[i * record_bytes : (i + 1) * record_bytes])
                    )
            yield pd.DataFrame(rows, columns=["path", "record_idx", "record"])

    return files.mapInPandas(split, schema)


def load_media_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Whole-file media ingestion via Spark's binaryFile source
    (reference: loaders/ImageNetLoader.scala reads image archives; here
    each file is one row of (path, modificationTime, length, content)).
    Chain with ``operators.multimodal.decode_images`` /``decode_audio``
    (decode='real') for codec decoding.

    Scale notes: binaryFile parallelizes across files (one file is never
    split), applies ``pathGlobFilter`` at listing time, and prunes the
    ``content`` column when only metadata is selected — so counting or
    size-histogramming a 100 TB media lake never reads payload bytes.
    """
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)


_SINK_FORMATS = ("parquet", "orc", "csv", "json")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    """Generic columnar/text sink: parquet | orc | csv | json, optional
    hive-style ``partition_by`` layout (directory-level partition pruning
    on read-back — the 100 TB table layout primitive). CSV writes a
    header so round-trips keep column names."""
    if fmt not in _SINK_FORMATS:
        raise ValueError(f"fmt must be one of {_SINK_FORMATS}")
    w = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        w = w.option("header", True)
    for k, v in options.items():
        w = w.option(k, v)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_table_any(
    spark: SparkSession, path: str, fmt: str = "parquet", schema=None, **options
) -> DataFrame:
    """Read back any ``write_table`` output. For CSV pass ``schema`` (or
    rely on the header + inferSchema for ad-hoc use — avoid inference on
    large data: it costs an extra full scan)."""
    if fmt not in _SINK_FORMATS:
        raise ValueError(f"fmt must be one of {_SINK_FORMATS}")
    r = spark.read.format(fmt)
    if fmt == "csv":
        r = r.option("header", True)
        if schema is None:
            r = r.option("inferSchema", True)
    if schema is not None:
        r = r.schema(schema)
    for k, v in options.items():
        r = r.option(k, v)
    return r.load(path)


def write_timeseries(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    key_col: str = "user_id",
    date_col: str = "event_date",
) -> None:
    """Hypertable layout for time-series tables: hive-partition by event
    DATE, and within each day range-partition + sort by (key, ts).

    Two-level pruning on read-back — date predicates prune whole
    directories before any IO; key/ts predicates prune parquet row groups
    via min/max statistics, which the sort makes tight (each row group
    covers a narrow key range instead of a random shuffle of keys). Per-key
    scans are sequential within a file. This is the layout that keeps a
    100 TB events table queryable: a one-day, one-user query touches one
    directory and a handful of row groups."""
    d = df.withColumn(date_col, F.to_date(F.col(ts_col)))
    d = d.repartitionByRange(date_col, key_col).sortWithinPartitions(
        date_col, key_col, ts_col
    )
    write_table(d, path, partition_by=[date_col])
