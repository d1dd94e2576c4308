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


def test_write_read_roundtrip_all_formats(spark, sf_dir, tmp_path):
    """parquet/orc/csv/json sink -> scan round trip preserves values;
    partition_by produces a prunable directory layout."""
    import pyspark.sql.functions as F

    from keystone_spark.sources.loaders import read_table_any, write_table
    from keystone_spark.sources.tables import load_table

    src = (
        load_table(spark, "nation", sf_dir)
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    )
    want = [tuple(r) for r in src.collect()]
    for fmt in ("parquet", "orc", "csv", "json"):
        p = str(tmp_path / fmt)
        write_table(src, p, fmt=fmt)
        back = read_table_any(spark, p, fmt=fmt, schema=src.schema)
        got = sorted(tuple(r) for r in back.collect())
        assert got == sorted(want), fmt

    # hive partitioning: reading one partition directory prunes the rest
    p = str(tmp_path / "part_layout")
    write_table(src, p, fmt="parquet", partition_by=["n_regionkey"])
    one = spark.read.parquet(p).where(F.col("n_regionkey") == 0)
    import os

    assert any(d.startswith("n_regionkey=") for d in os.listdir(p))
    assert one.count() == sum(1 for r in want if r[2] == 0)


def test_load_media_dir_decode_pipeline(spark, tmp_path):
    """binaryFile media lake -> decode_images(real) -> features: the
    ImageNet-loader shape on a directory of PNG files."""
    import numpy as np

    from keystone_spark.functions.codecs import encode_png
    from keystone_spark.operators.multimodal import decode_images, image_features
    from keystone_spark.sources.loaders import load_media_dir

    rng = np.random.default_rng(11)
    for i in range(4):
        img = rng.integers(0, 256, size=(6, 6, 3), dtype=np.uint8)
        (tmp_path / f"img_{i}.png").write_bytes(encode_png(img))
    (tmp_path / "notes.txt").write_text("not an image")

    media = load_media_dir(spark, str(tmp_path), glob="*.png")
    assert media.count() == 4  # glob filters the txt at listing time
    out = image_features(decode_images(media, decode="real"))
    rows = out.select("path", "img_features").collect()
    assert len(rows) == 4
    assert all(r.img_features is not None and len(r.img_features) == 6
               for r in rows)


def test_timeseries_layout_prunes_and_sorts(spark, sf_dir, tmp_path):
    """write_timeseries: a date filter must read ONLY that day's
    directory (partition pruning), and rows inside each file must be
    sorted by (user_id, ts) so row-group min/max stats are tight."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from keystone_spark.sources import load_table
    from keystone_spark.sources.loaders import write_timeseries

    events = load_table(spark, "events", sf_dir)
    out = str(tmp_path / "ts_table")
    write_timeseries(events, out)

    day = (
        events.select(F.to_date("ts").alias("d")).groupBy("d").count()
        .orderBy(F.col("count").desc()).first()["d"]
    )
    back = spark.read.parquet(out).where(F.col("event_date") == F.lit(day))
    # runtime file set (input_file_name reflects the PRUNED scan;
    # DataFrame.inputFiles() does not apply filters)
    files = {
        r["f"]
        for r in back.select(F.input_file_name().alias("f")).distinct().collect()
    }
    assert files, "day partition exists"
    assert all(f"event_date={day}" in f for f in files), files
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    want = events.where(F.to_date("ts") == F.lit(day)).count()
    assert back.count() == want

    t = pq.read_table(next(iter(files)).replace("file:", ""))
    pdf = t.to_pandas()[["user_id", "ts"]]
    assert list(pdf.itertuples(index=False)) == sorted(
        pdf.itertuples(index=False), key=lambda r: (r.user_id, r.ts)
    )


def test_zorder_layout_bounds_every_dimension(spark, sf_dir, tmp_path):
    """Z-order clustering must give every output file a tight min/max
    envelope on BOTH clustered columns (parquet stats then prune file
    reads for predicates on either); a linear sort bounds only its
    leading column — the second dimension's per-file span stays ~full
    range. Also: content survives the rewrite byte-for-byte."""
    import pyspark.sql.functions as F

    from keystone_spark.sources.tables import write_zorder

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "linear")
    write_zorder(li, ["l_orderkey", "l_partkey"], zpath, n_files=16)
    (
        li.repartitionByRange(16, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    def avg_span(path, col):
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name())
            .agg((F.max(col) - F.min(col)).alias("span"))
        )
        lo, hi = li.agg(F.min(col), F.max(col)).first()
        return per_file.agg(F.avg("span")).first()[0] / float(hi - lo)

    # leading dim: both layouts bound it
    assert avg_span(zpath, "l_orderkey") < 0.5
    assert avg_span(lpath, "l_orderkey") < 0.5
    # second dim: z-order bounds it, linear cannot
    z2, l2 = avg_span(zpath, "l_partkey"), avg_span(lpath, "l_partkey")
    assert z2 < 0.5, z2
    assert l2 > 0.9, l2

    # rewrite is lossless
    a = sorted(map(tuple, li.collect()))
    b = sorted(map(tuple, spark.read.parquet(zpath).collect()))
    assert a == b


def test_zorder_rejects_bad_args(spark, sf_dir, tmp_path):
    import pytest as _pytest

    from keystone_spark.sources.tables import write_zorder

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    with _pytest.raises(ValueError, match="at least 2"):
        write_zorder(li, ["l_orderkey"], str(tmp_path / "x"))
    with _pytest.raises(ValueError, match="63-bit"):
        write_zorder(li, ["l_orderkey", "l_partkey"], str(tmp_path / "y"),
                     bits=32)


def test_compact_files_rightsizes_and_preserves_rows(spark, tmp_path):
    from keystone_spark.sources.tables import compact_files

    src = str(tmp_path / "many")
    spark.range(10_000).selectExpr("id", "id % 7 AS k").repartition(
        40
    ).write.parquet(src)
    dst = str(tmp_path / "compacted")
    stats = compact_files(spark, src, dst, target_mb=128, sort_cols=["k"])
    assert stats["files_before"] == 40
    assert stats["files_after"] <= 2  # tiny data -> ~1 right-sized file
    a = spark.read.parquet(src).orderBy("id").collect()
    b = spark.read.parquet(dst).orderBy("id").collect()
    assert a == b


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC is a first-class Spark source: roundtrip preserves values and
    predicates reach the ORC scan (searchArgument pushdown)."""
    p = str(tmp_path / "orc")
    df = spark.range(1000).selectExpr("id", "id % 13 AS k",
                                      "CAST(id AS STRING) AS s")
    df.write.orc(p)
    back = spark.read.orc(p)
    assert back.count() == 1000
    assert back.where("k = 3").count() == df.where("k = 3").count()
    plan = back.where("k = 3")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(k), EqualTo(k,3)]" in plan or \
        "EqualTo(k,3)" in plan


def test_text_and_binaryfile_sources(spark, tmp_path):
    """text source: one row per line; binaryFile: (path, content) rows —
    the raw-ingest entries for document and media corpora."""
    d = tmp_path / "txt"
    d.mkdir()
    (d / "a.txt").write_text("alpha\nbeta\n")
    (d / "b.txt").write_text("gamma\n")
    lines = spark.read.text(str(d))
    assert sorted(r.value for r in lines.collect()) == [
        "alpha", "beta", "gamma"]
    blobs = spark.read.format("binaryFile").load(str(d))
    got = {r.path.split("/")[-1]: bytes(r.content) for r in blobs.collect()}
    assert got["a.txt"] == b"alpha\nbeta\n" and got["b.txt"] == b"gamma\n"


def test_parquet_zstd_codec_roundtrip(spark, tmp_path):
    p = str(tmp_path / "zstd")
    df = spark.range(5000).selectExpr("id", "repeat('x', 50) AS pad")
    df.write.option("compression", "zstd").parquet(p)
    import glob
    import pyarrow.parquet as pq
    f = glob.glob(p + "/*.parquet")[0]
    assert pq.ParquetFile(f).metadata.row_group(0).column(0).compression \
        == "ZSTD"
    assert spark.read.parquet(p).count() == 5000


def test_join_strategy_hints_are_honored(spark):
    big = spark.range(10_000).selectExpr("id AS k", "id AS a")
    small = spark.range(100).selectExpr("id AS k", "id AS b")

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    merged = big.join(small.hint("merge"), "k")
    assert "SortMergeJoin" in plan(merged)
    sh = big.join(small.hint("shuffle_hash"), "k")
    assert "ShuffledHashJoin" in plan(sh)
    bc = big.join(small.hint("broadcast"), "k")
    assert "BroadcastHashJoin" in plan(bc)


def test_ignore_corrupt_files_keeps_good_rows(spark, tmp_path):
    """One corrupt file in a 100 TB scan must not kill the job when the
    ops conf says skip-and-continue."""
    p = tmp_path / "mix"
    spark.range(500).write.parquet(str(p))
    (p / "part-corrupt.parquet").write_bytes(b"PAR1 this is not parquet")
    try:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
        assert spark.read.parquet(str(p)).count() == 500
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")


def test_metadata_columns_expose_provenance(spark, tmp_path):
    """_metadata.file_path/file_name give per-row provenance — the hook
    for quarantine-by-file and incremental reprocessing."""
    p = str(tmp_path / "prov")
    spark.range(10).write.parquet(p)
    rows = (
        spark.read.parquet(p)
        .select("id", "_metadata.file_name")
        .collect()
    )
    assert all(r.file_name.endswith(".parquet") for r in rows)


def test_corrupt_json_dead_letter_capture(spark):
    """PERMISSIVE JSON parsing routes malformed payloads to the
    _corrupt_record column instead of failing the job — the dead-letter
    pattern for semi-structured ingest."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    rows = [('{"k": 1}',), ("{not json",), ('{"k": 3}',), (None,)]
    df = spark.createDataFrame(rows, ["raw"])
    schema = StructType([
        StructField("k", StringType()),
        StructField("_corrupt_record", StringType()),
    ])
    parsed = df.select(
        "raw",
        F.from_json("raw", schema,
                    {"mode": "PERMISSIVE",
                     "columnNameOfCorruptRecord": "_corrupt_record"}).alias("j"),
    ).select("raw", "j.k", F.col("j._corrupt_record").alias("bad"))
    got = parsed.collect()
    ok = [r for r in got if r.k is not None]
    dead = [r for r in got if r.bad is not None]
    assert len(ok) == 2 and {r.k for r in ok} == {"1", "3"}
    assert len(dead) == 1 and dead[0].raw == "{not json"


def test_ensure_parallelism_branches(spark, tmp_path):
    """VERDICT r9 #7 / ADVICE r9: the width probe is driver-side
    metadata in EVERY branch — many-files no-op, big-single-file no-op
    (split estimate from the session's maxPartitionBytes, not a
    hardcoded 128 MB), small-local respread, remote-scheme respread
    (never size-probed), fileless respread."""
    from pyspark.sql import functions as F

    from keystone_spark.sources.tables import (
        _max_partition_bytes,
        ensure_parallelism,
    )

    # many leaf files >= n: returned UNTOUCHED (object identity — no
    # repartition node added)
    many = str(tmp_path / "many")
    spark.range(100).repartition(4).write.parquet(many)
    df_many = spark.read.parquet(many)
    assert len(df_many.inputFiles()) >= 4
    assert ensure_parallelism(df_many, min_parts=4) is df_many

    # small single local file < n splits: respread to n
    small = str(tmp_path / "small")
    spark.range(100).coalesce(1).write.parquet(small)
    df_small = spark.read.parquet(small)
    out = ensure_parallelism(df_small, min_parts=4)
    assert out is not df_small
    assert out.count() == 100

    # big single file: maxPartitionBytes (read from the conf) says the
    # scan itself splits wide enough -> no-op even with ONE file
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1kb")
        assert _max_partition_bytes(spark) == 1024
        big = str(tmp_path / "big")
        spark.range(0, 50_000).select(
            F.col("id"), F.concat(F.lit("x" * 64), F.col("id")).alias("pad")
        ).coalesce(1).write.parquet(big)
        df_big = spark.read.parquet(big)
        assert len(df_big.inputFiles()) == 1
        assert ensure_parallelism(df_big, min_parts=4) is df_big
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)

    # remote scheme: sized through the Hadoop FileSystem API (no such
    # FS on this classpath -> conservative respread, never a stage
    # execution); a file:// URI through the same API stats correctly
    import os as _os
    from urllib.parse import urlparse as _urlparse

    from keystone_spark.sources.tables import _hadoop_file_size

    one = df_small.inputFiles()[0]
    assert _hadoop_file_size(spark, one) == _os.path.getsize(
        _urlparse(one).path
    )
    df_remote = spark.range(10)
    df_remote.inputFiles = lambda: ["s3a://bucket/part-0.parquet"]
    out = ensure_parallelism(df_remote, min_parts=4)
    assert out is not df_remote and out.count() == 10

    # fileless in-memory lineage: respread unconditionally (no .rdd
    # probe — that executes AQE query stages)
    df_mem = spark.createDataFrame([(1,), (2,)], ["a"])
    assert df_mem.inputFiles() == []
    out = ensure_parallelism(df_mem, min_parts=4)
    assert out is not df_mem and out.count() == 2


def test_max_partition_bytes_suffix_parse(spark):
    from keystone_spark.sources.tables import _max_partition_bytes

    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        for raw, want in [("134217728b", 134217728), ("64m", 64 << 20),
                          ("64mb", 64 << 20), ("2g", 2 << 30),
                          ("512k", 512 << 10), ("1000", 1000)]:
            spark.conf.set("spark.sql.files.maxPartitionBytes", raw)
            assert _max_partition_bytes(spark) == want, raw
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
