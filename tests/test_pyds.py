"""Python DataSource API: the binary_records custom source must scan in
parallel byte-range partitions and push record_idx range filters into
the Python reader (skipping I/O, not just rows)."""

import pyspark.sql.functions as F
import pytest

from keystone_spark.sources.pyds import (
    BinaryRecordsReader,
    register_binary_records,
)

REC = 16  # record size for fixtures


@pytest.fixture()
def bin_dir(tmp_path):
    # two files x 64 records, globally indexed 0..127
    for fi in range(2):
        payload = b"".join(
            bytes([fi]) + (fi * 64 + i).to_bytes(4, "little") + bytes(REC - 5)
            for i in range(64)
        )
        (tmp_path / f"part-{fi}.bin").write_bytes(payload)
    return str(tmp_path / "*.bin")


def test_reads_all_records_in_order(spark, bin_dir):
    register_binary_records(spark)
    df = (
        spark.read.format("binary_records")
        .option("path", bin_dir)
        .option("record_bytes", REC)
        .option("partition_records", 10)  # forces many partitions
        .load()
    )
    rows = df.select("record_idx", "record").collect()
    assert len(rows) == 128
    got = {r.record_idx: bytes(r.record) for r in rows}
    assert int.from_bytes(got[70][1:5], "little") == 70  # payload intact
    assert sorted(got) == list(range(128))


def test_filter_pushdown_skips_io(spark, bin_dir):
    register_binary_records(spark)
    df = (
        spark.read.format("binary_records")
        .option("path", bin_dir)
        .option("record_bytes", REC)
        .load()
    )
    out = df.where((F.col("record_idx") >= 60) & (F.col("record_idx") < 70))
    assert sorted(r.record_idx for r in out.collect()) == list(range(60, 70))
    # the range crosses the file boundary (64): both files contribute
    assert out.select("file").distinct().count() == 2

    # equality prunes to a single record
    one = df.where(F.col("record_idx") == 100).collect()
    assert len(one) == 1 and one[0].record_idx == 100


def test_pushdown_narrows_partitions_directly(bin_dir, tmp_path):
    """Unit-level: pushed bounds must shrink the planned byte ranges —
    the reader plans ONLY the surviving records, not filter-after-read."""
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan, StringContains

    r = BinaryRecordsReader(
        {"path": bin_dir, "record_bytes": str(REC), "partition_records": "1000"}
    )
    leftover = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("record_idx",), 100),
                LessThan(("record_idx",), 120),
                StringContains(("file",), "part"),  # unsupported -> returned
            ]
        )
    )
    assert len(leftover) == 1 and isinstance(leftover[0], StringContains)
    parts = r.partitions()
    assert sum(p.n_recs for p in parts) == 20
    assert all(p.start_rec >= 100 for p in parts)


def test_empty_match_yields_empty_scan(spark, bin_dir):
    register_binary_records(spark)
    df = (
        spark.read.format("binary_records")
        .option("path", bin_dir)
        .option("record_bytes", REC)
        .load()
    )
    assert df.where(F.col("record_idx") > 10_000).count() == 0


def test_stream_reader_batches_by_file_arrival(spark, tmp_path):
    """Streaming form: files ingested exactly once across two AvailableNow
    runs sharing a checkpoint (offset = sorted-file count), with records
    read on executors via record-range partitions."""
    import tempfile

    register_binary_records(spark)
    src = tmp_path / "stream_src"
    src.mkdir()

    def write_file(fi, n=20):
        payload = b"".join(
            (fi * 1000 + i).to_bytes(4, "little") + bytes(REC - 4)
            for i in range(n)
        )
        (src / f"f{fi:03d}.bin").write_bytes(payload)

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("binary_records")
            .option("path", f"{src}/*.bin")
            .option("record_bytes", REC)
            .option("partition_records", 7)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_file(0)
    write_file(1)
    drain()
    got = spark.read.parquet(out)
    assert got.count() == 40

    write_file(2)  # arrives later -> next run's batch only
    drain()
    got = spark.read.parquet(out)
    assert got.count() == 60  # earlier files NOT re-ingested
    firsts = sorted(
        int.from_bytes(bytes(r.record)[:4], "little")
        for r in got.where("record_idx % 20 = 0").collect()
    )
    assert firsts == [0, 1000, 2000]


def test_writer_roundtrip_and_overwrite(spark, tmp_path):
    """Custom sink: records written executor-side land atomically via the
    two-phase commit, and read back identical through the custom reader;
    overwrite mode replaces prior part files."""
    import pyspark.sql.functions as F

    register_binary_records(spark)
    out = str(tmp_path / "sink")
    df = spark.range(100).select(
        F.concat(
            F.col("id").cast("binary"),  # 8-byte big-endian id
            F.lit(bytes(REC - 8)),
        ).alias("record")
    ).repartition(4)
    df.write.format("binary_records").option("path", out).option(
        "record_bytes", REC
    ).mode("append").save()

    back = (
        spark.read.format("binary_records")
        .option("path", f"{out}/part-*.bin")
        .option("record_bytes", REC)
        .load()
    )
    assert back.count() == 100
    ids = sorted(
        int.from_bytes(bytes(r.record)[:8], "big") for r in back.collect()
    )
    assert ids == list(range(100))
    import glob as g
    assert not g.glob(f"{out}/._tmp-*")  # temps cleaned up

    # overwrite replaces content
    df.limit(10).write.format("binary_records").option("path", out).option(
        "record_bytes", REC
    ).mode("overwrite").save()
    back2 = (
        spark.read.format("binary_records")
        .option("path", f"{out}/part-*.bin")
        .option("record_bytes", REC)
        .load()
    )
    assert back2.count() == 10


def test_writer_append_accumulates(spark, tmp_path):
    """ADVICE r3: mode('append') onto a non-empty sink must ADD part files,
    never silently replace previously committed ones — two appends of 10
    records leave 20, with all payloads intact."""
    import pyspark.sql.functions as F

    register_binary_records(spark)
    out = str(tmp_path / "append_sink")

    def write_ids(lo, hi):
        df = spark.range(lo, hi).select(
            F.concat(
                F.col("id").cast("binary"),
                F.lit(bytes(REC - 8)),
            ).alias("record")
        ).repartition(2)
        df.write.format("binary_records").option("path", out).option(
            "record_bytes", REC
        ).mode("append").save()

    write_ids(0, 10)
    write_ids(10, 20)
    back = (
        spark.read.format("binary_records")
        .option("path", f"{out}/part-*.bin")
        .option("record_bytes", REC)
        .load()
    )
    ids = sorted(
        int.from_bytes(bytes(r.record)[:8], "big") for r in back.collect()
    )
    assert ids == list(range(20)), "second append clobbered the first"
    import glob as g
    names = sorted(g.glob(f"{out}/part-*.bin"))
    assert len(names) == 4  # 2 tasks x 2 appends, distinct indices
