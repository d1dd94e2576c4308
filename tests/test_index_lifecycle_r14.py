"""Round-14 lifecycle fixes — the four ADVICE r13 findings plus the
VERDICT r13 "next round" items: publish-vs-GC re-validation under the
lock (#1), checked schema-pinning casts on vector appends (#2), the
pre-r11 bm25 status guard (#3), lock mtime surfacing (r13 verdict #7),
occupancy-gated + rate-limited streaming auto-retrain (verdict #1,
ADVICE #4), zero-padded auto-snapshot epochs (verdict #3), and
manifest-carried index stats (verdict #4)."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from keystone_spark import fsutil


def _vecs(spark, ids, dim=8, seed=0):
    rng = np.random.default_rng(seed)
    rows = [(int(i), rng.standard_normal(dim).tolist()) for i in ids]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")


# ------------------------------------------------ ADVICE r13 #1: publish race


def test_publish_pointer_revalidates_target_under_lock(
    spark, tmp_path, monkeypatch
):
    """A GC that wins the race and deletes the target between publish's
    pre-check and its lock acquisition must fail the publish loudly,
    leaving the old pointer intact — not publish a pointer to a deleted
    snapshot."""
    from keystone_spark.fsutil import publish_pointer

    root = str(tmp_path / "root")
    for v in ("v0", "v1"):
        spark.range(3).write.parquet(f"{root}/{v}/t")
    fsutil.write_latest_pointer(spark, root, "v0")

    real_acquire = fsutil.acquire_compact_lock

    def acquire_after_gc_won(s, path):
        # simulate the concurrent gc_snapshots holding the lock first
        # and deleting the non-current target, then releasing — the
        # window ADVICE r13 #1 describes
        fsutil.fs_delete(s, f"{root}/v1")
        real_acquire(s, path)

    monkeypatch.setattr(fsutil, "acquire_compact_lock", acquire_after_gc_won)
    with pytest.raises(ValueError, match="vanished"):
        publish_pointer(spark, root, "v1")
    monkeypatch.undo()
    # old pointer intact, lock released
    assert fsutil.read_latest_pointer(spark, root) == "v0"
    assert not fsutil.fs_exists(spark, f"{root}/v0/{fsutil.COMPACT_LOCK}")


# -------------------------------------------- ADVICE r13 #2: checked casts


def test_ivf_add_rejects_nulling_cast(spark, tmp_path):
    """Non-ANSI mode turns an un-castable id into NULL; a nulled id row
    would dodge every skip_existing_ids anti-join and duplicate on
    replay — the add must refuse the batch instead."""
    from keystone_spark.operators.similarity import IvfIndex

    path = str(tmp_path / "ivf")
    IvfIndex.build(_vecs(spark, range(40)), n_cells=4).save(path)

    bad = spark.createDataFrame(
        [("not-an-id", [0.1] * 8)], "vec_id string, embedding array<double>")
    with pytest.raises(ValueError, match="cast"):
        IvfIndex.add(spark, path, bad)
    # nothing appended
    idx = IvfIndex.load(spark, path)
    assert idx.indexed.where(F.col("vec_id").isNull()).count() == 0
    assert idx.indexed.count() == 40
    # lock released (the guard raised inside the locked span)
    assert not fsutil.fs_exists(spark, f"{path}/{fsutil.WRITE_LOCK}")

    # a castable string id is fine — schema pinning, not type policing
    ok = spark.createDataFrame(
        [("100", [0.1] * 8)], "vec_id string, embedding array<double>")
    stats = IvfIndex.add(spark, path, ok)
    assert stats["vectors_added"] == 1
    assert IvfIndex.load(spark, path).indexed.where(
        F.col("vec_id") == 100).count() == 1


def test_ivfpq_add_rejects_nulling_cast(spark, tmp_path):
    from keystone_spark.operators.similarity import IvfPqIndex

    path = str(tmp_path / "pq")
    IvfPqIndex.build(_vecs(spark, range(64)), n_cells=4, m=4, ks=8).save(path)
    bad = spark.createDataFrame(
        [("oops", [0.1] * 8)], "vec_id string, embedding array<double>")
    with pytest.raises(ValueError, match="cast"):
        IvfPqIndex.add(spark, path, bad)
    idx = IvfPqIndex.load(spark, path)
    assert idx.indexed.where(F.col("vec_id").isNull()).count() == 0
    assert not fsutil.fs_exists(spark, f"{path}/{fsutil.WRITE_LOCK}")


# ------------------------------------- ADVICE r13 #3: pre-r11 bm25 status


def test_index_status_pre_r11_bm25_params(spark, tmp_path):
    """A legacy single-row params manifest (no generation AND no
    committed column) must be REPORTED as one committed generation, not
    raise — the module's stated contract."""
    from keystone_spark.operators.nlp import Bm25Index
    from keystone_spark.status import index_status

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "b c d"), (3, "c d e")],
        "doc_id long, text string",
    ).select("doc_id", F.split("text", " ").alias("toks"))
    path = str(tmp_path / "bm25")
    Bm25Index.build(docs, n_term_buckets=2).save(path)
    # rewrite params in the pre-r11 single-row shape
    legacy = spark.read.parquet(f"{path}/params").drop(
        "generation", "committed").limit(1)
    legacy.persist().count()
    legacy.write.mode("overwrite").parquet(f"{path}/params_legacy")
    fsutil.fs_delete(spark, f"{path}/params")
    fsutil.fs_rename(spark, f"{path}/params_legacy", f"{path}/params")

    st = index_status(spark, path)
    assert st["family"] == "bm25"
    assert st["committed_generations"] == 1
    assert st["orphan_generations"] == 0
    assert st["n_docs"] == 3
    # raw lock mtime rides along with the age (VERDICT r13 #7)
    assert st["write_lock_mtime_ms"] is None
    fsutil.acquire_write_lock(spark, path)
    try:
        st2 = index_status(spark, path)
        assert isinstance(st2["write_lock_mtime_ms"], int)
        assert st2["write_lock_mtime_ms"] > 10**12  # epoch ms, sane
    finally:
        fsutil.release_write_lock(spark, path)
