"""Mergeable-sketch aggregations beyond Spark's built-ins (HLL++ =
approx_count_distinct, t-digest = approx_percentile): Count-Min heavy
hitters over an unbounded key domain.

Scale design (100 TB token streams):
- The CMS is a fixed (depth x width) uint64 grid — the distributed
  aggregation is a commutative SUM of small dense arrays, so it runs as
  map-side partial sketches + a TREE reduce (depth-2 treeReduce), never a
  shuffle of the raw keys. Sketch size is independent of cardinality:
  4 x 65536 x 8 B = 2 MiB per partial regardless of how many distinct
  tokens the partition saw.
- CMS answers point queries but cannot enumerate keys, so candidates come
  from per-partition local top-(4k) exact counts (bounded: 4k rows per
  partition, one small collect), the standard candidate-set construction.
  Final answer = top-k candidates by sketch estimate.
- Hashing is vectorized numpy (same splitmix-style mixing as the minhash
  kernels); the Python crossing is one mapInPandas over Arrow batches.
- Guarantee: estimate >= true count always; overestimate <= eps*N with
  prob 1-delta for width=e/eps, depth=ln(1/delta). At fixture scale the
  default width makes collisions vanishingly rare, so estimates are
  EXACT and the declared query hash-matches an exact SQL oracle; the
  sketch machinery (partials, merge, point query) is what's exercised.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _hash_rows(keys: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(n,) uint64 key hashes -> (depth, n) int32 column indices."""
    rows = []
    h = keys.copy()
    with np.errstate(over="ignore"):  # uint64 wrap is the hash semantics
        for d in range(depth):
            h = (h ^ (h >> np.uint64(33))) * _MIX + np.uint64(d * 2 + 1)
            rows.append((h % np.uint64(width)).astype(np.int64))
    return np.stack(rows)


def _key_hash(s: pd.Series) -> np.ndarray:
    """Stable 64-bit FNV-1a over utf-8 bytes, vectorized as a padded byte
    matrix: one whole-array xor-mul per byte POSITION (max key length
    iterations), not a Python loop per key x byte — on a high-cardinality
    string column the per-batch distinct set is exactly where the time
    goes, so the arithmetic must stay in numpy."""
    n = len(s)
    out = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    if n == 0:
        return out
    enc = [str(v).encode("utf-8") for v in s]
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=n)
    max_len = int(lens.max())
    if max_len == 0:
        return out
    mat = np.zeros((n, max_len), dtype=np.uint64)
    for i, b in enumerate(enc):  # memcpy fill only; no arithmetic here
        mat[i, : lens[i]] = np.frombuffer(b, dtype=np.uint8)
    prime = np.uint64(0x100000001B3)
    with np.errstate(over="ignore"):  # uint64 wrap is the hash semantics
        for j in range(max_len):
            out = np.where(lens > j, (out ^ mat[:, j]) * prime, out)
    return out


def count_min_topk(
    df: DataFrame,
    col: str,
    k: int = 20,
    depth: int = 4,
    width: int = 1 << 16,
    candidates_per_partition: int | None = None,
) -> list[tuple[str, int]]:
    """Top-k heavy hitters of ``df[col]`` by Count-Min estimate.
    Returns [(key, estimated_count)] sorted by (-count, key).

    Fit-time reduction (like the estimators): partial sketches + local
    candidates per partition -> treeReduce merge -> point-query the
    merged sketch for the global candidate union. Only sketches and
    bounded candidate sets ever leave executors."""
    cpp = candidates_per_partition or 4 * k

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sketch = np.zeros((depth, width), dtype=np.int64)
        local: dict = {}
        for pdf in batches:
            vals = pdf[col].dropna().astype(str)
            if vals.empty:
                continue
            counts = vals.value_counts()
            keys = _key_hash(pd.Series(counts.index))
            idx = _hash_rows(keys, depth, width)
            c = counts.to_numpy(dtype=np.int64)
            for d in range(depth):
                np.add.at(sketch[d], idx[d], c)
            for key, n in counts.items():
                local[key] = local.get(key, 0) + int(n)
        top = sorted(local.items(), key=lambda kv: (-kv[1], kv[0]))[:cpp]
        yield pd.DataFrame(
            {
                "sketch": [sketch.tobytes()],
                "cands": [[t[0] for t in top]],
            }
        )

    partials = df.select(col).mapInPandas(
        part, schema="sketch binary, cands array<string>"
    )
    rdd = partials.rdd.map(
        lambda r: (
            np.frombuffer(bytes(r["sketch"]), dtype=np.int64).reshape(
                depth, width
            ),
            set(r["cands"]),
        )
    )

    def _merge(a, b):
        # Candidate union is CAPPED at every merge: rank the union by the
        # merged partial sketch's point estimate and keep the top cpp.
        # Without the cap the root of the tree sees up to
        # cpp * n_partitions candidates — unbounded at 100 TB partition
        # counts. CMS estimates only grow under further merging, so a key
        # in the true global top-k is (with the sketch's 1-delta
        # probability) also in the top-cpp of every partial that saw it.
        sk = a[0] + b[0]
        cands = a[1] | b[1]
        if len(cands) > cpp:
            cl = sorted(cands)
            idx = _hash_rows(_key_hash(pd.Series(cl)), depth, width)
            est = np.min(np.stack([sk[d][idx[d]] for d in range(depth)]), axis=0)
            keep = np.argsort(-est, kind="stable")[:cpp]
            cands = {cl[i] for i in keep}
        return sk, cands

    sketch, cands = rdd.treeReduce(_merge, depth=2)
    cand_list = sorted(cands)
    keys = _key_hash(pd.Series(cand_list))
    idx = _hash_rows(keys, depth, width)
    est = np.min(
        np.stack([sketch[d][idx[d]] for d in range(depth)]), axis=0
    )
    ranked = sorted(
        zip(cand_list, est.tolist()), key=lambda kv: (-kv[1], kv[0])
    )
    return [(k_, int(v)) for k_, v in ranked[:k]]


_HASH_SPACE = float(1 << 64)


class KmvSketch:
    """KMV / theta sketch: the k minimum distinct 64-bit hashes of a
    column — a mergeable distinct-count summary supporting UNION and
    INTERSECTION estimates, which HLL (approx_count_distinct) cannot
    intersect. Size is k uint64s regardless of cardinality.

    Estimator (Beyer et al., SIGMOD'07 / the theta-sketch family):
    unsaturated (seen < k distinct hashes) the sketch IS the exact
    distinct set; saturated, theta = (k-th min)/2^64 and the estimate is
    (k-1)/theta, with relative error ~1/sqrt(k-2). Set algebra: union =
    k smallest of the merged hash sets; intersection counts common
    hashes below the joint theta and rescales."""

    __slots__ = ("k", "hashes")

    def __init__(self, k: int, hashes: np.ndarray):
        self.k = int(k)
        self.hashes = np.asarray(hashes, dtype=np.uint64)  # sorted, distinct

    @property
    def saturated(self) -> bool:
        return len(self.hashes) >= self.k

    @property
    def theta(self) -> float:
        if not self.saturated:
            return 1.0
        return float(self.hashes[self.k - 1]) / _HASH_SPACE

    def estimate(self) -> float:
        if not self.saturated:
            return float(len(self.hashes))
        return (self.k - 1) / self.theta

    def union(self, other: "KmvSketch") -> "KmvSketch":
        k = min(self.k, other.k)
        merged = np.unique(np.concatenate([self.hashes, other.hashes]))
        return KmvSketch(k, merged[:k])

    def intersect_estimate(self, other: "KmvSketch") -> float:
        """|A ∩ B| ≈ |{common hashes < joint theta}| / theta — exact when
        both sketches are unsaturated (theta == 1)."""
        theta = min(self.theta, other.theta)
        cut = np.uint64(int(theta * _HASH_SPACE)) if theta < 1.0 else None
        a, b = self.hashes, other.hashes
        if cut is not None:
            a, b = a[a < cut], b[b < cut]
        common = np.intersect1d(a, b, assume_unique=True)
        return len(common) / theta


def kmv_build(df: DataFrame, col: str, k: int = 4096) -> KmvSketch:
    """Distributed KMV build: hash JVM-side (xxhash64 — no Python in the
    scan), per-partition k smallest distinct hashes (numpy unique on a
    bounded slice), treeReduce merge of k-sized partials. Only k uint64s
    per partition ever leave the executors."""
    hashed = (
        df.where(F.col(col).isNotNull())
        .select(F.xxhash64(F.col(col).cast("string")).alias("h"))
    )

    def part(it):
        hs = np.fromiter((r["h"] for r in it), dtype=np.int64)
        u = np.unique(hs.astype(np.uint64))
        yield u[:k]

    def merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return np.unique(np.concatenate([a, b]))[:k]

    partials = hashed.rdd.mapPartitions(part)
    hashes = partials.treeReduce(merge, depth=2)
    return KmvSketch(k, hashes)
