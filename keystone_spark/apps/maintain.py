"""Table-maintenance CLI: the periodic jobs a 100 TB lake runs between
queries — small-files compaction, Z-order re-clustering, and the
data-quality gate — each one engine operator behind an argparse front.

Run:
  python -m keystone_spark.apps.maintain compact --src DIR --dst DIR
      [--target-mb 128] [--sort-cols c1,c2]
  python -m keystone_spark.apps.maintain zorder --src DIR --dst DIR
      --cols c1,c2 [--n-files 32]
  python -m keystone_spark.apps.maintain dq --src DIR
      [--not-null c1,c2] [--unique k1,k2] [--range col:lo:hi ...]
  python -m keystone_spark.apps.maintain index-compact --path DIR
      --kind bm25|minhash

Each subcommand prints one JSON line; ``dq`` exits non-zero when any
check reports violations, so it drops straight into CI/cron gates.
``index-compact`` is the OPTIMIZE pass for the append-only stored
indexes (Bm25Index.add / add_to_minhash_index leave one small file set
per increment) — it preserves the partition layout that search pruning
needs, which the generic ``compact`` subcommand would drop.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("compact")
    c.add_argument("--src", required=True)
    c.add_argument("--dst", required=True)
    c.add_argument("--target-mb", type=int, default=128)
    c.add_argument("--sort-cols", default=None)

    z = sub.add_parser("zorder")
    z.add_argument("--src", required=True)
    z.add_argument("--dst", required=True)
    z.add_argument("--cols", required=True)
    z.add_argument("--n-files", type=int, default=32)

    d = sub.add_parser("dq")
    d.add_argument("--src", required=True)
    d.add_argument("--not-null", default=None)
    d.add_argument("--unique", default=None)
    d.add_argument("--range", action="append", default=[],
                   help="col:lo:hi, repeatable")

    ic = sub.add_parser("index-compact")
    ic.add_argument("--path", required=True)
    ic.add_argument("--kind", required=True, choices=["bm25", "minhash"])

    args = ap.parse_args()

    from keystone_spark import get_session

    spark = get_session("maintain_app")

    if args.cmd == "index-compact":
        if args.kind == "bm25":
            from keystone_spark.operators.nlp import Bm25Index

            stats = Bm25Index.compact(spark, args.path)
        else:
            from keystone_spark.operators.dedup import compact_minhash_index

            stats = compact_minhash_index(spark, args.path)
        print(json.dumps({"app": "maintain.index-compact",
                          "kind": args.kind, **stats}))
        return

    if args.cmd == "compact":
        from keystone_spark.sources.tables import compact_files

        stats = compact_files(
            spark, args.src, args.dst, target_mb=args.target_mb,
            sort_cols=args.sort_cols.split(",") if args.sort_cols else None,
        )
        print(json.dumps({"app": "maintain.compact", **stats}))
        return

    if args.cmd == "zorder":
        from keystone_spark.sources.tables import write_zorder

        df = spark.read.parquet(args.src)
        write_zorder(df, args.cols.split(","), args.dst,
                     n_files=args.n_files)
        print(json.dumps({"app": "maintain.zorder",
                          "cols": args.cols.split(","),
                          "rows": spark.read.parquet(args.dst).count()}))
        return

    from keystone_spark.operators.observe import constraint_checks

    ranges = {}
    for spec in args.range:
        col, lo, hi = spec.split(":")
        ranges[col] = (float(lo), float(hi))
    report = constraint_checks(
        spark.read.parquet(args.src),
        not_null=args.not_null.split(",") if args.not_null else None,
        unique=[args.unique.split(",")] if args.unique else None,
        ranges=ranges or None,
    ).collect()
    out = {r["check"]: r["violations"] for r in report}
    print(json.dumps({"app": "maintain.dq", "checks": out}))
    if any(v > 0 for v in out.values()):
        sys.exit(1)


if __name__ == "__main__":
    main()
