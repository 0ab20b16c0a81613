"""Table-maintenance CLI over the snapshot catalog (round 5): the
operational wrapper for engine.catalog's lifecycle ops, runnable via
``spark-submit --py-files dist/pdf_parser_spark.zip jobs/maintain.py``
exactly like jobs/extract.py. A 10^12-doc crawl table runs these as
routine post-append maintenance: compact the small files each increment
leaves behind, expire superseded snapshots, GC unreferenced data files,
and drop partitions by predicate.

Usage:
  python jobs/maintain.py --table DIR compact [--small-mb 32]
         [--target-mb 128]
  python jobs/maintain.py --table DIR expire [--keep-last 2]
  python jobs/maintain.py --table DIR delete --column C --op '<' \
         --value V
  python jobs/maintain.py --table DIR history
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True, help="catalog table dir")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_compact = sub.add_parser("compact")
    p_compact.add_argument("--small-mb", type=int, default=32)
    p_compact.add_argument("--target-mb", type=int, default=128)

    p_expire = sub.add_parser("expire")
    p_expire.add_argument("--keep-last", type=int, default=2)
    p_expire.add_argument("--older-than-s", type=float, default=None,
                          help="retention window: only expire snapshots "
                               "at least this many seconds old")
    p_expire.add_argument("--gc-grace-s", type=float, default=600.0,
                          help="never GC unreferenced data files younger "
                               "than this (in-flight commit protection)")

    p_delete = sub.add_parser("delete")
    p_delete.add_argument("--column", required=True)
    p_delete.add_argument("--op", required=True,
                          choices=["=", "<", "<=", ">", ">="])
    p_delete.add_argument("--value", required=True,
                          help="numeric compared as int/float, else string")

    sub.add_parser("history")

    args = ap.parse_args()

    from pdf_parser_spark.engine import catalog

    if args.cmd == "expire":
        # pure manifest/file surgery — no SparkSession needed
        out = catalog.expire_snapshots(args.table,
                                       keep_last=args.keep_last,
                                       older_than_s=args.older_than_s,
                                       gc_grace_s=args.gc_grace_s)
        print(json.dumps({"op": "expire", **out}))
        return
    if args.cmd == "history":
        print(json.dumps({"op": "history",
                          "snapshots": catalog.history(args.table)}))
        return

    from pdf_parser_spark.engine.session import get_spark

    spark = get_spark("maintain", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    if args.cmd == "compact":
        snap = catalog.compact(spark, args.table,
                               small_bytes=args.small_mb * 1024 * 1024,
                               target_bytes=args.target_mb * 1024 * 1024)
        print(json.dumps({"op": "compact", "snapshot": snap,
                          "noop": snap is None}))
    elif args.cmd == "delete":
        raw = args.value
        try:
            value = int(raw)
        except ValueError:
            try:
                value = float(raw)
            except ValueError:
                value = raw
        snap, stats = catalog.delete_where(spark, args.table,
                                           args.column, args.op, value)
        print(json.dumps({"op": "delete", "snapshot": snap, **stats}))
    spark.stop()


if __name__ == "__main__":
    main()
