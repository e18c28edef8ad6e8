"""spark-submit entry point for index MAINTENANCE — the reference update
CLI's operation surface (update/Operation.java: ADD / REMOVE / RECOVER;
update/StrucmotifUpdate.java:552-564 resolves the mode from argv[0]),
extended with the lifecycle operations this engine adds:

    ADD       index new docs into a fresh generation (O(delta) commit)
    REMOVE    delete docs by natural key (posting surgery, exact df/cf)
    DELETE    delete-by-query (full match set from the index, then REMOVE)
    COMPACT   fold refs into one bucketed generation (exchange-free reads)
    EXPIRE    reclaim generations unreachable from CURRENT (+ retention)
    RECOVER   orphan/df/cf consistency report (all-zeros == healthy);
              a crashed BUILD resumes via build_submit --resume-gen — the
              lineage WAL replays completed stages (T3), so RECOVER here
              is the read-only audit, exactly the reference's
              reportKnownKeys reconciliation pass

Deployment-agnostic like jobs/build_submit.py: the session comes from
spark-submit's own configuration, the library from --py-files.

    spark-submit --master spark://HOST:7077 \
        --py-files dist/strucmotif_search_spark.zip \
        jobs/update_submit.py ADD \
        --index-root /data/index --source /data/delta.parquet

Prints ONE JSON line so schedulers can parse the outcome.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "operation",
        choices=["ADD", "REMOVE", "DELETE", "COMPACT", "EXPIRE", "RECOVER"],
        help="maintenance operation (reference Operation.java shape)",
    )
    ap.add_argument("--index-root", required=True)
    ap.add_argument("--source", default=None,
                    help="parquet of (repo,path,commit,lang,content) — the "
                         "delta for ADD, the doomed keys for REMOVE")
    ap.add_argument("--query", default=None,
                    help="DELETE: remove every doc matching this query")
    ap.add_argument("--mode", default="or", choices=["or", "and"])
    ap.add_argument("--keep-last", type=int, default=0,
                    help="EXPIRE: retain this many expirable generations")
    args = ap.parse_args(argv)

    # fail fast BEFORE paying SparkSession startup (on a real cluster that
    # is executor allocation, not just a local JVM)
    if args.operation in ("ADD", "REMOVE") and not args.source:
        print(json.dumps({"error": f"{args.operation} requires --source"}))
        return 2
    if args.operation == "DELETE" and not args.query:
        print(json.dumps({"error": "DELETE requires --query"}))
        return 2

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(
        f"smsp-{args.operation.lower()}"
    ).getOrCreate()

    from strucmotif_search_spark.build import IndexStore
    from strucmotif_search_spark.engine import SearchEngine
    from strucmotif_search_spark.streaming.incremental import (
        add_documents,
        compact,
        remove_documents,
        verify_consistency,
    )

    store = IndexStore(args.index_root)
    t0 = time.time()
    out: dict = {"operation": args.operation, "index_root": args.index_root}

    if args.operation == "ADD":
        delta = spark.read.parquet(args.source)
        out["gen"] = add_documents(spark, store, delta)
    elif args.operation == "REMOVE":
        doomed = spark.read.parquet(args.source)
        out["gen"] = remove_documents(spark, store, doomed)
    elif args.operation == "DELETE":
        out["gen"] = SearchEngine(spark, store).delete_by_query(
            args.query, mode=args.mode
        )
    elif args.operation == "COMPACT":
        out["gen"] = compact(spark, store)
    elif args.operation == "EXPIRE":
        out["removed"] = store.expire_generations(keep_last=args.keep_last)
    elif args.operation == "RECOVER":
        out["report"] = verify_consistency(spark, store)
        out["healthy"] = all(v == 0 for v in out["report"].values())

    out["wall_sec"] = round(time.time() - t0, 2)
    out["current_gen"] = store.current_gen()
    print(json.dumps(out), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
