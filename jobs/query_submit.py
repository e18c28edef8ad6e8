"""spark-submit entry point for QUERIES — the read-side CLI completing the
build (jobs/build_submit.py) / maintain (jobs/update_submit.py) / query
triad, the reference's search entry surface (Strucmotif.java:20-37
searchForStructures / detectMotifs) as a cluster job.

Query kinds map 1:1 onto the engine API:

    SEARCH    BM25 top-k (--mode or|and; --expansions JSON; --exclude)
    BOOL      nested boolean expression `(a AND b) OR c NOT d`
    PHRASE    exact-sequence phrase (positional index)
    FIELDED   most_fields BM25 over content + metadata fields
    MSEARCH   batch: one query per line of --queries-file, ONE index pass
    SUGGEST   prefix completions + did-you-mean corrections for --query
              (a single term/prefix, not a multi-term query)
    MLT       more-like-this: docs ranked against --query as a probe text
    HYBRID    BM25 + embedding-cosine RRF (--embeddings parquet with
              (doc_id, embedding); --qvec-doc-id picks the query vector;
              --ann ivf|lsh switches the dense side to the ANN probe)
    CHANGELOG membership diff between two generations (Iceberg CDC shape)

`--as-of GEN` pins any read at a historical generation (time travel).

Deployment-agnostic: the session comes from spark-submit's configuration,
the library from --py-files.

    spark-submit --master spark://HOST:7077 \
        --py-files dist/strucmotif_search_spark.zip \
        jobs/query_submit.py SEARCH \
        --index-root /data/index --query "spark sql" --k 10

Prints ONE JSON line: {"rows": [...], "wall_sec": ..., "gen": ...} so
schedulers and wrappers can parse results without scraping logs.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "kind",
        choices=["SEARCH", "BOOL", "PHRASE", "FIELDED", "MSEARCH",
                 "SUGGEST", "MLT", "HYBRID", "CHANGELOG"],
    )
    ap.add_argument("--index-root", required=True)
    ap.add_argument("--query", default=None)
    ap.add_argument("--queries-file", default=None,
                    help="MSEARCH: one query per line")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--mode", default="or", choices=["or", "and"])
    ap.add_argument("--expansions", default=None,
                    help='JSON {"term": ["syn", ...]} (A4 expansion groups)')
    ap.add_argument("--exclude", default=None,
                    help="terms whose presence disqualifies a hit")
    ap.add_argument("--field", default="path",
                    help="FIELDED: doc_map string field scored beside content")
    ap.add_argument("--as-of", default=None, metavar="GEN",
                    help="pin reads at a historical generation (time travel)")
    ap.add_argument("--from-gen", default=None,
                    help="CHANGELOG: older generation")
    ap.add_argument("--to-gen", default=None,
                    help="CHANGELOG: newer generation (default CURRENT)")
    ap.add_argument("--meta", action="store_true",
                    help="join doc metadata onto the hits (late materialized)")
    ap.add_argument("--embeddings", default=None,
                    help="HYBRID: parquet with (doc_id, embedding) in this "
                         "index's internal doc_id space")
    ap.add_argument("--qvec-doc-id", type=int, default=None,
                    help="HYBRID: doc_id whose embedding is the query vector")
    ap.add_argument("--ann", default=None, choices=["ivf", "lsh"],
                    help="HYBRID: ANN backend for the dense side "
                         "(default exact brute force)")
    args = ap.parse_args(argv)

    # fail fast on bad arguments BEFORE paying SparkSession startup (on a
    # real cluster that is executor allocation, not just a local JVM)
    if args.kind not in ("CHANGELOG", "MSEARCH") and not args.query:
        print(json.dumps({"error": f"{args.kind} requires --query"}))
        return 2
    if args.kind == "MSEARCH" and not args.queries_file:
        print(json.dumps({"error": "MSEARCH requires --queries-file"}))
        return 2
    if args.kind == "CHANGELOG" and not args.from_gen:
        print(json.dumps({"error": "CHANGELOG requires --from-gen"}))
        return 2
    if args.kind == "HYBRID" and not (
        args.embeddings and args.qvec_doc_id is not None
    ):
        print(json.dumps(
            {"error": "HYBRID requires --embeddings and --qvec-doc-id"}
        ))
        return 2

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName(
        f"smsp-query-{args.kind.lower()}"
    ).getOrCreate()

    from strucmotif_search_spark.build import IndexStore
    from strucmotif_search_spark.engine import SearchEngine

    store = IndexStore(args.index_root)
    t0 = time.time()

    if args.kind == "CHANGELOG":
        from strucmotif_search_spark.streaming.incremental import (
            generation_changes,
        )

        # --as-of pins the newer side, same as every other read
        to_gen = args.to_gen or args.as_of
        df = generation_changes(spark, store, args.from_gen, to_gen)
        gen = to_gen or store.current_gen()
    else:
        eng = SearchEngine(spark, store, gen=args.as_of)
        gen = eng.gen
        if args.kind == "SEARCH":
            df = eng.search(
                args.query, k=args.k, mode=args.mode, with_meta=args.meta,
                expansions=json.loads(args.expansions)
                if args.expansions else None,
                exclude=args.exclude,
            )
        elif args.kind == "BOOL":
            df = eng.bool_search(args.query, k=args.k, with_meta=args.meta)
        elif args.kind == "PHRASE":
            df = eng.phrase_search(args.query, k=args.k)
            if args.meta:
                df = df.join(
                    eng.doc_map.select(
                        "doc_id", "repo", "path", "commit", "lang"
                    ),
                    on="doc_id",
                )
        elif args.kind == "FIELDED":
            df = eng.fielded_search(
                args.query, field=args.field, k=args.k, mode=args.mode,
                with_meta=args.meta,
            )
        elif args.kind == "SUGGEST":
            from strucmotif_search_spark.query.analytics import (
                suggest_corrections,
                suggest_terms,
            )

            comp = suggest_terms(eng, args.query, n=args.k)
            corr = suggest_corrections(eng, args.query, n=args.k)
            df = comp.withColumn(
                "suggestion_kind", F.lit("prefix")
            ).unionByName(
                corr.withColumn("suggestion_kind", F.lit("correction")),
                allowMissingColumns=True,
            )
        elif args.kind == "MLT":
            from strucmotif_search_spark.query.analytics import (
                more_like_this,
            )

            df = more_like_this(eng, args.query, k=args.k)
            if args.meta:
                df = df.join(
                    eng.doc_map.select(
                        "doc_id", "repo", "path", "commit", "lang"
                    ),
                    on="doc_id",
                )
        elif args.kind == "HYBRID":
            emb = spark.read.parquet(args.embeddings)
            qrow = emb.where(
                F.col("doc_id") == args.qvec_doc_id
            ).select("embedding").first()
            if qrow is None:
                print(json.dumps(
                    {"error": f"no embedding for doc_id {args.qvec_doc_id}"}
                ))
                return 2
            df = eng.hybrid_search(
                args.query, emb, [float(x) for x in qrow["embedding"]],
                k=args.k, mode=args.mode, with_meta=args.meta, ann=args.ann,
            )
        else:  # MSEARCH
            with open(args.queries_file) as f:
                qs = [ln.strip() for ln in f if ln.strip()]
            df = eng.msearch(
                {f"q{i}": q for i, q in enumerate(qs)},
                k=args.k, mode=args.mode, with_meta=args.meta,
            )

    rows = [r.asDict(recursive=True) for r in df.collect()]
    print(json.dumps({
        "kind": args.kind,
        "gen": gen,
        "n_rows": len(rows),
        "rows": rows,
        "wall_sec": round(time.time() - t0, 2),
    }, default=str), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
