"""Naive Catalyst-only BM25 plan — the oracle-parity baseline.

Plan shape (all built-in operators; the decode UDF is the only Python and it
is Arrow-vectorized):

  postings.where(term_id IN q)          <- Iceberg/Parquet min-max pruning
    -> decode blocks (mapInPandas)      <- (term_id, doc_id, tf)
    -> per-posting contribution         <- JVM expression (MapType literal idf)
    -> groupBy(doc_id) deterministic-order sum
                                        <- array_sort + aggregate (exact
                                           ascending-term_id float64 order,
                                           matching the oracle's summation)
    -> [AND mode] count == n_terms      <- conjunctive counting trick
                                           (TargetStructure.java:136-144
                                           analogue, SURVEY.md §2.4 A6)
    -> join doc filters (P1-P3)
    -> orderBy(score desc, doc_id asc).limit(k)
                                        <- Catalyst TakeOrderedAndProject
                                           (distributed top-k heap)

Late materialization (J4 analogue, TargetStructure.java:24-27): document
metadata is joined AFTER the top-k, so at most k rows hit the doc dictionary.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..build.postings import decode_postings
from .planner import QueryPlan


def _empty_result(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], "doc_id long, score double")


def bm25_group_contribs(
    postings: DataFrame,
    norms_decoded: DataFrame,  # (doc_id, doclen) — doc_map works too
    plan: QueryPlan,
) -> DataFrame:
    """Per-(doc, scoring-group) BM25 contributions: (doc_id, gkey, contrib).

    The shared first half of the naive plan — also the content side of the
    fielded scorer (query/fielded.py), which needs contributions at group
    granularity (not per-doc sums) to full-outer-join them with a second
    field's contributions before the combined top-k."""
    q_ids = sorted({tid for g in plan.groups for tid in g.member_ids})
    blocks = postings.where(F.col("term_id").isin(q_ids))
    decoded = decode_postings(blocks)

    # member term_id -> expansion-group key / idf (A4: a group's tf is the
    # SUM of member tfs — posting-list union with payload concat,
    # DefaultTargetAssembler.java:85-88; singleton groups for plain queries)
    key_of = {tid: g.key for g in plan.groups for tid in g.member_ids}
    idf_of = {g.key: g.idf for g in plan.groups}
    key_map = F.create_map(
        *[F.lit(x) for x in chain.from_iterable(key_of.items())]
    )
    idf_map = F.create_map(
        *[F.lit(x) for x in chain.from_iterable(idf_of.items())]
    )
    grouped = (
        decoded.withColumn("gkey", key_map[F.col("term_id")])
        .groupBy("doc_id", "gkey")
        .agg(F.sum("tf").alias("tf"))
    )
    d = grouped.join(norms_decoded.select("doc_id", "doclen"), on="doc_id")
    contrib = (
        idf_map[F.col("gkey")]
        * (F.col("tf") * (plan.k1 + 1.0))
        / (
            F.col("tf")
            + plan.k1
            * (1.0 - plan.b + plan.b * F.col("doclen") / F.lit(plan.avgdl))
        )
    )
    return d.withColumn("contrib", contrib.cast("double"))


def bm25_topk_naive(
    spark: SparkSession,
    postings: DataFrame,
    norms_decoded: DataFrame,  # (doc_id, doclen) — doc_map works too
    plan: QueryPlan,
    k: int = 10,
    mode: str = "or",
    allowed: DataFrame | None = None,
    excluded: DataFrame | None = None,
    min_match: int | None = None,
) -> DataFrame:
    """Top-k (doc_id, score) DataFrame. Deterministic: ties -> doc_id asc.

    ``min_match``: OR-mode relaxed conjunction (the Elasticsearch
    ``minimum_should_match`` shape): a hit must match at least this many
    scoring groups.  min_match=1 is plain OR, min_match=n_groups is AND —
    the same conjunctive-counting trick (A6) at an arbitrary threshold.
    Groups ABSENT from the corpus count toward nothing: a query of 3 terms
    with one absent term and min_match=3 is unanswerable and returns empty
    (matching the AND-mode early exit)."""
    if plan.empty_or or (mode == "and" and plan.empty_and):
        return _empty_result(spark)
    if min_match is not None and min_match > len(plan.groups):
        return _empty_result(spark)

    d = bm25_group_contribs(postings, norms_decoded, plan)

    # deterministic float64 summation: ascending group key within each doc
    per_doc = d.groupBy("doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("gkey", "contrib"))),
            F.lit(0.0),
            lambda acc, x: acc + x["contrib"],
        ).alias("score"),
        F.count("*").alias("n_matched"),
    )
    if mode == "and":
        per_doc = per_doc.where(F.col("n_matched") == len(plan.groups))
    elif min_match is not None and min_match > 1:
        per_doc = per_doc.where(F.col("n_matched") >= min_match)
    if allowed is not None:  # P1 whitelist — left-semi
        per_doc = per_doc.join(allowed.select("doc_id"), on="doc_id", how="left_semi")
    if excluded is not None:  # P2 blacklist — left-anti
        per_doc = per_doc.join(excluded.select("doc_id"), on="doc_id", how="left_anti")
    return (
        per_doc.select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
