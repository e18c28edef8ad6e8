"""DAAT BM25 scoring — the production read path.

One grouped cogroup-pandas UDF per *shard* (document-sharded index): each task
receives the query terms' posting blocks for its shard plus the shard's packed
norms row, and runs document-at-a-time scoring entirely in numpy:

- terms processed rarest-first (df-ascending; O1 / ResiduePairOccurrence
  .java:53-57) with progressive candidate intersection in AND mode
  (DefaultTargetAssembler.java:92-111 analogue);
- posting blocks are SKIPPED without decoding when their [first_doc_id,
  max_doc_id] range cannot intersect the surviving candidate range — the
  skip-pointer payoff (north_rule: per-block skip pointers);
- scores accumulate into a dense per-shard float64 array in ascending term_id
  order — bitwise-identical summation order to the oracle;
- each shard emits only its local top-k; the global
  ``orderBy(score desc, doc_id asc).limit(k)`` merges shard heaps
  (Catalyst TakeOrderedAndProject).

Scale shape: a query touching T terms reads T posting lists split across S
shards; the only shuffle is blocks+norms -> shard groups, and the result is
S*k rows.  No join against the doc dictionary until after the top-k (late
materialization, TargetStructure.java:24-27 analogue).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..codec import unpack_block
from .planner import QueryPlan

_RESULT_SCHEMA = "doc_id long, score double"


def _make_scorer(plan: QueryPlan, docs_per_shard: int, k: int, mode: str):
    # ascending-term_id order fixes float64 summation; rarest-first order
    # (plan.terms is already df-ascending) drives intersection
    by_tid = sorted(zip(plan.term_ids, plan.idfs))
    rarest_first = list(plan.term_ids)
    n_terms = len(plan.term_ids)
    k1, b, avgdl = plan.k1, plan.b, plan.avgdl

    def score_shard(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({"doc_id": [], "score": []}).astype(
                {"doc_id": "int64", "score": "float64"}
            )
        shard = int(left["shard"].iloc[0])
        base = shard * docs_per_shard
        norm_ids, norm_lens = unpack_block(
            bytes(right["doc_gaps"].iloc[0]), bytes(right["doclens"].iloc[0])
        )
        dense_len = np.zeros(docs_per_shard, dtype=np.float64)
        dense_len[norm_ids - base] = norm_lens

        groups: dict[int, pd.DataFrame] = {
            int(t): g for t, g in left.groupby("term_id", sort=False)
        }

        # --- candidate narrowing (AND): rarest-first with block skipping ---
        decoded: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        if mode == "and":
            cand: np.ndarray | None = None  # sorted candidate doc_ids
            for tid in rarest_first:
                g = groups.get(tid)
                if g is None:
                    return pd.DataFrame(
                        {"doc_id": [], "score": []}
                    ).astype({"doc_id": "int64", "score": "float64"})
                ids_parts, tf_parts = [], []
                lo = int(cand[0]) if cand is not None else -1
                hi = int(cand[-1]) if cand is not None else 1 << 62
                for _, row in g.sort_values("first_doc_id").iterrows():
                    # skip-pointer check: block cannot contain a candidate
                    if cand is not None and (
                        row["max_doc_id"] < lo or row["first_doc_id"] > hi
                    ):
                        continue
                    ids, tfs = unpack_block(bytes(row["doc_gaps"]), bytes(row["tfs"]))
                    ids_parts.append(ids)
                    tf_parts.append(tfs)
                if not ids_parts:
                    return pd.DataFrame(
                        {"doc_id": [], "score": []}
                    ).astype({"doc_id": "int64", "score": "float64"})
                ids = np.concatenate(ids_parts)
                tfs = np.concatenate(tf_parts)
                decoded[tid] = (ids, tfs)
                cand = ids if cand is None else cand[np.isin(cand, ids)]
                if cand.size == 0:
                    return pd.DataFrame(
                        {"doc_id": [], "score": []}
                    ).astype({"doc_id": "int64", "score": "float64"})

        # --- scoring: dense accumulation, ascending term_id ---
        score = np.zeros(docs_per_shard, dtype=np.float64)
        matched = np.zeros(docs_per_shard, dtype=np.int32)
        for tid, w in by_tid:
            if tid in decoded:
                ids, tfs = decoded[tid]
            else:
                g = groups.get(tid)
                if g is None:
                    continue
                parts = [
                    unpack_block(bytes(r["doc_gaps"]), bytes(r["tfs"]))
                    for _, r in g.iterrows()
                ]
                ids = np.concatenate([p[0] for p in parts])
                tfs = np.concatenate([p[1] for p in parts])
            idx = ids - base
            tf = tfs.astype(np.float64)
            dl = dense_len[idx]
            contrib = w * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * dl / avgdl)
            )
            score[idx] += contrib
            matched[idx] += 1

        need = n_terms if mode == "and" else 1
        # dense_len > 0 doubles as the doc-filter mask: norms rows are built
        # from the (optionally predicate-filtered) doc dictionary, so a doc
        # absent from norms must not be scored (P1-P3 filters apply pre-top-k)
        hit = np.flatnonzero((matched >= need) & (dense_len > 0))
        if hit.size == 0:
            return pd.DataFrame({"doc_id": [], "score": []}).astype(
                {"doc_id": "int64", "score": "float64"}
            )
        s = score[hit]
        # per-shard top-k heap: argpartition then exact order
        if hit.size > k:
            part = np.argpartition(-s, k - 1)[:k]
            hit, s = hit[part], s[part]
        order = np.lexsort((hit, -s))
        return pd.DataFrame(
            {"doc_id": (hit[order] + base).astype("int64"), "score": s[order]}
        )

    return score_shard


def term_upper_bound(idf: float, max_tf: int, k1: float, b: float) -> float:
    """Safe BM25 upper bound for a term given a tf ceiling: the dl -> 0 limit
    of the normalization term (score is decreasing in dl)."""
    tf = float(max_tf)
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b))


def bm25_topk_daat(
    spark: SparkSession,
    postings: DataFrame,
    norms: DataFrame,
    plan: QueryPlan,
    docs_per_shard: int,
    k: int = 10,
    mode: str = "or",
    prune_shards: bool = True,
    probe_shards: int = 8,
) -> DataFrame:
    """Top-k (doc_id, score) via sharded DAAT.  Deterministic.

    ``prune_shards`` enables the engine's block-max pruning lifted to shard
    granularity — WAND re-shaped for Spark's execution model (classic WAND
    drives per-term cursors from a single thread; in a distributed plan the
    equivalent skip decision must be made per *task*):

      phase 0: scan only the posting-block METADATA (term_id, shard,
               block_max_tf — column pruning keeps payloads unread) and
               compute each shard's score upper bound
               ub(shard) = sum_t max_block_ub(t, shard);
      phase 1: fully score the ``probe_shards`` most promising shards ->
               threshold theta = k-th best score found;
      phase 2: score only the remaining shards with ub > theta.

    Exactness: ub is a true upper bound (dl->0 limit, true block-max tf), so
    a pruned shard cannot contain a top-k doc; results are identical to the
    unpruned plan.  Within-shard AND queries additionally skip blocks by
    doc-range (cursor-style skip pointers).
    """
    if plan.empty_or or (mode == "and" and plan.empty_and):
        return spark.createDataFrame([], _RESULT_SCHEMA)
    blocks = postings.where(F.col("term_id").isin(plan.term_ids)).select(
        "shard", "term_id", "first_doc_id", "max_doc_id", "doc_gaps", "tfs"
    )
    scorer = _make_scorer(plan, docs_per_shard, k, mode)

    def score_blocks(b: DataFrame) -> DataFrame:
        return (
            b.groupBy("shard")
            .cogroup(norms.groupBy("shard"))
            .applyInPandas(scorer, schema=_RESULT_SCHEMA)
        )

    if not prune_shards:
        scored = score_blocks(blocks)
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    # phase 0: shard upper bounds from block metadata only (payload unread)
    ub_map = {
        tid: w for tid, w in zip(plan.term_ids, plan.idfs)
    }
    meta = (
        postings.where(F.col("term_id").isin(plan.term_ids))
        .groupBy("shard", "term_id")
        .agg(F.max("block_max_tf").alias("mtf"))
    )
    idf_lit = F.create_map(
        *[x for tid, w in ub_map.items() for x in (F.lit(tid), F.lit(w))]
    )
    tfub = (
        idf_lit[F.col("term_id")]
        * (F.col("mtf") * (plan.k1 + 1.0))
        / (F.col("mtf") + plan.k1 * (1.0 - plan.b))
    )
    shard_ub = (
        meta.withColumn("tub", tfub)
        .groupBy("shard")
        .agg(F.sum("tub").alias("ub"), F.count("*").alias("n_terms_present"))
    )
    if mode == "and":
        shard_ub = shard_ub.where(F.col("n_terms_present") == len(plan.term_ids))
    # phase 1: probe the most promising shards (tiny collect: probe_shards rows)
    probe = [
        r["shard"]
        for r in shard_ub.orderBy(F.desc("ub"), F.asc("shard"))
        .limit(probe_shards)
        .collect()
    ]
    if not probe:
        return spark.createDataFrame([], _RESULT_SCHEMA)
    first = score_blocks(blocks.where(F.col("shard").isin(probe))).orderBy(
        F.desc("score"), F.asc("doc_id")
    ).limit(k)
    rows = first.collect()
    theta = rows[-1]["score"] if len(rows) >= k else float("-inf")
    # phase 2: only shards whose upper bound beats theta can change the top-k
    remaining = shard_ub.where(
        (~F.col("shard").isin(probe)) & (F.col("ub") > theta)
    ).select("shard")
    second = score_blocks(
        blocks.join(remaining, on="shard", how="left_semi")
    )
    merged = spark.createDataFrame(rows, _RESULT_SCHEMA).unionByName(second)
    return merged.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
