"""Dirichlet-smoothed query-likelihood scoring (F6 alternative scorer).

The reference exposes a second scoring function alongside its primary one
(RMSD scoring vs the side-chain-aware variant, ScoringFunction enum in
core config) — the analogue for a fulltext engine is a second ranking model
over the SAME index artifacts.  This module scores the language-modeling
query likelihood with Dirichlet smoothing (Zhai & Lafferty 2001):

    score(q, d) = sum_{t in distinct(q)} ln( (tf_{t,d} + mu * cf_t / C)
                                             / (dl_d + mu) )

where C = total collection length (stats.sum_doclen) and cf_t the collection
frequency from the terms table.  Candidate set = documents containing at
least one query term (the standard Indri/Galago convention — a doc matching
nothing is never emitted); for candidates, UNMATCHED terms still contribute
their smoothing mass (tf = 0), which the dense per-shard tf arrays give for
free.  Absent-from-vocabulary terms (cf = 0 -> ln 0) are dropped at plan
time, mirroring the BM25 planner's vocabulary gate.

Execution shape is the DAAT kernel's (query/daat.py): one cogroup-pandas
task per document shard over the SAME pushed-down posting-block scan and
bucketed norms — no new index artifact, no extra shuffle; each shard emits
its local top-k and Catalyst's TakeOrderedAndProject merges the heaps.
Summation runs in ascending term_id order (deterministic float64 order,
matching the numpy oracle bit-for-bit).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..codec import unpack_block

_RESULT_SCHEMA = "doc_id long, score double"

QL_MU = 2000.0  # Dirichlet prior (Zhai & Lafferty 2001 recommended range)


def _empty_pdf() -> pd.DataFrame:
    return pd.DataFrame({"doc_id": [], "score": []}).astype(
        {"doc_id": "int64", "score": "float64"}
    )


def ql_topk(
    spark: SparkSession,
    postings: DataFrame,
    norms: DataFrame,
    term_cfs: list[tuple[int, int]],  # (term_id, cf), present terms only
    coll_len: int,
    docs_per_shard: int,
    k: int = 10,
    mu: float = QL_MU,
) -> DataFrame:
    """Top-k (doc_id, score) under Dirichlet query likelihood.

    ``term_cfs`` lists the distinct PRESENT query terms with their exact
    collection frequencies (terms-table cf, A3); the caller drops absent
    terms.  Deterministic: ascending-term_id summation, ties doc_id asc.
    """
    if not term_cfs or coll_len <= 0:
        return spark.createDataFrame([], _RESULT_SCHEMA)
    terms = sorted(term_cfs)  # ascending term_id — fixed summation order
    tids = [t for t, _ in terms]
    # smoothing mass per term: mu * P(t|C); log(dl + mu) is shared
    smooth = {tid: mu * (cf / float(coll_len)) for tid, cf in terms}

    def score_shard(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0 or len(right) == 0:
            return _empty_pdf()
        shard = int(left["shard"].iloc[0])
        base = shard * docs_per_shard
        norm_ids, norm_lens = unpack_block(
            bytes(right["doc_gaps"].iloc[0]), bytes(right["doclens"].iloc[0])
        )
        dense_len = np.zeros(docs_per_shard, dtype=np.float64)
        dense_len[norm_ids - base] = norm_lens

        by_tid = {int(t): g for t, g in left.groupby("term_id", sort=False)}
        denses: dict[int, np.ndarray] = {}
        matched = np.zeros(docs_per_shard, dtype=bool)
        for tid in tids:
            g = by_tid.get(tid)
            if g is None:
                continue
            dense = np.zeros(docs_per_shard, dtype=np.float64)
            for row in g.itertuples(index=False):
                ids, tfs = unpack_block(bytes(row.doc_gaps), bytes(row.tfs))
                dense[ids - base] += tfs
            denses[tid] = dense
            matched |= dense > 0
        # candidates: >=1 matched term AND eligible (doclen > 0 in norms —
        # the P1-P3 predicate mask rides the same norms sidecar as BM25)
        cand = np.flatnonzero(matched & (dense_len > 0))
        if cand.size == 0:
            return _empty_pdf()
        dl = dense_len[cand]
        log_denom = np.log(dl + mu)
        score = np.zeros(cand.size, dtype=np.float64)
        for tid in tids:  # ascending term_id: deterministic float64 order
            tf = denses[tid][cand] if tid in denses else 0.0
            score += np.log(tf + smooth[tid]) - log_denom
        # per-shard top-k with boundary-tie retention (same protocol as the
        # BM25 kernel: keep every doc tied at the k-th score, then exact
        # (score desc, doc_id asc) order)
        if cand.size > k:
            part = np.argpartition(-score, k - 1)
            thresh = score[part[k - 1]]
            keep = np.flatnonzero(score >= thresh)
            cand, score = cand[keep], score[keep]
        order = np.lexsort((cand, -score))[:k]
        return pd.DataFrame(
            {
                "doc_id": (cand[order] + base).astype("int64"),
                "score": score[order],
            }
        )

    blocks = postings.where(F.col("term_id").isin(tids)).select(
        "shard", "term_id", "doc_gaps", "tfs"
    )
    scored = (
        blocks.groupBy("shard")
        .cogroup(norms.groupBy("shard"))
        .applyInPandas(score_shard, schema=_RESULT_SCHEMA)
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
