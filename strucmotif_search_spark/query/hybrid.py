"""Hybrid lexical + dense retrieval — BM25 and embedding-cosine candidate
lists fused by Reciprocal Rank Fusion (RRF, Cormack et al. SIGIR'09; the
Elasticsearch hybrid-search default):

    rrf(d) = 1/(k0 + rank_lexical(d)) + 1/(k0 + rank_dense(d))

with a side contributing 0 when the doc is outside that side's candidate
list.  Rank-based fusion sidesteps the score-scale problem entirely (raw
BM25 and cosine live on incomparable scales), and is replayable exactly:
ranks are integers, the fused score is two IEEE divisions and one add.

Scale shape: each side is its own top-n candidate query (the DAAT path for
lexical; a pushed-down projection + TakeOrderedAndProject for dense — or an
IVF/LSH path at 10^12 scale, operators/similarity.py); fusion then touches
only 2n candidate ROWS — window rank over n rows, one full-outer join on
doc_id, top-k.  Fusion cost is candidate-bounded, never corpus-bounded.

Determinism: both candidate lists rank ties by ascending internal doc_id
(the engine's total order), so the fused ranking is exactly replayable by
the DuckDB oracle (internal order = (repo, path, commit) lexicographic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    lex: DataFrame,
    dense: DataFrame,
    k: int = 10,
    k0: int = 60,
) -> DataFrame:
    """Fuse two candidate DataFrames — ``lex`` (doc_id, score) and ``dense``
    (doc_id, cosine), each already deterministically ordered by their own
    relevance — into RRF top-k: (doc_id, rrf, r_lex, r_dense).

    Candidate lists are top-n sized, so the global windows below rank a few
    hundred rows, not the corpus (single-partition window over k-sized data
    is the intended shape, same as the DAAT merge's TakeOrderedAndProject).
    """
    lw = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    dw = Window.orderBy(F.desc("cosine"), F.asc("doc_id"))
    lr = lex.select("doc_id", "score").withColumn(
        "r_lex", F.row_number().over(lw)
    )
    dr = dense.select("doc_id", "cosine").withColumn(
        "r_dense", F.row_number().over(dw)
    )
    fused = lr.join(dr, on="doc_id", how="full_outer").select(
        "doc_id",
        (
            F.coalesce(1.0 / (F.lit(float(k0)) + F.col("r_lex")), F.lit(0.0))
            + F.coalesce(
                1.0 / (F.lit(float(k0)) + F.col("r_dense")), F.lit(0.0)
            )
        ).alias("rrf"),
        "score",
        "cosine",
        "r_lex",
        "r_dense",
    )
    return fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(k)
