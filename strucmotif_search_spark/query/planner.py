"""Query planning: tokenize, dedupe, look up term stats, order rarest-first.

Reference analogues:
- query tokenization = ResidueGraph over the query structure
  (domain/query/StructureQuery.java:51-52);
- term dedup/pruning = KruskalMotifPruner (core/KruskalMotifPruner.java:23-66)
  — for bag-of-words BM25 this is ``sorted(set(tokens))``;
- rarest-first ordering = the informativeness sort
  (ResiduePairOccurrence.java:53-57) — here an exact df-ascending sort from
  the ``terms`` table (the single highest-leverage optimization in the
  reference per its README:15-18);
- empty-result early exit = DefaultTargetAssembler.java:108-111 — a missing
  term in AND mode answers the query on the driver with zero cluster work.

The lookup itself is a tiny filtered scan of the terms table (``term IN
(...)``) — at most a few dozen rows cross the driver boundary.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import BM25_B, BM25_K1
from ..oracle import tokenize


@dataclass
class QueryPlan:
    """Resolved query: term stats + global stats, ordered df-ascending."""

    terms: list[str]            # distinct query terms, df-ascending then term
    term_ids: list[int]
    dfs: list[int]
    idfs: list[float]
    n_absent: int               # distinct query terms with df=0
    n_docs: int
    avgdl: float
    k1: float = BM25_K1
    b: float = BM25_B

    @property
    def empty_and(self) -> bool:
        """AND-mode early exit: some term never occurs."""
        return self.n_absent > 0

    @property
    def empty_or(self) -> bool:
        return len(self.terms) == 0


def idf(n_docs: int, df: int) -> float:
    return math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def plan_query(
    query: str,
    terms_table: DataFrame,
    stats_table: DataFrame,
    stats_row=None,
) -> QueryPlan:
    distinct = sorted(set(tokenize(query)))
    st = stats_row if stats_row is not None else stats_table.first()
    n_docs, avgdl = int(st["n_docs"]), float(st["avgdl"])
    if not distinct:
        return QueryPlan([], [], [], [], 0, n_docs, avgdl)
    rows = (
        terms_table.where(F.col("term").isin(distinct))
        .select("term", "term_id", "df")
        .collect()
    )
    found = {r["term"]: (int(r["term_id"]), int(r["df"])) for r in rows}
    present = [t for t in distinct if t in found]
    # rarest-first (df asc), term as deterministic tie-break
    present.sort(key=lambda t: (found[t][1], t))
    return QueryPlan(
        terms=present,
        term_ids=[found[t][0] for t in present],
        dfs=[found[t][1] for t in present],
        idfs=[idf(n_docs, found[t][1]) for t in present],
        n_absent=len(distinct) - len(present),
        n_docs=n_docs,
        avgdl=avgdl,
    )
