"""Brute-force numpy BM25 oracle — the engine's correctness authority.

The reference's correctness authority is a set of checked-in golden fixtures
with exact counts (core/StructureIntegrationTest.java:170 asserts exactly 788
hits; io/DefaultInvertedIndexTest.java:65-66 asserts 13 structures / 241
occurrences).  This module is the analogue: a ~100-line pure-Python/numpy BM25
over an in-memory corpus, against which every engine query must be
rank-identical (same doc_ids, float64 scores equal, ties broken by ascending
doc_id).

Scoring contract (FIXTURES.md §4):
    k1 = 1.2, b = 0.75
    idf(t)      = ln((N - df + 0.5) / (df + 0.5) + 1)          # Lucene-style
    score(q, d) = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
summed over *distinct* query terms in ascending term order (deterministic
float64 summation order), ties broken by ascending doc_id.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

import numpy as np

from . import BM25_B, BM25_K1, TOKEN_PATTERN

_TOKEN_RE = re.compile(TOKEN_PATTERN)


@dataclass
class OracleIndex:
    """In-memory exact inverted index over a small corpus."""

    doc_ids: np.ndarray  # int64, ascending
    doclens: np.ndarray  # int64, aligned with doc_ids
    postings: dict[str, tuple[np.ndarray, np.ndarray]]  # term -> (doc_ids, tfs)
    n_docs: int = 0
    avgdl: float = 0.0
    df: dict[str, int] = field(default_factory=dict)
    cf: dict[str, int] = field(default_factory=dict)

    def __post_init__(self) -> None:
        self.n_docs = int(self.doc_ids.size)
        self.avgdl = float(self.doclens.sum()) / self.n_docs if self.n_docs else 0.0
        self.df = {t: int(p[0].size) for t, p in self.postings.items()}
        self.cf = {t: int(p[1].sum()) for t, p in self.postings.items()}


def tokenize(text: str) -> list[str]:
    return _TOKEN_RE.findall(text)


def build_oracle(doc_ids: list[int], texts: list[str]) -> OracleIndex:
    order = np.argsort(np.asarray(doc_ids, dtype=np.int64), kind="stable")
    ids = np.asarray(doc_ids, dtype=np.int64)[order]
    lens = np.zeros(ids.size, dtype=np.int64)
    post: dict[str, dict[int, int]] = {}
    for row, i in enumerate(order):
        toks = tokenize(texts[i])
        lens[row] = len(toks)
        d = int(ids[row])
        for t in toks:
            post.setdefault(t, {})
            post[t][d] = post[t].get(d, 0) + 1
    postings = {}
    for t, m in post.items():
        ds = np.fromiter(sorted(m), dtype=np.int64, count=len(m))
        tfs = np.asarray([m[int(d)] for d in ds], dtype=np.int64)
        postings[t] = (ds, tfs)
    return OracleIndex(doc_ids=ids, doclens=lens, postings=postings)


def idf(n_docs: int, df: int) -> float:
    return math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def bm25_topk(
    index: OracleIndex,
    query: str,
    k: int = 10,
    mode: str = "or",
    expansions: dict[str, list[str]] | None = None,
    exclude: str | None = None,
    should: str | None = None,
    term_order: dict[str, int] | None = None,
) -> list[tuple[int, float]]:
    """Top-k (doc_id, score) for a query string.

    mode='or'  — disjunctive BM25 (any query term matches).
    mode='and' — conjunctive: doc must contain ALL distinct query terms
                 (the reference's progressive-intersection semantics,
                 DefaultTargetAssembler.java:92-111).
    ``should`` — SHOULD-clause terms (boolean mode, matching the engine):
                 ``query`` terms are MUST, should-terms score without
                 filtering; a term in both is MUST; ``mode`` is ignored.
    ``expansions`` (A4, ResiduePairOccurrence.java:166-227): each distinct
    query term t plus expansions[t] forms one scoring group; the group's tf
    per doc is the SUM of member tfs, its df is the MAX of present members'
    dfs (Lucene SynonymQuery convention — matches the engine).
    Groups are scored in ascending min-member-term order (fixed float64
    summation order); ties broken by ascending doc_id.

    Summation-order caveat: the ENGINE sums groups by ascending min member
    *term_id*; for a freshly built index term_ids are the lexicographic
    rank of the vocabulary, so string order here matches bitwise.  After an
    incremental ADD that mints NEW terms (ids past the old max), the two
    orders can differ for queries mixing >= 3 old/new-term groups, and
    float64 non-associativity can shift the last ulp.  Pass ``term_order``
    (term -> term_id from the engine's terms table) to replay the engine's
    exact order in that case.
    """
    base_terms = sorted(set(tokenize(query)))
    should_terms = (
        sorted(set(tokenize(should)) - set(base_terms))
        if should is not None else []
    )
    groups: list[tuple[list[str], bool]] = []
    for t, req in [(t, True) for t in base_terms] + [
        (t, False) for t in should_terms
    ]:
        members = [t]
        for syn in (expansions or {}).get(t, []):
            # same normalization + single-token validation as the engine
            # planner (plan_query) — a non-normalized synonym must not make
            # oracle and engine silently diverge
            toks = tokenize(syn)
            if len(toks) != 1:
                raise ValueError(
                    f"expansion {syn!r} of {t!r} is not a single term"
                )
            if toks[0] not in members:
                members.append(toks[0])
        groups.append((members, req))

    # resolve each group: present members, combined postings, group df
    resolved = []  # (sort_key, present_members, required)
    n_absent = 0
    for members, req in groups:
        present = [m for m in members if m in index.postings]
        if not present:
            # absent SHOULD groups are no-ops (matching the engine planner)
            n_absent += 1 if req else 0
            continue
        # ascending min-member order: by engine term_id when provided,
        # else by term string (identical for fresh-build indexes)
        key = (
            min(term_order[m] for m in present)
            if term_order is not None
            else min(present)
        )
        resolved.append((key, present, req))
    resolved.sort()

    scores: dict[int, float] = {}
    seen_count: dict[int, int] = {}
    for _, present, req in resolved:
        gdf = max(index.df[m] for m in present)
        w = idf(index.n_docs, gdf)
        gtf: dict[int, int] = {}
        for m in present:
            ds, tfs = index.postings[m]
            for d, t_ in zip(ds.tolist(), tfs.tolist()):
                gtf[d] = gtf.get(d, 0) + t_
        ds = np.fromiter(sorted(gtf), dtype=np.int64, count=len(gtf))
        tf = np.asarray([gtf[int(d)] for d in ds], dtype=np.float64)
        row = np.searchsorted(index.doc_ids, ds)
        dl = index.doclens[row].astype(np.float64)
        denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / index.avgdl)
        contrib = w * (tf * (BM25_K1 + 1.0)) / denom
        for d, c in zip(ds.tolist(), contrib.tolist()):
            scores[d] = scores.get(d, 0.0) + c
            if should is None or req:
                seen_count[d] = seen_count.get(d, 0) + 1
    if should is not None:
        # boolean mode: hit must contain every present-MUST group; an absent
        # MUST group empties the result; no MUST clauses -> pure disjunction
        if n_absent:
            return []
        need = sum(1 for _, _, req in resolved if req)
        if need:
            scores = {
                d: s for d, s in scores.items()
                if seen_count.get(d, 0) == need
            }
    elif mode == "and":
        if n_absent:
            return []  # a group with no occurring member -> conjunction empty
        need = len(resolved)
        scores = {d: s for d, s in scores.items() if seen_count[d] == need}
    if exclude:
        # NOT-term semantics: drop docs containing ANY excluded term; global
        # stats (idf, avgdl, N) are untouched — exclusion is a filter, not a
        # corpus change (matches the engine's dense_len masking)
        excl_docs: set[int] = set()
        for t in set(tokenize(exclude)):
            p = index.postings.get(t)
            if p is not None:
                excl_docs.update(int(d) for d in p[0].tolist())
        scores = {d: s for d, s in scores.items() if d not in excl_docs}
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]


def bm25f_topk(
    content: OracleIndex,
    fld: OracleIndex,
    query: str,
    k: int = 10,
    mode: str = "or",
    w_content: float = 1.0,
    w_field: float = 1.0,
) -> list[tuple[int, float]]:
    """Fielded most_fields oracle — exact replica of query/fielded.py.

    ``fld`` is an OracleIndex built over the field strings of ALL docs (so
    its n_docs/avgdl match field_stats' corpus-wide convention).  Per term,
    per field: BM25 with that field's df/avgdl/length; combined cell =
    w_content*c_content + w_field*c_field over the UNION of matching docs;
    per-doc sum in ascending-term order (the engine's array_sort contract);
    AND mode keeps docs matching every term in at least one field.
    Float64 parity: same primitive decomposition as ``bm25_topk`` (numpy
    elementwise, math.log idf), summed left-to-right per doc.
    """
    terms = sorted(set(tokenize(query)))
    if not terms:
        return []

    def side(ix: OracleIndex) -> dict[str, dict[int, float]]:
        out: dict[str, dict[int, float]] = {}
        for t in terms:
            p = ix.postings.get(t)
            if p is None:
                continue
            ds, tfs = p
            w = idf(ix.n_docs, ix.df[t])
            tf = tfs.astype(np.float64)
            row = np.searchsorted(ix.doc_ids, ds)
            dl = ix.doclens[row].astype(np.float64)
            denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / ix.avgdl)
            contrib = w * (tf * (BM25_K1 + 1.0)) / denom
            out[t] = dict(zip(ds.tolist(), contrib.tolist()))
        return out

    cs, fs = side(content), side(fld)
    cell: dict[tuple[int, str], float] = {}
    matched: dict[int, set[str]] = {}
    for t in terms:
        docs = set(cs.get(t, {})) | set(fs.get(t, {}))
        for d in docs:
            cell[(d, t)] = (
                w_content * cs.get(t, {}).get(d, 0.0)
                + w_field * fs.get(t, {}).get(d, 0.0)
            )
            matched.setdefault(d, set()).add(t)
    if mode == "and":
        matched = {d: s for d, s in matched.items() if len(s) == len(terms)}
    scores: dict[int, float] = {}
    for d, ts in matched.items():
        s = 0.0
        for t in sorted(ts):
            s += cell[(d, t)]
        scores[d] = s
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def ql_topk(
    index: OracleIndex, query: str, k: int = 10, mu: float = 2000.0
) -> list[tuple[int, float]]:
    """Dirichlet query-likelihood oracle (query/ql.py contract): candidates
    = docs matching >=1 present query term; absent terms dropped; score =
    sum_t ln((tf + mu*cf_t/C) / (dl + mu)) in ascending-term order (the
    engine sums in ascending term_id == ascending first-seen order; for
    bitwise equality tests build corpora where term_id order == sorted-term
    order, which the builder's sorted dictionary mint guarantees)."""
    terms = sorted(
        t for t in set(tokenize(query)) if t in index.postings
    )
    if not terms:
        return []
    coll_len = float(index.doclens.sum())
    cand_set: set[int] = set()
    for t in terms:
        cand_set.update(int(d) for d in index.postings[t][0].tolist())
    cand = np.fromiter(sorted(cand_set), dtype=np.int64, count=len(cand_set))
    rows = np.searchsorted(index.doc_ids, cand)
    dl = index.doclens[rows].astype(np.float64)
    # numpy ops in the engine kernel's exact decomposition and order
    # (np.log(tf + smooth) - np.log(dl + mu), term-ascending accumulation):
    # np.log and math.log differ in the last ulp, so bitwise equality
    # requires replaying the SAME vectorized primitives, not just the math
    log_denom = np.log(dl + mu)
    score = np.zeros(cand.size, dtype=np.float64)
    for t in terms:
        ds, tfs = index.postings[t]
        j = np.searchsorted(ds, cand)
        hit = (j < ds.size) & (ds[np.minimum(j, ds.size - 1)] == cand)
        tf = np.where(hit, tfs[np.minimum(j, ds.size - 1)], 0).astype(
            np.float64
        )
        score += np.log(tf + mu * (index.cf[t] / coll_len)) - log_denom
    out = list(zip(cand.tolist(), score.tolist()))
    out.sort(key=lambda kv: (-kv[1], kv[0]))
    return out[:k]


def near_spans(
    texts: dict[int, str], query: str, window: int, ordered: bool = False
) -> list[tuple[int, int]]:
    """Proximity oracle (query/phrase.py near_topk contract): for each doc
    containing ALL distinct query terms, the minimal max-min position span
    covering one occurrence of each; emit (doc_id, span) for span <= window,
    ordered span asc then doc_id asc.  ``ordered``: occurrences must form a
    strictly-ascending chain in query-token order (repeats allowed).
    Brute force over all position combinations — O(prod tf) per doc, test
    corpora only."""
    from itertools import product

    terms = (
        list(tokenize(query)) if ordered else sorted(set(tokenize(query)))
    )
    out = []
    for d in sorted(texts):
        toks = tokenize(texts[d])
        plists = [
            [i for i, w in enumerate(toks) if w == t] for t in terms
        ]
        if any(not p for p in plists):
            continue
        spans = [
            max(combo) - min(combo)
            for combo in product(*plists)
            if not ordered
            or all(a < b for a, b in zip(combo, combo[1:]))
        ]
        if not spans:
            continue
        best = min(spans)
        if best <= window:
            out.append((d, best))
    out.sort(key=lambda kv: (kv[1], kv[0]))
    return out
