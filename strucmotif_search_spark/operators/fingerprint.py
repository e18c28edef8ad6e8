"""Winnowing document fingerprints (rolling k-gram hash + window-min).

Implements the MOSS fingerprinting scheme of Schleimer, Wilkerson & Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting" (SIGMOD 2003):
hash every k-token gram, slide a window of w consecutive gram hashes over the
document, and keep the minimum hash of each window (rightmost position on
ties).  The selected (hash, position) set is the document's fingerprint; any
shared substring of at least k + w - 1 tokens between two documents is
GUARANTEED to surface as at least one shared fingerprint, which makes the
fingerprint set a compact, recall-guaranteed near-dup / plagiarism signature.

This is the rolling-hash counterpart to ``textstats.fingerprint_casefold``
(whole-document canonical form): winnowing fingerprints localize WHICH parts
of two documents overlap, at ~2/(w+1) the density of full k-gram hashing.

Scale notes (the 100 TB part):
- winnowing is doc-local, so the whole selection runs as pure row
  expressions over the token array — transform/slice/array_min inside one
  projection.  NO shuffle, no window function, no UDF: a corpus-wide
  fingerprint pass is exactly one scan.  The O(G*w) slice-min work is
  vectorized JVM code and w is small (4-16) by construction.
- the overlap-pair join shuffles (fp, doc_id) rows — fixed-width, never the
  text — and ``max_fp_df`` excludes corpus-hot fingerprints (boilerplate)
  from candidate generation, the same quadratic-bomb cap as
  dedup.ngram_jaccard_pairs' ``max_shingle_df``.

Hashes are the first 10 hex chars of md5 (40 bits) so DuckDB can replay the
pipeline bit-exactly as a correctness oracle; (hash, position) pairs are
packed into one int64 (40 + 22 bits, ANSI-overflow-safe) so the per-window
argmin with rightmost tie-break stays a single ``array_min``.

Reference analogue: the reference's fixed binning of residue-pair geometry
into compact descriptors (core/src/main/java/.../DistanceType.java binning,
per SURVEY §2 F1/F2) plays the same role — a deterministic, compact,
collision-tolerant signature computed row-locally at build time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import spread
from .dedup import _md5_int, _tokens

# positions are packed into the low 22 bits of the selection key; documents
# with more grams than this cannot be fingerprinted correctly, so fail loudly
# (same cap family as query/phrase.py:_POS_CAP).
_POS_CAP = 1 << 22


def _gram_hash40(gram: Column) -> Column:
    """Portable 40-bit gram hash (shared md5-prefix scheme, dedup._md5_int)."""
    return _md5_int(gram, hex_chars=10)


def winnow(
    docs: DataFrame, k: int = 3, w: int = 4, text_col: str = "text"
) -> DataFrame:
    """Winnowing fingerprints: (doc_id, pos, fp) — ``fp`` the 40-bit k-gram
    hash selected at 0-based gram position ``pos``.

    Every window of ``w`` consecutive grams contributes its minimum-hash gram
    (rightmost on ties); consecutive windows usually select the same gram, so
    the expected density is 2/(w+1) fingerprints per gram.  Docs with fewer
    than ``k`` tokens yield no fingerprints.

    Packs (hash, pos) as ``hash * 2^22 + (2^22 - 1 - pos)`` with pos 0-based,
    so ``array_min`` over a window picks the smallest hash and, on ties, the
    RIGHTMOST position — the canonical winnowing tie-break.  Values stay
    under 2^62 (40-bit hash), safe under ANSI arithmetic.

    The token and packed-key arrays are materialized as NAMED COLUMNS in
    separate projections on purpose: expressions nested inside higher-order
    lambdas are re-evaluated per lambda invocation (no subexpression
    elimination across lambda calls), so inlining ``keys`` into the
    window-min transform would recompute every md5 for every window — O(G²)
    per document.  Multi-referenced expensive aliases block CollapseProject,
    pinning the once-per-row evaluation.
    """
    tok_df = spread(docs).select(
        "doc_id", _tokens(F.col(text_col), lower=True).alias("toks")
    )
    n_grams = F.size("toks") - (k - 1)
    keys = F.when(
        F.size("toks") >= k,
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i, j: _gram_hash40(F.concat_ws(" ", F.slice("toks", i, k)))
            * F.lit(_POS_CAP)
            + (F.lit(_POS_CAP - 1) - j),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    key_df = tok_df.select("doc_id", keys.alias("keys"))
    # one selection per window END position p (1-based): min over the w
    # trailing keys.  Windows shorter than w exist only at the document head
    # (p < w), matching the convention that a doc with fewer than w grams
    # still yields its global-min fingerprint.
    sels = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("keys")),
            lambda p: F.array_min(
                F.slice(
                    "keys", F.greatest(F.lit(1), p - (w - 1)), F.least(F.lit(w), p)
                )
            ),
        )
    )
    guarded = F.when(
        # positions are 0-based, so exactly _POS_CAP grams (max j =
        # _POS_CAP - 1, packed offset 0) still fit; raise only ABOVE it
        F.size("keys") > _POS_CAP,
        F.raise_error(
            F.format_string(
                "winnow: document exceeds %d grams; positions no longer fit "
                "the packed key", F.lit(_POS_CAP)
            )
        ).cast("array<bigint>"),
    ).when(
        # sequence(1, 0) DESCENDS — a doc with no grams must yield no
        # selections, not a [null] from sliced-empty minima
        F.size("keys") >= 1,
        sels,
    ).otherwise(F.array().cast("array<bigint>"))
    sel = key_df.select("doc_id", F.explode(guarded).alias("key"))
    return sel.select(
        "doc_id",
        (F.lit(_POS_CAP - 1) - F.pmod("key", F.lit(_POS_CAP))).alias("pos"),
        F.shiftright("key", 22).alias("fp"),
    )


def winnow_overlap_pairs(
    docs: DataFrame,
    k: int = 3,
    w: int = 4,
    min_common: int = 2,
    max_fp_df: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Document pairs sharing >= ``min_common`` distinct winnowing
    fingerprint hashes: (doc_a, doc_b, n_common), doc_a < doc_b.

    By the winnowing guarantee, any pair sharing a run of k + w - 1 tokens
    shares at least one selected gram hash, so this is a recall-guaranteed
    overlap detector at fingerprint (not full k-gram) cost.

    ``max_fp_df`` drops fingerprints present in more than that many documents
    from pair GENERATION only (hot boilerplate grams would otherwise create a
    quadratic candidate bomb); ``n_common`` then counts the surviving shared
    fingerprints.  ``None`` keeps every fingerprint (exact, small-corpus
    path).  Scale-sensitive callers must opt in explicitly, mirroring
    dedup.ngram_jaccard_pairs.
    """
    fps = winnow(docs, k=k, w=w, text_col=text_col).select("doc_id", "fp").distinct()
    if max_fp_df is not None:
        hot = (
            fps.groupBy("fp")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") > max_fp_df)
            .select("fp")
        )
        # no broadcast hint: on boilerplate-heavy corpora the hot set is
        # unbounded — AQE picks broadcast when it measures small (same
        # pattern as dedup.ngram_jaccard_pairs' hot-shingle exclusion)
        fps = fps.join(hot, on="fp", how="anti")
    a = fps.select(F.col("doc_id").alias("doc_a"), "fp")
    b = fps.select(F.col("doc_id").alias("doc_b"), "fp")
    return (
        a.join(b, on="fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
        .where(F.col("n_common") >= min_common)
    )
