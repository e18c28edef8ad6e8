"""Vectorized tokenization — the engine's analogue of the reference's
per-document term extraction (``ResidueGraph``: structure -> multiset of
residue-pair descriptor terms, domain/structure/ResidueGraph.java:138-146).

The tokenizer contract is FROZEN (FIXTURES.md §2): tokens are maximal
``[A-Za-z_][A-Za-z0-9_]*`` runs, case-sensitive, no stemming, no stopword
removal.  Freezing the rule is the analogue of the reference freezing its
distance/angle binning rules (DistanceType.java:161-170) — the vocabulary is
defined by the rule, and exactness is asserted against the oracle, not
assumed.

Two code paths, both JVM/Arrow friendly:

- :func:`tokenize_expr` — pure Catalyst expression (``regexp_extract_all``),
  whole-stage-codegen'd, used when a token *array column* is all we need.
- :func:`term_frequencies` — ``mapInPandas`` kernel emitting
  ``(doc_id, term, tf)`` + doclen, array-at-a-time via pandas
  ``str.findall`` + ``explode`` + ``value_counts`` (no per-row Python).
  This is SPIMI stage-1's map side (StrucmotifUpdate.java:327-373 analogue).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from . import TOKEN_PATTERN

TF_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("term", StringType(), False),
        StructField("tf", LongType(), False),
    ]
)

# positional flavor: token ordinals within the document, ascending — the
# analogue of the reference's per-doc occurrence payload
# (ResiduePairIdentifier positions in each bucket, ArrayBucket.java:34)
from pyspark.sql.types import ArrayType  # noqa: E402

TFP_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("term", StringType(), False),
        StructField("tf", LongType(), False),
        StructField("positions", ArrayType(LongType(), False), False),
    ]
)

DOCLEN_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("doclen", LongType(), False),
    ]
)


def _with_sha(schema: StructType) -> StructType:
    """Schema variant carrying ``content_sha256`` on ONE row per document
    (null elsewhere) — the fused build's single-content-pass trick: the
    digest is computed JVM-side in the same scan that feeds tokenization,
    so the build never re-reads document content for the doc_map stage.
    A token-less document emits one sentinel row (term '', tf 0) so its
    digest still reaches the spill; consumers filter ``tf > 0``."""
    return StructType(
        schema.fields + [StructField("content_sha256", StringType(), True)]
    )


TF_SHA_SCHEMA = _with_sha(TF_SCHEMA)
TFP_SHA_SCHEMA = _with_sha(TFP_SCHEMA)


def tokenize_expr(content: Column) -> Column:
    """Token array column via Catalyst ``regexp_extract_all`` (JVM-side,
    codegen).  Equivalent to the frozen contract."""
    return F.regexp_extract_all(content, F.lit(TOKEN_PATTERN), 0)


def doclen_expr(content: Column) -> Column:
    """Token count per document as a Catalyst expression."""
    return F.size(tokenize_expr(content))


def _tf_batches(
    batches: Iterator[pd.DataFrame],
    pattern: str,
    with_positions: bool = False,
    with_sha: bool = False,
) -> Iterator[pd.DataFrame]:
    """Arrow-native tf kernel: zero per-token Python objects.

    ``findall('[A-Za-z_][A-Za-z0-9_]*')`` is computed as the exactly
    equivalent split-form: split on ``[^A-Za-z0-9_]+`` (maximal token-char
    runs), strip any leading digits, drop empties.  Tokens stay in Arrow C
    buffers; per-(doc, term) counting runs on dictionary codes in numpy
    (one uint64 key = row_index<<32 | code).  Python strings materialize
    only for the far-smaller set of unique (doc, term) pairs.  This is what
    keeps the map stage memory-bandwidth-light at scale (48M token objects
    per batch would thrash the allocator and stall every core).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def sentinels(pdf: pd.DataFrame, rows: "np.ndarray") -> pd.DataFrame:
        """One (term='', tf=0) row per token-less document, carrying its
        digest — consumers filter tf > 0; the inner dictionary join drops
        these before packing."""
        out = {
            "doc_id": pdf["doc_id"].to_numpy()[rows].astype("int64"),
            "term": [""] * len(rows),
            "tf": np.zeros(len(rows), dtype="int64"),
        }
        if with_positions:
            out["positions"] = [[] for _ in range(len(rows))]
        out["content_sha256"] = pdf["content_sha256"].to_numpy()[rows]
        return pd.DataFrame(out)

    for pdf in batches:
        if len(pdf) == 0:
            continue
        # 32-bit offsets: Arrow batches are bounded by
        # spark.sql.execution.arrow.maxRecordsPerBatch (well under 2 GB of
        # text), and the token array's OFFSETS are ~8 bytes x n_tokens with
        # large_string — as large as the token bytes themselves.  The map
        # stage is memory-bandwidth-bound at high parallelism, so halving
        # offset traffic is real build time.
        content = pa.array(pdf["content"], type=pa.string())
        toks = pc.split_pattern_regex(content, pattern="[^A-Za-z0-9_]+")
        parent = pc.list_parent_indices(toks)
        flat = pc.list_flatten(toks)
        # "^[0-9]+" as a character-set trim — same result (digits can never
        # start a token, only continue one), ~4x faster than the regex
        # replace and with no extra full-array copy on the no-op path
        flat = pc.utf8_ltrim(flat, characters="0123456789")
        mask = pc.not_equal(flat, "")
        flat = flat.filter(mask)
        parent = parent.filter(mask)
        if len(flat) == 0:
            if with_sha:
                yield sentinels(pdf, np.arange(len(pdf)))
            continue
        d = pc.dictionary_encode(flat)
        codes = d.indices.to_numpy().astype(np.int64)
        rows = parent.to_numpy()
        key = (rows.astype(np.uint64) << np.uint64(32)) | codes.astype(np.uint64)
        if not with_positions:
            uniq, counts = np.unique(key, return_counts=True)
            urows = (uniq >> np.uint64(32)).astype(np.int64)
            ucodes = (uniq & np.uint64(0xFFFFFFFF)).astype(np.int64)
            doc_ids = pdf["doc_id"].to_numpy()[urows]
            terms = d.dictionary.take(pa.array(ucodes)).to_pandas()
            out = pd.DataFrame(
                {
                    "doc_id": doc_ids.astype("int64"),
                    "term": terms.to_numpy(),
                    "tf": counts.astype("int64"),
                }
            )
            if with_sha:
                # digest on the FIRST emitted row of each doc (uniq keys are
                # ascending by row index, so first occurrence = first row)
                present, first_idx = np.unique(urows, return_index=True)
                sha = np.full(len(out), None, dtype=object)
                sha[first_idx] = pdf["content_sha256"].to_numpy()[present]
                out["content_sha256"] = sha
                missing = np.setdiff1d(
                    np.arange(len(pdf)), present, assume_unique=True
                )
                if missing.size:
                    out = pd.concat(
                        [out, sentinels(pdf, missing)], ignore_index=True
                    )
            yield out
            continue
        # token ordinal within its doc: arange minus the doc's first index
        row_change = np.empty(rows.size, dtype=bool)
        row_change[0] = True
        row_change[1:] = rows[1:] != rows[:-1]
        row_starts = np.flatnonzero(row_change)
        row_group = np.cumsum(row_change) - 1
        ordinals = np.arange(rows.size, dtype=np.int64) - row_starts[row_group]
        # stable sort by (row, code): ordinals stay ascending per pair
        order = np.argsort(key, kind="stable")
        skey = key[order]
        spos = ordinals[order]
        uniq, starts, counts = np.unique(skey, return_index=True, return_counts=True)
        urows = (uniq >> np.uint64(32)).astype(np.int64)
        ucodes = (uniq & np.uint64(0xFFFFFFFF)).astype(np.int64)
        doc_ids = pdf["doc_id"].to_numpy()[urows]
        terms = d.dictionary.take(pa.array(ucodes)).to_pandas()
        positions = np.split(spos, starts[1:])
        out = pd.DataFrame(
            {
                "doc_id": doc_ids.astype("int64"),
                "term": terms.to_numpy(),
                "tf": counts.astype("int64"),
                "positions": positions,
            }
        )
        if with_sha:
            present, first_idx = np.unique(urows, return_index=True)
            sha = np.full(len(out), None, dtype=object)
            sha[first_idx] = pdf["content_sha256"].to_numpy()[present]
            out["content_sha256"] = sha
            missing = np.setdiff1d(
                np.arange(len(pdf)), present, assume_unique=True
            )
            if missing.size:
                out = pd.concat(
                    [out, sentinels(pdf, missing)], ignore_index=True
                )
        yield out


def term_frequencies(
    docs: DataFrame,
    content_col: str = "content",
    with_positions: bool = False,
    with_sha: bool = False,
) -> DataFrame:
    """``(doc_id, content)`` -> ``(doc_id, term, tf[, positions])`` via
    mapInPandas.

    The map side of the SPIMI build (one pass over documents, embarrassingly
    parallel — the analogue of the reference's parallelStream over docs at
    StrucmotifUpdate.java:209).  ``with_positions`` also emits each term's
    ascending token ordinals (the occurrence-payload analogue,
    ArrayBucket.java:34).

    ``with_sha`` additionally emits ``content_sha256`` on one row per doc
    (computed JVM-side by ``sha2`` inside the SAME scan — whole-stage
    codegen during the content read), making this the build's ONLY pass
    over document content; token-less docs emit a (term '', tf 0) sentinel
    row so every doc's digest reaches the output.
    """
    cols = ["doc_id", F.col(content_col).alias("content")]
    if with_sha:
        cols.append(F.sha2(F.col(content_col), 256).alias("content_sha256"))
    src = docs.select(*cols)
    pattern = TOKEN_PATTERN
    if with_sha:
        schema = TFP_SHA_SCHEMA if with_positions else TF_SHA_SCHEMA
    else:
        schema = TFP_SCHEMA if with_positions else TF_SCHEMA
    return src.mapInPandas(
        lambda it: _tf_batches(it, pattern, with_positions, with_sha),
        schema=schema,
    )


def doc_lengths(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """``(doc_id, doclen)`` — pure Catalyst, no Python."""
    return docs.select(
        "doc_id", doclen_expr(F.col(content_col)).cast("long").alias("doclen")
    )
