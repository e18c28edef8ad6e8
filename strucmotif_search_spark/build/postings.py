"""SPIMI posting construction + block packing.

Reference analogues:
- stage 1 (map): per-doc tokenize + tf extraction = the per-doc work in
  StrucmotifUpdate.handleUpdateItem (update/StrucmotifUpdate.java:327-373),
  expressed as mapInPandas over the source table (tokenizer.term_frequencies);
- the shuffle: the reference's per-thread per-term-prefix partial files
  (update/Context.java:50-73) are Spark's shuffle made explicit — we group by
  (shard, term_id) where ``shard`` is the doc-range partition;
- stage 2 (merge + encode): DefaultInvertedIndex.commit's fold-and-encode
  (io/DefaultInvertedIndex.java:120-239) becomes a grouped applyInPandas that
  sorts each (shard, term) run by doc_id and packs delta-gap varint blocks
  with skip metadata (north_rule upgrade over the reference's absolute-id
  varints, io/codec/ColferCodec.java:101-133).

Skew: head terms (df ~ N, e.g. ``import``) never form a single group because
the index is document-sharded — a term's postings are split across shards by
doc range, each group is at most ``docs_per_shard`` entries, and shards are
disjoint ascending doc ranges so per-shard block sets need no cross-merge
(the split-and-merge of SURVEY.md §4.3 with the merge made trivial by
construction).

Posting-block schema (the analogue of ArrayBucket's CSR triple,
domain/bucket/ArrayBucket.java:32-34, plus skip pointers):
    shard int, term_id long, block_id int, first_doc_id long, max_doc_id long,
    n_docs int, block_max_tf int, doc_gaps binary, tfs binary
Blocks within (shard, term_id) are doc-ascending; ``first_doc_id`` /
``max_doc_id`` are the skip pointers, ``block_max_tf`` the block-max score
bound input for WAND.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..codec import pack_block

BLOCK_DOCS = 128

POSTINGS_SCHEMA = StructType(
    [
        StructField("shard", IntegerType(), False),
        StructField("term_id", LongType(), False),
        StructField("block_id", IntegerType(), False),
        StructField("first_doc_id", LongType(), False),
        StructField("max_doc_id", LongType(), False),
        StructField("n_docs", IntegerType(), False),
        StructField("block_max_tf", IntegerType(), False),
        StructField("doc_gaps", BinaryType(), False),
        StructField("tfs", BinaryType(), False),
    ]
)


def _pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """One (shard, term_id) run -> block rows.  Array-at-a-time numpy."""
    shard = int(pdf["shard"].iloc[0])
    term_id = int(pdf["term_id"].iloc[0])
    order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
    doc_ids = pdf["doc_id"].to_numpy()[order].astype(np.int64)
    tfs = pdf["tf"].to_numpy()[order].astype(np.int64)
    rows = []
    for b, lo in enumerate(range(0, doc_ids.size, BLOCK_DOCS)):
        ids = doc_ids[lo : lo + BLOCK_DOCS]
        t = tfs[lo : lo + BLOCK_DOCS]
        gaps_b, tfs_b = pack_block(ids, t)
        rows.append(
            (
                shard,
                term_id,
                b,
                int(ids[0]),
                int(ids[-1]),
                int(ids.size),
                int(t.max()),
                gaps_b,
                tfs_b,
            )
        )
    return pd.DataFrame(
        rows,
        columns=[f.name for f in POSTINGS_SCHEMA.fields],
    )


def pack_postings(tf_with_ids: DataFrame) -> DataFrame:
    """(doc_id, term_id, tf, shard) -> packed posting blocks.

    One shuffle on (shard, term_id); grouped applyInPandas packs each run.
    Group size is bounded by docs_per_shard, so no group can straggle
    regardless of term df.
    """
    return tf_with_ids.select("shard", "term_id", "doc_id", "tf").groupBy(
        "shard", "term_id"
    ).applyInPandas(_pack_group, schema=POSTINGS_SCHEMA)


DECODED_SCHEMA = StructType(
    [
        StructField("term_id", LongType(), False),
        StructField("doc_id", LongType(), False),
        StructField("tf", LongType(), False),
    ]
)


def decode_postings(blocks: DataFrame) -> DataFrame:
    """Inverse of pack_postings -> (term_id, doc_id, tf).  Used by tests,
    REMOVE rewrites (E3) and the orphan-consistency check (E5)."""

    def _unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..codec import unpack_block

        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_terms, out_docs, out_tfs = [], [], []
            for term_id, gaps, tfb in zip(
                pdf["term_id"].to_numpy(),
                pdf["doc_gaps"],
                pdf["tfs"],
            ):
                ids, t = unpack_block(bytes(gaps), bytes(tfb))
                out_terms.append(np.full(ids.size, term_id, dtype=np.int64))
                out_docs.append(ids)
                out_tfs.append(t)
            if not out_docs:
                continue
            yield pd.DataFrame(
                {
                    "term_id": np.concatenate(out_terms),
                    "doc_id": np.concatenate(out_docs),
                    "tf": np.concatenate(out_tfs),
                }
            )

    return blocks.select("term_id", "doc_gaps", "tfs").mapInPandas(
        _unpack, schema=DECODED_SCHEMA
    )
