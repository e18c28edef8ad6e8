"""Phrase (positional) queries — the engine's analogue of the reference's
positional theta-join.

The reference's distinctive query operator extends candidate paths by a
Cartesian product of position payloads filtered on a positional-overlap
pattern (TargetStructure.consume, domain/result/TargetStructure.java:78-111;
overlap classification domain/motif/Overlap.java:41-81).  For text, the same
shape is the classic phrase query: a doc matches iff the query terms occur at
CONSECUTIVE positions, i.e. the intersection over i of
(positions(term_i) - i) is non-empty — a positional equi-join on the shifted
occurrence lists.

Execution: per shard (cogroup task), each phrase slot's postings decode to
flat (doc_id, position) pairs; pairs are packed into one int64 key
``doc_id * 2^22 + (position - slot)`` and the slots are intersected with
``np.intersect1d`` — fully vectorized across all candidate docs at once, no
per-doc loop.  Match count per doc = phrase term frequency.  Global result:
``orderBy(phrase_tf desc, doc_id asc).limit(k)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..build.postings import unpack_positions
from ..codec import unpack_block
from ..oracle import tokenize

_RESULT = "doc_id long, phrase_tf long"
_POS_CAP = 1 << 22  # max positions per doc supported by the packed key


def phrase_topk(
    spark: SparkSession,
    postings: DataFrame,
    terms_table: DataFrame,
    phrase: str,
    k: int = 10,
) -> DataFrame:
    """Top-k docs containing the exact token sequence of ``phrase``, ranked
    by occurrence count (ties -> ascending doc_id)."""
    seq = tokenize(phrase)
    if not seq:
        return spark.createDataFrame([], _RESULT)
    lookup = {
        r["term"]: int(r["term_id"])
        for r in terms_table.where(F.col("term").isin(sorted(set(seq)))).collect()
    }
    if any(t not in lookup for t in seq):  # absent term -> empty (O5 analogue)
        return spark.createDataFrame([], _RESULT)
    slots = [(i, lookup[t]) for i, t in enumerate(seq)]
    tids = sorted({tid for _, tid in slots})

    blocks = postings.where(F.col("term_id").isin(tids)).select(
        "shard", "term_id", "doc_gaps", "tfs", "pos_data"
    )

    def score_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        decoded: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for tid_val, g in pdf.groupby("term_id", sort=False):
            docs_l, pos_l = [], []
            for row in g.itertuples(index=False):
                ids, tfs = unpack_block(bytes(row.doc_gaps), bytes(row.tfs))
                plists = unpack_positions(bytes(row.pos_data), tfs)
                docs_l.append(np.repeat(ids, tfs))
                pos = (
                    np.concatenate(plists) if plists else np.empty(0, np.int64)
                )
                if pos.size and int(pos.max()) >= _POS_CAP - 64:
                    # the packed int64 key cannot represent positions beyond
                    # 2^22 - 64; corrupting keys silently would merge docs —
                    # fail loudly instead (widen the key layout to support
                    # longer documents)
                    raise ValueError(
                        f"document position {int(pos.max())} exceeds the "
                        f"packed-key position capacity {_POS_CAP - 64}"
                    )
                pos_l.append(pos)
            decoded[int(tid_val)] = (
                np.concatenate(docs_l),
                np.concatenate(pos_l),
            )
        keys = None
        for slot, tid_val in slots:
            if tid_val not in decoded:
                return pd.DataFrame({"doc_id": [], "phrase_tf": []}).astype(
                    {"doc_id": "int64", "phrase_tf": "int64"}
                )
            d, p = decoded[tid_val]
            # +64 keeps (p - slot) non-negative for any phrase length < 64,
            # so shifted keys cannot underflow into the previous doc's range
            kk = d * _POS_CAP + (p - slot) + 64
            keys = kk if keys is None else np.intersect1d(keys, kk)
            if keys.size == 0:
                break
        if keys is None or keys.size == 0:
            return pd.DataFrame({"doc_id": [], "phrase_tf": []}).astype(
                {"doc_id": "int64", "phrase_tf": "int64"}
            )
        docs = (keys - 64) // _POS_CAP
        uniq, counts = np.unique(docs, return_counts=True)
        return pd.DataFrame(
            {"doc_id": uniq.astype("int64"), "phrase_tf": counts.astype("int64")}
        )

    scored = blocks.groupBy("shard").applyInPandas(score_shard, schema=_RESULT)
    return scored.orderBy(F.desc("phrase_tf"), F.asc("doc_id")).limit(k)
