"""Index-powered corpus analytics beyond search.

The published inverted index is also the cheapest path to per-document term
statistics: postings already hold exact (term, doc, tf) and the terms table
exact df — so TF-IDF-style keyword extraction is a decode + broadcast join,
never a re-tokenize of the corpus.

Reference analogue: the reference derives its per-motif "informativeness"
weights from inverted-index occurrence counts rather than re-reading
structures (SURVEY §2 A7 global stats / F6 scorer family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..build.postings import decode_postings


def tfidf_top_terms(engine, k: int = 3) -> DataFrame:
    """Top-``k`` terms per document by smoothed TF-IDF:
    ``(doc_id, term, tfidf)``.

    tfidf = tf * (ln((N + 1) / (df + 1)) + 1)  — the sklearn-style smoothed
    idf, rounded to 6dp; rank ties break term-ascending on the ROUNDED score
    so ordering is engine-portable.  ``N`` is the index's exact doc count
    (stats table), ``df`` the terms table's exact document frequency.

    Scale notes: postings decode streams per posting block (no per-row
    Python); the terms side is vocabulary-sized and broadcast; the only
    shuffle is the per-document window rank, keyed by doc_id — fixed-width
    rows, ~doclen of them per doc.  At 100 TB this is one pass over the
    index, not the corpus.
    """
    n_docs = int(engine._stats_row["n_docs"])
    decoded = decode_postings(engine.postings)  # (term_id, doc_id, tf)
    dims = F.broadcast(engine.terms.select("term_id", "term", "df"))
    scored = decoded.join(dims, on="term_id").select(
        "doc_id",
        "term",
        F.round(
            F.col("tf")
            * (F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + 1.0),
            6,
        ).alias("tfidf"),
    )
    win = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(win))
        .where(F.col("rk") <= k)
        .select("doc_id", "term", "tfidf")
    )
