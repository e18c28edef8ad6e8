"""strucmotif_search_spark — a PySpark-native inverted-index build + BM25
query engine, designed from scratch in the spirit of rcsb/strucmotif-search's
inverted-index strategy (reference at /root/reference, read-only).

The reference is a structural-biology motif search engine whose architecture is
a textbook full-text retrieval system (see SURVEY.md): documents are tokenized
into discrete terms, terms key an inverted index of posting lists, queries are
conjunctions processed rarest-first with progressive intersection, survivors
are scored and top-k'd.  This package re-expresses that architecture
Spark-first:

- ``tokenizer``   — vectorized (Arrow) tokenization; the analogue of
                    ``ResidueGraph`` term extraction.
- ``codec``       — numpy delta-gap + varint posting-block codec; the analogue
                    of ``io/codec/ColferCodec.java`` (upgraded per north_rule to
                    delta-gap varint with per-block skip pointers).
- ``build``       — SPIMI posting construction + sort-merge + block packing,
                    doc/term dictionaries, exact stats, resumable lineage; the
                    analogue of ``StrucmotifUpdate`` + ``DefaultInvertedIndex``.
- ``query``       — df-ascending planning, DAAT intersection, BM25 scoring with
                    block-max WAND pruning, distributed top-k; the analogue of
                    ``DefaultTargetAssembler`` + ``DefaultStrucmotifRuntime``.
- ``operators``   — large-scale training-data pipeline operators (dedup,
                    similarity search, text analysis, multimodal plumbing).
- ``streaming``   — incremental ADD/REMOVE semantics and streaming ingest.

Everything hot-path is DataFrame + Arrow-vectorized pandas UDFs; no per-row
Python anywhere.
"""

__version__ = "0.1.0"

BM25_K1 = 1.2
BM25_B = 0.75

# Frozen tokenizer contract (FIXTURES.md §2): maximal identifier runs,
# case-sensitive, no stemming, no stopword removal.  The analogue of the
# reference's frozen binning rules (DistanceType.java:161-170).
TOKEN_PATTERN = r"[A-Za-z_][A-Za-z0-9_]*"
