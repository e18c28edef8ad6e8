"""Incremental index maintenance + streaming ingest.

The reference is batch + incremental: ADD/REMOVE/RECOVER operations over a
live index with commit-interval chunking and dirty-list recovery
(update/StrucmotifUpdate.java).  Here the same semantics are expressed as
copy-on-write generations with file-level reuse (the Iceberg-snapshot shape):

- incremental.py — add_documents / remove_documents / verify_consistency
- stream_ingest.py — Structured Streaming wrapper (micro-batch ADD)
"""
