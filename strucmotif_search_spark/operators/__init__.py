"""Training-data pipeline operators — first-class components alongside the
inverted-index engine: deduplication, similarity search, text analysis, and
multimodal column plumbing, all DataFrame-first and shuffle-conscious.
"""
