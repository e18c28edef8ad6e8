"""Positional index + phrase query tests — analogue of the reference's
positional path-extension join (TargetStructure.java:78-111)."""

import re

import numpy as np
import pytest

from strucmotif_search_spark import TOKEN_PATTERN
from strucmotif_search_spark.build import IndexStore, build_index
from strucmotif_search_spark.build.postings import (
    decode_postings,
    unpack_positions,
)
from strucmotif_search_spark.engine import SearchEngine

TOK = re.compile(TOKEN_PATTERN)

DOCS = [
    ("r", "p0", "c0", "py", "new york city new york"),
    ("r", "p1", "c1", "py", "york new nothing here"),
    ("r", "p2", "c2", "py", "the new york marathon"),
    ("r", "p3", "c3", "py", "new new york york"),
    ("r", "p4", "c4", "py", "completely unrelated words"),
    ("r", "p5", "c5", "py", "def def def x"),
]


def _phrase_count(text: str, phrase: list[str]) -> int:
    toks = TOK.findall(text)
    return sum(
        1
        for i in range(len(toks) - len(phrase) + 1)
        if toks[i : i + len(phrase)] == phrase
    )


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    store = IndexStore(tmp_path_factory.mktemp("pos"))
    docs = spark.createDataFrame(
        DOCS, "repo string, path string, commit string, lang string, content string"
    )
    build_index(
        spark, docs, store, docs_per_shard=4, shards_per_chunk=1 << 20,
        checkpoint_partials=False, with_positions=True,
    )
    return SearchEngine(spark, store)


def _text_of(engine):
    dm = {
        (r["repo"], r["path"], r["commit"]): r["doc_id"]
        for r in engine.doc_map.collect()
    }
    return {dm[(r, p, c)]: t for (r, p, c, _l, t) in DOCS}


@pytest.mark.parametrize(
    "phrase",
    ["new york", "new york city", "def def", "york new", "absent phrase"],
)
def test_phrase_matches_bruteforce(engine, phrase):
    texts = _text_of(engine)
    seq = TOK.findall(phrase)
    expected = sorted(
        (
            (d, _phrase_count(t, seq))
            for d, t in texts.items()
            if _phrase_count(t, seq) > 0
        ),
        key=lambda x: (-x[1], x[0]),
    )
    got = [
        (r["doc_id"], r["phrase_tf"])
        for r in engine.phrase_search(phrase, k=100).collect()
    ]
    assert got == expected


def test_positions_roundtrip(engine):
    """Decoded positions must equal the token ordinals of each document."""
    texts = _text_of(engine)
    terms = {r["term_id"]: r["term"] for r in engine.terms.collect()}
    rows = engine.postings.collect()
    seen = 0
    for row in rows:
        from strucmotif_search_spark.codec import unpack_block

        ids, tfs = unpack_block(bytes(row["doc_gaps"]), bytes(row["tfs"]))
        plists = unpack_positions(bytes(row["pos_data"]), tfs)
        term = terms[row["term_id"]]
        for d, tf, plist in zip(ids, tfs, plists):
            toks = TOK.findall(texts[int(d)])
            expected = [i for i, t in enumerate(toks) if t == term]
            assert list(plist) == expected
            assert len(plist) == tf
            seen += 1
    assert seen > 10


def test_phrase_requires_positional_index(spark, tmp_path_factory):
    store = IndexStore(tmp_path_factory.mktemp("nopos"))
    docs = spark.createDataFrame(
        DOCS, "repo string, path string, commit string, lang string, content string"
    )
    build_index(spark, docs, store, docs_per_shard=4, shards_per_chunk=1 << 20,
                checkpoint_partials=False)
    eng = SearchEngine(spark, store)
    with pytest.raises(ValueError, match="positional"):
        eng.phrase_search("new york")


def test_bm25_unaffected_by_positions(engine):
    hits = engine.search("new york", k=10, mode="and", with_meta=False).collect()
    assert len(hits) >= 3  # docs 0, 1(!has both), 2, 3 contain both terms
