"""Cold-start golden fixture (round-4 verdict item 6): open the COMMITTED
index generation in tests/golden/ and match pinned answers WITHOUT
rebuilding — the analogue of the reference's checked-in index.data +
known.list integration fixtures (StructureIntegrationTest.java:151-204).

If this fails after an intentional format change, regenerate with
``python tools/make_golden_index.py`` and commit the new bytes loudly.
"""

import json
import os

import pytest

from strucmotif_search_spark.engine import SearchEngine

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def golden(spark):
    from strucmotif_search_spark.build import IndexStore

    if not os.path.isdir(os.path.join(GOLDEN, "index")):
        pytest.skip("golden fixture not generated yet")
    with open(os.path.join(GOLDEN, "expected.json")) as f:
        expected = json.load(f)
    eng = SearchEngine(spark, IndexStore(os.path.join(GOLDEN, "index")))
    return eng, expected


def test_golden_generation_pointer(golden):
    eng, expected = golden
    assert eng.gen == expected["generation"]


def test_golden_stats(golden):
    eng, expected = golden
    got = {
        k: (float(v) if k == "avgdl" else int(v))
        for k, v in eng.stats.first().asDict().items()
    }
    assert got == expected["stats"]


def test_golden_query_pins(golden):
    """Every pinned query answers bit-identically from the committed bytes
    (scores pinned to 9 decimals — float64 BM25 is deterministic here)."""
    eng, expected = golden
    for key, want in expected["queries"].items():
        q, mode, k = key.rsplit("|", 2)
        hits = eng.search(q, k=int(k), mode=mode, with_meta=True)
        got = [
            [r["repo"], r["path"], r["commit"], round(r["score"], 9)]
            for r in hits.collect()
        ]
        assert got == [list(w) for w in want], key


def test_golden_phrase_pin(golden):
    """The committed position payloads decode to the pinned phrase counts
    (guards the positional codec specifically)."""
    eng, expected = golden
    ph = eng.phrase_search("import numpy", k=100).join(
        eng.doc_map.select("doc_id", "path"), on="doc_id"
    )
    got = sorted([r["path"], int(r["phrase_tf"])] for r in ph.collect())
    assert got == [list(w) for w in expected["phrase"]]
