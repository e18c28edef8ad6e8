"""Oracle self-consistency tests (the oracle is the correctness authority for
the engine, so it gets its own hand-checked goldens — the analogue of
ResidueGraphTest.java's exact pair counts)."""

import math

from strucmotif_search_spark.oracle import bm25_topk, build_oracle, idf, tokenize


def test_tokenize_frozen_rule():
    assert tokenize("def foo(x): return x+1  # _bar Baz9") == [
        "def",
        "foo",
        "x",
        "return",
        "x",
        "_bar",
        "Baz9",
    ]
    assert tokenize("123 456") == []
    assert tokenize("") == []


def _tiny():
    return build_oracle(
        [10, 20, 30],
        [
            "import foo foo bar",
            "import baz",
            "qux qux qux qux qux qux",
        ],
    )


def test_stats_exact():
    ix = _tiny()
    assert ix.n_docs == 3
    assert ix.avgdl == (4 + 2 + 6) / 3
    assert ix.df == {"import": 2, "foo": 1, "bar": 1, "baz": 1, "qux": 1}
    assert ix.cf == {"import": 2, "foo": 2, "bar": 1, "baz": 1, "qux": 6}


def test_bm25_hand_computed():
    ix = _tiny()
    hits = bm25_topk(ix, "foo", k=10)
    assert [d for d, _ in hits] == [10]
    w = idf(3, 1)
    tf, dl, avgdl = 2.0, 4.0, 4.0
    expected = w * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    assert math.isclose(hits[0][1], expected, rel_tol=0, abs_tol=0)


def test_and_mode():
    ix = _tiny()
    assert [d for d, _ in bm25_topk(ix, "import foo", k=10, mode="and")] == [10]
    assert bm25_topk(ix, "import missing_term", k=10, mode="and") == []
    ors = bm25_topk(ix, "import foo", k=10, mode="or")
    assert [d for d, _ in ors] == [10, 20]  # 10 matches both terms


def test_tie_break_by_doc_id():
    ix = build_oracle([5, 2], ["same same", "same same"])
    hits = bm25_topk(ix, "same", k=2)
    assert [d for d, _ in hits] == [2, 5]
    assert hits[0][1] == hits[1][1]
