"""Fielded BM25 (query/fielded.py + SearchEngine.fielded_search) — weighted
content+field scoring checked bitwise against the in-memory oracle
(oracle.bm25f_topk), including field-only matches, AND-across-fields
containment, weights, and a second field column."""

import pytest

from strucmotif_search_spark.build import IndexStore, build_index
from strucmotif_search_spark.engine import SearchEngine
from strucmotif_search_spark.oracle import bm25f_topk, build_oracle

# paths are token-rich on purpose: 'planner', 'scan', 'table' appear in paths
# of docs whose CONTENT does not always contain them, so field-only matches
# and cross-field AND both occur; 'vector' exists ONLY in a path.
DOCS = [
    ("r0", "src/planner/query_plan.py", "c0", "py",
     "table scan over the query plan"),
    ("r0", "src/exec/table_scan.py", "c1", "py",
     "iterator yields rows batch by batch"),
    ("r0", "src/exec/hash_join.py", "c2", "py",
     "join build side probe side table"),
    ("r1", "lib/planner/cost.go", "c3", "go",
     "cost model estimates scan width"),
    ("r1", "lib/vector/dot.go", "c4", "go",
     "fused multiply add loop unrolled"),
    ("r1", "lib/scan/parquet_reader.go", "c5", "go",
     "reads parquet row groups into arrow"),
    ("r2", "app/table/render.js", "c6", "js",
     "renders the table grid with scan lines"),
    ("r2", "app/util/strings.js", "c7", "js",
     "lowercase trim split join helpers"),
]


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    store = IndexStore(tmp_path_factory.mktemp("fielded"))
    docs = spark.createDataFrame(
        DOCS,
        "repo string, path string, commit string, lang string, content string",
    )
    build_index(
        spark, docs, store, docs_per_shard=3, shards_per_chunk=1 << 20,
        checkpoint_partials=False,
    )
    return SearchEngine(spark, store)


def _oracles(engine, field_idx):
    """(content OracleIndex, field OracleIndex) keyed by INTERNAL doc_id."""
    dm = {
        (r["repo"], r["path"], r["commit"]): r["doc_id"]
        for r in engine.doc_map.collect()
    }
    ids, texts, fields = [], [], []
    for row in DOCS:
        ids.append(dm[(row[0], row[1], row[2])])
        texts.append(row[4])
        fields.append(row[field_idx])
    order = sorted(range(len(ids)), key=lambda i: ids[i])
    ids = [ids[i] for i in order]
    return (
        build_oracle(ids, [texts[i] for i in order]),
        build_oracle(ids, [fields[i] for i in order]),
    )


def _run(engine, query, **kw):
    rows = engine.fielded_search(query, with_meta=False, **kw).collect()
    return [(r["doc_id"], r["score"]) for r in rows]


def test_or_matches_oracle_bitwise(engine):
    content, fld = _oracles(engine, 1)
    got = _run(engine, "table scan", k=10)
    want = bm25f_topk(content, fld, "table scan", k=10)
    assert got == want  # float64-exact, including order


def test_field_only_match_is_found(engine):
    content, fld = _oracles(engine, 1)
    # 'vector' appears only in lib/vector/dot.go's PATH — content BM25 alone
    # can never find it; the fielded query must
    got = _run(engine, "vector", k=10)
    want = bm25f_topk(content, fld, "vector", k=10)
    assert got == want
    assert len(got) == 1
    meta = engine.fielded_search("vector", k=10).collect()
    assert meta[0]["path"] == "lib/vector/dot.go"


def test_and_requires_every_term_in_some_field(engine):
    content, fld = _oracles(engine, 1)
    # 'planner' is path-only for c0/c3; 'scan' is content for c0, path for c5
    got = _run(engine, "planner scan", mode="and", k=10)
    want = bm25f_topk(content, fld, "planner scan", mode="and", k=10)
    assert got == want
    assert len(got) >= 1
    # a term present nowhere empties the conjunction
    assert _run(engine, "planner zz_nowhere", mode="and", k=10) == []


def test_weights_change_ranking(engine):
    content, fld = _oracles(engine, 1)
    for w_c, w_f in [(1.0, 1.0), (1.0, 4.0), (2.5, 0.0)]:
        got = _run(engine, "table scan planner", k=10,
                   w_content=w_c, w_field=w_f)
        want = bm25f_topk(content, fld, "table scan planner", k=10,
                          w_content=w_c, w_field=w_f)
        assert got == want, (w_c, w_f)


def test_second_field_column(engine):
    content, fld = _oracles(engine, 3)  # lang column
    got = _run(engine, "table go", field="lang", k=10)
    want = bm25f_topk(content, fld, "table go", k=10)
    assert got == want
    # lang tokens score every doc of that language
    assert len(_run(engine, "go", field="lang", k=10)) == 3


def test_absent_everywhere_and_empty_query(engine):
    assert _run(engine, "zz_nowhere", k=5) == []
    assert _run(engine, "...", k=5) == []  # tokenizes to nothing


def test_field_postings_cached_once(engine):
    engine.fielded_search("table", k=3, with_meta=False).collect()
    fp1 = engine._field_cache["path"][0]
    engine.fielded_search("scan", k=3, with_meta=False).collect()
    assert engine._field_cache["path"][0] is fp1


def test_k_cut_and_tie_order(engine):
    content, fld = _oracles(engine, 1)
    got = _run(engine, "table scan planner join", k=3)
    want = bm25f_topk(content, fld, "table scan planner join", k=3)
    assert got == want
    assert len(got) == 3
    scores = [s for _, s in got]
    assert scores == sorted(scores, reverse=True)
