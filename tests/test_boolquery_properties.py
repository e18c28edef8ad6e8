"""Property tests for the boolquery front-end (no Spark): parse/render
semantic round-trip, static analysis vs direct evaluation, and the compiled
numpy mask evaluator vs a recursive reference — the pure-python pieces every
boolexpr query (driver gate ii_bm25_boolexpr*, engine bool_search) rests on.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from strucmotif_search_spark.query.boolquery import (
    And,
    Node,
    Not,
    Or,
    Term,
    accepts_all_absent,
    compile_mask_eval,
    expr_terms,
    parse_bool,
    positive_terms,
)

TERMS = ["alpha", "beta", "gamma", "delta", "eps"]


def asts(depth: int = 3):
    base = st.sampled_from(TERMS).map(Term)
    return st.recursive(
        base,
        lambda kids: st.one_of(
            kids.map(Not),
            st.lists(kids, min_size=2, max_size=3).map(
                lambda c: And(tuple(c))
            ),
            st.lists(kids, min_size=2, max_size=3).map(
                lambda c: Or(tuple(c))
            ),
        ),
        max_leaves=8,
    )


def evaluate(node: Node, flags: dict[str, bool]) -> bool:
    """Reference semantics: direct recursive evaluation."""
    if isinstance(node, Term):
        return flags.get(node.term, False)
    if isinstance(node, Not):
        return not evaluate(node.child, flags)
    if isinstance(node, And):
        return all(evaluate(c, flags) for c in node.children)
    return any(evaluate(c, flags) for c in node.children)


def render(node: Node) -> str:
    if isinstance(node, Term):
        return node.term
    if isinstance(node, Not):
        return f"(NOT {render(node.child)})"
    op = " AND " if isinstance(node, And) else " OR "
    return "(" + op.join(render(c) for c in node.children) + ")"


@settings(max_examples=200, deadline=None)
@given(asts(), st.lists(st.booleans(), min_size=5, max_size=5))
def test_parse_render_semantic_roundtrip(ast, bits):
    """render -> parse may regroup And/Or arity, but the parsed tree must
    be semantically identical to the original on every assignment."""
    flags = dict(zip(TERMS, bits))
    reparsed = parse_bool(render(ast))
    assert evaluate(reparsed, flags) == evaluate(ast, flags)
    assert expr_terms(reparsed) == expr_terms(ast)


@settings(max_examples=200, deadline=None)
@given(asts())
def test_static_analysis_matches_evaluation(ast):
    # accepts_all_absent IS evaluation under all-false flags
    assert accepts_all_absent(ast) == evaluate(ast, {})
    # monotonicity underpinning the kernel's candidate bound: if the
    # expression rejects the all-absent doc, then a doc whose only present
    # terms are NON-positive (odd-parity-only) still cannot match
    if not accepts_all_absent(ast):
        pos = positive_terms(ast)
        flags = {t: True for t in expr_terms(ast) if t not in pos}
        assert not evaluate(ast, flags)


@settings(max_examples=200, deadline=None)
@given(
    asts(),
    st.lists(
        st.lists(st.booleans(), min_size=5, max_size=5),
        min_size=1,
        max_size=4,
    ),
)
def test_compiled_mask_eval_matches_reference(ast, doc_rows):
    """The numpy evaluator the DAAT kernel runs must agree with recursive
    evaluation doc-by-doc, including terms missing from the vocabulary."""
    n = len(doc_rows)
    key_of = {t: i for i, t in enumerate(TERMS[:3])}  # 2 terms "absent"
    presence = {
        key_of[t]: np.array([row[i] for row in doc_rows], dtype=bool)
        for i, t in enumerate(TERMS[:3])
        for t in [TERMS[i]]
    }
    got = compile_mask_eval(ast, key_of)(presence, n)
    for d, row in enumerate(doc_rows):
        flags = {t: bool(row[i]) and t in key_of for i, t in enumerate(TERMS)}
        assert bool(got[d]) == evaluate(ast, flags), (d, render(ast))
