"""Property-based tests (hypothesis) for pure-Python kernels: the
polynomial sloppy-phrase matcher (window telescoping / anchored DP)
and the query parser's totality (any input string parses to an AST or
a clause-limit error — never crashes)."""

from itertools import product as iproduct

import numpy as np
from hypothesis import given, settings, strategies as st

from golucene_spark.search.phrase import _batch_sloppy_freqs
from golucene_spark.search.parser import parse_query


@st.composite
def _positions(draw, n_terms):
    """Per-term sorted unique position lists (small universes so
    collisions/ties are common)."""
    return [
        sorted(draw(st.sets(st.integers(0, 12), min_size=1, max_size=5)))
        for _ in range(n_terms)
    ]


@settings(max_examples=200, deadline=None)
@given(st.data())
def test_sloppy_matcher_equals_brute_force(data):
    n_terms = data.draw(st.integers(2, 5))
    slop = data.draw(st.integers(0, 4))
    in_order = data.draw(st.booleans())
    pos = data.draw(_positions(n_terms))
    # adjusted positions (term i offset by -i), as the scorer uses them
    adj = [[p - i for p in ps] for i, ps in enumerate(pos)]

    # brute force: every alignment tuple, weight 1/(1+spread); ordered
    # additionally requires non-decreasing adjusted positions
    want = 0.0
    for tup in iproduct(*adj):
        spread = max(tup) - min(tup)
        if spread > slop:
            continue
        if in_order and any(tup[i + 1] < tup[i] for i in range(n_terms - 1)):
            continue
        want += 1.0 / (1.0 + spread)

    flats = [
        (np.zeros(len(a), dtype=np.int64), np.array(sorted(a), dtype=np.int64))
        for a in adj
    ]
    got = _batch_sloppy_freqs(flats, 1, slop, in_order)[0]
    assert np.isclose(got, want, rtol=1e-12, atol=1e-12), (pos, slop, in_order)


_QUERY_TOKENS = st.sampled_from(
    ["foo", "bar", '"foo bar"', '"foo bar"~2', "foo~1", "ba*", "(", ")",
     "AND", "OR", "NOT", "&&", "||", "!", "lang:go", "content:[a TO b]",
     "*:*", "/fo+/", "^2", "foo^1.5", ":", "~", "[", "]", '"', "TO"]
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_QUERY_TOKENS, min_size=0, max_size=12))
def test_parser_total_on_token_soup(tokens):
    q = " ".join(tokens)
    try:
        ast = parse_query(q, default_field="content", analyzer="simple")
    except ValueError as e:
        assert "maxClauseCount" in str(e)
        return
    assert ast is not None  # always an AST, possibly an empty boolean


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=40))
def test_parser_total_on_arbitrary_text(s):
    try:
        parse_query(s, default_field="content", analyzer="simple")
    except ValueError as e:
        assert "maxClauseCount" in str(e)
