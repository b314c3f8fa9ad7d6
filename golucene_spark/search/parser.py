"""Minimal classic query parser (the live subset of
queryparser/classic/queryParser.go:87-222 + queryBuilder.go:23-130).

Grammar (live reference paths only — phrase/wildcard/fuzzy/range panic
in the reference and are out of scope):

    query   := clause (( 'AND' | 'OR' )? 'NOT'? clause)*
    clause  := [field ':'] text

Semantics follow QueryParserBase with default operator OR
(queryParserBase.go:62-101): bare terms become SHOULD clauses; a term
after AND (and the term before it) is MUST; NOT x is MUST_NOT.  `text`
is run through the same analyzer as the index; multi-token text expands
to a SHOULD-of-TermQuery boolean (queryBuilder.go:23-130).
"""

from __future__ import annotations

import re

from ..analysis import get_analyzer
from .ast import BooleanClause, BooleanQuery, Occur, TermQuery, WildcardQuery

_TOKEN_RE = re.compile(r"\s*(AND|OR|NOT|\(|\)|[^\s()]+)")


def _analyze_text(field: str, text: str, analyzer, tokenized_fields) -> object | None:
    if "*" in text or "?" in text:
        return WildcardQuery(field, text.lower())
    if field not in tokenized_fields:
        return TermQuery(field, text)
    terms, _, _ = analyzer.analyze_batch([text])
    terms = terms.tolist()
    if not terms:
        return None
    if len(terms) == 1:
        return TermQuery(field, terms[0])
    return BooleanQuery(
        tuple(BooleanClause(TermQuery(field, t), Occur.SHOULD) for t in terms)
    )


def parse_query(
    q: str,
    default_field: str = "content",
    analyzer: str | object = "standard",
    tokenized_fields: tuple = ("content", "text"),
    default_operator: str = "OR",
):
    if isinstance(analyzer, str):
        analyzer = get_analyzer(analyzer)
    toks = _TOKEN_RE.findall(q)
    clauses: list[BooleanClause] = []
    pending_occur: Occur | None = None
    saw_and = False
    i = 0
    while i < len(toks):
        t = toks[i]
        if t == "AND":
            saw_and = True
            # retroactively promote previous clause to MUST (classic
            # parser conj handling, queryParserBase.go:62-101)
            if clauses and clauses[-1].occur is Occur.SHOULD:
                clauses[-1] = BooleanClause(clauses[-1].query, Occur.MUST)
            pending_occur = Occur.MUST
        elif t == "OR":
            pending_occur = Occur.SHOULD
        elif t == "NOT":
            pending_occur = Occur.MUST_NOT
        elif t in ("(", ")"):
            pass  # flat queries only in v1 (reference live paths are flat)
        else:
            boost = 1.0
            if "^" in t:
                t, _, b = t.rpartition("^")
                try:
                    boost = float(b)
                except ValueError:
                    t = t + "^" + b
                    boost = 1.0
            if ":" in t:
                fld, _, text = t.partition(":")
            else:
                fld, text = default_field, t
            sub = _analyze_text(fld, text, analyzer, tokenized_fields)
            if sub is not None and boost != 1.0:
                from .ast import _boosted

                sub = _boosted(sub, boost)
            if sub is not None:
                occur = pending_occur
                if occur is None:
                    occur = Occur.MUST if default_operator == "AND" else Occur.SHOULD
                clauses.append(BooleanClause(sub, occur))
            pending_occur = None
        i += 1
    if not clauses:
        return BooleanQuery(())
    return BooleanQuery(tuple(clauses)).rewrite()
