"""Classic query parser (queryparser/classic/queryParser.go:87-222 +
queryBuilder.go:23-130), extended to the full grammar where the
reference panics (phrase at queryParser.go:58, fuzzy at :178-190).

Grammar:

    query   := (conj? mod? clause)*
    clause  := [field ':'] ( '(' query ')' suffix*
                           | '"' phrase '"' suffix*
                           | text )
    conj    := 'AND' | '&&' | 'OR' | '||'
    mod     := 'NOT' | '!' | '+' | '-'    (PLUS/MINUS: required/prohibited,
                                           queryParserBase.go:85-86; fused
                                           +term/-term or detached)
    suffix  := '^' number            (boost on groups/phrases)
             | '~' number            (slop on phrases: "a b"~2)
    text    := term[~[edits]][^boost]   (fuzzy + boost inside the token)

Semantics follow QueryParserBase with default operator OR
(queryParserBase.go:62-101): bare terms become SHOULD clauses; a term
after AND (and the term before it) is MUST; NOT x is MUST_NOT.  `text`
is run through the same analyzer as the index; multi-token text expands
to a SHOULD-of-TermQuery boolean (queryBuilder.go:23-130).  Quoted text
becomes a PhraseQuery over the analyzed terms; a trailing `~N` sets the
phrase slop (sloppy matching, search/phrase.py).  `term~`/`term~1`
becomes a FuzzyQuery (max_edits default 2, as Lucene).
"""

from __future__ import annotations

import re

from ..analysis import get_analyzer
from .ast import (
    BooleanClause,
    BooleanQuery,
    FuzzyQuery,
    Occur,
    PhraseQuery,
    TermQuery,
    WildcardQuery,
    _boosted,
)

_TOKEN_RE = re.compile(r'\s*("(?:[^"\\]|\\.)*"|\(|\)|\[|\]|\{|\}|&&|\|\||!|[^\s()"\[\]{}]+)')


def _analyze_terms(text: str, analyzer) -> list[str]:
    terms, _, _ = analyzer.analyze_batch([text])
    return terms.tolist()


def _analyze_text(field: str, text: str, analyzer, tokenized_fields) -> object | None:
    """One bare `text` token (possibly with trailing ~ / ^ operators)."""
    boost = 1.0
    if "^" in text:
        head, _, b = text.rpartition("^")
        try:
            boost = float(b)
            text = head
        except ValueError:
            pass
    fuzzy_edits = None
    m = re.fullmatch(r"(.+?)~(\d*)", text)
    if m:
        text = m.group(1)
        fuzzy_edits = int(m.group(2)) if m.group(2) else 2
    if fuzzy_edits is not None:
        terms = _analyze_terms(text, analyzer) if field in tokenized_fields else [text]
        if not terms:
            return None
        return FuzzyQuery(field, terms[0], min(fuzzy_edits, 2), boost)
    if "*" in text or "?" in text:
        return WildcardQuery(field, text.lower(), boost)
    if field not in tokenized_fields:
        return _boosted(TermQuery(field, text), boost)
    terms = _analyze_terms(text, analyzer)
    if not terms:
        return None
    if len(terms) == 1:
        return TermQuery(field, terms[0], boost)
    return _boosted(
        BooleanQuery(
            tuple(BooleanClause(TermQuery(field, t), Occur.SHOULD) for t in terms)
        ),
        boost,
    )


def parse_multi_field(
    q: str,
    fields,
    analyzer: str | object = "standard",
    tokenized_fields: tuple = ("content", "text"),
    tie_breaker: float = 0.0,
    default_operator: str = "OR",
    boosts: dict | None = None,
):
    """MultiFieldQueryParser analogue (Lucene queryparser; not ported by
    the reference): parse ``q`` once per field with the normal grammar,
    then combine the per-field variants of each top-level clause into a
    DisjunctionMaxQuery — a doc is ranked by its best field (plus
    ``tie_breaker`` times the others), not the inflated OR-sum.
    ``boosts`` maps field -> per-field boost (e.g. title^3)."""
    from .ast import DisjunctionMaxQuery

    boosts = boosts or {}

    def _fb(query, f):
        b = boosts.get(f, 1.0)
        return _boosted(query, b) if b != 1.0 else query

    # ADVICE r2: do NOT force every queried field into tokenized_fields —
    # untokenized/keyword fields must keep the raw-term parse path or
    # their analyzed terms will never match the index's StringField terms.
    variants = [
        parse_query(q, f, analyzer, tuple(tokenized_fields), default_operator)
        for f in fields
    ]
    first = variants[0]
    if not isinstance(first, BooleanQuery) or not all(
        isinstance(v, BooleanQuery) and len(v.clauses) == len(first.clauses)
        for v in variants
    ):
        # single-clause parses collapse to a bare query: one dismax
        return DisjunctionMaxQuery(
            tuple(_fb(v, f) for f, v in zip(fields, variants)), tie_breaker
        ).rewrite()
    clauses = []
    for i, c in enumerate(first.clauses):
        subs = tuple(_fb(v.clauses[i].query, f) for f, v in zip(fields, variants))
        clauses.append(
            BooleanClause(DisjunctionMaxQuery(subs, tie_breaker), c.occur)
        )
    return BooleanQuery(tuple(clauses), first.minimum_should_match).rewrite()


def parse_query(
    q: str,
    default_field: str = "content",
    analyzer: str | object = "standard",
    tokenized_fields: tuple = ("content", "text"),
    default_operator: str = "OR",
    field_analyzers: dict | None = None,
):
    # field_analyzers maps field -> analyzer (name or object) for
    # per-field overrides at query time — the PerFieldAnalyzerWrapper
    # role, matching FieldSpec(analyzer=...) on the index side
    if isinstance(analyzer, str):
        analyzer = get_analyzer(analyzer)
    _amap = {
        f: (get_analyzer(a) if isinstance(a, str) else a)
        for f, a in (field_analyzers or {}).items()
    }

    def ana(field):
        return _amap.get(field, analyzer)
    toks = _TOKEN_RE.findall(q)
    pos = [0]

    def peek():
        return toks[pos[0]] if pos[0] < len(toks) else None

    def advance():
        t = toks[pos[0]]
        pos[0] += 1
        return t

    def suffixes(sub):
        """Consume ^boost tokens after a group/phrase."""
        while True:
            t = peek()
            if t and t.startswith("^") and len(t) > 1:
                try:
                    b = float(t[1:])
                except ValueError:
                    break
                advance()
                sub = _boosted(sub, b)
            elif (
                t
                and (m := re.fullmatch(r"~(\d*)(?:\^([\d.]+))?", t))
                and isinstance(sub, PhraseQuery)
            ):
                # phrase slop "a b"~N (queryParser.go:165-176's slop
                # production; the reference panics before reaching it);
                # a fused trailing boost ("a b"~2^3) rides the same token
                advance()
                sub = PhraseQuery(
                    sub.field,
                    sub.terms,
                    sub.boost * (float(m.group(2)) if m.group(2) else 1.0),
                    int(m.group(1)) if m.group(1) else 0,
                )
            else:
                break
        return sub

    def parse_phrase(tok: str, field: str):
        text = tok[1:-1].replace('\\"', '"').replace("\\\\", "\\")
        if field in tokenized_fields:
            terms = _analyze_terms(text, ana(field))
        else:
            terms = [text] if text else []
        if not terms:
            return None
        return PhraseQuery(field, tuple(terms))

    def parse_atom(t: str, field_ctx: str | None):
        from .ast import MatchAllQuery, RegexpQuery, TermRangeQuery

        field = field_ctx or default_field
        if t == "(":
            sub = BooleanQuery(tuple(parse_clauses(field_ctx)))
            if peek() == ")":
                advance()
            return suffixes(sub)
        if t in ("[", "{"):
            include_lower = t == "["
            include_upper = True
            parts = []
            while True:
                nt = peek()
                if nt is None:
                    break
                advance()
                if nt in ("]", "}"):
                    include_upper = nt == "]"
                    break
                parts.append(nt)
            parts = [p for p in parts if p.upper() != "TO"]
            lo = parts[0] if parts else "*"
            hi = parts[1] if len(parts) > 1 else "*"
            lo = None if lo == "*" else lo.lower()
            hi = None if hi == "*" else hi.lower()
            return suffixes(TermRangeQuery(field, lo, hi, include_lower, include_upper))
        if t.startswith('"') and t.endswith('"') and len(t) >= 2:
            return suffixes(parse_phrase(t, field))
        if t == "*:*":
            return MatchAllQuery()
        if t.endswith(":") and len(t) > 1:
            nxt = peek()
            if nxt in ("(", "[", "{") or (nxt or "").startswith('"') or (
                (nxt or "").startswith("/") and (nxt or "").endswith("/") and len(nxt or "") >= 2
            ):
                return parse_atom(advance(), t[:-1])
            return None  # dangling "field:" with no value
        if t.startswith("/") and t.endswith("/") and len(t) > 2:
            return suffixes(RegexpQuery(field, t[1:-1]))
        if ":" in t:
            fld, _, text = t.partition(":")
            if text.startswith("/") and text.endswith("/") and len(text) > 2:
                return suffixes(RegexpQuery(fld, text[1:-1]))
            return _analyze_text(fld, text, ana(fld), tokenized_fields)
        return _analyze_text(field, t, ana(field), tokenized_fields)

    def parse_clauses(field_ctx: str | None) -> list[BooleanClause]:
        clauses: list[BooleanClause] = []
        pending: Occur | None = None
        while True:
            t = peek()
            if t is None or t == ")":
                break
            advance()
            if t in ("AND", "&&"):
                # retroactively promote previous clause to MUST (classic
                # parser conj handling, queryParserBase.go:62-101)
                if clauses and clauses[-1].occur is Occur.SHOULD:
                    clauses[-1] = BooleanClause(clauses[-1].query, Occur.MUST)
                pending = Occur.MUST
                continue
            if t in ("OR", "||"):
                pending = Occur.SHOULD
                continue
            if t in ("NOT", "!"):
                pending = Occur.MUST_NOT
                continue
            # +/- modifiers (queryParser.go:65-71 PLUS/MINUS ->
            # queryParserBase.go:85-86 required/prohibited); fused form
            # (+term, -term) and detached form (- before a group) both
            if t in ("+", "-"):
                pending = Occur.MUST if t == "+" else Occur.MUST_NOT
                continue
            if len(t) > 1 and t[0] in "+-":
                pending = Occur.MUST if t[0] == "+" else Occur.MUST_NOT
                t = t[1:]
            sub = parse_atom(t, field_ctx)
            if sub is not None:
                occur = pending
                if occur is None:
                    occur = Occur.MUST if default_operator == "AND" else Occur.SHOULD
                clauses.append(BooleanClause(sub, occur))
            pending = None
        return clauses

    clauses = parse_clauses(None)
    if not clauses:
        return BooleanQuery(())
    return BooleanQuery(tuple(clauses)).rewrite()
