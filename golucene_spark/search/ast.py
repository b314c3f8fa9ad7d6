"""Query AST + rewrite (the Query/Rewrite surface of core/search).

TermQuery          <- core/search/terms.go:13-43
BooleanQuery       <- core/search/booleanQuery.go:11-37 (maxClauseCount
                      1024 at :9), clause kinds booleanClause.go
rewrite()          <- the fixpoint loop of search.go:173-181 +
                      BooleanQuery.Rewrite single-clause unwrap
                      (booleanQuery.go:158-181)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

MAX_CLAUSE_COUNT = 1024  # booleanQuery.go:9


class Occur(Enum):
    SHOULD = "SHOULD"
    MUST = "MUST"
    MUST_NOT = "MUST_NOT"


@dataclass(frozen=True)
class TermQuery:
    field: str
    term: str
    boost: float = 1.0

    def rewrite(self):
        return self


@dataclass(frozen=True)
class WildcardQuery:
    """Deferred multi-term query: expanded against the index's term
    dictionary at search time (search/multiterm.py)."""

    field: str
    pattern: str
    boost: float = 1.0

    def rewrite(self):
        return self


@dataclass(frozen=True)
class MatchAllQuery:
    boost: float = 1.0

    def rewrite(self):
        return self


@dataclass(frozen=True)
class BooleanClause:
    query: "TermQuery | BooleanQuery | MatchAllQuery"
    occur: Occur = Occur.SHOULD

    @property
    def is_prohibited(self):
        return self.occur is Occur.MUST_NOT

    @property
    def is_required(self):
        return self.occur is Occur.MUST


@dataclass(frozen=True)
class BooleanQuery:
    clauses: tuple = field(default_factory=tuple)
    minimum_should_match: int = 0
    boost: float = 1.0

    def __post_init__(self):
        if len(self.clauses) > MAX_CLAUSE_COUNT:
            raise ValueError(f"maxClauseCount is set to {MAX_CLAUSE_COUNT}")

    def rewrite(self):
        """Fixpoint normalization: unwrap single-SHOULD/MUST-clause
        booleans (boost folded), recurse into children."""
        cl = tuple(
            BooleanClause(c.query.rewrite(), c.occur) for c in self.clauses
        )
        if (
            len(cl) == 1
            and not cl[0].is_prohibited
            and self.minimum_should_match <= 1
        ):
            q = cl[0].query
            if self.boost != 1.0:
                q = _boosted(q, self.boost)
            return q
        return BooleanQuery(cl, self.minimum_should_match, self.boost)


def _boosted(q, boost: float):
    if isinstance(q, TermQuery):
        return TermQuery(q.field, q.term, q.boost * boost)
    if isinstance(q, BooleanQuery):
        return BooleanQuery(q.clauses, q.minimum_should_match, q.boost * boost)
    if isinstance(q, MatchAllQuery):
        return MatchAllQuery(q.boost * boost)
    return q
