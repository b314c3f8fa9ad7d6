from .ast import (
    TermQuery,
    BooleanQuery,
    BooleanClause,
    Occur,
    MatchAllQuery,
    PhraseQuery,
    FuzzyQuery,
    WildcardQuery,
    RegexpQuery,
    TermRangeQuery,
)
from .parser import parse_query
from .similarity import BM25Similarity, ClassicSimilarity
from .executor import Searcher
from .highlight import highlight

__all__ = [
    "TermQuery",
    "BooleanQuery",
    "BooleanClause",
    "Occur",
    "MatchAllQuery",
    "PhraseQuery",
    "FuzzyQuery",
    "WildcardQuery",
    "RegexpQuery",
    "TermRangeQuery",
    "parse_query",
    "BM25Similarity",
    "ClassicSimilarity",
    "Searcher",
    "highlight",
]
