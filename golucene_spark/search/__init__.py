from .ast import (
    TermQuery,
    ConstantScoreQuery,
    BooleanQuery,
    BooleanClause,
    Occur,
    MatchAllQuery,
    PhraseQuery,
    MultiPhraseQuery,
    FuzzyQuery,
    WildcardQuery,
    RegexpQuery,
    TermRangeQuery,
    DisjunctionMaxQuery,
)
from .parser import parse_query, parse_multi_field
from .similarity import BM25Similarity, ClassicSimilarity
from .executor import Searcher
from .highlight import highlight
from .facets import facet_counts, range_facet_counts
from .mlt import more_like_this, interesting_terms
from .multiterm import suggest_terms, common_terms_query
from .grouping import group_search
from .join import join_search
from .cache import CachingSearcher
from .rescore import rescore
from .phrase import (span_near_search, span_first_search, span_not_search,
                     span_or_search, payload_term_search, span_near_explain,
                     span_first_explain, span_not_explain, span_or_explain)

__all__ = [
    "TermQuery",
    "ConstantScoreQuery",
    "BooleanQuery",
    "BooleanClause",
    "Occur",
    "MatchAllQuery",
    "PhraseQuery",
    "MultiPhraseQuery",
    "FuzzyQuery",
    "WildcardQuery",
    "RegexpQuery",
    "TermRangeQuery",
    "DisjunctionMaxQuery",
    "parse_query",
    "parse_multi_field",
    "BM25Similarity",
    "ClassicSimilarity",
    "Searcher",
    "span_near_search",
    "span_near_explain",
    "span_first_explain",
    "span_not_explain",
    "span_or_explain",
    "span_first_search",
    "span_not_search",
    "span_or_search",
    "payload_term_search",
    "highlight",
    "facet_counts",
    "range_facet_counts",
    "common_terms_query",
    "more_like_this",
    "interesting_terms",
    "suggest_terms",
    "group_search",
    "join_search",
    "CachingSearcher",
    "rescore",
]
