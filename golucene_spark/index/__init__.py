from .merge import merge_segments, select_merges, verify_index
from .multi import MultiIndex
from .builder import (
    IndexBuilder,
    LogicalIndex,
    MaterializedIndex,
    FieldSpec,
    CorpusSpec,
    tokenize_tf,
    blocked_postings,
    assign_doc_ids,
)

__all__ = [
    "IndexBuilder",
    "LogicalIndex",
    "MaterializedIndex",
    "FieldSpec",
    "CorpusSpec",
    "tokenize_tf",
    "blocked_postings",
    "assign_doc_ids",
    "merge_segments",
    "select_merges",
    "verify_index",
    "MultiIndex",
]
