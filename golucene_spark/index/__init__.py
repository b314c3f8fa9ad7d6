from .merge import merge_segments, select_merges, verify_index
from .multi import MultiIndex
from .trigram import build_trigram_index, load_trigram_index
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
    "build_trigram_index",
    "load_trigram_index",
]
