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
]
