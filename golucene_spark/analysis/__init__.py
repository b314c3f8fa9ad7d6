from .analyzers import (
    ENGLISH_STOP_WORDS,
    StandardAnalyzer,
    SimpleAnalyzer,
    get_analyzer,
)

__all__ = [
    "ENGLISH_STOP_WORDS",
    "StandardAnalyzer",
    "SimpleAnalyzer",
    "get_analyzer",
]
