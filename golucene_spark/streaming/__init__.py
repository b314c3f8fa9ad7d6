from .nrt import start_incremental_index, incremental_index_batch
from .events import sessionize_stream, windowed_counts_stream
from .dedup import dedup_exact_stream, lsh_candidates_stream

__all__ = [
    "start_incremental_index",
    "incremental_index_batch",
    "sessionize_stream",
    "windowed_counts_stream",
    "dedup_exact_stream",
    "lsh_candidates_stream",
]
