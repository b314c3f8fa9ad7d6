from .nrt import start_incremental_index, incremental_index_batch

__all__ = ["start_incremental_index", "incremental_index_batch"]
