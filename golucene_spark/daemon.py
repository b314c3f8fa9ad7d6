"""Preloading PySpark worker daemon (spark.python.daemon.module).

Imports the heavy dependency set (numpy/pandas/pyarrow + the analyzer
tables) BEFORE the daemon starts forking workers, so all workers share
those pages copy-on-write instead of paying ~250MB of private RSS and
multi-second imports each.  On this sandbox VM — which host-backs only
~14GB of RAM at full speed — 32 privately-imported workers alone blow
past the fast-memory budget; with preloading the fork children share
one copy.

gc.freeze() pins the preloaded heap into the permanent generation so
the children's cyclic GC never writes to (and thus never COW-copies)
the shared pages.
"""

import gc

import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401

try:
    from golucene_spark.analysis import wordbreak

    wordbreak.class_table()
    wordbreak._rule_tables()
except Exception:  # pragma: no cover - daemon must start regardless
    pass

gc.collect()
gc.freeze()

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
