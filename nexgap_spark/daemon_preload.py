"""Custom PySpark worker daemon that pre-imports the heavy numeric stack.

Python workers fork from the daemon process (``spark.python.use.daemon``).
The stock daemon imports only pyspark, so every freshly forked worker pays
the numpy + pandas + pyarrow import cost (~1 s CPU each) on its first Arrow
batch — a 32-worker stage therefore starts with a 32-way import storm, which
dominates small-to-medium pandas-UDF stages whenever the idle-worker pool was
drained. Importing the libraries *before* the fork makes them copy-on-write
shared: workers start warm, and resident memory per worker drops since the
interpreter heap pages for the imports are shared with the daemon.

Wired in ``session.get_spark`` via ``spark.python.daemon.module``; harmless
to import even if the libs are missing (falls back silently).
"""

from __future__ import annotations

try:  # pragma: no cover - trivial import guards
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401
except Exception:  # pragma: no cover
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
