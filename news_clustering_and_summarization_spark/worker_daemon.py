"""Python worker daemon with the heavy numeric stack preloaded.

``pyspark.daemon`` forks one process per worker; each fork then
imports numpy/pandas/pyarrow on first UDF use — several hundred
module files (marshal.loads + shared-library init) per worker, paid
again every time the pool grows or a worker is replaced. Profiling
the bench showed exactly this (guide §4.5: initialise heavyweight
state once per task — here, once per *daemon*): on a cold page cache
the import set costs seconds per worker, and a 32-worker burst lands
it on the first Python stage of whichever query runs first.

Importing the stack HERE, before ``pyspark.daemon.manager()`` starts
forking, moves that cost to daemon startup (once per executor):
children inherit the already-initialised modules through fork
copy-on-write, so a new worker costs a fork, not an import storm —
and the 32 workers share one copy of the module pages instead of
holding 32.

``pyspark.daemon`` already preloads ``pyspark.worker`` the same way
(module-level import); this module only extends the set. Selected via
``spark.python.daemon.module`` (session.get_spark), which makes the
JVM run ``python -m news_clustering_and_summarization_spark.
worker_daemon [worker-module]``; the argv-based worker-module
dispatch lives in ``pyspark.daemon``'s module body and sees the same
``sys.argv``, so behavior is otherwise identical to the stock daemon.

Fork-safety (r11 advice): preloading numpy before the daemon forks
means any BLAS/OpenMP thread pool initialised pre-fork is inherited
by children, which on some OpenBLAS/pyarrow builds can hang a forked
worker. The env caps below pin the BLAS pools to one thread BEFORE
numpy loads (set only if the user has not chosen a value) — correct
for Spark's one-task-per-worker model anyway, where 32 concurrent
workers each spawning a thread pool would oversubscribe the box.
**Rollback for any fork-related worker hang**: set
``SPARK_GRAFT_PY_DAEMON=pyspark.daemon`` (session.get_spark passes it
through) to restore the stock daemon with zero preloading.
"""

import os

for _var in (
    "OPENBLAS_NUM_THREADS",
    "OMP_NUM_THREADS",
    "MKL_NUM_THREADS",
):
    os.environ.setdefault(_var, "1")

import numpy  # noqa: F401,E402
import pandas  # noqa: F401,E402
import pyarrow  # noqa: F401,E402

# pyarrow.compute builds its ~1000 wrapped kernel functions at import
# time (visible as _make_global_functions in worker profiles); pandas
# pulls it in lazily otherwise. Pay it once, pre-fork.
import pyarrow.compute  # noqa: F401,E402

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
