"""Custom PySpark worker daemon: warm, COW-shared imports for every worker.

The stock daemon (``pyspark.daemon``) forks a bare interpreter per task
slot; each forked worker then imports numpy/pandas/pyarrow on its first
Arrow-UDF task.  With N slots that is N simultaneous cold imports —
hundreds of MB of page-cache/mmap traffic and seconds of CPU, repeated for
every fresh executor JVM.  (In this sandbox — a Firecracker microVM with
free-page reporting — simultaneous cold imports are also a page-fault
storm; see session.py:_ALLOC_ENV.)

This daemon imports the scientific stack ONCE, pre-fork, so every worker
inherits warm modules through fork copy-on-write, then freezes the GC
generations so the collector never writes to the shared pages (refcount /
gc-header writes would otherwise unshare them — the classic CPython
fork-COW problem).

Selected via ``spark.python.daemon.module`` (see session.py).  The module
must be importable by the worker-side interpreter: session.py prepends this
package's parent directory to PYTHONPATH before the JVM launches.
"""

import gc

# Hot dependencies of every vectorized kernel in this engine, plus the
# worker main module itself (its own import tree is substantial).
import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401
import pyarrow.compute  # noqa: F401

import pyspark.daemon as _daemon
import pyspark.worker  # noqa: F401

# Collect import-time garbage, then freeze: pre-fork objects move to a
# permanent generation the cyclic GC never visits, keeping their pages
# COW-shared across all workers for the daemon's lifetime.
gc.collect()
gc.freeze()

if __name__ == "__main__":
    _daemon.manager()
