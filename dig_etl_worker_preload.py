"""Python-worker daemon wrapper: pre-import heavy libraries, then run
pyspark's stock daemon.

Every Arrow/pandas task's FIRST execution on a fresh worker pays the
pandas + pyarrow import chain (~0.25-0.4 s of pure CPU per worker on
this host, worse under the contention of many workers forking at once —
measured 13-50 fresh forks on bursty runs at local[32], 8.8-10 s of
aggregate import CPU per 32-worker burst). pyspark's daemon forks
workers from its own process, so anything imported HERE is inherited by
every forked worker through copy-on-write: the import runs once per
executor instead of once per worker.

Used via ``spark.python.daemon.module=dig_etl_worker_preload`` (set by
``session.get_spark`` for local masters; escape hatch
``SPARK_GRAFT_WORKER_PRELOAD=off``). This is deliberately a TOP-LEVEL
module, not a submodule of ``dig_etl_engine_spark``: ``python -m pkg.mod``
executes ``pkg/__init__.py`` first, which imports the engine's session
and catalog modules (and the whole pyspark.sql chain) into the daemon —
driver-side code that was never written to run there, and whose any
future import-time stdout write would corrupt the daemon's binary port
handshake on the JVM side. A top-level module imports exactly what is
listed below.

The BLAS thread caps below MUST be set before the first numpy import
(pandas pulls numpy, numpy loads OpenBLAS/MKL, and the library sizes its
thread pool at load time from these variables). Two reasons, in order:

* fork safety — an uncapped OpenBLAS spawns a pool of ~1 thread/core in
  the daemon (measured: 33 native threads post-import on this host), and
  this process then fork()s every worker; per POSIX, forking a
  multithreaded process can leave internal locks held in the child. The
  stock daemon stays single-threaded precisely to rule that class out,
  and with the cap so does this one.
* oversubscription — workers inherit the cap, giving one BLAS thread per
  worker. Spark already runs one worker per task slot, so per-worker BLAS
  pools of N threads on an N-core host multiply to N² runnable threads
  under the engine's batch matmul kernels. ``setdefault`` is used, so a
  deployment that wants a different cap sets the variable itself.

Import failures of the PRELOADED libraries are swallowed: the preload is
an optimization, and a worker that needs pandas will raise its own
ImportError at use time exactly as before. An import failure of THIS
module, by contrast, breaks worker startup loudly — which is why
``get_spark`` only enables the conf after verifying the module resolves
from the paths the daemon will see.

The stock daemon's behavior is preserved exactly: pyspark.daemon selects
the worker entry from ``sys.argv[1]`` at import time (used by coverage /
test harnesses), and this wrapper imports it with the same argv before
delegating to ``manager()``.
"""

import os

os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

try:  # optimization only — workers re-raise at use time if truly absent
    import pandas  # noqa: F401  (pulls numpy, under the caps above)
    import pyarrow  # noqa: F401
    import pyarrow.compute  # noqa: F401  (the kernels the engine calls)
except Exception:  # pragma: no cover - depends on environment
    pass

# pyspark.worker is what forked workers execute; the daemon imports it
# (via sys.argv[1]) at its own import time, so children inherit the
# serializer modules too.
from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
