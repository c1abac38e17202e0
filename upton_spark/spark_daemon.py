"""PySpark worker daemon with the engine's imports preloaded.

Stock pyspark.daemon forks workers that then cold-import pandas/numpy/pyarrow
per fork — with 32 cores and pipelined Arrow-UDF stages that's a multi-second
import storm on every new stage shape (measured ~7-15s per first execution
locally). Importing the heavy modules HERE, in the daemon parent, lets every
forked worker inherit them via copy-on-write for free.

Enabled by ``spark.python.daemon.module=upton_spark.spark_daemon`` (set in
plans.session.get_spark). Purely an import-preload shim: control flow is
delegated verbatim to pyspark.daemon.manager.
"""

# Heavy third-party imports first (the big wins):
import numpy  # noqa: F401
import pandas  # noqa: F401

try:  # pyarrow is what Arrow-batched UDFs deserialize with
    import pyarrow  # noqa: F401
    import pyarrow.pandas_compat  # noqa: F401
except ImportError:  # pragma: no cover
    pass

# Engine modules used inside UDFs:
import upton_spark.urlkit  # noqa: F401
import upton_spark.html.extract  # noqa: F401
import upton_spark.operators.dedup  # noqa: F401

import gc

# Instagram-style fork hygiene: freeze the post-import heap into the
# permanent generation so forked workers never traverse (and
# copy-on-write-unshare) it. The cyclic GC stays ENABLED with a raised
# gen-0 threshold: the DOM trees built by the extraction UDFs carry
# parent<->children reference cycles, so with collection disabled every
# parsed page would leak (observed: 32 workers OOM-killed mid-stage).
# freeze() alone keeps the COW win; the raised threshold amortizes the
# collector over ~50k allocations.
gc.collect()
gc.freeze()
gc.set_threshold(50_000, 20, 20)

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
