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
# permanent generation and stop the cyclic GC from traversing (and
# copy-on-write-unsharing) it in every forked worker. Refcount updates
# still touch pages, but the bulk COW storm at pool-growth time drops
# from ~300MB/worker to the working set.
gc.collect()
gc.freeze()
gc.set_threshold(0)

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
