"""Python worker daemon preloading the heavy imports once per executor.

pyspark forks every Python worker from one daemon process per executor
(``spark.python.daemon.module``); modules imported HERE are inherited by
each forked worker through copy-on-write for free. Without this, the first
Python stage of a cold session pays numpy+pandas+pyarrow+kernels import
(~1.5 s) once per worker — 32 concurrent cold imports on a 32-core local
master. This is the guide §4.5 "initialise heavyweight state once" rule
applied to the import cost itself.

Only imports happen here — no threads, no BLAS calls, no Spark state — so
the subsequent fork() is safe.
"""

import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401

from pyspark.daemon import manager

from sylph_spark import codecs, kernels, udfs  # noqa: F401

if __name__ == "__main__":
    manager()
