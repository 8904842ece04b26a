"""SparkSession factory with the scale-oriented defaults this engine assumes.

AQE (+skew-join splitting) replaces sylph's hand-built memory gating and
two-level thread scheduling (/root/reference/src/sketch.rs:27-51,
contain.rs:240-256); Arrow batching is the analog of its AVX2 batch kernels
(avx2_seeding.rs:33-148).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_spark(
    app_name: str = "sylph_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SYLPH_SPARK_MASTER", "local[*]")
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SYLPH_SHUFFLE_PARTITIONS", "32")
    )
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batches must be sized in BYTES, not rows: at ~100 KB binary
        # payloads, 4096-row batches mean ~0.5-1 GB buffered per in-flight
        # task before Python sees a row (measured 11× sketch-stage slowdown
        # from allocator/GC churn). 512 rows ≈ 50 MB worst-case per batch;
        # our Python UDFs do per-row numpy work, so small batches cost ~0.
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SYLPH_ARROW_BATCH_ROWS", "512"),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # web-image tables carry ~100 KB binary payloads: the default
        # 4096-row vectorized parquet batch would need ~0.5-1 GB of
        # contiguous buffer PER TASK (OOMs the reader). 512 rows keeps scan
        # batches ~50 MB while staying fully vectorized.
        .config(
            "spark.sql.parquet.columnarReaderBatchSize",
            os.environ.get("SYLPH_PARQUET_BATCH_ROWS", "512"),
        )
        .config("spark.driver.memory", os.environ.get("SYLPH_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
