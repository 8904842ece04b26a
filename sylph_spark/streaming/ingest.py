"""Structured Streaming ingestion: incremental sketching of newly-arriving
images.

The reference is strictly batch (SURVEY.md §2.8); its closest concepts are
single-pass accumulators. At web scale, new images arrive continuously, so
the sketch stage is naturally incremental: each micro-batch of images is
decoded/shingled with the SAME deterministic kernels and appended to the
sketches table; the downstream batch stages (counts → LSH → score → verify →
cluster) re-run from checkpoints over the grown table. Because sketching is
a pure per-row function, append-only streaming preserves the
path-equivalence invariant: streaming-ingested sketches ≡ batch sketches.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from .. import udfs
from ..config import SketchConfig
from ..session import heavy_payload_batches
from ..sources.images import IMAGES_SCHEMA


def incremental_sketch_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: SketchConfig | None = None,
    trigger_once: bool = False,
) -> StreamingQuery:
    """readStream(images parquet dir) → mapInArrow sketch → append parquet.

    ``trigger_once`` processes the current backlog and stops (the batch-
    equivalence mode used in tests); otherwise micro-batches run continuously.
    """
    cfg = cfg or SketchConfig()
    os.makedirs(output_dir, exist_ok=True)
    stream = (
        spark.readStream.schema(IMAGES_SCHEMA)
        .option("maxFilesPerTrigger", "8")
        .parquet(input_dir)
    )
    sketches = stream.select("image_id", "bytes", "fmt", "caption").mapInArrow(
        udfs.make_sketch_arrow_fn(cfg), schema=udfs.SKETCH_SCHEMA
    )
    writer = (
        sketches.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    # the stream scans ~100 KB binary rows: capture the small-batch confs at
    # query start (streaming plans snapshot the session conf)
    with heavy_payload_batches(spark):
        return writer.start()
