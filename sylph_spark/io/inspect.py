"""Inspect utility — the S8 analog of ``sylph inspect``
(/root/reference/src/inspect.rs:117-233): summarize a pipeline workdir
without materializing table contents (manifests + lineage + schema only,
the columnar counterpart of the reference's streaming serde visitor)."""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..pipeline import STAGES
from .catalog import StageCatalog


def inspect_workdir(spark: SparkSession, workdir: str) -> dict:
    cat = StageCatalog(spark, workdir)
    out: dict = {"workdir": workdir, "stages": {}}
    for stage in STAGES:
        m = cat.manifest(stage)
        if m is None:
            out["stages"][stage] = {"committed": False}
            continue
        df = cat.read(stage)
        lin = cat.lineage(stage)
        skew = lin.selectExpr(
            "max(rows) as max_rows", "avg(rows) as avg_rows"
        ).collect()[0]
        out["stages"][stage] = {
            "committed": True,
            "config_hash": m.config_hash,
            "snapshot_id": m.snapshot_id,
            "rows": m.rows,
            "partitions": m.partitions,
            "schema": df.schema.simpleString(),
            "partition_skew": round(
                (skew["max_rows"] / skew["avg_rows"]) if skew["avg_rows"] else 0.0, 2
            ),
        }
    out["metrics_rows"] = len(cat.metrics())
    return out


def format_inspect(report: dict) -> str:
    lines = [f"workdir: {report['workdir']}"]
    for stage, info in report["stages"].items():
        if not info["committed"]:
            lines.append(f"  {stage:16s} —")
            continue
        lines.append(
            f"  {stage:16s} rows={info['rows']:<10} parts={info['partitions']:<4} "
            f"skew={info['partition_skew']:<5} snap={info['snapshot_id'][:8]}"
        )
    return "\n".join(lines)
