"""Report sinks — the S7 TSV sink analog (/root/reference/src/
contain.rs:18-94,461-480: header + formatted rows, single ordered output).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from .catalog import StageCatalog


def write_tsv(df: DataFrame, path: str, order_by: list[str] | None = None) -> None:
    """Ordered single-file TSV with header — the reference's mutex-batched
    ordered writer (contain.rs:261,336-339) maps to orderBy + coalesce(1)."""
    out = df
    if order_by:
        out = out.orderBy(*order_by)
    (
        out.coalesce(1)
        .write.mode("overwrite")
        .option("sep", "\t")
        .option("header", "true")
        .csv(path)
    )


def write_run_report(catalog: StageCatalog, path: str) -> dict:
    """JSON run summary: per-stage rows/partitions/snapshots + metrics."""
    report = {
        "stages": {},
        "metrics": catalog.metrics(),
    }
    from ..pipeline import STAGES

    for stage in STAGES:
        m = catalog.manifest(stage)
        if m:
            report["stages"][stage] = {
                "rows": m.rows,
                "partitions": m.partitions,
                "snapshot_id": m.snapshot_id,
                "config_hash": m.config_hash,
            }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    return report
