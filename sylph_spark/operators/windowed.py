"""Running-state windowed operators (SURVEY.md §2.3 A6).

The reference thins sketch positions with RUNNING state: a k-mer is kept
iff it lies strictly more than ``min_spacing`` past the last KEPT one
(sketch.rs:602-619) — per (contig) group, in position order. This is NOT
expressible as a window LAG (gap from the previous ROW): for positions
[0, 20, 40] at spacing 30 the reference keeps {0, 40}, a lag keeps {0}.

Spark-first shape: greedy running state is inherently sequential WITHIN a
group but embarrassingly parallel ACROSS groups, so the operator is a
grouped ``applyInPandas`` with a numpy kernel — exactly the custom-stateful
escape hatch SURVEY §2.3 prescribes. Groups (users / contigs) are small;
the shuffle is one hash partition on the group key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from .. import kernels as K


def min_spacing_thin(
    df: DataFrame,
    group_cols: list[str],
    pos_col: str,
    spacing: float,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Keep rows strictly more than ``spacing`` past the last kept row,
    per group, scanning in (pos_col, *tie_cols) order. First row of each
    group is always kept. Output schema == input schema.

    ``pos_col`` may be numeric or timestamp (timestamps compare in
    seconds: spacing=30.0 means 30 s)."""
    tie = list(tie_cols or [])
    order = [pos_col, *tie]
    schema = df.schema

    def thin(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        pos = pdf[pos_col]
        if np.issubdtype(pos.dtype, np.datetime64):
            vals = pos.to_numpy(dtype="datetime64[ns]").astype(np.int64) / 1e9
        else:
            vals = pos.to_numpy(dtype=np.float64)
        return pdf[K.min_spacing_keep_mask(vals, spacing)]

    return df.groupBy(*group_cols).applyInPandas(thin, schema=schema)
