"""Column-expression builders: the sylph math as JVM-side Spark SQL
expressions (whole-stage-codegen friendly — no Python in the hot path).

These are the pure-arithmetic pieces of the estimator chain (SURVEY.md §2.6)
that don't need a histogram walk: the naive containment index
(contain.rs:655-660), the zero-truncation corrected similarity
(contain.rs:832-836), FracMinHash selection in signed-i64 space
(seeding.rs:108 re-expressed for Spark LongType), and SimHash hamming via
bit_count.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def naive_sim_expr(contained: Column, total: Column, k: float) -> Column:
    """(contained/total)^(1/k) — contain.rs:655-660."""
    return F.pow(contained.cast("double") / total.cast("double"), 1.0 / k)


def adj_sim_expr(contained: Column, total: Column, lam: Column, k: float) -> Column:
    """Zero-truncation corrected: (contained/((1−e^{−λ})·total))^{1/k} —
    contain.rs:832-836. NULL λ propagates (caller coalesces to naive)."""
    adj = contained.cast("double") / (
        (F.lit(1.0) - F.exp(-lam)) * total.cast("double")
    )
    return F.pow(adj, 1.0 / k)


def fracminhash_keep(hash_col: Column, c: int) -> Column:
    """u64 test ``h < 2**64//c`` on an i64 column holding the raw bits.

    For c ≥ 2 the threshold T < 2**63, so unsigned h < T ⟺ signed h ≥ 0 AND
    signed h < T (the sign bit being set means h ≥ 2**63 ≥ T).
    """
    if c <= 1:
        return F.lit(True)
    threshold = (1 << 64) // c
    return (hash_col >= 0) & (hash_col < threshold)


def hamming64_expr(a: Column, b: Column) -> Column:
    """SimHash hamming distance, JVM-side (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def ratio_lambda_agg_exprs() -> dict[str, str]:
    """SQL templates for the ratio_lambda estimator over a (grp, val) table —
    the modal-bin Poisson ratio identity (inference.rs:207-242) expressed as
    pure SQL (see __spark_entry__.SHARED_SQL['e1_ratio_lambda'] for the
    assembled query DuckDB-verified against the same semantics)."""
    return {
        "hist": "SELECT {grp} AS grp, {val} AS val, COUNT(*) AS cnt FROM {src} GROUP BY {grp}, {val}",
        "modal": (
            "SELECT grp, val AS most_ind, cnt AS modal_cnt FROM ("
            "SELECT grp, val, cnt, ROW_NUMBER() OVER (PARTITION BY grp "
            "ORDER BY cnt DESC, val DESC) AS rn FROM hist) r WHERE rn = 1"
        ),
        "lambda": (
            "SELECT m.grp, h.cnt * 1.0 / m.modal_cnt * (m.most_ind + 1) AS lambda_est "
            "FROM modal m JOIN hist h ON h.grp = m.grp AND h.val = m.most_ind + 1 "
            "WHERE h.cnt >= {min_count} AND m.modal_cnt >= {min_count}"
        ),
    }
