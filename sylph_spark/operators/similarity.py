"""Embedding similarity-search operators: brute-force cosine top-k (the
baseline) and label/bucket-blocked nearest neighbor (the scale path —
restrict the quadratic join to blocks). Cosine is computed with
aggregate/zip_with lambda expressions — JVM-side, no Python."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_knn(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
) -> DataFrame:
    """Global top-k by cosine to a literal query vector (brute force).

    orderBy+limit compiles to TakeOrderedAndProject — per-partition top-k
    merged on the driver, no global sort. The row_number window that
    assigns ranks runs AFTER the limit, over exactly k rows (a global
    window over the full table would single-partition 10¹² rows)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * _norm(q))
    top = (
        df.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )
    return top.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy(F.desc("cosine"), F.col(id_col))),
    ).select(id_col, "cosine", "rnk")


def cosine_nn_blocked(
    df: DataFrame, id_col: str, vec_col: str, block_col: str
) -> DataFrame:
    """Top-1 neighbor within each block (label, LSH bucket, IVF cell…) —
    the ANN pattern: a coarse partitioner bounds the quadratic join."""
    a = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
    )
    b = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
    )
    sim = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    pairs = (
        a.join(b, "blk")
        .filter(F.col("id_a") != F.col("id_b"))
        .withColumn("cosine", sim)
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("id_a").orderBy(F.desc("cosine"), F.col("id_b"))
            ),
        )
    )
    return pairs.filter(F.col("rnk") == 1).select(
        F.col("id_a").alias(id_col), F.col("id_b").alias("nn_id"), "cosine"
    )


def hyperplane_bucket(vec_col: str, dims: int = 6) -> Column:
    """Sign-pattern LSH bucket over the first ``dims`` dimensions — the
    deterministic coarse partitioner used by cosine_nn_blocked at scale."""
    bits = [
        F.when(F.element_at(F.col(vec_col), i + 1) > 0, "1").otherwise("0")
        for i in range(dims)
    ]
    return F.concat(*bits)
