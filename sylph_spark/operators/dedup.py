"""Generic text-deduplication operators over any DataFrame with an id and a
text column — the training-data-pipeline counterparts of the image pipeline
(exact hash dedup, n-gram Jaccard, MinHash/LSH). All JVM-side (explode +
joins + aggregates); no Python UDFs.

These are the DataFrame-API versions of the SQL in ``__spark_entry__``
(dd_exact_dedup / dd_ngram_jaccard / dd_minhash_sig), exposed as a library.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(fp, rep_id, n_copies): one representative per exact-content group."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("fp"))
        .agg(
            F.min(id_col).alias("rep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def dedup_gated_counts(df: DataFrame, key_col: str, fingerprint_col: str) -> DataFrame:
    """A2 dedup-gated counting (sketch.rs:690-731): per key, count DISTINCT
    fingerprints rather than raw occurrences — the reference counts a k-mer's
    multiplicity only once per deduplicated read pair. One map-side-combined
    hash aggregate (Spark rewrites count(distinct) as a two-phase agg, no
    per-key state on any single task)."""
    return (
        df.groupBy(key_col)
        .agg(F.countDistinct(fingerprint_col).alias("dedup_cnt"))
    )


def _char_shingles(df: DataFrame, id_col: str, text_col: str, k: int, prefix: int):
    s = F.lower(F.substring(F.col(text_col), 1, prefix))
    return (
        df.select(F.col(id_col).alias("doc_id"), s.alias("s"))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.greatest(F.length("s") - (k - 1), F.lit(1)))
            ).alias("pos"),
            "s",
        )
        .select("doc_id", F.expr(f"substr(s, pos, {k})").alias("g"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    prefix: int = 160,
    max_df: int = 100,
    min_jaccard: float = 0.2,
) -> DataFrame:
    """Near-dup pairs by character k-gram Jaccard, with stop-shingle removal
    (df > max_df) to keep the shingle self-join linear."""
    sh = _char_shingles(df, id_col, text_col, k, prefix)
    rare = sh.groupBy("g").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") <= max_df
    )
    shr = sh.join(rare.select("g"), "g")
    sizes = shr.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = shr.select(F.col("doc_id").alias("id_a"), "g")
    b = shr.select(F.col("doc_id").alias("id_b"), "g")
    inter = (
        a.join(b, "g")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na")), "id_a")
        .join(sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb")), "id_b")
        .withColumn("jaccard", F.col("i") / (F.col("na") + F.col("nb") - F.col("i")))
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    prefix: int = 160,
    num_hashes: int = 4,
) -> DataFrame:
    """Candidate pairs sharing a full MinHash signature (one band of
    ``num_hashes`` rows) over md5-string minima — the pure-SQL LSH used for
    text tables (the image pipeline uses the u64 kernel variant). One md5
    per shingle; each signature slot is the min over a disjoint 8-hex-char
    substring of the digest (``num_hashes`` ≤ 4)."""
    assert num_hashes <= 4, "one md5 digest yields 4 independent 32-bit slots"
    sh = _char_shingles(df, id_col, text_col, k, prefix)
    fp = F.md5(F.col("g"))
    aggs = [
        F.min(F.substring(fp, 1 + 8 * (i - 1), 8)).alias(f"mh{i}")
        for i in range(1, num_hashes + 1)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    key = F.concat(*[F.col(f"mh{i}") for i in range(1, num_hashes + 1)])
    sig = sig.select("doc_id", key.alias("band"))
    a = sig.select(F.col("doc_id").alias("id_a"), "band")
    b = sig.select(F.col("doc_id").alias("id_b"), "band")
    return (
        a.join(b, "band")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
