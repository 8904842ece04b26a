"""Diagnose the 960k recall drop: is the fixed band_max_df_abs cap leaving
missed-pair members with too few informative (df <= limit) shingles to band?

Runs the full volatile pipeline once, derives the missed dup pairs against
the generator plan, then joins them to per-item informative-shingle counts.
"""
import sys, json
sys.path.insert(0, ".")
import pyspark.sql.functions as F
from sylph_spark.session import build_spark
from sylph_spark.config import SketchConfig
from sylph_spark.pipeline import run_volatile, DedupPipeline
from sylph_spark.fixtures_spark import _plan


def main(path=".bench_cache/images_960k.parquet", n_base=600_000, cpus=32):
    n_base, cpus = int(n_base), int(cpus)
    spark = build_spark("diag", master=f"local[{cpus}]", shuffle_partitions=2 * cpus)
    images = spark.read.parquet(path)
    cfg = SketchConfig()
    out = run_volatile(spark, images, cfg)
    labels = {r["image_id"]: r["cluster_id"] for r in out["clusters"].collect()}

    plan = _plan(n_base)
    missed = []  # (kind, rid, bid)
    for row_idx, (kind, base_idx) in enumerate(plan):
        if kind in ("base", "negative"):
            continue
        rid, bid = f"img{row_idx:010d}", f"img{base_idx:010d}"
        if labels.get(rid) != labels.get(bid):
            missed.append((kind, rid, bid))
    print(f"missed pairs: {len(missed)}", file=sys.stderr)

    p = DedupPipeline.__new__(DedupPipeline)
    p.spark, p.cfg = spark, cfg
    n_items = out["sketches"].count()
    limit = p._band_df_limit(n_items)

    # per-item informative-shingle count (df <= limit), split by family
    sk = out["sketches"]
    cnt = out["shingle_counts"]

    def informative(col, name):
        return (
            sk.select("image_id", F.explode(col).alias("shingle"))
            .join(cnt.filter(F.col("cnt") <= limit), "shingle")
            .groupBy("image_id")
            .agg(F.count(F.lit(1)).alias(name))
        )

    total = sk.select(
        "image_id",
        F.size("shingles").alias("n_all"),
        F.size("img_shingles").alias("n_img"),
        F.size("cap_shingles").alias("n_cap"),
    )
    inf = (
        total.join(informative("shingles", "inf_all"), "image_id", "left")
        .join(informative("img_shingles", "inf_img"), "image_id", "left")
        .join(informative("cap_shingles", "inf_cap"), "image_id", "left")
        .fillna(0, ["inf_all", "inf_img", "inf_cap"])
    )

    ids = sorted({i for _, a, b in missed for i in (a, b)})
    ids_df = spark.createDataFrame([(i,) for i in ids], "image_id string")
    rows = {r["image_id"]: r.asDict() for r in inf.join(ids_df, "image_id").collect()}

    # classify each missed pair by the banding capacity of its members
    rpb = max(cfg.rows_per_band, cfg.family_rows)
    def bucketize(d):
        if d is None:
            return "no-sketch-row"
        if d["inf_all"] == 0 and d["inf_img"] == 0 and d["inf_cap"] == 0:
            return "zero-informative"
        if min(d["inf_all"], d["inf_img"], d["inf_cap"]) < rpb:
            return f"under-{rpb}-some-family"
        return "fully-bandable"

    summary = {}
    for kind, a, b in missed:
        ka, kb = bucketize(rows.get(a)), bucketize(rows.get(b))
        key = (kind, tuple(sorted([ka, kb])))
        summary[key] = summary.get(key, 0) + 1
    for (kind, pairkinds), n in sorted(summary.items(), key=lambda x: -x[1]):
        print(json.dumps({"kind": kind, "members": list(pairkinds), "n": n}))

    # corpus-wide banding-capacity distribution for context
    dist = inf.select(
        F.sum((F.col("inf_all") == 0).cast("int")).alias("zero_all"),
        F.sum((F.col("inf_cap") == 0).cast("int")).alias("zero_cap"),
        F.sum((F.col("inf_img") == 0).cast("int")).alias("zero_img"),
        F.sum((F.col("inf_all") < rpb).cast("int")).alias("under_all"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    print(json.dumps({"limit": limit, **dist.asDict()}))
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:4])
