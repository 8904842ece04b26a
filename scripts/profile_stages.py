"""Per-stage wall-clock profile of the dedup pipeline at a given core count
(pin externally with taskset). Identifies which stages scale with cores and
which are serial floor — the measurement behind the scaling-efficiency work.

Usage: taskset -c 0-7 python scripts/profile_stages.py <images.parquet> 8
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sylph_spark.config import SketchConfig
from sylph_spark.pipeline import DedupPipeline
from sylph_spark.session import build_spark, heavy_payload_batches


def main(path: str, cpus: str = "32", warm: str = "1") -> None:
    cpus = int(cpus)
    spark = build_spark(
        "profile", master=f"local[{cpus}]", shuffle_partitions=2 * cpus
    )
    cfg = SketchConfig()
    p = DedupPipeline.__new__(DedupPipeline)
    p.spark, p.cfg = spark, cfg
    images = spark.read.parquet(path)

    def run_once(tag: str) -> dict[str, float]:
        t: dict[str, float] = {}

        def step(name, fn):
            t0 = time.time()
            out = fn()
            t[name] = round(time.time() - t0, 2)
            return out

        with heavy_payload_batches(spark):
            sketches = step(
                "sketches", lambda: p._stage_sketches(images).localCheckpoint()
            )
        n_items = step("n_items(count)", lambda: sketches.count())
        counts = step(
            "counts", lambda: p._stage_shingle_counts(sketches).localCheckpoint()
        )
        n_vocab = step("n_vocab(count)", lambda: counts.count())
        cands = step(
            "candidates",
            lambda: p._stage_candidates(
                sketches, counts, n_items, n_vocab
            ).localCheckpoint(),
        )
        pairsh = step(
            "pair_shingles",
            lambda: p._stage_pair_shingles(
                cands, sketches, counts
            ).localCheckpoint(),
        )
        scored = step(
            "scored", lambda: p._stage_scored(pairsh).localCheckpoint()
        )
        gated = step(
            "gated", lambda: p._stage_gated(scored, sketches).localCheckpoint()
        )
        rescored = step(
            "rescored",
            lambda: p._stage_rescored(
                scored, pairsh, sketches, counts, n_items
            ).localCheckpoint(),
        )
        verified = step(
            "verified",
            lambda: p._stage_verified(rescored, gated).localCheckpoint(),
        )
        clusters = step(
            "clusters", lambda: p._stage_clusters(sketches, gated).localCheckpoint()
        )
        step(
            "survivors",
            lambda: p._stage_survivors(clusters, verified).write.format("noop")
            .mode("overwrite")
            .save(),
        )
        t["TOTAL"] = round(sum(t.values()), 2)
        print(json.dumps({"tag": tag, "cpus": cpus, **t}))
        return t

    if int(warm):
        run_once("warmup")
    run_once("measured")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:4])
