"""End-to-end Spark pipeline tests: cluster assignments must match the
single-node oracle EXACTLY at the same SketchConfig (SURVEY.md §5.2), plus
checkpoint/resume path-equivalence (mirroring the reference's
path-equivalence tests, /root/reference/tests/integration_test.rs:246-295).
"""

import numpy as np
import pytest

from sylph_spark import fixtures, oracle
from sylph_spark.config import SketchConfig
from sylph_spark.pipeline import DedupPipeline, images_df_from_pandas


@pytest.fixture(scope="module")
def corpus():
    return fixtures.generate_corpus(n_base=120, seed=42)


@pytest.fixture(scope="module")
def oracle_result(corpus):
    images, _ = corpus
    return oracle.run_oracle(images, SketchConfig())


@pytest.fixture(scope="module")
def spark_result(spark, corpus, tmp_path_factory):
    images, _ = corpus
    workdir = str(tmp_path_factory.mktemp("pipe"))
    pipe = DedupPipeline(spark, SketchConfig(), workdir)
    out = pipe.run(images_df_from_pandas(spark, images))
    return pipe, out, workdir


class TestPipelineVsOracle:
    def test_sketches_match(self, spark_result, oracle_result):
        _, out, _ = spark_result
        got = {
            r["image_id"]: (sorted(r["shingles"]), r["simhash"])
            for r in out["sketches"].collect()
        }
        import sylph_spark.kernels as K

        for s in oracle_result.sketches:
            exp_sh = K.u64_to_i64(s.shingles).tolist()
            exp_sim = s.simhash - (1 << 64) if s.simhash >= 1 << 63 else s.simhash
            assert got[s.image_id] == (sorted(exp_sh), exp_sim)

    def test_shingle_counts_match(self, spark_result, oracle_result):
        _, out, _ = spark_result
        import sylph_spark.kernels as K

        got = {r["shingle"]: r["cnt"] for r in out["shingle_counts"].collect()}
        exp = {
            int(K.u64_to_i64(np.array([s], dtype=np.uint64))[0]): c
            for s, c in oracle_result.counts.items()
        }
        assert got == exp

    def test_candidates_superset_of_verified_truth(self, spark_result, oracle_result):
        _, out, _ = spark_result
        got = {(r["id_a"], r["id_b"]) for r in out["candidates"].collect()}
        assert got == oracle_result.candidates

    def test_scored_match(self, spark_result, oracle_result):
        _, out, _ = spark_result
        got = {
            (r["id_a"], r["id_b"]): (
                r["contain_count"],
                r["total_kmers"],
                r["naive_sim"],
                r["adj_sim"],
                r["adjust_status"],
            )
            for r in out["scored"].collect()
        }
        exp = {
            (r.id_a, r.id_b): (
                r.contain_count,
                r.total_kmers,
                r.naive_sim,
                r.adj_sim,
                r.adjust_status,
            )
            for r in oracle_result.scored.itertuples()
        }
        assert set(got) == set(exp)
        for k in exp:
            assert got[k][0] == exp[k][0]
            assert got[k][1] == exp[k][1]
            assert got[k][2] == pytest.approx(exp[k][2])
            assert got[k][3] == pytest.approx(exp[k][3])
            assert got[k][4] == exp[k][4]

    def test_rescored_match(self, spark_result, oracle_result):
        """Winner-table rescore parity: pair set, kmers_lost, and the
        rescored similarity must match the numpy oracle exactly."""
        _, out, _ = spark_result
        got = {
            (r["id_a"], r["id_b"]): (r["kmers_lost"], r["contain_count"], r["adj_sim"])
            for r in out["rescored"].collect()
        }
        exp = {
            (r.id_a, r.id_b): (r.kmers_lost, r.contain_count, r.adj_sim)
            for r in oracle_result.rescored.itertuples()
        }
        assert set(got) == set(exp)
        for k in exp:
            assert got[k][0] == exp[k][0]
            assert got[k][1] == exp[k][1]
            assert got[k][2] == pytest.approx(exp[k][2])

    def test_verified_match(self, spark_result, oracle_result):
        _, out, _ = spark_result
        got = {(r["id_a"], r["id_b"]) for r in out["verified"].collect()}
        exp = {(r.id_a, r.id_b) for r in oracle_result.verified.itertuples()}
        assert got == exp

    def test_clusters_match_exactly(self, spark_result, oracle_result):
        _, out, _ = spark_result
        got = {(r["image_id"], r["cluster_id"]) for r in out["clusters"].collect()}
        exp = set(
            zip(oracle_result.clusters["image_id"], oracle_result.clusters["cluster_id"])
        )
        assert got == exp

    def test_survivors_match(self, spark_result, oracle_result):
        _, out, _ = spark_result
        got = {(r["image_id"], r["cluster_id"]) for r in out["survivors"].collect()}
        exp = set(
            zip(
                oracle_result.survivors["image_id"],
                oracle_result.survivors["cluster_id"],
            )
        )
        assert got == exp

    def test_recall_vs_truth(self, spark_result, corpus):
        _, out, _ = spark_result
        _, truth = corpus
        import pandas as pd

        ver = out["verified"].select("id_a", "id_b").toPandas()
        rec = oracle.pair_recall(ver, truth)
        assert rec >= 0.99


class TestResume:
    def test_resume_skips_completed_stages(self, spark, spark_result, corpus):
        """Second run with same config reuses every committed stage and
        produces identical output (path-equivalence: resumed ≡ fresh)."""
        images, _ = corpus
        pipe, out1, workdir = spark_result
        before = {m["stage"]: m for m in pipe.catalog.metrics() if m["metric"] == "rows"}
        pipe2 = DedupPipeline(spark, SketchConfig(), workdir)
        out2 = pipe2.run(images_df_from_pandas(spark, images))
        c1 = {(r["image_id"], r["cluster_id"]) for r in out1["clusters"].collect()}
        c2 = {(r["image_id"], r["cluster_id"]) for r in out2["clusters"].collect()}
        assert c1 == c2
        # no new write metrics → stages were skipped
        after = [m for m in pipe2.catalog.metrics() if m["metric"] == "rows"]
        assert len(after) == len(before)

    def test_config_change_invalidates(self, spark, spark_result, corpus):
        images, _ = corpus
        _, _, workdir = spark_result
        pipe3 = DedupPipeline(spark, SketchConfig(tau=0.7), workdir)
        assert not pipe3.catalog.has_valid("sketches", pipe3.h)

    def test_input_change_invalidates(self, spark, spark_result, corpus):
        """Same config but a DIFFERENT input table must invalidate committed
        stages (input half of the reference's compatibility check,
        contain.rs:503-516) — while the original input still validates."""
        from sylph_spark.pipeline import input_fingerprint

        images, _ = corpus
        pipe, _, workdir = spark_result
        same_fp = input_fingerprint(images_df_from_pandas(spark, images))
        assert pipe.catalog.has_valid("sketches", pipe.h, same_fp)
        other, _ = fixtures.generate_corpus(n_base=30, seed=99)
        other_fp = input_fingerprint(images_df_from_pandas(spark, other))
        assert other_fp != same_fp
        assert not pipe.catalog.has_valid("sketches", pipe.h, other_fp)

    def test_manifests_and_lineage_exist(self, spark_result):
        pipe, _, workdir = spark_result
        for stage in ["sketches", "clusters", "survivors"]:
            m = pipe.catalog.manifest(stage)
            assert m is not None and m.rows > 0
            lin = pipe.catalog.lineage(stage)
            assert lin.count() == m.partitions


def test_lcs_short_circuit_identical(spark, spark_result):
    """VERDICT r4 #3: the in-UDF equal-caption short-circuit must not
    change the LCS values (vectorized path ≡ pure per-pair automaton),
    and the automaton's pair volume must be measurably below the gate's
    input (the short-circuit actually fires)."""
    import pandas as pd

    from sylph_spark import udfs
    from sylph_spark.pipeline import lcs_prefilter_stats

    a = pd.Series(["hello world", "same caption!", "", None, "abcdef", "x"])
    b = pd.Series(["hello brave world", "same caption!", "", "", "abXdef", None])
    fast = udfs.make_lcs_fn()(a, b)
    slow = udfs.make_lcs_fn(short_circuit=False)(a, b)
    assert fast.tolist() == slow.tolist()
    assert fast[1] == len("same caption!")  # equal pair short-circuited

    _, out, _ = spark_result
    stats = lcs_prefilter_stats(
        spark, out["scored"], out["sketches"], SketchConfig()
    )
    n_gated = out["gated"].count()
    assert stats["hamming_pairs"] >= stats["lcs_udf_pairs"]
    assert stats["lcs_udf_pairs"] < n_gated  # short-circuit actually fires
    assert 0.0 <= stats["lcs_udf_skipped_frac"] <= 1.0


def test_same_length_byte_edit_changes_fingerprint(spark, corpus):
    """VERDICT r4 #6: the non-file content probe hashes payload BYTES
    (xxhash64), so a same-length byte edit — id, caption, phash and length
    all unchanged — must change the fingerprint (and so invalidate any
    committed checkpoint for it)."""
    from sylph_spark.pipeline import input_fingerprint

    images, _ = corpus
    fp1 = input_fingerprint(images_df_from_pandas(spark, images))
    edited = images.copy(deep=True)
    b = bytearray(edited.at[0, "bytes"])
    b[len(b) // 2] ^= 0xFF
    edited.at[0, "bytes"] = bytes(b)
    assert len(edited.at[0, "bytes"]) == len(images.at[0, "bytes"])
    fp2 = input_fingerprint(images_df_from_pandas(spark, edited))
    assert fp1 != fp2


def test_dense_bucket_degrade(spark):
    """Scale-relative df limit + dense-bucket degrade (960k recall audit):
    buckets above cfg.bucket_degrade_size pair tri-diagonally (linear in
    bucket size) instead of all-pairs, identically in Spark and the oracle,
    and the degenerate bucket still resolves to ONE cluster via chaining."""
    from sylph_spark.pipeline import run_volatile

    images, _ = fixtures.generate_corpus(n_base=6, seed=7)
    base = images.iloc[[0]]
    clones = []
    for i in range(12):
        row = base.copy(deep=True)
        row["image_id"] = [f"imgclone{i:04d}"]
        clones.append(row)
    import pandas as pd

    corpus12 = pd.concat([images] + clones, ignore_index=True)

    cfg = SketchConfig(bucket_degrade_size=4, pair_chunk=2)
    out = run_volatile(spark, images_df_from_pandas(spark, corpus12), cfg)
    got = {(r["id_a"], r["id_b"]) for r in out["candidates"].collect()}

    sketches = oracle.sketch_corpus(corpus12, cfg)
    counts = oracle.corpus_counts(sketches)
    want = oracle.lsh_candidates(sketches, cfg, counts)
    assert got == want

    clone_ids = sorted(f"imgclone{i:04d}" for i in range(12))
    # degraded: strictly fewer clone-clone pairs than the 12·11/2 quadratic
    clone_pairs = {
        (a, b) for a, b in got if a in clone_ids and b in clone_ids
    }
    assert 0 < len(clone_pairs) < 66
    # tri-diagonal neighborhood, judged over ACTUAL bucket membership (the
    # clones share their buckets with every identical-content fixture row —
    # base + exact dup — so positions must come from the bucket's own sorted
    # members, not from the clone list alone): every emitted pair must be
    # allowed by at least one bucket containing both ids — a small bucket
    # (full pairing) or a dense one with the ids ≤ 1 chunk apart.
    buckets = [
        sorted(set(m)) for m in oracle.lsh_buckets(sketches, cfg, counts).values()
    ]
    assert any(len(m) > cfg.bucket_degrade_size for m in buckets)

    def allowed(a: str, b: str) -> bool:
        for members in buckets:
            if a not in members or b not in members:
                continue
            if len(members) <= cfg.bucket_degrade_size:
                return True
            ia, ib = members.index(a), members.index(b)
            if abs(ib // cfg.pair_chunk - ia // cfg.pair_chunk) <= 1:
                return True
        return False

    assert all(allowed(a, b) for a, b in got)
    # the bucket still collapses to one cluster through CC chaining
    labels = {
        r["image_id"]: r["cluster_id"] for r in out["clusters"].collect()
    }
    assert len({labels[c] for c in clone_ids}) == 1


def test_dense_bucket_interleaved_families(spark):
    """Pin the dense-degrade CHAINING assumption on a heterogeneous bucket
    (ADVICE r4): two clone families share one caption, so the caption-family
    LSH bucket interleaves them in sorted-id order and degrades tri-diagonal.
    Cross-family neighbors fail the score gate (caption-only overlap ≪ tau),
    so each family must chain through its OWN members — via the intra-family
    image/combined buckets and the surviving same-family caption-bucket
    edges — and resolve to exactly two clusters, not fragments."""
    import pandas as pd

    from sylph_spark.pipeline import run_volatile

    base, _ = fixtures.generate_corpus(n_base=8, seed=13)
    # two rows with distinct image content (exact dups share phash+caption)
    row_a = base.iloc[[0]]
    row_b_idx = next(
        i
        for i in range(1, len(base))
        if base.at[i, "phash"] != base.at[0, "phash"]
        and base.at[i, "caption"] != base.at[0, "caption"]
    )
    row_b = base.iloc[[row_b_idx]]
    shared_caption = "a red cat sits near the blue tree"
    rows = []
    for i in range(16):
        src = row_a if i % 2 == 0 else row_b
        r = src.copy(deep=True)
        r["image_id"] = [f"imgz{i:02d}"]
        r["caption"] = [shared_caption]
        rows.append(r)
    corpus = pd.concat(rows, ignore_index=True)

    cfg = SketchConfig(bucket_degrade_size=4, pair_chunk=2)
    out = run_volatile(spark, images_df_from_pandas(spark, corpus), cfg)
    fam_a = [f"imgz{i:02d}" for i in range(0, 16, 2)]
    fam_b = [f"imgz{i:02d}" for i in range(1, 16, 2)]

    cand = {(r["id_a"], r["id_b"]) for r in out["candidates"].collect()}
    # the shared-caption bucket really mixed the families ...
    assert any(
        (a in fam_a) != (b in fam_a) for a, b in cand
    ), "no cross-family candidate — families never shared a bucket"
    # ... and the degrade dropped at least one same-family direct edge
    assert ("imgz00", "imgz14") not in cand

    labels = {r["image_id"]: r["cluster_id"] for r in out["clusters"].collect()}
    lab_a = {labels[i] for i in fam_a}
    lab_b = {labels[i] for i in fam_b}
    assert len(lab_a) == 1, f"family A fragmented: {lab_a}"
    assert len(lab_b) == 1, f"family B fragmented: {lab_b}"
    assert lab_a != lab_b, "families merged across the heterogeneous bucket"


def test_distributed_cc_pipeline_parity(spark, corpus, monkeypatch):
    """VERDICT r4 #3: run the FULL pipeline with SYLPH_CC_DRIVER_THRESHOLD=0
    so both connected_components (clusters stage) and pair_cluster_labels
    (rescore competition scope) take the distributed propagation path — the
    code that actually runs at 100-TB edge counts — and assert clusters,
    rescored pairs and survivors identical to the driver fast path."""
    from sylph_spark.pipeline import run_volatile

    images, _ = corpus
    df = images_df_from_pandas(spark, images)
    cfg = SketchConfig()

    def stages(out):
        return {
            "clusters": sorted(
                (r["image_id"], r["cluster_id"]) for r in out["clusters"].collect()
            ),
            "survivors": sorted(
                (r["image_id"], r["cluster_id"]) for r in out["survivors"].collect()
            ),
            "rescored": sorted(
                (r["id_a"], r["id_b"], round(r["adj_sim"], 9), r["kmers_lost"])
                for r in out["rescored"].collect()
            ),
        }

    base = stages(run_volatile(spark, df, cfg))
    monkeypatch.setenv("SYLPH_CC_DRIVER_THRESHOLD", "0")
    dist = stages(run_volatile(spark, df, cfg))
    assert dist == base
