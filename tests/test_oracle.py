"""Oracle pipeline tests: recall ≥0.99 vs ground-truth dup pairs, hard
negatives excluded, per-row invariants (PSNR/caption) on survivors."""

import numpy as np
import pytest

from sylph_spark import codecs, fixtures, oracle
from sylph_spark.config import SketchConfig


@pytest.fixture(scope="module")
def corpus():
    return fixtures.generate_corpus(n_base=200, seed=42)


@pytest.fixture(scope="module")
def result(corpus):
    images, _ = corpus
    return oracle.run_oracle(images, SketchConfig())


class TestOracle:
    def test_recall_vs_truth(self, corpus, result):
        _, truth = corpus
        rec = oracle.pair_recall(result.verified, truth)
        assert rec >= 0.99, f"dup-pair recall {rec:.4f} < 0.99"

    def test_hard_negatives_not_clustered(self, corpus, result):
        images, truth = corpus
        # ids in truth are the dup family; everything else (bases w/o dups +
        # hard negatives) must stay singleton unless it's a base of a dup
        label = dict(zip(result.clusters["image_id"], result.clusters["cluster_id"]))
        truth_ids = set(truth["id_a"]) | set(truth["id_b"])
        from collections import Counter

        sizes = Counter(label.values())
        for iid in images["image_id"]:
            if iid not in truth_ids:
                assert sizes[label[iid]] == 1, f"non-dup {iid} got clustered"

    def test_exact_dups_always_found(self, corpus, result):
        _, truth = corpus
        label = dict(zip(result.clusters["image_id"], result.clusters["cluster_id"]))
        for r in truth[truth["kind"] == "exact"].itertuples():
            assert label[r.id_a] == label[r.id_b]

    def test_survivors_one_per_cluster(self, result):
        surv = result.survivors
        assert surv["cluster_id"].is_unique
        # representative is the minimum member id
        merged = result.clusters.groupby("cluster_id")["image_id"].min()
        assert set(zip(surv["cluster_id"], surv["image_id"])) == set(
            merged.items()
        )

    def test_survivor_row_invariants(self, corpus, result):
        """Per-row invariant (BASELINE.json.input_hint): each surviving row's
        decoded pixels match its source row exactly / PSNR≥40, caption equal —
        trivially true since survivors are source rows; verify decode works
        and exact-dup replacement is pixel-faithful."""
        images, truth = corpus
        by_id = images.set_index("image_id")
        label = dict(zip(result.clusters["image_id"], result.clusters["cluster_id"]))
        rep = dict(zip(result.survivors["cluster_id"], result.survivors["image_id"]))
        # every dropped exact/reencode dup is represented by a row whose
        # decoded pixels are allclose (PSNR≥40 dB for lossy) to its own
        for r in truth[truth["kind"].isin(["exact", "reencode"])].itertuples():
            rep_id = rep[label[r.id_a]]
            for dropped in (r.id_a, r.id_b):
                if dropped == rep_id:
                    continue
                a = codecs.decode_image(
                    by_id.loc[dropped, "bytes"], by_id.loc[dropped, "fmt"]
                )
                b = codecs.decode_image(
                    by_id.loc[rep_id, "bytes"], by_id.loc[rep_id, "fmt"]
                )
                if a.shape == b.shape:
                    assert codecs.psnr(a, b) >= 40.0

    def test_scored_columns(self, result):
        assert {"naive_sim", "adj_sim", "adjust_status", "lambda"} <= set(
            result.scored.columns
        )
        ok = result.scored["adjust_status"].isin(["low", "high", "lambda"])
        assert ok.all()

    def test_permutation_invariance(self, corpus):
        """Clustering is invariant to input row order (property test)."""
        images, _ = corpus
        shuffled = images.sample(frac=1.0, random_state=7).reset_index(drop=True)
        r1 = oracle.run_oracle(images, SketchConfig())
        r2 = oracle.run_oracle(shuffled, SketchConfig())
        c1 = dict(zip(r1.clusters["image_id"], r1.clusters["cluster_id"]))
        c2 = dict(zip(r2.clusters["image_id"], r2.clusters["cluster_id"]))
        assert c1 == c2

    def test_dedup_idempotence(self, corpus):
        """Dedup of the deduped corpus is a no-op (property test)."""
        images, _ = corpus
        r1 = oracle.run_oracle(images, SketchConfig())
        kept = images[images["image_id"].isin(r1.survivors["image_id"])].reset_index(
            drop=True
        )
        r2 = oracle.run_oracle(kept, SketchConfig())
        assert len(r2.survivors) == len(kept)
