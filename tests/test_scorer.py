"""Vectorized scorer ≡ per-pair kernel loop.

The fast path of udfs.make_score_arrow_fn re-expresses the whole
score_pair chain (coverage stats contain.rs:655-690, regime switch
contain.rs:692-713, ratio λ inference.rs:207-242, zero-truncation ANI
contain.rs:817-847) as whole-batch numpy. These tests pit it against the
per-pair kernel loop on adversarial coverage vectors spanning every regime.
"""

import numpy as np
import pyarrow as pa
import pytest

from sylph_spark import udfs
from sylph_spark.config import SketchConfig


def _mk_batch(pairs, with_lost=False):
    ids_a = [f"a{i:05d}" for i in range(len(pairs))]
    ids_b = [f"b{i:05d}" for i in range(len(pairs))]
    covs = [list(map(int, c)) for c, _ in pairs]
    totals = [int(t) for _, t in pairs]
    arrays = [
        pa.array(ids_a, pa.string()),
        pa.array(ids_b, pa.string()),
        pa.array(totals, pa.int32()),
        pa.array(covs, pa.list_(pa.int32())),
    ]
    names = ["id_a", "id_b", "total_kmers", "covs"]
    if with_lost:
        arrays.append(pa.array([i % 7 for i in range(len(pairs))], pa.int32()))
        names.append("kmers_lost")
    return pa.RecordBatch.from_arrays(arrays, names=names)


def _run(fn, batch):
    out = list(fn(iter([batch])))
    assert len(out) == 1
    return out[0].to_pandas()


def _regime_pairs(rng, n=400):
    """Coverage vectors covering every branch of the scoring chain."""
    pairs = []
    for i in range(n):
        kind = i % 8
        if kind == 0:  # λ regime: Poisson(1.2)-ish nonzero multiset, big n
            c = rng.poisson(1.2, size=rng.integers(30, 120)) + 1
        elif kind == 1:  # high regime: median > 2
            c = rng.poisson(6.0, size=rng.integers(10, 80)) + 1
        elif kind == 2:  # low: too few samples for λ
            c = rng.integers(1, 3, size=rng.integers(1, 20))
        elif kind == 3:  # low: single distinct value
            c = np.full(rng.integers(26, 60), rng.integers(1, 3))
        elif kind == 4:  # tail cut: small median + huge outliers
            c = np.concatenate(
                [
                    rng.poisson(1.0, size=rng.integers(40, 90)) + 1,
                    rng.integers(50, 300, size=rng.integers(1, 6)),
                ]
            )
        elif kind == 5:  # empty coverage → dropped by both paths
            c = np.empty(0, dtype=np.int64)
        elif kind == 6:  # mode at the top value (no mode+1 present)
            c = np.concatenate([np.full(40, 2), np.full(10, 1)])
        else:  # guard: count(mode+1) below min_count_correct
            c = np.concatenate([np.full(40, 1), np.full(2, 2)])
        total = int(max(c.size, 1) + rng.integers(0, 50))
        pairs.append((np.asarray(c, dtype=np.int64), total))
    return pairs


@pytest.mark.parametrize("with_lost", [False, True])
def test_fast_matches_slow(with_lost):
    rng = np.random.default_rng(1234)
    cfg = SketchConfig()
    batch = _mk_batch(_regime_pairs(rng), with_lost=with_lost)
    fast = _run(udfs.make_score_arrow_fn(cfg), batch)
    slow = _run(udfs.make_score_arrow_fn(cfg, force_slow=True), batch)
    assert list(fast.columns) == list(slow.columns)
    assert len(fast) == len(slow)
    f = fast.sort_values("id_a").reset_index(drop=True)
    s = slow.sort_values("id_a").reset_index(drop=True)
    for col in ("id_a", "id_b", "adjust_status"):
        assert f[col].tolist() == s[col].tolist(), col
    for col in ("contain_count", "total_kmers", "kmers_lost"):
        assert (f[col].to_numpy() == s[col].to_numpy()).all(), col
    for col in ("naive_sim", "adj_sim", "lambda", "median_cov"):
        np.testing.assert_allclose(
            f[col].to_numpy(), s[col].to_numpy(), rtol=1e-12, err_msg=col
        )


def test_fast_covers_all_statuses():
    """The regime fixture must actually exercise high/low/lambda + drops —
    otherwise the parity test is vacuous."""
    rng = np.random.default_rng(1234)
    cfg = SketchConfig()
    batch = _mk_batch(_regime_pairs(rng))
    fast = _run(udfs.make_score_arrow_fn(cfg), batch)
    assert set(fast["adjust_status"]) == {"high", "low", "lambda"}
    assert len(fast) < batch.num_rows  # empty-coverage rows dropped


def test_empty_batch():
    cfg = SketchConfig()
    batch = _mk_batch([])
    fast = _run(udfs.make_score_arrow_fn(cfg), batch)
    assert len(fast) == 0
    assert list(fast.columns) == [f.name for f in udfs.SCORE_PA_SCHEMA]


def test_fast_speedup():
    """VERDICT r2 #3: the vectorized scorer must beat the per-pair loop by
    a wide margin (≥5× pairs/sec) on a realistic batch."""
    import time

    rng = np.random.default_rng(7)
    cfg = SketchConfig()
    pairs = _regime_pairs(rng, n=4000)
    batch = _mk_batch(pairs)
    fast_fn = udfs.make_score_arrow_fn(cfg)
    slow_fn = udfs.make_score_arrow_fn(cfg, force_slow=True)
    _run(fast_fn, batch)  # warm caches (poisson cdf, jit-free but allocs)
    t0 = time.perf_counter()
    _run(fast_fn, batch)
    t_fast = time.perf_counter() - t0
    t0 = time.perf_counter()
    _run(slow_fn, batch)
    t_slow = time.perf_counter() - t0
    assert t_slow / t_fast >= 5.0, (t_fast, t_slow)


def _assert_parity(fast, slow, float_cols):
    assert list(fast.columns) == list(slow.columns)
    assert len(fast) == len(slow)
    f = fast.sort_values("id_a").reset_index(drop=True)
    s = slow.sort_values("id_a").reset_index(drop=True)
    for col in ("id_a", "id_b", "adjust_status"):
        assert f[col].tolist() == s[col].tolist(), col
    for col in ("contain_count", "total_kmers", "kmers_lost"):
        assert (f[col].to_numpy() == s[col].to_numpy()).all(), col
    for col in float_cols:
        np.testing.assert_allclose(
            f[col].to_numpy(), s[col].to_numpy(), rtol=1e-12, err_msg=col
        )


FLOAT_COLS = ("naive_sim", "adj_sim", "lambda", "median_cov")
CI_COLS = ("ani_lo", "ani_hi", "lambda_lo", "lambda_hi")


@pytest.mark.parametrize("estimator", ["ratio", "mme"])
def test_bootstrap_fast_matches_slow(estimator):
    """VERDICT r3 #2: the tensorized bootstrap-CI path must reproduce the
    per-pair seeded loop exactly (same RNG stream, same quantile picks),
    for both fast-path estimators."""
    rng = np.random.default_rng(99)
    cfg = SketchConfig(estimator=estimator, bootstrap_iters=100)
    batch = _mk_batch(_regime_pairs(rng, n=120))
    fast = _run(udfs.make_score_arrow_fn(cfg), batch)
    slow = _run(udfs.make_score_arrow_fn(cfg, force_slow=True), batch)
    _assert_parity(fast, slow, FLOAT_COLS + CI_COLS)
    # the fixture must actually produce some non-NaN CIs
    assert np.isfinite(fast["ani_lo"].to_numpy()).sum() > 10


def test_mme_fast_matches_slow():
    """The mme estimator point path (folded into the fast scorer, VERDICT
    r3 #2) matches kernels.mme_lambda via the loop."""
    rng = np.random.default_rng(321)
    cfg = SketchConfig(estimator="mme")
    batch = _mk_batch(_regime_pairs(rng))
    fast = _run(udfs.make_score_arrow_fn(cfg), batch)
    slow = _run(udfs.make_score_arrow_fn(cfg, force_slow=True), batch)
    _assert_parity(fast, slow, FLOAT_COLS)
    assert set(fast["adjust_status"]) >= {"high", "lambda"}


def test_bootstrap_chunking_invariant():
    """CI results must not depend on the element-budget chunk boundary."""
    rng = np.random.default_rng(5)
    cfg = SketchConfig(bootstrap_iters=100)
    batch = _mk_batch(_regime_pairs(rng, n=60))
    big = _run(udfs.make_score_arrow_fn(cfg), batch)

    import sylph_spark.udfs as U

    orig = U._bootstrap_ci_rows

    def tiny_budget(*args, **kwargs):
        kwargs["elem_budget"] = 1  # flush after every pair
        return orig(*args, **kwargs)

    U._bootstrap_ci_rows = tiny_budget
    try:
        small = _run(udfs.make_score_arrow_fn(cfg), batch)
    finally:
        U._bootstrap_ci_rows = orig
    for col in CI_COLS:
        np.testing.assert_allclose(
            big[col].to_numpy(), small[col].to_numpy(), rtol=0, atol=0
        )


def test_bootstrap_fast_speedup():
    """VERDICT r3 #2 done-criterion: ≥5× pairs/s over the per-pair loop
    with bootstrap_iters=100."""
    import time

    rng = np.random.default_rng(11)
    cfg = SketchConfig(bootstrap_iters=100)
    batch = _mk_batch(_regime_pairs(rng, n=300))
    fast_fn = udfs.make_score_arrow_fn(cfg)
    slow_fn = udfs.make_score_arrow_fn(cfg, force_slow=True)
    _run(fast_fn, batch)  # warm
    t0 = time.perf_counter()
    _run(fast_fn, batch)
    t_fast = time.perf_counter() - t0
    t0 = time.perf_counter()
    _run(slow_fn, batch)
    t_slow = time.perf_counter() - t0
    assert t_slow / t_fast >= 5.0, (t_fast, t_slow)
