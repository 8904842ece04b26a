"""Pipeline configuration — the graft analog of sylph's CLI parameter set
(/root/reference/src/cmdline.rs:57-95). Compatibility between sketches and
queries is enforced by parameter equality, mirroring the k/c checks at
contain.rs:608-623: stages assert their input tables carry the same config
hash before proceeding.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class SketchConfig:
    # FracMinHash scale factor (sylph -c, cmdline.rs:59-60; default 200 for
    # genomes). Items here have O(10²) shingles, not O(10⁶) k-mers, so the
    # default keeps more: c=2 halves the shingle set. At 10^12-image scale
    # raise c to shrink sketches linearly.
    c: int = 2
    # caption character-shingle length (sylph -k; ≤8 so a shingle packs in u64)
    k_caption: int = 6
    # image block grid: block size in px (0 = adaptive ~8×8 blocks per
    # image), quantization shift, rolling window
    block_px: int = 0
    q_shift: int = 5
    k_block: int = 3
    n_grids: int = 3
    # MinHash/LSH (graft: replaces sylph's all-pairs loop contain.rs:266-292).
    # Three LSH families: the COMBINED shingle set uses wide/shallow bands
    # (num_bands × rows_per_band) to catch cross-modal partial similarity;
    # the per-modality families (image-only, caption-only) use narrow/deep
    # bands (family_bands × family_rows) because with source-aware banding
    # each family only needs to catch pairs near-identical in that modality
    # — every dup class is near-identical in at least one family.
    num_bands: int = 15
    rows_per_band: int = 4
    family_bands: int = 6
    family_rows: int = 8
    # similarity threshold on the corrected containment score (analog of
    # --minimum-ani, constants.rs:10-11)
    tau: float = 0.52
    # exponent root for containment → similarity (sylph k in ANI = idx^{1/k};
    # ani_k=1 reports raw containment as the similarity score)
    ani_k: float = 1.0
    # verification stage
    simhash_max_hamming: int = 26
    lcs_min_len: int = 8
    lcs_min_frac: float = 0.25
    # scoring prefilter: candidate pairs whose raw intersection fraction
    # is below this never reach the estimator chain (JVM-side filter; the
    # analog of sylph's min-ANI cut contain.rs:746-764 applied early).
    # Kept well under tau so λ-boosted pairs (adj = naive/(1-e^-λ)) survive.
    score_min_contain: float = 0.25
    # λ estimation guards (constants.rs:4, cmdline.rs:94-95)
    min_count_correct: float = 3.0
    estimator: str = "ratio"
    # two-pass winner-table rescoring (contain.rs:410-459 winner table,
    # consumed at contain.rs:637-645; derep at contain.rs:353-375): each
    # shingle is owned by the highest-scoring first-pass item containing it;
    # pairs are rescored on the shingles they still own (kmers_lost tracks
    # the reassigned ones) and dropped when reassignment exceeds
    # tau^ani_k · total_kmers. False = single-pass ablation.
    winner_rescore: bool = True
    # bootstrap CI resamples per scored pair (contain.rs:849-898; reference
    # uses 100 with --ci). 0 = off (CI columns emitted as NaN) — it is a
    # per-pair 100× resampling cost, so off by default at scale.
    bootstrap_iters: int = 0
    bootstrap_seed: int = 7
    # stop-shingle masking for banding (corpus analog of sylph's repeat
    # masking, sketch.rs:590-600): shingles with document frequency above
    # max(band_max_df_min, band_max_df_frac·n_items) are excluded from
    # MinHash banding (but still scored) — boilerplate/template shingles
    # otherwise create dense LSH buckets and quadratic candidate growth
    band_max_df_min: int = 32
    band_max_df_frac: float = 0.02
    # optional absolute cap on the informative-shingle df (None = disabled,
    # the default). A FIXED cap does not survive corpus growth: the 960k
    # recall audit (BENCH/scaling_notes.md) showed that with abs=1024 the
    # informative vocabulary stops scaling with n — 0.5% of items lose
    # EVERY combined-family shingle to masking (8-9% per modality), become
    # unbandable, and dup-pair recall decays 0.9912@480k → 0.9815@960k
    # (every missed exact pair had two zero-informative members). The
    # scale-invariant limit is the RELATIVE one (band_max_df_frac·n: a df
    # FRACTION is stationary as a stationary corpus grows); dense-bucket
    # cost is bounded by bucket_degrade_size below instead of by starving
    # the banding input.
    band_max_df_abs: int | None = None
    # buckets larger than this switch from full chunked all-pairs to banded
    # tri-diagonal chunk pairing (each pair_chunk-sized chunk pairs with
    # itself and its successor chunk in bucket-sorted id order): candidate
    # volume from a bucket of size s drops from s²/2 to ~1.5·pair_chunk·s
    # (linear in s), while every member keeps ≥ pair_chunk neighbors, so a
    # degenerate boilerplate bucket still clusters via CC chaining. At the
    # default (2048·2047/2 ≈ 2.1M pairs) quadratic and degraded volume
    # cross over — below it exact pairing is cheaper anyway.
    #
    # MEMORY BOUND (not just pair volume): one bucket's id list materializes
    # as a single collect_list/sort_array row in ONE aggregation task, and
    # with the relative df limit a bucket can in principle reach
    # band_max_df_frac·n ids (~2M ids ≈ 30 MB at n=100M — fine; ~20M ids at
    # n=1B — budget executor memory for it, or set band_max_df_abs to a
    # deployment-sized cap / pre-split the band_hash key above a size
    # threshold before the collect_list if corpora that far beyond the
    # audited 960k are expected).
    bucket_degrade_size: int = 2048
    # banding rare-set strategy: when the stop-shingle-filtered vocabulary
    # is at most this many entries it is broadcast into the band UDF
    # (zero-shuffle banding); larger vocabularies use the join path
    broadcast_rare_max: int = 5_000_000
    # LSH skew handling: bucket pair generation is UNCONDITIONALLY chunked —
    # every bucket of size s fans out over ceil(s/pair_chunk)² (ci,cj) tasks
    # (pipeline._stage_candidates), so a hot bucket never lands on one task.
    # Small buckets get nchunks=1 and pay only a no-op sequence explode.
    pair_chunk: int = 256
    seed: int = 42

    @property
    def num_hashes(self) -> int:
        return self.num_bands * self.rows_per_band

    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)

    def config_hash(self) -> str:
        return hashlib.sha256(self.to_json().encode()).hexdigest()[:16]

    @staticmethod
    def from_json(s: str) -> "SketchConfig":
        return SketchConfig(**json.loads(s))


DEFAULT_CONFIG = SketchConfig()
