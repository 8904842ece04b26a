"""Arrow-vectorized UDFs wrapping the numpy kernels (SURVEY.md §2.9).

Everything crosses the JVM↔Python boundary in Arrow batches (mapInPandas /
applyInPandas / pandas_udf) — the Spark analog of the reference's AVX2 batch
seeding (/root/reference/src/avx2_seeding.rs:33-148). No row-at-a-time
Python UDFs anywhere.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa

from . import codecs
from . import kernels as K
from .config import SketchConfig

SKETCH_SCHEMA = (
    "image_id string, shingles array<long>, img_shingles array<long>, "
    "cap_shingles array<long>, n_shingles int, simhash long, caption string"
)

BAND_SCHEMA = "image_id string, band int, band_hash long"

SCORE_SCHEMA = (
    "id_a string, id_b string, contain_count int, total_kmers int, "
    "naive_sim double, adj_sim double, adjust_status string, lambda double, "
    "median_cov double, kmers_lost int, "
    "ani_lo double, ani_hi double, lambda_lo double, lambda_hi double"
)


def _i64(v: int) -> int:
    return v - (1 << 64) if v >= 1 << 63 else v


def make_sketch_arrow_fn(cfg: SketchConfig):
    """mapInArrow variant of the sketch stage: builds the shingle ListArray
    directly from numpy offsets+values — no per-element Python boxing.
    ~20× less serialization overhead than the pandas path on wide batches."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            tbl = batch if isinstance(batch, pa.RecordBatch) else batch
            ids = tbl.column(tbl.schema.get_field_index("image_id")).to_pylist()
            bys = tbl.column(tbl.schema.get_field_index("bytes")).to_pylist()
            fmts = tbl.column(tbl.schema.get_field_index("fmt")).to_pylist()
            caps = tbl.column(tbl.schema.get_field_index("caption")).to_pylist()
            n = len(ids)
            chunks, img_chunks, cap_chunks = [], [], []
            offsets = np.zeros(n + 1, dtype=np.int32)
            img_offsets = np.zeros(n + 1, dtype=np.int32)
            cap_offsets = np.zeros(n + 1, dtype=np.int32)
            n_sh = np.zeros(n, dtype=np.int32)
            sims = np.zeros(n, dtype=np.int64)
            for i in range(n):
                gray = codecs.to_gray(codecs.decode_image(bys[i], fmts[i]))
                img_sh = K.image_shingles(
                    gray, cfg.block_px, cfg.q_shift, cfg.k_block, cfg.c, cfg.n_grids
                )
                cap_sh = K.caption_shingles(caps[i], cfg.k_caption, cfg.c)
                sh = np.union1d(img_sh, cap_sh)
                chunks.append(K.u64_to_i64(sh))
                img_chunks.append(K.u64_to_i64(img_sh))
                cap_chunks.append(K.u64_to_i64(cap_sh))
                offsets[i + 1] = offsets[i] + sh.size
                img_offsets[i + 1] = img_offsets[i] + img_sh.size
                cap_offsets[i + 1] = cap_offsets[i] + cap_sh.size
                n_sh[i] = sh.size
                sims[i] = _i64(K.simhash64(sh))

            def list_arr(offs, chks):
                vals = np.concatenate(chks) if chks else np.empty(0, dtype=np.int64)
                return pa.ListArray.from_arrays(
                    pa.array(offs, pa.int32()), pa.array(vals, pa.int64())
                )

            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.string()),
                    list_arr(offsets, chunks),
                    list_arr(img_offsets, img_chunks),
                    list_arr(cap_offsets, cap_chunks),
                    pa.array(n_sh, pa.int32()),
                    pa.array(sims, pa.int64()),
                    pa.array(caps, pa.string()),
                ],
                names=[
                    "image_id",
                    "shingles",
                    "img_shingles",
                    "cap_shingles",
                    "n_shingles",
                    "simhash",
                    "caption",
                ],
            )

    return fn


def make_band_fn(
    cfg: SketchConfig,
    band_offset: int = 0,
    num_bands: int | None = None,
    rows_per_band: int | None = None,
):
    """mapInArrow: (image_id, shingles) → (image_id, band, band_hash) tall
    rows, built with numpy repeat/tile (no per-row Python).

    ``band_offset`` namespaces LSH families (source-aware banding): the
    combined set bands wide/shallow; the image-only and caption-only
    families band narrow/deep — each family only needs to catch pairs
    near-identical in that modality."""
    nb = num_bands or cfg.num_bands
    rpb = rows_per_band or cfg.rows_per_band
    seeds = K.minhash_seeds(nb * rpb, cfg.seed)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            idx_id = batch.schema.get_field_index("image_id")
            idx_sh = batch.schema.get_field_index("shingles")
            ids = batch.column(idx_id).to_pylist()
            sh_lists = batch.column(idx_sh).to_pylist()
            keep_ids = []
            hash_chunks = []
            for iid, lst in zip(ids, sh_lists):
                sh = K.i64_to_u64(np.asarray(lst, dtype=np.int64))
                if sh.size == 0:
                    continue
                sig = K.minhash_signature(sh, seeds)
                bh = K.band_hashes(sig, nb, rpb)
                keep_ids.append(iid)
                hash_chunks.append(K.u64_to_i64(bh))
            m = len(keep_ids)
            if m == 0:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array([], pa.string()),
                        pa.array([], pa.int32()),
                        pa.array([], pa.int64()),
                    ],
                    names=["image_id", "band", "band_hash"],
                )
                continue
            ids_rep = np.repeat(np.array(keep_ids, dtype=object), nb)
            bands = np.tile(
                np.arange(band_offset, band_offset + nb, dtype=np.int32), m
            )
            hashes = np.concatenate(hash_chunks)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids_rep, pa.string()),
                    pa.array(bands, pa.int32()),
                    pa.array(hashes, pa.int64()),
                ],
                names=["image_id", "band", "band_hash"],
            )

    return fn


def make_multi_band_fn(cfg: SketchConfig, rare_sorted_i64: np.ndarray):
    """mapInArrow: sketches(image_id, img_shingles, cap_shingles) → band rows
    for ALL THREE LSH families in one pass, filtering stop-shingles against a
    broadcast sorted rare-set (np.searchsorted membership) — zero shuffles
    until the bucket join. Used when the rare set fits in a task closure;
    the join-based path handles the 10¹²-scale case."""
    families = (
        (0, cfg.num_bands, cfg.rows_per_band),
        (cfg.num_bands, cfg.family_bands, cfg.family_rows),
        (cfg.num_bands + cfg.family_bands, cfg.family_bands, cfg.family_rows),
    )
    seeds_by_n = {
        nb * rpb: K.minhash_seeds(nb * rpb, cfg.seed) for _, nb, rpb in families
    }
    rare = rare_sorted_i64

    def keep_rare(arr_i64: np.ndarray) -> np.ndarray:
        if arr_i64.size == 0:
            return arr_i64
        idx = np.searchsorted(rare, arr_i64)
        idx_c = np.clip(idx, 0, rare.size - 1)
        mask = (idx < rare.size) & (rare[idx_c] == arr_i64)
        return arr_i64[mask]

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            get = lambda name: batch.column(batch.schema.get_field_index(name))
            ids = get("image_id").to_pylist()
            img_lists = get("img_shingles").to_pylist()
            cap_lists = get("cap_shingles").to_pylist()
            out_ids, out_bands, out_hashes = [], [], []
            for iid, img_l, cap_l in zip(ids, img_lists, cap_lists):
                img = keep_rare(np.asarray(img_l, dtype=np.int64))
                cap = keep_rare(np.asarray(cap_l, dtype=np.int64))
                combined = np.concatenate([img, cap])
                for (offset, nb, rpb), sh_i64 in zip(
                    families, (combined, img, cap)
                ):
                    if sh_i64.size == 0:
                        continue
                    sh = K.i64_to_u64(sh_i64)
                    sig = K.minhash_signature(sh, seeds_by_n[nb * rpb])
                    bh = K.band_hashes(sig, nb, rpb)
                    out_ids.extend([iid] * nb)
                    out_bands.append(
                        np.arange(offset, offset + nb, dtype=np.int32)
                    )
                    out_hashes.append(K.u64_to_i64(bh))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_ids, pa.string()),
                    pa.array(
                        np.concatenate(out_bands)
                        if out_bands
                        else np.empty(0, np.int32)
                    ),
                    pa.array(
                        np.concatenate(out_hashes)
                        if out_hashes
                        else np.empty(0, np.int64)
                    ),
                ],
                names=["image_id", "band", "band_hash"],
            )

    return fn


def make_score_hist_fn(cfg: SketchConfig):
    """mapInPandas over pair rows (id_a, id_b, total_kmers, hist[, kmers_lost])
    where hist is a list of {cnt, n} structs — the Arrow-batched fast path of
    the E1/E6/E7 scoring chain (one Python call per batch, not per pair).

    ``kmers_lost`` (winner-table reassignment count, contain.rs:641) is
    passed through when present (rescore pass), 0 otherwise. With
    cfg.bootstrap_iters > 0 the seeded bootstrap CI (contain.rs:849-898)
    is computed per pair; the CI columns are NaN when disabled."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        nan = float("nan")
        for pdf in batches:
            has_lost = "kmers_lost" in pdf.columns
            out = []
            for r in pdf.itertuples():
                h = r.hist
                cnts = np.array([e["cnt"] for e in h], dtype=np.int64)
                ns = np.array([e["n"] for e in h], dtype=np.int64)
                covs = np.repeat(cnts, ns)
                res = K.score_pair(
                    covs,
                    int(r.total_kmers),
                    cfg.ani_k,
                    cfg.min_count_correct,
                    cfg.estimator,
                )
                if res is None:
                    continue
                ci = (None, None, None, None)
                if cfg.bootstrap_iters > 0:
                    ci = K.bootstrap_interval(
                        res["full_covs"],
                        cfg.ani_k,
                        cfg.min_count_correct,
                        iters=cfg.bootstrap_iters,
                        seed=cfg.bootstrap_seed,
                        estimator=cfg.estimator,
                    )
                out.append(
                    {
                        "id_a": r.id_a,
                        "id_b": r.id_b,
                        "contain_count": res["contain_count"],
                        "total_kmers": res["total_kmers"],
                        "naive_sim": res["naive_ani"],
                        "adj_sim": res["final_est_ani"],
                        "adjust_status": res["adjust_status"],
                        "lambda": res["lambda"]
                        if res["lambda"] is not None
                        else nan,
                        "median_cov": res["median_cov"],
                        "kmers_lost": int(r.kmers_lost) if has_lost else 0,
                        "ani_lo": ci[0] if ci[0] is not None else nan,
                        "ani_hi": ci[1] if ci[1] is not None else nan,
                        "lambda_lo": ci[2] if ci[2] is not None else nan,
                        "lambda_hi": ci[3] if ci[3] is not None else nan,
                    }
                )
            df = pd.DataFrame(
                out,
                columns=[
                    "id_a",
                    "id_b",
                    "contain_count",
                    "total_kmers",
                    "naive_sim",
                    "adj_sim",
                    "adjust_status",
                    "lambda",
                    "median_cov",
                    "kmers_lost",
                    "ani_lo",
                    "ani_hi",
                    "lambda_lo",
                    "lambda_hi",
                ],
            )
            yield df.astype(
                {
                    "contain_count": "int32",
                    "total_kmers": "int32",
                    "naive_sim": "float64",
                    "adj_sim": "float64",
                    "lambda": "float64",
                    "median_cov": "float64",
                    "kmers_lost": "int32",
                    "ani_lo": "float64",
                    "ani_hi": "float64",
                    "lambda_lo": "float64",
                    "lambda_hi": "float64",
                }
            )

    return fn


def make_lcs_fn():
    """pandas_udf batch: (caption_a, caption_b) → longest common substring
    length via suffix array + Kasai (kernels.longest_common_substring)."""

    def fn(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [K.longest_common_substring(x or "", y or "") for x, y in zip(a, b)],
            dtype="int64",
        )

    return fn
