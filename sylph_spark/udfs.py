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

from . import codecs
from . import kernels as K
from .config import SketchConfig

SKETCH_SCHEMA = (
    "image_id string, shingles array<long>, n_shingles int, simhash long, "
    "caption string"
)

BAND_SCHEMA = "image_id string, band int, band_hash long"

SCORE_SCHEMA = (
    "id_a string, id_b string, contain_count int, total_kmers int, "
    "naive_sim double, adj_sim double, adjust_status string, lambda double, "
    "median_cov double"
)


def _i64(v: int) -> int:
    return v - (1 << 64) if v >= 1 << 63 else v


def make_sketch_fn(cfg: SketchConfig):
    """mapInPandas: images(image_id, bytes, fmt, caption, ...) → SKETCH_SCHEMA.

    Decode → shingle → FracMinHash select → SimHash, one Arrow batch at a
    time. The per-record decode is payload work (the fastx-parse analog,
    sketch.rs:809-812); the shingle/hash math is vectorized numpy.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, shingle_lists, n_sh, simhashes, captions = [], [], [], [], []
            for r in pdf.itertuples():
                gray = codecs.to_gray(codecs.decode_image(r.bytes, r.fmt))
                img_sh = K.image_shingles(
                    gray, cfg.block_px, cfg.q_shift, cfg.k_block, cfg.c, cfg.n_grids
                )
                cap_sh = K.caption_shingles(r.caption, cfg.k_caption, cfg.c)
                sh = np.union1d(img_sh, cap_sh)
                ids.append(r.image_id)
                shingle_lists.append(K.u64_to_i64(sh).tolist())
                n_sh.append(sh.size)
                simhashes.append(_i64(K.simhash64(sh)))
                captions.append(r.caption)
            yield pd.DataFrame(
                {
                    "image_id": ids,
                    "shingles": shingle_lists,
                    "n_shingles": pd.Series(n_sh, dtype="int32"),
                    "simhash": pd.Series(simhashes, dtype="int64"),
                    "caption": captions,
                }
            )

    return fn


def make_band_fn(cfg: SketchConfig):
    """mapInPandas: sketches → (image_id, band, band_hash) tall rows."""
    seeds = K.minhash_seeds(cfg.num_hashes, cfg.seed)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, bands, hashes = [], [], []
            for r in pdf.itertuples():
                sh = K.i64_to_u64(np.array(r.shingles, dtype=np.int64))
                if sh.size == 0:
                    continue
                sig = K.minhash_signature(sh, seeds)
                bh = K.band_hashes(sig, cfg.num_bands, cfg.rows_per_band)
                bh_i64 = K.u64_to_i64(bh)
                for band in range(cfg.num_bands):
                    ids.append(r.image_id)
                    bands.append(band)
                    hashes.append(int(bh_i64[band]))
            yield pd.DataFrame(
                {
                    "image_id": ids,
                    "band": pd.Series(bands, dtype="int32"),
                    "band_hash": pd.Series(hashes, dtype="int64"),
                }
            )

    return fn


def make_score_fn(cfg: SketchConfig):
    """applyInPandas over (id_a, id_b) groups of intersected-shingle corpus
    counts → one scored row (the E1/E6/E7 chain, contain.rs:601-745)."""

    def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        id_a, id_b = key
        total = int(pdf["total_kmers"].iloc[0])
        covs = pdf["cnt"].to_numpy(dtype=np.int64)
        res = K.score_pair(
            covs, total, cfg.ani_k, cfg.min_count_correct, cfg.estimator
        )
        if res is None:
            return pd.DataFrame(
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
                ]
            )
        return pd.DataFrame(
            [
                {
                    "id_a": id_a,
                    "id_b": id_b,
                    "contain_count": res["contain_count"],
                    "total_kmers": res["total_kmers"],
                    "naive_sim": res["naive_ani"],
                    "adj_sim": res["final_est_ani"],
                    "adjust_status": res["adjust_status"],
                    "lambda": res["lambda"] if res["lambda"] is not None else float("nan"),
                    "median_cov": res["median_cov"],
                }
            ]
        )

    return fn


def make_score_hist_fn(cfg: SketchConfig):
    """mapInPandas over pair rows (id_a, id_b, total_kmers, hist) where hist
    is a list of {cnt, n} structs — the Arrow-batched fast path of the
    E1/E6/E7 scoring chain (one Python call per batch, not per pair)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
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
                        else float("nan"),
                        "median_cov": res["median_cov"],
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
