"""Multimodal column operators: decode / feature-extract / resize /
frame-sample over opaque binary columns with typed metadata.

The Spark-side plumbing (schemas, Arrow batching, partitioning) is real and
tested; payload decoding uses the self-contained codecs for the formats this
repo defines, and STUBS (clearly marked) for external codec libraries
(PIL/cv2/ffmpeg are not in this container). The stub boundary is
``_decode_external`` — swap in a real decoder there and everything else
works unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame

from .. import codecs

IMAGE_FEATURES_SCHEMA = (
    "image_id string, w int, h int, mean_lum double, std_lum double, "
    "phash long, decode_ok boolean"
)

FRAME_SAMPLE_SCHEMA = (
    "media_id string, frame_idx int, frame_bytes binary, w int, h int"
)


def _decode_external(data: bytes, fmt: str) -> np.ndarray:
    """STUB: external-codec decode (jpeg/png/webp/...). This container has no
    image libraries; deployments plug PIL/cv2/turbojpeg in here."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            f"external codec for fmt={fmt!r} requires PIL/cv2 (not installed); "
            "formats handled natively: " + ", ".join(sorted(codecs.ALL_FMTS))
        )
    raise NotImplementedError("PIL path not wired in this environment")


def decode_any(data: bytes, fmt: str) -> np.ndarray:
    if fmt in codecs.ALL_FMTS:
        return codecs.decode_image(data, fmt)
    return _decode_external(data, fmt)


def resize_nearest(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (pure numpy)."""
    ys = (np.arange(h) * img.shape[0] // h).astype(np.int64)
    xs = (np.arange(w) * img.shape[1] // w).astype(np.int64)
    return img[ys][:, xs]


def image_features(images: DataFrame) -> DataFrame:
    """Decode + per-image luminance stats + recomputed phash, Arrow-batched.
    Rows whose format can't be decoded natively are flagged, not dropped."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            get = lambda name: batch.column(batch.schema.get_field_index(name))
            ids = get("image_id").to_pylist()
            blobs = get("bytes").to_pylist()
            fmts = get("fmt").to_pylist()
            n = len(ids)
            ws = np.zeros(n, np.int32)
            hs = np.zeros(n, np.int32)
            means = np.zeros(n, np.float64)
            stds = np.zeros(n, np.float64)
            phs = np.zeros(n, np.int64)
            oks = np.zeros(n, bool)
            for i in range(n):
                try:
                    img = decode_any(blobs[i], fmts[i])
                except NotImplementedError:
                    continue
                gray = codecs.to_gray(img)
                hs[i], ws[i] = img.shape[0], img.shape[1]
                means[i] = gray.mean()
                stds[i] = gray.std()
                phs[i] = codecs.average_phash(gray)
                oks[i] = True
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.string()),
                    pa.array(ws),
                    pa.array(hs),
                    pa.array(means),
                    pa.array(stds),
                    pa.array(phs),
                    pa.array(oks),
                ],
                names=[
                    "image_id",
                    "w",
                    "h",
                    "mean_lum",
                    "std_lum",
                    "phash",
                    "decode_ok",
                ],
            )

    return images.select("image_id", "bytes", "fmt").mapInArrow(
        fn, schema=IMAGE_FEATURES_SCHEMA
    )


def frame_sample(media: DataFrame, every_n: int = 10, max_frames: int = 8) -> DataFrame:
    """Video frame sampling plumbing. The container format this repo defines
    for tests is ``rawvid``: a concatenation of qpng-encoded frames with a
    4-byte big-endian length prefix each — real demux, real sampling. Other
    containers (mp4 etc.) hit the external-codec stub."""
    import struct

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            get = lambda name: batch.column(batch.schema.get_field_index(name))
            ids = get("media_id").to_pylist()
            blobs = get("bytes").to_pylist()
            fmts = get("fmt").to_pylist()
            out_id, out_idx, out_b, out_w, out_h = [], [], [], [], []
            for mid, blob, fmt in zip(ids, blobs, fmts):
                if fmt != "rawvid":
                    raise NotImplementedError(
                        f"container {fmt!r} needs ffmpeg (not installed)"
                    )
                pos = 0
                frame_idx = 0
                emitted = 0
                while pos + 4 <= len(blob) and emitted < max_frames:
                    (ln,) = struct.unpack_from(">I", blob, pos)
                    frame = blob[pos + 4 : pos + 4 + ln]
                    pos += 4 + ln
                    if frame_idx % every_n == 0:
                        img = codecs.decode_qpng(frame)
                        out_id.append(mid)
                        out_idx.append(frame_idx)
                        out_b.append(frame)
                        out_h.append(img.shape[0])
                        out_w.append(img.shape[1])
                        emitted += 1
                    frame_idx += 1
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_id, pa.string()),
                    pa.array(np.array(out_idx, np.int32)),
                    pa.array(out_b, pa.binary()),
                    pa.array(np.array(out_w, np.int32)),
                    pa.array(np.array(out_h, np.int32)),
                ],
                names=["media_id", "frame_idx", "frame_bytes", "w", "h"],
            )

    return media.select("media_id", "bytes", "fmt").mapInArrow(
        fn, schema=FRAME_SAMPLE_SCHEMA
    )
