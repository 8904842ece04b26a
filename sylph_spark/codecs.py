"""Self-contained image codecs (no PIL/cv2 in this environment).

Formats (FIXTURES.md §1):
- ``ppm``  — binary P6, lossless.
- ``bmp``  — 24-bit uncompressed BMP (bottom-up, BGR, 4-byte row pad), lossless.
- ``qpng`` — real minimal PNG (zlib IDAT, filter 0), lossless.
- ``qjpg`` — our quantizing lossy codec (uniform quantization step q + zlib);
  q=5 → PSNR ≈ 45 dB, satisfying the ≥40 dB per-row invariant from
  BASELINE.json.input_hint.

Plus grayscale conversion, the 64-bit average-hash ``phash`` and PSNR.
These run inside Arrow-batched pandas UDFs on executors — pure numpy+stdlib,
importable everywhere.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

QJPG_MAGIC = b"QJPG"
QJPG_DEFAULT_Q = 5


# ---------------------------------------------------------------------------
# PPM (P6)
# ---------------------------------------------------------------------------


def encode_ppm(rgb: np.ndarray) -> bytes:
    h, w, _ = rgb.shape
    return b"P6\n%d %d\n255\n" % (w, h) + rgb.astype(np.uint8).tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 ppm")
    # header: P6 <ws> w <ws> h <ws> 255 <single ws> raw
    parts = data.split(b"\n", 3)
    w, h = (int(x) for x in parts[1].split())
    raw = parts[3]
    return np.frombuffer(raw[: w * h * 3], dtype=np.uint8).reshape(h, w, 3)


# ---------------------------------------------------------------------------
# BMP (24-bit, uncompressed)
# ---------------------------------------------------------------------------


def encode_bmp(rgb: np.ndarray) -> bytes:
    h, w, _ = rgb.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM",
        14 + 40 + img_size,
        0,
        0,
        14 + 40,
        40,
        w,
        h,
        1,
        24,
        0,
        img_size,
        2835,
        2835,
        0,
        0,
    )
    bgr = rgb[:, :, ::-1].astype(np.uint8)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return header + rows[::-1].tobytes()  # bottom-up


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", data, 10)[0]
    w = struct.unpack_from("<i", data, 18)[0]
    h = struct.unpack_from("<i", data, 22)[0]
    bpp = struct.unpack_from("<H", data, 28)[0]
    if bpp != 24:
        raise ValueError("only 24-bit BMP supported")
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=row_size * abs(h), offset=offset)
    rows = rows.reshape(abs(h), row_size)[:, : w * 3]
    img = rows.reshape(abs(h), w, 3)[:, :, ::-1]
    if h > 0:
        img = img[::-1]
    return np.ascontiguousarray(img)


# ---------------------------------------------------------------------------
# Minimal PNG (8-bit RGB, filter 0)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_qpng(rgb: np.ndarray) -> bytes:
    h, w, _ = rgb.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 1:] = rgb.reshape(h, w * 3)  # filter byte 0 per row
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_qpng(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack_from(">IIBB", body, 0)
            if depth != 8 or ctype != 2:
                raise ValueError("only 8-bit RGB PNG supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + w * 3)
    filters = raw[:, 0]
    if (filters != 0).any():
        raise ValueError("only filter 0 supported")
    return np.ascontiguousarray(raw[:, 1:].reshape(h, w, 3))


# ---------------------------------------------------------------------------
# QJPG — deterministic lossy codec (uniform quantization + zlib)
# ---------------------------------------------------------------------------


def encode_qjpg(rgb: np.ndarray, q: int = QJPG_DEFAULT_Q) -> bytes:
    h, w, _ = rgb.shape
    quant = np.round(rgb.astype(np.float64) / q).astype(np.uint8)
    payload = zlib.compress(quant.tobytes(), 6)
    return QJPG_MAGIC + struct.pack("<IIB", w, h, q) + payload


def decode_qjpg(data: bytes) -> np.ndarray:
    if data[:4] != QJPG_MAGIC:
        raise ValueError("not a QJPG")
    w, h, q = struct.unpack_from("<IIB", data, 4)
    quant = np.frombuffer(zlib.decompress(data[13:]), dtype=np.uint8)
    # int16 suffices (255·q < 32768) — 4× less memory traffic than int64;
    # values are integer-identical
    return (
        np.clip(quant.reshape(h, w, 3).astype(np.int16) * np.int16(q), 0, 255)
        .astype(np.uint8)
    )


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

LOSSLESS_FMTS = {"ppm", "bmp", "qpng"}
LOSSY_FMTS = {"qjpg"}
ALL_FMTS = LOSSLESS_FMTS | LOSSY_FMTS

_ENCODERS = {
    "ppm": encode_ppm,
    "bmp": encode_bmp,
    "qpng": encode_qpng,
    "qjpg": encode_qjpg,
}
_DECODERS = {
    "ppm": decode_ppm,
    "bmp": decode_bmp,
    "qpng": decode_qpng,
    "qjpg": decode_qjpg,
}


def encode_image(rgb: np.ndarray, fmt: str) -> bytes:
    return _ENCODERS[fmt](rgb)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Decode to (h, w, 3) uint8. The graft analog of the fastx scan
    (/root/reference/src/sketch.rs:488,780-781): payload bytes → records."""
    return _DECODERS[fmt](data)


# ---------------------------------------------------------------------------
# Derived features
# ---------------------------------------------------------------------------


_LUMA = np.array([0.299, 0.587, 0.114], dtype=np.float32)


def to_gray(rgb: np.ndarray) -> np.ndarray:
    """ITU-R 601 luma in [0,255]. float32 single-pass matmul: the sketch
    kernels are DRAM-bandwidth-bound on big batches (measured: the 64-px→
    256-px jump stopped scaling past ~8 cores on one host), so halving the
    element width + one fused pass matters more than the <1e-4 luma ULP
    difference (quantization downstream uses 32-unit bins)."""
    h, w, _ = rgb.shape
    return (rgb.reshape(-1, 3).astype(np.float32) @ _LUMA).reshape(h, w)


def average_phash(gray: np.ndarray) -> int:
    """64-bit average-hash over an 8×8 downsample (FIXTURES.md: DCT-free).

    Returns a signed int64 (two's-complement of the u64 bit pattern), the
    layout used for the ``phash`` bigint column.
    """
    h, w = gray.shape
    bh, bw = max(h // 8, 1), max(w // 8, 1)
    cells = gray[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (cells > cells.mean()).ravel()
    val = 0
    for i, b in enumerate(bits):
        if b:
            val |= 1 << i
    if val >= 1 << 63:
        val -= 1 << 64
    return val


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float((diff * diff).mean())
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
