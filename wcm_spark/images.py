"""Image payload codecs, fidelity metrics, perceptual hash (numpy-only).

The north rule (BASELINE.json:14-15) requires fetched image+caption pairs
persisted with decoded-pixel fidelity: PSNR >= 40 dB for lossy formats,
bit-exact for lossless, plus caption equality. This container has no image
libraries (no Pillow), so the engine ships two deterministic container
formats of its own and gates real-codec decode behind an import-try:

- ``wclz`` — lossless: raw RGB8 + zlib. Bit-exact round trip.
- ``wcq6`` — lossy: 6-bit/channel quantization + zlib. Quantization step 4
  gives RMSE ~= sqrt((4^2-1)/12) ~= 1.12 => PSNR ~= 47 dB, comfortably
  above the 40 dB gate.

Real-world formats (PNG/JPEG) decode via Pillow when present; otherwise
``decode_image`` raises NotImplementedError for them — the Spark-side
plumbing (schema, batching, UDF signatures) is identical either way.

All functions operate on uint8 HxWx3 numpy arrays and are vectorizable
inside mapInPandas batches (operators/imagesink.py).
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np

try:  # optional real-codec path
    from PIL import Image as _PILImage  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

__all__ = [
    "encode_image",
    "decode_image",
    "gen_image",
    "psnr",
    "phash64",
    "LOSSLESS_FMT",
    "LOSSY_FMT",
]

LOSSLESS_FMT = "wclz"
LOSSY_FMT = "wcq6"

_MAGIC = {LOSSLESS_FMT: b"WCL1", LOSSY_FMT: b"WCQ6"}
_MAGIC_REV = {v: k for k, v in _MAGIC.items()}


def encode_image(arr: np.ndarray, fmt: str = LOSSLESS_FMT) -> bytes:
    assert arr.dtype == np.uint8 and arr.ndim == 3 and arr.shape[2] == 3
    h, w = arr.shape[:2]
    if fmt == LOSSLESS_FMT:
        payload = arr.tobytes()
    elif fmt == LOSSY_FMT:
        payload = (arr >> 2).astype(np.uint8).tobytes()  # keep top 6 bits
    else:
        raise NotImplementedError(f"encode for {fmt!r} requires an image library")
    return _MAGIC[fmt] + struct.pack("<HH", w, h) + zlib.compress(payload, 6)


def decode_image(data: bytes) -> tuple[np.ndarray, str]:
    """Decode to (HxWx3 uint8 array, fmt). PNG/JPEG only with Pillow."""
    magic = bytes(data[:4])
    if magic in _MAGIC_REV:
        fmt = _MAGIC_REV[magic]
        w, h = struct.unpack("<HH", bytes(data[4:8]))
        raw = np.frombuffer(zlib.decompress(bytes(data[8:])), dtype=np.uint8)
        arr = raw.reshape(h, w, 3)
        if fmt == LOSSY_FMT:
            # dequantize to bin centers: x*4 + 2 stays within 2 of the
            # original for every input => bounded error, PSNR ~= 47 dB
            arr = np.minimum(arr.astype(np.uint16) * 4 + 2, 255).astype(np.uint8)
        return arr, fmt
    if HAVE_PIL:
        import io

        with _PILImage.open(io.BytesIO(data)) as im:
            return np.asarray(im.convert("RGB")), (im.format or "unknown").lower()
    raise NotImplementedError(
        "real-codec decode (PNG/JPEG/...) needs Pillow, which this "
        "environment does not provide; wclz/wcq6 payloads decode natively"
    )


def gen_image(key: str, w: int = 32, h: int = 32) -> np.ndarray:
    """Deterministic procedural RGB image derived from ``key`` (no RNG)."""
    seed = int.from_bytes(hashlib.md5(key.encode()).digest()[:4], "big")
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    f1 = 0.1 + (seed & 0xFF) / 512.0
    f2 = 0.1 + ((seed >> 8) & 0xFF) / 512.0
    ph = (seed >> 16) / 65536.0 * 6.28318
    r = 127.5 + 127.5 * np.sin(f1 * xx + ph)
    g = 127.5 + 127.5 * np.sin(f2 * yy + ph * 0.5)
    b = 127.5 + 127.5 * np.sin(f1 * xx + f2 * yy)
    return np.stack([r, g, b], axis=-1).round().astype(np.uint8)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def phash64(arr: np.ndarray) -> int:
    """64-bit DCT perceptual hash (classic pHash construction, numpy DCT).

    Grayscale -> resize to 32x32 by box averaging -> 2D DCT-II -> top-left
    8x8 block minus DC -> sign-vs-median bits, MSB-first. Returns a SIGNED
    64-bit int so it fits Spark/parquet LongType (BASELINE.json phash:int64).
    """
    gray = arr.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    # box-average resample to 32x32 (pad to a multiple first)
    ph = (32 - h % 32) % 32
    pw = (32 - w % 32) % 32
    if ph or pw:
        gray = np.pad(gray, ((0, ph), (0, pw)), mode="edge")
    bh, bw = gray.shape[0] // 32, gray.shape[1] // 32
    small = gray.reshape(32, bh, 32, bw).mean(axis=(1, 3))

    n = 32
    k = np.arange(n)
    basis = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    dct = basis @ small @ basis.T
    block = dct[:8, :8].flatten()
    med = np.median(block[1:])
    bits = block > med
    val = 0
    for bit in bits:
        val = (val << 1) | int(bit)
    # two's-complement fold into signed 64-bit
    if val >= 1 << 63:
        val -= 1 << 64
    return val
