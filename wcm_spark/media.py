"""Video/audio container codecs (pure numpy/zlib — no av libraries).

The engine's multimodal operators need REAL decode kernels, but this
container ships no pyav/soundfile. Like the image codecs (images.py:
wclz/wcq6 — the payload-fidelity surface the reference's image sink
analog pins), these define small deterministic formats the synthetic
corpus can generate and the operators can genuinely decode:

- ``WCV1`` video: header ``WCV1 | u16 n_frames | u16 w | u16 h | u16
  fps`` then n_frames length-prefixed wclz-encoded frames. The length
  prefixes form a frame index, so sampling k frames SEEKS — it decodes
  only the selected frames, the property a real keyframe sampler has
  (decode cost O(k), not O(n_frames)).
- ``WCA1`` audio: header ``WCA1 | u32 sample_rate | u32 n_samples``
  then int16 little-endian PCM.

Swapping in real codecs on a cluster changes these scalar functions,
not the Spark plans in datapipe/multimodal.py.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

from .images import decode_image, encode_image, gen_image

__all__ = [
    "encode_video", "decode_video_meta", "decode_video_frame", "gen_video",
    "encode_audio", "decode_audio", "gen_audio",
]

_VIDEO_MAGIC = b"WCV1"
_AUDIO_MAGIC = b"WCA1"


# -- video -------------------------------------------------------------------


def encode_video(frames: list[np.ndarray], fps: int = 8) -> bytes:
    assert frames, "a video needs at least one frame"
    h, w = frames[0].shape[:2]
    out = [_VIDEO_MAGIC, struct.pack("<HHHH", len(frames), w, h, fps)]
    for f in frames:
        assert f.shape[:2] == (h, w), "all frames share one geometry"
        payload = encode_image(f, "wclz")
        out.append(struct.pack("<I", len(payload)))
        out.append(payload)
    return b"".join(out)


def decode_video_meta(data: bytes) -> tuple[int, int, int, int, list[tuple[int, int]]]:
    """(n_frames, w, h, fps, [(offset, length) per frame]) — header walk
    only, no pixel decode."""
    if bytes(data[:4]) != _VIDEO_MAGIC:
        raise NotImplementedError("not a WCV1 container")
    n, w, h, fps = struct.unpack("<HHHH", bytes(data[4:12]))
    index = []
    pos = 12
    for _ in range(n):
        (length,) = struct.unpack("<I", bytes(data[pos : pos + 4]))
        index.append((pos + 4, length))
        pos += 4 + length
    return n, w, h, fps, index


def decode_video_frame(data: bytes, index_entry: tuple[int, int]) -> np.ndarray:
    off, length = index_entry
    arr, _ = decode_image(bytes(data[off : off + length]))
    return arr


def gen_video(key: str, n_frames: int = 6, w: int = 16, h: int = 16, fps: int = 8) -> bytes:
    """Deterministic synthetic video: each frame is the deterministic
    image generator keyed by (key, frame_no)."""
    return encode_video(
        [gen_image(f"{key}/f{i}", w, h) for i in range(n_frames)], fps
    )


# -- audio -------------------------------------------------------------------


def encode_audio(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    pcm = np.asarray(samples, dtype="<i2")
    return (
        _AUDIO_MAGIC
        + struct.pack("<II", sample_rate, pcm.size)
        + pcm.tobytes()
    )


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """→ (float64 samples scaled to [-1, 1], sample_rate)."""
    if bytes(data[:4]) != _AUDIO_MAGIC:
        raise NotImplementedError("not a WCA1 container")
    rate, n = struct.unpack("<II", bytes(data[4:12]))
    pcm = np.frombuffer(bytes(data[12 : 12 + 2 * n]), dtype="<i2")
    return pcm.astype(np.float64) / 32768.0, rate


def gen_audio(key: str, n_samples: int = 4000, sample_rate: int = 8000) -> bytes:
    """Deterministic synthetic audio: three sines whose frequencies and
    amplitudes derive from the key's md5 — broadband enough that every
    FFT band carries nonzero energy."""
    seed = hashlib.md5(key.encode()).digest()
    t = np.arange(n_samples) / sample_rate
    sig = np.zeros(n_samples)
    for i in range(3):
        freq = 100 + (int.from_bytes(seed[4 * i : 4 * i + 2], "little") % 3500)
        amp = 0.15 + (seed[4 * i + 2] / 255.0) * 0.15
        sig += amp * np.sin(2 * np.pi * freq * t)
    return encode_audio(np.clip(sig, -1, 1) * 32767, sample_rate)
