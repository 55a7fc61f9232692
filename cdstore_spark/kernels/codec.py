"""Audio codec encode/decode in pure NumPy.

Supported codecs (FIXTURES.md §1 — all NumPy-decodable, no external audio
libs exist in this sandbox, SURVEY.md §0):

    pcm_s16le  — 16-bit little-endian PCM
    ulaw       — G.711 mu-law, 8-bit  (decode via 256-entry LUT)
    alaw       — G.711 A-law,  8-bit  (decode via 256-entry LUT)

This is the graft analog of CDStore's file-read + byte-stream handling
(SURVEY.md §2.A op 1): the `bytes` column is opaque binary until the decode
stage turns it into float32 PCM inside Arrow batches — never per-row Python.
"""

from __future__ import annotations

import numpy as np

CODECS = ("pcm_s16le", "ulaw", "alaw")

_ULAW_BIAS = 0x84
_ULAW_CLIP = 32635


def _ulaw_encode_i16(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), _ULAW_CLIP) + _ULAW_BIAS
    exp = np.zeros_like(mag)
    for s in range(1, 8):
        exp = np.where(mag >= (1 << (s + 7)), s, exp)
    man = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | man) & 0xFF).astype(np.uint8)


def _ulaw_decode_u8(u: np.ndarray) -> np.ndarray:
    u = (~u.astype(np.int32)) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    man = u & 0x0F
    mag = (((man << 3) + _ULAW_BIAS) << exp) - _ULAW_BIAS
    return np.where(sign, -mag, mag).astype(np.int16)


def _alaw_encode_i16(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.int32)
    sign = np.where(x >= 0, 0x80, 0)
    a = np.minimum(np.abs(x), 32767) >> 4  # 12-bit magnitude 0..2047
    exp = np.zeros_like(a)
    for s in range(1, 7):
        exp = np.where(a >= (1 << (s + 4)), s, exp)
    man = np.where(exp == 0, a >> 1, (a >> exp) & 0x0F)
    return ((sign | (exp << 4) | man) ^ 0x55).astype(np.uint8)


def _alaw_decode_u8(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.int32) ^ 0x55
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    man = u & 0x0F
    mag_a = np.where(exp == 0, (man << 1) + 1, ((man << 1) + 33) << np.maximum(exp - 1, 0))
    mag = mag_a << 4
    return np.where(sign, mag, -mag).astype(np.int16)


# 256-entry decode LUTs — decode of N bytes is a single fancy-index.
ULAW_LUT = _ulaw_decode_u8(np.arange(256, dtype=np.uint8))
ALAW_LUT = _alaw_decode_u8(np.arange(256, dtype=np.uint8))

_I16_SCALE = np.float32(1.0 / 32768.0)


def float_to_i16(x: np.ndarray) -> np.ndarray:
    """Quantize float PCM in [-1, 1] to int16 (round-half-away clipping)."""
    return np.clip(np.rint(np.asarray(x, np.float64) * 32767.0), -32768, 32767).astype("<i2")


def encode(x_float: np.ndarray, codec: str) -> bytes:
    """Encode float PCM to the codec's wire bytes (datagen-side only)."""
    i16 = float_to_i16(x_float)
    if codec == "pcm_s16le":
        return i16.tobytes()
    if codec == "ulaw":
        return _ulaw_encode_i16(i16).tobytes()
    if codec == "alaw":
        return _alaw_encode_i16(i16).tobytes()
    raise ValueError(f"unknown codec: {codec!r}")


def decode_i16(raw: bytes | np.ndarray, codec: str) -> np.ndarray:
    """Decode wire bytes to int16 samples (vectorized; LUT for G.711)."""
    if codec == "pcm_s16le":
        return np.frombuffer(raw, dtype="<i2") if isinstance(raw, (bytes, bytearray, memoryview)) \
            else np.asarray(raw).view("<i2")
    u = np.frombuffer(raw, dtype=np.uint8) if isinstance(raw, (bytes, bytearray, memoryview)) \
        else np.asarray(raw, dtype=np.uint8)
    if codec == "ulaw":
        return ULAW_LUT[u]
    if codec == "alaw":
        return ALAW_LUT[u]
    raise ValueError(f"unknown codec: {codec!r}")


def decode_float(raw: bytes | np.ndarray, codec: str) -> np.ndarray:
    """Decode wire bytes to float32 PCM in [-1, 1)."""
    return decode_i16(raw, codec).astype(np.float32) * _I16_SCALE


def resample_linear(x: np.ndarray, sr_from: int, sr_to: int) -> np.ndarray:
    """Linear-interpolation resample (the audio analog of image resize):
    deterministic, endpoint-preserving, float32 out. Shared by the Spark
    multimodal operator and the golden mirror."""
    if x.shape[0] == 0 or sr_from == sr_to:
        return x.astype(np.float32, copy=False)
    n_out = max(1, int(round(x.shape[0] * sr_to / sr_from)))
    xq = np.linspace(0.0, x.shape[0] - 1, n_out)
    xp = np.arange(x.shape[0], dtype=np.float64)
    return np.interp(xq, xp, x.astype(np.float64)).astype(np.float32)


def resample_stats(x: np.ndarray, sr_from: int, sr_to: int
                   ) -> tuple[int, float]:
    """(n_samples_out, rms_out 6-dp HALF_UP) of the resampled signal —
    the shared record body of the Spark resample operator and its golden
    mirror (one implementation, structurally impossible to drift)."""
    y = resample_linear(x, sr_from, sr_to)
    rms = float(np.sqrt((y.astype(np.float64) ** 2).mean())) \
        if y.shape[0] else 0.0
    return int(y.shape[0]), float(np.floor(rms * 1e6 + 0.5) / 1e6)


def n_samples(raw_len: int, codec: str) -> int:
    return raw_len // 2 if codec == "pcm_s16le" else raw_len
