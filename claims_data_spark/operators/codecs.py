"""Pure-python media codecs for the multimodal pipeline.

This container ships no PIL/ffmpeg, so these decoders implement two
real, self-contained formats from their public specs:

- **BMP** (Windows device-independent bitmap): 14-byte file header +
  BITMAPINFOHEADER, uncompressed 24/32-bit pixels, rows bottom-up and
  4-byte padded.
- **WAV** (RIFF PCM audio): parsed with the stdlib ``wave`` module,
  16-bit samples decoded with ``numpy``.

``pure_python_codec`` is a picklable ``(media_type, content) ->
list[float]`` callable that plugs into
:func:`claims_data_spark.operators.multimodal.extract_features` in
``strict`` mode — the Spark-side plumbing (schema, Arrow batching,
partitioning) is identical to what a PIL/ffmpeg codec would see, but
the decode is genuine byte-level parsing, not a fake.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

FEATURE_DIM = 8


class MediaDecodeError(ValueError):
    """Raised when bytes do not parse as the claimed format."""


def decode_bmp(content: bytes) -> tuple[int, int, np.ndarray]:
    """Parse an uncompressed 24/32-bit BMP.

    Returns ``(width, height, pixels)`` where ``pixels`` is a
    ``(height, width, 3)`` uint8 RGB array in top-down row order.
    """
    if len(content) < 54 or content[:2] != b"BM":
        raise MediaDecodeError("not a BMP: missing 'BM' magic")
    # BITMAPFILEHEADER: magic(2) size(4) reserved(4) data_offset(4)
    data_offset = struct.unpack_from("<I", content, 10)[0]
    # BITMAPINFOHEADER: size(4) width(4) height(4) planes(2) bpp(2)
    # compression(4) ...
    hdr_size, width, height, _planes, bpp, compression = struct.unpack_from(
        "<IiihHI", content, 14
    )
    if hdr_size < 40:
        raise MediaDecodeError(f"unsupported DIB header size {hdr_size}")
    if compression != 0:
        raise MediaDecodeError(f"unsupported BMP compression {compression}")
    if bpp not in (24, 32):
        raise MediaDecodeError(f"unsupported bit depth {bpp}")
    bottom_up = height > 0
    height = abs(height)
    bytes_pp = bpp // 8
    row_stride = (width * bytes_pp + 3) & ~3  # rows pad to 4 bytes
    need = data_offset + row_stride * height
    if len(content) < need:
        raise MediaDecodeError(
            f"truncated BMP: need {need} bytes, have {len(content)}"
        )
    raw = np.frombuffer(
        content, dtype=np.uint8, count=row_stride * height, offset=data_offset
    ).reshape(height, row_stride)
    px = raw[:, : width * bytes_pp].reshape(height, width, bytes_pp)
    if bottom_up:
        px = px[::-1]
    # BMP stores BGR(A); return RGB
    return width, height, px[:, :, [2, 1, 0]].copy()


def decode_wav(content: bytes) -> tuple[int, np.ndarray]:
    """Parse a RIFF/PCM WAV; returns ``(sample_rate, samples)`` with
    samples as float64 in [-1, 1] (channels averaged)."""
    try:
        with wave.open(io.BytesIO(content)) as w:
            n_ch = w.getnchannels()
            width = w.getsampwidth()
            rate = w.getframerate()
            frames = w.readframes(w.getnframes())
    except (wave.Error, EOFError) as e:
        raise MediaDecodeError(f"not a PCM WAV: {e}") from e
    if width == 2:
        samples = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        samples = (
            np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0
        ) / 128.0
    else:
        raise MediaDecodeError(f"unsupported sample width {width}")
    if n_ch > 1:
        samples = samples[: len(samples) - len(samples) % n_ch]
        samples = samples.reshape(-1, n_ch).mean(axis=1)
    return rate, samples


def image_features(content: bytes) -> list[float]:
    """8-dim feature from a decoded BMP: normalized dims, per-channel
    means, luminance mean/std (all unit-range floats)."""
    width, height, px = decode_bmp(content)
    f = px.astype(np.float64) / 255.0
    lum = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    return [
        float(min(width, 4096) / 4096.0),
        float(min(height, 4096) / 4096.0),
        float(f[:, :, 0].mean()),
        float(f[:, :, 1].mean()),
        float(f[:, :, 2].mean()),
        float(lum.mean()),
        float(lum.std()),
        float(width / max(height, 1) / 8.0),
    ]


def audio_features(content: bytes) -> list[float]:
    """8-dim feature from a decoded WAV: duration, rms, peak,
    zero-crossing rate, coarse band energies."""
    rate, s = decode_wav(content)
    if len(s) == 0:
        return [0.0] * FEATURE_DIM
    dur = len(s) / rate
    zc = float(np.mean(np.abs(np.diff(np.signbit(s).astype(np.int8)))))
    thirds = np.array_split(s, 3)
    return [
        float(min(dur, 3600.0) / 3600.0),
        float(np.sqrt(np.mean(s**2))),
        float(np.abs(s).max()),
        zc,
        float(np.sqrt(np.mean(thirds[0] ** 2))),
        float(np.sqrt(np.mean(thirds[1] ** 2))),
        float(np.sqrt(np.mean(thirds[2] ** 2))),
        float(min(rate, 96000) / 96000.0),
    ]


def pure_python_codec(media_type: str, content: bytes) -> list[float]:
    """Codec entry point for ``extract_features(mode='strict',
    codec=pure_python_codec)``: BMP for images, WAV for audio. Video
    decode has no self-contained pure-python format — still stubbed."""
    if media_type == "image":
        return image_features(content or b"")
    if media_type == "audio":
        return audio_features(content or b"")
    raise MediaDecodeError(
        f"no pure-python decoder for media_type={media_type!r}"
    )


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Minimal 24-bit BMP writer (test-fixture/companion of
    :func:`decode_bmp`): ``pixels`` is (height, width, 3) uint8 RGB,
    written bottom-up with row padding."""
    height, width, _ = pixels.shape
    bytes_pp = 3
    row_stride = (width * bytes_pp + 3) & ~3
    data_size = row_stride * height
    offset = 14 + 40
    header = b"BM" + struct.pack("<IHHI", offset + data_size, 0, 0, offset)
    dib = struct.pack(
        "<IiihHIIiiII", 40, width, height, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    rows = []
    bgr = pixels[:, :, [2, 1, 0]]
    pad = b"\x00" * (row_stride - width * bytes_pp)
    for r in range(height - 1, -1, -1):  # bottom-up
        rows.append(bgr[r].tobytes() + pad)
    return header + dib + b"".join(rows)


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Minimal 16-bit mono PCM WAV writer (companion of
    :func:`decode_wav`): ``samples`` float in [-1, 1]."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(
            (np.clip(samples, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()
        )
    return buf.getvalue()
