"""Pure-python media codecs for the multimodal pipeline.

This container ships no PIL/ffmpeg, so these decoders implement three
real, self-contained formats from their public specs:

- **BMP** (Windows device-independent bitmap): 14-byte file header +
  BITMAPINFOHEADER, uncompressed 24/32-bit pixels, rows bottom-up and
  4-byte padded.
- **WAV** (RIFF PCM audio): parsed with the stdlib ``wave`` module,
  16-bit samples decoded with ``numpy``.
- **AVI** (RIFF video, uncompressed '00db' DIB frames): hand-walked
  RIFF chunk tree — 'hdrl'/'avih' for dims and frame rate, 'movi'
  for the per-frame BMP-layout pixel arrays.

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
    codec=pure_python_codec)``: BMP for images, WAV for audio,
    uncompressed AVI for video — all genuine byte-level parsers."""
    if media_type == "image":
        return image_features(content or b"")
    if media_type == "audio":
        return audio_features(content or b"")
    if media_type == "video":
        return video_features(content or b"")
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


# ---------------------------------------------------------------------------
# AVI (uncompressed DIB video) — the video leg of the multimodal path
# ---------------------------------------------------------------------------


def _riff_chunks(buf: bytes, offset: int, end: int):
    """Iterate (fourcc, data_offset, size) over a RIFF chunk run;
    chunks are word-aligned (odd sizes pad one byte)."""
    while offset + 8 <= end:
        ckid = buf[offset:offset + 4]
        size = struct.unpack_from("<I", buf, offset + 4)[0]
        data = offset + 8
        if data + size > len(buf):
            raise MediaDecodeError(
                f"truncated RIFF chunk {ckid!r}: need {data + size} bytes"
            )
        yield ckid, data, size
        offset = data + size + (size & 1)


def decode_avi(content: bytes) -> tuple[int, int, float, list[np.ndarray]]:
    """Parse an uncompressed (DIB '00db') AVI from its public RIFF
    spec: 'RIFF'//'AVI ' container, LIST 'hdrl' with the 56-byte
    'avih' MainAVIHeader (frame period in µs, width, height), LIST
    'movi' holding one '00db' chunk per frame — each frame is raw
    bottom-up BGR24 rows with 4-byte stride padding, exactly the BMP
    pixel-array layout.

    Returns ``(width, height, fps, frames)`` with frames as
    ``(height, width, 3)`` uint8 RGB arrays in top-down order.
    """
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise MediaDecodeError("not an AVI: missing RIFF/'AVI ' magic")
    width = height = None
    usec_per_frame = 0
    frames: list[np.ndarray] = []
    for ckid, data, size in _riff_chunks(content, 12, len(content)):
        if ckid != b"LIST":
            continue
        list_type = content[data:data + 4]
        if list_type == b"hdrl":
            for sub, sdata, ssize in _riff_chunks(
                content, data + 4, data + size
            ):
                if sub == b"avih":
                    if ssize < 40:
                        raise MediaDecodeError("short avih header")
                    usec_per_frame = struct.unpack_from("<I", content, sdata)[0]
                    width, height = struct.unpack_from(
                        "<II", content, sdata + 32
                    )
        elif list_type == b"movi":
            if width is None:
                raise MediaDecodeError("movi before hdrl/avih")
            stride = (width * 3 + 3) & ~3
            need = stride * height
            for sub, sdata, ssize in _riff_chunks(
                content, data + 4, data + size
            ):
                # '00db' only: '00dc' marks a COMPRESSED frame, and
                # interpreting compressed bytes as raw DIB data would
                # silently decode garbage instead of failing loud —
                # the strict-mode contract
                if sub != b"00db":
                    if sub == b"00dc":
                        raise MediaDecodeError(
                            "compressed ('00dc') AVI frame; only "
                            "uncompressed DIB ('00db') is supported"
                        )
                    continue
                if ssize < need:
                    raise MediaDecodeError(
                        f"frame chunk {ssize} bytes; need {need}"
                    )
                raw = np.frombuffer(
                    content, np.uint8, count=need, offset=sdata
                ).reshape(height, stride)
                px = raw[:, : width * 3].reshape(height, width, 3)
                # bottom-up BGR -> top-down RGB
                frames.append(px[::-1, :, [2, 1, 0]].copy())
    if width is None:
        raise MediaDecodeError("no avih header found")
    fps = 1e6 / usec_per_frame if usec_per_frame else 0.0
    return int(width), int(height), float(fps), frames


def encode_avi(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """Minimal uncompressed-AVI writer (companion of
    :func:`decode_avi`): frames are (height, width, 3) uint8 RGB,
    stored as '00db' bottom-up BGR24 chunks inside LIST 'movi'."""
    height, width, _ = frames[0].shape
    stride = (width * 3 + 3) & ~3
    pad = b"\x00" * (stride - width * 3)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        int(1e6 // fps), 0, 0, 0, len(frames), 0, 1, 0,
        width, height, 0, 0, 0, 0,
    )
    hdrl = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
    frame_chunks = []
    for fr in frames:
        bgr = fr[::-1, :, [2, 1, 0]]
        body = b"".join(bgr[r].tobytes() + pad for r in range(len(bgr)))
        frame_chunks.append(b"00db" + struct.pack("<I", len(body)) + body)
    movi = b"movi" + b"".join(frame_chunks)
    body = (
        b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
        + b"LIST" + struct.pack("<I", len(movi)) + movi
    )
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body


def video_features(content: bytes) -> list[float]:
    """8-dim feature from a decoded AVI: normalized dims, first-frame
    mean R (index 2, aligned with the image/audio level slot),
    frame-count, mean luminance, mean inter-frame difference, fps,
    aspect."""
    width, height, fps, frames = decode_avi(content)
    if not frames:
        return [0.0] * FEATURE_DIM
    stack = np.stack(frames).astype(np.float64) / 255.0
    lum = (
        0.299 * stack[:, :, :, 0]
        + 0.587 * stack[:, :, :, 1]
        + 0.114 * stack[:, :, :, 2]
    )
    diff = (
        float(np.abs(np.diff(stack, axis=0)).mean())
        if len(frames) > 1 else 0.0
    )
    return [
        float(min(width, 4096) / 4096.0),
        float(min(height, 4096) / 4096.0),
        float(stack[0, :, :, 0].mean()),
        float(min(len(frames), 10000) / 10000.0),
        float(lum.mean()),
        diff,
        float(min(fps, 120.0) / 120.0),
        float(width / max(height, 1) / 8.0),
    ]


def video_frame_sha(content: bytes, ts_ms: int) -> str:
    """Strict-mode frame codec for
    :func:`claims_data_spark.operators.multimodal.frame_sample`: seek
    the frame at ``ts_ms`` (floor of ts × fps, clamped) in a REAL
    decoded AVI and hash its RGB bytes."""
    import hashlib

    _w, _h, fps, frames = decode_avi(content)
    if not frames:
        raise MediaDecodeError("AVI has no frames")
    idx = min(int(ts_ms * fps / 1000.0), len(frames) - 1)
    return hashlib.sha256(frames[idx].tobytes()).hexdigest()
