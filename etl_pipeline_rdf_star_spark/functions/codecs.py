"""Pure-numpy/stdlib media codecs for UNCOMPRESSED formats.

The container ships no PIL/ffmpeg, but that only rules out *compressed*
codecs (JPEG/H.264/MP3). Uncompressed formats are fully decodable with
numpy + the standard library, which makes the multimodal pipeline REAL for:

* images — binary PPM (``P6``), the classic no-dependency raster format;
* audio  — RIFF/WAVE PCM16 via stdlib ``wave``;
* video  — a concatenated-PPM frame stream (each frame is self-describing,
  so the stream splits without an index).

Compressed formats still raise in strict mode (multimodal.py); swapping in
PIL/ffmpeg on a real cluster only widens the mime dispatch table.
"""

from __future__ import annotations

import io
import wave

import numpy as np


# -- PPM (P6) ---------------------------------------------------------------


def _parse_ppm_header(data: bytes, pos: int = 0) -> tuple[int, int, int, int]:
    """Parse a P6 header at ``pos`` → (width, height, maxval, data_offset).
    Strictly bounded: truncated or garbage input raises ValueError instead
    of scanning off the end (an unbounded scan here hung executors on
    corrupt payloads — review finding)."""
    n = len(data)
    if data[pos : pos + 2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    pos += 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < n and data[pos : pos + 1].isspace():
            pos += 1
        if pos >= n:
            raise ValueError("truncated PPM header")
        if data[pos : pos + 1] == b"#":  # comment to end of line
            while pos < n and data[pos : pos + 1] != b"\n":
                pos += 1
            if pos >= n:
                raise ValueError("truncated PPM comment")
            continue
        start = pos
        while pos < n and not data[pos : pos + 1].isspace():
            pos += 1
        try:
            fields.append(int(data[start:pos]))
        except ValueError as e:
            raise ValueError(f"bad PPM header field: {data[start:pos]!r}") from e
    if pos >= n:
        raise ValueError("truncated PPM header")
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    if w <= 0 or h <= 0:
        raise ValueError(f"bad PPM dimensions {w}x{h}")
    if pos + w * h * 3 > n:
        raise ValueError("truncated PPM pixel data")
    return w, h, maxval, pos


def decode_ppm(data: bytes) -> np.ndarray:
    """P6 PPM → uint8 array of shape (h, w, 3). Handles comments and
    arbitrary header whitespace per the netpbm spec."""
    w, h, _, pos = _parse_ppm_header(data)
    arr = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return arr.reshape(h, w, 3)


def encode_ppm(arr: np.ndarray) -> bytes:
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def ppm_size(data: bytes, pos: int = 0) -> int:
    """Byte length of the PPM starting at ``pos`` (for stream splitting) —
    header-only parse, no pixel copy."""
    w, h, _, data_off = _parse_ppm_header(data, pos)
    return data_off - pos + w * h * 3


def ppm_dims(data: bytes) -> tuple[int, int]:
    w, h, _, _ = _parse_ppm_header(data)
    return w, h


def resize_nearest(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index maps (pure numpy)."""
    src_h, src_w = img.shape[:2]
    rows = (np.arange(h) * src_h // h).clip(0, src_h - 1)
    cols = (np.arange(w) * src_w // w).clip(0, src_w - 1)
    return img[rows][:, cols]


def split_ppm_stream(data: bytes) -> list[bytes]:
    """Split a concatenated-PPM 'video' payload into frames (each frame's
    header states its own size — no container index needed). Linear: each
    header is parsed once at its offset, no tail copies (the previous
    data[pos:] slicing was O(n²) in payload size — review finding).
    Truncated trailing bytes raise (strict: a corrupt payload must fail
    the task, not hang or silently drop frames)."""
    frames = []
    pos = 0
    while pos < len(data):
        size = ppm_size(data, pos)
        frames.append(data[pos : pos + size])
        pos += size
    return frames


# -- WAV (PCM16) ------------------------------------------------------------


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 → (float32 samples in [-1, 1] shaped (n, channels),
    sample_rate). stdlib ``wave`` handles the chunk parsing."""
    with wave.open(io.BytesIO(data), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError("only PCM16 supported")
        n, ch, sr = wf.getnframes(), wf.getnchannels(), wf.getframerate()
        raw = wf.readframes(n)
    samples = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    return samples.reshape(-1, ch), sr


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    pcm = (np.clip(samples, -1.0, 1.0) * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        ch = 1 if pcm.ndim == 1 else pcm.shape[1]
        wf.setnchannels(ch)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


# -- deterministic synthesis (test/bench payloads) --------------------------


def synth_ppm(seed: int, w: int = 16, h: int = 12) -> bytes:
    """Deterministic gradient image: pixel = f(seed, x, y)."""
    x = np.arange(w, dtype=np.uint32)
    y = np.arange(h, dtype=np.uint32)[:, None]
    r = (x + seed) % 256
    g = (y * 3 + seed * 7) % 256
    b = (x[None, :] + y + seed * 13) % 256
    img = np.stack(
        [np.broadcast_to(r, (h, w)), np.broadcast_to(g, (h, w)), b], axis=-1
    ).astype(np.uint8)
    return encode_ppm(img)


def synth_wav(seed: int, ms: int = 50, sr: int = 8000) -> bytes:
    """Deterministic sine burst: frequency derived from the seed."""
    n = sr * ms // 1000
    t = np.arange(n, dtype=np.float64) / sr
    freq = 220.0 + (seed % 16) * 55.0
    return encode_wav(0.5 * np.sin(2 * np.pi * freq * t), sr)


def synth_ppm_video(seed: int, n_frames: int = 4, w: int = 8, h: int = 6) -> bytes:
    return b"".join(synth_ppm(seed * 31 + i, w, h) for i in range(n_frames))
