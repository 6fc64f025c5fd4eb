"""Audio/video codecs implementable without external libraries, mirroring
image_codec.py's stance for images (real codecs for formats the sandbox can
express; compressed formats stay behind explicit stubs).

- WAV: real RIFF/PCM parser+writer (public format; chunk walk, 8/16/32-bit
  PCM, numpy vectorized). What libsndfile would do for PCM, minus the
  compressed codecs.
- PPMV: uncompressed frame container for video fixtures — fixed-size raw
  RGB24 frames after a one-line header, so FRAME-ACCURATE RANDOM ACCESS is
  pure offset arithmetic. That is the property real pipelines exploit via
  keyframe indexes: sampling k frames reads O(k) bytes, never the whole
  video.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- WAV (PCM)

_PCM_DTYPES = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """float samples in [-1, 1], shape (n,) or (n, ch) -> PCM16 RIFF/WAVE."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
    payload = pcm.tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """PCM RIFF/WAVE -> (float64 samples in [-1, 1] shape (n, ch), rate).
    Walks the chunk list (extra chunks like LIST/fact are skipped), accepts
    8/16/32-bit integer PCM (format tag 1)."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, end = 12, min(len(blob), 8 + struct.unpack("<I", blob[4:8])[0])
    fmt_chunk = data = None
    while pos + 8 <= end:
        cid = blob[pos : pos + 4]
        size = struct.unpack("<I", blob[pos + 4 : pos + 8])[0]
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_chunk = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_chunk is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", fmt_chunk[:16])
    if tag != 1 or bits not in _PCM_DTYPES:
        raise ValueError(f"unsupported WAV encoding: tag={tag} bits={bits}")
    if ch == 0 or rate == 0:
        raise ValueError(f"malformed WAV header: channels={ch} rate={rate}")
    raw = np.frombuffer(data, dtype=_PCM_DTYPES[bits])
    raw = raw[: (len(raw) // ch) * ch].reshape(-1, ch)
    # divide by 2^(bits-1) so full-scale negative (-32768) decodes to
    # exactly -1.0 and every value stays inside the documented [-1, 1]
    if bits == 8:  # 8-bit PCM is unsigned, midpoint 128
        x = (raw.astype(np.float64) - 128.0) / 128.0
    else:
        x = raw.astype(np.float64) / float(2 ** (bits - 1))
    return x, int(rate)


# ------------------------------------------------------------ PPMV (frames)

_MAGIC = b"PPMV1\n"


def encode_ppmv(frames: list[np.ndarray], fps: int = 30) -> bytes:
    """frames: equal-shaped (h, w, 3) uint8 -> header + raw RGB24 planes."""
    if not frames:
        raise ValueError("no frames")
    h, w, c = frames[0].shape
    if c != 3:
        raise ValueError("frames must be (h, w, 3)")
    head = _MAGIC + f"{len(frames)} {w} {h} {fps}\n".encode()
    body = b"".join(np.ascontiguousarray(f, dtype=np.uint8).tobytes() for f in frames)
    return head + body


def ppmv_info(blob: bytes) -> tuple[int, int, int, int]:
    """(n_frames, w, h, fps) from the header only — no frame bytes read."""
    if not blob.startswith(_MAGIC):
        raise ValueError("not a PPMV stream")
    nl = blob.index(b"\n", len(_MAGIC))
    n, w, h, fps = (int(x) for x in blob[len(_MAGIC) : nl].split())
    return n, w, h, fps


def decode_ppmv_frame(blob: bytes, idx: int) -> np.ndarray:
    """Random-access decode of frame idx: one offset computation + one
    reshape — O(frame), not O(video)."""
    n, w, h, _fps = ppmv_info(blob)
    if not (0 <= idx < n):
        raise IndexError(f"frame {idx} out of range (n={n})")
    start = blob.index(b"\n", len(_MAGIC)) + 1 + idx * w * h * 3
    raw = np.frombuffer(blob[start : start + w * h * 3], dtype=np.uint8)
    return raw.reshape(h, w, 3).copy()
