"""Real, dependency-free media codecs: PNG (stdlib zlib + numpy) and WAV
PCM16 (stdlib struct + numpy).

The container has no Pillow/ffmpeg, but PNG and RIFF/WAVE are simple
enough to implement from their public specs — so the multimodal decode
path (reference parity target: opaque-binary columns with typed decode
stages) gets a REAL round-trip instead of a stub: Spark encodes synthetic
pixels/samples to genuine on-spec bytes, ships them through the binary
column, and the decode kernel parses the container format for real
(signature, header fields, zlib inflate, per-row unfiltering / PCM
frames). Correctness is oracle-checked end-to-end because the synthetic
content is an integer function of the row id, so DuckDB can compute the
expected header fields and exact integer pixel/sample sums analytically.

Scale note: these pure-Python kernels run inside Arrow-batched
``mapInPandas`` workers, so throughput scales with executors; a real
deployment swaps the per-payload ``decode_png`` body for ``PIL.Image``
(same signature, same schema) and nothing else changes.

PNG subset: 8-bit depth, color types 0 (gray), 2 (RGB), 6 (RGBA),
non-interlaced, all five filter types on decode. WAV subset: PCM16
mono/stereo little-endian.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal on-spec PNG writer for uint8 arrays shaped (H, W) gray,
    (H, W, 3) RGB or (H, W, 4) RGBA. Rows cycle through filter types
    None/Sub/Up so decoders must actually unfilter."""
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.uint8)
    for r in range(h):
        row = arr[r].reshape(-1)
        ftype = r % 3
        if ftype == 0:
            filt = row
        elif ftype == 1:  # Sub: delta vs pixel to the left
            left = np.concatenate([np.zeros(c, np.uint8), row[:-c]])
            filt = (row.astype(np.int16) - left).astype(np.uint8)
        else:  # Up: delta vs row above
            filt = (row.astype(np.int16) - prev).astype(np.uint8)
        raw.append(ftype)
        raw.extend(filt.tobytes())
        prev = row
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Real PNG decode: signature check, IHDR parse, IDAT inflate, and
    full unfiltering (all five filter types incl. Paeth). Returns a
    (H, W, C) uint8 array. Raises ValueError on malformed input and
    NotImplementedError on PNG features outside the supported subset
    (non-8-bit depth, interlacing, palette)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload (bad signature)")
    pos, width = 8, None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8 or interlace != 0 or color_type not in _CHANNELS:
                raise NotImplementedError(
                    f"PNG subset: depth={depth} color_type={color_type} "
                    f"interlace={interlace} unsupported"
                )
            channels = _CHANNELS[color_type]
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG IDAT length mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int16)
    c = channels
    for r in range(height):
        ftype = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, r * (stride + 1) + 1
        ).astype(np.int16)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up — vectorized
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub/Average/Paeth — left-sequential
            cur = np.zeros(stride, dtype=np.int16)
            for i in range(stride):
                a = cur[i - c] if i >= c else 0
                b = prev[i]
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    cc = prev[i - c] if i >= c else 0
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
                cur[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"PNG bad filter type {ftype}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(height, width, channels)


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Minimal on-spec RIFF/WAVE writer: PCM16 little-endian. ``samples``
    is int16 shaped (N,) mono or (N, 2) stereo."""
    arr = np.ascontiguousarray(samples, dtype="<i2")
    n_ch = 1 if arr.ndim == 1 else arr.shape[1]
    payload = arr.tobytes()
    byte_rate = sample_rate * n_ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, byte_rate, n_ch * 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_pcm16(data: bytes) -> tuple[int, np.ndarray]:
    """Real RIFF/WAVE parse: chunk walk, fmt validation (PCM16 only),
    frame deinterleave. Returns (sample_rate, samples[(N,) or (N, ch)])."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate = n_ch = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            audio_fmt, n_ch, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError("WAV subset: PCM16 only")
        elif tag == b"data":
            pcm = body
    if rate is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    arr = np.frombuffer(pcm, dtype="<i2")
    if n_ch > 1:
        arr = arr.reshape(-1, n_ch)
    return rate, arr
