"""Real (non-stub) media codecs, dependency-free.

PIL/libvips/ffmpeg are not in this container, so the "real decode" path
for the multimodal stages is implemented directly against the container
formats: PNG (RFC 2083: zlib-inflated scanlines + per-line unfilter)
and WAV (RIFF PCM via the stdlib ``wave`` module). These plug into
MediaFeatures/AudioFeatures through the same ``decoder=`` injection
point as the deterministic fake — the pipelines do not change.

Scope: PNG 8-bit depth, color types 0 (gray), 2 (RGB), 6 (RGBA),
no interlace — the subset the committed fixtures (and most training
corpora thumbnails) use. Anything else raises ValueError rather than
decoding wrongly.
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


# ------------------------------------------------------------- encode
def png_encode(img: np.ndarray) -> bytes:
    """Minimal PNG writer (filter 0, one IDAT) for fixture generation
    and tests; accepts HxW (gray), HxWx3 (RGB) or HxWx4 (RGBA) uint8."""
    if img.dtype != np.uint8:
        raise ValueError("png_encode expects uint8")
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    ctype = {1: 0, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b""))


# ------------------------------------------------------------- decode
def png_decode(data: bytes) -> np.ndarray:
    """PNG -> HxWxC uint8 ndarray (C=1/3/4). Full filter support
    (None/Sub/Up/Average/Paeth), vectorized per scanline."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    ctype = None
    idat = []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8 or ctype not in _CHANNELS or inter != 0:
                raise ValueError(
                    f"unsupported PNG (depth={depth} color={ctype} "
                    f"interlace={inter}); supported: 8-bit gray/RGB/RGBA")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    ch = _CHANNELS[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG payload size mismatch")
    arr = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    filters = arr[:, 0]
    lines = arr[:, 1:]
    out = np.zeros((h, stride), np.uint8)
    zero = np.zeros(stride, np.uint8)
    for y in range(h):
        f = int(filters[y])
        cur = lines[y].copy()
        prev = out[y - 1] if y else zero
        if f == 0:
            pass
        elif f == 1:  # Sub: add left (sequential in x, uint8 wraparound)
            for x in range(ch, stride):
                cur[x] = (int(cur[x]) + int(cur[x - ch])) & 0xFF
        elif f == 2:  # Up (fully vectorized, uint8 wraps)
            cur += prev
        elif f == 3:  # Average
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                cur[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (
                    b if pb <= pc else c)
                cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = cur
    return out.reshape(h, w, ch)


# ---------------------------------------------------------------- wav
def wav_decode(data_or_path) -> tuple[np.ndarray, int]:
    """RIFF/PCM WAV -> (float32 mono samples in [-1, 1], sample_rate)
    via the stdlib wave module; 16-bit and 8-bit PCM supported."""
    import io
    import wave
    src = (io.BytesIO(data_or_path)
           if isinstance(data_or_path, (bytes, bytearray))
           else data_or_path)
    with wave.open(src, "rb") as f:
        sr = f.getframerate()
        n = f.getnframes()
        width = f.getsampwidth()
        nch = f.getnchannels()
        raw = f.readframes(n)
    if width == 2:
        samples = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 1:
        samples = (np.frombuffer(raw, np.uint8).astype(np.float32)
                   - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if nch > 1:
        samples = samples.reshape(-1, nch).mean(axis=1)
    return samples, sr


def wav_encode(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """float [-1,1] mono -> 16-bit PCM WAV bytes (fixture generation)."""
    import io
    import wave
    pcm = np.clip(np.asarray(samples, np.float64), -1.0, 1.0)
    pcm = (pcm * 32767.0).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


# -------------------------------------------------- injectable decoders
class PngFileDecoder:
    """Real image decoder for MediaFeatures: resolves media_ref against
    a root directory (or uses the inline payload when the batch carries
    one) and decodes the PNG to HxWxC uint8."""

    def __init__(self, root_dir: str | None = None):
        self.root_dir = root_dir

    def decode(self, media_ref: str, payload: bytes | None) -> np.ndarray:
        if payload is None:
            if self.root_dir is None:
                raise ValueError("no payload and no root_dir to resolve "
                                 f"media_ref {media_ref!r}")
            with open(os.path.join(self.root_dir, media_ref), "rb") as f:
                payload = f.read()
        return png_decode(payload)


class WavFileDecoder:
    """Real audio decoder for AudioFeatures: same resolution contract as
    PngFileDecoder; returns float32 mono samples. AudioFeatures computes
    duration as len(samples)/its own sample_rate, so a file whose actual
    rate differs from ``sample_rate`` is REJECTED rather than silently
    producing a wrong duration (a 44.1 kHz file would read as ~2.8x its
    real length at the 16 kHz default)."""

    def __init__(self, root_dir: str | None = None,
                 sample_rate: int = 16_000):
        self.root_dir = root_dir
        self.sample_rate = sample_rate

    def decode(self, media_ref: str, payload: bytes | None) -> np.ndarray:
        if payload is None:
            if self.root_dir is None:
                raise ValueError("no payload and no root_dir to resolve "
                                 f"media_ref {media_ref!r}")
            with open(os.path.join(self.root_dir, media_ref), "rb") as f:
                payload = f.read()
        samples, sr = wav_decode(payload)
        if sr != self.sample_rate:
            raise ValueError(
                f"{media_ref!r} is {sr} Hz but this decoder was built "
                f"for {self.sample_rate} Hz; construct WavFileDecoder("
                f"sample_rate={sr}) (and AudioFeatures to match)")
        return samples
