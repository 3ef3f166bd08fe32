"""Multimodal column plumbing (build brief): image/audio/video as opaque
binary/media_ref columns with typed metadata, processed by actor-pool
map_batches stages.

Decoders inject via ``decoder=``: the default DeterministicFakeDecoder
synthesizes stable pixel/sample metadata from the media_ref hash (fast,
dependency-free tests), while ``mediacodec.PngFileDecoder`` /
``WavFileDecoder`` are REAL pure-python decoders (zlib PNG unfilter,
RIFF PCM) exercised over the committed fixture set in
tests/test_mediacodec.py — the pipeline code is identical either way.
PIL/ffmpeg-backed decoders drop into the same slot
(RealDecoderUnavailable marks that wire point)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_META_SCHEMA = pa.schema([
    ("media_ref", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("n_channels", pa.int8()),
    ("feature", pa.list_(pa.float32())),
])


class RealDecoderUnavailable:
    """Wire point for a real image decoder (PIL.Image.open etc.)."""

    def decode(self, media_ref: str, payload: bytes | None):
        raise NotImplementedError(
            "image decode requires PIL/libvips, not present in this "
            "environment; inject a decoder with decode(media_ref, bytes) "
            "-> (ndarray HxWxC)")


class DeterministicFakeDecoder:
    """Seed-stable stand-in: dimensions and a 16-dim 'feature' derived
    from the media_ref digest. Keeps tests/pipelines deterministic."""

    def decode(self, media_ref: str, payload: bytes | None):
        h = hashlib.sha256(media_ref.encode()).digest()
        w = 64 + h[0] % 192
        hh = 64 + h[1] % 192
        rng = np.random.default_rng(int.from_bytes(h[2:6], "big"))
        img = rng.integers(0, 256, (hh, w, 3), dtype=np.uint8)
        return img


class MediaFeatures:
    """Actor-pool stage: decode (stub) + feature-extract media spans.

    Input: doc table (doc_id, spans). Output: one row per media span
    with typed metadata + a small feature vector (channel-mean style).
    Use map_batches(MediaFeatures, concurrency=N, batch_size=small) —
    large binary payloads need small batches (build brief)."""

    def __init__(self, decoder=None):
        self.decoder = decoder or DeterministicFakeDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        spans = spans.combine_chunks() if isinstance(spans, pa.ChunkedArray) else spans
        offs = spans.offsets.to_numpy(zero_copy_only=False)
        flat = spans.values
        kinds = flat.field("kind").to_pylist()
        refs = flat.field("media_ref").to_pylist()
        doc_ids = batch.column("doc_id").to_pylist()

        o_doc, o_ref, o_w, o_h, o_c, o_feat = [], [], [], [], [], []
        rows_of = np.searchsorted(offs, np.arange(len(kinds)),
                                  side="right") - 1
        for pos, (kind, ref) in enumerate(zip(kinds, refs)):
            row = int(rows_of[pos])
            if kind != "image" or not ref:
                continue
            img = self.decoder.decode(ref, None)
            o_doc.append(doc_ids[row])
            o_ref.append(ref)
            o_h.append(img.shape[0])
            o_w.append(img.shape[1])
            o_c.append(img.shape[2])
            # toy feature: per-channel mean + 13 histogram bins
            means = img.mean(axis=(0, 1))
            hist, _ = np.histogram(img[..., 0], bins=13, range=(0, 256))
            feat = np.concatenate([means, hist / hist.sum()]).astype(np.float32)
            o_feat.append(feat.tolist())
        return pa.table({
            "doc_id": pa.array(o_doc, pa.string()),
            "media_ref": pa.array(o_ref, pa.string()),
            "width": pa.array(o_w, pa.int32()),
            "height": pa.array(o_h, pa.int32()),
            "n_channels": pa.array(o_c, pa.int8()),
            "feature": pa.array(o_feat, pa.list_(pa.float32())),
        })


class PerceptualHash:
    """Actor-pool stage: 64-bit DCT perceptual hash (pHash) per media
    span — the embedding-free image near-dup signature (near-identical
    images differ in a few bits; pair them with
    dedup.banded_hamming_pairs).

    Per image: decode (injected, default DeterministicFakeDecoder) ->
    luma grayscale -> 32x32 area mean-resize -> 2D DCT-II (one
    32x32 basis matmul each side, basis built ONCE in __init__) ->
    top-left 8x8 coefficient block minus DC -> median threshold ->
    64-bit hash. Per-span Python loop, numpy math per image (actor
    pool amortizes the basis; images are the payload, so batches stay
    small)."""

    _N = 32
    _K = 8

    def __init__(self, decoder=None):
        self.decoder = decoder or DeterministicFakeDecoder()
        n = self._N
        k = np.arange(n)
        # orthonormal DCT-II basis: D @ img @ D.T is the 2-D transform
        self.dct = np.cos(np.pi * (2 * k[None, :] + 1)
                          * k[:, None] / (2 * n)) * np.sqrt(2.0 / n)
        self.dct[0] /= np.sqrt(2.0)

    def _resize(self, gray: np.ndarray) -> np.ndarray:
        n = self._N
        h, w = gray.shape
        ys = (np.arange(n + 1) * h) // n
        xs = (np.arange(n + 1) * w) // n
        csum = np.zeros((h + 1, w + 1))
        csum[1:, 1:] = gray.cumsum(0).cumsum(1)
        area = ((ys[1:] - ys[:-1])[:, None]
                * (xs[1:] - xs[:-1])[None, :])
        return (csum[ys[1:]][:, xs[1:]] - csum[ys[:-1]][:, xs[1:]]
                - csum[ys[1:]][:, xs[:-1]]
                + csum[ys[:-1]][:, xs[:-1]]) / np.maximum(area, 1)

    def hash_image(self, img: np.ndarray) -> int:
        gray = (img.astype(np.float64) @ [0.299, 0.587, 0.114]
                if img.ndim == 3 else img.astype(np.float64))
        small = self._resize(gray)
        coef = self.dct @ small @ self.dct.T
        block = coef[:self._K, :self._K].ravel()[1:]  # drop DC
        bits = np.flatnonzero(block > np.median(block)).astype(np.uint64)
        if not len(bits):
            return 0
        return int(np.bitwise_or.reduce(np.uint64(1) << bits))

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        o_ref, o_hash, o_id = [], [], []
        for ref in refs:
            img = self.decoder.decode(ref, None)
            o_ref.append(ref)
            o_hash.append(self.hash_image(img))
            o_id.append(int.from_bytes(
                hashlib.blake2b(ref.encode(), digest_size=8).digest(),
                "big") >> 1)  # stable non-negative int64 id
        return pa.table({
            "media_ref": pa.array(o_ref, pa.string()),
            "media_id": pa.array(o_id, pa.int64()),
            "phash": pa.array(np.array(o_hash, np.uint64).astype(
                np.int64), pa.int64()),
        })


class AudioFingerprint:
    """Actor-pool stage: 64-bit spectral fingerprint per audio span —
    the audio analogue of PerceptualHash (near-identical recordings
    differ in a few bits; pair with dedup.banded_hamming_pairs).

    Per clip: decode (injected, same contract as AudioFeatures) ->
    8 equal time segments x 8 rFFT power bands = 64 energy cells ->
    median threshold -> 64-bit hash. Deterministic, numpy per clip."""

    def __init__(self, decoder=None, sample_rate: int = 16_000):
        self.decoder = decoder
        self.sample_rate = sample_rate

    def _decode(self, ref: str) -> np.ndarray:
        if self.decoder is not None:
            return self.decoder.decode(ref, None)
        h = hashlib.sha256(ref.encode()).digest()
        n = self.sample_rate * (1 + h[3] % 9)
        rng = np.random.default_rng(int.from_bytes(h[4:8], "big"))
        return rng.standard_normal(n).astype(np.float32)

    def hash_samples(self, wav: np.ndarray) -> int:
        n = len(wav)
        if n < 64:
            wav = np.pad(wav, (0, 64 - n))
            n = 64
        seg = n // 8
        cells = np.empty((8, 8))
        for s in range(8):
            spec = np.abs(np.fft.rfft(wav[s * seg:(s + 1) * seg])) ** 2
            cells[s] = [b.sum() for b in np.array_split(spec, 8)]
        bits = np.flatnonzero(cells.ravel()[:64] > np.median(cells)
                              ).astype(np.uint64)
        if not len(bits):
            return 0
        return int(np.bitwise_or.reduce(np.uint64(1) << bits))

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        o_ref, o_id, o_fp = [], [], []
        for ref in refs:
            wav = self._decode(ref)
            o_ref.append(ref)
            o_fp.append(self.hash_samples(wav))
            o_id.append(int.from_bytes(
                hashlib.blake2b(ref.encode(), digest_size=8).digest(),
                "big") >> 1)
        return pa.table({
            "media_ref": pa.array(o_ref, pa.string()),
            "media_id": pa.array(o_id, pa.int64()),
            "afp": pa.array(np.array(o_fp, np.uint64).astype(np.int64),
                            pa.int64()),
        })


class AudioFeatures:
    """Audio feature-extraction stage shape: per media span, 'decode'
    (stub) a deterministic sample stream and emit duration + an 8-bin
    energy histogram. A real torchaudio/ffmpeg decoder injects via
    ``decoder=`` exactly like MediaFeatures."""

    def __init__(self, decoder=None, sample_rate: int = 16_000):
        self.decoder = decoder
        self.sample_rate = sample_rate

    def _decode(self, ref: str) -> np.ndarray:
        if self.decoder is not None:
            return self.decoder.decode(ref, None)
        h = hashlib.sha256(ref.encode()).digest()
        n = self.sample_rate * (1 + h[3] % 9)  # 1..9 s
        rng = np.random.default_rng(int.from_bytes(h[4:8], "big"))
        return rng.standard_normal(n).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        o_ref, o_dur, o_hist = [], [], []
        for ref in refs:
            wav = self._decode(ref)
            o_ref.append(ref)
            o_dur.append(len(wav) / self.sample_rate)
            energy = wav * wav
            hist, _ = np.histogram(energy, bins=8, range=(0.0, 9.0))
            o_hist.append((hist / max(hist.sum(), 1)).astype(
                np.float32).tolist())
        return pa.table({
            "media_ref": pa.array(o_ref, pa.string()),
            "duration_sec": pa.array(o_dur, pa.float64()),
            "energy_hist": pa.array(o_hist, pa.list_(pa.float32())),
        })


class FrameSampler:
    """Video frame-sampling stage shape: emits every Nth synthetic frame
    index per media span (decode stubbed the same way)."""

    def __init__(self, every_n: int = 30, decoder=None):
        self.every_n = every_n
        self.decoder = decoder or DeterministicFakeDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        o_ref, o_frame = [], []
        for ref in refs:
            h = hashlib.sha256(ref.encode()).digest()
            n_frames = 30 + h[7] % 270
            for fi in range(0, n_frames, self.every_n):
                o_ref.append(ref)
                o_frame.append(fi)
        return pa.table({"media_ref": pa.array(o_ref, pa.string()),
                         "frame_idx": pa.array(o_frame, pa.int32())})
