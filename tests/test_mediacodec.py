"""Real (non-stub) media decode path: pure-python PNG/WAV codecs
(functions/mediacodec.py) injected into the multimodal stages over the
committed fixture set (tests/fixtures/media, tools/gen_media_fixtures)."""

import json
import os
import struct
import zlib

import numpy as np
import pyarrow as pa

from geojson_vt_ray.functions.mediacodec import (PngFileDecoder,
                                                 WavFileDecoder,
                                                 png_decode, png_encode,
                                                 wav_decode, wav_encode)

MEDIA_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "media")
MANIFEST = json.load(open(os.path.join(MEDIA_DIR, "manifest.json")))


def test_png_roundtrip_all_fixture_shapes():
    rng = np.random.default_rng(5)
    for h, w, c in ((7, 5, 1), (16, 16, 3), (9, 21, 4), (1, 1, 3)):
        img = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
        out = png_decode(png_encode(img.squeeze() if c == 1 else img))
        assert out.shape == (h, w, c)
        assert (out == img).all()


def _encode_with_filter(img: np.ndarray, f: int) -> bytes:
    """PNG writer applying filter ``f`` to every scanline (spec-exact
    forward filtering) so png_decode's unfilter paths are all covered."""
    h, w, c = img.shape
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int32)
    lines = []
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        cur = flat[y]
        left = np.concatenate([np.zeros(c, np.int32), cur[:-c]])
        upleft = np.concatenate([np.zeros(c, np.int32), prev[:-c]])
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            filt = cur - ((left + prev) >> 1)
        elif f == 4:
            p = left + prev - upleft
            pa_, pb, pc = (np.abs(p - left), np.abs(p - prev),
                           np.abs(p - upleft))
            pred = np.where((pa_ <= pb) & (pa_ <= pc), left,
                            np.where(pb <= pc, prev, upleft))
            filt = cur - pred
        lines.append(bytes([f]) + (filt & 0xFF).astype(np.uint8).tobytes())
        prev = cur

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 3: 2, 4: 6}[c], 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + chunk(b"IEND", b""))


def test_png_decode_all_filter_types():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (11, 13, 3), dtype=np.uint8)
    for f in range(5):
        out = png_decode(_encode_with_filter(img, f))
        assert (out == img).all(), f"filter {f} mis-decoded"


def test_png_rejects_unsupported():
    import pytest
    with pytest.raises(ValueError):
        png_decode(b"not a png at all")


def test_wav_roundtrip():
    sr = 16_000
    t = np.arange(sr // 4) / sr
    wav = 0.25 * np.sin(2 * np.pi * 440 * t)
    samples, sr2 = wav_decode(wav_encode(wav, sr))
    assert sr2 == sr
    assert len(samples) == len(wav)
    assert np.abs(samples - wav).max() < 1e-3  # 16-bit quantization


def _media_corpus() -> pa.Table:
    """Doc table whose image spans reference the committed PNG fixtures
    and audio refs the WAVs (schema = BASELINE input_hint)."""
    from geojson_vt_ray.arrowio import SPAN_TYPE
    spans = []
    for i, im in enumerate(MANIFEST["images"]):
        spans.append([
            {"kind": "text", "text": f"caption {i}", "media_ref": "",
             "offset": 0},
            {"kind": "image", "text": "", "media_ref": im["name"],
             "offset": 1},
        ])
    return pa.table({
        "doc_id": pa.array([f"doc{i}" for i in range(len(spans))]),
        "spans": pa.array(spans, SPAN_TYPE)})


def test_media_features_real_png_decode(ray_session):
    """MediaFeatures with the REAL decoder injected: decoded dimensions
    must equal the committed fixtures' true dimensions (stub plumbing
    and real decode share the exact same pipeline)."""
    import ray.data as rd
    from geojson_vt_ray.functions.multimodal import MediaFeatures
    docs = rd.from_arrow(_media_corpus())
    out = docs.map_batches(MediaFeatures(decoder=PngFileDecoder(MEDIA_DIR)),
                           batch_format="pyarrow",
                           batch_size=4).to_pandas()
    want = {im["name"]: im for im in MANIFEST["images"]}
    assert len(out) == len(want)
    for _, row in out.iterrows():
        im = want[row["media_ref"]]
        assert (row["width"], row["height"]) == (im["width"], im["height"])
        assert row["n_channels"] == im["channels"]
        assert len(row["feature"]) == im["channels"] + 13


def test_audio_features_real_wav_decode(ray_session):
    import ray.data as rd
    from geojson_vt_ray.functions.multimodal import AudioFeatures
    refs = pa.table({"media_ref": pa.array(
        [a["name"] for a in MANIFEST["audio"]])})
    out = rd.from_arrow(refs).map_batches(
        AudioFeatures(decoder=WavFileDecoder(MEDIA_DIR)),
        batch_format="pyarrow").to_pandas()
    want = {a["name"]: a["duration_sec"] for a in MANIFEST["audio"]}
    assert len(out) == len(want)
    for _, row in out.iterrows():
        assert abs(row["duration_sec"] - want[row["media_ref"]]) < 1e-9
