#!/usr/bin/env python
"""Generate the committed media fixture set (tests/fixtures/media):
deterministic small PNGs (gray/RGB/RGBA) and 16-bit PCM WAVs, written
with the repo's own pure-python encoders (functions/mediacodec.py).
The multimodal real-decode tests run MediaFeatures/AudioFeatures over
these with PngFileDecoder/WavFileDecoder injected."""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from geojson_vt_ray.functions.mediacodec import png_encode, wav_encode

OUT = os.path.join(REPO, "tests", "fixtures", "media")


def main():
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(20260817)
    manifest = {"images": [], "audio": []}
    shapes = [(24, 32, 3), (17, 9, 3), (40, 40, 4), (12, 50, 1),
              (33, 21, 3), (8, 8, 1)]
    for i, (h, w, c) in enumerate(shapes):
        img = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
        # add structure so filters would matter if an encoder used them
        img[:, : w // 2] = (img[:, : w // 2] // 4) * 4
        name = f"img_{i}.png"
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(png_encode(img.squeeze() if c == 1 else img))
        manifest["images"].append(
            {"name": name, "height": h, "width": w, "channels": c})
    for i, dur in enumerate((0.25, 0.5, 1.0)):
        sr = 16_000
        n = int(sr * dur)
        t = np.arange(n) / sr
        wav = 0.5 * np.sin(2 * np.pi * (220 + 110 * i) * t)
        name = f"snd_{i}.wav"
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(wav_encode(wav, sr))
        manifest["audio"].append(
            {"name": name, "duration_sec": n / sr, "sample_rate": sr})
    with open(os.path.join(OUT, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"wrote {len(shapes)} PNGs + 3 WAVs to {OUT}")


if __name__ == "__main__":
    main()
