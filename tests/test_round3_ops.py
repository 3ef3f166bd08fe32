"""Adversarial edge cases for the round-3 graph/spatial/curation
operators, on crafted corpora (the registry oracle sweep pins them on
the full synthetic tables; these pin the degenerate paths)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(tmp_path, name, **cols):
    pq.write_table(pa.table(cols), str(tmp_path / f"{name}.parquet"))
    return str(tmp_path)


def test_triangle_count_crafted_graph(ray_session, tmp_path):
    """Orders {1:[1,2,3,2], 2:[3,4], 3:[4,5,1]} give edge set
    {12,13,23,34,14,15,45} -> triangles (1,2,3), (1,3,4), (1,4,5);
    per-node counts 1:3, 2:1, 3:2, 4:2, 5:1. Exercises both
    orientations and the duplicate-(order,part) dedup (order 1 lists
    part 2 twice)."""
    from geojson_vt_ray.pipelines.queries import q_triangle_count
    ords = [1, 1, 1, 1, 2, 2, 3, 3, 3]
    parts = [1, 2, 3, 2, 3, 4, 4, 5, 1]
    sf = _write(tmp_path, "lineitem",
                l_orderkey=pa.array(ords, pa.int64()),
                l_partkey=pa.array(parts, pa.int64()))
    got = q_triangle_count(sf)
    df = got.to_pandas()
    m = dict(zip(df["part"], df["n_tri"]))
    assert m == {1: 3, 2: 1, 3: 2, 4: 2, 5: 1}


def test_graph_bfs_disconnected_and_isolated_seed(ray_session, tmp_path):
    """Two components plus an isolated seed: seeds (part %% 97 == 0)
    are 97 (connected to 2) and 194 (no edges). Distances: 97:0,
    194:0, 2:1, 1:2, 3:2; parts 50/60 unreachable and absent."""
    from geojson_vt_ray.pipelines.queries import q_graph_bfs
    # component A: 97-2, 2-1, 2-3 ; component B: 50-60 (no seed)
    ords = [1, 1, 2, 2, 3, 3, 4, 4]
    parts = [97, 2, 2, 1, 2, 3, 50, 60]
    tmp = _write(tmp_path, "lineitem",
                 l_orderkey=pa.array(ords, pa.int64()),
                 l_partkey=pa.array(parts, pa.int64()))
    _write(tmp_path, "part",
           p_partkey=pa.array([1, 2, 3, 50, 60, 97, 194], pa.int64()))
    got = q_graph_bfs(tmp)
    df = got.to_pandas() if not isinstance(got, pa.Table) \
        else got.to_pandas()
    m = dict(zip(df["node"], df["dist"]))
    assert m == {97: 0, 194: 0, 2: 1, 1: 2, 3: 2}


def test_grid_cluster_uniform_corpus_has_no_core(ray_session, tmp_path):
    """A perfectly uniform cell occupancy means NO cell reaches 1.25x
    the mean, so the result is empty — exercises the zero-edge / empty
    label-propagation path."""
    from geojson_vt_ray.pipelines.queries import q_grid_cluster
    # 4 events per cell in 4 distinct cells: ids congruent mod
    # lcm(3600,1600)=28800 share coords; bases 900 apart land in
    # different z6 cells
    ev = np.array(sorted(base + k * 28800 for base in (0, 900, 1800, 2700)
                         for k in range(4)), np.int64)
    ts = pd.to_datetime(np.zeros(len(ev)), unit="s")
    sf = _write(tmp_path, "events",
                event_id=pa.array(ev, pa.int64()),
                ts=pa.array(ts, pa.timestamp("us")),
                user_id=pa.array(np.zeros(len(ev), np.int64)),
                value=pa.array(np.zeros(len(ev))),
                event_type=pa.array(["x"] * len(ev), pa.string()),
                props=pa.array(["{}"] * len(ev), pa.string()))
    got = q_grid_cluster(sf)
    assert got.num_rows == 0


def test_focal_density_single_interior_event(ray_session, tmp_path):
    """One event in an interior cell contributes to exactly its 9
    neighbors, each with focal_n == 1."""
    from geojson_vt_ray.pipelines.queries import q_focal_density
    ev = np.array([1800], np.int64)  # lon 0 / lat -60: interior cell
    ts = pd.to_datetime([0], unit="s")
    sf = _write(tmp_path, "events",
                event_id=pa.array(ev, pa.int64()),
                ts=pa.array(ts, pa.timestamp("us")),
                user_id=pa.array([0], pa.int64()),
                value=pa.array([0.0]),
                event_type=pa.array(["x"], pa.string()),
                props=pa.array(["{}"], pa.string()))
    df = q_focal_density(sf).to_pandas()
    assert len(df) == 9
    assert (df["focal_n"] == 1).all()
    assert df["cell_x"].max() - df["cell_x"].min() == 2
    assert df["cell_y"].max() - df["cell_y"].min() == 2


def test_user_mode_tie_breaks_lexicographically(ray_session, tmp_path):
    from geojson_vt_ray.pipelines.queries import q_user_mode
    ts = pd.to_datetime([0, 1, 2, 3], unit="s")
    sf = _write(tmp_path, "events",
                event_id=pa.array([1, 2, 3, 4], pa.int64()),
                ts=pa.array(ts, pa.timestamp("us")),
                user_id=pa.array([7, 7, 7, 7], pa.int64()),
                value=pa.array([0.0] * 4),
                event_type=pa.array(["view", "click", "click", "view"],
                                    pa.string()),
                props=pa.array(["{}"] * 4, pa.string()))
    df = q_user_mode(sf).to_pandas()
    assert len(df) == 1
    assert df.iloc[0]["mode_type"] == "click"  # tie 2-2 -> lexicographic
    assert int(df.iloc[0]["n"]) == 2


def test_phash_planted_neardups_real_png(ray_session, tmp_path):
    """End-to-end image near-dup: REAL PNG encode/decode, DCT
    perceptual hash, banded hamming pairs. Planted: 3 lightly-perturbed
    variants of one base image must pair with it (and transitively with
    each other where within radius); 6 unrelated random images must
    not. The banded pair set must equal brute-force hamming <= radius
    over all hashes (pigeonhole completeness at radius <= n_bands-1)."""
    import itertools
    import ray.data as rd
    from geojson_vt_ray.functions.mediacodec import (PngFileDecoder,
                                                     png_encode)
    from geojson_vt_ray.functions.multimodal import PerceptualHash
    from geojson_vt_ray.functions.dedup import banded_hamming_pairs

    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    imgs = {"base.png": base}
    for i in range(3):
        v = base.copy()
        # small local perturbation: a dim 4x4 patch
        y, x = 4 * (i + 1), 6 * (i + 1)
        v[y:y + 4, x:x + 4] = v[y:y + 4, x:x + 4] // 2
        imgs[f"var{i}.png"] = v
    for i in range(6):
        imgs[f"rand{i}.png"] = rng.integers(0, 256, (48, 64, 3),
                                            dtype=np.uint8)
    for name, img in imgs.items():
        (tmp_path / name).write_bytes(png_encode(img))

    refs = sorted(imgs)
    ds = rd.from_arrow(pa.table({"media_ref": pa.array(refs)}))
    hashed = ds.map_batches(
        PerceptualHash(decoder=PngFileDecoder(str(tmp_path))),
        batch_format="pyarrow").materialize()
    hdf = hashed.to_pandas()

    radius = 6
    got = banded_hamming_pairs(hashed, "phash", "media_id",
                               max_hamming=radius)
    got_pairs = set(zip(got.column("id_a").to_pylist(),
                        got.column("id_b").to_pylist()))

    by_id = dict(zip(hdf["media_id"], np.uint64(hdf["phash"])))
    ref_of = dict(zip(hdf["media_id"], hdf["media_ref"]))
    want = set()
    for a, b in itertools.combinations(sorted(by_id), 2):
        if bin(int(by_id[a] ^ by_id[b])).count("1") <= radius:
            want.add((a, b))
    assert got_pairs == want  # banded blocking is lossless at radius 6

    planted = {r for p in want for r in
               (ref_of[p[0]], ref_of[p[1]])}
    assert "base.png" in planted and "var0.png" in planted
    assert not any(r.startswith("rand") for r in planted)


def test_phash_deterministic(ray_session):
    from geojson_vt_ray.pipelines.queries import q_image_phash
    a = q_image_phash("/root/testdata/sf0.001").to_pandas()
    b = q_image_phash("/root/testdata/sf0.001").to_pandas()
    a = a.sort_values("media_id", ignore_index=True)
    b = b.sort_values("media_id", ignore_index=True)
    assert a.equals(b)
    assert len(a) > 0 and a["media_id"].is_unique


def test_audio_fp_planted_neardups_real_wav(ray_session, tmp_path):
    """Audio analogue of the phash gate: REAL 16-bit PCM WAV
    encode/decode, spectral fingerprint, banded hamming pairs ==
    brute force; planted low-noise variants pair with the base,
    unrelated clips do not."""
    import itertools
    import ray.data as rd
    from geojson_vt_ray.functions.mediacodec import (WavFileDecoder,
                                                     wav_encode)
    from geojson_vt_ray.functions.multimodal import AudioFingerprint
    from geojson_vt_ray.functions.dedup import banded_hamming_pairs

    rng = np.random.default_rng(5)
    t = np.arange(16_000 * 2) / 16_000.0
    base = (0.4 * np.sin(2 * np.pi * 440 * t)
            + 0.2 * np.sin(2 * np.pi * 1313 * t)
            + 0.1 * rng.standard_normal(len(t)))
    clips = {"base.wav": base}
    for i in range(3):
        clips[f"var{i}.wav"] = base + 0.002 * rng.standard_normal(
            len(t))
    for i in range(6):
        clips[f"rand{i}.wav"] = (
            0.4 * np.sin(2 * np.pi * (200 + 150 * i) * t)
            + 0.3 * rng.standard_normal(len(t)))
    for name, wav in clips.items():
        (tmp_path / name).write_bytes(wav_encode(wav * 0.5))

    refs = sorted(clips)
    ds = rd.from_arrow(pa.table({"media_ref": pa.array(refs)}))
    hashed = ds.map_batches(
        AudioFingerprint(decoder=WavFileDecoder(str(tmp_path))),
        batch_format="pyarrow").materialize()
    hdf = hashed.to_pandas()

    radius = 6
    got = banded_hamming_pairs(hashed, "afp", "media_id",
                               max_hamming=radius)
    got_pairs = set(zip(got.column("id_a").to_pylist(),
                        got.column("id_b").to_pylist()))
    by_id = dict(zip(hdf["media_id"], np.uint64(hdf["afp"])))
    ref_of = dict(zip(hdf["media_id"], hdf["media_ref"]))
    want = set()
    for a, b in itertools.combinations(sorted(by_id), 2):
        if bin(int(by_id[a] ^ by_id[b])).count("1") <= radius:
            want.add((a, b))
    assert got_pairs == want
    planted = {r for p in want for r in (ref_of[p[0]], ref_of[p[1]])}
    assert "base.wav" in planted and "var0.wav" in planted
    assert not any(r.startswith("rand") for r in planted)


def test_attribution_pairs_boundary_and_no_clicks(ray_session,
                                                  tmp_path):
    """Window boundaries are inclusive on both ends; a bucket with
    views but no clicks (or vice versa) returns empty, typed."""
    from geojson_vt_ray.pipelines.queries import (_ATTR_WINDOW_US,
                                                  q_attribution_pairs)
    base = 1_700_000_000_000_000  # us
    w = _ATTR_WINDOW_US
    rows = [
        (1, base, 7, "view"),            # view at t0
        (2, base, 7, "click"),           # click at SAME ts -> pair
        (3, base + w, 7, "click"),       # click at t0+W -> pair
        (4, base + w + 1, 7, "click"),   # 1us past -> no pair
        (5, base, 8, "view"),            # user with no clicks
    ]
    ts = pd.to_datetime([r[1] for r in rows], unit="us")
    sf = _write(tmp_path, "events",
                event_id=pa.array([r[0] for r in rows], pa.int64()),
                ts=pa.array(ts, pa.timestamp("us")),
                user_id=pa.array([r[2] for r in rows], pa.int64()),
                value=pa.array([0.0] * len(rows)),
                event_type=pa.array([r[3] for r in rows], pa.string()),
                props=pa.array(["{}"] * len(rows), pa.string()))
    df = q_attribution_pairs(sf).to_pandas()
    got = sorted(zip(df["view_id"], df["click_id"], df["dt_us"]))
    assert got == [(1, 2, 0), (1, 3, w)]


def test_window_dedup_cross_batch_winner(ray_session, tmp_path):
    """The (ts, event_id)-min winner must survive even when duplicates
    of a (user, type, window) key land in different input batches —
    the pre-combine is per-batch, the finish must be global."""
    from geojson_vt_ray.pipelines.queries import q_window_dedup
    import ray.data as rd
    base = 1_700_000_000_000_000
    n = 40
    ts = pd.to_datetime([base + (i % 7) for i in range(n)], unit="us")
    sf = _write(tmp_path, "events",
                event_id=pa.array(list(range(n, 0, -1)), pa.int64()),
                ts=pa.array(ts, pa.timestamp("us")),
                user_id=pa.array([1] * n, pa.int64()),
                value=pa.array([0.0] * n),
                event_type=pa.array(["x"] * n, pa.string()),
                props=pa.array(["{}"] * n, pa.string()))
    df = q_window_dedup(sf).to_pandas()
    assert len(df) == 1
    # winner: smallest ts (base+0 -> i in {0,7,...,35}), then smallest
    # event_id = n - i for the largest such i -> event_id = 5
    assert int(df.iloc[0]["first_event_id"]) == 5


def test_user_paths_respects_order_and_cap(ray_session, tmp_path):
    from geojson_vt_ray.pipelines.queries import q_user_paths
    n = 12
    ts = pd.to_datetime(list(range(n))[::-1], unit="s")  # reversed
    sf = _write(tmp_path, "events",
                event_id=pa.array(list(range(n)), pa.int64()),
                ts=pa.array(ts, pa.timestamp("us")),
                user_id=pa.array([3] * n, pa.int64()),
                value=pa.array([0.0] * n),
                event_type=pa.array([f"t{i}" for i in range(n)],
                                    pa.string()),
                props=pa.array(["{}"] * n, pa.string()))
    df = q_user_paths(sf).to_pandas()
    assert len(df) == 1
    # ts order is the REVERSE of event_id order; first 10 by ts
    want = ">".join(f"t{i}" for i in range(n - 1, n - 11, -1))
    assert df.iloc[0]["path"] == want


def test_geojsonseq_source_matches_featurecollection(ray_session,
                                                     tmp_path):
    """A corpus split across two .geojsonl shards must parse to a doc
    table byte-identical to the single-FeatureCollection path (same
    doc ids, seq and spans), so tiles built from either are equal."""
    import json
    from geojson_vt_ray.sources.docs import (doc_table_from_geojson,
                                             load_seed_geometries)
    from geojson_vt_ray.sources.geojsonseq import read_docs_geojsonseq

    feats = load_seed_geometries()[:10]
    want = doc_table_from_geojson({"type": "FeatureCollection",
                                   "features": feats})
    # shard 0: first 4 features (with a blank line); shard 1: the rest
    (tmp_path / "a.geojsonl").write_text(
        "\n".join(json.dumps(f) for f in feats[:4]) + "\n\n")
    (tmp_path / "b.geojsonl").write_text(
        "\n".join(json.dumps(f) for f in feats[4:]) + "\n")
    got = (read_docs_geojsonseq(str(tmp_path)).to_pandas()
           .sort_values("seq", ignore_index=True))
    wdf = want.to_pandas()
    assert got["doc_id"].tolist() == wdf["doc_id"].tolist()
    assert got["seq"].tolist() == wdf["seq"].tolist()
    assert got["spans"].map(str).tolist() == \
        wdf["spans"].map(str).tolist()


def test_trajectory_len_single_event_user(ray_session, tmp_path):
    from geojson_vt_ray.pipelines.queries import q_trajectory_len
    ts = pd.to_datetime([0, 5, 10], unit="s")
    sf = _write(tmp_path, "events",
                event_id=pa.array([100, 200, 300], pa.int64()),
                ts=pa.array(ts, pa.timestamp("us")),
                user_id=pa.array([1, 1, 2], pa.int64()),
                value=pa.array([0.0] * 3),
                event_type=pa.array(["x"] * 3, pa.string()),
                props=pa.array(["{}"] * 3, pa.string()))
    df = q_trajectory_len(sf).to_pandas().set_index("user_id")
    assert int(df.loc[2, "n_steps"]) == 0
    assert int(df.loc[2, "path_len"]) == 0
    assert int(df.loc[1, "n_steps"]) == 1
    # steps: |200%3600-100%3600| + |200%1600-100%1600| = 100+100
    assert int(df.loc[1, "path_len"]) == 200
