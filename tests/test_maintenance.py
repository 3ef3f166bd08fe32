"""Compaction gates: content-exact rewrite, file-count reduction,
rolling split at target_rows, and killed-run resume semantics."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from geojson_vt_ray.functions.maintenance import (_leaf_dirs,
                                                  compact_parquet)


def _fragmented_store(root, n_parts=2, files_per_part=16,
                      rows_per_file=10):
    """Hive store key=0../key=1.. with many tiny fragments."""
    n = 0
    for p in range(n_parts):
        leaf = root / f"key={p}"
        leaf.mkdir(parents=True)
        for f in range(files_per_part):
            ids = list(range(n, n + rows_per_file))
            n += rows_per_file
            pq.write_table(
                pa.table({"id": pa.array(ids, pa.int64()),
                          "v": pa.array([i * 2 for i in ids],
                                        pa.int64())}),
                str(leaf / f"frag-{f:03d}.parquet"))
    return n


def _read_ids(root) -> list[int]:
    out = []
    for cur, _d, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                out.extend(pq.read_table(os.path.join(cur, f))
                           .column("id").to_pylist())
    return sorted(out)


def test_compact_content_exact_and_fewer_files(ray_session, tmp_path):
    src, dst = tmp_path / "src", tmp_path / "dst"
    total = _fragmented_store(src)
    manifest = compact_parquet(str(src), str(dst), target_rows=1000)
    assert sorted(m["leaf"] for m in manifest) == ["key=0", "key=1"]
    assert all(m["files_in"] == 16 and m["files_out"] == 1
               for m in manifest)
    assert _read_ids(dst) == _read_ids(src) == list(range(total))
    # layout preserved
    assert _leaf_dirs(str(dst)) == _leaf_dirs(str(src))


def test_compact_rolls_at_target_rows(ray_session, tmp_path):
    src, dst = tmp_path / "src", tmp_path / "dst"
    _fragmented_store(src, n_parts=1, files_per_part=10,
                      rows_per_file=10)
    manifest = compact_parquet(str(src), str(dst), target_rows=35)
    # 100 rows in 10-row groups, roll when >= 35 -> 40/40/20
    assert manifest[0]["files_out"] == 3
    leaf = dst / "key=0"
    sizes = sorted(pq.read_table(str(leaf / f)).num_rows
                   for f in os.listdir(leaf) if f.endswith(".parquet"))
    assert sizes == [20, 40, 40]
    assert _read_ids(dst) == _read_ids(src)
    # row groups are coalesced (ceil(rows/35) per file), not passed
    # through from the 10-row inputs
    for f in os.listdir(leaf):
        if f.endswith(".parquet"):
            pf = pq.ParquetFile(str(leaf / f))
            assert pf.num_row_groups == -(-pf.metadata.num_rows // 35)


def test_compact_resume_skips_finished_and_cleans_partial(
        ray_session, tmp_path):
    src, dst = tmp_path / "src", tmp_path / "dst"
    _fragmented_store(src)
    # simulate a prior run that finished key=0 only
    first = compact_parquet(str(src), str(dst), target_rows=1000)
    assert len(first) == 2
    import shutil
    shutil.rmtree(str(dst / "key=1"))
    second = compact_parquet(str(src), str(dst), target_rows=1000)
    assert [m["leaf"] for m in second] == ["key=1"]   # key=0 skipped
    assert _read_ids(dst) == _read_ids(src)
    # a third run is a no-op
    assert compact_parquet(str(src), str(dst), target_rows=1000) == []


def test_compact_flat_unpartitioned_store(ray_session, tmp_path):
    """A flat dir (no hive keys) compacts into dst_dir itself."""
    src, dst = tmp_path / "src", tmp_path / "dst"
    src.mkdir()
    for f in range(8):
        ids = list(range(f * 10, f * 10 + 10))
        pq.write_table(pa.table({"id": pa.array(ids, pa.int64()),
                                 "v": pa.array(ids, pa.int64())}),
                       str(src / f"frag-{f:03d}.parquet"))
    manifest = compact_parquet(str(src), str(dst), target_rows=1000)
    assert manifest == [{"leaf": ".", "files_in": 8, "files_out": 1,
                         "rows": 80}]
    assert _read_ids(dst) == list(range(80))
    # rerun resumes as a no-op, not a silent empty "success"
    assert compact_parquet(str(src), str(dst), target_rows=1000) == []


def test_compact_exact_multiple_files_out(ray_session, tmp_path):
    """files_out matches disk when rows are an exact target multiple."""
    src, dst = tmp_path / "src", tmp_path / "dst"
    _fragmented_store(src, n_parts=1, files_per_part=10,
                      rows_per_file=10)
    manifest = compact_parquet(str(src), str(dst), target_rows=50)
    on_disk = [f for f in os.listdir(dst / "key=0")
               if f.endswith(".parquet")]
    assert manifest[0]["files_out"] == len(on_disk) == 2


def test_compact_discards_stale_inprogress(ray_session, tmp_path):
    """Leftover tmp parts from a killed run never leak into output."""
    src, dst = tmp_path / "src", tmp_path / "dst"
    _fragmented_store(src, n_parts=1, files_per_part=4,
                      rows_per_file=10)
    stale = dst / "key=0.inprogress"
    stale.mkdir(parents=True)
    pq.write_table(pa.table({"id": pa.array([999], pa.int64()),
                             "v": pa.array([999], pa.int64())}),
                   str(stale / "part-0007.parquet"))
    compact_parquet(str(src), str(dst), target_rows=1000)
    assert _read_ids(dst) == _read_ids(src)          # no 999 anywhere
    assert not stale.exists()


# ------------------------------------------------------------- IVM
def _events_ds(rows):
    """rows: (user_id, cents)"""
    import pyarrow as pa
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "cents": pa.array([r[1] for r in rows], pa.int64())}))


def test_ivm_update_equals_full_rebuild(ray_session, tmp_path):
    """Two sequential incremental folds == one-shot aggregate over
    the union; counts and sums exact; version dirs publish with
    _SUCCESS last."""
    import os

    from geojson_vt_ray.functions.maintenance import (ivm_update,
                                                      read_ivm)

    store = str(tmp_path / "agg")
    base = [(1, 100), (1, 50), (2, 10)]
    d1 = [(2, 5), (3, 1)]
    d2 = [(1, 7), (3, 2), (3, 3)]
    ivm_update(store, _events_ds(base), ["user_id"], ["cents"])
    ivm_update(store, _events_ds(d1), ["user_id"], ["cents"])
    p = ivm_update(store, _events_ds(d2), ["user_id"], ["cents"])
    assert os.path.basename(p) == "v0002"
    got = (read_ivm(store).to_pandas()
           .sort_values("user_id", ignore_index=True))
    # one-shot truth
    import pandas as pd
    full = pd.DataFrame(base + d1 + d2, columns=["user_id", "cents"])
    want = (full.groupby("user_id", as_index=False)
            .agg(cents=("cents", "sum"), n_rows=("cents", "size")))
    assert got["user_id"].tolist() == want["user_id"].tolist()
    assert got["cents"].tolist() == want["cents"].tolist()
    assert got["n_rows"].tolist() == want["n_rows"].tolist()


def test_ivm_stale_tmp_rebuilt(ray_session, tmp_path):
    """A marker-less version dir (killed run) is deleted and its
    version number reused; readers never see it."""
    import os

    import pytest

    from geojson_vt_ray.functions.maintenance import (ivm_update,
                                                      read_ivm)

    store = str(tmp_path / "agg")
    os.makedirs(os.path.join(store, "v0000"))  # stale, no _SUCCESS
    with pytest.raises(FileNotFoundError):
        read_ivm(store)
    ivm_update(store, _events_ds([(1, 1)]), ["user_id"], ["cents"])
    got = read_ivm(store).to_pandas()
    assert got["cents"].tolist() == [1]
    assert sorted(os.listdir(store))[0] == "v0000"
