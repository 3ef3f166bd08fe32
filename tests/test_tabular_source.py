"""Format-agnostic tabular source: CSV and JSONL dumps of a registry
table must produce the SAME canonical Arrow table (schema + values)
as the parquet original, and registry pipelines must run over the
normalized Dataset unchanged."""

import json

import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.parquet as pq
import pytest

from geojson_vt_ray.sources.tabular import read_table, CANONICAL


@pytest.fixture()
def doc_dumps(tmp_path):
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    p = tmp_path / "documents.parquet"
    pq.write_table(t, str(p))
    c = tmp_path / "documents.csv"
    pacsv.write_csv(t, str(c))
    j = tmp_path / "documents.jsonl"
    with open(j, "w") as f:
        for row in t.to_pylist():
            f.write(json.dumps(row) + "\n")
    return t, str(p), str(c), str(j)


def _canon(ds):
    df = ds.to_pandas().sort_values("doc_id", ignore_index=True)
    return df


def test_csv_jsonl_parquet_identical(ray_session, doc_dumps):
    t, p, c, j = doc_dumps
    want = _canon(read_table(p, "documents"))
    got_csv = _canon(read_table(c, "documents"))
    got_json = _canon(read_table(j, "documents"))
    assert want.equals(got_csv)
    assert want.equals(got_json)
    # canonical dtypes survived the format round trip
    sch = read_table(c, "documents").schema()
    types = dict(zip(sch.names, sch.types))
    for name, typ in CANONICAL["documents"].items():
        assert types[name] == typ, name


def test_events_timestamp_normalization(ray_session, tmp_path):
    """A JSONL events dump carries epoch-micros ints; the source must
    cast them back to timestamp[us] so time operators run unchanged."""
    rows = [{"event_id": 1, "ts": 3_600_000_000, "user_id": 7,
             "event_type": "click", "value": 1.5, "props": "{}"},
            {"event_id": 2, "ts": 7_200_000_000, "user_id": 7,
             "event_type": "view", "value": 2.0, "props": "{}"}]
    j = tmp_path / "events.jsonl"
    with open(j, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    ds = read_table(str(j), "events")
    sch = ds.schema()
    assert dict(zip(sch.names, sch.types))["ts"] == pa.timestamp("us")
    got = ds.to_pandas().sort_values("event_id", ignore_index=True)
    assert got["ts"].astype("int64").tolist() == [
        3_600_000_000, 7_200_000_000]  # datetime64[us] view


def test_unknown_table_and_extension_raise(ray_session, tmp_path):
    with pytest.raises(ValueError):
        read_table("/tmp/x.parquet", "nope")
    with pytest.raises(ValueError):
        read_table(str(tmp_path / "x.xml"), "documents")


def test_geojsonseq_sink_roundtrip(ray_session, tmp_path):
    """write_docs_geojsonseq -> read_docs_geojsonseq reproduces the
    IDENTICAL doc table (doc_id, seq, spans), across multiple shards,
    with atomic per-shard publish."""
    import os

    import ray.data as rd

    from geojson_vt_ray.sources.docs import (doc_table_from_geojson,
                                             load_seed_geometries)
    from geojson_vt_ray.sources.geojsonseq import (
        read_docs_geojsonseq, write_docs_geojsonseq)

    feats = load_seed_geometries()[:25]
    t = doc_table_from_geojson(
        {"type": "FeatureCollection", "features": feats})
    out = str(tmp_path / "seq")
    manifest = write_docs_geojsonseq(
        rd.from_arrow(t), out, rows_per_file=10).to_pandas()
    assert manifest["rows"].tolist() == [10, 10, 5]
    assert sorted(os.listdir(out)) == [
        "part-000000.geojsonl", "part-000001.geojsonl",
        "part-000002.geojsonl"]
    back = (read_docs_geojsonseq(out).to_pandas()
            .sort_values("seq", ignore_index=True))
    orig = t.to_pandas().sort_values("seq", ignore_index=True)
    assert back["doc_id"].tolist() == orig["doc_id"].tolist()
    assert back["seq"].tolist() == orig["seq"].tolist()
    assert back["spans"].apply(list).tolist() == \
        orig["spans"].apply(list).tolist()


def test_arrow_ipc_roundtrip_and_read(ray_session, tmp_path):
    """write_table_arrow shards by key with atomic publishes; reading
    the shard directory back through read_table reproduces the
    parquet original exactly (schema + values), including both IPC
    file and stream encodings."""
    import os

    from geojson_vt_ray.sources.tabular import write_table_arrow

    t = pq.read_table("/root/testdata/sf0.001/events.parquet")
    out = str(tmp_path / "arrow_out")
    man = write_table_arrow(t, out, key_col="event_id",
                            rows_per_file=400).to_pandas()
    assert man["rows"].sum() == t.num_rows
    assert len(man) == (t.num_rows + 399) // 400
    assert all(os.path.exists(p) for p in man["path"])
    assert not any(p.endswith(".tmp") for p in os.listdir(out))
    got = (read_table(out, "events").to_pandas()
           .sort_values("event_id", ignore_index=True))
    want = (t.to_pandas().sort_values("event_id", ignore_index=True))
    assert got.equals(want)
    # stream-format file is also accepted
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    with pa.OSFile(str(stream_dir / "events.arrow"), "wb") as f:
        with pa.ipc.new_stream(f, t.schema) as w:
            w.write_table(t)
    got2 = (read_table(str(stream_dir), "events").to_pandas()
            .sort_values("event_id", ignore_index=True))
    assert got2.equals(want)


def test_arrow_ipc_sink_rejects_bad_keys(ray_session, tmp_path):
    """Float key columns (silently floored) and negative keys (malformed
    part--00001.arrow names) must raise instead of corrupting the shard
    layout."""
    import pytest

    from geojson_vt_ray.sources.tabular import write_table_arrow

    bad_type = pa.table({"k": pa.array([1.5, 2.5], pa.float64()),
                         "v": pa.array([1, 2], pa.int64())})
    with pytest.raises(TypeError, match="must be integer"):
        write_table_arrow(bad_type, str(tmp_path / "a"), key_col="k")

    neg = pa.table({"k": pa.array([-3, 5], pa.int64()),
                    "v": pa.array([1, 2], pa.int64())})
    with pytest.raises(Exception, match="negative"):
        write_table_arrow(neg, str(tmp_path / "b"), key_col="k")
