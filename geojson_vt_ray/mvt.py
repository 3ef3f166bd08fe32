"""Mapbox Vector Tile (MVT) binary sink — the vt-pbf companion of the
reference: geojson-vt users almost always serialize its tile JSON to
MVT protobuf for serving. Pure-Python protobuf WIRE-FORMAT encoding
(spec 2.1, public): no protobuf dependency, just varints + length
delimits.

Message layout (vector_tile.proto, spec 2.1):
  Tile:    layers = field 3 (len-delim, repeated)
  Layer:   version=15 varint (=2), name=1 string, features=2 repeated,
           keys=3 repeated string, values=4 repeated Value,
           extent=5 varint
  Feature: id=1 varint, tags=2 packed varint (key/value index pairs),
           type=3 varint (1 POINT, 2 LINESTRING, 3 POLYGON),
           geometry=4 packed uint32 command stream
  Value:   exactly one of string=1, float=2, double=3, int=4, uint=5,
           sint=6, bool=7
Geometry commands: CommandInteger = (id & 0x7) | (count << 3) with
MoveTo=1, LineTo=2, ClosePath=7; parameters are zigzag deltas from a
cursor that persists across a feature's parts. Input features are the
reference tile-JSON shape (`TileSet.get_tile`/`gen_tiles`): polygon
rings CLOSED (first == last) — the closing vertex is dropped and
ClosePath emitted, per spec.

A decoder lives alongside for the round-trip gate (tests assert
decode(encode(tile)) == tile for the golden fixture tiles); feature
ids are emitted only for integer ids (the spec has no string ids —
same rule as vt-pbf).
"""

from __future__ import annotations

import struct


def _varint(n: int) -> bytes:
    if n < 0:  # two's-complement 64-bit, 10 bytes (proto int rule)
        n &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _field(tag: int, wire: int) -> bytes:
    return _varint((tag << 3) | wire)


def _len_delim(tag: int, payload: bytes) -> bytes:
    return _field(tag, 2) + _varint(len(payload)) + payload


def _encode_value(v) -> bytes:
    if isinstance(v, bool):
        return _field(7, 0) + _varint(1 if v else 0)
    if isinstance(v, int):
        if v < 0:
            return _field(6, 0) + _varint(_zigzag(v))
        return _field(4, 0) + _varint(v)
    if isinstance(v, float):
        return _field(3, 1) + struct.pack("<d", v)
    return _len_delim(1, str(v).encode("utf-8"))


def _varint_array(vals) -> bytes:
    """Vectorized varint encoding of a uint64 numpy array — the MVT
    geometry hot path (one call per feature instead of one Python
    varint per vertex coordinate). Byte-identical to _varint."""
    import numpy as np
    v = np.asarray(vals, dtype=np.uint64)
    nbytes = np.ones(len(v), np.int64)
    for k in range(1, 10):
        nbytes += (v >= (np.uint64(1) << np.uint64(7 * k)))
    out = np.zeros(int(nbytes.sum()), np.uint8)
    pos = np.cumsum(nbytes) - nbytes
    for b in range(10):
        mask = nbytes > b
        if not mask.any():
            break
        byte = ((v[mask] >> np.uint64(7 * b))
                & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] - 1 > b).astype(np.uint8)
        out[pos[mask] + b] = byte | (cont << 7)
    return out.tobytes()


def _zigzag_arr(d):
    import numpy as np
    d = np.asarray(d, dtype=np.int64)
    return ((d << 1) ^ (d >> 63)).view(np.uint64)


def _encode_geometry(geometry, gtype: int) -> bytes:
    """Command stream for one feature, fully vectorized: build the
    uint64 command/parameter sequence with numpy delta+zigzag per
    part, then one batched varint pass."""
    import numpy as np
    nums: list = []
    cx = cy = 0

    def part_nums(pts, close: bool):
        nonlocal cx, cy
        if close and len(pts) > 1 and pts[0] == pts[-1]:
            pts = pts[:-1]
        a = np.asarray(pts, dtype=np.int64)
        dx = np.diff(a[:, 0], prepend=cx)
        dy = np.diff(a[:, 1], prepend=cy)
        zz = np.empty(2 * len(a), np.uint64)
        zz[0::2] = _zigzag_arr(dx)
        zz[1::2] = _zigzag_arr(dy)
        nums.append(np.array([(1 & 0x7) | (1 << 3)], np.uint64))
        nums.append(zz[:2])
        if len(a) > 1:
            nums.append(np.array([(2 & 0x7) | ((len(a) - 1) << 3)],
                                 np.uint64))
            nums.append(zz[2:])
        if close:
            nums.append(np.array([(7 & 0x7) | (1 << 3)], np.uint64))
        cx, cy = int(a[-1, 0]), int(a[-1, 1])

    if gtype == 1:
        a = np.asarray(geometry, dtype=np.int64)
        dx = np.diff(a[:, 0], prepend=0)
        dy = np.diff(a[:, 1], prepend=0)
        zz = np.empty(2 * len(a), np.uint64)
        zz[0::2] = _zigzag_arr(dx)
        zz[1::2] = _zigzag_arr(dy)
        nums.append(np.array([(1 & 0x7) | (len(a) << 3)], np.uint64))
        nums.append(zz)
    elif gtype == 2:
        for line in geometry:
            part_nums(line, close=False)
    else:
        for ring in geometry:
            part_nums(ring, close=True)
    return _varint_array(np.concatenate(nums))


def encode_tile(features, layer_name: str = "geojsonvt",
                extent: int = 4096) -> bytes:
    """Reference tile-JSON features -> one-layer MVT tile bytes."""
    keys: list[str] = []
    key_idx: dict[str, int] = {}
    values: list[bytes] = []
    val_idx: dict[tuple, int] = {}

    feats = bytearray()
    for f in features:
        body = bytearray()
        fid = f.get("id")
        if isinstance(fid, int) and not isinstance(fid, bool) \
                and fid >= 0:
            body += _field(1, 0) + _varint(fid)
        tags = f.get("tags") or {}
        if tags:
            pairs = bytearray()
            for k, v in tags.items():
                if k not in key_idx:
                    key_idx[k] = len(keys)
                    keys.append(k)
                vk = (type(v).__name__, v)
                if vk not in val_idx:
                    val_idx[vk] = len(values)
                    values.append(_encode_value(v))
                pairs += _varint(key_idx[k]) + _varint(val_idx[vk])
            body += _len_delim(2, bytes(pairs))
        body += _field(3, 0) + _varint(f["type"])
        body += _len_delim(4, _encode_geometry(f["geometry"],
                                               f["type"]))
        feats += _len_delim(2, bytes(body))

    layer = bytearray()
    layer += _field(15, 0) + _varint(2)  # version
    layer += _len_delim(1, layer_name.encode("utf-8"))
    layer += feats
    for k in keys:
        layer += _len_delim(3, k.encode("utf-8"))
    for v in values:
        layer += _len_delim(4, v)
    layer += _field(5, 0) + _varint(extent)
    return bytes(_len_delim(3, bytes(layer)))


# ----------------------------------------------------------- decoder
def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    n = shift = 0
    while True:
        b = buf[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, i
        shift += 7


def _iter_fields(buf: bytes):
    i = 0
    while i < len(buf):
        key, i = _read_varint(buf, i)
        tag, wire = key >> 3, key & 0x7
        if wire == 0:
            v, i = _read_varint(buf, i)
        elif wire == 2:
            ln, i = _read_varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wire == 5:
            v = buf[i:i + 4]
            i += 4
        elif wire == 1:
            v = buf[i:i + 8]
            i += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield tag, wire, v


def _decode_value(buf: bytes):
    for tag, _w, v in _iter_fields(buf):
        if tag == 1:
            return v.decode("utf-8")
        if tag == 2:
            return struct.unpack("<f", v)[0]
        if tag == 3:
            return struct.unpack("<d", v)[0]
        if tag == 4:
            return v - (1 << 64) if v >> 63 else v
        if tag == 5:
            return v
        if tag == 6:
            return _unzigzag(v)
        if tag == 7:
            return bool(v)
    return None


def _decode_geometry(buf: bytes, gtype: int):
    nums = []
    i = 0
    while i < len(buf):
        n, i = _read_varint(buf, i)
        nums.append(n)
    cx = cy = 0
    parts = []
    cur = None
    j = 0
    while j < len(nums):
        cmd, count = nums[j] & 0x7, nums[j] >> 3
        j += 1
        if cmd == 1:  # MoveTo
            for _ in range(count):
                cx += _unzigzag(nums[j])
                cy += _unzigzag(nums[j + 1])
                j += 2
                if gtype == 1:
                    parts.append([cx, cy])
                else:
                    cur = [[cx, cy]]
                    parts.append(cur)
        elif cmd == 2:  # LineTo
            for _ in range(count):
                cx += _unzigzag(nums[j])
                cy += _unzigzag(nums[j + 1])
                j += 2
                cur.append([cx, cy])
        elif cmd == 7:  # ClosePath -> re-close the ring
            cur.append(list(cur[0]))
        else:
            raise ValueError(f"bad geometry command {cmd}")
    return parts


def decode_tile(data: bytes) -> dict:
    """MVT bytes -> {layer_name: {"extent", "version", "features"}},
    features in the reference tile-JSON shape."""
    out = {}
    for tag, _w, lbuf in _iter_fields(data):
        if tag != 3:
            continue
        name, extent, version = "", 4096, 2
        keys, vals, raw_feats = [], [], []
        for t2, _w2, v2 in _iter_fields(lbuf):
            if t2 == 1:
                name = v2.decode("utf-8")
            elif t2 == 2:
                raw_feats.append(v2)
            elif t2 == 3:
                keys.append(v2.decode("utf-8"))
            elif t2 == 4:
                vals.append(_decode_value(v2))
            elif t2 == 5:
                extent = v2
            elif t2 == 15:
                version = v2
        feats = []
        for fb in raw_feats:
            fid, gtype, tag_pairs, geom = None, 0, [], b""
            for t3, w3, v3 in _iter_fields(fb):
                if t3 == 1:
                    fid = v3
                elif t3 == 2:
                    i = 0
                    while i < len(v3):
                        a, i = _read_varint(v3, i)
                        b, i = _read_varint(v3, i)
                        tag_pairs.append((a, b))
                elif t3 == 3:
                    gtype = v3
                elif t3 == 4:
                    geom = v3
            d = {"geometry": _decode_geometry(geom, gtype),
                 "type": gtype,
                 "tags": {keys[a]: vals[b] for a, b in tag_pairs}}
            if fid is not None:
                d["id"] = fid
            feats.append(d)
        out[name] = {"extent": extent, "version": version,
                     "features": feats}
    return out
