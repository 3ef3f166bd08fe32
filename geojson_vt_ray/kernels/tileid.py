"""Tile id bit-math.

Reference: /root/reference/src/index.js:202-204
(``toID(z,x,y) = ((2^z * y + x) * 32) + z``), x-wrap at index.js:169 and
ancestor shifts at index.js:183-185. Valid for z <= 24 within int64.
"""

from __future__ import annotations

import numpy as np


def tile_id(z: int, x: int, y: int) -> int:
    return (((1 << z) * y + x) * 32) + z


def tile_id_vec(z, x, y):
    z = np.asarray(z, dtype=np.int64)
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    return ((np.int64(1) << z) * y + x) * 32 + z


def wrap_x(z: int, x: int) -> int:
    z2 = 1 << z
    return (x + z2) & (z2 - 1)


def ancestor(z: int, x: int, y: int, up: int) -> tuple[int, int, int]:
    return z - up, x >> up, y >> up


def children(z: int, x: int, y: int):
    """The four child tiles in the reference's stack push order
    (index.js:151-154): tl, bl, tr, br."""
    return ((z + 1, x * 2, y * 2), (z + 1, x * 2, y * 2 + 1),
            (z + 1, x * 2 + 1, y * 2), (z + 1, x * 2 + 1, y * 2 + 1))
