"""S2 cell index, vectorized numpy, implemented from the published S2
geometry algorithm (s2geometry.io; quadratic ST projection, Hilbert-curve
cell ids). No s2/h3 library ships in this sandbox — and shipping none to a
1000-executor cluster is a feature: this module is pure numpy.

The north rule allows "H3/S2"; S2 level 12 (~5.1 km^2 avg cell) is the
H3-res-7 (~5.2 km^2 avg hex) tiling equivalent used for raster<->vector
tiles (SURVEY.md §2.6).

All public entry points operate on numpy arrays (batched; called from Arrow
pandas_udfs). Cell ids are int64 (Spark LongType) carrying the standard S2
64-bit layout (3 face bits, 2*30 Hilbert position bits, trailing sentinel
bit). Ids on faces 4-5 have the top bit set and are negative as int64 —
equality joins, groupBy and prefix arithmetic are unaffected; only the
*numeric* sort order differs from uint64 (never relied on here).

Unit tests pin: roundtrip (encode -> center -> re-encode identity),
hierarchy (parent prefix containment), face centers, neighbor symmetry, and
locality (nearby points share prefixes).
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_MAX_SIZE = 1 << MAX_LEVEL  # leaf cells per face edge

# Hilbert curve traversal tables (published S2 constants)
_SWAP, _INVERT = 1, 2
_POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
_POS_TO_ORIENTATION = (_SWAP, 0, 0, _INVERT | _SWAP)

_LOOKUP_BITS = 4
_lookup_pos = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)
_lookup_ij = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)


def _init_lookup(level: int, i: int, j: int, orig_orient: int, pos: int, orient: int) -> None:
    if level == _LOOKUP_BITS:
        ij = (i << _LOOKUP_BITS) | j
        _lookup_pos[(ij << 2) | orig_orient] = (pos << 2) | orient
        _lookup_ij[(pos << 2) | orig_orient] = (ij << 2) | orient
        return
    level += 1
    i <<= 1
    j <<= 1
    pos <<= 2
    r = _POS_TO_IJ[orient]
    for index in range(4):
        ij = r[index]
        _init_lookup(
            level,
            i + (ij >> 1),
            j + (ij & 1),
            orig_orient,
            pos + index,
            orient ^ _POS_TO_ORIENTATION[index],
        )


for _o in (0, _SWAP, _INVERT, _SWAP | _INVERT):
    _init_lookup(0, 0, 0, _o, 0, _o)


# ---------- sphere <-> face/uv/st/ij ----------


def latlon_to_xyz(lat_deg: np.ndarray, lon_deg: np.ndarray) -> tuple[np.ndarray, ...]:
    phi, lam = np.radians(lat_deg), np.radians(lon_deg)
    cp = np.cos(phi)
    return cp * np.cos(lam), cp * np.sin(lam), np.sin(phi)


def xyz_to_face_uv(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    axis = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    comp = np.choose(axis, [x, y, z])
    face = axis + np.where(comp < 0, 3, 0)
    # per-face u/v formulas (see module docstring; published mapping).
    # np.select evaluates all six branches, so the five discarded ones can
    # divide by ~0 — overflow/divide/invalid are all harmless there.
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        u = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
            [y / x, -x / y, -x / z, z / x, z / y, -y / z],
        )
        v = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
            [z / x, z / y, -y / z, y / x, -x / y, -x / z],
        )
    return face.astype(np.int64), u, v


def face_uv_to_xyz(face: np.ndarray, u: np.ndarray, v: np.ndarray):
    one = np.ones_like(u)
    x = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [one, -u, -u, -one, v, v],
    )
    y = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [u, one, -v, -v, -one, u],
    )
    z = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [v, v, one, -u, -u, -one],
    )
    n = np.sqrt(x * x + y * y + z * z)
    return x / n, y / n, z / n


def uv_to_st(u: np.ndarray) -> np.ndarray:
    """Quadratic projection (published S2 UVtoST)."""
    with np.errstate(invalid="ignore"):  # np.where evaluates both branches
        return np.where(
            u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def st_to_uv(s: np.ndarray) -> np.ndarray:
    return np.where(
        s >= 0.5, (1.0 / 3.0) * (4.0 * s * s - 1.0), (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) ** 2)
    )


def st_to_ij(s: np.ndarray) -> np.ndarray:
    return np.clip(np.floor(s * _MAX_SIZE), 0, _MAX_SIZE - 1).astype(np.int64)


# ---------- (face,i,j) <-> cell id (Hilbert lookup, 8 chunks of 4 bits) ----------


def from_face_ij(face: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Leaf (level-30) cell id from face + leaf ij. Vectorized lookup walk."""
    face = np.asarray(face, dtype=np.int64)
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    pos = np.zeros_like(i, dtype=np.uint64)
    orient = (face & _SWAP).astype(np.int64)  # initial orientation per face
    mask = (1 << _LOOKUP_BITS) - 1
    for k in range(7, -1, -1):
        i4 = (i >> (k * 4)) & mask
        j4 = (j >> (k * 4)) & mask
        key = (((i4 << _LOOKUP_BITS) | j4) << 2) | orient
        val = _lookup_pos[key]
        pos = (pos << np.uint64(8)) | (val >> 2).astype(np.uint64)
        orient = val & 3
    cid = (face.astype(np.uint64) << np.uint64(61)) | (pos << np.uint64(1)) | np.uint64(1)
    return cid.astype(np.int64)


def to_face_ij(cellid: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Leaf ij of the cell's min corner (works for any level id: lower bits
    below the sentinel decode as the Hilbert min position)."""
    u = np.asarray(cellid).astype(np.uint64)
    face = (u >> np.uint64(61)).astype(np.int64)
    pos = (u & np.uint64((1 << 61) - 1)) >> np.uint64(1)
    i = np.zeros(len(u), dtype=np.int64)
    j = np.zeros(len(u), dtype=np.int64)
    orient = (face & _SWAP).astype(np.int64)
    for k in range(7, -1, -1):
        p4 = ((pos >> np.uint64(k * 8)) & np.uint64(0xFF)).astype(np.int64)
        key = (p4 << 2) | orient
        val = _lookup_ij[key]
        ij = val >> 2
        i = (i << 4) | (ij >> _LOOKUP_BITS)
        j = (j << 4) | (ij & ((1 << _LOOKUP_BITS) - 1))
        orient = val & 3
    return face, i, j


def cell_level(cellid: np.ndarray) -> np.ndarray:
    """Level from the position of the lowest set bit."""
    u = np.asarray(cellid).astype(np.uint64)
    lsb = u & (~u + np.uint64(1))
    # lsb = 2^(2*(30-level)) * ... trailing-zero count / 2
    tz = np.zeros(len(u), dtype=np.int64)
    v = lsb.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(shift))
        tz += np.where(big, shift, 0)
        v = np.where(big, v >> np.uint64(shift), v)
    return MAX_LEVEL - (tz >> 1)


def parent(cellid: np.ndarray, level: int) -> np.ndarray:
    """Ancestor cell id at the given level."""
    u = np.asarray(cellid).astype(np.uint64)
    new_lsb = np.uint64(1 << (2 * (MAX_LEVEL - level)))
    return ((u & (~(new_lsb - np.uint64(1)))) | new_lsb).astype(np.int64)


def cell_id(lat_deg, lon_deg, level: int = MAX_LEVEL) -> np.ndarray:
    """lat/lon (degrees, arrays) -> S2 cell id at level. The one-call API."""
    lat_deg = np.asarray(lat_deg, dtype=np.float64)
    lon_deg = np.asarray(lon_deg, dtype=np.float64)
    x, y, z = latlon_to_xyz(lat_deg, lon_deg)
    face, u, v = xyz_to_face_uv(x, y, z)
    i = st_to_ij(uv_to_st(u))
    j = st_to_ij(uv_to_st(v))
    leaf = from_face_ij(face, i, j)
    return leaf if level == MAX_LEVEL else parent(leaf, level)


def cell_center_latlon(cellid: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Center lat/lon (degrees) of cells at any level."""
    cellid = np.asarray(cellid, dtype=np.int64)
    face, i, j = to_face_ij(cellid)
    level = cell_level(cellid)
    size = np.int64(1) << (MAX_LEVEL - level)
    # center = aligned min corner + half the edge, in leaf units
    # (for size=1 this is i+0.5, the leaf center)
    s = ((i & ~(size - 1)).astype(np.float64) + size / 2.0) / _MAX_SIZE
    t = ((j & ~(size - 1)).astype(np.float64) + size / 2.0) / _MAX_SIZE
    u = st_to_uv(s)
    v = st_to_uv(t)
    x, y, z = face_uv_to_xyz(face, u, v)
    lat = np.degrees(np.arcsin(np.clip(z, -1, 1)))
    lon = np.degrees(np.arctan2(y, x))
    return lat, lon


# ---------- neighbors (for kNN ring expansion) ----------


def _from_face_ij_wrap(face: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Handle ij coordinates beyond the face boundary by projecting through
    (u,v) space onto the correct adjacent face (published FromFaceIJWrap;
    uses the *linear* st projection on both legs, consistently)."""
    i = np.clip(i, -1, _MAX_SIZE)
    j = np.clip(j, -1, _MAX_SIZE)
    scale = 1.0 / _MAX_SIZE
    limit = 1.0 + np.finfo(np.float64).eps
    u = np.clip(scale * (2.0 * (i - _MAX_SIZE // 2) + 1.0), -limit, limit)
    v = np.clip(scale * (2.0 * (j - _MAX_SIZE // 2) + 1.0), -limit, limit)
    x, y, z = face_uv_to_xyz(face, u, v)
    f2, u2, v2 = xyz_to_face_uv(x, y, z)
    i2 = st_to_ij(0.5 * (u2 + 1.0))
    j2 = st_to_ij(0.5 * (v2 + 1.0))
    return from_face_ij(f2, i2, j2)


def neighbors(cellid: np.ndarray, level: int) -> np.ndarray:
    """All 8 edge+vertex neighbors of each cell at the same level.
    Returns (n, 8) int64. Handles face boundaries via uv-wrapping."""
    cellid = np.asarray(cellid, dtype=np.int64)
    face, i, j = to_face_ij(cellid)
    size = np.int64(1 << (MAX_LEVEL - level))  # edge length in leaf units
    i0 = i & ~(size - 1)
    j0 = j & ~(size - 1)
    out = np.empty((len(cellid), 8), dtype=np.int64)
    offs = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
    for idx, (di, dj) in enumerate(offs):
        ni = i0 + di * size
        nj = j0 + dj * size
        inside = (ni >= 0) & (ni < _MAX_SIZE) & (nj >= 0) & (nj < _MAX_SIZE)
        res = np.empty(len(cellid), dtype=np.int64)
        if inside.any():
            res[inside] = from_face_ij(face[inside], ni[inside], nj[inside])
        if (~inside).any():
            res[~inside] = _from_face_ij_wrap(face[~inside], ni[~inside], nj[~inside])
        out[:, idx] = parent(res, level)
    return out


def ring_interior(cellid: np.ndarray, level: int, r: int) -> np.ndarray:
    """Cells at Chebyshev ring exactly r, for cells whose whole ring stays
    INSIDE their face: pure (i,j) offset arithmetic, fully vectorized
    (n, 8r) — no per-row graph walk. Callers must route face-edge cells
    (``ring_is_interior`` False) to the exact BFS-over-``neighbors`` path:
    offset projection through a face boundary clips and would both
    duplicate and miss cells there."""
    cellid = np.asarray(cellid, dtype=np.int64)
    n = len(cellid)
    if r == 0:
        return cellid[:, None].copy()
    face, i, j = to_face_ij(cellid)
    size = np.int64(1 << (MAX_LEVEL - level))
    i0 = i & ~(size - 1)
    j0 = j & ~(size - 1)
    offs = [
        (di, dj)
        for di in range(-r, r + 1)
        for dj in range(-r, r + 1)
        if max(abs(di), abs(dj)) == r
    ]
    out = np.empty((n, len(offs)), dtype=np.int64)
    for idx, (di, dj) in enumerate(offs):
        out[:, idx] = parent(from_face_ij(face, i0 + di * size, j0 + dj * size), level)
    return out


def ring_is_interior(cellid: np.ndarray, level: int, r: int) -> np.ndarray:
    """True where the full Chebyshev-r ring of the cell stays on its face."""
    cellid = np.asarray(cellid, dtype=np.int64)
    _, i, j = to_face_ij(cellid)
    size = np.int64(1 << (MAX_LEVEL - level))
    ci = (i & ~(size - 1)) // size
    cj = (j & ~(size - 1)) // size
    n_side = np.int64(1 << level)
    return (ci >= r) & (ci < n_side - r) & (cj >= r) & (cj < n_side - r)


# ---------- metric bounds ----------

# Published S2 metric: minimum cell width derivative for the quadratic
# projection is 2*sqrt(2)/3; width(level) >= _MIN_WIDTH_DERIV / 2^level rad.
_MIN_WIDTH_DERIV = 2.0 * np.sqrt(2.0) / 3.0


def min_width_rad(level: int) -> float:
    """Lower bound on cell width (radians) at a level — the kNN ring
    expansion's guaranteed-covered-radius unit."""
    return _MIN_WIDTH_DERIV / (1 << level)


def avg_area_sr(level: int) -> float:
    """Average cell area (steradians): 4*pi/6 / 4^level."""
    return (4.0 * np.pi / 6.0) / (4.0**level)
