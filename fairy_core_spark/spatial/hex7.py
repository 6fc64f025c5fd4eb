"""Aperture-7 icosahedral HEXAGONAL hierarchical index ("hex7") —
the H3-class sibling of the S2 quadtree (`spatial/s2.py`) and the
Z-order/geohash scheme (`spatial/zorder.py`). Pure vectorized numpy,
batched through Arrow pandas_udfs, no native library (SURVEY.md §2.6
names "H3/S2"; the north rule allows either).

The ALGORITHM is the published H3-v4 pipeline (h3geo.org docs; Sahr,
"Geodesic discrete global grid systems", 2003): unit-sphere point ->
nearest icosahedron face -> gnomonic projection onto the face plane ->
hex-lattice coordinates at the target resolution -> hierarchical
aperture-7 digit extraction. Two deliberate, documented deltas from
the H3 *numbering*:

1. **Base-cell table**: H3's published cell NUMBERS depend on its
   122-entry base-cell data table (`baseCells.c`) — a data artifact,
   not an algorithm. Neither the table nor an `h3` library ships in
   this sandbox, so published-vector index parity is not honestly
   reproducible here; hex7 instead numbers cells structurally as
   (face, res-0 axial coords, aperture-7 digits). S2 and geohash carry
   the published-test-vector gates for this engine
   (tests/test_s2.py, tests/test_zorder.py).
2. **Face partition**: points are assigned to the face whose center is
   nearest (max dot product, deterministic smallest-index tie-break).
   Cells along face edges are therefore clipped by the face boundary
   instead of H3's cross-face base-cell stitching — every point still
   maps to exactly one cell, which is all binning / equi-join tiling
   needs. For covers and ring pads, :func:`neighbors_geo` /
   :func:`disk_geo` stitch across faces geometrically (neighbor centers
   re-encoded through ``cell_id``); only exact cross-face ring TOPOLOGY
   (true k-rings at a seam) remains out of scope.

Aperture-7 math (the published lattice construction): in axial hex
coordinates (basis vectors equal length, 60° apart — complex basis
{1, e^(i*pi/3)}), multiplication by w = 2 + i*sqrt(3) (|w|^2 = 7) is
the aperture-7 similarity: rotation by atan(sqrt(3)/2) ~ 40.9°...
equivalently the published ~19.107° Class-III skew after the 60°
lattice symmetry, plus sqrt(7) scale. Its integer matrix in the axial
basis is B = [[1, -2], [2, 3]] (det 7 — each parent hex owns exactly 7
children arranged center + 6 neighbors). Digits are the 7 cosets of
Z^2 / B·Z^2 represented by the center+6-neighbor set; extraction runs
top-down: parent ~ rint(B^-1 · h), then an exact residue-correction
table (built by brute force at import, the robust equivalent of H3's
`_upAp7` rounding) lands the remainder in the 7-coset set.

Index layout (int64, non-negative): bits [59:63)=res, [54:59)=face,
[48:54)=i0+32, [42:48)=j0+32, then 14 digit fields of 3 bits each
(digit k at bits [39-3k : 42-3k)). Prefix property: parent id = child
id with the trailing digits zeroed and res rewritten —
`cell_to_parent` is pure bit math, and all ids at one res sort
children of one parent contiguously (locality for range pruning,
like S2).
"""

from __future__ import annotations

import numpy as np

MAX_RES = 14  # 14 x 3 digit bits fill the 42 bits below the j0 field

# --- icosahedron from first principles (golden-ratio vertices) ----------
_PHI = (1.0 + np.sqrt(5.0)) / 2.0
_VERTS = []
for a in (-1.0, 1.0):
    for b in (-_PHI, _PHI):
        _VERTS.append((0.0, a, b))
        _VERTS.append((a, b, 0.0))
        _VERTS.append((b, 0.0, a))
_VERTS = np.array(_VERTS)
_VERTS /= np.linalg.norm(_VERTS, axis=1, keepdims=True)


def _icosa_faces() -> np.ndarray:
    """20 faces as vertex index triples: the 20 triangles of the convex
    hull = triples of mutually-adjacent vertices (pairwise dot == 1/sqrt5,
    the icosahedron's neighbor cosine)."""
    n = len(_VERTS)
    adj = _VERTS @ _VERTS.T > 0.44  # neighbor cosine 1/sqrt(5) ~ 0.447
    faces = []
    for i in range(n):
        for j in range(i + 1, n):
            if not adj[i, j]:
                continue
            for k in range(j + 1, n):
                if adj[i, k] and adj[j, k]:
                    faces.append((i, j, k))
    assert len(faces) == 20, len(faces)
    return np.array(sorted(faces))


_FACES = _icosa_faces()
_CENTERS = _VERTS[_FACES].mean(axis=1)
_CENTERS /= np.linalg.norm(_CENTERS, axis=1, keepdims=True)
# face-local tangent basis: ex toward the face's first vertex, ey = n x ex
_EX = _VERTS[_FACES[:, 0]] - _CENTERS * (_VERTS[_FACES[:, 0]] * _CENTERS).sum(1, keepdims=True)
_EX /= np.linalg.norm(_EX, axis=1, keepdims=True)
_EY = np.cross(_CENTERS, _EX)

# res-0 hex edge in gnomonic plane units: ~face circumradius so a face is
# covered by O(1) res-0 cells (|i0|,|j0| <= 31 fits the 6-bit fields)
_S0 = 0.5
# axial basis at res 0 (pointy-top hex lattice)
_A0 = np.array([[_S0 * 1.5, _S0 * np.sqrt(3.0) / 2.0], [0.0, _S0 * np.sqrt(3.0)]]).T
_A0_INV = np.linalg.inv(_A0)
# aperture-7 similarity matrix (det 7): parent lattice = B . child lattice;
# B is multiplication by w = 2 + i*sqrt(3) in the axial complex basis, so
# children sit center + 6 neighbors around the parent (true hex nesting)
_B = np.array([[1.0, -2.0], [2.0, 3.0]])
_B_INV = np.linalg.inv(_B)  # = 1/7 [[3, 2], [-2, 1]]
# residues of Z^2 / B Z^2: center + 6 axial unit neighbors -> digit 0..6
_DIGIT_OF = {(0, 0): 0, (1, 0): 1, (0, 1): 2, (-1, 1): 3, (-1, 0): 4, (0, -1): 5, (1, -1): 6}
_IJ_OF_DIGIT = np.zeros((7, 2), dtype=np.int64)
for _ij, _d in _DIGIT_OF.items():
    _IJ_OF_DIGIT[_d] = _ij


def _build_residue_tables() -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """For every remainder r = h - B·rint(B^-1 h) (|r|_inf <= 3 by the
    rounding bound; table sized ±8 for safety): the unique (delta, digit)
    with r - B·delta in the 7-coset representative set. Also asserts the
    representative set IS a complete residue system of Z^2 / B·Z^2."""
    rng_ = 8
    size = 2 * rng_ + 1
    d_i = np.zeros((size, size), dtype=np.int64)
    d_j = np.zeros((size, size), dtype=np.int64)
    dig = np.full((size, size), -1, dtype=np.int64)
    for ri in range(-rng_, rng_ + 1):
        for rj in range(-rng_, rng_ + 1):
            hits = []
            for di in range(-7, 8):
                for dj in range(-7, 8):
                    rem = (ri - (di - 2 * dj), rj - (2 * di + 3 * dj))
                    if rem in _DIGIT_OF:
                        hits.append((di, dj, _DIGIT_OF[rem]))
            assert len(hits) == 1, f"residue set not a coset system at {(ri, rj)}: {hits}"
            d_i[ri + rng_, rj + rng_] = hits[0][0]
            d_j[ri + rng_, rj + rng_] = hits[0][1]
            dig[ri + rng_, rj + rng_] = hits[0][2]
    return d_i, d_j, dig, rng_


_CORR_DI, _CORR_DJ, _CORR_DIGIT, _CORR_RANGE = _build_residue_tables()


def _ll_to_xyz(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    la, lo = np.radians(lat), np.radians(lon)
    cl = np.cos(la)
    return np.stack([cl * np.cos(lo), cl * np.sin(lo), np.sin(la)], axis=-1)


def _xyz_to_ll(p: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lat = np.degrees(np.arcsin(np.clip(p[..., 2], -1.0, 1.0)))
    lon = np.degrees(np.arctan2(p[..., 1], p[..., 0]))
    return lat, lon


def _hexround(fi: np.ndarray, fj: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Nearest hex-lattice point via published cube rounding (axial ->
    cube -> round -> fix the largest-error axis -> axial)."""
    x, z = fi, fj
    y = -x - z
    rx, ry, rz = np.rint(x), np.rint(y), np.rint(z)
    dx, dy, dz = np.abs(rx - x), np.abs(ry - y), np.abs(rz - z)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def _nearest_face(p: np.ndarray) -> np.ndarray:
    return np.argmax(p @ _CENTERS.T, axis=-1)


def _gnomonic(p: np.ndarray, face: np.ndarray) -> np.ndarray:
    c, ex, ey = _CENTERS[face], _EX[face], _EY[face]
    q = p / np.maximum((p * c).sum(-1, keepdims=True), 1e-12) - c
    return np.stack([(q * ex).sum(-1), (q * ey).sum(-1)], axis=-1)


def _inv_gnomonic(xy: np.ndarray, face: np.ndarray) -> np.ndarray:
    c, ex, ey = _CENTERS[face], _EX[face], _EY[face]
    p = c + xy[..., :1] * ex + xy[..., 1:2] * ey
    return p / np.linalg.norm(p, axis=-1, keepdims=True)


def _matpow(m: np.ndarray, k: int) -> np.ndarray:
    out = np.eye(2)
    for _ in range(k):
        out = out @ m
    return out


_BPOW = [_matpow(_B, k) for k in range(MAX_RES + 1)]
_BINVPOW = [_matpow(_B_INV, k) for k in range(MAX_RES + 1)]


def ij_to_cell(face: np.ndarray, i: np.ndarray, j: np.ndarray, res: int) -> np.ndarray:
    """(face, full-res axial lattice coords) -> int64 cell ids: top-down
    digit extraction, res r -> r-1 via parent ~ rint(B^-1 h), then the
    residue-correction table lands the remainder in the 7-coset
    representative set (exact integer arithmetic throughout). Inverse of
    :func:`cell_to_ij` for any in-range lattice point."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}], got {res}")
    face = np.asarray(face, dtype=np.int64)
    ci = np.asarray(i, dtype=np.int64)
    cj = np.asarray(j, dtype=np.int64)
    digits = np.zeros(ci.shape + (MAX_RES,), dtype=np.int64)
    for r in range(res, 0, -1):
        pi = np.rint((3 * ci + 2 * cj) / 7.0).astype(np.int64)
        pj = np.rint((cj - 2 * ci) / 7.0).astype(np.int64)
        ri = ci - (pi - 2 * pj)  # h - B . parent
        rj = cj - (2 * pi + 3 * pj)
        pi = pi + _CORR_DI[ri + _CORR_RANGE, rj + _CORR_RANGE]
        pj = pj + _CORR_DJ[ri + _CORR_RANGE, rj + _CORR_RANGE]
        digits[..., r - 1] = _CORR_DIGIT[ri + _CORR_RANGE, rj + _CORR_RANGE]
        ci, cj = pi, pj
    # res-0 coords must fit the 6-bit cell-id fields; clipping here would
    # silently alias an out-of-range lattice point (reachable via public
    # ij_to_cell/grid_disk inputs) to a WRONG cell id — fail loud instead,
    # matching explode_children's MAX_RES convention.
    if bool(np.any((ci < -32) | (ci > 31) | (cj < -32) | (cj > 31))):
        raise ValueError(
            "res-0 axial coords out of the 6-bit cell-id range [-32, 31]: "
            "input (face, i, j) does not name a lattice point of this face"
        )
    i0, j0 = ci, cj
    out = (np.int64(res) << np.int64(59)) | (face << np.int64(54))
    out = out | ((i0 + 32) << np.int64(48)) | ((j0 + 32) << np.int64(42))
    for k in range(res):
        out = out | (digits[..., k] << np.int64(39 - 3 * k))
    return out


def cell_id(lat: np.ndarray, lon: np.ndarray, res: int) -> np.ndarray:
    """(lat°, lon°) arrays -> hex7 int64 cell ids at resolution res."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}], got {res}")
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    p = _ll_to_xyz(lat, lon)
    face = _nearest_face(p)
    xy = _gnomonic(p, face)
    # fractional axial coords at res: B^res . A0^-1 . xy
    fij = xy @ (_BPOW[res] @ _A0_INV).T
    i, j = _hexround(fij[..., 0], fij[..., 1])
    return ij_to_cell(face, i, j, res)


def cell_res(cell: np.ndarray) -> np.ndarray:
    return (np.asarray(cell, dtype=np.int64) >> 59) & 0xF


def cell_to_parent(cell: np.ndarray, parent_res: int | None = None) -> np.ndarray:
    """Pure bit math: zero the digits below parent_res, rewrite res."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell_res(cell)
    pr = res - 1 if parent_res is None else parent_res
    if np.any(pr < 0) or np.any(pr > res):
        raise ValueError("parent_res must be in [0, res]")
    pr = np.broadcast_to(np.asarray(pr, dtype=np.int64), cell.shape)
    keep_digits = np.zeros_like(cell)
    for k in range(MAX_RES):
        keep_digits |= np.where(k < pr, cell & (np.int64(7) << np.int64(39 - 3 * k)), 0)
    base = cell & ((np.int64(1) << np.int64(59)) - 1) & ~((np.int64(1) << np.int64(42)) - 1)
    return (pr << np.int64(59)) | base | keep_digits


def cell_center(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """cell ids -> (lat°, lon°) of cell centers (vectorized)."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell_res(cell)
    face = (cell >> 54) & 0x1F
    # Horner over depths: h = h0; for r in 1..res: h = B.h + d_r
    # (exact in float64 — |h| stays far below 2^53 at res <= 14)
    max_r = int(res.max()) if cell.size else 0
    hi = (((cell >> 48) & 0x3F) - 32).astype(np.float64)
    hj = (((cell >> 42) & 0x3F) - 32).astype(np.float64)
    for k in range(max_r):  # depth r = k + 1, digit index k
        active = k < res
        d = np.where(active, (cell >> np.int64(39 - 3 * k)) & 7, 0)
        di = _IJ_OF_DIGIT[d][..., 0].astype(np.float64)
        dj = _IJ_OF_DIGIT[d][..., 1].astype(np.float64)
        nhi = hi - 2.0 * hj + di
        nhj = 2.0 * hi + 3.0 * hj + dj
        hi = np.where(active, nhi, hi)
        hj = np.where(active, nhj, hj)
    # xy = A0 . B^-res . h   (per-res inverse powers, masked loop)
    for _step in range(max_r):
        active = res > _step
        nhi = _B_INV[0, 0] * hi + _B_INV[0, 1] * hj
        nhj = _B_INV[1, 0] * hi + _B_INV[1, 1] * hj
        hi = np.where(active, nhi, hi)
        hj = np.where(active, nhj, hj)
    xy = np.stack([hi, hj], axis=-1) @ _A0.T
    return _xyz_to_ll(_inv_gnomonic(xy, face))


# --- neighborhood / hierarchy ops (the H3 grid-API siblings:
#     gridDisk / cellToChildren / compactCells / uncompactCells) ----------


def cell_to_ij(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """cell ids -> (face, i, j, res): full-res integer axial lattice
    coords via exact int64 Horner (h = B·h + digit per level). Inverse of
    :func:`ij_to_cell`."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell_res(cell)
    face = (cell >> 54) & 0x1F
    i = ((cell >> 48) & 0x3F) - 32
    j = ((cell >> 42) & 0x3F) - 32
    max_r = int(res.max()) if cell.size else 0
    for k in range(max_r):  # depth r = k + 1, digit index k
        active = k < res
        d = np.where(active, (cell >> np.int64(39 - 3 * k)) & 7, 0)
        di = _IJ_OF_DIGIT[d][..., 0]
        dj = _IJ_OF_DIGIT[d][..., 1]
        ni = i - 2 * j + di  # B . h + digit
        nj = 2 * i + 3 * j + dj
        i = np.where(active, ni, i)
        j = np.where(active, nj, j)
    return face, i, j, res


def _hex_dist(di: int, dj: int) -> int:
    """hex (graph) distance of an axial offset: max of cube coords."""
    return max(abs(di), abs(dj), abs(di + dj))


def grid_disk(cell: np.ndarray, k: int) -> np.ndarray:
    """All cells within hex graph distance k (H3's gridDisk): decode to
    axial coords, add every offset with hex distance <= k (3k²+3k+1
    offsets), re-encode. (n,) -> (n, 3k²+3k+1); offsets ordered by
    (hex distance, offset), so column 0 is the cell itself and columns
    1-6 the immediate ring — deterministic output.

    Same-face lattice only (module doc, delta 2): across a face boundary
    the disk continues on this face's gnomonic lattice rather than
    stitching onto the neighbor face's, so a boundary cell's disk can
    contain ids no point ever encodes to. Harmless for superset
    prefilters (pad-then-refine); not a topological k-ring there."""
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    cell = np.asarray(cell, dtype=np.int64)
    face, i, j, res = cell_to_ij(cell)
    r0 = int(res[0]) if cell.size else 0
    if cell.size and not np.all(res == r0):
        raise ValueError("grid_disk requires all cells at one resolution")
    offs = np.array(
        sorted(
            ((di, dj) for di in range(-k, k + 1) for dj in range(-k, k + 1)
             if _hex_dist(di, dj) <= k),
            key=lambda o: (_hex_dist(*o), o),
        ),
        dtype=np.int64,
    ).reshape(-1, 2)
    ii = i[:, None] + offs[None, :, 0]
    jj = j[:, None] + offs[None, :, 1]
    ff = np.broadcast_to(face[:, None], ii.shape)
    return ij_to_cell(ff, ii, jj, r0)


def grid_distance(cell_a: np.ndarray, cell_b: np.ndarray) -> np.ndarray:
    """Hex graph distance between same-resolution cells (H3's
    gridDistance): decode both to axial coords, max-of-cube-coords on
    the offset — the metric grid_disk's ring structure is defined by.

    Same-face lattice only (module doc, delta 2): a cross-face pair has
    no honest distance on this face's gnomonic lattice, so it raises
    instead of silently returning a wrong number (fail-loud convention,
    cf. ij_to_cell's 6-bit range check)."""
    a = np.asarray(cell_a, dtype=np.int64)
    b = np.asarray(cell_b, dtype=np.int64)
    fa, ia, ja, ra = cell_to_ij(a)
    fb, ib, jb, rb = cell_to_ij(b)
    if a.size and not np.array_equal(ra, rb):
        raise ValueError("grid_distance requires both cells at one resolution")
    if a.size and not np.array_equal(fa, fb):
        raise ValueError(
            "grid_distance is same-face lattice only; got a cross-face pair"
        )
    di, dj = ib - ia, jb - ja
    return np.maximum(np.maximum(np.abs(di), np.abs(dj)), np.abs(di + dj))


def grid_path_cells(cell_a: int, cell_b: int) -> np.ndarray:
    """Cells on the hex line from a to b inclusive (H3's gridPathCells):
    cube-space linear interpolation sampled at unit hex spacing, each
    sample snapped with the published cube rounding. A deterministic
    epsilon nudge (+1e-7 on i, +2e-7 on j, applied to every sample)
    breaks exact half-way ties so the path can't flip with float noise.

    Returns grid_distance+1 cells, endpoints included; consecutive
    cells are grid neighbors and all cells are distinct
    (property-tested). Same-face lattice only, like grid_distance."""
    a = np.asarray([cell_a], dtype=np.int64)
    b = np.asarray([cell_b], dtype=np.int64)
    d = int(grid_distance(a, b)[0])
    fa, ia, ja, ra = cell_to_ij(a)
    if d == 0:
        return a.copy()
    _, ib, jb, _ = cell_to_ij(b)
    t = np.linspace(0.0, 1.0, d + 1)
    fi = float(ia[0]) * (1.0 - t) + float(ib[0]) * t + 1e-7
    fj = float(ja[0]) * (1.0 - t) + float(jb[0]) * t + 2e-7
    ii, jj = _hexround(fi, fj)
    # endpoints are exact integers +- the nudge: snap is guaranteed
    return ij_to_cell(np.full(d + 1, fa[0]), ii, jj, int(ra[0]))


def neighbors_geo(cell: np.ndarray) -> np.ndarray:
    """(n, 6) GEOMETRIC neighbors: the 6 lattice-neighbor center
    positions re-encoded through :func:`cell_id`. For interior cells this
    is exactly the lattice ring (the center of a neighbor re-encodes to
    itself); at a face boundary the displaced center falls on the
    adjacent face and resolves to that face's nearest cell — geometric
    stitching across faces. Adjacent faces' lattices do not align
    (closing an aperture-7 icosahedral grid exactly requires H3's 12
    pentagons + base-cell table, out of scope here — module doc delta 2),
    so cross-face entries are nearest-cell approximations: use for
    superset covers and ring pads, not exact ring topology."""
    cell = np.asarray(cell, dtype=np.int64)
    face, i, j, res = cell_to_ij(cell)
    r0 = int(res[0]) if cell.size else 0
    if cell.size and not np.all(res == r0):
        raise ValueError("neighbors_geo requires all cells at one resolution")
    units = np.array(
        [(1, 0), (0, 1), (-1, 1), (-1, 0), (0, -1), (1, -1)], dtype=np.int64
    )
    ii = (i[:, None] + units[None, :, 0]).astype(np.float64)
    jj = (j[:, None] + units[None, :, 1]).astype(np.float64)
    basis = (_A0 @ _BINVPOW[r0]).T
    xy = np.stack([ii, jj], axis=-1) @ basis
    lat, lon = _xyz_to_ll(_inv_gnomonic(xy, face[:, None]))
    return cell_id(lat.ravel(), lon.ravel(), r0).reshape(ii.shape)


def disk_geo(cells: np.ndarray, k: int) -> np.ndarray:
    """Unique cell set within k geometric-neighbor hops of ``cells``
    (BFS over :func:`neighbors_geo`) — the face-stitching form of
    grid_disk for cover padding: same as the lattice disk in face
    interiors, and it follows the sphere across face boundaries."""
    out = np.unique(np.asarray(cells, dtype=np.int64))
    frontier = out
    for _ in range(k):
        nb = np.unique(neighbors_geo(frontier).ravel())
        frontier = nb[~np.isin(nb, out)]
        if frontier.size == 0:
            break
        out = np.unique(np.concatenate([out, frontier]))
    return out


def cell_to_children(cell: np.ndarray) -> np.ndarray:
    """Immediate children (H3's cellToChildren at res+1): append each of
    the 7 digits, rewrite res — pure bit math, (n,) -> (n, 7)."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell_res(cell)
    if np.any(res >= MAX_RES):
        raise ValueError(f"children beyond MAX_RES={MAX_RES}")
    base = (cell & ~(np.int64(0xF) << np.int64(59))) | ((res + 1) << np.int64(59))
    shift = 39 - 3 * res
    return base[:, None] | (np.arange(7, dtype=np.int64)[None, :] << shift[:, None])


def compact_cells(cells: np.ndarray) -> np.ndarray:
    """Minimal mixed-res set covering exactly the same area (H3's
    compactCells): wherever all 7 children of a parent are present they
    are replaced by the parent, cascading upward. Every hex7 parent has
    exactly 7 children (center + 6 coset neighbors), so compaction is
    exact — :func:`uncompact_cells` back to the original res roundtrips."""
    cur = np.unique(np.asarray(cells, dtype=np.int64))
    if cur.size == 0:
        return cur
    for r in range(int(cell_res(cur).max()), 0, -1):
        mask = cell_res(cur) == r
        at_r, rest = cur[mask], cur[~mask]
        if at_r.size == 0:
            continue
        parents = cell_to_parent(at_r)
        up, counts = np.unique(parents, return_counts=True)
        full = up[counts == 7]
        keep = at_r[~np.isin(parents, full)]
        # unique per level: a produced parent may already exist in `rest`
        # (input holding a cell alongside its children — invalid per H3's
        # contract, tolerated here); a duplicate would inflate the next
        # level's sibling count past 7 and block legitimate compaction
        cur = np.unique(np.concatenate([rest, keep, full]))
    return np.sort(cur)


def uncompact_cells(cells: np.ndarray, res: int) -> np.ndarray:
    """Expand a (possibly mixed-res) cell set to uniform ``res`` (H3's
    uncompactCells); every input cell must be at res <= ``res``."""
    cur = np.asarray(cells, dtype=np.int64)
    if np.any(cell_res(cur) > res):
        raise ValueError(f"uncompact target res {res} below an input cell's res")
    out = [cur[cell_res(cur) == res]]
    work = cur[cell_res(cur) < res]
    while work.size:
        ch = cell_to_children(work).ravel()
        out.append(ch[cell_res(ch) == res])
        work = ch[cell_res(ch) < res]
    return np.sort(np.concatenate(out))


def cell_to_boundary(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """cell ids -> hexagon corner coordinates (H3's cellToBoundary):
    returns (lat, lon) arrays of shape (n, 6), corners ordered cyclically.

    Each corner is the centroid of the cell center and two adjacent
    neighbor centers in the face plane — exactly the Voronoi vertex of
    the hex lattice, so adjacent cells share corners bit-for-bit up to
    float addition order (tested allclose) and the boundaries tile the
    face with no gaps. Computed per unique res; corners of face-boundary
    cells are projected through this face's gnomonic plane (module doc,
    delta 2)."""
    cell = np.asarray(cell, dtype=np.int64)
    face, i, j, res = cell_to_ij(cell)
    lat = np.empty(cell.shape + (6,), dtype=np.float64)
    lon = np.empty_like(lat)
    units = np.array(
        [(1, 0), (0, 1), (-1, 1), (-1, 0), (0, -1), (1, -1)], dtype=np.float64
    )
    for r in np.unique(res):
        m = res == r
        basis = (_A0 @ _BINVPOW[int(r)]).T  # rows: plane coords of axial units
        centers = np.stack([i[m], j[m]], axis=-1).astype(np.float64) @ basis
        nb = units @ basis  # (6, 2) neighbor-center offsets
        order = np.argsort(np.arctan2(nb[:, 1], nb[:, 0]))  # cyclic in plane
        nb = nb[order]
        corners = centers[:, None, :] + (nb + np.roll(nb, -1, axis=0))[None] / 3.0
        cl, cn = _xyz_to_ll(_inv_gnomonic(corners, face[m][:, None]))
        lat[m], lon[m] = cl, cn
    return lat, lon


def cell_inradius_deg(res: int) -> float:
    """Conservative ground inradius of a res cell in degrees: plane
    inradius edge·√3/2 at gnomonic scale (plane units ~ radians at the
    face center; toward face edges the same plane length covers LESS
    ground — d_plane = tan(θ) — so sampling pitches derived from this
    must divide by the worst-case gnomonic stretch, see callers)."""
    return float(np.degrees(_S0 * 7.0 ** (-res / 2.0) * np.sqrt(3.0) / 2.0))


def polyfill(ring: np.ndarray, res: int, mode: str = "cover") -> np.ndarray:
    """Polygon -> hex7 cells (H3's polygonToCells). ``ring`` is a closed
    (m, 2) [lat, lon] array. ``mode="centers"``: cells whose center lies
    inside the ring (H3's containment default). ``mode="cover"``: a
    superset of every cell any interior point encodes to — bbox sampled
    at 1/3 of the worst-case ground inradius, inside-samples' cells
    padded with grid_disk(2) (prefilter covering for equi-join + exact
    refine; over-cover is harmless there, and the refine restores
    exactness). Driver-side numpy for broadcast-scale polygons.

    Contract (validated): the ring must NOT cross the antimeridian or
    enclose a pole — the sample grid derives from the raw lat/lon bbox, so
    a ring whose lon span only "wraps" through ±180° would be sampled over
    the wrong (huge) span and silently under-covered (or trip the sample
    cap). Split such rings at the antimeridian before calling (the same
    contract as the ray-cast refine in functions/geometry.py). Rings wider
    than 180° of longitude are rejected as indistinguishable from a wrap."""
    from fairy_core_spark.functions.geometry import point_in_ring

    if mode not in ("centers", "cover"):
        raise ValueError(f"unknown polyfill mode {mode!r}")
    ring = np.asarray(ring, dtype=np.float64)
    if ring[:, 1].max() - ring[:, 1].min() > 180.0:
        raise ValueError(
            "ring spans >180 deg of longitude — antimeridian-crossing or "
            "pole-enclosing rings are not supported; split at +-180 first"
        )
    lat0, lat1 = ring[:, 0].min(), ring[:, 0].max()
    lon0, lon1 = ring[:, 1].min(), ring[:, 1].max()
    # worst-case gnomonic stretch within a face is bounded by ~2x for the
    # icosahedron (face circumradius ~37.4°, dθ/dd = cos²θ >= 0.5); /3 on
    # top of that so any ground disk of one inradius holds a sample
    pitch = cell_inradius_deg(res) / (2.0 * 3.0)
    n_lat = int((lat1 - lat0) / pitch) + 2
    n_lon = int((lon1 - lon0) / pitch) + 2
    if n_lat * n_lon > 4_000_000:
        raise ValueError(
            f"polyfill sample grid {n_lat}x{n_lon} too large; use a coarser res"
        )
    glat, glon = np.meshgrid(
        np.clip(np.linspace(lat0, lat1, n_lat), -90.0, 90.0),
        np.clip(np.linspace(lon0, lon1, n_lon), -180.0, 180.0),
    )
    glat, glon = glat.ravel(), glon.ravel()
    inside = point_in_ring(glat, glon, ring)
    cells = np.unique(cell_id(glat[inside], glon[inside], res))
    if mode == "centers":
        cl, cn = cell_center(cells)
        return cells[point_in_ring(cl, cn, ring)]
    if cells.size == 0:
        return cells
    # pad with BOTH the same-face lattice disk (clipped boundary cells can
    # own points even when their centers sit past the face edge) and the
    # geometric disk (follows the sphere onto adjacent faces) — union is
    # a superset of each, closing face-boundary sliver holes
    lattice = np.unique(grid_disk(cells, 2).ravel())
    return np.unique(np.concatenate([lattice, disk_geo(cells, 2)]))
