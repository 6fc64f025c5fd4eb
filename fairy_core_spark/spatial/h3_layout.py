"""Published H3 v4 INDEX-LAYOUT compatibility — id-space operations over
*externally produced* H3 cell ids (the real library's numbering), without
the geographic base-cell table.

`spatial/hex7.py` implements the full H3-class *algorithm* with a
structural numbering, and documents why published cell NUMBERS are not
reproducible in this sandbox (the 122-entry base-cell data table is a
data artifact that doesn't ship here). This module closes the other half
of the interop gap: a user who already HAS H3-keyed data (ids minted by
the published library) can parse, validate, roll up to parents, expand to
children, and compact/uncompact those ids in this engine — every one of
those operations is pure bit arithmetic on the published index layout
(h3geo.org "H3 Index Representations", bit layout of cell mode):

    bit  63     : reserved, 0
    bits 59..62 : mode (1 = cell)
    bits 56..58 : reserved, 0 for cell mode
    bits 52..55 : resolution r in [0, 15]
    bits 45..51 : base cell in [0, 121]
    bits 3*(15-d)..3*(15-d)+2 : digit at res d (d = 1..15);
                  digits at d <= r are 0..6, digits at d > r are 7

Layout understanding is pinned by the library's own documented example
index (tests/test_h3_layout.py): 0x8928308280fffff decodes to mode 1 /
res 9 / base cell 20 with all set digits in 0..6, and the bit-math parent
at res 8 reproduces the documented 0x8828308281fffff — two independently
published strings related only through this arithmetic.

What still needs dropped-in data (and is NOT faked here): anything
geographic — lat/lon -> published id, cell boundaries, neighbor topology.
Those require the base-cell orientation table; see hex7.py's module doc.

Pentagon handling uses the published list of the 12 res-0 pentagon base
cells (PENTAGON_BASE_CELLS below) — pentagon flags transcribed from the
published base-cell table; they gate validity (the deleted K-subsequence:
a pentagon's first nonzero digit is never 1) and children counts
(1 + 5*(7^n - 1)/6 for a pentagon vs 7^n).

Reference parity: the reference repo has no spatial surface (SURVEY.md
§2.6 derives from the north rule, not reference files); this module is a
north-rule delta-closer flagged in VERDICT.md round 4 ("Published-H3 cell
numbering", next-round item 3).

Scale notes: every per-row operation here (validity, parent, resolution,
base cell) is a single Column bit expression — whole-stage codegen, no
Python, no shuffle. `children` explodes JVM-side via sequence+transform.
compact() is the only multi-pass op: one groupBy per resolution level
descended, each carrying only 8-byte ids.
"""
from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_RES = 15
CELL_MODE = 1
NUM_BASE_CELLS = 122

# The 12 res-0 pentagon base cells, transcribed from the published H3
# base-cell table (pentagon flags only — the geographic home-face/ijk
# columns of that table are deliberately NOT reproduced here).
PENTAGON_BASE_CELLS = (4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117)

_RES_SHIFT = 52
_BC_SHIFT = 45
_MODE_SHIFT = 59


def _digit_shift(d: int) -> int:
    """Bit offset of the 3-bit digit for resolution d (1..15)."""
    return 3 * (MAX_RES - d)


# ---------------------------------------------------------------- numpy --

def get_resolution(h: np.ndarray) -> np.ndarray:
    h = np.asarray(h, dtype=np.int64)
    return ((h >> np.int64(_RES_SHIFT)) & np.int64(0xF)).astype(np.int64)


def get_base_cell(h: np.ndarray) -> np.ndarray:
    h = np.asarray(h, dtype=np.int64)
    return ((h >> np.int64(_BC_SHIFT)) & np.int64(0x7F)).astype(np.int64)


def get_digit(h: np.ndarray, d: int) -> np.ndarray:
    """Digit at resolution d (1..15); 7 marks unused (d > res)."""
    if not 1 <= d <= MAX_RES:
        raise ValueError(f"digit resolution must be in [1, {MAX_RES}], got {d}")
    h = np.asarray(h, dtype=np.int64)
    return ((h >> np.int64(_digit_shift(d))) & np.int64(7)).astype(np.int64)


def is_valid_cell(h: np.ndarray) -> np.ndarray:
    """Published validity predicate, vectorized: high bit 0, cell mode,
    cell-mode reserved bits 0, base cell < 122, res-range digits 0..6,
    beyond-res digits all 7, and the pentagon deleted-K-subsequence rule
    (first nonzero digit of a pentagon-based id is never 1)."""
    h = np.asarray(h, dtype=np.int64)
    ok = h > 0  # bit 63 set -> negative; 0 is not a cell
    ok &= ((h >> np.int64(_MODE_SHIFT)) & np.int64(0xF)) == CELL_MODE
    ok &= ((h >> np.int64(56)) & np.int64(7)) == 0
    res = get_resolution(h)
    ok &= get_base_cell(h) < NUM_BASE_CELLS
    pent = np.isin(get_base_cell(h), PENTAGON_BASE_CELLS)
    seen_nonzero = np.zeros(h.shape, dtype=bool)
    for d in range(1, MAX_RES + 1):
        dig = get_digit(h, d)
        in_range = d <= res
        ok &= np.where(in_range, dig <= 6, dig == 7)
        first_nonzero = in_range & ~seen_nonzero & (dig != 0)
        ok &= ~(pent & first_nonzero & (dig == 1))
        seen_nonzero |= first_nonzero
    return ok


def is_pentagon(h: np.ndarray) -> np.ndarray:
    """A cell is a pentagon iff its base cell is one of the 12 pentagon
    base cells and every set digit is 0 (the center-child chain)."""
    h = np.asarray(h, dtype=np.int64)
    pent = np.isin(get_base_cell(h), PENTAGON_BASE_CELLS)
    res = get_resolution(h)
    for d in range(1, MAX_RES + 1):
        pent &= (d > res) | (get_digit(h, d) == 0)
    return pent


def cell_to_parent(h: np.ndarray, parent_res: int) -> np.ndarray:
    """Published parent op: set the res field, mark digits past it unused
    (7). Pure bit math — identical to the library for any valid input id."""
    if not 0 <= parent_res <= MAX_RES:
        raise ValueError(f"parent_res must be in [0, {MAX_RES}], got {parent_res}")
    h = np.asarray(h, dtype=np.int64)
    res = get_resolution(h)
    if bool(np.any(res < parent_res)):
        raise ValueError("cell_to_parent requires parent_res <= cell res")
    out = (h & ~(np.int64(0xF) << np.int64(_RES_SHIFT))) | (
        np.int64(parent_res) << np.int64(_RES_SHIFT)
    )
    for d in range(1, MAX_RES + 1):
        mask = np.int64(7) << np.int64(_digit_shift(d))
        out = np.where(d > parent_res, out | mask, out)
    return out.astype(np.int64)


def cell_to_center_child(h: np.ndarray, child_res: int) -> np.ndarray:
    """Set res to child_res and fill the new digits with 0 (the published
    center-child: digit 0 is the aperture-7 center)."""
    h = np.asarray(h, dtype=np.int64)
    res = get_resolution(h)
    if bool(np.any(res > child_res)):
        raise ValueError("cell_to_center_child requires child_res >= cell res")
    out = (h & ~(np.int64(0xF) << np.int64(_RES_SHIFT))) | (
        np.int64(child_res) << np.int64(_RES_SHIFT)
    )
    for d in range(1, MAX_RES + 1):
        mask = np.int64(7) << np.int64(_digit_shift(d))
        res_d_unused = np.asarray(res, dtype=np.int64) < d
        clear = res_d_unused & (d <= child_res)
        out = np.where(clear, out & ~mask, out)
    return out.astype(np.int64)


def cell_to_children_size(h: np.ndarray, child_res: int) -> np.ndarray:
    """7^n for hexagons, 1 + 5*(7^n - 1)/6 for pentagons (published
    closed forms; n = child_res - res)."""
    h = np.asarray(h, dtype=np.int64)
    res = get_resolution(h)
    if bool(np.any(res > child_res)):
        raise ValueError("cell_to_children_size requires child_res >= cell res")
    n = (np.int64(child_res) - res).astype(np.int64)
    sev = np.power(np.int64(7), n)
    hexes = sev
    pents = 1 + 5 * (sev - 1) // 6
    return np.where(is_pentagon(h), pents, hexes).astype(np.int64)


def cell_to_children(h: int, child_res: int) -> np.ndarray:
    """All children of one cell at child_res, sorted ascending. Hexagon
    cells expand to every base-7 digit string; pentagon cells drop the
    deleted-K subtrees (any child whose first new nonzero digit is 1),
    which reproduces the published 1 + 5*(7^n - 1)/6 count."""
    arr = np.asarray([h], dtype=np.int64)
    res = int(get_resolution(arr)[0])
    if child_res < res:
        raise ValueError("cell_to_children requires child_res >= cell res")
    n = child_res - res
    if n == 0:
        return arr.copy()
    if n * 3 > 45:  # > 7^15 children can't happen (child_res <= 15) but guard
        raise ValueError("child_res out of range")
    k = np.arange(7**n, dtype=np.int64)
    base = cell_to_center_child(np.full(k.shape, h, dtype=np.int64), child_res)
    first_nonzero_is_k = np.zeros(k.shape, dtype=bool)
    seen_nonzero = np.zeros(k.shape, dtype=bool)
    out = base
    for idx in range(n):
        d = res + 1 + idx  # resolution of this new digit
        dig = (k // np.int64(7 ** (n - 1 - idx))) % np.int64(7)
        out = out | (dig << np.int64(_digit_shift(d)))
        first = ~seen_nonzero & (dig != 0)
        first_nonzero_is_k |= first & (dig == 1)
        seen_nonzero |= first
    if bool(is_pentagon(np.asarray([h], dtype=np.int64))[0]):
        out = out[~first_nonzero_is_k]
    return np.sort(out.astype(np.int64))


def string_to_cell(s) -> np.ndarray:
    """Published string form -> int64 ids (hex, no 0x prefix)."""
    items = np.atleast_1d(np.asarray(s, dtype=object))
    vals = [np.int64(np.uint64(int(x, 16))) for x in items]
    return np.asarray(vals, dtype=np.int64)


def cell_to_string(h: np.ndarray) -> np.ndarray:
    """int64 ids -> published lowercase-hex strings."""
    h = np.asarray(h, dtype=np.int64)
    return np.asarray([format(np.uint64(x), "x") for x in h.ravel()], dtype=object).reshape(h.shape)


# ------------------------------------------------------------- columns --

def res_col(c: Column) -> Column:
    return F.shiftrightunsigned(c, _RES_SHIFT).bitwiseAND(F.lit(0xF))


def base_cell_col(c: Column) -> Column:
    return F.shiftrightunsigned(c, _BC_SHIFT).bitwiseAND(F.lit(0x7F))


def digit_col(c: Column, d: int) -> Column:
    return F.shiftrightunsigned(c, _digit_shift(d)).bitwiseAND(F.lit(7))


def parent_col(c: Column, parent_res: int) -> Column:
    """cell_to_parent as one Column bit expression (whole-stage codegen):
    clear+set the res nibble, OR in the unused-digit mask for digits
    parent_res+1..15 (a compile-time constant)."""
    if not 0 <= parent_res <= MAX_RES:
        raise ValueError(f"parent_res must be in [0, {MAX_RES}], got {parent_res}")
    unused_mask = 0
    for d in range(parent_res + 1, MAX_RES + 1):
        unused_mask |= 7 << _digit_shift(d)
    res_cleared = c.bitwiseAND(F.lit(~(0xF << _RES_SHIFT)))
    return (
        res_cleared.bitwiseOR(F.lit(parent_res << _RES_SHIFT))
        .bitwiseOR(F.lit(unused_mask))
        .cast("long")
    )


def is_valid_col(c: Column) -> Column:
    """is_valid_cell as a Column predicate (no Python). The digit checks
    compare each set digit against <=6 and each beyond-res digit against
    the unused marker 7; the pentagon deleted-K rule reads the first
    nonzero digit via ONE linear when-chain over the 15 fields (an
    accumulating seen/first fold would embed itself each level and blow
    the Catalyst tree up exponentially — 2^15 nodes hangs the optimizer).
    Scanning past res is safe: in a cell whose unused digits are the
    required 7s the chain stops at 7 (never 1), and a cell whose unused
    digits are corrupt is already rejected by the digit checks, so the
    pentagon term can't flip the conjunction."""
    res = res_col(c)
    ok = (c > 0) & (F.shiftrightunsigned(c, _MODE_SHIFT).bitwiseAND(F.lit(0xF)) == CELL_MODE)
    ok = ok & (F.shiftrightunsigned(c, 56).bitwiseAND(F.lit(7)) == 0)
    ok = ok & (base_cell_col(c) < NUM_BASE_CELLS)
    pent = base_cell_col(c).isin(*[F.lit(b) for b in PENTAGON_BASE_CELLS])
    fnz = None
    for d in range(1, MAX_RES + 1):
        dig = digit_col(c, d)
        in_range = F.lit(d) <= res
        ok = ok & F.when(in_range, dig <= 6).otherwise(dig == 7)
        fnz = F.when(dig != 0, dig) if fnz is None else fnz.when(dig != 0, dig)
    return ok & ~(pent & (fnz.otherwise(F.lit(0)) == 1))


def is_pentagon_col(c: Column) -> Column:
    res = res_col(c)
    pent = base_cell_col(c).isin(*[F.lit(b) for b in PENTAGON_BASE_CELLS])
    for d in range(1, MAX_RES + 1):
        pent = pent & ((F.lit(d) > res) | (digit_col(c, d) == 0))
    return pent


def children_col(c: Column, res: int, child_res: int) -> Column:
    """array<long> of children at child_res for SAME-RESOLUTION input
    cells at ``res`` (the fixed res keeps the expansion a compile-shape
    sequence/transform — callers with mixed res group by res first).
    Pentagon parents drop deleted-K subtrees via an is_valid filter over
    the generated ids (exactly the numpy path's rule)."""
    if child_res < res:
        raise ValueError("children_col requires child_res >= res")
    n = child_res - res
    center = (
        c.bitwiseAND(F.lit(~(0xF << _RES_SHIFT)))
        .bitwiseOR(F.lit(child_res << _RES_SHIFT))
    )
    clear_mask = 0
    for d in range(res + 1, child_res + 1):
        clear_mask |= 7 << _digit_shift(d)
    center = center.bitwiseAND(F.lit(~clear_mask))
    if n == 0:
        return F.array(center.cast("long"))

    def child(k: Column) -> Column:
        out = center
        for idx in range(n):
            d = res + 1 + idx
            # base-7 digit idx of k: floor(k / 7^(n-1-idx)) mod 7
            dig = F.pmod(F.floor(k / F.lit(float(7 ** (n - 1 - idx)))).cast("long"), F.lit(7))
            out = out.bitwiseOR((dig * F.lit(1 << _digit_shift(d))).cast("long"))
        return out.cast("long")

    kids = F.transform(F.sequence(F.lit(0), F.lit(7**n - 1)), child)
    # pentagon parents drop deleted-K subtrees; hexagon children of a valid
    # parent are all valid, so the filter only ever trims pentagon branches
    return F.filter(kids, lambda x: is_valid_col(x))


# ----------------------------------------------------------- dataframe --

def compact_cells_df(df: DataFrame, cell_col: str = "cell") -> DataFrame:
    """Published compact over a DataFrame of valid H3 ids (mixed res ok):
    replace every complete sibling set with its parent, cascading upward —
    a full set is 7 siblings, or 6 when the parent is a pentagon (its K
    child is deleted). Same distributed shape as the hex7 twin
    (spatial/hex7_ops.py compact_cells_df): one map-side-combinable
    groupBy(parent) + anti-join per level over a shrinking set, each level
    localCheckpoint-materialized so the 3-way branch on the working set
    doesn't recompute exponentially. Shuffle rows carry only 8-byte ids."""
    cur = df.select(F.col(cell_col).cast("long").alias(cell_col)).distinct()
    hi = cur.agg(F.max(res_col(F.col(cell_col)))).first()[0]
    if hi is None:
        return cur
    res = res_col(F.col(cell_col))
    cur = cur.localCheckpoint()
    for r in range(int(hi), 0, -1):
        at_r = cur.where(res == r).withColumn("__p", parent_col(F.col(cell_col), r - 1))
        rest = cur.where(res != r)
        need = F.when(is_pentagon_col(F.col("__p")), F.lit(6)).otherwise(F.lit(7))
        full = (
            at_r.groupBy("__p")
            .agg(F.count(F.lit(1)).alias("__n"), F.max(need).alias("__need"))
            .where(F.col("__n") == F.col("__need"))
            .select("__p")
        )
        keep = at_r.join(full, "__p", "left_anti").select(cell_col)
        parents = full.select(F.col("__p").alias(cell_col))
        # distinct per level: a produced parent may already be in `rest`
        # when the input held a cell alongside its own children (invalid
        # per H3; tolerated) — the duplicate would break the sibling count
        cur = rest.unionByName(keep).unionByName(parents).distinct().localCheckpoint()
    return cur


def uncompact_cells_df(df: DataFrame, child_res: int, cell_col: str = "cell") -> DataFrame:
    """Expand a (typically compact) mixed-res cover to uniform child_res:
    input rows are grouped by their resolution (children_col needs a
    compile-time res) and each group is ONE explode of a JVM-generated
    child array — no shuffle, no Python. Raises if any input cell sits
    below child_res."""
    if not 0 <= child_res <= MAX_RES:
        raise ValueError(f"child_res must be in [0, {MAX_RES}], got {child_res}")
    base = df.select(F.col(cell_col).cast("long").alias(cell_col))
    hi = base.agg(F.max(res_col(F.col(cell_col)))).first()[0]
    if hi is not None and int(hi) > child_res:
        raise ValueError(
            f"uncompact target res {child_res} below an input cell's res {hi}"
        )
    out = None
    for r in range(0, child_res + 1):
        at = base.where(res_col(F.col(cell_col)) == r)
        expanded = at.select(
            F.explode(children_col(F.col(cell_col), r, child_res)).alias(cell_col)
        )
        out = expanded if out is None else out.unionByName(expanded)
    return out
