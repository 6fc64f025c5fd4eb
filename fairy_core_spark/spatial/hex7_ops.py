"""Spark-side hex7 hierarchy operators — zero-Python Column bit math over
the int64 cell layout of spatial/hex7.py (bits [59:63)=res, [54:59)=face,
[48:54)/[42:48)=res-0 coords, 14x3 digit bits below), plus distributed
compact/uncompact over cell-set DataFrames.

These are the engine's siblings of H3's grid API (cellToParent /
cellToChildren / compactCells / uncompactCells) expressed as Catalyst
expressions: parent extraction and child enumeration never leave the JVM
(whole-stage codegen), so rolling a res-9 tiling up to res-5 or exploding
a compacted covering back to query res is shuffle-only-where-the-groupBy-
is, with no Arrow hop. The point-encode itself (lat/lon -> cell) stays the
Arrow pandas_udf in spatial/ops.with_cell — that is the only Python in
any hex7 plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fairy_core_spark.spatial.hex7 import MAX_RES

_RES_FIELD_MASK = 0xF << 59  # bits [59:63)
_BELOW_RES_MASK = (1 << 59) - 1


def hex7_res_col(cell: Column) -> Column:
    """resolution field of a hex7 cell id (long)."""
    return F.shiftrightunsigned(cell, 59).bitwiseAND(F.lit(0xF))


def hex7_parent_col(cell: Column, parent_res: int) -> Column:
    """cellToParent as pure Column bit math: zero the digit fields below
    ``parent_res``, rewrite the res field. Mirrors the numpy
    spatial/hex7.cell_to_parent exactly (tested); rows must already be at
    res >= parent_res (ids below that res are the caller's bug — same
    contract as the numpy op, which validates, where a Column cannot)."""
    if not 0 <= parent_res <= MAX_RES:
        raise ValueError(f"parent_res must be in [0, {MAX_RES}], got {parent_res}")
    drop_bits = 42 - 3 * parent_res
    keep_mask = _BELOW_RES_MASK & ~((1 << max(drop_bits, 0)) - 1)
    return (
        F.lit(parent_res << 59).cast("long")
        .bitwiseOR(cell.bitwiseAND(F.lit(keep_mask).cast("long")))
    )


def hex7_descendant_range(parent: int, res: int) -> tuple[int, int]:
    """[lo, hi] id range covering EXACTLY the res-``res`` descendants of
    ``parent`` — the prefix property made operational: ids at one res
    sort all descendants of a parent contiguously, so 'inside this
    parent' is a single BETWEEN on the cell column. lo = parent's digit
    prefix with the res field rewritten; hi = lo with ALL bits below the
    prefix set — valid res-``res`` ids have zero digit bits beyond slot
    res-1, so the padding admits no foreign id, and it makes sibling
    ranges numerically adjacent (a full sibling set merges to exactly
    the parent's range in hex7_range_filter)."""
    pr = (int(parent) >> 59) & 0xF
    if not pr <= res <= MAX_RES:
        raise ValueError(f"need parent res {pr} <= res {res} <= {MAX_RES}")
    prefix = int(parent) & _BELOW_RES_MASK & ~((1 << (42 - 3 * pr)) - 1)
    lo = (res << 59) | prefix
    hi = lo | ((1 << (42 - 3 * pr)) - 1)
    return lo, hi


def hex7_range_filter(
    parents, res: int, cell_col: str = "hcell", max_ranges: int = 64
) -> Column:
    """Pushdown-able scan predicate: cell column (encoded at ``res``) is a
    descendant of any of ``parents`` (mixed-res iterable of hex7 ids).

    OR of BETWEENs on the stored cell column — on a `cluster_by_hex7`
    layout each BETWEEN prunes whole files/row groups via parquet footer
    min/max before any row is read (the hexagonal sibling of
    zorder.zrange_filter; same stored-column caveat). Numerically
    adjacent ranges are merged (sibling ids are contiguous, so a full
    sibling set collapses to one range); if more than ``max_ranges``
    survive, compact the parent set first (`compact_cells`) or use
    coarser parents — beyond ~64 ranges codegen falls back to
    interpreted evaluation."""
    ranges = sorted(hex7_descendant_range(int(p), res) for p in parents)
    if not ranges:
        raise ValueError("hex7_range_filter needs at least one parent cell")
    merged = [list(ranges[0])]
    for lo, hi in ranges[1:]:
        if lo <= merged[-1][1] + 1:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    if len(merged) > max_ranges:
        raise ValueError(
            f"{len(merged)} ranges after merging (> {max_ranges}); compact the "
            "parent set or use coarser parents"
        )
    c = F.col(cell_col)
    pred = c.between(F.lit(merged[0][0]), F.lit(merged[0][1]))
    for lo, hi in merged[1:]:
        pred = pred | c.between(F.lit(lo), F.lit(hi))
    return pred


def cluster_by_hex7(
    df: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    res: int = 9,
    n_partitions: int = 32,
    cell_col: str = "hcell",
) -> DataFrame:
    """Range-partition + sort by hex7 cell id for spatial data skipping
    (the hexagonal sibling of zorder.cluster_by_zorder): every output
    partition covers a contiguous id range = a compact spatial footprint,
    so `hex7_range_filter` predicates prune via footer stats. The cell
    column is KEPT (stored) — pushdown needs a stored column. Unlike the
    Z-order path the encode is one Arrow projection, but the id is
    hierarchy-aware: any coarser-res region is one BETWEEN, no bbox
    decomposition needed."""
    from fairy_core_spark.spatial.ops import with_cell

    return (
        with_cell(df, lat_col, lon_col, res, out=cell_col, scheme="hex7")
        .repartitionByRange(n_partitions, cell_col)
        .sortWithinPartitions(cell_col)
    )


def explode_children(df: DataFrame, cell_col: str = "cell", out: str | None = None) -> DataFrame:
    """cellToChildren: one row per (row, child) — 7 children per cell,
    res+1, all Column bit math (digit d appended at the next digit slot,
    res field rewritten). Mirrors numpy spatial/hex7.cell_to_children."""
    out = out or cell_col
    res = hex7_res_col(F.col(cell_col))
    base = F.col(cell_col).bitwiseAND(F.lit(~_RES_FIELD_MASK).cast("long"))
    new_res = F.shiftleft((res + F.lit(1)).cast("long"), 59)
    exploded = df.withColumn("__h7_d", F.explode(F.sequence(F.lit(0).cast("long"), F.lit(6).cast("long"))))
    child = new_res.bitwiseOR(base).bitwiseOR(
        F.expr(f"shiftleft(__h7_d, CAST(39 - 3 * (shiftrightunsigned(`{cell_col}`, 59) & 15) AS INT))")
    )
    # a res-14 cell has no digit slot left — fail loudly like the numpy
    # twin (a negative shift would otherwise fabricate garbage ids)
    child = F.when(res >= MAX_RES, F.raise_error(
        F.lit(f"cell_to_children beyond MAX_RES={MAX_RES}")
    ).cast("long")).otherwise(child)
    return exploded.withColumn(out, child).drop("__h7_d")


def compact_cells_df(df: DataFrame, cell_col: str = "cell") -> DataFrame:
    """compactCells, distributed: replace every full set of 7 siblings by
    their parent, cascading upward — the minimal mixed-res set covering
    exactly the input cells. Each level is one map-side-combinable
    groupBy(parent) plus an anti-join on the same key (the exchange is
    reused), over a set that only shrinks. Each level's result is
    localCheckpoint-materialized (the connected-components pattern,
    operators/dedup.py): the level plan references the working set three
    times (at-res / rest / sibling counts), so without truncation the
    lineage would branch 3x per level and recompute exponentially. Level
    count is bounded by the input's max res. Scale shape: state is the
    cell set itself, never collected."""
    cur = df.select(F.col(cell_col).cast("long").alias(cell_col)).distinct()
    bounds = cur.agg(
        F.min(hex7_res_col(F.col(cell_col))).alias("lo"),
        F.max(hex7_res_col(F.col(cell_col))).alias("hi"),
    ).first()
    if bounds["hi"] is None:
        return cur
    res = hex7_res_col(F.col(cell_col))
    cur = cur.localCheckpoint()
    for r in range(int(bounds["hi"]), 0, -1):
        at_r = cur.where(res == r).withColumn("__p", hex7_parent_col(F.col(cell_col), r - 1))
        rest = cur.where(res != r)
        full = (
            at_r.groupBy("__p")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") == 7)
            .select("__p")
        )
        keep = at_r.join(full, "__p", "left_anti").select(cell_col)
        parents = full.select(F.col("__p").alias(cell_col))
        # distinct per level — same reason as the numpy twin's np.unique:
        # a produced parent may already be in `rest` when the input held a
        # cell alongside its own children (invalid per H3; tolerated), and
        # the duplicate would break the next level's ==7 sibling count
        cur = rest.unionByName(keep).unionByName(parents).distinct().localCheckpoint()
    return cur


def uncompact_cells_df(df: DataFrame, cell_col: str = "cell", res: int = MAX_RES) -> DataFrame:
    """uncompactCells, distributed: expand a mixed-res cell set to uniform
    ``res`` by repeated 7-way child explosion (Column bit math, no
    shuffle at all). Each level is ONE conditional-explode projection —
    rows already at the target res pass through on a null explode element
    — so the plan stays linear (no union branching, no lineage blowup)
    and the whole expansion is a single narrow stage. Raises if any input
    cell sits below ``res``."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}], got {res}")
    cur = df.select(F.col(cell_col).cast("long").alias(cell_col))
    res_c = hex7_res_col(F.col(cell_col))
    bounds = cur.agg(F.min(res_c).alias("lo"), F.max(res_c).alias("hi")).first()
    if bounds["hi"] is None:
        return cur
    if int(bounds["hi"]) > res:
        raise ValueError(f"uncompact target res {res} below an input cell's res {bounds['hi']}")
    digits = F.sequence(F.lit(0).cast("long"), F.lit(6).cast("long"))
    passthrough = F.array(F.lit(None).cast("long"))
    for _ in range(res - int(bounds["lo"])):
        stepped = cur.withColumn(
            "__h7_d", F.explode(F.when(res_c < res, digits).otherwise(passthrough))
        )
        child = (
            F.shiftleft((res_c + F.lit(1)).cast("long"), 59)
            .bitwiseOR(F.col(cell_col).bitwiseAND(F.lit(~_RES_FIELD_MASK).cast("long")))
            .bitwiseOR(
                F.expr(
                    f"shiftleft(__h7_d, CAST(39 - 3 * (shiftrightunsigned(`{cell_col}`, 59) & 15) AS INT))"
                )
            )
        )
        cur = stepped.select(
            F.when(F.col("__h7_d").isNull(), F.col(cell_col)).otherwise(child).alias(cell_col)
        )
    return cur


def hex7_pyramid(
    df: DataFrame, cell_col: str = "cell", levels: tuple[int, ...] = (7, 5, 3)
) -> DataFrame:
    """Explode each row to every pyramid level as ``(res, cell)`` — the
    multi-resolution tile-rollup shape (map servers, heatmap pyramids,
    hypertable continuous aggregates): encode once at the finest res,
    derive every coarser cell as codegen bit math, and emit all levels
    through ONE codegen Generate(stack) so a downstream ``groupBy(res, cell)`` aggregates
    the whole pyramid in a single shuffle instead of ``len(levels)``
    scans (same one-pass idiom as SQL ROLLUP's Expand, but along the spatial
    hierarchy). Input cells must be at res ``max(levels)`` (the parent
    math contract of :func:`hex7_parent_col`); other columns pass through.
    """
    lvls = sorted({int(l) for l in levels}, reverse=True)
    if not lvls or not (0 <= lvls[-1] and lvls[0] <= MAX_RES):
        raise ValueError(f"levels must be non-empty, all in [0, {MAX_RES}], got {levels}")
    return pyramid_stack(df, cell_col, lvls, hex7_parent_col)


def pyramid_stack(df: DataFrame, cell_col: str, levels, parent_col_fn) -> DataFrame:
    """Scheme-agnostic core of the pyramid explode: project the base cell
    plus ``parent_col_fn(cell, level)`` for each coarser level, then emit
    all of them through one ``stack`` (codegen Generate). ``levels`` must
    already be validated + sorted descending; the base level is the
    identity column (rows must be at that resolution)."""
    lvls = list(levels)
    base = lvls[0]
    others = [c for c in df.columns if c != cell_col]
    taken = set(others) & {"res", "cell"}
    if taken:
        raise ValueError(
            f"pyramid output columns (res, cell) collide with input columns "
            f"{sorted(taken)} — rename or drop them first"
        )
    proj = df.select(
        *others,
        F.col(cell_col).alias(f"__pyr{base}"),
        *[parent_col_fn(F.col(cell_col), l).alias(f"__pyr{l}") for l in lvls[1:]],
    )
    pairs = ", ".join(f"{l}, `__pyr{l}`" for l in lvls)
    return proj.select(
        *others, F.expr(f"stack({len(lvls)}, {pairs}) AS (res, cell)")
    )
