"""Pure-numpy microbench: BBoxGridIndex vs STRtree PIP candidate+refine
throughput, uniform vs clustered polygon sets. Shows why both structures
ship: the grid wins small/uniform fixture sets, the STR tree stays
balanced when polygons pile into a region (the grid's per-cell lists
skew). Appends nothing; prints a markdown table for BENCH/MICRO.md.

Usage: python scripts/microbench_rtree.py [n_points] [batch]
"""

from __future__ import annotations

import sys
import time

import numpy as np

from fairy_core_spark.functions.geometry import BBoxGridIndex, STRtree


def make_polys(m: int, clustered: bool, seed: int = 3) -> dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    polys = {}
    for i in range(m):
        if clustered:
            cy = 40.0 + rng.uniform(-2, 2)
            cx = -70.0 + rng.uniform(-2, 2)
        else:
            cy = rng.uniform(-60, 60)
            cx = rng.uniform(-170, 170)
        h, w = rng.uniform(0.05, 0.5, size=2)
        ring = np.array(
            [[cy - h, cx - w], [cy - h, cx + w], [cy + h, cx + w], [cy + h, cx - w],
             [cy - h, cx - w]]
        )
        polys[f"p{i}"] = ring
    return polys


def bench(index, lat, lon, batch: int) -> tuple[float, int]:
    t0 = time.monotonic()
    n_pairs = 0
    for s in range(0, len(lat), batch):
        n_pairs += len(index.contains_batch(lat[s:s + batch], lon[s:s + batch]))
    return time.monotonic() - t0, n_pairs


def main() -> int:
    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    rng = np.random.default_rng(11)

    print("| polygon set | index | build (s) | query (s) | pts/s | pairs |")
    print("|---|---|---|---|---|---|")
    for m, clustered, label in [
        (100, False, "100 uniform (fixture-like)"),
        (10_000, True, "10k clustered (hotspot)"),
    ]:
        polys = make_polys(m, clustered)
        if clustered:
            lat = 40.0 + rng.uniform(-3, 3, size=n_points)
            lon = -70.0 + rng.uniform(-3, 3, size=n_points)
        else:
            lat = rng.uniform(-80, 80, size=n_points)
            lon = rng.uniform(-180, 180, size=n_points)
        for name, cls in [("grid", BBoxGridIndex), ("rtree", STRtree)]:
            t0 = time.monotonic()
            idx = cls(polys)
            t_build = time.monotonic() - t0
            t_q, pairs = bench(idx, lat, lon, batch)
            print(
                f"| {label} | {name} | {t_build:.3f} | {t_q:.2f} "
                f"| {n_points / t_q:,.0f} | {pairs:,} |"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
