"""DynSketch memory policy — which grids to drop under a byte budget.

Reference: MemoryCheck / DropNextGrid / DropGrid / GenDiagonalGridKeys /
GenHighestResolutionGridKeys (SpatialSketch.cpp:155-316):

- Phase 1: drop grids on odd diagonal exponent sums (kx + ky = 1, 3,
  5, ...) layer by layer (coarsest odd diagonals first in the reference's
  enumeration order).
- Phase 2: drop the L-shape — grids with kx or ky at the current finest
  live level — doubling the effective resolution (min_level += 1) each
  layer.

Here the policy is a *driver-side plan* over the sketch table's measured
per-grid sizes: given a byte budget, return the dropped-grid set and the
new floor level. Applying it is a metadata operation plus a partition
delete (grid_key is the table's partition column), and queries pick it
up through ``effective_cover``'s rewrite — no rebuild.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass
class DropPlan:
    dropped: frozenset            # (kx, ky) pairs
    min_level: int                # effective floor after phase-2 layers
    bytes_before: int
    bytes_after: int


def grid_sizes(sketch_df: DataFrame, levels: int) -> dict[tuple[int, int], int]:
    """Measured bytes per grid (payload sizes; the engine analogue of the
    reference's per-sketch GetSize accounting)."""
    rows = (sketch_df
            .groupBy("grid_key")
            .agg(F.sum(F.length("payload")).alias("bytes"))
            .collect())
    out = {}
    for r in rows:
        gk = int(r["grid_key"])
        out[(gk % levels, gk // levels)] = int(r["bytes"])
    return out


def phase1_order(levels: int, min_level: int) -> list[tuple[int, int]]:
    """Odd-diagonal grids, layer by layer (SpatialSketch.cpp:223-269).
    Never offers the floor diagonal's corner grid."""
    L = levels - 1
    out = []
    for diag in range(2 * min_level + 1, 2 * L, 2):
        layer = [(kx, diag - kx) for kx in range(min_level, L + 1)
                 if min_level <= diag - kx <= L]
        out.extend(sorted(layer))
    return out


def phase2_layers(levels: int, min_level: int):
    """L-shaped layers at the finest live level; each layer's removal
    bumps the floor (SpatialSketch.cpp:273-296 resolution doubling)."""
    L = levels - 1
    lvl = min_level
    while lvl < L:
        layer = sorted({(lvl, ky) for ky in range(lvl, L + 1)}
                       | {(kx, lvl) for kx in range(lvl, L + 1)})
        yield lvl + 1, layer
        lvl += 1


def plan_drops(sizes: dict[tuple[int, int], int], levels: int,
               min_level: int, budget_bytes: int) -> DropPlan:
    total = sum(sizes.values())
    dropped: set[tuple[int, int]] = set()
    cur = total
    floor = min_level
    if cur <= budget_bytes:
        return DropPlan(frozenset(), floor, total, cur)
    for g in phase1_order(levels, min_level):
        if cur <= budget_bytes:
            break
        if g in sizes and g not in dropped:
            cur -= sizes[g]
            dropped.add(g)
    while cur > budget_bytes:
        advanced = False
        for new_floor, layer in phase2_layers(levels, floor):
            for g in layer:
                if g in sizes and g not in dropped:
                    cur -= sizes[g]
                    dropped.add(g)
            floor = new_floor
            advanced = True
            break
        if not advanced or floor >= levels - 1:
            break
    # grids below the new floor are implicitly gone; strip them from the
    # dropped set (the floor itself encodes them for effective_cover)
    dropped = {g for g in dropped if g[0] >= floor and g[1] >= floor}
    return DropPlan(frozenset(dropped), floor, total, cur)


def apply_plan(sketch_df: DataFrame, plan: DropPlan, levels: int
               ) -> DataFrame:
    """Filter the sketch table to the surviving grids (on Iceberg this is
    a partition-level delete / new snapshot)."""
    keep_keys = [kx + ky * levels
                 for kx in range(plan.min_level, levels)
                 for ky in range(plan.min_level, levels)
                 if (kx, ky) not in plan.dropped]
    return sketch_df.where(F.col("grid_key").isin(keep_keys))
