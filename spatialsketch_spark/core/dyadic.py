"""Dyadic-interval machinery (0-indexed bit-arithmetic reformulation).

Reference semantics (1-indexed, search-based):
- point ladder: FindChildInterval, SpatialSketch.cpp:494-530
- canonical range cover with fractional coverage: ObtainIntervals /
  GetDyadicIntervals, SpatialSketch.cpp:634-752
- dropped-grid recursion (DynSketch): RecurseQueryDyadicInterval,
  SpatialSketch.cpp:802-832

Here everything is closed-form on 0-indexed coordinates:
level-k interval containing t is ``[t >> k << k, (t >> k << k) + 2^k - 1]``.
Equivalence with a literal transcription is established by exhaustive
small-N tests (tests/test_dyadic.py).

A *cover element* is ``(level, start, coverage)`` per axis; a 2-D cover
element is ``(kx, ky, cx, cy, coverage)`` where ``cx = x_start >> kx`` is
the cell index in grid (kx, ky) and coverage in (0, 1] is the fraction of
the cell overlapped by the query (SpatialSketch.cpp:660-676).
"""

from __future__ import annotations

import numpy as np


def point_ladder(t: int, log_n: int) -> list[tuple[int, int]]:
    """All dyadic (level, cell_index) pairs containing point t.

    Replaces the reference's binary descent (SpatialSketch.cpp:494-530)
    with shifts: cell index at level k is t >> k.
    """
    return [(k, t >> k) for k in range(log_n + 1)]


def point_ladder_np(ts: np.ndarray, log_n: int) -> np.ndarray:
    """Vectorized: (n_points, log_n+1) array of cell indices per level."""
    ts = np.asarray(ts, dtype=np.int64)
    ks = np.arange(log_n + 1, dtype=np.int64)
    return ts[:, None] >> ks[None, :]


def canonical_cover(a: int, b: int, log_n: int, floor_k: int = 0
                    ) -> list[tuple[int, int, float]]:
    """Minimal dyadic cover of inclusive integer range [a, b].

    Returns [(level, start, coverage)]. With floor_k == 0 this is the
    classic greedy canonical cover (<= 2*log_n intervals, coverage 1.0).
    With floor_k > 0 (DynSketch coarsened resolution: finest cell width is
    2^floor_k), sub-block remainders are emitted as the floor-level block
    containing them with fractional coverage = overlap / block
    (ObtainIntervals coverage path, SpatialSketch.cpp:660-676).
    """
    if a > b:
        return []
    n = 1 << log_n
    a = max(0, a)
    b = min(n - 1, b)
    out: list[tuple[int, int, float]] = []
    if floor_k > 0:
        block = 1 << floor_k
        a_blk = a >> floor_k
        b_blk = b >> floor_k
        if a_blk == b_blk:
            cov = (b - a + 1) / block
            return [(floor_k, a_blk << floor_k, min(1.0, cov))]
        # partial head block
        if a & (block - 1):
            head_start = a_blk << floor_k
            out.append((floor_k, head_start, (head_start + block - a) / block))
            a = head_start + block
        # partial tail block
        tail_end = None
        if (b + 1) & (block - 1):
            tail_start = b_blk << floor_k
            tail_end = (floor_k, tail_start, (b - tail_start + 1) / block)
            b = tail_start - 1
        if a <= b:
            out.extend(_greedy(a, b, log_n, floor_k))
        if tail_end is not None:
            out.append(tail_end)
        return out
    return _greedy(a, b, log_n, 0)


def _greedy(a: int, b: int, log_n: int, floor_k: int) -> list[tuple[int, int, float]]:
    """Greedy canonical cover; a and b are floor-block aligned."""
    out = []
    while a <= b:
        # largest k with a aligned and interval fitting in [a, b]
        k = log_n
        while k > floor_k and ((a & ((1 << k) - 1)) != 0 or a + (1 << k) - 1 > b):
            k -= 1
        # at k == floor_k alignment is guaranteed by the caller
        while a + (1 << k) - 1 > b:
            k -= 1  # only possible when floor_k bound is loose at the end
        out.append((k, a, 1.0))
        a += 1 << k
    return out


def cover_2d(x1: int, y1: int, x2: int, y2: int, log_n: int,
             floor_kx: int = 0, floor_ky: int = 0,
             ) -> list[tuple[int, int, int, int, float]]:
    """2-D dyadic cover: cartesian product of per-axis covers
    (GetDyadicIntervals, SpatialSketch.cpp:684-752).

    Returns [(kx, ky, cx, cy, coverage)] with cx/cy the per-grid cell
    indices and coverage the product of the axis coverages.
    """
    xs = canonical_cover(x1, x2, log_n, floor_kx)
    ys = canonical_cover(y1, y2, log_n, floor_ky)
    out = []
    for kx, sx, covx in xs:
        for ky, sy, covy in ys:
            out.append((kx, ky, sx >> kx, sy >> ky, covx * covy))
    return out


def cover_2d_np(rects, log_n: int, floor_k: int = 0):
    """Batch 2-D covers as numpy arrays: rects is an iterable of
    (x1, y1, x2, y2); returns (rect_idx, kx, ky, cx, cy, coverage)
    int64/float64 arrays. Same elements as cover_2d per rect (asserted
    in tests) — the per-axis covers stay tiny Python (<= 2 log n
    intervals), but the cross product and row materialization are
    vectorized, which is what the large-batch query planner pays per
    rect (the per-element list-append form costs ~1 ms/rect; this is
    ~10x cheaper)."""
    idxs, kxs, kys, cxs, cys, covs = [], [], [], [], [], []
    for i, (x1, y1, x2, y2) in enumerate(rects):
        xs = canonical_cover(int(x1), int(x2), log_n, floor_k)
        ys = canonical_cover(int(y1), int(y2), log_n, floor_k)
        if not xs or not ys:
            continue
        xk = np.fromiter((k for k, _, _ in xs), np.int64, len(xs))
        xc = np.fromiter((s >> k for k, s, _ in xs), np.int64, len(xs))
        xv = np.fromiter((c for _, _, c in xs), np.float64, len(xs))
        yk = np.fromiter((k for k, _, _ in ys), np.int64, len(ys))
        yc = np.fromiter((s >> k for k, s, _ in ys), np.int64, len(ys))
        yv = np.fromiter((c for _, _, c in ys), np.float64, len(ys))
        nx, ny = len(xs), len(ys)
        kxs.append(np.repeat(xk, ny)); cxs.append(np.repeat(xc, ny))
        kys.append(np.tile(yk, nx));   cys.append(np.tile(yc, nx))
        covs.append(np.repeat(xv, ny) * np.tile(yv, nx))
        idxs.append(np.full(nx * ny, i, dtype=np.int64))
    if not idxs:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z, z, z, np.zeros(0, dtype=np.float64)
    return (np.concatenate(idxs), np.concatenate(kxs),
            np.concatenate(kys), np.concatenate(cxs),
            np.concatenate(cys), np.concatenate(covs))


def effective_cover(x1: int, y1: int, x2: int, y2: int, log_n: int,
                    dropped: frozenset | set = frozenset(),
                    floor_k: int = 0,
                    ) -> list[tuple[int, int, int, int, float]]:
    """2-D cover rewritten against the live grid set (DynSketch).

    Replaces the reference's query-time recursion on dropped grids
    (RecurseQueryDyadicInterval, SpatialSketch.cpp:802-832) with driver-
    side set arithmetic: any cover element whose grid (kx, ky) is dropped
    is split in half along its larger dimension until a live grid is hit
    or the floor resolution bottoms out (then it is answered by the
    floor-level grid with fractional coverage, matching the reference's
    coverage fallback).
    """
    work = cover_2d(x1, y1, x2, y2, log_n, floor_k, floor_k)
    out: list[tuple[int, int, int, int, float]] = []
    while work:
        kx, ky, cx, cy, cov = work.pop()
        if (kx, ky) not in dropped:
            out.append((kx, ky, cx, cy, cov))
            continue
        if kx <= floor_k and ky <= floor_k:
            # nothing finer exists; the reference cannot answer this cell
            # either — it never drops the floor grid, so this is unreachable
            # when `dropped` respects the invariant. Keep defensive.
            raise ValueError(f"grid ({kx},{ky}) dropped below floor resolution")
        if kx >= ky and kx > floor_k:
            work.append((kx - 1, ky, cx * 2, cy, cov))
            work.append((kx - 1, ky, cx * 2 + 1, cy, cov))
        else:
            work.append((kx, ky - 1, cx, cy * 2, cov))
            work.append((kx, ky - 1, cx, cy * 2 + 1, cov))
    return out


def cover_1d_items(a: int, b: int, log_domain: int) -> list[tuple[int, int]]:
    """Canonical cover of an item-id range for the dyadic-CM
    (DyadCountMin.cpp Query path). Returns [(level, prefix)]."""
    return [(k, s >> k) for k, s, _ in canonical_cover(a, b, log_domain, 0)]
