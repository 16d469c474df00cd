"""Range-aggregate query path — the Spark re-expression of
``SpatialSketch::QueryRanges`` (SpatialSketch.cpp:837-855 dispatch and
the per-sketch query kernels C6-C10 in SURVEY.md §2).

Per query: polygon -> rectangles (driver, Partitioner) -> dyadic cover
rewritten against live grids (driver, effective_cover — replaces the
reference's dropped-grid recursion SpatialSketch.cpp:802-832) -> a tiny
cover DataFrame broadcast-joined against the sketch table ->
groupBy(qid).applyInPandas finisher (deserialize the <= O(log^2 N)
matched cells, merge, estimate). Catalyst sees: parquet scan with
grid_key IN (...) partition pruning -> BroadcastHashJoin -> one small
shuffle on qid.

Query kinds and their reference semantics:
  freq      sum over cells of trunc(coverage * min-row CM estimate)
            (QueryFrequency SpatialSketch.cpp:857-896; trunc-to-int per
            sub-query :766,781-792)
  range_freq same with an item range via per-cell dyadic-CM
            (DyadCountMin Query path)
  distinct  OR-merge FM bitmaps across cells, then estimate
            (QueryCountDistinct :947-994)
  member    BF probe per cell, any-positive (QueryMembership :1050-1089)
  l2        elementwise-add CM counters across cells, then min-row
            sum-of-squares (QueryRangesL2 :1142-1173)
  window    ECM HistSum per cell with t0, min over rows, coverage-scaled
            (ECM query path :1175-1221)

The ``exact`` kernel answers every kind exactly (collision-free mode) —
that is what the DuckDB oracle gate exercises.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..core.dyadic import effective_cover
from ..core.kernels import make_kernel
from ..core.partitioner import Shape, shape_to_ranges
from .build import SketchStore

COVER_SCHEMA = ("qid BIGINT, grid_key INT, cell BIGINT, coverage DOUBLE, "
                "qkind STRING, item BIGINT, item_end BIGINT, t0 BIGINT")
RESULT_SCHEMA = "qid BIGINT, est BIGINT"


@dataclass
class QuerySpec:
    qid: int
    ranges: list          # [(x1, y1, x2, y2)] inclusive integer cell ranges
    qkind: str = "freq"   # freq | range_freq | distinct | member | l2 | window
    item: int = -1
    item_end: int = -1
    t0: int = -1

    @staticmethod
    def from_shape(qid: int, shape: Shape, qkind: str = "freq",
                   item: int = -1, item_end: int = -1, t0: int = -1,
                   x_off: int = 0, y_off: int = 0) -> "QuerySpec":
        return QuerySpec(qid, shape_to_ranges(shape, x_off, y_off),
                         qkind, item, item_end, t0)


def _estimate_one(kernel, pdf: pd.DataFrame) -> int:
    """Estimate for ONE query's matched cover cells."""
    qkind = pdf["qkind"].iloc[0]
    item = int(pdf["item"].iloc[0])
    item_end = int(pdf["item_end"].iloc[0])
    t0 = int(pdf["t0"].iloc[0])
    states = [kernel.deserialize(b) for b in pdf["payload"]]
    covs = pdf["coverage"].to_numpy()
    if True:
        if qkind == "count":
            # region total (no item predicate) — exact from any kernel
            # exposing query_total (reference 'Count' synopsis, Table 3a)
            est = 0
            for st, cov in zip(states, covs):
                est += int(cov * kernel.query_total(st))
        elif qkind in ("freq", "window"):
            tt = t0 if (qkind == "window" and t0 >= 0) else None
            ie = item_end if item_end >= 0 else None
            est = 0
            for st, cov in zip(states, covs):
                e = kernel.query_item(st, item, ie, tt)
                est += int(cov * e)           # trunc per sub-query (:766)
        elif qkind == "range_freq":
            est = 0
            for st, cov in zip(states, covs):
                if kernel.kind == "dcm":
                    e = kernel.query_range(st, item, item_end)
                else:
                    e = kernel.query_item(st, item, item_end)
                est += int(cov * e)
        elif qkind == "distinct":
            if kernel.kind == "exact":
                allitems = np.unique(np.concatenate(
                    [kernel.distinct_items(st) for st in states]))
                est = int(len(allitems))
            else:                              # FM: OR-merge then estimate
                est = int(round(kernel.estimate(kernel.merge(states))))
        elif qkind == "member":
            hit = any(kernel.member(st, item) for st in states)
            est = 1 if hit else 0
        elif qkind == "l2":
            if kernel.kind == "exact":
                parts = [kernel.query_l2_counts(st) for st in states]
                allit = np.concatenate([p["items"] for p in parts])
                allct = np.concatenate([p["counts"] for p in parts])
                uc, inv = np.unique(allit, return_inverse=True)
                cnt = np.bincount(inv, weights=allct.astype(np.float64))
                est = int((cnt ** 2).sum())
            else:                              # CM: merge counters, L2 min-row
                est = int(kernel.l2_estimate(kernel.merge(states)))
        else:
            raise ValueError(f"unknown qkind {qkind!r}")
    return int(est)


def _finisher(cfg, kind: str):
    """Partition-level finisher: after repartition(qid), all of a
    query's matched cells share a partition; one Python/Arrow round
    answers every query in the partition (no per-group pandas tax)."""

    def fn(batches):
        kernel = make_kernel(kind, cfg)
        chunks = [pdf for pdf in batches if len(pdf)]
        if not chunks:
            return
        allpdf = pd.concat(chunks, ignore_index=True)
        out_qid, out_est = [], []
        for qid, grp in allpdf.groupby("qid", sort=False):
            out_qid.append(int(qid))
            out_est.append(_estimate_one(kernel, grp))
        yield pd.DataFrame({"qid": pd.array(out_qid, dtype="int64"),
                            "est": pd.array(out_est, dtype="int64")})

    return fn


class SpatialSketchEngine:
    """One sketch store + its query surface."""

    def __init__(self, store: SketchStore):
        self.store = store

    def cover_rows(self, queries: list[QuerySpec]) -> list[tuple]:
        cfg = self.store.cfg
        log_n = cfg.levels - 1
        rows = []
        for q in queries:
            for (x1, y1, x2, y2) in q.ranges:
                for kx, ky, cx, cy, cov in effective_cover(
                        x1, y1, x2, y2, log_n, cfg.dropped_grids,
                        floor_k=self.store.min_level):
                    rows.append((q.qid, cfg.grid_key(kx, ky),
                                 cx * cfg.n + cy, float(cov),
                                 q.qkind, q.item, q.item_end, q.t0))
        return rows

    def query(self, queries: list[QuerySpec]) -> DataFrame:
        """-> DataFrame(qid, est); missing-cell-safe (untouched cells
        contribute 0, the analogue of lazily-unallocated sketches)."""
        spark = self.store.spark
        rows = self.cover_rows(queries)
        cover_pdf = pd.DataFrame(
            rows, columns=["qid", "grid_key", "cell", "coverage",
                           "qkind", "item", "item_end", "t0"])
        cover = spark.createDataFrame(cover_pdf, schema=COVER_SCHEMA)
        needed = sorted({r[1] for r in rows})
        matched = (
            self.store.df
            .where(F.col("grid_key").isin(needed))   # partition pruning
            .join(F.broadcast(cover), ["grid_key", "cell"])
        )
        n_parts = min(
            max(1, len({r[0] for r in rows})),
            int(spark.conf.get("spark.sql.shuffle.partitions")))
        res = matched.repartition(n_parts, "qid").mapInPandas(
            _finisher(self.store.cfg, self.store.kind), schema=RESULT_SCHEMA)
        # queries whose cover matched no cells answer 0 (or 0/absent for
        # member): union them back in
        all_qids = spark.createDataFrame(
            [(q.qid,) for q in queries], schema="qid BIGINT")
        return (all_qids.join(res, "qid", "left")
                .select("qid", F.coalesce("est", F.lit(0)).alias("est")))
