"""Query-set generation + golden cache files — the reference's
benchmark-reproducibility layer.

- generation rules: heavy items first (GROUP BY item ORDER BY count DESC
  LIMIT k*10, Postgres.cpp:509-780), random in-bounds placements keeping
  the item inside the region, rejection when groundtruth < min_gt
  (Postgres.cpp:602-661, 742-761);
- cache format: ``x_offset,y_offset,item,item_end,groundtruth,L1,N``
  (experiments.cpp:562-629 read, :658-669 write).

Ground truth + L1 (region mass) + N (stream size) come from ONE batched
Spark aggregation over the event table (the reference asks Postgres).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..core.partitioner import Shape, shape_to_ranges


@dataclass
class QueryRecord:
    x_offset: int
    y_offset: int
    item: int
    item_end: int
    groundtruth: int
    l1: int
    n_stream: int


def _det_offsets(i: int, max_x: int, max_y: int, snap: int) -> tuple[int, int]:
    """Deterministic 'random' placement (seeded arithmetic, snapped)."""
    dx = ((i * 2654435761) % (max_x + 1)) // snap * snap if max_x else 0
    dy = ((i * 40503 + 17) % (max_y + 1)) // snap * snap if max_y else 0
    return dx, dy


def generate_query_set(events: DataFrame, shape: Shape, n_queries: int = 100,
                       k_heavy: int = 25, min_gt: int = 1, snap: int = 1,
                       ) -> list[QueryRecord]:
    spark = events.sparkSession
    n_stream = events.count()
    heavy = [r["item"] for r in
             events.groupBy("item").count().where(F.col("count") > 2)
             .orderBy(F.desc("count"), F.asc("item"))
             .limit(k_heavy * 10).collect()]
    if not heavy:
        return []
    max_x = shape.max_x_offset or max(
        0, shape.grid_size - 1 - max(x2 for *_, x2, _ in
                                     [(r[0], r[1], r[2], r[3])
                                      for r in shape_to_ranges(shape)]))
    max_y = shape.max_y_offset
    # batched truth: one rect relation for every candidate placement
    cand = []
    rect_rows = []
    i = 0
    attempts = 0
    while len(cand) < n_queries * 2 and attempts < n_queries * 8:
        dx, dy = _det_offsets(attempts, max_x, max_y, snap)
        item = heavy[attempts % len(heavy)]
        ranges = shape_to_ranges(shape, dx, dy)
        if ranges:
            qid = len(cand)
            cand.append((dx, dy, int(item)))
            for x1, y1, x2, y2 in ranges:
                rect_rows.append((qid, x1, y1, x2, y2, int(item)))
        attempts += 1
    rects = spark.createDataFrame(
        rect_rows, "qid BIGINT, x1 BIGINT, y1 BIGINT, x2 BIGINT, "
                   "y2 BIGINT, q_item BIGINT")
    cond = (F.col("x").between(F.col("x1"), F.col("x2"))
            & F.col("y").between(F.col("y1"), F.col("y2")))
    agg = (events.join(F.broadcast(rects), cond)
           .groupBy("qid")
           .agg(F.sum("value").alias("l1"),
                F.sum(F.when(F.col("item") == F.col("q_item"),
                             F.col("value")).otherwise(0)).alias("gt"))
           .collect())
    stats = {r["qid"]: (int(r["gt"]), int(r["l1"])) for r in agg}
    out = []
    for qid, (dx, dy, item) in enumerate(cand):
        gt, l1 = stats.get(qid, (0, 0))
        if gt >= min_gt:          # rejection rule (Postgres.cpp:742-761)
            out.append(QueryRecord(dx, dy, item, -1, gt, l1, n_stream))
        if len(out) >= n_queries:
            break
    return out


def write_query_cache(path: str, records: list[QueryRecord]) -> None:
    """Reference text format (experiments.cpp:661)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("x_offset,y_offset,item,item_end,groundtruth,L1,N\n")
        for r in records:
            f.write(f"{r.x_offset},{r.y_offset},{r.item},{r.item_end},"
                    f"{r.groundtruth},{r.l1},{r.n_stream}\n")


def read_query_cache(path: str) -> list[QueryRecord]:
    out = []
    with open(path) as f:
        next(f)
        for line in f:
            p = line.strip().split(",")
            if len(p) == 7:
                out.append(QueryRecord(*map(int, p)))
    return out
