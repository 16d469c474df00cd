"""Structured-Streaming sketch ingestion.

The reference consumes an unbounded point stream with per-tuple Update()
(experiments.cpp:312-319). Spark-native mapping: micro-batches through
``foreachBatch``, each batch running the SAME batch build pipeline
(build_sketch_df) and APPENDING its per-cell partials to the sketch
table. No merge is required for correctness:

- 'count' queries SUM val_sum over matched rows — partials add up.
- merge kinds (distinct/member/l2) merge all matched states per qid in
  the finisher — extra rows per cell are just more states to merge.
- additive kinds sum per-partial estimates; each partial CM min-row
  overestimates its own sub-stream, so the sum remains a valid (in fact
  tighter) CM-style overestimate of the total.

``compact()`` optionally rewrites the table to one row per cell (the
same partition-level merge as the batch path) to bound read
amplification — the streaming analogue of an Iceberg rewrite-data-files
maintenance job. Checkpointing (stream offsets) is Spark's own
checkpointLocation; the sketch table + manifest snapshot make the whole
stage resumable (north_rule)."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

from ..config import SketchConfig
from ..geo.build import SKETCH_SCHEMA, build_sketch_df, _merge_partitions


class StreamingSketch:
    def __init__(self, spark: SparkSession, cfg: SketchConfig, kind: str,
                 min_level: int, path: str):
        self.spark = spark
        self.cfg = cfg
        self.kind = kind
        self.min_level = min_level
        self.path = path
        self.table = f"{path}/sketch"
        self.checkpoint = f"{path}/checkpoint"
        os.makedirs(self.table, exist_ok=True)

    def start(self, stream_events: DataFrame, trigger_once: bool = True):
        """stream_events: a streaming DF with (ts,item,x,y,value)."""
        cfg, kind, min_level = self.cfg, self.kind, self.min_level
        table = self.table

        def process_batch(batch_df: DataFrame, batch_id: int):
            if batch_df.isEmpty():
                return
            partials = build_sketch_df(batch_df, cfg, kind, min_level,
                                       mode="partials")
            partials.write.mode("append").parquet(table)
            meta = {"batch_id": int(batch_id),
                    "rows": int(batch_df.count()),
                    "ts": time.time()}
            with open(f"{self.path}/last_batch.json", "w") as f:
                json.dump(meta, f)

        writer = stream_events.writeStream \
            .foreachBatch(process_batch) \
            .option("checkpointLocation", self.checkpoint)
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def sketch_df(self) -> DataFrame:
        return self.spark.read.schema(SKETCH_SCHEMA).parquet(self.table)

    def compact(self) -> None:
        """Rewrite to one row per (grid_key, cell); read amplification
        maintenance, never needed for correctness."""
        df = self.sketch_df()
        nparts = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
        merged = df.repartition(nparts, "grid_key", "cell").mapInPandas(
            _merge_partitions(self.cfg, self.kind), schema=SKETCH_SCHEMA)
        tmp = f"{self.path}/sketch_compact"
        merged.write.mode("overwrite").parquet(tmp)
        back = self.spark.read.schema(SKETCH_SCHEMA).parquet(tmp)
        back.write.mode("overwrite").parquet(self.table)

    def as_store(self):
        from ..geo.build import SketchStore
        return SketchStore(self.spark, self.sketch_df(), self.cfg,
                           self.kind, self.min_level,
                           manifest={"kind": self.kind,
                                     "min_level": self.min_level,
                                     "streaming": True})


def windowed_event_counts(stream_events: DataFrame, width_s: int,
                          watermark_s: int,
                          group_cols: tuple = ()) -> DataFrame:
    """Event-time tumbling-window counts with late-data handling — the
    Structured-Streaming analogue of the batch ``time_rollup``
    (pipeline/temporal.py): integer ``ts`` (seconds) -> event time,
    watermark bounds state and drops rows later than ``watermark_s``
    behind the max seen event time. In append output mode a window is
    emitted exactly once, when the watermark passes its end — the
    exactly-once windowed aggregation shape of the brief.
    -> streaming DF (w_start BIGINT, [group cols...,] cnt BIGINT)."""
    from pyspark.sql import functions as F
    ev = stream_events.withColumn("etime", F.timestamp_seconds("ts")) \
        .withWatermark("etime", f"{watermark_s} seconds")
    agg = (ev.groupBy(F.window("etime", f"{width_s} seconds"),
                      *[F.col(c) for c in group_cols])
           .agg(F.sum("value").alias("cnt")))
    return agg.select(
        F.unix_timestamp(F.col("window.start")).cast("bigint")
        .alias("w_start"),
        *[F.col(c) for c in group_cols],
        F.col("cnt").cast("bigint"))


def stateful_cell_counts(stream_events: DataFrame,
                         tile_level: int) -> DataFrame:
    """Custom stateful per-tile accumulator via
    ``applyInPandasWithState`` — the brief's custom-stateful-operator
    shape. State per tile (tx, ty): running event count, value sum and
    max ts, persisted in the state store across micro-batches and
    emitted (updated) every batch the tile is touched. This is the
    streaming form of the engine's per-cell accumulation for operators
    whose state is NOT a mergeable monoid (where foreachBatch-append
    would not compose).
    -> streaming DF (tx, ty, n_events, val_sum, max_ts)."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd
        n = vs = mx = 0
        if state.exists:
            n, vs, mx = state.get
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += int(len(pdf))
            vs += int(pdf["value"].sum())
            mx = max(mx, int(pdf["ts"].max()))
        state.update((n, vs, mx))
        yield pd.DataFrame({"tx": [key[0]], "ty": [key[1]],
                            "n_events": [n], "val_sum": [vs],
                            "max_ts": [mx]})

    tiled = stream_events \
        .withColumn("tx", F.shiftright("x", tile_level)) \
        .withColumn("ty", F.shiftright("y", tile_level))
    return tiled.groupBy("tx", "ty").applyInPandasWithState(
        update,
        outputStructType=("tx BIGINT, ty BIGINT, n_events BIGINT, "
                          "val_sum BIGINT, max_ts BIGINT"),
        stateStructType="n BIGINT, vs BIGINT, mx BIGINT",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)
