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
