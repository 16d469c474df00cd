"""spatialsketch_spark — a PySpark-native spatial-sketch + tiling engine.

A from-scratch rebuild of the *capabilities* of SpatialSketch
(Kiezebrink et al., "Synopses for Summarizing Spatial Data Streams";
reference C++ engine at /root/reference) as an idiomatic PySpark engine:

- dyadic 2-D range decomposition over a resolution-2^k grid
  (reference: repository/src/spatialsketch/SpatialSketch.cpp)
- per-cell mergeable synopses: Count-Min, FM, Bloom, ECM, dyadic-CM
  (reference: repository/src/spatialsketch/sketches/)
- rectilinear-polygon -> rectangle partitioning
  (reference: repository/src/spatialsketch/Partitioner.cpp)
- exact spatial joins (point-in-polygon, kNN, raster<->vector tiling)
- large-scale training-data pipeline ops (dedup, similarity search,
  text analysis, multimodal plumbing)

Architecture is Spark-first, NOT a port: sketch builds are one
map-side-combined shuffle (mapInPandas partials -> groupBy merge),
queries are broadcast joins of an O(log^2 N) dyadic cover against the
sketch table, and everything crossing the JVM/Python boundary moves in
Arrow batches (no per-row Python).
"""

__version__ = "0.1.0"
