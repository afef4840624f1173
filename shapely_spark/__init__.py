"""shapely_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Reimplements the query semantics of the reference (shapely/shapely: vectorized
GEOS kernels, STRtree spatial index) as an idiomatic Spark engine: DataFrame
plans for joins/aggregations, NumPy kernels inside Arrow-batched pandas UDFs
for exact geometry math, a SQL-expressible cell grid for partition pruning.
"""

__version__ = "0.1.0"
