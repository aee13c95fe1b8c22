"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference lakehouse PoC (medallion bronze→silver over an
OLTP star schema + NOAA weather), re-expressed Spark-first.

Subpackages
-----------
- ``session``    SparkSession factory tuned for local[N] testing / cluster scale.
- ``catalog``    three-part-name mapping + table loaders for the testdata star schema.
- ``functions``  scalar expression builders (surrogate keys, decodes, name cleanup).
- ``sources``    fixed-width / CSV-with-schema / text readers.
- ``operators``  joins (incl. event-time interval joins), aggregations (pivot),
                 dedup, similarity search, text analysis.
- ``plans``      declarative @table dataset registry + lazy topological executor
                 (the engine's equivalent of the reference's DLT pipeline layer).
- ``streaming``  Structured Streaming runners (AvailableNow), watermarks,
                 change-feed emulation over Parquet append logs.
- ``pipelines``  the reference's medallion datasets re-expressed over the
                 testdata star schema, plus config-driven bronze fan-out.
"""

__version__ = "0.1.0"
