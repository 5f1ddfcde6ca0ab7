"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference repo Xivid/eth-dspa-2019 (ETH DSPA 2019:
Flink/Timely streaming social-network analytics), re-expressed Spark-first.

Layout
------
- ``session``    : tuned SparkSession factory (AQE, UTC, Arrow, shuffle sizing)
- ``schemas``    : the unified Activity StructType + person-edge schema
- ``io``         : testdata readers; single-writer text/CSV + console sinks
- ``sources``    : pipe-format activity parser (tag dispatch, timestamp zoo,
                   side outputs, tombstones) + deterministic fixture synth
- ``functions``  : scalar/array/text/hash column expressions (SURVEY §2.8)
- ``operators``  : reusable operator library — dedup (exact/Jaccard/MinHash-
                   LSH/SimHash), embedding similarity search, reply-resolution
                   fixpoint, Task 2 recommendation, Task 3 anomaly features,
                   cleaning walks, multimodal binary columns
- ``streaming``  : Structured Streaming sources, watermarked windows,
                   applyInPandasWithState, bounded replay, Kafka builders
- ``harness``    : golden diff (exceptAll both ways), disorder replay
- ``plans``      : the query registry (Spark plan + DuckDB oracle pairs)
                   consumed by ``__spark_entry__``/bench
"""

__version__ = "0.2.0"
