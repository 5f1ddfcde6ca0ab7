"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference repo Xivid/eth-dspa-2019 (ETH DSPA 2019:
Flink/Timely streaming social-network analytics), re-expressed Spark-first.

Layout
------
- ``session``    : tuned SparkSession factory (AQE, UTC, Arrow, shuffle sizing)
- ``schemas``    : StructTypes for the social-network activity stream and the
                   driver testdata tables
- ``io``         : batch + streaming readers/writers (pipe-CSV, parquet, kafka)
- ``functions``  : scalar/array/text/hash column expressions (SURVEY §2.8)
- ``operators``  : reusable operator library — windows, top-k, dedup,
                   similarity search, reply-resolution fixpoint, cleaning
- ``tasks``      : the reference's three analytics tasks (batch + streaming)
- ``streaming``  : Structured Streaming sources/state/late-data patterns
- ``plans``      : the query registry consumed by ``__spark_entry__``/bench
"""

__version__ = "0.1.0"
