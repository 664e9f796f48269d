"""diive_spark — a from-scratch PySpark-native time-series rollup /
downsample / retention engine with the query semantics of holukas/diive.

Reference semantics are cited per-function as ``/root/reference/<path>:<line>``
in docstrings. The implementation is Spark-first (DataFrame API + Catalyst),
NOT a translation of the reference's pandas execution.

Layout
------
- ``diive_spark.session``      SparkSession construction (AQE, Arrow, shuffle sizing)
- ``diive_spark.synth``        deterministic seeded fixtures (token table, wide TS)
- ``diive_spark.sources``      parquet/CSV ingest + timestamp sanitizer
- ``diive_spark.functions``    scalar column expressions (time parts, thermo, solar, tokens)
- ``diive_spark.operators``    resample / cascade / grid / gap-fill / outliers / QCF / analytics
- ``diive_spark.compression``  Gorilla XOR + delta-of-delta Arrow UDF pack/unpack
- ``diive_spark.plans``        rollup pipeline driver, lineage, checkpointed resume
"""

__version__ = "0.1.0"
