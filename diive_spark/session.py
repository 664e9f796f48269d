"""SparkSession construction tuned for the rollup engine.

Scale stance: the session defaults assume many-executor clusters; in this
sandbox they run on ``local[N]``. AQE is always on (skew-join splitting +
partition coalescing), Arrow is always on (every Python kernel in this
engine is a vectorized pandas/Arrow UDF — no per-row Python anywhere,
per BASELINE.json input_hint).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"


def get_spark(
    app_name: str = "diive_spark",
    master: str | None = None,
    shuffle_partitions: str | int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Args:
        master: Spark master; defaults to ``local[$SPARK_GRAFT_CPUS]`` or
            ``local[*]``. On a real cluster this is supplied by spark-submit
            and must be left ``None``.
        shuffle_partitions: sized so one shuffle partition of the tier-0
            rollup fits comfortably in executor memory. Rule of thumb at
            100 TB input: ``input_bytes / 128MB`` map tasks, shuffle
            partitions ~= 2-4x total cores; AQE coalesces the tail.
    """
    # Executor Python workers must be able to import this package: in local
    # mode they inherit PYTHONPATH from the driver process env (sys.path
    # mutations do NOT propagate). On a real cluster, ship the package with
    # ``spark-submit --py-files diive_spark.zip`` instead.
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pypath = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in pypath.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{pkg_parent}{os.pathsep}{pypath}" if pypath else pkg_parent

    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_SUBMIT_MODE"):
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        builder = builder.master(f"local[{cpus}]")

    conf = {
        # AQE: runtime re-plan — coalesce small shuffle partitions, split skewed ones.
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # let AQE coalesce the output partitioning of CACHED plans too
        # (default false): without it every .cache() pins the full
        # session shuffle width onto downstream jobs — a cached 200k-row
        # rollup tier occupies `shuffle.partitions` near-empty partitions
        # and every later stage pays that many tasks (guide §2.2: fewer,
        # larger partitions). Scale-neutral: AQE targets
        # advisoryPartitionSizeInBytes, so big caches keep full width.
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
        # Arrow transfer for every pandas UDF / applyInPandas kernel.
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        "spark.sql.shuffle.partitions": str(
            shuffle_partitions
            or os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        ),
        # Timestamps are wall-clock UTC throughout the engine.
        "spark.sql.session.timeZone": "UTC",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "spark.ui.enabled": "false",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
