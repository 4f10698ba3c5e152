"""SparkSession factory with scale-appropriate defaults.

Configs chosen for correctness-stability across engines (UTC session
time zone so parquet timestamps agree with DuckDB's naive timestamps)
and for large-cluster behavior (AQE with skew-join handling, Arrow for
any pandas exchange). ``shuffle_partitions`` defaults low for local
runs; on a real cluster set it ~2-3× total cores or rely on AQE
coalescing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "universal-importer-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    # driver memory must reach the JVM launcher BEFORE the gateway
    # starts — a builder config is silently ignored in local mode
    if "PYSPARK_SUBMIT_ARGS" not in os.environ:
        mem = os.environ.get("SPARK_DRIVER_MEMORY", "8g")
        os.environ["PYSPARK_SUBMIT_ARGS"] = f"--driver-memory {mem} pyspark-shell"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Split/partition sizing for SMALL per-node data volumes: the
        # defaults (128 MB splits, 64 MB post-shuffle advisory) collapse
        # a few-hundred-MB local dataset to ~3 tasks, starving 32 cores
        # on every scan-bound stage (measured −12% total bench).
        # On a real cluster at 100 TB, export SPARK_GRAFT_MAX_PARTITION_MB=128
        # and SPARK_GRAFT_ADVISORY_PARTITION_MB=64 — per-task sizes, not
        # cluster-wide knobs, so bigger is right when data >> cores.
        .config(
            "spark.sql.files.maxPartitionBytes",
            str(int(os.environ.get("SPARK_GRAFT_MAX_PARTITION_MB", "16")) * 1024 * 1024),
        )
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            str(int(os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION_MB", "16")) * 1024 * 1024),
        )
        # openCostInBytes is the BINDING split constraint for small
        # files: maxSplitBytes = min(maxPartitionBytes,
        # max(openCostInBytes, totalBytes/cores)), so the 4 MB default
        # packs an 8 MB multi-row-group file into 2 tasks and pins
        # CPU-bound per-row stages (quality gates, tokenize/explode)
        # to 2 of 32 cores (r13 decomposition). 256 KB lets byte
        # splitting reach the row-group granularity the replicas and
        # real multi-row-group parquet have; at 100 TB
        # totalBytes/cores >> openCost, so the knob is inert there.
        .config(
            "spark.sql.files.openCostInBytes",
            str(int(os.environ.get("SPARK_GRAFT_OPEN_COST_KB", "256")) * 1024),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # ANSI mode is Spark 4's default, but FixedSum(direct=True)'s
        # "violated bound is loud, never silent corruption" guarantee
        # DEPENDS on it (an overflowing int64 sum must raise, not
        # wrap) — pin it so a caller profile that disabled ANSI can't
        # silently void the contract (r13 advice).
        .config("spark.sql.ansi.enabled", "true")
        # constraint propagation is combinatorial over wide validation
        # predicates (60-term OR chains x 24 aliased casts -> driver
        # OOM); the inference it buys is marginal for these plans
        .config("spark.sql.constraintPropagation.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def tune_existing(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable configs to a session we did not build
    (the driver hands us one in ``__spark_entry__.entry``)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    mpb = int(os.environ.get("SPARK_GRAFT_MAX_PARTITION_MB", "16")) * 1024 * 1024
    adv = int(os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION_MB", "16")) * 1024 * 1024
    for k, v in (
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.sql.ansi.enabled", "true"),
        ("spark.sql.constraintPropagation.enabled", "false"),
        ("spark.sql.files.maxPartitionBytes", str(mpb)),
        ("spark.sql.adaptive.advisoryPartitionSizeInBytes", str(adv)),
        (
            "spark.sql.files.openCostInBytes",
            str(int(os.environ.get("SPARK_GRAFT_OPEN_COST_KB", "256")) * 1024),
        ),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - non-runtime-settable on some builds
            pass
    return spark
