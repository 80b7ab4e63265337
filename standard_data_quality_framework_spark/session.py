"""SparkSession factory tuned for the quality-filter workload.

Local mode for tests/bench; the same config block is what we'd ship in
spark-defaults for a real cluster (AQE, Arrow, sensible shuffle sizing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "sdqf_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores=None`` → ``local[*]``. ``shuffle_partitions`` defaults to the
    core count — on a real cluster this would be ~2-3× total executor
    cores; AQE coalescing makes the exact number non-critical.
    """
    cores_s = "*" if cores is None else str(cores)
    n_shuffle = shuffle_partitions or (os.cpu_count() if cores is None else cores)
    b = (
        SparkSession.builder.master(f"local[{cores_s}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Byte-bound Arrow batches (Spark 4 knob): multi-KB text rows
        # would otherwise ship ~40 MB batches (10k records) through
        # the pandas-UDF workers — measured on the 600k-page pipeline
        # at 32 cores, clamping to 8 MB (~2k text rows/batch) cut the
        # median ~10% and removed a 2-3× long-tail of memory-spike
        # runs, while narrow numeric Arrow traffic (embeddings etc.)
        # stays at the 10k-record bound. Row-size-dependent, not
        # data-size-dependent — the same clamp is correct at 100 TB.
        .config("spark.sql.execution.arrow.maxBytesPerBatch", "8388608")
        .config("spark.driver.memory", os.environ.get("SDQF_DRIVER_MEM", "16g"))
        # the unrolled vector math (similarity._dot) generates Java
        # methods past HotSpot's 8000-bytecode JIT refusal threshold
        # (-XX:DontCompileHugeMethods default); without this flag those
        # methods run in the BYTECODE INTERPRETER — measured 2× slower
        # than the lambda forms they replaced, and 5× faster once
        # JIT-compiled. Standard practice for codegen-heavy Spark
        # (wide schemas hit the same cliff); on a cluster the same
        # flag goes in spark.executor.extraJavaOptions too (local mode
        # has one JVM, so driver covers both roles here).
        .config("spark.driver.extraJavaOptions",
                "-XX:-DontCompileHugeMethods "
                "-XX:ReservedCodeCacheSize=512m")
        .config("spark.executor.extraJavaOptions",
                "-XX:-DontCompileHugeMethods "
                "-XX:ReservedCodeCacheSize=512m")
        .config("spark.ui.enabled", "false")
        # parquet split sizing: at 100 TB this keeps scan tasks ~128 MB
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
