"""SparkSession bootstrap for pytrousse-spark.

Single place where the engine's Spark tuning lives so tests, bench and the
driver entry all agree. Designed for a real cluster (AQE, skew-join handling,
broadcast thresholds); tests run it on ``local[N]``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pytrousse-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    Defaults are chosen for scale-out behavior:

    - AQE on (runtime coalescing of shuffle partitions, skew-join splitting);
      at 100 TB the static ``shuffle.partitions`` is only an upper bound.
    - Arrow on, so the few pandas-UDF escape hatches batch via Arrow.
    - Session timezone pinned to UTC so results are reproducible and match
      external oracles (DuckDB) regardless of host timezone.
    - ``spark.cleaner.periodicGC.interval`` defaults to 2min, which forces
      a periodic driver ``System.gc()``. That is the right trade for
      many-query batch drivers (it drains dead localCheckpoint storage
      blocks between queries — the r12 finding), but it DOES impose
      periodic GC pauses; a latency-sensitive caller should set
      ``SPARK_GRAFT_PERIODIC_GC=30min`` to restore Spark's default
      (r12 ADVICE item 3).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # parquet pushdown/pruning are on by default; pin them anyway so a
        # misconfigured cluster profile cannot silently disable them.
        .config("spark.sql.parquet.filterPushdown", "true")
        # Read TIMESTAMP(NANOS) parquet columns as long (Spark has no nanos
        # type); io.read_parquet converts them back to timestamps.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # Split even small files into >= cores partitions: a single small
        # parquet file otherwise yields ONE input split, serializing every
        # per-row expression (signatures, repair cascades) on one core. At
        # real scale inputs have plenty of splits, so a minimum is free;
        # AQE re-coalesces after shuffles either way.
        .config("spark.sql.files.minPartitionNum", cpus)
        # local mode starts faster with the driver host pinned.
        .config("spark.driver.host", "127.0.0.1")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # managed-table warehouse outside the repo (bucketed-table support)
        .config("spark.sql.warehouse.dir", "/tmp/pytrousse_warehouse")
        # Long-lived sessions (the bench runs ~330 queries in one JVM)
        # accumulate storage blocks from materialized localCheckpoints:
        # the ContextCleaner only unpersists them after a JVM GC proves
        # the RDDs unreachable, and the default periodic-GC interval
        # (30min) exceeds the whole session, so blocks pile up and
        # squeeze execution memory. A shorter interval lets the cleaner
        # drain between queries; scale-neutral (production drivers with
        # many-query sessions want exactly this) and env-overridable.
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_GRAFT_PERIODIC_GC", "2min"),
        )
        .config("spark.ui.enabled", "false")
    )
    # Streaming state-store partition count, decoupled from the batch
    # shuffle parallelism when set (state partitions are pinned in the
    # checkpoint for a stream's lifetime, so they should be sized to
    # state volume/throughput, not to the session's core count —
    # measured r13: the tiny-state alert stream pays ~2x overhead at 32
    # state partitions vs 8 on local hosts). Default unchanged
    # (= shuffle partitions) so benches stay comparable.
    ssp = os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS")
    if ssp:
        builder = builder.config(
            "spark.sql.streaming.internal.stateStore.partitions", ssp
        )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_GRAFT_NO_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    builder = builder.config(
        "spark.sql.shuffle.partitions", str(shuffle_partitions or int(cpus))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
