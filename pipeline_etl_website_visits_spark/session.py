"""SparkSession factory with scale-oriented defaults.

Defaults are chosen for the 100 TB design point (AQE on, skew-join handling,
sane broadcast threshold, UTC session time) while remaining correct on
``local[N]``. Tests/bench override parallelism via arguments or env.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Tuned defaults. Rationale:
# - AQE: runtime re-planning (coalesce post-shuffle partitions, skew-join
#   splitting, dynamic broadcast) is the single biggest win at scale.
# - shuffle.partitions: local default sized to cores; on a real cluster this
#   should be ~ total-shuffle-bytes / 128MB (AQE coalesces the excess).
# - maxPartitionBytes 128m: standard scan-split granularity.
# - session timezone UTC: deterministic timestamp semantics matching the
#   DuckDB oracle (naive timestamps).
_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # Partition directory values stay strings: inference would read the
    # ddMMyy log partitions ("050926") as ints and silently drop the leading
    # zero — lossy and irreversible. Partition pruning is unaffected.
    "spark.sql.sources.partitionColumnTypeInference.enabled": "false",
    # InferFiltersFromGenerate turns explode(attr) into a size()>0 filter and
    # pushes it down, re-inlining the aliased array expression; every explode
    # in this engine is over a COMPUTED array (shingles, chunks, bands), so
    # the inferred filter can never prune a parquet scan — it only re-derives
    # the whole HOF pipeline a second time inside a scan-side filter
    # (measured 10x on the sf0.1 dedup suite when the gram array gained a
    # second consumer). Correctness is unaffected: the filter is implied by
    # the explode itself.
    "spark.sql.optimizer.excludedRules": "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
    # Runtime bloom-filter join pruning (a selective dim filter becomes a
    # bloom membership test on the fact side before the join shuffle — the
    # engine-native form of x66's prefilter shape) is ALREADY on by
    # default in this Spark version; it is deliberately NOT pinned here.
    # Its size gates (creation side <100MB, application scan >10GB) keep
    # it inert on test/bench data and automatic at real scale; that the
    # rule fires is plan-asserted in test_scale_levers.
    "spark.sql.shuffle.partitions": "32",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "pipeline-etl-website-visits-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default all
    cores) when no master is set by the environment.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master:
        builder = builder.master(master)
    conf = dict(_DEFAULTS)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
