"""SparkSession helpers tuned for this engine.

Local mode is a single JVM; on a real cluster the same builder settings apply
except master/memory. AQE is on so skewed shuffle partitions get split at
runtime (the reference has no skew handling at all — SURVEY.md §4)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession


def _launcher_master() -> str | None:
    """Master URL chosen by the launcher, if any.

    spark-submit conveys --master three different ways depending on version
    and wrapper: the spark.master JVM property (picked up by SparkConf), the
    classic MASTER env var (the /opt/spark launcher scripts), or inside
    PYSPARK_SUBMIT_ARGS. SPARK_MASTER is this engine's own override knob.
    """
    from pyspark.conf import SparkConf

    m = SparkConf().get("spark.master", None)
    if m:
        return m
    for var in ("SPARK_MASTER", "MASTER"):
        if os.environ.get(var):
            return os.environ[var]
    args = os.environ.get("PYSPARK_SUBMIT_ARGS", "").split()
    if "--master" in args:
        i = args.index("--master")
        if i + 1 < len(args):
            return args[i + 1]
    return None


def get_spark(
    app_name: str = "sip-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores defaults to $SPARK_GRAFT_CPUS or all local cores. shuffle_partitions
    defaults to the core count — at 100 TB on a real cluster this should be
    ~2-3x total executor cores instead; callers override via extra_conf.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cores), 8)
    # Python workers must be able to import this package regardless of the
    # driver's cwd (the spark-submit equivalent is --py-files engine.zip).
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pypath = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pypath.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{pkg_root}{os.pathsep}{pypath}" if pypath else pkg_root
    warehouse = os.environ.get("SIP_WAREHOUSE") or os.path.join(
        tempfile.gettempdir(), f"sip_warehouse_{os.getpid()}"
    )
    # Respect a master configured by the launcher (spark-submit --master,
    # MASTER/SPARK_MASTER env, or an existing cluster conf): hard-coding
    # local[] here would silently demote a `spark-submit --master yarn/k8s`
    # run to a single-JVM driver. Only default to local[cores] when nothing
    # upstream chose a master.
    external_master = _launcher_master()
    b = SparkSession.builder.appName(app_name)
    b = b.master(external_master) if external_master else b.master(f"local[{cores}]")
    b = (
        b
        .config("spark.sql.warehouse.dir", warehouse)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SIP_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # split single-file tables aggressively so map stages use all cores.
        # SCALE KNOBS (env-overridable; defaults tuned for the local bench's
        # single-file small-SF tables): on a cluster reading many large
        # files set SIP_MAX_PARTITION_BYTES to 256-1024 MB so scan tasks
        # amortize scheduling (guide §6), and SIP_PARQUET_CODEC=zstd for
        # a better ratio at similar read speed on big shuffled datasets.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SIP_MAX_PARTITION_BYTES", str(16 * 1024 * 1024)),
        )
        .config("spark.sql.files.openCostInBytes", str(8 * 1024 * 1024))
        .config(
            "spark.sql.parquet.compression.codec",
            os.environ.get("SIP_PARQUET_CODEC", "snappy"),
        )
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
