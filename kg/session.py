"""SparkSession factory tuned for the KG pipeline.

Defaults chosen for 100 TB-scale behavior (AQE on, skew-join on, Arrow on),
tested on local[N].  SURVEY.md §7.1.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def make_pyfiles_zip(dest: str | None = None) -> str:
    """Zip the ``kg`` package for ``spark-submit --py-files`` / addPyFile.

    On a real cluster: ``spark-submit --py-files kg.zip job.py`` (north_rule);
    locally :func:`get_spark` ships the same zip so executor Python workers
    can unpickle our kernels regardless of the driver's cwd.
    """
    import kg

    pkg_dir = os.path.dirname(os.path.abspath(kg.__file__))
    if dest is None:
        dest = os.path.join(tempfile.gettempdir(), "kg_pyfiles.zip")
    tmp = dest + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for name in sorted(files):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                rel = os.path.join("kg", os.path.relpath(full, pkg_dir))
                zf.write(full, rel)
    os.replace(tmp, dest)
    return dest


def get_spark(
    app_name: str = "spark-kg",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with production-shaped defaults.

    - Arrow execution on (all kernels are pandas/Arrow UDFs — no per-row
      Python anywhere, BASELINE.json input_hint).
    - AQE + skew-join handling on (skewed entity blocks, SURVEY.md §4).
    - maxRecordsPerBatch bounds Arrow batch memory for the O(L^2)-ish
      mention-decode kernel (reference cost shape, BASELINE.md).
    """
    if master is None:
        master = os.environ.get("SPARK_KG_MASTER")
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_KG_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # zstd instead of snappy for every parquet checkpoint: ~2x fewer
        # bytes through storage for ~equal CPU at level 1.  Storage/network
        # bandwidth is the resource that does NOT scale with cores on a
        # single host (and is the contended resource on a real cluster's
        # network), while compression CPU parallelizes perfectly — measured
        # here (2M docs): local[2] wall 192->183s, local[8] 4-way 66.4->64.7s.
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_KG_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # ship the package to executor Python workers (spark-submit --py-files
    # equivalent) so kernels unpickle no matter where the driver started
    spark.sparkContext.addPyFile(make_pyfiles_zip())
    return spark
