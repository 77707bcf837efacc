"""SparkSession factory tuned for the engine.

Defaults are chosen for the sandbox (local[N], 128 GiB) but every knob is
the one you would set on a real 1000-executor cluster: AQE on (runtime
coalesce + skew-join splitting), explicit shuffle partitions, Arrow enabled
for the pandas-UDF analysis path, zstd parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "whoosh-novo-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 32)
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # local-scale split sizing: default 128m collapses a few-hundred-MB
        # table into 2-3 input splits, starving the Arrow analysis stage of
        # parallelism; 16m keeps map stages wide at sandbox data sizes
        # (on a real cluster leave this at the default)
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(1024 * 1024))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    ship_package(spark)
    return spark


def shuffle_partitions_of(spark: SparkSession, default: int | None = None) -> int:
    """``spark.sql.shuffle.partitions`` as an int, tolerating the "auto"
    value AQE deployments set — falls back to ``default`` or the cluster's
    default parallelism when the conf is non-numeric."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (ValueError, TypeError):
        return default or spark.sparkContext.defaultParallelism


def package_zip() -> str:
    """Zip the whoosh_novo_spark package for --py-files / addPyFile.

    This is the artifact a real deployment passes to
    ``spark-submit --py-files`` (north rule); locally we addPyFile it so
    executor Python workers can import the package regardless of cwd.
    """
    import zipfile

    import whoosh_novo_spark

    pkg_dir = os.path.dirname(os.path.abspath(whoosh_novo_spark.__file__))
    out = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), "whoosh_novo_spark_pkg.zip"
    )
    tmp = out + ".tmp"
    entries = []
    for root, _dirs, files in os.walk(pkg_dir):
        if "__pycache__" in root:
            continue
        for fn in files:
            if fn.endswith(".py"):
                full = os.path.join(root, fn)
                rel = os.path.join("whoosh_novo_spark", os.path.relpath(full, pkg_dir))
                entries.append((rel, full))
    # deterministic bytes (sorted entries, fixed timestamps) so the same
    # source always produces the same archive — Spark refuses same-named
    # files with different contents across addPyFile/--py-files
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        for rel, full in sorted(entries):
            info = zipfile.ZipInfo(rel, date_time=(2020, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(full, "rb") as f:
                z.writestr(info, f.read())
    os.replace(tmp, out)
    return out


def ship_package(spark: SparkSession) -> None:
    try:
        sc = spark.sparkContext
        # skip when --py-files (or a previous call) already shipped it
        listed = sc._jsc.sc().listFiles().toString() + ",".join(
            getattr(sc, "_python_includes", []) or []
        )
        if "whoosh_novo_spark_pkg.zip" in listed or "whoosh_novo_spark" in ",".join(
            getattr(sc, "_python_includes", []) or []
        ):
            return
        sc.addPyFile(package_zip())
    except Exception:
        pass  # already added in this context, or non-local scheduler quirk
