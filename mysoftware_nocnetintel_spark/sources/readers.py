"""Generic source readers beyond the parquet registry (SURVEY.md §2.1 S1-S3).

Reference parity: PostgreSQL system-of-record (reference README.md:23) and
raw-log object storage (README.md:33). The JDBC path is the real-deployment
reader for the former; the driver harness exercises the parquet registry
instead (no database in this environment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """S2: newline-delimited JSON raw logs. Always pass a schema at scale —
    inference is a full extra pass over the data."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType | None = None, header: bool = True
) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_raw_text(spark: SparkSession, path: str) -> DataFrame:
    """S2: unparsed log lines (one row per line, column ``value``)."""
    return spark.read.text(path)


def parse_log_lines(raw: DataFrame, pattern: str, fields: list[str]) -> DataFrame:
    """Regex-structured extraction from raw lines (all JVM-side)."""
    return raw.select(
        *[
            F.regexp_extract("value", pattern, i + 1).alias(name)
            for i, name in enumerate(fields)
        ]
    )


def read_table_format(
    spark: SparkSession,
    path: str,
    fmt: str = "delta",
    version: int | None = None,
    timestamp: str | None = None,
) -> DataFrame:
    """S1/S2 lakehouse path: Delta Lake / Apache Iceberg table reads with
    optional time travel. Both formats keep the scan columnar + pushdown-
    capable (they are parquet underneath plus a transactional log), so every
    operator downstream is unchanged — exactly like the kafka source, only
    the ingest edge differs.

    The connector jars are not in this container, so the reader fails fast
    at plan build with the spark-submit --packages coordinates instead of a
    mid-job ClassNotFound."""
    if fmt not in ("delta", "iceberg"):
        raise ValueError(f"fmt must be delta|iceberg, got {fmt!r}")
    reader = spark.read.format(fmt)
    if version is not None:
        reader = reader.option("versionAsOf", str(version))
    if timestamp is not None:
        reader = reader.option("timestampAsOf", timestamp)
    try:
        return reader.load(path)
    except Exception as e:
        pkg = (
            "io.delta:delta-spark_2.13:<version>"
            if fmt == "delta"
            else "org.apache.iceberg:iceberg-spark-runtime-<spark>_2.13:<version>"
        )
        raise RuntimeError(
            f"{fmt} table format unavailable: add --packages {pkg} "
            "to the session (connector jar not on the classpath)"
        ) from e


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 16,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    properties: dict[str, str] | None = None,
):
    """S1: PostgreSQL/JDBC scan (README.md:23). Parallel reads REQUIRE the
    partitionColumn/bounds triple — a bare JDBC read is a single-task scan,
    which at warehouse scale is the classic accidental bottleneck.

    Returns the configured DataFrameReader (caller invokes ``.load()``);
    no database exists in the test environment, so tests stop at config.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", "10000")
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower/upper bounds")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader
