"""JDBC source/sink — the engine's analog of the reference's Redshift
connection (SURVEY §2 A8/A9/A10: DDL executor, catalog scan, bulk load).

The reference talks Postgres protocol to Redshift (``PostgresHook.run``,
``salesforce_schema_to_redshift_operator.py:306-310``) and bulk-loads via
COPY-from-S3 (:271-294). In Spark the same roles are:

- analytics-side tables → catalog tables (``SchemaReconcileLoad``), which
  is the path the conformance surface exercises;
- a *real* external warehouse → these JDBC wrappers. No database ships in
  this environment, so the functions are exercised only for plan/argument
  construction in tests; the I/O path is standard ``spark.read/write.jdbc``.

Scale notes: reads parallelize only when given a partition column + bounds
(one JDBC cursor per partition); writes batch inserts per partition —
for Redshift-sized bulk loads prefer staging parquet to object storage and
COPY (the reference's own design), keeping JDBC for DDL and small dims.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict | None = None,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Parallel JDBC scan. Without a partition column the read is a single
    cursor (fine for dims); with one, Spark issues ``num_partitions`` range
    queries — the JDBC analog of input splits (A1/A2 pagination)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: dict | None = None,
    batch_size: int = 10_000,
) -> None:
    """Batched JDBC insert (A10's direct-write form). ``mode='overwrite'``
    reproduces the reference's replace=True idempotence (E5)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


def run_ddl(spark: SparkSession, url: str, ddl: str, properties: dict | None = None):
    """A8: execute a DDL/utility statement over JDBC (the reference's
    ``PostgresHook.run``). Uses the JVM driver directly — one statement,
    no result set."""
    jvm = spark._jvm
    props = jvm.java.util.Properties()
    for k, v in (properties or {}).items():
        props.setProperty(k, v)
    conn = jvm.java.sql.DriverManager.getConnection(url, props)
    try:
        stmt = conn.createStatement()
        try:
            stmt.execute(ddl)
        finally:
            stmt.close()
    finally:
        conn.close()
