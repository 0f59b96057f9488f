"""Iceberg table support (input_hint: "Iceberg table of Common-Crawl-
style web pages").

The engine's operators are format-agnostic (they take DataFrames); this
module is the catalog glue. The sandbox ships no Iceberg runtime jar,
so availability is probed at call time and the parquet layout is the
documented fallback — identical schema, identical partitioning
(cell-partitioned directories stand in for Iceberg's partition
transforms; parquet min/max stats stand in for manifest pruning).

On a real cluster:
    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-\
3.5_2.12:<ver> \
      --conf spark.sql.catalog.dle=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.dle.type=hadoop \
      --conf spark.sql.catalog.dle.warehouse=<path> ...
then `read_pages(spark, "dle.db.pages")` uses the Iceberg path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def read_pages(spark: SparkSession, source: str) -> DataFrame:
    """Read the pages table from an Iceberg identifier (catalog.db.tbl)
    or a parquet directory (fallback). Either way the result is the
    input_hint schema; filters/column pruning push down in both."""
    if "/" not in source and iceberg_available(spark):
        return spark.read.format("iceberg").load(source)
    return spark.read.parquet(source)


def write_pages(df: DataFrame, target: str,
                partition_col: str = "cell") -> None:
    """Write cell-partitioned: Iceberg `partitionedBy` when available,
    parquet partition dirs otherwise — same pruning behavior for the
    engine's prefix filters."""
    spark = df.sparkSession
    if "/" not in target and iceberg_available(spark):
        (df.writeTo(target).partitionedBy(partition_col)
           .createOrReplace())
        return
    (df.write.mode("overwrite").partitionBy(partition_col)
       .parquet(target))
