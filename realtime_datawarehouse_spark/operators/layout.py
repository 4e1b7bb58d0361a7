"""Physical layout: bucketed tables for shuffle-free co-located joins.

The reference co-locates stream joins by Kafka-partitioning both topics on
the join key (implicit in Flink's keyBy). The batch-warehouse equivalent is
BUCKETING: write both fact tables bucketed (and sorted) by the join key;
every subsequent join/aggregation on that key reads co-partitioned data and
skips the exchange entirely — at 100 TB the single biggest shuffle saving
available (tested in tests/test_layout.py by asserting the joined plan has
no Exchange).

Bucket-count guidance at scale: pick ``buckets ≈ table_size /
target_partition_size`` (128–512 MB each) and use the SAME count on tables
that join together (Spark requires equal bucket counts to elide the
shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    num_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed (+sorted) table registered in the catalog.

    ``path`` makes it an external table (data at ``path``, catalog entry in
    the session catalog) — used by tests to keep data in tmp dirs; production
    omits it (managed warehouse location).
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
