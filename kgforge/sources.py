"""Source scans (SURVEY.md §2.1).

The reference streams MediaWiki XML (sources/XMLSource.scala:23-70) and
repartitions after the file split (SparkExtractionJob.scala:84) because
bz2/XML inputs are unsplittable. Our corpus is tabular, but the same hazard
exists: a parquet file written as ONE row group cannot be split by the scan,
so everything up to the first shuffle runs on one core. ``read_table``
guarantees a minimum parallelism, trading one cheap round-robin shuffle for
full-cluster fan-out — exactly the reference's repartition-after-split move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def ensure_parallelism(df: DataFrame, min_partitions: int) -> DataFrame:
    if df.rdd.getNumPartitions() < min_partitions:
        return df.repartition(min_partitions)
    return df


# r6: df.rdd (to read the scan's partition count) converts the analyzed plan
# to an RDD on the DRIVER — ~30-60 ms per call, and read_table runs once or
# more per declared query. The count depends only on the file set and the
# session's split config, so the fan-out decision is cached per
# (sf_dir, name, min_partitions).
_NEEDS_FANOUT: dict[tuple, bool] = {}


def read_table(
    spark: SparkSession, sf_dir: str, name: str, min_partitions: int | None = None
) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if min_partitions is None:
        min_partitions = spark.sparkContext.defaultParallelism
    # tiny dimension tables stay single-partition (they broadcast anyway)
    if name in ("region", "nation"):
        return df
    key = (sf_dir, name, min_partitions)
    if key not in _NEEDS_FANOUT:
        _NEEDS_FANOUT[key] = df.rdd.getNumPartitions() < min_partitions
    return df.repartition(min_partitions) if _NEEDS_FANOUT[key] else df
