"""Skew handling: salted two-phase aggregation + skew-aware repartition.

The north rule calls out giant repos/pages (the synthetic corpus plants one
repo holding 20% of all files, FIXTURES.md §1). Three mechanisms:

1. AQE skew-join splitting is always on (kgforge/session.py) — the runtime
   splits oversized join partitions (reference analog: none; its maps were
   driver-side).
2. ``salted_agg``: explicit two-phase aggregation for LOW-CARDINALITY /
   heavy-hitter group keys, where even AQE cannot split a single reduce key:
   partial-aggregate on (key, salt), then combine on key. Works for any
   algebraic aggregate (sum/count/min/max).
3. ``repartition_skew_aware``: spread a hot partition key (giant repo) by
   salting the repartition expression — the SparkExtractionJob.scala:84
   repartition-after-split move, keyed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregate: ``aggs`` maps output column → (input column |
    '*', fn) with fn in {sum, count, min, max}.

    Phase 1 aggregates on (keys..., salt) — the heavy key is spread over
    ``salt_buckets`` reduce tasks; phase 2 combines the tiny partials."""
    salt = F.pmod(F.spark_partition_id() + F.crc32(F.concat_ws("|", *keys)), F.lit(salt_buckets))
    partial_exprs = []
    final_exprs = []
    for out, (col, fn) in aggs.items():
        tmp = f"__p_{out}"
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1) if col == "*" else F.col(col)).alias(tmp))
            final_exprs.append(F.sum(tmp).alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(tmp))
            final_exprs.append(F.sum(tmp).alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(tmp))
            final_exprs.append(F.min(tmp).alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(tmp))
            final_exprs.append(F.max(tmp).alias(out))
        else:  # pragma: no cover
            raise ValueError(f"unsupported salted aggregate: {fn}")
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def repartition_skew_aware(df: DataFrame, key: str, buckets_per_key: int = 8) -> DataFrame:
    """Repartition by (key, salt) so one hot key spans several partitions."""
    n = df.sparkSession.sparkContext.defaultParallelism * 2
    salt = F.pmod(F.crc32(F.monotonically_increasing_id().cast("string")), F.lit(buckets_per_key))
    return df.withColumn("__salt", salt).repartition(n, F.col(key), F.col("__salt")).drop("__salt")
